package graft.operators

import graft.{QuerySpec, Tables}

/** The ad-hoc SQL front door (SURVEY.md §3.3 — the reference's only read
  * path is raw SQL over the fact table via ClickHouse `/play`; here the
  * analog is `spark.sql` over registered temp views). The query exercises
  * what the DataFrame-built specs don't: the SQL parser → Catalyst
  * analyzer path with a correlated scalar subquery (decorrelated by the
  * optimizer into an aggregate + join — the TPC-H Q17 shape).
  *
  * The same text runs verbatim in DuckDB: `avg(l_quantity)` is exact here
  * because quantities are small integers (double sums < 2^53 are exact in
  * any order), so the subquery boundary is deterministic cross-engine.
  */
object SqlSurface {

  private val sql =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_size < 10
      |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q48_sql_subqueries")(sql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sql)
    }
  )
}
