package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * fixtures. `oracle = None` downgrades to the driver's rows-only check.
  *
  * Determinism contract (SURVEY.md §5, §7.4): every oracle-compared query
  * has a total ORDER BY (unique tie-breaker) and identical output column
  * names on both sides; double outputs are derived from exact decimal sums
  * or single IEEE ops so Spark and DuckDB agree bit-for-bit.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String)(sql: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(sql))
}
