package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The analytical SQL surface the reference exposes through ClickHouse
  * `/play` (SURVEY.md §2.2–§2.8, origin S), expressed Spark-first over the
  * driver fixtures. Each entry pairs a DataFrame plan with DuckDB oracle SQL.
  *
  * Numeric-parity rules (all money columns in the fixtures are exact
  * 2-decimal doubles):
  *  - sums aggregate over `DECIMAL(18,2)` casts (exact in both engines),
  *    final result cast to DOUBLE (exact: magnitudes < 2^53);
  *  - averages are `CAST(sum_dec AS DOUBLE) / CAST(count AS DOUBLE)` — one
  *    IEEE division, bit-identical across engines;
  *  - chained decimal products are re-cast to DECIMAL(18,4) between
  *    multiplies so DuckDB's width-38 multiply limit is never hit.
  */
object Relational {

  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(18, 4)
  private def dec(c: Column): Column = c.cast(D2)
  private def sumMoney(c: Column): Column = sum(dec(c)).cast(DoubleType)
  // Output-boundary rule for money sums (the q119 recipe, r10): ACCUMULATE
  // in DECIMAL (exact at any scale — at sf1+ the scaled integer exceeds
  // 2^53, so summing in DOUBLE would round), but RENDER the compared
  // column as DOUBLE via one correctly-rounded final decimal→double cast.
  // Both engines round the SAME exact decimal: the JVM's Decimal→Double
  // (BigDecimal.doubleValue — correctly rounded on every JDK path) and
  // DuckDB's string→double parse agree bit-for-bit, so the oracle routes
  // its cast through VARCHAR (DuckDB's direct HUGEINT-backed cast
  // double-rounds — see the verify skill note). Wide DECIMAL(p>18) must
  // never appear in a compared output column: the driver's hash
  // canonicalization diverges on them even when values are bit-identical
  // (r9: q01/q118/q68 were the only wide-decimal outputs and the only
  // hash fails).
  private def sumMoneyD(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // ----- A2/A1: hash aggregate with partial/final combine (flagship) ----
    QuerySpec("q01_pricing_summary")(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val discPrice = (dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount")))).cast(D4)
      li.filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoneyD(col("l_quantity")).as("sum_qty"),
          sumMoneyD(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice).cast(DoubleType).as("sum_disc_price"),
          sum(discPrice * (lit(1).cast(D2) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ----- T1/T2: filter + projection with computed column ----------------
    QuerySpec("q02_filter_project")(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
        |  AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
                col("l_shipdate") < lit("1996-02-01 00:00:00").cast(TimestampType) &&
                col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ----- P5: top-k (TakeOrderedAndProject) ------------------------------
    QuerySpec("q03_sort_limit_topk")(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // ----- A3: distinct ---------------------------------------------------
    QuerySpec("q04_distinct")(
      """SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment""") { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    },

    // ----- A3: count-distinct per group -----------------------------------
    QuerySpec("q05_count_distinct")(
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },

    // ----- J1: broadcast hash join (small dim explicitly broadcast) -------
    QuerySpec("q06_join_broadcast")(
      """SELECT p_brand,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum((dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount")))).cast(D4))
               .cast(DoubleType).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    },

    // ----- J2: sort-merge join (hinted; the at-scale default for big×big) -
    QuerySpec("q07_join_sortmerge")(
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast(TimestampType))
      val li = Tables.load(s, dir, "lineitem")
      o.hint("merge")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum((dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount")))).cast(D4))
               .cast(DoubleType).as("revenue"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // ----- J3: left outer join + coalesce default (topic-default pattern,
    //       Producer_clickhouse.py:86–92) ---------------------------------
    QuerySpec("q08_join_left_coalesce")(
      """SELECT c_custkey, c_name,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent,
        |  count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast(DoubleType).as("total_spent"),
             count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // ----- J4: left-semi (EXISTS) -----------------------------------------
    QuerySpec("q09_join_semi")(
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    },

    // ----- J4: left-anti (NOT EXISTS) -------------------------------------
    QuerySpec("q10_join_anti")(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ----- J1+J2: multiway star join (region→nation→customer→orders→lineitem)
    QuerySpec("q11_star_join")(
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation   ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders   ON o_custkey   = c_custkey
        |JOIN lineitem ON l_orderkey  = o_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
                col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      val li = Tables.load(s, dir, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((dec(col("l_extendedprice")) * (lit(1).cast(D2) - dec(col("l_discount")))).cast(D4))
               .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ----- A2: exact variance from decimal sums (engine-agnostic stats) ---
    QuerySpec("q12_agg_variance")(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |   / (CAST(count(*) AS DOUBLE) - 1)) AS BIGINT) AS variance
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      // Both engines build the identical IEEE double from exact decimal
      // sums, so the only cross-engine divergence is rounding AT the .5
      // boundary — floor (identical on identical doubles) instead of
      // round, per the repo-wide parity convention.
      val o = Tables.load(s, dir, "orders")
      val sumD = sum(dec(col("o_totalprice"))).cast(DoubleType)
      val sumSq = sum(dec(col("o_totalprice")) * dec(col("o_totalprice"))).cast(DoubleType)
      val n = count(lit(1)).cast(DoubleType)
      o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             sumD.as("total"),
             floor((sumSq - sumD * sumD / n) / (n - lit(1.0))).cast(LongType).as("variance"))
        .orderBy(col("o_orderpriority"))
    },

    // ----- A7: rollup -----------------------------------------------------
    QuerySpec("q13_rollup")(
      """SELECT n_name, c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumMoney(col("c_acctbal")).as("bal"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    },

    // ----- A7: cube -------------------------------------------------------
    QuerySpec("q14_cube")(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // ----- A8: conditional aggregates (countIf/avgIf) ---------------------
    QuerySpec("q15_conditional_agg")(
      """SELECT c_nationkey,
        |  count(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
        |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building,
        |  CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'BUILDING'), 0) AS DOUBLE) AS building_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          count(when(col("c_acctbal") > 5000, 1)).as("n_rich"),
          count(when(col("c_mktsegment") === "BUILDING", 1)).as("n_building"),
          coalesce(sum(when(col("c_mktsegment") === "BUILDING", dec(col("c_acctbal")))), lit(0))
            .cast(DoubleType).as("building_bal"))
        .orderBy(col("c_nationkey"))
    },

    // ----- W2: rank / top-n per group -------------------------------------
    QuerySpec("q16_window_rank")(
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rk
        |  FROM events) t
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin) { (s, dir) =>
      // event_type is low-cardinality, so the naive per-key window funnels
      // the corpus through a handful of tasks at scale — salted two-phase
      // top-k (TopK.perKeyTopK) keeps it exact (total order via the
      // event_id tiebreak) with bounded per-task row counts.
      TopK.perKeyTopK(Tables.load(s, dir, "events"),
          keys = Seq(col("event_type")),
          order = Seq(col("value").desc, col("event_id").asc),
          k = 5, saltFrom = col("event_id"))
        .select(col("event_type"), col("rk"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("rk"))
    },

    // ----- W3: lag (delta vs previous reading — SURVEY §2.6 W3) -----------
    QuerySpec("q17_window_lag")(
      """SELECT user_id, event_id, value,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, CAST(ts AS TIMESTAMP), event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .filter(col("user_id") < 10)
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("value"), col("delta"))
    },

    // ----- W4: sliding-frame moving aggregate -----------------------------
    QuerySpec("q18_window_moving")(
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS msum,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE) AS mavg
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, CAST(ts AS TIMESTAMP), event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "events")
        .filter(col("user_id") < 10)
        .withColumn("msum", sum(dec(col("value"))).over(w).cast(DoubleType))
        .withColumn("mavg", col("msum") / count(lit(1)).over(w).cast(DoubleType))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("msum"), col("mavg"))
    },

    // ----- set ops: INTERSECT ---------------------------------------------
    QuerySpec("q19_intersect")(
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey"))
      val bld = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      big.intersect(bld).orderBy(col("custkey"))
    },

    // ----- set ops: EXCEPT ------------------------------------------------
    QuerySpec("q20_except")(
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val bld = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val buyers = Tables.load(s, dir, "orders").select(col("o_custkey").as("custkey"))
      bld.except(buyers).orderBy(col("custkey"))
    },

    // ----- set ops: UNION (distinct) --------------------------------------
    QuerySpec("q21_union")(
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9900
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("custkey"))
      val rich = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .select(col("c_custkey").as("custkey"))
      big.union(rich).distinct().orderBy(col("custkey"))
    },

    // ----- §2.8 string functions ------------------------------------------
    QuerySpec("q22_string_funcs")(
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 5) AS prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS snake,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"))
        .orderBy(col("p_partkey"))
    },

    // ----- §2.8 date/time functions (incl. toYYYYMM analog, T7/T8) -------
    QuerySpec("q23_datetime_funcs")(
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  strftime(o_orderdate, '%Y%m') AS yyyymm,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Spark's year/month/dayofmonth/datediff emit INT; DuckDB's emit
      // BIGINT (and epoch() emits DOUBLE) — widen both sides to BIGINT so
      // the Arrow schemas hash identically.
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          date_format(col("o_orderdate"), "yyyyMM").as("yyyymm"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
          datediff(lit("2000-01-01").cast(DateType), col("o_orderdate")).cast(LongType)
            .as("days_to_y2k"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    },

    // ----- §2.8 JSON functions (T4 analog over events.props) --------------
    QuerySpec("q24_json_funcs")(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1) AS missing_defaulted
        |FROM events WHERE event_id % 50 = 0 ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .filter(col("event_id") % 50 === 0)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          coalesce(get_json_object(col("props"), "$.missing").cast(LongType), lit(-1L))
            .as("missing_defaulted"))
        .orderBy(col("event_id"))
    },

    // ----- §2.8 math + CASE WHEN ------------------------------------------
    QuerySpec("q25_math_case")(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS qdev,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  floor(l_extendedprice / 7 * 100) / 100 AS price_div,
        |  l_partkey % 7 AS pmod,
        |  sqrt(l_quantity) AS qroot,
        |  greatest(l_quantity, 25.0) AS qmax,
        |  CASE WHEN l_quantity < 10 THEN 'small'
        |       WHEN l_quantity < 40 THEN 'mid' ELSE 'large' END AS bucket
        |FROM lineitem WHERE l_orderkey % 500 = 0 AND l_linenumber = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0 && col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("qdev"),
          ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
          floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
          (floor(col("l_extendedprice") / 7 * 100) / 100).as("price_div"),
          (col("l_partkey") % 7).as("pmod"),
          sqrt(col("l_quantity")).as("qroot"),
          greatest(col("l_quantity"), lit(25.0)).as("qmax"),
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 40, "mid")
            .otherwise("large").as("bucket"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ----- P1/P2/P3 + W1: deterministic round-robin routing
    //       (city_loader.py:26–44 semantics over the customer dim) ---------
    QuerySpec("q26_route_roundrobin")(
      """SELECT c_custkey, c_name,
        |  concat('weather_topic_', CAST((rn - 1) % 3 + 1 AS VARCHAR)) AS topic
        |FROM (SELECT c_custkey, c_name,
        |        row_number() OVER (ORDER BY c_name, c_custkey) AS rn
        |      FROM customer) t
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      // Two-phase numbering (Ordinals.globalRowNumberNative) instead of a
      // global Window.orderBy: no single-partition exchange and no RDD
      // round-trip; same deterministic sorted-by-name i%3+1 routing. The
      // c_custkey tiebreak makes the order TOTAL: c_name is unique in the
      // driver fixtures, but replicated keys (the sf1 DataGen set — or any
      // real-world city list with colliding names) would otherwise leave
      // round-robin assignment order-dependent under ties.
      Ordinals.globalRowNumberNative(
          Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          "rn", "c_name", tieCols = Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          concat(lit("weather_topic_"), ((col("rn") - 1) % 3 + 1).cast(StringType)).as("topic"))
        .orderBy(col("c_custkey"))
    },

    // ----- T3: point lookup -----------------------------------------------
    QuerySpec("q27_point_lookup")(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_name = 'Customer#000000042'""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_name") === "Customer#000000042")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // ----- A5: exact percentile (ClickHouse quantile analog) --------------
    QuerySpec("q28_percentile")(
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
             percentile(col("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy(col("o_orderpriority"))
    },

    // ----- A6: argMax/argMin (max_by/min_by with unique-key tiebreak) -----
    QuerySpec("q29_argmax")(
      """SELECT c_nationkey,
        |  max_by(c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000 + c_custkey) AS richest_cust,
        |  min_by(c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000 + c_custkey) AS poorest_cust,
        |  max(c_acctbal) AS max_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      // argMax tie-break must be total: the ordering key packs exact cents
      // (decimal-cast, so no double-truncation skew) with the unique custkey.
      val key = (dec(col("c_acctbal")) * 100).cast(LongType) * 10000000L + col("c_custkey")
      Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_custkey"), key).as("richest_cust"),
          min_by(col("c_custkey"), key).as("poorest_cust"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy(col("c_nationkey"))
    },

    // ----- A4: approximate count-distinct (HLL). Spark HLL++ and DuckDB
    //       HLL produce different estimates, so the cross-engine-stable
    //       output is the exact count plus a per-engine "estimate within
    //       5% of exact" boolean — each engine validates its own sketch. --
    QuerySpec("q30_approx_distinct")(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE) - count(DISTINCT l_partkey))
        |    / count(DISTINCT l_partkey) < 0.05 AS parts_within_5pct,
        |  abs(CAST(approx_count_distinct(l_orderkey) AS DOUBLE) - count(DISTINCT l_orderkey))
        |    / count(DISTINCT l_orderkey) < 0.05 AS orders_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // Exact distincts run as two-level aggregates (partial dedup map-side,
      // then count) joined back on the 3-row group key — NOT as multi-
      // distinct aggregates in one groupBy, whose Expand triples the scan's
      // rows through the aggregation. rsd=0.01 (vs the 0.05 default) keeps
      // Spark's HLL++ estimate comfortably inside the 5% acceptance band
      // the oracle also applies to DuckDB's own sketch.
      // r17 note: an ephemeral localCheckpoint of the 3-col projection
      // (one scan feeding all three legs) was MEASURED SLOWER at sf0.1
      // (2.7 → 3.1 s — checkpoint write+read beats two extra columnar
      // scans only when the scan is remote/expensive); left as three
      // pruned parquet scans deliberately.
      val li = Tables.load(s, dir, "lineitem")
      def exact(c: String, out: String) =
        li.select(col("l_returnflag"), col(c)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(out))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
             approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      exact("l_partkey", "exact_parts")
        .join(exact("l_orderkey", "exact_orders"), "l_returnflag")
        .join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap").cast(DoubleType) - col("exact_parts"))
            / col("exact_parts") < 0.05).as("parts_within_5pct"),
          (abs(col("ao").cast(DoubleType) - col("exact_orders"))
            / col("exact_orders") < 0.05).as("orders_within_5pct"))
        .orderBy(col("l_returnflag"))
    }
  )
}
