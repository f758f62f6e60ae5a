package graft.operators

import java.io.ByteArrayOutputStream

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function completeness (ntile / percent_rank / cume_dist /
  * first_value / last_value / nth_value with explicit frames), wide↔long
  * reshaping (pivot / unpivot), a bloom-prefiltered semi join, and the
  * exact-moment statistical family (least-squares regression, Pearson r,
  * Gini diversity) — SURVEY.md §2.6 (W-family tail), §2.7, §2.11.
  *
  * Reference behavior mirrored: the reference's SQL surface exposes the
  * full window-function family and conditional-aggregate pivoting
  * (SURVEY.md §2.6, §3.3); the statistical rows follow the §2.11
  * analytics posture. Architecture is Spark-first throughout: declarative
  * window specs (Catalyst plans the partial sort per partition), the
  * built-in `pivot`/`unpivot` operators (one hash aggregate / one Expand,
  * no per-column jobs), and exact integer/decimal moments with the final
  * IEEE ops written identically on the Spark and DuckDB sides.
  */
object Analytics {

  /** The events fixture's closed event-type vocabulary (FIXTURES.md). The
    * pivot pins these as explicit values so the plan is a single hash
    * aggregate — no values-discovery job, and at 100 TB no risk of a
    * runaway column count from a dirty dimension.
    */
  private[graft] val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Pivoted per-day event-type counts — shared by q116 (wide output) and
    * q117 (unpivoted back to long). Explicit pivot values keep it one
    * shuffle; absent (day, type) cells surface as 0, not null, so the
    * wide→long round trip is total.
    */
  private def pivotWide(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val wide = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(wide)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
  }

  /** Bloom-prefiltered semi join `fact ⋉ dim` on a BIGINT key: a
    * BloomFilter over the dimension keys is probed IN THE SCAN STAGE via
    * the codegen'd `bloom_might_contain_long` expression (cutting
    * non-matching fact rows before any join machinery), then an exact
    * semi join removes the filter's false positives — result ≡ the plain
    * semi join.
    *
    * The exact join SWITCHES on dimension size (`maxBroadcastRows`):
    *  - within broadcast scale → broadcast-hash semi (no fact shuffle at
    *    all — the prefilter is belt-and-braces here);
    *  - past it → sort-merge semi, where the prefilter earns its keep: at
    *    a ~1% fpp it cuts ~all non-matching fact rows BEFORE the
    *    fact-side shuffle the SMJ needs — the 100-TB posture for a
    *    dimension too large to broadcast.
    *
    * Build cost: `df.stat.bloomFilter` is a distributed partial-filter
    * aggregate whose MERGED filter lands on the driver (same driver-memory
    * class as a broadcast build — fine at broadcast scale, and past it
    * the filter is sized by `expectedDim`, not by dimension rows). At a
    * dimension where even the merged filter strains the driver, the
    * scale-out path is Spark's runtime bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) or a
    * `bloom_filter_agg`-style exchange that keeps the filter on
    * executors; this operator deliberately keeps the explicit build so
    * the probe stays a scan-stage codegen'd literal.
    */
  private[graft] def bloomSemiJoin(fact: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame, factKey: String, dimKey: String,
      maxBroadcastRows: Long = 4000000L): org.apache.spark.sql.DataFrame = {
    graft.plans.GraftExtensions.register(fact.sparkSession)
    // the dimension feeds three consumers (count for sizing, the filter
    // build, the exact join's build side) — materialize the scan once
    val d = graft.Materialize.ephemeral(dim.select(col(dimKey)))
    // Dimension-sized driver jobs (count + filter build). 2× headroom on
    // the expected count keeps the realized fpp at/below the 1% target.
    val nDim = math.max(d.count(), 1L)
    val bloom = d.stat.bloomFilter(dimKey, nDim * 2, 0.01)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val pre = fact.filter(
      call_function("bloom_might_contain_long", col(factKey), lit(bytes)))
    if (nDim <= maxBroadcastRows)
      pre.join(broadcast(d), pre(factKey) === d(dimKey), "left_semi")
    else
      // explicit merge hint: past broadcast scale the planner must not
      // fall back to broadcasting an over-threshold build side
      pre.join(d.hint("merge"), pre(factKey) === d(dimKey), "left_semi")
  }

  val specs: Seq[QuerySpec] = Seq(

    // ----- W-family: ntile bucketing --------------------------------------
    // Equal-frequency quartiles of customers per market segment by balance.
    // The ordering carries a unique tie-breaker (c_custkey) so bucket
    // membership is a total function of the data — identical in any
    // engine and under any partitioning. Output is segment×tile (20 rows
    // at every scale): the window sorts within segment partitions, then
    // collapses to a dimension-sized frame before leaving the stage.
    QuerySpec("q113_ntile_buckets")(
      """SELECT c_mktsegment, tile, count(*) AS n,
        |  min(c_acctbal) AS lo_bal, max(c_acctbal) AS hi_bal,
        |  min(c_custkey) AS first_key
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |          ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS tile
        |      FROM customer)
        |GROUP BY c_mktsegment, tile
        |ORDER BY c_mktsegment, tile""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("tile", ntile(4).over(w).cast(LongType))
        .groupBy("c_mktsegment", "tile")
        .agg(count(lit(1)).as("n"),
          min("c_acctbal").as("lo_bal"), max("c_acctbal").as("hi_bal"),
          min("c_custkey").as("first_key"))
        .orderBy("c_mktsegment", "tile")
    },

    // ----- W-family: percent_rank + cume_dist -----------------------------
    // Relative standing of every customer within their nation. Both
    // functions are rank-derived ((rank-1)/(n-1), |rows ≤ peer|/n): ties
    // on c_acctbal get identical values by definition, so no tie-breaker
    // is needed INSIDE the window — only the output ORDER BY carries one.
    // Each value is a single IEEE division of two small exact integers —
    // bit-equal across engines. Partitions are nation-sized (|customers|
    // / 25): far below any single-task comfort bound at 100 TB.
    QuerySpec("q114_percent_cume")(
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
        |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
      Tables.load(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy("c_nationkey", "c_custkey")
    },

    // ----- W-family: first/last/nth_value over an explicit ROWS frame -----
    // Per-user purchase context window: for each purchase, the frame
    // [3 preceding, 1 following] in (ts, event_id) order — first, last,
    // and second event of the frame. The ordering is total (event_id
    // tie-break), so frame contents are deterministic; nth_value(2) is
    // NULL exactly when the frame holds one row (both engines). The
    // filter runs BEFORE the window: the sort is over the purchase
    // subset, not the full event stream.
    QuerySpec("q115_frame_values")(
      """SELECT user_id, event_id,
        |  first_value(event_id) OVER w AS fv,
        |  last_value(event_id) OVER w AS lv,
        |  nth_value(event_id, 2) OVER w AS nv2
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 1)
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          first(col("event_id")).over(w).as("fv"),
          last(col("event_id")).over(w).as("lv"),
          nth_value(col("event_id"), 2).over(w).as("nv2"))
        .orderBy("user_id", "event_id")
    },

    // ----- pivot: long → wide (conditional-aggregate reshaping) -----------
    // Daily event-type matrix via the native pivot operator. Catalyst
    // plans it as a two-phase aggregate — (day, type) pre-aggregate with
    // map-side combine, then a day-keyed pivotfirst — so both shuffles
    // carry dimension-sized data (≤ days×types rows per partition), and
    // the pinned values list means no values-discovery job. Semantically
    // identical to the oracle's count(*) FILTER form.
    QuerySpec("q116_pivot_wide")(
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
      pivotWide(s, dir).orderBy("day")
    },

    // ----- unpivot: wide → long (Expand, single scan) ---------------------
    // The q116 matrix melted back to (day, event_type, n) — Spark's native
    // `unpivot` (one Expand node over the aggregated frame, no join, no
    // extra shuffle). Zero cells are retained, so the long form is the
    // day×type cross product — which is what the oracle reconstructs.
    QuerySpec("q117_unpivot_long")(
      """WITH agg AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |             FROM events GROUP BY 1, 2),
        |  days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |  types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type)
        |SELECT d.day, t.event_type, coalesce(a.n, 0) AS n
        |FROM days d CROSS JOIN types t
        |LEFT JOIN agg a ON a.day = d.day AND a.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin) { (s, dir) =>
      pivotWide(s, dir)
        .unpivot(Array(col("day")), EventTypes.map(col).toArray, "event_type", "n")
        .orderBy("day", "event_type")
    },

    // ----- bloom-prefiltered semi join ------------------------------------
    // Lineitems restricted to small parts (p_size ≤ 5, ~2% of the part
    // dimension, ~10% of the fact) via [[bloomSemiJoin]] — result ≡ the
    // oracle's IN-subquery. This dimension sits within broadcast scale,
    // so the exact join broadcasts; past the gate the operator switches
    // to the sort-merge semi where the scan-stage probe pays for itself
    // (plan-pinned in PlanAssertionsSpec).
    QuerySpec("q118_bloom_semi")(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val dim = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 5).select(col("p_partkey"))
      val fact = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"), col("l_quantity"))
      bloomSemiJoin(fact, dim, "l_partkey", "p_partkey")
        .groupBy("l_returnflag")
        // DECIMAL accumulation, DOUBLE render — the q01/q119 boundary rule:
        // the sum is exact in decimal at any magnitude, and the single
        // final decimal→double cast is correctly rounded on both engines
        // (oracle VARCHAR-routed). No DECIMAL(p>18) may reach a compared
        // output column (driver hash canonicalization diverges on them).
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("qty"))
        .orderBy("l_returnflag")
    },

    // ----- exact-moment least squares + Pearson r -------------------------
    // Per-nation regression of order value (y) on customer balance (x),
    // both quantized to integer cents (floor(v*100) — the repo's
    // established cross-engine quantization). All five moments are EXACT
    // integer sums (DECIMAL(38,0) here, HUGEINT in the oracle): the
    // classic single-pass formulation's catastrophic cancellation never
    // happens because nothing is rounded until the final, identically
    // written IEEE ops (one cast per moment term, one divide / sqrt).
    // Per-row cross products stay in BIGINT (|x·y| < 2^63 for any cent
    // amount the schema admits); the sums are where 64 bits run out at
    // 100 TB, hence decimal accumulation. One shuffle: the (nation) hash
    // aggregate after a broadcast join onto the 25-row dimension.
    //
    // Oracle note: DuckDB's HUGEINT→DOUBLE cast decomposes into
    // upper·2⁶⁴ + lower in double arithmetic, which double-rounds (1-ulp
    // error whenever the upper word is live — including small NEGATIVE
    // values, whose upper word is the sign extension). The JVM's
    // Decimal→Double is correctly rounded, so the oracle routes every
    // moment cast through VARCHAR: DuckDB's string→double parse IS
    // correctly rounded, making both engines' doubles bit-identical.
    QuerySpec("q119_regr_exact")(
      """WITH pts AS (
        |  SELECT n_name,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS x,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |m AS (
        |  SELECT n_name, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM pts GROUP BY n_name),
        |d AS (
        |  SELECT n_name, n,
        |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS numd,
        |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS denxd,
        |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS denyd,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
        |  FROM m)
        |SELECT n_name, n,
        |  numd / denxd AS slope,
        |  (syd - (numd / denxd) * sxd) / CAST(n AS DOUBLE) AS intercept,
        |  numd / sqrt(denxd * denyd) AS r
        |FROM d ORDER BY n_name""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
      val customer = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val d38 = DecimalType(38, 0)
      val pts = orders
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          floor(col("c_acctbal") * 100).cast(LongType).as("x"),
          floor(col("o_totalprice") * 100).cast(LongType).as("y"))
      val m = pts.groupBy("n_name").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      val nD = col("n").cast(d38)
      val num = (nD * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
      val denX = (nD * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
      val denY = (nD * col("syy") - col("sy") * col("sy")).cast(DoubleType)
      val slope = num / denX
      m.select(col("n_name"), col("n"),
          slope.as("slope"),
          ((col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType))
            / col("n").cast(DoubleType)).as("intercept"),
          (num / sqrt(denX * denY)).as("r"))
        .orderBy("n_name")
    },

    // ----- Gini diversity of per-user event mix ---------------------------
    // Label-diversity profile for a behavioral corpus: 1 − Σc²/n² over
    // each user's event-type counts. Two keyed hash aggregates — the
    // first collapses the fact to (user × type) (≤ 5 rows per user), the
    // second to one row per user — then a single identically-shaped IEEE
    // expression. Σc² accumulates in DECIMAL(38,0) / HUGEINT: at 100 TB a
    // heavy user's c² exceeds 2^63 long before n does.
    // Oracle note: the Σc² and Σc casts route through VARCHAR for the
    // same reason as q119 — DuckDB's direct HUGEINT→DOUBLE double-rounds
    // once a heavy user pushes c² past the 64-bit word, the string parse
    // is correctly rounded like the JVM's Decimal→Double.
    QuerySpec("q120_gini_diversity")(
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS k,
        |  1 - CAST(CAST(sum(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE)
        |    / (CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE)) AS gini
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val d38 = DecimalType(38, 0)
      val c = Tables.load(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      c.groupBy("user_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
          sum((col("c").cast(d38) * col("c")).cast(d38)).as("ssq"))
        .select(col("user_id"), col("n"), col("k"),
          (lit(1.0) - col("ssq").cast(DoubleType)
            / (col("n").cast(DoubleType) * col("n").cast(DoubleType))).as("gini"))
        .orderBy("user_id")
    })
}
