package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining S-surface families: UNION ALL (multiset), explicit GROUPING
  * SETS, array higher-order functions as a query surface, and a time-range
  * window frame (SURVEY.md §2.6 W4's `rangeBetween` variant, §2.7, §2.8
  * array family).
  */
object Extras {

  /** q106 irregular price tiers in integer cents ([lo, hi)): deliberately
    * NOT granule-aligned, so the bucket equi-join alone over-matches and
    * the exact range filter is doing real work (the spec asserts tier
    * totals partition the table).
    */
  private[operators] val RangeTiers: Seq[(String, Long, Long)] = Seq(
    ("t1_budget", 0L, 123_400L),
    ("t2_mid", 123_400L, 1_777_700L),
    ("t3_premium", 1_777_700L, 5_250_000L),
    ("t4_luxury", 5_250_000L, 8_000_001L),
    ("t5_ultra", 8_000_001L, 20_000_000L))

  /** Bucket granule (cents). ~160 exploded (tier, bucket) rows over the
    * 0–2e7 cent domain — dimension-sized at any fact scale.
    */
  private[operators] val RangeGranule = 125_000L

  val specs: Seq[QuerySpec] = Seq(

    // ----- UNION ALL (multiset semantics, duplicates preserved) -----------
    QuerySpec("q49_union_all")(
      """SELECT src, custkey FROM (
        |  SELECT 'big_order' AS src, o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
        |  UNION ALL
        |  SELECT 'rich' AS src, c_custkey FROM customer WHERE c_acctbal > 9900)
        |ORDER BY src, custkey""".stripMargin) { (s, dir) =>
      val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(lit("big_order").as("src"), col("o_custkey").as("custkey"))
      val rich = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .select(lit("rich").as("src"), col("c_custkey").as("custkey"))
      big.unionAll(rich).orderBy(col("src"), col("custkey"))
    },

    // ----- explicit GROUPING SETS (beyond rollup/cube, via the SQL door) --
    QuerySpec("q50_grouping_sets")(
      """SELECT n_name, c_mktsegment, count(*) AS n,
        |  CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, c_mktsegment, count(*) AS n,
          |  CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE) AS bal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
          |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    },

    // ----- array higher-order functions as query surface ------------------
    // Scalar outputs only (exact integer projections of the float vector),
    // so the oracle compare stays hashable and engine-exact.
    QuerySpec("q51_array_hof")(
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  CAST(list_sum(list_transform(embedding, x -> abs(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))) AS BIGINT) AS l1_micro,
        |  list_max(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS max_micro
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // size() emits INT vs DuckDB len()'s BIGINT, and DuckDB list_sum over
      // BIGINT widens to HUGEINT — pin both sides to BIGINT for the hash.
      val micro = transform(col("embedding"),
        x => floor(x.cast(DoubleType) * 1000000).cast(LongType))
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          size(filter(col("embedding"), x => x > 0)).cast(LongType).as("n_pos"),
          aggregate(transform(micro, x => abs(x)), lit(0L), (a, x) => a + x).as("l1_micro"),
          array_max(micro).as("max_micro"))
        .orderBy(col("vec_id"))
    },

    // ----- dataset profiling (per-column stats, the data-quality op a
    //       training pipeline runs before ingesting a new source) ----------
    QuerySpec("q54_profile") {
      def oneCol(c: String) =
        s"""SELECT '$c' AS col, count(*) AS n, count($c) AS n_nonnull,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
           |  count(DISTINCT $c) AS n_distinct
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(oneCol)
        .mkString("", "\nUNION ALL ", "\nORDER BY col")
    } { (s, dir) =>
      // r18 (guide §2.3 — don't multiply the rows you aggregate): the old
      // single aggregation carried 3 EXACT countDistincts, which plans as
      // an Expand ×4 of the whole scan through a two-level (gid, value)
      // hash-agg — measured 3.98 s isolated at sf0.1. Splitting the exact
      // distincts into THREE single-column aggregations (each a pruned
      // one-column parquet scan + partial distinct) and crossJoining the
      // four 1-row results computes the identical numbers in 0.96 s
      // (Scratch dissection, min of 3): columnar scans are cheap, the
      // Expand is not. Same rows, same schema, same oracle hash.
      // Scale note (SCALE.md): exact distincts stay the audit path;
      // production profiling belongs on q70's mergeable HLL sketches.
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = Tables.load(s, dir, "lineitem")
      val base = li.agg(count(lit(1)).as("n"), cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_n_nonnull"),
        min(col(c)).cast(DoubleType).as(s"${c}_min_v"),
        max(col(c)).cast(DoubleType).as(s"${c}_max_v"),
        sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType).as(s"${c}_sum_v"))): _*)
      val joined = cols.foldLeft(base)((acc, c) =>
        acc.crossJoin(li.select(col(c)).distinct()
          // count(col), not count(*): countDistinct excludes NULL, and a
          // nullable column's distinct() keeps one NULL row
          .agg(count(col(c)).as(s"${c}_n_distinct"))))
      val stackRows = cols.map(c =>
        s"'$c', n, ${c}_n_nonnull, ${c}_min_v, ${c}_max_v, ${c}_sum_v, ${c}_n_distinct")
      joined
        .selectExpr(s"stack(${cols.size}, ${stackRows.mkString(", ")}) " +
          "AS (col, n, n_nonnull, min_v, max_v, sum_v, n_distinct)")
        .orderBy(col("col"))
    },

    // ----- fixed-bin value histogram per group (histogram analog) ---------
    // ClickHouse `histogram(N)(value)` per event_type, with deterministic
    // fixed-width bins instead of the adaptive (and per-run unstable)
    // streaming-merge bins: bounds come from an exact per-type min/max
    // aggregate (dimension-sized, explicitly broadcast back), bin =
    // least(floor((v − mn)/w), 9) on the identical IEEE doubles in both
    // engines. Two scans of events, one tiny broadcast, no shuffle of the
    // fact side beyond the final (type, bin) hash-agg — at 100 TB the
    // min/max pre-pass is the cheap half of the cost of a histogram that
    // needs true bounds.
    QuerySpec("q87_value_histogram")(
      """WITH b AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  CASE WHEN b.mx = b.mn THEN 0
        |       ELSE CAST(least(floor((e.value - b.mn) / ((b.mx - b.mn) / 10.0)), 9.0) AS BIGINT)
        |  END AS bin,
        |  count(*) AS n, b.mn, b.mx
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type, bin, b.mn, b.mx
        |ORDER BY e.event_type, bin""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events").select(col("event_type"), col("value"))
      val b = e.groupBy(col("event_type"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val bin = when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(floor((col("value") - col("mn")) /
          ((col("mx") - col("mn")) / lit(10.0))), lit(9.0)).cast(LongType))
      e.join(broadcast(b), Seq("event_type"))
        .groupBy(col("event_type"), bin.as("bin"), col("mn"), col("mx"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("bin"), col("n"), col("mn"), col("mx"))
        .orderBy(col("event_type"), col("bin"))
    },

    // ----- calendar gap-fill with carry-forward (WITH FILL analog) --------
    // ClickHouse `ORDER BY day WITH FILL` + `INTERPOLATE (n AS prev)`: the
    // per-type daily series with missing days materialized (n = 0,
    // filled = 1) and the last OBSERVED day's count carried forward
    // (locf_n). The fact table is reduced to (type, day) counts by one
    // hash-agg FIRST; everything after — the per-type calendar spine
    // (explode over day offsets), the spine⟕counts join (explicitly
    // broadcast: counts are calendar-sized), and the LOCF window — runs on
    // frames bounded by days × types, independent of fact cardinality. The
    // per-type window parallelism is #types, which is fine precisely
    // because the window input is the spine, never the 100 TB fact scan.
    // The DuckDB oracle derives LOCF through its native ASOF join instead
    // of IGNORE NULLS — a cross-derivation check of the fill semantics.
    QuerySpec("q89_gap_fill")(
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM d GROUP BY 1),
        |cal AS (SELECT event_type,
        |          CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |                 CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |        FROM b),
        |j AS (SELECT c.event_type, c.day, d.n FROM cal c
        |      LEFT JOIN d ON c.event_type = d.event_type AND c.day = d.day)
        |SELECT j.event_type, j.day, coalesce(j.n, 0) AS n,
        |  CASE WHEN j.n IS NULL THEN 1 ELSE 0 END AS filled,
        |  f.n AS locf_n
        |FROM j ASOF LEFT JOIN d f
        |  ON j.event_type = f.event_type AND f.day <= j.day
        |ORDER BY j.event_type, j.day""".stripMargin) { (s, dir) =>
      // localCheckpoint (the q65/q69 pattern): both the spine bounds and
      // the broadcast join side read `d` — materializing the calendar-sized
      // agg once keeps the 100 TB fact scan from running twice.
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .transform(graft.Materialize.ephemeral)
      val cal = d.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .select(col("event_type"), col("mn"),
          explode(sequence(lit(0), datediff(col("mx"), col("mn")))).as("i"))
        .select(col("event_type"), date_add(col("mn"), col("i")).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      cal.join(broadcast(d), Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          when(col("n").isNull, 1).otherwise(0).as("filled"),
          last(col("n"), ignoreNulls = true).over(w).as("locf_n"))
        .orderBy(col("event_type"), col("day"))
    },

    // ----- salted join, oracle-checked ------------------------------------
    // The skew technique as a query surface: Skew.saltedJoin splits each
    // (potentially hot) fact key across 8 salt sub-keys and replicates the
    // dim once per salt — results are IDENTICAL to the plain join, which
    // is exactly what the oracle (a plain join) verifies.
    QuerySpec("q61_salted_join")(
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Skew.saltedJoin(li, p, "l_partkey", salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))
            * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("p_brand"))
    },

    // ----- approximate quantiles with a per-engine acceptance oracle ------
    // Same pattern as q30: the sketches differ by engine (Spark
    // percentile_approx vs DuckDB t-digest), so the cross-engine-stable
    // output is the exact quantile plus each engine checking its own
    // estimate against a 2% band.
    QuerySpec("q62_approx_quantile")(
      """SELECT o_orderpriority,
        |  CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS exact_median,
        |  abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
        |    / quantile_cont(o_totalprice, 0.5) < 0.02 AS approx_within_2pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile(col("o_totalprice"), lit(0.5)).as("exact_median"),
          (abs(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            - percentile(col("o_totalprice"), lit(0.5)))
            / percentile(col("o_totalprice"), lit(0.5)) < 0.02).as("approx_within_2pct"))
        .orderBy(col("o_orderpriority"))
    },

    // ----- §2.8 map scalar family -----------------------------------------
    // map_from_entries / element_at-on-map / map_keys / cardinality as a
    // query surface: per-nation segment→count maps with defaulted lookups
    // (the map formulation of the P3 topic-lookup-with-default pattern the
    // weather path implements as a broadcast join). try_element_at, not
    // element_at: ANSI mode throws on missing map keys.
    QuerySpec("q55_map_funcs")(
      """WITH seg AS (SELECT c_nationkey, c_mktsegment AS k, count(*) AS n
        |             FROM customer GROUP BY 1, 2),
        |m AS (SELECT c_nationkey,
        |        map_from_entries(list_sort(list({'key': k, 'value': n}))) AS seg_counts
        |      FROM seg GROUP BY c_nationkey)
        |SELECT c_nationkey,
        |  coalesce(map_extract(seg_counts, 'BUILDING')[1], -1) AS building_custs,
        |  coalesce(map_extract(seg_counts, 'NO SUCH SEGMENT')[1], -1) AS missing_defaulted,
        |  CAST(cardinality(seg_counts) AS BIGINT) AS n_segments,
        |  array_to_string(map_keys(seg_counts), ',') AS segs
        |FROM m ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment").as("k"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("c_nationkey"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("k"), col("n")))))
          .as("seg_counts"))
        .select(col("c_nationkey"),
          coalesce(try_element_at(col("seg_counts"), lit("BUILDING")), lit(-1L))
            .as("building_custs"),
          coalesce(try_element_at(col("seg_counts"), lit("NO SUCH SEGMENT")), lit(-1L))
            .as("missing_defaulted"),
          size(col("seg_counts")).cast(LongType).as("n_segments"),
          array_join(map_keys(col("seg_counts")), ",").as("segs"))
        .orderBy(col("c_nationkey"))
    },

    // ----- time-range window frame (trailing 1 h sum per user) ------------
    QuerySpec("q52_range_frame")(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS trailing_1h,
        |  count(*) OVER w AS n_1h
        |FROM (SELECT event_id, user_id, value,
        |        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3600, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("sec", col("ts").cast(LongType))
        .withColumn("trailing_1h", sum(col("value").cast(DecimalType(28, 10))).over(w)
          .cast(DoubleType))
        .withColumn("n_1h", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("trailing_1h"), col("n_1h"))
        .orderBy(col("event_id"))
    },

    // ----- mergeable HLL sketches (incremental distinct at scale) ---------
    // The 100 TB incremental-stats pattern: build a DataSketches HLL per
    // partition-of-arrival (here: ship month), answer the corpus-wide
    // distinct from hll_union_agg over the PRE-AGGREGATED sketches — the
    // raw data is touched once, ever; new partitions just add sketches.
    // The merged __ALL__ estimate is derived ONLY from the monthly
    // sketches, so this query exercises the actual merge surface, not
    // approx_count_distinct again (q30 covers that). Sketch bits differ
    // per engine, so the oracle is q30's per-engine acceptance band:
    // exact counts must hash-match, each engine's estimate must sit
    // within 5% of its own exact value (lgK=14 → ~0.8% standard error,
    // comfortable margin).
    QuerySpec("q70_sketch_union")(
      """SELECT grp, n_exact, within_5pct FROM (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS grp,
        |    count(DISTINCT l_partkey) AS n_exact,
        |    abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE) - count(DISTINCT l_partkey))
        |      / count(DISTINCT l_partkey) < 0.05 AS within_5pct
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT '__ALL__' AS grp,
        |    count(DISTINCT l_partkey) AS n_exact,
        |    abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE) - count(DISTINCT l_partkey))
        |      / count(DISTINCT l_partkey) < 0.05 AS within_5pct
        |  FROM lineitem)
        |ORDER BY grp""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("grp"), col("l_partkey"))
      // r18 (guide §2.3 — aggregate before you shuffle again): ONE distinct
      // over (grp, partkey) feeds everything. The sketches are bit-identical
      // built from distinct pairs (HLL registers are max-of-leading-zeros —
      // duplicate inserts are no-ops), the per-month exact count is a
      // dedup-free count over the pairs, and the __ALL__ exact distinct now
      // dedups the already-collapsed pair frame instead of re-scanning and
      // re-shuffling the raw 600 k-row stream a third time. The checkpoint
      // has three consumers (sketches / per-month / total).
      val dp = graft.Materialize.ephemeral(li.distinct())
      val sketches = dp.groupBy(col("grp"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
      val perMonth = dp
        .groupBy(col("grp")).agg(count(lit(1)).as("n_exact"))
        .join(sketches.select(col("grp"),
          hll_sketch_estimate(col("sk")).as("est")), "grp")
      val total = dp.select(col("l_partkey")).distinct()
        .agg(count(lit(1)).as("n_exact"))
        .crossJoin(sketches.agg(hll_union_agg(col("sk"), lit(false)).as("sku"))
          .select(hll_sketch_estimate(col("sku")).as("est")))
        .select(lit("__ALL__").as("grp"), col("n_exact"), col("est"))
      perMonth.select(col("grp"), col("n_exact"), col("est"))
        .unionByName(total)
        .select(col("grp"), col("n_exact"),
          (abs(col("est").cast(DoubleType) - col("n_exact"))
            / col("n_exact") < 0.05).as("within_5pct"))
        .orderBy(col("grp"))
    },

    // ----- dense_rank + lead (W2/W3's remaining functions) ----------------
    // The two window functions the rank/lag queries (q16/q17) don't touch,
    // run where they belong at scale: over the AGGREGATED (type × day)
    // daily-totals frame — calendar-bounded, so the per-type windows never
    // see corpus-sized partitions (same posture as the gap-fill/LOCF
    // family; contrast q16, whose per-type top-k over raw events needs the
    // salted two-phase path). dense_rank ties are real (integer counts
    // collide) — exactly what distinguishes it from rank — and the total
    // output order comes from (event_type, day), not the ranking.
    QuerySpec("q112_dense_rank_lead")(
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  dense_rank() OVER (PARTITION BY event_type ORDER BY n DESC) AS volume_rank,
        |  lead(n) OVER (PARTITION BY event_type ORDER BY day) AS next_day_n
        |FROM d ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val byVol = Window.partitionBy(col("event_type")).orderBy(col("n").desc)
      val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
      d.select(col("event_type"), col("day"), col("n"),
          dense_rank().over(byVol).as("volume_rank"),
          lead(col("n"), 1).over(byDay).as("next_day_n"))
        .orderBy(col("event_type"), col("day"))
    },

    // ----- bucketized range join (interval join without a theta join) -----
    // Facts joined to IRREGULAR value intervals (price tiers). The naive
    // plan is a nested-loop theta join (every fact row against every
    // tier); the scale technique is BUCKETIZATION: pick a granule G,
    // explode each tier into the coarse buckets it overlaps (bounded,
    // dimension-sized), equi-join facts on `price div G`, then apply the
    // exact lo ≤ x < hi filter on the few bucket-collision rows. The plan
    // becomes a broadcast HASH join — per-row work is O(tiers overlapping
    // its bucket), not O(all tiers) — and survives any fact-table scale.
    // The oracle runs DuckDB's native range join (IEJoin) over the SAME
    // tier table: a genuine cross-derivation of interval semantics.
    // Money in integer cents; sums through DECIMAL for exactness.
    QuerySpec("q106_range_join_tiers") {
      val tiersSql = RangeTiers.map { case (t, lo, hi) => s"SELECT '$t' AS tier, CAST($lo AS BIGINT) AS lo, CAST($hi AS BIGINT) AS hi" }
        .mkString("\n        |  UNION ALL ")
      s"""WITH tiers AS (
        |  $tiersSql),
        |f AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c, l_quantity
        |      FROM lineitem)
        |SELECT t.tier, count(*) AS n,
        |  CAST(sum(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  min(f.price_c) AS min_price_c, max(f.price_c) AS max_price_c
        |FROM f JOIN tiers t ON f.price_c >= t.lo AND f.price_c < t.hi
        |GROUP BY t.tier ORDER BY t.tier""".stripMargin
    } { (s, dir) =>
      import s.implicits._
      val g = RangeGranule
      // tier → overlapped buckets (dimension-sized explode, broadcast)
      val tiers = RangeTiers.toDF("tier", "lo", "hi")
        .select(col("tier"), col("lo"), col("hi"),
          explode(sequence(floor(col("lo") / g).cast(LongType),
            floor((col("hi") - 1) / g).cast(LongType))).as("bucket"))
      val f = Tables.load(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100).cast(LongType).as("price_c"),
          col("l_quantity"))
        .withColumn("bucket", expr(s"price_c div $g"))
      f.join(broadcast(tiers), Seq("bucket"))
        .filter(col("price_c") >= col("lo") && col("price_c") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
          min(col("price_c")).as("min_price_c"),
          max(col("price_c")).as("max_price_c"))
        .orderBy(col("tier"))
    }
  )
}
