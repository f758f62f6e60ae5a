package graft

/** Physical-plan regression guards: the plan properties SCALE.md claims
  * (scan pruning, pushdown, broadcast dims, top-k without global sort)
  * asserted against the real optimized plans, so a future refactor that
  * silently loses one fails loudly here.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: shipdate filter pushes down to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q01: scan reads only the referenced columns") {
    val p = plan("q01_pricing_summary")
    // 7 of lineitem's 11 columns are referenced; the scan schema must not
    // include the unused keys.
    assert(!p.contains("l_suppkey"))
    assert(!p.contains("l_partkey"))
  }

  test("q06: part dim joins as broadcast hash join") {
    val p = plan("q06_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q03: top-k plans TakeOrderedAndProject, not a global sort+limit") {
    val p = plan("q03_sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q39: query set broadcasts against the corpus scan") {
    val p = plan("q39_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q95: hard negatives broadcast the query set; top-k windows are salted") {
    val qe = SparkEntry.queries("q95_hard_negatives")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"q95 windows must be keyed (salted local + per-query final), got $windows")
  }

  test("q37: no cartesian product anywhere in the LSH pipeline") {
    val p = plan("q37_minhash_lsh")
    assert(!p.contains("CartesianProduct"))
  }

  test("q47: near-dup pairs come from the SRP bucket equi-join, not all-pairs") {
    val p = plan("q47_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q16: salted two-phase top-k matches the naive per-key window exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val naive = events.withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
      .select("event_type", "rk", "event_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val salted = operators.TopK.perKeyTopK(events,
        keys = Seq(col("event_type")),
        order = Seq(col("value").desc, col("event_id").asc),
        k = 5, saltFrom = col("event_id"))
      .select("event_type", "rk", "event_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && salted == naive)
  }

  test("q26: global row numbering plans no single-partition window and no RDD scan") {
    val qe = SparkEntry.queries("q26_route_roundrobin")(spark, dir).queryExecution
    // Every window must be partitioned (the native two-phase numbering
    // windows per bucket); an empty partitionSpec = the single-task global
    // window the operator exists to avoid.
    val globalWindows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"found global window:\n${globalWindows.headOption}")
    // And no Tungsten→RDD round-trip (the zipWithIndex fallback).
    assert(!qe.executedPlan.toString.contains("ExistingRDD"))
  }

  test("q153: substring dedup plans no pair join and only doc-keyed windows") {
    val qe = SparkEntry.queries("q153_substring_dedup")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    // The suffix-array analog must never fall back to pair enumeration:
    // anchors flow through ONE occurrence-count shuffle and a flag
    // re-join, both on the 60-bit gram hash.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q153 must not plan a pair join")
    // Run extension and span selection are doc-local — a global window
    // would serialize the corpus through one task.
    val globalWindows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"found global window:\n${globalWindows.headOption}")
  }

  test("Ordinals: both variants match the window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_name")
    val expected = cust
      .withColumn("rn", row_number().over(Window.orderBy(col("c_name"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val got = operators.Ordinals.globalRowNumber(cust, "rn", "c_name")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == expected)
    val gotNative = operators.Ordinals.globalRowNumberNative(cust, "rn", "c_name")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(gotNative == expected)
  }

  test("q30: exact distincts plan two-level aggregates, not a multi-distinct Expand") {
    val p = plan("q30_approx_distinct")
    assert(!p.contains("Expand"))
  }

  test("q36: inverted-index Jaccard never plans a cartesian or nested-loop join") {
    val p = plan("q36_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q37: minhash signatures run through the native codegen expression") {
    val p = plan("q37_minhash_lsh")
    assert(p.contains("minhash_sigs"))
  }

  test("q54: profile plans no multi-distinct Expand; one pruned scan per exact leg") {
    // r18: the three exact countDistincts used to ride ONE scan through a
    // ×4 Expand — measured 4× slower than one stats scan plus three
    // single-column distinct scans (Scratch dissection, 3.98 → 0.96 s at
    // sf0.1). The plan therefore reads lineitem exactly 4 times (each
    // pruned to ≤ 3 columns) and must never re-grow the Expand.
    val p = plan("q54_profile")
    assert(!p.contains("Expand"), p.take(2000))
    assert("lineitem\\.parquet".r.findAllIn(p).size == 4, p.take(2000))
  }

  test("q64: the corpus-clean composition plans no cartesian product") {
    // Inspect the BUILD plan, not the served frame: q64 serves the
    // session-cached cleaned frame, whose own plan is a checkpoint scan.
    // (a BroadcastNestedLoopJoin IS expected once: the 1-row quality-cutoff
    // scalar broadcast — same shape as q35a. Nothing may plan cartesian.)
    // cleanedBuild eagerly materializes its staged localCheckpoints just
    // to stringify this plan — release the ephemeral blocks afterwards so
    // the spec doesn't leak storage into the rest of the suite.
    try {
      val p = operators.CorpusClean.cleanedBuild(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"))
    } finally Materialize.releaseAll(spark)
  }

  test("q63: bench side above the size gate is NOT broadcast (shuffle equi-join)") {
    import org.apache.spark.sql.functions._
    // With autoBroadcastJoinThreshold off, the ONLY thing that could put a
    // broadcast in this plan is the decontaminate hint — so the two
    // assertions isolate the size gate exactly.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // SYNTHETIC input, not the fixture shingle index: q64's plan test
      // populates the session decontPairs cache over the fixture, and
      // Spark's CacheManager substitutes any logically-equal subtree
      // with the cached (broadcast-planned) InMemoryRelation — which
      // would make this test assert on the cache's plan, not the gate's.
      import spark.implicits._
      val docsDf = (0L until 40L).map { i =>
        (i, "alpha beta gamma delta epsilon zeta eta theta " +
          s"doc$i token$i extra$i more$i tail$i")
      }.toDF("doc_id", "text")
      val sh = operators.TextAnalysis.docShingleSets(docsDf)
        .select(col("doc_id"), explode(col("ss")).as("s"))
      val bench = sh.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("bench_doc"), col("s"))
      val corp = sh.filter(col("doc_id") % 7 =!= 0)
      // Fixture bench exceeds a gate of 8 shingle rows → hint must NOT apply.
      val over = operators.Dedup.decontaminate(corp, bench, minShared = 5,
        maxBroadcastRows = 8)
      val pOver = over.queryExecution.executedPlan.toString
      assert(!pOver.contains("BroadcastHashJoin") && !pOver.contains("BroadcastExchange"),
        pOver.take(2000))
      // Under the default gate the same bench fits → hint applies.
      val under = operators.Dedup.decontaminate(corp, bench, minShared = 5)
      assert(under.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // Same rows either way: the gate changes the plan, never the result.
      val a = over.orderBy("doc_id", "bench_doc").collect().toSeq
      val b = under.orderBy("doc_id", "bench_doc").collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q65: sequence packing plans no single-partition window") {
    val qe = SparkEntry.queries("q65_pack_sequences")(spark, dir).queryExecution
    val globalWindows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"found global window:\n${globalWindows.headOption}")
  }

  test("q68: semdedup candidate pairs come from the cell equi-join, no cartesian") {
    val p = plan("q68_semdedup")
    // (the k-centroid broadcast in the assignment is the one allowed
    // nested-loop against a 16-row literal table; nothing may plan an
    // unbucketed pair cartesian)
    assert(!p.contains("CartesianProduct"))
  }

  test("q66: stratified sample is a single scan with a row-local filter (no shuffle)") {
    val qe = SparkEntry.queries("q66_stratified_sample")(spark, dir).queryExecution
    // Membership must be a pure projection+filter: the only exchange in the
    // plan is the final ORDER BY's range partitioning.
    val exchanges = qe.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, qe.executedPlan.toString.take(2000))
  }

  test("q40: the broadcast query-embedding side carries the q_id bound") {
    // srpAnnTopK bounds qe explicitly (vec_id < numQueries) before the
    // broadcast hint — this pin fails loudly if a refactor ever drops the
    // bound and the broadcast becomes corpus-sized.
    // AQE hides exchanges until execution; plan without it for this check.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val qe = SparkEntry.queries("q40_ann_lsh")(spark, dir).queryExecution
      val broadcastQEmb = qe.executedPlan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if b.toString.contains("q_emb") => b
      }
      assert(broadcastQEmb.nonEmpty, "expected a broadcast of the query-embedding side")
      broadcastQEmb.foreach(b =>
        assert(b.toString.contains("< 8"), s"unbounded broadcast:\n${b.toString.take(800)}"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q37/q33: dedup and quality queries read their materialized shared indexes") {
    // Losing the InMemoryRelation means every consumer silently goes back
    // to re-tokenizing the corpus per query.
    assert(plan("q37_minhash_lsh").contains("InMemoryTableScan"))
    assert(plan("q33_quality_score").contains("InMemoryTableScan"))
  }

  test("q76: projected scoring broadcasts the query side; no cartesian") {
    val p = plan("q76_rp_prefilter_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q39/q76: corpus-wide per-query top-k runs salted two-phase, all windows keyed") {
    // The scored frame is corpus × queries rows; a window partitioned only
    // by q_id would funnel the whole corpus through one task per query at
    // scale. The salted local phase shows up as a (q_id, salt) window —
    // partitionSpec of size 2 — ahead of the per-query one.
    for (q <- Seq("q39_cosine_topk", "q76_rp_prefilter_topk")) {
      val qe = SparkEntry.queries(q)(spark, dir).queryExecution
      val windows = qe.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
      }
      assert(windows.forall(_ >= 1), s"$q has a global window: $windows")
      assert(windows.contains(2), s"$q: expected a salted (q_id, salt) local window, got $windows")
    }
  }

  test("q77: the label-centroid side joins as broadcast; no cartesian") {
    val p = plan("q77_label_coherence")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q75: per-cluster argmax windows are all keyed; no cartesian anywhere") {
    val qe = SparkEntry.queries("q75_cluster_representatives")(spark, dir).queryExecution
    val globalWindows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"found global window:\n${globalWindows.headOption}")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }

  test("aggregations run partial+final (map-side combine)") {
    val p = plan("q05_count_distinct")
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("q155/q156: cross-modal IVF-PQ plans stay cell/LUT-join shaped; no all-pairs") {
    // the only crossJoins in the compound path are broadcast LUT/centroid
    // frames (16 rows) and the chunked query-set broadcast — a cartesian
    // or nested-loop join would mean the modality swap broke a size gate
    for (q <- Seq("q155_crossmodal_ivfpq", "q156_crossmodal_reverse")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q157: the metadata predicate pushes to the documents scan, below the ADC join") {
    val qe = SparkEntry.queries("q157_filtered_ann")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    // the lang predicate must reach the documents PARQUET SCAN (the
    // candidate leg is id-filtered before probes/ADC ever see it), not
    // run as a post-ADC or post-rerank filter
    assert(p.contains("PushedFilters") && p.contains("EqualTo(lang,en)"),
      "documents lang predicate did not push to the scan")
    assert(!p.contains("CartesianProduct"), "q157 plans a cartesian product")
    // candidates stay probed-cell-bounded: every window is keyed (the
    // salted top-k / per-vector argmax shapes), never a global sort
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.forall(_ >= 1), s"q157 has a global window: $windows")
  }

  test("q158: probe sweep is one assignment pass + keyed top-k; no cartesian") {
    val qe = SparkEntry.queries("q158_probe_sweep")(spark, dir).queryExecution
    assert(!qe.executedPlan.toString.contains("CartesianProduct"),
      "q158 plans a cartesian product")
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.forall(_ >= 1), s"q158 has a global window: $windows")
  }

  test("q161: packed queries broadcast against one code scan; shortlist is salted") {
    val p = plan("q161_binary_hamming")
    // the Hamming prefilter is the q39 shape over 16-byte codes: the
    // packed query set broadcasts, the corpus codes stream through ONE
    // scan — a shuffle of the corpus here would defeat the whole
    // bit-packed first-pass design
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "packed query codes must broadcast against the corpus scan")
    assert(p.contains("__lrn"), "Hamming shortlist must be the salted two-phase top-k")
  }

  test("q162: one fan-out over cumulative sums; every window keyed by (dims, q_id)") {
    val qe = SparkEntry.queries("q162_matryoshka_recall")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    // levels explode AFTER the per-pair products/sums — exactly one
    // generator (the 4-row stack), not one scoring pass per level
    assert("Generate".r.findAllIn(p).size <= 1,
      "q162 must fan levels out of ONE scored frame")
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.forall(_ >= 1), s"q162 has a global window: $windows")
  }

  test("q163: both scoring rounds stay posting-join shaped; no cartesian beyond 1-row scalars") {
    val p = plan("q163_prf_expansion")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("__lrn"), "PRF top-k must be the salted two-phase form")
  }

  test("q78/q79: pair-graph profile and containment stay equi-join shaped; no cartesian") {
    for (q <- Seq("q78_dup_degree_profile", "q79_containment_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans an all-pairs join")
    }
  }

  test("q80: recall report windows are all keyed (salted exact side), no cartesian") {
    val qe = SparkEntry.queries("q80_ann_recall")(spark, dir).queryExecution
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.forall(_ >= 1), s"q80 has a global window: $windows")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
    // Since r17 the exact side is the (session, dir)-shared referent
    // (Similarity.exactFixtureRef) — q80's own plan reads it through an
    // InMemoryTableScan, so the salted (q_id, salt) two-phase top-k is
    // asserted on the referent's BUILD plan (descending into the cached
    // relation), which q80 consumes.
    def allWindows(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
      p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          Seq(w.partitionSpec.size)
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          allWindows(s.relation.cachedPlan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allWindows(a.executedPlan)
      }.flatten
    val refWindows = allWindows(graft.operators.Similarity.exactFixtureRef(spark, dir)
      .queryExecution.sparkPlan)
    assert(refWindows.forall(_ >= 1), s"exact referent has a global window: $refWindows")
    assert(refWindows.contains(2),
      s"exact referent: expected the salted (q_id, salt) local window, got $refWindows")
  }

  test("q81: funnel is the per-user DP — no window, no step-table self-join blowup") {
    val qe = SparkEntry.queries("q81_window_funnel")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    // The EXISTS-join oracle derivation must stay on the DuckDB side only:
    // the Spark plan is one user-keyed aggregate (plus the all-users left
    // join), never view×click×purchase.
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size <= 1, s"q81 plans ${joins.size} joins; expected only users⟕arrays")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("WindowExec"), "q81 should not plan an SQL window")
  }

  test("q82: retention is a single user-keyed pass — no events×cohort join at all") {
    val qe = SparkEntry.queries("q82_retention_cohort")(spark, dir).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"q82 plans a join; the day-set membership probe needs none")
  }

  test("q83: novelty has no per-shingle window and no join onto the exploded pairs") {
    val qe = SparkEntry.queries("q83_shingle_novelty")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("WindowExec"), "q83 must not rank within shingle partitions")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // The one join is doc-keyed (totals ⟕ novel counts), both sides ~n_docs.
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"q83 plans ${joins.size} joins; expected only totals⟕novel")
  }

  test("q84: chain count is one user-keyed window pass — no join, no global window") {
    val qe = SparkEntry.queries("q84_sequence_count")(spark, dir).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"q84 plans a join; the running maxima need none")
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"q84 windows must be user-keyed, got partition sizes $windows")
  }

  test("q85: grouped heavy hitters run the salted two-phase top-k, all windows keyed") {
    val qe = SparkEntry.queries("q85_lang_heavy_hitters")(spark, dir).queryExecution
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.forall(_ >= 1), s"q85 has a global window: $windows")
    assert(windows.contains(2), s"q85: expected the salted (lang, salt) local window, got $windows")
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }

  test("q86: dup fraction has no per-shingle window and only the doc-keyed join") {
    val qe = SparkEntry.queries("q86_dup_fraction")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("WindowExec"), "q86 must not rank within shingle partitions")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"q86 plans ${joins.size} joins; expected only totals⟕unique")
  }

  test("q87: per-type bounds join back as broadcast; no window, no cartesian") {
    val qe = SparkEntry.queries("q87_value_histogram")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "q87 bounds must broadcast")
    assert(!p.contains("SortMergeJoin"), "q87 must not shuffle the fact side for the join")
    assert(!p.contains("CartesianProduct") && !p.contains("WindowExec"))
  }

  test("q88: source profile is all equi-joins and aggregates — no window, no cartesian") {
    val qe = SparkEntry.queries("q88_source_profile")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("WindowExec"), "q88 must not plan a window")
  }

  test("q89: gap-fill joins the spine to broadcast counts; LOCF window is type-keyed") {
    val qe = SparkEntry.queries("q89_gap_fill")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "q89 daily counts must broadcast onto the spine")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"q89 LOCF must be per-type, got partition sizes $windows")
  }

  test("q90: sessionization is one user-keyed pass — no join, no global window") {
    val qe = SparkEntry.queries("q90_sessionize")(spark, dir).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"q90 plans a join; the flag + running sum need none")
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"q90 windows must be user-keyed, got partition sizes $windows")
  }

  test("q92: rolling actives never self-join the fact table; day join broadcasts") {
    val qe = SparkEntry.queries("q92_rolling_active")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "q92 day-keyed join must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(!p.contains("WindowExec"), "q92 must use the contribution trick, not a window")
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1, s"q92 plans ${joins.size} joins; expected only dau⋈wau")
  }

  test("q93: transition matrix is one user-keyed window pass — no join") {
    val qe = SparkEntry.queries("q93_type_transitions")(spark, dir).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"q93 plans a join; the lag needs none")
    val windows = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.size
    }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"q93 windows must be user-keyed, got partition sizes $windows")
  }

  test("q94: cumulative uniques plan no single-partition window; spine join broadcasts") {
    val qe = SparkEntry.queries("q94_cumulative_uniques")(spark, dir).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "q94 new-user counts must broadcast onto the spine")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    val global = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "q94 running sum must ride the two-phase form")
  }

  test("q91: weighted quantile plans no single-partition window") {
    val qe = SparkEntry.queries("q91_weighted_quantile")(spark, dir).queryExecution
    val global = qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "q91 running sums must ride the two-phase form")
  }

  test("q106: bucketized range join plans a HASH join, never a theta nested loop") {
    val p = plan("q106_range_join_tiers")
    assert(p.contains("BroadcastHashJoin"),
      "tier join must be the bucket equi-join (broadcast hash)")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the lo<=x<hi predicate must ride the bucket join as a filter, not a theta join")
  }

  test("q106: tiers partition the fact table exactly (bucket filter loses no rows)") {
    val total = SparkEntry.queries("q106_range_join_tiers")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    val facts = Tables.load(spark, dir, "lineitem").count()
    assert(total == facts, s"tier row totals $total != lineitem rows $facts")
  }

  test("bloomSemiJoin: past the broadcast gate the plan is Filter(bloom) -> sort-merge semi") {
    import org.apache.spark.sql.functions._
    val dim = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= 5).select(col("p_partkey"))
    val fact = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"))
    // gate forced below the fixture dimension: the operator must switch
    // the exact join to sort-merge (a dimension past broadcast scale must
    // never be broadcast) while keeping the scan-stage bloom probe
    val over = operators.Analytics.bloomSemiJoin(fact, dim, "l_partkey", "p_partkey",
      maxBroadcastRows = 1L)
    val pOver = over.queryExecution.executedPlan.toString
    assert(pOver.contains("SortMergeJoin") && pOver.contains("LeftSemi"),
      pOver.take(2000))
    assert(!pOver.contains("BroadcastHashJoin"), pOver.take(2000))
    assert(pOver.contains("bloom_might_contain_long"),
      "the scan-stage probe must survive the join-strategy switch")
    // under the default gate: broadcast semi, same probe
    val under = operators.Analytics.bloomSemiJoin(fact, dim, "l_partkey", "p_partkey")
    val pUnder = under.queryExecution.executedPlan.toString
    assert(pUnder.contains("BroadcastHashJoin") && pUnder.contains("LeftSemi"))
    assert(pUnder.contains("bloom_might_contain_long"))
    // the gate changes the plan, never the result
    val a = over.groupBy("l_returnflag").count().orderBy("l_returnflag").collect().toSeq
    val b = under.groupBy("l_returnflag").count().orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("q130/q131: retrieval legs plan no cartesian; per-query top-k is salted") {
    // BM25 candidates must come from the term-keyed posting join (an
    // inverted index probe), and the final per-query top-k must run the
    // salted two-phase shape — q_id is a low-cardinality key. The only
    // nested-loop joins allowed are the 1-row scalar broadcasts (N, T).
    val p130 = plan("q130_bm25_topk")
    assert(!p130.contains("CartesianProduct"), p130.take(2000))
    assert(p130.contains("__lrn"), "BM25 top-k must be the salted two-phase form")
    val p131 = plan("q131_hybrid_rrf")
    assert(!p131.contains("CartesianProduct"), p131.take(2000))
    // the fusion itself joins on (q_id, item) — an equi-join, never a loop
    assert(p131.contains("FullOuter"), "fusion must be the keyed full-outer join")
  }

  test("q145/q146/q148/q149: fourth/fifth-wave plans stay keyed — no cartesian, no global data window") {
    // q145: the final frame reads the checkpointed PR loop output; the
    // per-cluster winner must be the salted two-phase top-1.
    val p145 = plan("q145_dup_centrality")
    assert(!p145.contains("CartesianProduct"), p145.take(2000))
    assert(p145.contains("__lrn"), "q145 cluster winner must be salted two-phase")
    // q146: model + scoring are keyed joins and hash-aggs — no loop join
    // over data, no window at all.
    val p146 = plan("q146_lm_score")
    assert(!p146.contains("CartesianProduct"), p146.take(2000))
    assert(!p146.contains("Window"), "q146 must not plan any window")
    // q148: the only nested-loop join allowed is the 5-row tau ladder
    // broadcast; everything else is tau-keyed aggregation.
    val p148 = plan("q148_dedup_sensitivity")
    assert(!p148.contains("CartesianProduct"), p148.take(2000))
    // q149: one scan, a generator, one aggregate — no join of any kind.
    val p149 = plan("q149_embedding_health")
    assert(!p149.contains("Join"), "q149 must be join-free")
    assert(!p149.contains("Window"), "q149 must be window-free")
    assert(p149.contains("Generate posexplode"), "q149 fans out via posexplode")
  }

  test("q144: weight table broadcasts, shortlist is TakeOrderedAndProject, no cartesian loop over data") {
    // The importance model is the ≤4096-row bucket weight frame — it must
    // join the (doc, bucket) counts as a broadcast hash join (never shuffle
    // the corpus side on b's 4096 values), and the global shortlist must be
    // the TakeOrderedAndProject form, not sort-the-corpus+limit. The only
    // nested-loop joins allowed are the 1-row scalar totals (Nr, Nt).
    val p = plan("q144_dsir_select")
    assert(p.contains("BroadcastHashJoin"), "weights must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "shortlist must be top-k, not global sort")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
