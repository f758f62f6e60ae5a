package graft

/** Partitioning-invariance: the determinism contract (every oracle query
  * totally ordered, membership/sampling/numbering a pure function of row
  * content) implies the OUTPUT must be byte-identical regardless of how
  * the work is partitioned. Run the determinism-sensitive families under
  * two different shuffle-partition settings and require identical rows in
  * identical order — the failure mode this catches (partition-dependent
  * tie-breaks, spark_partition_id leakage, non-commutative accumulation)
  * is exactly what the single-plan oracle compare CANNOT see.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // window/top-k ties, two-phase numbering/sums, hash sampling/splits,
  // iterative components, banded dedup, composed pipeline.
  // Caveat: the shared shingle/quality indexes are persisted on first
  // use, so for their consumers the comparison exercises the
  // post-index stages — the index subtree itself is computed once. The
  // upstream tokenize/shingle pipeline is pure per-row projection
  // (verified by the oracle at two SFs), so the partition-sensitive
  // surface IS the downstream shuffles this covers.
  private val sensitive = Seq(
    "q16_window_rank", "q26_route_roundrobin", "q36a_jaccard_capped",
    "q37_minhash_lsh", "q56_dataset_split", "q65_pack_sequences",
    "q66_stratified_sample", "q68_semdedup", "q69_export_shards",
    "q71_mixture_upsample", "q73_dedup_clusters", "q74_incremental_neardup",
    // tie-sensitive window families added in round 7: session/bigram
    // assignment under equal timestamps, the two-phase weighted-quantile
    // running sums, and the q92 contribution-trick double distinct
    "q90_sessionize", "q91_weighted_quantile", "q92_rolling_active",
    "q93_type_transitions", "q94_cumulative_uniques",
    // round 8: per-doc term-rank ties (q97), map assembly from a sorted
    // collect_list — UNSORTED collect_list is the canonical
    // partition-order leak this spec exists for (q100), bounded-frame
    // percentile join-back (q103), salted same-label top-k ties (q104),
    // and the MG sketch, whose merge order must not matter in the exact
    // regime (q107)
    "q97_distinctive_terms", "q100_user_event_map",
    "q103_quality_percentile", "q104_positive_pairs", "q107_freq_items",
    "q110_group_sample",
    // round 9: ntile bucketing on the tie-broken total order (q113), ROWS
    // frames over (ts, event_id) — equal timestamps must not reshuffle the
    // frame (q115), and the bloom-prefiltered semi join — the filter build
    // merges per-partition bit sets, which must be order-independent (q118)
    "q113_ntile_buckets", "q115_frame_values", "q118_bloom_semi",
    // blocking candidates arrive once per shared key — the distinct must
    // erase multiplicity wherever the pair lands (q121); run grouping
    // rides a per-doc row_number over the unique (doc, pos) order (q122)
    "q121_fuzzy_blocking", "q122_dup_span",
    // int8 recall: quantized-dot ties in the salted top-k break on vec_id
    "q124_sq8_recall",
    // global top-50 at a tie boundary — the (lift, a, b) total order must
    // pick the same 50 under any partitioning
    "q125_collocations",
    // weighted MG merge order must not matter in the exact regime
    "q127_freq_items_weighted",
    // round 10: pair-blocking count + decimal moment sums (q128), per-cell
    // md5-ranked sampling (q129), full-outer fusion + (rrf, item) window
    // ties (q131), leg-intersection counts (q134), and the two-phase
    // first-seen ordinal behind the growth curve (q135). q130's own
    // shuffles sit inside the session-cached rank list (the shared-index
    // caveat above); the raw-builder test below exercises them.
    "q128_tfidf_cosine", "q129_cluster_sample", "q131_hybrid_rrf",
    "q134_leg_agreement", "q135_vocab_growth",
    // q144: every shuffle (bucket re-key, two profile aggs, doc-score agg,
    // global top-k) runs DOWNSTREAM of the cached tf index, so the shared
    // loop genuinely re-exercises them; the integer divisions make any
    // accidental order-dependence visible immediately.
    "q144_dsir_select",
    // q145: the PageRank loop (edge-keyed aggregates per round, salted
    // per-cluster top-1) re-runs per invocation — only the pair set is
    // session-cached. q146: the bigram model joins and doc aggregate run
    // downstream of the cached tf index; every division is integer.
    "q145_dup_centrality", "q146_lm_score",
    // q148: the tau fan-out, per-tau aggregates, and distinct-doc count
    // all run downstream of the cached pair frame. q149: the element
    // quantization + dim-keyed moments must not depend on row order.
    "q148_dedup_sensitivity", "q149_embedding_health",
    // q150: ten 1-row aggregates (integer divisions inside) unioned;
    // q151: the evidence window's (df, shingle) order must be total.
    "q150_corpus_card", "q151_pair_evidence")

  test("sensitive queries are byte-identical under different shuffle partitioning") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
    try {
      sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val a = rows(name)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = rows(name)
        assert(a.nonEmpty, s"$name returned no rows at sf0.001")
        val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y } match {
          case -1 => math.min(a.size, b.size) // prefix-equal, sizes differ
          case i => i
        }
        assert(a == b,
          s"$name diverges under repartitioning: first diff at index " +
            s"$firstDiff of ${a.size}/${b.size}")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("raw BM25 builder is partitioning-invariant (rank-list cache bypassed)") {
    // Non-default qt bypasses the session cache, so the posting join,
    // query-bag pruning window, and salted top-k all genuinely re-run
    // under both partition settings.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def rows(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      operators.CorpusOps.bm25TopK(spark, dir, nq = 8L, qt = 15, k = 10)
        .collect().map(_.toString).toSeq
    }
    try {
      val a = rows("32"); val b = rows("5")
      assert(a.nonEmpty && a == b, "BM25 diverges under repartitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("round-11 family is partitioning-invariant (session caches rebuilt per fresh session)") {
    // q136/q139/q140/q141/q142 all serve from session caches (fingerprint
    // frames, the BPE learn loop, PQ codebooks), which would make the
    // shared `sensitive` loop vacuous on the second pass — so each
    // partitioning setting gets a FRESH session, forcing every cache to
    // rebuild: the decode passes, band joins, merge-round argmaxes, and
    // k-means fits genuinely re-run under both settings.
    val names = Seq("q136_image_neardup", "q139_audio_neardup",
      "q140_bpe_encode", "q141_media_dedup_profile", "q142_pq_recall")
    def rows(parts: String): Map[String, Seq[String]] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      names.map(n => n -> SparkEntry.queries(n)(s, dir).collect().map(_.toString).toSeq).toMap
    }
    val a = rows("32"); val b = rows("5")
    names.foreach { n =>
      assert(a(n).nonEmpty, s"$n returned no rows at sf0.001")
      assert(a(n) == b(n), s"$n diverges under repartitioning")
    }
  }
}
