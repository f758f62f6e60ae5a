package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated fixture tables (TESTDATA.md,
  * FIXTURES.md §A). All queries in [[SparkEntry.queries]] read their inputs
  * through here so scan-level concerns (the parquet nanos workaround,
  * column pruning) live in one place.
  */
object Tables {

  /** Every fixture table, in FK-dependency order. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The physical type of `events.ts` is owned by the fixture generator and
    * has changed across regenerations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — PARQUET_TYPE_ILLEGAL), then plain
    * timestamp[us] with isAdjustedToUTC=false (which Spark infers as
    * TIMESTAMP_NTZ). Rather than hard-code either, infer the schema under the
    * nanos-as-long legacy flag and branch on what `ts` actually is:
    *   - LongType (nanos fixtures): floor raw nanos to micros —
    *     identical to DuckDB's TIMESTAMP_NS → TIMESTAMP cast;
    *   - TimestampNTZType (micros fixtures): cast to TimestampType. All
    *     entrypoints pin spark.sql.session.timeZone=UTC, so the cast is
    *     value-preserving and unix_micros/to_date/window arithmetic and
    *     DuckDB oracle comparisons stay microsecond-exact;
    *   - TimestampType: pass through.
    * Queries downstream always see `ts: TimestampType`.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Scope the legacy flag to this schema inference: save and restore
      // the previous value so the session-wide parquet behavior of later,
      // unrelated reads is untouched. (The inferred schema is captured in
      // the returned plan; execution keys off the inferred type, not the
      // live conf value.)
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        normalizeTs(raw, s"$dir/$name.parquet")
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  private def normalizeTs(df: DataFrame, src: String): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"fixture drift: events.ts read as $other from $src" +
            " — expected LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP;" +
            " update Tables.load for the new fixture schema")
    }

  /** `events` as a file-source STREAM with the same ts normalization as
    * [[load]]. A file stream needs an explicit schema, and `withWatermark`
    * needs an event-time-capable column — so the NTZ→TIMESTAMP boundary cast
    * has to happen here, before any EventStreams builder sees the frame.
    * Downstream, streaming and batch consumers see the identical
    * `ts: TimestampType` contract.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val path = s"$dir/events.parquet"
      val rawSchema = spark.read.parquet(path).schema
      // Fail fast on a legacy TIMESTAMP(NANOS) fixture: unlike batch load
      // (schema captured once in the plan), FileStreamSource re-reads
      // parquet footers per micro-batch AFTER this method restores the
      // nanosAsLong flag, so the LongType decode would die mid-stream with
      // an illegal-parquet-type error. Streaming supports the NTZ/TIMESTAMP
      // fixture shapes only; nanos fixtures must go through batch [[load]].
      if (rawSchema("ts").dataType == LongType)
        throw new UnsupportedOperationException(
          s"events fixture at $path has raw nanos ts (LongType): unsupported" +
            " for streaming — FileStreamSource re-infers the parquet schema" +
            " per micro-batch without the nanosAsLong session flag. Use" +
            " Tables.load (batch) or rewrite the fixture with a TIMESTAMP ts.")
      // Glob, not the bare file path: for a non-glob path FileStreamSource
      // force-sets basePath to the path itself, which must be a directory —
      // a glob leaves basePath alone and streams the matching file(s).
      normalizeTs(
        spark.readStream.schema(rawSchema).parquet(s"$dir/events.parque[t]"),
        path)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Register all fixture tables as temp views (tests / ad-hoc SQL). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register the per-corpus shared MATERIALIZED indexes (and the cached
    * retrieval rank lists served off them) as temp views — the `/play`
    * analyst surface the operators themselves serve from: `tf_index`
    * (doc_id, term, tf), `shingle_index` (doc_id, ss), `quality_index`
    * (per-doc quality features), `bm25_topk` (the lexical rank list at
    * the retrieval family's parameters). Views are lazy: an index builds
    * (and persists, session-cached) on first query, then every later
    * gateway query reads the same in-memory frame the batch operators
    * share.
    */
  def registerIndexViews(spark: SparkSession, dir: String): Unit = {
    operators.CorpusOps.tfIndex(spark, dir).createOrReplaceTempView("tf_index")
    operators.TextAnalysis.shingleIndex(spark, dir).createOrReplaceTempView("shingle_index")
    operators.TextAnalysis.qualityIndex(spark, dir).createOrReplaceTempView("quality_index")
    operators.CorpusOps.bm25TopK(spark, dir).createOrReplaceTempView("bm25_topk")
    // round-11 additions: the media fingerprint frames and the learned
    // BPE merge table (1 row per round) — the artifacts analysts ask
    // "what did the tokenizer learn / which images collide" against
    operators.MultimodalOps.imageFpIndex(spark, dir).createOrReplaceTempView("image_fp_index")
    operators.MultimodalOps.clipFpIndex(spark, dir).createOrReplaceTempView("clip_fp_index")
    import spark.implicits._
    operators.Bpe.learned(spark, dir)._1
      .toDF("round", "left_sym", "right_sym", "pair_count")
      .createOrReplaceTempView("bpe_merges")
    // fourth-wave additions: the DSIR importance model and the bigram LM
    // — the two corpus-derived MODELS the selection/quality operators
    // score with ("why was this doc selected / scored low" is answerable
    // in plain SQL against these)
    operators.CorpusOps.dsirCorpusWeights(spark, dir).createOrReplaceTempView("dsir_weights")
    operators.CorpusOps.lmBigramModel(spark, dir).createOrReplaceTempView("lm_bigram")
    // round-14 additions: the continuously-maintained IVF tier — the
    // inverted file itself (cell membership/occupancy) and its drift
    // ledger (staleness, pending-trigger flags, why the last refit fired)
    streaming.IndexMaintenance.ivfAssignmentsView(spark, dir)
      .createOrReplaceTempView("ivf_assignments")
    streaming.IndexMaintenance.ivfDriftView(spark, dir)
      .createOrReplaceTempView("ivf_drift")
    // round-15: the fine quantizer's staleness ledger — ADC residual
    // baseline vs appended mass, pending-trigger flag, refit provenance
    streaming.IndexMaintenance.pqDriftView(spark, dir)
      .createOrReplaceTempView("pq_drift")
    // the substring-dedup anchor stream (q153's signal), store-backed when
    // a maintained anchor store exists — "how duplicated is gram s / which
    // spans does doc d share" in plain SQL
    streaming.IndexMaintenance.anchorIndexView(spark, dir)
      .createOrReplaceTempView("anchor_index")
    // round-16: the q158 probe-sweep tuning report — recall@k and exact
    // candidate counts per nprobe over the shared IVF model, so the
    // serving tier's knob evidence ("why is nprobe set to 2") is
    // queryable where the operator looks for it. The sweep's scoring is
    // lazy (runs on first query); the shared IVF model loads from the
    // durable store when one is configured (fits in-session otherwise,
    // same as the BPE view's learn above).
    operators.Similarity.probeSweepReport(spark, dir)
      .createOrReplaceTempView("ann_tuning")
    // the q162 dimension-truncation curve (Matryoshka serving): recall@k
    // per prefix dimension — the evidence behind "serve at d=16 or d=32",
    // same lazy-scoring pattern as ann_tuning
    operators.Similarity.mrlSweepReport(spark, dir)
      .createOrReplaceTempView("mrl_tuning")
    // round-17: the last two serving knobs' evidence joins the tuning
    // family — the q164 binary shortlist-depth curve (why short_k = 64)
    // and the q165 sampled banding S-curve (why the dedup tier bands
    // 4×4) — so EVERY serving knob is answerable in plain SQL at the
    // gateway, same lazy-scoring pattern
    operators.Similarity.binarySweepReport(spark, dir)
      .createOrReplaceTempView("binary_tuning")
    operators.Dedup.lshBandSweepReport(spark, dir,
        operators.Dedup.lshSweepSampleMod(spark, dir))
      .createOrReplaceTempView("lsh_tuning")
    // the tokenizer's staleness ledger — compression baseline vs appended
    // mass, pending-trigger flag, refit provenance (mirrors pq_drift)
    streaming.IndexMaintenance.bpeDriftView(spark, dir)
      .createOrReplaceTempView("bpe_drift")
  }
}
