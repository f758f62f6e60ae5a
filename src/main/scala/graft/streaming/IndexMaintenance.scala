package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous maintenance of the durable dedup/ANN index stores from a
  * document / embedding STREAM — the batch appends
  * ([[graft.operators.TextAnalysis.appendToShingleIndex]],
  * [[graft.operators.Similarity.appendToSrpIndex]]) wired to Structured
  * Streaming: every micro-batch lands its increment in the store at
  * O(batch) cost, so the nightly dedup/ANN job serves an index that was
  * maintained all day instead of rebuilding O(corpus). (The reference's
  * consumer plays this role for its fact table — Consumer_clickhouse.py's
  * poll loop appends each batch's rows; here the continuously-appended
  * artifact is the INDEX, the expensive thing to recompute.)
  *
  * Delivery semantics: foreachBatch is at-least-once — a restart replays
  * the last uncommitted micro-batch — so the applied batch id is recorded
  * in the store's sidecar IN THE SAME metadata write that advances the
  * corpus count and the store-rows record, and a batch id ≤ the recorded
  * marker is skipped (exactly-once in the common path). The remaining
  * window — a crash after the parquet append commits but before the
  * sidecar write — is caught by [[graft.IndexStore]]'s store-rows
  * tripwire: the replayed append sees actual parquet rows ≠ the sidecar's
  * record and REFUSES (loudly) instead of landing the batch twice, and
  * any tracked load of the torn store rebuilds it. Single maintainer per
  * store entry, per [[graft.IndexStore.append]]'s single-writer contract.
  *
  * Bootstrap the store with a batch build (possibly over an empty frame)
  * before attaching a maintainer — SRP appends refuse metadata-less
  * stores by design (the increment must bucket under the BUILD's plane
  * family). Maintainers invalidate their own session's cache tier; other
  * long-lived sessions pick up the grown store at their next fresh load
  * (cross-session freshness is the store's job, not the cache's).
  *
  * Recovery: a maintainer that hits a torn store fails its streaming
  * query with the tripwire's instructions (the safe direction — it must
  * not append into an inconsistent store). Repair = a tracked batch load
  * (rebuilds from the corpus) or a manual build; the rebuild's fresh
  * sidecar no longer carries this stream's batch marker, so the restarted
  * maintainer re-applies its last uncommitted batch as a NEW append —
  * correct when the rebuild corpus did not include that batch's docs, and
  * otherwise the corpus-count tripwire flags the double-count on the next
  * load. Restart with a fresh checkpoint after a rebuild that already
  * covers the in-flight batch.
  */
object IndexMaintenance {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.IndexMaintenance")

  /** Sidecar key carrying the highest applied micro-batch id of `stream`. */
  private[graft] def markerKey(stream: String) = s"lastBatch.$stream"

  /** `(row count, content digest)` of a document frame in ONE pass — the
    * digest is `bit_xor(xxhash64(doc_id, text))`: order-independent (so
    * bootstrap-then-append and any batch arrival order agree) and
    * XOR-composable (cumulative digest advances by XOR with each batch's
    * digest, no store scan). Empty frame digests to 0.
    */
  private[graft] def countAndDigest(docs: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val r = docs.agg(count(lit(1)), coalesce(
      expr("bit_xor(xxhash64(doc_id, text))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The cumulative content digest to record after ingesting a batch with
    * digest `batchDigest` into the store whose sidecar is `meta`: XOR with
    * the stored digest when one exists, absent otherwise (a pre-digest or
    * post-purge store can't re-derive its history — the key stays absent,
    * and cross-store checks fall back to count-only, until a re-bootstrap
    * restores it).
    */
  private def advancedDigest(meta: Option[Map[String, String]],
      batchDigest: Long): Map[String, String] =
    meta.flatMap(_.get(graft.IndexStore.CorpusHashKey))
      .flatMap(_.toLongOption)
      .map(prev => Map(graft.IndexStore.CorpusHashKey -> (prev ^ batchDigest).toString))
      .getOrElse(Map.empty)

  private def lastApplied(s: SparkSession, corpusDir: String, name: String,
      stream: String): Long =
    graft.IndexStore.storedMeta(s, corpusDir, name)
      .flatMap(_.get(markerKey(stream)).flatMap(_.toLongOption))
      .getOrElse(-1L)

  /** The replay guard, with every skip LOGGED: `batchId == marker` is the
    * expected at-least-once shape (same-checkpoint operation only ever
    * replays the last uncommitted batch) and logs at info; `batchId <
    * marker` is only reachable when the maintainer restarted from a FRESH
    * or rolled-back checkpoint against a store whose sidecar outlived it —
    * its batches restart at 0 and every one is silently dropped until the
    * id catches the marker — so it logs a loud warning naming the repair
    * (a new stream name, or clearing the marker, if this is genuinely a
    * new incarnation of the stream). The marker stays authoritative either
    * way: keying it on the run id instead would break the legitimate
    * restart replay (every restart has a fresh run id, and its first
    * batch is usually a replay that MUST be skipped).
    */
  private def shouldApply(batchId: Long, marker: Long, stream: String,
      corpusDir: String): Boolean =
    batchId > marker || {
      if (batchId < marker)
        log.warn(s"IndexMaintenance: DROPPING batch $batchId of stream " +
          s"'$stream' for $corpusDir — the store's marker is already at " +
          s"$marker, which a same-checkpoint replay can never trail. The " +
          "maintainer looks restarted from a fresh/rolled-back checkpoint " +
          "against a store that outlived it; if this is a new incarnation " +
          "of the stream, use a new stream name or clear the marker.")
      else
        log.info(s"IndexMaintenance: skipping replayed batch $batchId of " +
          s"stream '$stream' for $corpusDir (marker $marker) — already applied.")
      false
    }

  /** Apply one micro-batch of `(doc_id, text, …)` documents to the
    * shingle store; false = this batch id was already applied (a
    * foreachBatch replay) and nothing ran.
    */
  private[graft] def applyDocsBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir,
      graft.operators.TextAnalysis.ShingleStoreName, stream), stream, corpusDir) && {
      graft.operators.TextAnalysis.appendToShingleIndex(s, corpusDir, docs,
        Map(markerKey(stream) -> batchId.toString))
      true
    }

  /** Apply one micro-batch of `(vec_id, embedding)` rows to the SRP
    * store; false = replay, skipped.
    */
  private[graft] def applyEmbeddingsBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, embeddings: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir,
      graft.operators.Similarity.SrpStoreName, stream), stream, corpusDir) && {
      graft.operators.Similarity.appendToSrpIndex(s, corpusDir, embeddings,
        Map(markerKey(stream) -> batchId.toString))
      true
    }

  /** Attach a shingle-index maintainer to a `(doc_id, text, …)` stream. */
  def maintainShingleIndex(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "shingle_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession // attach-time session: conf + cache tier
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyDocsBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** One micro-batch of the streaming decontamination pipeline
    * ([[maintainDecontaminatingIndex]]); false = replay, nothing ran.
    *
    * Order of the two effects is the crash-safety argument:
    *  1. the batch's near-dup pairs (vs store∪batch, q74's new×all probe)
    *     land in `pairsDir/batch_id=N` with mode=overwrite — idempotent:
    *     a replay recomputes against the SAME store state (the append
    *     below hasn't happened yet on any path that replays) and
    *     overwrites byte-identical content;
    *  2. the batch appends to the durable shingle store behind the
    *     exactly-once batch marker ([[applyDocsBatch]]).
    * A crash between 1 and 2 replays the batch: step 1 rewrites the same
    * pairs, step 2 applies once. A crash after 2 replays into the marker
    * skip. Either way every pair is emitted exactly once and the store
    * grows exactly once.
    *
    * Append-only contract (same as q74): batch doc_ids exceed every
    * stored id, so "pair involves a batch doc" ≡ "higher end ≥ the
    * batch's min id" — the probe side is the batch alone.
    */
  private[graft] def decontaminateBatch(s: SparkSession, corpusDir: String,
      pairsDir: String, stream: String, batchId: Long, batch: DataFrame): Boolean = {
    import org.apache.spark.sql.functions.{col, min}
    val storeName = graft.operators.TextAnalysis.ShingleStoreName
    shouldApply(batchId, lastApplied(s, corpusDir, storeName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainDecontaminatingIndex requires " +
          s"a configured index store (${graft.IndexStore.DirConf})"))
      val storePath = graft.IndexStore.storePath(root, corpusDir, storeName)
      require(graft.IndexStore.committed(s, storePath),
        s"bootstrap the shingle store at $storePath (batch build over the " +
          "existing corpus) before attaching a decontaminating maintainer")
      val minId = batch.agg(min(col("doc_id"))).head().get(0) // bounded: 1 row
      if (minId != null) {
        val stored = s.read.parquet(storePath).select("doc_id", "ss")
        val batchDss = graft.operators.TextAnalysis.docShingleSets(batch)
          .select("doc_id", "ss")
        graft.operators.Dedup.incrementalPairsDss(s,
            stored.unionByName(batchDss),
            col("doc_id") >= minId.asInstanceOf[Long])
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
      }
      graft.operators.TextAnalysis.appendToShingleIndex(s, corpusDir, batch,
        Map(markerKey(stream) -> batchId.toString))
      true
    }
  }

  /** Streaming near-dup decontamination end-to-end: compose the shingle
    * store's incremental appends with q74's new-batch-vs-corpus near-dup
    * check as ONE continuous pipeline over a `(doc_id, text, …)` document
    * stream. Each micro-batch emits its verified near-dup pairs (the
    * documents to quarantine/drop before training) into
    * `pairsDir/batch_id=N` and then joins the corpus index — so the union
    * of all batch outputs over an append-only id stream equals the q74
    * batch answer on the same data (each pair lands in exactly the batch
    * carrying its higher id; spec-pinned batch parity). Exactly-once
    * across crashes via the marker + per-batch-overwrite argument on
    * [[decontaminateBatch]].
    */
  def maintainDecontaminatingIndex(docs: DataFrame, corpusDir: String,
      pairsDir: String, checkpoint: String,
      stream: String = "neardup_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        decontaminateBatch(owner, corpusDir, pairsDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** The durable chunk-fingerprint store behind [[maintainChunkDedup]]. */
  private[graft] val ChunkStoreName = "chunk_fps"

  /** Sidecar `layout` value asserting the chunk store holds exactly one
    * row per fingerprint. Pre-upgrade stores (no marker) held every chunk
    * occurrence; consumers must not assume uniqueness for those.
    */
  private[graft] val FpUniqueLayout = "fp-unique"

  /** A named chunking strategy for the chunk store. The NAME travels in
    * the store's metadata sidecar and the maintainer resolves its chunker
    * FROM the store — mixing strategies across bootstrap and maintenance
    * would compare fingerprints from different chunk grids (wrong dups,
    * no error), the same family-mixing hazard the SRP store solves by
    * recording its plane family.
    */
  private[graft] final case class Chunker(name: String,
      rows: DataFrame => DataFrame)

  /** Fixed-stride chunking (q96) — the default, and what metadata-less
    * pre-upgrade stores are assumed to hold.
    */
  private[graft] val StrideChunker =
    Chunker("stride", graft.operators.CorpusOps.chunkRows)

  /** Content-defined chunking (q133) — shift-robust fingerprints: edited
    * re-ingested documents re-share every chunk after the next content
    * boundary instead of invalidating their whole grid.
    */
  private[graft] val CdcChunker =
    Chunker("cdc", graft.operators.CorpusOps.cdcChunkRows)

  private val Chunkers: Map[String, Chunker] =
    Seq(StrideChunker, CdcChunker).map(c => c.name -> c).toMap

  /** The chunker a store was built with, from its sidecar (stride for
    * pre-upgrade sidecars without the key). Unknown names fail loudly —
    * guessing a chunker silently mis-dedups.
    */
  private def storedChunker(s: SparkSession, corpusDir: String): Chunker = {
    val name = graft.IndexStore.storedMeta(s, corpusDir, ChunkStoreName)
      .flatMap(_.get("chunker")).getOrElse(StrideChunker.name)
    Chunkers.getOrElse(name, throw new IllegalStateException(
      s"chunk store for $corpusDir was built with unknown chunker '$name' — " +
        s"this build knows ${Chunkers.keys.mkString(", ")}"))
  }

  /** Bootstrap the chunk store from an existing corpus frame (possibly
    * empty) — the batch build the streaming maintainer requires before
    * attaching, mirroring the shingle/SRP bootstrap contract. The
    * chunking strategy is recorded in the sidecar and every later
    * maintenance batch resolves it from there.
    */
  private[graft] def bootstrapChunkStore(s: SparkSession, corpusDir: String,
      docs: DataFrame, chunker: Chunker = StrideChunker): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // ONE row per fingerprint (its first occurrence in (doc_id, chunk_id)
    // order): the store answers "is this fp already indexed, and where
    // was it first seen" — keeping every occurrence would grow it with
    // the corpus's duplication factor for no additional answer.
    val w = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
    // "layout" records that this store holds ONE row per fingerprint —
    // readers assert it instead of assuming (chunkDedupBatch keeps a
    // distinct() for stores whose sidecar predates the marker).
    graft.IndexStore.servedFrom(s, corpusDir, ChunkStoreName,
      params = Map("chunker" -> chunker.name, "layout" -> FpUniqueLayout))(
      chunker.rows(docs)
        .select("chunk_fp", "doc_id", "chunk_id")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn"))
    ()
  }

  /** One micro-batch of the streaming chunk-dedup pipeline
    * ([[maintainChunkDedup]]); false = replay, nothing ran. The batch is
    * chunked under the STORE's recorded strategy ([[storedChunker]] —
    * stride q96 or CDC q133), never a caller-chosen one.
    *
    * Crash-safety order as in [[decontaminateBatch]]: (1) the batch's
    * duplicate chunks — batch occurrences whose fingerprint already
    * exists in the store, plus within-batch repeats beyond the first in
    * (doc_id, chunk_id) order — land in `dupDir/batch_id=N` with
    * mode=overwrite (idempotent: a replay recomputes against the same
    * store state); (2) only the batch's NEW fingerprints (first
    * occurrence each) append to the store behind the exactly-once batch
    * marker, so the store stays one row per fingerprint. Over an
    * append-only doc-id stream the union of batch outputs is exactly
    * "every chunk occurrence except the globally first per fingerprint"
    * — the removable multiset of the q123 batch report (spec-pinned
    * parity).
    *
    * Cost per batch: O(batch) chunking/window work plus ONE scan of the
    * fp-unique store for the membership probe joins — O(distinct corpus
    * fingerprints), not O(corpus occurrences). At production scale the
    * store would be bucketed by chunk_fp so the probe is a co-located
    * join; the scan itself is irreducible for an exact answer (the
    * approximate path is a bloom filter over stored fps, which this
    * operator deliberately does not take — a false positive would drop a
    * chunk that was never indexed).
    */
  private[graft] def chunkDedupBatch(s: SparkSession, corpusDir: String,
      dupDir: String, stream: String, batchId: Long, batch: DataFrame): Boolean = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    shouldApply(batchId, lastApplied(s, corpusDir, ChunkStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainChunkDedup requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      val path = graft.IndexStore.storePath(root, corpusDir, ChunkStoreName)
      require(graft.IndexStore.committed(s, path),
        s"bootstrap the chunk store at $path (bootstrapChunkStore over the " +
          "existing corpus) before attaching a chunk-dedup maintainer")
      // the batch MUST chunk under the store's own strategy (sidecar-
      // recorded at bootstrap) — stride and CDC grids are incomparable
      val chunks = storedChunker(s, corpusDir).rows(batch)
        .select("chunk_fp", "doc_id", "chunk_id")
      // fp-uniqueness is ASSERTED by the sidecar's layout marker, not
      // assumed: stores bootstrapped by this build dedupe (and appends
      // are rn==1 only), but explicitly-supported pre-marker stores hold
      // every chunk occurrence — those keep a cheap distinct so future
      // non-semi-join consumers of this frame stay correct too.
      val fpUnique = graft.IndexStore.storedMeta(s, corpusDir, ChunkStoreName)
        .flatMap(_.get("layout")).contains(FpUniqueLayout)
      val storedFpsRaw = s.read.parquet(path).select("chunk_fp")
      val storedFps = if (fpUnique) storedFpsRaw else storedFpsRaw.distinct()
      val vsStore = chunks.join(storedFps, Seq("chunk_fp"), "left_semi")
      val w = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
      // localCheckpoint, not just reuse: TWO consumers read the ranked
      // new-fp frame, and the append below writes INTO the store path its
      // lineage reads — materializing severs that read-own-write cycle
      val newFps = chunks.join(storedFps, Seq("chunk_fp"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .localCheckpoint()
      val withinBatch = newFps.filter(col("rn") > 1).drop("rn")
      vsStore.unionByName(withinBatch)
        .write.mode("overwrite").parquet(s"$dupDir/batch_id=$batchId")
      // grow the store by the batch's first-occurrence rows only: the
      // store stays one row per fingerprint instead of accumulating
      // every occurrence ever streamed
      graft.IndexStore.append(s, corpusDir, ChunkStoreName,
        newFps.filter(col("rn") === 1).drop("rn"),
        extraMeta = Map(markerKey(stream) -> batchId.toString))
      graft.Materialize.free(newFps) // per-batch scratch, not an index frame
      true
    }
  }

  /** Streaming chunk-level dedup end-to-end: q123's report as a continuous
    * pipeline over a `(doc_id, text, …)` document stream — each
    * micro-batch emits the chunk occurrences a RAG index build should
    * SKIP (already embedded under the same fingerprint) and then grows
    * the durable fingerprint store at O(batch) cost. Exactly-once across
    * crashes via the marker + per-batch-overwrite argument on
    * [[chunkDedupBatch]].
    */
  def maintainChunkDedup(docs: DataFrame, corpusDir: String,
      dupDir: String, checkpoint: String,
      stream: String = "chunk_dedup"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        chunkDedupBatch(owner, corpusDir, dupDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** The durable `(doc_id, term, tf)` store behind [[maintainTfIndex]] —
    * the retrieval-side counterpart of the shingle store: the BM25 leg
    * (q130) and the tf-derived text profiles serve off it instead of
    * re-tokenizing the corpus.
    */
  private[graft] val TfStoreName = "tf_index"

  /** Bootstrap the tf store from an existing corpus frame (possibly
    * empty) — required before attaching a maintainer, mirroring the
    * shingle/SRP/chunk bootstrap contract.
    */
  private[graft] def bootstrapTfStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): Unit = {
    // corpusCount tracks DOCUMENT rows (not tf rows): BM25's N. Recorded
    // here and advanced by every append so [[bm25FromStore]] serves the
    // same N as the batch operator's count(*) over documents — deriving N
    // from distinct store doc_ids would undercount any doc whose text is
    // NULL (it produces zero tf rows but still counts as a document).
    val (n, dig) = countAndDigest(docs)
    graft.IndexStore.servedFrom(s, corpusDir, TfStoreName, corpusCount = n)(
      graft.operators.CorpusOps.tfRows(docs))
    recordDigest(s, corpusDir, TfStoreName, dig)
  }

  /** Stamp the corpus content digest onto a just-bootstrapped store's
    * sidecar. Sound whether servedFrom rebuilt (store = exactly these
    * docs) or served fresh (the count tripwire just proved the store
    * covers the same corpus the digest was computed over).
    */
  private def recordDigest(s: SparkSession, corpusDir: String, name: String,
      digest: Long): Unit =
    for (root <- graft.IndexStore.configuredDir(s)) {
      val path = graft.IndexStore.storePath(root, corpusDir, name)
      graft.IndexStore.readMeta(s, path).foreach { meta =>
        graft.IndexStore.writeMeta(s, path,
          meta + (graft.IndexStore.CorpusHashKey -> digest.toString))
      }
    }

  /** Apply one micro-batch of `(doc_id, text, …)` documents to the tf
    * store; false = replay, skipped. Unlike the chunk store, the append
    * needs NO store probe at all: tf rows are keyed by (doc_id, term) and
    * the stream's doc ids are append-only, so a batch's rows are disjoint
    * from everything stored — per-batch cost is exactly O(batch)
    * tokenize+aggregate work.
    */
  private[graft] def applyTfBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, TfStoreName, stream),
      stream, corpusDir) && {
      // Same bootstrap precondition as chunkDedupBatch, enforced at INGEST
      // time: without it, a maintainer attached to an un-bootstrapped
      // store would create the store via append — but append only
      // advances an EXISTING corpus count, so the sidecar never gains
      // one, bm25FromStore throws at SERVE time, and the documents
      // already streamed through are unrecoverable without a rebuild.
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainTfIndex requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      require(graft.IndexStore.committed(s,
        graft.IndexStore.storePath(root, corpusDir, TfStoreName)),
        s"bootstrap the tf store for $corpusDir (bootstrapTfStore over the " +
          "existing corpus) before attaching a tf-index maintainer")
      val (n, dig) = countAndDigest(docs)
      graft.IndexStore.append(s, corpusDir, TfStoreName,
        graft.operators.CorpusOps.tfRows(docs),
        incrementCount = n, // advance BM25's N by the batch docs
        extraMeta = Map(markerKey(stream) -> batchId.toString) ++
          advancedDigest(graft.IndexStore.storedMeta(s, corpusDir, TfStoreName), dig))
      true
    }

  /** Attach a tf-index maintainer to a `(doc_id, text, …)` stream: each
    * micro-batch's `(doc_id, term, tf)` rows land in the durable store at
    * O(batch) cost, exactly once behind the batch marker, so BM25
    * retrieval ([[bm25FromStore]]) always serves the corpus as of the
    * last committed batch instead of re-tokenizing everything ingested
    * today.
    */
  def maintainTfIndex(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "tf_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyTfBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** BM25 top-k served off the durable tf store — the identical scoring
    * body as batch q130 ([[graft.operators.CorpusOps.bm25TopKOverTf]]):
    * same rational-cleared integer arithmetic, same pruning and salted
    * top-k, with tf provenance swapped to the maintained store. The doc
    * count N is the sidecar's corpus count (bootstrap-recorded, advanced
    * by every append) — NOT distinct store doc_ids, which would
    * undercount a NULL-text document (zero tf rows, but the batch
    * operator's count(*) still counts it, and idf/dl·N shift with N).
    * Spec-pinned equal to the batch answer over the same corpus.
    */
  def bm25FromStore(s: SparkSession, corpusDir: String,
      nq: Long, qt: Int, k: Int): DataFrame = {
    val (tf, nT) = storedTfAndN(s, corpusDir)
    graft.operators.CorpusOps.bm25TopKOverTf(tf, nT, nq, qt, k)
  }

  /** The committed tf store as serving frames: snapshot-isolated
    * `(doc_id, term, tf)` rows ([[graft.IndexStore.verifiedRead]] — a
    * concurrent maintainer's torn append can never serve) plus the
    * sidecar corpus count N as a 1-row frame (bootstrap-recorded,
    * advanced by every append, decremented by every purge — BM25's N).
    * The shared provenance of every store-served lexical leg
    * ([[bm25FromStore]], [[maxSimFromStore]], [[searchFromStore]]).
    */
  private[graft] def storedTfAndN(s: SparkSession, corpusDir: String):
      (DataFrame, DataFrame) = {
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("tf-store serving requires a configured index " +
        s"store (${graft.IndexStore.DirConf})"))
    val path = graft.IndexStore.storePath(root, corpusDir, TfStoreName)
    require(graft.IndexStore.committed(s, path),
      s"bootstrap the tf store at $path before serving retrieval from it")
    val n = graft.IndexStore.storedMeta(s, corpusDir, TfStoreName)
      .flatMap(_.get(graft.IndexStore.CorpusCountKey)).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"tf store at $path has no corpus count in its sidecar — " +
          "re-bootstrap with bootstrapTfStore before serving retrieval"))
    val tf = graft.IndexStore.verifiedRead(s, path).select("doc_id", "term", "tf")
    import org.apache.spark.sql.functions.lit
    val nT = s.range(1).select(
      lit(n).cast(org.apache.spark.sql.types.LongType).as("n"))
    (tf, nT)
  }

  /** q160's late-interaction MaxSim served off the durable tf store —
    * the identical operator body as batch
    * ([[graft.operators.CorpusOps.maxSimTopK]]) with the tf provenance
    * swapped to the maintained store: token budgets, df ranks,
    * shared-token candidates and the deterministic token vectors all
    * derive from the stored rows, so the rerank rung serves the corpus
    * as of the last committed batch (appends AND takedown purges —
    * a purged doc contributes no budget, no candidates, no tokens).
    * Spec-pinned equal to batch across a crash replay.
    */
  def maxSimFromStore(s: SparkSession, corpusDir: String,
      nq: Long = graft.operators.CorpusOps.Bm25NumQueries,
      k: Int = graft.operators.CorpusOps.Bm25K): DataFrame = {
    val (tf, _) = storedTfAndN(s, corpusDir)
    graft.operators.CorpusOps.maxSimTopK(s, corpusDir, nq, k, tfOpt = Some(tf))
  }

  /** Interactive lexical retrieval off the maintained tf store — the
    * `/search` gateway's engine (the text-side counterpart of the
    * `/ann` route's ivfAnnFromStore). A request is EITHER a raw token
    * bag (`qTerms`, normalized through the same [[graft.functions
    * .TextFunctions.tokens]] rule the index side tokenizes with, scored
    * under the synthetic q_id = −1 — outside every corpus id domain, so
    * the self-pair guard can never suppress a real hit) OR a
    * more-like-this doc id (`docId` — its rarest-`qt` stored terms form
    * the bag exactly as batch q130 prunes its queries; a PURGED doc has
    * no stored rows, so its bag is empty and the request serves 0 rows).
    *
    * Knobs compose the maintained retrieval ladder: `expand` runs q163's
    * RM3 loop (stage-1 feedback docs from the store-served BM25 leg,
    * tf·idf_micro expansion votes, integer 2/1 interpolation);
    * `rerank = Some("maxsim")` reranks the BM25 top-[[graft.operators
    * .CorpusOps.MaxSimCand]] candidates with q160's budgeted-token
    * MaxSim off the same stored tf evidence. Everything scores with the
    * store's own (df, dl, tot, N) statistics — which follow every
    * append and purge — and stays posting-list-bounded: candidate work
    * is Σ posting lengths over the bag's ≤ qt (+ expansion) terms.
    * Returns `(q_id, rk, doc_id, score)`.
    */
  def searchFromStore(s: SparkSession, corpusDir: String,
      qTerms: Seq[String] = Nil, docId: Option[Long] = None,
      k: Int = graft.operators.CorpusOps.Bm25K,
      qt: Int = graft.operators.CorpusOps.Bm25QTerms,
      expand: Boolean = false,
      rerank: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    require(qTerms.nonEmpty != docId.isDefined,
      "provide exactly one of qTerms / docId")
    require(rerank.forall(_ == "maxsim"), s"unknown rerank '${rerank.get}' (maxsim)")
    val ops = graft.operators.CorpusOps
    val (tf, nT) = storedTfAndN(s, corpusDir)
    val (dfF, dl, tot) = ops.tfStats(tf)
    val bags = docId match {
      case Some(id) => ops.rarestBags(tf.filter(col("doc_id") === id), dfF, qt)
      case None =>
        import s.implicits._
        qTerms.toDF("raw")
          .select(explode(graft.functions.TextFunctions.tokens(col("raw"))).as("term"))
          .filter(col("term") =!= "")
          .distinct()
          // a term the stored corpus has never seen has no posting list
          // (and no df) — it cannot contribute score, so it drops here
          .join(dfF, "term")
          .select(lit(-1L).as("q_id"), col("term"), lit(1L).as("mw"), col("df"))
    }
    val scoredBags =
      if (!expand) bags
      else {
        val fb = ops.bm25OverBags(tf, nT, bags, dl, tot, ops.PrfDocs, "fb_micro")
          .select(col("q_id"), col("doc_id"))
        ops.rm3ExpandBag(tf, nT, dfF, bags, fb, ops.PrfTerms)
      }
    if (rerank.contains("maxsim")) {
      val cand = ops.bm25OverBags(tf, nT, scoredBags, dl, tot, ops.MaxSimCand, "score")
        .select(col("q_id"), col("doc_id"))
      ops.maxSimRerank(tf, dfF, scoredBags.select(col("q_id"), col("term")), cand, k)
    } else
      ops.bm25OverBags(tf, nT, scoredBags, dl, tot, k, "score")
        .select(col("q_id"), col("rk"), col("doc_id"), col("score"))
  }

  // ------------------------------------------- substring anchor store --

  /** The durable `(doc_id, i, s)` positional K-gram anchor store behind
    * [[maintainAnchorIndex]] — the substring-dedup (q153) counterpart of
    * the tf store: the O(corpus chars) explode+md5 anchor stream is the
    * query's dominant cost, and every other dedup signal
    * (shingle/chunk/tf/media/SRP/IVF) already has a durable maintained
    * tier; this closes the batch-only gap.
    */
  private[graft] val AnchorStoreName = "anchor_index"

  /** The anchor width is sidecar geometry: anchors hashed under a
    * different K are incomparable grams, so a constant change across
    * builds must trip the store instead of silently mixing widths.
    */
  private def anchorParams: Map[String, String] =
    Map("k" -> graft.operators.Fuzzy.SubstringK.toString, "hash" -> "md5-60")

  /** Bootstrap the anchor store from an existing corpus frame (possibly
    * empty) — required before attaching [[maintainAnchorIndex]], same
    * contract as the tf/chunk/SRP bootstraps. corpusCount tracks DOCUMENT
    * rows (not anchor rows): the serve-side staleness check compares it
    * against the corpus it is asked to profile, and short docs (< K
    * chars) produce zero anchors but still count as documents.
    */
  private[graft] def bootstrapAnchorStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): Unit = {
    val (n, dig) = countAndDigest(docs)
    graft.IndexStore.servedFrom(s, corpusDir, AnchorStoreName, anchorParams,
      corpusCount = n)(graft.operators.Fuzzy.anchorRows(docs))
    recordDigest(s, corpusDir, AnchorStoreName, dig)
  }

  /** Apply one micro-batch of `(doc_id, text, …)` documents to the anchor
    * store; false = replay, skipped. Like the tf store, the append needs
    * NO store probe: anchors are keyed by doc_id and the stream's doc ids
    * are append-only, so a batch's rows are disjoint from everything
    * stored — per-batch cost is exactly O(batch chars) explode+hash work.
    */
  private[graft] def applyAnchorBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, AnchorStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainAnchorIndex requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      val path = graft.IndexStore.storePath(root, corpusDir, AnchorStoreName)
      require(graft.IndexStore.committed(s, path),
        s"bootstrap the anchor store at $path (bootstrapAnchorStore over the " +
          "existing corpus) before attaching an anchor maintainer")
      val storedK = graft.IndexStore.storedMeta(s, corpusDir, AnchorStoreName)
        .flatMap(_.get("k"))
      require(storedK.contains(graft.operators.Fuzzy.SubstringK.toString),
        s"anchor store at $path was built with K=${storedK.getOrElse("?")}, " +
          s"this build hashes K=${graft.operators.Fuzzy.SubstringK} — refuse to mix")
      val (n, dig) = countAndDigest(docs)
      graft.IndexStore.append(s, corpusDir, AnchorStoreName,
        graft.operators.Fuzzy.anchorRows(docs),
        incrementCount = n, // advance the DOCUMENT count the serve check reads
        extraMeta = Map(markerKey(stream) -> batchId.toString) ++
          advancedDigest(graft.IndexStore.storedMeta(s, corpusDir, AnchorStoreName), dig))
      true
    }

  /** Attach an anchor-index maintainer to a `(doc_id, text, …)` stream:
    * each micro-batch's positional K-gram anchors land in the durable
    * store at O(batch chars) cost, exactly once behind the batch marker,
    * so substring-level dedup
    * ([[graft.operators.Fuzzy.substringDedupFromStore]]) profiles the
    * corpus as of the last committed batch without re-hashing every char
    * position ingested today.
    */
  def maintainAnchorIndex(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "anchor_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyAnchorBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  // ------------------------------------------------ DSIR profile store --

  private[graft] val DsirStoreName = "dsir_profiles"

  private def dsirParams: Map[String, String] = Map(
    "buckets" -> graft.operators.CorpusOps.DsirBuckets.toString,
    "targetLang" -> graft.operators.CorpusOps.DsirTargetLang)

  /** The geometry tripwire for every DSIR-store access, not just the
    * bootstrap: an append hashes its increment with the CURRENT
    * DsirBuckets/DsirTargetLang constants and serving sums whatever the
    * parquet holds, so a constant change across versions would silently
    * mix bucket spaces / target languages in one store unless the sidecar
    * is checked at every touch point. Fails loudly on drift (and on a
    * bare/torn sidecar — a store whose geometry can't be proven is not a
    * store to mix increments into).
    */
  private def requireDsirGeometry(s: SparkSession, corpusDir: String): Unit = {
    val meta = graft.IndexStore.storedMeta(s, corpusDir, DsirStoreName)
      .getOrElse(throw new IllegalStateException(
        "DSIR store has no readable metadata sidecar — re-bootstrap with " +
          "bootstrapDsirStore before appending to or serving from it"))
    val drift = dsirParams.collect {
      case (k, v) if !meta.get(k).contains(v) =>
        s"$k: store=${meta.getOrElse(k, "?")} current=$v"
    }
    if (drift.nonEmpty) throw new IllegalStateException(
      s"DSIR store geometry drift (${drift.mkString("; ")}) — the store was " +
        "built under different DsirBuckets/DsirTargetLang constants; rebuild " +
        "with bootstrapDsirStore instead of mixing feature spaces")
  }

  /** Bootstrap the durable DSIR profile store from an existing
    * `(doc_id, text, lang, …)` corpus (possibly empty): one row per
    * touched hash bucket with raw/target token counts. Geometry (bucket
    * count + target language) is pinned in the sidecar, so a geometry
    * change rebuilds loudly instead of mixing feature spaces.
    */
  private[graft] def bootstrapDsirStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): Unit = {
    graft.IndexStore.servedFrom(s, corpusDir, DsirStoreName,
      params = dsirParams, corpusCount = docs.count())(
      graft.operators.CorpusOps.dsirProfileRows(docs))
    clearPurgeStale(s, corpusDir, DsirStoreName)
  }

  /** Apply one micro-batch to the DSIR profile store; false = replay,
    * skipped. The append is a bucket-profile INCREMENT — ≤ [[graft
    * .operators.CorpusOps.DsirBuckets]] rows per batch no matter the
    * batch size, and no store probe at all (profiles are additive:
    * serving sums per bucket). The tf-store bootstrap guard applies for
    * the same reason: append never creates the sidecar.
    */
  private[graft] def applyDsirBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, DsirStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainDsirProfiles requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      require(graft.IndexStore.committed(s,
        graft.IndexStore.storePath(root, corpusDir, DsirStoreName)),
        s"bootstrap the DSIR store for $corpusDir (bootstrapDsirStore over " +
          "the existing corpus) before attaching a profile maintainer")
      requireDsirGeometry(s, corpusDir)
      graft.IndexStore.append(s, corpusDir, DsirStoreName,
        graft.operators.CorpusOps.dsirProfileRows(docs),
        incrementCount = docs.count(),
        extraMeta = Map(markerKey(stream) -> batchId.toString))
      true
    }

  /** Attach a DSIR profile maintainer to a `(doc_id, text, lang, …)`
    * stream: the importance MODEL stays current as the corpus grows —
    * each micro-batch lands one O(buckets)-sized profile increment,
    * exactly once behind the batch marker, so selection
    * ([[dsirSelectFromStore]]) always scores against the corpus as of
    * the last committed batch without re-tokenizing history.
    */
  def maintainDsirProfiles(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "dsir_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyDsirBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** The smoothed ratio-weight table off the grown profile store — the
    * identical integer arithmetic as batch q144's weights: the store's
    * increments sum per bucket (bucket-sized aggregate), then one
    * DECIMAL(38,0) division per bucket. Spec-pinned equal to the batch
    * weight table over the same corpus.
    */
  def dsirWeightsFromStore(s: SparkSession, corpusDir: String): DataFrame = {
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("dsirWeightsFromStore requires a configured " +
        s"index store (${graft.IndexStore.DirConf})"))
    val path = graft.IndexStore.storePath(root, corpusDir, DsirStoreName)
    require(graft.IndexStore.committed(s, path),
      s"bootstrap the DSIR store at $path before serving weights from it")
    requireDsirGeometry(s, corpusDir)
    requireNotPurgeStale(s, corpusDir, DsirStoreName, "bootstrapDsirStore")
    import org.apache.spark.sql.functions._
    // net-zero buckets (all their mass purged via negated increments —
    // [[purgeAll]]) must vanish exactly as in a fresh survivor build
    val prof = s.read.parquet(path)
      .groupBy(col("b"))
      .agg(sum(col("c_raw")).cast(org.apache.spark.sql.types.LongType).as("c_raw"),
        sum(col("c_tgt")).cast(org.apache.spark.sql.types.LongType).as("c_tgt"))
      .filter(col("c_raw") > 0)
    graft.operators.CorpusOps.dsirWeights(prof)
  }

  /** q144's length-normalized importance shortlist of `docs`, scored
    * against the STORED profiles — the serving path of continuous data
    * selection: score any candidate frame (e.g. today's crawl) against
    * the model the maintainer keeps current.
    */
  def dsirSelectFromStore(s: SparkSession, corpusDir: String,
      docs: DataFrame, k: Int = graft.operators.CorpusOps.DsirK): DataFrame =
    graft.operators.CorpusOps.dsirShortlist(
      graft.operators.CorpusOps.dsirDb(graft.operators.CorpusOps.tfRows(docs)),
      dsirWeightsFromStore(s, corpusDir), k)

  // ------------------------------------------------- bigram LM store ----

  private[graft] val LmStoreName = "lm_bigrams"

  /** Bootstrap the durable bigram-count store from an existing corpus —
    * `(a, b, c)` counts, ADDITIVE like the DSIR profiles (serving sums
    * per bigram type), so maintenance needs no store probe. Unigram
    * totals for the smoothing denominators ride the EXISTING tf store —
    * attach BOTH maintainers to the same stream.
    */
  private[graft] def bootstrapLmStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): Unit = {
    val (n, dig) = countAndDigest(docs)
    graft.IndexStore.servedFrom(s, corpusDir, LmStoreName, corpusCount = n)(
      graft.operators.CorpusOps.bigramBags(docs)
        .groupBy(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"))
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("c"))
          .cast(org.apache.spark.sql.types.LongType)
          .as("c")))
    recordDigest(s, corpusDir, LmStoreName, dig)
    clearPurgeStale(s, corpusDir, LmStoreName)
  }

  /** Apply one micro-batch of documents to the bigram store; false =
    * replay, skipped. O(batch) rows per append (the batch's bigram
    * TYPES), no store probe.
    */
  private[graft] def applyLmBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, LmStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainLmBigrams requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      require(graft.IndexStore.committed(s,
        graft.IndexStore.storePath(root, corpusDir, LmStoreName)),
        s"bootstrap the LM store for $corpusDir (bootstrapLmStore over the " +
          "existing corpus) before attaching a bigram maintainer")
      import org.apache.spark.sql.functions._
      val (n, dig) = countAndDigest(docs)
      graft.IndexStore.append(s, corpusDir, LmStoreName,
        graft.operators.CorpusOps.bigramBags(docs)
          .groupBy(col("a"), col("b"))
          .agg(sum(col("c")).cast(org.apache.spark.sql.types.LongType).as("c")),
        incrementCount = n,
        extraMeta = Map(markerKey(stream) -> batchId.toString) ++
          advancedDigest(graft.IndexStore.storedMeta(s, corpusDir, LmStoreName), dig))
      true
    }

  /** Attach a bigram-count maintainer to a `(doc_id, text, …)` stream —
    * the quality-filter LM (q146) stays current as the corpus grows,
    * like the DSIR importance model.
    */
  def maintainLmBigrams(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "lm_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyLmBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** The smoothed transition-probability model off the grown stores —
    * bigram counts summed from the LM store, unigram totals from the tf
    * store (both exactly-once maintained). Spec-pinned equal to the
    * batch q146 model over the same corpus.
    */
  def lmModelFromStore(s: SparkSession, corpusDir: String): DataFrame = {
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("lmModelFromStore requires a configured " +
        s"index store (${graft.IndexStore.DirConf})"))
    val lmPath = graft.IndexStore.storePath(root, corpusDir, LmStoreName)
    val tfPath = graft.IndexStore.storePath(root, corpusDir, TfStoreName)
    require(graft.IndexStore.committed(s, lmPath) &&
      graft.IndexStore.committed(s, tfPath),
      "bootstrap BOTH the lm_bigrams and tf_index stores before serving " +
        s"the LM model ($lmPath, $tfPath)")
    requireNotPurgeStale(s, corpusDir, LmStoreName, "bootstrapLmStore")
    // The model mixes two stores — bigram numerators from lm_bigrams,
    // unigram smoothing denominators from tf_index — which is only sound
    // when both cover the SAME corpus snapshot. If only one maintainer is
    // attached, or one lags a batch, the smoothed probabilities would be
    // computed from mismatched snapshots with no symptom; compare the
    // sidecars' corpus counts and refuse to serve on disagreement.
    val lmMeta = graft.IndexStore.storedMeta(s, corpusDir, LmStoreName)
    val tfMeta = graft.IndexStore.storedMeta(s, corpusDir, TfStoreName)
    val lmN = lmMeta.flatMap(_.get(graft.IndexStore.CorpusCountKey))
    val tfN = tfMeta.flatMap(_.get(graft.IndexStore.CorpusCountKey))
    if (lmN.isEmpty || tfN.isEmpty || lmN != tfN)
      throw new IllegalStateException(
        s"lm_bigrams and tf_index cover different corpus snapshots " +
          s"(lm corpusCount=${lmN.getOrElse("?")}, tf corpusCount=${tfN.getOrElse("?")}) — " +
          "attach BOTH maintainers to the same stream and let them catch up. " +
          "If the divergence came from a document purge (purgeKeys decrements " +
          "tf_index's corpusCount but lm_bigrams, keyed by (a,b), cannot be " +
          "doc-purged), catching up can never re-agree: re-bootstrap the LM " +
          "store from the post-purge corpus (bootstrapLmStore) instead")
    // Equal counts are necessary but not sufficient — two maintainers that
    // each ingested N docs from DIFFERENT batches pass the count check.
    // The content digest (bit_xor of per-doc xxhash64, bootstrap-stamped
    // and XOR-advanced per batch) distinguishes them. Either side missing
    // it (pre-digest store, or post-purge: purgeKeys drops the key) falls
    // back to count-only with a warning — the digest re-appears at the
    // next re-bootstrap.
    val lmH = lmMeta.flatMap(_.get(graft.IndexStore.CorpusHashKey))
    val tfH = tfMeta.flatMap(_.get(graft.IndexStore.CorpusHashKey))
    (lmH, tfH) match {
      case (Some(a), Some(b)) if a != b =>
        throw new IllegalStateException(
          s"lm_bigrams and tf_index ingested the same corpus COUNT ($lmN docs) " +
            s"but different corpus CONTENT (digests $a vs $b) — the maintainers " +
            "consumed different batches. Attach both to the same stream, or " +
            "re-bootstrap both stores from the same corpus snapshot")
      case (Some(_), Some(_)) => ()
      case _ =>
        log.warn("lmModelFromStore: corpus content digest missing on " +
          s"${if (lmH.isEmpty) LmStoreName else TfStoreName} — serving on " +
          "count equality alone; re-bootstrap to restore the digest tripwire")
    }
    import org.apache.spark.sql.functions._
    // drop net-zero bigram types: a purge appends NEGATED counts
    // ([[purgeAll]]), so a bigram seen only in purged docs sums to 0 and
    // must vanish exactly as in a fresh build over the surviving corpus
    val bg = s.read.parquet(lmPath)
      .groupBy(col("a"), col("b"))
      .agg(sum(col("c")).cast(org.apache.spark.sql.types.LongType).as("c12"))
      .filter(col("c12") > 0)
    val uni = s.read.parquet(tfPath)
      .groupBy(col("term")).agg(sum(col("tf")).as("n"))
    graft.operators.CorpusOps.lmModelOverBigrams(bg, uni)
  }

  /** q146's per-doc LM quality report for `docs`, scored against the
    * STORED model — the continuous quality-filter serving path.
    */
  def lmScoreFromStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): DataFrame =
    graft.operators.CorpusOps.lmScoreOverModel(
      graft.operators.CorpusOps.bigramBags(docs),
      lmModelFromStore(s, corpusDir))

  // ------------------------------------------------ BPE model store -----

  /** Durable `(term, freq)` word-frequency store behind
    * [[maintainBpeModel]] — ADDITIVE like the DSIR profiles and LM
    * bigrams (serving sums per term), so appends are O(batch) and a
    * purge decrements exactly ([[purgeAll]]'s negated increments).
    */
  private[graft] val BpeWordStoreName = "bpe_words"

  /** Durable learned merge sequence (round, left_sym, right_sym,
    * pair_count) — the fit artifact, overwritten wholesale by a refit
    * (bounded: [[graft.operators.Bpe.Rounds]] rows).
    */
  private[graft] val BpeModelStoreName = "bpe_merges"

  /** Compression-ratio ledger (on the WORD store's sidecar, where the
    * batch markers live): Fit* = frequency-weighted (Σ freq·|syms|,
    * Σ freq·|chars|) of the vocabulary encoded under the merges at fit
    * time; Inc* = the same sums over batches appended SINCE, each batch
    * encoded under the STORED merges at ingest. The trigger is the
    * statistic an operator would watch: new text that the learned merges
    * compress ≥ [[BpeDriftPct]]% worse than the fit corpus (symbols per
    * character, cross-multiplied BigInt compare — exact), armed once the
    * appended char mass reaches [[BpeDriftMinIncPct]]% of the fit's.
    */
  private[graft] val BpeFitSymsKey = "bpeFitSyms"
  private[graft] val BpeFitCharsKey = "bpeFitChars"
  private[graft] val BpeIncSymsKey = "bpeIncSyms"
  private[graft] val BpeIncCharsKey = "bpeIncChars"
  private[graft] val BpeLastRefitTriggerKey = "bpeLastRefitTrigger"
  private[graft] val BpeDriftMinIncPct = 5L
  private[graft] val BpeDriftPct = 10L

  private def bpeWordRows(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.CorpusOps.tfRows(docs)
      .groupBy(col("term"))
      .agg(sum(col("tf")).cast(org.apache.spark.sql.types.LongType).as("freq"))
  }

  /** The summed (purge-aware: net-zero terms vanish) word-frequency frame
    * off the durable store.
    */
  private def bpeStoreWords(s: SparkSession, corpusDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException(s"BPE store access requires ${graft.IndexStore.DirConf}"))
    s.read.parquet(graft.IndexStore.storePath(root, corpusDir, BpeWordStoreName))
      .groupBy(col("term"))
      .agg(sum(col("freq")).cast(org.apache.spark.sql.types.LongType).as("freq"))
      .filter(col("freq") > 0)
  }

  private def writeBpeMerges(s: SparkSession, corpusDir: String,
      merges: Seq[(Long, String, String, Long)]): Unit = {
    val root = graft.IndexStore.configuredDir(s).get
    val path = graft.IndexStore.storePath(root, corpusDir, BpeModelStoreName)
    import s.implicits._
    merges.toDF("round", "left_sym", "right_sym", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
    graft.IndexStore.writeMeta(s, path, Map(
      graft.IndexStore.StoreRowsKey -> merges.length.toString,
      "rounds" -> graft.operators.Bpe.Rounds.toString))
  }

  /** The stored merge sequence (bounded: ≤ Rounds rows). */
  private[graft] def storedBpeMerges(s: SparkSession,
      corpusDir: String): Option[Seq[(Long, String, String, Long)]] =
    graft.IndexStore.configuredDir(s).flatMap { root =>
      val path = graft.IndexStore.storePath(root, corpusDir, BpeModelStoreName)
      if (!graft.IndexStore.committed(s, path)) None
      else Some(s.read.parquet(path)
        .orderBy(org.apache.spark.sql.functions.col("round"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq)
    }

  /** Bootstrap the durable BPE tier from an existing corpus: word counts
    * (additive store), the learned merge sequence, and the compression
    * baseline — required before attaching [[maintainBpeModel]].
    */
  private[graft] def bootstrapBpeStore(s: SparkSession, corpusDir: String,
      docs: DataFrame): Unit = {
    val (n, dig) = countAndDigest(docs)
    graft.IndexStore.servedFrom(s, corpusDir, BpeWordStoreName,
      corpusCount = n)(bpeWordRows(docs))
    recordDigest(s, corpusDir, BpeWordStoreName, dig)
    clearPurgeStale(s, corpusDir, BpeWordStoreName)
    val words = bpeStoreWords(s, corpusDir)
    val merges = graft.operators.Bpe.learn(words)
    writeBpeMerges(s, corpusDir, merges)
    val (sy, ch) = graft.operators.Bpe.compressionStats(
      graft.operators.Bpe.applyMerges(words, merges))
    val root = graft.IndexStore.configuredDir(s).get
    val wordPath = graft.IndexStore.storePath(root, corpusDir, BpeWordStoreName)
    graft.IndexStore.readMeta(s, wordPath).foreach { meta =>
      graft.IndexStore.writeMeta(s, wordPath, meta ++ Map(
        BpeFitSymsKey -> sy.toString, BpeFitCharsKey -> ch.toString,
        BpeIncSymsKey -> "0", BpeIncCharsKey -> "0"))
    }
  }

  /** Apply one micro-batch of `(doc_id, text, …)` documents to the BPE
    * tier; false = replay, skipped. O(batch) word counting plus an
    * O(batch · Rounds) encode of the batch's words under the STORED
    * merges — the compression increment rides the batch marker's sidecar
    * write, so a replay advances nothing.
    */
  private[graft] def applyBpeBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, docs: DataFrame): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, BpeWordStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainBpeModel requires a configured " +
          s"index store (${graft.IndexStore.DirConf})"))
      val wordPath = graft.IndexStore.storePath(root, corpusDir, BpeWordStoreName)
      require(graft.IndexStore.committed(s, wordPath) &&
        graft.IndexStore.committed(s,
          graft.IndexStore.storePath(root, corpusDir, BpeModelStoreName)),
        s"bootstrap the BPE stores for $corpusDir (bootstrapBpeStore) " +
          "before attaching a maintainer")
      val merges = storedBpeMerges(s, corpusDir).getOrElse(throw
        new IllegalStateException(s"torn BPE model store for $corpusDir — re-bootstrap"))
      val (n, dig) = countAndDigest(docs)
      val w = bpeWordRows(docs)
      val (sy, ch) = graft.operators.Bpe.compressionStats(
        graft.operators.Bpe.applyMerges(w, merges))
      val meta0 = graft.IndexStore.readMeta(s, wordPath).getOrElse(Map.empty)
      def adv(key: String, d: BigInt) =
        key -> (meta0.get(key).map(BigInt(_)).getOrElse(BigInt(0)) + d).toString
      graft.IndexStore.append(s, corpusDir, BpeWordStoreName, w,
        incrementCount = n,
        extraMeta = Map(markerKey(stream) -> batchId.toString,
          adv(BpeIncSymsKey, sy), adv(BpeIncCharsKey, ch)) ++
          advancedDigest(graft.IndexStore.readMeta(s, wordPath), dig))
      maybeRefitBpe(s, corpusDir)
      true
    }

  /** Evaluate the compression-drift trigger and refit the merge sequence
    * in place when it fires: re-learn over the store's own summed word
    * counts, overwrite the model entry, re-stamp the baseline with zeroed
    * increments and trigger provenance. A crash between the model write
    * and the sidecar restamp leaves the old baseline against the new
    * merges — the next batch re-evaluates and re-fires; the refit is
    * deterministic, so the retry converges (the PQ-refit argument).
    */
  private def maybeRefitBpe(s: SparkSession, corpusDir: String): Unit = {
    val root = graft.IndexStore.configuredDir(s).getOrElse(return)
    val wordPath = graft.IndexStore.storePath(root, corpusDir, BpeWordStoreName)
    val meta = graft.IndexStore.readMeta(s, wordPath).getOrElse(return)
    val fitSy = meta.get(BpeFitSymsKey).map(BigInt(_)).getOrElse(return)
    val fitCh = meta.get(BpeFitCharsKey).map(BigInt(_)).getOrElse(return)
    val incSy = meta.get(BpeIncSymsKey).map(BigInt(_)).getOrElse(BigInt(0))
    val incCh = meta.get(BpeIncCharsKey).map(BigInt(_)).getOrElse(BigInt(0))
    val armed = fitCh > 0 && incCh * 100 >= fitCh * BpeDriftMinIncPct
    val fired = armed && fitSy > 0 &&
      incSy * fitCh * 100 > fitSy * incCh * (100 + BpeDriftPct)
    if (!fired) {
      if (incCh > 0)
        log.info(s"BPE model for $corpusDir: appended compression " +
          s"$incSy/$incCh vs fit $fitSy/$fitCh — below the refit trigger")
      return
    }
    log.warn(s"BPE refit for $corpusDir: trigger=compression " +
      s"(fit=$fitSy/$fitCh, appended=$incSy/$incCh)")
    val words = bpeStoreWords(s, corpusDir)
    val merges = graft.operators.Bpe.learn(words)
    writeBpeMerges(s, corpusDir, merges)
    val (sy, ch) = graft.operators.Bpe.compressionStats(
      graft.operators.Bpe.applyMerges(words, merges))
    graft.IndexStore.writeMeta(s, wordPath, meta ++ Map(
      BpeFitSymsKey -> sy.toString, BpeFitCharsKey -> ch.toString,
      BpeIncSymsKey -> "0", BpeIncCharsKey -> "0",
      BpeLastRefitTriggerKey -> "compression"))
  }

  /** Attach a BPE-model maintainer to a `(doc_id, text, …)` stream: word
    * counts land exactly once behind the batch marker, the compression
    * statistic advances in the same sidecar write, and a fired trigger
    * re-learns the merge sequence — so the tokenizer artifact (q138) and
    * the encoding report (q140) follow the corpus instead of silently
    * staling as it grows (the PQ-codebook failure mode, closed for the
    * tokenizer).
    */
  def maintainBpeModel(docs: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "bpe_maintenance"): StreamingQuery = {
    val owner = docs.sparkSession
    docs.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBpeBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }

  /** q138 served off the durable tier: the stored merge table as a frame
    * (round, left_sym, right_sym, pair_count).
    */
  def bpeMergesFromStore(s: SparkSession, corpusDir: String): DataFrame = {
    requireNotPurgeStale(s, corpusDir, BpeWordStoreName, "bootstrapBpeStore")
    import s.implicits._
    storedBpeMerges(s, corpusDir).getOrElse(throw new IllegalStateException(
      s"no committed BPE model store for $corpusDir — bootstrapBpeStore first"))
      .toDF("round", "left_sym", "right_sym", "pair_count")
  }

  /** q140's vocabulary encoding served off the durable tier: the summed
    * word store encoded under the stored merges — `(term, syms, freq)`.
    */
  def bpeEncodedFromStore(s: SparkSession, corpusDir: String): DataFrame = {
    requireNotPurgeStale(s, corpusDir, BpeWordStoreName, "bootstrapBpeStore")
    val merges = storedBpeMerges(s, corpusDir).getOrElse(throw
      new IllegalStateException(
        s"no committed BPE model store for $corpusDir — bootstrapBpeStore first"))
    graft.operators.Bpe.applyMerges(bpeStoreWords(s, corpusDir), merges)
  }

  // ------------------------------------------ IVF assignment store ------

  /** Durable `(vec_id, embedding, eq, cid, idot)` assignments of every
    * corpus vector to its nearest stored centroid — the INVERTED FILE
    * itself, maintained continuously: each micro-batch assigns its
    * vectors against the stored model at O(batch · k) cost and appends,
    * so ANN serving ([[graft.operators.Similarity.ivfAnnFromStore]])
    * never recomputes the corpus-wide argmax. Unlike the additive stores
    * (tf/DSIR/LM), centroids LEARN nothing from appends — so the
    * maintainer tracks a drift statistic and refits past threshold (see
    * [[applyIvfBatch]]), closing the gap the wholesale ≥2× growth policy
    * ([[graft.operators.Ivf.RefitGrowthFactor]]) left: a distribution
    * shift the corpus-size trigger cannot see.
    */
  private[graft] val IvfAssignStoreName = "ivf_assign"

  /** The maintained IVF/PQ index families: "" = the text-side family,
    * "_xm" = the cross-modal image-side one (ids in the 2^40-offset
    * domain). Every per-family maintenance surface (ledger views,
    * unified purge) iterates this list so a new family extends them all.
    */
  private[graft] val IndexFamilies: Seq[String] = Seq("", "_xm")

  /** Sidecar keys of the drift statistic. Fit* = assignment-quality
    * baseline recorded when the current model was fit (Σ idot and row
    * count over the fit corpus, exact — the sum rides DECIMAL(38,0) and
    * the sidecar stores decimal strings, so no Long overflow at any
    * corpus size). Inc* = the same sums accumulated over batches appended
    * SINCE that fit. ivfK = the cell-count request the store was
    * bootstrapped with (0 = derive from corpus size), reused by refits.
    */
  private[graft] val IvfKKey = "ivfK"
  private[graft] val IvfFitIdotSumKey = "ivfFitIdotSum"
  private[graft] val IvfFitNKey = "ivfFitN"
  private[graft] val IvfIncIdotSumKey = "ivfIncIdotSum"
  private[graft] val IvfIncNKey = "ivfIncN"

  /** Fit-epoch counters, the exact fit/appended attribution for purges.
    * Each assignment row carries the epoch CURRENT when it was appended
    * (`ivf_epoch` / `pq_epoch` columns; fit-corpus rows carry 0, below
    * every sidecar epoch). A row contributes to an Inc ledger iff its
    * epoch equals the sidecar's current fit epoch — bootstrap stamps 1,
    * each refit bumps (re-baselining everything already in the store
    * without a row rewrite on the PQ side), so a purge can decrement the
    * Inc sums by EXACTLY the purged rows still counted there instead of
    * by all purged-present rows (which understated appended mass and
    * could defer the refit triggers unboundedly — round-15 advice).
    */
  private[graft] val IvfFitEpochKey = "ivfFitEpoch"
  private[graft] val PqFitEpochKey = "pqFitEpoch"

  /** Refit when the appended batches' MEAN assignment similarity falls
    * below this percentage of the fit baseline's mean — new data landing
    * far from every existing centroid is exactly the drift that keeps
    * corpus size flat-ish while destroying cell quality (probe recall
    * rots with no growth symptom). 50% is deliberately conservative: the
    * cross-multiplied integer comparison makes any threshold exact.
    */
  private[graft] val IvfDriftMeanPct = 50L

  /** Drift is only judged once the appended mass is ≥ this percentage of
    * the fit corpus — a handful of outlier vectors must not refit a
    * billion-row index.
    */
  private[graft] val IvfDriftMinIncPct = 5L

  /** Per-cell counts of the mass appended since the last fit, as a
    * compact `cid:count,…` sidecar string — the occupancy-skew statistic
    * the mean-dot trigger cannot see: a NEW HOT MODE (one cell absorbing
    * most appends) degrades that cell's probe cost long before the global
    * mean assignment dot halves (the hot vectors can sit CLOSE to their
    * centroid — high dot, no drift signal — while the cell outgrows every
    * other). O(k) sidecar bytes; k is clamped at [[graft.operators
    * .Sizing.MaxCells]] (65536 → ≤ ~1 MB in one sidecar file, the same
    * order as the centroid store itself). Advanced in the SAME sidecar
    * write as the batch marker, so a replayed batch advances nothing;
    * cleared on every refit (tracking restarts against the new cells).
    */
  private[graft] val IvfIncCellCountsKey = "ivfIncCellCounts"

  /** The last fired refit trigger (`growth` / `drift` / `skew`) — serving
    * surfaces (the `ivf_drift` gateway view) report WHY the index last
    * refit, not just that it did.
    */
  private[graft] val IvfLastRefitTriggerKey = "ivfLastRefitTrigger"

  /** Skew refit fires when the appended mass is armed (≥
    * [[IvfDriftMinIncPct]]% of the fit corpus, same floor as the mean-dot
    * trigger) AND the hottest cell holds ≥ this multiple of its balanced
    * share of the appends (maxCellCount · k ≥ factor · trackedIncN — an
    * exact integer cross-multiply). 8× balanced share is far outside
    * k-means' natural occupancy spread on stationary data but reached
    * immediately by a new concentrated mode.
    */
  private[graft] val IvfSkewFactor = 8L

  // ---- PQ codebook drift (the fine quantizer's staleness statistic) ----
  // The coarse IVF model has growth/drift/skew maintenance; without these
  // keys the PQ families only refresh under the wholesale ≥2× policy, and
  // ADC quantization error drifts SILENTLY between refreshes (round-14
  // gap #4). The statistic: exact integer Σ|selfdot − bestcode-dot| over
  // a deterministic hash probe sample ([[graft.operators.Similarity
  // .pqResidualStats]]) — the reconstruction loss ADC scoring pays —
  // with a fit baseline stamped at bootstrap/refit and per-batch
  // increments advanced in the SAME sidecar write as the batch marker
  // (replay-safe like every other key here).

  private[graft] val PqFitResSumKey = "pqFitResSum"
  private[graft] val PqFitResNKey = "pqFitResN"
  private[graft] val PqIncResSumKey = "pqIncResSum"
  private[graft] val PqIncResNKey = "pqIncResN"
  /** The probe-sample modulus the baseline was computed under — batches
    * must sample under the SAME modulus for the means to be comparable.
    */
  private[graft] val PqResModKey = "pqResMod"
  private[graft] val PqLastRefitTriggerKey = "pqLastRefitTrigger"

  /** Refit when the appended sample's MEAN residual exceeds this multiple
    * of the fit baseline's mean (cross-multiplied BigInt compare, exact):
    * new data the codebooks reconstruct 2× worse than their training
    * distribution is drifted enough that ADC ordering degrades. Armed
    * under the same ≥ [[IvfDriftMinIncPct]]% appended-mass floor as the
    * coarse triggers — a handful of outliers must not refit the family.
    */
  private[graft] val PqResidFactor = 2L

  /** Residual probe-sample target: the statistic needs a stable mean, not
    * the corpus — 64k sampled rows bound the per-refresh scoring pass at
    * any corpus size (the sums are distributed; only two scalars ever
    * reach the driver).
    */
  private[graft] val PqResSampleTarget = 65536L

  /** Decoded PQ drift sidecar — the single place the residual predicate
    * is written, shared by [[maybeRefitPq]] and the `pq_drift` gateway
    * view (the ledger the trigger can never disagree with).
    */
  private[graft] final case class PqDriftSnapshot(fitN: Long, fitSum: BigInt,
      incN: Long, incSum: BigInt, mod: Int, lastTrigger: Option[String]) {
    def residual: Boolean = fitN > 0 && fitSum > 0 &&
      incN * 100 >= fitN * IvfDriftMinIncPct &&
      incSum * BigInt(fitN) > BigInt(PqResidFactor) * fitSum * BigInt(incN)
  }

  private[graft] def pqDriftSnapshot(meta: Map[String, String]): Option[PqDriftSnapshot] =
    for {
      fitN <- meta.get(PqFitResNKey).flatMap(_.toLongOption)
      fitSum <- meta.get(PqFitResSumKey).map(BigInt(_))
      mod <- meta.get(PqResModKey).flatMap(_.toIntOption)
    } yield PqDriftSnapshot(fitN, fitSum,
      meta.get(PqIncResNKey).flatMap(_.toLongOption).getOrElse(0L),
      meta.get(PqIncResSumKey).map(BigInt(_)).getOrElse(BigInt(0)),
      mod, meta.get(PqLastRefitTriggerKey))

  /** The committed text-side PQ codebook family, or None when any entry
    * is absent/torn (PQ maintenance not bootstrapped — the batch path
    * then advances nothing).
    */
  private def storedPqModels(s: SparkSession, corpusDir: String,
      family: String = ""): Option[Seq[graft.operators.Ivf.Model]] =
    graft.IndexStore.configuredDir(s).flatMap { root =>
      val loaded = (0 until graft.operators.Similarity.pqSubvectors).map { m =>
        graft.operators.Ivf.load(s, graft.IndexStore.storePath(root, corpusDir,
          graft.operators.Similarity.pqModelStoreName(m, family)))
      }
      if (loaded.forall(_.isDefined)) Some(loaded.map(_.get)) else None
    }

  /** One decoded view of the assignment store's drift sidecar — the
    * SINGLE place the three refit predicates are written, shared by
    * [[maybeRefitIvf]] (the trigger) and the `ivf_drift` gateway view
    * (the ledger), so the surface an analyst reads can never disagree
    * with the policy the maintainer runs.
    */
  private[graft] final case class IvfDriftSnapshot(fitN: Long, fitSum: BigInt,
      incN: Long, incSum: BigInt, rows: Long, k: Int,
      cellCounts: Map[Int, Long], lastTrigger: Option[String]) {
    def trackedIncN: Long = cellCounts.valuesIterator.sum
    def hotCell: Option[(Int, Long)] =
      if (cellCounts.isEmpty) None
      else Some(cellCounts.minBy { case (c, n) => (-n, c) }) // deterministic: max count, min cid
    def growth: Boolean = fitN > 0 &&
      rows.toDouble >= graft.operators.Ivf.RefitGrowthFactor * fitN
    def drift: Boolean = fitN > 0 && fitSum > 0 &&
      incN * 100 >= fitN * IvfDriftMinIncPct &&
      incSum * 100 * BigInt(fitN) < fitSum * BigInt(incN) * IvfDriftMeanPct
    def skew: Boolean = fitN > 0 && k >= 2 &&
      trackedIncN * 100 >= fitN * IvfDriftMinIncPct &&
      hotCell.exists(_._2 * k >= IvfSkewFactor * trackedIncN)
  }

  /** Decode the drift sidecar; None when the store has no fit baseline
    * (pre-bootstrap or pre-drift-era sidecar).
    */
  private[graft] def driftSnapshot(meta: Map[String, String]): Option[IvfDriftSnapshot] =
    for {
      fitN <- meta.get(IvfFitNKey).flatMap(_.toLongOption)
      fitSum <- meta.get(IvfFitIdotSumKey).map(BigInt(_))
      rows <- meta.get(graft.IndexStore.StoreRowsKey).flatMap(_.toLongOption)
    } yield IvfDriftSnapshot(fitN, fitSum,
      meta.get(IvfIncNKey).flatMap(_.toLongOption).getOrElse(0L),
      meta.get(IvfIncIdotSumKey).map(BigInt(_)).getOrElse(BigInt(0)),
      rows,
      meta.get(IvfKKey).flatMap(_.toIntOption).getOrElse(0),
      parseCellCounts(meta.getOrElse(IvfIncCellCountsKey, "")),
      meta.get(IvfLastRefitTriggerKey))

  private def parseCellCounts(enc: String): Map[Int, Long] =
    if (enc == null || enc.isEmpty) Map.empty
    else enc.split(',').iterator.map { kv =>
      val Array(c, n) = kv.split(':')
      c.toInt -> n.toLong
    }.toMap

  private def encodeCellCounts(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (c, n) => s"$c:$n" }.mkString(",")

  /** Merge a batch's per-cell appended counts into the tracked map. The
    * batch side is a k-bounded collect (one row per non-empty cell).
    */
  private def advancedCellCounts(meta: Map[String, String],
      asg: DataFrame): String = {
    import org.apache.spark.sql.functions._
    val batch = asg.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prev = parseCellCounts(meta.getOrElse(IvfIncCellCountsKey, ""))
    encodeCellCounts(prev ++ batch.map { case (c, n) =>
      c -> (prev.getOrElse(c, 0L) + n)
    })
  }

  /** `(vec_id, embedding, eq, cid, idot)` rows of `e` under model `m`:
    * each vector's argmax-integer-dot cell (deterministic cid tiebreak —
    * the identical assignment rule as [[graft.operators.Ivf.ranked]])
    * plus the winning dot, the drift statistic's raw material. One
    * broadcast of k × dim longs, one doc-keyed window; O(batch · k).
    */
  private def ivfAssignRows(emb: DataFrame, m: graft.operators.Ivf.Model): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = emb.sparkSession
    graft.plans.GraftExtensions.register(s)
    // fit-epoch tags ride along when the caller attached them (bootstrap
    // and appends always do; see [[IvfFitEpochKey]])
    val extras = Seq("ivf_epoch", "pq_epoch").filter(emb.columns.contains)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("idot").desc, col("cid").asc)
    graft.operators.Ivf.quantize(emb)
      .select((Seq("vec_id", "embedding", "eq") ++ extras).map(col): _*)
      .crossJoin(broadcast(graft.operators.Ivf.centsDF(s, m.cents)))
      .withColumn("idot", call_function("vec_dot_long", col("eq"), col("ceq")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select((Seq("vec_id", "embedding", "eq", "cid", "idot") ++ extras).map(col): _*)
  }

  /** Target rows per file for the vec_id-clustered assignment-store
    * layout (~130k rows ≈ tens of MB with raw + quantized embeddings).
    */
  private val AssignRowsPerFile = 1L << 17

  /** Range-partition + sort an assignment frame by `vec_id` before it
    * lands in the store: files become id-range-disjoint and row groups
    * monotone, so a point lookup (`/ann?doc_id=`) prunes to O(1) row
    * groups from parquet min/max stats instead of scanning a corpus-sized
    * store — the same sorted-write discipline as the warehouse fact
    * layout, applied to the inverted file. Appends are already id-ranged
    * (append-only streams), so each batch's files stay disjoint from the
    * bootstrap's.
    */
  private def sortedByVecId(df: DataFrame, rows: Long): DataFrame = {
    val parts = math.max(1L, (rows + AssignRowsPerFile - 1) / AssignRowsPerFile).toInt
    df.repartitionByRange(parts, org.apache.spark.sql.functions.col("vec_id"))
      .sortWithinPartitions("vec_id")
  }

  /** `(rows, Σ idot)` of an assignment frame — the drift statistic's
    * per-batch increment, summed in DECIMAL(38,0) (idot ≤ ~6.4e9 per row;
    * a Long sum would overflow near 1.4e9 rows).
    */
  private def assignStats(asg: DataFrame): (Long, BigInt) = {
    import org.apache.spark.sql.functions._
    val r = asg.agg(count(lit(1)), coalesce(
      sum(col("idot").cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))),
      lit(java.math.BigDecimal.ZERO))).head()
    (r.getLong(0), BigInt(r.getDecimal(1).toBigInteger))
  }

  /** The maintained model FAMILIES: "" is the text-side family
    * (`ivf_assign` + `ivf_model` + `pq_model_<m>`); "_xm" the cross-modal
    * image-side one (`ivf_assign_xm` + `xm_ivf_model` + `pq_model_<m>_xm`
    * — q155's serving artifacts). One maintenance stack, parameterized,
    * so the image-side index follows ITS corpus exactly as the text-side
    * one does (round-14 gap #4: the xm family only refreshed wholesale).
    */
  private[graft] val Families = Set("", "_xm")

  private def ivfPaths(s: SparkSession, corpusDir: String,
      family: String = ""): (String, String) = {
    require(Families(family), s"unknown index family '$family'")
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("the IVF assignment maintainer requires a " +
        s"configured index store (${graft.IndexStore.DirConf})"))
    val modelName =
      if (family.isEmpty) graft.operators.Similarity.IvfModelStoreName
      else graft.operators.Similarity.XmIvfModelStoreName
    (graft.IndexStore.storePath(root, corpusDir, IvfAssignStoreName + family),
      graft.IndexStore.storePath(root, corpusDir, modelName))
  }

  /** Bootstrap the assignment store from an existing embeddings corpus
    * `(vec_id, embedding, …)`: fit-or-load the centroid model (the same
    * durable entry batch q53/q68 serve from), assign every vector, and
    * stamp the drift baseline. Required before attaching
    * [[maintainIvfAssignments]] — appends refuse a store with no
    * recorded fit baseline.
    */
  private[graft] def bootstrapIvfAssignments(s: SparkSession, corpusDir: String,
      e: DataFrame, k: Int = graft.operators.Similarity.ivfFixtureCells,
      maintainPq: Boolean = true, family: String = ""): Unit = {
    val (assignPath, modelPath) = ivfPaths(s, corpusDir, family)
    val eqf = graft.operators.Ivf.quantize(e)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("eq"))
    val model = graft.operators.Ivf.servedModel(s, modelPath, eqf, k)
    val nCorpus = e.count()
    graft.IndexStore.servedFrom(s, corpusDir, IvfAssignStoreName + family,
      corpusCount = nCorpus)(sortedByVecId(ivfAssignRows(
      e.withColumn("ivf_epoch", org.apache.spark.sql.functions.lit(0))
        .withColumn("pq_epoch", org.apache.spark.sql.functions.lit(0)), model), nCorpus))
    // Baseline stats over the COMMITTED rows (idempotent whether
    // servedFrom rebuilt or served fresh — either way the store is the
    // current corpus's assignments under the current model).
    val (n, sum) = assignStats(s.read.parquet(assignPath))
    // PQ tier (on by default): fit-or-load the shared text-side codebook
    // family and stamp its residual baseline over the deterministic probe
    // sample, so appends can watch ADC quantization drift from batch one.
    val pqBaseline: Map[String, String] =
      if (!maintainPq) Map.empty
      else {
        val models = graft.operators.Similarity.pqModels(s, corpusDir, eqf, tag = family)
        val mod = math.max(1L, n / PqResSampleTarget).toInt
        val (rn, rsum) = graft.operators.Similarity.pqResidualStats(models,
          eqf.filter(graft.operators.Similarity.pqResSampleFilter(mod)))
        Map(PqResModKey -> mod.toString,
          PqFitResNKey -> rn.toString, PqFitResSumKey -> rsum.toString,
          PqIncResNKey -> "0", PqIncResSumKey -> "0")
      }
    graft.IndexStore.readMeta(s, assignPath).foreach { meta =>
      graft.IndexStore.writeMeta(s, assignPath, meta ++ Map(
        IvfKKey -> k.toString,
        IvfFitIdotSumKey -> sum.toString, IvfFitNKey -> n.toString,
        IvfIncIdotSumKey -> "0", IvfIncNKey -> "0",
        IvfIncCellCountsKey -> "",
        IvfFitEpochKey -> "1", PqFitEpochKey -> "1") ++ pqBaseline)
    }
  }

  /** Apply one micro-batch of `(vec_id, embedding, …)` rows: assign
    * against the STORED model (O(batch · k)), append, advance the drift
    * sums in the same sidecar write as the batch marker, then refit if
    * either trigger fires:
    *
    *  - GROWTH: store rows ≥ [[graft.operators.Ivf.RefitGrowthFactor]] ×
    *    the fit baseline's rows (the existing wholesale policy, now
    *    evaluated continuously at ingest instead of lazily at serve);
    *  - DRIFT: appended mass ≥ [[IvfDriftMinIncPct]]% of the fit corpus
    *    AND its mean assignment dot < [[IvfDriftMeanPct]]% of the fit
    *    mean (cross-multiplied BigInt compare, exact; only armed while
    *    the baseline mean is positive — a corpus whose best-cell dots
    *    aren't positive has no meaningful "degradation" direction).
    *
    * false = replay, skipped (and the drift sums must not double-count:
    * they advance in the marker's sidecar write, so a replayed batch
    * advances nothing).
    */
  private[graft] def applyIvfBatch(s: SparkSession, corpusDir: String,
      stream: String, batchId: Long, batch: DataFrame,
      family: String = ""): Boolean =
    shouldApply(batchId, lastApplied(s, corpusDir, IvfAssignStoreName + family, stream),
      stream, corpusDir) && {
      val (assignPath, modelPath) = ivfPaths(s, corpusDir, family)
      require(graft.IndexStore.committed(s, assignPath) &&
        graft.IndexStore.committed(s, modelPath),
        s"bootstrap the IVF assignment store for $corpusDir " +
          "(bootstrapIvfAssignments) before attaching a maintainer")
      val meta0 = graft.IndexStore.readMeta(s, assignPath).getOrElse(Map.empty)
      require(meta0.contains(IvfFitNKey),
        s"IVF assignment store at $assignPath has no fit baseline — " +
          "re-bootstrap (bootstrapIvfAssignments) before appending")
      val model = graft.operators.Ivf.load(s, modelPath).getOrElse(throw
        new IllegalStateException(s"torn IVF model store at $modelPath — re-bootstrap"))
      // appended rows carry the CURRENT fit epochs: they count toward the
      // Inc ledgers until the next matching refit re-baselines them, and
      // a purge decrements exactly the rows whose epoch still matches
      val ivfEpoch = meta0.get(IvfFitEpochKey).flatMap(_.toIntOption).getOrElse(1)
      val pqEpoch = meta0.get(PqFitEpochKey).flatMap(_.toIntOption).getOrElse(1)
      val asg = ivfAssignRows(batch
          .withColumn("ivf_epoch", org.apache.spark.sql.functions.lit(ivfEpoch))
          .withColumn("pq_epoch", org.apache.spark.sql.functions.lit(pqEpoch)), model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      try {
        val (bn, bsum) = assignStats(asg)
        val incN = meta0.get(IvfIncNKey).map(_.toLong).getOrElse(0L) + bn
        val incSum = meta0.get(IvfIncIdotSumKey).map(BigInt(_)).getOrElse(BigInt(0)) + bsum
        // PQ residual advance — only when the store carries a baseline
        // (pqResMod) AND the codebook family is committed; rides the same
        // sidecar write as the batch marker, so a replay advances nothing.
        val pqInc: Map[String, String] =
          meta0.get(PqResModKey).flatMap(_.toIntOption) match {
            case Some(mod) => storedPqModels(s, corpusDir, family) match {
              case Some(models) =>
                val sampled = asg
                  .select(org.apache.spark.sql.functions.col("vec_id"),
                    org.apache.spark.sql.functions.col("eq"))
                  .filter(graft.operators.Similarity.pqResSampleFilter(mod))
                val (rn, rsum) = graft.operators.Similarity.pqResidualStats(models, sampled)
                Map(
                  PqIncResNKey -> (meta0.get(PqIncResNKey).map(_.toLong).getOrElse(0L) + rn).toString,
                  PqIncResSumKey -> (meta0.get(PqIncResSumKey).map(BigInt(_)).getOrElse(BigInt(0)) + rsum).toString)
              case None => Map.empty
            }
            case None => Map.empty
          }
        graft.IndexStore.append(s, corpusDir, IvfAssignStoreName + family,
          sortedByVecId(asg, bn),
          incrementCount = bn,
          extraMeta = Map(markerKey(stream) -> batchId.toString,
            IvfIncIdotSumKey -> incSum.toString, IvfIncNKey -> incN.toString,
            IvfIncCellCountsKey -> advancedCellCounts(meta0, asg)) ++ pqInc)
      } finally asg.unpersist()
      maybeRefitIvf(s, corpusDir, family)
      maybeRefitPq(s, corpusDir, family)
      true
    }

  /** Evaluate both refit triggers against the sidecar and refit in place
    * when one fires: re-fit the centroids over the STORE's own vectors
    * (the store carries raw + quantized embeddings precisely so a refit
    * needs no external corpus), overwrite the durable model entry,
    * re-assign everything, and publish crash-cleanly — the reassigned
    * copy is fully written and row-verified at a `.refitting` sibling
    * before the delete+rename swap ([[graft.IndexStore.compact]]'s
    * discipline; a crash never publishes a half-reassigned store). The
    * fresh sidecar carries the new fit baseline, zeroed Inc sums, and the
    * surviving batch markers.
    */
  private def maybeRefitIvf(s: SparkSession, corpusDir: String,
      family: String = ""): Unit = {
    val (assignPath, modelPath) = ivfPaths(s, corpusDir, family)
    val meta = graft.IndexStore.readMeta(s, assignPath).getOrElse(return)
    // Occupancy skew is judged over the TRACKED appends (the cell-count
    // map may have started later than the Inc sums on a pre-skew store,
    // so its own total — not IvfIncN — is the share's denominator).
    val snap = driftSnapshot(meta).getOrElse(return)
    if (!snap.growth && !snap.drift && !snap.skew) {
      if (snap.incN > 0)
        log.info(s"IVF assignments for $corpusDir: ${snap.incN} appended since " +
          s"fit (${snap.fitN} rows) — below all three refit triggers")
      return
    }
    val trigger = if (snap.growth) "growth" else if (snap.drift) "drift" else "skew"
    val (fitN, incN, rows, k) = (snap.fitN, snap.incN, snap.rows, snap.k)
    log.warn(s"IVF refit for $corpusDir: trigger=$trigger " +
      s"(fitN=$fitN, rows=$rows, incN=$incN, hotCell=${snap.hotCell}/${snap.trackedIncN})")
    val store0 = s.read.parquet(assignPath)
    // the rewrite re-baselines every row for the COARSE ledger
    // (ivf_epoch 0 < the bumped fit epoch) but must NOT touch the PQ
    // attribution — the codebooks were not refit, so each row's pq_epoch
    // rides through the reassignment untouched
    val store = (if (store0.columns.contains("pq_epoch"))
        store0.select(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("pq_epoch"))
      else store0.select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")))
      .withColumn("ivf_epoch", org.apache.spark.sql.functions.lit(0))
    val eqf = graft.operators.Ivf.quantize(store)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("eq"))
    val model = graft.operators.Ivf.fit(eqf, k)
    graft.operators.Ivf.save(s, modelPath, model)
    // the session model caches key the xm family under dir + "_xm"
    graft.operators.Similarity.invalidateIvfModel(s, corpusDir + family)
    // crash-clean reassign swap
    val staging = assignPath + ".refitting"
    val p = new org.apache.hadoop.fs.Path(assignPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    sortedByVecId(ivfAssignRows(store, model), rows)
      .write.mode("overwrite").parquet(staging)
    val reassigned = s.read.parquet(staging).count()
    if (reassigned != rows) {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw new IllegalStateException(
        s"IVF refit: reassigned copy has $reassigned rows, store has $rows — " +
          "aborted, live store untouched.")
    }
    val (n, sum) = assignStats(s.read.parquet(staging))
    graft.IndexStore.writeMeta(s, staging, meta ++ Map(
      graft.IndexStore.StoreRowsKey -> n.toString,
      graft.IndexStore.CorpusCountKey -> n.toString,
      IvfFitIdotSumKey -> sum.toString, IvfFitNKey -> n.toString,
      IvfIncIdotSumKey -> "0", IvfIncNKey -> "0",
      IvfIncCellCountsKey -> "", IvfLastRefitTriggerKey -> trigger,
      IvfFitEpochKey -> (meta.get(IvfFitEpochKey).flatMap(_.toIntOption)
        .getOrElse(1) + 1).toString))
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"IVF refit: delete $assignPath failed")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), p))
      throw new java.io.IOException(s"IVF refit: rename $staging -> $assignPath failed")
  }

  /** Evaluate the PQ residual trigger and refit the codebook family in
    * place when it fires: re-fit the four subvector codebooks over the
    * STORE's own quantized vectors (the store carries `eq` precisely so
    * refits need no external corpus), overwrite the durable
    * `pq_model_<m>` entries, drop the session cache, and stamp a fresh
    * residual baseline (recomputed under the NEW codebooks over the full
    * store's probe sample) with zeroed increments and trigger provenance.
    * Unlike the coarse refit, NO store rewrite happens — PQ codes are
    * derived at serve time from the codebooks, so the assignment rows are
    * untouched and the swap is just model entries + one sidecar write
    * (crash between them: the sidecar still holds the old baseline, the
    * next batch re-evaluates against the new codebooks' residuals and
    * re-fires — idempotent, refit is deterministic).
    */
  private def maybeRefitPq(s: SparkSession, corpusDir: String,
      family: String = ""): Unit = {
    val (assignPath, _) = ivfPaths(s, corpusDir, family)
    val meta = graft.IndexStore.readMeta(s, assignPath).getOrElse(return)
    val snap = pqDriftSnapshot(meta).getOrElse(return)
    if (!snap.residual) {
      if (snap.incN > 0)
        log.info(s"PQ codebooks for $corpusDir: ${snap.incN} sampled rows appended " +
          s"since fit (${snap.fitN} baseline) — below the residual trigger")
      return
    }
    log.warn(s"PQ refit for $corpusDir: trigger=residual " +
      s"(fit mean=${snap.fitSum}/${snap.fitN}, appended mean=${snap.incSum}/${snap.incN})")
    val eqf = s.read.parquet(assignPath).select(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("eq"))
    val models = graft.operators.Similarity.refitPqModels(s, corpusDir, eqf, tag = family)
    val storeRows = meta.get(graft.IndexStore.StoreRowsKey).flatMap(_.toLongOption)
      .getOrElse(eqf.count())
    val mod = math.max(1L, storeRows / PqResSampleTarget).toInt
    val (rn, rsum) = graft.operators.Similarity.pqResidualStats(models,
      eqf.filter(graft.operators.Similarity.pqResSampleFilter(mod)))
    graft.IndexStore.writeMeta(s, assignPath, meta ++ Map(
      PqResModKey -> mod.toString,
      PqFitResNKey -> rn.toString, PqFitResSumKey -> rsum.toString,
      PqIncResNKey -> "0", PqIncResSumKey -> "0",
      PqLastRefitTriggerKey -> "residual",
      // re-baseline WITHOUT a row rewrite: bumping the epoch moves every
      // stored row (epoch ≤ old) out of the Inc attribution in one
      // sidecar write — exactly mirroring the zeroed increments above
      PqFitEpochKey -> (meta.get(PqFitEpochKey).flatMap(_.toIntOption)
        .getOrElse(1) + 1).toString))
  }

  /** Right-to-be-forgotten across the EMBEDDING tier — the deletion leg
    * [[graft.IndexStore.purgeKeys]] started for the text/BM25 stores,
    * extended to every vector-derived artifact (round-14 gap #5: a purged
    * document must stop being SERVABLE AS A NEIGHBOR, not just stop being
    * retrievable as text). `ids` is the takedown request's identity set —
    * the shared id domain ties documents to their vectors (`vec_id`) and
    * media (`media_id`), so one request purges every tier it touches.
    *
    * Per committed store (absent tiers skip — nothing was built there):
    *
    *  - **IVF assignment store**: the purged rows' contribution to the
    *    maintenance ledgers is decremented IN THE SAME staged sidecar
    *    write as the row rewrite (purgeKeys' crash-clean swap — a crash
    *    can never publish purged rows with un-decremented ledgers):
    *    appended-mass sums (IncN/IncSum), the per-cell occupancy ledger
    *    (clamped at zero per cell), and the PQ residual increments
    *    (re-scored under the CURRENT codebooks over the purged sampled
    *    rows). Decrements clamp at zero — purged FIT-corpus rows have no
    *    increment to remove, and the fit baseline deliberately stays: it
    *    describes the model's training set, which deletion does not
    *    rewrite; triggers only get more conservative after a purge.
    *  - **SRP bucket store**: all 16 tables' bucket rows for the purged
    *    vec_ids; corpus count decremented by the DISTINCT purged vectors
    *    present, so the next tracked load/append agrees with the
    *    surviving corpus instead of rebuilding; session bucket frame
    *    invalidated.
    *  - **media-fp store**: the purged media_ids' fingerprints; session
    *    fingerprint frame invalidated so q136-store-aware refills.
    *
    * Returns removed STORE-ROW counts per store name. Idempotent: a
    * replayed purge removes 0 rows and decrements nothing (the clamps
    * and the already-rewritten rows make the second pass a no-op), so an
    * at-least-once deletion pipeline is safe. Scale: each leg is one
    * store scan + a request-sized broadcast `isin` — purge requests are
    * human-scale, never corpus-scale.
    */
  def purgeEmbeddingTier(s: SparkSession, corpusDir: String,
      ids: Seq[Long]): Map[String, Long] = {
    require(ids.nonEmpty, "purgeEmbeddingTier: empty id list")
    import org.apache.spark.sql.functions._
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("purgeEmbeddingTier requires a configured " +
        s"index store (${graft.IndexStore.DirConf})"))
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Long]

    def purgeIvfFamily(family: String, famIds: Seq[Long]): Unit = {
      val storeName = IvfAssignStoreName + family
      val assignPath = graft.IndexStore.storePath(root, corpusDir, storeName)
      if (!graft.IndexStore.committed(s, assignPath)) return
      val meta = graft.IndexStore.readMeta(s, assignPath).getOrElse(Map.empty)
      val purgedAll = s.read.parquet(assignPath).filter(col("vec_id").isin(famIds: _*))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      try {
        // EXACT attribution (round-15 advice): only rows whose epoch tag
        // matches the sidecar's current fit epoch are still counted in an
        // Inc ledger — purged FIT-corpus rows (epoch 0, or pre-refit
        // epochs) decrement nothing, so repeated purges of fit rows can
        // no longer understate appended mass and defer the refit
        // triggers. Stores written before the epoch columns fall back to
        // the old conservative all-present decrement.
        val ivfEpoch = meta.get(IvfFitEpochKey).flatMap(_.toIntOption).getOrElse(1)
        val pqEpoch = meta.get(PqFitEpochKey).flatMap(_.toIntOption).getOrElse(1)
        val hasEpochs = purgedAll.columns.contains("ivf_epoch")
        val purged =
          if (hasEpochs) purgedAll.filter(col("ivf_epoch") === ivfEpoch)
          else purgedAll
        val pnAll = purgedAll.count()
        val (pn, psum) = assignStats(purged)
        val decMeta: Map[String, String] =
          if (pnAll == 0) Map.empty
          else {
            val incN = meta.get(IvfIncNKey).flatMap(_.toLongOption).getOrElse(0L)
            val incSum = meta.get(IvfIncIdotSumKey).map(BigInt(_)).getOrElse(BigInt(0))
            val purgedCells = purged.groupBy(col("cid")).agg(count(lit(1)).as("n"))
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            val newCells = parseCellCounts(meta.getOrElse(IvfIncCellCountsKey, ""))
              .flatMap { case (c, n) =>
                val d = n - purgedCells.getOrElse(c, 0L)
                if (d > 0) Some(c -> d) else None
              }
            val pqDec: Map[String, String] =
              meta.get(PqResModKey).flatMap(_.toIntOption) match {
                case Some(mod) => storedPqModels(s, corpusDir, family) match {
                  case Some(models) =>
                    val pqPurged =
                      if (hasEpochs) purgedAll.filter(col("pq_epoch") === pqEpoch)
                      else purgedAll
                    val (rn, rsum) = graft.operators.Similarity.pqResidualStats(models,
                      pqPurged.select(col("vec_id"), col("eq"))
                        .filter(graft.operators.Similarity.pqResSampleFilter(mod)))
                    val pin = meta.get(PqIncResNKey).flatMap(_.toLongOption).getOrElse(0L)
                    val pis = meta.get(PqIncResSumKey).map(BigInt(_)).getOrElse(BigInt(0))
                    Map(PqIncResNKey -> math.max(0L, pin - rn).toString,
                      PqIncResSumKey -> (pis - rsum).max(BigInt(0)).toString)
                  case None => Map.empty
                }
                case None => Map.empty
              }
            Map(IvfIncNKey -> math.max(0L, incN - pn).toString,
              IvfIncIdotSumKey -> (incSum - psum).max(BigInt(0)).toString,
              IvfIncCellCountsKey -> encodeCellCounts(newCells)) ++ pqDec
          }
        results += storeName -> graft.IndexStore.purgeKeys(s, corpusDir,
          storeName, "vec_id", famIds, countDecrement = pnAll, extraMeta = decMeta)
      } finally purgedAll.unpersist()
    }
    purgeIvfFamily("", ids)
    // the image-side family lives in the OFFSET id domain: the same
    // takedown purges the documents' paired image vectors there
    purgeIvfFamily("_xm", ids.map(_ + graft.operators.Similarity.XmOffset))

    val srpName = graft.operators.Similarity.SrpStoreName
    val srpPath = graft.IndexStore.storePath(root, corpusDir, srpName)
    if (graft.IndexStore.committed(s, srpPath)) {
      val present = s.read.parquet(srpPath).filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id")).distinct().count()
      results += srpName -> graft.IndexStore.purgeKeys(s, corpusDir, srpName,
        "vec_id", ids, countDecrement = present)
      graft.operators.Similarity.invalidateSrpIndex(s, corpusDir)
    }

    val mfpName = graft.operators.MultimodalOps.MediaFpStoreName
    val mfpPath = graft.IndexStore.storePath(root, corpusDir, mfpName)
    if (graft.IndexStore.committed(s, mfpPath)) {
      val present = s.read.parquet(mfpPath).filter(col("media_id").isin(ids: _*))
        .select(col("media_id")).distinct().count()
      results += mfpName -> graft.IndexStore.purgeKeys(s, corpusDir, mfpName,
        "media_id", ids, countDecrement = present)
      graft.operators.MultimodalOps.invalidateImageFpCache(s, corpusDir)
    }

    if (results.isEmpty)
      IndexMaintenance.log.warn(s"purgeEmbeddingTier: no committed " +
        s"embedding-tier store for $corpusDir under $root — nothing purged")
    results.toMap
  }

  // ------------------------------------------------ unified takedown ----

  /** Doc-keyed tombstone registry [[purgeAll]] maintains: an id recorded
    * here already had its model-tier contribution removed (or its store
    * tripped stale), so a later request containing it decrements nothing
    * twice — the additive stores (LM bigrams, DSIR profiles) have no
    * per-doc rows whose absence could make a replay a natural no-op the
    * way the doc-keyed tiers do.
    */
  private[graft] val PurgeTombstoneStoreName = "purge_tombstones"

  /** Sidecar marker set on an additive model store when a purge could
    * NOT decrement it exactly (a purged id was provably ingested — rows
    * in the doc-keyed tf store — but its content was available neither
    * in the corpus frame nor in the caller's `docsOpt`). Serving refuses
    * until a re-bootstrap rebuilds the counts from the surviving corpus.
    */
  private[graft] val ModelStaleKey = "modelStaleFromPurge"

  /** Per-store crash-replay guard for [[purgeAll]]'s non-row legs: each
    * leg stamps the request digest in the same sidecar write as its
    * decrement, so a purge replayed after a mid-sequence crash skips the
    * legs that already landed and completes the rest exactly once.
    */
  private[graft] val LastPurgeReqKey = "lastPurgeReq"

  /** Refuse to serve an additive model store whose counts a purge left
    * inexact ([[ModelStaleKey]]). The trip is one-way by design: only a
    * re-bootstrap over the surviving corpus restores exactness.
    */
  private def requireNotPurgeStale(s: SparkSession, corpusDir: String,
      name: String, rebootstrap: String): Unit =
    if (graft.IndexStore.storedMeta(s, corpusDir, name)
        .exists(_.contains(ModelStaleKey)))
      throw new IllegalStateException(
        s"$name for $corpusDir is stale from a document purge whose ids' " +
          "content was unavailable — the additive counts still carry the " +
          s"purged docs' mass. Re-bootstrap over the surviving corpus " +
          s"($rebootstrap) before serving")

  /** Drop the purge-staleness trip after a re-bootstrap rebuilt `name`'s
    * counts from the corpus it was just handed.
    */
  private def clearPurgeStale(s: SparkSession, corpusDir: String,
      name: String): Unit =
    for (root <- graft.IndexStore.configuredDir(s)) {
      val p = graft.IndexStore.storePath(root, corpusDir, name)
      graft.IndexStore.readMeta(s, p).filter(_.contains(ModelStaleKey))
        .foreach(meta => graft.IndexStore.writeMeta(s, p, meta - ModelStaleKey))
    }

  private def purgeReqDigest(corpusDir: String, ids: Seq[Long]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(corpusDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ids.sorted.foreach(id => md.update(java.nio.ByteBuffer.allocate(8).putLong(id).array()))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Right-to-be-forgotten across EVERY maintained tier — ONE entry point
    * composing the doc-keyed text stores (tf/BM25, shingle sets, anchor
    * index, chunk fingerprints), the embedding tier
    * ([[purgeEmbeddingTier]]: IVF both families, SRP, media
    * fingerprints), and — the round-15 gap — the ADDITIVE model tier (LM
    * bigram counts, DSIR bucket profiles), whose per-doc contributions
    * have no rows to delete.
    *
    * Model-tier semantics: both models are sums of per-doc counts, so
    * the decrement is EXACT whenever the purged docs' content is known —
    * the purged contributions are recomputed (`bigramBags` /
    * `dsirProfileRows` over exactly those docs) and appended NEGATED;
    * serving sums, so the surviving totals equal a fresh build over the
    * surviving corpus. The corpus count decrements and the XOR content
    * digest un-advances (`h ^ d` removes what `h ^ d` added) in the same
    * sidecar write, so [[lmModelFromStore]]'s cross-store snapshot check
    * keeps holding post-purge instead of forcing a re-bootstrap. Content
    * comes from `docsOpt` (pass the takedown request's own documents —
    * required for ids ingested by streaming that are not in the corpus
    * parquet) or the corpus `documents` table. If a requested id was
    * provably ingested (tf-store rows) but its content is in neither,
    * exactness is impossible: the model stores trip [[ModelStaleKey]]
    * and serving refuses until re-bootstrap — never a silently divergent
    * model.
    *
    * Idempotency: completed requests are fully absorbed by the tombstone
    * registry (replay purges nothing and decrements nothing); a replay
    * after a mid-sequence crash skips completed legs via
    * [[LastPurgeReqKey]] (stamped in the same staged sidecar write as
    * each leg's effect) and runs only the remainder. Scale: every leg is
    * one store scan + a request-sized broadcast `isin`; the model-tier
    * decrement is O(purged docs' tokens).
    *
    * Returns removed row counts per store (model-tier entries report the
    * count of docs whose contribution was decremented).
    */
  def purgeAll(s: SparkSession, corpusDir: String, ids: Seq[Long],
      docsOpt: Option[DataFrame] = None): Map[String, Long] = {
    require(ids.nonEmpty, "purgeAll: empty id list")
    import org.apache.spark.sql.functions._
    val root = graft.IndexStore.configuredDir(s).getOrElse(throw
      new IllegalStateException("purgeAll requires a configured index " +
        s"store (${graft.IndexStore.DirConf})"))
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val req = purgeReqDigest(corpusDir, ids)
    def path(name: String) = graft.IndexStore.storePath(root, corpusDir, name)

    // ids a previous COMPLETED purge already absorbed (request-bounded)
    val tombstoned: Set[Long] =
      if (!graft.IndexStore.committed(s, path(PurgeTombstoneStoreName))) Set.empty
      else s.read.parquet(path(PurgeTombstoneStoreName))
        .filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val fresh = ids.filterNot(tombstoned)
    if (fresh.isEmpty) return Map.empty

    val decDocs = docsOpt.getOrElse(graft.Tables.load(s, corpusDir, "documents"))
      .filter(col("doc_id").isin(fresh: _*))
      .select(col("doc_id"), col("text"), col("lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val (nDec, digDec) = countAndDigest(decDocs)
      val decIds: Set[Long] =
        decDocs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      // requested, not yet absorbed, content unknown — were any actually
      // ingested? The doc-keyed tf store is the witness (it and the
      // additive models ride the same stream).
      val unknown = fresh.filterNot(decIds)
      val tfCommitted = graft.IndexStore.committed(s, path(TfStoreName))
      val unknownIngested = unknown.nonEmpty && tfCommitted &&
        !s.read.parquet(path(TfStoreName))
          .filter(col("doc_id").isin(unknown: _*)).isEmpty

      // --- additive model tier: exact negated-increment decrement, or
      //     the staleness trip when exactness is impossible ---
      def modelLeg(name: String, negRows: => DataFrame): Unit = {
        if (!graft.IndexStore.committed(s, path(name))) return
        val meta = graft.IndexStore.readMeta(s, path(name)).getOrElse(Map.empty)
        if (meta.get(LastPurgeReqKey).contains(req)) { results += name -> 0L; return }
        if (unknownIngested) {
          graft.IndexStore.writeMeta(s, path(name),
            meta + (ModelStaleKey -> "purge") + (LastPurgeReqKey -> req))
          results += name -> 0L
          return
        }
        if (nDec == 0) { results += name -> 0L; return }
        val decCount = meta.get(graft.IndexStore.CorpusCountKey)
          .flatMap(_.toLongOption)
          .map(c => Map(graft.IndexStore.CorpusCountKey ->
            math.max(0L, c - nDec).toString)).getOrElse(Map.empty)
        val decDigest = meta.get(graft.IndexStore.CorpusHashKey)
          .flatMap(_.toLongOption)
          .map(h => Map(graft.IndexStore.CorpusHashKey -> (h ^ digDec).toString))
          .getOrElse(Map.empty)
        graft.IndexStore.append(s, corpusDir, name, negRows,
          extraMeta = decCount ++ decDigest ++ Map(LastPurgeReqKey -> req))
        results += name -> nDec
      }
      modelLeg(LmStoreName,
        graft.operators.CorpusOps.bigramBags(decDocs)
          .groupBy(col("a"), col("b"))
          .agg((-sum(col("c"))).cast(org.apache.spark.sql.types.LongType).as("c")))
      modelLeg(DsirStoreName, {
        requireDsirGeometry(s, corpusDir)
        graft.operators.CorpusOps.dsirProfileRows(decDocs)
          .select(col("b"), (-col("c_raw")).cast(org.apache.spark.sql.types.LongType).as("c_raw"),
            (-col("c_tgt")).cast(org.apache.spark.sql.types.LongType).as("c_tgt"))
      })
      modelLeg(BpeWordStoreName,
        graft.operators.CorpusOps.tfRows(decDocs)
          .groupBy(col("term"))
          .agg((-sum(col("tf"))).cast(org.apache.spark.sql.types.LongType).as("freq")))

      // --- doc-keyed text tier: staged-rewrite row purges. The document
      //     count decrements by the known purged docs plus the witnessed
      //     unknown ones (distinct present — the best available bound for
      //     ids whose content is gone); the XOR digest un-advances only
      //     when the decrement is exact, else purgeKeys drops it. ---
      def textLeg(name: String, keyCol: String, trackDocs: Boolean): Unit = {
        if (!graft.IndexStore.committed(s, path(name))) return
        val meta = graft.IndexStore.readMeta(s, path(name)).getOrElse(Map.empty)
        if (meta.get(LastPurgeReqKey).contains(req)) { results += name -> 0L; return }
        val decCount =
          if (!trackDocs) -1L
          else {
            val unknownPresent =
              if (unknown.isEmpty) 0L
              else s.read.parquet(path(name))
                .filter(col(keyCol).isin(unknown: _*))
                .select(col(keyCol)).distinct().count()
            nDec + unknownPresent
          }
        val digMeta =
          if (!trackDocs || unknownIngested) Map.empty[String, String]
          else meta.get(graft.IndexStore.CorpusHashKey).flatMap(_.toLongOption)
            .map(h => Map(graft.IndexStore.CorpusHashKey -> (h ^ digDec).toString))
            .getOrElse(Map.empty)
        results += name -> graft.IndexStore.purgeKeys(s, corpusDir, name,
          keyCol, ids, countDecrement = decCount,
          extraMeta = digMeta ++ Map(LastPurgeReqKey -> req))
      }
      textLeg(TfStoreName, "doc_id", trackDocs = true)
      textLeg(graft.operators.TextAnalysis.ShingleStoreName, "doc_id", trackDocs = true)
      graft.operators.TextAnalysis.invalidateShingleIndex(s, corpusDir)
      textLeg(AnchorStoreName, "doc_id", trackDocs = true)
      textLeg(ChunkStoreName, "doc_id", trackDocs = false)

      // --- embedding tier (idempotent by row absence) + media leg ---
      results ++= purgeEmbeddingTier(s, corpusDir, ids)

      // --- absorb the request: tombstones land LAST, so their presence
      //     proves every leg above completed ---
      import s.implicits._
      val tombRows = fresh.toDF("doc_id")
      if (graft.IndexStore.committed(s, path(PurgeTombstoneStoreName)))
        graft.IndexStore.append(s, corpusDir, PurgeTombstoneStoreName, tombRows)
      else
        graft.IndexStore.servedFrom(s, corpusDir, PurgeTombstoneStoreName)(tombRows)
      results.toMap
    } finally decDocs.unpersist()
  }

  /** The maintained inverted file as a queryable frame — the gateway's
    * `ivf_assignments` view ("which cell does vector v live in / how big
    * is cell c"): `(vec_id, cid, idot)` from the durable assignment store
    * when one is configured and bootstrapped, otherwise computed
    * in-session under the shared q53/q68 model (same assignment rule, so
    * the two provenances agree row-for-row on the same corpus). The raw
    * embedding columns stay OUT of the view: the gateway is an
    * interactive surface and cell membership/occupancy is the analyst
    * question; vectors are served by the ANN operators.
    */
  def ivfAssignmentsView(s: SparkSession, corpusDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val stored = graft.IndexStore.configuredDir(s).map(root =>
      graft.IndexStore.storePath(root, corpusDir, IvfAssignStoreName))
      .filter(graft.IndexStore.committed(s, _))
    stored match {
      case Some(path) =>
        s.read.parquet(path).select(col("vec_id"), col("cid"), col("idot"))
      case None =>
        val e = graft.Tables.load(s, corpusDir, "embeddings")
        val eqf = graft.operators.Ivf.quantize(e)
        val model = graft.operators.Similarity.ivfModel(s, corpusDir, eqf)
        graft.operators.Ivf.ranked(eqf,
            graft.operators.Ivf.centsDF(s, model.cents))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("cid"), col("idot"))
    }
  }

  /** The substring-dedup anchor stream as a queryable frame — the
    * gateway's `anchor_index` view ("which positional K-grams does doc d
    * contribute / how duplicated is gram s"): `(doc_id, i, s)` from the
    * durable anchor store when one is configured and bootstrapped,
    * otherwise computed in-session from the corpus (the same
    * [[graft.operators.Fuzzy.anchorRows]] the maintainer appends with, so
    * the two provenances agree row-for-row on the same corpus).
    */
  def anchorIndexView(s: SparkSession, corpusDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val stored = graft.IndexStore.configuredDir(s).map(root =>
      graft.IndexStore.storePath(root, corpusDir, AnchorStoreName))
      .filter(graft.IndexStore.committed(s, _))
    stored match {
      case Some(path) =>
        s.read.parquet(path).select(col("doc_id"), col("i"), col("s"))
      case None =>
        graft.operators.Fuzzy.anchorRows(
          graft.Tables.load(s, corpusDir, "documents"))
    }
  }

  private val driftViewSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("family", org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("fit_n", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("inc_n", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("store_rows", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("fit_idot_sum", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("inc_idot_sum", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("tracked_inc_n", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("hot_cell", org.apache.spark.sql.types.IntegerType, nullable = true),
    org.apache.spark.sql.types.StructField("hot_cell_count", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("growth_pending", org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("drift_pending", org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("skew_pending", org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("last_refit_trigger", org.apache.spark.sql.types.StringType, nullable = true)))

  /** The drift ledger as a queryable 1-row frame — the gateway's
    * `ivf_drift` view ("how stale is the ANN index / is a refit
    * pending / why did it last refit"). Decoded through the SAME
    * [[driftSnapshot]] the maintainer's triggers run on, so what the
    * analyst reads IS the policy. Schema-stable empty when no store is
    * configured, the store is un-bootstrapped, or its sidecar predates
    * the drift statistic.
    */
  def ivfDriftView(s: SparkSession, corpusDir: String): DataFrame = {
    // One row per COMMITTED index family (like [[pqDriftView]]): the
    // image-side (_xm) store's growth/drift/skew ledger is maintained by
    // the same triggers and must be just as queryable.
    val rows = for {
      root <- graft.IndexStore.configuredDir(s).toSeq
      family <- IndexFamilies
      path = graft.IndexStore.storePath(root, corpusDir, IvfAssignStoreName + family)
      if graft.IndexStore.committed(s, path)
      meta <- graft.IndexStore.readMeta(s, path).toSeq
      sn <- driftSnapshot(meta).toSeq
    } yield org.apache.spark.sql.Row(family, sn.fitN, sn.incN, sn.rows, sn.k,
      new java.math.BigDecimal(sn.fitSum.bigInteger),
      new java.math.BigDecimal(sn.incSum.bigInteger),
      sn.trackedIncN,
      sn.hotCell.map(c => Int.box(c._1)).orNull,
      sn.hotCell.map(_._2).getOrElse(0L),
      sn.growth, sn.drift, sn.skew,
      sn.lastTrigger.orNull)
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      driftViewSchema)
  }

  private val pqDriftViewSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("family", org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("fit_res_n", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("inc_res_n", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("res_mod", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("fit_res_sum", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("inc_res_sum", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("residual_pending", org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("last_refit_trigger", org.apache.spark.sql.types.StringType, nullable = true)))

  /** The PQ residual ledger as a queryable 1-row frame — the gateway's
    * `pq_drift` view ("how stale are the ADC codebooks / is a refit
    * pending / did one fire"), decoded through the SAME
    * [[pqDriftSnapshot]] the trigger runs on. Schema-stable empty when no
    * store is configured/bootstrapped or the sidecar predates the PQ
    * statistic.
    */
  def pqDriftView(s: SparkSession, corpusDir: String): DataFrame = {
    // One row per COMMITTED index family — the image-side (_xm) codebooks
    // are maintained by the same applyIvfBatch/maybeRefitPq stack, so
    // their residual ledger must be just as visible to operators as the
    // text-side one ("a ledger the trigger can never disagree with" has
    // to hold for every family the trigger runs on).
    val rows = for {
      root <- graft.IndexStore.configuredDir(s).toSeq
      family <- IndexFamilies
      path = graft.IndexStore.storePath(root, corpusDir, IvfAssignStoreName + family)
      if graft.IndexStore.committed(s, path)
      meta <- graft.IndexStore.readMeta(s, path).toSeq
      sn <- pqDriftSnapshot(meta).toSeq
    } yield org.apache.spark.sql.Row(family, sn.fitN, sn.incN, sn.mod,
      new java.math.BigDecimal(sn.fitSum.bigInteger),
      new java.math.BigDecimal(sn.incSum.bigInteger),
      sn.residual, sn.lastTrigger.orNull)
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      pqDriftViewSchema)
  }

  private val bpeDriftViewSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fit_syms", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("fit_chars", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("inc_syms", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("inc_chars", org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0), nullable = false),
    org.apache.spark.sql.types.StructField("drift_pending", org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("last_refit_trigger", org.apache.spark.sql.types.StringType, nullable = true)))

  /** The BPE compression ledger as a queryable 1-row frame — the
    * gateway's `bpe_drift` view ("how stale is the tokenizer / is a
    * refit pending / did one fire"), decoded through the SAME arithmetic
    * [[maybeRefitBpe]] triggers on. Schema-stable empty when no store is
    * configured/bootstrapped.
    */
  def bpeDriftView(s: SparkSession, corpusDir: String): DataFrame = {
    val rows = for {
      root <- graft.IndexStore.configuredDir(s).toSeq
      path = graft.IndexStore.storePath(root, corpusDir, BpeWordStoreName)
      if graft.IndexStore.committed(s, path)
      meta <- graft.IndexStore.readMeta(s, path).toSeq
      fitSy <- meta.get(BpeFitSymsKey).map(BigInt(_)).toSeq
      fitCh <- meta.get(BpeFitCharsKey).map(BigInt(_)).toSeq
    } yield {
      val incSy = meta.get(BpeIncSymsKey).map(BigInt(_)).getOrElse(BigInt(0))
      val incCh = meta.get(BpeIncCharsKey).map(BigInt(_)).getOrElse(BigInt(0))
      val armed = fitCh > 0 && incCh * 100 >= fitCh * BpeDriftMinIncPct
      val pending = armed && fitSy > 0 &&
        incSy * fitCh * 100 > fitSy * incCh * (100 + BpeDriftPct)
      org.apache.spark.sql.Row(
        new java.math.BigDecimal(fitSy.bigInteger),
        new java.math.BigDecimal(fitCh.bigInteger),
        new java.math.BigDecimal(incSy.bigInteger),
        new java.math.BigDecimal(incCh.bigInteger),
        pending, meta.get(BpeLastRefitTriggerKey).orNull)
    }
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      bpeDriftViewSchema)
  }

  /** Attach an IVF assignment maintainer to a `(vec_id, embedding, …)`
    * stream: each micro-batch lands its cell assignments exactly once
    * behind the batch marker, the drift statistic advances in the same
    * sidecar write, and a fired trigger refits centroids + reassigns in
    * place — so [[graft.operators.Similarity.ivfAnnFromStore]] (and the
    * batch q53/q68 paths, which share the durable model entry) serve an
    * index that followed the corpus all day.
    */
  def maintainIvfAssignments(embeddings: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "ivf_maintenance",
      family: String = ""): StreamingQuery = {
    val owner = embeddings.sparkSession
    embeddings.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyIvfBatch(owner, corpusDir, stream, batchId, batch, family)
        ()
      }
      .start()
  }

  /** Bootstrap the durable media-fingerprint store from an existing image
    * frame (possibly empty) — decode + hash once per image, geometry and
    * corpus count recorded in the sidecar. Required before attaching
    * [[maintainMediaFpIndex]].
    */
  private[graft] def bootstrapMediaFpStore(s: SparkSession, corpusDir: String,
      images: Dataset[graft.multimodal.Multimodal.ImageRow]): Unit = {
    require(graft.IndexStore.configuredDir(s).isDefined,
      s"bootstrapMediaFpStore requires a configured index store (${graft.IndexStore.DirConf})")
    graft.operators.MultimodalOps.buildMediaFpIndex(s, corpusDir, images)
    ()
  }

  /** One micro-batch of the streaming media near-dup pipeline
    * ([[maintainMediaFpIndex]]); false = replay, nothing ran.
    *
    * Same two-effect crash argument as [[decontaminateBatch]]: (1) the
    * batch's near-dup pairs against store ∪ batch land idempotently in
    * `pairsDir/batch_id=N` (a replay recomputes against the same store
    * state and overwrites byte-identical content), then (2) the batch's
    * fingerprints append behind the exactly-once batch marker. The
    * DECODE runs once per batch — the checkpointed fingerprint frame
    * feeds both the probe and the append; the stored side is never
    * re-decoded (that is the point of the store).
    */
  private[graft] def mediaFpBatch(s: SparkSession, corpusDir: String,
      pairsDir: String, stream: String, batchId: Long,
      batch: Dataset[graft.multimodal.Multimodal.ImageRow]): Boolean = {
    import org.apache.spark.sql.functions.{col, min}
    val ops = graft.operators.MultimodalOps
    shouldApply(batchId, lastApplied(s, corpusDir, ops.MediaFpStoreName, stream),
      stream, corpusDir) && {
      val root = graft.IndexStore.configuredDir(s).getOrElse(throw
        new IllegalStateException("maintainMediaFpIndex requires a " +
          s"configured index store (${graft.IndexStore.DirConf})"))
      val storePath = graft.IndexStore.storePath(root, corpusDir, ops.MediaFpStoreName)
      require(graft.IndexStore.committed(s, storePath),
        s"bootstrap the media-fp store at $storePath (batch build over the " +
          "existing images) before attaching a media maintainer")
      val batchFps = ops.imageFps(batch).localCheckpoint() // ONE decode per batch
      try {
        val minId = batchFps.agg(min(col("media_id"))).head().get(0) // bounded: 1 row
        if (minId != null) {
          val stored = s.read.parquet(storePath).select("media_id", "fp")
          ops.bandedHammingNewPairs(stored, batchFps,
              ops.ImgBandDefs, ops.ImgHammingMax)
            .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        }
        graft.IndexStore.append(s, corpusDir, ops.MediaFpStoreName, batchFps,
          batchFps.count(), Map(markerKey(stream) -> batchId.toString))
        ops.invalidateImageFpCache(s, corpusDir) // session tier refills from the grown store
      } finally graft.Materialize.free(batchFps)
      true
    }
  }

  /** Streaming media near-dup end-to-end: q136's image near-dup as a
    * continuous pipeline over a `(media_id, payload, width, height)`
    * image stream. Each micro-batch decodes ONCE, emits the near-dup
    * pairs it introduces (vs the fingerprint store ∪ itself — the q74
    * new×corpus probe, media leg) into `pairsDir/batch_id=N`, and appends
    * its fingerprints to the durable store — so the union of all batch
    * outputs over an append-only id stream equals the batch q136 answer
    * on the same images (spec-pinned), and the store always holds one
    * decode-derived fingerprint per ingested image. Exactly-once across
    * crashes via the marker + per-batch-overwrite argument on
    * [[mediaFpBatch]].
    */
  def maintainMediaFpIndex(images: DataFrame, corpusDir: String,
      pairsDir: String, checkpoint: String,
      stream: String = "media_fp_maintenance"): StreamingQuery = {
    val owner = images.sparkSession
    import owner.implicits._
    images.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mediaFpBatch(owner, corpusDir, pairsDir, stream, batchId,
          batch.as[graft.multimodal.Multimodal.ImageRow])
        ()
      }
      .start()
  }

  /** Attach an SRP-index maintainer to a `(vec_id, embedding)` stream. */
  def maintainSrpIndex(embeddings: DataFrame, corpusDir: String,
      checkpoint: String, stream: String = "srp_maintenance"): StreamingQuery = {
    val owner = embeddings.sparkSession
    embeddings.writeStream
      .queryName(stream)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyEmbeddingsBatch(owner, corpusDir, stream, batchId, batch)
        ()
      }
      .start()
  }
}
