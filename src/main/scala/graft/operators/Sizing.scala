package graft.operators

/** Corpus-derived index sizing — the closed form of the SCALE.md rule the
  * sf0.1→sf1 rehearsal demonstrated empirically (the embedding/ANN family
  * was the one >linear outlier precisely because the rehearsal kept the
  * fixture constants, so buckets/cells grew linearly with the corpus and
  * the Σ|bucket|² pair space grew ~quadratically).
  *
  * The rule, now derived instead of documented-only:
  *  - **SRP planes per table** grow with log₂(corpus/bucket_target): each
  *    added plane halves the expected bucket, so 2^planes ≥ n/target keeps
  *    E[|bucket|] ≤ target and the per-table pair space Σ|bucket|² ≈
  *    n·target — linear in the corpus, not quadratic.
  *  - **IVF cell count** grows linearly (k = ⌈n/cell_target⌉), keeping
  *    every cell — and with it SemDedup's per-task pair expansion — bounded
  *    at any corpus size.
  *
  * The fixture queries (q40/q47/q53/q68) keep their EXPLICIT fixture-scale
  * constants because the DuckDB oracle unrolls the same constants into
  * static SQL; the derived defaults are the library path for real corpora
  * ([[Ivf.fit]] with `k ≤ 0`, [[Similarity.srpRows]] with a derived
  * planes-per-table).
  */
object Sizing {

  /** Target expected SRP bucket size (rows per (table, bucket)). */
  val TargetBucketRows = 1024L

  /** Target IVF cell size (rows per cell). */
  val TargetCellRows = 4096L

  /** Planes clamp: ≥4 keeps fixture-scale recall math intact; ≤28 keeps
    * the bucket id a positive Int (bits 0..27).
    */
  val MinPlanes = 4
  val MaxPlanes = 28

  /** Cells clamp: ≥2 (a 1-cell IVF is a scan); ≤65536 bounds the
    * driver-held centroid table at 64k × 64 longs = 32 MB (the MLlib
    * "centers on the driver" posture). A corpus that wants more cells than
    * the clamp (n > 256M rows at the default target) should shard into
    * independent per-partition IVF fits — cells stay bounded per shard.
    */
  val MinCells = 2
  val MaxCells = 65536

  /** Smallest p with 2^p ≥ n/target (so E[|bucket|] ≤ target), clamped. */
  def derivePlanes(n: Long, target: Long = TargetBucketRows): Int = {
    require(n >= 0 && target > 0, s"bad sizing inputs n=$n target=$target")
    val buckets = (n + target - 1) / math.max(1L, target)
    val p = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(MaxPlanes, math.max(MinPlanes, p))
  }

  /** k = ⌈n/target⌉, clamped — linear growth, bounded cells. */
  def deriveCells(n: Long, target: Long = TargetCellRows): Int = {
    require(n >= 0 && target > 0, s"bad sizing inputs n=$n target=$target")
    val k = (n + target - 1) / math.max(1L, target)
    math.min(MaxCells.toLong, math.max(MinCells.toLong, k)).toInt
  }

  /** Elements (embedding scalars) a query-set broadcast may carry before
    * the query set is chunked: 16M ≈ 128 MB of doubles per executor copy.
    * The 64-dim fixtures never get near it; the limit exists for 1k+-dim
    * production embeddings with large query sets.
    */
  val MaxQueryBroadcastElems: Long = 16L << 20

  /** Highest embedding width the NO-PROBE fast path must stay safe for:
    * while nq ≤ budget/65536, even a 65536-wide query set fits one
    * broadcast, so the common path (small query sets — every fixture
    * query) derives chunks = 1 with zero extra Spark actions. Any wider
    * row makes the unprobed broadcast exceed the budget by dims/65536× —
    * 64k dims is ~16× past every published embedding family, so this is
    * a documented hard assumption, not a live risk; past the bound the
    * real width IS probed (one 1-row collect) and the derivation exact.
    */
  val MaxDimNoProbe = 65536

  /** Number of `q_id % chunks` slices a query-set broadcast needs so each
    * slice carries ≤ `maxElems` embedding scalars. `dims` is by-name and
    * only evaluated past the no-probe bound (callers pass a one-row
    * lookup). Per-query top-k is independent across queries, so id-sliced
    * chunking is exact — each chunk broadcasts against its own corpus
    * scan, and the union of the per-chunk answers IS the full answer; the
    * re-scan per chunk is the correct trade once the query set outgrows
    * one broadcast.
    */
  def broadcastChunks(nq: Long, dims: => Int,
      maxElems: Long = MaxQueryBroadcastElems): Int = {
    require(maxElems > 0, s"bad broadcast budget $maxElems")
    if (nq <= 0 || nq <= maxElems / MaxDimNoProbe) 1
    else {
      val d = math.max(1, dims)
      math.max(1L, (nq * d + maxElems - 1) / maxElems).toInt
    }
  }

  /** The slice a query row falls in when its broadcast is chunked:
    * `pmod(xxhash64(q_id), chunks)`, NOT raw `q_id % chunks` — a
    * structured id set (all-even ids, strided shard ids) lands uniformly
    * mod a hash but can pile into one slice mod a small chunk count,
    * re-concentrating the very broadcast the chunking just split. Any
    * deterministic partition of the query set keeps the result EXACT
    * (per-query answers are independent); the hash only defends the
    * per-slice memory bound.
    */
  def chunkSlice(id: org.apache.spark.sql.Column, chunks: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(id),
      org.apache.spark.sql.functions.lit(chunks.toLong))
}
