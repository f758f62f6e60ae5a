package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ST1 made exact: the reference consumer buffers decoded rows and flushes
  * to the store once ≥ `batchSize` rows have accumulated OR ≥ `maxAgeMs`
  * has passed since the last flush (Consumer_clickhouse.py's batch list +
  * size/время checks). Structured Streaming triggers control micro-batch
  * cadence, not sink batching — so the count-or-time contract belongs at
  * the SINK: each micro-batch appends into a staging area, and when a
  * threshold trips the staging content moves to the real store as ONE
  * batched insert.
  *
  * Delivery semantics are unchanged (at-least-once): staging writes happen
  * inside the checkpointed `foreachBatch`, so a crash before offset commit
  * replays the same rows into staging; a crash between flush and staging
  * cleanup re-flushes the same batch — duplicates, never loss, exactly the
  * reference's commit-after-insert posture. Like the reference's loop, the
  * time condition is evaluated when data arrives (and on [[flushNow]] for
  * graceful shutdown — ST8).
  *
  * The clock is injected so the time path is testable without waiting.
  */
final class CountOrTimeBatcher(
    stagingDir: String,
    batchSize: Long = 90L,
    maxAgeMs: Long = 300000L,
    clock: () => Long = () => System.currentTimeMillis())(
    flush: DataFrame => Unit) {

  // -1 = not yet recovered: after a restart, replayed-but-unflushed rows
  // may still sit in the staging dir, so the counter initializes from the
  // staged content on first use instead of silently starting at 0 (which
  // would under-report and trip the count threshold late).
  private var pending = -1L
  private var lastFlush = clock()

  /** Number of rows staged and not yet flushed (0 until first recovery). */
  def pendingRows: Long = synchronized(math.max(pending, 0L))

  private def stagedFrame(spark: SparkSession): DataFrame =
    // recursiveFileLookup: deltas live in per-batch subdirectories, which
    // must NOT be inferred as a partition column of the flushed frame.
    spark.read.option("recursiveFileLookup", "true").parquet(stagingDir)

  /** True iff staging holds at least one COMMITTED parquet data file. A
    * crash mid-delta-write leaves only junk (`_temporary` trees, empty
    * delta dirs, `_SUCCESS` markers): a bare "directory non-empty" probe
    * would then send recovery into spark.read.parquet, which throws
    * "Unable to infer schema" on a data-free tree — wedging every
    * subsequent add()/flushNow() until staging is cleaned by hand.
    * Committed data = a non-hidden (no `_`/`.` component) non-empty
    * regular file.
    */
  private def committedDataExists(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Boolean =
    fs.listStatus(dir).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") &&
        (if (st.isDirectory) committedDataExists(fs, st.getPath) else st.getLen > 0)
    }

  private def recoverPending(spark: SparkSession): Unit =
    if (pending < 0) {
      val p = new Path(stagingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      pending =
        if (fs.exists(p) && committedDataExists(fs, p)) stagedFrame(spark).count()
        else {
          // nothing committed — prune crash junk so later staged reads
          // (doFlush's recursive lookup) start from a clean tree
          if (fs.exists(p)) fs.delete(p, true)
          0L
        }
    }

  /** foreachBatch hook: stage the micro-batch, then flush if either
    * threshold (count OR age) has tripped.
    *
    * The micro-batch is computed exactly ONCE: it is written to a fresh
    * staging delta, and the row count comes from reading the written
    * parquet back (a footer-metadata count) — never from a second action
    * on the batch itself, which for a Kafka-backed frame would re-read
    * the broker every trigger.
    */
  def add(batch: DataFrame): Unit = synchronized {
    val spark = batch.sparkSession
    recoverPending(spark)
    val delta = s"$stagingDir/delta-${java.util.UUID.randomUUID().toString.take(12)}"
    batch.write.mode("errorifexists").parquet(delta)
    val n = spark.read.parquet(delta).count()
    if (n == 0) {
      // Empty micro-batch (idle source, watermark ticks): drop the empty
      // delta right away — doFlush only cleans staging when pending > 0,
      // so an idle stream would otherwise accumulate empty delta dirs
      // without bound.
      val p = new Path(delta)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    } else pending += n
    if (pending >= batchSize || clock() - lastFlush >= maxAgeMs) doFlush(spark)
  }

  /** Graceful-shutdown flush of whatever is staged (ST8). */
  def flushNow(spark: SparkSession): Unit = synchronized {
    recoverPending(spark)
    doFlush(spark)
  }

  private def doFlush(spark: SparkSession): Unit = {
    if (pending > 0) {
      flush(stagedFrame(spark))
      val p = new Path(stagingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      pending = 0
    }
    lastFlush = clock()
  }
}
