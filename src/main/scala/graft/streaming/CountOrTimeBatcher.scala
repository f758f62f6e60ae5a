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

  private var pending = 0L
  private var lastFlush = clock()

  /** Number of rows staged and not yet flushed. */
  def pendingRows: Long = synchronized(pending)

  /** foreachBatch hook: stage the micro-batch, then flush if either
    * threshold (count OR age) has tripped.
    */
  def add(batch: DataFrame): Unit = synchronized {
    val n = batch.count()
    if (n > 0) {
      batch.write.mode("append").parquet(stagingDir)
      pending += n
    }
    if (pending >= batchSize || clock() - lastFlush >= maxAgeMs) doFlush(batch.sparkSession)
  }

  /** Graceful-shutdown flush of whatever is staged (ST8). */
  def flushNow(spark: SparkSession): Unit = synchronized(doFlush(spark))

  private def doFlush(spark: SparkSession): Unit = {
    if (pending > 0) {
      flush(spark.read.parquet(stagingDir))
      val p = new Path(stagingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      pending = 0
    }
    lastFlush = clock()
  }
}
