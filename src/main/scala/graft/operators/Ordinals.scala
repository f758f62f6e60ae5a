package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe global ordinal assignment (deterministic row_number over a
  * total order) without a single-partition window.
  *
  * `Window.orderBy(key)` with no partition key funnels the whole relation
  * through ONE task — fine for an 82-row dimension (graft.weather
  * CityRouting keeps that shortcut), fatal for a fact table at cluster
  * scale. The scalable equivalent is the classic two-phase numbering:
  *
  *   1. range-partition by the sort key and sort within partitions, so
  *      partition p holds a contiguous, ordered slice of the total order;
  *   2. count rows per partition, prefix-sum the counts into per-partition
  *      offsets (a #partitions-sized structure, never the data);
  *   3. number rows locally and add the offset.
  *
  * Spark core's `RDD.zipWithIndex` implements exactly steps 2–3 (one count
  * job, then an offset map), with partition indices pinned by the RDD
  * lineage — immune to AQE re-coalescing a re-evaluated exchange, which
  * could silently misalign a DataFrame-only formulation that reads
  * `spark_partition_id()` from two branches of the same plan.
  *
  * Reference semantics mirrored: sorted-by-name round-robin routing of
  * `city_loader.py:26–44` (see q26), generalized to any unique sort key.
  */
object Ordinals {

  /** Tungsten-native two-phase global row_number — no RDD round-trip (the
    * zipWithIndex variant below deserializes every row out of Tungsten and
    * back), and AQE-safe WITHOUT pinning AQE off, because the two phases
    * key offsets by a BUCKET VALUE that is a pure function of row content,
    * never by a partition id that a re-evaluated exchange could reshuffle:
    *
    *   1. boundaries: a deterministic md5-hash sample of the sort key
    *      (sampleMod auto-derives from a row count so the sample stays
    *      ~64k keys at ANY corpus size; pass it explicitly to skip the
    *      count job) is sorted BY SPARK (so string
    *      ordering is UTF8-binary, matching phase-3 comparisons) and
    *      every len/buckets-th key becomes a literal range boundary;
    *   2. counts: group by the bucket expression (Σ of `key >= boundary`
    *      — monotone, equal keys always co-bucket), collect the ≤buckets
    *      counts, prefix-sum into an offset-by-bucket literal map;
    *   3. number: row_number over (partitionBy bucket, orderBy key+ties)
    *      — parallel across buckets, one window task per bucket, the
    *      per-partition slice of the classic two-phase scheme — plus the
    *      broadcast offset.
    *
    * Both actions and the final plan evaluate the bucket expression from
    * the same literal boundaries, so any re-planning (AQE coalescing,
    * retries, speculative tasks) yields identical bucketing. Bucket-size
    * skew follows the sample quality exactly as repartitionByRange's
    * sampler does; duplicate-heavy keys skew both the same way.
    *
    * `sortCol` must be non-null; (`sortCol` + `tieCols`) must form a total
    * order for a deterministic numbering.
    */
  def globalRowNumberNative(df: DataFrame, out: String, sortCol: String,
      tieCols: Seq[String] = Nil, buckets: Int = 64, sampleMod: Int = 0): DataFrame =
    twoPhase(df, out, sortCol, tieCols, buckets, sampleMod,
      perBucket = count(lit(1)),
      local = w => row_number().over(w).cast(LongType))

  /** Two-phase GLOBAL RUNNING SUM of `value` over the (`sortCol`, ties)
    * total order — same content-keyed bucketing as
    * [[globalRowNumberNative]] (a row_number is just the running sum of 1),
    * so no single-partition window at any size. The workhorse behind
    * sequence packing: shard boundaries are pure functions of the running
    * token total. `value` must be non-null and non-negative for the
    * per-bucket offsets to prefix-sum correctly.
    */
  def globalRunningSumNative(df: DataFrame, out: String, sortCol: String,
      value: Column, tieCols: Seq[String] = Nil, buckets: Int = 64,
      sampleMod: Int = 0): DataFrame =
    twoPhase(df.withColumn("__ord_v", value.cast(LongType)), out, sortCol,
      tieCols, buckets, sampleMod,
      perBucket = sum(col("__ord_v")),
      local = w => sum(col("__ord_v"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__ord_v")

  /** The shared two-phase skeleton: sample→boundaries→bucket expression,
    * per-bucket totals (`perBucket`) prefix-summed into offset literals,
    * then the within-bucket window value (`local`) plus the offset.
    */
  /** Driver-side sample target: the collect in phase 1 is bounded to
    * ~this many keys regardless of input size (sampleMod auto-derives
    * from a count when the caller does not fix it — one extra
    * bounded-output job, the price of never collecting a corpus
    * fraction).
    */
  private val TargetSampleKeys = 65536L

  private def twoPhase(df: DataFrame, out: String, sortCol: String,
      tieCols: Seq[String], buckets: Int, sampleMod: Int,
      perBucket: Column, local: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    import graft.functions.TextFunctions.hex60
    val keyStr = col(sortCol).cast(StringType)
    val mod =
      if (sampleMod > 0) sampleMod.toLong
      else math.max(1L, df.count() / TargetSampleKeys)
    val samp = df
      .filter(hex60(concat(lit("ord|"), keyStr)) % mod === 0)
      .select(col(sortCol)).orderBy(col(sortCol))
      .collect().map(_.get(0))
    val step = math.max(1, samp.length / buckets)
    val cuts = samp.indices.collect { case i if i > 0 && i % step == 0 => samp(i) }
      .distinct.toSeq
    // A ≤1-key sample yields no cuts, which would make `bucket` a FOLDABLE
    // constant — Catalyst then eliminates the partition key and plans the
    // one thing this operator exists to avoid, a global window. Keep the
    // partitioning real on degenerate inputs by cutting at the mid sample
    // (two honest buckets; offsets handle either being empty).
    val boundaries =
      if (cuts.nonEmpty || samp.isEmpty) cuts else Seq(samp(samp.length / 2))
    val bucket = boundaries
      .map(b => when(col(sortCol) >= lit(b), 1).otherwise(0))
      .reduceOption[Column](_ + _).getOrElse(lit(0))
    val withB = df.withColumn("__ord_bucket", bucket)
    val totals = withB.groupBy(col("__ord_bucket")).agg(perBucket.cast(LongType).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = totals
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, off), (b, _)) => b -> off }.toMap
    val w = Window.partitionBy(col("__ord_bucket"))
      .orderBy(col(sortCol) +: tieCols.map(col): _*)
    withB
      .withColumn(out,
        local(w) + coalesce(try_element_at(typedLit(offsets), col("__ord_bucket")), lit(0L)))
      .drop("__ord_bucket")
  }

  /** RDD fallback: append a 1-based global ordinal column `out`, ordered
    * by `sortCols` (which must form a total order — supply a unique
    * tiebreaker). Pays the Tungsten↔JVM serialization round-trip; prefer
    * [[globalRowNumberNative]].
    */
  def globalRowNumber(df: DataFrame, out: String, sortCols: String*): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = StructType(ranged.schema.fields :+ StructField(out, LongType, nullable = false))
    val indexed = ranged.rdd.zipWithIndex().map { case (r, i) =>
      new GenericRowWithSchema((r.toSeq :+ (i + 1L)).toArray, schema): Row
    }
    spark.createDataFrame(indexed, schema)
  }
}
