package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
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

  /** Append a 1-based global ordinal column `out`, ordered by `sortCols`
    * (which must form a total order — supply a unique tiebreaker).
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
