package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The fact-table storage layout (SURVEY.md §2.1 S7, §4): the Spark
  * equivalent of the reference's MergeTree declaration
  * `PARTITION BY toYYYYMM(event_date) ORDER BY (event_date, city_name,
  * event_time)` (reference app/clickhouse_ddl.sql:30–32).
  *
  * Month partitioning → Hive-style directory pruning on `event_month`;
  * sorted writes → parquet row-group min/max stats give the sparse-index
  * skip behavior of the ClickHouse primary key. At 100 TB this layout keeps
  * time-range + city queries reading only the touched months, and the
  * in-partition sort clusters each city's readings for row-group skipping.
  */
object Warehouse {

  val PartitionCol = "event_month"
  val SortCols: Seq[String] = Seq("event_date", "city_name", "event_time")

  /** Append fact rows, month-partitioned and sorted within partitions.
    *
    * `repartition(PartitionCol)` co-locates each month before the write so
    * one task owns one month (no small-file explosion: without it every
    * input partition would emit a file into every month directory).
    */
  def writeFact(fact: DataFrame, path: String, mode: String = "append"): Unit =
    fact
      .withColumn(PartitionCol, date_format(col("event_date"), "yyyyMM"))
      .repartition(col(PartitionCol))
      .sortWithinPartitions(SortCols.map(col): _*)
      .write
      .mode(mode)
      .partitionBy(PartitionCol)
      .parquet(path)

  /** Read the fact table back; filters on `event_month` prune directories. */
  def readFact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a month-partitioned warehouse in place: every streamed
    * micro-batch append leaves one file per touched month, so a
    * long-running ingest accumulates small files (the object-store
    * metadata killer at scale). Rewrites each month as one sorted file
    * via dynamic partition overwrite — months absent from the read are
    * untouched, so compaction can run per-month behind an `event_month`
    * filter while ingest appends elsewhere.
    *
    * The eager checkpoint materializes the read BEFORE the overwrite
    * (Spark refuses to overwrite a path its plan still reads). On a real
    * cluster, point `spark.sparkContext.setCheckpointDir` at reliable
    * storage first; `localCheckpoint` is the single-JVM fallback.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val snapshot =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        readFact(spark, path).checkpoint(eager = true)
      else readFact(spark, path).localCheckpoint(eager = true)
    snapshot
      .repartition(col(PartitionCol))
      .sortWithinPartitions(SortCols.map(col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartitionCol)
      .parquet(path)
  }
}
