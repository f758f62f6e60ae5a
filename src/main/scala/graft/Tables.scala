package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects (PARQUET_TYPE_ILLEGAL). We read it as raw long nanos and floor
    * to microseconds — identical to DuckDB's TIMESTAMP_NS → TIMESTAMP cast,
    * so oracle comparisons stay exact.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register all fixture tables as temp views (tests / ad-hoc SQL). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
