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
      // Scope the legacy flag to this schema inference: save and restore
      // the previous value so the session-wide parquet behavior of later,
      // unrelated reads is untouched. (The inferred schema is captured in
      // the returned plan; execution keys off the requested LONG type, not
      // the live conf value.)
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register all fixture tables as temp views (tests / ad-hoc SQL). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
