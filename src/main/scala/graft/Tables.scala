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
        raw.schema("ts").dataType match {
          case LongType =>
            raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
          case TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast(TimestampType))
          case TimestampType => raw
          case other =>
            throw new IllegalStateException(
              s"fixture drift: events.ts read as $other from $dir/$name.parquet" +
                " — expected LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP;" +
                " update Tables.load for the new fixture schema")
        }
      } finally prev match {
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
