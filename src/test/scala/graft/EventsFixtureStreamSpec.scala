package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, DecimalType, DoubleType}

/** End-to-end streaming rehearsal over the DRIVER-REGENERATED events fixture
  * (VERDICT r7 task 7): the fixture's `ts` is now physical timestamp[us] →
  * TIMESTAMP_NTZ, and `withWatermark` + window() need a normalized
  * event-time column, so the NTZ→TIMESTAMP cast must happen at the stream
  * boundary (Tables.eventsStream). This pins (a) the stream-side ts type and
  * (b) that the streamed windowed aggregate equals the oracle-checked batch
  * plan (q41) over the same file.
  */
class EventsFixtureStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eventsStream fails fast on a raw-nanos (LongType ts) fixture") {
    import spark.implicits._
    // Batch load supports the raw-long decode; streaming cannot (the
    // FileStreamSource re-infers parquet footers per micro-batch after the
    // session flag is restored), so the stream boundary must refuse up
    // front instead of dying mid-stream.
    val d = java.nio.file.Files.createTempDirectory("graft_nanos_fixture")
      .toFile.getAbsolutePath
    Seq((1L, 1700000000000000000L, "click", 1L))
      .toDF("event_id", "ts", "event_type", "user_id")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val ex = intercept[UnsupportedOperationException] {
      Tables.eventsStream(spark, d)
    }
    assert(ex.getMessage.contains("unsupported") &&
      ex.getMessage.contains("streaming"), ex.getMessage)
  }

  test("eventsStream yields ts: TimestampType (watermark-capable)") {
    val st = Tables.eventsStream(spark, dir)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType,
      s"stream-side ts is ${st.schema("ts").dataType} — watermarks/window " +
        "arithmetic need the normalized TIMESTAMP contract")
  }

  test("streamed windowedTotals over the fixture equals the batch q41 plan") {
    val streamed = streaming.EventStreams.windowedTotals(
      Tables.eventsStream(spark, dir), win = "1 hour")
    val q = streamed.writeStream
      .format("memory").queryName("fixture_windowed")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("fixture_windowed")
      .orderBy(col("window_start"), col("event_type"))
      .collect()

    val dv = DecimalType(28, 10)
    val want = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dv)).cast(DoubleType).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()

    assert(got.length == want.length,
      s"row counts differ: stream=${got.length} batch=${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"stream/batch row mismatch: $g vs $w")
    }
  }
}
