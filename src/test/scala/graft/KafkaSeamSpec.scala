package graft

import graft.streaming.WeatherStreamJob

/** Plan-level evidence for the Kafka seam (SURVEY §2.1 S3/S4) in a
  * sandbox with no broker and no spark-sql-kafka jar: the option sets the
  * builders hand KafkaSourceProvider are pinned as data, and the source
  * builder is driven to the provider-resolution boundary — proving the
  * failure (when there is one) is the missing provider, never malformed
  * options. If the environment ever gains the kafka-sql jar, the same
  * test upgrades itself: resolution succeeds and the stream's schema is
  * asserted instead. S3/S4 stay honestly `partial` until a real broker
  * can execute them.
  */
class KafkaSeamSpec extends SparkSpec {

  test("source options carry the reference consumer's subscription contract") {
    val o = WeatherStreamJob.kafkaSourceOptions("broker1:9092,broker2:9092")
    assert(o("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(o("subscribe") == WeatherStreamJob.DefaultTopics)
    assert(o("subscribe").split(",").length == 3, "3 topics — docker-compose topology")
    assert(o("startingOffsets") == "earliest")
    assert(o("maxOffsetsPerTrigger") == "90", "batch threshold from WeatherBatchProcessor(batch_size=90)")
  }

  test("sink options carry the reference producer's durability contract") {
    val o = WeatherStreamJob.kafkaSinkOptions("b:9092", "/tmp/ck")
    assert(o("kafka.acks") == "all", "acks=all — Producer_clickhouse.py:45")
    assert(o("kafka.bootstrap.servers") == "b:9092")
    assert(o("checkpointLocation") == "/tmp/ck")
  }

  test("kafkaRawStream reaches provider resolution with well-formed options") {
    try {
      val df = WeatherStreamJob.kafkaRawStream(spark, "localhost:19092")
      // jar present (future environment): the provider accepted every
      // option and produced the Kafka source schema
      assert(df.columns.contains("value") && df.columns.contains("topic"))
    } catch {
      case e: Throwable =>
        // jar absent (this sandbox): the builder must die at DATA SOURCE
        // LOOKUP — i.e. options were assembled and accepted, and the only
        // missing piece is the provider class itself
        val msg = Option(e.getMessage).getOrElse("") + " " + e.getClass.getName
        assert(msg.toLowerCase.contains("kafka"),
          s"expected a kafka-provider lookup failure, got: $msg")
        assert(msg.contains("Failed to find") || msg.contains("DATA_SOURCE_NOT_FOUND") ||
          msg.contains("ClassNotFound"),
          s"failure must be provider lookup, not option validation: $msg")
    }
  }
}
