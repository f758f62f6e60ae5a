package graft.streaming

import graft.weather.{Warehouse, WeatherFlatten}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The consumer path as a Structured Streaming job (SURVEY.md §3.2):
  * Kafka (or file stand-in) → from_json flatten → foreachBatch warehouse
  * append, checkpointed.
  *
  * Delivery semantics (SURVEY.md §2.9 ST1–ST4, ST8):
  *  - The reference commits Kafka offsets only after a successful ClickHouse
  *    insert (Consumer_clickhouse.py:163–165) → at-least-once. Here the
  *    checkpoint WAL records offsets only after foreachBatch returns, which
  *    is the same at-least-once guarantee; replays rewrite the same batch.
  *  - The count-or-time flush (≥90 rows OR ≥300 s) has no native Spark
  *    trigger; `Trigger.ProcessingTime` + `maxOffsetsPerTrigger` bounds
  *    both dimensions (row contents are identical — the hybrid trigger is
  *    operational, not semantic; SURVEY.md §7.4 risk 3).
  *  - Graceful shutdown: `query.stop()` finishes the in-flight batch; the
  *    checkpoint resumes from the last committed offsets.
  *
  * Connector seams: the offline test environment has no brokers, so sources
  * are injected as DataFrames — `fileRawStream` replays the same
  * (value, topic) shape the Kafka source would produce, and the Kafka
  * builders carry the production options (SURVEY.md §7.4 risk 5).
  */
object WeatherStreamJob {

  val DefaultTopics = "weather_topic_1,weather_topic_2,weather_topic_3"

  /** Kafka source with the reference consumer's subscription
    * (Consumer_clickhouse.py:113–125; offsets move to the checkpoint WAL).
    */
  /** The exact option set [[kafkaRawStream]] hands KafkaSourceProvider —
    * exposed as data so the brokerless sandbox can still pin it
    * (KafkaSeamSpec): subscription and cadence from
    * Consumer_clickhouse.py:113–125, offsets in the checkpoint WAL.
    */
  def kafkaSourceOptions(bootstrapServers: String,
                         topics: String = DefaultTopics,
                         maxOffsetsPerTrigger: Long = 90L): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topics,
    "startingOffsets" -> "earliest",
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)

  def kafkaRawStream(spark: SparkSession, bootstrapServers: String,
                     topics: String = DefaultTopics,
                     maxOffsetsPerTrigger: Long = 90L): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topics, maxOffsetsPerTrigger))
      .load()

  /** File-source stand-in: a directory of JSON-lines files, one payload per
    * line, producing the Kafka `value` column shape.
    */
  def fileRawStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).withColumnRenamed("value", "value")

  /** [[startKafkaSink]]'s option set as data (see [[kafkaSourceOptions]]):
    * acks=all from Producer_clickhouse.py:45.
    */
  def kafkaSinkOptions(bootstrapServers: String,
                       checkpointDir: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "kafka.acks" -> "all",
    "checkpointLocation" -> checkpointDir)

  /** Kafka sink for the producer path (acks=all — Producer_clickhouse.py:45). */
  def startKafkaSink(kafkaFrame: DataFrame, bootstrapServers: String,
                     checkpointDir: String): StreamingQuery =
    kafkaFrame.writeStream
      .format("kafka")
      .options(kafkaSinkOptions(bootstrapServers, checkpointDir))
      .start()

  /** Raw-document archive (SURVEY.md §2.1 S5 — the reference writes every
    * raw payload to a JSON file per (topic, city) cycle,
    * Producer_clickhouse.py:78–84). Here: topic-partitioned JSON files per
    * micro-batch; the (value, topic) frame is exactly what the Kafka sink
    * consumes, so the archive tees off the same plan.
    */
  def archiveRaw(batch: DataFrame, path: String): Unit = {
    val out = batch.write.mode("append")
    (if (batch.columns.contains("topic")) out.partitionBy("topic") else out).json(path)
  }

  def startRawArchive(raw: DataFrame, path: String, checkpointDir: String): StreamingQuery =
    raw.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => archiveRaw(batch, path) }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Ingest query: raw value stream → flatten → month-partitioned warehouse
    * append per micro-batch, offsets checkpointed after each batch commits.
    * With `deadLetterPath` set, malformed payloads are quarantined as raw
    * text in the same batch transaction instead of silently dropped (ST7).
    */
  def start(raw: DataFrame, warehousePath: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
            deadLetterPath: Option[String] = None): StreamingQuery =
    WeatherFlatten.parse(raw)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Multiple sinks over one micro-batch: persist so the source is
        // scanned once, not re-read per action.
        val b = if (deadLetterPath.isDefined) batch.persist() else batch
        try {
          Warehouse.writeFact(WeatherFlatten.flatten(b), warehousePath)
          deadLetterPath.foreach { p =>
            WeatherFlatten.malformedRaw(b).write.mode("append").text(p)
          }
        } finally if (deadLetterPath.isDefined) { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Ingest with the EXACT count-or-time flush contract (ST1): micro-
    * batches stage into `stagingDir`; the warehouse sees one batched
    * append per ≥`batchSize`-rows-or-≥`maxAgeMs` window
    * ([[CountOrTimeBatcher]]). Call `batcher.flushNow` after `query.stop()`
    * for the graceful-shutdown flush (ST8). The returned pair is
    * (query, batcher).
    */
  def startCountOrTime(raw: DataFrame, warehousePath: String, checkpointDir: String,
                       stagingDir: String, batchSize: Long = 90L, maxAgeMs: Long = 300000L,
                       trigger: Trigger = Trigger.ProcessingTime("1 second"),
                       clock: () => Long = () => System.currentTimeMillis())
      : (StreamingQuery, CountOrTimeBatcher) = {
    val batcher = new CountOrTimeBatcher(stagingDir, batchSize, maxAgeMs, clock)(
      Warehouse.writeFact(_, warehousePath))
    val q = WeatherFlatten.parse(raw)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batcher.add(WeatherFlatten.flatten(batch))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
    (q, batcher)
  }

  /** ST9: the reference's 60 s stats loop (Consumer_clickhouse.py:167–172)
    * as a StreamingQueryListener — rows/s and batch counts per progress
    * event, queryable from [[IngestStatsListener.snapshot]].
    */
  final class IngestStatsListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val stats =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, (Long, Long)]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      stats.merge(e.progress.id, (1L, e.progress.numInputRows),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    /** (batches, rows) for one query — keyed so a shared session's other
      * streams don't pollute the numbers.
      */
    def snapshot(queryId: java.util.UUID): (Long, Long) =
      stats.getOrDefault(queryId, (0L, 0L))
  }
}
