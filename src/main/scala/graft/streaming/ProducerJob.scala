package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.WeatherHttpSource
import graft.sources.WeatherHttpSource.CityCoord
import graft.weather.CityRouting
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3.1: the producer cycle as ONE composed job — the reference's main loop
  * (`app/Producer_clickhouse.py:94–142`): load city dim → RU filter →
  * deterministic round-robin routing → per-city HTTP fetch → keyed Kafka
  * emit + per-(topic, city) raw archive → sleep / backoff.
  *
  * Every stage is the already-tested operator (CityRouting,
  * WeatherHttpSource, toKafkaFrame); this object is the composition plus
  * the loop's control flow. Seams stay injectable: the HTTP transport is a
  * [[WeatherHttpSource.Fetch]], the Kafka emit is a `DataFrame => Unit`
  * (production: [[kafkaSend]]; tests: a collector), and the sleeper is a
  * function so backoff semantics are assertable without wall-clock waits.
  *
  * Scale note: the cycle is dimension-sized (82 cities in the reference) —
  * its parallelism is API-bound. The composition matters for completeness
  * of the ingest half, not for cluster width; the consumer path
  * ([[WeatherStreamJob]]/[[JdbcSink]]) is where data scale lives.
  */
object ProducerJob {

  final case class Config(
      cityListPath: String,
      apiKey: String,
      baseUrl: String = WeatherHttpSource.DefaultBaseUrl,
      archiveDir: Option[String] = None,
      numTopics: Int = CityRouting.NumTopics)

  /** Reference backoff constants (seconds): empty dim → retry in 300 s,
    * cycle failure → 60 s, successful cycle → 300 s to the next poll.
    */
  val EmptyDimBackoffSec = 300L
  val ErrorBackoffSec = 60L
  val CycleIntervalSec = 300L

  /** One cycle's routed city dimension: load → RU filter → topic routing. */
  def routedCities(spark: SparkSession, cfg: Config): DataFrame =
    CityRouting.distributeToTopics(
      CityRouting.russianCities(CityRouting.loadCities(spark, cfg.cityListPath)),
      cfg.numTopics)

  /** One cycle's Kafka-ready frame: fetch every routed city (failures are
    * per-city skips, like the reference's `continue`) and key the payload
    * by city name with its routed topic. Columns: key, value, topic, plus
    * `name` retained for the archive tee.
    */
  def cycleFrame(routed: DataFrame, cfg: Config,
                 fetch: WeatherHttpSource.Fetch): DataFrame = {
    val spark = routed.sparkSession
    import spark.implicits._
    val coords = CityRouting.allCoordinates(routed).as[CityCoord]
    val raw = WeatherHttpSource.fetchCityWeather(coords, cfg.apiKey, cfg.baseUrl, fetch)
    val withTopic = CityRouting.withTopic(raw, routed, "name")
    CityRouting.toKafkaFrame(withTopic, col("name"), col("value"))
      .withColumn("name", decode(col("key"), "UTF-8"))
  }

  /** S5 exact archive naming: one `{topic}_{city}_weather.json` file per
    * (topic, city), overwritten each cycle (`Producer_clickhouse.py:78–84`
    * opens with mode 'w'). foreachPartition writer — `dir` is a shared
    * mount in production, exactly like the reference's
    * `/home/downloads_weather`.
    */
  def archivePerCity(frame: DataFrame, dir: String): Unit =
    frame.select(col("topic"), col("name"), col("value"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        Files.createDirectories(Paths.get(dir))
        rows.foreach { r =>
          Files.write(Paths.get(dir, s"${r.getString(0)}_${r.getString(1)}_weather.json"),
            r.getString(2).getBytes(StandardCharsets.UTF_8))
        }
      }

  /** Production Kafka emit for the (key, value, topic) frame — batch write,
    * acks=all like the reference producer (`Producer_clickhouse.py:45`).
    */
  def kafkaSend(bootstrapServers: String)(frame: DataFrame): Unit =
    frame.select("key", "value", "topic").write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("kafka.acks", "all")
      .save()

  /** One full producer cycle. Returns the number of cities produced, or -1
    * when the dimension came up empty (the caller backs off and retries —
    * `Producer_clickhouse.py:100–104`).
    */
  def runCycle(spark: SparkSession, cfg: Config,
               fetch: WeatherHttpSource.Fetch,
               send: DataFrame => Unit): Long = {
    val routed = routedCities(spark, cfg)
    if (routed.isEmpty) return -1L
    val frame = cycleFrame(routed, cfg, fetch).cache()
    try {
      send(frame)
      cfg.archiveDir.foreach(archivePerCity(frame, _))
      frame.count()
    } finally { frame.unpersist(); () }
  }

  /** The supervised loop: run cycles forever, sleeping per the reference's
    * schedule. `sleep` is injected (seconds) so tests assert the backoff
    * sequence; `maxCycles` bounds the loop for non-supervisord callers.
    */
  def runLoop(spark: SparkSession, cfg: Config,
              fetch: WeatherHttpSource.Fetch,
              send: DataFrame => Unit,
              sleep: Long => Unit,
              maxCycles: Int = Int.MaxValue): Unit = {
    var i = 0
    while (i < maxCycles) {
      val backoff =
        try {
          if (runCycle(spark, cfg, fetch, send) < 0) EmptyDimBackoffSec
          else CycleIntervalSec
        } catch {
          // NonFatal only: an InterruptedException (supervisor shutdown) or
          // a fatal error must terminate the loop, not back off and retry.
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); throw e
          case scala.util.control.NonFatal(_) => ErrorBackoffSec
        }
      sleep(backoff)
      i += 1
    }
  }
}
