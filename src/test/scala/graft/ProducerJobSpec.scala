package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{ProducerJob, WeatherStreamJob}
import org.apache.spark.sql.DataFrame

/** §3.1 producer-cycle composition: one entry point running the reference
  * main loop's stages with an injected transport, asserted end-to-end
  * through the consumer into fact rows, plus the exact S5 archive layout
  * and the loop's backoff schedule.
  */
class ProducerJobSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def writeCityList(cities: (String, String, Double, Double)*): String = {
    val dir = tmp("graft_cities")
    val json = cities.map { case (name, country, lat, lon) =>
      s"""{"id":${name.hashCode.abs},"name":"$name","state":"","country":"$country",""" +
        s""""coord":{"lon":$lon,"lat":$lat}}"""
    }.mkString("[", ",", "]")
    val p = Paths.get(dir, "city_list.json")
    Files.write(p, json.getBytes("UTF-8"))
    p.toString
  }

  // Transport fake: a valid OpenWeatherMap-ish payload echoing the request
  // coords so each city's payload is distinguishable.
  private val fakeFetch: String => String = { url =>
    val lat = "lat=([-0-9.]+)".r.findFirstMatchIn(url).get.group(1)
    s"""{"name":"city$lat","main":{"temp":$lat},"dt":1717200000}"""
  }

  test("producer cycle: route → fetch → keyed kafka frame → archive → consumer fact rows") {
    val cityList = writeCityList(
      ("Kazan", "RU", 55.79, 49.12), ("Moscow", "RU", 55.75, 37.62),
      ("Omsk", "RU", 54.99, 73.37), ("Tver", "RU", 56.86, 35.92),
      ("Paris", "FR", 48.86, 2.35)) // filtered out by the RU filter
    val archive = tmp("graft_producer_archive")
    val cfg = ProducerJob.Config(cityList, apiKey = "test-key", archiveDir = Some(archive))

    var sent = Seq.empty[(String, String, String)]
    val collect: DataFrame => Unit = f =>
      sent = f.collect().map(r => (new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        r.getAs[String]("value"), r.getAs[String]("topic"))).toSeq

    val n = ProducerJob.runCycle(spark, cfg, fakeFetch, collect)
    assert(n == 4)

    // Deterministic routing: sorted by name, i % 3 + 1 (city_loader.py:26–44).
    val topics = sent.map(r => r._1 -> r._3).toMap
    assert(topics == Map(
      "Kazan" -> "weather_topic_1", "Moscow" -> "weather_topic_2",
      "Omsk" -> "weather_topic_3", "Tver" -> "weather_topic_1"))

    // S5 exact layout: one {topic}_{city}_weather.json per city, payload intact.
    val files = new java.io.File(archive).list().sorted.toSeq
    assert(files == Seq(
      "weather_topic_1_Kazan_weather.json", "weather_topic_1_Tver_weather.json",
      "weather_topic_2_Moscow_weather.json", "weather_topic_3_Omsk_weather.json"))
    val kazan = new String(Files.readAllBytes(
      Paths.get(archive, "weather_topic_1_Kazan_weather.json")), "UTF-8")
    assert(kazan.contains(""""temp":55.79"""))

    // Overwrite semantics: a second cycle rewrites the same files.
    ProducerJob.runCycle(spark, cfg, fakeFetch, _ => ())
    assert(new java.io.File(archive).list().sorted.toSeq == files)

    // End-to-end: the produced values flow through the consumer path into
    // typed fact rows (producer → [kafka stand-in] → flatten → warehouse).
    val srcDir = tmp("graft_producer_src")
    Files.write(Paths.get(srcDir, "cycle1.json"),
      sent.map(_._2).mkString("\n").getBytes("UTF-8"))
    val warehouse = tmp("graft_producer_wh")
    val q = WeatherStreamJob.start(
      WeatherStreamJob.fileRawStream(spark, srcDir), warehouse, tmp("graft_producer_ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val facts = spark.read.parquet(warehouse)
    assert(facts.count() == 4)
    assert(facts.select("city_name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("city54.99", "city55.75", "city55.79", "city56.86"))
  }

  test("loop backoff: empty dim → 300 s retry, cycle error → 60 s, success → 300 s") {
    val emptyDim = writeCityList(("Paris", "FR", 48.86, 2.35)) // no RU rows
    val okDim = writeCityList(("Kazan", "RU", 55.79, 49.12))
    var sleeps = Seq.empty[Long]
    val sleeper: Long => Unit = s => sleeps :+= s

    ProducerJob.runLoop(spark, ProducerJob.Config(emptyDim, "k"),
      fakeFetch, _ => (), sleeper, maxCycles = 1)
    ProducerJob.runLoop(spark, ProducerJob.Config(okDim, "k"),
      fakeFetch, _ => throw new RuntimeException("kafka down"), sleeper, maxCycles = 1)
    ProducerJob.runLoop(spark, ProducerJob.Config(okDim, "k"),
      fakeFetch, _ => (), sleeper, maxCycles = 1)

    assert(sleeps == Seq(ProducerJob.EmptyDimBackoffSec,
      ProducerJob.ErrorBackoffSec, ProducerJob.CycleIntervalSec))
  }

  test("loop shutdown: InterruptedException terminates the loop instead of backing off") {
    val okDim = writeCityList(("Kazan", "RU", 55.79, 49.12))
    var cycles = 0
    val send: org.apache.spark.sql.DataFrame => Unit = { _ =>
      cycles += 1
      throw new InterruptedException("supervisor stop")
    }
    val thrown = intercept[InterruptedException] {
      ProducerJob.runLoop(spark, ProducerJob.Config(okDim, "k"),
        fakeFetch, send, _ => (), maxCycles = 10)
    }
    assert(thrown.getMessage == "supervisor stop")
    assert(cycles == 1, "the loop must not retry after an interrupt")
    assert(Thread.interrupted(), "the interrupt flag must be restored") // also clears it for later tests
  }
}
