package graft

import graft.weather.CityRouting
import org.apache.spark.sql.functions._

/** Reference city_loader.py semantics: deterministic sort + round-robin
  * (city_loader.py:26–44) and topic default (Producer_clickhouse.py:86–92).
  */
class CityRoutingSpec extends SparkSpec {

  private def cities = {
    import spark.implicits._
    // Deliberately unsorted input: routing must sort by name first.
    Seq("Omsk", "Kazan", "Perm", "Moscow", "Tver", "Sochi", "Ufa")
      .map(n => (n, "RU")).toDF("name", "country")
  }

  test("round-robin follows sorted order: i % 3 + 1") {
    val routed = CityRouting.distributeToTopics(cities)
      .orderBy("name").collect().map(r => r.getString(0) -> r.getAs[String]("topic"))
    val sortedNames = Seq("Kazan", "Moscow", "Omsk", "Perm", "Sochi", "Tver", "Ufa")
    val expected = sortedNames.zipWithIndex
      .map { case (n, i) => n -> s"weather_topic_${i % 3 + 1}" }
    assert(routed.toSeq == expected)
  }

  test("withTopic falls back to weather_topic_3 for unknown keys") {
    import spark.implicits._
    val routed = CityRouting.distributeToTopics(cities)
    val rows = Seq("Moscow", "Atlantis").toDF("city")
    val out = CityRouting.withTopic(rows, routed, "city")
      .collect().map(r => r.getString(0) -> r.getAs[String]("topic")).toMap
    assert(out("Moscow") == "weather_topic_2")
    assert(out("Atlantis") == "weather_topic_3")
  }

  test("kafka frame has binary key, string value, topic") {
    import spark.implicits._
    val routed = CityRouting.distributeToTopics(cities)
      .withColumn("payload", concat(lit("{\"city\":\""), col("name"), lit("\"}")))
    val k = CityRouting.toKafkaFrame(routed, col("name"), col("payload"))
    assert(k.columns.toSeq == Seq("key", "value", "topic"))
    val moscow = k.filter(col("topic") === "weather_topic_2").collect()
    assert(moscow.exists(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8") == "Moscow"))
  }
}
