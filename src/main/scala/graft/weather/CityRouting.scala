package graft.weather

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The producer's city-dimension operators (SURVEY.md §2.2 T1–T3,
  * §2.3 P1–P3; reference app/city_loader.py, app/Producer_clickhouse.py:86–92).
  *
  * The round-robin topic assignment is the `row_number`-based deterministic
  * formulation (sort by name, i % n + 1) — semantically identical to the
  * reference's `sorted(...)` + modulo loop (city_loader.py:26–44), never a
  * nondeterministic `repartition(n)`.
  *
  * Scale note: the city list is a dimension (82 rows in the reference).
  * The global `row_number` window is intentional and correct here; fact-side
  * joins against the routed dimension broadcast it.
  */
object CityRouting {

  val DefaultTopic = "weather_topic_3" // Producer_clickhouse.py:92
  val NumTopics = 3

  /** Load a city_list.json-shaped file (top-level JSON array — Spark's
    * multiLine JSON reader explodes it into one row per element).
    */
  def loadCities(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true)
      .schema(WeatherSchema.city).json(path)

  /** T1: the reference's `country == 'RU'` dimension filter. */
  def russianCities(cities: DataFrame): DataFrame =
    cities.filter(col("country") === "RU")

  /** P1+P2: deterministic sort-by-name + round-robin topic assignment. */
  def distributeToTopics(cities: DataFrame, numTopics: Int = NumTopics): DataFrame = {
    val rn = row_number().over(Window.orderBy(col("name")))
    cities.withColumn("topic",
      concat(lit("weather_topic_"), (((rn - 1) % numTopics) + 1).cast("string")))
  }

  /** T2: name → coordinates projection (city_loader.py:53–57). */
  def allCoordinates(cities: DataFrame): DataFrame =
    cities.select(col("name"), col("coord.lat").as("lat"), col("coord.lon").as("lon"))

  /** T3: point lookup of one city's coordinates (city_loader.py:46–51). */
  def cityCoordinates(cities: DataFrame, cityName: String): DataFrame =
    allCoordinates(cities.filter(col("name") === cityName)).limit(1)

  /** P3: enrich arbitrary keyed rows with their topic, defaulting like
    * `get_topic_by_city` (Producer_clickhouse.py:86–92). The routed city
    * dim is broadcast — the fact side never shuffles.
    */
  def withTopic(rows: DataFrame, routedCities: DataFrame, keyCol: String): DataFrame = {
    val dim = routedCities.select(col("name").as("__route_name"), col("topic").as("__route_topic"))
    rows.join(broadcast(dim), col(keyCol) === col("__route_name"), "left")
      .withColumn("topic", coalesce(col("__route_topic"), lit(DefaultTopic)))
      .drop("__route_name", "__route_topic")
  }

  /** S4 shape: Kafka-ready frame — key = UTF-8 city bytes, value = payload
    * JSON, topic column for dynamic routing (Producer_clickhouse.py:144–152).
    */
  def toKafkaFrame(routed: DataFrame, keyCol: Column, valueCol: Column): DataFrame =
    routed.select(
      keyCol.cast("binary").as("key"),
      valueCol.cast("string").as("value"),
      col("topic"))
}
