package graft.weather

import org.apache.spark.sql.types._

/** Explicit schemas for the weather pipeline (never inferred on a stream —
  * SURVEY.md §1.2).
  *
  * The payload shape is the OpenWeatherMap current-weather message the
  * reference consumes (reference app/clickhouse_db.py:43–82, FIXTURES.md
  * §B.1); every field is nullable because the reference defaults every
  * missing leaf defensively.
  */
object WeatherSchema {

  /** Kafka `value` payload: OpenWeatherMap current-weather JSON. */
  val payload: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("timezone", LongType),
    StructField("visibility", LongType),
    StructField("dt", LongType),
    StructField("coord", StructType(Seq(
      StructField("lon", DoubleType),
      StructField("lat", DoubleType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("main", StringType),
      StructField("description", StringType),
      StructField("icon", StringType))))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType),
      StructField("temp_max", DoubleType),
      StructField("pressure", LongType),
      StructField("humidity", LongType)))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType),
      StructField("deg", LongType),
      StructField("gust", DoubleType)))),
    StructField("clouds", StructType(Seq(
      StructField("all", LongType)))),
    StructField("sys", StructType(Seq(
      StructField("country", StringType),
      StructField("sunrise", LongType),
      StructField("sunset", LongType))))))

  /** City dimension record (reference city_list.json, app/city_loader.py). */
  val city: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("coord", StructType(Seq(
      StructField("lon", DoubleType),
      StructField("lat", DoubleType))))))

  /** Sink contract: the 22-column fact row (reference
    * app/clickhouse_ddl.sql:7–28 mapped per SURVEY.md §1.3).
    */
  val fact: StructType = StructType(Seq(
    StructField("event_date", DateType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("city_name", StringType, nullable = false),
    StructField("timezone", IntegerType, nullable = false),
    StructField("country", StringType, nullable = false),
    StructField("longitude", FloatType, nullable = false),
    StructField("latitude", FloatType, nullable = false),
    StructField("weather_main", StringType, nullable = false),
    StructField("weather_description", StringType, nullable = false),
    StructField("temperature", DecimalType(5, 2), nullable = false),
    StructField("feels_like", DecimalType(5, 2), nullable = false),
    StructField("temp_min", DecimalType(5, 2), nullable = false),
    StructField("temp_max", DecimalType(5, 2), nullable = false),
    StructField("pressure", IntegerType, nullable = false),
    StructField("humidity", IntegerType, nullable = false),
    StructField("visibility", IntegerType, nullable = false),
    StructField("wind_speed", DecimalType(4, 2), nullable = false),
    StructField("wind_degree", IntegerType, nullable = false),
    StructField("wind_gust", DecimalType(4, 2), nullable = false),
    StructField("cloudiness", IntegerType, nullable = false),
    StructField("sunrise", TimestampType),   // nullable: reference keeps None
    StructField("sunset", TimestampType)))   // (app/clickhouse_db.py:52–57)
}
