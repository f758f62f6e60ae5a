package graft.operators

import graft.{QuerySpec, Tables}
import graft.weather.WeatherFlatten
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked differential test of the weather ingest pipeline
  * (SURVEY.md §2.2 T4–T8: JSON decode → nested extraction with defaults →
  * scalar casts → epoch conversion → Moscow ingestion stamps).
  *
  * OpenWeatherMap-shaped JSON payloads are synthesized deterministically
  * from the `customer` fixture — including the reference's degenerate
  * shapes: missing `wind.gust` (→ 0), empty `weather` array (→ '' strings),
  * missing `sys` (→ '' country, null sunrise/sunset), and malformed JSON
  * rows (→ dropped, never fatal; reference Consumer_clickhouse.py:174–177).
  * Spark runs the real `WeatherFlatten` plan over the JSON; DuckDB computes
  * the expected 22-column fact rows directly from the same base values.
  */
object WeatherOps {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q45_weather_flatten")(
      """WITH base AS (
        |  SELECT c_custkey AS k, c_name, c_mktsegment AS seg, c_custkey % 4 AS m
        |  FROM customer WHERE c_custkey % 53 <> 0)
        |SELECT
        |  CAST(DATE '2024-06-01' AS TIMESTAMP) AS event_date,
        |  TIMESTAMP '2024-06-01 15:00:00' AS event_time,
        |  c_name AS city_name,
        |  CAST(k % 50000 AS INT) AS timezone,
        |  CASE WHEN m = 2 THEN '' ELSE substr(seg, 1, 2) END AS country,
        |  CAST((k % 360) - 180 + 0.25 AS FLOAT) AS longitude,
        |  CAST((k % 180) - 90 + 0.5 AS FLOAT) AS latitude,
        |  CASE WHEN m = 1 THEN '' ELSE seg END AS weather_main,
        |  CASE WHEN m = 1 THEN '' ELSE lower(seg) END AS weather_description,
        |  CAST((k % 120) - 60 + 0.25 AS DOUBLE) AS temperature,
        |  CAST((k % 120) - 60 + 0.25 - 2.5 AS DOUBLE) AS feels_like,
        |  CAST((k % 120) - 60 + 0.25 - 5.25 AS DOUBLE) AS temp_min,
        |  CAST((k % 120) - 60 + 0.25 + 4.5 AS DOUBLE) AS temp_max,
        |  CAST(950 + k % 100 AS INT) AS pressure,
        |  CAST(k % 101 AS INT) AS humidity,
        |  CAST(k % 20000 AS INT) AS visibility,
        |  CAST((k % 30) + 0.75 AS DOUBLE) AS wind_speed,
        |  CAST(k % 360 AS INT) AS wind_degree,
        |  CASE WHEN m = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST((k % 30) + 4.00 AS DOUBLE) END AS wind_gust,
        |  CAST((k * 3) % 101 AS INT) AS cloudiness,
        |  CASE WHEN m = 2 THEN NULL
        |       ELSE make_timestamp((1717200000 + k * 7) * 1000000) END AS sunrise,
        |  CASE WHEN m = 2 THEN NULL
        |       ELSE make_timestamp((1717200000 + k * 7 + 50000) * 1000000) END AS sunset
        |FROM base
        |ORDER BY city_name""".stripMargin) { (s, dir) =>
      val k = col("c_custkey")
      val m = k % 4
      val seg = col("c_mktsegment")
      val tz = k % 50000
      val vis = k % 20000
      val dt = lit(1717200000L) + k * 7
      val lonv = ((k % 360) - 180).cast(DoubleType) + 0.25
      val latv = ((k % 180) - 90).cast(DoubleType) + 0.5
      val tempv = ((k % 120) - 60).cast(DoubleType) + 0.25
      val wspd = (k % 30).cast(DoubleType) + 0.75
      val weatherJson = when(m === 1, lit("[]")).otherwise(
        format_string("""[{"id":800,"main":"%s","description":"%s","icon":"01d"}]""",
          seg, lower(seg)))
      val windJson = when(m === 0,
          format_string("""{"speed":%.2f,"deg":%d}""", wspd, k % 360))
        .otherwise(
          format_string("""{"speed":%.2f,"deg":%d,"gust":%.2f}""",
            wspd, k % 360, wspd + 3.25))
      val sysJson = when(m === 2, lit("")).otherwise(
        format_string(""","sys":{"country":"%s","sunrise":%d,"sunset":%d}""",
          substring(seg, 1, 2), dt, dt + 50000))
      val payload = format_string(
        """{"name":"%s","timezone":%d,"visibility":%d,"dt":%d,""" +
          """"coord":{"lon":%.2f,"lat":%.2f},"weather":%s,""" +
          """"main":{"temp":%.2f,"feels_like":%.2f,"temp_min":%.2f,"temp_max":%.2f,"pressure":%d,"humidity":%d},""" +
          """"wind":%s,"clouds":{"all":%d}%s}""",
        col("c_name"), tz, vis, dt, lonv, latv, weatherJson,
        tempv, tempv - 2.5, tempv - 5.25, tempv + 4.5,
        lit(950) + k % 100, k % 101, windJson, (k * 3) % 101, sysJson)
      val raw = Tables.load(s, dir, "customer")
        .repartition(col("c_custkey")) // single-split fixture scan → spread the JSON round-trip
        .withColumn("value", when(k % 53 === 0, lit("{not json")).otherwise(payload))
      // The typed 22-column fact schema (DECIMAL temps, DATE partition key)
      // is pinned by WeatherFlattenSpec; the *compared* projection casts
      // decimals→DOUBLE and the date→TIMESTAMP so both Arrow schemas hash
      // identically (all values are exact quarters, so the cast is lossless).
      val fact = WeatherFlatten(raw, ingestTime = lit("2024-06-01 12:00:00").cast(TimestampType))
      val hashStable = fact.schema.fields.map { f =>
        f.dataType match {
          case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
          case DateType       => col(f.name).cast(TimestampType).as(f.name)
          case _              => col(f.name)
        }
      }
      fact.select(hashStable.toSeq: _*).orderBy(col("city_name"))
    }
  )
}
