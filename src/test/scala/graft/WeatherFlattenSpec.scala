package graft

import graft.weather.WeatherFlatten
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The reference consumer's defensive-default semantics
  * (app/clickhouse_db.py:45–57 — FIXTURES.md §B.1 required cases).
  */
class WeatherFlattenSpec extends SparkSpec {

  private val full =
    """{"name":"Moscow","timezone":10800,"visibility":10000,"dt":1717230000,
      |"coord":{"lon":37.62,"lat":55.75},
      |"weather":[{"id":800,"main":"Clear","description":"clear sky","icon":"01d"}],
      |"main":{"temp":21.55,"feels_like":20.97,"temp_min":19.0,"temp_max":23.3,"pressure":1013,"humidity":45},
      |"wind":{"speed":3.5,"deg":220,"gust":7.25},
      |"clouds":{"all":0},
      |"sys":{"country":"RU","sunrise":1717205000,"sunset":1717267000}}""".stripMargin.replaceAll("\n", "")

  private val missingGust =
    """{"name":"Kazan","weather":[{"main":"Rain","description":"rain"}],"main":{"temp":10.0},"wind":{"speed":5.0,"deg":90}}"""
  private val emptyWeather =
    """{"name":"Omsk","weather":[],"main":{"temp":-5.5}}"""
  private val missingSys =
    """{"name":"Perm","weather":[{"main":"Snow","description":"snow"}],"main":{"temp":-10.25}}"""
  private val bareObject = """{}"""
  private val malformed = """{not json"""

  private def flattenAll() = {
    import spark.implicits._
    val raw = Seq(full, missingGust, emptyWeather, missingSys, bareObject, malformed).toDF("value")
    WeatherFlatten(raw, ingestTime = lit("2024-06-01 12:00:00").cast(TimestampType))
      .collect().map(r => r.getString(2) -> r).toMap
  }

  test("malformed JSON is dropped, partial payloads are kept") {
    val rows = flattenAll()
    assert(rows.size == 5) // malformed dropped, bare object kept (name -> '')
    assert(rows.contains(""))
  }

  test("full payload maps all 22 columns with exact types") {
    val r = flattenAll()("Moscow")
    assert(r.getAs[java.sql.Date]("event_date").toString == "2024-06-01")
    assert(r.getAs[java.sql.Timestamp]("event_time").toString == "2024-06-01 15:00:00.0") // Moscow = UTC+3
    assert(r.getAs[Int]("timezone") == 10800)
    assert(r.getAs[String]("country") == "RU")
    assert(r.getAs[Float]("longitude") == 37.62f)
    assert(r.getAs[String]("weather_main") == "Clear")
    assert(r.getAs[java.math.BigDecimal]("temperature").toString == "21.55")
    assert(r.getAs[java.math.BigDecimal]("wind_gust").toString == "7.25")
    assert(r.getAs[Int]("pressure") == 1013)
    assert(r.getAs[java.sql.Timestamp]("sunrise") != null)
  }

  test("missing wind.gust defaults to 0 (DDL DEFAULT 0)") {
    val r = flattenAll()("Kazan")
    assert(r.getAs[java.math.BigDecimal]("wind_gust").doubleValue() == 0.0)
    assert(r.getAs[java.math.BigDecimal]("wind_speed").toString == "5.00")
  }

  test("empty weather array defaults strings to ''") {
    val r = flattenAll()("Omsk")
    assert(r.getAs[String]("weather_main") == "")
    assert(r.getAs[String]("weather_description") == "")
    assert(r.getAs[java.math.BigDecimal]("temperature").toString == "-5.50")
  }

  test("missing sys: country '' and null sunrise/sunset (reference keeps None)") {
    val r = flattenAll()("Perm")
    assert(r.getAs[String]("country") == "")
    assert(r.getAs[java.sql.Timestamp]("sunrise") == null)
    assert(r.getAs[java.sql.Timestamp]("sunset") == null)
  }

  test("bare object: every leaf defaulted, nothing throws") {
    val r = flattenAll()("")
    assert(r.getAs[Int]("timezone") == 0)
    assert(r.getAs[Float]("longitude") == 0f)
    assert(r.getAs[java.math.BigDecimal]("temperature").doubleValue() == 0.0)
    assert(r.getAs[Int]("humidity") == 0)
    assert(r.getAs[java.sql.Timestamp]("sunrise") == null)
  }
}
