package graft

import graft.sources.WeatherHttpSource
import graft.sources.WeatherHttpSource.CityCoord
import graft.weather.WeatherFlatten
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** S1 source seam: url construction, per-city skip semantics, and the
  * fetch → flatten integration with an injected transport.
  */
class WeatherHttpSourceSpec extends SparkSpec {

  test("request url matches the reference format") {
    assert(WeatherHttpSource.requestUrl(55.75, 37.62, "KEY") ==
      "https://api.openweathermap.org/data/2.5/weather?lat=55.75&lon=37.62&APPID=KEY&units=metric")
  }

  test("fetch maps cities to raw payload rows; failed cities are skipped") {
    import spark.implicits._
    val cities = Seq(
      CityCoord("Moscow", 55.75, 37.62),
      CityCoord("Broken", 0.0, 0.0),
      CityCoord("Kazan", 55.79, 49.12)).toDS()
    val fake: WeatherHttpSource.Fetch = { url =>
      if (url.contains("lat=0.0")) throw new RuntimeException("boom")
      val lat = url.split("lat=")(1).split("&")(0)
      s"""{"name":"city@$lat","main":{"temp":20.0}}"""
    }
    val out = WeatherHttpSource.fetchCityWeather(cities, "KEY", fetch = fake)
    val rows = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("Moscow", "Kazan")) // Broken skipped
    assert(rows("Moscow").contains("city@55.75"))
  }

  test("fetched payloads flow through the flatten pipeline") {
    import spark.implicits._
    val cities = Seq(CityCoord("Moscow", 55.75, 37.62)).toDS()
    val fake: WeatherHttpSource.Fetch =
      _ => """{"name":"Moscow","main":{"temp":21.5},"sys":{"country":"RU"}}"""
    val fact = WeatherFlatten(
      WeatherHttpSource.fetchCityWeather(cities, "KEY", fetch = fake),
      ingestTime = lit("2024-06-01 00:00:00").cast(TimestampType))
    val r = fact.collect().head
    assert(r.getAs[String]("city_name") == "Moscow")
    assert(r.getAs[java.math.BigDecimal]("temperature").toString == "21.50")
    assert(r.getAs[String]("country") == "RU")
  }
}
