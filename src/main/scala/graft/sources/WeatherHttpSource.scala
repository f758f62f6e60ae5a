package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset}

/** S1: the HTTP REST source (reference Producer_clickhouse.py:64–76 —
  * per-city GET against the OpenWeatherMap current-weather endpoint,
  * `raise_for_status`, empty-body rejection, per-city log-and-skip).
  *
  * Spark has no built-in HTTP source; the idiomatic shape is a
  * `mapPartitions` fetch over the (dimension-sized) city table: one HTTP
  * client per partition, rows streamed, failures skipped per city exactly
  * like the reference's `continue`. The transport is a pluggable
  * `Fetch` function so the offline environment (and unit tests) inject a
  * fake or replay archived fixture payloads — the production transport
  * [[defaultFetch]] and the plan shape are identical either way.
  *
  * Scale note: the city dimension is tiny (82 rows in the reference), so
  * parallelism here is API-bound, not data-bound. `repartition(n)` before
  * the fetch controls the request fan-out; the downstream flatten/sink
  * pipeline is where cluster width matters.
  */
object WeatherHttpSource {

  /** url → response body; throw to mark the request failed. */
  type Fetch = String => String

  final case class CityCoord(name: String, lat: Double, lon: Double)

  val DefaultBaseUrl = "https://api.openweathermap.org/data/2.5/weather"

  def requestUrl(lat: Double, lon: Double, apiKey: String,
                 baseUrl: String = DefaultBaseUrl): String =
    s"$baseUrl?lat=$lat&lon=$lon&APPID=$apiKey&units=metric"

  /** One client per JVM (= per executor), reused across the per-city fetch
    * loop for connection pooling — never one client per request.
    */
  private lazy val sharedClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** Production transport: blocking GET, 2xx required, empty body rejected
    * (reference raise_for_status + empty-data ValueError).
    */
  def defaultFetch: Fetch = { url =>
    val resp = sharedClient.send(
      HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofSeconds(30)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
    if (resp.body() == null || resp.body().isEmpty)
      throw new RuntimeException(s"empty body for $url")
    resp.body()
  }

  /** Fetch raw payloads for each city: (name, value) rows, one per
    * successful request; failed cities are dropped (log-and-continue,
    * reference Producer_clickhouse.py:128–130). Feed the result to
    * [[graft.weather.WeatherFlatten]] / the Kafka frame builder.
    */
  def fetchCityWeather(cities: Dataset[CityCoord], apiKey: String,
                       baseUrl: String = DefaultBaseUrl,
                       fetch: Fetch = defaultFetch): DataFrame = {
    import cities.sparkSession.implicits._
    cities.mapPartitions { rows =>
      rows.flatMap { c =>
        try Some((c.name, fetch(requestUrl(c.lat, c.lon, apiKey, baseUrl))))
        catch { case _: Exception => None } // per-city skip, never fatal
      }
    }.toDF("name", "value")
  }
}
