package graft

import graft.weather.WeatherFlatten
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test (SURVEY.md §5.4): flattening is TOTAL over arbitrary
  * partial payloads — any subset of fields may be missing and the plan must
  * neither throw nor produce nulls in non-nullable default columns.
  */
class WeatherFlattenPropSpec extends SparkSpec {

  private val fieldGens: Seq[Gen[Option[String]]] = Seq(
    Gen.option(Gen.alphaNumStr.map(n => s""""name":"$n"""")),
    Gen.option(Gen.chooseNum(-43200L, 50400L).map(v => s""""timezone":$v""")),
    Gen.option(Gen.chooseNum(0L, 20000L).map(v => s""""visibility":$v""")),
    Gen.option(Gen.chooseNum(-180.0, 180.0).map(v => f""""coord":{"lon":$v%.4f}""")),
    Gen.option(Gen.oneOf(
      """"weather":[]""",
      """"weather":[{"main":"Rain","description":"light rain"}]""")),
    Gen.option(Gen.chooseNum(-99.0, 99.0).map(v => f""""main":{"temp":$v%.2f}""")),
    Gen.option(Gen.chooseNum(0.0, 99.0).map(v => f""""wind":{"speed":$v%.2f}""")),
    Gen.option(Gen.oneOf(""""sys":{}""", """"sys":{"country":"RU","sunrise":1717200000}""")))

  private val payloadGen: Gen[String] =
    Gen.sequence[Seq[Option[String]], Option[String]](fieldGens)
      .map(parts => parts.flatten.mkString("{", ",", "}"))

  test("flatten never throws and always fills defaults on arbitrary partial payloads") {
    import spark.implicits._
    val payloads = (0 until 200).flatMap(i =>
      payloadGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val out = WeatherFlatten(payloads.toDF("value"),
      ingestTime = lit("2024-06-01 00:00:00").cast(TimestampType)).collect()

    assert(out.length == payloads.length) // all valid JSON objects survive
    out.foreach { r =>
      assert(r.getAs[String]("city_name") != null)
      assert(r.getAs[java.math.BigDecimal]("temperature") != null)
      assert(r.getAs[java.math.BigDecimal]("wind_gust") != null)
      assert(r.getAs[Int]("humidity") >= 0)
      assert(r.getAs[String]("country") != null)
      assert(r.getAs[String]("country").length <= 2)
    }
  }
}
