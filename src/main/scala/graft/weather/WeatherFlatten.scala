package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The consumer's decode → flatten → type pipeline (SURVEY.md §2.2 T4–T8),
  * re-expressed as one Catalyst projection instead of the reference's
  * row-at-a-time dict walking (reference app/clickhouse_db.py:32–84,
  * app/Consumer_clickhouse.py:154–177).
  *
  * Semantics preserved:
  *  - malformed JSON → null struct → dropped, never fatal (PERMISSIVE mode =
  *    the reference's log-and-skip, Consumer_clickhouse.py:174–177);
  *  - every missing leaf defaults: numerics → 0, strings → '',
  *    sunrise/sunset → null (clickhouse_db.py:45–57);
  *  - `weather[0]` head-of-array extraction (clickhouse_db.py:45);
  *  - Decimal(5,2)/(4,2) money-style rounding, UInt→Int casts (§1.3);
  *  - ingestion stamped in Moscow wall-clock (clickhouse_db.py:39–41) —
  *    parameterized so tests and oracle queries stay deterministic.
  *
  * Scale note: this is a pure narrow projection — no shuffle, fully
  * whole-stage-codegen'd, so it runs at source parallelism on any cluster.
  */
object WeatherFlatten {

  val MoscowTz = "Europe/Moscow"

  /** Parse a raw JSON string column into the typed payload struct.
    *
    * PERMISSIVE mode does NOT null the struct on malformed input — it
    * yields a struct of all-null fields, indistinguishable from a valid
    * empty object. The corrupt-record column disambiguates: malformed rows
    * carry the raw text there, valid rows leave it null.
    */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val schemaWithCorrupt = WeatherSchema.payload.add("_corrupt_record", StringType)
    raw.withColumn("w", from_json(col(valueCol).cast(StringType), schemaWithCorrupt))
  }

  /** Drop rows whose JSON failed to parse (reference logs and skips them —
    * Consumer_clickhouse.py:174–177).
    */
  def dropMalformed(parsed: DataFrame): DataFrame =
    parsed.filter(col("w").isNotNull && col("w")("_corrupt_record").isNull)

  /** The malformed complement: raw text of rows that failed to parse —
    * route to a dead-letter sink instead of silently dropping (SURVEY.md
    * §2.9 ST7's quarantine option).
    */
  def malformedRaw(parsed: DataFrame, valueCol: String = "value"): DataFrame =
    parsed.filter(col("w").isNull || col("w")("_corrupt_record").isNotNull)
      .select(col(valueCol).cast(StringType).as("raw"))

  private def str(c: Column): Column = coalesce(c, lit(""))
  private def int0(c: Column): Column = coalesce(c.cast(IntegerType), lit(0))
  private def d52(c: Column): Column = coalesce(c, lit(0)).cast(DecimalType(5, 2))
  private def d42(c: Column): Column = coalesce(c, lit(0)).cast(DecimalType(4, 2))
  private def f0(c: Column): Column = coalesce(c.cast(FloatType), lit(0f))

  /** Flatten the parsed payload into the 22-column fact row.
    *
    * @param ingestTime UTC instant to stamp as ingestion time; converted to
    *        Moscow wall-clock like the reference. Pass
    *        `current_timestamp()` in production; a literal in tests/oracle.
    */
  def flatten(parsed: DataFrame, ingestTime: Column = current_timestamp()): DataFrame = {
    val w = col("w")
    // Head of the weather array. Guarded with size() because Spark 4 runs
    // ANSI mode by default, where element_at on an empty array throws —
    // the reference's `weather.get(..., [{}])[0]` semantics require a null
    // (→ defaulted) result instead. CaseWhen only evaluates the taken
    // branch, so this is safe and stays in codegen.
    val wx = when(size(w("weather")) >= 1, element_at(w("weather"), 1))
      .otherwise(lit(null))
    val moscowNow = from_utc_timestamp(ingestTime, MoscowTz)
    dropMalformed(parsed).select(
      to_date(moscowNow).as("event_date"),
      moscowNow.as("event_time"),
      str(w("name")).as("city_name"),
      int0(w("timezone")).as("timezone"),
      substring(str(w("sys")("country")), 1, 2).as("country"),
      f0(w("coord")("lon")).as("longitude"),
      f0(w("coord")("lat")).as("latitude"),
      str(wx("main")).as("weather_main"),
      str(wx("description")).as("weather_description"),
      d52(w("main")("temp")).as("temperature"),
      d52(w("main")("feels_like")).as("feels_like"),
      d52(w("main")("temp_min")).as("temp_min"),
      d52(w("main")("temp_max")).as("temp_max"),
      int0(w("main")("pressure")).as("pressure"),
      int0(w("main")("humidity")).as("humidity"),
      int0(w("visibility")).as("visibility"),
      d42(w("wind")("speed")).as("wind_speed"),
      int0(w("wind")("deg")).as("wind_degree"),
      d42(w("wind")("gust")).as("wind_gust"),
      int0(w("clouds")("all")).as("cloudiness"),
      timestamp_seconds(w("sys")("sunrise")).as("sunrise"),
      timestamp_seconds(w("sys")("sunset")).as("sunset"))
  }

  /** Full pipeline: raw JSON strings → typed fact rows. */
  def apply(raw: DataFrame, valueCol: String = "value",
            ingestTime: Column = current_timestamp()): DataFrame =
    flatten(parse(raw, valueCol), ingestTime)
}
