package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-time streaming transforms over `events`-shaped streams
  * (SURVEY.md §2.9 ST5–ST6 — the extension beyond the reference's purely
  * processing-time pipeline). The same window expressions are
  * oracle-checked in batch by operators.EventsWindows; these builders add
  * the watermark + state-cleanup configuration a long-running stream needs.
  *
  * State sizing at scale: watermarks bound every operator's state to the
  * late-data horizon; dropDuplicatesWithinWatermark keeps only in-horizon
  * keys; mapGroupsWithState state is one row per city (dimension-sized).
  */
object EventStreams {

  private val DV = DecimalType(28, 10)

  /** Tumbling event-time aggregate with late-data tolerance (ST5). */
  def windowedTotals(events: DataFrame, win: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DV)).cast(DoubleType).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Gap-based session aggregate (same semantics oracle-checked in
    * operators.EventsWindows q42).
    */
  def sessionTotals(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DV)).cast(DoubleType).as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("total"))

  /** Streaming exact dedup on event_id, state bounded by the watermark —
    * the streaming face of the dedup north-star ops.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–static enrichment (SURVEY.md §2.5 J5): join each micro-batch
    * against a broadcast dimension — the producer's city→coord/topic lookup
    * shape (reference Producer_clickhouse.py:109–123). The dimension is
    * re-resolved per batch, so a refreshed static table is picked up
    * without restarting the stream; the fact side never shuffles.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Running per-city stats via typed state (ST6/§2.9: the
    * `mapGroupsWithState` custom-state surface). State is one
    * (count, last temperature) pair per city.
    */
  case class CityReading(city_name: String, temperature: Double)
  case class CityStats(city_name: String, n: Long, last_temp: Double)

  def runningCityStats(readings: Dataset[CityReading]): Dataset[CityStats] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.city_name)
      .mapGroupsWithState[(Long, Double), CityStats] {
        (city: String, rows: Iterator[CityReading], state: GroupState[(Long, Double)]) =>
          val buf = rows.toSeq
          val (n0, _) = state.getOption.getOrElse((0L, 0.0))
          val next = (n0 + buf.size, if (buf.nonEmpty) buf.last.temperature else state.get._2)
          state.update(next)
          CityStats(city, next._1, next._2)
      }
  }
}
