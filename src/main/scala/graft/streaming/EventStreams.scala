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

  /** Stream–stream event-time interval join — purchase attribution: each
    * purchase joins the SAME user's clicks inside the preceding
    * `windowMinutes` (click_ts ∈ [purchase_ts − window, purchase_ts]),
    * the last Structured-Streaming capability class the engine's §2.9
    * surface had not exercised (stream–static enrichment is
    * [[enrichWithDim]]; THIS is two unbounded sides buffered against
    * each other).
    *
    * Bounded state is the design, not an accident: both sides carry an
    * event-time watermark AND the join condition carries the event-time
    * interval — which is exactly what lets Spark expire buffered rows
    * (a click drops once the watermark passes click_ts + window, a
    * purchase once it passes purchase_ts; StreamingSpec pins the
    * cleanup via state-operator metrics). Without the interval bound
    * the state would grow with the stream, which is why this operator
    * hard-requires it rather than exposing a raw equi-join.
    *
    * `joinType` "inner" emits attributed purchases as soon as both
    * sides arrive; "leftOuter" ALSO emits unattributed purchases with
    * null click columns — but only once the watermark PROVES no
    * matching click can still arrive (the null rows are late by one
    * watermark advance, the documented outer-join semantics).
    *
    * At 100 TB/day scale this plan shuffles both streams by the join
    * key once per micro-batch and keeps per-key state ≈ one window of
    * events — the standard attribution-join posture.
    */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes", windowMinutes: Int = 30,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("value"), col("click_id"), col("click_ts"))
  }

  /** Streaming NEAR-dup banding: minhash band rows (shared math with the
    * oracle-checked q37 — operators.Dedup.bandRows) deduped within the
    * watermark horizon, so the FIRST document to claim each (band, bh)
    * survives. A later document whose bands ALL vanish collided with
    * earlier content on every band — a near-dup suspect to route to the
    * exact verify (q37's candidate-restricted intersection) instead of
    * ingesting. State = one entry per distinct band hash inside the
    * horizon; the watermark bounds it.
    *
    * Input: (doc_id, ts, text). Output: surviving (doc_id, ts, band, bh)
    * rows in append mode.
    */
  def novelBands(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    graft.operators.Dedup.bandRows(docs, Seq("doc_id", "ts"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("band", "bh")

  /** Streaming benchmark decontamination — q63's contamination rule
    * applied AT ARRIVAL TIME, so tainted documents are flagged before
    * they ever land in the corpus: each incoming doc's shingle rows join
    * the static benchmark shingle set (stream–static equi-join on the
    * 60-bit hash; the planner broadcasts the bench side when it fits —
    * no unconditional hint, same posture as the batch size gate), then a
    * watermarked per-(window, doc, bench_doc) count applies the
    * ≥ minShared rule. A doc arrives as ONE row, so all its shingle rows
    * carry the same event time and land in the same window — the count
    * is never split. State is bounded by the watermark horizon.
    */
  def contaminatedAtIngest(docs: DataFrame, benchSh: DataFrame,
      minShared: Int = 5, win: String = "5 minutes",
      horizon: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions._
    val ss = array_distinct(transform(shingles(split(normText(col("text")), " ")), h => hex60(h)))
    docs.select(col("doc_id"), col("ts"), explode(ss).as("s"))
      .withWatermark("ts", horizon)
      .join(benchSh, "s")
      .groupBy(window(col("ts"), win), col("doc_id"), col("bench_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_doc"), col("n_shared"))
  }

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

  /** Streaming per-user event-type counts via `transformWithState` — the
    * Spark-4 stateful-processing API (StatefulProcessor + typed MapState;
    * requires the RocksDB state store provider) carrying q100's sumMap
    * semantics into a stream: state per user is a MAP keyed by event type
    * (bounded by the type dimension, never by event count), and each
    * micro-batch emits the UPDATED (user, type, running count) rows —
    * OutputMode.Update over map entries, where the older
    * mapGroupsWithState API would re-emit a whole per-user row. TTLConfig
    * is surfaced so long-running deployments can bound state by idle time;
    * the default keeps counts forever (exact running totals).
    */
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  class UserTypeCountProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String), TypeCount] {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var counts: ss.MapState[String, Long] = _

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, ttl)

    override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
        timers: ss.TimerValues): Iterator[TypeCount] = {
      // LinkedHashSet: emit each touched type once, in first-touch order
      // (deterministic within the batch), with its post-batch total.
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, cur + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(user, t, counts.getValue(t)))
    }
  }

  /** (user_id, event_type) stream → running per-user type counts. A real
    * TTL requires the ProcessingTime time mode (state expiry is stamped
    * against each batch's processing time); the no-TTL default keeps the
    * timer-free TimeMode.None plan.
    */
  def userTypeCounts(events: Dataset[(Long, String)],
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_._1)
      .transformWithState(new UserTypeCountProcessor(ttl),
        timeMode, OutputMode.Update())
  }

  /** Closed-session emitter via flatMapGroupsWithState (the 0-or-N-rows
    * stateful API): sessions are buffered per user and EMITTED ONLY when
    * closed by a processing-time gap timeout — the push-style complement
    * to `sessionTotals`' windowed aggregation. State per key is one open
    * session (start, last, count); a timeout fires after `gapMs` of
    * silence and flushes the session downstream.
    */
  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  def closedSessions(events: Dataset[UserEvent], gapMs: Long = 30L * 60 * 1000,
                     idleTimeout: Boolean = false): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // Timeout-based flushing is opt-in: with ProcessingTimeTimeout armed the
    // engine keeps planning timeout-check batches, which livelocks
    // processAllAvailable-style test harnesses; production streams that need
    // idle-session flushing set idleTimeout=true.
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // state tuple: (startMs, lastMs, count)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s0, l0, n0) = state.get
            state.remove()
            Iterator(ClosedSession(user, new java.sql.Timestamp(s0),
              new java.sql.Timestamp(l0 + gapMs), n0))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some((s0, l0, n0)) if t - l0 < gapMs =>
                  open = Some((s0, t max l0, n0 + 1))
                case Some((s0, l0, n0)) =>
                  closed += ClosedSession(user, new java.sql.Timestamp(s0),
                    new java.sql.Timestamp(l0 + gapMs), n0)
                  open = Some((t, t, 1L))
                case None =>
                  open = Some((t, t, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              if (idleTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
