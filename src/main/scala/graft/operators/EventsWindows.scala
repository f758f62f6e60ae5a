package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time windowing over the `events` stream table, exercised in batch
  * so the DuckDB oracle can check it (SURVEY.md §2.9 ST5; the same
  * `window`/`session_window` expressions run unchanged under Structured
  * Streaming with a watermark — see graft.streaming.EventStreams).
  *
  *  - q41: tumbling window (epoch-aligned, = DuckDB `time_bucket`);
  *  - q42: session windows (gap-based); the oracle is the classic
  *    gaps-and-islands formulation — a genuine cross-engine differential
  *    test of session semantics (new session iff gap ≥ 30 min; session end
  *    = last event + gap);
  *  - q43: as-of join via [[AsOf]] vs DuckDB's native `ASOF LEFT JOIN`;
  *  - q44: sliding window (2 h window, 1 h slide — each event in exactly 2
  *    windows; oracle expands via an offset cross join).
  *
  * `value` sums fold through DECIMAL(28,10) for cross-engine exactness
  * (same rationale as operators.Relational's money casts).
  */
object EventsWindows {

  private val DV = DecimalType(28, 10)
  private def sumVal(c: Column): Column = sum(c.cast(DV)).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // ----- tumbling event-time window -------------------------------------
    QuerySpec("q41_tumbling_window")(
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumVal(col("value")).as("total"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // ----- session windows (30 min gap) vs gaps-and-islands ---------------
    QuerySpec("q42_session_window")(
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sumVal(col("value")).as("total"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"), col("total"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // ----- as-of join: each purchase ↔ latest click at or before it -------
    QuerySpec("q43_asof_join")(
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, max(value) AS click_val
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts,
        |  r.ts AS last_click_ts, r.click_val AS last_click_val
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val l = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_val"))
      AsOf.lastOnOrBefore(l, r, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("matched.__asof_ts").as("last_click_ts"),
          col("matched.click_val").as("last_click_val"))
        .orderBy(col("event_id"))
    },

    // ----- forward as-of with tolerance: next click within 30 min ---------
    // The mirrored AsOf direction (first right row at/after each left row)
    // plus a match-window tolerance, vs DuckDB's native forward ASOF with
    // the same post-filter. Same single-shuffle union-merge scale story.
    QuerySpec("q60_asof_forward")(
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, max(value) AS click_val
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts,
        |  CASE WHEN r.ts <= l.ts + INTERVAL '30 minutes' THEN r.ts END AS next_click_ts,
        |  CASE WHEN r.ts <= l.ts + INTERVAL '30 minutes' THEN r.click_val END AS next_click_val
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
        |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val l = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_val"))
      val inWindow = col("matched.__asof_ts") <= col("ts") + expr("INTERVAL 30 MINUTES")
      AsOf.firstOnOrAfter(l, r, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(inWindow, col("matched.__asof_ts")).as("next_click_ts"),
          when(inWindow, col("matched.click_val")).as("next_click_val"))
        .orderBy(col("event_id"))
    },

    // ----- sliding window (2 h window, 1 h slide) -------------------------
    QuerySpec("q44_sliding_window")(
      """SELECT time_bucket(INTERVAL '1 hour', ts) - o.off * INTERVAL '1 hour' AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumVal(col("value")).as("total"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("window_start"), col("event_type"))
    }
  )
}
