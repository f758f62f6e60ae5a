package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Behavioral / product analytics over the `events` table — the ClickHouse
  * signature functions the reference's warehouse ships natively
  * (`windowFunnel`, `retention`; the reference stores its facts in
  * ClickHouse — docker-compose.yaml:20, Consumer_clickhouse.py:75 — so a
  * user of that stack has these one call away). Re-expressed Spark-first:
  *
  *  - q81: ordered funnel depth within a time window. NOT the naive
  *    step-table self-join (view×click×purchase explodes cubically per
  *    heavy user): one `groupBy(user)` shuffle collects each user's step
  *    events, and a linear DP over the time-sorted array — Spark
  *    `aggregate()` higher-order function, no UDF — computes the max
  *    chain depth. State per level = the LATEST chain-start time reaching
  *    it (max start maximizes remaining window slack, so keeping one
  *    start per level loses nothing); a commit frontier (`com` vs `al`)
  *    enforces STRICT timestamp increase so same-instant events never
  *    chain. Per-user cost is O(events·levels); the oracle is the
  *    EXISTS-join formulation — a genuine cross-derivation differential
  *    test of funnel semantics.
  *  - q82: cohort retention. Single `groupBy(user)` pass building
  *    (first-signup day, distinct active-day set) per user, then
  *    membership probes at day +1/+7/+14 — no events×cohort join, and the
  *    per-user day set is bounded by the calendar span, not event count.
  *
  * Scale: both are one user-keyed shuffle plus a tiny second aggregate
  * (levels / cohort days). Per-user state is bounded (step events for
  * q81, distinct days for q82) — the same per-key-fits-in-memory posture
  * ClickHouse's own windowFunnel/retention take.
  */
object Behavioral {

  /** Funnel steps, in order: view → click → purchase. */
  private val Steps = Seq("view" -> 1, "click" -> 2, "purchase" -> 3)
  private val NumSteps = Steps.size

  /** Chain window: last step within 6 h of the chain's first step. */
  private val WindowMicros = 6L * 3600L * 1000000L

  /** q90 session gap: a >30 min silence starts a new session. */
  private val SessionGapMicros = 30L * 60L * 1000000L

  /** Gap-based sessionization as a library operator — q90's body. Input
    * needs (user_id, event_id, t µs); output is one row per (user,
    * session ordinal) with count/bounds/duration. Both windows (the
    * boundary-flag lag and the ordinal running sum) share one
    * (t, event_id)-sorted pass; the tiebreak makes the order TOTAL, so
    * equal-timestamp events get identical session ids on any engine and
    * any partitioning (OperatorPropSpec drives this with dense random
    * ties; with `ORDER BY t` alone two window passes could order a tie
    * differently and split it across sessions).
    */
  private[graft] def sessionize(e: org.apache.spark.sql.DataFrame,
      gapMicros: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val lagT = lag(col("t"), 1).over(w)
    e.select(col("user_id"), col("t"), col("event_id"),
        when(lagT.isNull || col("t") - lagT > gapMicros, 1L)
          .otherwise(0L).as("nf"))
      .select(col("user_id"), col("t"),
        sum(col("nf")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sid"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("t")).as("t_start"),
        max(col("t")).as("t_end"), (max(col("t")) - min(col("t"))).as("dur_us"))
      .orderBy(col("user_id"), col("sid"))
  }

  private val nullL = lit(null).cast(LongType)

  /** Max funnel depth over a time-sorted array of struct(t µs, k step).
    *
    * DP state: `cur` = timestamp of the last processed event; `com[i]` =
    * latest chain-start among chains of depth i whose last event is
    * STRICTLY before `cur` (the committed frontier — extensions may only
    * chain onto these, never onto a same-instant event); `al[i]` = same
    * over all processed events. An event (t, k) first commits (`al`→`com`)
    * if t advanced, then extends: depth 1 starts a chain at t; depth k>1
    * chains onto `com[k-1]` iff t − start ≤ window. Keeping the MAX start
    * per depth is lossless: any reachable depth stays reachable under a
    * later start, and a later start only widens the remaining window.
    */
  private[graft] def funnelLevel(evs: Column): Column = {
    val init = struct(
      lit(Long.MinValue).as("cur"),
      array(Seq.fill(NumSteps)(nullL): _*).as("com"),
      array(Seq.fill(NumSteps)(nullL): _*).as("al"))
    val dp = aggregate(
      evs, init,
      (acc, e) => {
        val t = e.getField("t")
        val k = e.getField("k")
        val com = when(t > acc.getField("cur"), acc.getField("al"))
          .otherwise(acc.getField("com"))
        val al = acc.getField("al")
        val prevStart = element_at(com, k - 1)
        val cand = when(k === 1, t)
          .otherwise(when(t - prevStart <= WindowMicros, prevStart))
        val al2 = transform(sequence(lit(1), lit(NumSteps)),
          i => when(i === k, greatest(element_at(al, i), cand))
            .otherwise(element_at(al, i)))
        struct(t.as("cur"), com.as("com"), al2.as("al"))
      })
    // Fold low→high so the DEEPEST level's check lands outermost in the
    // final CaseWhen (foldLeft wraps; the last-wrapped branch wins).
    (1 to NumSteps).foldLeft(lit(0)) { (acc, lvl) =>
      when(element_at(dp.getField("al"), lvl).isNotNull, lvl).otherwise(acc)
    }
  }

  val specs: Seq[QuerySpec] = Seq(

    // ----- windowed ordered funnel (ClickHouse windowFunnel analog) -------
    QuerySpec("q81_window_funnel")(
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
        |lvl AS (SELECT u.user_id,
        |  CASE
        |    WHEN EXISTS (SELECT 1 FROM v, c, p
        |                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
        |                   AND p.user_id = u.user_id
        |                   AND v.t < c.t AND c.t < p.t AND p.t - v.t <= $WindowMicros) THEN 3
        |    WHEN EXISTS (SELECT 1 FROM v, c
        |                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
        |                   AND v.t < c.t AND c.t - v.t <= $WindowMicros) THEN 2
        |    WHEN EXISTS (SELECT 1 FROM v WHERE v.user_id = u.user_id) THEN 1
        |    ELSE 0 END AS level
        |  FROM u)
        |SELECT level, count(*) AS n_users FROM lvl
        |GROUP BY level ORDER BY level""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val stepOf = Steps.tail.foldLeft(when(col("event_type") === Steps.head._1, Steps.head._2)) {
        case (acc, (name, k)) => acc.when(col("event_type") === name, k)
      }
      val arrs = e.filter(col("event_type").isin(Steps.map(_._1): _*))
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("t"), stepOf.as("k")).as("ev"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("ev"))).as("evs"))
      e.select(col("user_id")).distinct()
        .join(arrs, Seq("user_id"), "left")
        .select(when(col("evs").isNull, 0).otherwise(funnelLevel(col("evs"))).as("level"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    },

    // ----- greedy non-overlapping chain count (sequenceCount analog) ------
    // ClickHouse sequenceCount('(?1).*(?2)'): per user, the number of
    // NON-OVERLAPPING view→purchase chains under strict time order. The
    // greedy automaton (arm on view, count+disarm on purchase) is
    // equivalent to a per-purchase rule — count purchase p iff some view
    // falls strictly between the previous purchase and p — because an
    // armed state persists across uncounted purchases: a view before any
    // purchase makes that purchase counted, so "view since the last
    // purchase" and "view since the last COUNTED purchase" coincide.
    // (Equivalence holds on strictly increasing per-user timestamps;
    // same-instant events are mutually invisible under the strict rule —
    // the per-purchase formulation IS the spec, in both engines.)
    // That rule is two running maxima over ONE per-user range-frame
    // window (frame [-∞, t−1] ⇒ strictness is structural, same-instant
    // events never chain, and the result is deterministic with NO
    // tiebreak column). The oracle derives the same counts from
    // correlated max-subqueries — a cross-derivation differential test.
    // Scale: one user-keyed shuffle; the window is keyed by user_id
    // (never global), per-user state is one running max per type.
    QuerySpec("q84_sequence_count")(
      """WITH vp AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
        |            WHERE event_type IN ('view', 'purchase')),
        |p AS (SELECT user_id, t FROM vp WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, t FROM vp WHERE event_type = 'view'),
        |c AS (SELECT p.user_id, p.t,
        |        (SELECT max(v.t) FROM v WHERE v.user_id = p.user_id AND v.t < p.t) AS mv,
        |        (SELECT max(p2.t) FROM p p2 WHERE p2.user_id = p.user_id AND p2.t < p.t) AS mp
        |      FROM p)
        |SELECT user_id, count(*) AS n_purchases,
        |  count(*) FILTER (WHERE mv IS NOT NULL AND (mp IS NULL OR mv > mp)) AS n_chains
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        .rangeBetween(Window.unboundedPreceding, -1)
      e.select(col("*"),
          max(when(col("event_type") === "view", col("t"))).over(w).as("mv"),
          max(when(col("event_type") === "purchase", col("t"))).over(w).as("mp"))
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(when(col("mv").isNotNull &&
            (col("mp").isNull || col("mv") > col("mp")), 1)).as("n_chains"))
        .orderBy(col("user_id"))
    },

    // ----- cohort retention (ClickHouse retention analog) -----------------
    QuerySpec("q82_retention_cohort")(
      """WITH s AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT s.user_id, s.d0,
        |        max(CASE WHEN a.d = s.d0 + 1 THEN 1 ELSE 0 END) AS r1,
        |        max(CASE WHEN a.d = s.d0 + 7 THEN 1 ELSE 0 END) AS r7,
        |        max(CASE WHEN a.d = s.d0 + 14 THEN 1 ELSE 0 END) AS r14
        |      FROM s JOIN a ON s.user_id = a.user_id GROUP BY s.user_id, s.d0)
        |SELECT d0 AS cohort_day, count(*) AS n_users,
        |  count(*) FILTER (WHERE r1 = 1) AS retained_d1,
        |  count(*) FILTER (WHERE r7 = 1) AS retained_d7,
        |  count(*) FILTER (WHERE r14 = 1) AS retained_d14
        |FROM f GROUP BY d0 ORDER BY cohort_day""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val perUser = e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", to_date(col("ts")))).as("d0"),
          collect_set(to_date(col("ts"))).as("days"))
        .filter(col("d0").isNotNull)
      def retained(off: Int): Column = array_contains(col("days"), date_add(col("d0"), off))
      perUser
        .select(col("d0"), retained(1).as("r1"), retained(7).as("r7"), retained(14).as("r14"))
        .groupBy(col("d0").as("cohort_day"))
        .agg(count(lit(1)).as("n_users"),
          count(when(col("r1"), 1)).as("retained_d1"),
          count(when(col("r7"), 1)).as("retained_d7"),
          count(when(col("r14"), 1)).as("retained_d14"))
        .orderBy(col("cohort_day"))
    },

    // ----- gap-based sessionization ---------------------------------------
    // The batch counterpart of q42's streaming session window: a new
    // session starts when a user's inter-event gap exceeds 30 min; the
    // session ordinal is the running sum of those boundary flags. Both
    // windows (the lag and the running sum) share one (user, t, event_id)
    // sort — the event_id tiebreak makes the order TOTAL, so tie rows get
    // identical session ids in both engines (with `ORDER BY t` alone the
    // two window passes could order a tie differently and split it across
    // sessions). Equal-timestamp events always share a session either way:
    // their gap is 0. Scale: ONE user-keyed shuffle; the running-sum
    // window is per-user (never global), and the per-(user, session)
    // aggregate reuses the user_id partitioning — no second exchange.
    QuerySpec("q90_sessionize")(
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        |f AS (SELECT user_id, t, event_id,
        |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > $SessionGapMicros
        |             THEN 1 ELSE 0 END AS nf
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |g AS (SELECT user_id, t,
        |        CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY t, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |      FROM f)
        |SELECT user_id, sid, count(*) AS n_events, min(t) AS t_start,
        |  max(t) AS t_end, max(t) - min(t) AS dur_us
        |FROM g GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin) { (s, dir) =>
      sessionize(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t")),
        SessionGapMicros)
    },

    // ----- rolling 7-day distinct actives (DAU / trailing-WAU) ------------
    // Exact sliding-window COUNT DISTINCT — the engagement report
    // ClickHouse serves with uniqExact over a window — via the
    // CONTRIBUTION trick: each distinct (user, active-day) pair
    // contributes to the 7 window-days it can be seen from, so the
    // rolling distinct is `explode(0..6) → re-distinct → count`, never a
    // day×7-day range self-join of the fact table and never per-day
    // distinct state. Scale: the fact table collapses to distinct
    // (user, day) in ONE shuffle (bounded by users × calendar, not event
    // count); the ×7 explode and second distinct run on that bounded
    // frame; the final day-keyed join is calendar-sized and broadcast.
    QuerySpec("q92_rolling_active")(
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |c AS (SELECT DISTINCT user_id, day + CAST(o AS INTEGER) AS wday
        |      FROM ud, (SELECT unnest(generate_series(0, 6)) AS o)),
        |wau AS (SELECT wday, count(*) AS wau7 FROM c GROUP BY wday)
        |SELECT d.day, d.dau, w.wau7
        |FROM dau d JOIN wau w ON d.day = w.wday
        |ORDER BY d.day""".stripMargin) { (s, dir) =>
      // localCheckpoint: dau and the window contributions both read the
      // distinct (user, day) frame — materialize it once so the fact scan
      // and the distinct shuffle run once, not per branch.
      val ud = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .transform(graft.Materialize.ephemeral)
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("o"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("o")).as("wday"))
        .distinct()
        .groupBy(col("wday")).agg(count(lit(1)).as("wau7"))
      dau.join(broadcast(wau), dau("day") === wau("wday"))
        .select(col("day"), col("dau"), col("wau7"))
        .orderBy(col("day"))
    },

    // ----- event-type transition matrix (Markov bigram profile) -----------
    // Per-user consecutive event-type bigrams — the session-shape /
    // Markov-chain profile (ClickHouse users reach it with neighbor() or
    // groupArray + arrayZip). One user-keyed window pass ordered by the
    // (t, event_id) TOTAL order (same determinism argument as q90: with
    // ties on t alone the two engines could pick different predecessors),
    // then a types²-bounded hash-agg. The heavy object — the per-user
    // ordered scan — is the same single shuffle as q84/q90; the output is
    // dimension-sized at any corpus size.
    QuerySpec("q93_type_transitions")(
      """WITH o AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS from_type
        |           FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(w).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // ----- cumulative distinct users (running uniq) -----------------------
    // ClickHouse `runningAccumulate(uniqState(user_id))` per day: total
    // distinct users seen up to each day. Exact, WITHOUT per-day distinct
    // state: cumulative-distinct = running sum of FIRST-SEEN counts, so
    // the fact table collapses to one (user → first day) aggregate (the
    // only corpus-sized shuffle), then per-day new-user counts and the
    // running sum ride the q89 calendar spine — all calendar-sized, with
    // the running sum on the two-phase native form (no global window
    // anywhere, tiny as the frame may be: posture is uniform, and the
    // same operator serves an unbounded day domain unchanged).
    QuerySpec("q94_cumulative_uniques")(
      """WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
        |n AS (SELECT d0 AS day, count(*) AS new_users FROM u GROUP BY d0),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM n),
        |cal AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |          CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |j AS (SELECT c.day, coalesce(n.new_users, 0) AS new_users
        |      FROM cal c LEFT JOIN n ON c.day = n.day)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM j ORDER BY day""".stripMargin) { (s, dir) =>
      // localCheckpoint: the spine bounds and the broadcast side both read
      // `n`, whose lineage contains the corpus-sized user-keyed aggregate —
      // materialize the calendar-sized result once so that shuffle (and the
      // fact scan under it) never runs twice.
      val n = Tables.load(s, dir, "events")
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d0"))
        .groupBy(col("d0").as("day")).agg(count(lit(1)).as("new_users"))
        .transform(graft.Materialize.ephemeral)
      val cal = n.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .select(col("mn"),
          explode(sequence(lit(0), datediff(col("mx"), col("mn")))).as("i"))
        .select(date_add(col("mn"), col("i")).as("day"))
      val j = cal.join(broadcast(n), Seq("day"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"),
          datediff(col("day"), to_date(lit("1970-01-01"))).cast(LongType).as("d"))
      Ordinals.globalRunningSumNative(j, "cum_users", "d", col("new_users"))
        .select(col("day"), col("new_users"), col("cum_users"))
        .orderBy(col("day"))
    },

    // ----- daily volume anomaly flags (integer-exact 2σ rule) -------------
    // Per event_type, flag days whose count deviates from that type's mean
    // by more than 2 standard deviations — the ingest-monitoring report a
    // warehouse raises alerts from. The z-score test is algebraically
    // cleared of divisions: |x − S/n| > 2·√((nQ − S²)/n²)  ⟺
    // (n·x − S)² > 4·(nQ − S²), so the whole predicate is integer
    // arithmetic — no float division or sqrt to diverge cross-engine.
    // Spark runs it in DECIMAL(38,0) (exact up to 10³⁸ — room for 10¹²
    // daily events over decades), the oracle in HUGEINT (int128; DuckDB
    // decimals cap multiplication width at 38 combined digits).
    // Scale: the corpus collapses to (type × day) in one hash-agg; the
    // moment sums and the broadcast join back are dimension-sized.
    QuerySpec("q99_daily_anomaly")(
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |             CAST(count(*) AS HUGEINT) AS x
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS q
        |      FROM d GROUP BY event_type)
        |SELECT d.event_type, d.day, CAST(d.x AS BIGINT) AS n_events,
        |  CAST((m.n * d.x - m.s) * (m.n * d.x - m.s) > 4 * (m.n * m.q - m.s * m.s)
        |       AS INTEGER) AS anomaly
        |FROM d JOIN m USING (event_type)
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val dv = DecimalType(38, 0)
      // localCheckpoint: the daily frame feeds both the output rows and the
      // per-type moment sums — materialize the (type × day) result once so
      // the corpus scan and its shuffle never run twice.
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast(dv).as("x"))
        .transform(graft.Materialize.ephemeral)
      val m = d.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(dv).as("n"),
          sum(col("x")).cast(dv).as("s"),
          sum(col("x") * col("x")).cast(dv).as("q"))
      val dev = col("n") * col("x") - col("s")
      d.join(broadcast(m), "event_type")
        .select(col("event_type"), col("day"), col("x").cast(LongType).as("n_events"),
          (dev * dev > lit(4) * (col("n") * col("q") - col("s") * col("s")))
            .cast(IntegerType).as("anomaly"))
        .orderBy(col("event_type"), col("day"))
    },

    // ----- event-mix drift between time halves (χ² homogeneity) ----------
    // Data-drift monitoring: did the event-TYPE distribution shift between
    // the first and second half of the time range? Per type, the two
    // cells' χ² contribution under the 2×K homogeneity table — with the
    // expected count e = r·c/T cleared of divisions:
    //   (o − e)²/e  =  (o·T − r·c)² / (r·c·T)
    // so each cell is ONE integer division in micro-units (the q119/q125
    // discipline — no float subtraction of near-equal means, no
    // cross-engine rounding), and a type's drift flag compares its
    // contribution against the χ²₀.₀₅,₁ critical value 3.841 (micro
    // 3 841 000). The split point is integer epoch arithmetic:
    // mid = min_us + (max_us − min_us) div 2 (span form — truncation and
    // floor division agree on the non-negative span, so Spark `div` and
    // DuckDB `//` match even for pre-1970 epochs).
    // Magnitude bound: (o·T − r·c)²·10⁶ must fit DECIMAL(38,0)/HUGEINT →
    // |o·T − r·c| < 10¹⁶, safe to ~10⁸ events at full imbalance; past
    // that, quantize counts to thousands on both sides first (the q125
    // rescale recipe). Scale: the corpus collapses to (type × half) in
    // one hash-agg; everything after is type-dimension-sized.
    QuerySpec("q132_distribution_drift")(
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |mm AS (SELECT CAST(min(us) AS BIGINT)
        |         + (CAST(max(us) AS BIGINT) - min(us)) // 2 AS mid FROM e),
        |g AS (SELECT event_type,
        |        CAST(sum(CASE WHEN us < mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |        CAST(sum(CASE WHEN us >= mm.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
        |      FROM e, mm GROUP BY event_type),
        |t AS (SELECT CAST(sum(n_first) AS BIGINT) AS c1,
        |        CAST(sum(n_second) AS BIGINT) AS c2 FROM g),
        |x AS (SELECT g.event_type, g.n_first, g.n_second,
        |        CAST(((CAST(g.n_first AS HUGEINT) * (t.c1 + t.c2)
        |                - (g.n_first + g.n_second) * t.c1)
        |              * (CAST(g.n_first AS HUGEINT) * (t.c1 + t.c2)
        |                - (g.n_first + g.n_second) * t.c1) * 1000000)
        |          // (CAST(g.n_first + g.n_second AS HUGEINT)
        |             * greatest(t.c1, 1) * (t.c1 + t.c2)) AS BIGINT)
        |        + CAST(((CAST(g.n_second AS HUGEINT) * (t.c1 + t.c2)
        |                - (g.n_first + g.n_second) * t.c2)
        |              * (CAST(g.n_second AS HUGEINT) * (t.c1 + t.c2)
        |                - (g.n_first + g.n_second) * t.c2) * 1000000)
        |          // (CAST(g.n_first + g.n_second AS HUGEINT)
        |             * greatest(t.c2, 1) * (t.c1 + t.c2)) AS BIGINT) AS chi2_micro
        |      FROM g, t)
        |SELECT event_type, n_first, n_second, chi2_micro,
        |  CAST(chi2_micro > 3841000 AS INTEGER) AS drift_flag
        |FROM x ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      // mn + (mx−mn) div 2, NOT (mn+mx) div 2: the span is non-negative,
      // so Spark's truncating `div` and DuckDB's flooring `//` agree even
      // for pre-1970 (negative) epochs, where the sum form diverges by
      // 1 µs on negative odd sums — and the span can't overflow
      val mm = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(expr("mn + (mx - mn) div 2").as("mid"))
      // localCheckpoint: the (type × half) frame feeds both the output rows
      // and the column totals — materialize once, never rescan events.
      val g = ev.crossJoin(broadcast(mm))
        .groupBy(col("event_type"))
        .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).cast(LongType).as("n_first"),
          sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).cast(LongType).as("n_second"))
        .transform(graft.Materialize.ephemeral)
      val t = g.agg(sum(col("n_first")).cast(LongType).as("c1"),
        sum(col("n_second")).cast(LongType).as("c2"))
      def cell(o: String, c: String) =
        s"CAST(((CAST($o AS DECIMAL(38,0)) * (c1 + c2) - (n_first + n_second) * $c)" +
          s" * (CAST($o AS DECIMAL(38,0)) * (c1 + c2) - (n_first + n_second) * $c)" +
          s" * 1000000) div (CAST(n_first + n_second AS DECIMAL(38,0))" +
          s" * greatest($c, 1) * (c1 + c2)) AS BIGINT)"
      g.crossJoin(broadcast(t))
        .withColumn("chi2_micro",
          expr(cell("n_first", "c1")) + expr(cell("n_second", "c2")))
        .select(col("event_type"), col("n_first"), col("n_second"), col("chi2_micro"),
          (col("chi2_micro") > 3841000L).cast(IntegerType).as("drift_flag"))
        .orderBy(col("event_type"))
    },

    // ----- per-user event-type map (sumMap / CountMap analog) -------------
    // ClickHouse's map-valued aggregates (sumMap, countMap) keyed by user:
    // one (user, type) hash-agg, then the per-user MAP is assembled with
    // map_from_entries over the SORTED entry list and serialized
    // deterministically ("type:count,…") — a real MapType flows through
    // the plan (the Spark map surface under test), while the output stays
    // a flat string both engines can hash-compare. Per-user state is
    // bounded by the event-type dimension, never by event count.
    QuerySpec("q100_user_event_map")(
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_types, CAST(sum(n) AS BIGINT) AS total_events,
        |  string_agg(event_type || ':' || n, ',' ORDER BY event_type) AS type_counts
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val cnt = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      cnt.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("n")).cast(LongType).as("total_events"),
          map_from_entries(array_sort(
            collect_list(struct(col("event_type").as("k"), col("n").as("v")))))
            .as("m"))
        .select(col("user_id"), col("n_types"), col("total_events"),
          array_join(transform(map_entries(col("m")),
            e => concat_ws(":", e.getField("key"), e.getField("value"))), ",")
            .as("type_counts"))
        .orderBy(col("user_id"))
    }
  )
}
