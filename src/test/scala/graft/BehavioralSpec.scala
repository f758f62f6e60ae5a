package graft

import org.apache.spark.sql.functions._

/** Funnel-DP semantics on hand-built event chains (the corner cases the
  * sf fixtures don't guarantee to contain), plus cross-query invariants
  * for retention and shingle novelty on the sf0.001 fixtures.
  */
class BehavioralSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val W = 6L * 3600L * 1000000L // Behavioral.WindowMicros

  /** Run the funnel DP over one hand-built (t µs, k step) event list. */
  private def level(evs: (Long, Int)*): Int = {
    import spark.implicits._
    Seq(evs).toDF("raw")
      .withColumn("evs", expr("transform(raw, x -> struct(x._1 as t, x._2 as k))"))
      .select(operators.Behavioral.funnelLevel(sort_array(col("evs"))).as("level"))
      .collect()(0).getInt(0)
  }

  test("funnel DP: ordered chain within window reaches full depth") {
    assert(level((0L, 1), (10L, 2), (20L, 3)) == 3)
  }

  test("funnel DP: step order is enforced (click before view chains nothing)") {
    assert(level((0L, 2), (10L, 1)) == 1)
    assert(level((0L, 3), (10L, 2), (20L, 1)) == 1)
  }

  test("funnel DP: window boundary is inclusive, one µs past is out") {
    assert(level((0L, 1), (W, 2)) == 2)
    assert(level((0L, 1), (W + 1L, 2)) == 1)
  }

  test("funnel DP: same-instant events never chain (strict increase)") {
    assert(level((0L, 1), (0L, 2)) == 1)
    assert(level((0L, 1), (10L, 2), (10L, 3)) == 2)
  }

  test("funnel DP: re-anchors on a later step-1 event (greedy-from-first misses this)") {
    // The first view's window expires before the click; only a chain
    // starting at the SECOND view reaches depth 2 — a DP that tracks only
    // the earliest view would answer 1.
    assert(level((0L, 1), (100L, 1), (W + 50L, 2)) == 2)
    // ...and the chain window is measured from the anchor that works:
    // v@0 → c@W-1 chains, then p@W+90 is within W of NOTHING reaching
    // depth 2 except the v@100 anchor (p - 100 ≤ W), so depth 3 needs the
    // re-anchored chain v@100 → c@W-1 → p@W+90.
    assert(level((0L, 1), (100L, 1), (W - 1L, 2), (W + 90L, 3)) == 3)
  }

  test("funnel DP: depth k uses the committed frontier, not a same-instant step") {
    // view@0, click@10, purchase@10: purchase may not chain onto the
    // same-instant click — depth stays 2. A purchase one µs later chains.
    assert(level((0L, 1), (10L, 2), (10L, 3)) == 2)
    assert(level((0L, 1), (10L, 2), (11L, 3)) == 3)
  }

  test("q81: histogram covers every user exactly once") {
    val hist = SparkEntry.queries("q81_window_funnel")(spark, dir)
      .agg(sum(col("n_users"))).collect()(0).getLong(0)
    val users = Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(hist == users, s"funnel histogram covers $hist of $users users")
  }

  test("q82: cohorts partition the signed-up users; retained never exceeds cohort size") {
    val rows = SparkEntry.queries("q82_retention_cohort")(spark, dir).collect()
    val signedUp = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == signedUp)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) <= n && r.getLong(3) <= n && r.getLong(4) <= n)
    }
  }

  test("q84: window-derived chain counts match a sequential-scan automaton") {
    // Third derivation of the same semantics (range-frame windows in
    // Spark, EXISTS subqueries in the oracle, and here a per-user
    // instant-batched scan): process events grouped by timestamp against
    // the state strictly before it — a purchase counts iff the last view
    // is later than the last purchase.
    val byUser = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
    val expected = byUser.flatMap { case (uid, rows) =>
      var lastV, lastP = Long.MinValue
      var chains, purchases = 0L
      rows.map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
        .groupBy(_._1).toSeq.sortBy(_._1)
        .foreach { case (t, evs) =>
          val nP = evs.count(_._2 == "purchase")
          purchases += nP
          if (nP > 0 && lastV > lastP) chains += nP
          if (evs.exists(_._2 == "view")) lastV = t
          if (nP > 0) lastP = t
        }
      if (purchases > 0) Some(uid -> (purchases, chains)) else None
    }
    val got = SparkEntry.queries("q84_sequence_count")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      s"window vs scan mismatch on ${expected.keySet.diff(got.keySet) ++ got.filterNot(kv => expected.get(kv._1).contains(kv._2)).keys}")
  }

  test("q85: exactly k hitters per language, ranks dense, df non-increasing") {
    val rows = SparkEntry.queries("q85_lang_heavy_hitters")(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to ranked.length),
        s"$lang ranks not dense: ${ranked.map(_.getInt(3)).toSeq}")
      assert(ranked.length <= 5)
      val dfs = ranked.map(_.getLong(2))
      assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b }, s"$lang df not sorted")
    }
  }

  test("q86 vs q83: a doc's unique (df=1) shingles are a subset of its novel ones") {
    // df=1 ⇒ this doc is the shingle's only owner ⇒ also its first owner.
    val dup = SparkEntry.queries("q86_dup_fraction")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nov = SparkEntry.queries("q83_shingle_novelty")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dup.keySet == nov.keySet)
    dup.foreach { case (doc, nUnique) =>
      assert(nUnique <= nov(doc), s"doc $doc: n_unique $nUnique > n_novel ${nov(doc)}")
    }
  }

  test("q87: bins partition each type's rows; bounds are the true min/max") {
    val rows = SparkEntry.queries("q87_value_histogram")(spark, dir).collect()
    val e = Tables.load(spark, dir, "events")
    val perType = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"), max(col("value")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val (n, mn, mx) = perType(tpe)
      assert(rs.map(_.getLong(2)).sum == n, s"$tpe bins don't partition the rows")
      assert(rs.forall(r => r.getDouble(3) == mn && r.getDouble(4) == mx))
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9))
    }
  }

  test("q88: source profile totals reconcile with the corpus-wide aggregates") {
    val rows = SparkEntry.queries("q88_source_profile")(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "n_docs must partition the corpus")
    // Σ n_shingles over sources = corpus shingle postings; Σ (n_shingles −
    // n_dup) = the corpus's df=1 shingle count (each unique shingle has
    // exactly one owner doc, hence one owner source).
    val idx = operators.TextAnalysis.docShingleSets(docs)
      .select(col("doc_id"), explode(col("ss")).as("s"))
    val postings = idx.count()
    val df1 = idx.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") === 1).count()
    assert(rows.map(_.getLong(5)).sum == postings)
    assert(rows.map(r => r.getLong(5) - r.getLong(6)).sum == df1)
  }

  test("q89: spine is contiguous per type; n partitions the events; LOCF carries the last observed count") {
    val rows = SparkEntry.queries("q89_gap_fill")(spark, dir).collect()
    val e = Tables.load(spark, dir, "events")
    val perType = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs0) =>
      val rs = rs0.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      val days = rs.map(_.getDate(1).toLocalDate.toEpochDay)
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        s"$tpe spine has gaps")
      assert(rs.map(_.getLong(2)).sum == perType(tpe),
        s"$tpe filled counts don't partition the events")
      // filled ⟺ n == 0, and locf carries the last observed (filled=0) n
      var lastObs = -1L
      rs.foreach { r =>
        val (n, filled, locf) = (r.getLong(2), r.getInt(3), r.getLong(4))
        assert((filled == 1) == (n == 0L))
        if (filled == 0) lastObs = n
        assert(locf == lastObs, s"$tpe day ${r.getDate(1)}: locf $locf != $lastObs")
      }
    }
  }

  test("q90: sessions match a per-user greedy sequential scan") {
    val gap = 30L * 60L * 1000000L
    val out = SparkEntry.queries("q90_sessionize")(spark, dir).collect()
      .groupBy(_.getLong(0))
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    evs.foreach { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = ts.foldLeft(List.empty[(Long, Long, Int)]) {
        case ((st, en, n) :: rest, t) if t - en <= gap => (st, t, n + 1) :: rest
        case (acc, t) => (t, t, 1) :: acc
      }.reverse
      val got = out(u).sortBy(_.getLong(1))
        .map(r => (r.getLong(3), r.getLong(4), r.getLong(2).toInt)).toList
      assert(got == sessions, s"user $u: $got != $sessions")
      // session ids are 1..k in order
      assert(out(u).sortBy(_.getLong(1)).map(_.getLong(1)).toList ==
        (1L to sessions.size).toList)
    }
  }

  test("q92: rolling 7-day actives equal the driver-side window recount") {
    val rows = SparkEntry.queries("q92_rolling_active")(spark, dir).collect()
    val pairs = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val byDay = pairs.groupBy(_._2)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) == byDay(d).size, s"dau mismatch on day $d")
      val expectedWau = pairs.filter(p => p._2 >= d - 6 && p._2 <= d)
        .map(_._1).distinct.size
      assert(r.getLong(2) == expectedWau, s"wau7 mismatch on day $d")
    }
    assert(rows.map(_.getDate(0).toLocalDate.toEpochDay).toSet == byDay.keySet,
      "q92 must cover exactly the active days")
  }

  test("q93: transition counts equal a per-user sequential bigram scan") {
    val rows = SparkEntry.queries("q93_type_transitions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val expected = scala.collection.mutable.Map.empty[(String, String), Long]
    evs.values.foreach { rs =>
      rs.sortBy(r => (r._2, r._3)).map(_._4).toList.sliding(2).foreach {
        case a :: b :: Nil => expected((a, b)) = expected.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    assert(rows == expected.toMap, "bigram counts diverge from the sequential scan")
  }

  test("q94: cumulative uniques equal the driver-side first-seen recount") {
    val rows = SparkEntry.queries("q94_cumulative_uniques")(spark, dir).collect()
    val firstSeen = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val perDay = firstSeen.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    val days = rows.map(_.getDate(0).toLocalDate.toEpochDay)
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 }, "spine has gaps")
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      val nu = perDay.getOrElse(d, 0L)
      cum += nu
      assert(r.getLong(1) == nu && r.getLong(2) == cum, s"day $d mismatch")
    }
    assert(cum == firstSeen.size, "final cumulative must equal total distinct users")
  }

  test("q83: every distinct corpus shingle is novel for exactly one doc") {
    val out = SparkEntry.queries("q83_shingle_novelty")(spark, dir)
    val novelSum = out.agg(sum(col("n_novel"))).collect()(0).getLong(0)
    val distinctShingles = operators.TextAnalysis
      .docShingleSets(Tables.load(spark, dir, "documents"))
      .select(explode(col("ss")).as("s")).distinct().count()
    assert(novelSum == distinctShingles,
      s"novel counts sum to $novelSum, corpus has $distinctShingles distinct shingles")
    // The earliest doc by ingest order is all-novel by construction.
    val first = out.orderBy(col("doc_id")).limit(1).collect()(0)
    assert(first.getLong(2) == first.getLong(1) && first.getDouble(3) == 1.0)
  }

  test("q132: integer chi-square agrees with the naive float derivation") {
    // Cross-derivation: the division-cleared micro-unit cells against the
    // textbook (o−e)²/e float formula — the same differential pattern as
    // q99's z-score test. Floor quantization loses < 1 micro-unit per
    // cell, so the tolerance is 2 absolute micro-units plus float slack.
    val rows = SparkEntry.queries("q132_distribution_drift")(spark, dir).collect()
    assert(rows.length >= 2, "fixture should contain multiple event types")
    val c1 = rows.map(_.getLong(1)).sum.toDouble
    val c2 = rows.map(_.getLong(2)).sum.toDouble
    assert(c1 > 0 && c2 > 0, "midpoint split must populate both halves")
    val tt = c1 + c2
    rows.foreach { r =>
      val o1 = r.getLong(1).toDouble; val o2 = r.getLong(2).toDouble
      val rr = o1 + o2
      val e1 = rr * c1 / tt; val e2 = rr * c2 / tt
      val chi = (if (e1 > 0) (o1 - e1) * (o1 - e1) / e1 else 0.0) +
        (if (e2 > 0) (o2 - e2) * (o2 - e2) / e2 else 0.0)
      val micro = r.getLong(3)
      assert(math.abs(chi * 1e6 - micro) <= 2 + chi * 1e6 * 1e-9,
        s"${r.getString(0)}: float chi2 ${chi * 1e6} vs integer $micro")
      assert((r.getInt(4) == 1) == (micro > 3841000L))
    }
    // the per-type splits must re-sum to the global column totals the
    // operator derived them from (internal consistency of the one pass)
    val ev = Tables.load(spark, dir, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == ev)
  }
}
