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
}
