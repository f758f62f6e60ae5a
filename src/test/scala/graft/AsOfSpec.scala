package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join semantics: latest right row with rts <= lts per key, ties
  * included, no-match → null (matches DuckDB ASOF LEFT JOIN, which q43
  * cross-checks at fixture scale).
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks latest on-or-before right row per key; null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3") // before any right row for key 2
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:59:59"), 20.0),
      (2L, ts("2024-01-01 09:00:01"), 30.0)
    ).toDF("user_id", "ts", "v")

    val out = AsOf.lastOnOrBefore(left, right, Seq("user_id"), "ts")
      .selectExpr("tag", "matched.__asof_ts AS mts", "matched.v AS mv")
      .collect().map(r => r.getString(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap

    assert(out("l1") == ((Some(ts("2024-01-01 09:30:00")), Some(10.0))))
    assert(out("l2") == ((Some(ts("2024-01-01 11:59:59")), Some(20.0))))
    assert(out("l3") == ((None, None)))
  }

  test("equal timestamps match (rts <= lts is inclusive)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 99.0)).toDF("user_id", "ts", "v")
    val out = AsOf.lastOnOrBefore(left, right, Seq("user_id"), "ts")
      .selectExpr("matched.v").collect()
    assert(out.head.getDouble(0) == 99.0)
  }

  test("forward variant picks earliest on-or-after right row; equality included") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),  // equal-ts right row matches
      (1L, ts("2024-01-01 11:00:00"), "l2"),  // next right row is 11:30
      (2L, ts("2024-01-01 09:00:00"), "l3")   // after every right row for key 2
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:30:00"), 2.0),
      (2L, ts("2024-01-01 08:00:00"), 3.0)
    ).toDF("user_id", "ts", "v")

    val out = AsOf.firstOnOrAfter(left, right, Seq("user_id"), "ts")
      .selectExpr("tag", "matched.__asof_ts AS mts", "matched.v AS mv")
      .collect().map(r => r.getString(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap

    assert(out("l1") == ((Some(ts("2024-01-01 10:00:00")), Some(1.0))))
    assert(out("l2") == ((Some(ts("2024-01-01 11:30:00")), Some(2.0))))
    assert(out("l3") == ((None, None)))
  }
}
