package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The banded-levenshtein optimizer rule: plan rewrite fires on the SQL
  * surface, and the rewritten predicate is value-identical to the
  * unbounded form (incl. nulls and the strict-< variant).
  */
class BandedLevenshteinSpec extends SparkSpec {

  private def thresholds(df: org.apache.spark.sql.DataFrame): Seq[Boolean] =
    df.queryExecution.optimizedPlan.collectWithSubqueries { case p => p }
      .flatMap(_.expressions.flatMap(_.collect { case l: Levenshtein => l.threshold.isDefined }))

  test("<=, <, and mirrored literal forms rewrite to the banded expression") {
    graft.plans.GraftExtensions.register(spark)
    // parquet-backed (a LocalRelation would be constant-folded whole)
    val df = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_name").as("a"), reverse(col("c_name")).as("b"))
    for (pred <- Seq("levenshtein(a, b) <= 1", "levenshtein(a, b) < 2",
        "1 >= levenshtein(a, b)", "2 > levenshtein(a, b)")) {
      val ts = thresholds(df.filter(expr(pred)))
      assert(ts.nonEmpty && ts.forall(identity),
        s"'$pred' did not rewrite to the banded form")
    }
    // already-banded and unbounded non-compared uses are left alone
    val untouched = thresholds(df.select(expr("levenshtein(a, b)").as("d")))
    assert(untouched.nonEmpty && untouched.forall(!_))
  }

  test("rewritten predicate is value-identical to the unbounded form") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val rows = Seq(
      ("abcd", "abcd"), ("abcd", "abce"), ("abcd", "abc"), ("abcd", "abcde"),
      ("abcd", "wxyz"), ("", ""), ("", "a"), ("a", null), (null, "b"), (null, null))
    val df = rows.toDF("a", "b")
    for (k <- 0 to 2) {
      // unbounded reference computed WITHOUT the rule (raw expression output)
      val ref = df.select(expr(s"levenshtein(a, b)").as("d")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0) <= k))
      val got = df.select(expr(s"levenshtein(a, b) <= $k").as("p")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
      assert(got.toSeq == ref.toSeq, s"k=$k")
    }
  }

  test("the gateway's SQL surface gets the rewrite (q121-shape ad-hoc filter)") {
    graft.plans.GraftExtensions.register(spark)
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val df = spark.sql(
      """SELECT a.c_name, b.c_name FROM customer a JOIN customer b
        |ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin)
    val ts = thresholds(df)
    assert(ts.nonEmpty && ts.forall(identity), "SQL-surface predicate not banded")
  }
}
