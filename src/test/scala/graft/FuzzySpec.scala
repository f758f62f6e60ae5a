package graft

import org.apache.spark.sql.functions._

/** q121 fuzzy blocking and q122 duplicated-span profile: brute-force
  * differentials at sf0.001 plus the no-quadratic-join plan guard.
  */
class FuzzySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // classic Levenshtein, small strings — reference implementation
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q121 equals the brute-force all-pairs distance-1 join (blocking is complete)") {
    val got = run("q121_fuzzy_blocking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    val names = Tables.load(spark, dir, "customer")
      .select("c_name").collect().map(_.getString(0))
    val brute = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d.toLong)).toSet
    assert(brute.nonEmpty, "fixture should contain distance-1 name pairs")
    assert(got == brute,
      s"blocking missed ${(brute -- got).take(3)} / extra ${(got -- brute).take(3)}")
  }

  test("q121 plans an equi-join on the blocking key — never a quadratic join") {
    val p = run("q121_fuzzy_blocking").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy blocking fell back to an all-pairs join:\n$p")
  }

  test("q122 matches a sequential-scan recomputation of positional dup runs") {
    val got = run("q122_dup_span").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // same normalization/shingling, on raw shingle STRINGS (hex60 is a
    // 60-bit injection for this scale — a collision would fail here)
    val shingled = docs.map { case (id, text) =>
      val w = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toVector
    }.filter(_._2.nonEmpty)
    val docsPerShingle = shingled.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val expected = shingled.map { case (id, ss) =>
      val dup = ss.map(docsPerShingle(_) >= 2)
      var best = 0; var cur = 0
      dup.foreach { d => if (d) { cur += 1; best = math.max(best, cur) } else cur = 0 }
      id -> ((ss.size.toLong, dup.count(identity).toLong, best.toLong))
    }.toMap
    assert(expected.nonEmpty && got == expected)
    assert(got.values.exists(_._3 >= 2), "fixture should exhibit a multi-shingle duplicated span")
  }
}
