package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Differential pins for the distributed BPE learner: the full merge
  * sequence must equal a single-node reference implementation (plain
  * Scala collections, same tie-breaks) at two fixture scales — the
  * cross-scale parity the oracle (which re-derives the sequence in
  * DuckDB) complements from a third, SQL-string-rewrite angle.
  */
class BpeSpec extends SparkSpec {

  private def wordsOf(dir: String): Seq[(String, Long)] =
    Bpe.wordCounts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  test("merge sequence parity with the single-node reference at sf0.001") {
    val dist = Bpe.learn(Bpe.wordCounts(spark, "/root/testdata/sf0.001"))
    val ref = Bpe.referenceLearn(wordsOf("/root/testdata/sf0.001"))
    assert(dist.nonEmpty && dist == ref,
      s"first diff: ${dist.zip(ref).find(p => p._1 != p._2)}")
  }

  test("merge sequence parity with the single-node reference at sf0.01") {
    val dist = Bpe.learn(Bpe.wordCounts(spark, "/root/testdata/sf0.01"))
    val ref = Bpe.referenceLearn(wordsOf("/root/testdata/sf0.01"))
    assert(dist.nonEmpty && dist == ref,
      s"first diff: ${dist.zip(ref).find(p => p._1 != p._2)}")
  }

  test("greedy merge fold equals string-replace semantics (the oracle's form)") {
    // The oracle applies merges with replace(' l r ' → ' lr ') on the
    // space-delimited symbol string — leftmost non-overlapping. The
    // distributed learner uses an aggregate() fold. Pin the equivalence
    // on the corner shapes: overlapping identical pairs, repeated merges
    // in one word, merge at either boundary.
    import spark.implicits._
    val words = Seq("aaa" -> 5L, "aaaa" -> 3L, "abab" -> 2L, "ba" -> 7L, "b" -> 1L)
    val dist = Bpe.learn(words.toDF("term", "freq"), rounds = 3)
    val ref = Bpe.referenceLearn(words, rounds = 3)
    assert(dist == ref)
    // and against a hand-derived round 1: pair (a,a) count = 5·2 + 3·3 = 19
    assert(dist.head == ((1L, "a", "a", 19L)))
  }

  test("encoding frame parity: every word's merged symbols equal the reference encoding") {
    // q140's consumer contract: learnWithFrame's final symbol frame IS
    // the vocabulary encoded under the learned merges. Pin every word of
    // the sf0.001 vocabulary against the single-node fold.
    import spark.implicits._
    val words = Bpe.wordCounts(spark, "/root/testdata/sf0.001")
    val (merges, frame) = Bpe.learnWithFrame(words)
    val got = frame.select(col("term"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    Materialize.free(frame)
    assert(merges.nonEmpty && got.nonEmpty)
    got.foreach { case (term, syms) =>
      val expect = Bpe.referenceEncode(term, merges)
      assert(syms == expect, s"term '$term': $syms vs $expect")
    }
    // and the reference encoding really merged something somewhere
    assert(got.exists { case (term, syms) => syms.size < term.length })
  }

  test("learner terminates early when no pairs remain") {
    import spark.implicits._
    // single-character vocabulary: round 1 has no adjacent pairs at all
    val words = Seq("a" -> 3L, "b" -> 2L).toDF("term", "freq")
    assert(Bpe.learn(words, rounds = 4).isEmpty)
    assert(Bpe.referenceLearn(Seq("a" -> 3L, "b" -> 2L), rounds = 4).isEmpty)
  }

  test("sliced-vocabulary learning (the resource-bounded sweep mode) exercises every merge-round regime") {
    // GRAFT_BPE_TERM_MOD=S restricts giant-corpus oracle sweeps to a
    // deterministic hash slice of the vocabulary; this pins that the
    // slice is a REAL BPE workload, not a degenerate one: a full round
    // budget is spent, and the merge sequence crosses all three regimes —
    // (char,char) openings, compound-symbol sides, and reuse of an
    // earlier round's OUTPUT as a later round's input (the compounding
    // the per-round greedy argmax exists to exploit).
    val full = Bpe.wordCounts(spark, "/root/testdata/sf0.01", mod = 1).count()
    val words = Bpe.wordCounts(spark, "/root/testdata/sf0.01", mod = 4)
    val n = words.count()
    assert(n > 2 && n < full, s"mod=4 slice is not a proper subset: $n of $full")
    val (merges, frame) = Bpe.learnWithFrame(words, rounds = 8)
    Materialize.free(frame)
    assert(merges.size == 8, s"slice starved the round budget: ${merges.size} merges")
    assert(merges.head._2.length == 1 && merges.head._3.length == 1,
      "round 1 must open in the char+char regime")
    assert(merges.exists(m => m._2.length > 1 || m._3.length > 1),
      "slice never reached the compound-symbol regime")
    val outputs = merges.map(m => m._2 + m._3)
    assert(merges.zipWithIndex.exists { case (m, i) =>
        outputs.take(i).contains(m._2) || outputs.take(i).contains(m._3)
      }, "no round consumed an earlier round's output symbol")
    assert(merges.forall(_._4 > 0), "non-positive pair count in the slice")
  }
}
