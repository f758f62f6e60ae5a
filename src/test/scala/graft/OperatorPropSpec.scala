package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the scale-path operators whose correctness argument
  * is "equivalent to the naive formulation": random inputs, not just the
  * fixture shapes.
  */
class OperatorPropSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("broadcastChunks covers the budget for random (nq, dims, budget)") {
    import graft.operators.Sizing
    val gen = for {
      nq <- Gen.chooseNum(1L, 10_000_000L)
      dims <- Gen.chooseNum(1, 8192)
      budget <- Gen.chooseNum(1024L, Sizing.MaxQueryBroadcastElems)
    } yield (nq, dims, budget)
    sample(gen, 500, seed = 97L).foreach { case (nq, dims, budget) =>
      val chunks = Sizing.broadcastChunks(nq, dims, budget)
      assert(chunks >= 1)
      if (nq > budget / Sizing.MaxDimNoProbe) {
        // past the no-probe bound the derivation is exact: the chunked
        // broadcasts jointly cover nq·dims within chunks·budget
        assert(chunks.toLong * budget >= nq * dims,
          s"nq=$nq dims=$dims budget=$budget chunks=$chunks under-covers")
        // and never over-chunks by more than one budget's worth
        assert((chunks - 1).toLong * budget < nq * dims,
          s"nq=$nq dims=$dims budget=$budget chunks=$chunks over-chunks")
      }
    }
  }

  test("minhash_sigs equals the k-fold transform/array_min HOF on random arrays") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    val p = 2147483647L
    val a = Seq(7L, 999999937L, 123456789L, 1L)
    val b = Seq(3L, 42L, 2000000000L, 0L)
    // 60-bit non-negative hashes, arrays of length 0..40
    val arrGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1)))
    val rows = sample(arrGen, 200, seed = 41L)
    val df = rows.toDF("ss")
    val out = df.select(
        call_function("minhash_sigs", col("ss"),
          typedLit(a), typedLit(b), lit(p)).as("native"),
        when(size(col("ss")) > 0,
          array(a.indices.map(j =>
            array_min(transform(col("ss"), h => (h % p * a(j) + b(j)) % p))): _*))
          .as("hof"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("Ordinals.globalRowNumber equals the global window on random keys") {
    import spark.implicits._
    // keys with duplicates broken by a unique id — a total order
    val rows = sample(Gen.alphaStr.map(_.take(6)), 300, seed = 99L)
      .zipWithIndex.map { case (k, i) => (i.toLong, k + f"#$i%04d") }
    val df = rows.toDF("id", "key").repartition(7)
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(col("key"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = operators.Ordinals.globalRowNumber(df, "rn", "key")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
    val gotNative = operators.Ordinals.globalRowNumberNative(df, "rn", "key",
        buckets = 8, sampleMod = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotNative == expected)
  }

  test("capped-Jaccard upper-bound prune is output-neutral on random corpora") {
    import spark.implicits._
    // Random docs over a tiny vocabulary → dense shingle collisions, lots
    // of hot (df > cap) shingles — the regime where the prune bound
    // actually bites. The invariant is prune SOUNDNESS: theta-pruned
    // verify ≡ verify-everything (theta = 0 disables the prune), both
    // filtered at the threshold. (Equivalence to the UNCAPPED pairs is
    // data-dependent — pairs sharing only hot shingles are the cap's
    // documented miss — and is pinned separately on the fixtures.)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docGen = Gen.chooseNum(8, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    // Each random base doc gets a planted near-dup (one appended token):
    // ≥6 shared shingles of 7 → jaccard ≥ 6/7 > 0.8.
    val bases = sample(docGen, 60, seed = 17L)
    val rows = (bases ++ bases.map(_ + " a")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val dss = operators.TextAnalysis.docShingleSets(
      rows.toDF("doc_id", "text"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .filter(org.apache.spark.sql.functions.col("jac_raw") >= 0.8)
      .select("a_doc", "b_doc", "n_inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unpruned = pairs(operators.Dedup.pairJaccardCapped(dss, dfCap = 4, theta = 0.0))
    val pruned = pairs(operators.Dedup.pairJaccardCapped(dss, dfCap = 4, theta = 0.8))
    assert(unpruned.nonEmpty, "random corpus over a 6-token vocab should produce near-dups")
    assert(pruned == unpruned,
      s"prune dropped real pairs: missing=${unpruned -- pruned} extra=${pruned -- unpruned}")
    // the containment prune bound is sound on the same random corpus: the
    // θ-pruned pair set equals the unpruned set filtered at the output
    def cpairs(df: org.apache.spark.sql.DataFrame) = df
      .filter(org.apache.spark.sql.functions.col("contain_micro") >= 800000L)
      .select("a_doc", "b_doc", "n_inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cUnpruned = cpairs(operators.Dedup.pairContainmentCapped(dss, dfCap = 4, theta = 0.0))
    val cPruned = cpairs(operators.Dedup.pairContainmentCapped(dss, dfCap = 4, theta = 0.8))
    assert(cUnpruned.nonEmpty, "random corpus should produce containment pairs")
    assert(cPruned == cUnpruned,
      s"containment prune dropped real pairs: missing=${cUnpruned -- cPruned} extra=${cPruned -- cUnpruned}")
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 60L); b <- Gen.chooseNum(0L, 60L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val edges = sample(edgeGen, 80, seed = 23L).distinct
    // reference: plain union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    val got = operators.Dedup.connectedComponents(edges.toDF("a_doc", "b_doc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.nonEmpty && got == expected,
      s"diff=${(expected.toSet -- got.toSet) ++ (got.toSet -- expected.toSet)}")
    val gotStar = operators.Dedup.connectedComponentsStar(edges.toDF("a_doc", "b_doc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStar == expected,
      s"star diff=${(expected.toSet -- gotStar.toSet) ++ (gotStar.toSet -- expected.toSet)}")
  }

  test("Ordinals.globalRunningSumNative equals the global window sum on random values") {
    import spark.implicits._
    val rows = sample(Gen.chooseNum(0L, 5000L), 400, seed = 7L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "v").repartition(9)
    val expected = df
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = operators.Ordinals.globalRunningSumNative(df, "cum", "id", col("v"),
        buckets = 8, sampleMod = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("sessionize matches the greedy automaton on dense random ties, any partitioning") {
    import spark.implicits._
    val gap = 3L * 1000000L // 3 s
    val gen = for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 30L)
    } yield (u, t * 1000000L) // 5 users × 31 instants → heavy ties
    val rows = sample(gen, 300, seed = 11L).zipWithIndex
      .map { case ((u, t), i) => (u, i.toLong, t) }
    val df = rows.toDF("user_id", "event_id", "t").repartition(7)
    val got = operators.Behavioral.sessionize(df, gap).collect()
      .groupBy(_.getLong(0))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val ts = rs.map(_._3).sorted
      val expected = ts.foldLeft(List.empty[(Long, Long, Int)]) {
        case ((st, en, n) :: rest, t) if t - en <= gap => (st, t, n + 1) :: rest
        case (acc, t) => (t, t, 1) :: acc
      }.reverse
      val gu = got(u).sortBy(_.getLong(1))
      assert(gu.map(_.getLong(1)).toList == (1L to expected.size).toList,
        s"user $u: sids not 1..k")
      assert(gu.map(r => (r.getLong(3), r.getLong(4), r.getLong(2).toInt)).toList ==
        expected, s"user $u sessions diverge")
    }
  }

  test("q91 weighted quantile equals the driver-side brute force on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("q91_weighted_quantile")(spark, dir).collect()(0)
    // brute force: doc-level (quality, tok), sorted by quality, walk the
    // cumulative token mass to the 10% threshold
    val docs = operators.TextAnalysis.qualityIndex(spark, dir)
      .select(col("doc_id"), col("quality_micro"), col("n_tokens").cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val tot = docs.map(_._2).sum
    val byQ = docs.groupBy(_._1).view.mapValues(v => (v.map(_._2).sum, v.size.toLong))
      .toSeq.sortBy(_._1)
    var (cumW, cumD) = (0L, 0L)
    var hit: Option[(Long, Long, Long)] = None
    byQ.foreach { case (q, (w, d)) =>
      cumW += w; cumD += d
      if (hit.isEmpty && cumW * 10 >= tot) hit = Some((q, cumW, cumD))
    }
    val (q, dw, dd) = hit.get
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ==
      ((q, dw, dd, tot, docs.length.toLong)))
    // the cutoff is a genuine 10% token-mass threshold: the mass strictly
    // below it stays under 10%
    assert((dw - byQ.toMap.apply(q)._1) * 10 < tot)
  }

  test("bucketized range join equals the naive theta join on random tiers") {
    import spark.implicits._
    // random irregular [lo, hi) tiers (contiguous partition of the value
    // domain so membership is unique) + random values + random granule:
    // the bucketize-equi-join-filter plan must match the direct range
    // predicate row for row.
    val caseGen = for {
      nTiers <- Gen.chooseNum(2, 6)
      cuts <- Gen.listOfN(nTiers - 1, Gen.chooseNum(1L, 9999L))
      granule <- Gen.chooseNum(1L, 2000L)
      nVals <- Gen.chooseNum(1, 120)
      vals <- Gen.listOfN(nVals, Gen.chooseNum(0L, 9999L))
    } yield (cuts.distinct.sorted, granule, vals)
    sample(caseGen, 25, seed = 4242L).foreach { case (cuts, g, vals) =>
      val bounds = (0L +: cuts) :+ 10000L
      val tiers = bounds.init.zip(bounds.tail).zipWithIndex.map {
        case ((lo, hi), i) => (s"t$i", lo, hi)
      }
      val tiersExp = tiers.toDF("tier", "lo", "hi")
        .select(col("tier"), col("lo"), col("hi"),
          explode(sequence(floor(col("lo") / g).cast("long"),
            floor((col("hi") - 1) / g).cast("long"))).as("bucket"))
      val f = vals.toDF("v").withColumn("bucket", expr(s"v div $g"))
      val bucketized = f.join(broadcast(tiersExp), Seq("bucket"))
        .filter(col("v") >= col("lo") && col("v") < col("hi"))
        .groupBy(col("tier")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val naive = vals.groupBy(v => tiers.find(t => v >= t._2 && v < t._3).get._1)
        .view.mapValues(_.size.toLong).toMap
      assert(bucketized == naive,
        s"granule $g tiers $tiers: bucketized $bucketized != naive $naive")
    }
  }

  test("bloom probe admits every inserted key for random key sets (no false negatives)") {
    import graft.functions.expressions.BloomMightContainLong
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.util.sketch.BloomFilter
    val gen = for {
      n <- Gen.chooseNum(1, 2000)
      keys <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield keys
    sample(gen, 30, seed = 131L).foreach { keys =>
      val bf = BloomFilter.create(math.max(keys.size, 1).toLong, 0.01)
      keys.foreach(bf.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val e = BloomMightContainLong(BoundReference(0, LongType, nullable = false), bos.toByteArray)
      keys.foreach { k =>
        assert(e.eval(InternalRow(k)) == true, s"false negative for inserted key $k")
      }
    }
  }

  test("banded levenshtein(k) agrees with the classic DP for random string pairs") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strGen = for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val pairGen = for { a <- strGen; b <- strGen } yield (a, b)
    val pairs = sample(pairGen, 300, seed = 151L)
    for (k <- 0 to 3) {
      // the rewritten predicate (rule fires on <=) vs the reference DP
      val got = pairs.toDF("a", "b")
        .select(expr(s"levenshtein(a, b) <= $k").as("p")).collect().map(_.getBoolean(0))
      val want = pairs.map { case (a, b) => lev(a, b) <= k }
      assert(got.toSeq == want, s"banded k=$k diverges from the DP")
    }
  }

  test("q147: funnel accounting is internally consistent and ends at the true survivor count") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q147_filter_funnel")(spark, dir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    val nDocs = Tables.load(spark, dir, "documents").count()
    // survivors walk: after(k) = after(k-1) - marginal(k); after(0) = corpus
    var surv = nDocs
    rows.foreach { r =>
      val (total, marginal, after) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(marginal <= total, s"rule ${r.getString(1)}: marginal > total")
      assert(after == surv - marginal, s"rule ${r.getString(1)}: survivor walk broke")
      surv = after
    }
    // every discriminating rule kills someone on this fixture; the
    // punctuation rule honestly reports a no-op on punctuation-free text
    val byRule = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(byRule("too_short") > 0 && byRule("repetitious") > 0 &&
      byRule("stopword_poor") > 0)
    assert(byRule("punct_heavy") == 0)
    assert(surv > 0 && surv < nDocs, "cascade should drop some but not all docs")
  }
}
