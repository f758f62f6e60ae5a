package graft

import org.apache.spark.sql.functions._

/** Properties of the round-8 corpus ops (q96–q100) that the DuckDB oracle
  * can't express directly: chunk coverage (every token in ≥1 chunk, stride
  * geometry), mixture-weight normalization, and a cross-derivation of the
  * integer-exact anomaly rule against the naive float z-score.
  */
class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q96: chunks cover every token, respect size and stride") {
    import graft.functions.TextFunctions._
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = q("q96_chunk_windows").collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every document must produce chunks")
    byDoc.foreach { case (docId, rows) =>
      val n = docs(docId)
      val sorted = rows.sortBy(_.getInt(1))
      // stride geometry: chunk k starts at 1 + 24k
      sorted.foreach { r =>
        assert(r.getInt(2) == 1 + 24 * r.getInt(1), s"doc $docId start_pos")
        assert(r.getInt(3) <= 32 && r.getInt(3) >= 1, s"doc $docId chunk size")
      }
      // coverage: last chunk reaches the last token
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) - 1 == n,
        s"doc $docId: final chunk must end at token $n")
      // chunk count: exactly floor((n-1)/stride)+1
      assert(sorted.length == (n - 1) / 24 + 1, s"doc $docId chunk count")
    }
  }

  test("q97: terms ranked within doc; rank 1 has the doc's max tf") {
    val rows = q("q97_distinctive_terms").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      // tf must be non-increasing with rank (df/term break ties)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) >= b.getLong(3))
        case _ => ()
      }
    }
  }

  test("q98: alpha shares are a probability distribution flatter than raw") {
    val rows = q("q98_mixture_temperature").collect()
    val raw = rows.map(_.getDouble(3))
    val alpha = rows.map(_.getDouble(4))
    assert(math.abs(alpha.sum - 1.0) < 1e-9, s"alpha sums to ${alpha.sum}")
    assert(math.abs(raw.sum - 1.0) < 1e-9)
    // temperature α=0.5 flattens: max share shrinks, min share grows
    assert(alpha.max <= raw.max + 1e-12)
    assert(alpha.min >= raw.min - 1e-12)
  }

  test("q99: integer rule equals the naive float 2-sigma z-score") {
    val rows = q("q99_daily_anomaly").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val xs = rs.map(_.getLong(2).toDouble)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val varp = xs.map(x => (x - mean) * (x - mean)).sum / n
      rs.foreach { r =>
        val naive = math.abs(r.getLong(2) - mean) > 2.0 * math.sqrt(varp)
        assert(r.getInt(3) == (if (naive) 1 else 0),
          s"${r.getString(0)} ${r.get(1)}: integer rule disagrees with float z-score")
      }
    }
  }

  test("q103: percentiles bounded, monotone in quality within source, max hits 1e6") {
    val rows = q("q103_quality_percentile").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, pct) => assert(pct >= 0L && pct <= 1000000L) }
    rows.groupBy(_._1).foreach { case (src, rs) =>
      // same quality → same percentile; higher quality → ≥ percentile
      val byQ = rs.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
      byQ.foreach { case (qv, ps) =>
        assert(ps.size == 1, s"$src quality $qv maps to several percentiles: $ps")
      }
      val sorted = byQ.toSeq.sortBy(_._1).map(_._2.head)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b, s"$src: percentile not monotone")
        case _ => ()
      }
      // a UNIQUE top quality sits exactly at p100; the minimum at p0
      val maxQ = rs.map(_._2).max
      if (rs.length > 1 && rs.count(_._2 == maxQ) == 1)
        assert(sorted.last == 1000000L, s"$src: unique top quality must be p100")
      assert(sorted.head == 0L, s"$src: lowest quality must sit at p0")
    }
  }

  test("freq_items_mg honors Misra-Gries bounds when capacity overflows") {
    import spark.implicits._
    plans.GraftExtensions.register(spark)
    // Skewed stream over 12 distinct items with capacity 4: decrements
    // MUST fire, so this exercises exactly the regime the q107 oracle
    // can't (there the fixture vocab sits under capacity and counts are
    // exact). Zipf-ish truth: item i repeated (13-i)*i? keep it simple:
    // heavy items h1=400, h2=200, tail t1..t10 x 20 each. N = 800.
    val rows =
      Seq.fill(400)("h1") ++ Seq.fill(200)("h2") ++
        (1 to 10).flatMap(i => Seq.fill(20)(s"t$i"))
    val n = rows.length
    val cap = 4
    // parallelism 8 forces real partial-aggregate merges
    val out = spark.sparkContext.parallelize(rows, 8).toDF("item")
      .agg(org.apache.spark.sql.functions.expr(s"freq_items_mg(item, $cap, $cap)").as("top"))
      .select(org.apache.spark.sql.functions.explode(col("top")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val err = n.toLong / (cap + 1)
    out.foreach { case (item, cnt) =>
      assert(cnt <= truth(item), s"$item: MG counter $cnt exceeds true ${truth(item)}")
      assert(cnt >= truth(item) - err, s"$item: counter $cnt below lower bound")
    }
    // heavy-hitter containment: every item with true count > N/(cap+1)
    // must survive in the sketch
    truth.filter(_._2 > err).keys.foreach { h =>
      assert(out.contains(h), s"heavy item $h missing from sketch: $out")
    }
  }

  test("freq_items_mg_weighted honors the weighted MG bounds when capacity overflows") {
    import spark.implicits._
    plans.GraftExtensions.register(spark)
    // 12 distinct items, capacity 4, WEIGHTED mass: cuts must fire. Error
    // bound is W/(cap+1) for total MASS W (not row count). Negative and
    // null-ish weights contribute nothing.
    val rows = Seq(("h1", 400L), ("h2", 200L)) ++
      (1 to 10).map(i => (s"t$i", 20L)) ++ Seq(("junk", -5L), ("junk", 0L))
    val df = spark.sparkContext.parallelize(rows, 6).toDF("item", "w")
    val cap = 4
    val out = df
      .agg(org.apache.spark.sql.functions.expr(s"freq_items_mg_weighted(item, w, $cap, $cap)").as("top"))
      .select(org.apache.spark.sql.functions.explode(col("top")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.filter(_._2 > 0).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = truth.values.sum
    val err = w / (cap + 1)
    out.foreach { case (item, cnt) =>
      assert(truth.contains(item) && cnt <= truth(item), s"$item: $cnt exceeds true ${truth.get(item)}")
      assert(cnt >= truth(item) - err, s"$item: counter $cnt below lower bound")
    }
    truth.filter(_._2 > err).keys.foreach { h =>
      assert(out.contains(h), s"heavy item $h missing from sketch: $out")
    }
    assert(!out.contains("junk"), "non-positive weights must contribute nothing")
  }

  test("freq_items_mg rejects malformed calls with a clean AnalysisException") {
    import spark.implicits._
    plans.GraftExtensions.register(spark)
    val df = Seq("a", "b", "a").toDF("item")
    df.createOrReplaceTempView("fim_args")
    def bad(sql: String, fragment: String): Unit = {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(ex.getMessage.contains(fragment),
        s"for [$sql]: got ${ex.getMessage}")
    }
    // wrong arity, non-foldable arg, and non-integral literal each surface
    // as AnalysisException naming the signature — not ClassCast/NPE
    bad("SELECT freq_items_mg(item, 4) FROM fim_args", "expects 3 arguments")
    bad("SELECT freq_items_mg(item, length(item), 4) FROM fim_args", "not foldable")
    bad("SELECT freq_items_mg(item, 'four', 4) FROM fim_args", "capacity")
    bad("SELECT freq_items_mg(item, CAST(NULL AS INT), 4) FROM fim_args", "NULL")
  }

  test("q100: map string round-trips the per-user type counts") {
    val rows = q("q100_user_event_map").collect()
    val direct = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type")).count()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.map(r => r.getString(1) -> r.getLong(2)).sortBy(_._1)
          .map { case (k, v) => s"$k:$v" }.mkString(",")
      }
    assert(rows.length == direct.size)
    rows.foreach { r =>
      assert(r.getString(3) == direct(r.getLong(0)), s"user ${r.getLong(0)}")
      assert(r.getLong(1) == r.getString(3).split(",").length, "n_types")
    }
  }

  test("q125: collocation lift matches a sequential-scan recomputation") {
    val got = q("q125_collocations").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.nonEmpty)
    // replicate normText exactly: Locale.ROOT lower (Spark's lower() is
    // locale-independent), \s+ collapse, then trim of SPACE only (Java's
    // String.trim strips all chars <= 0x20 — not what Spark's trim does)
    def norm(t: String): Seq[String] = t.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
      .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      .split(" ").toSeq
    val docs = Tables.load(spark, dir, "documents")
      .select("text").collect().map(r => norm(r.getString(0)))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = docs.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val u = BigInt(uni.values.sum); val b = BigInt(bi.values.sum)
    val expected = bi.filter(_._2 >= 5).map { case ((a, bb), nxy) =>
      (a, bb) -> ((nxy, uni(a), uni(bb),
        (BigInt(nxy) * u * u * 1000000 / (b * uni(a) * uni(bb))).toLong))
    }
    // the returned rows are the global top-50 on (lift desc, a, b) under
    // Spark's BINARY string order — compare UTF-8 bytes, not Java chars
    // (UTF-16 code-unit order diverges for supplementary-plane text)
    def utf8Lt(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8"); val c = y.getBytes("UTF-8")
      var i = 0
      while (i < a.length && i < c.length) {
        val d = (a(i) & 0xff) - (c(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < c.length
    }
    val topExpected = expected.toSeq.sortWith { case (((a1, b1), (_, _, _, l1)), ((a2, b2), (_, _, _, l2))) =>
      if (l1 != l2) l1 > l2
      else if (a1 != a2) utf8Lt(a1, a2)
      else utf8Lt(b1, b2)
    }.take(50)
    assert(got.toSeq == topExpected.map { case (k, v) => (k, v) },
      "collocation top-50 diverges from the sequential recomputation")
  }

  test("q123: dedup groups recount exactly from the q96 chunk stream") {
    val chunks = q("q96_chunk_windows").collect()
      .map(r => (r.getLong(0), r.getLong(4))) // (doc_id, chunk_fp)
    val expected = chunks.groupBy(_._2)
      .filter(_._2.length >= 2)
      .map { case (fp, rows) =>
        fp -> ((rows.length.toLong, rows.map(_._1).distinct.length.toLong,
          rows.map(_._1).min, rows.length.toLong - 1))
      }
    val got = q("q123_chunk_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(expected.nonEmpty, "fixture should contain duplicate chunks at sf0.001")
    assert(got == expected)
    // dedup must be invisible to singleton chunks: group total == dup chunks
    assert(got.values.map(_._1).sum ==
      chunks.groupBy(_._2).filter(_._2.length >= 2).values.map(_.length.toLong).sum)
  }

  test("q128: df-capped blocking loses nothing it promises to keep, values brute-exact") {
    // brute force = the SAME operator with the shingle-df cap at corpus
    // size (every shingle generates candidates → all pairs sharing ANY
    // shingle, cosine over full tf-idf vectors). The capped report must
    // (1) agree exactly on every pair it emits, and (2) contain EVERY
    // brute pair above τ that shares at least one low-df shingle — the
    // blocking contract (pairs linked only through >cap-df boilerplate
    // shingles are deliberately out of scope, same as q36a's rule).
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val nDocs = Tables.load(spark, dir, "documents").count()
    val capped = q("q128_tfidf_cosine").collect()
    assert(capped.nonEmpty, "fixture must contain tf-idf cosine near-dups")
    val brute = operators.CorpusOps.tfidfCosinePairs(spark, dir, nDocs, 0.9)
      .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    capped.foreach { r =>
      assert(brute(key(r)) == ((r.getLong(2), r.getDouble(3))),
        s"pair ${key(r)}: capped report disagrees with brute cosine")
    }
    // recompute the promise set: brute pairs above τ sharing ≥2 low-df
    // shingles (the operator's blocking floor)
    val sh = operators.TextAnalysis.shingleIndex(spark, dir)
      .select(col("doc_id"), explode(col("ss")).as("sg"))
    val lowSh = sh.join(
      sh.groupBy("sg").agg(count(lit(1)).as("sdf")).filter(col("sdf") <= 64), "sg")
    val promised = lowSh.as("a").join(lowSh.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .agg(count(lit(1)).as("n_blk")).filter(col("n_blk") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedKeys = capped.map(key).toSet
    val owed = brute.keySet.filter(promised)
    assert(owed.subsetOf(cappedKeys),
      s"blocking dropped promised pairs: ${(owed -- cappedKeys).take(3)}")
    // sanity on the similarity itself: bounded and symmetric-free (a<b)
    capped.foreach { r =>
      assert(r.getDouble(3) >= 0.9 && r.getDouble(3) <= 1.0 + 1e-12)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("q133: CDC chunks tile every document exactly") {
    val rows = q("q133_cdc_chunks").collect()
    assert(rows.nonEmpty)
    val nTok = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (d, ch) =>
      val sorted = ch.sortBy(_.getInt(1))
      // contiguous starts: each chunk begins where the previous ended
      var next = 1
      sorted.foreach { r =>
        assert(r.getInt(2) == next, s"doc $d: gap at chunk ${r.getInt(1)}")
        assert(r.getInt(3) >= 1)
        next += r.getInt(3)
      }
      assert(next - 1 == nTok(d), s"doc $d: chunks must cover all tokens")
    }
  }

  test("q133: CDC fingerprints survive a prefix edit that shifts the q96 grid") {
    // The operator's reason to exist: insert ONE token at the front of a
    // document. Fixed-stride chunking (q96) shifts every window — its
    // fingerprints almost all die; CDC boundaries re-synchronize at the
    // first content boundary — every chunk except the first survives.
    import spark.implicits._
    val text = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    def cdcFps(t: String) = operators.CorpusOps.cdcChunkRows(
        Seq((0L, t)).toDF("doc_id", "text"))
      .select("chunk_fp").collect().map(_.getLong(0)).toSet
    def strideFps(t: String) = operators.CorpusOps.chunkRows(
        Seq((0L, t)).toDF("doc_id", "text"))
      .select("chunk_fp").collect().map(_.getLong(0)).toSet
    val orig = cdcFps(text)
    assert(orig.size >= 3, "fixture doc 0 should produce several CDC chunks")
    val edited = "inserted " + text
    val cdcSurvivors = (orig intersect cdcFps(edited)).size
    assert(cdcSurvivors >= orig.size - 1,
      s"CDC must keep every post-resync chunk: $cdcSurvivors of ${orig.size}")
    val sOrig = strideFps(text)
    val strideSurvivors = (sOrig intersect strideFps(edited)).size
    assert(strideSurvivors < cdcSurvivors,
      s"fixed-stride should lose more chunks ($strideSurvivors) than CDC ($cdcSurvivors)")
  }

  test("q135: growth curves are monotone and end at the full vocabularies") {
    val rows = q("q135_vocab_growth").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) >= a.getLong(2) && b.getLong(3) >= a.getLong(3),
        "vocabulary curves must be non-decreasing")
    }
    // the last decile covers every doc → both curves end at the full count
    val fullUni = Tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    val fullSh = operators.TextAnalysis.shingleIndex(spark, dir)
      .select(explode(col("ss")).as("sg"))
      .agg(countDistinct(col("sg"))).collect()(0).getLong(0)
    assert(rows.last.getLong(2) == fullUni)
    assert(rows.last.getLong(3) == fullSh)
    // fixture contrast the operator exists to show: shingles keep growing
    // after the unigram vocabulary closed
    assert(rows.last.getLong(3) > rows.head.getLong(3),
      "shingle vocabulary should still be growing across deciles")
  }

  test("q134: agreement report reconciles with q131's fused rank lists") {
    // n_lex / n_vec / n_common must equal what the fusion output implies:
    // rows with a non-null leg rank per query, and rows where BOTH are
    // non-null — plus the Jaccard arithmetic recomputed.
    val agree = q("q134_leg_agreement").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val fused = q("q131_hybrid_rrf").collect()
    val byQ = fused.groupBy(_.getLong(0))
    assert(agree.keySet == byQ.keySet)
    byQ.foreach { case (qid, rows) =>
      val nLex = rows.count(!_.isNullAt(3)).toLong
      val nVec = rows.count(!_.isNullAt(4)).toLong
      val nCommon = rows.count(r => !r.isNullAt(3) && !r.isNullAt(4)).toLong
      val (al, av, ac, am) = agree(qid)
      assert((al, av, ac) == ((nLex, nVec, nCommon)), s"query $qid count drift")
      assert(am == nCommon * 1000000L / (nLex + nVec - nCommon))
    }
  }

  test("q137: nDCG/MRR reconcile with q131's fused list and its vec-leg grades") {
    // q131's own output carries everything q137 grades: the fused order
    // (rk), and the exact-cosine relevance (grade = 11 − rk_vec for rows
    // where the vec leg ranked the item). Recompute all five metrics from
    // the fused rows with plain Long arithmetic and demand equality.
    val fused = q("q131_hybrid_rrf").collect()
    val report = q("q137_fused_ndcg").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val byQ = fused.groupBy(_.getLong(0))
    assert(report.keySet == byQ.keySet)
    byQ.foreach { case (qid, rows) =>
      def rel(r: org.apache.spark.sql.Row): Long =
        if (r.isNullAt(4)) 0L else 11L - r.getLong(4)
      val top = rows.filter(_.getLong(1) <= 10)
      val dcg = top.map(r => rel(r) * (27720L / (r.getLong(1) + 1))).sum
      val hits = top.count(rel(_) > 0).toLong
      val firstRel = rows.filter(rel(_) > 0).map(_.getLong(1)).sorted.headOption
      val idcg = rows.filter(rel(_) > 0)
        .map(r => rel(r) * (27720L / (r.getLong(4) + 1))).sum
      val (gh, gm, gd, gi, gn) = report(qid)
      assert(gh == hits && gd == dcg && gi == idcg, s"query $qid gain drift")
      assert(gm == firstRel.map(1000000L / _).getOrElse(0L), s"query $qid mrr")
      assert(gn == (if (idcg == 0) 0L else dcg * 1000000L / idcg), s"query $qid ndcg")
    }
  }

  test("q130: BM25 micro-scores equal an independent BigInt recomputation") {
    // Driver-side re-derivation from raw text: same tokenization, query
    // bags re-pruned, and the rational-cleared BM25 recomputed with BigInt
    // arithmetic — a genuinely independent path (no Spark aggregates, no
    // DuckDB) that must agree row-for-row on scores AND ranking.
    val rows = q("q130_bm25_topk").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.replaceAll("\\s+", " ")
        .toLowerCase.split(" ").toSeq).toMap
    val tf = docs.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => ((d, t), BigInt(g.size)) }
    }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (t, g) => t -> BigInt(g.size) }
    val nDocs = BigInt(docs.size)
    val totTok = tf.values.sum
    val dl = docs.map { case (d, ts) => d -> BigInt(ts.size) }
    val expected = (0L until 8L).flatMap { qd =>
      val bag = docs(qd).distinct.map(t => (dfm(t), t)).sortBy(p => (p._1, p._2))
        .take(16).map(_._2).toSet
      val scored = docs.keys.filter(_ != qd).toSeq.flatMap { d =>
        val terms = bag.toSeq.filter(t => tf.contains((d, t)))
        if (terms.isEmpty) None
        else {
          val s = terms.map { t =>
            val idf = (BigInt(1000000) * nDocs) / dfm(t)
            (idf * tf((d, t)) * 44 * totTok) /
              (BigInt(20) * tf((d, t)) * totTok + 6 * totTok + 18 * dl(d) * nDocs)
          }.sum
          Some((d, terms.size.toLong, s))
        }
      }
      scored.sortBy { case (d, _, s) => (-s, d) }.take(10).zipWithIndex
        .map { case ((d, nt, s), i) => (qd, i + 1L, d, nt, s.toLong) }
    }
    val got = rows.map(r =>
      (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected,
      s"BM25 disagreement; first diff: ${got.toSeq.zip(expected).find(p => p._1 != p._2)}")
  }

  test("q163: PRF expansion equals an independent BigInt recomputation and moves rankings") {
    // Full second-round re-derivation from raw text: stage-1 BM25
    // recomputed (the q130 BigInt path), top-PrfDocs feedback docs vote
    // expansion terms by tf·idf_micro (original-bag terms excluded),
    // top-PrfTerms join the bag at RM3 weight 1 vs the originals' 2, and
    // the weighted rescore + top-10 must agree with the operator
    // row-for-row. Also pins that expansion actually MOVES a ranking
    // (some query's top-10 differs from its plain-BM25 top-10) — an
    // expansion leg that silently contributes nothing would still be
    // self-consistent, but not useful.
    val rows = q("q163_prf_expansion").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.replaceAll("\\s+", " ")
        .toLowerCase.split(" ").toSeq).toMap
    val tf = docs.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => ((d, t), BigInt(g.size)) }
    }.toMap
    val dfm = tf.keys.groupBy(_._2).map { case (t, g) => t -> BigInt(g.size) }
    val nDocs = BigInt(docs.size)
    val totTok = tf.values.sum
    val dl = docs.map { case (d, ts) => d -> BigInt(ts.size) }
    def scoreTerm(d: Long, t: String): BigInt = {
      val idf = (BigInt(1000000) * nDocs) / dfm(t)
      (idf * tf((d, t)) * 44 * totTok) /
        (BigInt(20) * tf((d, t)) * totTok + 6 * totTok + 18 * dl(d) * nDocs)
    }
    var moved = false
    val expected = (0L until 8L).flatMap { qd =>
      val bag = docs(qd).distinct.map(t => (dfm(t), t)).sortBy(p => (p._1, p._2))
        .take(16).map(_._2).toSet
      def bm25Top(k: Int): Seq[Long] =
        docs.keys.filter(_ != qd).toSeq.flatMap { d =>
          val terms = bag.toSeq.filter(t => tf.contains((d, t)))
          if (terms.isEmpty) None else Some((d, terms.map(scoreTerm(d, _)).sum))
        }.sortBy { case (d, s) => (-s, d) }.take(k).map(_._1)
      val fb = bm25Top(5)
      val votes = fb.flatMap(d => docs(d).distinct.filterNot(bag)
          .map(t => t -> tf((d, t)) * ((BigInt(1000000) * nDocs) / dfm(t))))
        .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
      val exp = votes.toSeq.sortBy { case (t, w) => (-w, t) }.take(8).map(_._1).toSet
      val weighted = bag.map(_ -> BigInt(2)).toMap ++ exp.map(_ -> BigInt(1)).toMap
      val scored = docs.keys.filter(_ != qd).toSeq.flatMap { d =>
        val terms = weighted.keys.toSeq.filter(t => tf.contains((d, t)))
        if (terms.isEmpty) None
        else Some((d, terms.size.toLong, terms.map(t => weighted(t) * scoreTerm(d, t)).sum))
      }
      val top = scored.sortBy { case (d, _, s) => (-s, d) }.take(10)
      if (top.map(_._1) != bm25Top(10)) moved = true
      top.zipWithIndex.map { case ((d, nt, s), i) => (qd, i + 1L, d, nt, s.toLong) }
    }
    val got = rows.map(r =>
      (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected,
      s"PRF disagreement; first diff: ${got.toSeq.zip(expected).find(p => p._1 != p._2)}")
    assert(moved, "expansion changed no query's top-10 — the PRF leg is inert on this fixture")
  }

  test("q131: fusion equals recomputed RRF over its own two legs, complete and ordered") {
    val fused = q("q131_hybrid_rrf").collect()
    assert(fused.nonEmpty)
    val lex = operators.CorpusOps.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1).toLong).toMap
    val e = Tables.load(spark, dir, "embeddings")
    val vec = operators.Similarity.cosineTopK(
        e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 10, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1).toLong).toMap
    // completeness: fused keys = union of the two legs' keys, nothing else
    val fusedKeys = fused.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(fusedKeys == lex.keySet ++ vec.keySet)
    // arithmetic + leg ranks + ordering per query
    fused.groupBy(_.getLong(0)).foreach { case (_, qr) =>
      var prev = Long.MaxValue
      var prevItem = -1L
      qr.sortBy(_.getLong(1)).foreach { r =>
        val key = (r.getLong(0), r.getLong(2))
        val rl = lex.get(key); val rv = vec.get(key)
        assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == rl)
        assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == rv)
        val rrf = rl.map(k => 1000000L / (60 + k)).getOrElse(0L) +
          rv.map(k => 1000000L / (60 + k)).getOrElse(0L)
        assert(r.getLong(5) == rrf)
        // rank order: rrf DESC with item ASC tiebreak
        assert(rrf < prev || (rrf == prev && r.getLong(2) > prevItem))
        prev = rrf; prevItem = r.getLong(2)
      }
    }
    // the fixture must actually exercise fusion: at least one item present
    // in BOTH legs for some query (else the operator degenerates to concat)
    assert((lex.keySet intersect vec.keySet).nonEmpty,
      "fixture should contain at least one lexically-and-semantically similar pair")
  }

  test("q144: DSIR shortlist equals a BigInt recompute and ranks target-like docs up") {
    // Independent path: raw text → hashed-bucket profiles → smoothed ratio
    // weights → per-doc scores, all in driver-side BigInt (no Spark aggs,
    // no DuckDB). Must agree with the query row for row.
    def hex60(sv: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val B = 4096L
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ").toSeq,
        r.getString(2)))
    val db = docs.map { case (d, ts, _) =>
      d -> ts.groupBy(t => hex60(t) % B).map { case (b, g) => b -> BigInt(g.size) }
    }.toMap
    val raw = db.values.flatten.groupBy(_._1).map { case (b, g) => b -> g.map(_._2).sum }
    val tgtDocs = docs.filter(_._3 == "en").map(_._1).toSet
    val tgt = db.filter(kv => tgtDocs(kv._1)).values.flatten
      .groupBy(_._1).map { case (b, g) => b -> g.map(_._2).sum }
    val nr = raw.values.sum
    val nt = tgt.values.sum
    val w = raw.map { case (b, cr) =>
      b -> ((tgt.getOrElse(b, BigInt(0)) + 1) * (nr + B) * 1000000) / ((cr + 1) * (nt + B))
    }
    val scored = db.toSeq.map { case (d, bs) =>
      val score = bs.map { case (b, c) => c * w(b) }.sum
      val nTok = bs.values.sum
      (d, nTok, score, score / nTok)
    }.sortBy { case (d, _, _, pt) => (-pt, d) }.take(50)
    val got = q("q144_dsir_select").collect()
    assert(got.length == math.min(50, docs.length))
    got.zip(scored).zipWithIndex.foreach { case ((r, (d, nTok, score, pt)), i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getLong(1) == d, s"rank ${i + 1} doc")
      assert(BigInt(r.getLong(2)) == nTok && BigInt(r.getLong(3)) == score &&
        BigInt(r.getLong(4)) == pt, s"rank ${i + 1} score fields")
    }
    // Selection quality: the shortlist must be enriched in target-language
    // docs relative to the corpus base rate (the whole point of DSIR).
    val baseRate = tgtDocs.size.toDouble / docs.length
    val selRate = got.count(r => tgtDocs(r.getLong(1))).toDouble / got.length
    assert(selRate > baseRate,
      s"shortlist en-rate $selRate should beat base rate $baseRate")
  }

  test("q146: LM scores equal a BigInt recompute; common-transition docs rank higher") {
    // Independent path: raw text → per-doc bigram bags → corpus bigram/
    // unigram profiles → smoothed transition micro-probabilities → per-doc
    // mean, all in driver-side BigInt.
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ").toSeq)
    val bgd = docs.map { case (d, ts) =>
      d -> ts.zip(ts.drop(1)).groupBy(identity)
        .map { case (p, g) => p -> BigInt(g.size) }
    }.toMap
    val bg = bgd.values.flatten.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (t, g) => t -> BigInt(g.size) }
    val v = BigInt(uni.size)
    val p = bg.map { case ((a, b), c12) => (a, b) -> ((c12 + 1) * 1000000) / (uni(a) + v) }
    val want = bgd.collect { case (d, bags) if bags.nonEmpty =>
      val nb = bags.values.sum
      d -> (nb, bags.map { case (pair, c) => c * p(pair) }.sum / nb)
    }
    val got = q("q146_lm_score").collect()
      .map(r => r.getLong(0) -> ((BigInt(r.getLong(1)), BigInt(r.getLong(2))))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (d, (nb, lm)) =>
      assert(got(d) == ((nb, lm)), s"doc $d LM score drift")
    }
    // scores are probabilities in micro-units
    assert(got.values.forall { case (_, lm) => lm >= 0 && lm <= 1000000 })
    // discrimination: the doc built from the corpus's most common
    // transitions must outscore the doc built from its rarest ones.
    assert(got.values.map(_._2).toSet.size > 1, "fixture should spread LM scores")
  }

  test("q152: bias report reconciles with q144's shortlist and covers every source") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sel = q("q144_dsir_select").collect().map(_.getLong(1))
    val k = sel.length.toLong
    val n = docs.size.toLong
    val selBySrc = sel.map(docs).groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val baseBySrc = docs.values.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val got = q("q152_selection_bias").collect()
    assert(got.map(_.getString(0)).toSet == baseBySrc.keySet, "every source reports")
    got.foreach { r =>
      val (src, nd, ns) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nd == baseBySrc(src) && ns == selBySrc.getOrElse(src, 0L), s"$src counts")
      val baseMicro = nd * 1000000L / n
      val selMicro = ns * 1000000L / k
      assert(r.getLong(3) == baseMicro && r.getLong(4) == selMicro, s"$src rates")
      assert(r.getLong(5) == selMicro * 1000000L / baseMicro, s"$src bias")
    }
    // the report must actually show skew on a target-conditioned selector
    assert(got.exists(_.getLong(5) > 1000000L) && got.exists(_.getLong(5) < 1000000L),
      "target-conditioned selection should over- and under-select somewhere")
  }

  test("q150: every card metric reconciles with its source operator's own output") {
    val card = q("q150_corpus_card").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.keySet.size == 10)
    val pairs = q("q37_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(card("dup_pair_count") == pairs.length)
    assert(card("dup_doc_count") == pairs.flatMap(p => Seq(p._1, p._2)).distinct.length)
    val exactGroups = q("q35_dedup_exact").collect().map(_.getLong(1))
    assert(card("exact_dup_docs") == exactGroups.filter(_ > 1).sum)
    val pii = q("q59_pii_scrub").collect()
      .count(r => r.getLong(1) + r.getLong(2) > 0)
    assert(card("pii_docs") == pii)
    val docs = Tables.load(spark, dir, "documents")
    assert(card("n_docs") == docs.count())
    assert(card("n_langs") == docs.select("lang").distinct().count())
    assert(card("n_sources") == docs.select("source").distinct().count())
    import graft.functions.TextFunctions._
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      tokens(org.apache.spark.sql.functions.col("text"))).as("t"))
    assert(card("n_tokens") == toks.count())
    assert(card("vocab_unigrams") == toks.distinct().count())
    assert(card("mean_quality_micro") > 0 && card("mean_quality_micro") < 1000000)
  }
}
