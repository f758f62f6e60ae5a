package graft

/** Quality checks the DuckDB oracle can't express: LSH recall against the
  * exact formulations, on the sf0.001 fixtures.
  */
class DedupSimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("minhash-LSH finds every exact-Jaccard pair at threshold (recall = 1.0 here)") {
    val exact = run("q36_ngram_jaccard").select("a_doc", "b_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("q37_minhash_lsh").select("a_doc", "b_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(lsh.subsetOf(exact), "LSH output is exact-verified, so ⊆ exact")
    assert(lsh == exact, s"recall < 1: missed ${exact -- lsh}")
  }

  test("df-capped Jaccard (cap=16) reproduces the uncapped pairs exactly") {
    import org.apache.spark.sql.functions._
    val dss = operators.TextAnalysis.docShingleSets(Tables.load(spark, dir, "documents"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("jac_raw") >= 0.8)
      .select("a_doc", "b_doc", "n_inter", "n_a", "n_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    val uncapped = pairs(operators.Dedup.pairJaccard(dss))
    val capped = pairs(operators.Dedup.pairJaccardCapped(dss, 16))
    assert(uncapped.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(capped == uncapped,
      s"capped path diverged: missing=${uncapped -- capped} extra=${capped -- uncapped}")
  }

  test("containment (q79 path) finds doc-inside-doc pairs the Jaccard threshold misses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // A 12-token note quoted verbatim inside a 112-token article: every
    // shingle of the note appears in the article, so containment ≈ 1.0 —
    // while jaccard ≈ 10/110 ≈ 0.09, far below any dedup threshold.
    val note = (0 until 12).map(i => s"n$i").mkString(" ")
    val article = ((0 until 50).map(i => s"p$i") ++ (0 until 12).map(i => s"n$i") ++
      (0 until 50).map(i => s"s$i")).mkString(" ")
    val dss = operators.TextAnalysis.docShingleSets(
      Seq((1L, note), (2L, article), (3L, (0 until 30).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text"))
    val contained = operators.Dedup.pairContainmentCapped(dss, 64)
      .filter(col("contain_micro") >= 800000L)
      .select("a_doc", "b_doc").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contained == Set((1L, 2L)),
      s"containment must flag exactly the note-inside-article pair, got $contained")
    val jac = operators.Dedup.pairJaccardCapped(dss, 64)
      .filter(col("jac_raw") >= 0.8).count()
    assert(jac == 0, "jaccard at the same threshold structurally misses the quoted note")
  }

  test("pairJaccard in-row expansion stays cap-bounded; uncapped misuse fails loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // One shared shingle across n docs: the posting list for shingle 42 has
    // df = n, and each doc carries a private shingle so sets differ.
    def dss(n: Int) = (0 until n)
      .map(i => (i.toLong, Seq(42L, 1000L + i))).toDF("doc_id", "ss")
    // df = cap: expansion allowed, exactly cap·(cap−1)/2 pairs in one row.
    val atCap = operators.Dedup.pairJaccard(dss(8), Some(8))
    assert(atCap.count() == 8L * 7 / 2)
    // df = cap+1: the hot posting list is dropped BEFORE pair expansion.
    assert(operators.Dedup.pairJaccard(dss(9), Some(8)).count() == 0)
    // Uncapped beyond UncappedMaxDf: the task must fail with instructions,
    // not expand df²/2 structs toward an OOM.
    val err = intercept[Exception] {
      operators.Dedup.pairJaccard(dss(operators.Dedup.UncappedMaxDf + 1)).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("pairJaccard uncapped")),
      s"expected loud misuse error, got: $err")
  }

  test("ANN returns true top-1 for most queries (recall floor)") {
    val exact = run("q39_cosine_topk").filter("rk = 1").select("q_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = run("q40_ann_lsh").filter("rk = 1").select("q_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, n) => ann.get(q).contains(n) }
    assert(hits >= exact.size / 2,
      s"ANN top-1 recall too low: $hits/${exact.size}")
  }

  test("RP-prefiltered top-k recalls most of the exact top-3 (recall floor)") {
    val exact = run("q39_cosine_topk").filter("rk <= 3").select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rp = run("q76_rp_prefilter_topk").select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = exact.count(rp.contains)
    assert(hits * 2 >= exact.size,
      s"RP-prefilter top-3 recall too low: $hits/${exact.size}")
  }

  test("connectedComponents resolves duplicate chains to one root (transitive)") {
    import spark.implicits._
    // a 7-hop chain (diameter stresses the propagation loop), a pair, and
    // a triangle with a chord — roots must be the component minima.
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L)) ++
      Seq((10L, 11L)) ++ Seq((20L, 21L), (21L, 22L), (20L, 22L)) ++
      Seq((30L, 30L))) // degenerate self-pair: singleton root, not dropped
      .toDF("a_doc", "b_doc")
    def check(roots: Map[Long, Long]): Unit = {
      assert((1L to 8L).forall(roots(_) == 1L), roots.toString)
      assert(roots(10L) == 10L && roots(11L) == 10L)
      assert((20L to 22L).forall(roots(_) == 20L))
      assert(roots(30L) == 30L)
    }
    check(operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    check(operators.Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("semdedup drops are sound: every dropped vec has a true >= tau lower neighbor") {
    import org.apache.spark.sql.functions._
    val tau = new java.math.BigDecimal("0.45")
    // Brute-force ground truth: ALL pairs at cosine >= tau (cell-free).
    val e = Tables.load(spark, dir, "embeddings")
    val ea = e.select(col("vec_id").as("a_vec"), col("embedding").as("a_emb"))
    val eb = e.select(col("vec_id").as("b_vec"), col("embedding").as("b_emb"))
    val truePairs = ea.crossJoin(eb).filter(col("a_vec") < col("b_vec"))
      .withColumn("sim_dec", graft.functions.VectorFunctions.dotDec(col("a_emb"), col("b_emb")))
      .filter(col("sim_dec") >= tau)
      .select("a_vec", "b_vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = run("q68_semdedup").select("vec_id", "kept_anchor")
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    // Soundness: exact-verified, so every (anchor, dropped) is a true pair.
    assert(dropped.subsetOf(truePairs),
      s"unsound drops: ${dropped -- truePairs}")
    // Recall floor on the fixture: same-cell bucketing keeps most true
    // dup-ends detectable (cross-cell pairs are the documented miss).
    val trueDropEnds = truePairs.map(_._2)
    val gotDropEnds = dropped.map(_._2)
    if (trueDropEnds.nonEmpty)
      assert(gotDropEnds.size * 2 >= trueDropEnds.size,
        s"semdedup found ${gotDropEnds.size} of ${trueDropEnds.size} droppable ends")
  }

  test("IVF ANN overlaps brute-force top-3 (smoke floor on the uniform fixture)") {
    // The sf0.001 embeddings are near-uniform (top-1 cosine ≈ 0.35), so
    // 2-of-16-cell probing has INTRINSICALLY modest recall here — measured
    // ~0.35–0.5 top-3 overlap, moving with any centroid change (seeding
    // mod, Lloyd rounds). This is a sanity floor that the probed cells
    // find a real fraction of the true neighbors; the QUALITY gate is the
    // clustered-fixture test below (recall ≥ 0.9 on separable data).
    val exact = run("q39_cosine_topk").filter("rk <= 3").select("q_id", "neighbor_id")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = run("q53_ann_ivf").select("q_id", "neighbor_id")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlap = exact.map { case (q, t) => (t & ivf.getOrElse(q, Set.empty)).size }.sum
    val total = exact.values.map(_.size).sum
    assert(overlap * 3 >= total,
      s"IVF top-3 overlap too low: $overlap/$total (floor = 1/3)")
  }

  test("IVF k-means++ on a clustered fixture: fixed point reached, brute-force recall ≥ 0.9") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Non-uniform fixture: 8 well-separated clusters (orthogonal axes) of
    // 40 deterministic perturbed unit vectors; vec_ids interleaved so
    // vec_id < 8 queries hit one member of EACH cluster.
    val k0 = 8; val per = 40; val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = for (j <- 0 until per; c <- 0 until k0) yield {
      val base = Array.tabulate(dim)(i => if (i == c * 8) 1.0 else 0.0)
      val pert = Array.tabulate(dim)(i =>
        ((graft.functions.VectorFunctions.md5Hex60(s"cl|$c|$j|$i") % 1001L) - 500L) / 5000.0)
      ((j * k0 + c).toLong, unit(base.zip(pert).map { case (a, b) => a + b }).map(_.toFloat).toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val eqf = operators.Ivf.quantize(e)
    val model = operators.Ivf.fit(eqf, k = k0, sampleMod = 2, maxIters = 8)
    assert(model.converged, s"Lloyd hit the cap (${model.iters} iters) without a fixed point")
    val nq = 8; val topk = 5
    val score = graft.functions.VectorFunctions.dotDec _
    val ann = operators.Ivf.annTopK(e, eqf, operators.Ivf.centsDF(spark, model.cents),
        nq, probes = 2, topk, score)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim_dec").desc, col("vec_id").asc)
    val brute = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_dec", score(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topk)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (ann=${ann.size}, brute=${brute.size})")
  }

  test("SRP-bucketed near-dup finds every brute-force pair at τ (sf0.01 fixture)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotDec
    val dir001 = "/root/testdata/sf0.01"
    val e = Tables.load(spark, dir001, "embeddings").select(col("vec_id"), col("embedding"))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", dotDec(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= 0.5)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = SparkEntry.queries("q47_embedding_neardup")(spark, dir001)
      .select("a_vec", "b_vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain a true near-dup pair")
    assert(bucketed == brute,
      s"bucketed recall diverged: missing=${brute -- bucketed} extra=${bucketed -- brute}")
  }

  test("cosine similarities are valid and self-matches excluded") {
    val rows = run("q39_cosine_topk").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim")
      assert(sim <= 1.000001 && sim >= -1.000001)
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("neighbor_id"))
    }
  }

  test("q95: hard negatives never share the anchor's label; ranks dense, sims ordered") {
    import org.apache.spark.sql.functions.col
    val labels = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQ = run("q95_hard_negatives").collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toList == (1 to sorted.length).toList)
      assert(sorted.forall(r => labels(r.getAs[Long]("neighbor_id")) != labels(q)),
        s"anchor $q was served a same-label negative")
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"anchor $q sims unsorted")
    }
  }

  test("q126: the 16-perm sketch estimate stays inside its accuracy band") {
    // the report is oracle-exact; this pins that the SKETCH is GOOD — a
    // broken permutation family (collapsed minima → est 1.0 everywhere, or
    // decorrelated minima → est ~0) blows the band long before it breaks
    // the hash compare. Floors sit far above the measured sf0.01 values
    // (mean |err| 0.032, max 0.111 at jac ≥ 0.8) and far below failure.
    val rows = run("q126_minhash_accuracy").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "fixture should contain verified near-dup pairs")
    rows.foreach { case (jac, est, err) =>
      assert(err == est - jac, "err must be the exact integer difference")
      assert(est >= 0 && est <= 1000000)
    }
    val meanAbs = rows.map(r => math.abs(r._3)).sum.toDouble / rows.length
    assert(meanAbs <= 150000, f"mean |err| $meanAbs%.0f exceeds the 0.15 band")
    assert(rows.map(r => math.abs(r._3)).max <= 400000, "a pair's estimate left the 0.4 band")
  }

  test("q129: cluster-balanced sample — full assignment, exact per-cell quotas, dense ranks") {
    val out = run("q129_cluster_sample").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val corpus = Tables.load(spark, dir, "embeddings").count()
    // the cell sizes are a partition of the corpus (every vector assigned
    // to exactly one cell; empty cells absent by construction)
    val sizes = out.map(r => r._1 -> r._2).toMap
    assert(sizes.values.sum == corpus, s"cell sizes ${sizes.values.sum} != corpus $corpus")
    // balance contract: each cell contributes exactly min(cell_size, k)
    // rows with dense ranks 1..that
    out.groupBy(_._1).foreach { case (cell, rows) =>
      val want = math.min(sizes(cell), 25L)
      assert(rows.length == want, s"cell $cell: ${rows.length} rows, want $want")
      assert(rows.map(_._3).sorted.toSeq == (1L to want), s"cell $cell ranks not dense")
    }
    // sampled ids are distinct corpus members
    val ids = out.map(_._4)
    assert(ids.distinct.length == ids.length)
    // determinism: a second run draws the identical sample (md5 rank, no RNG)
    val again = run("q129_cluster_sample").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("q148: sensitivity rows equal per-tau recounts of q37's pairs and tighten monotonically") {
    val pairs = run("q37_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = run("q148_dedup_sensitivity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(800000L, 850000L, 900000L, 950000L, 1000000L))
    got.foreach { case (tau, nPairs, nDocs, mass) =>
      val surv = pairs.filter(_._3 >= tau)
      assert(nPairs == surv.length, s"tau $tau pair count")
      assert(nDocs == surv.flatMap(p => Seq(p._1, p._2)).distinct.length, s"tau $tau doc count")
      assert(mass == surv.map(_._3).sum, s"tau $tau mass")
    }
    // tightening tau can only shrink every column
    got.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3 && b._4 <= a._4, "not monotone")
    case _ => ()
    }
    assert(got.head._2 > 0, "operating threshold must keep some pairs")
  }

  test("q149: per-dim moments equal a driver recount and cover every dimension") {
    val emb = Tables.load(spark, dir, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0))
    val dims = emb.head.length
    val got = run("q149_embedding_health").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == (1L to dims).toSet)
    (0 until dims).foreach { d =>
      val xs = emb.map(v => math.floor(v(d).toDouble * 1000000).toLong)
      val (n, s, sq, lo, hi) = got(d + 1L)
      assert(n == xs.length && s == xs.sum && sq == xs.map(x => x * x).sum &&
        lo == xs.min && hi == xs.max, s"dim ${d + 1} moment drift")
    }
  }

  test("q151: evidence shingles are genuinely shared, rarest-first, for every q37 pair") {
    import graft.functions.TextFunctions._
    // independent shingle recompute from raw text (hex60 of word 3-grams)
    def hex60(sv: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docSh = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ")
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(g => hex60(g.mkString(" "))).toSet
      }.toMap
    val dfm = docSh.values.flatten.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val pairs = run("q37_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = run("q151_pair_evidence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every pair has evidence; every evidence row is a truly shared shingle
    // with the correct corpus df, ranked rarest-first with the total order
    assert(got.map(t => (t._1, t._2)).toSet == pairs.toSet)
    got.groupBy(t => (t._1, t._2)).foreach { case ((a, b), rows) =>
      val shared = docSh(a) intersect docSh(b)
      val want = shared.toSeq.map(s => (dfm(s), s)).sorted.take(3)
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to want.length), s"pair ($a,$b) ranks")
      sorted.zip(want).foreach { case ((_, _, _, sh, df), (wdf, ws)) =>
        assert(sh == ws && df == wdf, s"pair ($a,$b) evidence drift")
      }
    }
  }

  test("q145: centrality equals a BigInt power iteration over q37's own pair set") {
    // Independent path: take the verified pair set from q37's OUTPUT,
    // run the damped-PageRank integer recurrence driver-side in BigInt,
    // and demand every (deg, pr, is_rep) field matches; cluster roots
    // come from q73's output.
    val pairs = run("q37_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val deg = nbrs.map { case (v, ns) => v -> BigInt(ns.size) }
    val n = BigInt(nbrs.size)
    val mass = BigInt("1000000000000")
    val init = mass / n
    val base = (15 * init) / 100
    var pr = nbrs.keys.map(_ -> init).toMap
    for (_ <- 1 to 5)
      pr = nbrs.map { case (v, ns) =>
        v -> (base + (85 * ns.map(u => pr(u) / deg(u)).sum) / 100)
      }
    val roots = run("q73_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run("q145_dup_centrality").collect()
    assert(got.map(_.getLong(0)).toSet == nbrs.keySet, "node domain")
    got.foreach { r =>
      val (d, root) = (r.getLong(0), r.getLong(1))
      assert(root == roots(d), s"doc $d root")
      assert(BigInt(r.getLong(2)) == deg(d) && BigInt(r.getLong(3)) == pr(d),
        s"doc $d deg/pr")
    }
    // exactly one representative per cluster, and it is the pr-argmax
    val byRoot = got.groupBy(_.getLong(1))
    byRoot.foreach { case (root, rows) =>
      val reps = rows.filter(_.getLong(4) == 1L)
      assert(reps.length == 1, s"root $root rep count")
      val want = rows.map(r => (r.getLong(3), r.getLong(0)))
        .sortBy { case (p, d) => (-p, d) }.head._2
      assert(reps.head.getLong(0) == want, s"root $root rep is not the pr-argmax")
    }
  }

  test("q165 sampled banding sweep agrees with the full-corpus sweep at sf0.1") {
    // The sample-vs-full contract behind the round-17 sampling (r16
    // verdict "What's wrong" #1): the PRODUCTION q165 runs over the
    // deterministic hash sample (mod = n div 1024), and this spec pins
    // that the sampled S-curve supports the SAME banding decisions as
    // the full sweep it replaced. Measured at sf0.1 (5000 docs, 256
    // true pairs vs 1255-doc sample, 13 true pairs):
    //   full recall  [0.641, 0.941, 1.0, 1.0, 1.0]
    //   samp recall  [0.462, 1.000, 1.0, 1.0, 1.0]
    // — both saturate by the q37 production point (4×4), both expose
    // the 16×1 candidate explosion (n_cand/n_true 611× vs 736×).
    val sfDir = "/root/testdata/sf0.1"
    def curve(mod: Long): Seq[(Int, Long, Long, Long, Long)] =
      operators.Dedup.lshBandSweepReport(spark, sfDir, mod).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sortBy(_._1)
    val mod = operators.Dedup.lshSweepSampleMod(spark, sfDir)
    assert(mod > 1, s"sf0.1 must actually sample (mod=$mod)")
    val full = curve(1L)
    val samp = curve(mod)
    assert(full.map(_._1) == samp.map(_._1))
    // the sample is a real reduction with surviving signal
    assert(samp.head._4 > 0, "sampled sweep lost every true pair — sample too thin")
    assert(samp.head._4 < full.head._4, "sample did not reduce the exact denominator")
    // per-band recall agreement: a 13-pair estimate of a ~0.5 recall has
    // binomial σ ≈ 0.14, so the tolerance sits at ~2σ
    full.zip(samp).foreach { case ((b, _, _, _, rf), (_, _, _, _, rs)) =>
      assert(math.abs(rf - rs) <= 280000L,
        s"bands=$b: sampled recall $rs vs full $rf diverge past tolerance")
    }
    // both curves are monotone and saturate by the 4×4 production point
    def recalls(c: Seq[(Int, Long, Long, Long, Long)]) = c.map(_._5)
    Seq(full, samp).foreach { c =>
      assert(recalls(c) == recalls(c).sorted, "banding recall must be monotone in bands")
      assert(c.find(_._1 == 4).get._5 == 1000000L,
        "recall must saturate at the 4x4 production point")
    }
    // both expose the 16×1 diagnostic explosion the report exists to show
    Seq(full, samp).foreach { c =>
      val r16 = c.find(_._1 == 16).get
      assert(r16._2 >= 100 * r16._4,
        s"16x1 candidates ${r16._2} do not dominate true pairs ${r16._4}")
    }
  }
}
