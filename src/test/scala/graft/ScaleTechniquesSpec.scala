package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The scale techniques SCALE.md leans on, executed: salted joins match
  * plain join semantics, and bucketed tables co-locate joins (no shuffle
  * exchange on either side).
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("salted join returns exactly the plain join result") {
    import spark.implicits._
    // Skewed: 90% of left rows share key 1.
    val big = (1 to 200).map(i => (if (i <= 180) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (190L, "cold"), (999L, "unmatched"))
      .toDF("k", "label")

    val plain = big.join(dim, Seq("k")).select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 1L) == 180)
  }

  test("bucketed tables join without shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("broadcastChunks: small query sets never probe dims; chunk math covers the budget") {
    import graft.operators.Sizing
    // dims is by-name: below the no-probe bound it must never be evaluated
    assert(Sizing.broadcastChunks(8, sys.error("dims must not be probed")) == 1)
    assert(Sizing.broadcastChunks(0, sys.error("an empty query set never probes")) == 1)
    // 100k queries × 1536 dims: every chunk fits the default budget
    val chunks = Sizing.broadcastChunks(100000L, 1536)
    assert(chunks > 1)
    assert((100000L * 1536 + chunks - 1) / chunks <= Sizing.MaxQueryBroadcastElems)
  }

  test("chunkSlice spreads structured (all-even) id sets across every slice") {
    import spark.implicits._
    import graft.operators.Sizing
    // Raw `q_id % 2` would put ALL of these in slice 0, re-concentrating
    // the broadcast the chunking just split; the hash slice must not.
    val ids = (0L until 1000L).map(_ * 2).toDF("q_id")
    val counts = ids.groupBy(Sizing.chunkSlice(col("q_id"), 2).as("slice"))
      .count().collect().map(r => r.getLong(1)).toSeq
    assert(counts.length == 2, s"both slices must be populated, got $counts")
    assert(counts.forall(_ > 250), s"hash slices badly skewed: $counts")
  }

  test("chunked query-set broadcast: 1k-dim cosine top-k equals the single-broadcast answer") {
    import spark.implicits._
    import graft.operators.{Similarity, Sizing}
    // A 1k-dim synthetic corpus — the geometry the default budget exists
    // for (the 64-dim fixtures never chunk). Deterministic, no RNG.
    val dims = 1000
    def vec(seed: Int): Seq[Double] =
      (0 until dims).map(j => math.sin(seed * 7919.0 + j * 104729.0))
    val e = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val nq = 12L
    val single = Similarity.cosineTopK(e, e.filter(col("vec_id") < nq), 3, nQueries = nq)
    assert(!single.queryExecution.optimizedPlan.toString.contains("Union"))
    // 3000-element budget: 12 × 1000 dims → 4 hash-sliced chunks
    val chunked = Similarity.cosineTopK(e, e.filter(col("vec_id") < nq), 3, nQueries = nq,
      maxBroadcastElems = 3000)
    assert(chunked.queryExecution.optimizedPlan.toString.contains("Union"),
      "the tiny budget must actually take the chunked path")
    assert(chunked.collect().map(_.toSeq).toSeq == single.collect().map(_.toSeq).toSeq)
  }

  test("chunked rerank: annTopK under a tiny broadcast budget equals the single-broadcast answer") {
    import graft.operators.Ivf
    import graft.functions.VectorFunctions.dotDec
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .repartition(col("vec_id"))
    val eqf = Ivf.quantize(e)
    val model = Ivf.fit(eqf, 4)
    val cents = Ivf.centsDF(spark, model.cents)
    val single = Ivf.annTopK(e, eqf, cents, 8, 2, 3, dotDec)
    // 128-element budget: 8 queries × 64 dims → 4 chunks
    val chunked = Ivf.annTopK(e, eqf, cents, 8, 2, 3, dotDec, maxBroadcastElems = 128)
    assert(chunked.queryExecution.optimizedPlan.toString.contains("Union"),
      "the tiny budget must actually take the chunked path")
    assert(chunked.collect().map(_.toSeq).toSeq == single.collect().map(_.toSeq).toSeq)
  }

  test("chunked rerank: srpAnnTopK under a tiny broadcast budget equals the single-broadcast answer") {
    import graft.operators.Similarity
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bk = Similarity.srpRows(e)
    val single = Similarity.srpAnnTopK(e, bk, 8, 8, 3)
    val chunked = Similarity.srpAnnTopK(e, bk, 8, 8, 3, maxBroadcastElems = 128)
    assert(chunked.queryExecution.optimizedPlan.toString.contains("Union"),
      "the tiny budget must actually take the chunked path")
    assert(chunked.collect().map(_.toSeq).toSeq == single.collect().map(_.toSeq).toSeq)
  }

  test("IVF seeding sample stays target-bounded under the derived mod at 10x scale") {
    import graft.operators.Ivf
    // The driver-side seeding collect must be bounded BY CONSTRUCTION: at
    // any corpus size n, the derived mod keeps the hash sample within
    // [target/2, 2·target) in expectation. 50k ids ≈ 10× the sf0.1
    // embeddings fixture.
    val n = 50000L
    val mod = Ivf.derivedSampleMod(n)
    assert(mod == (n / Ivf.TargetSeedSample).toInt && mod > 1)
    val sampled = spark.range(n)
      .filter(graft.functions.TextFunctions.hex60(
        concat(lit("ivf|"), col("id").cast("string"))) % mod === 0)
      .count()
    assert(sampled <= 2 * Ivf.TargetSeedSample,
      s"sample $sampled exceeds 2x target ${Ivf.TargetSeedSample}")
    assert(sampled >= Ivf.TargetSeedSample / 2,
      s"sample $sampled under half the target — seeding would starve")
    // tiny corpora degrade to mod = 1 (sample = corpus), never mod = 0
    assert(Ivf.derivedSampleMod(10) == 1)
  }
}
