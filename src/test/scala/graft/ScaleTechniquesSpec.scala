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
