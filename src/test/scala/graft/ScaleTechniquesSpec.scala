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
}
