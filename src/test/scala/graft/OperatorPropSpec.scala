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
}
