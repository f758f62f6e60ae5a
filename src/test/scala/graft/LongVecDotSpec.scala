package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** The custom Catalyst expression: equivalence with the higher-order
  * formulation, null array handling, prefix-length semantics.
  */
class LongVecDotSpec extends SparkSpec {

  test("vec_dot_long matches aggregate(zip_with(...)) and handles nulls") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),      // 4+10+18 = 32
      (Seq(-2L, 7L), Seq(3L, 3L)),             // -6+21 = 15
      (Seq(1L, 1L, 1L), Seq(10L))              // prefix: 10
    ).toDF("a", "b")
    val out = df.select(
        call_function("vec_dot_long", col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => coalesce(x * y, lit(0L))),
          lit(0L), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(32L, 15L, 10L))
    // higher-order zip_with pads with nulls (coalesced to 0) — same result
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))

    val withNull = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(call_function("vec_dot_long", col("a"), col("b")))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("works via SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot_long(array(2L, 3L), array(10L, 100L)) AS d")
    assert(r.collect().head.getLong(0) == 320L)
  }

  test("minhash_sigs matches the k-fold transform/array_min formulation") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val p = 2147483647L
    val a = Seq(7L, 999999937L, 123456789L)
    val b = Seq(3L, 42L, 2000000000L)
    val df = Seq(
      Seq(123456789012345L, 98765432109876L, 555L),
      Seq(17L),
      Seq.empty[Long]
    ).toDF("ss")
    val native = df.select(call_function("minhash_sigs", col("ss"),
      typedLit(a), typedLit(b), lit(p)).as("sigs")).collect()
    val hof = df.select(array(a.indices.map(j =>
      array_min(transform(col("ss"), h => (h % p * a(j) + b(j)) % p))): _*).as("sigs"))
      .collect()
    // Non-empty rows agree exactly with the higher-order formulation...
    (0 to 1).foreach { i =>
      assert(native(i).getSeq[Long](0) == hof(i).getSeq[Long](0))
    }
    // ...and an empty shingle array yields a null signature (no shingles).
    assert(native(2).isNullAt(0))
  }

  test("minhash_sigs rejects mismatched coefficient arrays with a clear error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(Seq(42L, 7L)).toDF("ss")
    // SQL-registered function, unvetted callers: b shorter than a must be
    // a clear error in both eval paths, never an out-of-bounds read.
    val e = intercept[Exception] {
      df.select(call_function("minhash_sigs", col("ss"),
        typedLit(Seq(1L, 2L, 3L)), typedLit(Seq(9L)), lit(2147483647L))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("equal length")),
      s"unexpected error: $e")
  }
}
