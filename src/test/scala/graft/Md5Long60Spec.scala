package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, LongType}

/** The r17 fused hot-path expressions: bit-equivalence with the Column
  * chains they replaced (hex60's conv∘substring∘md5, dotDec's
  * aggregate∘zip_with quantized dot) and null/edge semantics. These pins
  * are what lets the optimization claim "same query results, cheaper
  * per-row work" — the oracle SQL on the DuckDB side is unchanged.
  */
class Md5Long60Spec extends SparkSpec {

  test("md5_long60 == conv(substring(md5(x),1,15),16,10) on fixture-like text") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq("", "a", "hello world", "naïve — ünïcödé ❄", "x" * 10000,
        "the quick brown fox", "34|shingle|text", "7|")
      .toDF("t")
    val out = df.select(
        graft.functions.TextFunctions.hex60(col("t")).as("native"),
        conv(substring(md5(col("t").cast(BinaryType)), 1, 15), 16, 10)
          .cast(LongType).as("chain"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"hex60 mismatch: native=${r.getLong(0)} chain=${r.getLong(1)}"))
    // null propagates
    val n = Seq(Option.empty[String]).toDF("t")
      .select(graft.functions.TextFunctions.hex60(col("t"))).collect()
    assert(n.head.isNullAt(0))
    // driver-side mirror agrees
    assert(graft.functions.VectorFunctions.md5Hex60("mh_a|1") ==
      df.sparkSession.range(1)
        .select(graft.functions.TextFunctions.hex60(lit("mh_a|1")))
        .collect().head.getLong(0))
  }

  test("vec_qdot_long == aggregate(zip_with(floor-quantized products)) incl. null semantics") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(0.25f, -0.5f, 0.125f), Seq(0.5f, 0.5f, -1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(0.123456789f, -0.000001f), Seq(-0.987654321f, 0.000001f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
    def q(c: org.apache.spark.sql.Column) =
      floor(c.cast(DoubleType) * lit(1e6)).cast(LongType)
    val out = df.select(
        call_function("vec_qdot_long",
          col("a").cast(ArrayType(DoubleType)),
          col("b").cast(ArrayType(DoubleType))).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => q(x) * q(y)),
          lit(0L), (acc, x) => acc + x).as("chain"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1),
        s"qdot mismatch: native=${r.getLong(0)} chain=${r.getLong(1)}")
    }
    // length mismatch → null in both formulations (zip_with pads with null)
    val mism = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(
        call_function("vec_qdot_long", col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => q(x) * q(y)),
          lit(0L), (acc, x) => acc + x).as("chain"))
      .collect().head
    assert(mism.isNullAt(0) && mism.isNullAt(1))
    // dotDec end-to-end: decimal render identical to the pre-r17 chain
    val dec = Seq((Seq(0.25f, -0.5f), Seq(0.5f, 0.25f))).toDF("a", "b")
      .select(graft.functions.VectorFunctions.dotDec(col("a"), col("b")).as("d"),
        (aggregate(zip_with(col("a"), col("b"), (x, y) => q(x) * q(y)),
          lit(0L), (acc, x) => acc + x).cast(org.apache.spark.sql.types.DecimalType(20, 0)) *
          lit(java.math.BigDecimal.valueOf(1L, 12)))
          .cast(graft.functions.VectorFunctions.SimDec).as("chain"))
      .collect().head
    assert(dec.getDecimal(0) == dec.getDecimal(1))
    // r18 (ADVICE): the expression's grid and the declared oracle-shared
    // grid are two constants — pin them together so a drift in either is
    // a test failure, not a silent oracle divergence.
    assert(graft.functions.expressions.QuantDotLong.ScaleMicro ==
      graft.functions.VectorFunctions.SimQuantScale)
  }
}
