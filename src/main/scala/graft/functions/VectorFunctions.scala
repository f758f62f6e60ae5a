package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector primitives for the similarity-search north-star ops over
  * `embeddings` (64-dim unit-normalized float vectors — cosine ≡ dot).
  *
  * Dot products are computed in QUANTIZED-INTEGER space and rendered as
  * DECIMAL(20,12): each element is floored to a 1e-6 grid (`⌊x·1e6⌋` — one
  * exact IEEE multiply + floor, bit-identical in any engine), products and
  * the sum are exact BIGINT arithmetic, and the final ·1e-12 rescale is an
  * exact decimal multiply. That makes similarity scores bit-identical
  * between Spark and DuckDB at ANY corpus scale, so top-k results are
  * oracle-checkable with no tolerance band.
  *
  * Why not round each double product to 12 decimal places instead (the
  * pre-round-9 definition)? The double→decimal rounding itself is the one
  * step engines disagree on: a product whose exact binary expansion sits at
  * a 1e-12 rounding boundary rounds differently in Spark (exact BigDecimal
  * HALF_UP) vs DuckDB (double-space scaling), observed as a 1-ulp
  * anchor_sim diff at sf1 (~1 element in 1e8). Integer quantization removes
  * the boundary entirely; the ≤1e-6 per-element grid error is orders below
  * any τ/k decision margin.
  *
  * Built on `zip_with`/`aggregate` higher-order functions (codegen-adjacent,
  * no UDF boxing — SURVEY.md §7.4 risk 6); for a pure-Spark hot path the
  * same shape with a double accumulator is the fast variant.
  */
object VectorFunctions {

  val SimDec: DecimalType = DecimalType(20, 12)

  /** Element quantization grid shared with the DuckDB oracle SQL
    * (operators/Similarity.simSqlList): ⌊x·1e6⌋ as BIGINT.
    */
  val SimQuantScale = 1e6

  /** Exact decimal dot product of two array<numeric> columns (quantized-
    * integer core — see the object scaladoc for why). |q| < 1e6 per
    * element, so a 64-dim dot sums 64 products < 1e12 each: the BIGINT
    * accumulator and the DECIMAL(20,0) sum are overflow-free by 6 orders.
    */
  def dotDec(a: Column, b: Column): Column = {
    // The quantize-multiply-sum core is the fused native loop
    // [[graft.functions.expressions.QuantDotLong]] since r17 — identical
    // arithmetic and null semantics to the previous
    // `aggregate(zip_with(..., floor(x·1e6)·floor(y·1e6)), 0L, +)` chain
    // (Md5Long60Spec pins it, incl. ScaleMicro == SimQuantScale) without
    // the per-row zipped-array
    // allocation and interpreted lambdas: this scalar runs corpus ×
    // query-batch times in every exact similarity leg (guide §4).
    val sumLong = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.QuantDotLong(
        org.apache.spark.sql.GraftColumnBridge.expression(
          a.cast(ArrayType(DoubleType))),
        org.apache.spark.sql.GraftColumnBridge.expression(
          b.cast(ArrayType(DoubleType)))))
    // ·1e-12 as an exact decimal multiply (scale-12 literal), never a
    // double division: (20,0)×(12,12) → DECIMAL(33,12), lossless, then the
    // final cast to (20,12) only narrows unused integer headroom.
    (sumLong.cast(DecimalType(20, 0)) *
      lit(java.math.BigDecimal.valueOf(1L, 12))).cast(SimDec)
  }

  /** Plain double dot product (fast path; not oracle-exact across engines). */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Driver-side mirror of [[TextFunctions.hex60]]: first 15 hex chars of
    * md5 as a 60-bit Long — used to derive deterministic LSH hyperplanes
    * that DuckDB reproduces from the same seed strings.
    */
  def md5Hex60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Random-hyperplane components as integers in [0, 2000]; the plane value
    * is (k - 1000) / 1000.0. Seeded "hp|&lt;table*planes+plane&gt;|&lt;i&gt;" so both
    * engines regenerate identical planes.
    */
  def hyperplaneInts(tables: Int, planesPerTable: Int, dim: Int): Array[Array[Array[Int]]] =
    Array.tabulate(tables, planesPerTable, dim) { (t, p, i) =>
      (md5Hex60(s"hp|${t * planesPerTable + p}|$i") % 2001L).toInt
    }

  /** Random-projection planes as integers in [−1000, 1000], seeded
    * "rp|&lt;j&gt;|&lt;i&gt;" — a separate family from the SRP bucketing planes
    * ("hp|…"), regenerated identically by both engines. Used for
    * Johnson–Lindenstrauss-style dimensionality reduction ahead of an
    * exact rerank ([[graft.operators.Similarity]] q76).
    */
  def projectionInts(outDim: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(outDim, dim) { (j, i) =>
      (md5Hex60(s"rp|$j|$i") % 2001L).toInt - 1000
    }

  /** Embedding scaled to exact 64-bit integers: floor(x·1e9). The float→
    * double product and floor are single IEEE ops, identical in any engine
    * — the basis for order-independent, overflow-free integer plane dots
    * (|term| ≤ 1e12, 64 terms ≤ 6.4e13 ≪ 2^63).
    */
  def intScaled(emb: Column): Column =
    transform(emb, x => floor(x.cast(DoubleType) * 1e9).cast(LongType))

  /** Signed-random-projection bucket id for one LSH table: bit p set iff
    * the integer dot with plane_p (coefficients k−1000 ∈ [−1000,1000]) is
    * ≥ 0. Pure long arithmetic — bit-exact across engines without decimal
    * folds — through the native [[graft.functions.expressions.LongVecDot]]
    * expression (register via graft.plans.GraftExtensions first).
    */
  def srpBucket(embInt: Column, planes: Array[Array[Int]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val coef = typedLit(plane.map(k => (k - 1000).toLong).toSeq)
      when(call_function("vec_dot_long", embInt, coef) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
}
