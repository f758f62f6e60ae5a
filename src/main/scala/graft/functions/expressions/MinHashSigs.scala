package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k minhash signature values of one shingle-hash array in a single
  * pass: `sig[j] = min_i ((a[j] · (h[i] mod p) + b[j]) mod p)`.
  *
  * Justified per the SURVEY.md §4 built-ins-first rule exactly like
  * [[LongVecDot]]: the higher-order formulation (`transform(ss, _ % p)`
  * then k × `array_min(transform(...))`) allocates k+1 intermediate
  * arrays and evaluates ~2k interpreted lambdas per element on every
  * document — the hottest loop of the MinHash pipeline. This compiles to
  * one tight primitive nest inside WholeStageCodegen. Long math is
  * bit-exact across engines (a < p = 2³¹−1, h mod p < 2³¹ ⇒ products
  * < 2⁶², no overflow), so the DuckDB oracle reproduces identical
  * signatures from the same affine family.
  *
  * Arguments: (shingle hashes array&lt;long&gt;, a coefficients, b offsets,
  * p). Coefficient arrays are literals in practice; elements must be
  * non-null, and mismatched a/b lengths raise a clear error in both eval
  * paths (the function is SQL-registered, so callers are unvetted).
  * An EMPTY hash array yields null (a doc too short to shingle
  * has no signature), matching the `min(...)` = NULL the SQL oracle
  * produces for zero rows.
  */
case class MinHashSigs(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override def nullable: Boolean = true // empty input array → null signature

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) && arr(third.dataType) &&
      fourth.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, array<bigint>, bigint), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(h: Any, a: Any, b: Any, p: Any): Any = {
    val hs = h.asInstanceOf[ArrayData]
    val as = a.asInstanceOf[ArrayData]
    val bs = b.asInstanceOf[ArrayData]
    val prime = p.asInstanceOf[Long]
    val n = hs.numElements()
    if (n == 0) return null
    val k = as.numElements()
    if (bs.numElements() != k)
      throw new IllegalArgumentException(
        s"$prettyName: coefficient arrays must have equal length, " +
          s"got a=$k b=${bs.numElements()}")
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % prime
      var j = 0
      while (j < k) {
        val v = (as.getLong(j) * hm + bs.getLong(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, a, b, p) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $h.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $k = $a.numElements();
         |  if ($b.numElements() != $k) {
         |    throw new IllegalArgumentException(
         |      "minhash_sigs: coefficient arrays must have equal length, got a=" +
         |        $k + " b=" + $b.numElements());
         |  }
         |  final long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $hm = $h.getLong($i) % $p;
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($a.getLong($j) * $hm + $b.getLong($j)) % $p;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): MinHashSigs =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
