package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The quantized-integer dot core of `VectorFunctions.dotDec` as one fused
  * loop: `Σ_i ⌊a_i·10⁶⌋ · ⌊b_i·10⁶⌋` over two array&lt;double&gt; columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) -> floor(x·1e6)::long *
  * floor(y·1e6)::long), 0L, +)` — which allocates the zipped intermediate
  * array and walks two interpreted lambdas per element — with a single
  * primitive loop (guide §4). This is the inner scalar of every exact
  * similarity leg: corpus × query-batch rows per recall report, 64
  * multiplies each.
  *
  * Bit-equivalence with the chain it replaces: Spark's `floor(double)`
  * is `math.floor(x).toLong`, identical to the generated
  * `(long) java.lang.Math.floor(x * 1.0E6)`; products and the sum are the
  * same exact long arithmetic (|⌊x·10⁶⌋| ≤ 2³¹ for unit-normalized
  * embeddings — products < 2⁶², no overflow, same as the chain).
  * Null semantics replicated exactly: `zip_with` pads the shorter array
  * with nulls and `acc + null` poisons the fold, so the chain returns null
  * iff the lengths differ or any element is null — this expression returns
  * null in exactly those cases (and 0 for two empty arrays, as the fold's
  * `lit(0L)` seed does). Md5Long60Spec pins expression == chain, and pins
  * [[QuantDotLong.ScaleMicro]] == VectorFunctions.SimQuantScale (the
  * declared single source of the grid shared with the DuckDB oracle).
  */
object QuantDotLong {
  /** The quantization grid — MUST equal VectorFunctions.SimQuantScale
    * (spec-pinned): a drift here would silently diverge dotDec from the
    * oracle SQL's grid.
    */
  val ScaleMicro: Double = 1e6
}

case class QuantDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_qdot_long"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0
    var s = 0L
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += math.floor(x.getDouble(i) * QuantDotLong.ScaleMicro).toLong *
        math.floor(y.getDouble(i) * QuantDotLong.ScaleMicro).toLong
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      val scale = QuantDotLong.ScaleMicro // single source, interpolated below
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += ((long) java.lang.Math.floor($a.getDouble($i) * $scale)) *
         |      ((long) java.lang.Math.floor($b.getDouble($i) * $scale));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDotLong =
    copy(left = newLeft, right = newRight)
}
