package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bucket index of a STRING value against a sorted boundary array: the
  * count of boundaries ≤ value (an upper-bound binary search), so N
  * boundaries induce N+1 buckets 0..N.
  *
  * This is the per-row half of sampled range-ranking (the RangePartitioner
  * posture): a bounded driver sample picks the boundaries, and every row's
  * rank ordinal is then a log₂(N) probe — the piece that lets the
  * warehouse Z-order clustering rank an UNBOUNDED dimension (e.g. a city
  * column with millions of distinct values) without ever collecting the
  * full dimension to the driver.
  *
  * Why an expression and not a UDF: it runs once per row in the write
  * path's sort-key projection; a Scala UDF would box every name and break
  * the WholeStageCodegen span around the interleave's bitwise expressions.
  * The generated code inlines the binary-search loop against a shared
  * boundary array in the codegen references — no per-row allocation, no
  * virtual calls.
  *
  * Boundaries must be sorted ascending (enforced at construction); with
  * distinct boundaries the result is order-preserving on the input domain,
  * which is what the Morton interleave requires of its rank ordinals.
  */
case class SortedBucketIndex(child: Expression, boundaries: Array[String])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "sorted_bucket_index requires at least one boundary")
  require(boundaries.iterator.sliding(2).withPartial(false)
    .forall(p => p.head <= p.last),
    "sorted_bucket_index boundaries must be sorted ascending")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_bucket_index"

  @transient private lazy val bounds: Array[UTF8String] =
    boundaries.map(UTF8String.fromString)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(s) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBounds", bounds,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      |int graft_lo = 0;
      |int graft_hi = $ref.length;
      |while (graft_lo < graft_hi) {
      |  int graft_mid = (graft_lo + graft_hi) >>> 1;
      |  if ($ref[graft_mid].compareTo($v) <= 0) graft_lo = graft_mid + 1;
      |  else graft_hi = graft_mid;
      |}
      |${ev.value} = graft_lo;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedBucketIndex =
    copy(child = newChild)

  // Array equality is reference identity on case classes — compare the
  // boundary payload by value so canonicalization/CSE work (the
  // BloomMightContainLong posture).
  override def equals(other: Any): Boolean = other match {
    case b: SortedBucketIndex =>
      child == b.child &&
        java.util.Arrays.equals(boundaries.asInstanceOf[Array[AnyRef]],
          b.boundaries.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.hashCode(boundaries.asInstanceOf[Array[AnyRef]])

  // Keep a potentially-65k-entry boundary array out of plan strings.
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${boundaries.length} boundaries>")
  override def toString: String =
    s"$prettyName($child, <${boundaries.length} boundaries>)"
}
