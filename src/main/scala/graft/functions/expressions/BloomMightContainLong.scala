package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] over a BIGINT key —
  * the scan-side half of a bloom-prefiltered join (q118).
  *
  * Why an expression and not a UDF: the probe runs once per fact row in the
  * scan stage, before any shuffle. A Scala UDF would box every key and break
  * the surrounding WholeStageCodegen span; this compiles to a single virtual
  * call on a shared filter object kept in the codegen references array.
  *
  * The filter bytes arrive as a foldable BINARY literal (built driver-side
  * from the dimension's key set via `df.stat.bloomFilter`, the same
  * dimension-sized driver job class as a broadcast build). Deserialization
  * happens once per executor thread (`@transient lazy val`), not per row.
  *
  * Semantics: NEVER false-negative — a `false` return proves the key is not
  * in the dimension set, so rows it drops are exactly rows an exact semi
  * join would drop. False positives pass through and must be removed by the
  * exact join downstream; the expression alone is a prefilter, not a join.
  *
  * Reference behavior mirrored: the reference pushes dictionary-set
  * prefilters into its storage scan (SURVEY.md §2.4 J1/J4 posture); on
  * Spark the equivalent scan-stage row cut is this probe.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One shared deserialized filter per generated class, referenced from
    // the codegen constants — no per-row deserialization or boxing.
    val ref = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  // Case-class equality over Array[Byte] is reference identity, which
  // would defeat expression canonicalization / common-subexpression reuse
  // for structurally identical probes — compare the payload by value.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  // Keep the (potentially megabyte-scale) filter payload out of plan
  // strings: render as bloom_might_contain_long(key, <N filter bytes>).
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<${bloomBytes.length} filter bytes>")
  override def toString: String =
    s"$prettyName($child, <${bloomBytes.length} filter bytes>)"
}
