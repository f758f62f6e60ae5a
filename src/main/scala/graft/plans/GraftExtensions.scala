package graft.plans

import graft.functions.expressions.{BloomMightContainLong, FreqItemsMG, FreqItemsMGWeighted, LongVecDot, Md5Long60, MinHashSigs, QuantDotLong, SortedBucketIndex, TermVecDot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Function registration for the engine's custom expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` wires the
  *    functions into every session at startup (the canonical
  *    SparkSessionExtensions path);
  *  - [[GraftExtensions.register]] is the imperative variant the query
  *    library calls idempotently, so the functions also exist in sessions
  *    the driver builds without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => BandedLevenshteinRewrite)
  }
}

object GraftExtensions {

  /** Plan-time argument validation shared by the builders below: raise a
    * clean AnalysisException naming the function signature instead of a
    * ClassCast/NPE/IndexOutOfBounds out of the builder.
    */
  private def bad(signature: String, detail: String, expectation: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"$signature $detail — $expectation"))

  private def requireArity(signature: String, expectation: String,
      children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      bad(signature, s"expects $n arguments, got ${children.length}", expectation)

  /** Evaluate a foldable argument at plan time, classifying the failure. */
  private def foldableArg[A](signature: String, expectation: String,
      children: Seq[Expression], pos: Int, name: String)(
      extract: PartialFunction[Any, A]): A = {
    val c = children(pos)
    if (!c.foldable) bad(signature, s"argument '$name' is not foldable", expectation)
    val v = c.eval()
    extract.lift(v).getOrElse(bad(signature, s"argument '$name' is ${
      if (v == null) "NULL" else v.getClass.getSimpleName}", expectation))
  }

  private val intLike: PartialFunction[Any, Int] = {
    case n: java.lang.Integer => n.intValue()
    case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
    case n: java.lang.Short => n.intValue()
    case n: java.lang.Byte => n.intValue()
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[LongVecDot].getName, "vec_dot_long"),
      (children: Seq[Expression]) => LongVecDot(children(0), children(1))),
    (FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) =>
        MinHashSigs(children(0), children(1), children(2), children(3))),
    (FunctionIdentifier("freq_items_mg"),
      new ExpressionInfo(classOf[FreqItemsMG].getName, "freq_items_mg"),
      // capacity/outK must be foldable integral literals — evaluated at
      // plan time via the shared validators above
      (children: Seq[Expression]) => {
        val sig = "freq_items_mg(item, capacity, k)"
        val expect = "capacity and k must be foldable integral literals"
        requireArity(sig, expect, children, 3)
        FreqItemsMG(children(0),
          foldableArg(sig, expect, children, 1, "capacity")(intLike),
          foldableArg(sig, expect, children, 2, "k")(intLike))
      }),
    (FunctionIdentifier("freq_items_mg_weighted"),
      new ExpressionInfo(classOf[FreqItemsMGWeighted].getName, "freq_items_mg_weighted"),
      (children: Seq[Expression]) => {
        val sig = "freq_items_mg_weighted(item, weight, capacity, k)"
        val expect = "capacity and k must be foldable integral literals"
        requireArity(sig, expect, children, 4)
        FreqItemsMGWeighted(children(0), children(1),
          foldableArg(sig, expect, children, 2, "capacity")(intLike),
          foldableArg(sig, expect, children, 3, "k")(intLike))
      }),
    (FunctionIdentifier("sorted_bucket_index"),
      new ExpressionInfo(classOf[SortedBucketIndex].getName, "sorted_bucket_index"),
      // boundaries must be a foldable ARRAY<STRING> literal (a bounded
      // driver-side sample, the RangePartitioner posture) — plan time
      (children: Seq[Expression]) => {
        val sig = "sorted_bucket_index(value, boundaries)"
        val expect = "boundaries must be a foldable ARRAY<STRING> literal " +
          "of non-null sorted values"
        requireArity(sig, expect, children, 2)
        SortedBucketIndex(children(0),
          foldableArg(sig, expect, children, 1, "boundaries") {
            case a: org.apache.spark.sql.catalyst.util.ArrayData
                if a.toObjectArray(org.apache.spark.sql.types.StringType)
                  .forall(_ != null) =>
              a.toObjectArray(org.apache.spark.sql.types.StringType)
                .map(_.toString)
          })
      }),
    (FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      (children: Seq[Expression]) => {
        requireArity("md5_long60(bytes)", "expects one binary argument", children, 1)
        Md5Long60(children(0))
      }),
    (FunctionIdentifier("vec_qdot_long"),
      new ExpressionInfo(classOf[QuantDotLong].getName, "vec_qdot_long"),
      (children: Seq[Expression]) => {
        requireArity("vec_qdot_long(a, b)", "expects two array<double> arguments",
          children, 2)
        QuantDotLong(children(0), children(1))
      }),
    (FunctionIdentifier("term_vec_dot"),
      new ExpressionInfo(classOf[TermVecDot].getName, "term_vec_dot"),
      (children: Seq[Expression]) => {
        requireArity("term_vec_dot(a_terms, a_ws, b_terms, b_ws)",
          "expects (array<string>, array<bigint>) twice", children, 4)
        TermVecDot(children(0), children(1), children(2), children(3))
      }),
    (FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName, "bloom_might_contain_long"),
      // the filter bytes must be a foldable BINARY literal (built
      // driver-side from the dimension key set) — evaluated at plan time
      (children: Seq[Expression]) => {
        val sig = "bloom_might_contain_long(key, filter_bytes)"
        val expect = "filter_bytes must be a foldable BINARY literal"
        requireArity(sig, expect, children, 2)
        BloomMightContainLong(children(0),
          foldableArg(sig, expect, children, 1, "filter_bytes") {
            case b: Array[Byte] => b
          })
      }))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    // the experimental hook is the imperative counterpart of
    // injectOptimizerRule for sessions built without the extensions config
    if (!spark.experimental.extraOptimizations.contains(BandedLevenshteinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedLevenshteinRewrite
    }
  }
}
