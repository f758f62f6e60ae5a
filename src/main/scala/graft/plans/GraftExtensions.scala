package graft.plans

import graft.functions.expressions.{BloomMightContainLong, FreqItemsMG, LongVecDot, MinHashSigs}
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
      // plan time; anything else gets a clean AnalysisException, not a
      // ClassCast/NPE out of the builder
      (children: Seq[Expression]) => {
        def bad(detail: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              (s"freq_items_mg(item, capacity, k) $detail — capacity and k" +
                " must be foldable integral literals")))
        if (children.length != 3)
          bad(s"expects 3 arguments, got ${children.length}")
        def intArg(pos: Int, name: String): Int = {
          val c = children(pos)
          if (!c.foldable) bad(s"argument '$name' is not foldable")
          c.eval() match {
            case n: java.lang.Integer => n.intValue()
            case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
            case n: java.lang.Short => n.intValue()
            case n: java.lang.Byte => n.intValue()
            case other => bad(s"argument '$name' is ${
              if (other == null) "NULL" else other.getClass.getSimpleName}")
          }
        }
        FreqItemsMG(children(0), intArg(1, "capacity"), intArg(2, "k"))
      }),
    (FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName, "bloom_might_contain_long"),
      // the filter bytes must be a foldable BINARY literal (built
      // driver-side from the dimension key set) — evaluated at plan time
      (children: Seq[Expression]) => {
        def bad(detail: String): Nothing =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              (s"bloom_might_contain_long(key, filter_bytes) $detail —" +
                " filter_bytes must be a foldable BINARY literal")))
        if (children.length != 2)
          bad(s"expects 2 arguments, got ${children.length}")
        if (!children(1).foldable) bad("argument 'filter_bytes' is not foldable")
        children(1).eval() match {
          case b: Array[Byte] => BloomMightContainLong(children(0), b)
          case other => bad(s"argument 'filter_bytes' is ${
            if (other == null) "NULL" else other.getClass.getSimpleName}")
        }
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
