package graft.plans

import graft.functions.expressions.{FreqItemsMG, LongVecDot, MinHashSigs}
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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
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
      // capacity/outK must be foldable literals — evaluated at plan time
      (children: Seq[Expression]) => FreqItemsMG(children(0),
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
