package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.5 J6 — the ClickHouse `ASOF JOIN` analog, the
  * one join Spark lacks natively).
  *
  * Implemented as the union-merge formulation, not a range join: tag left
  * and right rows, union, sort within each key by (ts, side) and carry the
  * last right payload forward with `last(..., ignoreNulls)` over a running
  * row frame. One shuffle on the key columns, linear in input size — no
  * per-row range probe and no join explosion, which is what makes it hold
  * at 100 TB (a range-condition join would rescan the right side per left
  * row; this is a single sort-merge pass).
  *
  * Tie semantics match `r.ts <= l.ts`: right rows sort before left rows at
  * equal timestamps. Callers must make the right side unique per
  * (keys, ts) — e.g. pre-aggregate — or the carried payload at duplicate
  * timestamps is nondeterministic.
  */
object AsOf {

  /** For each left row, attach the payload of the latest right row with
    * `right.tsCol <= left.tsCol` within the same key group (null when no
    * such row). Right payload columns come back as a struct column named
    * `matched`, whose first field `__asof_ts` is the matched timestamp.
    */
  def lastOnOrBefore(left: DataFrame, right: DataFrame,
                     keys: Seq[String], tsCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val payload = struct(col(tsCol).as("__asof_ts") +: payloadCols.map(col): _*)
    val r2 = right.select(keys.map(col) :+ col(tsCol) :+ payload.as("__asof_p") :+
      lit(0).as("__asof_side"): _*)
    val payloadType = r2.schema("__asof_p").dataType
    val l2 = left.select(left.columns.map(col) :+
      lit(null).cast(payloadType).as("__asof_p") :+ lit(1).as("__asof_side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("matched", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .drop("__asof_p", "__asof_side")
  }

  /** The forward variant: attach the EARLIEST right row with
    * `right.tsCol >= left.tsCol` (same mechanics mirrored — left rows sort
    * before right at equal timestamps so equality matches, and the first
    * non-null payload is carried backward over a running-following frame).
    */
  def firstOnOrAfter(left: DataFrame, right: DataFrame,
                     keys: Seq[String], tsCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val payload = struct(col(tsCol).as("__asof_ts") +: payloadCols.map(col): _*)
    val r2 = right.select(keys.map(col) :+ col(tsCol) :+ payload.as("__asof_p") :+
      lit(1).as("__asof_side"): _*)
    val payloadType = r2.schema("__asof_p").dataType
    val l2 = left.select(left.columns.map(col) :+
      lit(null).cast(payloadType).as("__asof_p") :+ lit(0).as("__asof_side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("matched", first(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 0)
      .drop("__asof_p", "__asof_side")
  }
}
