package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-key top-k when the key is LOW-CARDINALITY.
  *
  * `Window.partitionBy(key)` parallelizes by key — with a handful of key
  * values (q16: a few event types) the whole corpus funnels through a few
  * tasks at cluster scale. The standard mitigation is salted two-phase
  * top-k:
  *
  *   1. local phase: rank within (key, salt) for a deterministic salt
  *      derived from a unique column, keep ranks ≤ k — every task sees
  *      ~rows/(keys·salts) rows, and at most k·salts rows per key survive;
  *   2. global phase: the real window over the surviving ≤ k·salts rows
  *      per key — exact, because each key's true top-k all survive phase 1
  *      (each is top-k within its own salt bucket a fortiori).
  *
  * Exactness requires a TOTAL order (supply a unique tiebreaker in
  * `order`, e.g. `value desc, event_id asc`), which also makes rank ≡
  * row_number, so callers can emit either. This mirrors what
  * `TakeOrderedAndProject` does for global top-k, generalized per key.
  */
object TopK {

  /** Append rank column `out` (≤ k rows per key) ordered by `order` within
    * each key group; `saltFrom` must be a unique (or near-unique) column.
    */
  def perKeyTopK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
                 saltFrom: Column, out: String = "rk", salts: Int = 32): DataFrame = {
    val salt = pmod(hash(saltFrom), lit(salts))
    val local = Window.partitionBy(keys :+ salt: _*).orderBy(order: _*)
    val global = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
      .drop("__lrn")
      .withColumn(out, rank().over(global))
      .filter(col(out) <= k)
  }
}
