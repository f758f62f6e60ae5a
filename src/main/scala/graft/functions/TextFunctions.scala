package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text primitives shared by the text-analysis and dedup operators
  * (SURVEY.md §7.2 step 5 north-star ops). Everything here is built from
  * codegen'd Spark built-ins — no UDFs — and every primitive has an exact
  * DuckDB-SQL counterpart so the whole dedup surface stays oracle-checkable:
  *
  *  - normalization / tokenization: `lower∘trim∘collapse-whitespace`;
  *  - word n-gram shingles via `transform(sequence(...))`;
  *  - a deterministic 60-bit hash `hex60` = first 15 hex chars of md5,
  *    identical to DuckDB's `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` —
  *    chosen over xxhash64/murmur because both engines must agree bit-exactly.
  *
  * Scale: all of these are narrow per-row projections (or explode→groupBy
  * pipelines whose shuffles are keyed by doc/shingle), so they parallelize
  * at source granularity on any cluster.
  */
object TextFunctions {

  /** lower + trim + collapse runs of whitespace to single spaces. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokenization of normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word n-gram shingles over a token array (empty when too short).
    *
    * Formulated as iterated `zip_with(acc, slice(tok, k, …), concat)` —
    * NOT `transform(sequence(1, len), i -> element_at(tok, i+k))`: the
    * positional-index formulation is ~14× slower (per-element indexed
    * access in a lambda leaves the array fast path), measured 10 s vs
    * 0.7 s over sf0.1 documents. zip_with pads the shorter side with
    * nulls, so the result is sliced down to the size−(n−1) full shingles.
    * Guarded: Spark's `sequence(1, 0)` counts DOWN; short docs must
    * short-circuit to an empty array.
    */
  def shingles(tok: Column, n: Int = 3): Column = {
    val chained = (2 to n).foldLeft(tok) { (acc, k) =>
      zip_with(acc, slice(tok, lit(k), size(tok)), (a, b) => concat_ws(" ", a, b))
    }
    when(size(tok) >= n, slice(chained, lit(1), size(tok) - lit(n - 1)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Deterministic 60-bit non-negative hash: first 15 hex chars of md5.
    * DuckDB equivalent: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    *
    * Since r17 this is the native [[graft.functions.expressions.Md5Long60]]
    * expression — bit-identical to the previous
    * `conv(substring(md5(x), 1, 15), 16, 10) :: long` chain (the 60-bit
    * value is read off the raw digest instead of hex-encoding, substring-
    * ing, base-converting and re-parsing it; Md5Long60Spec pins the
    * equality) but with zero intermediate string allocations — this is
    * the hottest per-row scalar of the dedup/text family (guide §4).
    */
  def hex60(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.Md5Long60(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast(BinaryType))))

  /** Seeded variant for minhash permutation families: hash of "<seed>|x". */
  def hex60Seeded(seed: Int, c: Column): Column =
    hex60(concat(lit(s"$seed|"), c))

  /** Count of tokens that belong to a fixed marker set. */
  def markerCount(tok: Column, markers: Seq[String]): Column =
    size(filter(tok, t => t.isin(markers.map(m => m: Any): _*)))
}
