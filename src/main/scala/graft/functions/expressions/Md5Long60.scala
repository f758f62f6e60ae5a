package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The engine's cross-engine 60-bit hash — `hex60` — as ONE native
  * expression: the first 60 bits of the MD5 digest of the input bytes,
  * bit-identical to the Column-chain it replaces
  * (`conv(substring(md5(x), 1, 15), 16, 10) :: long`) and to the DuckDB
  * side (`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`).
  *
  * Why (guide §4, built-ins-first exception): the chain is the hottest
  * per-row scalar of the whole dedup/text family — one call per shingle,
  * per (doc, token), per CDC boundary probe, per substring-dedup anchor
  * position. Per call the chain allocates the 32-char hex string, a
  * 15-char substring, `conv`'s base-conversion output STRING, and parses
  * it back to a long; this expression computes the digest and assembles
  * the 60-bit value from the first 8 raw digest bytes (first 15 hex chars
  * = bytes 0–6 plus the high nibble of byte 7, i.e. the big-endian 64-bit
  * load shifted right by 4) — no intermediate strings at all. Equivalence:
  * MD5 digest bytes are what `md5()` hex-encodes, `conv(_, 16, 10)` parses
  * the 15 nibbles as an unsigned 60-bit integer < 2⁶⁰ (no overflow, no
  * sign), so `(load64_be(digest) >>> 4)` is the same value by
  * construction. Md5Long60Spec pins expression == chain on fixture text
  * and edge cases (empty string, unicode, long inputs).
  *
  * Null semantics match the chain: null input → null. The digest instance
  * is thread-local (MessageDigest is stateful; tasks share nothing).
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Md5Long60.hash60(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Long60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes): big-endian load of digest bytes 0–7,
    * shifted right by 4 — exactly the unsigned value of the first 15 hex
    * chars of the digest's hex encoding.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
