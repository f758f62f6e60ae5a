package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a NATIVE Spark aggregate
  * (`TypedImperativeAggregate` — the engine's first aggregate-class custom
  * expression, complementing the scalar [[LongVecDot]]/[[MinHashSigs]];
  * ClickHouse ships the equivalent as `topK`, backed by the same
  * SpaceSaving/MG family).
  *
  * State is AT MOST `capacity` (item → counter) pairs per partial
  * aggregate, regardless of input cardinality — the point of the operator
  * at corpus scale: exact per-term top-k (q57/q85) must shuffle the whole
  * (term, count) frame, while this pass carries O(capacity) bytes per
  * partition and merges associatively:
  *
  *  - update: present → +1; room → insert 1; full → decrement ALL counters
  *    by 1, dropping zeros (classic MG step — each decrement "pays" for
  *    the unseen item, giving the count ≥ true − N/(capacity+1) bound);
  *  - merge (Agarwal et al., "Mergeable Summaries"): sum counters for the
  *    key union; if over capacity, subtract the (capacity+1)-th largest
  *    counter from all and drop non-positives — the same error bound
  *    composes, so partial aggregation is sound.
  *
  * Counters are thus LOWER bounds with error ≤ N/(capacity+1); when the
  * true distinct count never exceeds `capacity` no decrement ever fires
  * and every counter is EXACT — the regime the DuckDB oracle checks
  * (fixture vocabulary ≪ capacity), while production capacity stays a
  * small constant against an unbounded vocabulary.
  *
  * eval returns the top `outK` as array&lt;struct&lt;item, cnt&gt;&gt; on the
  * (cnt DESC, item ASC) total order — deterministic output for the
  * hash-compare.
  *
  * This base class holds the machinery SHARED by the unweighted
  * ([[FreqItemsMG]]) and weighted ([[FreqItemsMGWeighted]]) variants —
  * the mergeable-summaries merge, the deterministic top-k eval, and the
  * compact binary buffer codec; subclasses supply only their update step.
  */
abstract class MGAggregateBase
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  def capacity: Int
  def outK: Int

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Cut step shared by merge and the weighted update: subtract the
    * (capacity+1)-th largest counter from all, dropping non-positives.
    */
  protected final def cutToCapacity(a: mutable.HashMap[String, Long]): Unit =
    if (a.size > capacity) {
      val cut = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(a.remove)
    }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    cutToCapacity(a)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toArray.sortBy { case (k, c) => (-c, k) }.take(outK)
    new GenericArrayData(top.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}

/** Unweighted Misra–Gries: each input row is one occurrence. Update is
  * the classic MG step — present → +1; room → insert at 1; full →
  * decrement ALL counters by 1, dropping zeros (see [[MGAggregateBase]]
  * for the shared merge/eval/bounds).
  */
case class FreqItemsMG(child: Expression, capacity: Int, outK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends MGAggregateBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "freq_items_mg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capacity > 0 && outK > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, capacity > 0, outK > 0), got ${child.dataType.sql}")

  override def update(buf: mutable.HashMap[String, Long], row: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        // MG decrement step: all counters pay one for the unseen item.
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsMG =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsMG =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsMG =
    copy(child = newChildren.head)
}

/** Weighted Misra–Gries (ClickHouse `topKWeighted` analog): each row
  * contributes `weight` mass to its item instead of 1. Update is the
  * insert-then-cut formulation (Berinde et al. / mergeable summaries —
  * identical to the merge step with a singleton summary), which keeps
  * the same guarantees under arbitrary non-negative weights: counters
  * are LOWER bounds, error ≤ W/(capacity+1) for total mass W, and EXACT
  * when distinct items ≤ capacity (the oracle regime, q127). Negative or
  * null weights contribute nothing (a weight is a mass, not a delta).
  */
case class FreqItemsMGWeighted(child: Expression, weight: Expression,
    capacity: Int, outK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends MGAggregateBase {

  override def children: Seq[Expression] = Seq(child, weight)
  override def prettyName: String = "freq_items_mg_weighted"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && weight.dataType == LongType &&
        capacity > 0 && outK > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint weight, capacity > 0, outK > 0)," +
        s" got (${child.dataType.sql}, ${weight.dataType.sql})")

  override def update(buf: mutable.HashMap[String, Long], row: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    val w = weight.eval(row)
    if (v == null || w == null) return buf
    val mass = w.asInstanceOf[Long]
    if (mass <= 0L) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.update(item, buf.getOrElse(item, 0L) + mass)
    cutToCapacity(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsMGWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsMGWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsMGWeighted =
    copy(child = newChildren(0), weight = newChildren(1))
}
