package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy hitters (Metwally et al.): a bounded summary of
  * `capacity` counters over an unbounded key stream — THE single-pass
  * answer to "top domains / top tokens over 100 TB" when an exact
  * groupBy's key cardinality would not fit anywhere.
  *
  * Per-counter state is (estimate, error). Invariants maintained by
  * update AND merge (the mergeable-summaries formulation: an item
  * absent from a summary has true count ≤ that summary's minimum
  * counter — absent items charge that minimum on merge):
  *
  *  - `est(x) ≥ true(x)`        (never undercounts)
  *  - `est(x) − err(x) ≤ true(x)` (error is tracked per counter)
  *  - every x with `true(x) > N/capacity` is present in the summary
  *
  * The q_heavy_hitters audit checks exactly these three against the
  * exact counts — run-order can shift the estimates, the guarantees
  * cannot. Eviction and truncation tie-break on (count, key) so a
  * fixed input order gives a fixed summary (spec-pinned). */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def minOf(buf: mutable.HashMap[String, (Long, Long)]): Long =
    if (buf.size < capacity) 0L else buf.valuesIterator.map(_._1).min

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some((est, err)) => buf.update(key, (est + 1, err))
      case None if buf.size < capacity => buf.update(key, (1L, 0L))
      case None =>
        // evict the (count, key)-minimal counter; the newcomer inherits
        // its count as the error bound — the space-saving step
        val victim = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(victim._1)
        buf.update(key, (victim._2._1 + 1, victim._2._1))
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val minA = minOf(a); val minB = minOf(b)
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { k =>
      val (ea, ra) = a.getOrElse(k, (minA, minA))
      val (eb, rb) = b.getOrElse(k, (minB, minB))
      merged.update(k, (ea + eb, ra + rb))
    }
    if (merged.size <= capacity) merged
    else {
      val kept = merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.map {
        case (k, (est, err)) =>
          InternalRow(UTF8String.fromString(k), est, err)
      })

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val items = buf.toSeq.map { case (k, v) =>
      (k.getBytes(StandardCharsets.UTF_8), v)
    }
    val bb = ByteBuffer.allocate(4 + items.map(20 + _._1.length).sum)
    bb.putInt(items.size)
    items.foreach { case (kb, (est, err)) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(est); bb.putLong(err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8),
        (bb.getLong(), bb.getLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column: bounded heavy-hitter summary of a string key
    * column — array of (item, est, err) sorted by estimate. */
  def space_saving(keyCol: Column, capacity: Int = 64): Column =
    Bridge.column(SpaceSavingAgg(Bridge.expression(keyCol), capacity)
      .toAggregateExpression())
}
