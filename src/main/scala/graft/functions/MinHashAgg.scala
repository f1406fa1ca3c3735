package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass MinHash signature aggregate: maintains the k permutation
  * minima in one mutable long[] buffer per group.
  *
  * Replaces the 64-separate-`min(pmod(h*a+b, p))`-columns formulation —
  * one aggregate buffer instead of 64 aggregation expressions, one tight
  * update loop per shingle, and an O(k) elementwise-min merge, which is
  * exactly the shape `TypedImperativeAggregate` exists for (SURVEY.md
  * §4.4 candidate #2, promoted after Bench showed the column version as
  * the slowest registry entry).
  *
  * Arithmetic is IDENTICAL to the column version (Long wrap-around
  * multiply-add then floorMod — Spark's non-ANSI `*`/`pmod` semantics),
  * so signatures and LSH candidates are unchanged.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val params = MinHashAgg.params(k)
      var i = 0
      while (i < k) {
        val x = java.lang.Math.floorMod(h * params(i)._1 + params(i)._2,
          MinHashAgg.P)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** 2^61 − 1 (Mersenne prime) — same modulus as the column formulation. */
  val P: Long = 2305843009213693951L

  /** Deterministic permutation constants, shared with any alternative
    * formulation so signatures agree. */
  private val cache = scala.collection.concurrent.TrieMap.empty[Int, Array[(Long, Long)]]
  def params(k: Int): Array[(Long, Long)] = cache.getOrElseUpdate(k, {
    val rnd = new scala.util.Random(42)
    Array.fill(k)((math.abs(rnd.nextLong()) % (P - 1)) + 1 ->
                  math.abs(rnd.nextLong()) % P)
  })

  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column: k-permutation MinHash signature of a long hash
    * column. */
  def minhash_sig(hashCol: Column, k: Int = 64): Column =
    Bridge.column(MinHashAgg(Bridge.expression(hashCol), k)
      .toAggregateExpression())
}
