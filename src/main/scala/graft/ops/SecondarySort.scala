package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.functions.col

/** Secondary sort: process each key's rows IN TIME ORDER without
  * buffering a group in memory — `repartition(key)` +
  * `sortWithinPartitions(key, time)` gives every partition its keys'
  * rows contiguously and ordered, so a single streaming pass over the
  * partition iterator can segment groups with O(1) state.
  *
  * This is the 100 TB replacement for "collect the group and sort it"
  * (what `flatMapGroupsWithState`-style handlers do per group): a user
  * with 10⁹ events never materializes as an array; memory is bounded by
  * whatever the callback itself retains.
  */
object SecondarySort {

  /** Run `f(key, orderedRows)` over each key's time-ordered rows.
    * `f` must consume the iterator lazily to keep O(1) memory. */
  def processSortedGroups[T: Encoder](df: DataFrame, keyCol: String,
                                      orderCol: String)(
      f: (Long, Iterator[Row]) => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { rows =>
        // group contiguous runs of the same key without materializing them
        val rowsB = rows.buffered
        new Iterator[Iterator[T]] {
          override def hasNext: Boolean = rowsB.hasNext
          override def next(): Iterator[T] = {
            val key = rowsB.head.getAs[Long](keyCol)
            val group = new Iterator[Row] {
              override def hasNext: Boolean =
                rowsB.hasNext && rowsB.head.getAs[Long](keyCol) == key
              override def next(): Row = rowsB.next()
            }
            val out = f(key, group)
            // ensure the group is fully consumed so the outer iterator
            // advances to the next key even if f stopped early
            new Iterator[T] {
              override def hasNext: Boolean = {
                val h = out.hasNext
                if (!h) while (group.hasNext) group.next()
                h
              }
              override def next(): T = out.next()
            }
          }
        }.flatten
      }
  }
}
