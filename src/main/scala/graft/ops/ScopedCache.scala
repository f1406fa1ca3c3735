package graft.ops

import org.apache.spark.sql.DataFrame

/** One-generation registry for operator-internal persisted frames.
  *
  * Several operators persist a shared intermediate (RM3's token
  * stream, the bigram LM's shingle stream) because two or three plan
  * subtrees consume it. The returned DataFrame is lazy, so the
  * operator can't unpersist before its caller's action runs — and
  * MEMORY_AND_DISK blocks that spill to disk are NOT evicted by
  * memory pressure, so repeated calls in a long-lived session
  * accumulate dead spill until session end (the bench only survived
  * via its per-query `catalog.clearCache()`).
  *
  * [[swap]] bounds that to ONE live generation per operator: each
  * call registers its freshly persisted frames under the operator's
  * key and unpersists the PREVIOUS call's. Correctness is unaffected
  * — an unpersisted frame that is re-actioned recomputes its
  * partitions, i.e. worst case equals the uncached behavior.
  */
object ScopedCache {
  private val prev =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  // per-session unique ids, minted here because SparkSession's own
  // sessionUUID is private[sql]: identity-keyed (SparkSession does not
  // override equals) and weakly referenced, so a stopped session's
  // entry is collectable. Unlike hashCode, CANNOT collide across live
  // sessions.
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, String]())

  /** `"<op>@<per-session-uuid>"` — the collision-free key [[swap]]
    * callers use (r15 ADVICE #4: hashCode collides across sessions;
    * two colliding sessions would unpersist each other's live
    * generation — correct via recompute, but a silent cache loss). */
  def sessionKey(op: String, session: AnyRef): String = {
    val id = sessionIds.computeIfAbsent(session,
      _ => java.util.UUID.randomUUID().toString)
    s"$op@$id"
  }

  /** Register this call's persisted `frames` under `key` (unique per
    * operator + session — callers build it via [[sessionKey]], which
    * is collision-free by construction, not `hashCode`, which collides
    * across sessions) and unpersist the previous generation's. Callers must
    * be single-threaded per (operator, session): a concurrent action
    * still consuming the previous generation would recompute (correct,
    * but the cache win is silently lost). */
  def swap(key: String, frames: Seq[DataFrame]): Unit = {
    val old = prev.put(key, frames)
    if (old != null) old.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () } // session already stopped
    }
  }
}
