package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.mutable

/** Most-recently-used top-k key cache (ref: p4/server/my_mru.cc:12-97).
  *
  * Write path is an append-only, lock-free touch log (atomic seq +
  * ConcurrentLinkedQueue) so hot point ops never contend on a shared
  * monitor; reads fold the log into last-touch state lazily. The fold is
  * provably equivalent to the reference's bounded dedup deque: ranking keys
  * by last-touch seq and taking k reproduces push-front/dedup/evict-back
  * order exactly (an evicted key only reappears via a newer touch, which
  * also wins the ranking), and KVD removal clears the key until its next
  * touch.
  *
  * The same fold IS the distributed formulation (SURVEY §2.5: KVT =
  * GROUP BY key ORDER BY max(seq) DESC LIMIT k) — `topKQuery` answers it
  * as a Spark ranking query over the folded state.
  */
final class MruTracker(topSize: Int) {
  private final case class Ev(key: String, remove: Boolean)

  private val pending = new ConcurrentLinkedQueue[Ev]()
  /** folded state: the reference's bounded dedup deque, most-recent-first */
  private val deque = mutable.ArrayDeque.empty[String]
  /** last-touch seq of keys currently IN the deque (distributed twin).
    * Seq numbers are assigned AT FOLD TIME from queue order — the queue's
    * FIFO order is a valid linearization of the enqueue points, and
    * assigning order in one place removes any window between "take a
    * number" and "publish" that could invert it. */
  private val lastSeq = mutable.HashMap.empty[String, Long]
  private var foldSeq = 0L

  /** Touch (ref: p4/server/my_mru.cc:31-48) — lock-free append. */
  def insert(key: String): Unit = pending.add(Ev(key, remove = false))

  /** Drop a key (KVD path; ref: p4/server/my_mru.cc:54-66). */
  def remove(key: String): Unit = pending.add(Ev(key, remove = true))

  /** Drain + replay pending events in queue order through the exact
    * reference deque semantics: dedup, push-front, evict back at capacity —
    * an evicted key is forgotten until touched again. */
  private def fold(): Unit = {
    var ev = pending.poll()
    while (ev != null) {
      foldSeq += 1
      deque.removeAll(_ == ev.key)
      lastSeq.remove(ev.key)
      if (!ev.remove) {
        deque.prepend(ev.key)
        lastSeq.update(ev.key, foldSeq)
        while (deque.size > topSize)
          lastSeq.remove(deque.removeLast())
      }
      ev = pending.poll()
    }
  }

  /** Newline-joined, most-recent-first — ORDER IS CONTRACTUAL
    * (ref: p4/server/my_mru.cc:82-96; p5/scripts/p4.py:100-101). */
  def get(): String = synchronized { fold(); deque.mkString("\n") }

  def isEmpty: Boolean = synchronized { fold(); deque.isEmpty }

  def clear(): Unit = synchronized { fold(); deque.clear(); lastSeq.clear() }

  /** The distributed twin: recency ranking over the folded touch state as a
    * Spark query (SURVEY §2.5). Agrees with `get()` by construction. */
  def topKQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val state = synchronized { fold(); lastSeq.toSeq }
    state.toDF("key", "last_touch")
      .orderBy($"last_touch".desc)
      .limit(topSize)
  }
}
