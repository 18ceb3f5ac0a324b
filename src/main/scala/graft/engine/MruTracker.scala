package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Most-recently-used top-k key cache (ref: p4/server/my_mru.cc:12-97).
  *
  * The live cache is a bounded deque (size = topSize, most-recent-first,
  * deduplicated) — O(top-k) driver state, scale-independent. A monotonic
  * touch sequence is kept alongside so the same contract can be answered as
  * a Spark ranking query (`topKQuery`) over a touch log, which is the shape
  * that distributes (SURVEY §2.5: KVT = GROUP BY key ORDER BY max(seq) DESC
  * LIMIT n).
  */
final class MruTracker(topSize: Int) {
  private val deque = mutable.ArrayDeque.empty[String]
  private val touchLog = mutable.ArrayBuffer.empty[(String, Long)]
  private var seq = 0L

  /** Touch: dedup, push-front, evict back at capacity
    * (ref: p4/server/my_mru.cc:31-48). */
  def insert(key: String): Unit = synchronized {
    seq += 1
    touchLog += ((key, seq))
    deque.removeAll(_ == key)
    deque.prepend(key)
    while (deque.size > topSize) deque.removeLast()
  }

  /** Drop a key (KVD path; ref: p4/server/my_mru.cc:54-66). */
  def remove(key: String): Unit = synchronized {
    deque.removeAll(_ == key)
    touchLog.filterInPlace(_._1 != key)
  }

  /** Newline-joined, most-recent-first — ORDER IS CONTRACTUAL
    * (ref: p4/server/my_mru.cc:82-96; p5/scripts/p4.py:100-101). */
  def get(): String = synchronized(deque.mkString("\n"))

  def isEmpty: Boolean = synchronized(deque.isEmpty)

  def clear(): Unit = synchronized { deque.clear(); touchLog.clear() }

  /** The distributed formulation of KVT over the touch log: recency ranking
    * with `max(seq)`, deterministic total order. Must agree with `get()`. */
  def topKQuery(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val log = synchronized(touchLog.toSeq).toDF("key", "seq")
    log.groupBy($"key").agg(max($"seq").as("last_touch"))
      .orderBy($"last_touch".desc)
      .limit(topSize)
  }
}
