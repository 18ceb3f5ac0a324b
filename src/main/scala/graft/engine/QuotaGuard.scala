package graft.engine

import scala.collection.mutable

/** Sliding-window admission counter (ref: p4/server/my_quota_tracker.cc:44-77;
  * spec p4/server/quota_tracker.h:13-21): sum all events younger than
  * `durationSec`; admit iff sum + amount <= max; admitted events join the
  * window; expired events are pruned on check.
  *
  * Quota checks are per-request control flow, not analytics (SURVEY §2.4) —
  * a driver-side deque is the faithful, latency-correct design. The batch
  * twin (windowed `rangeBetween` aggregation over an event table) lives in
  * graft.queries.KvSurface.quotaWindow.
  */
final class QuotaTracker(maxAmount: Long, durationSec: Double,
    clock: () => Double) {
  private val events = mutable.ArrayDeque.empty[(Long, Double)]
  private var windowSum = 0L // running sum: O(1) amortized checks

  def checkAdd(amount: Long): Boolean = synchronized {
    val now = clock()
    // events are appended in clock order; expired ones are at the front
    while (events.nonEmpty && now - events.head._2 >= durationSec)
      windowSum -= events.removeHead()._1
    if (windowSum + amount > maxAmount) false
    else { events.append((amount, now)); windowSum += amount; true }
  }
}

/** Per-user {uploads, downloads, requests} triple
  * (ref: p4/server/quotas.h:6-17), created at REG
  * (ref: p4/server/my_storage.cc:107-117). */
final class Quotas(upQuota: Long, downQuota: Long, reqQuota: Long,
    durationSec: Double, clock: () => Double) {
  val uploads = new QuotaTracker(upQuota, durationSec, clock)
  val downloads = new QuotaTracker(downQuota, durationSec, clock)
  val requests = new QuotaTracker(reqQuota, durationSec, clock)
}

final class QuotaGuard(upQuota: Long, downQuota: Long, reqQuota: Long,
    durationSec: Double, clock: () => Double = () => System.nanoTime() / 1e9) {
  // lock-free lookup: the hot path (every KV op) must not contend on a
  // global monitor
  private val table =
    new java.util.concurrent.ConcurrentHashMap[String, Quotas]()

  def register(user: String): Unit = of(user)

  def of(user: String): Quotas = table.computeIfAbsent(user,
    _ => new Quotas(upQuota, downQuota, reqQuota, durationSec, clock))
}
