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

  def checkAdd(amount: Long): Boolean = synchronized {
    val now = clock()
    events.removeAll { case (_, t) => now - t >= durationSec }
    val inWindow = events.iterator.map(_._1).sum
    if (inWindow + amount > maxAmount) false
    else { events.append((amount, now)); true }
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
  private val table = mutable.HashMap.empty[String, Quotas]

  def register(user: String): Unit = synchronized {
    table.getOrElseUpdate(user,
      new Quotas(upQuota, downQuota, reqQuota, durationSec, clock))
  }

  def of(user: String): Quotas = synchronized {
    table.getOrElseUpdate(user,
      new Quotas(upQuota, downQuota, reqQuota, durationSec, clock))
  }
}
