package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Ports the p4 suite: quota exhaustion orderings, per-user isolation,
  * window reset, MRU exact ordering (ref: p5/scripts/p4.py:31-164). */
class EngineQuotaMruSpec extends AnyFunSuite with SparkSpec {
  import Codes._

  /** Manual clock so window-reset is tested without sleeping. */
  final class FakeClock(var now: Double) { def apply(): Double = now }

  def mkEngine(up: Long = 8192, down: Long = 8192, req: Long = 24,
      dur: Double = 6.0, top: Int = 4): (Engine, FakeClock) = {
    val clk = new FakeClock(1000.0)
    val e = new Engine(spark,
      EngineOptions(upQuota = up, downQuota = down, reqQuota = req,
        quotaDurSec = dur, topSize = top, admin = "alice",
        clock = () => clk()))
    e.register("alice", "pw"); e.register("bob", "pw")
    (e, clk)
  }
  def b(n: Int): Array[Byte] = Array.fill[Byte](n)('x')

  test("request quota: exhaust, then ERR_QUOTA_REQ; per-user isolation; window reset") {
    val (e, clk) = mkEngine(req = 4)
    (1 to 4).foreach(i => assert(e.kvInsert("alice", "pw", s"k$i", b(8)).succeeded))
    assert(e.kvInsert("alice", "pw", "k5", b(8)).msg == ERR_QUOTA_REQ)
    // bob is unaffected (ref p4.py per-user isolation)
    assert(e.kvInsert("bob", "pw", "b1", b(8)).succeeded)
    // after the window passes, alice may go again (ref p4.py window reset)
    clk.now += 6.1
    assert(e.kvInsert("alice", "pw", "k5", b(8)).succeeded)
  }

  test("upload quota: byte budget; ERR_QUOTA_UP; request error outranks upload error") {
    val (e, _) = mkEngine(up = 100, req = 2)
    assert(e.kvInsert("alice", "pw", "k1", b(60)).succeeded)
    // request 2 of 2 still admitted; 60+60 > 100 → upload quota refused
    assert(e.kvInsert("alice", "pw", "k2", b(60)).msg == ERR_QUOTA_UP)
    // third request: both quotas now violated → ERR_QUOTA_REQ wins
    // (ref: p4/server/my_storage.cc:198-205)
    assert(e.kvInsert("alice", "pw", "k3", b(200)).msg == ERR_QUOTA_REQ)
  }

  test("download quota: KVG charges bytes read; ERR_QUOTA_DOWN") {
    val (e, _) = mkEngine(down = 100)
    e.kvInsert("alice", "pw", "k1", b(80))
    assert(e.kvGet("alice", "pw", "k1").succeeded)       // 80 charged
    assert(e.kvGet("alice", "pw", "k1").msg == ERR_QUOTA_DOWN) // 80+80 > 100
  }

  test("download exhaustion: ERR_QUOTA_DOWN, then success after window reset (FIXTURES §5 p4)") {
    val (e, clk) = mkEngine(down = 100, dur = 6.0)
    e.kvInsert("alice", "pw", "k1", b(80))
    assert(e.kvGet("alice", "pw", "k1").succeeded)
    assert(e.kvGet("alice", "pw", "k1").msg == ERR_QUOTA_DOWN)
    clk.now += 6.1
    assert(e.kvGet("alice", "pw", "k1").succeeded)
  }

  test("request exhaustion blocks every charged op, including KVT (FIXTURES §5 p4)") {
    val (e, _) = mkEngine(req = 2)
    e.kvInsert("alice", "pw", "k1", b(4)) // request 1
    e.kvGet("alice", "pw", "k1")          // request 2
    assert(e.kvTop("alice", "pw").msg == ERR_QUOTA_REQ)
    assert(e.kvDelete("alice", "pw", "k1").msg == ERR_QUOTA_REQ)
    assert(e.kvGet("alice", "pw", "k1").msg == ERR_QUOTA_REQ)
  }

  test("failed KVG on missing key still charges the request (ref kv_get order)") {
    val (e, _) = mkEngine(req = 2)
    assert(e.kvGet("alice", "pw", "nope").msg == ERR_KEY)
    assert(e.kvGet("alice", "pw", "nope").msg == ERR_KEY)
    // two failed gets consumed both requests
    assert(e.kvGet("alice", "pw", "nope").msg == ERR_QUOTA_REQ)
  }

  test("KVD charges requests only — uploads/downloads untouched") {
    val (e, _) = mkEngine(up = 10, down = 10, req = 10)
    // upload budget exactly consumed
    e.kvInsert("alice", "pw", "k1", b(10))
    // deletes keep working: no upload charge
    assert(e.kvDelete("alice", "pw", "k1").succeeded)
    assert(e.kvDelete("alice", "pw", "k1").msg == ERR_KEY)
  }

  test("KVT: most-recent-first order is contractual (ref p4.py:100-101)") {
    val (e, _) = mkEngine(top = 2)
    e.kvInsert("alice", "pw", "k1", b(4))
    e.kvInsert("alice", "pw", "k2", b(4))
    e.kvInsert("alice", "pw", "k3", b(4)) // evicts k1 (top=2)
    assert(e.kvTop("alice", "pw").dataUtf8 == "k3\nk2")
    e.kvGet("alice", "pw", "k2") // touch k2 → moves to front
    assert(e.kvTop("alice", "pw").dataUtf8 == "k2\nk3")
    e.kvDelete("alice", "pw", "k2") // KVD removes from MRU
    assert(e.kvTop("alice", "pw").dataUtf8 == "k3")
  }

  test("KVT on empty MRU is ERR_NO_DATA") {
    val (e, _) = mkEngine()
    assert(e.kvTop("alice", "pw").msg == ERR_NO_DATA)
  }

  test("MRU deque agrees with the distributed touch-log ranking query") {
    val (e, _) = mkEngine(top = 3)
    Seq("a", "b", "c", "a", "d", "b").foreach { k =>
      e.kvUpsert("alice", "pw", k, b(4))
    }
    val deque = e.mru.get().split("\n").toSeq
    val query = e.mru.topKQuery(spark).collect().map(_.getString(0)).toSeq
    assert(deque == query)
    assert(deque == Seq("b", "d", "a"))
  }
}
