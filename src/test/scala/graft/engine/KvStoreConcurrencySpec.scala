package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Race coverage for the concurrent point-op path (the analog of the
  * reference's grading_p2_races concern): per-key atomicity of
  * insert/upsert/remove and scan exclusivity. */
class KvStoreConcurrencySpec extends AnyFunSuite with SparkSpec {

  test("concurrent insert on the same key: exactly one winner") {
    val kv = new KvStore(spark)
    val threads = 8
    val rounds = 200
    val pool = Executors.newFixedThreadPool(threads)
    try {
      (0 until rounds).foreach { r =>
        val key = s"k$r"
        val start = new CountDownLatch(1)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val done = new CountDownLatch(threads)
        (0 until threads).foreach { t =>
          pool.execute(() => {
            start.await()
            if (kv.insert(key, s"t$t".getBytes)) wins.incrementAndGet()
            done.countDown()
          })
        }
        start.countDown()
        assert(done.await(30, TimeUnit.SECONDS))
        assert(wins.get() == 1, s"round $r: ${wins.get()} winners")
      }
    } finally pool.shutdownNow()
  }

  test("concurrent upsert: exactly one thread observes the insert") {
    val kv = new KvStore(spark)
    val threads = 8
    val pool = Executors.newFixedThreadPool(threads)
    try {
      (0 until 100).foreach { r =>
        val key = s"u$r"
        val start = new CountDownLatch(1)
        val inserts = new java.util.concurrent.atomic.AtomicInteger(0)
        val done = new CountDownLatch(threads)
        (0 until threads).foreach { t =>
          pool.execute(() => {
            start.await()
            if (kv.upsert(key, s"t$t".getBytes)) inserts.incrementAndGet()
            done.countDown()
          })
        }
        start.countDown()
        assert(done.await(30, TimeUnit.SECONDS))
        assert(inserts.get() == 1)
        assert(kv.exists(key))
      }
    } finally pool.shutdownNow()
  }

  test("concurrent doWith increments never lose an update (atomic RMW)") {
    val kv = new KvStore(spark)
    val threads = 8
    val incrementsPerThread = 500
    kv.insert("ctr", "0".getBytes)
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    try {
      (0 until threads).foreach { _ =>
        pool.execute(() => {
          start.await()
          (0 until incrementsPerThread).foreach { _ =>
            kv.doWith("ctr",
              v => (new String(v, "UTF-8").toInt + 1).toString.getBytes)
          }
          done.countDown()
        })
      }
      start.countDown()
      assert(done.await(60, TimeUnit.SECONDS))
      // a non-atomic get+upsert would lose increments under contention
      val v = new String(kv.get("ctr").get, "UTF-8").toInt
      assert(v == threads * incrementsPerThread,
        s"lost ${threads * incrementsPerThread - v} increments")
    } finally pool.shutdownNow()
  }

  test("interleaved mixed ops keep the table consistent with a serial replay") {
    val kv = new KvStore(spark)
    val threads = 4
    val opsPerThread = 2000
    val keys = 64
    val pool = Executors.newFixedThreadPool(threads)
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { t =>
      pool.execute(() => {
        val r = new scala.util.Random(t)
        (0 until opsPerThread).foreach { _ =>
          val k = s"k${r.nextInt(keys)}"
          r.nextInt(3) match {
            case 0 => kv.insert(k, "a".getBytes)
            case 1 => kv.upsert(k, "b".getBytes)
            case 2 => kv.remove(k)
          }
        }
        done.countDown()
      })
    }
    assert(done.await(120, TimeUnit.SECONDS))
    pool.shutdown()
    // invariant: every present key has a live value; get/exists agree; the
    // distributed view equals the point-read state
    val viewKeys = kv.view.collect().map(_.key).toSet
    (0 until keys).foreach { i =>
      val k = s"k$i"
      assert(kv.exists(k) == viewKeys.contains(k),
        s"$k: exists=${kv.exists(k)} view=${viewKeys.contains(k)}")
      assert(kv.exists(k) == kv.get(k).isDefined)
    }
  }

  test("doWith increments interleaved with SAV compactions lose nothing") {
    // doWith PRE-FETCHES the snapshot value outside the CHM bin lock; its
    // consistency argument is that the snapshot is frozen while the store's
    // read lock is held (save takes the write lock). This drives the exact
    // interleaving that argument must survive: counters cycling between
    // delta and snapshot (each save folds the delta in, so post-save the
    // key is ONLY in the snapshot and the prefetch path is the one taken)
    // while saves run concurrently.
    val dir = java.nio.file.Files.createTempDirectory("graft-dowith-sav-")
    val kv = new KvStore(spark, Some(dir))
    val threads = 4
    // 50 per thread, not more: every delta→snapshot crossing costs a Spark
    // point-lookup job and every save a full snapshot write — 200
    // increments already cross the boundary dozens of times, and a larger
    // count just times the machine, not the race
    val incrementsPerThread = 50
    kv.insert("ctr", "0".getBytes)
    kv.save() // ensure the key starts snapshot-resident
    val pool = Executors.newFixedThreadPool(threads + 1)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    val saving = new java.util.concurrent.atomic.AtomicBoolean(true)
    try {
      (0 until threads).foreach { _ =>
        pool.execute(() => {
          start.await()
          (0 until incrementsPerThread).foreach { _ =>
            kv.doWith("ctr",
              v => (new String(v, "UTF-8").toInt + 1).toString.getBytes)
          }
          done.countDown()
        })
      }
      pool.execute(() => {
        start.await()
        while (saving.get()) { kv.save(); Thread.sleep(5) }
      })
      start.countDown()
      // generous bound: progress can degrade to ~one increment per thread
      // per save cycle when the RW lock hands off writer-first, and a save
      // is a full Spark snapshot write on a possibly-loaded machine
      assert(done.await(300, TimeUnit.SECONDS))
      saving.set(false)
      val v = new String(kv.get("ctr").get, "UTF-8").toInt
      assert(v == threads * incrementsPerThread,
        s"lost ${threads * incrementsPerThread - v} increments across saves")
    } finally { saving.set(false); pool.shutdownNow() }
  }
}
