package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import java.nio.file.Files

/** Ports the p2 suite's KV + persistence assertions (ref: p5/scripts/p2.py:28-99)
  * and p3's replay/compaction semantics (logical, our own log format —
  * SURVEY §5 carry-over note). */
class EngineKvSpec extends AnyFunSuite with SparkSpec {
  import Codes._

  def mkEngine(opts: EngineOptions = EngineOptions()): Engine = {
    val e = new Engine(spark, opts)
    e.register("alice", "pw")
    e
  }
  def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("KVI/KVG roundtrip; duplicate insert ERR_KEY; missing key ERR_KEY") {
    val e = mkEngine()
    assert(e.kvInsert("alice", "pw", "k1", b("v1")) == Result(true, OK))
    val got = e.kvGet("alice", "pw", "k1")
    assert(got.succeeded && got.dataUtf8 == "v1")
    assert(e.kvInsert("alice", "pw", "k1", b("other")).msg == ERR_KEY)
    assert(e.kvGet("alice", "pw", "nope").msg == ERR_KEY)
  }

  test("KVU: OK_INSERT then OK_UPDATE; value actually replaced") {
    val e = mkEngine()
    assert(e.kvUpsert("alice", "pw", "k1", b("v1")).msg == OK_INSERT)
    assert(e.kvUpsert("alice", "pw", "k1", b("v2")).msg == OK_UPDATE)
    assert(e.kvGet("alice", "pw", "k1").dataUtf8 == "v2")
  }

  test("KVD: delete then ERR_KEY on re-delete and on get") {
    val e = mkEngine()
    e.kvInsert("alice", "pw", "k1", b("v1"))
    assert(e.kvDelete("alice", "pw", "k1").succeeded)
    assert(e.kvDelete("alice", "pw", "k1").msg == ERR_KEY)
    assert(e.kvGet("alice", "pw", "k1").msg == ERR_KEY)
    // reinsert after delete is a fresh insert
    assert(e.kvInsert("alice", "pw", "k1", b("v2")).succeeded)
    assert(e.kvGet("alice", "pw", "k1").dataUtf8 == "v2")
  }

  test("KVA: sorted key list matches; empty store is ERR_NO_DATA") {
    val e = mkEngine()
    assert(e.kvAll("alice", "pw").msg == ERR_NO_DATA)
    Seq("k1", "k2", "k3").foreach(k => e.kvInsert("alice", "pw", k, b(k)))
    val all = e.kvAll("alice", "pw")
    assert(all.dataUtf8.split("\n").sorted.toSeq == Seq("k1", "k2", "k3"))
    // every key carries a trailing '\n' (ref builds key + '\n' per key)
    assert(all.dataUtf8.endsWith("\n"))
  }

  test("KVA on empty table answers ERR_NO_DATA BEFORE charging any quota (ref :436-439)") {
    val e = new Engine(spark, EngineOptions(reqQuota = 1))
    e.register("alice", "pw")
    // repeated empty-KVA never consumes the single request
    assert(e.kvAll("alice", "pw").msg == ERR_NO_DATA)
    assert(e.kvAll("alice", "pw").msg == ERR_NO_DATA)
    // the one available request still works
    assert(e.kvInsert("alice", "pw", "k1", b("v")).succeeded)
    // now exhausted: non-empty KVA charges and is refused
    assert(e.kvAll("alice", "pw").msg == ERR_QUOTA_REQ)
  }

  test("crash mid-SAV (incomplete next generation): boot drops it, old gen + WAL win") {
    val dir = Files.createTempDirectory("graft-crash-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    (1 to 4).foreach(i => e1.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e1.save("alice", "pw") // generation 1
    e1.kvInsert("alice", "pw", "k5", b("v5")) // lives in the WAL
    // simulate a crash mid-write of generation 2: dir exists, no _SUCCESS
    val g2 = dir.resolve("kv_snapshot.g000002")
    Files.createDirectory(g2)
    Files.writeString(g2.resolve("part-00000.parquet"), "torn garbage")
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k3").dataUtf8 == "v3")
    assert(e2.kvGet("alice", "pw", "k5").dataUtf8 == "v5",
      "WAL record must survive a failed compaction")
    assert(!Files.exists(g2), "incomplete generation must be GC'd at boot")
  }

  test("legacy single-dir snapshot (and its crash-mid-swap state) migrates to generations") {
    val dir = Files.createTempDirectory("graft-legacysnap-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    (1 to 4).foreach(i => e1.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e1.save("alice", "pw")
    // recreate the OLD layout: snapshot lives at bare kv_snapshot/
    Files.move(dir.resolve("kv_snapshot.g000001"), dir.resolve("kv_snapshot"))
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k2").dataUtf8 == "v2")
    assert(!Files.exists(dir.resolve("kv_snapshot")), "legacy dir must migrate")
    // and the legacy crash-mid-swap state: complete .tmp, no main dir
    val e2gen = e2.kv.currentSnapDir.get
    Files.move(e2gen, dir.resolve("kv_snapshot.tmp"))
    assert(Files.exists(dir.resolve("kv_snapshot.tmp").resolve("_SUCCESS")))
    val e3 = mkEngine(opts)
    assert(e3.kvGet("alice", "pw", "k3").dataUtf8 == "v3")
    assert(!Files.exists(dir.resolve("kv_snapshot.tmp")))
  }

  test("torn final WAL record: recovery replays the valid prefix instead of crashing") {
    val dir = Files.createTempDirectory("graft-torn-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    e1.kvInsert("alice", "pw", "k1", b("v1"))
    e1.kvInsert("alice", "pw", "k2", b("v2"))
    // simulate a crash mid-append: record truncated before the value field
    Files.writeString(dir.resolve("kv_wal.jsonl"), "PUT\tazM",
      java.nio.file.StandardOpenOption.APPEND)
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k1").dataUtf8 == "v1")
    assert(e2.kvGet("alice", "pw", "k2").dataUtf8 == "v2")
    assert(e2.kvGet("alice", "pw", "k3").msg == ERR_KEY)
    // the torn tail must be TRUNCATED: a new write after recovery appends a
    // clean record, and a further restart sees all three keys (a merged
    // line would corrupt or drop the acknowledged k3 write)
    assert(e2.kvInsert("alice", "pw", "k3", b("v3")).succeeded)
    val e3 = mkEngine(opts)
    assert(e3.kvGet("alice", "pw", "k3").dataUtf8 == "v3")
    assert(e3.kvAll("alice", "pw").dataUtf8.split("\n").count(_.nonEmpty) == 3)
  }

  test("decodable torn record must NOT replay against the wrong key") {
    val dir = Files.createTempDirectory("graft-torn2-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    e1.kvInsert("alice", "pw", "k3", b("v3"))
    // a DEL of key "k3abc" torn to 'DEL\tazM' would base64-decode to "k3" —
    // without the terminal marker it would tombstone the wrong live key
    Files.writeString(dir.resolve("kv_wal.jsonl"), "DEL\tazM",
      java.nio.file.StandardOpenOption.APPEND)
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k3").dataUtf8 == "v3",
      "torn DEL replayed against the wrong key")
    // and the torn tail is quarantined, not destroyed
    assert(Files.exists(dir.resolve("kv_wal.jsonl.torn")))
  }

  test("legacy marker-less WAL replays instead of being quarantined (upgrade path)") {
    val dir = Files.createTempDirectory("graft-legacy-")
    val enc = java.util.Base64.getEncoder
    def b64(s: String) = enc.encodeToString(s.getBytes("UTF-8"))
    // a WAL written by the pre-marker format
    Files.writeString(dir.resolve("kv_wal.jsonl"),
      s"PUT\t${b64("k1")}\t${b64("v1")}\n" +
        s"PUT\t${b64("k2")}\t${b64("v2")}\n" +
        s"DEL\t${b64("k2")}\n")
    val e = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e.kvGet("alice", "pw", "k1").dataUtf8 == "v1")
    assert(e.kvGet("alice", "pw", "k2").msg == ERR_KEY)
    // nothing quarantined — the legacy log was fully valid
    assert(!Files.exists(dir.resolve("kv_wal.jsonl.torn")))
    // new appends carry the marker and coexist with the legacy prefix
    e.kvInsert("alice", "pw", "k3", b("v3"))
    val e2 = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e2.kvGet("alice", "pw", "k3").dataUtf8 == "v3")
    assert(e2.kvGet("alice", "pw", "k1").dataUtf8 == "v1")
  }

  test("legacy crash mid-delete: complete tmp wins over gutted legacy dir") {
    val dir = Files.createTempDirectory("graft-gut-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    (1 to 4).foreach(i => e1.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e1.save("alice", "pw")
    val gen = dir.resolve("kv_snapshot.g000001")
    val snap = dir.resolve("kv_snapshot")
    val tmp = dir.resolve("kv_snapshot.tmp")
    // recreate the OLD format's worst crash state: complete tmp exists AND
    // the legacy dir was only PARTIALLY deleted (data files missing but dir
    // present). Recursive copy — the snapshot is a partitioned tree.
    import scala.jdk.CollectionConverters._
    Files.walk(gen).iterator().asScala.toList.foreach { f =>
      Files.copy(f, tmp.resolve(gen.relativize(f)),
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    Files.move(gen, snap)
    Files.walk(snap).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(Files.delete) // gut the legacy dir
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k2").dataUtf8 == "v2",
      "complete tmp should win over the gutted legacy snapshot")
  }

  test("pre-save lazy view survives one compaction (generation GC keeps n-1)") {
    val dir = Files.createTempDirectory("graft-genview-")
    val e = mkEngine(EngineOptions(dataDir = Some(dir)))
    (1 to 4).foreach(i => e.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e.save("alice", "pw") // gen 1
    val lazyView = e.kv.view // reads generation-1 files
    e.kvUpsert("alice", "pw", "k1", b("v1b"))
    e.save("alice", "pw") // gen 2; gen 1 must still exist for lazyView
    assert(Files.exists(dir.resolve("kv_snapshot.g000001")))
    assert(lazyView.count() == 4, "pre-save view must stay executable")
    e.save("alice", "pw") // gen 3 GCs gen 1
    assert(!Files.exists(dir.resolve("kv_snapshot.g000001")),
      "generations older than n-1 must be garbage-collected")
    assert(Files.exists(dir.resolve("kv_snapshot.g000002")))
  }

  test("doWith: atomic read-modify-write; absent key is a miss (ref map.h:54)") {
    val dir = Files.createTempDirectory("graft-dowith-")
    val e = mkEngine(EngineOptions(dataDir = Some(dir)))
    e.kvInsert("alice", "pw", "ctr", b("5"))
    // mutate in place through the visitor
    assert(e.kv.doWith("ctr", v => (new String(v, "UTF-8").toInt + 1).toString.getBytes))
    assert(e.kvGet("alice", "pw", "ctr").dataUtf8 == "6")
    // absent and tombstoned keys are misses, not creations
    assert(!e.kv.doWith("nope", identity))
    e.kvDelete("alice", "pw", "ctr")
    assert(!e.kv.doWith("ctr", identity))
    assert(e.kvGet("alice", "pw", "ctr").msg == ERR_KEY)
    // the mutation was WAL-logged: restart preserves doWith's write
    val e2 = mkEngine(EngineOptions(dataDir = Some(dir)))
    e2.kvInsert("alice", "pw", "ctr2", b("1"))
    e2.kv.doWith("ctr2", _ => b("2"))
    val e3 = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e3.kvGet("alice", "pw", "ctr2").dataUtf8 == "2")
    // doWith also reaches values living only in the snapshot
    e3.save("alice", "pw")
    assert(e3.kv.doWith("ctr2", v => (v ++ b("!"))))
    assert(e3.kvGet("alice", "pw", "ctr2").dataUtf8 == "2!")
  }

  test("binary values survive byte-exact") {
    val e = mkEngine()
    val blob = Array.tabulate[Byte](4096)(i => (i * 31 % 251).toByte)
    e.kvInsert("alice", "pw", "bin", blob)
    assert(e.kvGet("alice", "pw", "bin").data.sameElements(blob))
  }

  test("all KV ops require auth") {
    val e = mkEngine()
    assert(e.kvInsert("alice", "bad", "k", b("v")).msg == ERR_LOGIN)
    assert(e.kvGet("alice", "bad", "k").msg == ERR_LOGIN)
    assert(e.kvUpsert("alice", "bad", "k", b("v")).msg == ERR_LOGIN)
    assert(e.kvDelete("alice", "bad", "k").msg == ERR_LOGIN)
    assert(e.kvAll("alice", "bad").msg == ERR_LOGIN)
  }

  test("fresh non-existent dataDir: first boot creates it; ops and restart work") {
    val dir = Files.createTempDirectory("graft-fresh-").resolve("nested/data")
    assert(!Files.exists(dir))
    val e = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e.kvInsert("alice", "pw", "k1", b("v1")).succeeded)
    assert(e.setProfile("alice", "pw", "p".getBytes).succeeded)
    val e2 = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e2.kvGet("alice", "pw", "k1").dataUtf8 == "v1")
    assert(e2.getProfile("alice", "pw", "alice").dataUtf8 == "p")
  }

  test("WAL replay: mutations survive an engine restart (ref p2.py restart-reload)") {
    val dir = Files.createTempDirectory("graft-kv-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    e1.kvInsert("alice", "pw", "k1", b("v1"))
    e1.kvInsert("alice", "pw", "k2", b("v2"))
    e1.kvUpsert("alice", "pw", "k1", b("v1b"))
    e1.kvDelete("alice", "pw", "k2")
    // fresh engine over the same dataDir replays the WAL
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k1").dataUtf8 == "v1b")
    assert(e2.kvGet("alice", "pw", "k2").msg == ERR_KEY)
  }

  test("SAV compaction: snapshot + truncated WAL; state identical after reload") {
    val dir = Files.createTempDirectory("graft-sav-")
    val opts = EngineOptions(dataDir = Some(dir))
    val e1 = mkEngine(opts)
    (1 to 8).foreach(i => e1.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e1.kvDelete("alice", "pw", "k3")
    assert(e1.save("alice", "pw").succeeded)
    // WAL truncated by compaction (ref: format.h:101-103) — down to the
    // version-sentinel header only (no data records)
    val postSav = Files.readAllLines(dir.resolve("kv_wal.jsonl"))
    assert(postSav.size == 1 && postSav.get(0) == KvStore.WalSentinel,
      s"post-SAV WAL should be sentinel-only, got $postSav")
    // post-SAV mutations go to the fresh WAL and replay over the snapshot
    e1.kvUpsert("alice", "pw", "k1", b("v1b"))
    val e2 = mkEngine(opts)
    assert(e2.kvGet("alice", "pw", "k1").dataUtf8 == "v1b")
    assert(e2.kvGet("alice", "pw", "k3").msg == ERR_KEY)
    assert(e2.kvGet("alice", "pw", "k8").dataUtf8 == "v8")
    assert(e2.kvAll("alice", "pw").dataUtf8.split("\n").sorted.length == 7)
  }

  test("bucketed snapshot: point lookup prunes to ONE bucket, not the full scan") {
    val dir = Files.createTempDirectory("graft-bucket-")
    val e = mkEngine(EngineOptions(dataDir = Some(dir),
      reqQuota = 1000000, upQuota = 1L << 30))
    (1 to 256).foreach { i =>
      assert(e.kvInsert("alice", "pw", s"key$i", b(s"v$i")).succeeded)
    }
    e.save("alice", "pw")
    // snapshot is laid out as __bucket=N directories, one per hash bucket
    import scala.jdk.CollectionConverters._
    val bucketDirs = Files.list(e.kv.currentSnapDir.get).iterator().asScala
      .filter(_.getFileName.toString.startsWith("__bucket=")).toSeq
    assert(bucketDirs.size == e.kv.NumBuckets,
      s"expected ${e.kv.NumBuckets} bucket dirs, got ${bucketDirs.size}")
    // the pruned point-lookup plan must read files from exactly one bucket;
    // metrics are per-execution, so materialize THIS df before reading them
    val df = e.kv.snapshotPointDf("key7").get
    assert(df.collect().length == 1)
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val filesPerBucket = bucketDirs.map(d =>
      Files.list(d).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))).max
    assert(scan.metrics("numFiles").value <= filesPerBucket,
      s"point lookup scanned ${scan.metrics("numFiles").value} files " +
        s"(${bucketDirs.size} buckets on disk) — pruning not effective")
    // value still resolves correctly through the pruned path post-restart
    val e2 = mkEngine(EngineOptions(dataDir = Some(dir)))
    assert(e2.kvGet("alice", "pw", "key7").dataUtf8 == "v7")
  }

  test("view folds snapshot + delta with last-writer-wins") {
    val dir = Files.createTempDirectory("graft-view-")
    val e = mkEngine(EngineOptions(dataDir = Some(dir)))
    (1 to 5).foreach(i => e.kvInsert("alice", "pw", s"k$i", b(s"v$i")))
    e.save("alice", "pw")
    e.kvUpsert("alice", "pw", "k2", b("v2new"))
    e.kvDelete("alice", "pw", "k4")
    val rows = e.kv.view.collect().map(r => r.key -> new String(r.value, "UTF-8")).toMap
    assert(rows == Map("k1" -> "v1", "k2" -> "v2new", "k3" -> "v3", "k5" -> "v5"))
  }
}
