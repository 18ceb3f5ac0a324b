package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import scala.util.Random

/** Ports the p1 suite's auth-table assertions (ref: p5/scripts/p1.py shape;
  * semantics p3/server/my_storage.cc:75-250). */
class EngineAuthSpec extends AnyFunSuite with SparkSpec {
  import Codes._

  def mkEngine(): Engine =
    new Engine(spark, EngineOptions(admin = "alice", rng = new Random(42)))

  test("REG: new user ok; duplicate is ERR_USER_EXISTS") {
    val e = mkEngine()
    assert(e.register("alice", "pw") == Result(true, OK))
    val dup = e.register("alice", "pw2")
    assert(!dup.succeeded && dup.msg == ERR_USER_EXISTS)
  }

  test("auth: wrong password and unknown user are ERR_LOGIN") {
    val e = mkEngine()
    e.register("alice", "pw")
    assert(e.allUsers("alice", "WRONG").msg == ERR_LOGIN)
    assert(e.allUsers("nobody", "pw").msg == ERR_LOGIN)
    assert(e.allUsers("alice", "pw").succeeded)
  }

  test("SET/GET: profile roundtrip; empty content is ERR_NO_DATA; missing user ERR_NO_USER") {
    val e = mkEngine()
    e.register("alice", "pw"); e.register("bob", "pw")
    // GET before SET: content empty
    assert(e.getProfile("bob", "pw", "alice").msg == ERR_NO_DATA)
    assert(e.setProfile("alice", "pw", "hello profile".getBytes).succeeded)
    // any user may read any profile (ref: protocol.h:170-188)
    val got = e.getProfile("bob", "pw", "alice")
    assert(got.succeeded && got.dataUtf8 == "hello profile")
    assert(e.getProfile("bob", "pw", "chris").msg == ERR_NO_USER)
  }

  test("ALL: '\\n' after EVERY username, including the last (ref impl loop)") {
    val e = mkEngine()
    e.register("alice", "pw"); e.register("bob", "pw"); e.register("carol", "pw")
    val all = e.allUsers("alice", "pw")
    assert(all.succeeded)
    // the reference appends '\n' per visited row (p3/server/my_storage.cc:
    // 209-224), so the payload ends with a newline; order unspecified —
    // compare as sorted set (ref: check_file_list sorts)
    assert(all.dataUtf8.endsWith("\n"))
    assert(all.dataUtf8.split("\n").sorted.toSeq == Seq("alice", "bob", "carol"))
  }

  test("BYE: authenticated shutdown; bad credentials refused; engine refuses ops after") {
    val e = mkEngine()
    e.register("alice", "pw")
    assert(e.bye("alice", "WRONG").msg == ERR_LOGIN)
    assert(!e.isStopped)
    assert(e.bye("alice", "pw") == Result(true, OK))
    // the reference process has exited — every subsequent op fails
    assert(e.isStopped)
    assert(e.kvInsert("alice", "pw", "k", "v".getBytes).msg == ERR_SERVER)
    assert(e.register("dave", "pw").msg == ERR_SERVER)
    assert(e.allUsers("alice", "pw").msg == ERR_SERVER)
    assert(e.bye("alice", "pw").msg == ERR_SERVER)
  }

  test("auth persistence: users + profiles survive an engine restart (ref p3.py:48-52)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-auth-")
    val opts = EngineOptions(admin = "alice", dataDir = Some(dir),
      rng = new Random(42))
    val e1 = new Engine(spark, opts)
    e1.register("alice", "pw"); e1.register("bob", "pw2")
    assert(e1.setProfile("alice", "pw", "alice profile".getBytes).succeeded)
    // restart: fresh engine over the same dataDir replays the auth log
    val e2 = new Engine(spark, opts)
    assert(e2.allUsers("alice", "pw").succeeded, "replayed user must auth")
    assert(e2.getProfile("bob", "pw2", "alice").dataUtf8 == "alice profile")
    assert(e2.allUsers("bob", "pw2").dataUtf8.split("\n").sorted.toSeq ==
      Seq("alice", "bob"))
    // REG of a replayed name still collides
    assert(e2.register("alice", "other").msg == ERR_USER_EXISTS)
    // DIFF after restart persists too
    assert(e2.setProfile("bob", "pw2", "bob profile".getBytes).succeeded)
    val e3 = new Engine(spark, opts)
    assert(e3.getProfile("alice", "pw", "bob").dataUtf8 == "bob profile")
  }

  test("SAV compacts the auth log; state identical after reload (ref my_storage.cc:505-565)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-authsav-")
    val opts = EngineOptions(admin = "alice", dataDir = Some(dir),
      rng = new Random(7))
    val e1 = new Engine(spark, opts)
    e1.register("alice", "pw")
    // many profile rewrites → many DIFF records
    (1 to 10).foreach(i => e1.setProfile("alice", "pw", s"p$i".getBytes))
    val preSav = java.nio.file.Files.size(dir.resolve("auth_log.jsonl"))
    assert(e1.save("alice", "pw").succeeded)
    val postSav = java.nio.file.Files.size(dir.resolve("auth_log.jsonl"))
    assert(postSav < preSav, "compaction must shrink the log")
    val e2 = new Engine(spark, opts)
    assert(e2.getProfile("alice", "pw", "alice").dataUtf8 == "p10")
  }

  test("torn auth log tail: valid prefix replays, tail quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft-authtorn-")
    val opts = EngineOptions(admin = "alice", dataDir = Some(dir),
      rng = new Random(7))
    val e1 = new Engine(spark, opts)
    e1.register("alice", "pw")
    e1.setProfile("alice", "pw", "keep me".getBytes)
    // crash mid-append: a REG record truncated before its hash field
    java.nio.file.Files.writeString(dir.resolve("auth_log.jsonl"),
      "REG\tYm9i", java.nio.file.StandardOpenOption.APPEND)
    val e2 = new Engine(spark, opts)
    assert(e2.getProfile("alice", "pw", "alice").dataUtf8 == "keep me")
    assert(e2.getProfile("alice", "pw", "bob").msg == ERR_NO_USER)
    assert(java.nio.file.Files.exists(dir.resolve("auth_log.jsonl.torn")))
    // log rewritten to the valid prefix: appends after recovery replay clean
    e2.register("carol", "pw3")
    val e3 = new Engine(spark, opts)
    assert(e3.allUsers("carol", "pw3").succeeded)
  }

  test("salted hashing: same password, different users → different hashes") {
    val e = mkEngine()
    e.register("alice", "samepw"); e.register("bob", "samepw")
    val entries = e.auth.view.collect()
    val Array(a, b) = entries.sortBy(_.username)
    assert(!a.passHash.sameElements(b.passHash))
    assert(a.salt.length == 16)
  }
}
