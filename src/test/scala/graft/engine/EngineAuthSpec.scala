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

  test("ALL: newline-joined usernames, no trailing newline") {
    val e = mkEngine()
    e.register("alice", "pw"); e.register("bob", "pw"); e.register("carol", "pw")
    val all = e.allUsers("alice", "pw")
    assert(all.succeeded)
    // order unspecified; compare as sorted set (ref: check_file_list sorts)
    assert(all.dataUtf8.split("\n").sorted.toSeq == Seq("alice", "bob", "carol"))
    assert(!all.dataUtf8.endsWith("\n"))
  }

  test("BYE: authenticated shutdown; bad credentials refused") {
    val e = mkEngine()
    e.register("alice", "pw")
    assert(e.bye("alice", "WRONG").msg == ERR_LOGIN)
    assert(e.bye("alice", "pw") == Result(true, OK))
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
