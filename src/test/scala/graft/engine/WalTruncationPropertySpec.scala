package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Crash-consistency property: for EVERY byte-level truncation of a valid
  * WAL (a crash can cut the file anywhere), boot must succeed and the
  * recovered state must equal the fold of an exact PREFIX of the op
  * sequence — the ops whose records survived the cut through their `\t#`
  * marker. No phantom keys, no partially-applied values, no reordering.
  *
  * This is the property the sentinel + `\t#` marker format exists to
  * provide; the fixed-point tests in EngineKvSpec cover single scenarios,
  * this sweeps the whole cut space. (It motivated the version sentinel:
  * without it, a torn first record on a ≤1-record WAL could masquerade as
  * a legacy marker-less record and replay a truncated value.) */
class WalTruncationPropertySpec extends AnyFunSuite with SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")

  test("every byte truncation of the WAL boots to an exact op-prefix state") {
    val dir = Files.createTempDirectory("graft-walcut-")
    val kv = new KvStore(spark, Some(dir))
    // op sequence with overwrites, deletes, and re-inserts so distinct
    // prefixes yield distinct states (prefix mix-ups can't cancel out)
    val ops: Seq[(String, String, Option[String])] = Seq(
      ("PUT", "alpha", Some("1")), ("PUT", "beta", Some("2")),
      ("PUT", "alpha", Some("3")), ("DEL", "beta", None),
      ("PUT", "gamma", Some("44")), ("PUT", "beta", Some("5")),
      ("DEL", "alpha", None), ("PUT", "delta", Some("666")))
    ops.foreach {
      case ("PUT", k, Some(v)) => kv.upsert(k, b(v))
      case ("DEL", k, None) => kv.remove(k)
      case other => fail(s"bad fixture op $other")
    }
    def modelAfter(n: Int): Map[String, String] =
      ops.take(n).foldLeft(Map.empty[String, String]) {
        case (m, ("PUT", k, Some(v))) => m + (k -> v)
        case (m, ("DEL", k, None)) => m - k
        case (m, _) => m
      }
    val wal = Files.readAllBytes(dir.resolve("kv_wal.jsonl"))
    val newlines = wal.zipWithIndex.collect { case (10, i) => i }.toVector

    (0 to wal.length).foreach { cut =>
      val caseDir = Files.createTempDirectory("graft-walcut-case-")
      Files.write(caseDir.resolve("kv_wal.jsonl"), wal.take(cut))
      val recovered = new KvStore(spark, Some(caseDir))
      val state = ops.map(_._2).distinct.flatMap(k =>
        recovered.get(k).map(v => k -> new String(v, "UTF-8"))).toMap
      // a line is APPLIED iff its content through the `\t#` marker (the
      // byte before its newline) survived the cut — a record missing only
      // its trailing newline is byte-complete and must replay. Line 0 is
      // the format sentinel, not a data record.
      val appliedLines = newlines.count(_ <= cut)
      val expected = modelAfter(math.max(0, appliedLines - 1))
      assert(state == expected,
        s"cut=$cut: recovered $state, expected $expected " +
          s"(appliedLines=$appliedLines)")
      deleteDir(caseDir)
    }
    deleteDir(dir)
  }

  test("every byte truncation of the AUTH log boots to an exact op-prefix state") {
    // the auth log is strict-marker from record one (no legacy leniency),
    // so the prefix property must hold with no sentinel involved
    val dir = Files.createTempDirectory("graft-authcut-")
    val auth = new AuthStore(spark, dataDir = Some(dir))
    // REG full-row records interleaved with SET diffs, incl. overwrites
    val ops: Seq[(String, String)] = Seq(
      ("REG", "ann"), ("REG", "bob"), ("SET", "ann=p1"),
      ("SET", "bob=p2"), ("REG", "cid"), ("SET", "ann=p3"))
    ops.foreach {
      case ("REG", u) => assert(auth.addUser(u, "pw").succeeded)
      case ("SET", kv) =>
        val Array(u, c) = kv.split("=")
        assert(auth.setUserData(u, "pw", b(c)).succeeded)
    }
    def modelAfter(n: Int): (Set[String], Map[String, String]) =
      ops.take(n).foldLeft((Set.empty[String], Map.empty[String, String])) {
        case ((us, ps), ("REG", u)) => (us + u, ps)
        case ((us, ps), ("SET", kv)) =>
          val Array(u, c) = kv.split("=")
          (us, ps + (u -> c))
        case (acc, _) => acc
      }
    val log = Files.readAllBytes(dir.resolve("auth_log.jsonl"))
    val newlines = log.zipWithIndex.collect { case (10, i) => i }.toVector

    (0 to log.length).foreach { cut =>
      val caseDir = Files.createTempDirectory("graft-authcut-case-")
      Files.write(caseDir.resolve("auth_log.jsonl"), log.take(cut))
      val rec = new AuthStore(spark, dataDir = Some(caseDir))
      val applied = newlines.count(_ <= cut) // no sentinel line here
      val (users, profiles) = modelAfter(applied)
      ops.collect { case ("REG", u) => u }.foreach { u =>
        assert(rec.auth(u, "pw").succeeded == users.contains(u),
          s"cut=$cut: user $u presence wrong (applied=$applied)")
      }
      users.foreach { u =>
        val got = rec.getUserData(u, "pw", u)
        profiles.get(u) match {
          case Some(c) => assert(got.succeeded &&
            new String(got.data, "UTF-8") == c,
            s"cut=$cut: $u profile ${got.dataUtf8} != $c")
          case None => assert(!got.succeeded,
            s"cut=$cut: $u has phantom profile ${got.dataUtf8}")
        }
      }
      deleteDir(caseDir)
    }
    deleteDir(dir)
  }

  private def deleteDir(p: Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
