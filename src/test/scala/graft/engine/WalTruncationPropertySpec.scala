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

  private def deleteDir(p: Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
