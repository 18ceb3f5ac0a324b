package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

/** The ORC export path beyond the DuckDB digest gate: the lang-partitioned
  * layout actually prunes — a per-language read touches ONE lang directory
  * — and the partition column round-trips from directory names. */
class ColumnarExportSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("ORC lang-partitioned export: per-language read prunes to one lang dir") {
    // the operator writes the layout as its side effect
    val digest = JsonlExport.orcRoundtrip(spark, dir).collect()
    val src = graft.Tables.t(spark, dir, "documents")
    assert(digest.length == src.count())

    val out = graft.SessionResources.scratchDir(spark, "orc", dir)
    val langDirs = scala.util.Using.resource(
      Files.list(java.nio.file.Paths.get(out)))(
      _.iterator().asScala.count(_.getFileName.toString.startsWith("lang=")))
    assert(langDirs == 5, s"expected 5 lang partitions, found $langDirs")

    val filtered = spark.read.orc(out).filter(col("lang") === "en")
    val n = filtered.count()
    assert(n == src.filter(col("lang") === "en").count() && n > 0)

    def findScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(findScans)
    }
    val probe = spark.read.orc(out).filter(col("lang") === "en")
      .select(col("doc_id"))
    probe.collect()
    val scan = findScans(probe.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in the ORC read plan"))
    val filesInEn = scala.util.Using.resource(
      Files.walk(java.nio.file.Paths.get(out, "lang=en")))(
      _.iterator().asScala.count(_.getFileName.toString.endsWith(".orc")))
    assert(scan.metrics("numFiles").value <= filesInEn,
      s"scan read ${scan.metrics("numFiles").value} files but lang=en holds " +
        s"only $filesInEn — partition pruning not effective")
  }

  test("CSV export survives hostile content: commas, quotes, newlines, CRLF, leading/trailing spaces") {
    import spark.implicits._
    // the synthetic corpus has none of these characters, so the oracle
    // digest row alone cannot prove the escaping contract — constructed
    // documents must
    val hostile = Seq(
      (1L, "en", "plain text"),
      (2L, "en", "comma, separated, values"),
      (3L, "en", "a \"quoted\" word and \"\"doubled\"\""),
      (4L, "en", "line one\nline two\nline three"),
      (5L, "en", "crlf\r\nline"),
      (6L, "en", "  leading and trailing  "),
      (7L, "en", "all, of: \"it\"\n, together\r\n \"end\""),
      (8L, "en", ""),
      (9L, "en", " "),
      (10L, "en", null.asInstanceOf[String]))
    val df = hostile.toDF("doc_id", "lang", "text")
    val out = graft.SessionResources.scratchDir(spark, "csvhostile", dir)
    df.repartition(2).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      // NULL↔"" losslessness needs the NUL sentinel on BOTH sides —
      // the reader's default nullValue is "" and is compared AFTER
      // unquoting, so quoted-empty regresses to NULL without it
      // (the JsonlExport.csvRoundtrip contract)
      .option("nullValue", "\u0000")
      // writer-side trimming is ON by default — the exact silent
      // mutation this test exists to catch
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    val back = spark.read
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\u0000")
      .csv(out)
      .collect().map(r => r.getLong(0) -> r.getString(2))
      .toMap
    hostile.foreach { case (id, _, text) =>
      // null, "" and " " must stay THREE distinct verdicts: quoted-empty
      // regressing to SQL NULL (or a lone space trimmed into either) is
      // exactly the mutation class this pins
      if (text == null)
        assert(back(id) == null, s"doc $id: NULL text came back '${back(id)}'")
      else {
        assert(back(id) != null, s"doc $id came back NULL (text was ${text.take(30)})")
        assert(back(id) == text,
          s"doc $id mutated through CSV: ${back(id).take(60)} vs ${text.take(60)}")
      }
    }
  }
}
