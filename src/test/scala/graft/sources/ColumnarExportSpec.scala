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
}
