package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for every suite (guide: one per suite,
  * lazy). Shared across suites too — sbt runs suites in one JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh-").toString)
      .config("spark.ui.enabled", "false")
      // see Bench.scala: single-JVM harness disables artifact-isolation
      // classloading (loopback stream per generated-class lookup)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = TestSpark.spark

  /** Execute `df`'s OWN QueryExecution (AQE only wraps operators in
    * WholeStageCodegen / finalizes stages as they materialize, and a
    * `.write` would plan a separate execution), then return only the final
    * plan section — AQE's toString appends the unstarred
    * "== Initial Plan ==" after it, which would defeat `*(N)` marker
    * assertions. Shared by every plan-shape/codegen-span spec. */
  def aqeFinalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }
}
