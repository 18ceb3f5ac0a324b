package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print the formatted physical plan of registered
  * queries. `runMain graft.Explain <sfDir> [query...]` — no args after
  * the dir dumps every query. Not part of the driver contract; exists so
  * plan reviews (pushdown, join strategy, codegen spans) are one command
  * instead of ad-hoc test edits. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== $n ====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] $n failed: $e") }
      finally SharedFrames.releaseAll()
    }
  }
}
