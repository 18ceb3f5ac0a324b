package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Ad-hoc timing harness for a subset of registered queries (dev tool). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash_lsh", "dedup_minhash_verified", "embedding_neardup_lsh")
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    for (n <- names; pass <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"TIMING $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
