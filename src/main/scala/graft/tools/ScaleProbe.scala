// Scale probe data: sbt "runMain graft.tools.ScaleProbe <srcSfDir> <destDir> <replicas>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds a documents table N× the source SF for the heavy-tail scaling
  * probe (BASELINE.md "sf1 probe"): the source documents are replicated
  * with per-replica REMAPPED tokens (`tok` → `k§tok` — the digits-only
  * replica id before the first `§` makes the map injective across
  * replicas for ANY source vocabulary, unlike a suffix scheme a vocab
  * already containing `_k`-suffixed tokens could alias) and offset
  * doc_ids, so replicas never duplicate each other and every replica
  * carries the source's exact duplication structure — total
  * duplicated-span mass scales linearly with corpus size, the regime a
  * grown crawl sits in. Other tables are not written here; the probe
  * recipe copies them from the source SF unchanged (embedding-joined
  * stages therefore see only the original ids — noted where a probed
  * query uses them). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val replicas = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val cols = docs.columns
    // the replica doc_id offset stride must clear every source id, or
    // colliding ids across replicas would make replicas duplicate each
    // other — silently voiding the probe's linear-duplication-mass
    // premise. Assert loudly instead (ADVICE r14).
    val stride = 100000000L
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxId < stride,
      s"ScaleProbe: max source doc_id $maxId >= replica stride $stride — ids would alias across replicas")
    require(replicas.toLong * stride > 0 &&
        maxId + (replicas.toLong - 1) * stride > 0,
      s"ScaleProbe: $replicas replicas x stride $stride overflows Long")
    val out = (0 until replicas).map { k =>
      // every replica (k = 0 included) gets the prefix, so the images
      // of distinct replicas are disjoint by the digits-before-first-§
      // parse regardless of what characters source tokens contain
      val remapped = docs
        .withColumn("doc_id", col("doc_id") + lit(k * stride))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            x => when(x === "", x).otherwise(concat(lit(s"$k§"), x))),
          " "))
      remapped.select(cols.map(col): _*)
    }.reduce(_ union _)
    out.repartition(32).write.mode("overwrite")
      .parquet(s"$dest/documents.parquet")
    val n = spark.read.parquet(s"$dest/documents.parquet").count()
    println(s"[scaleprobe] wrote $n docs to $dest/documents.parquet")
    spark.stop()
  }
}
