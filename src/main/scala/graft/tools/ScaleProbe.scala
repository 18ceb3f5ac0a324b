// Scale probe data: sbt "runMain graft.tools.ScaleProbe <srcSfDir> <destDir> <replicas> [mode]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds a documents table N× the source SF for the heavy-tail scaling
  * probe (BASELINE.md "sf1 probe"), in one of three modes:
  *
  *  - `dup` (default): the source documents are replicated with
  *    per-replica REMAPPED tokens (`tok` → `k§tok` — the digits-only
  *    replica id before the first `§` makes the map injective across
  *    replicas for ANY source vocabulary, unlike a suffix scheme a vocab
  *    already containing `_k`-suffixed tokens could alias) and offset
  *    doc_ids, so replicas never duplicate each other and every replica
  *    carries the source's exact duplication structure — total
  *    duplicated-span mass scales linearly with corpus size, the regime
  *    a grown crawl sits in.
  *  - `nodup`: tokens are remapped `tok` → `<doc_id>§tok` with the
  *    replica-offset (globally unique) doc_id, giving every document a
  *    private vocabulary: no cross-document duplication survives AT
  *    TOKEN GRANULARITY (character-shingle queries still see shared
  *    digit prefixes across ids, so this mode only isolates
  *    TOKEN-shingled dedup — dedup_prefix_filter, not the char-trigram
  *    minhash/simhash family). Isolates such a query's compute-bound
  *    cost (tokenize, count, elect, near-empty candidate join) from its
  *    output-bound cost — on the `dup` corpus both the data AND the
  *    result set grow with the replica count.
  *  - `down`: like `dup` but replicas k ≥ 1 take doc_id − k·stride
  *    (NEGATIVE id ranges, injective, all strictly below any source
  *    id), so every added replica sits BELOW [[graft.operators.Dedup
  *    .IncrementalCut]]: the incremental faces' DELTA stays exactly the
  *    source's while the corpus behind it grows N× — the fixed-batch,
  *    growing-history regime their per-batch-cost claim is about.
  *
  * Other tables are not written here; the probe recipe copies them from
  * the source SF unchanged (embedding-joined stages therefore see only
  * the original ids — noted where a probed query uses them). */
object ScaleProbe {
  /** Replica doc_id offset stride; must clear every source id (asserted
    * in [[replicate]]) or colliding ids across replicas would make
    * replicas duplicate each other — silently voiding the probe's
    * linear-duplication-mass premise (ADVICE r14). */
  final val Stride = 100000000L

  /** The N× replication as a frame-in/frame-out function (main's body,
    * factored for the spec): see the object scaladoc for the three
    * modes' semantics. */
  def replicate(docs: org.apache.spark.sql.DataFrame, replicas: Int,
      mode: String): org.apache.spark.sql.DataFrame = {
    require(Set("dup", "nodup", "down")(mode),
      s"ScaleProbe: unknown mode '$mode' (dup | nodup | down)")
    require(replicas >= 1, s"ScaleProbe: need at least 1 replica, got $replicas")
    val cols = docs.columns
    // `down` needs the same clearance below the MINIMUM source id
    val idsRow = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    require(!idsRow.isNullAt(0),
      "ScaleProbe: source documents frame is empty — nothing to replicate")
    val (minId, maxId) = (idsRow.getLong(0), idsRow.getLong(1))
    require(maxId < Stride,
      s"ScaleProbe: max source doc_id $maxId >= replica stride $Stride — ids would alias across replicas")
    require(minId >= 0,
      s"ScaleProbe: negative source doc_id $minId — the replica offset ranges assume non-negative sources")
    // no Long-overflow guard needed: replicas is an Int, so the largest
    // offset magnitude is < 2^31 · 10^8 < 2^62
    (0 until replicas).map { k =>
      // every replica (k = 0 included) gets the dup/down prefix, so the
      // images of distinct replicas are disjoint by the
      // digits-before-first-§ parse regardless of what characters
      // source tokens contain; nodup keys on the offset doc_id, which
      // is globally unique by the stride assertion
      val offset = if (mode == "down") -k * Stride else k * Stride
      val withId = docs.withColumn("doc_id", col("doc_id") + lit(offset))
      val remapped = mode match {
        case "nodup" =>
          withId.withColumn("text", array_join(
            transform(split(col("text"), " "),
              x => when(x === "", x)
                .otherwise(concat(col("doc_id").cast("string"), lit("§"), x))),
            " "))
        case _ =>
          withId.withColumn("text", array_join(
            transform(split(col("text"), " "),
              x => when(x === "", x).otherwise(concat(lit(s"$k§"), x))),
            " "))
      }
      remapped.select(cols.map(col): _*)
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val replicas = args(2).toInt
    val mode = if (args.length > 3) args(3) else "dup"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    replicate(docs, replicas, mode).repartition(32).write.mode("overwrite")
      .parquet(s"$dest/documents.parquet")
    val n = spark.read.parquet(s"$dest/documents.parquet").count()
    println(s"[scaleprobe] wrote $n docs to $dest/documents.parquet (mode=$mode)")
    spark.stop()
  }
}
