// Scale probe data: sbt "runMain graft.tools.ScaleProbe <srcSfDir> <destDir> <replicas> [mode]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds a documents table N× the source SF for the heavy-tail scaling
  * probe (BASELINE.md "sf1 probe"), in one of these modes:
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
  *  - `chardup`: like `dup` but the per-replica token rename PRESERVES
  *    TOKEN LENGTH — each character of each token is replaced by a
  *    pseudo-random character keyed by (replica, token, position) over
  *    a per-replica disjoint 1024-char CJK alphabet slice (cross-replica
  *    disjointness structural). The `dup`/`down` prefix remap lengthens every
  *    token by a SHARED prefix, which inflates char-shingle similarity
  *    corpus-wide (measured: median pairwise trigram Jaccard 0.45 →
  *    0.67, fraction of pairs ≥ 0.7 from 5e-5 to 0.45 — enough to send
  *    the char-trigram banding queries quadratic on pairs that do not
  *    exist in the source), so corpus-wide char-shingled queries
  *    (dedup_minhash_lsh, dedup_simhash) MUST be probed on this mode;
  *    dedup_containment is char-shingled too but contract-bounded to a
  *    doc_id < 200 slice, which on ANY replicated corpus is just
  *    replica 0's remap of the source slice — a probe row for it
  *    certifies slice isolation (already its 1.1× row in the
  *    catalog-wide dup sweep), never banding scale, so it is NOT part
  *    of this mode's coverage; the
  *    token-shingled families are unaffected by the inflation and keep
  *    using `dup`. The rename is injective only w.h.p. (1024^len images
  *    per length class), so the builder VERIFIES it after writing:
  *    distinct-token count of the output must equal replicas × the
  *    source's, failing loudly on any collision within or across
  *    replicas.
  *
  *  - `embed`: replicates the EMBEDDINGS table instead (vec_id stride +
  *    per-replica signed coordinate permutation — an exact orthogonal
  *    transform); see [[replicateEmbeddings]] for the fidelity argument
  *    and why no `embed_nodup` floor analog can exist.
  *
  *  - `full`: BOTH tables — documents in `dup` mode and embeddings in
  *    `embed` mode — with ALIGNED id strides (VERDICT r16 item 3): both
  *    replications offset replica k's ids by k·[[Stride]], so the 1:1
  *    doc_id ↔ vec_id correspondence the source corpus carries survives
  *    into every replica, and the composite pipelines (lineage_report,
  *    pipeline_e2e, decontaminate_semantic) see a semantic-dup stage
  *    with vectors for EVERY scaled doc_id — under the single-table
  *    recipes the embeddings-joined stage saw original ids only.
  *
  * Other tables are not written here; the probe recipe copies them from
  * the source SF unchanged (embedding-joined stages therefore see only
  * the original ids under the single-table modes — noted where a probed
  * query uses them; `full` closes that for documents+embeddings
  * consumers). */
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
    require(Set("dup", "nodup", "down", "chardup")(mode),
      s"ScaleProbe: unknown mode '$mode' (dup | nodup | down | chardup)")
    require(replicas >= 1, s"ScaleProbe: need at least 1 replica, got $replicas")
    require(mode != "chardup" || replicas <= 20,
      s"ScaleProbe chardup: $replicas replicas exceed the 20 disjoint 1024-char CJK alphabet slices")
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
        case "chardup" =>
          // char i of token w → alphabet[md5(k " " w " " i) mod 1024]
          // (space-delimited key — tokens cannot contain spaces, we just
          // split on them, so the concat is unambiguous; r15 used a raw
          // NUL byte here, which made git treat this file as binary):
          // length preserved, deterministic per (replica, token),
          // injective w.h.p. and VERIFIED after writing (see main)
          // replica k draws from its OWN disjoint 1024-char slice of the
          // CJK BMP block: images across replicas share no character at
          // all, so cross-replica disjointness is STRUCTURAL (only
          // within-replica injectivity is w.h.p., and the post-write
          // distinct-count assertion catches any run that collides)
          val alpha = (0 until 1024).map(i => (0x4E00 + k * 1024 + i).toChar).mkString
          withId.withColumn("text", array_join(
            transform(split(col("text"), " "), w =>
              when(w === "", w).otherwise(
                array_join(
                  transform(sequence(lit(1), length(w)), i =>
                    lit(alpha).substr(
                      (conv(substring(md5(concat_ws(" ",
                        lit(k.toString), w, i.cast("string"))
                        .cast("binary")), 1, 8), 16, 10) % 1024 + 1)
                        .cast("int"), lit(1))),
                  ""))),
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

  /** Distinct nonempty tokens of a documents frame (the chardup
    * injectivity check's measurement). */
  def distinctTokens(docs: org.apache.spark.sql.DataFrame): Long =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").select(countDistinct(col("w"))).head().getLong(0)

  /** EMBEDDINGS-table replication for the embedding-bound query probes
    * (`embed` mode): replica k takes vec_id + k·[[Stride]] and a
    * per-replica SIGNED COORDINATE PERMUTATION of the vector —
    * coordinate i of the image is ±(coordinate π_k(i) of the source),
    * with π_k and the sign pattern drawn from a replica-seeded PRNG
    * (replica 0 is the identity, so min-vec_id query vectors and the
    * Lloyd inits stay bit-identical to the source corpus's).
    *
    * Why a signed permutation and not a "fixed-point perturbation": it
    * is an EXACTLY orthogonal transform that performs no arithmetic at
    * all — every float of every vector survives bit-identically (at
    * most negated, which is a sign-bit flip), so within-replica dot
    * products/cosines/norms equal the source's up to summation-order
    * reassociation (≤ ulp-level), and the replica is distributionally
    * indistinguishable from a fresh sample of the same isotropic
    * source. Cross-replica pairs see two independent random signed
    * permutations — i.e. the same near-random geometry as any two
    * source vectors. The union is therefore statistically a GENUINE
    * R×-larger corpus of this embedding model.
    *
    * There is deliberately NO `embed_nodup` floor analog: for isotropic
    * vectors in fixed dimension the fixed-τ cosine tail is a property
    * of the geometry, not of planted structure — measured
    * P(cos ≥ 0.4) ≈ 4.6e-4 and P(cos ≥ 0.35) ≈ 2.1e-3, SF-invariant
    * across sf0.001/0.01/0.1 — so EVERY corpus of this distribution
    * (fresh-drawn or replicated) carries Θ(n²·p) near-dup pairs; a
    * token-style "private vocabulary" that zeroes overlap has no
    * embedding counterpart (n ≫ d vectors cannot be pairwise
    * sub-τ-coherent for τ this small at these n — and isotropic
    * redraws reproduce the same tail by construction). Output-bound
    * queries are instead decomposed by REPORTING output rows alongside
    * seconds in the probe table (BASELINE.md r16). */
  def replicateEmbeddings(emb: org.apache.spark.sql.DataFrame,
      replicas: Int): org.apache.spark.sql.DataFrame = {
    require(replicas >= 1, s"ScaleProbe: need at least 1 replica, got $replicas")
    val cols = emb.columns
    val statsRow = emb.agg(min(col("vec_id")), max(col("vec_id")),
      min(size(col("embedding"))), max(size(col("embedding")))).head()
    require(!statsRow.isNullAt(0),
      "ScaleProbe embed: source embeddings frame is empty — nothing to replicate")
    val (minId, maxId) = (statsRow.getLong(0), statsRow.getLong(1))
    val (dMin, dMax) = (statsRow.getInt(2), statsRow.getInt(3))
    require(maxId < Stride,
      s"ScaleProbe embed: max source vec_id $maxId >= replica stride $Stride — ids would alias across replicas")
    require(minId >= 0,
      s"ScaleProbe embed: negative source vec_id $minId — the replica offset ranges assume non-negative sources")
    require(dMin == dMax,
      s"ScaleProbe embed: ragged embedding dims [$dMin, $dMax] — a single permutation cannot apply")
    val d = dMin
    (0 until replicas).map { k =>
      val withId = emb.withColumn("vec_id", col("vec_id") + lit(k * Stride))
      val remapped =
        if (k == 0) withId
        else {
          // replica-seeded, so the probe corpus is reproducible
          // run-to-run; the large odd multiplier decorrelates adjacent
          // replica seeds
          val rnd = new scala.util.Random(0x9E3779B97F4A7C15L * k)
          val perm = rnd.shuffle((0 until d).toVector)
          val sign = Vector.fill(d)(rnd.nextBoolean())
          withId.withColumn("embedding", array((0 until d).map { i =>
            val e = element_at(col("embedding"), perm(i) + 1)
            if (sign(i)) negate(e) else e
          }: _*))
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
    if (mode == "embed" || mode == "full") {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      replicateEmbeddings(emb, replicas).repartition(32)
        .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")
      val out = spark.read.parquet(s"$dest/embeddings.parquet")
      val n = out.count()
      require(n == replicas * emb.count(),
        s"ScaleProbe embed: wrote $n rows, expected ${replicas}×${emb.count()}")
      println(s"[scaleprobe] wrote $n embeddings to $dest/embeddings.parquet (mode=$mode)")
      if (mode == "embed") { spark.stop(); return }
      // `full` continues into the dup-mode documents write below; both
      // replications use the same k·Stride offsets, so doc_ids and
      // vec_ids stay 1:1-aligned per replica (asserted after writing)
    }
    val docMode = if (mode == "full") "dup" else mode
    val docs = spark.read.parquet(s"$src/documents.parquet")
    replicate(docs, replicas, docMode).repartition(32).write.mode("overwrite")
      .parquet(s"$dest/documents.parquet")
    val out = spark.read.parquet(s"$dest/documents.parquet")
    val n = out.count()
    if (mode == "full") {
      // the aligned-strides contract, measured on what was actually
      // written: the scaled tables carry identical id sets
      val docIds = out.select(col("doc_id"))
      val vecIds = spark.read.parquet(s"$dest/embeddings.parquet")
        .select(col("vec_id"))
      val mismatch = docIds.except(vecIds.toDF("doc_id")).count() +
        vecIds.toDF("doc_id").except(docIds).count()
      require(mismatch == 0L,
        s"ScaleProbe full: doc_id/vec_id sets diverged ($mismatch ids) — " +
          "the aligned-stride contract is broken")
    }
    if (mode == "chardup") {
      // the length-preserving rename is injective only w.h.p. — verify
      // by measurement: any collision (within a replica or across
      // replicas) shrinks the distinct-token count below R × source's
      val (srcV, outV) = (distinctTokens(docs), distinctTokens(out))
      require(outV == replicas * srcV,
        s"ScaleProbe chardup: token rename collided — distinct tokens " +
          s"$outV != $replicas × $srcV; duplication structure corrupted")
    }
    println(s"[scaleprobe] wrote $n docs to $dest/documents.parquet (mode=$mode)")
    spark.stop()
  }
}
