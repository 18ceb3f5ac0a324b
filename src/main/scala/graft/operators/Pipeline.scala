package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The END-TO-END pre-training data flow, composed from the library's own
  * operators — the point of a pipeline LIBRARY is that the stages chain:
  *
  *   raw documents
  *     → exact-dedup keeper election + quality gate + language selection
  *       ([[TextAnalysis.corpusClean]])
  *     → NEAR-dup cluster keeper election ([[Dedup.connectedComponents]]
  *       over the j≥0.7 pair graph — exact dedup only collapses
  *       byte-identical docs; every non-min member of a near-dup
  *       component is dropped here)
  *     → benchmark decontamination ([[Dedup.decontaminate]] — drop the eval
  *       docs themselves and every doc sharing a 20-gram with them)
  *     → token-budget sequence packing ([[TextAnalysis.packDocs]])
  *     → (doc_id, n_tokens, shard): the training-shard manifest.
  *
  * Each stage is the SAME code its standalone oracle-checked query runs
  * (shared functions, not copies), and the composition has its own
  * composed DuckDB oracle — a green row proves the stages agree end to
  * end, including the interaction the standalone gates cannot see (shard
  * boundaries depend on exactly which docs survive the earlier stages).
  * The near-dup stage runs the O(log n) star-contraction engine; its
  * equivalence to plain propagation is itself oracle-pinned
  * (`dedup_clusters` vs `dedup_clusters_star`).
  *
  * Scale shape: semi/anti joins on doc_id (broadcastable survivor id
  * sets; at full scale AQE picks the join side), then the two-phase
  * packing cumsum — nothing here adds a shuffle beyond the stages' own.
  * The cleaned+keeper survivor rows are materialized once and feed both
  * decontamination and packing (the raw table is scanned by each stage's
  * own mining, never re-scanned for the composition glue).
  */
object Pipeline {

  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val cleanedIds = TextAnalysis.corpusClean(spark, dir).select("doc_id")
    // near-dup keeper election: every clustered doc that is NOT its
    // component's min is a near-duplicate of a kept doc — drop it.
    // The pair graph is mined over the RAW doc slice, not the cleaned
    // survivors: a near-dup of a doc the quality gate dropped is still a
    // near-dup (mining over survivors only would resurface it — and is
    // measured VACUOUS on this corpus: zero j≥0.7 pairs survive cleaning
    // at sf0.01/0.1, so the stage would silently do nothing).
    val nonKeepers = Dedup.dedupClustersStar(spark, dir)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    // materialize the (doc_id, text) rows that survived cleaning + keeper
    // election ONCE — decontamination and packing both read these rows
    // instead of re-deriving their inputs from the raw table. Restricting
    // decontamination's corpus side to this set is RESULT-IDENTICAL (its
    // ids are only ever anti-joined against this same set: flagging a doc
    // already dropped upstream cannot change an intersection) but skips
    // gram-hashing every dropped doc (~4× fewer docs at sf0.1). The
    // composed oracle is unchanged — it flags the full corpus and
    // intersects, which is the same set.
    // SharedFrames.shared: BOTH downstream consumers (the decontamination
    // probe and the packing cumsum) reread these rows instead of
    // re-running clean + keeper join; blocks are executor-local and the
    // harness releases them right after the consuming action
    // (BenchHygieneSpec pins the zero-residue contract)
    val cleaned = graft.SharedFrames.shared(
      t(spark, dir, "documents")
        // the eval docs themselves are NOT training data — decontaminate
        // only flags CORPUS docs overlapping them, so without this filter
        // the benchmark would be packed into the shards verbatim (the
        // maximal leak the pipeline exists to prevent)
        .filter(col("doc_id") >= Dedup.ContamEvalCap)
        .join(cleanedIds, Seq("doc_id"), "left_semi")
        .join(nonKeepers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text")))
    val contaminatedIds = Dedup.decontaminateFrom(cleaned,
      t(spark, dir, "documents").filter(col("doc_id") < Dedup.ContamEvalCap))
      .select("doc_id")
    TextAnalysis.packDocs(
      cleaned.join(contaminatedIds, Seq("doc_id"), "left_anti"))
  }

  /** PIPELINE LINEAGE — the observability face of [[pipelineE2e]]: one row
    * per raw document naming its FATE, the first stage that removed it (or
    * `kept`), in pipeline precedence order:
    *
    *   `eval_holdout`  — the benchmark slice itself (never training data)
    *   `cleaned_out`   — failed exact-dedup keeper / quality / language
    *   `near_dup`      — non-min member of a j≥0.7 cluster
    *   `contaminated`  — shares a 20-gram with the eval set
    *   `semantic_dup`  — its embedding (vec_id = doc_id, where one
    *                     exists) lost the SemDeDup keeper election —
    *                     the embedding modality joined INTO the document
    *                     pipeline; docs without embeddings skip the stage
    *   `kept`          — training data.
    *
    * Every verdict set is the SAME code its standalone oracle-checked
    * query runs; the report is id-only left joins over those sets
    * (broadcastable at scale — each set is a survivor/casualty id list,
    * orders of magnitude smaller than the corpus). The contamination
    * probe is restricted to docs surviving the earlier stages, which is
    * result-identical under precedence (a doc's contamination verdict
    * depends only on the doc and the eval set, never on other corpus
    * docs) and skips hashing the already-dropped majority. */
  def lineageReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"))
    // both id sets feed TWO consumers (the survivor build and the final
    // verdict join) — share them or the cleaning scan and the iterative
    // star contraction execute twice (measured 9.6 s → 5.3 s at sf0.1)
    val cleanedIds = graft.SharedFrames.shared(
      TextAnalysis.corpusClean(spark, dir).select("doc_id"))
    val nonKeepers = graft.SharedFrames.shared(
      Dedup.dedupClustersStar(spark, dir)
        .filter(col("doc_id") =!= col("cluster")).select("doc_id"))
    val survivors = graft.SharedFrames.shared(
      t(spark, dir, "documents")
        .filter(col("doc_id") >= Dedup.ContamEvalCap)
        .join(cleanedIds, Seq("doc_id"), "left_semi")
        .join(nonKeepers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text")))
    val contaminatedIds = Dedup.decontaminateFrom(survivors,
      t(spark, dir, "documents").filter(col("doc_id") < Dedup.ContamEvalCap))
      .select("doc_id")
    val semDropIds = graft.operators.Similarity.semDedup(spark, dir)
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    def flagged(ids: DataFrame, name: String) =
      ids.withColumn(name, lit(true))
    docs
      .join(flagged(cleanedIds, "c"), Seq("doc_id"), "left_outer")
      .join(flagged(nonKeepers, "nk"), Seq("doc_id"), "left_outer")
      .join(flagged(contaminatedIds, "ct"), Seq("doc_id"), "left_outer")
      .join(flagged(semDropIds, "sd"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("doc_id") < Dedup.ContamEvalCap, "eval_holdout")
          .when(col("c").isNull, "cleaned_out")
          .when(col("nk").isNotNull, "near_dup")
          .when(col("ct").isNotNull, "contaminated")
          .when(col("sd").isNotNull, "semantic_dup")
          .otherwise("kept").as("stage"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the stage verdicts are the standalone queries' own oracles
    * composed as subqueries (the [[pipelineE2eSql]] pattern, plus the
    * full [[Similarity.semDedupSql]] training replay for the semantic
    * stage), cased in the same precedence order. */
  val lineageReportSql: String =
    s"""WITH clean AS (SELECT doc_id FROM (${TextAnalysis.corpusCleanSql})),
       |nonkeep AS (SELECT doc_id FROM (${Dedup.dedupClustersSql})
       |            WHERE doc_id <> cluster),
       |contam AS (SELECT doc_id FROM (${Dedup.decontaminateSql})),
       |sem AS (SELECT vec_id AS doc_id
       |        FROM (${graft.operators.Similarity.semDedupSql})
       |        WHERE NOT kept)
       |SELECT d.doc_id, CASE
       |    WHEN d.doc_id < ${Dedup.ContamEvalCap} THEN 'eval_holdout'
       |    WHEN d.doc_id NOT IN (SELECT doc_id FROM clean)
       |      THEN 'cleaned_out'
       |    WHEN d.doc_id IN (SELECT doc_id FROM nonkeep) THEN 'near_dup'
       |    WHEN d.doc_id IN (SELECT doc_id FROM contam)
       |      THEN 'contaminated'
       |    WHEN d.doc_id IN (SELECT doc_id FROM sem) THEN 'semantic_dup'
       |    ELSE 'kept' END AS stage
       |FROM documents d ORDER BY d.doc_id""".stripMargin

  val pipelineE2eSql: String =
    s"""WITH clean AS (SELECT doc_id FROM (${TextAnalysis.corpusCleanSql})),
       |nonkeep AS (SELECT doc_id FROM (${Dedup.dedupClustersSql})
       |            WHERE doc_id <> cluster),
       |contam AS (SELECT doc_id FROM (${Dedup.decontaminateSql})),
       |surv AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN clean USING (doc_id)
       |  WHERE d.doc_id >= ${Dedup.ContamEvalCap}
       |    AND d.doc_id NOT IN (SELECT doc_id FROM nonkeep)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam))
       |SELECT doc_id, n_tokens,
       |  CAST(floor(CAST(cum - n_tokens AS DOUBLE)
       |    / ${TextAnalysis.PackBudget}) AS BIGINT) AS shard
       |FROM (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM (SELECT doc_id,
       |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |        FROM surv))
       |ORDER BY doc_id""".stripMargin

  /** Train/val/test split-hash modulus and boundaries: < 80 → train,
    * < 90 → val, else test. */
  final val SplitBuckets = 100L
  final val SplitTrainLt = 80L
  final val SplitValLt = 90L
  private final val SplitP = 1000000007L

  /** LEAKAGE-FREE SPLIT ASSIGNMENT — the step every eval pipeline needs
    * after near-dup analysis: hash-assign documents to train/val/test by
    * their DEDUP CLUSTER, never by doc_id, so two near-duplicate
    * documents can never straddle a split boundary (the classic
    * train→test leak that inflates benchmark scores; Lee et al. 2021
    * §6). Cluster labels come from the oracle-pinned
    * [[Dedup.dedupClusters]] connected components over the j ≥ 0.7 pair
    * graph; docs outside the similarity graph are their own singleton
    * cluster. The assignment is the deterministic MINSTD residue of the
    * cluster label — reproducible across runs and engines, no RNG state.
    *
    * Scale shape: one left join of the doc spine against the (graph-node
    * sized, far sub-corpus) cluster table, then a pure map — the split
    * column adds NO exchange beyond the CC operator's own; the no-
    * straddle guarantee is STRUCTURAL (split is a function of cluster),
    * pinned anyway in PipelineOperatorsSpec. */
  def splitLeakfree(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.dedupClusters(spark, dir)
    val spine = t(spark, dir, "documents").select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
    val r = ((lit(48271L) * (col("cluster") % lit(SplitP)) + lit(11L))
      % lit(SplitP)) % lit(SplitBuckets)
    spine
      .select(col("doc_id"), col("cluster"),
        when(r < SplitTrainLt, "train")
          .when(r < SplitValLt, "val")
          .otherwise("test").as("split_name"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the CC oracle's recursive walk + the identical residue CASE. */
  val splitLeakfreeSql: String =
    s"""WITH cl AS (SELECT * FROM (${Dedup.dedupClustersSql})),
       |spine AS (
       |  SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN cl USING (doc_id))
       |SELECT doc_id, cluster,
       |  CASE WHEN ((48271 * (cluster % $SplitP) + 11) % $SplitP)
       |              % $SplitBuckets < $SplitTrainLt THEN 'train'
       |       WHEN ((48271 * (cluster % $SplitP) + 11) % $SplitP)
       |              % $SplitBuckets < $SplitValLt THEN 'val'
       |       ELSE 'test' END AS split_name
       |FROM spine ORDER BY doc_id""".stripMargin
}
