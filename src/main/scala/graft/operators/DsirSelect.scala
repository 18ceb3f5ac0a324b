package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, dec, asDouble}
import graft.functions.RollingHash.rolling_hash

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * rank a large raw corpus by how target-domain-like each document is,
  * using hashed n-gram likelihood ratios — the standard pretraining-mix
  * recipe for pulling "looks like the curated slice" documents out of a
  * 100 TB crawl.
  *
  * Target = the curated sources [[DsirTargetSources]]; candidates = every
  * other document. Features are hashed bigrams (the
  * [[CorpusOps]] quality-model feature space): j = rolling_hash(bigram)
  * mod [[DsirDim]]. Per-feature importance weight with add-one smoothing:
  *
  *   w_j = ((ct_j + 1) · (R + D)) / ((cr_j + 1) · (T + D))
  *
  * where ct/cr are the feature's occurrence counts in target/candidate
  * text and T/R the slice totals — the per-feature likelihood ratio
  * p_target(j)/p_raw(j). A doc's score is the mean-free SUM of w over its
  * bigram occurrences (linear-domain scoring: the paper's log-domain sum
  * needs `ln`, which differs by libm ulps across engines — the linear
  * estimator keeps every step exactly replayable and produces the same
  * "which docs look target-like" ranking signal). Top-[[DsirK]] selected.
  *
  * Cross-engine exactness: counts are exact ints; both products fit int64
  * at test SFs ((ct+1)·(R+D) ≤ ~1e12 — at true 100 TB totals flip the
  * products to doubles, exact below 2^53); the weight is ONE IEEE
  * division then DECIMAL(18,6)-quantized, so the per-doc sum is an
  * order-independent decimal aggregate ([[graft.Tables.dec]] discipline).
  *
  * Scale shape: ONE corpus featurization pass (shared frame) feeds both
  * the weight estimation (conditional aggregation by feature — D-bounded,
  * map-side partials) and the candidate scoring; the D=4096-row weight
  * table BROADCASTS onto the candidate features; the per-doc sum is
  * partial-combinable; top-K is a TakeOrdered; document metadata joins
  * onto the K winners only (broadcast). Nothing wider than the corpus
  * feature stream ever shuffles, and the only doc-keyed exchange carries
  * one row per candidate doc.
  *
  * Docs with fewer than two tokens have no bigrams and are out of scope
  * (no features → no score), identically in both engines.
  */
object DsirSelect {

  /** Curated target slice: documents from these sources. */
  final val DsirTargetSources: Seq[String] = Seq("src0", "src1", "src2")
  /** Hashed-feature space size. */
  final val DsirDim = 4096L
  /** Selection size. */
  final val DsirK = 50
  private final val P = 1000000007L

  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tgt = col("source").isin(DsirTargetSources: _*)
    val feats = graft.SharedFrames.shared(
      docs
        .select(col("doc_id"), tgt.as("is_tgt"),
          expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
        // guard: sequence(1, n) runs DESCENDING for n < 1 and would index
        // element_at(ws, 0) — docs under two tokens contribute no bigrams
        .select(col("doc_id"), col("is_tgt"), explode(expr(
          "IF(size(ws) >= 2, transform(sequence(1, size(ws) - 1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1))), " +
            "array())")).as("bg"))
        .select(col("doc_id"), col("is_tgt"),
          (rolling_hash(col("bg")) % lit(DsirDim)).as("j")))
    val counts = feats.groupBy(col("j")).agg(
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_tgt"), 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("rr"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("j"), dec(
        ((col("ct") + 1) * (col("rr") + lit(DsirDim))).cast("double")
          / ((col("cr") + 1) * (col("tt") + lit(DsirDim))).cast("double"))
        .as("w"))
    val scored = feats.filter(!col("is_tgt"))
      .join(broadcast(weights), Seq("j"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w")).as("sw"))
      .orderBy(asDouble(col("sw")).desc, col("doc_id"))
      .limit(DsirK)
    broadcast(scored)
      .join(docs.select(col("doc_id"), col("source"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_bigrams"), asDouble(col("sw")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val dsirSelectSql: String = OracleSql.materializeCtes {
    val srcs = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, source IN ($srcs) AS is_tgt,
       |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, is_tgt,
       |    unnest(list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1])) AS bg
       |  FROM d WHERE len(ws) >= 2),
       |f AS (
       |  SELECT doc_id, is_tgt,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(bg)+1),
       |                     i -> CAST(unicode(bg[i]) AS BIGINT))),
       |      (a, b) -> (a*31 + b) % $P) % $DsirDim AS j
       |  FROM bg),
       |c AS (
       |  SELECT j,
       |    CAST(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |  FROM f GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS tt,
       |    CAST(SUM(cr) AS BIGINT) AS rr FROM c),
       |w AS (
       |  SELECT j, CAST(
       |    CAST((ct + 1) * (rr + $DsirDim) AS DOUBLE)
       |      / CAST((cr + 1) * (tt + $DsirDim) AS DOUBLE)
       |    AS DECIMAL(18,6)) AS w
       |  FROM c CROSS JOIN tot),
       |s AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    SUM(w.w) AS sw
       |  FROM f JOIN w USING (j)
       |  WHERE NOT is_tgt
       |  GROUP BY 1
       |  ORDER BY CAST(CAST(sw AS VARCHAR) AS DOUBLE) DESC, doc_id
       |  LIMIT $DsirK)
       |SELECT s.doc_id, d2.source, d2.lang, s.n_bigrams,
       |  CAST(CAST(s.sw AS VARCHAR) AS DOUBLE) AS score
       |FROM s JOIN documents d2 ON d2.doc_id = s.doc_id
       |ORDER BY score DESC, s.doc_id""".stripMargin
  }
}
