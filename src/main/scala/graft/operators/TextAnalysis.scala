package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t
import graft.functions.RollingHash.rolling_hash

/** Text analysis for the training-data pipeline (builder brief): language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * All fully columnar/codegen'd — no UDFs — so they survive 100 TB.
  *
  * Determinism notes for the DuckDB oracles: token split is a literal
  * single-space split; ratios divide exact ints in double; the composite
  * quality score is written with identical association order in both
  * engines, so results are bit-equal.
  */
object TextAnalysis {

  private val Stopwords = Seq("the", "a", "of", "and", "is", "to", "in", "on")
  private def sqlSet(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  /** The composite quality score over the staged stat columns — factored
    * so the corpus-cleaning pipeline ([[corpusClean]]) filters on exactly
    * the formula [[textStats]] reports. */
  private def qualityScoreCol: org.apache.spark.sql.Column =
    lit(0.4) * (col("stop_hits").cast("double") / col("token_count")) +
      lit(0.3) * least(lit(1.0), col("token_count").cast("double") / lit(100.0)) +
      lit(0.3) * (lit(1.0) - col("punct_chars").cast("double") / length(col("text")))

  /** The staged stat columns the quality score reads. */
  private def withQualityInputs(df: DataFrame): DataFrame =
    df.withColumn("tokens", split(col("text"), " "))
      .withColumn("token_count", size(col("tokens")).cast("long"))
      .withColumn("stop_hits",
        size(expr(s"filter(tokens, x -> x IN (${sqlSet(Stopwords)}))")).cast("long"))
      .withColumn("punct_chars",
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long"))

  /** Per-document stats: chars, tokens, average token length, stopword
    * ratio, punctuation ratio, and a composite quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    withQualityInputs(t(spark, dir, "documents"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("token_count"),
        (length(regexp_replace(col("text"), " ", ""))
          .cast("double") / col("token_count")).as("avg_token_len"),
        (col("stop_hits").cast("double") / col("token_count")).as("stopword_ratio"),
        (col("punct_chars").cast("double") / length(col("text"))).as("punct_ratio"),
        qualityScoreCol.as("quality_score"))

  val textStatsSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
       |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x IN (${sqlSet(Stopwords)}))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |    / length(text) AS punct_ratio,
       |  0.4 * (CAST(len(list_filter(string_split(text, ' '), x -> x IN (${sqlSet(Stopwords)}))) AS DOUBLE)
       |           / len(string_split(text, ' '))) +
       |  0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) +
       |  0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |           / length(text)) AS quality_score
       |FROM documents""".stripMargin

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Language-ID heuristic: stopword-marker hit counts per language with a
    * fixed-priority argmax. (The testdata's `lang` labels are synthetic —
    * the operator's contract is the deterministic heuristic itself.) */
  def langDetect(spark: SparkSession, dir: String): DataFrame = {
    val withHits = Markers.foldLeft(
      t(spark, dir, "documents")
        .withColumn("tokens", split(col("text"), " "))) {
      case (df, (lang, words)) =>
        df.withColumn(s"${lang}_hits",
          size(expr(s"filter(tokens, x -> x IN (${sqlSet(words)}))")).cast("long"))
    }
    val langs = Markers.map(_._1)
    val predicted = Markers.init.zipWithIndex.foldRight(
      lit(langs.last): org.apache.spark.sql.Column) { case (((lang, _), i), els) =>
      val later = langs.drop(i + 1)
      val cond = later.map(o => col(s"${lang}_hits") >= col(s"${o}_hits"))
        .reduce(_ && _)
      when(cond, lit(lang)).otherwise(els)
    }
    withHits.select(col("doc_id") +: langs.map(l => col(s"${l}_hits")) :+
      predicted.as("predicted_lang"): _*)
  }

  val langDetectSql: String = {
    val hits = Markers.map { case (lang, words) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${sqlSet(words)}))) AS BIGINT) AS ${lang}_hits"
    }.mkString(",\n  ")
    val langs = Markers.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (lang, i) =>
      val cond = langs.drop(i + 1).map(o => s"${lang}_hits >= ${o}_hits")
        .mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"${l}_hits").mkString(", ")},
       |  CASE $cases ELSE '${langs.last}' END AS predicted_lang
       |FROM (SELECT doc_id,
       |  $hits
       |FROM documents)""".stripMargin
  }

  /** Sketch-based approximate stats — the 100 TB cardinality path: HLL++
    * (approx_count_distinct) and quantile sketches (percentile_approx)
    * aggregate with bounded memory and map-side partials where exact
    * distinct/percentile would shuffle every value. Error bounds vs the
    * exact operators are pinned in ScalaTest; no DuckDB oracle (sketch
    * internals differ across engines by design). */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Document fingerprints: md5 content hash + the native [[RollingHash]]
    * Catalyst expression (codegen'd polynomial hash over code points), both
    * over the NFC-normalized text (composed/decomposed accent variants must
    * fingerprint identically for dedup). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NfcNormalize.nfc_normalize
    t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(nfc_normalize(col("text")).cast("binary")).as("fp_md5"),
        rolling_hash(nfc_normalize(col("text"))).as("fp_roll"))
  }

  val docFingerprintSql: String =
    """SELECT doc_id, md5(nt) AS fp_md5,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(nt)+1),
      |                   i -> CAST(unicode(nt[i]) AS BIGINT))),
      |    (a, b) -> (a*31 + b) % 1000000007) AS fp_roll
      |FROM (SELECT doc_id, nfc_normalize(text) AS nt FROM documents)""".stripMargin

  /** Corpus vocabulary head: top-50 tokens by frequency. One explode + one
    * hash-groupBy + a global top-k (TakeOrderedAndProject) — at 100 TB the
    * shuffle carries one row per DISTINCT token per partition (map-side
    * partial counts), not one per token occurrence. Ties broken by token
    * text for a deterministic oracle. */
  def tokenTopk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  val tokenTopkSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE length(token) > 0
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin

  /** Heavy-hitter threshold: report tokens whose occurrence count exceeds
    * total/K. Shared by the query, its oracle, and the spec. K = 30 sits
    * just above the corpus's near-uniform 31-token vocabulary mean (1/31
    * of mass), so the gate splits non-vacuously at every SF: exclusion is
    * GUARANTEED by arithmetic (31 tokens cannot all hold > n/30), and the
    * frequency spread (~±8% of the mean) puts the head above it. */
  val HeavyHitterK = 30

  /** One Misra–Gries pass over a partition's tokens with k counters.
    * Classic semantics: seen token increments; unseen token with a free
    * counter claims one; unseen token with a full table decrements EVERY
    * counter (evicting zeros) and is itself dropped. Guarantee: any token
    * with > n_p/k of the partition's n_p occurrences survives. */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { tok =>
      counters.get(tok) match {
        case Some(c) => counters(tok) = c + 1
        case None if counters.size < k => counters(tok) = 1L
        case None =>
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.filterInPlace((_, c) => c > 0)
      }
    }
    counters.keysIterator
  }

  /** Exact heavy hitters (tokens with count·K > total occurrences) via the
    * two-pass candidate/recount scheme — the 100 TB shape where the naive
    * plan (full-vocabulary groupBy then HAVING) shuffles every distinct
    * token per partition:
    *
    *   1. CANDIDATES: one narrow scan runs [[misraGries]] per partition —
    *      O(K) memory, NO shuffle. If a token holds > n/K of the global n
    *      occurrences then in at least one partition it holds > n_p/K of
    *      that partition's n_p (else summing the per-partition bounds
    *      contradicts the global one), so the union of per-partition
    *      summaries is a GUARANTEED superset of every true heavy hitter.
    *      The union is ≤ K·numPartitions tokens — a bounded, contractual
    *      collect (the BPE-election discipline, CorpusOps.scala).
    *   2. RECOUNT: the exact count restricted to the broadcast candidate
    *      set. Map-side partial aggregation caps the shuffle at
    *      |candidates| rows per partition; everything outside the
    *      candidate set is filtered AT THE SCAN, before any exchange.
    *
    * The oracle is the naive full-vocabulary HAVING query — equality
    * proves the MG candidate pass loses no heavy hitter and the recount
    * threshold matches exactly. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val total = toks.count()
    val candidates = toks.as[String]
      .mapPartitions(misraGries(_, HeavyHitterK))
      .distinct().collect().toSeq // ≤ K·partitions rows by construction
    toks.filter(col("token").isin(candidates: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HeavyHitterK > total)
      .orderBy(col("cnt").desc, col("token"))
  }

  val heavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |nz AS (SELECT token FROM toks WHERE length(token) > 0)
       |SELECT token, COUNT(*) AS cnt FROM nz
       |GROUP BY token
       |HAVING COUNT(*) * $HeavyHitterK > (SELECT COUNT(*) FROM nz)
       |ORDER BY cnt DESC, token""".stripMargin

  /** Per-document top-3 salient terms by a TF-IDF-style score. The score
    * is tf/df — one exact-int by exact-int IEEE division, identical bit
    * pattern in any engine (ln-based idf would differ by libm ulps across
    * engines; with N fixed per corpus, tf/df ranks identically to
    * tf·ln(N/df) for the within-document ordering wherever df differs, and
    * is exactly reproducible). Shape: explode → tf hash-agg by
    * (doc, token), MATERIALIZED once as a shared generation → df derived
    * from tf's key set (one row per distinct (doc, token) — never a
    * second corpus explode) → equi-join on token → per-doc window top-3.
    *
    * The tf generation is MATERIALIZED once (SharedFrames) and the df
    * side explicitly broadcast, both deliberate. Without the cache,
    * ColumnPruning rewrites the df branch's inner aggregate into a bare
    * distinct (the tf count is dead there — and it survives a live
    * count(tf) too, via RemoveRedundantAggregates), the two
    * explode→aggregate subtrees become structurally different,
    * ReuseExchange cannot dedup them, and the corpus is scanned,
    * exploded, and shuffled TWICE. Worse, AQE then mis-sized the twin
    * stages at runtime (observed at sf0.1, r8) and broadcast the
    * CORPUS-scale tf side of the join — the one side that must never
    * broadcast at 100 TB. The cache pins one explode; the explicit
    * broadcast(df) pins the vocabulary-scale build side (one row per
    * distinct token — the standard working assumption everywhere a dim
    * table broadcasts; a vocabulary that outgrows executor memory means
    * dropping the hint for a token-keyed shuffle join, AQE-splittable on
    * hot tokens). Both pinned in PlanShapeSpec. */
  def tfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = graft.SharedFrames.shared(
      tok.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), Seq("token"))
      .withColumn("score", col("tf").cast("double") / col("df"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("score"), col("rn"))
  }

  /** Quality threshold for the cleaning pipeline. */
  final val CleanMinQuality = 0.5
  private val CleanLangs = Seq("en", "de")

  /** The END-TO-END corpus cleaning flow as one query — the composition a
    * training pipeline actually runs over raw documents:
    *   1. exact-dedup keeper election (min doc_id per content hash),
    *   2. quality gate (the same composite formula [[textStats]] reports,
    *      by construction — shared [[qualityScoreCol]]),
    *   3. language selection.
    * Plan shape: the keeper election is one hash-groupBy on the content
    * hash; the keeper join is a self-semi-join on (fp, doc_id); quality
    * and language are columnar predicates evaluated in the same codegen'd
    * scan stage — one shuffle total beyond the scan. */
  /** The quality+language stage of the cleaning pipeline, factored so the
    * batch query and the streaming twin filter with the same code by
    * construction (input needs `doc_id`, `lang`, `text`). */
  def cleanFilter(docs: DataFrame): DataFrame =
    withQualityInputs(docs)
      .filter(qualityScoreCol >= CleanMinQuality &&
        col("lang").isin(CleanLangs: _*))
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        qualityScoreCol.as("quality_score"))

  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("fp", md5(col("text").cast("binary")))
    val keepers = docs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    cleanFilter(docs.join(keepers, Seq("fp", "doc_id"), "left_semi"))
      .orderBy(col("doc_id"))
  }

  val corpusCleanSql: String = {
    val q =
      s"""0.4 * (CAST(len(list_filter(string_split(text, ' '), x -> x IN (${sqlSet(Stopwords)}))) AS DOUBLE)
         |           / len(string_split(text, ' '))) +
         |  0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) +
         |  0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
         |           / length(text))""".stripMargin
    s"""WITH keepers AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS kid
       |  FROM documents GROUP BY md5(text))
       |SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
       |  $q AS quality_score
       |FROM documents JOIN keepers
       |  ON keepers.fp = md5(text) AND keepers.kid = doc_id
       |WHERE $q >= $CleanMinQuality
       |  AND lang IN (${sqlSet(CleanLangs)})
       |ORDER BY doc_id""".stripMargin
  }

  /** Shard docs per training-token budget. */
  final val PackBudget = 4096L
  /** Docs per cumsum bucket — sized so the bucket-offset table is tiny
    * relative to the corpus (100 docs/bucket ⇒ offsets are 1% of doc
    * count). The offset reduction NESTS in levels of this same factor
    * ([[exclusivePrefix]]), so no single task ever windows more than
    * PackBucket rows regardless of corpus size. */
  final val PackBucket = 100L

  /** Sequence PACKING: assign each document to the training shard its
    * first token lands in, under a running token budget of [[PackBudget]]
    * per shard in doc_id order — the sharding step that turns a cleaned
    * corpus into fixed-budget training files.
    *
    * The semantics are a SEQUENTIAL prefix sum, but the implementation is
    * the two-phase decomposition that survives 100 TB: a window cumsum
    * WITHIN doc_id buckets (parallel across buckets) plus exclusive
    * bucket-level offsets (a bucket-count-sized aggregate, broadcast back)
    * — no global single-task window anywhere. The DuckDB oracle computes
    * the straight sequential cumsum, so the green row PROVES the
    * distributed decomposition is exactly the sequential semantics
    * (integer arithmetic — no FP slack). */
  def packShards(spark: SparkSession, dir: String): DataFrame =
    packDocs(t(spark, dir, "documents"))

  /** The packing core over an arbitrary (doc_id, text) set — shared by the
    * standalone query and the end-to-end pipeline composition.
    *
    * The bucket-offset reduction NESTS ([[exclusivePrefix]]): every window
    * in the plan is partitioned, and the terminal reduction is a
    * constant-bounded θ-join — no single-task window survives at ANY
    * corpus size (pinned in PlanShapeSpec; round 3 ran one global window
    * over the bucket table, ~10⁷ rows through one task at 10⁹ docs). */
  def packDocs(input: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE materialization of the narrow packing projection (3 longs/doc):
    // the upstream (for pipeline_e2e, the whole clean+decontaminate
    // composition) is computed exactly once, and every downstream branch —
    // the per-bucket window, the bucket sums, each offset-recursion level,
    // and the driver-known recursion depth (one cheap max()) — rereads the
    // materialized rows. (Round 3 computed the upstream twice, once per
    // branch.) SharedFrames.shared keeps the blocks executor-local and the
    // HARNESS releases them right after the consuming action (round 5's
    // ContextCleaner-reclaimed localCheckpoint piled blocks up under a
    // large driver heap); at cluster scale with executor churn, swap for a
    // reliable checkpoint dir — the recomputation-on-block-loss story is
    // the only difference.
    val docs = graft.SharedFrames.shared(input
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (col("doc_id") / PackBucket).cast("long").as("bucket")))
    val maxBucket = docs.agg(max(col("bucket"))).first() match {
      case r if r.isNullAt(0) => -1L // empty corpus
      case r => r.getLong(0)
    }
    val inBucket = docs.withColumn("cum_in",
      sum(col("n_tokens")).over(Window.partitionBy(col("bucket"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val sums = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bsum"))
    val offsets = exclusivePrefix(sums, maxBucket)
    inBucket.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", col("offset") + col("cum_in"))
      .select(col("doc_id"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / PackBudget).as("shard"))
      .orderBy(col("doc_id"))
  }

  /** Exclusive prefix sums over `(bucket, bsum)` → `(bucket, offset)` where
    * offset = Σ bsum of all smaller buckets — with NO partition-less window
    * at any level:
    *
    *  - while more than [[PackBucket]] buckets may exist (`maxBucket ≥
    *    PackBucket`), split into super-buckets of [[PackBucket]]: the
    *    within-super prefix is a window PARTITIONED by super-bucket (≤
    *    [[PackBucket]] rows each), and the super-level offsets recurse on a
    *    table [[PackBucket]]× smaller;
    *  - the terminal level (≤ [[PackBucket]] rows by construction) uses a
    *    θ-join aggregation (Σ over strictly-smaller keys) — bounded ≤
    *    [[PackBucket]]² comparisons, a constant — instead of a global
    *    window, so Spark's "No Partition Defined" single-task path is never
    *    taken anywhere in the plan.
    *
    * Depth is log₁₀₀(buckets): 10⁹ docs → 10⁷ buckets → 3 levels. Each
    * level's offsets table is PackBucket× smaller than the last, so every
    * broadcast shrinks geometrically. */
  private[operators] def exclusivePrefix(sums: DataFrame, maxBucket: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (maxBucket < PackBucket) {
      // ≤ PackBucket rows: bounded θ-join, window-free
      sums.as("a")
        .join(sums.as("b"), col("b.bucket") < col("a.bucket"), "left_outer")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.bsum")), lit(0L)).as("offset"))
    } else {
      val lv = sums.withColumn("sb", (col("bucket") / PackBucket).cast("long"))
      val within = lv.withColumn("w",
        coalesce(sum(col("bsum")).over(Window.partitionBy(col("sb"))
          .orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val superSums = lv.groupBy(col("sb").as("bucket"))
        .agg(sum(col("bsum")).as("bsum"))
      val superOffsets = exclusivePrefix(superSums, maxBucket / PackBucket)
        .select(col("bucket").as("sb"), col("offset").as("soffset"))
      within.join(broadcast(superOffsets), Seq("sb"))
        .select(col("bucket"), (col("soffset") + col("w")).as("offset"))
    }
  }

  // ---- curriculum ordering (quality-ranked tiers) ----

  /** Score-prefix buckets for the curriculum rank decomposition. Cut
    * points come from a QUANTILE SKETCH over the score column
    * ([[scoreBuckets]]) — equi-POPULATION buckets, so the decomposed
    * windows stay balanced under ANY score distribution (round 5 used a
    * fixed `floor(score·64)` grid, which skews with the distribution —
    * a corpus whose scores concentrate in one grid cell funnels the
    * whole window through one partition). Correctness is unaffected by
    * where cut points come from, or by sketch nondeterminism: bucket =
    * count of cuts ≤ score is MONOTONE for any cut multiset, so global
    * (bucket, score, doc_id) order IS (score, doc_id) order — the only
    * property the rank decomposition rests on, and exactly why the
    * naive-global-row_number oracle stays valid verbatim. */
  final val CurriculumBuckets = 64
  final val CurriculumTiers = 10L
  /** Sketch relative error for the cut points: at ε=0.001 a bucket's
    * population is within ±0.1 pp of corpus size off its 1/64 target —
    * balance, not exactness, is all the decomposition needs. */
  final val CurriculumQuantileErr = 0.001

  /** Add the sketch-derived `bucket` column to a frame with a
    * `quality_score` column: one approxQuantile pass (over the already-
    * materialized shared frame) yields [[CurriculumBuckets]]-1 cut
    * points, inlined as an array literal; bucket = #cuts ≤ score, a
    * 63-element codegen'd scan per row. */
  private[operators] def scoreBuckets(scored: DataFrame): DataFrame = {
    val probs = (1 until CurriculumBuckets)
      .map(_.toDouble / CurriculumBuckets).toArray
    val cuts = scored.stat.approxQuantile("quality_score", probs,
      CurriculumQuantileErr)
    val cutArr = array(cuts.toIndexedSeq.map(lit): _*)
    scored.withColumn("bucket",
      size(filter(cutArr, c => col("quality_score") >= c)).cast("long"))
  }

  /** Curriculum data ordering: rank every document by ascending quality
    * score (train easy-to-score docs first, the curriculum-learning
    * schedule) and assign decile tiers — rank and tier are what a
    * curriculum dataloader consumes. The global rank decomposes exactly
    * like [[globalShuffle]]: a bucket-partitioned window plus nested
    * exclusive-prefix offsets, no partition-less window anywhere; the
    * oracle is the naive global row_number, so the gate proves the
    * decomposition ≡ the sequential rank. Ordering compares the SAME
    * bit-equal doubles on both engines ([[textStats]]' quality score is
    * oracle-exact), tie-broken by doc_id. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE scoring scan: the quantile sketch, the window, the bucket-count
    // aggregate and the total count all reread this narrow (2-col)
    // materialization — without it each branch re-runs the split/regex
    // quality stage (the packDocs discipline; harness-released via
    // SharedFrames). Bucketing is a cheap projection on the cached rows.
    val scored = scoreBuckets(graft.SharedFrames.shared(
      withQualityInputs(t(spark, dir, "documents"))
        .select(col("doc_id"), qualityScoreCol.as("quality_score"))))
    val inBucket = scored.withColumn("rn",
      row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(col("quality_score"), col("doc_id"))).cast("long"))
    val offsets = exclusivePrefix(
      scored.groupBy(col("bucket")).agg(count(lit(1)).as("bsum")),
      CurriculumBuckets.toLong)
    val total = scored.agg(count(lit(1)).as("n_total"))
    inBucket.join(broadcast(offsets), Seq("bucket"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("quality_score"),
        (col("offset") + col("rn")).as("rank"),
        expr(s"(offset + rn - 1) * $CurriculumTiers div n_total").as("tier"))
      .orderBy(col("doc_id"))
  }

  val curriculumSql: String =
    s"""WITH ts AS ($textStatsSql),
       |r AS (SELECT doc_id, quality_score,
       |        CAST(row_number() OVER (ORDER BY quality_score, doc_id)
       |          AS BIGINT) AS rank
       |      FROM ts),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM r)
       |SELECT doc_id, quality_score, rank,
       |  (rank - 1) * $CurriculumTiers // n_total AS tier
       |FROM r CROSS JOIN n ORDER BY doc_id""".stripMargin

  // ---- deterministic global training-order shuffle ----

  /** Seed prefix for the shuffle key — changing it deals a fresh epoch
    * order; the key is a pure function of (seed, doc_id), so the order is
    * reproducible across engines, runs and partitionings (no RNG). */
  final val ShuffleSeed = "graft-shuffle-1:"

  /** Hex chars of the key that pick the rank bucket: 2 → 256 buckets.
    * Fixed-width lowercase hex compares lexicographically exactly as it
    * does numerically, so bucket order IS key-prefix order — the property
    * the decomposition below rests on. At 100 TB widen the prefix (3 chars
    * → 4096 buckets, 4 → 65536) to keep per-bucket row counts near the
    * target partition size; nothing else changes. */
  final val ShuffleHexChars = 2

  /** Assign every document a deterministic pseudo-random GLOBAL training
    * position (the "shuffle the corpus once per epoch" step trainers need:
    * stable to re-runs, resumable mid-epoch by position range). A naive
    * global `row_number() OVER (ORDER BY key)` funnels the corpus through
    * ONE task; instead the rank decomposes by the key's leading hex bucket:
    * rank within bucket (a PARTITIONED window) + exclusive prefix of bucket
    * counts ([[exclusivePrefix]], the [[packDocs]] machinery — θ-join
    * terminal, no partition-less window at any level). The DuckDB oracle IS
    * the naive global row_number, so the driver gate proves the
    * decomposition ≡ the sequential rank. */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE keying scan shared by the window and the bucket counts (the
    // same single-materialization discipline as [[curriculum]])
    val docs = graft.SharedFrames.shared(t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit(ShuffleSeed), col("doc_id").cast("string"))
          .cast("binary")).as("shuffle_key"))
      .withColumn("bucket",
        conv(substring(col("shuffle_key"), 1, ShuffleHexChars), 16, 10)
          .cast("long")))
    val inBucket = docs.withColumn("rn",
      row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
    val offsets = exclusivePrefix(
      docs.groupBy(col("bucket")).agg(count(lit(1)).as("bsum")),
      (1L << (4 * ShuffleHexChars)) - 1)
    inBucket.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("shuffle_key"),
        (col("offset") + col("rn")).as("position"))
      .orderBy(col("doc_id"))
  }

  val globalShuffleSql: String =
    s"""SELECT doc_id, shuffle_key,
       |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
       |    AS position
       |FROM (SELECT doc_id,
       |        md5('$ShuffleSeed' || CAST(doc_id AS VARCHAR)) AS shuffle_key
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  val packShardsSql: String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / $PackBudget) AS BIGINT) AS shard
       |FROM (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM (SELECT doc_id,
       |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin

  val tfidfTopkSql: String =
    """WITH tk AS (
      |  SELECT doc_id, token FROM
      |    (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |     FROM documents)
      |  WHERE length(token) > 0),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY 1)
      |SELECT doc_id, token, score, rn FROM (
      |  SELECT tf.doc_id, tf.token, CAST(tf.tf AS DOUBLE) / df.df AS score,
      |    CAST(row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.token) AS INT) AS rn
      |  FROM tf JOIN df USING (token))
      |WHERE rn <= 3""".stripMargin

  // ---- BM25 salient-term ranking (Robertson & Zaragoza 2009) ----

  final val Bm25K1 = 1.2d
  final val Bm25B = 0.75d

  /** Per-document top-3 salient terms under the BM25 weighting family
    * (Robertson & Zaragoza, "The probabilistic relevance framework: BM25
    * and beyond", 2009): tf-saturation with document-length normalization
    * (k1=1.2, b=0.75) times an idf factor. The idf is the RATIONAL form
    * (N−df+0.5)/(df+0.5) rather than its log — the [[tfidfTopk]]
    * reproducibility discipline: ln differs by libm ulps across engines
    * while +,−,×,÷ are correctly rounded everywhere, and per term the
    * rational form is a monotone transform of the log form. (Cross-term
    * score MIXING therefore weights rare terms more steeply than log-idf
    * BM25 — a documented engine contract, exactly reproducible, not a
    * numerical accident.)
    *
    * Shape: ONE corpus explode materialized as the shared tf generation
    * (the [[tfidfTopk]] AQE/ReuseExchange trap and its fix), dl as a
    * doc-partitioned window sum over tf (doc-bounded partitions — no
    * second corpus aggregate), df/scalars derived from tf's key set,
    * vocabulary side explicitly broadcast (same caveat as tfidf: a
    * vocabulary beyond executor memory drops the hint for a token-keyed
    * shuffle join). Both windows share the doc_id partitioning — one
    * exchange. */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = graft.SharedFrames.shared(
      tok.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scal = tf.agg(sum(col("tf")).as("total"),
      countDistinct(col("doc_id")).as("nd"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val avgdl = col("total").cast("double") / col("nd").cast("double")
    val idf = ((col("nd") - col("df")).cast("double") + lit(0.5d)) /
      (col("df").cast("double") + lit(0.5d))
    val norm = lit(Bm25K1) * ((lit(1.0d) - lit(Bm25B)) +
      lit(Bm25B) * (col("dl").cast("double") / avgdl))
    val sat = (col("tf").cast("double") * lit(Bm25K1 + 1)) /
      (col("tf").cast("double") + norm)
    tf.withColumn("dl", sum(col("tf")).over(wDoc))
      .join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(scal))
      .withColumn("score", idf * sat)
      .withColumn("rn", row_number().over(
        wDoc.orderBy(col("score").desc, col("token"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("score"), col("rn"))
  }

  val bm25TopkSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, token FROM
       |    (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |     FROM documents)
       |  WHERE length(token) > 0),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
       |       FROM tf GROUP BY 1),
       |sc AS (SELECT CAST(SUM(tf) AS BIGINT) AS total,
       |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM tf),
       |s AS (
       |  SELECT tf.doc_id, tf.token,
       |    ((CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * ((CAST(tf AS DOUBLE) * ${Bm25K1 + 1}) /
       |       (CAST(tf AS DOUBLE)
       |        + ($Bm25K1 * ((1.0 - $Bm25B)
       |           + $Bm25B * (CAST(dl AS DOUBLE)
       |              / (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)))))))
       |      AS score
       |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), sc)
       |SELECT doc_id, token, score, rn FROM (
       |  SELECT doc_id, token, score,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, token) AS INT) AS rn
       |  FROM s)
       |WHERE rn <= 3""".stripMargin

  /** Collocation report size / minimum pair support. */
  final val PmiTopK = 20
  final val PmiMinCnt = 5L

  /** COLLOCATION MINING — the top-[[PmiTopK]] adjacent-token bigrams by
    * PMI-style LIFT `cnt(ab)·N / (cnt(a)·cnt(b))` (how much more often
    * the pair co-occurs than independence predicts — the multiword-
    * expression detector phrase-aware tokenizers and n-gram feature
    * pipelines are seeded with). PMI itself is `log lift`; log is
    * monotone, so ranking by lift IS ranking by PMI while keeping the
    * arithmetic exact: all three counts and their products are BIGINT,
    * and the ONE floating step is the final reported division (two
    * correctly-rounded int→double conversions + one IEEE divide —
    * engine-identical). Pairs below [[PmiMinCnt]] support are dropped
    * (the standard guard: a hapax pair has huge lift and no evidence).
    *
    * Scale shape: bigram mining is ONE doc-partitioned window pass
    * (lead over the in-document sequence); both count tables are
    * partial-combinable aggregations; the unigram table is
    * vocabulary-sized and joins back BROADCAST; top-k is TakeOrdered on
    * (lift DESC, w1, w2) — a total order, so the report is
    * deterministic. */
  def collocationsPmi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "ord", "tok")
      .filter(length(col("tok")) > 0)
    val uni = graft.SharedFrames.shared(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
    val n = uni.agg(sum(col("cnt")).as("n"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
    val bi = toks
      .select(col("tok").as("w1"), lead(col("tok"), 1).over(byDoc).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= PmiMinCnt)
    bi
      .join(broadcast(uni.withColumnRenamed("tok", "w1")
        .withColumnRenamed("cnt", "cnt_a")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("tok", "w2")
        .withColumnRenamed("cnt", "cnt_b")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cnt_ab"), col("cnt_a"),
        col("cnt_b"),
        // products in DECIMAL(38,0): cnt_ab·N overflows int64 at 100 TB
        // token counts (the Sketches/UnigramLm bound discipline); the
        // text→double conversions are correctly rounded in both engines
        ((col("cnt_ab").cast(DecimalType(19, 0)) *
            col("n").cast(DecimalType(19, 0)))
          .cast("string").cast("double") /
          (col("cnt_a").cast(DecimalType(19, 0)) *
            col("cnt_b").cast(DecimalType(19, 0)))
            .cast("string").cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(PmiTopK)
  }

  val collocationsPmiSql: String = OracleSql.materializeCtes(
    s"""WITH toks AS (
       |  SELECT doc_id, tok, ord FROM (
       |    SELECT doc_id,
       |      unnest(string_split(text, ' ')) AS tok,
       |      unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
       |    FROM documents) u
       |  WHERE length(tok) > 0),
       |uni AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
       |nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM uni),
       |bi AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_ab FROM (
       |    SELECT tok AS w1, lead(tok, 1) OVER (
       |      PARTITION BY doc_id ORDER BY ord) AS w2
       |    FROM toks) p
       |  WHERE w2 IS NOT NULL GROUP BY w1, w2
       |  HAVING COUNT(*) >= $PmiMinCnt)
       |SELECT b.w1, b.w2, b.cnt_ab, a.cnt AS cnt_a, c.cnt AS cnt_b,
       |  CAST(CAST(CAST(b.cnt_ab AS DECIMAL(19,0)) * CAST(nn.n AS DECIMAL(19,0))
       |        AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(CAST(a.cnt AS DECIMAL(19,0)) * CAST(c.cnt AS DECIMAL(19,0))
       |        AS VARCHAR) AS DOUBLE) AS lift
       |FROM bi b
       |JOIN uni a ON a.tok = b.w1
       |JOIN uni c ON c.tok = b.w2, nn
       |ORDER BY lift DESC, b.w1, b.w2 LIMIT $PmiTopK""".stripMargin)

  /** TextRank co-occurrence span (over the filtered token sequence). */
  final val TrWindow = 2
  /** Minimum token length admitted to the graph. */
  final val TrMinLen = 3
  /** Fixed-point rank mass / iteration count / report size. */
  final val TrScale = 1L << 20
  final val TrIters = 5
  final val TrTopK = 30

  /** TEXTRANK KEYWORD EXTRACTION — unsupervised corpus keywords as
    * PageRank over the word co-occurrence graph (Mihalcea & Tarau '04):
    * tokens ≥ [[TrMinLen]] chars and not stopwords, an undirected edge
    * between tokens within [[TrWindow]] positions of each other in the
    * FILTERED sequence, then [[TrIters]] fixed-point rank rounds in the
    * exact integer arithmetic of [[GraphRank.pagerankSim]] (BIGINT mass,
    * 17/20 damping as multiply-then-truncate, per-edge pr div deg) — so
    * the whole pipeline, graph mining included, replays bit-identically
    * in SQL. Top [[TrTopK]] tokens by (rank DESC, token).
    *
    * Scale shape: co-occurrence mining is ONE doc-partitioned window
    * pass (both lags share the sort) + a distinct over edge pairs (hash,
    * partial-combinable); the graph is VOCABULARY-sized, not
    * corpus-sized, and each rank round is the textbook equi-join +
    * partial sum. Edges and degrees are mined once and shared across
    * rounds. */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "ord", "tok")
      .filter(length(col("tok")) >= TrMinLen &&
        !col("tok").isInCollection(Stopwords))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
    val lagged = toks.select(col("tok"),
      lag(col("tok"), 1).over(byDoc).as("p1"),
      lag(col("tok"), 2).over(byDoc).as("p2"))
    // both lag pairs AND both edge directions from ONE row-local explode:
    // the prior union-of-unions formulation referenced `lagged` (a
    // corpus-wide window) in four legs, executing it 4× inside the one
    // edge materialization (guide §2.4: duplicated subtrees first). Null
    // lags drop via the src/dst null filter exactly as before.
    val edges = graft.SharedFrames.shared(
      lagged.select(explode(array(
          struct(col("tok").as("src"), col("p1").as("dst")),
          struct(col("p1").as("src"), col("tok").as("dst")),
          struct(col("tok").as("src"), col("p2").as("dst")),
          struct(col("p2").as("src"), col("tok").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct())
    val deg = graft.SharedFrames.shared(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nodes = toks.select(col("tok").as("v")).distinct()
    val n = nodes.count()
    // degenerate corpus (every token filtered): empty report, matching
    // the oracle's empty result — not a division by zero in the base term
    if (n == 0) return nodes.select(col("v").as("token"),
      lit(0L).as("pr"), lit(0L).as("deg"))
    GraphRank.rankRounds(nodes, edges, deg, TrScale, n, TrIters)
      .join(deg.withColumnRenamed("src", "v"), Seq("v"), "left_outer")
      .select(col("v").as("token"), col("pr"),
        coalesce(col("deg"), lit(0L)).as("deg"))
      .orderBy(col("pr").desc, col("token"))
      .limit(TrTopK)
  }

  /** Oracle: graph mining via zipped parallel unnest (token, ordinal),
    * the same two-lag window, and all [[TrIters]] rounds unrolled with
    * identical integer arithmetic. CTEs MATERIALIZED — the edge list
    * feeds every round. */
  val textrankKeywordsSql: String = {
    val iters = GraphRank.rankRoundsSql(TrScale, TrIters)
    val raw =
      s"""WITH toks AS (
         |  SELECT doc_id, tok, ord FROM (
         |    SELECT doc_id,
         |      unnest(string_split(text, ' ')) AS tok,
         |      unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
         |    FROM documents) u
         |  WHERE length(tok) >= $TrMinLen
         |    AND tok NOT IN (${sqlSet(Stopwords)})),
         |lagged AS (
         |  SELECT tok,
         |    lag(tok, 1) OVER w AS p1,
         |    lag(tok, 2) OVER w AS p2
         |  FROM toks
         |  WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
         |rawp AS (
         |  SELECT tok AS a, p1 AS b FROM lagged
         |  WHERE p1 IS NOT NULL AND tok <> p1
         |  UNION ALL
         |  SELECT tok AS a, p2 AS b FROM lagged
         |  WHERE p2 IS NOT NULL AND tok <> p2),
         |edges AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT a AS src, b AS dst FROM rawp
         |    UNION ALL SELECT b AS src, a AS dst FROM rawp) s),
         |nodes AS (SELECT DISTINCT tok AS v FROM toks),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT v, (SELECT $TrScale // n FROM nn) AS pr FROM nodes),
         |$iters
         |SELECT r.v AS token, r.pr, COALESCE(d.deg, 0) AS deg
         |FROM r$TrIters r LEFT JOIN deg d ON d.src = r.v
         |ORDER BY r.pr DESC, token LIMIT $TrTopK""".stripMargin
    OracleSql.materializeCtes(raw)
  }

  /** Winners reported per language by [[chi2Tokens]]. */
  final val Chi2TopK = 10
  /** Tokens seen in fewer documents are not scored (noise floor). */
  final val Chi2MinDf = 5L

  /** χ² FEATURE SELECTION — the top-[[Chi2TopK]] most language-
    * discriminative tokens per language by the chi-squared statistic over
    * the document-level contingency table (the classic text-classification
    * feature selector; the supervised cousin of [[collocationsPmi]]'s
    * association mining — PMI scores token-token affinity, χ² scores
    * token-LABEL affinity): with a = docs of lang L containing t,
    * b = other docs containing t, c = docs of L without t, d = the rest,
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Exactness: all five contingency cells are exact BIGINT document
    * counts; (ad−bc) is staged through DECIMAL(19,0)×BIGINT →
    * DECIMAL(38,0) (never a silent int64 wrap — at 10¹² docs the raw
    * product overflows, the [[collocationsPmi]] lesson), and χ² itself is
    * one fixed left-associated chain of exact int→double conversions,
    * multiplies, and divides — bit-identical across engines. Guards:
    * df ≥ [[Chi2MinDf]] (noise floor) and df < N (a token present in
    * EVERY document has (c+d) = 0 — undefined, and useless as a feature).
    *
    * Scale shape: one distinct-(doc, lang, token) explode, token-keyed
    * count + co-keyed df join (one exchange feeds both — the tf/df
    * [[tfidfTopk]] shape), lang totals broadcast, and the per-lang top-k
    * through the k-bounded partial aggregator ([[graft.functions.TopKAgg]])
    * — a 5-partition lang-keyed WINDOW over the vocabulary would put each
    * language's whole vocabulary into one task's sort (the banned
    * skewed-key window class); the bounded aggregate shuffles ≤ k rows
    * per (partition, lang) instead. Rank identity is a 52-bit md5-prefix
    * key (the [[CorpusOps.prioritySample]] device) so the DuckDB oracle
    * replays the tie order without engine-specific string collation. */
  def chi2Tokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val dt = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0).distinct()
    val totals = broadcast(docs.agg(count(lit(1)).as("n_all")))
    val langTot = broadcast(docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("nl")))
    val byLang = dt.groupBy(col("token"), col("lang"))
      .agg(count(lit(1)).as("a"))
    val byTok = byLang.groupBy(col("token")).agg(sum(col("a")).as("df"))
    val d19 = "decimal(19,0)"
    val dbl = (c: Column) => c.cast("double")
    val scored = graft.SharedFrames.shared(
      byLang.join(byTok, Seq("token"))
        .join(langTot, Seq("lang"))
        .crossJoin(totals)
        .filter(col("df") >= Chi2MinDf && col("df") < col("n_all"))
        .withColumn("b", col("df") - col("a"))
        .withColumn("c", col("nl") - col("a"))
        .withColumn("d", col("n_all") - col("df") - col("nl") + col("a"))
        .withColumn("dd",
          (col("a").cast(d19) * col("d") - col("b").cast(d19) * col("c"))
            .cast("decimal(38,0)"))
        .withColumn("chi2",
          dbl(col("n_all")) * col("dd").cast("string").cast("double")
            * col("dd").cast("string").cast("double")
            / dbl(col("df")) / dbl(col("n_all") - col("df"))
            / dbl(col("nl")) / dbl(col("n_all") - col("nl")))
        .withColumn("hid", expr(
          "cast(conv(substring(md5(cast(token as binary)), 1, 13), 16, 10)" +
            " as bigint)"))
        .select(col("lang"), col("token"), col("a"), col("b"), col("c"),
          col("d"), col("chi2"), col("hid")))
    val topk = graft.functions.TopKAgg.top_k(Chi2TopK)
    val winners = scored.groupBy(col("lang"))
      .agg(topk(col("hid"), col("chi2")).as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("hid"))
    scored.join(broadcast(winners), Seq("lang", "hid"))
      .select(col("lang"), col("rnk"), col("token"), col("a"), col("b"),
        col("c"), col("d"), col("chi2"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Oracle: the identical contingency arithmetic; the rank is a window
    * here (oracles may sort — only the ENGINE side must stay bounded). */
  val chi2TokensSql: String = OracleSql.materializeCtes(
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, lang, token FROM (
       |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
       |    FROM documents) u
       |  WHERE length(token) > 0),
       |nn AS (SELECT COUNT(*) AS n_all FROM documents),
       |lt AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY 1),
       |tl AS (
       |  SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS a
       |  FROM dt GROUP BY 1, 2),
       |tf AS (SELECT token, CAST(SUM(a) AS BIGINT) AS df FROM tl GROUP BY 1),
       |sc AS (
       |  SELECT tl.lang, tl.token, a, df - a AS b, nl - a AS c,
       |    n_all - df - nl + a AS d, df, nl, n_all,
       |    CAST(CAST(a AS DECIMAL(19,0)) * (n_all - df - nl + a)
       |       - CAST(df - a AS DECIMAL(19,0)) * (nl - a)
       |       AS DECIMAL(38,0)) AS dd
       |  FROM tl JOIN tf USING (token) JOIN lt USING (lang) CROSS JOIN nn
       |  WHERE df >= $Chi2MinDf AND df < n_all),
       |sc2 AS (
       |  SELECT lang, token, a, b, c, d,
       |    CAST(n_all AS DOUBLE) * CAST(CAST(dd AS VARCHAR) AS DOUBLE)
       |      * CAST(CAST(dd AS VARCHAR) AS DOUBLE)
       |      / CAST(df AS DOUBLE) / CAST(n_all - df AS DOUBLE)
       |      / CAST(nl AS DOUBLE) / CAST(n_all - nl AS DOUBLE) AS chi2,
       |    CAST(CAST(concat('0x', substring(md5(token), 1, 13)) AS BIGINT)
       |      AS BIGINT) AS hid
       |  FROM sc),
       |r AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
       |    ORDER BY chi2 DESC, hid) AS BIGINT) AS rnk
       |  FROM sc2)
       |SELECT lang, rnk, token, a, b, c, d, chi2
       |FROM r WHERE rnk <= $Chi2TopK
       |ORDER BY lang, rnk""".stripMargin)

  /** Token-hash buckets the positional index is partitioned into. */
  final val IdxBuckets = 64L

  /** Positional postings (doc_id, token, pos) over the raw whitespace
    * token stream — positions are 1-based RAW split ordinals (empty
    * tokens excluded from postings but their ordinals preserved), so
    * "adjacent" means adjacent in the original text in BOTH engines. */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "token")))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"), col("token"), (col("p0") + 1).cast("long").as("pos"))

  /** INVERTED-INDEX PHRASE SEARCH — the search-serving primitive over a
    * WRITTEN positional index: postings (doc, token, position) are
    * materialized partitioned by token-hash bucket
    * (pmod(xxhash64(token), [[IdxBuckets]]) — the [[Similarity]] IVF
    * write-time discipline applied to text), and an exact two-word
    * PHRASE query (the corpus's most frequent adjacent bigram, elected
    * in-engine so the query is self-contained and non-vacuous at every
    * SF) is served by reading ONLY the two buckets the query terms hash
    * to — partition pruning, plan-asserted in spec — then intersecting
    * the two posting lists on (doc_id, pos+1 = pos). Phrase match is
    * something n-gram frequency tables cannot answer (they aggregate
    * counts; this returns the DOCUMENTS and their occurrence counts).
    *
    * Scale shape: the index build is one posexplode + partitioned write,
    * amortized across every query (the SAV-compaction cadence); bigram
    * election is ONE co-keyed self-join on (doc, pos+1) + a
    * partial-combinable min-struct election (never a global sort); the
    * query-side join is (doc_id, pos)-equi-keyed over two pruned posting
    * lists. Counts are exact integers; no floating arithmetic at all. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val postings = graft.SharedFrames.shared(
      postingsOf(t(spark, dir, "documents")))
    val indexPath = graft.SessionResources.scratchDir(spark, "inv_index", dir)
    postings
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(IdxBuckets)))
      .write.partitionBy("bucket").mode("overwrite").parquet(indexPath)
    // elect the most frequent adjacent bigram: (max count, then (w1, w2)
    // lexicographic) as one partial-combinable min-struct — no sort
    val pairs = postings.as("a")
      .join(postings.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.token").as("w1"), col("b.token").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    // the elected bigram IS the query — a 1-row contract-bounded collect
    // (the IVF probe-selection discipline), so the bucket filters below
    // are STATIC literals and probe-time partition pruning is plan-level;
    // both bucket ids ride the election row (no extra job per word)
    val e = pairs
      .agg(min(struct((-col("cnt")).as("neg"), col("w1"), col("w2"))).as("e"))
      .select(col("e.w1"), col("e.w2"),
        pmod(xxhash64(col("e.w1")), lit(IdxBuckets)).as("bk1"),
        pmod(xxhash64(col("e.w2")), lit(IdxBuckets)).as("bk2"))
      .collect()(0)
    val (w1, w2) = (e.getString(0), e.getString(1))
    val (bk1, bk2) = (e.getLong(2), e.getLong(3))
    val idx = spark.read.parquet(indexPath)
    val b1 = idx.filter(col("bucket") === bk1 && col("token") === w1)
      .select(col("doc_id"), col("pos"))
    val b2 = idx.filter(col("bucket") === bk2 && col("token") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    b1.join(b2, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), lit(w1).as("w1"), lit(w2).as("w2"),
        col("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: postings, the bigram election, and the phrase intersection
    * replayed relationally (ordinals via the zipped-unnest device). */
  val phraseSearchSql: String = OracleSql.materializeCtes(
    s"""WITH tk AS (
       |  SELECT doc_id, token, CAST(ord AS BIGINT) AS pos FROM (
       |    SELECT doc_id,
       |      unnest(string_split(text, ' ')) AS token,
       |      unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
       |    FROM documents) u
       |  WHERE length(token) > 0),
       |bg AS (
       |  SELECT a.token AS w1, b.token AS w2, COUNT(*) AS cnt
       |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2),
       |best AS (SELECT w1, w2 FROM bg ORDER BY cnt DESC, w1, w2 LIMIT 1),
       |m AS (
       |  SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM tk a
       |  JOIN best ON a.token = best.w1
       |  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |    AND b.token = best.w2
       |  GROUP BY 1)
       |SELECT m.doc_id, best.w1, best.w2, m.n_hits
       |FROM m CROSS JOIN best
       |ORDER BY m.doc_id""".stripMargin)

  // ---- trained language ID (χ²-selected hashed trigrams + integer NB) ----

  /** Labeled-slice boundary for [[langIdTrained]] (doc_id < cap): the
    * `lang` column IS the label — the stand-in for the labeled sample a
    * real pipeline trains its fastText-style lang-id on. */
  final val LidTrainCap = 200L
  /** Hashed char-trigram feature buckets. */
  final val LidDim = 512L
  /** Pre-bucket polynomial-hash modulus (the [[CorpusOps.QmHashMod]]
    * discipline — keeps the fold's accumulator far from 2^63). */
  final val LidHashMod = 1L << 20
  /** χ²-selected buckets kept per language. */
  final val LidSelK = 64

  /** Hashed char-trigram rows (doc_id, lang, j): every length-3 character
    * window of the text → the [[CorpusOps]] polynomial code-point hash →
    * bucket. Docs under 3 chars have no features (both faces filter
    * identically; scoring falls back to the prior). */
  private def lidTrigrams(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, char_length(text) - 2)," +
          " i -> substring(text, i, 3))")).as("tg"))
      .withColumn("j", expr(
        s"""aggregate(
           |  transform(sequence(1, 3),
           |            i -> CAST(ascii(substring(tg, i, 1)) AS BIGINT)),
           |  CAST(0 AS BIGINT),
           |  (a, cp) -> (a * 31 + cp) % $LidHashMod) % $LidDim""".stripMargin))
      .select(col("doc_id"), col("lang"), col("j"))

  /** TRAINED LANGUAGE ID — the learned companion of the fixed-marker
    * [[langDetect]] heuristic, composing the suite's two training
    * primitives exactly as a production lang-id does:
    *
    *  1. FEATURES: hashed char trigrams ([[lidTrigrams]] — the signal
    *     fastText lang-id models actually use; zh needs no tokenizer);
    *  2. SELECTION: per-language χ² over exact doc-level contingency
    *     cells on the labeled slice — the [[chi2Tokens]] arithmetic on
    *     bucket ids, top-[[LidSelK]] per language through the k-bounded
    *     partial aggregator with the id tie-break, union over languages;
    *  3. TRAINING: multinomial Naive Bayes on the slice's selected-bucket
    *     counts, all arithmetic exact — add-1 smoothed per-class costs
    *     −log2((c+1)/(tot+V)) and class priors in
    *     [[UnigramLm.withIlog2]]'s Q8 fixed point (no transcendental
    *     between the engines);
    *  4. SCORING (the corpus-sized part): per-doc bucket counts semi-join
    *     the ≤5·[[LidSelK]] selected set, one broadcast join to the
    *     weight table, one partial-combinable (doc, lang) aggregate, and
    *     min(struct(cost, lang)) elects the prediction deterministically;
    *     featureless docs fall back to the prior-argmin class.
    *
    * The ORACLE replays everything — hashing, the χ² election, the
    * fixed-point logs, scoring — so the gate certifies the TRAINING.
    * LangIdSpec pins held-out accuracy above both the majority baseline
    * and the marker heuristic.
    *
    * 100 TB shape: training is slice-sized by the labeled-slice premise;
    * scoring is one explode + hash per document, a broadcast weight
    * table, and map-side-combinable aggregates — no shuffle wider than
    * (doc, bucket).
    *
    * DOMAIN: all valid Unicode — both faces window and hash true
    * codepoints (astral planes included; a real crawl has emoji on page
    * one), verified by probe and pinned in LangIdSpec. Unpaired
    * surrogate halves cannot reach this operator: Spark's UTF-8 string
    * domain normalizes them at every entry (JVM encoder → '?',
    * malformed bytes → U+FFFD), so no guard is needed — pinned in
    * LangIdSpec's boundary test. */
  def langIdTrained(spark: SparkSession, dir: String): DataFrame =
    langIdTrainedFrom(t(spark, dir, "documents"))

  /** [[langIdTrained]] over an explicit (doc_id, text, lang) frame — the
    * spec hook: the corpus's `lang` labels are SYNTHETIC (every language
    * draws from one shared vocabulary — see [[langDetect]]'s note), so
    * chance-level corpus accuracy is a DATA property; LangIdSpec feeds a
    * constructed corpus with real per-language character distributions
    * and pins near-perfect held-out accuracy there. */
  private[operators] def langIdTrainedFrom(docs: DataFrame): DataFrame = {
    import graft.operators.{UnigramLm => UL}
    val slice = docs.filter(col("doc_id") < LidTrainCap)
    // TRAINING = two bounded driver collects (the qualityModelWeights
    // discipline — labels are expensive, so the slice is small at ANY
    // corpus size): per-(lang, bucket) presence + multiplicity cells in
    // one aggregate, per-lang doc counts in another. The χ² election and
    // the Q8 log costs run driver-side in the same exact arithmetic the
    // in-engine twins use ([[UnigramLm.ilog2Long]]); the unrolled SQL
    // oracle replays all of it, so the gate certifies this training.
    val cells = lidTrigrams(slice)
      .groupBy(col("lang"), col("j"))
      .agg(countDistinct(col("doc_id")).as("a"), count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val classCnt = slice.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nAll = classCnt.values.sum
    val dfJ = cells.groupBy(_._2).map { case (j, cs) => j -> cs.map(_._3).sum }
    // χ² per (lang, bucket): the exact chi2Tokens arithmetic — BigInt
    // (ad−bc), then the identical left-to-right IEEE division chain
    val chi2 = cells.flatMap { case (lang, j, a, _) =>
      val df = dfJ(j); val nl = classCnt(lang)
      if (df < 2 || df >= nAll) None
      else {
        val d = nAll - df - nl + a
        val dd = BigInt(a) * d - BigInt(df - a) * (nl - a)
        val ddD = dd.toString.toDouble
        Some((lang, j,
          nAll.toDouble * ddD * ddD / df.toDouble / (nAll - df).toDouble
            / nl.toDouble / (nAll - nl).toDouble))
      }
    }
    // top-K per language by (chi2 DESC, j ASC) — the TopKAgg order
    val selJs = chi2.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy { case (_, j, x2) => (-x2, j) }.take(LidSelK).map(_._2)
    }.toArray.distinct.sorted
    val selSet = selJs.toSet
    val nSel = selJs.length.toLong
    // multinomial NB with add-1 smoothing over the selected buckets,
    // costs −log2((c+1)/(tot+V)) and priors −log2(nl/N) in Q8 fixed point
    val langs = classCnt.keys.toArray.sorted
    val cntMap = cells.collect {
      case (lang, j, _, c) if selSet(j) => (lang, j) -> c
    }.toMap
    val wMap: Map[String, Map[Long, Long]] = langs.map { l =>
      val tot = selJs.map(j => cntMap.getOrElse((l, j), 0L)).sum
      val lt = UL.ilog2Long(tot + nSel)
      l -> selJs.map { j =>
        j -> (lt - UL.ilog2Long(cntMap.getOrElse((l, j), 0L) + 1))
      }.toMap
    }.toMap
    val priorMap = langs.map { l =>
      l -> (UL.ilog2Long(nAll) - UL.ilog2Long(classCnt(l)))
    }.toMap
    // SCORING — the corpus-sized pass is ONE narrow projection: hash
    // each trigram to its bucket ONCE, look up the 5-language cost
    // vector in a typedlit map (a real Literal — no per-row map
    // construction), and array-accumulate all languages in one fold (the
    // PCA-basis / LSH-plane literal pattern). No explode row blow-up, no
    // join, no shuffle; least(struct) elects the prediction.
    val zeroVec = langs.toSeq.map(_ => 0L)
    // bucket-indexed cost-vector table (dense [0, LidDim) domain): O(1)
    // array indexing per trigram — a literal MAP's element_at is a
    // linear key scan, measured 3× slower over the corpus
    val wTable: Seq[Seq[Long]] = (0L until LidDim).map { j =>
      if (selSet(j)) langs.toSeq.map(l => wMap(l)(j)) else zeroVec
    }
    // per-char closed form of the 3-step (h·31 + cp) % m fold — congruent
    // since every operand stays far below 2^63 (cp < 2^21: the Unicode
    // ceiling is 0x10FFFF, ×961) — over a codepoint ARRAY built once per
    // doc: positional substring() on a long UTF8 string is an O(i) scan
    // (O(len²) per doc, measured 2×).
    // FULL-UNICODE DOMAIN (r14 verdict task 3): both faces window over
    // true CODEPOINTS — Spark's split(text, '') never splits a surrogate
    // pair and ascii() returns the full codepoint (128169 for U+1F4A9,
    // probe-verified), exactly like DuckDB's substring/ascii — so astral
    // text (emoji, supplementary CJK) hashes identically in both
    // engines; LangIdSpec pins the astral path end to end. Unpaired
    // surrogate halves need NO guard: Spark's string domain is UTF-8
    // (UTF8String), which cannot represent them — the JVM encoder
    // normalizes a lone half to '?' at every Dataset/literal entry
    // (probe: D83D arrives as 003F, LangIdSpec pins it) and malformed
    // parquet bytes decode to U+FFFD — so every string this expression
    // can ever see is valid Unicode, hashed identically by both
    // engines. (An rlike guard here cost a full regex scan per doc and
    // was UNREACHABLE — caught when a spec tried to trigger it.)
    val cps = expr(
      "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))")
    val jArr = expr(
      s"""CASE WHEN char_length(text) >= 3 THEN
         |  transform(sequence(1, char_length(text) - 2),
         |    i -> (element_at(_cps, i) * 961
         |          + element_at(_cps, i + 1) * 31
         |          + element_at(_cps, i + 2))
         |         % $LidHashMod % $LidDim)
         |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
    val sums = aggregate(col("_jarr"), typedlit(zeroVec),
      (acc, j) => zip_with(acc,
        element_at(typedlit(wTable), (j + 1).cast("int")),
        (x, y) => x + y))
    val bst = least(langs.toSeq.zipWithIndex.map { case (l, i) =>
      struct((element_at(col("_sums"), i + 1) + priorMap(l)).as("score"),
        lit(l).as("lang"))
    }: _*)
    docs
      // the scoring projection otherwise runs inside the one-partition
      // scan stage of a small parquet (the pcaCovariance lesson): spread
      // the RAW docs first — the shuffle moves input bytes, not work
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("_cps", cps)
      .withColumn("_jarr", jArr)
      .withColumn("_sums", sums)
      .select(col("doc_id"), col("lang").as("lang_true"), bst.as("b"))
      .select(col("doc_id"), col("lang_true"),
        col("b.lang").as("lang_pred"), col("b.score").as("cost"))
      .withColumn("correct", col("lang_pred") === col("lang_true"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[langIdTrained]]: hashing, the χ² election, the Q8
    * fixed-point logs ([[UnigramLm.ilog2SqlCtes]] — one copy of the log
    * twin), scoring and the prior fallback, all unrolled. */
  lazy val langIdTrainedSql: String = OracleSql.materializeCtes(
    s"""WITH tg AS (
       |  SELECT doc_id, lang,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, 4),
       |                       i -> CAST(ascii(tgs[i:i]) AS BIGINT))),
       |      (a, cp) -> (a * 31 + cp) % $LidHashMod) % $LidDim AS j
       |  FROM (SELECT doc_id, lang,
       |          unnest(list_transform(range(1, length(text) - 1),
       |                                i -> substring(text, i, 3))) AS tgs
       |        FROM documents WHERE length(text) >= 3)),
       |sl AS (SELECT * FROM tg WHERE doc_id < $LidTrainCap),
       |dtt AS (SELECT DISTINCT doc_id, lang, j FROM sl),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM documents
       |       WHERE doc_id < $LidTrainCap),
       |lt0 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM documents
       |        WHERE doc_id < $LidTrainCap GROUP BY 1),
       |bl AS (SELECT j, lang, CAST(COUNT(*) AS BIGINT) AS a
       |       FROM dtt GROUP BY 1, 2),
       |bj AS (SELECT j, CAST(SUM(a) AS BIGINT) AS df FROM bl GROUP BY 1),
       |scc AS (
       |  SELECT bl.lang, bl.j, a, df, nl, n_all,
       |    CAST(CAST(a AS DECIMAL(19,0)) * (n_all - df - nl + a)
       |       - CAST(df - a AS DECIMAL(19,0)) * (nl - a)
       |       AS DECIMAL(38,0)) AS dd
       |  FROM bl JOIN bj USING (j) JOIN lt0 USING (lang) CROSS JOIN nn
       |  WHERE df >= 2 AND df < n_all),
       |sc2 AS (
       |  SELECT lang, j,
       |    CAST(n_all AS DOUBLE) * CAST(CAST(dd AS VARCHAR) AS DOUBLE)
       |      * CAST(CAST(dd AS VARCHAR) AS DOUBLE)
       |      / CAST(df AS DOUBLE) / CAST(n_all - df AS DOUBLE)
       |      / CAST(nl AS DOUBLE) / CAST(n_all - nl AS DOUBLE) AS chi2
       |  FROM scc),
       |rk AS (SELECT lang, j, row_number() OVER (PARTITION BY lang
       |         ORDER BY chi2 DESC, j) AS rnk FROM sc2),
       |sel AS (SELECT DISTINCT j FROM rk WHERE rnk <= $LidSelK),
       |nsel AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM sel),
       |cnt AS (SELECT lang, j, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM sl JOIN sel USING (j) GROUP BY 1, 2),
       |grid AS (
       |  SELECT l.lang, s.j, COALESCE(c.c, 0) + 1 AS c1
       |  FROM (SELECT lang FROM lt0) l CROSS JOIN sel s
       |  LEFT JOIN cnt c ON c.lang = l.lang AND c.j = s.j),
       |tots AS (SELECT lang, CAST(SUM(c1 - 1) AS BIGINT) AS tot
       |         FROM grid GROUP BY 1),
       |tots2 AS (SELECT lang, tot + v AS tv FROM tots CROSS JOIN nsel),
       |${UnigramLm.ilog2SqlCtes("grid", "c1", Seq("lang", "j"), "glp", "lp")},
       |${UnigramLm.ilog2SqlCtes("tots2", "tv", Seq("lang"), "glt", "lt")},
       |wts AS (SELECT glp.lang, glp.j, glt.lt - glp.lp AS w
       |        FROM glp JOIN glt USING (lang)),
       |pr0 AS (SELECT lang, nl, n_all FROM lt0 CROSS JOIN nn),
       |${UnigramLm.ilog2SqlCtes("pr0", "n_all", Seq("lang", "nl"), "pna", "ln")},
       |${UnigramLm.ilog2SqlCtes("pna", "nl", Seq("lang", "ln"), "pnl", "lnl")},
       |pri AS (SELECT lang, ln - lnl AS pc FROM pnl),
       |xf AS (SELECT doc_id, j, CAST(COUNT(*) AS BIGINT) AS x
       |       FROM tg JOIN sel USING (j) GROUP BY 1, 2),
       |pl AS (SELECT xf.doc_id, w.lang, CAST(SUM(xf.x * w.w) AS BIGINT) AS sc
       |       FROM xf JOIN wts w USING (j) GROUP BY 1, 2),
       |pls AS (SELECT pl.doc_id, pl.lang, pl.sc + pri.pc AS score
       |        FROM pl JOIN pri USING (lang)),
       |best AS (SELECT doc_id, lang AS plang, score,
       |           row_number() OVER (PARTITION BY doc_id
       |             ORDER BY score, lang) AS rn
       |         FROM pls),
       |dflt AS (SELECT lang AS dl, pc AS ds FROM pri
       |         ORDER BY pc, lang LIMIT 1)
       |SELECT d.doc_id, d.lang AS lang_true,
       |  COALESCE(b.plang, dflt.dl) AS lang_pred,
       |  CAST(COALESCE(b.score, dflt.ds) AS BIGINT) AS cost,
       |  COALESCE(b.plang, dflt.dl) = d.lang AS correct
       |FROM documents d
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
       |CROSS JOIN dflt
       |ORDER BY d.doc_id""".stripMargin)
}
