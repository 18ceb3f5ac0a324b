package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** UNIGRAM-LM TOKENIZER (the SentencePiece family's other member, beside
  * the [[CorpusOps]] BPE suite): a piece vocabulary trained by hard-EM
  * Viterbi over candidate substrings, entirely in EXACT integer
  * arithmetic so training — substring mining, likelihood scores, the
  * per-word Viterbi DP, usage re-estimation, the final election — replays
  * bit-identically in SQL; and the train→apply loop
  * ([[unigramEncode]]) that re-segments the corpus with the PRUNED
  * vocabulary, the production path every token budget depends on.
  *
  * Algorithm (one hard-EM round, the standard simplification):
  *  1. Candidate pieces = all substrings of length 1..[[MaxPieceLen]] of
  *     the distinct corpus words, counted with positional multiplicity ×
  *     word frequency. Single chars are always kept (segmentability);
  *     multi-char pieces need count ≥ [[MinCandCnt]] and a
  *     (count DESC, piece) election caps them at [[CandCap]].
  *  2. Piece cost = L(T) − L(count), L = [[withIlog2]]'s Q8 fixed-point
  *     log2 — i.e. −log2 relative frequency in 1/256 bits, non-negative
  *     integers, so min-plus DP needs no floating point and no negative
  *     division (where Spark `div` truncates but DuckDB `//` floors).
  *  3. Viterbi: each distinct word's min-cost segmentation — a shortest
  *     path on the position DAG, ties to the smallest parent position.
  *     Physically a bounded-group kernel (see [[viterbiPieces]]); the
  *     ORACLE proves the semantics declaratively by unrolling
  *     [[MaxWordLen]] min-plus relaxation rounds in the
  *     [[GraphRank.graphBfs]] shape, the (cost, parent) pair packed into
  *     ONE BIGINT `cost·[[TieBase]] + j`.
  *  4. Backtrack [[MaxWordLen]] parent-pointer hops emit each word's
  *     piece sequence; usage counts re-estimate piece frequencies.
  *  5. Final vocabulary: top-[[VocabK]] pieces by (usage DESC, piece),
  *     plus all single chars (never prunable).
  *
  * Scale shape: EVERYTHING between the one word-count aggregation and
  * the final per-doc rollup is VOCABULARY-sized (distinct words ×
  * ≤[[MaxWordLen]] positions), never corpus-sized. Words longer than
  * [[MaxWordLen]] are excluded by contract (none exist in the test
  * corpus; at production scale they'd be pre-split). All counts must
  * stay < 2^62 (the log2 mantissa path is branch-guarded for both small
  * and large magnitudes).
  */
object UnigramLm {

  final val MaxWordLen = 8
  final val MaxPieceLen = 4
  final val MinCandCnt = 2L
  final val CandCap = 512
  /** Deliberately below the used-piece count at every SF, so pruning
    * BITES: the apply pass re-segments some words differently than
    * training did (UnigramLmSpec pins this non-vacuity). */
  final val VocabK = 32
  /** Parent-position packing base — must exceed [[MaxWordLen]]. */
  final val TieBase = 32L

  private final val MantScale = 1L << 20 // mantissa in [2^20, 2^21)

  /** Q8 fixed-point log2: appends `out` = floor(256·log2(x)) to a frame,
    * via 6 binary-search msb steps + 8 mantissa-squaring fraction bits —
    * every step a BIGINT comparison/multiply/truncating-divide, int64-safe
    * for x < 2^62 (the mantissa is right-shifted for msb > 20 instead of
    * left-shifting x). The SQL twin is [[ilog2SqlCtes]]. */
  private[operators] def withIlog2(df: DataFrame, x: String, out: String): DataFrame = {
    var d = df.withColumn("_v", col(x).cast("long"))
      .withColumn("_s", lit(0L)).withColumn("_p", lit(1L))
    Seq(32, 16, 8, 4, 2, 1).foreach { k =>
      val tw = 1L << k
      val c = col("_v") >= lit(tw)
      d = d
        .withColumn("_s2", when(c, col("_s") + k).otherwise(col("_s")))
        .withColumn("_p2", when(c, col("_p") * tw).otherwise(col("_p")))
        .withColumn("_v2", when(c, expr(s"_v div $tw")).otherwise(col("_v")))
        .drop("_s", "_p", "_v")
        .withColumnRenamed("_s2", "_s").withColumnRenamed("_p2", "_p")
        .withColumnRenamed("_v2", "_v")
    }
    d = d.withColumn("_m",
        when(col("_p") > lit(MantScale),
          expr(s"cast($x as bigint) div (_p div $MantScale)"))
          .otherwise(expr(s"(cast($x as bigint) * $MantScale) div _p")))
      .withColumn("_f", lit(0L))
    (1 to 8).foreach { _ =>
      d = d.withColumn("_m2", expr(s"(_m * _m) div $MantScale"))
        .withColumn("_b", (col("_m2") >= lit(2L * MantScale)).cast("long"))
        .withColumn("_f2", col("_f") * 2 + col("_b"))
        .withColumn("_m3", when(col("_b") === 1L, expr("_m2 div 2"))
          .otherwise(col("_m2")))
        .drop("_m", "_f", "_m2", "_b")
        .withColumnRenamed("_f2", "_f").withColumnRenamed("_m3", "_m")
    }
    d.withColumn(out, col("_s") * 256L + col("_f"))
      .drop("_v", "_s", "_p", "_m", "_f")
  }

  /** Driver-side twin of [[withIlog2]] (the third face, beside
    * [[ilog2SqlCtes]]): the same msb walk and mantissa squaring in plain
    * Long arithmetic — for bounded-collect training paths
    * ([[TextAnalysis.langIdTrained]]) whose SQL oracle replays the CTE
    * chain. Callers keep x in [1, 2^62); all operands stay nonnegative so
    * JVM `/` matches both engines' truncating division. */
  private[operators] def ilog2Long(x: Long): Long = {
    var v = x; var s = 0L; var p = 1L
    Seq(32, 16, 8, 4, 2, 1).foreach { k =>
      val tw = 1L << k
      if (v >= tw) { v /= tw; s += k; p *= tw }
    }
    var m = if (p > MantScale) x / (p / MantScale) else (x * MantScale) / p
    var f = 0L
    (1 to 8).foreach { _ =>
      var m2 = (m * m) / MantScale
      val b = if (m2 >= 2L * MantScale) 1L else 0L
      f = f * 2 + b
      if (b == 1L) m2 /= 2
      m = m2
    }
    s * 256 + f
  }

  /** Distinct corpus words with frequencies — the ONE corpus-sized pass. */
  private[operators] def wordsOf(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))

  /** Every substring occurrence (w, wcnt, j, i, piece), vocabulary ×
    * ≤[[MaxWordLen]]·[[MaxPieceLen]] rows. */
  private def occsOf(words: DataFrame): DataFrame =
    words
      .select(col("w"), col("wcnt"),
        explode(sequence(lit(0), lit(MaxWordLen - 1))).as("j"))
      .filter(col("j") < length(col("w")))
      .select(col("w"), col("wcnt"), col("j"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("j") + col("l") <= length(col("w")))
      .select(col("w"), col("wcnt"), col("j"), (col("j") + col("l")).as("i"),
        expr("substring(w, j + 1, l)").as("piece"))

  /** Candidate vocabulary with integer costs: singles ∪ capped multis,
    * cost = L(T) − L(cnt). Shared (consumed by edges AND the election). */
  private def scoredOf(occ: DataFrame): DataFrame = {
    val cand = occ.groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
    val v0 = graft.SharedFrames.sharedLazy(
      cand.filter(length(col("piece")) === 1)
        .union(cand.filter(length(col("piece")) > 1 &&
            col("cnt") >= MinCandCnt)
          .orderBy(col("cnt").desc, col("piece")).limit(CandCap)))
    val tLog = withIlog2(v0.agg(sum(col("cnt")).as("tcnt")), "tcnt", "lt")
    graft.SharedFrames.sharedLazy(
      withIlog2(v0, "cnt", "lp")
        .crossJoin(broadcast(tLog.select(col("lt"))))
        .select(col("piece"), col("cnt"), (col("lt") - col("lp")).as("cost")))
  }

  /** Min-plus Viterbi of every word against a (piece, cost) table:
    * the (w, piece) MULTISET of each word's optimal segmentation, ties
    * to the smallest parent position.
    *
    * Physical form: a BOUNDED-GROUP kernel — each word's ≤
    * [[MaxWordLen]]·[[MaxPieceLen]] candidate edges flow through ONE
    * shuffle into `flatMapGroups`, where the ≤(MaxWordLen+1)-cell DP
    * runs in plain integer Scala. The declarative alternative (min-plus
    * relaxation rounds, the [[GraphRank.graphBfs]] shape — and exactly
    * what the ORACLE unrolls, so the semantics stay SQL-proven) needs
    * [[MaxWordLen]] driver-scheduled join+agg rounds whose fixed
    * per-round cost dominated the query at every SF (measured 6–12 s/
    * pass); group state here is contract-bounded, so the kernel is the
    * honest physical choice, not an Expression stand-in. The DP is
    * edge-order-independent (ties resolve by parent position, not
    * arrival), so partial shuffles cannot perturb it. */
  private def viterbiPieces(words: DataFrame, occ: DataFrame,
      costs: DataFrame): DataFrame = {
    val ss = occ.sparkSession
    import ss.implicits._
    occ.join(broadcast(costs.select(col("piece"), col("cost"))), Seq("piece"))
      .select(col("w"), col("j").cast("int"), col("i").cast("int"),
        col("cost"))
      .as[(String, Int, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (w, it) =>
        val edges = it.toArray
        val n = w.length
        val dp = Array.fill(n + 1)(Long.MaxValue / 2)
        val par = Array.fill(n + 1)(-1)
        dp(0) = 0L
        var i = 1
        while (i <= n) {
          edges.foreach { e =>
            if (e._3 == i) {
              val v = dp(e._2) + e._4
              if (v < dp(i) || (v == dp(i) && e._2 < par(i))) {
                dp(i) = v; par(i) = e._2
              }
            }
          }
          i += 1
        }
        var pieces = List.empty[(String, String)]
        var pos = n
        while (pos > 0) {
          pieces = (w, w.substring(par(pos), pos)) :: pieces
          pos = par(pos)
        }
        pieces.iterator
      }
      .toDF("w", "piece")
  }

  /** Usage-elected final vocabulary (with candidate stats): top
    * [[VocabK]] by (usage DESC, piece) ∪ all single chars. */
  private def electedOf(words: DataFrame, occ: DataFrame,
      scored: DataFrame): DataFrame = {
    val used = viterbiPieces(words, occ, scored)
      .join(words, Seq("w"))
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("used_cnt"))
    // fin embeds the whole Viterbi kernel (via `used`) and is consumed
    // by BOTH election legs — shared, or the kernel runs twice
    val fin = graft.SharedFrames.sharedLazy(
      scored.join(used, Seq("piece"), "left_outer")
        .select(col("piece"), col("cnt"), col("cost"),
          coalesce(col("used_cnt"), lit(0L)).as("used_cnt")))
    fin.orderBy(col("used_cnt").desc, col("piece")).limit(VocabK)
      .union(fin.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** The trained vocabulary, ordered (usage DESC, piece). */
  def unigramLmVocab(spark: SparkSession, dir: String): DataFrame = {
    val words = graft.SharedFrames.sharedLazy(wordsOf(spark, dir))
    val occ = graft.SharedFrames.sharedLazy(occsOf(words))
    electedOf(words, occ, scoredOf(occ))
      .orderBy(col("used_cnt").desc, col("piece"))
  }

  /** TRAIN → APPLY: re-segment the corpus with the PRUNED vocabulary
    * (same costs, elected pieces only — singles keep every word
    * segmentable) and roll per-word piece counts up to each document:
    * (doc_id, n_words, n_pieces, n_chars, chars-per-piece ratio), the
    * token-budget question a tokenizer exists to answer. The second
    * Viterbi is vocabulary-sized like the first; the ONLY corpus-sized
    * stage is the final rollup — explode, one broadcast join against the
    * ≤(VocabK + singles)-row per-word stats, one partial-combinable
    * aggregation. Docs whose every word is out of contract (len >
    * [[MaxWordLen]]) drop out, mirrored by the oracle's inner join. */
  def unigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val words = graft.SharedFrames.sharedLazy(wordsOf(spark, dir))
    val occ = graft.SharedFrames.sharedLazy(occsOf(words))
    val scored = scoredOf(occ)
    // elected and perWord each have ONE consumer — no materialization
    val elected = electedOf(words, occ, scored)
      .select(col("piece"), col("cost"))
    val perWord = viterbiPieces(words, occ, elected)
      .groupBy(col("w")).agg(count(lit(1)).as("n_pieces"))
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .join(broadcast(perWord), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(length(col("w"))).cast("long").as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"), col("n_chars"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("ratio"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // oracle SQL
  // ------------------------------------------------------------------

  /** Emits the CTE chain computing [[withIlog2]] in DuckDB over `src`
    * (carrying `keep`), final CTE named `dst` with column `out`. */
  private[operators] def ilog2SqlCtes(src: String, xCol: String, keep: Seq[String],
      dst: String, out: String): String = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = src
    var idx = 0
    def cte(name: String, body: String): Unit = {
      steps += s"$name AS ($body)"; prev = name
    }
    def next(body: String): Unit = { idx += 1; cte(s"${dst}_$idx", body) }
    val kc = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    next(s"SELECT $kc CAST($xCol AS BIGINT) AS x, CAST($xCol AS BIGINT) AS v, " +
      s"CAST(0 AS BIGINT) AS s, CAST(1 AS BIGINT) AS p FROM $src")
    Seq(32, 16, 8, 4, 2, 1).foreach { k =>
      val tw = 1L << k
      next(s"SELECT $kc x, " +
        s"CASE WHEN v >= $tw THEN v // $tw ELSE v END AS v, " +
        s"CASE WHEN v >= $tw THEN s + $k ELSE s END AS s, " +
        s"CASE WHEN v >= $tw THEN p * $tw ELSE p END AS p FROM $prev")
    }
    next(s"SELECT $kc x, s, " +
      s"CASE WHEN p > $MantScale THEN x // (p // $MantScale) " +
      s"ELSE (x * $MantScale) // p END AS m, CAST(0 AS BIGINT) AS f FROM $prev")
    (1 to 8).foreach { _ =>
      next(s"SELECT $kc x, s, " +
        s"CASE WHEN (m*m) // $MantScale >= ${2L * MantScale} " +
        s"THEN ((m*m) // $MantScale) // 2 ELSE (m*m) // $MantScale END AS m, " +
        s"f*2 + CASE WHEN (m*m) // $MantScale >= ${2L * MantScale} " +
        s"THEN 1 ELSE 0 END AS f FROM $prev")
    }
    cte(dst, s"SELECT $kc s * 256 + f AS $out FROM $prev")
    steps.mkString(",\n")
  }

  /** [[MaxWordLen]] relaxation-round CTEs `${pre}1..${pre}N` over
    * `${pre}0` and `edgesCte`. */
  private def relaxSqlCtes(pre: String, edgesCte: String): String =
    (1 to MaxWordLen).map { k =>
      s"""$pre$k AS (
         |  SELECT w, pos, MIN(enc) AS enc FROM (
         |    SELECT w, pos, enc FROM $pre${k - 1}
         |    UNION ALL
         |    SELECT e.w, e.i AS pos, ((r.enc // $TieBase) + e.cost) * $TieBase + e.j AS enc
         |    FROM $pre${k - 1} r JOIN $edgesCte e ON e.w = r.w AND e.j = r.pos) u
         |  GROUP BY w, pos)""".stripMargin
    }.mkString(",\n")

  /** Backtrack CTEs: hops `${hp}1..` / positions `${bp}1..` over
    * `${bp}0` and the converged `relaxLast`; returns (ctes, piece legs). */
  private def backSqlCtes(hp: String, bp: String, relaxLast: String)
      : (String, String) = {
    val ctes = (1 to MaxWordLen).map { k =>
      s"""$hp$k AS (
         |  SELECT b.w, b.pos, CAST(p.enc % $TieBase AS INT) AS jprev
         |  FROM $bp${k - 1} b JOIN $relaxLast p
         |    ON p.w = b.w AND p.pos = b.pos
         |  WHERE b.pos > 0),
         |$bp$k AS (SELECT w, jprev AS pos FROM $hp$k)""".stripMargin
    }.mkString(",\n")
    val legs = (1 to MaxWordLen).map { k =>
      s"SELECT w, substring(w, jprev + 1, pos - jprev) AS piece FROM $hp$k"
    }.mkString("\n  UNION ALL\n  ")
    (ctes, legs)
  }

  /** Shared training chain: wtab → … → `sel` (the elected vocabulary). */
  private def trainSqlCtes: String = {
    val (backCtes, pieceLegs) = backSqlCtes("s", "b", s"r$MaxWordLen")
    s"""wtab AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wcnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE length(w) BETWEEN 1 AND $MaxWordLen GROUP BY w),
       |occ AS (
       |  SELECT w.w, w.wcnt, j.j, j.j + l.l AS i,
       |    substring(w.w, CAST(j.j + 1 AS INT), CAST(l.l AS INT)) AS piece
       |  FROM wtab w, range(0, $MaxWordLen) j(j), range(1, ${MaxPieceLen + 1}) l(l)
       |  WHERE j.j < length(w.w) AND j.j + l.l <= length(w.w)),
       |cand AS (
       |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS cnt FROM occ GROUP BY piece),
       |v0 AS (
       |  SELECT piece, cnt FROM cand WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM cand
       |    WHERE length(piece) > 1 AND cnt >= $MinCandCnt
       |    ORDER BY cnt DESC, piece LIMIT $CandCap) tq),
       |tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tcnt FROM v0),
       |${ilog2SqlCtes("tt", "tcnt", Seq.empty, "ttl", "lt")},
       |${ilog2SqlCtes("v0", "cnt", Seq("piece", "cnt"), "v0l", "lp")},
       |scored AS (
       |  SELECT piece, cnt, (SELECT lt FROM ttl) - lp AS cost FROM v0l),
       |edges AS (
       |  SELECT o.w, o.j, o.i, s.cost FROM occ o JOIN scored s USING (piece)),
       |r0 AS (SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS enc
       |       FROM wtab),
       |${relaxSqlCtes("r", "edges")},
       |b0 AS (SELECT w, CAST(length(w) AS BIGINT) AS pos FROM wtab),
       |$backCtes,
       |pieces AS (
       |  $pieceLegs),
       |used AS (
       |  SELECT p.piece, CAST(SUM(w.wcnt) AS BIGINT) AS used_cnt
       |  FROM pieces p JOIN wtab w USING (w) GROUP BY p.piece),
       |fin AS (
       |  SELECT s.piece, s.cnt, s.cost, COALESCE(u.used_cnt, 0) AS used_cnt
       |  FROM scored s LEFT JOIN used u USING (piece)),
       |sel AS (
       |  SELECT * FROM (
       |    SELECT * FROM fin ORDER BY used_cnt DESC, piece LIMIT $VocabK) a
       |  UNION
       |  SELECT * FROM fin WHERE length(piece) = 1)""".stripMargin
  }

  /** Oracle: the full training replay — mining, both log chains, edges,
    * [[MaxWordLen]] relaxation rounds, [[MaxWordLen]] backtrack hops,
    * re-estimation, election. CTEs MATERIALIZED (deep reuse). */
  val unigramLmVocabSql: String = OracleSql.materializeCtes(
    s"""WITH $trainSqlCtes
       |SELECT piece, cnt, cost, used_cnt FROM sel
       |ORDER BY used_cnt DESC, piece""".stripMargin)

  /** Oracle: training replay + the SECOND Viterbi against the elected
    * vocabulary + the per-doc rollup. */
  val unigramEncodeSql: String = {
    val (backCtes2, pieceLegs2) = backSqlCtes("c", "d", s"q$MaxWordLen")
    OracleSql.materializeCtes(
      s"""WITH $trainSqlCtes,
         |edges2 AS (
         |  SELECT o.w, o.j, o.i, s.cost FROM occ o JOIN sel s USING (piece)),
         |q0 AS (SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS enc
         |       FROM wtab),
         |${relaxSqlCtes("q", "edges2")},
         |d0 AS (SELECT w, CAST(length(w) AS BIGINT) AS pos FROM wtab),
         |$backCtes2,
         |pieces2 AS (
         |  $pieceLegs2),
         |perword AS (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
         |  FROM pieces2 GROUP BY w),
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT d.doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(p.n_pieces) AS BIGINT) AS n_pieces,
         |  CAST(SUM(length(d.w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(length(d.w)) AS DOUBLE) / CAST(SUM(p.n_pieces) AS DOUBLE)
         |    AS ratio
         |FROM docw d JOIN perword p USING (w)
         |WHERE length(d.w) BETWEEN 1 AND $MaxWordLen
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
  }
}
