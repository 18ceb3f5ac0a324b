package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.RollingHash.rolling_hash

/** Mergeable frequency/cardinality sketches with EXACT cross-engine
  * replay — the bounded-memory summaries a 100 TB ingest needs where the
  * exact operators ([[TextAnalysis.heavyHitters]], `COUNT(DISTINCT)`)
  * shuffle per-key state:
  *
  *   - [[sketchCms]]: a count–min sketch (Cormode & Muthukrishnan 2005).
  *     The D×W counter matrix is BOUNDED state (D·W rows) no matter the
  *     corpus size, and it MERGES by elementwise addition — expressed
  *     relationally as `groupBy(row, bucket).count`, whose map-side
  *     partial aggregation IS the per-partition sketch and whose exchange
  *     IS the merge, capped at D·W rows per partition. Nothing
  *     token-keyed ever shuffles.
  *   - [[hllDistinct]]: a HyperLogLog register table (Flajolet et al.
  *     2007) at p=10 (1024 registers/group). `groupBy(key, bucket).max`
  *     is the register update (partial-combinable max — the classic HLL
  *     merge), so per-group distinct-cardinality estimation shuffles
  *     ≤ groups·1024 rows per partition where `COUNT(DISTINCT)` shuffles
  *     every distinct key.
  *
  * Unlike Spark's built-in `approx_count_distinct` (whose HLL++ internals
  * are engine-specific — see [[TextAnalysis.approxStats]], deliberately
  * `no_oracle`), BOTH sketches here are built from engine-neutral exact
  * arithmetic — the [[graft.functions.RollingHash]] code-point fold plus
  * universal hashing `(a·h + b) mod P` with P = 1e9+7 (products ≤ ~7e13,
  * exact in 64-bit; DuckDB's checked BIGINT arithmetic never overflows) —
  * so the DuckDB oracle replays the sketch BIT-IDENTICALLY and the driver
  * gate proves the sketch content, not just its error band. Estimation
  * error vs the exact operators is pinned in SketchesSpec.
  *
  * Reference analog: the reference has no sketch/approximate layer at all
  * (its aggregates are the exact KMR reduces, SURVEY §2.1) — this is
  * part of the beyond-reference training-pipeline surface.
  */
object Sketches {

  /** CMS depth: (a, b) universal-hash constants, one row per pair. */
  final val CmsRows: Seq[(Long, Long)] =
    Seq((31L, 7L), (131L, 19L), (1031L, 101L), (65537L, 3L))
  /** CMS width (buckets per row). */
  final val CmsW = 1024L
  /** Hash modulus (the [[graft.functions.RollingHash.Mod]] prime). */
  final val HashP = 1000000007L
  /** Probe set size: the exact top-K tokens get their CMS estimate. */
  final val CmsProbeK = 20

  private def cmsBucket(a: Long, b: Long, h: Column): Column =
    ((lit(a) * h + lit(b)) % lit(HashP)) % lit(CmsW)

  /** The CMS counter matrix over a (h: bigint) hash stream — the ONE
    * aggregation both faces share. On a batch frame it is the sketch
    * build; on a STREAMING frame (update/complete mode) the very same
    * plan maintains the matrix as ≤ D·W rows of state under an unbounded
    * stream — the mergeable-sketch property IS the streaming-state
    * bound. SketchesSpec pins exact batch parity across micro-batch
    * splits. */
  def cmsMatrixOf(hashes: DataFrame): DataFrame =
    hashes
      .select(posexplode(array(CmsRows.map { case (a, b) =>
        cmsBucket(a, b, col("h")) }: _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** COUNT–MIN SKETCH over the token stream, verified against exact
    * counts: builds the D×W matrix in one pass, then reports, for the
    * exact top-[[CmsProbeK]] tokens, the true count and the CMS estimate
    * `min_i cms[i][h_i(token)]`.
    *
    * The exact top-K pass is the VERIFICATION face (at 100 TB one keeps
    * only the sketch; SketchesSpec pins `est >= cnt` — the one-sided CMS
    * guarantee — and the gate proves both faces exactly). Probe rows
    * (K·D of them) broadcast onto the ≤ D·W-row matrix; the min over D
    * rows is a partial-combinable aggregate over D rows per token. */
  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.SharedFrames.shared(
      t(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("token"), rolling_hash(col("token")).as("h")))
    val bucketArr = array(CmsRows.map { case (a, b) =>
      cmsBucket(a, b, col("h")) }: _*)
    val cms = cmsMatrixOf(toks.select(col("h")))
    val top = toks.groupBy(col("token"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(CmsProbeK)
    val probes = top.select(col("token"), col("cnt"),
      posexplode(bucketArr).as(Seq("row", "bucket")))
    broadcast(probes)
      .join(cms, Seq("row", "bucket"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("c")).as("est"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** DuckDB fold replaying [[rolling_hash]] over `expr`'s code points. */
  private def rollFoldSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, length($expr)+1),
       |                   i -> CAST(unicode($expr[i]) AS BIGINT))),
       |    (a, b) -> (a*31 + b) % $HashP)""".stripMargin

  val sketchCmsSql: String = OracleSql.materializeCtes {
    val rowVals = CmsRows.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH th AS (
       |  SELECT token, ${rollFoldSql("token")} AS h
       |  FROM (SELECT unnest(string_split(text, ' ')) AS token
       |        FROM documents)
       |  WHERE length(token) > 0),
       |rws(i, a, b) AS (VALUES $rowVals),
       |cms AS (
       |  SELECT i, ((a*h + b) % $HashP) % $CmsW AS bucket,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM th CROSS JOIN rws GROUP BY 1, 2),
       |top AS (
       |  SELECT token, h, CAST(count(*) AS BIGINT) AS cnt
       |  FROM th GROUP BY 1, 2
       |  ORDER BY cnt DESC, token LIMIT $CmsProbeK),
       |probes AS (
       |  SELECT token, cnt, i, ((a*h + b) % $HashP) % $CmsW AS bucket
       |  FROM top CROSS JOIN rws)
       |SELECT p.token, p.cnt, min(c.c) AS est
       |FROM probes p JOIN cms c ON c.i = p.i AND c.bucket = p.bucket
       |GROUP BY 1, 2
       |ORDER BY cnt DESC, token""".stripMargin
  }

  /** SECOND FREQUENCY MOMENT (F2, self-join size) from the count–min
    * matrix — the AMS-family statistic (Alon–Matias–Szegedy '96) behind
    * join-size and repetition-mass estimation in every cost-based
    * planner: F2 = Σ_k cnt(k)² over the token stream, estimated as
    * `min_r Σ_b cms[r][b]²` from the SAME bounded D×W matrix
    * [[sketchCms]] maintains (nothing token-keyed shuffles; the sketch
    * is the state). Bucketing only MERGES keys, and every term is
    * non-negative, so each row's estimate is ≥ F2 — the one-sided
    * guarantee SketchesSpec pins, together with the measured relative
    * error of the min (additive N²/W noise ≪ F2 on a repetitive
    * corpus). Squares run in DECIMAL(38,0) — counts at 100 TB square
    * past int64 — and the only floating step is the final
    * over-estimation ratio. The exact F2 beside it is one
    * partial-combinable aggregation; the oracle replays matrix, squares
    * and ratio bit-identically. */
  def sketchF2(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.SharedFrames.shared(
      t(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .select(rolling_hash(col("token")).as("h")))
    val sq = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
        c.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    // consumed by BOTH the min aggregate and the output projection —
    // shared, or the corpus-sized CMS explode+aggregation runs twice
    val estRows = graft.SharedFrames.shared(cmsMatrixOf(toks)
      .groupBy(col("row")).agg(sum(sq(col("c"))).as("est_row")))
    val exact = toks.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .agg(sum(sq(col("cnt"))).as("exact"))
    val estMin = estRows.agg(min(col("est_row")).as("est_min"))
    estRows
      .crossJoin(broadcast(exact))
      .crossJoin(broadcast(estMin))
      // the exact squared-count integers ride as canonical decimal
      // STRINGS (counts at 100 TB square past int64; DECIMAL(38,0)
      // outputs hash engine-dependently in the gate)
      .select(col("row"), col("est_row").cast("string").as("est_row"),
        col("exact").cast("string").as("exact"),
        col("est_min").cast("string").as("est_min"),
        (col("est_min").cast("string").cast("double") /
          col("exact").cast("string").cast("double")).as("over_ratio"))
      .orderBy(col("row"))
  }

  val sketchF2Sql: String = OracleSql.materializeCtes {
    val rowVals = CmsRows.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH th AS (
       |  SELECT ${rollFoldSql("token")} AS h
       |  FROM (SELECT unnest(string_split(text, ' ')) AS token
       |        FROM documents)
       |  WHERE length(token) > 0),
       |rws(i, a, b) AS (VALUES $rowVals),
       |cms AS (
       |  SELECT i AS row, ((a*h + b) % $HashP) % $CmsW AS bucket,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM th CROSS JOIN rws GROUP BY 1, 2),
       |est AS (
       |  SELECT row,
       |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
       |      AS DECIMAL(38,0)) AS est_row
       |  FROM cms GROUP BY row),
       |ex AS (
       |  SELECT CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
       |      AS DECIMAL(38,0)) AS exact
       |  FROM (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM th GROUP BY h) k),
       |mn AS (SELECT MIN(est_row) AS est_min FROM est)
       |SELECT e.row, CAST(e.est_row AS VARCHAR) AS est_row,
       |  CAST(ex.exact AS VARCHAR) AS exact,
       |  CAST(mn.est_min AS VARCHAR) AS est_min,
       |  CAST(CAST(mn.est_min AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(ex.exact AS VARCHAR) AS DOUBLE) AS over_ratio
       |FROM est e, ex, mn ORDER BY e.row""".stripMargin
  }

  /** HLL precision: 2^10 = 1024 registers per group. */
  final val HllM = 1024L
  /** Rho domain: 20 bits of the second hash; registers range 1..21. */
  final val HllWBits = 20
  /** Bucket-hash / rho-hash universal constants (MINSTD multipliers). */
  final val HllA1 = 69621L; final val HllB1 = 29L
  final val HllA2 = 48271L; final val HllB2 = 101L

  /** HYPERLOGLOG distinct-orderkey estimate per returnflag, beside the
    * exact count. Register update = `groupBy(flag, bucket).max(rho)`;
    * the register sum is kept INTEGER — Σ 2^(21−M_j) over all 1024
    * registers (empty registers contribute 2^21) — so the whole sketch
    * state is exact int64 and the only floating arithmetic is the final
    * `α·m²·2^21 / S` (one parenthesized chain of correctly-rounded IEEE
    * ops, bit-identical across engines). No small-range (linear-counting)
    * correction: that needs `ln`, which differs by libm ulps across
    * engines — the RAW estimator is the contract, and its ~1.04/√m ≈ 3%
    * expected error is pinned against the exact count in SketchesSpec.
    *
    * rho is computed WITHOUT log2: for v in [1, 2^20),
    * `21 − length(bin(v))` equals leading-zeros+1 exactly (bin() is
    * integer string formatting in both engines); v = 0 → 21.
    *
    * Hash pipeline (measured — the obvious choices fail): sequential
    * orderkeys through any LINEAR map give bucket/rho pairs structured
    * enough to bias the estimate 0.3–0.6× (composition of linear maps is
    * linear, so extra rounds don't help). The pipeline is therefore the
    * [[rolling_hash]] fold over the key's DECIMAL-STRING form (breaks
    * sequentiality into digit mixing) → one QUADRATIC round
    * `g = (h² + a·h + b) mod P` (kills the run-of-10 structure adjacent
    * last digits leave in h; h² ≤ ~1.0e18, exact in int64 and under
    * DuckDB's checked-overflow ceiling) → two independent MINSTD maps for
    * bucket and rho. Measured |est/exact − 1| ≤ 5% at sf0.01/sf0.1.
    * Remaining known bias: the RAW estimator over-reads ~25% when
    * n ≲ 2.5m (sf0.001's n ≈ m) — the regime HLL's linear-counting
    * correction exists for; it needs `ln`, which differs by libm ulps
    * across engines, so the raw estimator is the deliberate contract and
    * SketchesSpec pins accuracy in the n ≫ m regime. */
  /** Per-group HLL register maintenance over a (grp, key: string) frame —
    * the shared aggregation of both faces: `groupBy(grp, bucket).max(rho)`
    * is the textbook HLL merge, and on a STREAMING frame the same plan
    * holds ≤ groups·m register rows as state under an unbounded key
    * stream (update mode). SketchesSpec pins batch parity across
    * micro-batch splits. */
  /** fold → ONE quadratic round — the shared key-mixing stage of the HLL
    * registers, the Bloom positions, and (as its first round) [[kmvHash]].
    * One copy on each engine side: a drifted duplicate would silently
    * desynchronize an operator from its oracle. */
  def quadHash(key: Column): Column = {
    val h = rolling_hash(key)
    (h * h + lit(HllA2) * h + lit(11L)) % lit(HashP)
  }

  /** The DuckDB face of [[quadHash]]'s quadratic round over a bound
    * fold column `h`. */
  private def quadSql(h: String): String =
    s"($h*$h + $HllA2*$h + 11) % $HashP"

  def hllRegistersOf(keyed: DataFrame): DataFrame = {
    val g = quadHash(col("key"))
    val bucket = ((lit(HllA1) * g + lit(HllB1)) % lit(HashP)) % lit(HllM)
    val v = ((lit(HllA2) * g + lit(HllB2)) % lit(HashP)) % lit(1L << HllWBits)
    val rho = when(v === 0, lit(HllWBits + 1))
      .otherwise(lit(HllWBits + 1) - length(bin(v)))
    keyed
      .select(col("grp"), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("m"))
  }

  /** Register table → the reported (regsum, zeros, estimate) summary —
    * ONE copy of the estimator arithmetic, shared by [[hllDistinct]] and
    * [[hllMergeIncremental]] (a drifted duplicate would desynchronize
    * their common oracle). */
  private def hllSummary(li: DataFrame, regs: DataFrame): DataFrame = {
    val full = lit(1L << (HllWBits + 1)) // empty register term 2^21
    val regAgg = regs.groupBy(col("l_returnflag"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllWBits + 1} - m)"))
          .as("s_present"),
        count(lit(1)).as("present"))
      .select(col("l_returnflag"),
        (col("s_present") + (lit(HllM) - col("present")) * full)
          .as("hll_regsum"),
        (lit(HllM) - col("present")).as("hll_zeros"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))
    val alphaM2Full = ((lit(0.7213) / (lit(1.0) + (lit(1.079) / lit(1024.0))))
      * lit(1048576.0)) * lit(2097152.0)
    exact.join(regAgg, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_exact"),
        col("hll_regsum"), col("hll_zeros"),
        (alphaM2Full / col("hll_regsum").cast("double")).as("hll_est"))
      .orderBy(col("l_returnflag"))
  }

  private def hllKeyed(df: DataFrame): DataFrame = df.select(
    col("l_returnflag").as("grp"),
    col("l_orderkey").cast("string").as("key"))

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    hllSummary(li, hllRegistersOf(hllKeyed(li))
      .withColumnRenamed("grp", "l_returnflag"))
  }

  /** INCREMENTAL SKETCH MAINTENANCE — the property that makes a sketch
    * worth storing at 100 TB: the corpus's register table persists, a new
    * batch builds its OWN registers from only its rows, and the union
    * folds through `max` per (group, bucket) — the textbook HLL merge,
    * associative and commutative by construction, so sketches of shards
    * combine without ever rescanning the corpus.
    *
    * Here the lineitem table splits into a "stored corpus" (orderkey
    * % 10 ≠ 0) and a "new batch" (% 10 = 0), each builds registers
    * independently via the shared [[hllRegistersOf]], and the merged
    * summary must equal the single-pass sketch of the full table —
    * the oracle IS [[hllDistinctSql]] (the full-table SQL), so the
    * driver gate proves merge ≡ rebuild exactly, register for register
    * (the [[graft.operators.Dedup.dupSpansHashed]] verified-twin
    * discipline). */
  def hllMergeIncremental(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val stored = hllRegistersOf(hllKeyed(li.filter(col("l_orderkey") % 10 =!= 0)))
    val delta = hllRegistersOf(hllKeyed(li.filter(col("l_orderkey") % 10 === 0)))
    val merged = stored.union(delta)
      .groupBy(col("grp"), col("bucket")).agg(max(col("m")).as("m"))
      .withColumnRenamed("grp", "l_returnflag")
    hllSummary(li, merged)
  }

  /** Bloom hash-function count. */
  final val BloomK = 4
  /** Bloom (a, b) universal-hash pairs, one per hash function. */
  final val BloomHashes: Seq[(Long, Long)] =
    Seq((69621L, 29L), (48271L, 101L), (40014L, 53L), (40692L, 211L))

  /** BLOOM-FILTER MEMBERSHIP (Bloom 1970) with exact error accounting —
    * the third mergeable sketch beside CMS (frequency) and HLL
    * (cardinality): an m-bit k-hash membership summary of the stored
    * corpus keys, probed by every document and scored against exact
    * truth. The output is the (claimed, actual) confusion matrix plus the
    * filter's set-bit count and derived width — so the driver gate proves
    * the FILTER CONTENT (bit population), the no-false-negative theorem
    * (the claimed=false ∧ actual=true row can never exist — stored keys
    * set their own bits), and the exact false-positive yield, not an
    * error band.
    *
    * Width is DERIVED from the stored count by integer bit-length —
    * m = 2^len(bin(4n−1)), i.e. the smallest power of two ≥ 4n (the
    * SemDeDup derived-K discipline; no floating log2, whose libm ulps at
    * near-power-of-two boundaries would let the engines derive different
    * widths) — load factor ≈ e^(−k·n/m) keeps every confusion class
    * populated at every SF. Keys run the [[hllRegistersOf]] pipeline
    * (code-point fold → one quadratic round) before the k linear maps:
    * per-hash positions must be jointly unstructured or FP yield is
    * biased, the measured HLL lesson.
    *
    * Relational shape: the filter is `explode(k positions) → DISTINCT`
    * over stored keys — ≤ m rows of bounded state, mergeable by union
    * like the other sketches — and probing is a position equi-join +
    * per-doc hit count (claimed ⇔ all k present; duplicate positions hit
    * consistently, so the non-distinct count is exact). Broadcast here
    * (m ≤ 2^16 at test SFs); at 100 TB the bit table is a sharded bitmap
    * artifact and the probe stays the same equi-join, shuffled instead of
    * broadcast — nothing in the plan is data-ordered. Membership truth is
    * key-level (hash equality): a fold collision would count as a member
    * in BOTH engines, so the gate stays exact; the probability is the
    * documented ~n²/2P birthday bound. */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), quadHash(col("text")).as("g"))
    val stored = docs.filter(col("doc_id") % 10 =!= 0)
    val width = broadcast(stored.agg(count(lit(1)).as("n"))
      .withColumn("m", expr(s"shiftleft(CAST(1 AS BIGINT), " +
        "length(bin(4 * n - 1)))"))
      .select(col("m")))
    val posArr = array(BloomHashes.map { case (a, b) =>
      ((lit(a) * col("g") + lit(b)) % lit(HashP)) % col("m") }: _*)
    val bits = graft.SharedFrames.shared(
      stored.crossJoin(width)
        .select(explode(posArr).as("pos")).distinct())
    val hits = docs.crossJoin(width)
      .select(col("doc_id"), explode(posArr).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val bitsSet = broadcast(bits.agg(count(lit(1)).as("bits_set")))
    docs
      .join(stored.select(col("g")).distinct().withColumnRenamed("g", "sg"),
        col("g") === col("sg"), "left_outer")
      .join(hits, Seq("doc_id"), "left_outer")
      .groupBy(
        (coalesce(col("n_hit"), lit(0L)) === BloomK).as("claimed"),
        col("sg").isNotNull.as("actual"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(bitsSet).crossJoin(width)
      .orderBy(col("claimed"), col("actual"))
  }

  val bloomMembershipSql: String = OracleSql.materializeCtes {
    val hashVals = BloomHashes.map { case (a, b) => s"($a, $b)" }
      .mkString(", ")
    s"""WITH dk AS (
       |  SELECT doc_id, ${rollFoldSql("text")} AS h FROM documents),
       |g AS (
       |  SELECT doc_id, ${quadSql("h")} AS g FROM dk),
       |st AS (SELECT * FROM g WHERE doc_id % 10 <> 0),
       |w AS (
       |  SELECT CAST(1 AS BIGINT) << length(bin(4 * COUNT(*) - 1)) AS m
       |  FROM st),
       |hh(a, b) AS (VALUES $hashVals),
       |bits AS (
       |  SELECT DISTINCT ((a*g + b) % $HashP) % m AS pos
       |  FROM st CROSS JOIN w CROSS JOIN hh),
       |bs AS (SELECT COUNT(*) AS bits_set FROM bits),
       |hits AS (
       |  SELECT p.doc_id, COUNT(b.pos) AS n_hit
       |  FROM (SELECT doc_id, ((a*g + b) % $HashP) % m AS pos
       |        FROM g CROSS JOIN w CROSS JOIN hh) p
       |  LEFT JOIN bits b USING (pos)
       |  GROUP BY 1)
       |SELECT (COALESCE(n_hit, 0) = $BloomK) AS claimed,
       |  (g.g IN (SELECT g FROM st)) AS actual,
       |  COUNT(*) AS n_docs, bs.bits_set, w.m
       |FROM g LEFT JOIN hits USING (doc_id) CROSS JOIN bs CROSS JOIN w
       |GROUP BY 1, 2, bs.bits_set, w.m
       |ORDER BY claimed, actual""".stripMargin
  }

  /** KMV sketch size (k smallest hashes kept per set). */
  final val KmvK = 64
  /** Second-quadratic-round constants for the KMV hash (see below). */
  final val KmvA = 40014L; final val KmvB = 53L

  /** KMV / THETA-SKETCH SET OPERATIONS (Bar-Yossef et al. 2002; the
    * k-minimum-values member of the Theta family) — the sketch that
    * answers what HLL structurally cannot: INTERSECTION cardinality
    * across independently-sketched sets. Each set keeps its [[KmvK]]
    * smallest distinct key hashes (mergeable: union-of-lists → k
    * smallest, the same bounded merge as every sketch here); the k-th
    * smallest hash estimates density — n̂ = (k−1)·P/h₍ₖ₎ — and the
    * union sketch's members, checked for presence in BOTH input sets,
    * give the Jaccard fraction ρ and so n̂∩ = ρ·n̂∪.
    *
    * Sets: customers holding 'F'-status orders vs 'O'-status orders
    * (measured overlapping-but-distinct at every SF — neither the
    * identical-sets nor the disjoint-sets degenerate case). Keys run
    * the [[hllRegistersOf]] fold + quadratic pipeline PLUS a second
    * quadratic round — measured necessary here where HLL needed only
    * one: KMV's estimator is an ORDER STATISTIC of the full hash value,
    * a far stricter uniformity demand than HLL's (bucket, leading-zeros)
    * marginals — one quadratic round left the sequential-custkey image
    * clustered low (64th-smallest at 0.52× its uniform expectation →
    * a 1.9× cardinality overestimate); the second round measures within
    * ±8.3% at every SF/set, inside the 1/√k ≈ 12.5% std error
    * (products stay < P² ≈ 10¹⁸, exact in int64 and under DuckDB's
    * checked-overflow ceiling). Under-k sets degrade to exact (the
    * sketch IS the set — the standard KMV rule, applied identically in
    * both engines), and ρ's denominator is the ACTUAL union-sketch size
    * min(k, |union|).
    *
    * Exactness: hashes, k-th-order statistics, and membership counts
    * are exact integers; the three estimates are fixed short chains of
    * exact int→double conversions — bit-identical across engines — and
    * exact distinct counts ride beside them, so the driver gate proves
    * SKETCH CONTENT and the spec pins estimation error. Scale shape:
    * distinct (set, hash) is one hash aggregation; each sketch is the
    * k-bounded partial aggregator ([[graft.functions.TopKAgg]] — ≤ k
    * rows per partition shuffle, merge = the KMV merge); the membership
    * probe joins the ≤ k union members against the distinct frame. */
  /** The KMV hash pipeline over a key-string column (fold + TWO
    * quadratic rounds — see [[kmvOverlap]] for why two). */
  def kmvHash(key: Column): Column = {
    val g1 = quadHash(key)
    (g1 * g1 + lit(KmvA) * g1 + lit(KmvB)) % lit(HashP)
  }

  /** Per-set KMV sketch maintenance over a RAW (s, g) frame — the shared
    * aggregation of both faces: [[graft.functions.TopKAgg.top_k_distinct]]
    * keeps the k smallest DISTINCT hashes per set (duplicates collapse
    * inside the bounded merge — no upstream global `distinct`, so the
    * operator's only state is ≤ k entries per set), and on a STREAMING
    * frame the very same plan maintains each sketch as bounded state
    * under an unbounded stream (complete mode) — after any micro-batch
    * prefix the sketch equals the batch sketch of that prefix exactly
    * (pinned in SketchesSpec, the [[cmsMatrixOf]] discipline). */
  def kmvSketchOf(keyed: DataFrame): DataFrame =
    keyed.groupBy(col("s"))
      .agg(graft.functions.TopKAgg.top_k_distinct(KmvK)(
        col("g"), -col("g").cast("double")).as("tk"))

  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val g = kmvHash(col("o_custkey").cast("string"))
    val dg = graft.SharedFrames.shared(
      t(spark, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(when(col("o_orderstatus") === "F", lit("a")).otherwise(lit("b"))
          .as("s"), g.as("g"))
        .distinct())
    val topk = graft.functions.TopKAgg.top_k(KmvK)
    val kth = (tk: Column, cnt: Column) =>
      when(cnt >= KmvK, element_at(tk, KmvK).getField("id"))
    val est = (hk: Column, cnt: Column) =>
      when(cnt < KmvK, cnt.cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) * lit(HashP.toDouble) /
          hk.cast("double"))
    // per-set sketches through the SHARED face, folded to ONE row by
    // conditional min (2 rows in)
    val per = kmvSketchOf(dg)
      .join(dg.groupBy(col("s")).agg(count(lit(1)).as("cnt")), Seq("s"))
      .select(col("s"), col("cnt"), kth(col("tk"), col("cnt")).as("hk"))
      .groupBy()
      .agg(min(when(col("s") === "a", col("cnt"))).as("exact_a"),
        min(when(col("s") === "a", col("hk"))).as("hk_a"),
        min(when(col("s") === "b", col("cnt"))).as("exact_b"),
        min(when(col("s") === "b", col("hk"))).as("hk_b"))
    val uni = graft.SharedFrames.shared(
      dg.select(col("g")).distinct()
        .groupBy()
        .agg(topk(col("g"), -col("g").cast("double")).as("tk"),
          count(lit(1)).as("cnt_u")))
    val members = uni.select(explode(col("tk").getField("id")).as("g"))
    val both = members.join(dg, Seq("g"))
      .groupBy(col("g")).agg(countDistinct(col("s")).as("ns"))
      .agg(sum(when(col("ns") === 2, 1L).otherwise(0L)).as("both_cnt"))
    val inter = dg.groupBy(col("g")).agg(countDistinct(col("s")).as("ns"))
      .agg(sum(when(col("ns") === 2, 1L).otherwise(0L)).as("exact_inter"))
    per.crossJoin(broadcast(
        uni.select(col("cnt_u"), kth(col("tk"), col("cnt_u")).as("hk_u"))))
      .crossJoin(broadcast(both)).crossJoin(broadcast(inter))
      .select(lit(KmvK).cast("long").as("k"),
        col("exact_a"), col("exact_b"), col("exact_inter"),
        col("hk_a"), col("hk_b"), col("hk_u"), col("both_cnt"),
        est(col("hk_a"), col("exact_a")).as("est_a"),
        est(col("hk_b"), col("exact_b")).as("est_b"),
        ((col("both_cnt").cast("double") /
          least(lit(KmvK.toLong), col("cnt_u")).cast("double")) *
          est(col("hk_u"), col("cnt_u"))).as("est_inter"))
  }

  /** Oracle: fold, quadratic round, order statistics, membership counts,
    * and the identical estimate arithmetic. */
  val kmvOverlapSql: String = OracleSql.materializeCtes {
    val fold = rollFoldSql("CAST(o_custkey AS VARCHAR)")
    s"""WITH dk AS (
       |  SELECT DISTINCT
       |    CASE WHEN o_orderstatus = 'F' THEN 'a' ELSE 'b' END AS s,
       |    (g1*g1 + $KmvA*g1 + $KmvB) % $HashP AS g
       |  FROM (SELECT o_orderstatus,
       |          ${quadSql("h")} AS g1
       |        FROM (SELECT o_orderstatus, $fold AS h
       |              FROM orders WHERE o_orderstatus IN ('F', 'O')) q0) q),
       |ranked AS (
       |  SELECT s, g, row_number() OVER (PARTITION BY s ORDER BY g) AS rn,
       |    COUNT(*) OVER (PARTITION BY s) AS cnt
       |  FROM dk),
       |per AS (
       |  SELECT
       |    MIN(CASE WHEN s = 'a' THEN cnt END) AS exact_a,
       |    MIN(CASE WHEN s = 'a' AND rn = $KmvK AND cnt >= $KmvK THEN g END)
       |      AS hk_a,
       |    MIN(CASE WHEN s = 'b' THEN cnt END) AS exact_b,
       |    MIN(CASE WHEN s = 'b' AND rn = $KmvK AND cnt >= $KmvK THEN g END)
       |      AS hk_b
       |  FROM ranked),
       |ug AS (SELECT DISTINCT g FROM dk),
       |uranked AS (
       |  SELECT g, row_number() OVER (ORDER BY g) AS rn,
       |    COUNT(*) OVER () AS cnt_u
       |  FROM ug),
       |uni AS (
       |  SELECT MIN(cnt_u) AS cnt_u,
       |    MIN(CASE WHEN rn = $KmvK AND cnt_u >= $KmvK THEN g END) AS hk_u
       |  FROM uranked),
       |bo AS (
       |  SELECT CAST(SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS both_cnt
       |  FROM (SELECT m.g, COUNT(DISTINCT dk.s) AS ns
       |        FROM (SELECT g FROM uranked WHERE rn <= $KmvK) m
       |        JOIN dk USING (g) GROUP BY m.g) t),
       |io AS (
       |  SELECT CAST(SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS exact_inter
       |  FROM (SELECT g, COUNT(DISTINCT s) AS ns FROM dk GROUP BY g) t)
       |SELECT CAST($KmvK AS BIGINT) AS k,
       |  exact_a, exact_b, exact_inter, hk_a, hk_b, hk_u, both_cnt,
       |  CASE WHEN exact_a < $KmvK THEN CAST(exact_a AS DOUBLE)
       |       ELSE CAST(${KmvK - 1} AS DOUBLE) * CAST($HashP AS DOUBLE)
       |            / CAST(hk_a AS DOUBLE) END AS est_a,
       |  CASE WHEN exact_b < $KmvK THEN CAST(exact_b AS DOUBLE)
       |       ELSE CAST(${KmvK - 1} AS DOUBLE) * CAST($HashP AS DOUBLE)
       |            / CAST(hk_b AS DOUBLE) END AS est_b,
       |  (CAST(both_cnt AS DOUBLE)
       |     / CAST(LEAST($KmvK, cnt_u) AS DOUBLE))
       |    * (CASE WHEN cnt_u < $KmvK THEN CAST(cnt_u AS DOUBLE)
       |            ELSE CAST(${KmvK - 1} AS DOUBLE) * CAST($HashP AS DOUBLE)
       |                 / CAST(hk_u AS DOUBLE) END) AS est_inter
       |FROM per CROSS JOIN uni CROSS JOIN bo CROSS JOIN io""".stripMargin
  }

  /** Histogram bins per group and the quantiles reported. */
  final val HistBins = 256
  final val HistQs: Seq[Double] = Seq(0.5, 0.95)

  /** MERGEABLE EQUI-WIDTH HISTOGRAM + quantile estimation — the
    * bounded-state quantile path beside the exact
    * [[graft.queries.Relational.percentiles]] (which must globally sort
    * its group): two narrow passes (min/max, then bin counts), histogram
    * state ≤ groups·[[HistBins]] rows with map-side partials (elementwise
    * addition IS the histogram merge), then P50/P95 by cumulative walk
    * with linear interpolation inside the located bin.
    *
    * Like the other sketches here (and unlike `percentile_approx`, whose
    * KLL internals are engine-specific), every arithmetic step — bin
    * width, bin index (floor of one exact-order double chain), the
    * q·n target, the interpolation — is a fixed parenthesized IEEE
    * sequence both engines evaluate identically, so the DuckDB oracle
    * replays the ESTIMATE bit-for-bit and the driver gate proves the
    * sketch, not an error band. |est − exact| is pinned vs the sorted
    * exact quantile in SketchesSpec. The quantile walk windows over the
    * hist rows — bounded at [[HistBins]] per group BY CONSTRUCTION, so
    * the partition-size concern that bans data-keyed windows elsewhere
    * does not apply. */
  def histQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val x = col("l_extendedprice").cast("double")
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), x.as("x"))
    val mm = li.groupBy(col("l_returnflag")).agg(
      min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
      .withColumn("w", (col("mx") - col("mn")) / lit(HistBins.toDouble))
    val hist = li.join(broadcast(mm), Seq("l_returnflag"))
      .withColumn("bin", when(col("w") === 0.0, lit(0)).otherwise(
        least(lit(HistBins - 1),
          floor((col("x") - col("mn")) / col("w")).cast("int"))))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val byBin = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(byBin))
      .join(broadcast(mm), Seq("l_returnflag"))
    val qs = HistQs.toDF("q")
    cum.crossJoin(broadcast(qs))
      .filter(col("cum").cast("double") >= col("q") * col("n").cast("double"))
      .groupBy(col("l_returnflag"), col("q"))
      .agg(min(struct(col("bin"), col("c"), col("cum"), col("mn"),
        col("w"), col("n"))).as("b"))
      .select(col("l_returnflag"), col("q"), col("b.n").as("n"),
        (col("b.mn") + (col("b.w") * (col("b.bin").cast("double")
          + (((col("q") * col("b.n").cast("double"))
            - (col("b.cum") - col("b.c")).cast("double"))
            / col("b.c").cast("double"))))).as("est"))
      .orderBy(col("l_returnflag"), col("q"))
  }

  val histQuantilesSql: String = OracleSql.materializeCtes(
    s"""WITH li AS (
       |  SELECT l_returnflag,
       |    CAST(CAST(l_extendedprice AS VARCHAR) AS DOUBLE) AS x
       |  FROM lineitem),
       |mm AS (
       |  SELECT l_returnflag, min(x) AS mn, max(x) AS mx,
       |    CAST(count(*) AS BIGINT) AS n,
       |    (max(x) - min(x)) / ${HistBins.toDouble} AS w
       |  FROM li GROUP BY 1),
       |hist AS (
       |  SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS c
       |  FROM (
       |    SELECT li.l_returnflag,
       |      CASE WHEN w = 0.0 THEN 0
       |           ELSE LEAST(${HistBins - 1},
       |                      CAST(floor((x - mn) / w) AS INTEGER)) END
       |        AS bin
       |    FROM li JOIN mm USING (l_returnflag))
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT h.l_returnflag, h.bin, h.c, mm.mn, mm.w, mm.n,
       |    SUM(h.c) OVER (PARTITION BY h.l_returnflag ORDER BY h.bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist h JOIN mm USING (l_returnflag)),
       |qs(q) AS (VALUES ${
           HistQs.map(q => s"(CAST($q AS DOUBLE))").mkString(", ")}),
       |hit AS (
       |  SELECT l_returnflag, q, bin, c, cum, mn, w, n,
       |    row_number() OVER (PARTITION BY l_returnflag, q
       |      ORDER BY bin) AS rn
       |  FROM cum CROSS JOIN qs
       |  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
       |SELECT l_returnflag, q, n,
       |  (mn + (w * (CAST(bin AS DOUBLE)
       |    + (((q * CAST(n AS DOUBLE)) - CAST(cum - c AS DOUBLE))
       |       / CAST(c AS DOUBLE))))) AS est
       |FROM hit WHERE rn = 1
       |ORDER BY l_returnflag, q""".stripMargin)

  val hllDistinctSql: String = OracleSql.materializeCtes(
    s"""WITH rh AS (
       |  SELECT l_returnflag, l_orderkey,
       |    ${rollFoldSql("s")} AS hh
       |  FROM (SELECT l_returnflag, l_orderkey,
       |          CAST(l_orderkey AS VARCHAR) AS s FROM lineitem)),
       |g AS (
       |  SELECT l_returnflag, l_orderkey,
       |    (hh*hh + $HllA2*hh + 11) % $HashP AS gg
       |  FROM rh),
       |h AS (
       |  SELECT l_returnflag, l_orderkey,
       |    (($HllA1 * gg + $HllB1) % $HashP) % $HllM AS bucket,
       |    (($HllA2 * gg + $HllB2) % $HashP) % ${1L << HllWBits} AS v
       |  FROM g),
       |regs AS (
       |  SELECT l_returnflag, bucket,
       |    max(CASE WHEN v = 0 THEN ${HllWBits + 1}
       |             ELSE ${HllWBits + 1} - length(bin(v)) END) AS m
       |  FROM h GROUP BY 1, 2),
       |ra AS (
       |  SELECT l_returnflag,
       |    CAST(SUM(CAST(1 AS BIGINT) << (${HllWBits + 1} - m))
       |         + ($HllM - COUNT(*)) * ${1L << (HllWBits + 1)} AS BIGINT)
       |      AS hll_regsum,
       |    CAST($HllM - COUNT(*) AS BIGINT) AS hll_zeros
       |  FROM regs GROUP BY 1),
       |ex AS (
       |  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_exact
       |  FROM lineitem GROUP BY 1)
       |SELECT e.l_returnflag, e.n_exact, r.hll_regsum, r.hll_zeros,
       |  (((0.7213 / (1.0 + (1.079 / 1024.0))) * 1048576.0) * 2097152.0)
       |    / CAST(r.hll_regsum AS DOUBLE) AS hll_est
       |FROM ex e JOIN ra r USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin)
}
