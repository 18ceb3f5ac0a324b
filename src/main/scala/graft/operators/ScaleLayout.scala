package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, dec, asDouble}

/** Physical-layout utilities for the 100 TB shape (builder brief:
  * "bucketing for co-located joins, salting for skew"):
  *
  *  - [[bucketize]]: persist a table bucketed+sorted by its join key. Two
  *    tables bucketed the same way join with NO Exchange on either side —
  *    the shuffle is paid once at write time and amortized over every
  *    subsequent join (verified by plan inspection in ScaleLayoutSpec).
  *  - [[saltedJoin]]: skew-safe equi-join — the big side gets a
  *    deterministic salt in [0, n), the small side is replicated n times,
  *    and the join key becomes (key, salt), splitting a hot key across n
  *    reducers. Result-identical to the plain join.
  *
  * (AQE's skew-join handles moderate skew automatically; explicit salting
  * is the tool for pathological single-key skew where even one split of
  * the hot partition is too large.)
  */
object ScaleLayout {

  /** Write `df` as a managed table bucketed (and sorted) by `keyCol` into
    * `numBuckets` buckets; returns the table handle. */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
      keyCol: String, numBuckets: Int): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Skew-safe inner equi-join of `big` (skewed) with `small` on `key`.
    * The salt must NOT be a function of row content (a hash of the row
    * sends byte-identical duplicates of the hot key to ONE salt bucket,
    * defeating the whole point on duplicate-heavy skew). Instead each input
    * partition deals salts round-robin from an explicit per-partition
    * counter ([[graft.functions.SaltCounter]]): row i of partition p gets
    * salt (p + i) mod n — a pure function of (partition, position), so two
    * materializations of the same input assign identical salts, and a task
    * retry that replays the same partition contents reproduces them
    * exactly. Identical duplicate rows land in different buckets
    * (positions differ); any assignment in [0, n) is correct because the
    * small side is replicated for all n salts.
    *
    * CONTRACT (unchanged from the m_i_i formulation): position is only
    * reproducible if `big`'s partitions recompute identically — a stable
    * scan, or a checkpointed/persisted input. If `big` sits downstream of
    * a shuffle or an AQE-coalesced exchange, a fetch-failure retry can
    * regenerate different partition contents for map outputs that were
    * already consumed, and rows re-salted differently would be duplicated
    * or dropped by the join. Call saltedJoin on scan-rooted (or
    * persisted) inputs; materialize first otherwise. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    withSalt(big, salts).join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** [[bucketize]] variant with an EXPLICIT storage path (external table):
    * the artifact lands under a session-scoped scratch dir and both the
    * catalog entry and the files are registered for release — the same
    * lifecycle discipline as the IVF index ([[Similarity.annIvf]]). The
    * table name carries the appId so two concurrent sessions in one JVM
    * can never collide in the shared in-memory catalog.
    *
    * Idempotent per session: if the table already exists, the existing
    * layout is returned without rewriting. That IS the bucketing
    * contract — the write shuffle is paid ONCE and every subsequent join
    * on the key rides the layout (a caller therefore must treat a
    * (name, path) pair as an immutable snapshot of its source for the
    * session; [[bucketedJoin]]'s inputs are the immutable testdata
    * tables, and the path is content-addressed by source dir). */
  def bucketizeAt(spark: SparkSession, df: DataFrame, name: String,
      keyCol: String, numBuckets: Int, path: String): DataFrame = {
    // the name keys on appId AND the storage path: the same logical name
    // over two source dirs (e.g. two SFs in one test JVM) must be two
    // catalog entries, or the idempotence check would serve stale data
    val pathTag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(path.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val table =
      s"${name}_${pathTag}_" +
        spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    // the exists-check and the write are one atomic unit: two concurrent
    // callers (suites share a session) would otherwise both observe
    // "absent" and race Overwrite writes onto the same path, one deleting
    // the other's files mid-write
    bucketLocks.computeIfAbsent(table, _ => new Object).synchronized {
      if (!spark.catalog.tableExists(table)) {
        df.write.mode(SaveMode.Overwrite)
          .bucketBy(numBuckets, keyCol)
          .sortBy(keyCol)
          .format("parquet")
          .option("path", path)
          .saveAsTable(table)
        graft.SessionResources.onRelease(spark)(() =>
          spark.sql(s"DROP TABLE IF EXISTS $table"))
      } else {
        // idempotence guard: a reuse of the same (name, path) with a
        // DIFFERENT layout request must fail loudly — silently serving
        // the first caller's buckets would hand back a wrong co-location
        // promise (and possibly different columns)
        val existing = spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        val bucketSpec = (existing.getOrElse("Num Buckets", "?"),
          existing.getOrElse("Bucket Columns", "?"))
        val want = (numBuckets.toString, s"[`$keyCol`]")
        require(bucketSpec == want,
          s"bucketizeAt('$name', '$path'): existing layout " +
            s"$bucketSpec does not match requested $want")
      }
    }
    spark.table(table)
  }

  private val bucketLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  final val JoinBuckets = 8

  /** The registered co-located-join query: persist orders and lineitem
    * bucketed by the join key, then join WITHOUT an Exchange on either side
    * (hinted sort-merge; bucket layouts align, so the shuffle was paid once
    * at write time — the amortization that matters when the same key joins
    * repeatedly at 100 TB). The oracle is the PLAIN join aggregate:
    * equality proves the bucketed layout is result-invariant; the
    * no-Exchange plan shape is pinned in ScaleLayoutSpec. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.SessionResources.scratchDir(spark, "bucketed", dir)
    val o = bucketizeAt(spark,
      t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
      "orders_bkt", "o_orderkey", JoinBuckets, s"$scratch/orders")
    val l = bucketizeAt(spark,
      t(spark, dir, "lineitem").select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount")),
      "lineitem_bkt", "l_orderkey", JoinBuckets, s"$scratch/lineitem")
    o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        asDouble(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,6)") - dec(col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  val bucketedJoinSql: String =
    """SELECT o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
      |    (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
      |    AS VARCHAR) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Z-order geometry: [[ZDimBits]] bucket bits per dimension; the file id
    * interleaves the TOP [[ZFileBits]] bits of each dimension → 2^(2·ZFileBits)
    * files, each covering a 1/2^ZFileBits slice of BOTH dimensions. */
  final val ZDimBits = 4
  final val ZFileBits = 2

  /** Multi-dimensional Z-ORDER clustering of `orders` on
    * (o_custkey, order day) — the data-layout operator that makes min/max
    * file skipping work on BOTH filter dimensions at once (a table sorted
    * by one key prunes only that key; an unsorted table prunes nothing).
    *
    * Each dimension is scaled to a [[ZDimBits]]-bit bucket by pure integer
    * arithmetic (dim·2^bits ÷ (max+1) — engine-exact, no floats), and the
    * file assignment interleaves the top [[ZFileBits]] bits of each
    * bucket: every file covers a quarter-range RECTANGLE in (cust, day)
    * space. The query emits the per-file min/max stats a scan planner
    * would consult — the spec probes them to show a single-customer filter
    * and a single-quarter filter each prune ≥ 3/4 of the files, while the
    * same probes against a orderkey-chunked layout prune ~nothing.
    *
    * 100 TB shape: the file id is a PROJECTION (no global sort — this is
    * what `repartitionByRange` on z approximates, with the added property
    * that the cut points are fixed, so the write is one shuffle-free pass
    * once max-dims are known); the stats roll up with a partial-combinable
    * groupBy on the 16-value file id. The max-dim row is a one-row
    * broadcast, the same pattern as the IVF centroid fetch. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val dims = t(spark, dir, "orders").select(
      col("o_custkey").cast("long").as("cust"),
      // o_orderdate is TIMESTAMP_NTZ in the parquet; the session TZ is
      // pinned UTC everywhere (TestSpark/Verify/Bench), so the cast to
      // TIMESTAMP is the identity on the epoch value
      expr("cast(floor(unix_micros(cast(o_orderdate as timestamp)) " +
        "/ 86400000000) as bigint)").as("day"))
    // bucket over the OBSERVED [min, max] of each dim — epoch days sit in
    // a narrow absolute band, so an unanchored scale would collapse the
    // date dimension into one bucket
    val mx = dims.agg(
      min(col("cust")).as("c0"), max(col("cust")).as("c1"),
      min(col("day")).as("d0"), max(col("day")).as("d1"))
    val scale = 1L << ZDimBits
    val hi = ZDimBits - 1
    dims.crossJoin(broadcast(mx))
      .withColumn("cb", expr(s"((cust - c0) * $scale) div (c1 - c0 + 1)"))
      .withColumn("db", expr(s"((day - d0) * $scale) div (d1 - d0 + 1)"))
      .withColumn("file_id",
        // interleave: (db_hi, cb_hi, db_hi-1, cb_hi-1) — MSB-first so
        // z-adjacent files are rectangle-adjacent
        expr(s"((db >> $hi) & 1) * 8 + ((cb >> $hi) & 1) * 4 + " +
          s"((db >> ${hi - 1}) & 1) * 2 + ((cb >> ${hi - 1}) & 1)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cust")).as("min_cust"), max(col("cust")).as("max_cust"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy(col("file_id"))
  }

  val zorderLayoutSql: String = {
    val hi = ZDimBits - 1
    s"""WITH dims AS (
       |  SELECT CAST(o_custkey AS BIGINT) AS cust,
       |         epoch_us(o_orderdate) // 86400000000 AS day
       |  FROM orders),
       |mx AS (SELECT min(cust) AS c0, max(cust) AS c1,
       |              min(day) AS d0, max(day) AS d1 FROM dims),
       |b AS (
       |  SELECT cust, day,
       |    ((cust - c0) * ${1L << ZDimBits}) // (c1 - c0 + 1) AS cb,
       |    ((day - d0) * ${1L << ZDimBits}) // (d1 - d0 + 1) AS db
       |  FROM dims, mx),
       |z AS (
       |  SELECT cust, day,
       |    ((db >> $hi) & 1) * 8 + ((cb >> $hi) & 1) * 4 +
       |    ((db >> ${hi - 1}) & 1) * 2 + ((cb >> ${hi - 1}) & 1) AS file_id
       |  FROM b)
       |SELECT file_id, count(*) AS n_rows,
       |  min(cust) AS min_cust, max(cust) AS max_cust,
       |  min(day) AS min_day, max(day) AS max_day
       |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin
  }

  /** The big side with its `__salt` column: (partition + position) mod n,
    * dealt by the codegen'd per-partition counter expression
    * ([[graft.functions.SaltCounter]] — no RDD round-trip, the scan stays
    * inside whole-stage codegen). Package-visible so the determinism spec
    * can assert salt assignments directly. */
  private[operators] def withSalt(big: DataFrame, salts: Int): DataFrame =
    big.withColumn("__salt", graft.functions.SaltCounter.salt_counter(salts))
}
