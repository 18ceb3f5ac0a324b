package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Similarity search over the embedding column (`Array[Float]`, 64-d).
  *
  * - [[annBruteForce]] is the exact baseline: broadcast the query vector,
  *   one codegen'd pass over all vectors (zip_with/aggregate dot product in
  *   DOUBLE with strict left-fold order so the DuckDB oracle is bit-equal),
  *   then a global top-k. At 100 TB this is the per-partition scan shape —
  *   no shuffle until the final k-row reduction.
  * - [[annLsh]] is the scale path: 16 deterministic hyperplanes (seeded
  *   hash, no RNG state) → sign-pattern bucket; candidates = query's
  *   bucket; exact cosine re-rank inside. Bucketing is an equi-join, so the
  *   big side never cross-joins.
  * - [[embeddingNearDup]]: near-duplicate vector pairs (cosine ≥ 0.95)
  *   via LSH-bucket candidate generation + exact verification.
  */
object Similarity {

  /** Strict left-fold dot product in double — mirrors the oracle's
    * list_reduce exactly (same op order ⇒ bit-identical doubles). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact cosine top-10 neighbors of the min-vec_id query vector. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("ev"))
    val q = emb
      .join(broadcast(emb.agg(min(col("vec_id")).as("qid"))),
        col("vec_id") === col("qid"))
      .select(col("qid"), col("ev").as("qv"))
    emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine",
        dot(col("ev"), col("qv")) /
          (sqrt(dot(col("ev"), col("ev"))) * sqrt(dot(col("qv"), col("qv")))))
      .select(col("qid"), col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  val annBruteForceSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
      |q AS (SELECT vec_id AS qid, ev AS qv FROM e
      |      WHERE vec_id = (SELECT min(vec_id) FROM e))
      |SELECT qid, vec_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, len(ev)+1), i -> ev[i] * qv[i])),
      |    (a, b) -> a + b)
      |  / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(range(1, len(ev)+1), i -> ev[i] * ev[i])),
      |      (a, b) -> a + b))
      |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i])),
      |      (a, b) -> a + b))) AS cosine
      |FROM e, q WHERE vec_id <> qid
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  final val Tables = 4 // OR-amplification: candidate if any table agrees
  final val PlanesPerTable = 6 // 64 buckets per table

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): xxhash64-derived value in [-1, 1) — stateless, reproducible on
    * any executor, no RNG broadcast needed. */
  private def planeComponent(tbl: Int, p: Int, d: Column): Column =
    ((xxhash64(lit(tbl * 131 + p), d) % 2001L + 2001L) % 2001L - 1000L)
      .cast("double") / 1000.0

  /** Sign-pattern LSH bucket of an embedding in one hash table. */
  private def lshBucket(ev: Column, tbl: Int): Column =
    (0 until PlanesPerTable).map { p =>
      val proj = aggregate(
        zip_with(ev, sequence(lit(0), lit(63)),
          (x, i) => x * planeComponent(tbl, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** (vec_id, ev, table, bucket) — one row per vector per hash table. */
  private def bucketed(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("ev"))
    emb.select(col("vec_id"), col("ev"),
      explode(array((0 until Tables).map(tb =>
        struct(lit(tb).as("tbl"), lshBucket(col("ev"), tb).as("bucket"))): _*))
        .as("tb"))
      .select(col("vec_id"), col("ev"), col("tb.tbl"), col("tb.bucket"))
  }

  /** ANN via multi-table hyperplane LSH: candidates share a bucket with the
    * query in ANY table; exact cosine re-ranks. The candidate join is an
    * equi-join on (table, bucket) — shuffle-bounded at any scale. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bk = bucketed(spark, dir)
    val q = bk.join(broadcast(
        bk.agg(min(col("vec_id")).as("qid"))), col("vec_id") === col("qid"))
      .select(col("qid"), col("ev").as("qv"), col("tbl").as("qtbl"),
        col("bucket").as("qbucket"))
    bk.join(broadcast(q),
        col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
          col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("ev"), col("qv")).distinct()
      .withColumn("cosine",
        dot(col("ev"), col("qv")) /
          (sqrt(dot(col("ev"), col("ev"))) * sqrt(dot(col("qv"), col("qv")))))
      .select(col("qid"), col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** Embedding near-duplicate pairs: multi-table LSH candidates
    * (equi-join on (table, bucket)), exact cosine verifies ≥ 0.95. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val bk = bucketed(spark, dir)
    bk.as("x").join(bk.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        col("x.ev").as("e1"), col("y.ev").as("e2"))
      .distinct()
      .withColumn("cosine",
        dot(col("e1"), col("e2")) /
          (sqrt(dot(col("e1"), col("e1"))) * sqrt(dot(col("e2"), col("e2")))))
      .filter(col("cosine") >= 0.95)
      .select(col("v1"), col("v2"), col("cosine"))
  }
}
