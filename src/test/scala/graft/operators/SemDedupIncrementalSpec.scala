package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the incremental-SemDeDup cadence contract (VERDICT r17
  * item 3): the routing predicate switches exactly at the documented
  * population boundary, an out-of-cadence batch (delta large enough to
  * inflate per-cluster populations past
  * [[Similarity.SemDedupIncrementalMaxPop]]) takes the REBUILD path and
  * returns exactly [[Similarity.semDedup]] restricted to the delta, and
  * an in-cadence corpus still takes the incremental plan (the one the
  * DuckDB oracle replays — every test SF is in cadence). */
class SemDedupIncrementalSpec extends AnyFunSuite with SparkSpec {

  /** Deterministic pseudo-random unit-scale vector (LCG — no RNG
    * state shared across runs). */
  private def vec(id: Long, d: Int): Array[Float] = {
    var s = id * 6364136223846793005L + 1442695040888963407L
    Array.fill(d) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5).toFloat
    }
  }

  private def writeCorpus(n: Long, d: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("semdedup-inc-").toString
    val rows = (0L until n).map(i => (i, vec(i, d)))
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("routing predicate flips exactly at MaxPop * k") {
    val k = 8
    val boundary = Similarity.SemDedupIncrementalMaxPop.toLong * k
    assert(!Similarity.semDedupIncrementalOutOfCadence(boundary, k))
    assert(Similarity.semDedupIncrementalOutOfCadence(boundary + 1, k))
    // the shipped corpora are all in cadence (sf0.1 is the largest:
    // corpus 400 → k=8, total 2000 → population 250 ≤ 512)
    assert(!Similarity.semDedupIncrementalOutOfCadence(2000L,
      Similarity.semDedupKFor(400L)))
  }

  test("out-of-cadence batch rebuilds: result ≡ semDedup restricted to the delta") {
    val cut = graft.operators.Dedup.IncrementalCut
    // corpus 400 → k = 8; total 4160 > 8·512 = 4096 → out of cadence
    val dir = writeCorpus(4160L, 8)
    try {
      val k = Similarity.semDedupKFor(cut)
      assert(Similarity.semDedupIncrementalOutOfCadence(4160L, k),
        "constructed corpus should be out of cadence")
      val routed = Similarity.semDedupIncremental(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      graft.SharedFrames.releaseAll()
      val rebuilt = Similarity.semDedup(spark, dir)
        .filter(col("vec_id") >= cut).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      graft.SharedFrames.releaseAll()
      assert(routed == rebuilt,
        "out-of-cadence routing diverged from the rebuild contract")
      assert(routed.nonEmpty && routed.forall(_._1 >= cut))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("in-cadence batch still takes the incremental plan") {
    val cut = graft.operators.Dedup.IncrementalCut
    // corpus 400 → k = 8; total 900 ≤ 4096 → in cadence
    val dir = writeCorpus(900L, 8)
    try {
      val k = Similarity.semDedupKFor(cut)
      assert(!Similarity.semDedupIncrementalOutOfCadence(900L, k))
      val routed = Similarity.semDedupIncremental(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      graft.SharedFrames.releaseAll()
      val inc = Similarity
        .semDedupIncrementalInCadence(spark, dir, cut, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      graft.SharedFrames.releaseAll()
      assert(routed == inc,
        "in-cadence routing diverged from the incremental plan")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
