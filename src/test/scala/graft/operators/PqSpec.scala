package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product-quantization properties beyond the DuckDB equality gate:
  * deterministic training, code-range/shape invariants, and a full
  * driver replay of encode + ADC scoring on the returned rows. */
class PqSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def sliceOf(v: Array[Double], m: Int): Array[Double] =
    java.util.Arrays.copyOfRange(v,
      m * Similarity.PqSubDim, (m + 1) * Similarity.PqSubDim)

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  test("pqCodebooks: deterministic across materializations; shape M x K x subdim") {
    val b1 = Similarity.pqCodebooks(spark, dir)
    val b2 = Similarity.pqCodebooks(spark, dir)
    assert(b1.length == Similarity.PqSubspaces)
    b1.foreach { book =>
      assert(book.length == Similarity.PqCodes)
      book.foreach(c => assert(c.length == Similarity.PqSubDim))
    }
    // bit-identical retrain: fixed-point updates are order-independent
    (b1 zip b2).foreach { case (x, y) =>
      (x zip y).foreach { case (cx, cy) => assert(cx.sameElements(cy)) }
    }
  }

  test("ann_pq: 10 rows, ascending scores, codes in range, query excluded, codes non-degenerate") {
    import spark.implicits._
    val out = Similarity.annPq(spark, dir).collect()
    assert(out.length == 10)
    val qid = out.head.getLong(0)
    assert(out.forall(_.getLong(1) != qid))
    val scores = out.map(_.getDouble(4))
    assert(scores.sameElements(scores.sorted))
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < Similarity.PqCodes)
      assert(r.getLong(3) >= 0 && r.getLong(3) < Similarity.PqCodes)
    }
    // the corpus-wide code table actually uses the codebooks (not one cell)
    val books = Similarity.pqCodebooks(spark, dir)
    val codes = Similarity.pqEncode(spark, dir, books)
    assert(codes.select(countDistinct(col("c0"))).head.getLong(0) > 1)
    assert(codes.select(countDistinct(col("c1"))).head.getLong(0) > 1)
  }

  test("ann_ivfpq: probed-cell containment, code ranges, bit-exact residual encode + per-cell ADC replay") {
    import spark.implicits._
    val out = Similarity.annIvfPq(spark, dir).collect()
    assert(out.length == 10)
    val qid = out.head.getLong(0)
    assert(out.forall(_.getLong(1) != qid))
    val scores = out.map(_.getDouble(5))
    assert(scores.sameElements(scores.sorted))
    // replay the whole composite driver-side on the returned rows
    val coarse = Similarity.semDedupCentroids(spark, dir,
      k = Similarity.IvfPqCoarseK)
    val res = Similarity.ivfPqResiduals(spark, dir, coarse)
    val books = Similarity.ivfPqBooks(res)
    val ids = out.map(_.getLong(1)).toSet
    val resRows = res.filter(col("vec_id").isInCollection(ids + qid))
      .as[(Long, Int, Array[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === qid)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect()
    val qv = vecs(0)
    // probe set: the nprobe nearest coarse cells, candidates confined to it
    val probeDists = coarse.indices.map(c => (l2(qv, coarse(c)), c))
    val probes = probeDists.sorted.take(Similarity.IvfPqProbes).map(_._2).toSet
    out.foreach { r =>
      val (cell, rv) = resRows(r.getLong(1))
      assert(cell.toLong == r.getLong(2) && probes.contains(cell),
        s"vec ${r.getLong(1)}: cell $cell outside probe set $probes")
      val cs = (0 until Similarity.PqSubspaces).map { m =>
        books(m).zipWithIndex
          .map { case (cv, c) => (l2(sliceOf(rv, m), cv), c) }
          .reduceLeft((a, b) => if (b._1 < a._1) b else a)._2.toLong
      }
      assert(cs(0) == r.getLong(3) && cs(1) == r.getLong(4))
      val qrv = qv.indices.map(i => qv(i) - coarse(cell)(i)).toArray
      val score = l2(sliceOf(qrv, 0), books(0)(cs(0).toInt)) +
        l2(sliceOf(qrv, 1), books(1)(cs(1).toInt))
      assert(score == r.getDouble(5), s"ADC score drift for ${r.getLong(1)}")
    }
  }

  test("ann_pq: encode + ADC score replay bit-exactly on the returned rows") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(spark, dir)
    val out = Similarity.annPq(spark, dir).collect()
    val ids = out.map(_.getLong(1)).toSet + out.head.getLong(0)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val qv = vecs(out.head.getLong(0))
    out.foreach { r =>
      val v = vecs(r.getLong(1))
      val cs = (0 until Similarity.PqSubspaces).map { m =>
        books(m).zipWithIndex
          .map { case (cv, c) => (l2(sliceOf(v, m), cv), c) }
          .reduceLeft((a, b) => if (b._1 < a._1) b else a)._2.toLong
      }
      assert(cs(0) == r.getLong(2) && cs(1) == r.getLong(3),
        s"codes mismatch for vec ${r.getLong(1)}")
      val score = l2(sliceOf(qv, 0), books(0)(cs(0).toInt)) +
        l2(sliceOf(qv, 1), books(1)(cs(1).toInt))
      assert(score == r.getDouble(4), s"ADC score drift for ${r.getLong(1)}")
    }
  }
}
