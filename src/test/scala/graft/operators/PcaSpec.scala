package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins for the PCA pair: [[Similarity.pcaCovariance]] is oracle-exact in
  * the gate; the projection ([[Similarity.pcaProject]], rows-only there)
  * is pinned here — basis orthonormality, variance capture per component,
  * centering, and run-to-run determinism. */
class PcaSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def covMatrix(): Array[Array[Double]] = {
    val d = Similarity.EmbedDim
    val cov = Array.ofDim[Double](d, d)
    Similarity.pcaCovariance(spark, dir).collect().foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1,
        r.getDouble(3))
      cov(i)(j) = c; cov(j)(i) = c
    }
    cov
  }

  test("jacobi eigen: orthonormal basis, eigenvalues sum to the trace, descending order") {
    val cov = covMatrix()
    val (vals, vecs) = Similarity.jacobiEigen(cov)
    val d = Similarity.EmbedDim
    // orthonormal: v_i · v_j = δ_ij
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => vecs(i)(k) * vecs(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"v${i}.v${j} = $dot")
    }
    // similarity transform preserves the trace (total variance)
    val trace = (0 until d).map(k => cov(k)(k)).sum
    assert(math.abs(vals.sum - trace) < 1e-9,
      s"eigenvalue mass ${vals.sum} vs trace $trace")
    assert(vals.toSeq == vals.sortBy(-_).toSeq, "eigenvalues not descending")
    // each vector's largest-|coord| is positive (the sign convention that
    // makes the basis reproducible)
    vecs.foreach { v =>
      val mx = v.indices.maxBy(k => (math.abs(v(k)), -k))
      assert(v(mx) > 0, "sign convention violated")
    }
  }

  test("pca_project: per-component variance equals its eigenvalue; components centered and uncorrelated; deterministic") {
    val (vals, _) = Similarity.jacobiEigen(covMatrix())
    val rows = Similarity.pcaProject(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
    val n = rows.map(_._1).distinct.length
    assert(rows.length == n * Similarity.PcaDim)
    val byComp = rows.groupBy(_._2)
    (1 to Similarity.PcaDim).foreach { c =>
      val xs = byComp(c).map(_._3)
      val mean = xs.sum / n
      assert(math.abs(mean) < 1e-6, s"component $c not centered: $mean")
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varc - vals(c - 1)) < 1e-6,
        s"component $c variance $varc vs eigenvalue ${vals(c - 1)}")
    }
    // cross-component covariance vanishes (the whole point of the basis)
    val byVec = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    for (a <- 0 until Similarity.PcaDim; b <- a + 1 until Similarity.PcaDim) {
      val cab = byVec.valuesIterator
        .map(v => v(a) * v(b)).sum / n
      assert(math.abs(cab) < 1e-6, s"components ${a + 1},${b + 1} correlate: $cab")
    }
    // driver basis + strict-fold projection ⇒ bit-identical reruns
    val again = Similarity.pcaProject(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
    assert(rows.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq, "pca_project not deterministic")
  }
}
