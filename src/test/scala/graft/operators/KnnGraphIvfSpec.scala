package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the subquadratic-compute kNN face (VERDICT r17 item 1): the
  * IVF-candidate bounded ranking must equal a complete DRIVER REPLAY of
  * its own contract (fixed-point Lloyd training → top-(P+1) probe
  * ranking → own+probed-cluster candidate union → exact strict-fold
  * cosines → (cos DESC, nbr) top-k) on the capped slice, agree with the
  * exact all-pairs face [[Similarity.knnGraph]] on every node whose
  * candidate set covers the exact top-k, and hold a measured recall
  * floor against it. The DuckDB gate proves ivf ≡ window-replay at 3
  * SFs; this spec proves the candidate set is the one the inverted
  * lists promise. */
class KnnGraphIvfSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  /** The same strict ascending left fold VecDot / the SQL twins use. */
  private def fold(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Driver replay of [[Similarity.quantizedLloyd]]: L2 argmin with
    * lowest-index ties; BIGINT fixed-point update with JVM truncating
    * division; empty clusters keep their previous centroid. */
  private def lloyd(vecs: Seq[(Long, Array[Double])], k: Int,
      iters: Int): Array[Array[Double]] = {
    val sorted = vecs.sortBy(_._1)
    var cents = sorted.take(k).map(_._2).toArray
    val q = Similarity.SemDedupQScale
    (1 to iters).foreach { _ =>
      val assign = vecs.map { case (_, v) =>
        val ds = cents.map { c =>
          var d = 0.0; var i = 0
          while (i < math.min(v.length, c.length)) {
            val t = v(i) - c(i); d += t * t; i += 1
          }
          d
        }
        ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2 -> v
      }
      cents = cents.zipWithIndex.map { case (prev, ci) =>
        val members = assign.filter(_._1 == ci).map(_._2)
        if (members.isEmpty) prev
        else Array.tabulate(prev.length) { pos =>
          val sq = members.map(m => math.floor(m(pos) * q).toLong).sum
          val n = members.length.toLong
          val td = if (sq >= 0) sq / n else -((-sq) / n)
          td.toDouble / q
        }
      }
    }
    cents
  }

  test("capped ivf face ≡ driver replay; exact agreement where candidates cover; recall floor") {
    val cap = Similarity.KnnCap
    val ivf = Similarity.knnGraphIvfCapped(spark, dir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.nonEmpty)

    // ---- driver replay of the whole operator on the slice ----
    val all = graft.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    val k = Similarity.semDedupKFor(all.size.toLong)
    val cents = lloyd(all, k, Similarity.SemDedupIters)
    val cn = cents.map(c => math.sqrt(fold(c, c)))
    val vecs = all.filter { case (_, ev) => math.sqrt(fold(ev, ev)) > 0 }.toMap
    val nrm = vecs.map { case (id, ev) => id -> math.sqrt(fold(ev, ev)) }
    val np = Similarity.KnnIvfProbes + 1
    // probe ranking: (cos DESC, cid ASC); isotropic corpus has no NaNs
    val probes: Map[Long, Seq[Int]] = vecs.map { case (id, ev) =>
      id -> cents.indices
        .map(ci => (ci, fold(ev, cents(ci)) / (nrm(id) * cn(ci))))
        .sortBy { case (ci, c) => (-c, ci) }.take(np).map(_._1)
    }
    val home: Map[Long, Int] = probes.map { case (id, ps) => id -> ps.head }
    val cand: Map[Long, Set[Long]] = vecs.keys.map { id =>
      id -> vecs.keys.filter(o => o != id && probes(id).contains(home(o))).toSet
    }.toMap
    val expected = cand.toSeq.flatMap { case (src, cs) =>
      cs.toSeq
        .map(nbr => (nbr, fold(vecs(src), vecs(nbr)) / (nrm(src) * nrm(nbr))))
        .sortBy { case (nbr, c) => (-c, nbr) }
        .take(Similarity.KnnK)
        .zipWithIndex.map { case ((nbr, c), i) =>
          (src, (i + 1).toLong, nbr, c)
        }
    }.sortBy(t => (t._1, t._2))
    assert(ivf.toSeq.sortBy(t => (t._1, t._2)) == expected,
      "ivf face diverged from the driver replay of its own contract")

    // ---- vs the exact all-pairs face on the same slice ----
    val exact = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exactTop = exact.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val ivfTop = ivf.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    var covered = 0
    exactTop.foreach { case (src, top) =>
      if (top.forall(cand(src))) {
        covered += 1
        assert(ivfTop.get(src).contains(top),
          s"node $src: candidates cover the exact top-k but faces differ " +
            s"(exact=$top ivf=${ivfTop.get(src)})")
      }
    }
    assert(covered > 0, "no node's candidates covered its exact top-k — " +
      "the probing collapsed; coverage assertion vacuous")
    val hits = exactTop.map { case (src, top) =>
      top.count(ivfTop.getOrElse(src, Seq.empty).contains)
    }.sum
    val total = exactTop.values.map(_.size).sum
    val recall = hits.toDouble / total
    info(f"ivf-vs-exact recall on the $cap-slice: $recall%.3f " +
      f"($hits/$total; covered nodes: $covered/${exactTop.size}; " +
      f"k=$k, probes=$np)")
    // measured 0.878 on the 2026-08 sf0.001 corpus (527/600 — probing 5
    // of 8 clusters on the slice; the LSH face measures 0.670 on the
    // same slice at quadratic compute); the floor leaves regen slack
    assert(recall >= 0.80,
      f"recall $recall%.3f under the 0.80 floor — probing regressed")
  }
}
