package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the full-corpus kNN face (VERDICT r16 item 5): the LSH-fed
  * bounded ranking must equal a complete DRIVER REPLAY of its own
  * contract (buckets → candidate union → exact strict-fold cosines →
  * (cos DESC, nbr) top-k) on the capped slice, agree with the exact
  * all-pairs face [[Similarity.knnGraph]] on every node whose candidate
  * set covers the exact top-k, and hold a measured recall floor against
  * it. The DuckDB gate proves lsh ≡ window-replay-over-candidates at
  * sf0.01; this spec proves the candidate set itself is the one the
  * banding promises. */
class KnnGraphLshSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  /** The same strict ascending left fold VecDot / the SQL twins use. */
  private def fold(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); i += 1 }
    d
  }

  test("capped lsh face ≡ driver replay; exact agreement where candidates cover; recall floor") {
    val cap = Similarity.KnnCap
    val lsh = Similarity.knnGraphLshCapped(spark, dir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lsh.nonEmpty)

    // ---- driver replay of the whole operator on the slice ----
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, ev) => math.sqrt(fold(ev, ev)) > 0 }
      .toMap
    val planes = (0 until Similarity.NearDupTables).map { tb =>
      (0 until Similarity.NearDupPlanes).map(p =>
        Similarity.planeVector(tb, p).toArray)
    }
    def buckets(ev: Array[Double]): Seq[(Int, Long)] =
      planes.indices.map { tb =>
        var bucket = 0L
        planes(tb).indices.foreach { p =>
          if (fold(ev, planes(tb)(p)) >= 0) bucket |= (1L << p)
        }
        (tb, bucket)
      }
    val bk = vecs.map { case (id, ev) => id -> buckets(ev).toSet }
    val cand: Map[Long, Set[Long]] = vecs.keys.map { id =>
      id -> vecs.keys.filter(o => o != id && bk(o).exists(bk(id))).toSet
    }.toMap
    val expected = cand.toSeq.flatMap { case (src, cs) =>
      val ranked = cs.toSeq
        .map(nbr => (nbr, fold(vecs(src), vecs(nbr)) /
          (math.sqrt(fold(vecs(src), vecs(src))) *
            math.sqrt(fold(vecs(nbr), vecs(nbr))))))
        .sortBy { case (nbr, c) => (-c, nbr) }
        .take(Similarity.KnnK)
      ranked.zipWithIndex.map { case ((nbr, c), i) =>
        (src, (i + 1).toLong, nbr, c)
      }
    }.sortBy(t => (t._1, t._2))
    assert(lsh.toSeq.sortBy(t => (t._1, t._2)) == expected,
      "lsh face diverged from the driver replay of its own contract")

    // ---- vs the exact all-pairs face on the same slice ----
    val exact = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exactTop = exact.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val lshTop = lsh.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // wherever the candidate set covers the exact top-k, the faces agree
    // EXACTLY (a superset ranking restricted to a covering subset keeps
    // its top-k) — this is the slice-face ≡ lsh-face contract
    var covered = 0
    exactTop.foreach { case (src, top) =>
      if (top.forall(cand(src))) {
        covered += 1
        assert(lshTop.get(src).contains(top),
          s"node $src: candidates cover the exact top-k but faces differ " +
            s"(exact=$top lsh=${lshTop.get(src)})")
      }
    }
    assert(covered > 0, "no node's candidates covered its exact top-k — " +
      "the banding collapsed; coverage assertion vacuous")
    // measured recall floor: deterministic corpus + seeded planes, so the
    // true value is stable; the floor sits under it with regen slack
    val hits = exactTop.map { case (src, top) =>
      top.count(lshTop.getOrElse(src, Seq.empty).contains)
    }.sum
    val total = exactTop.values.map(_.size).sum
    val recall = hits.toDouble / total
    info(f"lsh-vs-exact recall on the $cap-slice: $recall%.3f " +
      f"($hits/$total; covered nodes: $covered/${exactTop.size})")
    // measured 0.670 on the 2026-08 sf0.001 corpus (isotropic vectors:
    // top-3 cosines sit ~0.3-0.45 where 8×4 banding collides ~2/3 of the
    // time — the operator's recall/cost knob, documented in the scaladoc);
    // the floor leaves regen slack under the measured value
    assert(recall >= 0.55,
      f"recall $recall%.3f under the 0.55 floor — banding regressed")
  }
}
