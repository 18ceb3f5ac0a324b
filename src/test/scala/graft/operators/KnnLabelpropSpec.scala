package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the full-corpus LPA face: the synchronous vote rounds must
  * equal a complete DRIVER REPLAY over the identical (oracle-exact,
  * spec-pinned) kNN edge set — simultaneous update, (max count, min
  * label) election, isolated-node self-derivation — and the result
  * must be FINER than [[Similarity.knnComponents]] on this corpus
  * (the kNN graph is one giant component; LPA is only worth
  * registering if it resolves structure inside it). */
class KnnLabelpropSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("lpa ≡ driver replay over the same edges; csize consistent; finer than components") {
    val got = Similarity.knnLabelprop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.SharedFrames.releaseAll()
    assert(got.nonEmpty)

    val edges = Similarity.knnGraphIvf(spark, dir)
      .select(col("src"), col("nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.SharedFrames.releaseAll()
    val sym = (edges ++ edges.map { case (a, b) => (b, a) }).distinct
    val inNbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = got.map(_._1)
    var lab = nodes.map(v => v -> v).toMap
    (1 to Similarity.KnnLpIters).foreach { _ =>
      lab = nodes.map { v =>
        val votes = inNbrs.getOrElse(v, Array.empty[Long])
          .map(lab).groupBy(identity).view.mapValues(_.length)
        if (votes.isEmpty) v -> v
        else {
          val mc = votes.values.max
          v -> votes.filter(_._2 == mc).keys.min
        }
      }.toMap
    }
    got.foreach { case (v, comm, _) =>
      assert(comm == lab(v), s"node $v: community $comm != replay ${lab(v)}")
    }
    val pops = lab.values.groupBy(identity).view.mapValues(_.size).toMap
    got.foreach { case (v, comm, csize) =>
      assert(csize == pops(comm).toLong)
    }

    val comps = Similarity.knnComponents(spark, dir).collect()
      .map(r => r.getLong(1)).distinct.length
    graft.SharedFrames.releaseAll()
    val comms = pops.size
    info(s"${nodes.length} nodes: $comps component(s), $comms communities")
    assert(comms > comps,
      s"LPA found $comms communities vs $comps components — no finer structure")
  }
}
