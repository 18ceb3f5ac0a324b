package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PageRank properties beyond the DuckDB equality gate: a full driver
  * replay of the fixed-point recurrence over independently collected
  * edges, mass bounds, and the isolated-node fixed point. */
class GraphRankSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("pagerank_sim: exact driver replay; mass bounded; isolated nodes sit at the teleport base") {
    import spark.implicits._
    val out = GraphRank.pagerankSim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.SharedFrames.releaseAll()
    val n = out.size.toLong
    assert(n == spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < GraphRank.PrCap).count())

    // independent replay: collect the edge list, run the recurrence in
    // plain Scala longs — same div/truncation order as both engines
    val edges = GraphRank.simEdges(spark, dir)
      .as[(Long, Long)].collect()
    graft.SharedFrames.releaseAll()
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = out.keySet.toSeq.sorted
    val base = (3L * GraphRank.PrScale) / (20L * n)
    var pr = nodes.map(_ -> GraphRank.PrScale / n).toMap
    (1 to GraphRank.PrIters).foreach { _ =>
      val inc = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
      pr = nodes.map(v => v -> (base + (17L * inc.getOrElse(v, 0L)) / 20L)).toMap
    }
    nodes.foreach { v =>
      assert(out(v)._1 == pr(v), s"node $v: ${out(v)._1} != replay ${pr(v)}")
      assert(out(v)._2 == deg.getOrElse(v, 0L))
    }
    // truncation only ever loses mass; the graph is dense enough that
    // most of it survives
    val total = out.values.map(_._1).sum
    assert(total <= GraphRank.PrScale && total > GraphRank.PrScale / 2,
      s"total mass $total outside (S/2, S]")
    // isolated nodes receive nothing — their rank is exactly the base
    val isolated = out.filter(_._2._2 == 0L)
    assert(isolated.nonEmpty, "no isolated node — base fixed point untested")
    isolated.foreach { case (v, (p, _)) =>
      assert(p == base, s"isolated $v: pr $p != base $base")
    }
    // the graph is non-trivial and rank actually concentrates: some node
    // beats the uniform start
    assert(out.values.exists(_._1 > GraphRank.PrScale / n))
  }

  test("graph_bfs: exact driver BFS replay; nearest-seed ties to smallest id; all verdict classes populated") {
    import spark.implicits._
    val out = GraphRank.graphBfs(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.SharedFrames.releaseAll()
    val edges = GraphRank.simEdges(spark, dir).as[(Long, Long)].collect()
    graft.SharedFrames.releaseAll()
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    // independent multi-source BFS: frontier expansion with (dist, root)
    // lexicographic min — the reference semantics of the packed relaxation
    val seeds = out.keySet.filter(_ % GraphRank.BfsSeedMod == 0L)
    assert(seeds.nonEmpty)
    var best = seeds.map(s => s -> ((0L, s))).toMap
    (1 to GraphRank.BfsIters).foreach { _ =>
      val cand = best.toSeq.flatMap { case (v, (d, r)) =>
        adj.getOrElse(v, Array.empty[Long]).toSeq.map(_ -> ((d + 1, r)))
      }
      (cand ++ best.toSeq).groupBy(_._1).foreach { case (v, xs) =>
        best += v -> xs.map(_._2).min // (dist, root) lexicographic
      }
    }
    out.foreach { case (v, (d, r)) =>
      best.get(v) match {
        case Some((bd, br)) =>
          assert(d == bd && r == br, s"node $v: ($d,$r) != replay ($bd,$br)")
        case None =>
          assert(d == -1L && r == -1L, s"node $v: ($d,$r) but unreachable")
      }
    }
    // non-vacuity: seeds at 0, some multi-hop node, some unreached node,
    // and at least one node whose nearest seed is NOT the smallest seed
    // overall (the min is per-node, not global)
    assert(out.values.exists(_._1 >= 2), "no multi-hop distance — radius vacuous")
    assert(out.values.exists(_._1 == -1L), "every node reached — unreachable class vacuous")
    assert(out.filter(_._2._1 > 0).values.map(_._2).toSet.size > 1,
      "all non-seed nodes claimed by one root — attribution vacuous")
  }

  test("graph_kcore: independent peel replay; the fixed-round peel has CONVERGED (one more round changes nothing)") {
    import spark.implicits._
    val out = GraphRank.graphKcore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    graft.SharedFrames.releaseAll()
    val edges = GraphRank.simEdges(spark, dir).as[(Long, Long)].collect()
    graft.SharedFrames.releaseAll()

    // simultaneous-peel replay in plain Scala, run PAST the operator's
    // round budget — the fixed-round answer must already be the fixpoint
    var surv = edges.map(_._1).toSet
    val history = scala.collection.mutable.ArrayBuffer(surv)
    (1 to GraphRank.KCoreIters + 4).foreach { _ =>
      val deg = edges.filter(e => surv(e._1) && surv(e._2))
        .groupBy(_._1).view.mapValues(_.length).toMap
      surv = surv.filter(v => deg.getOrElse(v, 0) >= GraphRank.KCoreK)
      history += surv
    }
    assert(history(GraphRank.KCoreIters) == history.last,
      s"peel not converged after ${GraphRank.KCoreIters} rounds — " +
        "the fixed-round semantics would diverge from the fixpoint")
    val coreDeg = edges.filter(e => surv(e._1) && surv(e._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    out.foreach { case (v, (inCore, d)) =>
      assert(inCore == surv(v), s"node $v: in_core $inCore != replay")
      assert(d == coreDeg.getOrElse(v, 0L), s"node $v: core_deg $d wrong")
    }
    // every survivor keeps >= K neighbors IN the core (the definition),
    // and the peel actually removed someone with original degree >= K
    surv.foreach(v => assert(coreDeg(v) >= GraphRank.KCoreK))
    val origDeg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    assert(out.exists { case (v, (in, _)) =>
      !in && origDeg.getOrElse(v, 0) >= GraphRank.KCoreK
    }, "no cascading peel — every non-core node was trivially low-degree")
  }

  test("graph_labelprop: exact synchronous-vote replay; communities non-trivial; sizes consistent") {
    import spark.implicits._
    val out = GraphRank.graphLabelprop(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.SharedFrames.releaseAll()
    val edges = GraphRank.simEdges(spark, dir).as[(Long, Long)].collect()
    graft.SharedFrames.releaseAll()
    val nodes = out.keySet.toSeq.sorted

    // simultaneous-vote replay in plain Scala: per round every node takes
    // the (max count, min label) vote of its neighbors' PREVIOUS labels
    var lab = nodes.map(v => v -> v).toMap
    (1 to GraphRank.LpIters).foreach { _ =>
      val byDst = edges.groupBy(_._2)
      lab = nodes.map { v =>
        val votes = byDst.getOrElse(v, Array.empty[(Long, Long)])
          .map { case (src, _) => lab(src) }
        if (votes.isEmpty) v -> v
        else {
          val counts = votes.groupBy(identity).view.mapValues(_.length).toMap
          v -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
        }
      }.toMap
    }
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.foreach { v =>
      assert(out(v)._1 == lab(v), s"node $v: label ${out(v)._1} != replay ${lab(v)}")
      assert(out(v)._2 == sizes(lab(v)), s"node $v: csize ${out(v)._2} wrong")
    }
    // non-trivial structure: at least one multi-node community formed and
    // not everything collapsed into a single label
    val distinct = out.values.map(_._1).toSet
    assert(out.values.exists(_._2 > 1), "no community with more than one member")
    assert(distinct.size > 1, "all nodes collapsed into one community")
    assert(distinct.size < nodes.size, "no label ever propagated")
  }
}
