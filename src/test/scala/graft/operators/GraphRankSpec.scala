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
}
