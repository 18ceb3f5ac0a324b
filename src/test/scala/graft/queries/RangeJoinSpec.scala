package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bucket-decomposed interval join must (a) compute exactly what the
  * naive BETWEEN join computes and (b) actually plan as an EQUI-join on
  * the bucket id — no nested loop over the probe side. */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("range_join: decomposition ≡ naive BETWEEN join; bands overlap (multi-match rows exist); no row matched twice per band") {
    val got = Relational.rangeJoinBucketed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // naive driver replay with the same single-IEEE-op band arithmetic
    val prices = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val p0 = prices.map(_._1).min
    val p1 = prices.map(_._1).max
    val bands = (0L until Relational.RangeBands).map { b =>
      val lo = p0 + b * ((p1 - p0) / (Relational.RangeBands + 10))
      (b, lo, lo + (p1 - p0) / 12)
    }
    val expected = bands.flatMap { case (b, lo, hi) =>
      val in = prices.filter(p => p._1 >= lo && p._1 <= hi)
      if (in.isEmpty) None
      else Some((b, in.length.toLong,
        in.map(p => BigDecimal(p._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .foldLeft(BigDecimal(0))(_ + _).toDouble))
    }
    assert(got.map(g => (g._1, g._2)).toSeq ==
      expected.map(e => (e._1, e._2)).toSeq,
      "bucket decomposition found a different band membership")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-6, s"band ${g._1} qty ${g._3} != ${e._3}")
    }
    // overlap is real: total matches exceed the row count (each price
    // point sits in several bands), so the interval join is non-trivial
    assert(got.map(_._2).sum > prices.length,
      "bands do not overlap — degenerate interval join")
    // plan shape: the probe side reaches the bands through an EQUI-join
    // (hash or sort-merge on bk), not a BroadcastNestedLoopJoin over the
    // probe rows. (The 1-row min/max broadcast is the only BNLJ allowed.)
    val plan = Relational.rangeJoinBucketed(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bk"), "bucket key missing from the executed plan")
    val hasEqui = plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      (plan.contains("BroadcastHashJoin") && plan.contains("bk"))
    assert(hasEqui, s"no equi-join on the bucket id in:\n$plan")
  }
}
