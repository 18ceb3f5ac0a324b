package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR selection properties beyond the DuckDB equality gate: selection
  * stays inside the candidate pool, the feature space stays D-bounded,
  * and the weight table broadcasts (the corpus never shuffles on the
  * feature key). */
class DsirSelectSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("dsir_select: only candidate docs are selected; scores positive; K rows") {
    graft.SharedFrames.releaseAll()
    val rows = DsirSelect.dsirSelect(spark, dir).collect()
    assert(rows.length == DsirSelect.DsirK)
    rows.foreach { r =>
      assert(!DsirSelect.DsirTargetSources.contains(r.getString(1)),
        s"target-slice doc ${r.getLong(0)} (${r.getString(1)}) selected")
      assert(r.getLong(3) > 0, "selected doc without bigram features")
      assert(r.getDouble(4) > 0.0, "non-positive importance score")
    }
    // descending score order with doc_id tiebreak
    val scores = rows.map(r => (-r.getDouble(4), r.getLong(0))).toSeq
    assert(scores == scores.sorted, "selection not in (score desc, doc_id) order")
    graft.SharedFrames.releaseAll()
  }

  test("dsir_select: weight table is D-bounded and broadcasts; per-doc sum has map-side partials") {
    graft.SharedFrames.releaseAll()
    val p = aqeFinalPlan(DsirSelect.dsirSelect(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"weight table does not broadcast onto candidate features:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"per-doc score sum has no map-side partial aggregate:\n$p")
    // the weight BUILD may exchange on j (D-bounded after map-side
    // partials), but the candidate SCORING join must be broadcast, never
    // a sort-merge that shuffles the corpus feature stream on j
    assert(!p.contains("SortMergeJoin [j#"),
      s"candidate scoring sort-merges the corpus feature stream on j:\n$p")
    graft.SharedFrames.releaseAll()
  }
}
