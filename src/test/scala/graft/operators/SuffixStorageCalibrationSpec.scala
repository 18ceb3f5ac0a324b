package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import graft.SparkSpec

/** Pins the hand-measured deserialized-cache calibration behind the
  * suffix family's adaptive storage level (VERDICT r15 item 5): the
  * spill switch estimates each kept level frame at
  * [[Dedup.SuffixFrameBytesPerRow]] (~500) deserialized bytes per row.
  * That constant was measured on the all-long level-frame schema
  * (doc_id, idx, r, rw1..rw14, f4 — boxed longs + Row overhead); schema
  * drift (a dropped lead column, a widened fingerprint, a string
  * sneaking in) would silently mis-place the switch point — early costs
  * the measured ~40% serialized-CPU tax, late re-opens the spill
  * cliff. This spec persists a REAL level frame exactly as
  * suffixSpansCore's `keep` does and reads the ACTUAL block-manager
  * footprint, so any such drift breaks loudly here. */
class SuffixStorageCalibrationSpec extends AnyFunSuite with SparkSpec {

  test("persisted level-frame bytes/row sits within 2x of the calibration constant") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // the same (RDD[Row], deserialized MEMORY_AND_DISK) shape keep() uses
    val rdd = Dedup.l0FrameOf(docs).rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rdd.count()
      assert(n > 10000, s"sf0.001 corpus unexpectedly small ($n tokens) — " +
        "the per-row measurement would be dominated by block overhead")
      val info = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
        .getOrElse(fail("persisted level frame missing from storage info"))
      // a spill means memSize no longer measures the full frame — that is
      // an ENVIRONMENT limitation (small test heap), not schema drift, so
      // CANCEL rather than fail (ADVICE r16): only a genuine bytes-per-row
      // move should trip the 2x band below
      assume(info.diskSize == 0L,
        "the sf0.001 frame spilled to disk on this heap — calibration " +
          "unmeasurable here; cancelling (not a schema-drift failure)")
      val perRow = info.memSize.toDouble / n
      val c = Dedup.SuffixFrameBytesPerRow
      assert(perRow >= c / 2 && perRow <= c * 2,
        f"level-frame deserialized cost $perRow%.0f B/row is outside " +
          f"[${c / 2}%.0f, ${c * 2}%.0f] — the frame schema drifted; " +
          "re-measure and update Dedup.SuffixFrameBytesPerRow together " +
          "with the keepLevel calibration comment")
    } finally rdd.unpersist(blocking = false)
  }
}
