package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The chained-window funnel must agree with a sequential driver replay
  * of the per-user event stream, and both verdict sides must be
  * populated (purchases that convert AND purchases that don't). */
class FunnelSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("funnel_conversion ≡ sequential per-user replay; conversions and non-conversions both present") {
    val got = Relational.funnelConversion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val events = graft.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val W = Relational.FunnelWindowUs
    val expected = events.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (user, evs) =>
        val ordered = evs.sortBy(e => (e._3, e._2))
        var lastView: Option[Long] = None
        var lastClick: Option[(Long, Option[Long])] = None // (cts, vts at click)
        var purchases = 0L
        var funnels = 0L
        ordered.foreach { case (_, _, tus, tpe) =>
          if (tpe == "purchase") {
            purchases += 1
            lastClick match {
              case Some((cts, Some(vts)))
                  if tus - cts <= W && cts - vts <= W => funnels += 1
              case _ =>
            }
          }
          // state updates AFTER the verdict: windows are strictly-earlier
          if (tpe == "view") lastView = Some(tus)
          if (tpe == "click") lastClick = Some((tus, lastView))
        }
        if (purchases > 0) Some((user, purchases, funnels)) else None
    }
    assert(got == expected, "funnel diverges from the sequential replay")
    assert(got.exists(_._3 > 0), "no conversions — vacuous window")
    assert(got.exists(g => g._3 < g._2), "every purchase converts — vacuous")
  }
}
