package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of join semantics against a driver-side reference: the composed
  * union+window formulation must pick exactly the most recent prior view
  * per user under the (ts, event_id) order. */
class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("asof_join: each click pairs with the max-(ts,event_id) earlier view; first clicks get null") {
    val events = graft.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = Relational.asofJoin(spark, dir).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val byUser = events.groupBy(_._1)
    var withPrior = 0
    events.filter(_._4 == "click").foreach { case (u, id, ts, _) =>
      val views = byUser(u).filter(e => e._4 == "view" &&
        (e._3 < ts || (e._3 == ts && e._2 < id)))
      val want =
        if (views.isEmpty) None
        else Some(views.maxBy(e => (e._3, e._2))._2)
      assert(got(id) == want, s"click $id of user $u: got ${got(id)}, want $want")
      if (want.isDefined) withPrior += 1
    }
    assert(withPrior > 0, "no click had a prior view — vacuous corpus")
    assert(got.size == events.count(_._4 == "click"))
  }
}
