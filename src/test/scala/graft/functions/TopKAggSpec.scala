package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bounded partial top-k aggregator must rank exactly like the window
  * formulation, stay partitioning-independent, and plan as a partial
  * hash aggregation — NOT a window sort. */
class TopKAggSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("topk_per_group ≡ the row_number window; partitioning-independent; plans as partial aggregation, no Window") {
    import org.apache.spark.sql.expressions.Window
    val q = graft.queries.Relational.topkPerGroup(spark, dir)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val orders = graft.Tables.t(spark, dir, "orders")
    val viaWindow = orders
      .withColumn("rnk", row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("long"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == viaWindow.toSeq,
      "bounded-merge ranking diverges from the window ranking")
    assert(got.nonEmpty && got.exists(_._2 == 3L),
      "no group reached k entries — vacuous")
    // partitioning independence: a hostile repartition yields the same rows
    val repart = graft.Tables.t(spark, dir, "orders").repartition(13)
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.top_k(3)(col("o_orderkey"), col("o_totalprice")).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long"),
        col("col.id"), col("col.v"))
      .orderBy(col("o_custkey"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(repart.toSeq == got.toSeq, "result depends on input partitioning")
    // plan shape: an aggregate exchange (partial -> final), never a
    // Window/Sort over the full order rows
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), s"no aggregate in plan:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into the plan:\n$plan")
    // the merge is really k-bounded: an adversarial driver-side merge of
    // long rank-sorted lists truncates at k and keeps order
    val a = List(TopKAgg.Entry(1, 9.0), TopKAgg.Entry(2, 7.0), TopKAgg.Entry(3, 5.0))
    val b = List(TopKAgg.Entry(4, 8.0), TopKAgg.Entry(5, 7.0), TopKAgg.Entry(6, 6.0))
    val agg = TopKAgg.of(3)
    val m = agg.merge(a, b)
    assert(m == List(TopKAgg.Entry(1, 9.0), TopKAgg.Entry(4, 8.0),
      TopKAgg.Entry(2, 7.0)), s"merge wrong: $m")
    // tie at 7.0: id 2 beats id 5 (ascending id tie-break)
  }

  test("top_k_w merge laws: payload inert, associative, commutative, k-bounded under randomized merge trees") {
    // the payload-carrying variant must be EXACTLY top_k on (id, v) with
    // w along for the ride — randomized property sweep over merge shapes
    val agg = TopKAgg.ofW(4)
    val rnd = new scala.util.Random(20260814)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(24)
      // duplicate values force the (v desc, id asc) tie order to matter
      val entries = (1 to n).map { _ =>
        TopKAgg.EntryW(rnd.nextInt(50), rnd.nextInt(6).toDouble,
          rnd.nextLong(1000))
      }.toList
      val expected = entries.sortBy(e => (-e.v, e.id)).take(4)
        .map(e => (e.id, e.v))
      // random binary merge tree over random slices
      def fold(es: List[TopKAgg.EntryW]): List[TopKAgg.EntryW] =
        if (es.length <= 1) es.foldLeft(agg.zero)((b, e) => agg.reduce(b, e))
        else {
          val cut = 1 + rnd.nextInt(es.length - 1)
          agg.merge(fold(es.take(cut)), fold(es.drop(cut)))
        }
      val got = fold(entries)
      assert(got.length <= 4, s"trial $trial: buffer exceeded k")
      assert(got.map(e => (e.id, e.v)) == expected,
        s"trial $trial: ranking diverged\n got=$got\n exp=$expected")
      // payload inertness: each surviving (id, v) carries ITS OWN w —
      // compare against the first matching input entry in rank order
      got.foreach { e =>
        assert(entries.exists(x => x.id == e.id && x.v == e.v && x.w == e.w),
          s"trial $trial: payload corrupted for $e")
      }
      // commutativity of merge on disjoint halves
      val (l, r) = entries.splitAt(entries.length / 2)
      assert(agg.merge(fold(l), fold(r)).map(e => (e.id, e.v)) ==
        agg.merge(fold(r), fold(l)).map(e => (e.id, e.v)),
        s"trial $trial: merge not commutative on ranks")
    }
  }
}
