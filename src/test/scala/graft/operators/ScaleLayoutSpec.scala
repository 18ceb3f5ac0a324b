package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleLayoutSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("bucketized tables join with no shuffle exchange on either side") {
    // (tmp warehouse dir is set at session build in TestSpark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.t(spark, dir, "orders")
      val lineitem = graft.Tables.t(spark, dir, "lineitem")
      val bo = ScaleLayout.bucketize(spark, orders, "orders_b", "o_orderkey", 8)
      val bl = ScaleLayout.bucketize(spark, lineitem, "lineitem_b", "l_orderkey", 8)
      val joined = bl.join(bo, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // co-located join must produce the same result as the plain one
      val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed_join (registered query): join stage shuffles NEITHER side; agg values sane") {
    val df = ScaleLayout.bucketedJoin(spark, dir)
    val plan = aqeFinalPlan(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only allowed Exchange is the post-join aggregation — never a
    // shuffle on the join key itself (that would mean the bucket layout
    // was not reused)
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"),
      s"bucketed join re-shuffled a join side:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum ==
      graft.Tables.t(spark, dir, "lineitem").count())
  }

  test("saltedJoin: result-identical to the plain join on a skewed dataset") {
    import spark.implicits._
    // pathological skew: 90% of the big side shares one key
    val big = (1 to 20000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, s"row$i")).toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = ScaleLayout.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getLong(0) == 7L) == 18000)
  }

  test("salted plan spreads the hot key across many partitions") {
    import spark.implicits._
    val big = (1 to 20000).map(i => (7L, s"row$i")).toDF("k", "payload")
    val small = Seq((7L, "dim")).toDF("k", "dim")
    val parts = ScaleLayout.saltedJoin(big, small, "k", salts = 8)
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1))
    // without salting everything lands in ONE reducer; with 8 salts the hot
    // key must occupy >1 partition and no partition holds everything
    assert(parts.length > 1, s"hot key not spread: ${parts.toSeq}")
    assert(parts.max < 20000, s"one partition still holds all rows")
  }

  test("BYTE-IDENTICAL duplicate rows of the hot key still spread evenly") {
    import spark.implicits._
    // worst-case duplicate-heavy skew: 16k copies of the SAME row — a
    // content-derived salt would put all of them in one salt bucket
    val big = (1 to 16000).map(_ => (7L, "same-payload")).toDF("k", "payload")
    val small = Seq((7L, "dim")).toDF("k", "dim")
    val salted = ScaleLayout.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == 16000) // result-identical to the plain join
    val buckets = ScaleLayout.withSalt(big, 8)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8, s"only ${buckets.length} salt buckets used")
    // round-robin within partitions ⇒ near-perfectly even
    assert(buckets.max - buckets.min <= big.rdd.getNumPartitions,
      s"uneven salt distribution: ${buckets.toSeq}")
  }

  test("salt assignment is DETERMINISTIC: two materializations agree row-for-row") {
    // scan-rooted input (parquet), as in the registered salted_join query;
    // the salt is a pure function of (partition, position), so re-running
    // the same plan must deal identical salts — the property that makes a
    // task retry reproduce, not re-deal, its partition's assignments
    val big = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    def materialize(): Seq[org.apache.spark.sql.Row] =
      ScaleLayout.withSalt(big, 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("__salt"))
        .collect().toSeq
    val first = materialize()
    val second = materialize()
    assert(first == second, "salt assignments differ across materializations")
    // and the salt really is dealt round-robin, not content-derived:
    // every bucket in [0, 8) is populated
    val used = first.map(_.getLong(2)).distinct.sorted
    assert(used == (0L until 8L), s"expected all 8 salt buckets: $used")
  }

  test("zorder_layout: every file a tight rectangle; point probes on EITHER dim prune ≥ 3/4 of files; orderkey-chunked layout prunes ~nothing") {
    val files = ScaleLayout.zorderLayout(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(files.length > 8, s"degenerate layout: ${files.length} files")
    val orders = graft.Tables.t(spark, dir, "orders")
    val n = orders.count()
    assert(files.map(_._2).sum == n, "files do not partition the table")
    // pruning power: for EACH file's own midpoint probe (a point lookup
    // on cust, and independently on day), count surviving files
    def survivors(probe: Long, lo: Int, hiI: Int): Int =
      files.count(f => f.productElement(lo).asInstanceOf[Long] <= probe &&
        probe <= f.productElement(hiI).asInstanceOf[Long])
    val custProbes = files.map(f => (f._3 + f._4) / 2)
    val dayProbes = files.map(f => (f._5 + f._6) / 2)
    custProbes.foreach { p =>
      assert(survivors(p, 2, 3) <= files.length / 2,
        s"cust probe $p survives in over half the z-files")
    }
    dayProbes.foreach { p =>
      assert(survivors(p, 4, 5) <= files.length / 2,
        s"day probe $p survives in over half the z-files")
    }
    // on average the rectangles admit ≤ 1/3 of files per point probe —
    // versus the orderkey-chunked baseline where cust min/max spans are
    // near-full so ~every file survives every cust probe
    val avgCust = custProbes.map(p => survivors(p, 2, 3)).sum.toDouble /
      (files.length * files.length)
    assert(avgCust <= 1.0 / 3,
      f"z-layout cust pruning too weak: $avgCust%.2f of files survive")
    import org.apache.spark.sql.expressions.Window
    val chunked = orders
      .withColumn("file_id", ntile(16).over(
        Window.orderBy(col("o_orderkey"))))
      .groupBy(col("file_id"))
      .agg(min(col("o_custkey")).as("mn"), max(col("o_custkey")).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val avgChunked = custProbes.map(p =>
      chunked.count(f => f._1 <= p && p <= f._2)).sum.toDouble /
      (custProbes.length * chunked.length)
    assert(avgChunked > 0.9,
      f"baseline unexpectedly prunes ($avgChunked%.2f) — probe not meaningful")
  }
}
