package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch properties BEYOND the DuckDB equality gate (which proves the
  * sketch content bit-identically): the CMS one-sided guarantee, HLL
  * estimation error vs the exact cardinality, and the bounded-state plan
  * shape (nothing token-keyed shuffles in the sketch build). */
class SketchesSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("sketch_cms: estimates never undercount, and overcount stays under the eps*N CMS bound") {
    graft.SharedFrames.releaseAll()
    val rows = Sketches.sketchCms(spark, dir).collect()
    assert(rows.length == Sketches.CmsProbeK)
    val totalToks = graft.Tables.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    rows.foreach { r =>
      val (cnt, est) = (r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"CMS undercounted ${r.getString(0)}: $est < $cnt")
      // depth-4 CMS: P(over > 2N/W) <= (1/2)^4 per row pair; with W=1024
      // buckets the expected overcount is N/W — allow 8x slack
      assert(est - cnt <= 8L * totalToks / Sketches.CmsW,
        s"CMS overcount ${est - cnt} exceeds 8N/W for ${r.getString(0)}")
    }
    graft.SharedFrames.releaseAll()
  }

  test("hll_distinct: raw estimate within 10% of the exact cardinality at every group") {
    val rows = Sketches.hllDistinct(spark, dir).collect()
    assert(rows.length == 3) // A, N, R returnflags
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(4)
      // expected std error 1.04/sqrt(1024) ~ 3.3%; 10% = ~3 sigma
      assert(math.abs(est - exact) / exact < 0.10,
        s"HLL est $est vs exact $exact at flag ${r.getString(0)}")
      // register-sum sanity: zeros in [0, m); regsum positive
      assert(r.getLong(3) >= 0 && r.getLong(3) < Sketches.HllM)
      assert(r.getLong(2) > 0)
    }
  }

  test("bloom_membership: no false negatives ever; FPs exist; width is the smallest power of two >= 4n") {
    val rows = Sketches.bloomMembership(spark, dir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the Bloom theorem: a stored key can never probe absent — the
    // (claimed=false, actual=true) class must not exist as a row
    assert(!rows.contains((false, true)), "false negative in a Bloom filter")
    assert(rows.contains((true, true)), "no true positives — probe vacuous")
    assert(rows.contains((true, false)), "no false positives — width vacuously large")
    assert(rows.contains((false, false)), "no rejections — filter saturated")
    val (_, bitsSet, m) = rows((true, true))
    val n = graft.Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0).count()
    assert(m >= 4 * n && m < 8 * n, s"m=$m not the least power of two >= 4n=$n")
    assert((m & (m - 1)) == 0, s"m=$m not a power of two")
    // k*n position insertions can set at most k*n bits, at least... > 0
    assert(bitsSet > 0 && bitsSet <= math.min(m, Sketches.BloomK * n))
    // FP yield sanity: rejections + FPs = the novel slice exactly
    val novel = graft.Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(rows((false, false))._1 + rows((true, false))._1 == novel)
  }

  test("kmv_overlap: estimates inside 15%, order-statistic structure, and the KMV merge theorem") {
    val r = Sketches.kmvOverlap(spark, dir).collect()(0)
    val (exactA, exactB, exactI) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val (hkA, hkB, hkU) = (r.getLong(4), r.getLong(5), r.getLong(6))
    val (estA, estB, estI) = (r.getDouble(8), r.getDouble(9), r.getDouble(10))
    def err(est: Double, exact: Long) = math.abs(est / exact - 1.0)
    assert(err(estA, exactA) < 0.15, s"est_a $estA vs $exactA")
    assert(err(estB, exactB) < 0.15, s"est_b $estB vs $exactB")
    assert(err(estI, exactI) < 0.15, s"est_inter $estI vs $exactI")
    // union ⊇ each set ⇒ the union's k-th smallest can never exceed a set's
    assert(hkU <= hkA && hkU <= hkB, s"order statistics inverted: $hkU $hkA $hkB")
    // KMV merge theorem: k smallest of (A ∪ B) == k smallest of
    // (KMV_A ∪ KMV_B) — sketches of shards merge without rescanning
    import graft.functions.RollingHash.rolling_hash
    val h0 = rolling_hash(col("o_custkey").cast("string"))
    val g1 = (h0 * h0 + lit(Sketches.HllA2) * h0 + lit(11L)) % Sketches.HashP
    val g = (g1 * g1 + lit(Sketches.KmvA) * g1 + lit(Sketches.KmvB)) %
      Sketches.HashP
    val orders = graft.Tables.t(spark, dir, "orders")
    def hashesOf(st: String): Array[Long] = orders
      .filter(col("o_orderstatus") === st).select(g.as("g"))
      .distinct().collect().map(_.getLong(0)).sorted
    val (a, b) = (hashesOf("F"), hashesOf("O"))
    val direct = (a.toSet ++ b.toSet).toArray.sorted.take(Sketches.KmvK)
    val merged = (a.take(Sketches.KmvK).toSet ++ b.take(Sketches.KmvK).toSet)
      .toArray.sorted.take(Sketches.KmvK)
    assert(direct.sameElements(merged), "KMV merge != sketch of union")
    assert(direct.last == hkU, "operator's union k-th order statistic drifted")
  }

  test("hll registers are scale-bounded: the register table never exceeds groups*m rows") {
    // the sketch state that shuffles is the register table itself — at
    // any corpus size it is <= 3 flags * 1024 buckets
    import graft.functions.RollingHash.rolling_hash
    val li = graft.Tables.t(spark, dir, "lineitem")
    val p = Sketches.HashP
    val h = rolling_hash(col("l_orderkey").cast("string"))
    val g = (h * h + lit(Sketches.HllA2) * h + lit(11L)) % p
    val regs = li.select(col("l_returnflag"),
      (((lit(Sketches.HllA1) * g + Sketches.HllB1) % p) % Sketches.HllM)
        .as("bucket"))
      .groupBy(col("l_returnflag"), col("bucket")).count()
    assert(regs.count() <= 3 * Sketches.HllM)
  }

  test("hist_quantiles: estimates land within one bin width of the exact sorted quantile") {
    val est = Sketches.histQuantiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(est.size == 3 * Sketches.HistQs.size)
    val li = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("x"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 0.95)").as("p95"),
        ((max(col("x")) - min(col("x"))) / Sketches.HistBins).as("w"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    exact.foreach { case (flag, (p50, p95, w)) =>
      // the true quantile lies inside the located bin; linear
      // interpolation keeps the estimate within that bin too
      assert(math.abs(est((flag, 0.5)) - p50) <= w,
        s"$flag P50 est ${est((flag, 0.5))} vs exact $p50 (bin width $w)")
      assert(math.abs(est((flag, 0.95)) - p95) <= w,
        s"$flag P95 est ${est((flag, 0.95))} vs exact $p95 (bin width $w)")
    }
  }

  test("cmsMatrixOf: streaming micro-batch matrix equals the batch sketch exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.RollingHash.rolling_hash
    val toks = graft.Tables.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .select(rolling_hash(col("token")).as("h")).as[Long].collect()
    val mem = MemoryStream[Long]
    val q = Sketches.cmsMatrixOf(mem.toDF().toDF("h"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches: the matrix must MERGE across them (the
      // mergeable-sketch property as streaming state)
      val (b1, b2) = toks.splitAt(toks.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.cmsMatrixOf(
        toks.toSeq.toDF("h"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch, "streaming CMS matrix diverged from batch")
      assert(got.size <= 4 * Sketches.CmsW, "CMS state exceeded D*W rows")
    } finally q.stop()
  }

  test("kmvSketchOf: streaming sketch over RAW duplicate-bearing rows equals batch after every prefix") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // RAW per-order rows — duplicates included: the distinct-top-k
    // aggregate must collapse them inside its bounded buffer
    val rows = graft.Tables.t(spark, dir, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(when(col("o_orderstatus") === "F", lit("a")).otherwise(lit("b"))
        .as("s"), Sketches.kmvHash(col("o_custkey").cast("string")).as("g"))
      .as[(String, Long)].collect()
    val mem = MemoryStream[(String, Long)]
    val q = Sketches.kmvSketchOf(mem.toDF().toDF("s", "g"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      def sketchMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toList)
        .toMap
      var fed = Vector.empty[(String, Long)]
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
        fed ++= b
        val got = sketchMap(spark.table("kmv_stream"))
        val batch = sketchMap(Sketches.kmvSketchOf(fed.toDF("s", "g")))
        assert(got == batch, s"streaming KMV diverged after ${fed.size} rows")
        // state bound: k distinct smallest per set, duplicates collapsed
        got.values.foreach { l =>
          assert(l.size <= Sketches.KmvK && l.distinct.size == l.size)
        }
      }
    } finally q.stop()
  }

  test("hllRegistersOf: streaming register table equals batch exactly and stays bounded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val keys = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey").cast("string"))
      .as[(String, String)].collect()
    val mem = MemoryStream[(String, String)]
    val q = Sketches.hllRegistersOf(mem.toDF().toDF("grp", "key"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = keys.splitAt(keys.length / 3)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("hll_stream")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val batch = Sketches.hllRegistersOf(keys.toSeq.toDF("grp", "key"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got == batch, "streaming HLL registers diverged from batch")
      assert(got.size <= 3 * Sketches.HllM, "register state exceeded groups*m")
    } finally q.stop()
  }

  test("cms build: the sketch aggregate is partial-combinable (map-side partial before the exchange)") {
    graft.SharedFrames.releaseAll()
    val p = aqeFinalPlan(Sketches.sketchCms(spark, dir))
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"CMS build has no map-side partial aggregation:\n$p")
    // the probe side (K*D rows) must broadcast onto the matrix
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"CMS probe rows are not broadcast:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("sketch_f2: every row over-estimates F2 (one-sided), the min lands within the N^2/W noise, exact F2 replays") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.sketchF2(spark, dir).collect()
      .map(r => (r.getInt(0), BigInt(r.getString(1)),
        BigInt(r.getString(2)), BigInt(r.getString(3)), r.getDouble(4)))
    graft.SharedFrames.releaseAll()
    assert(rows.length == Sketches.CmsRows.length)

    // independent exact F2 from the raw token stream
    val counts = graft.Tables.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).count().collect().map(_.getLong(1))
    val f2 = counts.map(c => BigInt(c) * BigInt(c)).sum
    val n = BigInt(counts.sum)

    rows.foreach { case (_, estRow, exact, estMin, ratio) =>
      assert(exact == f2, s"exact F2 $exact != replay $f2")
      assert(estRow >= f2, s"row estimate $estRow undercuts F2 $f2")
      assert(estMin == rows.map(_._2).min)
      // additive error of the min is bounded by the expected n²/W
      // collision mass (generous 2× headroom — W=1024 on ≤dozens of
      // distinct hot tokens leaves most rows collision-free)
      assert(BigDecimal(estMin - f2) <=
        BigDecimal(2) * BigDecimal(n * n) / BigDecimal(Sketches.CmsW),
        s"min estimate $estMin too far above F2 $f2")
      assert(ratio >= 1.0)
    }
  }

  test("hll_merge_incremental: merged shard sketches equal the single-pass sketch; split non-vacuous") {
    val full = Sketches.hllDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val merged = Sketches.hllMergeIncremental(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(merged == full,
      "merge of shard registers diverged from the single-pass sketch")
    // the split genuinely divides the data — both shards contribute rows
    val li = graft.Tables.t(spark, dir, "lineitem")
    assert(li.filter(col("l_orderkey") % 10 === 0).limit(1).count() == 1)
    assert(li.filter(col("l_orderkey") % 10 =!= 0).limit(1).count() == 1)
  }
}
