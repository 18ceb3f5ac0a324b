package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup properties beyond the DuckDB equality gate: the keeper rule on
  * constructed vectors (known answers), threshold non-vacuity, and
  * cluster-assignment sanity on the corpus. */
class SemDedupSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("semDedupCore: cluster assignment and lower-id keeper election on constructed vectors") {
    import spark.implicits._
    // two near-orthogonal centroids; 10 and 11 are near-dups in cluster 0
    // (cos ≈ 0.9997); 12 sits alone in cluster 1 (cos to the centroid
    // vector ≈ 0.9945, under τ)
    val e = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0)),
      (10L, Array(0.9, 0.1)),
      (11L, Array(0.92, 0.08)),
      (12L, Array(0.1, 0.95))
    ).toDF("vec_id", "ev")
      .withColumn("nrm",
        sqrt(graft.functions.VecDot.vec_dot(col("ev"), col("ev"))))
    val cents = e.filter(col("vec_id") < 2L)
      .select(col("vec_id").as("cid"), col("ev").as("cv"),
        col("nrm").as("cn"))
    val out = Similarity.semDedupCore(e, cents, tau = 0.995)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(0L) == ((0L, true)))
    assert(out(1L) == ((1L, true)))
    assert(out(10L) == ((0L, true))) // cos(0,10) ≈ 0.9939 < τ
    assert(out(11L) == ((0L, false))) // near-dup of lower-id 10 (and of 0)
    assert(out(12L) == ((1L, true))) // only member above τ with nobody
  }

  test("cluster_balanced_sample: per-cluster cap holds; picks are kept vectors in diversity order") {
    graft.SharedFrames.releaseAll()
    val picks = Similarity.clusterBalancedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(picks.nonEmpty)
    val kept = Similarity.semDedup(spark, dir).filter(col("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    picks.groupBy(_._1).foreach { case (cl, members) =>
      assert(members.length <= Similarity.ClusterSampleM,
        s"cluster $cl exceeds the per-cluster cap")
      // ranks contiguous from 1; cosines ascending (farthest first)
      assert(members.map(_._2).sorted.toSeq == (1L to members.length).toSeq)
      val cos = members.sortBy(_._2).map(_._4).toSeq
      assert(cos == cos.sorted, s"cluster $cl picks not in diversity order")
      members.foreach { m =>
        assert(kept.get(m._3).contains(cl),
          s"pick ${m._3} is not a kept member of cluster $cl")
      }
    }
    // a tail cluster with <= M kept members keeps ALL of them
    val keptSizes = kept.groupBy(_._2).view.mapValues(_.size)
    val small = keptSizes.filter(_._2 <= Similarity.ClusterSampleM)
    small.foreach { case (cl, n) =>
      assert(picks.count(_._1 == cl) == n,
        s"tail cluster $cl lost members: ${picks.count(_._1 == cl)} of $n")
    }
    graft.SharedFrames.releaseAll()
  }

  test("semdedup: non-vacuous keep split; clusters in [0, K); affinity in [-1, 1]") {
    val rows = Similarity.semDedup(spark, dir).collect()
    assert(rows.length == graft.Tables.t(spark, dir, "embeddings").count())
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length,
      s"keep flag vacuous: $kept of ${rows.length}")
    val k = Similarity.semDedupKFor(rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < k)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
    }
  }

  test("semdedup: K derives from corpus size and caps cluster populations at every SF") {
    // the 100 TB contract made ENFORCEABLE (not just documented): K =
    // max(8, ceil(n / SemDedupTargetPop)), so per-cluster populations —
    // and with them the within-cluster pair join — stay O(target) no
    // matter the corpus. Drive the REGISTERED query at all three SFs and
    // pin: derived K matches the formula, every cluster attracts vectors,
    // and no population exceeds 2× the target (the slack k-means needs on
    // non-uniform data; a scale-dishonest fixed K would blow through it
    // at the first SF where n/K > 128).
    assert(Similarity.semDedupKFor(500) == 8)
    assert(Similarity.semDedupKFor(2000) == 32)
    assert(Similarity.semDedupKFor(64L * 1000 * 1000) == 1000000)
    val ks = for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) yield {
      val rows = Similarity.semDedup(spark, s"/root/testdata/$sf").collect()
      val k = Similarity.semDedupKFor(rows.length)
      // K really derives from THIS corpus's size (not a stale constant) —
      // a testdata regen that changes n must change K with it
      assert(k == Similarity.semDedupKFor(
        graft.Tables.t(spark, s"/root/testdata/$sf", "embeddings").count()))
      val pops = rows.groupBy(_.getLong(1)).view.mapValues(_.length)
      assert(pops.size == k, s"$sf: ${pops.size} of $k clusters populated")
      assert(pops.values.max <= 2 * Similarity.SemDedupTargetPop,
        s"$sf: max cluster population ${pops.values.max} breaches " +
          s"2×${Similarity.SemDedupTargetPop}")
      val kept = rows.count(_.getBoolean(3))
      assert(kept > 0 && kept < rows.length, s"$sf: keep flag vacuous")
      k
    }
    // the derivation must actually BITE across the SF ladder: if every SF
    // yields the same K, either the regen flattened corpus sizes or the
    // formula silently went constant — both are exactly what this guard
    // exists to catch (current corpora: 500/500/2000 vectors → K 8/8/32)
    assert(ks.distinct.size >= 2,
      s"derived K constant across SFs: $ks — K ∝ n is not engaged")
  }

  test("semdedup: trained centroids bound the pair join — every cluster populated, none dominant") {
    // the scale contract (SemDedupK scaladoc): the within-cluster pair
    // join is bounded by cluster POPULATIONS; k-means earns that only if
    // the clustering actually spreads the corpus. Pin it: all K clusters
    // attract vectors, and no cluster holds a majority (a degenerate
    // training collapse — e.g. centroids never moving off a bad init —
    // would concentrate mass and quietly re-grow the O(n²) pair join).
    val rows = Similarity.semDedup(spark, dir).collect()
    val k = Similarity.semDedupKFor(rows.length)
    val pops = rows.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(pops.size == k,
      s"only ${pops.size} of $k clusters populated")
    val maxPop = pops.values.max
    assert(maxPop * 2 < rows.length,
      s"dominant cluster holds $maxPop of ${rows.length} vectors")
  }

  test("blocked centroid fold ≡ single block when K spans several blocks (r17 sharding pin)") {
    // K = 8 on sf0.001 → blockRows = 3 splits training, norm derivation
    // AND assignment across 3 blocks (3 + 3 + 2); the fold must replay
    // the single-array scan bit-for-bit — same Lloyd init/update per
    // block range, same ascending-cid election, same doubles
    graft.SharedFrames.releaseAll()
    val one = Similarity.semDedupWithBlockRows(spark, dir, blockRows = 1 << 20)
      .collect().toSeq
    graft.SharedFrames.releaseAll()
    val blk = Similarity.semDedupWithBlockRows(spark, dir, blockRows = 3)
      .collect().toSeq
    graft.SharedFrames.releaseAll()
    assert(one.nonEmpty && one == blk,
      "blocked centroid structures diverged from the single-block path")
  }

  test("centroidBlocksOf: rank blocking over an explicit centroid frame folds identically") {
    import spark.implicits._
    // constructed 5-centroid frame spanning 3 value-range blocks at
    // blockRows = 2, with a zero-norm centroid (cid 2) so the NaN-first
    // descending rule must FOLD across blocks (NaN arrives in the middle
    // block and must hold against later finite cosines)
    val cents = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(0.0, 0.0)), (3L, Array(0.6, 0.8)),
      (4L, Array(0.6, 0.8))
    ).toDF("cid", "cv")
      .withColumn("cn",
        sqrt(graft.functions.VecDot.vec_dot(col("cv"), col("cv"))))
    val e = Seq(
      (0L, Array(0.9, 0.1)), (1L, Array(0.1, 0.9)),
      (2L, Array(0.59, 0.81)), (3L, Array(-1.0, -1.0))
    ).toDF("vec_id", "ev")
      .withColumn("nrm",
        sqrt(graft.functions.VecDot.vec_dot(col("ev"), col("ev"))))
    def run(blockRows: Int): (Seq[org.apache.spark.sql.Row], Int, Int) = {
      val blocks = Similarity.centroidBlocksOf(cents, blockRows)
      val out = Similarity.semDedupAssignBlocked(e, blocks)
        .orderBy(col("vec_id"))
        .select(col("vec_id"), col("cluster"), col("cos_centroid"))
        .collect().toSeq
      graft.SharedFrames.releaseAll()
      (out, blocks.map(_.value.length).sum, blocks.length)
    }
    val (single, n1, b1) = run(1 << 20)
    val (folded, n2, b2) = run(2)
    assert(n1 == 5 && n2 == 5 && b1 == 1 && b2 == 3)
    assert(single == folded,
      "cross-block assignment fold diverged from the single-block scan")
    // every vector assigned to the NaN-cosine zero-norm centroid (cid 2,
    // NaN sorts first descending; lowest cid within the NaN class) — the
    // fold must agree even though cid 2 sits alone in the MIDDLE block
    assert(single.forall(_.getLong(1) == 2L))
    // exact-tie election ACROSS a block boundary: without the NaN
    // centroid, cids 3 and 4 carry the SAME vector — at blockRows = 1
    // they land in different blocks and the identical cosine must keep
    // the FIRST (lowest-cid) winner, exactly as the old single-array scan
    val noNan = cents.filter(col("cid") =!= 2L)
    val tied = Similarity.semDedupAssignBlocked(e,
        Similarity.centroidBlocksOf(noNan, 1))
      .filter(col("vec_id") === 2L).collect()
    graft.SharedFrames.releaseAll()
    assert(tied.length == 1 && tied(0).getLong(1) == 3L,
      s"cross-block tie elected ${tied.toSeq} — expected lowest cid 3")
  }

  test("rankBlockBounds: rank-even blocks on sparse/offset ids; centroidBlocksOf survives the r17 footgun cids") {
    import spark.implicits._
    // the ADVICE r17 case: cid VALUES {7, 10^12, ...} — value-range
    // blocking would iterate the whole span; rank blocking must give
    // exactly ceil(K/step) even blocks
    val ids = Seq(1000000000000L, 7L, 999L, -5L, 123456789L, 42L)
    val df = ids.toDF("cid").repartition(3)
    val (effK, lo, hi) = Similarity.rankBlockBounds(df, 6L, 2)
    val sortedIds = ids.sorted
    assert(effK == 6L && lo.length == 3 && hi.length == 3)
    assert(lo.toSeq == Seq(sortedIds(0), sortedIds(2), sortedIds(4)))
    assert(hi.toSeq == Seq(sortedIds(1), sortedIds(3), sortedIds(5)))
    // k caps the covered prefix
    val (effK2, lo2, hi2) = Similarity.rankBlockBounds(df, 3L, 2)
    assert(effK2 == 3L && lo2.toSeq == Seq(sortedIds(0), sortedIds(2)) &&
      hi2.toSeq == Seq(sortedIds(1), sortedIds(2)))
    // end-to-end: a sparse-cid centroid frame through the public
    // semDedupCore boundary blocks by RANK (3 bounded collects, not a
    // value-span sweep) and folds identically to the single block
    val cents = Seq(
      (7L, Array(1.0, 0.0)), (999L, Array(0.0, 1.0)),
      (1000000000000L, Array(0.6, 0.8))
    ).toDF("cid", "cv")
      .withColumn("cn",
        sqrt(graft.functions.VecDot.vec_dot(col("cv"), col("cv"))))
    val e = Seq((0L, Array(0.9, 0.1)), (1L, Array(0.5, 0.9)))
      .toDF("vec_id", "ev")
      .withColumn("nrm",
        sqrt(graft.functions.VecDot.vec_dot(col("ev"), col("ev"))))
    def assigned(blockRows: Int) = {
      val out = Similarity.semDedupAssignBlocked(e,
          Similarity.centroidBlocksOf(cents, blockRows))
        .select(col("vec_id"), col("cluster"), col("cos_centroid"))
        .orderBy(col("vec_id")).collect().toSeq
      graft.SharedFrames.releaseAll()
      out
    }
    assert(assigned(1) == assigned(1 << 20),
      "sparse-cid rank blocks folded differently from the single block")
  }

  test("assignment boundary drops (and survives) a null-embedding row without shrinking the rest") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("cid", "cv")
      .withColumn("cn",
        sqrt(graft.functions.VecDot.vec_dot(col("cv"), col("cv"))))
    // row 1 carries a null embedding (and hence null nrm) — the audit
    // table must omit exactly that row, loudly (accumulator + warn),
    // with the well-formed rows untouched (ADVICE r17)
    val e = Seq(
      (0L, Some(Array(0.9, 0.1))), (1L, None), (2L, Some(Array(0.1, 0.9)))
    ).toDF("vec_id", "ev")
      .withColumn("nrm",
        sqrt(graft.functions.VecDot.vec_dot(col("ev"), col("ev"))))
    val out = Similarity.semDedupAssignBlocked(e,
        Similarity.centroidBlocksOf(cents, 1 << 20))
      .select(col("vec_id"), col("cluster")).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.SharedFrames.releaseAll()
    assert(out == Seq((0L, 0L), (2L, 1L)),
      s"expected the null row dropped and the rest assigned — got $out")
  }

  test("semDedupCentroids: training moves centroids off the init and is idempotent") {
    val init = graft.Tables.t(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("ev"))
      .orderBy("vec_id").limit(Similarity.SemDedupK)
      .collect().map(_.getSeq[Double](1).toArray)
    val t1 = Similarity.semDedupCentroids(spark, dir)
    val t2 = Similarity.semDedupCentroids(spark, dir)
    // exact reproducibility is the whole point of the fixed-point update:
    // two trainings over different partition orders agree bit-for-bit
    assert(t1.length == t2.length &&
      t1.zip(t2).forall { case (a, b) => a.sameElements(b) })
    assert(t1.zip(init).exists { case (a, b) => !a.sameElements(b) },
      "training left every centroid exactly at its init vector")
  }

  test("semdedup: no vector kept while a lower-id same-cluster near-dup exists (rule replayed driver-side)") {
    import spark.implicits._
    val rows = Similarity.semDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("ev"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = rows.groupBy(_._2)
    rows.foreach { case (id, cl, kept) =>
      val hasLowerDup = byCluster(cl).exists { case (o, _, _) =>
        o < id && cos(vecs(o), vecs(id)) >= Similarity.SemDedupTau
      }
      assert(kept == !hasLowerDup, s"vec $id in cluster $cl: kept=$kept")
    }
  }

  test("semdedup_incremental: equals the full rule (corpus-trained centroids) restricted to the delta; corpus probe live; split non-vacuous") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val cut = Dedup.IncrementalCut
    val inc = Similarity.semDedupIncremental(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(inc.keys.forall(_ >= cut) && inc.nonEmpty)
    val kept = inc.values.count(_._2)
    assert(kept > 0 && kept < inc.size, s"delta keep flag vacuous: $kept of ${inc.size}")
    // reference: run the FULL rule through semDedupCore with the SAME
    // corpus-trained centroids and restrict to the delta — the explicit
    // delta-probe join must reproduce it verdict-for-verdict
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
      .withColumn("nrm",
        sqrt(graft.functions.VecDot.vec_dot(col("ev"), col("ev"))))
    val k = Similarity.semDedupKFor(
      emb.filter(col("vec_id") < cut).count())
    val cents = Similarity.semDedupCentroids(spark, d, k = k, maxId = cut)
      .zipWithIndex.map { case (cv, i) => (i.toLong, cv) }.toSeq
      .toDF("cid", "cv")
      .withColumn("cn",
        sqrt(graft.functions.VecDot.vec_dot(col("cv"), col("cv"))))
    val full = Similarity.semDedupCore(emb, cents, Similarity.SemDedupTau)
      .filter(col("vec_id") >= cut).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(inc == full, "incremental != full-rule restriction")
    // the corpus probe is live: pruning the delta against ITSELF only must
    // lose at least one drop (a delta vector whose only near-dup is in the
    // corpus) — otherwise the operator silently degenerated to delta-only
    val deltaOnly = Similarity.semDedupCore(
        emb.filter(col("vec_id") >= cut), cents, Similarity.SemDedupTau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(inc.exists { case (id, (_, keptI)) => !keptI && deltaOnly(id) },
      "no delta vector is dropped solely due to a corpus neighbor — probe dead")
  }
}
