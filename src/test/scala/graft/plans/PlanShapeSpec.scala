package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.queries.{KvSurface, Relational}

/** Pins the scale-critical physical-plan shapes so a regression (a lost
  * broadcast, a fact-table shuffle on a dimension key, a fat scan) fails a
  * test instead of silently multiplying shuffle bytes at 100 TB. These are
  * assertions about the PLAN, not the result — the oracle gate covers
  * results. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    aqeFinalPlan(df)

  test("q5_multijoin: all four dimension joins broadcast; fact never shuffles on a dim key") {
    val p = plan(Relational.q5Multijoin(spark, dir))
    // >= 4: the four dimension joins MUST broadcast; at tiny SFs AQE may
    // additionally turn the orders⋈lineitem join into a fifth broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected the 4 dim joins to broadcast:\n$p")
    // the fact side may shuffle on the join key (orderkey) but must never
    // be hash-partitioned by a dimension key
    Seq("c_custkey", "s_suppkey", "n_nationkey", "r_regionkey").foreach { k =>
      assert(!p.contains(s"hashpartitioning($k"),
        s"fact side shuffled on dimension key $k:\n$p")
    }
  }

  test("q1_agg: map-side partial aggregation precedes the exchange") {
    val p = plan(Relational.q1Agg(spark, dir))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial (map-side) aggregation before the shuffle:\n$p")
    // the filter reaches the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to the scan:\n$p")
  }

  test("left_outer_orders: orders aggregate sits BELOW the outer join") {
    val p = plan(Relational.leftOuterOrders(spark, dir))
    // the per-custkey aggregate must be on the join's input side (partial
    // aggregation markers appear; a join-then-aggregate plan would have
    // exactly one aggregate ABOVE the join and no partial o_custkey
    // grouping below it)
    val joinAt = p.indexOfSlice("Join")
    val aggAt = p.indexOfSlice("partial_count")
    assert(joinAt >= 0 && aggAt >= 0, s"missing join or partial agg:\n$p")
    // in the formatted tree, children print BELOW their parent — the
    // aggregate's first appearance must come after (deeper than) the join
    assert(aggAt > joinAt,
      s"orders aggregate is not below the outer join:\n$p")
    // and the aggregate groups by o_custkey, i.e. it IS the orders pre-agg
    assert(p.contains("hashpartitioning(o_custkey"),
      s"no o_custkey pre-aggregation exchange:\n$p")
  }

  test("LSH bucket self-joins never broadcast (corpus-sized build side)") {
    // at 100 TB the bucket tables are corpus-sized; a broadcast here is a
    // plan that dies at scale (and measured slower locally: the driver
    // pays the build). shuffle_hash is pinned via hint — assert it held.
    Seq(
      "dedup_minhash_lsh" -> graft.operators.Dedup.dedupMinhashLsh(spark, dir),
      "dedup_simhash" -> graft.operators.Dedup.dedupSimhash(spark, dir),
      "embedding_neardup_lsh" ->
        graft.operators.Similarity.embeddingNearDup(spark, dir)
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(p.contains("ShuffledHashJoin"),
        s"$name bucket join is not a shuffled hash join:\n$p")
    }
  }

  test("pack_shards + pipeline_e2e: EVERY window in the plan is partitioned — no single-task window at any scale") {
    // a partition-less window is ONE task at any corpus size (Spark warns
    // "No Partition Defined for Window operation"); the nested offset
    // reduction must leave no such window ANYWHERE — the per-doc cumsum is
    // bucket-partitioned and the terminal offset level is a bounded θ-join,
    // not a window. In the plan text a global window's windowspecdefinition
    // starts directly with a SORT column ("col#N ASC/DESC"); a partitioned
    // one lists partition columns (no sort direction) first.
    val globalWindow = """windowspecdefinition\(\w+#\d+L? (ASC|DESC)""".r
    Seq(
      "pack_shards" -> graft.operators.TextAnalysis.packShards(spark, dir),
      "pipeline_e2e" -> graft.operators.Pipeline.pipelineE2e(spark, dir),
      "global_shuffle" -> graft.operators.TextAnalysis.globalShuffle(spark, dir),
      "curriculum" -> graft.operators.TextAnalysis.curriculum(spark, dir)
    ).foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("windowspecdefinition(bucket#"),
        s"$name: per-doc window lost its bucket partitioning:\n$p")
      assert(globalWindow.findFirstIn(p).isEmpty,
        s"$name: found a partition-less window (single task at scale):\n$p")
    }
  }

  test("ewma_decay: the 62-row frame runs in (type, bucket) partitions — no per-type monolithic window") {
    // partitioning by event_type alone = one task per type at any corpus
    // size; the bucket decomposition must put `bkt` into EVERY frame
    // window's partition spec (the day-ranked row_number partitions by
    // (event_type, day) — also fine). The check: every
    // windowspecdefinition lists >= 2 partition columns before its first
    // sort column, i.e. no spec starts sorting after a single column.
    val df = graft.queries.Relational.ewmaDecay(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // r18: eventSeq's day-offset running sum is a window partitioned by
    // event_type alone but ORDERED BY day over the (type, day) COUNT
    // AGGREGATE — partitions are calendar-bounded (rows = days per
    // type), not corpus-sized, so it is exempted here; the ban still
    // covers any event_type-alone window over ROW-level order columns
    // (ts / seq / event_id), which is the one-task-per-type shape.
    val monoTypeWindow =
      """windowspecdefinition\(event_type#\d+, (?!day#)[a-z_]+#\d+L? (ASC|DESC)""".r
    assert(monoTypeWindow.findFirstIn(p).isEmpty,
      s"ewma window partitioned by event_type alone (one task per type):\n$p")
    // ADVICE r18: the day# exemption must not leak to arbitrary windows
    // that merely ORDER by a column named day — every exempted
    // (event_type)-partitioned day-ordered window must read the
    // (event_type, day) aggregate, i.e. its day expression id must be a
    // grouping key of some aggregate in the same plan (the calendar
    // bound is what makes the partition size safe, and only the
    // aggregate provides it)
    val exempted =
      """windowspecdefinition\(event_type#\d+, (day#\d+L?) ASC""".r
    exempted.findAllMatchIn(p).map(_.group(1)).toSet.foreach { dayId: String =>
      val asKey = s"""keys=\\[event_type#\\d+, ${java.util.regex.Pattern.quote(dayId)}[,\\]]""".r
      assert(asKey.findFirstIn(p).nonEmpty,
        s"exempted day-ordered window's $dayId is not an (event_type, day) aggregate key — the calendar bound does not hold:\n$p")
    }
    assert(p.contains("windowspecdefinition(event_type#"),
      s"expected composite (event_type, ...) window partitioning:\n$p")
  }

  test("dup_spans: the tokenize+gram stage is computed once and shared; windows are doc-partitioned") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.Dedup.dupSpans(spark, dir)
    // walk the physical TREE (InMemoryTableScanExec is a leaf — the
    // cached relation's plan is not a child), so a live FileSourceScan
    // can't hide in a relation's printed dump and a cached one can't
    // trigger a false positive
    val phys = df.queryExecution.sparkPlan
    val liveScans = phys.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val sharedReads = phys.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
    }
    // both the dup-gram aggregate and the probe must read the ONE
    // materialized gram generation — a live parquet scan means the
    // corpus-heavy stage runs again at 100 TB
    assert(sharedReads.nonEmpty,
      s"gram frame not shared (no InMemoryTableScan):\n$phys")
    assert(liveScans.isEmpty,
      s"dup_spans recomputes ${liveScans.size} live parquet scans outside the shared frames:\n$phys")
    val p = phys.toString
    // every window is doc_id-partitioned (bounded by document length) —
    // a partition-less window would be one task at any corpus size
    val globalWindow = """windowspecdefinition\(\w+#\d+L? (ASC|DESC)""".r
    assert(globalWindow.findFirstIn(p).isEmpty,
      s"dup_spans: found a partition-less window:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("dup_spans_hashed: no gram string anywhere in the plan; hashed keys shuffle") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.Dedup.dupSpansHashed(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    // the whole point of the fingerprinted formulation: the literal gram
    // string (concat_ws over the token window) must never be materialized —
    // not as a shuffle key, not as a projection
    assert(!p.contains("concat_ws"),
      s"dup_spans_hashed materializes a literal gram string:\n$p")
    assert(p.contains("xxhash64"),
      s"dup_spans_hashed lost its hashed gram key:\n$p")
    // two-level distinct-doc counting: the (gh, doc_id) pre-dedup must be a
    // real aggregate keyed by BOTH columns (skew-safe composite key), and
    // the per-gh count must retain map-side partials
    assert(p.contains("partial_count") || p.contains("partial_first"),
      s"per-gh count lost its map-side partial stage:\n$p")
    // windows stay doc-partitioned (bounded by document length)
    val globalWindow = """windowspecdefinition\(\w+#\d+L? (ASC|DESC)""".r
    assert(globalWindow.findFirstIn(p).isEmpty,
      s"dup_spans_hashed: found a partition-less window:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("dup_spans_maximal: hashed gram keys only; windows stay doc-partitioned") {
    graft.SharedFrames.releaseAll()
    val p = graft.operators.Dedup.dupSpansMaximal(spark, dir)
      .queryExecution.sparkPlan.toString
    // same fingerprint discipline as dup_spans_hashed: partner election,
    // duplication gate, and alignment joins all key on xxhash64 grams
    assert(!p.contains("concat_ws"),
      s"dup_spans_maximal materializes a literal gram string:\n$p")
    assert(p.contains("xxhash64"),
      s"dup_spans_maximal lost its hashed gram key:\n$p")
    val globalWindow = """windowspecdefinition\(\w+#\d+L? (ASC|DESC)""".r
    assert(globalWindow.findFirstIn(p).isEmpty,
      s"dup_spans_maximal: found a partition-less window:\n$p")
    // the canonical-partner election must be aggregate-shaped: a window
    // partitioned by the gram-hash key puts a universal boilerplate
    // gram's whole row mass into ONE partition (a single-task sort AQE
    // cannot split — its skew handling covers joins, not windows), so no
    // gh-partitioned windowspec may appear anywhere in the plan
    assert(!p.contains("windowspecdefinition(gh#"),
      s"dup_spans_maximal: partner election windows over the gram-hash key:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("dup_spans_maximal2: both chain passes read ONE materialized partner frame; no gh window") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.Dedup.dupSpansMaximal2(spark, dir)
    val phys = df.queryExecution.sparkPlan
    val p = phys.toString
    assert(!p.contains("concat_ws"),
      s"dup_spans_maximal2 materializes a literal gram string:\n$p")
    assert(!p.contains("windowspecdefinition(gh#"),
      s"dup_spans_maximal2: partner election windows over the gram-hash key:\n$p")
    // the partner-attached hit frame must be shared: both passes read the
    // cached generation instead of re-running the gram join per pass
    assert(phys.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
    }.size >= 2,
      s"pass A and pass B do not both read the shared partner frame:\n$phys")
    graft.SharedFrames.releaseAll()
  }

  test("dup_span_scrub_aligned: no span-text group anywhere — the keep-first policy is a filter") {
    graft.SharedFrames.releaseAll()
    val p = graft.operators.Dedup.dupSpanScrubAligned(spark, dir)
      .queryExecution.sparkPlan.toString
    // provenance replaces the span-text group: neither the span-assembly
    // aggregate nor the keep-first exchange of dup_span_scrub may appear
    assert(!p.contains("span_key"),
      s"aligned scrub still builds the span-text keep-first key:\n$p")
    assert(!p.contains("concat_ws"),
      s"aligned scrub materializes a literal gram string:\n$p")
    assert(p.contains("xxhash64"),
      s"aligned scrub lost the hashed gram spine:\n$p")
    // inherits the maximal-span election: no gh-partitioned window —
    // the skew-free aggregate shape must survive the parts reuse
    assert(!p.contains("windowspecdefinition(gh#"),
      s"aligned scrub: partner election windows over the gram-hash key:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("decontaminate_scrub: eval gram set broadcasts; no gram strings in the probe") {
    graft.SharedFrames.releaseAll()
    val p = graft.operators.Dedup.decontaminateScrub(spark, dir)
      .queryExecution.sparkPlan.toString
    // the decontamination premise made structural: the benchmark-sized
    // probe set must broadcast — a shuffled eval join would re-shuffle
    // the corpus gram spine on a foreign key
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"decontaminate_scrub does not broadcast the eval gram set:\n$p")
    assert(!p.contains("concat_ws"),
      s"decontaminate_scrub materializes literal gram strings:\n$p")
    assert(p.contains("xxhash64"),
      s"decontaminate_scrub lost its hashed gram probe:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("dup_span_scrub: keep-first election is aggregate-shaped — no span_key window") {
    graft.SharedFrames.releaseAll()
    val p = graft.operators.Dedup.dupSpanScrub(spark, dir)
      .queryExecution.sparkPlan.toString
    // the keep-first key is span_key (xxhash64 of the span text, computed
    // inside the span-assembly aggregate); the raw span string must not
    // reach any windowspecdefinition
    assert(p.contains("span_key"),
      s"dup_span_scrub lost its hashed keep-first key:\n$p")
    assert(!p.contains("windowspecdefinition(span_text"),
      s"dup_span_scrub partitions its keep-first window by the raw span body:\n$p")
    // the election itself must be the partial-combinable min-struct
    // aggregate, NOT a window partitioned by span_key: a boilerplate span
    // duplicated across millions of docs makes its span_key a hot key,
    // and a window puts that whole group into one un-splittable task
    // (AQE skew handling covers joins, not windows). The equi-join back
    // onto the span rows that replaces it IS skew-splittable.
    assert(!p.contains("windowspecdefinition(span_key#"),
      s"dup_span_scrub: keep-first election windows over span_key:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("knn_graph / cluster_balanced_sample: per-group ranking is the bounded TopKAgg aggregate — no window, no per-group sort") {
    graft.SharedFrames.releaseAll()
    val knn = graft.operators.Similarity.knnGraph(spark, dir)
      .queryExecution.sparkPlan.toString
    // the ranking must be the k-bounded partial aggregate (an
    // ObjectHashAggregate over the typed buffer), never a window over
    // the full per-group population (a hot group = one sort task)
    assert(!knn.contains("windowspecdefinition"),
      s"knn_graph ranking fell back to a window:\n$knn")
    assert(knn.contains("ObjectHashAggregate"),
      s"knn_graph TopKAgg buffer aggregate missing:\n$knn")
    val cbs = graft.operators.Similarity.clusterBalancedSample(spark, dir)
      .queryExecution.sparkPlan.toString
    // upstream semDedup legitimately windows per-VECTOR (|K|-bounded);
    // the per-CLUSTER ranking itself must never window (a head cluster
    // = one sort task)
    assert(!cbs.contains("windowspecdefinition(cluster#"),
      s"cluster_balanced_sample ranks via a cluster window:\n$cbs")
    assert(cbs.contains("ObjectHashAggregate"),
      s"cluster_balanced_sample TopKAgg buffer aggregate missing:\n$cbs")
    graft.SharedFrames.releaseAll()
  }

  test("knn_graph_ivf: candidate join shuffles by cluster (no corpus-sized broadcast); ranking is the bounded aggregate — no window") {
    graft.SharedFrames.releaseAll()
    val p = graft.operators.Similarity.knnGraphIvf(spark, dir)
      .queryExecution.sparkPlan.toString
    // the probe-side × inverted-list join must exchange by cluster id
    // (both sides linear) — broadcasting either side would ship the
    // corpus' vectors to every task
    assert(p.contains("ShuffledHashJoin"),
      s"knn_graph_ivf candidate join is not shuffle-hash:\n$p")
    assert(!p.contains("BroadcastNestedLoop"),
      s"knn_graph_ivf plan degenerated to a nested-loop join:\n$p")
    // ranking = the k-bounded partial aggregate, never a per-node window
    assert(!p.contains("windowspecdefinition"),
      s"knn_graph_ivf ranking fell back to a window:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"knn_graph_ivf TopKAgg buffer aggregate missing:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("decontaminate_semantic: argmax is a partial-combinable aggregate — no vec_id window over the scored fan-out") {
    val df = graft.operators.Similarity.decontaminateSemantic(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    // the corpus×|eval| scored frame must fold map-side: a vec_id-
    // partitioned window would shuffle the whole ×|eval| fan-out keyed by
    // vec_id (the round-9 advisor finding); the min-struct election's
    // partial aggregate collapses each map task's fan-out to one row per
    // vec_id before the exchange
    assert(!p.contains("windowspecdefinition(vec_id#"),
      s"decontaminate_semantic argmax windows over vec_id:\n$p")
    assert(p.contains("partial_min"),
      s"decontaminate_semantic election has no map-side partial aggregate:\n$p")
    // eval side still broadcasts (the scoring pass itself never shuffles)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"decontaminate_semantic eval side is not broadcast:\n$p")
  }

  test("dup_span_scrub: only the doc-spine scan is live; span/excision work reads shared frames") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.Dedup.dupSpanScrub(spark, dir)
    val phys = df.queryExecution.sparkPlan
    val liveScans = phys.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // ZERO live parquet scans is contractual (r18 — tightened from one):
    // the rebuild spine IS the materialized split-array generation the
    // span assembly already reads, so tokens, grams, spans, excisions
    // AND the rebuild all come from shared frames — any live scan means
    // a corpus-heavy stage re-runs at 100 TB
    assert(liveScans.isEmpty,
      s"expected 0 live scans (all inputs shared), got ${liveScans.size}:\n$phys")
    assert(phys.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m
    }.nonEmpty, s"span work not reading shared frames:\n$phys")
    graft.SharedFrames.releaseAll()
  }

  test("kv_getall_keys: column pruning — the scan reads ONLY the projected key") {
    val p = plan(KvSurface.kvGetallKeys(spark, dir))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"),
      s"scan reads more than the single projected column:\n$p")
  }

  test("kv_get_point: point predicate is pushed down to the scan") {
    val p = plan(KvSurface.kvGetPoint(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey)"),
      s"no pushed filter on the point-lookup scan:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1,
      s"point lookup should resolve via one broadcast join:\n$p")
  }

  test("q3_top_orders: filtered customer dimension broadcasts; top-k is TakeOrderedAndProject") {
    val p = plan(Relational.q3TopOrders(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"customer join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit+order not fused into top-k:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment filter not pushed:\n$p")
  }

  test("tfidf_topk: ONE shared explode generation; the vocabulary side builds the broadcast") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.TextAnalysis.tfidfTopk(spark, dir)
    df.collect() // executedPlan: AQE's runtime build-side choice is the claim
    val p = df.queryExecution.executedPlan.toString
    // both the tf probe side and the df derivation must read the ONE
    // materialized (doc, token, tf) generation — without it the corpus
    // is exploded and shuffled twice (ReuseExchange cannot dedup the
    // branches once ColumnPruning rewrites df's input into a distinct)
    assert(p.contains("InMemoryTableScan"),
      s"tfidf_topk branches do not read the shared tf generation:\n$p")
    // the build side must be the vocabulary-scale df aggregate — r8's
    // uncached plan let AQE broadcast the CORPUS-scale tf side, the one
    // relation that must never broadcast at 100 TB
    assert(p.contains("BuildRight") && !p.contains("BuildLeft"),
      s"tfidf_topk broadcasts the corpus-scale tf side:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("priority_sample / lm_trigram_backoff: rankings and cascades aggregate — no windows anywhere in either plan") {
    graft.SharedFrames.releaseAll()
    // the global top-k must be the k-bounded partial aggregate: the
    // window formulation (row_number over a partition-less ORDER BY)
    // sorts the whole corpus in ONE task
    val ps = graft.operators.CorpusOps.prioritySample(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(!ps.contains("windowspecdefinition"),
      s"priority_sample ranks via a window:\n$ps")
    assert(ps.contains("ObjectHashAggregate"),
      s"priority_sample TopKAgg buffer aggregate missing:\n$ps")
    // the backoff cascade is joins + one doc-keyed hash aggregate; a
    // window anywhere would mean a corpus-scale sorted partition
    val lm = graft.operators.CorpusOps.lmTrigramBackoff(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(!lm.contains("windowspecdefinition"),
      s"lm_trigram_backoff uses a window:\n$lm")
    graft.SharedFrames.releaseAll()
  }

  test("bm25_topk: ONE shared explode generation; the vocabulary side builds the broadcast") {
    graft.SharedFrames.releaseAll()
    val df = graft.operators.TextAnalysis.bm25Topk(spark, dir)
    df.collect() // executedPlan: AQE's runtime build-side choice is the claim
    val p = df.queryExecution.executedPlan.toString
    // dl derivation, df derivation and the scored probe must all read
    // the ONE materialized (doc, token, tf) generation — the tfidf_topk
    // double-explode trap
    assert(p.contains("InMemoryTableScan"),
      s"bm25_topk branches do not read the shared tf generation:\n$p")
    // build sides must be the vocabulary-scale df aggregate and the
    // 1-row scalar frame, never the corpus-scale tf side
    assert(p.contains("BuildRight") && !p.contains("BuildLeft"),
      s"bm25_topk broadcasts the corpus-scale tf side:\n$p")
    graft.SharedFrames.releaseAll()
  }

  test("table_stats: single Sort in the whole plan (the 5-row result order) — the stats legs never sort") {
    // the pre-fix shape (multi-distinct + string min/max in ONE agg)
    // lowered to a SortAggregate chain with two full sorts of the Expand
    // output — measured 2.6× slower at sf0.1. The split form's only Sort
    // is the final orderBy of the 5-row result.
    val p = plan(Relational.tableStats(spark, dir))
    val sorts = """\(\d+\) Sort\b""".r.findAllIn(p).size
    assert(sorts == 1, s"expected exactly 1 Sort node, found $sorts:\n$p")
    assert(p.contains("HashAggregate"),
      s"distinct-count leg is not a hash aggregation:\n$p")
  }

  test("ewma_decay: no corpus-sized join; frame + day-rank + day-offset windows only; offsets broadcast") {
    // the bucket decomposition allows exactly: the day-ranked row_number
    // window, the day-offset running sum over the calendar-sized
    // (type, day) count table (r18 — replaced the b.day < a.day θ-join,
    // which was O(days²) per type and one join + one aggregate more),
    // ONE broadcast join attaching the tiny offset table to the corpus,
    // and the (type, bucket) frame window — never a corpus-sized
    // shuffle join or a sort-merge anywhere
    val p = plan(Relational.ewmaDecay(spark, dir))
    assert(!p.contains("SortMergeJoin"),
      s"EWMA must not sort-merge-join the corpus:\n$p")
    assert("""Window \[""".r.findAllIn(p).size == 3,
      s"expected exactly three Window nodes (day rank + day offsets + bucketed frame):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"offset table must broadcast onto the corpus:\n$p")
  }

  test("robust_stats: percentile stages are ObjectHashAggregate with map-side partials; stats tables broadcast") {
    val p = plan(Relational.robustStats(spark, dir))
    assert(!p.contains("SortAggregate") && !p.contains("SortMergeJoin"),
      s"robust_stats must not sort — holistic percentiles go through " +
        s"ObjectHashAggregate and the 5-row stats tables broadcast:\n$p")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_percentile"),
      s"no partial percentile aggregation:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"stats-table joins are not all broadcast:\n$p")
  }

  test("graph_bfs: relaxation rounds are lineage-cut — the final plan reads the materialized frontier, not 2^k re-derivations") {
    // each round references the frontier twice (carry ∪ relax); without
    // the per-round materialize the final plan embeds the seed subtree
    // 2^BfsIters times (the documented exponential carry-union-step
    // anti-pattern, measured OOM at 8 rounds). The fixed shape: the
    // frontier enters the final plan as ONE materialized-RDD scan, and
    // the only parquet scan left is the node table.
    val p = plan(graft.operators.GraphRank.graphBfs(spark, dir))
    graft.SharedFrames.releaseAll()
    assert(p.contains("ExistingRDD"),
      s"final frontier is not a materialized-RDD scan (lineage not cut):\n$p")
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"relaxation lineage re-derived into the final plan:\n$p")
  }

  test("GLOBAL sweep: no CartesianProduct and no partition-less window in ANY registered plan") {
    // Two anti-patterns that are fatal at 100 TB whatever the query:
    //  - CartesianProduct: an unbounded all-pairs shuffle (a 1-row
    //    broadcast build plans as BroadcastNestedLoopJoin, which is the
    //    allowed carrier for scalar crossJoins — so asserting on the
    //    CartesianProduct NODE catches exactly the unbounded case);
    //  - a window whose spec opens with a sort column (no partition
    //    columns): ONE task sorts the world at any corpus size.
    // Construction of some queries runs bounded driver work (training
    // rounds, index writes, MG candidate collects) — at sf0.001 that is
    // seconds, and the sweep deliberately pays it to keep EVERY
    // registered plan under the pin, new queries included by default.
    val globalWindow = """windowspecdefinition\(\w+#\d+L? (ASC|DESC)""".r
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val res = try {
          val p = plan(fn(spark, dir))
          val bad = List(
            if (p.contains("CartesianProduct"))
              Some("CartesianProduct") else None,
            if (globalWindow.findFirstIn(p).isDefined)
              Some("partition-less window") else None).flatten
          if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
        } catch {
          case e: Throwable => Some(s"$name: plan construction failed: $e")
        } finally graft.SharedFrames.releaseAll()
        res
    }
    assert(failures.isEmpty,
      s"scale anti-patterns in registered plans:\n${failures.mkString("\n")}")
  }
}
