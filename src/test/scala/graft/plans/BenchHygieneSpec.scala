package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SharedFrames, SparkEntry, SparkSpec}

/** Storage-hygiene pin (VERDICT r4 item #7, hardened after r5's bench
  * stall): registered queries must not accumulate persisted RDD blocks
  * across invocations — the mechanism by which one bench query could
  * contaminate its neighbors (executor memory pinned by a predecessor's
  * blocks shrinks the unified region every later query runs in; the bench
  * runs every query twice in one JVM).
  *
  * The round-5 contract was "bounded residency, reclaimed by
  * ContextCleaner on driver GC" — which is exactly the dependence the r5
  * bench stall implicated (a ~50 GiB driver heap collects weak refs
  * rarely, so nothing contractually drained the blocks). The contract is
  * now OWNERSHIP: every shared intermediate and every loop's final
  * generation registers with [[graft.SharedFrames]], the harness calls
  * `releaseAll()` after each query's terminal action, and release is
  * SYNCHRONOUS in the registry (`getPersistentRDDs` reflects it without
  * any GC). What this spec pins:
  *
  *  1. DURING a run, residency stays bounded by one generation — the
  *     iterative operators unpersist superseded rounds inline;
  *  2. AFTER `releaseAll()`, residency returns to exactly the baseline —
  *     zero residue, deterministically, no `System.gc()` anywhere. */
class BenchHygieneSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  /** One generation of persisted intermediates: pipeline_e2e's is the
    * largest (survivor materialization + star loop's canonical edge set +
    * final contraction round + packing materialization). */
  private val GenerationBound = 6

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run exactly what Bench runs (materialize through the noop sink). */
  private def runOnce(name: String): Unit =
    SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()

  /** Registry removal is synchronous; give the block-manager scrub (the
    * `blocking = false` part) a short grace, never a GC. */
  private def settledExtra(base: Set[Int]): Set[Int] = {
    val deadline = System.currentTimeMillis() + 10000
    var cur = persistedIds -- base
    while (cur.nonEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      cur = persistedIds -- base
    }
    cur
  }

  // the SharedFrames users plus a plain-pipeline control (curriculum /
  // global_shuffle / epoch_mix / semdedup / bpe_encode joined the shared-
  // materialization users in round 5)
  private val Sampled = Seq("q1_agg", "decontaminate", "dedup_clusters",
    "dedup_clusters_star", "pack_shards", "pipeline_e2e",
    "curriculum", "global_shuffle", "epoch_mix", "semdedup", "bpe_encode",
    // the round-7 gram-spine users (toks + grams shared generations)
    "dup_span_scrub_aligned", "decontaminate_scrub",
    // round-10 shared-frame users (CMS token hashes, DSIR features,
    // TopKAgg over the semdedup assignment)
    "sketch_cms", "dsir_select", "cluster_balanced_sample")

  for (name <- Sampled)
    test(s"$name: bounded residency during runs, ZERO residue after release") {
      SharedFrames.releaseAll() // drain any prior suite's leftovers
      val base = persistedIds
      runOnce(name)
      // during-run bound: inline unpersist of superseded loop rounds keeps
      // at most ~one generation resident while the query executes
      val during = (persistedIds -- base).size
      assert(during <= GenerationBound,
        s"$name held $during persisted RDDs after one run " +
          s"— more than one generation")
      SharedFrames.releaseAll()
      val after1 = settledExtra(base)
      assert(after1.isEmpty,
        s"$name left persisted RDDs ${after1.toSeq.sorted} after " +
          "releaseAll — an intermediate escaped the ownership registry")
      // and repeated run/release cycles leave nothing behind either
      runOnce(name); SharedFrames.releaseAll()
      runOnce(name); SharedFrames.releaseAll()
      val after3 = settledExtra(base)
      assert(after3.isEmpty,
        s"$name accumulates residue across run/release cycles: " +
          s"ids ${after3.toSeq.sorted}")
    }
}
