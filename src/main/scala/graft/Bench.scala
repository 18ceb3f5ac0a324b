package graft

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Honesty measures:
  *  - a warmup query first, so no timed query pays one-time JVM/codegen/
  *    classloading costs;
  *  - results are materialized through the `noop` sink — `count()` can be
  *    answered from parquet row-group metadata without executing the plan;
  *  - queries run in sorted name order (stable across runs).
  *
  * Robustness measures (round 5's run was killed at the harness ceiling with
  * ZERO output — a single stall erased all 75 numbers):
  *  - every query (and the warmup) runs on a watchdog: a worker thread with a
  *    per-query budget; on breach the query's Spark job group is cancelled,
  *    the worker interrupted, and the query recorded as a timeout naming
  *    itself — the suite moves on instead of hanging;
  *  - a heartbeat line on stderr before and after every run, so even a
  *    hard-killed session names its culprit;
  *  - a global soft budget: once breached, remaining runs are skipped (pass-1
  *    samples stand) and the JSON prints immediately;
  *  - the final JSON is also wired to a JVM shutdown hook, so SIGTERM from an
  *    external `timeout` still yields every number collected so far (printed
  *    exactly once — guarded by an AtomicBoolean).
  *
  * Per-query sentinels in the JSON: -1.0 = failed every attempted pass,
  * -2.0 = timed out (watchdog fired), -3.0 = never ran (global budget breach
  * or killed before reaching it).
  */
object Bench {
  private val printed = new AtomicBoolean(false)

  /** HOST-SPEED CANARY (VERDICT r16 item 4): a fixed, deterministic,
    * allocation-free splitmix64 mixing loop run on `threads` concurrent
    * workers (fixed work per worker), timed wall-clock. No I/O, no Spark,
    * no data dependence — its seconds measure ONLY this host's effective
    * CPU throughput at suite concurrency, so cross-round bench ratios can
    * be canary-normalized instead of burning a same-day worktree re-run
    * to separate the host's ±28% session swing from code effect. Multi-
    * threaded deliberately: the swing is co-tenancy, which a single
    * scalar loop on one core cannot see. The xor-fold into `sink` defeats
    * dead-code elimination; the work constant is sized to ~2 s on the
    * reference host. */
  final val CanaryItersPerThread = 400000000L

  def canarySeconds(threads: Int): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val ws = (0 until threads).map { w =>
      val th = new Thread(() => {
        var x = 0x243F6A8885A308D3L + w
        var acc = 0L
        var i = 0L
        while (i < CanaryItersPerThread) {
          x += 0x9E3779B97F4A7C15L
          var z = x
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          acc ^= z ^ (z >>> 31)
          i += 1
        }
        sink.getAndAdd(acc)
      }, s"bench-canary-$w")
      th.setDaemon(true)
      th.start()
      th
    }
    ws.foreach(_.join())
    if (sink.get() == 42L) System.err.println("[bench] canary sink collision")
    (System.nanoTime() - t0) / 1e9
  }

  /** Seconds at 3 decimals (Locale.ROOT — never a comma separator), full
    * precision for the negative sentinels. 3 decimals keeps the complete
    * ~90-query JSON line around 2.0 KB — inside the harness's ~2.2 KB
    * stdout tail capture, which full-precision doubles overflowed in
    * rounds 6-7 (the artifact lost the head of the line both times). */
  private def fmtSec(v: Double): String =
    if (v < 0) v.toString
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The durable-artifact name for this run. ONLY an explicit round
    * (`-Dgraft.round=N` or `SPARK_GRAFT_ROUND=N`) produces a round-named
    * file; everything else writes BENCH_LOCAL_latest.json. Round-number
    * INFERENCE is gone entirely: it silently clobbered a committed prior
    * round when the driver had skipped artifacts (round 11), and the
    * exists()-guard variant silently FROZE the current round's file at
    * its first run, diverting every re-measure to _latest. A subset run
    * (SPARK_GRAFT_ONLY set) is forced to _latest EVEN IF the round env
    * is also set: a shell where the close run's round export lingers
    * would otherwise overwrite the round record with subset-only data —
    * exactly the clobber class this rewrite eliminates. Only the full
    * suite with an explicit round touches a round record. */
  private lazy val localArtifact: String =
    if (sys.env.contains("SPARK_GRAFT_ONLY"))
      // present AT ALL (even blank — "SPARK_GRAFT_ONLY=$SUBSET" with an
      // empty var must not fall through and clobber a round record with
      // a zero-query run): any subset intent diverts to _latest
      "BENCH_LOCAL_latest.json"
    else sys.props.get("graft.round")
      .orElse(sys.env.get("SPARK_GRAFT_ROUND")).map(_.trim).filter(_.nonEmpty)
      .map(n => s"BENCH_LOCAL_r$n.json")
      .getOrElse("BENCH_LOCAL_latest.json")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queryBudgetSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_BUDGET", "120").toInt
    val globalBudgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2400").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // ROOT CAUSE of the round-5 bench stall (reproduced 3/3 at a 48 GiB
      // heap, never at 8 GiB): Spark 4.1's session-artifact classloader
      // isolation routes class lookups through loopback netty stream
      // requests (/artifacts/<session>/classes/...) even in local[*].
      // Every Janino codegen compile probes the artifact server for
      // nonexistent package-local names (the captured storm is thousands
      // of .../catalyst/expressions/Object.class misses); when the
      // single-threaded stream channel degrades, each miss stalls the
      // compile up to spark.network.timeout — observed as minutes-long,
      // self-clearing, suite-wide molasses (20-100x per-query slowdown;
      // stalls of 2-121 s, each ending at the next Object.class probe).
      // One JVM, one session, no UDF jars => isolation buys nothing here;
      // disable it and class loads stay in-process.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val suiteT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - suiteT0) / 1e9

    // dev aid: SPARK_GRAFT_ONLY=q1,q2 times a subset (driver leaves it
    // unset, so the contract run always covers the full suite). Blank
    // entries are dropped and an all-blank value means NO filter — the
    // same normalization localArtifact's guard assumes, so a blank-but-
    // set env can never produce a zero-query artifact
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    val samples = TrieMap.empty[String, List[Double]] // successful secs per query
    val statuses = TrieMap.empty[String, String] // worst non-ok outcome seen
    // host-speed canary seconds; -1.0 until measured (a killed-before-
    // canary run records the sentinel, never a fake speed)
    @volatile var canarySec = -1.0

    def emit(): Unit = if (printed.compareAndSet(false, true)) {
      val results = names.map { n =>
        val ok = samples.getOrElse(n, Nil)
        n -> (if (ok.nonEmpty) ok.min
              else statuses.get(n) match {
                case Some("timeout") => -2.0
                case Some(_)         => -1.0
                case None            => -3.0
              })
      }
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmtSec(v) }
        .mkString("{", ",", "}")
      // sentinels are kept visible per-query but never subtract from the total
      val total = results.map(_._2).filter(_ >= 0).sum
      val line =
        s"""{"metric":"total","value":${fmtSec(total)},"unit":"sec","canary_s":${fmtSec(canarySec)},"queries":$qs,"sf":"$sfDir"}"""
      println(line)
      System.out.flush()
      // durable copy: the harness captures only a bounded TAIL of stdout
      // (rounds 6-7 lost the head of the ~3.3 KB full-precision line), so
      // the complete map is ALSO written to a repo file named for the
      // round — the artifact survives any capture window
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(localArtifact),
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] local artifact write failed: $e")
      }
    }
    sys.addShutdownHook(emit())

    /** Run one query under the watchdog; records its sample/status. */
    def once(name: String, pass: Int, action: () => Unit): Unit = {
      val group = s"bench-$name-p$pass"
      System.err.println(f"[bench] start $name pass=$pass elapsed=$elapsedSec%.1fs")
      @volatile var secs = Double.NaN
      @volatile var err: Throwable = null
      val worker = new Thread(() => {
        // job-group properties are thread-local, so set inside the worker:
        // everything this query submits lands in a cancellable group
        sc.setJobGroup(group, name, interruptOnCancel = true)
        val t0 = System.nanoTime()
        try { action(); secs = (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => err = e }
        finally sc.clearJobGroup()
      }, s"bench-$name-p$pass")
      worker.setDaemon(true)
      worker.start()
      worker.join(queryBudgetSec * 1000L)
      if (worker.isAlive) {
        sc.cancelJobGroup(group)
        worker.join(10000L)
        if (worker.isAlive) { worker.interrupt(); worker.join(5000L) }
        statuses.put(name, "timeout")
        val tail = if (worker.isAlive) " (worker abandoned)" else ""
        System.err.println(s"[bench] TIMEOUT $name pass=$pass after ${queryBudgetSec}s$tail")
      } else if (err != null) {
        if (!statuses.contains(name)) statuses.put(name, "fail")
        System.err.println(s"[bench] FAIL $name pass=$pass: ${err.getMessage}")
      } else {
        samples.put(name, secs :: samples.getOrElse(name, Nil))
        System.err.println(f"[bench] ok $name pass=$pass $secs%.3fs")
      }
      // free the query's shared intermediates NOW — deterministic, never
      // ContextCleaner/GC-paced (safe even after an abandoned worker:
      // shared frames keep lineage, so a straggler read recomputes)
      SharedFrames.releaseAll()
      // NO System.gc() here: a forced full GC after every query was
      // measured 1.27× WORSE on the common subtotal — ContextCleaner's
      // async cleanup storm (shuffle-file deletes, block-manager RPCs)
      // overlaps the NEXT query's timed window.
      // CUMULATIVE map-so-far after every run: round 6's artifact kept only
      // the TAIL of the output and lost the first 17 queries' numbers, so
      // each line must make every earlier line redundant — truncation from
      // either end leaves one complete map standing
      System.err.println(s"[bench] sofar ${partialJson()}")
    }

    /** Every number collected so far as one JSON object (min across passes;
      * sentinel for non-ok outcomes; untouched queries omitted). */
    def partialJson(): String = names.flatMap { n =>
      samples.get(n).map(s => "\"" + n + "\":" + fmtSec(s.min))
        .orElse(statuses.get(n).map {
          case "timeout" => "\"" + n + "\":-2.0"
          case _         => "\"" + n + "\":-1.0"
        })
    }.mkString("{", ",", "}")

    // host-speed canary BEFORE any Spark work touches the caches — pure
    // CPU, so it reads the host, not the suite. SPARK_GRAFT_NO_CANARY
    // skips it (A/B instrument for attributing suite movement to the
    // canary itself)
    if (!sys.env.contains("SPARK_GRAFT_NO_CANARY")) {
      canarySec = canarySeconds(cpus.toInt)
      System.err.println(f"[bench] canary_s=$canarySec%.3f (threads=$cpus)")
    }

    // warmup: run the flagship shape once, untimed but watchdogged — a hung
    // warmup must not eat the whole session
    once("warmup", 0, () =>
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save())
    samples.remove("warmup"); statuses.remove("warmup")

    def run(name: String, pass: Int): Unit =
      once(name, pass, () =>
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save())

    // two FULL passes over the sorted suite, per-query min across passes:
    // back-to-back repeats of one query share any time-local machine
    // contention window (round 2: a contiguous alphabetical band regressed
    // while unchanged), so the two samples must be taken far apart.
    // pass 2 runs in REVERSE order: min-of-two same-order passes cannot
    // cancel order-correlated contention (round 4: a heavy alphabetical
    // neighbor contaminated both samples of the same victims) — reversing
    // gives every query a different predecessor in each sample.
    // Global-budget breach mid-suite: remaining runs are skipped (already-
    // collected samples stand) so the JSON always prints well before any
    // external ceiling.
    val schedule = names.map(n => (n, 1)) ++ names.reverse.map(n => (n, 2))
    schedule.foreach { case (n, pass) =>
      if (elapsedSec < globalBudgetSec) run(n, pass)
      else System.err.println(s"[bench] SKIP $n pass=$pass (global budget ${globalBudgetSec}s breached)")
    }

    emit()
    spark.stop()
  }
}
