package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{Event, EventStreams}

/** Micro-benchmark for the streaming twins' documented state claims
  * (VERDICT r15 item 6) — the KvBench tradition applied to Structured
  * Streaming: each twin is driven through a MemoryStream at THREE
  * growing input cadences over a FIXED key population, and we record
  * rows/sec plus the state store's row count and memory footprint from
  * the final StreamingQueryProgress. The claims under test are
  * per-operator:
  *
  *  - `quotaAdmission` / `asofEnrich`: state is O(1) PER KEY (an
  *    admitted-window list bounded by the quota window / one prior view
  *    tuple) — state rows must track the key population, FLAT as input
  *    rows grow 25×.
  *  - `streamingDedup`: state is the fingerprints inside the watermark
  *    horizon — with event time advancing at a fixed rate, state rows
  *    must track the HORIZON (flat), not the total rows seen.
  *  - `corpusCleanStream`: its `dropDuplicates` state is one row per
  *    DISTINCT document hash seen — linear in distinct keys BY
  *    CONTRACT (the scaladoc's documented production bound is the
  *    watermark variant, i.e. [[EventStreams.streamingDedup]]'s shape);
  *    the bench feeds a fixed distinct-doc population so the state must
  *    go flat once the population is exhausted.
  *
  * Usage: runMain graft.tools.StreamBench [keys] [baseRows]
  * Prints one JSON line per (twin, cadence):
  * {"metric":"stream_rows_per_sec","twin":…,"rows":N,"value":…,
  *  "state_rows":…,"state_bytes":…}
  *
  * MemoryStream feeds arrive in driver-sized chunks (micro-batches of
  * [[ChunkRows]]), so per-batch overhead is amortized identically at
  * every cadence and the rows/sec figures are comparable within a twin.
  */
object StreamBench {
  final val ChunkRows = 10000

  /** Versioned artifact (VERDICT r16 item 6): the state-boundedness
    * numbers used to live only in BASELINE.md prose; now every run also
    * writes its records — one JSON object per line, one line per
    * (twin, cadence) — to a repo file, so state-shape regressions diff
    * across rounds exactly like BENCH/CORRECTNESS. Naming follows
    * Bench.localArtifact: only an explicit round env/prop writes a
    * round-named record; everything else goes to _latest. */
  private lazy val artifactName: String =
    sys.props.get("graft.round")
      .orElse(sys.env.get("SPARK_GRAFT_ROUND")).map(_.trim).filter(_.nonEmpty)
      .map(n => s"STREAMBENCH_r$n.json")
      .getOrElse("STREAMBENCH_latest.json")

  private val records = scala.collection.mutable.ArrayBuffer[String]()

  /** Atomic rewrite (ADVICE r17): write to a sibling temp file and
    * ATOMIC_MOVE it into place, so a kill mid-write leaves the previous
    * complete artifact instead of a truncated one — preserving the
    * "killed run still leaves everything measured so far" intent. */
  private def writeArtifact(): Unit =
    try {
      val target = java.nio.file.Paths.get(artifactName)
      val tmp = java.nio.file.Paths.get(artifactName + ".tmp")
      java.nio.file.Files.write(tmp,
        (records.mkString("", "\n", "\n"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case e: Throwable =>
      System.err.println(s"[streambench] artifact write failed: $e")
    }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Drains `rows` into the stream in [[ChunkRows]] chunks, processing
    * after each, and returns (seconds, stateRows, stateBytes) read from
    * the last progress with state operators. */
  private def drive[T](mem: MemoryStream[T], q: StreamingQuery,
      rows: Seq[T]): (Double, Long, Long) = {
    val (_, sec) = time {
      rows.grouped(ChunkRows).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    }
    val st = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
    (sec, st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum)
  }

  /** Host-speed canary seconds stamped on every record (VERDICT r17
    * item 2 — the r17 500k-cadence throughput sag was unadjudicable
    * because stream runs carried no host-speed context). -1.0 until
    * measured; SPARK_GRAFT_NO_CANARY skips, exactly as Bench. */
  @volatile private var canarySec = -1.0

  private def report(twin: String, rows: Int, sec: Double,
      stateRows: Long, stateBytes: Long): Unit = {
    val line = f"""{"metric":"stream_rows_per_sec","twin":"$twin","rows":$rows,"value":${rows / sec}%.0f,"seconds":$sec%.3f,"state_rows":$stateRows,"state_bytes":$stateBytes,"canary_s":$canarySec%.3f}"""
    println(line)
    records += line
    // rewrite after every record: a killed run still leaves everything
    // measured so far on disk
    writeArtifact()
  }

  def main(args: Array[String]): Unit = {
    val keys = args.lift(0).map(_.toInt).getOrElse(200)
    val base = args.lift(1).map(_.toInt).getOrElse(20000)
    val cadences = Seq(base, base * 5, base * 25)
    // host-speed canary BEFORE any Spark work — same probe and thread
    // count as graft.Bench so the values are comparable across artifacts
    if (!sys.env.contains("SPARK_GRAFT_NO_CANARY")) {
      canarySec = graft.Bench.canarySeconds(32)
      System.err.println(f"[streambench] canary_s=$canarySec%.3f (threads=32)")
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      // see Bench.scala: single-JVM harness disables artifact-isolation
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // kind indexes by the user's OCCURRENCE counter (i / keys), not by i:
    // user u's events are i ≡ u (mod keys), so an i-based kind would be
    // CONSTANT per user whenever keys is a multiple of kinds.size — every
    // user alternating through the kinds is what makes asof_enrich
    // actually match clicks to prior views
    def events(n: Int, kinds: Seq[String]): Seq[Event] =
      (0 until n).map { i =>
        Event(i.toLong, i.toLong * 1000L, (i % keys).toLong,
          kinds((i / keys) % kinds.size), (i % 7 + 1).toDouble)
      }

    // fresh stream + query per (twin, cadence): state never carries over,
    // so each cadence point is independent
    def bench[T](twin: String, n: Int)(mk: () => (MemoryStream[T],
        StreamingQuery, Seq[T])): Unit = {
      val (mem, q, rows) = mk()
      try {
        val (sec, sRows, sBytes) = drive(mem, q, rows)
        report(twin, n, sec, sRows, sBytes)
      } finally {
        q.stop()
        // harness hygiene (r18 sag adjudication, BASELINE.md): stopped
        // queries leave their state-store providers loaded and the
        // maintenance task running; ~15 min into the suite the LATER
        // twins of the 500k block measured up to 2.7× slow (r17's
        // unexplained sag) while the SAME twin in a fresh JVM is
        // per-batch FLAT (StreamBatchDiag). Unload providers and hint a
        // GC so each (twin, cadence) point measures the operator, not
        // the harness's age.
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        System.gc()
      }
    }

    for (n <- cadences) {
      bench[Event]("quota_admission", n) { () =>
        val mem = MemoryStream[Event]
        // window/quota sized so admissions flip both ways at this value
        // range: per-user in-window sums reach the cap and expire
        val q = EventStreams.quotaAdmission(mem.toDS(), maxAmount = 40.0,
            windowUs = 50L * keys * 1000L)
          .writeStream.format("noop").outputMode("append").start()
        (mem, q, events(n, Seq("click")))
      }
      bench[Event]("asof_enrich", n) { () =>
        val mem = MemoryStream[Event]
        val q = EventStreams.asofEnrich(mem.toDS())
          .writeStream.format("noop").outputMode("append").start()
        (mem, q, events(n, Seq("view", "click")))
      }
      bench[(Long, java.sql.Timestamp, String)]("streaming_dedup", n) { () =>
        val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
        val q = EventStreams.streamingDedup(
            mem.toDF().toDF("event_id", "ts", "fingerprint"),
            watermarkDelay = "1 hour")
          .writeStream.format("noop").outputMode("append").start()
        // event time advances 1 s/row → the 1 h horizon holds ~3600
        // fingerprints at every cadence; 10% of rows repeat a recent
        // fingerprint so the dedup actually drops rows
        val rows = (0 until n).map { i =>
          val fp = if (i % 10 == 9) s"fp${i - 1}" else s"fp$i"
          (i.toLong, new java.sql.Timestamp(i * 1000L), fp)
        }
        (mem, q, rows)
      }
      bench[(Long, String, String)]("corpus_clean_stream", n) { () =>
        val mem = MemoryStream[(Long, String, String)]
        val q = EventStreams.corpusCleanStream(
            mem.toDF().toDF("doc_id", "text", "lang"))
          .writeStream.format("noop").outputMode("append").start()
        // fixed distinct-doc population (4 × keys texts), every later row
        // a duplicate: state must plateau at the population size
        val pop = 4 * keys
        val rows = (0 until n).map { i =>
          val d = i % pop
          (i.toLong, s"the of and doc number $d body token$d stream bench text", "en")
        }
        (mem, q, rows)
      }
    }
    spark.stop()
  }
}
