package graft.streaming

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.engine.QuotaTracker

/** Drives the streaming operators through real micro-batch execution
  * (MemoryStream + memory sink) and cross-checks state semantics against
  * batch replays and the engine's driver-side QuotaTracker. */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  def us(min: Long): Long = min * 60L * 1000000

  private def eventRows(): Seq[Event] = {
    import spark.implicits._
    graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
  }

  test("windowedCounts: streaming micro-batch totals equal batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).collect()
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedCounts(df)
      .writeStream.format("memory").queryName("wc").outputMode("complete")
      .start()
    try {
      mem.addData(events.map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq)
      q.processAllAvailable()
      val got = spark.table("wc")
      val expected = graft.Tables.t(spark, dir, "events")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(got.count() == expected.count())
      assert(got.agg(sum("n")).first.getLong(0) == 1000)
    } finally q.stop()
  }

  test("decontaminateStream: stream-static probe equals the batch operator doc-for-doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.t(spark, dir, "documents")
    val evalDocs = docs.filter(col("doc_id") < graft.operators.Dedup.ContamEvalCap)
    val corpus = docs.filter(col("doc_id") >= graft.operators.Dedup.ContamEvalCap)
    val batch = graft.operators.Dedup.decontaminateFrom(corpus, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty, "batch decontaminate found nothing — vacuous")

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.decontaminateStream(df, evalDocs)
      .writeStream.format("memory").queryName("sdecon").outputMode("append")
      .start()
    try {
      val t0 = 1700000000000L
      val rows = corpus.select(col("doc_id"), col("text")).collect()
      // two micro-batches, then a far-future sentinel to advance the
      // watermark past every real doc's window so append mode emits
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.map(r => (r.getLong(0), new java.sql.Timestamp(t0),
        r.getString(1))).toSeq)
      q.processAllAvailable()
      mem.addData(b.map(r => (r.getLong(0), new java.sql.Timestamp(t0),
        r.getString(1))).toSeq)
      q.processAllAvailable()
      mem.addData(Seq((-1L, new java.sql.Timestamp(t0 + 3600L * 1000),
        "sentinel far beyond the watermark horizon for flushing")))
      q.processAllAvailable()
      val got = spark.table("sdecon").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).filter(_._1 >= 0).toMap
      assert(got == batch,
        s"stream/batch divergence: only-stream=${(got.keySet -- batch.keySet).take(5)} " +
          s"only-batch=${(batch.keySet -- got.keySet).take(5)}")
    } finally q.stop()
  }

  test("sessionize (flatMapGroupsWithState): closed sessions match batch truth across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .start()
    try {
      // two micro-batches split mid-stream: state must carry across
      val (b1, b2) = rows.sortBy(_.ts_us).splitAt(rows.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("sess").as[SessionUpdate].collect()
      // batch truth with the same gap rule; only CLOSED sessions emit (the
      // final session per user stays open in state)
      val closedTruth = rows.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts_us, e.event_id))
        val sessions = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(sorted.head))
        sorted.tail.foreach { e =>
          if (e.ts_us - sessions.last.last.ts_us > us(30))
            sessions += scala.collection.mutable.ArrayBuffer(e)
          else sessions.last += e
        }
        sessions.dropRight(1).map(s => (u, s.head.ts_us, s.last.ts_us, s.length))
      }.toSet
      val streamedSet = streamed.map(s =>
        (s.user_id, s.session_start_us, s.session_end_us, s.n_events.toInt)).toSet
      assert(streamedSet == closedTruth)
      assert(streamedSet.nonEmpty)
    } finally q.stop()
  }

  test("sessionPatternStream: closed-session verdicts EXACTLY equal the registered batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionPatternStream(mem.toDS())
      .writeStream.format("memory").queryName("cep").outputMode("append")
      .start()
    try {
      val (b1, b2) = rows.sortBy(_.ts_us).splitAt(rows.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("cep").as[PatternVerdict].collect()
      // number each user's closed sessions in start order -> (user,
      // ordinal) keys comparable with the BATCH registered query; the
      // stream only emits CLOSED sessions, so the batch's final session
      // per user is excluded from the comparison
      val streamedKeyed = streamed.groupBy(_.user_id).toSeq.flatMap {
        case (u, vs) => vs.sortBy(_.session_start_us).zipWithIndex.toSeq.map {
          case (v, i) =>
            (u, (i + 1).toLong) -> ((v.n_events, v.seq, v.matched, v.hit))
        }
      }.toMap
      val batch = graft.queries.Relational.sessionPattern(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getString(3), r.getBoolean(4), r.getString(5))))
        .toMap
      val lastPerUser = batch.keySet.groupBy(_._1).view.mapValues(_.map(_._2).max)
      streamedKeyed.foreach { case (k, v) =>
        assert(batch(k) == v, s"session $k: stream $v != batch ${batch(k)}")
      }
      // every batch session except each user's open tail was emitted
      val expectedClosed = batch.keySet.filter { case (u, s) =>
        s < lastPerUser(u)
      }
      assert(streamedKeyed.keySet == expectedClosed)
      assert(streamedKeyed.values.exists(_._3) &&
        streamedKeyed.values.exists(!_._3),
        "both verdict classes must appear in the streamed sessions")
    } finally q.stop()
  }

  test("asofEnrich: stream output EXACTLY equals the batch as-of join across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.asofEnrich(mem.toDS())
      .writeStream.format("memory").queryName("asof").outputMode("append")
      .start()
    try {
      // three in-order micro-batches: the last-view state must carry across
      val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
      sorted.grouped(math.max(1, sorted.length / 3)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("asof").as[ClickEnriched].collect()
        .map(c => c.event_id -> (c.prior_view_id, c.prior_view_value)).toMap
      val batch = graft.queries.Relational.asofJoin(spark, dir).collect()
        .map { r =>
          r.getLong(1) -> (
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))
        }.toMap
      assert(streamed == batch,
        s"stream/batch as-of divergence on ${
          (streamed.keySet | batch.keySet).count(k =>
            streamed.get(k) != batch.get(k))} clicks")
      assert(streamed.nonEmpty && streamed.values.exists(_._1.isDefined))
    } finally q.stop()
  }

  test("funnelStream: per-user verdict totals EXACTLY equal the batch funnel across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append")
      .start()
    try {
      val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
      sorted.grouped(math.max(1, sorted.length / 4)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("funnel").as[PurchaseVerdict].collect()
      val perUser = streamed.groupBy(_.user_id).map { case (u, vs) =>
        u -> (vs.length.toLong, vs.count(_.converted).toLong) }
      val batch = graft.queries.Relational.funnelConversion(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(perUser == batch, "stream/batch funnel divergence")
      assert(streamed.exists(_.converted) && streamed.exists(!_.converted),
        "verdict classes not both populated")
    } finally q.stop()
  }

  test("anomalyStream: verdicts EXACTLY equal a prefix replay across micro-batch splits; final state = whole-table moments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.anomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("append")
      .start()
    try {
      val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
      sorted.grouped(math.max(1, sorted.length / 3)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("anom").as[AnomalyVerdict].collect()
        .map(v => v.event_id -> ((v.n_so_far, v.flagged))).toMap
      // driver replay of the same prefix rule through the SAME verdict code
      val scale = graft.queries.Relational.AnomalyScale
      val expected = rows.groupBy(_.event_type).flatMap { case (_, es) =>
        var (n, s, qq) = (0L, BigInt(0), BigInt(0))
        es.sortBy(e => (e.ts_us, e.event_id)).map { e =>
          val qv = math.round(e.value * scale)
          n += 1; s += qv; qq += BigInt(qv) * qv
          e.event_id -> ((n, n >= EventStreams.AnomalyMinN &&
            EventStreams.anomalyFlag(n, s, qq, qv)))
        }
      }.toMap
      assert(streamed == expected, "stream/replay anomaly divergence")
      assert(streamed.values.exists(_._2) &&
        streamed.values.exists(!_._2), "flag classes not both populated")
      // final per-type n equals the whole table's per-type count —
      // the stream's state converged to the batch operator's moments
      val finalN = streamed.values.map(_._1).max
      assert(rows.groupBy(_.event_type).values.map(_.size.toLong).max == finalN)
    } finally q.stop()
  }

  test("cusumStream: fed the training corpus in order, statistics and alarms are BIT-IDENTICAL to the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    // the stored in-control artifact: exact per-type (n, sum of xq) moments
    val refs = rows.groupBy(_.event_type).map { case (et, es) =>
      et -> ((es.size.toLong,
        es.map(e => EventStreams.microQuantize(e.value)).sum))
    }
    val mem = MemoryStream[Event]
    val q = EventStreams.cusumStream(mem.toDS(), refs)
      .writeStream.format("memory").queryName("cusum").outputMode("append")
      .start()
    try {
      val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
      sorted.grouped(math.max(1, sorted.length / 3)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("cusum").as[CusumVerdict].collect()
        .map(v => (v.event_type, v.event_id) ->
          ((v.n_seen, v.s_stat, v.alarm))).toMap
      // batch truth: the SAME corpus through the closed-form operator —
      // reference moments are its own full-corpus stats, so every prefix
      // statistic must coincide exactly
      val batch = graft.queries.Relational.changepointCusum(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getString(4), r.getBoolean(5)))).toMap
      assert(streamed.size == batch.size)
      batch.foreach { case (k, v) =>
        assert(streamed(k) == v, s"event $k: stream ${streamed(k)} != batch $v")
      }
      assert(streamed.values.exists(_._3) && streamed.values.exists(!_._3),
        "alarm classes not both populated")
    } finally q.stop()
  }

  test("viewClickStreamJoin: stream-stream join equals the batch range join across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchEvents = graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit("").as("props"))
    val rows = batchEvents.collect()
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val q = EventStreams.viewClickStreamJoin(stream)
      .writeStream.format("memory").queryName("ssj").outputMode("append")
      .start()
    try {
      val sorted = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4), ""))
      sorted.grouped(math.max(1, sorted.length / 4)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("ssj")
        .as[(Long, Long, Long)].collect().toSet
      // batch truth: the identical join on the full static frame
      val batch = EventStreams.viewClickStreamJoin(batchEvents)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch join divergence: ${(streamed diff batch).size} extra, " +
          s"${(batch diff streamed).size} missing of ${batch.size}")
      assert(batch.nonEmpty, "join vacuous — no view→click pair in window")
    } finally q.stop()
  }

  test("viewClickStreamJoin left_outer: unmatched views emit NULL clicks on eviction; equals the batch outer join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchEvents = graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit("").as("props"))
    val rows = batchEvents.collect()
      .sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), ""))
    // sentinel pair far past the data (distinct users, > window apart) to
    // push BOTH sides' watermarks so every pending outer row evicts
    val lastTs = rows.last._2.getTime
    val day = 86400000L
    val sentinels = Seq(
      (9000001L, new java.sql.Timestamp(lastTs + 10 * day), 999901L,
        "view", 0.0, ""),
      (9000002L, new java.sql.Timestamp(lastTs + 10 * day + 7200000L),
        999902L, "click", 0.0, ""))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val q = EventStreams.viewClickStreamJoin(stream, "left_outer")
      .writeStream.format("memory").queryName("ssjlo").outputMode("append")
      .start()
    try {
      (rows.grouped(math.max(1, rows.length / 3)).map(_.toSeq).toSeq :+
        sentinels).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("ssjlo")
        .as[(Long, Long, Option[Long])].collect().toSet
      val augmented = batchEvents.union(sentinels.toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props"))
      val batch = EventStreams.viewClickStreamJoin(augmented, "left_outer")
        .as[(Long, Long, Option[Long])].collect().toSet
      // the final sentinel view may still sit in state (nothing after it
      // advances the watermark past its bound) — exclude it from parity
      val pending = Set[Any](9000001L)
      def settled(s: Set[(Long, Long, Option[Long])]) =
        s.filterNot(r => pending.contains(r._2))
      assert(settled(streamed) == settled(batch),
        s"stream/batch outer-join divergence: ${(settled(batch) diff settled(streamed)).size} missing")
      assert(settled(streamed).exists(_._3.isEmpty),
        "no NULL-click row — outer emission never happened")
      assert(settled(streamed).exists(_._3.nonEmpty))
    } finally q.stop()
  }

  test("anomalyStream: state survives a checkpointed restart — the second run continues the prefix, not a cold start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-anomaly-ckpt-").toString
    val rows = eventRows().sortBy(e => (e.ts_us, e.event_id))
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[Event]
    // foreachBatch sink: the memory sink refuses checkpoint recovery, and
    // a buffer per phase isolates exactly what the restarted run emits
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[AnomalyVerdict]()
    def start() = EventStreams.anomalyStream(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[AnomalyVerdict],
          _: Long) => df.collect().foreach(buf.add) }
      .start()
    val q1 = start()
    try { mem.addData(half1); q1.processAllAvailable() } finally q1.stop()
    buf.clear() // phase 2 observes ONLY the restarted run's output
    val q2 = start()
    try {
      mem.addData(half2); q2.processAllAvailable()
      val resumed = buf.iterator().asScala.toSeq
        .map(v => v.event_id -> ((v.n_so_far, v.flagged))).toMap
      assert(resumed.keySet == half2.map(_.event_id).toSet)
      // truth: the full-prefix replay over ALL events, restricted to the
      // second half — a cold-started second run would restart n_so_far at
      // 1 per type and diverge immediately
      val scale = graft.queries.Relational.AnomalyScale
      val expected = rows.groupBy(_.event_type).flatMap { case (_, es) =>
        var (n, s, qq) = (0L, BigInt(0), BigInt(0))
        es.sortBy(e => (e.ts_us, e.event_id)).map { e =>
          val qv = math.round(e.value * scale)
          n += 1; s += qv; qq += BigInt(qv) * qv
          e.event_id -> ((n, n >= EventStreams.AnomalyMinN &&
            EventStreams.anomalyFlag(n, s, qq, qv)))
        }
      }.filter(kv => resumed.contains(kv._1))
      assert(resumed == expected,
        "post-restart verdicts diverge from the continued prefix — state lost")
      assert(resumed.values.map(_._1).max ==
        rows.groupBy(_.event_type).values.map(_.size.toLong).max)
    } finally q2.stop()
  }

  test("native session_window under readStream: flushed sessions equal the batch builtin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id")).collect()
      .sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
    val q = stream.writeStream.format("memory").queryName("swagg")
      .outputMode("append").start()
    try {
      val lastTs = rows.last._2.getTime
      val sentinel = Seq((9000099L,
        new java.sql.Timestamp(lastTs + 10L * 86400000L), 999999L))
      (rows.grouped(math.max(1, rows.length / 3)).map(_.toSeq).toSeq :+
        sentinel).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("swagg")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .filter(_._1 != 999999L)
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4)).toSet
      val batch = graft.queries.Relational.sessionWindowAgg(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3))).toSet
      assert(streamed == batch,
        s"stream/batch session_window divergence: ${(batch diff streamed).size} " +
          s"missing, ${(streamed diff batch).size} extra of ${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sessionPatternStreamWithTimeout: watermark finalizes trailing sessions — verdicts equal batch on EVERY session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionPatternStreamWithTimeout(mem.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("cepto").outputMode("append")
      .start()
    try {
      val sorted = rows.sortBy(_.ts_us)
      val (b1, b2) = sorted.splitAt(rows.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      // a far-future sentinel (synthetic user -1) advances the watermark
      // past every real user's last-event + gap; two batches because the
      // timeout check uses the PREVIOUS batch's watermark
      val horizon = sorted.last.ts_us + us(120)
      mem.addData(Seq(Event(-1L, horizon, -1L, "z", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(-2L, horizon + us(1), -1L, "z", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("cepto").as[PatternVerdict].collect()
        .filter(_.user_id >= 0)
      val streamedKeyed = streamed.groupBy(_.user_id).toSeq.flatMap {
        case (u, vs) => vs.sortBy(_.session_start_us).zipWithIndex.toSeq.map {
          case (v, i) =>
            (u, (i + 1).toLong) -> ((v.n_events, v.seq, v.matched, v.hit))
        }
      }.toMap
      val batch = graft.queries.Relational.sessionPattern(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getString(3), r.getBoolean(4), r.getString(5))))
        .toMap
      // EVERY batch session — trailing ones included — has a verdict
      assert(streamedKeyed.keySet == batch.keySet,
        s"missing: ${batch.keySet.diff(streamedKeyed.keySet).take(5)} " +
          s"extra: ${streamedKeyed.keySet.diff(batch.keySet).take(5)}")
      streamedKeyed.foreach { case (k, v) =>
        assert(batch(k) == v, s"session $k: stream $v != batch ${batch(k)}")
      }
      assert(streamedKeyed.values.exists(_._3) &&
        streamedKeyed.values.exists(!_._3))
    } finally q.stop()
  }

  test("sessionizeWithTimeout: trailing session emits once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionizeWithTimeout(mem.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("sessto").outputMode("append")
      .start()
    try {
      val base = 1700000000000000L // epoch micros
      // user 1: three events inside one session, then silence forever
      mem.addData(Seq(
        Event(1, base, 1L, "a", 1.0),
        Event(2, base + us(5), 1L, "a", 1.0),
        Event(3, base + us(10), 1L, "a", 1.0)))
      q.processAllAvailable()
      assert(spark.table("sessto").count() == 0) // still open
      // user 2 events far in the future advance the watermark past
      // user 1's last-event + 30 min → user 1's session times out
      mem.addData(Seq(Event(4, base + us(120), 2L, "b", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(5, base + us(121), 2L, "b", 1.0)))
      q.processAllAvailable()
      val out = spark.table("sessto").as[SessionUpdate].collect()
      assert(out.exists(s => s.user_id == 1L && s.n_events == 3 &&
        s.session_start_us == base && s.session_end_us == base + us(10)),
        s"user 1 session not finalized: ${out.toSeq}")
    } finally q.stop()
  }

  test("streamingDedup: duplicate fingerprints within the watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "fingerprint")
    val q = EventStreams.streamingDedup(df, "10 minutes")
      .writeStream.format("memory").queryName("sdedup").outputMode("append")
      .start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData(Seq((ts(0), "a"), (ts(1), "b"), (ts(2), "a")))
      q.processAllAvailable()
      // duplicate "a" within the watermark suppressed across micro-batches
      mem.addData(Seq((ts(3), "a"), (ts(4), "c")))
      q.processAllAvailable()
      val got = spark.table("sdedup").collect().map(_.getString(1)).sorted
      assert(got.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("quotaAdmission: streaming decisions equal the batch replay operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // events are ~20/user/month: a 7-day window with a low cap makes both
    // admissions and refusals occur
    val maxAmount = 100.0
    val windowUs = us(60L * 24 * 7)
    val rows = eventRows()
    val batch = EventStreams.quotaReplayBatch(spark, dir, maxAmount, windowUs)
      .as[QuotaVerdict].collect().map(v => v.event_id -> v.admitted).toMap
    // some events must be refused for the test to mean anything
    assert(batch.valuesIterator.contains(false))
    val mem = MemoryStream[Event]
    val q = EventStreams.quotaAdmission(mem.toDS(), maxAmount, windowUs)
      .writeStream.format("memory").queryName("quota").outputMode("append")
      .start()
    val streamed = try {
      val (b1, b2) = rows.sortBy(_.ts_us).splitAt(rows.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table("quota").as[QuotaVerdict].collect()
        .map(v => v.event_id -> v.admitted).toMap
    } finally q.stop()
    assert(streamed == batch)
  }

  test("corpusCleanStream: streaming cleaning equals the batch pipeline across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = EventStreams.corpusCleanStream(
        mem.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("clean").outputMode("append")
      .start()
    try {
      // several micro-batches, doc_id order — streaming keep-first keeper
      // election must then equal batch's min-doc_id keeper election
      docs.grouped(150).foreach { chunk =>
        mem.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("clean")
        .select("doc_id", "lang", "n_chars", "quality_score")
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
      val expected = graft.operators.TextAnalysis.corpusClean(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got == expected,
        s"stream=${got.size} rows, batch=${expected.size} rows; " +
          s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    } finally q.stop()
  }

  test("scd2Stream: closed versions EXACTLY equal the batch SCD2 build across micro-batch splits; restart-free append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth: the temporal-dimension build, restricted to CLOSED
    // versions (the only rows Append semantics can ever have emitted)
    val batch = graft.queries.Relational.scd2History(spark, dir)
      .filter(!col("is_current"))
      .select(col("user_id"), col("version"), col("attr"),
        col("valid_from_us"), col("valid_to_us"))
      .as[Scd2Version].collect().toSet
    assert(batch.nonEmpty, "no closed versions in the corpus — vacuous")
    val rows = eventRows()
    val mem = MemoryStream[Event]
    val q = EventStreams.scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2").outputMode("append")
      .start()
    val streamed = try {
      // ts-ordered micro-batches (the per-user in-order contract); the
      // split lands mid-history for most users, so closing changes
      // routinely arrive in a LATER batch than their opens — state must
      // carry versions across the boundary
      val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
      sorted.grouped(math.max(1, sorted.length / 3)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      spark.table("scd2").as[Scd2Version].collect().toSet
    } finally q.stop()
    assert(streamed == batch,
      s"stream/batch SCD2 divergence: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    // the still-open versions are exactly the batch build's current rows
    // (never emitted — they are not final); count parity pins that the
    // stream did not leak an open version early
    val nCurrent = graft.queries.Relational.scd2History(spark, dir)
      .filter(col("is_current")).count()
    assert(streamed.size + nCurrent ==
      graft.queries.Relational.scd2History(spark, dir).count())
  }

  test("quotaAdmission agrees with the engine's driver-side QuotaTracker on integral amounts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic integral-amount events, one user, 10-second window
    val events = (1 to 40).map(i =>
      Event(i.toLong, i.toLong * 1000000, 7L, "up", (i % 7 + 1).toDouble))
    val mem = MemoryStream[Event]
    val q = EventStreams.quotaAdmission(mem.toDS(), maxAmount = 12.0,
      windowUs = 10L * 1000000)
      .writeStream.format("memory").queryName("quota2").outputMode("append")
      .start()
    val streamed = try {
      mem.addData(events.take(20)); q.processAllAvailable()
      mem.addData(events.drop(20)); q.processAllAvailable()
      spark.table("quota2").as[QuotaVerdict].collect()
        .map(v => v.event_id -> v.admitted).toMap
    } finally q.stop()
    var now = 0.0
    val tracker = new QuotaTracker(12L, 10.0, () => now)
    events.foreach { e =>
      now = e.ts_us / 1e6
      val admitted = tracker.checkAdd(e.value.toLong)
      assert(admitted == streamed(e.event_id),
        s"event ${e.event_id}: tracker=$admitted stream=${streamed(e.event_id)}")
    }
  }

  test("WAL-loop E2E: log A → stateful quota twin → log B, restart mid-stream with state; equals the continuous replay, not a cold start") {
    import spark.implicits._
    import java.nio.file.Files
    // the full production loop VERDICT r8 item #7 asks for: the engine's
    // OWN WAL (written by the streaming committer) feeds a STATEFUL
    // streaming twin whose verdicts land in a second WAL, with source
    // offsets, sink epochs AND operator state in one checkpoint — a
    // restart must re-read nothing, re-publish nothing, and CONTINUE the
    // per-user admission windows
    val a = Files.createTempDirectory("graft-wal-loop-a-")
    val b = Files.createTempDirectory("graft-wal-loop-b-")
    val cp = Files.createTempDirectory("graft-wal-loop-cp-")
    val enc = java.util.Base64.getEncoder
    val maxAmount = 100.0
    val windowUs = 7000L
    // 2 users, 30-unit charges every 2000 µs per user: the 7 ms window
    // holds ≤3 admitted predecessors (sum 90), so the 4th charge in a
    // full window refuses — admits AND refusals, deterministically
    val events = (0 until 40).map(i =>
      Event(i.toLong, i.toLong * 1000, (i % 2).toLong, "up", 30.0))
    def put(e: Event): String = {
      val csv = s"${e.event_id},${e.ts_us},${e.user_id},${e.event_type},${e.value}"
      s"PUT\t${enc.encodeToString(e.user_id.toString.getBytes)}\t${enc.encodeToString(csv.getBytes)}\t#\n"
    }
    def temp(content: String): String = {
      val t = Files.createTempFile(a, ".part-loop", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val wA = new graft.sources.WalStreamingWrite(a.toString)
    val (h1, h2) = events.splitAt(20)
    wA.commit(0L, Array(graft.sources.WalCommitMessage(temp(h1.map(put).mkString))))

    def startLoop() = {
      val src = spark.readStream
        .format("graft.sources.WalDataSource").load(a.toString)
        .filter(col("op") === "PUT")
        .select(split(col("value").cast("string"), ",").as("f"))
        .select(col("f")(0).cast("long").as("event_id"),
          col("f")(1).cast("long").as("ts_us"),
          col("f")(2).cast("long").as("user_id"),
          col("f")(3).as("event_type"),
          col("f")(4).cast("double").as("value"))
        .as[Event]
      EventStreams.quotaAdmission(src, maxAmount, windowUs)
        .select(lit(0L).as("seq"), lit("VERDICT").as("op"),
          col("event_id").cast("string").as("key"),
          concat_ws(",", col("user_id"), col("admitted"), col("window_sum"))
            .cast("binary").as("value"))
        .writeStream.format("graft.sources.WalDataSource")
        .option("path", b.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").start()
    }

    val q1 = startLoop()
    try q1.processAllAvailable() finally q1.stop()
    // a new source epoch lands in A while the pipeline is DOWN
    wA.commit(1L, Array(graft.sources.WalCommitMessage(temp(h2.map(put).mkString))))
    val q2 = startLoop()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.format("graft.sources.WalDataSource")
      .load(b.toString).collect().map { r =>
        val parts = new String(r.getAs[Array[Byte]](3)).split(",")
        r.getString(2).toLong ->
          ((parts(0).toLong, parts(1).toBoolean, parts(2).toDouble))
      }.toMap

    // truth: the CONTINUOUS per-user fold through the same admitOne code
    def replay(es: Seq[Event]): Map[Long, (Long, Boolean, Double)] =
      es.groupBy(_.user_id).flatMap { case (u, ue) =>
        var w = List.empty[(Long, Double)]
        ue.sortBy(e => (e.ts_us, e.event_id)).map { e =>
          val (w2, admit, inWin) =
            EventStreams.admitOne(w, e.ts_us, e.value, maxAmount, windowUs)
          w = w2
          e.event_id -> ((u, admit, inWin))
        }
      }
    val expected = replay(events)
    assert(got.keySet == events.map(_.event_id).toSet,
      s"loop lost or duplicated events: got ${got.size} of ${events.size}")
    assert(got == expected, "WAL-loop verdicts diverge from the continuous replay")
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "verdict classes not both populated — the quota never bound")
    // state really SURVIVED the restart: a cold-started second run would
    // restart every user's window empty and produce different second-half
    // verdicts (first admissions with window_sum 0) — the harness must be
    // able to tell the difference, or the continuity claim is vacuous
    val cold = replay(h2)
    assert(h2.exists(e => got(e.event_id) != cold(e.event_id)),
      "second-half verdicts indistinguishable from a cold start — state loss undetectable")
  }

  test("driftStream: windowed chi-square equals the batch face bit-exactly across micro-batch splits; novel buckets counted out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = graft.operators.CorpusOps.refDriftHistogram(spark, dir)
    val base = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(400)
      .as[(Long, String, String)].collect()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // window 1 = an unremarkable slice; window 2 = skewed (en only) plus
    // one NOVEL language the reference has never seen
    val w1 = base.take(200).map { case (id, l, t) => (id, ts(0), l, t) }
    val w2 = base.drop(200).filter(_._2 == "en")
      .map { case (id, l, t) => (id, ts(20), l, t) } :+
      (9999L, ts(21), "xx", "novel language document")
    val flush = Seq((99998L, ts(55), "en", "sentinel"),
      (99999L, ts(56), "en", "sentinel"))
    val all = (w1 ++ w2 ++ flush).toSeq
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val q = EventStreams.driftStream(
        mem.toDF().toDF("doc_id", "ts", "lang", "text"), ref)
      .writeStream.format("memory").queryName("drift").outputMode("append")
      .start()
    try {
      // uneven micro-batches split WITHIN windows — bucket counts must
      // still converge to the batch face exactly (dec-staged sums)
      all.grouped(150).foreach { c => mem.addData(c); q.processAllAvailable() }
      val got = spark.table("drift")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(x => (x._1.getTime, x._2))
      val expected = EventStreams.driftMonitor(
          all.toDF("doc_id", "ts", "lang", "text"), ref)
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getDouble(4)))
        .filter(_._1.before(ts(50))) // the flush window never closes
        .sortBy(x => (x._1.getTime, x._2))
      assert(got.toSeq == expected.toSeq,
        s"stream ${got.length} rows vs batch ${expected.length}:\n" +
          s"${got.toSeq.diff(expected.toSeq).take(3)}")
      // the monitor actually monitors: the skewed window's language χ²
      // exceeds the unremarkable window's, and the novel doc is counted
      val lang = got.filter(_._2 == "lang")
      assert(lang.length == 2)
      assert(lang(1)._5 > lang(0)._5,
        s"skewed window χ² ${lang(1)._5} not above baseline ${lang(0)._5}")
      assert(lang(1)._4 == 1L && lang(0)._4 == 0L, "novel-bucket count wrong")
    } finally q.stop()
  }

  test("ewmaStream: bit-equal to the batch EWMA operator across ts-ordered micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth, keyed for comparison (ts → micros)
    val batch = graft.queries.Relational.ewmaDecay(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getInt(4), r.getDouble(5)))).toMap
    assert(batch.nonEmpty)

    val ordered = eventRows().sortBy(e => (e.ts_us, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStreams.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma").outputMode("append")
      .start()
    try {
      var fed = 0
      ordered.grouped(230).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
        fed += chunk.size
        assert(spark.table("ewma").count() == fed)
      }
      val got = spark.table("ewma").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getInt(4), r.getDouble(5))))
      assert(got.length == batch.size)
      got.foreach { case (k, (nWin, ewma)) =>
        val (bn, be) = batch(k)
        assert(nWin == bn, s"$k: n_win $nWin != batch $bn")
        assert(ewma == be, s"$k: ewma $ewma != batch $be (bitwise)")
      }
      // the window actually slides across batch boundaries somewhere
      assert(got.exists(_._2._1 == graft.queries.Relational.EwmaWindow))
    } finally q.stop()
  }

  test("prioritySampleStream: after EVERY micro-batch the stream equals the batch sampler on the same prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id")).as[(Long, Long)].collect()
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.prioritySampleStream(
        mem.toDF().toDF("doc_id", "n_chars"))
      .writeStream.format("memory").queryName("psample")
      .outputMode("complete").start()
    try {
      var fed = Vector.empty[(Long, Long)]
      docs.grouped(170).foreach { chunk =>
        fed ++= chunk
        mem.addData(chunk.toSeq); q.processAllAvailable()
        val got = spark.table("psample").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sortBy(_._1)
        // mergeability is the claim: the stream's sample after this
        // prefix IS the batch sample of the prefix, bit for bit
        val expected = graft.operators.CorpusOps.prioritySampleOf(
            graft.operators.CorpusOps.priorityCols(
              fed.toDF("doc_id", "n_chars"))).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sortBy(_._1)
        assert(got.toSeq == expected.toSeq,
          s"prefix of ${fed.size} docs diverges")
      }
    } finally q.stop()
  }
}
