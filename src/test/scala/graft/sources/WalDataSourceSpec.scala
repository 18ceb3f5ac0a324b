package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.{Engine, EngineOptions}
import java.nio.file.Files

class WalDataSourceSpec extends AnyFunSuite with SparkSpec {

  test("WAL written by the engine reads back as a table; fold equals engine view") {
    val dir = Files.createTempDirectory("graft-walsource-")
    val e = new Engine(spark, EngineOptions(dataDir = Some(dir)))
    e.register("alice", "pw")
    (1 to 6).foreach(i => e.kvInsert("alice", "pw", s"k$i", s"v$i".getBytes))
    e.kvUpsert("alice", "pw", "k2", "v2b".getBytes)
    e.kvDelete("alice", "pw", "k5")

    val wal = spark.read.format("graft.sources.WalDataSource")
      .load(dir.resolve("kv_wal.jsonl").toString)
    assert(wal.columns.toSeq == Seq("seq", "op", "key", "value"))
    assert(wal.count() == 8) // 6 inserts + 1 upsert + 1 delete
    assert(wal.filter(col("op") === "DEL").count() == 1)

    // SQL fold of the log (last op per key wins, tombstones drop) must equal
    // the engine's folded view
    wal.createOrReplaceTempView("wal")
    val folded = spark.sql(
      """SELECT key, value FROM (
        |  SELECT key, value, op,
        |         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) rn
        |  FROM wal) WHERE rn = 1 AND op <> 'DEL'""".stripMargin)
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1)))
      .toMap
    val engineView = e.kv.view.collect()
      .map(kv => kv.key -> new String(kv.value)).toMap
    assert(folded == engineView)
    assert(folded("k2") == "v2b" && !folded.contains("k5"))
  }

  test("multi-path load reads all WAL segments (DSv2 passes a JSON array)") {
    val d1 = Files.createTempDirectory("graft-wal1-")
    val d2 = Files.createTempDirectory("graft-wal2-")
    for ((d, ks) <- Seq(d1 -> Seq("a1", "a2"), d2 -> Seq("b1"))) {
      val e = new Engine(spark, EngineOptions(dataDir = Some(d)))
      e.register("alice", "pw")
      ks.foreach(k => e.kvInsert("alice", "pw", k, k.getBytes))
    }
    val wal = spark.read.format("graft.sources.WalDataSource")
      .load(d1.resolve("kv_wal.jsonl").toString,
        d2.resolve("kv_wal.jsonl").toString)
    assert(wal.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a1", "a2", "b1"))
  }

  test("DSv2 sink: two-phase commit publishes clean segments the ENGINE can replay; overwrite truncates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-walsink-spec-")
    val rows = Seq(("PUT", "a", "v1"), ("PUT", "b", "v2"), ("PUT", "c", "v3"))
    def writeIt(): Unit = rows.toDF("op", "key", "v")
      .select(lit(0L).as("seq"), col("op"), col("key"),
        col("v").cast("binary").as("value"))
      .repartition(2)
      .write.format("graft.sources.WalDataSource")
      .mode("overwrite").save(out.toString)
    writeIt()
    val listed = Files.list(out).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(listed)
      .asScala.map(_.getFileName.toString).toSeq.sorted
    // committer hygiene: only published segments remain, no temp residue
    assert(names.forall(_.matches("part-\\d{5}\\.wal")), s"residue: $names")
    assert(names.size == 2, s"expected one segment per partition: $names")
    // round trip through the DSv2 reader
    val back = spark.read.format("graft.sources.WalDataSource")
      .load(names.map(out.resolve(_).toString): _*)
      .select(col("op"), col("key"), col("value").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.sorted.toSeq == rows.sorted)
    // overwrite truncates: a second write does not accumulate segments
    writeIt()
    val again = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(out).iterator()).asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(again.size == 2, s"overwrite duplicated segments: $again")
    // the format IS the engine's: a sink-written segment (plus the boot
    // sentinel) replays through a REAL Engine as its kv WAL, and the
    // values come back through the query API
    val dataDir = Files.createTempDirectory("graft-walsink-replay-")
    val segments = again.map(n => Files.readString(out.resolve(n))).mkString
    Files.writeString(dataDir.resolve("kv_wal.jsonl"),
      graft.engine.KvStore.WalSentinel + "\n" + segments)
    val eng = new graft.engine.Engine(spark,
      graft.engine.EngineOptions(dataDir = Some(dataDir)))
    eng.register("alice", "pw")
    rows.foreach { case (_, k, v) =>
      val r = eng.kvGet("alice", "pw", k)
      assert(r.succeeded && r.dataUtf8 == v,
        s"engine replay of sink segment lost $k: $r")
    }
  }

  test("streaming sink: micro-batches publish epoch segments; restart resumes; digest equals the batch path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-walstream-")
    val cp = Files.createTempDirectory("graft-walstream-cp-")
    val batch1 = Seq(("PUT", "s1", "v1"), ("PUT", "s2", "v2"))
    val batch2 = Seq(("PUT", "s3", "v3"), ("DEL", "s1", null: String))

    def startQuery(mem: MemoryStream[(String, String, String)]) =
      mem.toDF().toDF("op", "key", "v")
        .select(lit(0L).as("seq"), col("op"), col("key"),
          col("v").cast("binary").as("value"))
        .writeStream.format("graft.sources.WalDataSource")
        .option("path", out.toString)
        .option("checkpointLocation", cp.toString)
        .outputMode("append").start()

    val mem = MemoryStream[(String, String, String)]
    val q1 = startQuery(mem)
    try { mem.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // restart against the SAME checkpoint (same source instance, so its
    // offset log lines up): the new query continues the epoch sequence
    // instead of rewriting the published generation
    mem.addData(batch2)
    val q2 = startQuery(mem)
    try q2.processAllAvailable() finally q2.stop()

    val allNames = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(out).iterator()).asScala
      .map(_.getFileName.toString).toSeq.sorted
    // committer hygiene: epoch-scoped published segments plus their commit
    // markers only — never a temp
    assert(!allNames.exists(_.endsWith(".tmp")),
      s"temp residue in streamed WAL dir: $allNames")
    val names = allNames.filterNot(_.startsWith("."))
    assert(names.nonEmpty && names.forall(_.matches("part-e\\d+-\\d{5}\\.wal")),
      s"unexpected residue in streamed WAL dir: $allNames")
    assert(names.map(_.takeWhile(_ != '-')).distinct.size == 1)
    // every published epoch carries its marker
    names.map(_.drop("part-e".length).takeWhile(_ != '-')).distinct.foreach {
      e => assert(allNames.contains(s".epoch-$e.ok"),
        s"epoch $e published without a marker: $allNames")
    }

    // the streamed log folds to the same records as the batch sink's
    val all = batch1 ++ batch2
    val batchOut = Files.createTempDirectory("graft-walstream-batchtwin-")
    all.toDF("op", "key", "v")
      .select(lit(0L).as("seq"), col("op"), col("key"),
        col("v").cast("binary").as("value"))
      .write.format("graft.sources.WalDataSource")
      .mode("overwrite").save(batchOut.toString)
    def digest(dir: java.nio.file.Path): Seq[(String, String, String)] =
      spark.read.format("graft.sources.WalDataSource").load(dir.toString)
        .select(col("op"), col("key"), col("value").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSeq.sorted
    // directory-path read expansion serves both committers' outputs
    assert(digest(out) == digest(batchOut))
    assert(digest(out).map(t => (t._1, t._2)).sorted ==
      all.map(t => (t._1, t._2)).sorted)
  }

  test("streaming sink: epoch commit is idempotent — a replayed micro-batch cannot double-append") {
    val out = Files.createTempDirectory("graft-walreplay-")
    val w = new WalStreamingWrite(out.toString)
    def temp(content: String): String = {
      val t = Files.createTempFile(out, ".part-replay", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val rec1 = "PUT\tYQ==\tdjE=\t#\n" // PUT a v1
    w.commit(7L, Array(WalCommitMessage(temp(rec1))))
    def listed(): Seq[String] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(Files.list(out).iterator()).asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(listed() == Seq(".epoch-7.ok", "part-e7-00000.wal"),
      s"epoch 7 publish: ${listed()}")
    // the replayed attempt recomputes DIFFERENT bytes (speculative attempt
    // ordering) — the committed generation must win and the temp must go
    val w2 = new WalStreamingWrite(out.toString)
    w2.commit(7L, Array(WalCommitMessage(temp("PUT\tYQ==\tdjk=\t#\n"))))
    assert(listed() == Seq(".epoch-7.ok", "part-e7-00000.wal"),
      s"replay residue: ${listed()}")
    assert(Files.readString(out.resolve("part-e7-00000.wal")) == rec1,
      "replayed epoch overwrote the committed generation")
    // a NEW epoch still publishes
    w2.commit(8L, Array(WalCommitMessage(temp(rec1))))
    assert(Files.exists(out.resolve("part-e8-00000.wal")))
    assert(Files.exists(out.resolve(".epoch-8.ok")))
  }

  test("streaming sink: a crash between an epoch's renames and its marker cannot lose partitions on replay") {
    val out = Files.createTempDirectory("graft-walpartial-")
    def temp(content: String): String = {
      val t = Files.createTempFile(out, ".part-replay", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val recA = "PUT\tYQ==\tdjE=\t#\n" // PUT a v1
    val recB = "PUT\tYg==\tdjI=\t#\n" // PUT b v2
    // simulate the crash window: one of epoch 3's two segments was renamed,
    // the marker was never written — the old any-segment-exists idempotence
    // check would have treated the epoch as published, deleted BOTH
    // recomputed temps, and permanently dropped partition 1's rows
    Files.writeString(out.resolve("part-e3-00000.wal"), recA)
    // the unmarked partial generation is invisible to readers
    assert(WalSegments.expandDir(out).isEmpty,
      "unmarked partial epoch leaked into the published generation")
    val w = new WalStreamingWrite(out.toString)
    w.commit(3L, Array(WalCommitMessage(temp(recA)), WalCommitMessage(temp(recB))))
    assert(Files.readString(out.resolve("part-e3-00000.wal")) == recA)
    assert(Files.readString(out.resolve("part-e3-00001.wal")) == recB,
      "replayed commit lost the partition the crashed commit never renamed")
    assert(Files.exists(out.resolve(".epoch-3.ok")))
    assert(WalSegments.expandDir(out).size == 2)
  }

  test("segment fold order is numeric by (epoch, index); seq is globally monotone across segments") {
    val out = Files.createTempDirectory("graft-walorder-")
    def temp(content: String): String = {
      val t = Files.createTempFile(out, ".part-ord", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val enc = java.util.Base64.getEncoder
    def put(k: String, v: String) =
      s"PUT\t${enc.encodeToString(k.getBytes)}\t${enc.encodeToString(v.getBytes)}\t#\n"
    // epochs 2 and 10: lexicographic name order would put e10 FIRST and a
    // (key, seq) last-writer-wins fold would resurrect the stale value
    val w = new WalStreamingWrite(out.toString)
    w.commit(2L, Array(WalCommitMessage(temp(put("k", "old")))))
    w.commit(10L, Array(WalCommitMessage(temp(put("k", "new")))))
    val wal = spark.read.format("graft.sources.WalDataSource")
      .load(out.toString)
    val rows = wal.orderBy(col("seq")).collect()
      .map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](3))))
    assert(rows.map(_._2).toSeq == Seq("old", "new"),
      s"fold order is not numeric by epoch: ${rows.toSeq}")
    // distinct high bits per segment: the later segment's seq strictly
    // dominates the earlier one's, so ORDER BY seq IS fold order
    assert(rows(0)._1 < rows(1)._1)
    assert((rows(1)._1 >> 32) == (rows(0)._1 >> 32) + 1)
  }

  test("time travel: asOfEpoch pins the batch read to the epoch-E snapshot; later epochs invisible; beyond-latest reads everything") {
    val out = Files.createTempDirectory("graft-walasof-")
    def temp(content: String): String = {
      val t = Files.createTempFile(out, ".part-asof", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val enc = java.util.Base64.getEncoder
    def put(k: String, v: String) =
      s"PUT\t${enc.encodeToString(k.getBytes)}\t${enc.encodeToString(v.getBytes)}\t#\n"
    val w = new WalStreamingWrite(out.toString)
    w.commit(2L, Array(WalCommitMessage(temp(put("k", "v2")))))
    w.commit(5L, Array(WalCommitMessage(temp(put("k", "v5")))))
    w.commit(9L, Array(WalCommitMessage(temp(put("k", "v9")))))
    def lastValue(df: org.apache.spark.sql.DataFrame): String = {
      val rows = df.orderBy(col("seq")).collect()
        .map(r => new String(r.getAs[Array[Byte]](3)))
      rows.last
    }
    def readAsOf(e: Long) = spark.read
      .format("graft.sources.WalDataSource")
      .option("asOfEpoch", e.toString).load(out.toString)
    // the snapshot at epoch 5 folds to v5 even though epoch 9 is live
    assert(lastValue(readAsOf(5L)) == "v5")
    assert(readAsOf(5L).count() == 2, "epoch-5 snapshot read a later epoch")
    // an as-of BETWEEN committed epochs pins to the floor (epoch 2)
    assert(lastValue(readAsOf(4L)) == "v2")
    // beyond-latest as-of and the plain read agree
    val full = spark.read.format("graft.sources.WalDataSource")
      .load(out.toString)
    assert(lastValue(readAsOf(100L)) == "v9")
    assert(readAsOf(100L).count() == full.count())
    // snapshot STABILITY: a previously planned as-of frame re-executed
    // after a NEW epoch lands still reads the pinned set
    val pinned = readAsOf(5L)
    w.commit(12L, Array(WalCommitMessage(temp(put("k", "v12")))))
    assert(lastValue(pinned) == "v5",
      "as-of snapshot moved when a later epoch published")
    assert(lastValue(full.sparkSession.read
      .format("graft.sources.WalDataSource").load(out.toString)) == "v12")
  }

  test("streaming source: micro-batches follow committed epochs; restart resumes from the checkpointed offset; digest equals batch read") {
    val out = Files.createTempDirectory("graft-walmbr-")
    val cp = Files.createTempDirectory("graft-walmbr-cp-")
    def temp(content: String): String = {
      val t = Files.createTempFile(out, ".part-mbr", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    val enc = java.util.Base64.getEncoder
    def put(k: String, v: String) =
      s"PUT\t${enc.encodeToString(k.getBytes)}\t${enc.encodeToString(v.getBytes)}\t#\n"
    val w = new WalStreamingWrite(out.toString)
    w.commit(0L, Array(WalCommitMessage(temp(put("a", "v1")))))
    w.commit(1L, Array(WalCommitMessage(temp(put("b", "v2")))))

    // foreachBatch (not the memory sink) because it supports restarting
    // from a checkpoint; each pass accumulates into its own buffer
    def startRead(buf: scala.collection.mutable.ArrayBuffer[(Long, String, String)]) =
      spark.readStream
        .format("graft.sources.WalDataSource").load(out.toString)
        .selectExpr("seq", "op", "key", "CAST(value AS STRING) AS v")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r =>
              (r.getLong(0), r.getString(2), r.getString(3)))
          }; ()
        }
        .option("checkpointLocation", cp.toString)
        .outputMode("append").start()

    val buf1 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q1 = startRead(buf1)
    try {
      q1.processAllAvailable()
      // a new epoch published while the query runs is picked up
      w.commit(2L, Array(WalCommitMessage(temp(put("c", "v3")))))
      q1.processAllAvailable()
    } finally q1.stop()
    val got1 = buf1.map(r => (r._2, r._3)).sorted.toSeq
    assert(got1 == Seq("a" -> "v1", "b" -> "v2", "c" -> "v3"), s"pass 1: $got1")

    // epoch published while the stream is DOWN, then restart on the same
    // checkpoint: only the unseen segment is delivered — nothing re-read
    w.commit(3L, Array(WalCommitMessage(temp(put("d", "v4")))))
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q2 = startRead(buf2)
    try q2.processAllAvailable() finally q2.stop()
    val got2 = buf2.map(r => (r._2, r._3)).sorted.toSeq
    assert(got2 == Seq("d" -> "v4"),
      s"restart re-read or skipped segments: $got2")

    // stream ≡ batch: the union of both passes is exactly the batch read,
    // seq values included (same global ordinals either way)
    val streamed = (buf1 ++ buf2).sorted.toSeq
    val batch = spark.read.format("graft.sources.WalDataSource")
      .load(out.toString)
      .selectExpr("seq", "op", "key", "CAST(value AS STRING) AS v").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3))).sorted.toSeq
    assert(streamed == batch, s"stream digest != batch digest:\n$streamed\n$batch")
  }

  test("DSv2 sink: wrong input schema fails driver-side with a diagnosable message") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-walsink-bad-")
    // the analyzer rejects a missing column before our builder runs; a
    // TYPE-mismatched value column reaches the builder's own gate
    val e = intercept[Exception] {
      Seq((0L, "PUT", "x", "not-binary"))
        .toDF("seq", "op", "key", "value")
        .write.format("graft.sources.WalDataSource")
        .mode("overwrite").save(out.toString)
    }
    assert(e.getMessage.contains("graft-wal sink expects") ||
      e.getMessage.contains("Cannot"), e.getMessage)
  }

  test("parsePaths handles JSON arrays and bare comma lists") {
    assert(WalDataSource.parsePaths(Some("""["/a/w1","/b/w2"]""")) ==
      Seq("/a/w1", "/b/w2"))
    assert(WalDataSource.parsePaths(Some("/a/w1,/b/w2")) ==
      Seq("/a/w1", "/b/w2"))
    assert(WalDataSource.parsePaths(None) == Nil)
  }

  test("malformed marker-terminated records are skipped, not fatal") {
    val dir = Files.createTempDirectory("graft-walbad-")
    val enc = java.util.Base64.getEncoder
    def b64(s: String) = enc.encodeToString(s.getBytes("UTF-8"))
    val p = dir.resolve("kv_wal.jsonl")
    Files.writeString(p,
      s"PUT\t${b64("k1")}\t${b64("v1")}\t#\n" +
        "X\t#\n" + // marker-terminated but one field (would AIOOBE in get)
        s"PUT\t!!!notbase64!!!\t${b64("v")}\t#\n" + // undecodable key
        s"PUT\t${b64("k")}\t${b64("v")}\t${b64("extra")}\t#\n" + // 4 fields
        "PUT\tazM\n" + // torn (no marker)
        s"DEL\t${b64("k1")}\t#\n")
    val wal = spark.read.format("graft.sources.WalDataSource")
      .load(p.toString).collect()
    // only the two structurally valid records survive; scan does not throw
    assert(wal.length == 2)
    assert(wal.map(_.getString(1)).toSeq == Seq("PUT", "DEL"))
    // seq numbers reflect the original line positions (0 and 5)
    assert(wal.map(_.getLong(0)).toSeq == Seq(0L, 5L))
  }

  test("missing WAL file yields an empty table, not an error") {
    val wal = spark.read.format("graft.sources.WalDataSource")
      .load("/tmp/does-not-exist-graft-wal.jsonl")
    assert(wal.count() == 0)
  }

  test("log-to-log ETL: WAL source → transform → WAL sink with one checkpoint; restart mid-stream, exactly-once end to end") {
    import org.apache.spark.sql.functions._
    // the full loop the two streaming halves exist for: one query whose
    // SOURCE offsets (epoch segments of log A) and SINK epochs (log B)
    // live in the same checkpoint — a restart must neither re-read nor
    // re-publish
    val a = Files.createTempDirectory("graft-waletl-a-")
    val b = Files.createTempDirectory("graft-waletl-b-")
    val cp = Files.createTempDirectory("graft-waletl-cp-")
    val enc = java.util.Base64.getEncoder
    def temp(content: String): String = {
      val t = Files.createTempFile(a, ".part-etl", ".tmp")
      Files.writeString(t, content)
      t.toString
    }
    def put(k: String, v: String) =
      s"PUT\t${enc.encodeToString(k.getBytes)}\t${enc.encodeToString(v.getBytes)}\t#\n"
    val wA = new WalStreamingWrite(a.toString)
    wA.commit(0L, Array(WalCommitMessage(temp(put("k1", "v1") + put("k2", "v2")))))

    def startEtl() = spark.readStream
      .format("graft.sources.WalDataSource").load(a.toString)
      .filter(col("op") === "PUT")
      .select(col("seq"), col("op"), col("key"),
        upper(col("value").cast("string")).cast("binary").as("value"))
      .writeStream.format("graft.sources.WalDataSource")
      .option("path", b.toString)
      .option("checkpointLocation", cp.toString)
      .outputMode("append").start()

    val q1 = startEtl()
    try q1.processAllAvailable() finally q1.stop()
    // a new epoch lands in A while the pipeline is DOWN
    wA.commit(1L, Array(WalCommitMessage(temp(put("k3", "v3")))))
    val q2 = startEtl()
    try q2.processAllAvailable() finally q2.stop()

    val sink = spark.read.format("graft.sources.WalDataSource")
      .load(b.toString).collect()
      .map(r => (r.getString(2), new String(r.getAs[Array[Byte]](3))))
    // exactly-once: every source record transformed EXACTLY once — a
    // replayed source offset or re-published sink epoch would duplicate
    assert(sink.sorted.toSeq ==
      Seq("k1" -> "V1", "k2" -> "V2", "k3" -> "V3"),
      s"loop output: ${sink.toSeq}")
  }
}
