package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Event, EventStreams}

/** One-off diagnostic for the r17/r18 StreamBench cadence sag: drives
  * ONE twin through the StreamBench chunk cadence and prints every
  * micro-batch's duration breakdown from StreamingQueryProgress
  * (triggerExecution / queryPlanning / addBatch / getBatch /
  * walCommit / commitOffsets / stateStore metrics), so a per-batch cost
  * that grows with BATCH INDEX — invisible in end-to-end rows/sec —
  * shows up as a trend line. Usage:
  *   runMain graft.tools.StreamBatchDiag [twin] [rows]
  * twin ∈ asof | quota (default asof, 200k rows). */
object StreamBatchDiag {
  def main(args: Array[String]): Unit = {
    val twin = args.lift(0).getOrElse("asof")
    val rows = args.lift(1).map(_.toInt).getOrElse(200000)
    val keys = 200
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def events(n: Int, kinds: Seq[String]): Seq[Event] =
      (0 until n).map { i =>
        Event(i.toLong, i.toLong * 1000L, (i % keys).toLong,
          kinds((i / keys) % kinds.size), (i % 7 + 1).toDouble)
      }

    def drive[T](mem: MemoryStream[T],
        q: org.apache.spark.sql.streaming.StreamingQuery,
        data: Seq[T]): Unit = {
      var batch = 0
      data.grouped(StreamBench.ChunkRows).foreach { chunk =>
        mem.addData(chunk)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        batch += 1
        Option(q.lastProgress).foreach { p =>
          val d = p.durationMs
          def ms(k: String): Long =
            Option(d.get(k)).map(_.longValue()).getOrElse(-1L)
          println(f"batch=$batch%3d wall=$wall%7.3f trigger=${ms("triggerExecution")}%6d " +
            f"addBatch=${ms("addBatch")}%6d getBatch=${ms("getBatch")}%5d " +
            f"plan=${ms("queryPlanning")}%5d walCommit=${ms("walCommit")}%5d " +
            f"commit=${ms("commitOffsets")}%5d latestOffset=${ms("latestOffset")}%5d")
        }
      }
      q.stop()
    }

    if (twin == "dedup") {
      val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = EventStreams.streamingDedup(
          mem.toDF().toDF("event_id", "ts", "fingerprint"),
          watermarkDelay = "1 hour")
        .writeStream.format("noop").outputMode("append").start()
      val data = (0 until rows).map { i =>
        val fp = if (i % 10 == 9) s"fp${i - 1}" else s"fp$i"
        (i.toLong, new java.sql.Timestamp(i * 1000L), fp)
      }
      drive(mem, q, data)
      spark.stop()
      return
    }

    val mem = MemoryStream[Event]
    val q = (twin match {
      case "quota" => EventStreams.quotaAdmission(mem.toDS(),
        maxAmount = 40.0, windowUs = 50L * keys * 1000L)
      case _ => EventStreams.asofEnrich(mem.toDS())
    }).writeStream.format("noop").outputMode("append").start()

    val kinds = if (twin == "quota") Seq("click") else Seq("view", "click")
    val data = events(rows, kinds)
    var batch = 0
    data.grouped(StreamBench.ChunkRows).foreach { chunk =>
      mem.addData(chunk)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      batch += 1
      Option(q.lastProgress).foreach { p =>
        val d = p.durationMs
        def ms(k: String): Long =
          Option(d.get(k)).map(_.longValue()).getOrElse(-1L)
        println(f"batch=$batch%3d wall=$wall%7.3f trigger=${ms("triggerExecution")}%6d " +
          f"addBatch=${ms("addBatch")}%6d getBatch=${ms("getBatch")}%5d " +
          f"plan=${ms("queryPlanning")}%5d walCommit=${ms("walCommit")}%5d " +
          f"commit=${ms("commitOffsets")}%5d latestOffset=${ms("latestOffset")}%5d")
      }
    }
    q.stop()
    spark.stop()
  }
}
