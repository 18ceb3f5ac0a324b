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

  test("missing WAL file yields an empty table, not an error") {
    val wal = spark.read.format("graft.sources.WalDataSource")
      .load("/tmp/does-not-exist-graft-wal.jsonl")
    assert(wal.count() == 0)
  }
}
