package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** events_anomaly properties beyond the DuckDB equality gate: a full
  * driver replay of the integer z-verdict over every event, and
  * non-vacuity of the flag split. */
class AnomalySpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("events_anomaly: exact BigInt replay of every verdict; split non-vacuous") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val k2 = BigInt(Relational.AnomalyK * Relational.AnomalyK)
    val expected = rows.groupBy(_._2).flatMap { case (_, es) =>
      val qs = es.map(e => BigInt(math.round(e._3 * Relational.AnomalyScale)))
      val n = BigInt(qs.length)
      val s = qs.sum
      val qq = qs.map(q => q * q).sum
      (es zip qs).toSeq.collect { case ((id, _, _), q)
        if (n * q - s).pow(2) > k2 * (n * qq - s * s) => id }
    }.toSet
    val got = Relational.eventsAnomaly(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "no outliers flagged — threshold vacuous")
    assert(got.size < rows.length / 10, "flagging a tenth of the stream is not outlier detection")
  }
}
