package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** Content pins for the product-analytics family beyond their oracle
  * rows: the gate proves Spark ≡ DuckDB, these prove the SEMANTICS are
  * the intended ones (an identically-wrong formulation on both sides
  * would still hash-match). */
class ProductAnalyticsSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("rfm_segments: every customer scored once, scores in 1..5, all six segments populated") {
    val rows = Relational.rfmSegments(spark, dir).collect()
    val nCust = graft.Tables.t(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.length == nCust, "a customer gained or lost a row")
    rows.foreach { r =>
      Seq(4, 5, 6).foreach { i =>
        assert(r.getLong(i) >= 1 && r.getLong(i) <= 5,
          s"score out of range: $r")
      }
      assert(r.getLong(1) >= 0, s"negative recency: $r")
    }
    val segs = rows.map(_.getString(7)).toSet
    assert(segs == Set("champion", "loyal", "big_spender", "at_risk",
      "hibernating", "regular"), s"segments degenerate: $segs")
  }

  test("attribution_credit: per-conversion credit sums to ~1.0 scaled; no conversion over-credited") {
    // total scaled credit across all roles must equal (conversions with
    // >= 1 touch) * scale, minus only the documented floor remainders of
    // the middle split (< (n-2) per U-shaped conversion)
    val rows = Relational.attributionCredit(spark, dir).collect()
    val totalCredit = rows.map(r => BigInt(r.getString(3))).sum
    val ev = graft.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("cid"),
        col("ts_us").as("cts"))
    val tch = ev.filter(col("event_type").isin("view", "click"))
    val credited = conv.join(tch, Seq("user_id"))
      .filter(col("ts_us") < col("cts") &&
        col("cts") - col("ts_us") < Relational.AttrWindowUs)
      .select(col("cid")).distinct().count()
    val exactTotal = BigInt(credited) * BigInt(Relational.AttrScale)
    assert(totalCredit <= exactTotal, "credit exceeds one unit per conversion")
    // floor remainder per conversion < n-2 <= touches; bound loosely by
    // conversions * max basket: remainder must be tiny vs the total
    assert((exactTotal - totalCredit) * 100 < exactTotal,
      s"credit mass lost: $totalCredit of $exactTotal")
    val roles = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(Seq("first", "last", "middle", "solo")
      .forall(role => roles.exists(_._2 == role)), s"roles degenerate: $roles")
  }

  test("copurchase_lift: no self-pairs, support floor respected, independence-beating pairs exist") {
    val rows = Relational.copurchaseLift(spark, dir).collect()
    assert(rows.length == Relational.BasketTopK)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"non-canonical pair: $r")
      assert(r.getLong(2) >= Relational.BasketMinSupport, s"support: $r")
      assert(r.getDouble(5) > 0.0)
    }
    // the top pair must beat independence, or "lift ranking" is vacuous
    assert(rows.head.getDouble(5) > 1.0, s"top lift <= 1: ${rows.head}")
  }

  test("ab_test: arms cover all users, cells consistent, verdict agrees with the floating chi2") {
    val r = Relational.abTest(spark, dir).collect()(0)
    val (a, b, c, d, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    val nUsers = graft.Tables.t(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(a + b + c + d == n && n == nUsers, "cells do not partition users")
    assert(a + b > 0 && c + d > 0, "an arm is empty — hash split broken")
    assert(a + c > 0 && b + d > 0, "a metric class is empty — verdict vacuous")
    val chi2 = r.getDouble(5)
    val sig = r.getBoolean(6)
    // the exact integer verdict and the reported float must agree except
    // within an ulp of the critical value (never the case on this data)
    assert(sig == (chi2 > 3.841), s"verdict/statistic disagree: $chi2 $sig")
  }

  test("session_paths: counts reconcile with sessionization; conversion share is 0/1 per path") {
    val rows = Relational.sessionPaths(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Relational.PathTopK)
    val totalSessions = Relational.eventsSessionize(spark, dir).count()
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= totalSessions)
      // conversion is a property of the PATH: share is exactly 0 or 1
      val rate = r.getDouble(3)
      assert(rate == 0.0 || rate == 1.0, s"path-level rate fractional: $r")
      assert((rate == 1.0) == r.getString(0).contains("p"), s"share/path: $r")
    }
    // ranking is (count desc, path) total order
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }

  test("matryoshka_eval: recall strictly below 1 on this corpus and hits consistent with rr") {
    val rows = Similarity.matryoshkaEval(spark, dir).collect()
    assert(rows.length == Similarity.XModalQueries)
    rows.foreach { r =>
      val (hits, recall, nnRank, rr) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(hits >= 0 && hits <= Similarity.XModalK)
      assert(recall == hits.toDouble / Similarity.XModalK)
      assert((nnRank == 0 && rr == 0.0) || (nnRank > 0 && rr == 1.0 / nnRank))
    }
    // the documented physics: near-random embeddings carry no Matryoshka
    // structure — the 16-dim prefix must NOT reproduce full-dim top-10
    assert(rows.map(_.getLong(1)).max < Similarity.XModalK,
      "prefix reproduced full-dim retrieval — truncation eval vacuous")
  }
}
