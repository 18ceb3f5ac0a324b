package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties beyond the DuckDB equality gate for the round-11
  * relational additions: brute-force dominance replay for the skyline,
  * exact BigInt replay of the OLS normal equations, and a full driver
  * replay of the session-pattern CEP matcher. */
class SkylineRegressionSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("skyline_pareto: brute-force dominance replay; no pairwise join in the plan") {
    import spark.implicits._
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_size").cast("long"), col("p_retailprice"))
      .as[(Long, Long, Double)].collect()
    val expected = parts.filter { case (_, s, p) =>
      !parts.exists { case (_, os, op) =>
        os >= s && op >= p && (os > s || op > p)
      }
    }.map(_._1).toSet
    val df = Relational.skylinePareto(spark, dir)
    val got = df.collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < parts.length,
      "skyline vacuous (empty or everything)")
    // the staircase never compares DATA rows pairwise: the only θ-join
    // runs over the aggregated size classes (|domain|² pairs) and the
    // join back to part rows is a broadcast HASH join on p_size; no
    // cartesian anywhere
    val plan = aqeFinalPlan(df)
    assert(!plan.contains("CartesianProduct"), "cartesian in skyline plan")
    assert(plan.contains("BroadcastHashJoin"),
      "part rows must rejoin the staircase by broadcast hash join")
  }

  test("grouped_regression: exact BigInt replay of the normal equations") {
    import spark.implicits._
    // mirror the operator's eventSeq null gate: a null value decoded into a
    // non-nullable Double would silently become 0.0 and skew the replay
    val rows = graft.Tables.t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").cast("long"),
        col("value"))
      .as[(String, Long, Double)].collect()
    val expected = rows.groupBy(_._1).map { case (et, es) =>
      val xy = es.map { case (_, day, v) =>
        val cx = BigInt(day - Relational.OlsRefDay)
        // micro-quantization through BigDecimal — the dec() path
        val yq = BigInt(BigDecimal(v).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).underlying
          .movePointRight(6).toBigIntegerExact)
        (cx, yq)
      }
      val n = BigInt(xy.length)
      val sx = xy.map(_._1).sum
      val sy = xy.map(_._2).sum
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      et -> ((n, n * sxy - sx * sy, n * sxx - sx * sx, sy * sxx - sx * sxy))
    }
    val got = Relational.groupedRegression(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, num, den, inum) = expected(r.getString(0))
      assert(BigInt(r.getLong(1)) == n)
      assert(BigInt(r.getString(2)) == num, s"${r.getString(0)} num")
      assert(BigInt(r.getString(3)) == den, s"${r.getString(0)} den")
      // the reported doubles are exactly num/den/1e6 in IEEE order
      assert(r.getDouble(4) ==
        num.toString.toDouble / den.toString.toDouble / 1000000.0d)
      assert(r.getDouble(5) ==
        inum.toString.toDouble / den.toString.toDouble / 1000000.0d)
    }
  }

  test("changepoint_cusum: the classic max(0, S+d) RECURSION replays every statistic; both verdicts populated") {
    import spark.implicits._
    val rows = graft.Tables.t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), expr("unix_micros(ts)"),
        col("value"))
      .as[(String, Long, Long, Double)].collect()
    // the operator computes the CLOSED FORM P - min(0, runmin P); this
    // replay runs the textbook sequential recursion — equality proves
    // the two formulations coincide, which the oracle alone cannot
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (et, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val qs = sorted.map(e => BigInt(BigDecimal(e._4).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).underlying
        .movePointRight(6).toBigIntegerExact))
      val n = BigInt(qs.length)
      val sq = qs.sum
      var s = BigInt(0)
      (sorted zip qs).zipWithIndex.toSeq.map { case (((_, id, _, _), q), i) =>
        s = (s + (n * q - sq)).max(BigInt(0))
        (et, id) -> ((i + 1).toLong, s,
          s > BigInt(Relational.CusumLambda) * n * BigInt(1000000))
      }
    }.toMap
    val got = Relational.changepointCusum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), BigInt(r.getString(4)), r.getBoolean(5))))
      .toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"event $k: ${got(k)} != recursion $v")
    }
    assert(got.values.exists(_._3), "no alarm fired — threshold vacuous")
    assert(got.values.exists(!_._3), "every row alarms — threshold vacuous")
  }

  test("acf_lags: Cauchy-Schwarz bound, exact pair counts, and a populated correlation signal") {
    val rows = Relational.acfLags(spark, dir).collect()
    val nByType = graft.Tables.t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == nByType.size * Relational.AcfMaxLag)
    rows.foreach { r =>
      val (et, lag, nPairs, acf) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(5))
      // lag-k pairing covers exactly the n-k adjacent pairs
      assert(nPairs == nByType(et) - lag, s"$et lag $lag pairs $nPairs")
      // |r_k| <= 1 by Cauchy-Schwarz on the deviation vectors
      assert(math.abs(acf) <= 1.0, s"$et lag $lag acf $acf out of range")
    }
    // the statistic must carry signal, not collapse to zero everywhere
    assert(rows.exists(r => math.abs(r.getDouble(5)) > 1e-6))
  }

  test("seasonal_trend: additive identity holds and both components carry signal") {
    val rows = Relational.seasonalTrend(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = BigDecimal(r.getString(3)).toDouble / 1e6
      val (tr, se, re) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      // y = trend + seasonal + resid exactly as rationals; as doubles the
      // three divisions round independently — allow ulp-scale slack only
      assert(math.abs(tr + se + re - y) <= 1e-6 * math.max(1.0, math.abs(y)),
        s"additive identity broken: $tr + $se + $re != $y")
    }
    // decomposition must be non-vacuous: seasonality and remainder both
    // carry mass somewhere (a flat series would zero them out)
    assert(rows.exists(r => math.abs(r.getDouble(7)) > 1e-3), "seasonal flat")
    assert(rows.exists(r => math.abs(r.getDouble(8)) > 1e-3), "resid flat")
  }

  test("session_pattern: full driver replay of sessionization + regex; both verdicts populated") {
    import spark.implicits._
    val ev = graft.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val re = Relational.SessionPatternRe.r
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var sid = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._3 - prev > 1800000000L) sid += 1
        prev = e._3
        (sid, e._4.substring(0, 1))
      }
      tagged.groupBy(_._1).map { case (s, cs) =>
        val seq = cs.map(_._2).mkString
        (u, s) -> ((cs.length.toLong, seq,
          re.findFirstIn(seq).isDefined, re.findFirstIn(seq).getOrElse("")))
      }
    }
    val got = Relational.sessionPattern(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getBoolean(4), r.getString(5))))
      .toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"session $k: ${got(k)} != $v")
    }
    assert(got.values.exists(_._3), "no session matched the pattern")
    assert(got.values.exists(!_._3), "every session matched — pattern vacuous")
  }
}
