package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EWMA properties beyond the DuckDB equality gate: a bit-exact driver
  * replay of the closed-form weighted window (BigDecimal terms, one final
  * IEEE division — the operator's whole arithmetic contract), and the
  * DESIGN claim behind the 62-row truncation: on full windows the result
  * is indistinguishable (≪ 1 ulp-scale) from the untruncated α = 1/2
  * recursion `e_n = (e_{n-1} + x_n) / 2`. */
class EwmaSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("ewma_decay: bit-exact BigDecimal replay; full windows match the infinite recursion below double resolution") {
    val rows = Relational.ewmaDecay(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._4 == Relational.EwmaWindow),
      "no full window — the truncation claim would be vacuous")

    // independent replay from the raw events, same (ts, event_id) order
    val raw = graft.Tables.t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val half = BigDecimal.RoundingMode.HALF_UP
    val expected = raw.groupBy(_._1).flatMap { case (et, es) =>
      val ordered = es.sortBy(e => (e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._2))
      ordered.indices.map { n =>
        val win = ordered.slice(math.max(0, n - Relational.EwmaWindow + 1), n + 1)
        val len = win.length
        val num = win.zipWithIndex.map { case (e, i) =>
          BigDecimal(e._4).setScale(6, half) *
            BigDecimal(BigInt(1) << (62 - len + i))
        }.sum
        val den = (1L << 62) - (1L << (62 - len))
        // the operator's exact double path: decimal → text → parse, ÷ IEEE
        val ewma = num.bigDecimal.toPlainString.toDouble / den.toDouble
        (et, ordered(n)._2) -> ((len, ewma))
      }
    }
    rows.foreach { case (et, id, _, nWin, ewma) =>
      val (len, exp) = expected((et, id))
      assert(nWin == len, s"($et,$id): n_win $nWin != $len")
      assert(ewma == exp, s"($et,$id): ewma $ewma != replay $exp (bitwise)")
    }

    // truncation claim: on full windows, the windowed closed form sits
    // within 1e-12 relative of the untruncated recursion over the WHOLE
    // prefix (the dropped tail carries ≤ 2^-62 of the weight)
    raw.groupBy(_._1).foreach { case (et, es) =>
      val ordered = es.sortBy(e => (e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._2))
      var e = 0.0d
      ordered.zipWithIndex.foreach { case (ev, n) =>
        e = if (n == 0) ev._4 else (e + ev._4) / 2.0d
        if (n + 1 >= Relational.EwmaWindow) {
          val (_, got) = expected((et, ev._2))
          assert(math.abs(got - e) <= 1e-12 * math.max(1.0, math.abs(e)),
            s"($et,${ev._2}): windowed $got vs recursive $e")
        }
      }
    }
  }
}
