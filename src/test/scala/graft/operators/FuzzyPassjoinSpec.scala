package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** fuzzy_join_passjoin properties beyond the DuckDB equality gate: a
  * brute-force levenshtein replay over the distinct vocabulary (the
  * completeness claim — segment blocking must lose NOTHING), and the
  * segment-scheme arithmetic exercised across every length residue. */
class FuzzyPassjoinSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy_join_passjoin: brute-force completeness replay over the vocabulary") {
    import spark.implicits._
    val names = spark.read.parquet(s"$dir/part.parquet")
      .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val expected = (for {
      (a, ca) <- names; (b, cb) <- names
      if a < b && lev(a, b) <= Dedup.FuzzyTau
    } yield ((a, b), (lev(a, b).toLong, ca * cb))).toMap
    // orientation in the operator is by min-partkey id, not name order —
    // normalize both sides to (smaller-name, larger-name) for comparison
    val got = Dedup.fuzzyJoinPassjoin(spark, dir).collect().map { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      val k = if (n1 < n2) (n1, n2) else (n2, n1)
      k -> ((r.getLong(2), r.getLong(3)))
    }.toMap
    graft.SharedFrames.releaseAll()
    assert(got.keySet == expected.keySet,
      s"missed: ${(expected.keySet -- got.keySet).take(5)}; " +
        s"extra: ${(got.keySet -- expected.keySet).take(5)}")
    expected.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
    assert(got.nonEmpty, "no fuzzy pairs at this SF — completeness vacuous")
  }

  test("fuzzy_join_passjoin: segment scheme is a disjoint cover at every length residue") {
    // the pigeonhole argument needs the tau+1 segments to tile the string
    // exactly; replay the (position, length) arithmetic for lengths
    // covering all residues mod tau+1
    val k = Dedup.FuzzyTau + 1
    (k to 40).foreach { len =>
      val base = len / k
      val rem = len % k
      val segs = (0 until k).map { i =>
        val li = base + (if (i >= k - rem) 1 else 0)
        val sp = 1 + base * i + math.max(0, i - (k - rem))
        (sp, li)
      }
      assert(segs.head._1 == 1)
      segs.sliding(2).foreach { case Seq((p1, l1), (p2, _)) =>
        assert(p2 == p1 + l1, s"gap/overlap at len $len")
      }
      val (lp, ll) = segs.last
      assert(lp + ll - 1 == len, s"segments don't reach the end at len $len")
      assert(segs.forall(_._2 >= 1), s"empty segment at len $len")
    }
  }
}
