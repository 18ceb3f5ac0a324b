package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content pins for [[Dedup.dupSpansSuffix]] beyond its oracle row. The
  * oracle replays the SAME md5-alphabet construction, so these prove the
  * SEMANTICS independently:
  *
  *  - the replay sorts suffixes by NATURAL token order (a different
  *    alphabet than the engine's md5 order) and computes each position's
  *    maximal match length from its own suffix array — span equality
  *    proves ML is alphabet-independent, i.e. the engine really computes
  *    "longest substring starting here that occurs elsewhere";
  *  - coverage ⊇ the gram-seeded [[Dedup.dupSpans]] islands (the
  *    no-seed-floor claim): every duplicated 8-gram position carries
  *    ML ≥ 8, and islands merge hits ≤ 8 apart, so each island sits
  *    inside one suffix span.
  */
class SuffixDedupSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  private def tokenized(): Map[Long, Array[String]] =
    graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  /** Brute-force ML per position: natural-lex suffix sort, adjacent LCP,
    * ML = max of the two neighbours' LCPs. */
  private def bruteSpans(docs: Map[Long, Array[String]],
      minLen: Int): Set[(Long, Long, Long)] = {
    val sufs = docs.toSeq.flatMap { case (d, toks) =>
      toks.indices.map(i => (d, i))
    }.toArray
    implicit val ord: Ordering[(Long, Int)] = new Ordering[(Long, Int)] {
      def compare(a: (Long, Int), b: (Long, Int)): Int = {
        val (ta, tb) = (docs(a._1), docs(b._1))
        var (i, j) = (a._2, b._2)
        while (i < ta.length && j < tb.length) {
          val c = ta(i).compareTo(tb(j))
          if (c != 0) return c
          i += 1; j += 1
        }
        (ta.length - a._2).compareTo(tb.length - b._2)
      }
    }
    val sa = sufs.sorted
    def lcp(a: (Long, Int), b: (Long, Int)): Int = {
      val (ta, tb) = (docs(a._1), docs(b._1))
      var (i, j, n) = (a._2, b._2, 0)
      while (i < ta.length && j < tb.length && ta(i) == tb(j)) {
        i += 1; j += 1; n += 1
      }
      n
    }
    val adj = sa.indices.drop(1).map(t => lcp(sa(t - 1), sa(t)))
    val ml = scala.collection.mutable.Map[(Long, Int), Int]()
    sa.indices.foreach { t =>
      val left = if (t > 0) adj(t - 1) else 0
      val right = if (t < sa.length - 1) adj(t) else 0
      ml(sa(t)) = math.max(left, right)
    }
    // interval union per doc over ML >= minLen
    docs.keys.toSeq.sorted.flatMap { d =>
      val iv = docs(d).indices
        .filter(i => ml((d, i)) >= minLen)
        .map(i => (i, i + ml((d, i)) - 1))
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      iv.foreach { case (s, e) =>
        if (out.nonEmpty && s <= out.last._2 + 1) {
          val (ps, pe) = out.last
          out(out.length - 1) = (ps, math.max(pe, e))
        } else out += ((s, e))
      }
      out.map { case (s, e) => (d, s.toLong, e.toLong) }
    }.toSet
  }

  test("dup_spans_suffix: spans equal the natural-alphabet suffix-array replay exactly") {
    val got = Dedup.dupSpansSuffix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = bruteSpans(tokenized(), Dedup.DupSpanSuffixMinLen)
    val missing = want.diff(got)
    val extra = got.diff(want)
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(5)} extra=${extra.take(5)}")
    assert(got.nonEmpty, "no spans at all — vacuous corpus")
  }

  test("dup_spans_suffix: coverage is a superset of every gram-seeded dup_spans island") {
    val sfx = Dedup.dupSpansSuffix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val islands = Dedup.dupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.SharedFrames.releaseAll()
    islands.foreach { case (d, s, e) =>
      val host = sfx.getOrElse(d, Array.empty)
        .find { case (_, ss, se) => ss <= s && e <= se }
      assert(host.isDefined,
        s"island ($d, $s, $e) not contained in any suffix span")
    }
    // and strictly more coverage somewhere: a sub-8-token repeat only the
    // no-floor pass can see
    val islandCov = islands.map { case (d, s, e) => (d, e - s + 1) }
    val sfxCov = sfx.values.flatten.map { case (d, s, e) => (d, e - s + 1) }
    assert(sfxCov.map(_._2).sum > islandCov.map(_._2).sum,
      "suffix pass found nothing beyond the 8-gram floor — floor not lifted")
  }
}
