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

  /** Deterministic LCG token stream over a small vocabulary. */
  private def lcgTokens(seed: Long, n: Int): Array[String] = {
    var s = seed
    Array.fill(n) {
      s = (s * 1103515245L + 12345L) % 2147483648L
      "w" + (s % 50)
    }
  }

  /** Three synthetic documents the parquet corpus cannot express: two
    * long docs (400 and 380 tokens) sharing a 280-token run — a match
    * LONGER than the 255 tokens two radix-16 rounds represent, so the
    * measured-depth logic must rank at K = 3 — plus one doc with an
    * intra-document repeat (corpus-level semantics count it). */
  private def longDocs(): Map[Long, Array[String]] = {
    val block = lcgTokens(99, 280)
    val rep = lcgTokens(5, 12)
    Map(
      1L -> (lcgTokens(1, 60) ++ block ++ lcgTokens(2, 60)),
      2L -> (lcgTokens(3, 50) ++ block ++ lcgTokens(4, 50)),
      3L -> (lcgTokens(6, 20) ++ rep ++ lcgTokens(7, 9) ++ rep ++
        lcgTokens(8, 20)))
  }

  test("dup_spans_suffix: >256-token documents rank at the measured depth and match the replay") {
    import spark.implicits._
    val docs = longDocs()
    val df = docs.toSeq.sortBy(_._1)
      .map { case (d, toks) => (d, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Dedup.dupSpansSuffixFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.SharedFrames.releaseAll()
    val want = bruteSpans(docs, Dedup.DupSpanSuffixMinLen)
    assert(got == want,
      s"missing=${want.diff(got).take(5)} extra=${got.diff(want).take(5)}")
    // the pin is non-vacuous: some span must exceed the 255-token reach
    // of two radix-16 rounds (the old fixed-depth implementation
    // REJECTED this corpus outright)
    assert(got.exists { case (_, s, e) => e - s + 1 > 255 },
      "no span beyond 255 tokens — the depth pin is vacuous")
  }

  test("identical-tail pairs: the fused first descend level's past-end advances cap exactly") {
    import spark.implicits._
    // the SA-adjacency fusion carries level-(K−1) ranks with a −1
    // past-end sentinel instead of null, so a pair whose BOTH cursors
    // run past their documents' ends takes spurious −1 = −1 advances;
    // the remaining-length cap must truncate them to the true LCP. This
    // corpus makes such pairs certain: docs that END in shared runs of
    // every flavor — one doc's whole text a suffix of another's, equal
    // tails at different offsets, and a doc that IS its own tail twice.
    val docs: Map[Long, Array[String]] = Map(
      1L -> "p q r a b c d e".split(" "),     // tail "a b c d e"
      2L -> "a b c d e".split(" "),           // the whole doc IS that tail
      3L -> "x y a b c d e".split(" "),       // same tail, other offset
      4L -> "a b c d e a b c d e".split(" "), // self-adjacent tail
      5L -> "m n o p q".split(" "))           // background, no long match
    val df = docs.toSeq.sortBy(_._1)
      .map { case (d, t) => (d, t.mkString(" ")) }.toDF("doc_id", "text")
    val got = Dedup.dupSpansSuffixFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.SharedFrames.releaseAll()
    val want = bruteSpans(docs, Dedup.DupSpanSuffixMinLen)
    assert(got == want,
      s"missing=${want.diff(got).take(5)} extra=${got.diff(want).take(5)}")
    // non-vacuous: doc 2's whole text must be one exact span (any
    // over-advance that escaped the cap would inflate a span end)
    assert(got.contains((2L, 0L, 4L)), s"doc-2 whole-text span missing: $got")
  }

  test("dup_spans_suffix rejects a document past the 65 535-token ceiling loudly") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(65536)("a").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dupSpansSuffixFrom(spark, df)
    }
    assert(e.getMessage.contains("rank-depth ceiling"),
      s"wrong failure: ${e.getMessage}")
  }

  test("dup_spans_suffix_incremental equals the full rebuild restricted to delta docs") {
    val full = Dedup.dupSpansSuffix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 >= Dedup.IncrementalCut).toSet
    val inc = Dedup.dupSpansSuffixIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    graft.SharedFrames.releaseAll()
    assert(inc == full,
      s"missing=${full.diff(inc).take(5)} extra=${inc.diff(full).take(5)}")
    assert(inc.nonEmpty, "no delta spans at all — vacuous cadence pin")
  }

  test("dup_spans_suffix_incremental: delta cadence holds on a >256-token synthetic corpus") {
    import spark.implicits._
    // base = the long docs; delta = two docs past IncrementalCut, one
    // sharing a 60-token slice of the base block (cross-corpus match at
    // K = 3 depth), one sharing the intra-doc repeat
    val base = longDocs()
    val block = lcgTokens(99, 280)
    val rep = lcgTokens(5, 12)
    val docs = base ++ Map(
      (Dedup.IncrementalCut + 1) ->
        (lcgTokens(11, 30) ++ block.slice(100, 160) ++ lcgTokens(12, 30)),
      (Dedup.IncrementalCut + 2) ->
        (lcgTokens(13, 25) ++ rep ++ lcgTokens(14, 25)))
    val df = docs.toSeq.sortBy(_._1)
      .map { case (d, toks) => (d, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val full = Dedup.dupSpansSuffixFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 >= Dedup.IncrementalCut).toSet
    val inc = Dedup.dupSpansSuffixIncrementalFrom(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.SharedFrames.releaseAll()
    assert(inc == full,
      s"missing=${full.diff(inc).take(5)} extra=${inc.diff(full).take(5)}")
    // non-vacuous: the delta really matched base content
    assert(inc.exists { case (_, s, e) => e - s + 1 >= 50 },
      "no long cross-corpus delta span — depth pin vacuous")
  }

  test("dup_span_suffix_scrub: excises exactly the span tokens of every occurrence") {
    val spans = Dedup.dupSpansSuffix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val scrub = Dedup.dupSpanSuffixScrub(spark, dir).collect()
    graft.SharedFrames.releaseAll()
    val toks = tokenized()
    assert(scrub.length == toks.size, "one row per document")
    scrub.foreach { r =>
      val d = r.getLong(0)
      val (nb, na, nx, clean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      val orig = toks.getOrElse(d, Array.empty[String])
      val ds = spans.getOrElse(d, Array.empty)
      assert(nb == orig.length, s"doc $d n_before")
      assert(nx == ds.length, s"doc $d n_excised = span count")
      val excised = ds.flatMap { case (_, s, e) => s to e }.toSet
      val want = orig.indices.filterNot(i => excised(i.toInt)).map(orig)
      assert(na == want.length, s"doc $d n_after")
      assert(clean == want.mkString(" "), s"doc $d cleaned_text")
    }
    // non-vacuous: some doc actually lost tokens, some doc kept all
    assert(scrub.exists(r => r.getLong(3) > 0))
    assert(scrub.exists(r => r.getLong(3) == 0 &&
      r.getLong(1) == r.getLong(2)))
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
