package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unigram-LM trainer properties beyond the DuckDB equality gate: a FULL
  * independent driver replay (words → candidates → integer log2 costs →
  * direct Viterbi DP → usage → election) compared row-exactly, plus the
  * claim the DP shape cannot itself certify: BRUTE-FORCE optimality —
  * words are ≤ 8 chars, so every segmentation (≤ 2^7 compositions) is
  * enumerable and the Viterbi cost must equal the exhaustive minimum. */
class UnigramLmSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  // the operator's Q8 integer log2, re-implemented from its definition
  private def ilog2(x: Long): Long = {
    var v = x; var s = 0L; var p = 1L
    Seq(32, 16, 8, 4, 2, 1).foreach { k =>
      val tw = 1L << k
      if (v >= tw) { v /= tw; s += k; p *= tw }
    }
    var m = if (p > (1L << 20)) x / (p / (1L << 20)) else (x * (1L << 20)) / p
    var f = 0L
    (1 to 8).foreach { _ =>
      var m2 = (m * m) >> 20
      val b = if (m2 >= (1L << 21)) 1L else 0L
      f = f * 2 + b
      if (b == 1L) m2 /= 2
      m = m2
    }
    s * 256 + f
  }

  test("unigram_lm_vocab: exact driver replay of the whole training; Viterbi cost is brute-force optimal") {
    val out = UnigramLm.unigramLmVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.SharedFrames.releaseAll()
    assert(out.nonEmpty)

    // words from the raw documents, independently
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.split(" ", -1))
      .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

    // candidate counts with positional multiplicity
    val cand = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      for (j <- 0 until w.length;
           l <- 1 to math.min(UnigramLm.MaxPieceLen, w.length - j))
        cand.updateWith(w.substring(j, j + l)) {
          p => Some(p.getOrElse(0L) + c)
        }
    }
    val singles = cand.filter(_._1.length == 1)
    val multis = cand.toSeq
      .filter(e => e._1.length > 1 && e._2 >= UnigramLm.MinCandCnt)
      .sortBy(e => (-e._2, e._1)).take(UnigramLm.CandCap)
    val v0 = (singles.toSeq ++ multis).toMap
    val t = v0.values.sum
    val lt = ilog2(t)
    val cost = v0.map { case (p, c) => p -> (lt - ilog2(c)) }

    // direct Viterbi (NOT the relaxation formulation): dp + smallest-parent tie
    def segment(w: String): Seq[String] = {
      val n = w.length
      val dp = Array.fill(n + 1)(Long.MaxValue / 2)
      val par = Array.fill(n + 1)(-1)
      dp(0) = 0
      for (i <- 1 to n;
           j <- math.max(0, i - UnigramLm.MaxPieceLen) until i) {
        cost.get(w.substring(j, i)).foreach { c =>
          val v = dp(j) + c
          if (v < dp(i) || (v == dp(i) && j < par(i))) { dp(i) = v; par(i) = j }
        }
      }
      // brute-force optimality: enumerate ALL compositions
      def allCosts(pos: Int): Seq[Long] =
        if (pos == n) Seq(0L)
        else (pos + 1 to math.min(n, pos + UnigramLm.MaxPieceLen)).flatMap {
          e => cost.get(w.substring(pos, e)).toSeq.flatMap {
            c => allCosts(e).map(_ + c)
          }
        }
      assert(dp(n) == allCosts(0).min,
        s"word '$w': Viterbi cost ${dp(n)} != exhaustive min")
      var pieces = List.empty[String]
      var pos = n
      while (pos > 0) { pieces = w.substring(par(pos), pos) :: pieces; pos = par(pos) }
      assert(pieces.mkString == w, s"segmentation of '$w' does not rebuild it")
      pieces
    }
    val used = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      segment(w).foreach { p =>
        used.updateWith(p)(u => Some(u.getOrElse(0L) + c))
      }
    }

    // election: top-K by (used DESC, piece) ∪ singles, final ordering
    val fin = v0.keys.toSeq.map { p =>
      (p, v0(p), cost(p), used.getOrElse(p, 0L))
    }
    val topk = fin.sortBy(e => (-e._4, e._1)).take(UnigramLm.VocabK)
    val expected = (topk ++ fin.filter(_._1.length == 1)).distinct
      .sortBy(e => (-e._4, e._1))
    assert(out.toSeq == expected,
      s"operator output diverges from the replay\n${out.toSeq.diff(expected)}")

    // the trainer actually learned: some multi-char piece is used, some
    // candidate went unused, and at least one word splits into >1 piece
    assert(expected.exists(e => e._1.length > 1 && e._4 > 0))
    assert(expected.exists(_._4 == 0L))
    assert(words.keys.exists(w => segment(w).length > 1))

    // ---- the train→apply pass (unigram_encode) ----
    val enc = UnigramLm.unigramEncode(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.SharedFrames.releaseAll()

    // second Viterbi restricted to the ELECTED vocabulary
    val electedCost = expected.map(e => e._1 -> e._3).toMap
    def segment2(w: String): Seq[String] = {
      val n = w.length
      val dp = Array.fill(n + 1)(Long.MaxValue / 2)
      val par = Array.fill(n + 1)(-1)
      dp(0) = 0
      for (i <- 1 to n;
           j <- math.max(0, i - UnigramLm.MaxPieceLen) until i) {
        electedCost.get(w.substring(j, i)).foreach { c =>
          val v = dp(j) + c
          if (v < dp(i) || (v == dp(i) && j < par(i))) { dp(i) = v; par(i) = j }
        }
      }
      var pieces = List.empty[String]
      var pos = n
      while (pos > 0) { pieces = w.substring(par(pos), pos) :: pieces; pos = par(pos) }
      pieces
    }
    val perWord = words.keys.map(w => w -> segment2(w).length).toMap

    // PRUNING BITES: some word re-segments into MORE pieces than training
    assert(words.keys.exists(w => segment2(w).length > segment(w).length),
      "no word affected by vocabulary pruning — the apply pass is vacuous")

    // per-doc rollup replay, exact
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
        .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen)
      if (ws.isEmpty) assert(!enc.contains(id))
      else {
        val (nw, np, nc, ratio) = enc(id)
        assert(nw == ws.length && nc == ws.map(_.length).sum)
        val expNp = ws.map(perWord(_).toLong).sum
        assert(np == expNp, s"doc $id: n_pieces $np != replay $expNp")
        assert(ratio == nc.toDouble / np.toDouble)
      }
    }
  }
}
