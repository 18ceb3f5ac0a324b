package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content pins for [[TextAnalysis.langIdTrained]] beyond its oracle row.
  * The corpus's `lang` labels are synthetic (one shared vocabulary across
  * languages), so corpus accuracy is chance by construction — the MODEL
  * pin therefore runs on a constructed corpus whose four "languages"
  * (one multibyte CJK) have genuinely distinct character distributions: the identical
  * selection + training + scoring pipeline must recover them on held-out
  * docs. The real-corpus pins check the pipeline's structural contract.
  */
class LangIdSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  /** Four artificial languages over disjoint alphabets — one of them
    * multibyte CJK — deterministic "texts" (LCG over each language's
    * word list). */
  private def syntheticDocs(nTrainPerLang: Int, nHoldPerLang: Int) = {
    import spark.implicits._
    val words = Map(
      "aa" -> Vector("aba", "bab", "aab", "bba", "abab"),
      "bb" -> Vector("cdc", "dcd", "ccd", "ddc", "cdcd"),
      "cc" -> Vector("efe", "fef", "eef", "ffe", "efef"),
      // multibyte codepoints: the trigram hash must see BMP CJK chars
      // exactly like the corpus's zh docs (codepoint-array path)
      "zz" -> Vector("天地人", "地人天", "人天地", "天天地", "地地人"))
    val langs = words.keys.toVector.sorted
    def text(lang: String, seed: Long): String = {
      val ws = words(lang)
      var s = seed
      (1 to 30).map { _ =>
        s = (s * 1103515245L + 12345L) % 2147483648L
        ws((s % ws.length).toInt)
      }.mkString(" ")
    }
    val train = for {
      (l, li) <- langs.zipWithIndex
      i <- 0 until nTrainPerLang
    } yield (li * nTrainPerLang + i.toLong, text(l, li * 1000L + i), l)
    val hold = for {
      (l, li) <- langs.zipWithIndex
      i <- 0 until nHoldPerLang
    } yield (TextAnalysis.LidTrainCap + li * nHoldPerLang + i,
      text(l, 777L + li * 1000L + i), l)
    (train ++ hold).toDF("doc_id", "text", "lang")
  }

  test("trained lang-id recovers genuinely distinct languages on held-out docs") {
    val docs = syntheticDocs(40, 40)
    val out = TextAnalysis.langIdTrainedFrom(docs).collect()
    val hold = out.filter(_.getLong(0) >= TextAnalysis.LidTrainCap)
    assert(hold.length == 160)
    val acc = hold.count(_.getBoolean(4)).toDouble / hold.length
    assert(acc >= 0.95, s"held-out accuracy $acc — model not learning")
    // all four classes must actually be predicted (not one-class collapse)
    assert(hold.map(_.getString(2)).toSet.size == 4)
  }

  test("lang_id_trained scores astral-plane text (full-Unicode domain, r14 task 3)") {
    import spark.implicits._
    // a fifth language whose words are SUPPLEMENTARY-plane characters
    // (emoji + mathematical alphanumerics): a real crawl has these on
    // page one, and the r13 BMP raise refused the whole document. Both
    // faces now window true codepoints (Spark split('') never splits a
    // surrogate pair; ascii() returns the full codepoint — probe-verified
    // against DuckDB's substring/ascii), so the identical train+score
    // pipeline must LEARN the astral language, not raise on it.
    val emojiWords = Vector("😀😃😄", "🚀🌕🚀", "𝕏𝕐𝕏", "🍎🍐🍎", "😀🚀𝕏")
    def etext(seed: Long): String = {
      var s = seed
      (1 to 30).map { _ =>
        s = (s * 1103515245L + 12345L) % 2147483648L
        emojiWords((s % emojiWords.length).toInt)
      }.mkString(" ")
    }
    val eTrain = (0 until 8).map(i => (100L + i, etext(5000L + i), "ee"))
    val eHold = (0 until 8).map(i =>
      (TextAnalysis.LidTrainCap + 500L + i, etext(7777L + i), "ee"))
    val docs = syntheticDocs(8, 8).union(
      (eTrain ++ eHold).toDF("doc_id", "text", "lang"))
    val out = TextAnalysis.langIdTrainedFrom(docs).collect()
    val eOut = out.filter(r => r.getLong(0) >= TextAnalysis.LidTrainCap + 500 &&
      r.getLong(0) < TextAnalysis.LidTrainCap + 500 + 8)
    assert(eOut.length == 8)
    val acc = eOut.count(_.getBoolean(4))
    assert(acc >= 7, s"astral-language held-out accuracy $acc/8 — " +
      s"preds=${eOut.map(r => r.getString(2)).mkString(",")}")
    // and the astral docs were really scored through features, not the
    // featureless prior fallback (fallback costs are one shared constant)
    assert(eOut.map(_.getLong(3)).distinct.length > 1,
      "astral docs all fell back to the prior — features not hashed")
  }

  test("unpaired surrogate halves are unrepresentable in the operator's domain (boundary pin)") {
    import spark.implicits._
    // Spark's string domain is UTF-8 (UTF8String): a lone surrogate half
    // cannot survive entry — the JVM encoder normalizes it to '?'. This
    // pin is what makes langIdTrained need NO invalid-Unicode guard (a
    // raise_error path for it was measured unreachable and removed): if
    // a Spark upgrade ever started passing raw surrogates through, this
    // test fails and the guard question reopens.
    val txt = "hello \uD83D world"
    val back = Seq((900L, txt)).toDF("doc_id", "text")
      .collect()(0).getString(1)
    assert(back == "hello ? world",
      s"boundary changed: ${back.toCharArray.map(c => f"${c.toInt}%04X").mkString(" ")}")
    // and such a document scores like any other instead of failing
    val docs = syntheticDocs(4, 0).union(
      Seq((900L, txt, "xx")).toDF("doc_id", "text", "lang"))
    val out = TextAnalysis.langIdTrainedFrom(docs).collect()
    assert(out.count(_.getLong(0) == 900L) == 1)
  }

  test("lang_id_trained on the corpus: one row per doc, non-negative NB costs, deterministic") {
    val rows = TextAnalysis.langIdTrained(spark, dir).collect()
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"negative NB cost: $r")
      assert(r.getBoolean(4) == (r.getString(1) == r.getString(2)))
    }
    // predictions span more than one language (the prior fallback alone
    // would collapse to one class)
    assert(rows.map(_.getString(2)).toSet.size > 1)
  }
}
