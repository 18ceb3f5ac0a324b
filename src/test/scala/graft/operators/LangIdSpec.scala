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

  test("lang_id_trained rejects astral-plane text loudly (BMP-only domain)") {
    import spark.implicits._
    // one held-out doc with a supplementary-plane character: UTF-16
    // trigram windows would silently diverge from the oracle's codepoint
    // windows, so the operator must raise, not mispredict
    val astral = syntheticDocs(8, 8).union(
      Seq((TextAnalysis.LidTrainCap + 9999L, "ok text 𝕏 more", "aa"))
        .toDF("doc_id", "text", "lang"))
    val e = intercept[Exception] {
      TextAnalysis.langIdTrainedFrom(astral).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-BMP character")),
      s"wrong failure: ${e.getMessage}")
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
