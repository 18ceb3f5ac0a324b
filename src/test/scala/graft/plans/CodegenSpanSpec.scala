package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Asserts the native expressions actually LIVE INSIDE whole-stage-codegen
  * spans in the real registered queries' physical plans (`*(N)`-prefixed
  * operators). CodegenCompileSpec proves the generated code compiles;
  * this proves Catalyst places the expressions into codegen'd stages
  * rather than falling back to interpreted Project/Filter nodes — a
  * regression either way is silent and costs a constant factor on every
  * row at 100 TB. */
class CodegenSpanSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  /** EVERY plan line mentioning `needle` must belong to a codegen'd span
    * (carry the `*(stage)` marker) — not just Project/Filter lines: a
    * pushed join condition or Generate evaluates the expression in THAT
    * operator, which is exactly the per-row hot path the assertion is
    * for. (FileScan lines are excluded: their DataFilters field is
    * metadata echoing a filter that EXECUTES in the codegen'd Filter
    * above the scan — e.g. a pushed isnotnull(simhash64(text)) join-key
    * filter — not a per-row evaluation site.) */
  private def assertInCodegenSpan(plan: String, needle: String): Unit = {
    val lines = plan.linesIterator.filter(_.contains(needle))
      .filterNot(_.contains("FileScan")).toList
    assert(lines.nonEmpty, s"no operator line mentions $needle:\n$plan")
    lines.foreach(l => assert(l.contains("*("),
      s"$needle evaluated OUTSIDE whole-stage codegen:\n$l"))
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    aqeFinalPlan(df)

  test("rolling_hash / nfc_normalize run inside whole-stage codegen (doc_fingerprint)") {
    val plan = finalPlan(graft.operators.TextAnalysis.docFingerprint(spark, dir))
    assertInCodegenSpan(plan, "rolling_hash")
  }

  test("minhash_sig and sig_agree run inside whole-stage codegen (dedup_minhash_lsh)") {
    val plan = finalPlan(graft.operators.Dedup.dedupMinhashLsh(spark, dir))
    assertInCodegenSpan(plan, "minhash_sig")
    assertInCodegenSpan(plan, "sig_agree")
  }

  test("simhash64 runs inside whole-stage codegen (dedup_simhash)") {
    val plan = finalPlan(graft.operators.Dedup.dedupSimhash(spark, dir))
    assertInCodegenSpan(plan, "simhash64")
  }

  test("vec_dot runs inside whole-stage codegen (ann_cosine_topk)") {
    val plan = finalPlan(graft.operators.Similarity.annBruteForce(spark, dir))
    assertInCodegenSpan(plan, "vec_dot")
  }

  test("gram_pack_set and sorted_intersect_count run inside whole-stage codegen (dedup_ngram_jaccard)") {
    val plan = finalPlan(graft.operators.Dedup.dedupNgramJaccard(spark, dir))
    assertInCodegenSpan(plan, "gram_pack_set")
    assertInCodegenSpan(plan, "sorted_intersect_count")
  }
}
