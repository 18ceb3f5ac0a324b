package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** rrf_fusion properties beyond the DuckDB equality gate: an independent
  * driver replay of both rankings (strict-fold cosine, distinct-token
  * overlap) and the fused score, plus list-size bounds. */
class RrfFusionSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def fold(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0d
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  test("rrf_fusion: driver replay of both rank lists and the fused scores") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val qid = emb.map(_._1).min
    val qv = emb.find(_._1 == qid).get._2
    val sem = emb.filter(_._1 != qid)
      .map { case (id, ev) =>
        id -> fold(ev, qv) / (math.sqrt(fold(ev, ev)) * math.sqrt(fold(qv, qv)))
      }
      .sortBy { case (id, c) => (-c, id) }.take(Similarity.RrfN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val qTok = docs.find(_._1 == qid).get._2.split(" ").filter(_.nonEmpty).toSet
    val lex = docs.filter(_._1 != qid)
      .map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet.count(qTok).toLong
      }
      .filter(_._2 > 0)
      .sortBy { case (id, ov) => (-ov, id) }.take(Similarity.RrfN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    val got = Similarity.rrfFusion(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == (sem.keySet ++ lex.keySet))
    got.foreach { case (id, (lr, sr, score)) =>
      assert(lr == lex.getOrElse(id, -1L), s"doc $id lex_rank")
      assert(sr == sem.getOrElse(id, -1L), s"doc $id sem_rank")
      val exp = lex.get(id).map(r => 1.0d / (Similarity.RrfC + r)).getOrElse(0.0d) +
        sem.get(id).map(r => 1.0d / (Similarity.RrfC + r)).getOrElse(0.0d)
      assert(score == exp, s"doc $id fused score $score != $exp")
    }
    // fusion is meaningful: some doc appears in BOTH lists, some in one
    assert(got.values.exists { case (l, s, _) => l > 0 && s > 0 } ||
      got.size == sem.size + lex.size)
    assert(got.size <= 2 * Similarity.RrfN, "lists not bounded by RrfN")
  }
}
