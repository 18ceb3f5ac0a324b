package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** dedup_prefix_filter properties beyond the DuckDB equality gate: a
  * driver brute-force replay (completeness + exact Jaccard values), and
  * the prefix scheme's pruning/completeness math replayed independently. */
class PrefixFilterSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  private def shingles(text: String): Set[String] =
    text.split(" ").filter(_.nonEmpty).sliding(Dedup.PfShingle)
      .filter(_.length == Dedup.PfShingle).map(_.mkString(" ")).toSet

  test("dedup_prefix_filter: brute-force replay — no pair lost, Jaccard values exact") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val tau = Dedup.PfTauNum.toDouble / Dedup.PfTauDen.toDouble
    val expected = (for {
      (d1, s1) <- docs; (d2, s2) <- docs if d1 < d2
      i = (s1 & s2).size
      j = i.toDouble / (s1.size + s2.size - i)
      if j >= tau
    } yield (d1, d2) -> j).toMap
    val got = Dedup.dedupPrefixFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.SharedFrames.releaseAll()
    assert(got.keySet == expected.keySet,
      s"missed: ${(expected.keySet -- got.keySet).take(5)}; " +
        s"extra: ${(got.keySet -- expected.keySet).take(5)}")
    expected.foreach { case (k, j) => assert(got(k) == j, s"pair $k jaccard") }
    assert(got.nonEmpty, "no pairs at this SF — completeness vacuous")
  }

  test("prefix scheme: candidates are a superset of true pairs AND a real pruning of the quadratic") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val dfc = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    // canonical order: (df asc, shingle asc) — any globally consistent
    // total order preserves completeness; df-ascending is the heuristic
    val prefixes = docs.map { case (id, s) =>
      val n = s.size
      val p = n - ((Dedup.PfTauNum * n + Dedup.PfTauDen - 1) /
        Dedup.PfTauDen).toInt + 1
      id -> s.toSeq.sortBy(x => (dfc(x), x)).take(p).toSet
    }.toMap
    val tau = Dedup.PfTauNum.toDouble / Dedup.PfTauDen.toDouble
    val sizes = docs.toMap.view.mapValues(_.size).toMap
    val cands = (for {
      (d1, p1) <- prefixes.toSeq; (d2, p2) <- prefixes.toSeq
      if d1 < d2 && (p1 & p2).nonEmpty &&
        Dedup.PfTauNum * sizes(d1) <= Dedup.PfTauDen * sizes(d2) &&
        Dedup.PfTauNum * sizes(d2) <= Dedup.PfTauDen * sizes(d1)
    } yield (d1, d2)).toSet
    val truePairs = (for {
      (d1, s1) <- docs; (d2, s2) <- docs if d1 < d2
      i = (s1 & s2).size
      if i.toDouble / (s1.size + s2.size - i) >= tau
    } yield (d1, d2)).toSet
    assert(truePairs.subsetOf(cands),
      s"prefix candidates MISSED true pairs: ${(truePairs -- cands).take(5)}")
    val all = docs.length.toLong * (docs.length - 1) / 2
    assert(cands.size < all / 3,
      s"prefix filter prunes nothing: ${cands.size} of $all pairs survive")
  }
}
