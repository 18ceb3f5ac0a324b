package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Full brute-force replay of the suffix-automaton maximal-repeat
  * extraction: occurrence counting straight from the DEFINITION (occurs
  * ≥ 2 times; every one-token extension occurs strictly fewer times), so
  * the automaton's equivalence-class shortcuts are checked against first
  * principles. */
class IntradocRepeatsSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  /** O(n³) maximal repeats by definition. */
  private def brute(ws: Array[String]): Set[(Long, Long, Long)] = {
    val n = ws.length
    val occ = scala.collection.mutable.HashMap[Seq[String], List[Int]]()
    for (i <- 0 until n; l <- 1 to n - i)
      occ(ws.slice(i, i + l).toSeq) =
        i :: occ.getOrElse(ws.slice(i, i + l).toSeq, Nil)
    occ.iterator.collect {
      case (s, ps0) if ps0.size >= 2 && s.length >= Dedup.IntraRepMinLen =>
        val ps = ps0
        val followers = ps.flatMap(p =>
          if (p + s.length < n) Some(ws(p + s.length)) else None)
        val preds = ps.flatMap(p => if (p > 0) Some(ws(p - 1)) else None)
        val rightMax =
          followers.groupBy(identity).values.forall(_.size < ps.size)
        val leftMax = preds.groupBy(identity).values.forall(_.size < ps.size)
        if (rightMax && leftMax)
          Some((ps.min.toLong, s.length.toLong, ps.size.toLong))
        else None
    }.flatten.toSet
  }

  test("constructed docs: automaton equals the definition on known repeats, overlaps included") {
    val cases = Seq(
      "x a b c a b c y".split(" "), // one clean repeat: "a b c"
      "a a a a a".split(" "),       // overlapping runs: "a a a" AND "a a a a"
      "p q r p q r p q r".split(" "), // triple occurrence
      "u v w".split(" "),           // no repeat at all
      "m n m n o m n o".split(" ")) // nested maximality
    cases.foreach { ws =>
      val got = Dedup.maximalRepeats(ws)
        .map { case (s, l, o) => (s, l, o) }.toSet
      assert(got == brute(ws),
        s"doc '${ws.mkString(" ")}': $got vs ${brute(ws)}")
    }
    // the clean case, explicitly: "a b c" at token 1, twice
    assert(Dedup.maximalRepeats("x a b c a b c y".split(" ")) ==
      Seq((1L, 3L, 2L)))
  }

  test("corpus slice: automaton equals the brute-force definition doc-for-doc; registered query consistent") {
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      .filter(_._2.length <= 120) // O(n³) replay bound
    assert(docs.length >= 50, s"replay slice too small: ${docs.length}")
    docs.foreach { case (id, ws) =>
      val got = Dedup.maximalRepeats(ws).toSet
      assert(got == brute(ws), s"doc $id diverges from the definition")
    }
    // the registered query's rows for the slice agree with the direct call
    val sliceIds = docs.map(_._1).toSet
    val q = Dedup.intradocRepeats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    q.filter(t => sliceIds(t._1)).foreach { case (id, st, ln, occ, txt) =>
      val ws = docs.find(_._1 == id).get._2
      assert(ws.slice(st.toInt, st.toInt + ln.toInt).mkString(" ") == txt,
        s"doc $id span text mismatch")
      assert(Dedup.maximalRepeats(ws).contains((st, ln, occ)))
    }
  }
}
