package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property sweep for the bounded top-k merge: against arbitrary entry
  * multisets and arbitrary partitionings, the aggregator must equal the
  * sort-take-k reference, stay bounded at k, and merge associatively —
  * the algebra partial aggregation relies on (Catalyst may combine
  * partials in any tree shape and any order). */
class TopKAggPropertiesSpec extends AnyFunSuite {

  def forAllSeeded[A](gen: Gen[A], runs: Int = 120)(body: A => Unit): Unit =
    (0 until runs).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i"))
      try body(a)
      catch { case e: Throwable => fail(s"seed $i: ${e.getMessage}", e) }
    }

  // small value domain on purpose: collisions exercise the id tie-break
  private val entriesGen: Gen[(Int, List[TopKAgg.Entry], Int)] = for {
    k <- Gen.choose(1, 6)
    n <- Gen.choose(0, 40)
    vs <- Gen.listOfN(n, Gen.choose(0, 8))
    cut <- Gen.choose(0, n)
  } yield (k, vs.zipWithIndex.map { case (v, i) =>
    TopKAgg.Entry(i.toLong, v.toDouble) }, cut)

  private def reference(k: Int, es: List[TopKAgg.Entry]): List[TopKAgg.Entry] =
    es.sortBy(e => (-e.v, e.id)).take(k)

  test("fold ≡ sort-take-k; buffer never exceeds k; split-merge ≡ whole") {
    forAllSeeded(entriesGen) { case (k, es, cut) =>
      val agg = TopKAgg.of(k)
      val folded = es.foldLeft(agg.zero)(agg.reduce)
      assert(folded == reference(k, es), s"k=$k fold diverges")
      assert(folded.size <= k)
      // arbitrary two-way partitioning merges to the same result
      val (a, b) = es.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == reference(k, es), s"k=$k split at $cut diverges")
    }
  }

  test("merge is associative and commutative on arbitrary partials") {
    forAllSeeded(entriesGen) { case (k, es, cut) =>
      val agg = TopKAgg.of(k)
      val third = es.grouped(math.max(1, es.size / 3 + 1)).toList
        .padTo(3, Nil).take(3)
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val List(x, y, z) = third
      assert(agg.merge(agg.merge(x, y), z) == agg.merge(x, agg.merge(y, z)),
        s"k=$k not associative")
      assert(agg.merge(x, y) == agg.merge(y, x), s"k=$k not commutative")
      assert(agg.merge(x, agg.zero) == x, s"k=$k zero not identity")
      val _ = cut
    }
  }
}
