package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tools.ScaleProbe

/** Pins the invariants each ScaleProbe mode's probe interpretation rests
  * on (BASELINE.md heavy-tail recipes): `dup` preserves each replica's
  * internal duplication structure while replicas never duplicate each
  * other; `down` additionally keeps the incremental faces' DELTA
  * (doc_id ≥ IncrementalCut) exactly the source's; `nodup` destroys
  * every cross-document token overlap corpus-wide. A wrong mode here
  * silently invalidates a recorded scaling claim, not a query result —
  * which is why it gets its own spec rather than riding the gate. */
class ScaleProbeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // two docs sharing a 4-token run (cross-doc duplication), one doc
  // straddling the IncrementalCut boundary, a token containing the
  // remap delimiter, and a double space (empty token)
  private val cut = Dedup.IncrementalCut
  private def src = Seq(
    (0L, "a b c d x"),
    (1L, "a b c d y  z"),
    (2L, "p 9§q r"),
    (cut, "a b c d w")
  ).toDF("doc_id", "text")

  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  test("dup: Nx rows (N=3 here), per-replica duplication preserved, zero cross-replica token overlap") {
    val out = ScaleProbe.replicate(src, 3, "dup")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(out.size == src.count() * 3)
    val byReplica = out.groupBy { case (id, _) =>
      math.floorDiv(id, ScaleProbe.Stride)
    }
    assert(byReplica.keySet == Set(0L, 1L, 2L))
    // replica k's texts are the source's with every nonempty token
    // prefixed k§ — duplication structure inside a replica is intact
    for ((k, docs) <- byReplica) {
      val back = docs.map { case (id, t) =>
        (id - k * ScaleProbe.Stride,
          toks(t).map(x => if (x.isEmpty) x else {
            assert(x.startsWith(s"$k§"), s"token $x lacks prefix $k§")
            x.drop(s"$k§".length)
          }).mkString(" "))
      }.toSet
      assert(back == src.as[(Long, String)].collect().toSet)
    }
    // replicas never duplicate each other: no token string appears in
    // two replicas (the injectivity ADVICE r14 asserted by construction)
    val tokenReplicas = out.flatMap { case (id, t) =>
      toks(t).filter(_.nonEmpty)
        .map(x => (x, math.floorDiv(id, ScaleProbe.Stride)))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(tokenReplicas.values.forall(_ == 1))
  }

  test("down: replicas sit below the cut; the delta is exactly the source's") {
    val out = ScaleProbe.replicate(src, 3, "down")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(out.size == src.count() * 3)
    val delta = out.filter(_._1 >= cut)
    // only replica 0 (untouched ids) can reach the cut
    assert(delta.map(_._1).toSet == Set(cut))
    assert(out.map(_._1).distinct.size == out.size)
    // and replica k > 0 ids are strictly negative (below any source id)
    assert(out.map(_._1).count(_ < 0) == 2 * src.count())
  }

  test("nodup: no nonempty token is shared by two documents") {
    val out = ScaleProbe.replicate(src, 2, "nodup")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val owners = out.flatMap { case (id, t) =>
      toks(t).filter(_.nonEmpty).distinct.map(x => (x, id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(owners.nonEmpty && owners.values.forall(_ == 1))
    // lengths (token counts, empties included) are preserved — the
    // compute-floor comparison rests on identical per-doc shapes
    val srcLens = src.as[(Long, String)].collect()
      .map { case (id, t) => id -> toks(t).size }.toMap
    out.foreach { case (id, t) =>
      val sid = ((id % ScaleProbe.Stride) + ScaleProbe.Stride) % ScaleProbe.Stride
      assert(toks(t).size == srcLens(sid))
    }
  }

  test("chardup: token lengths preserved, per-replica rename consistent, replicas disjoint") {
    val out = ScaleProbe.replicate(src, 2, "chardup")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val srcMap = src.as[(Long, String)].collect().toMap
    // shape: every token keeps its exact length (empties included), so
    // char-shingle statistics are not inflated by a shared prefix
    out.foreach { case (id, t) =>
      val sid = ((id % ScaleProbe.Stride) + ScaleProbe.Stride) % ScaleProbe.Stride
      val (a, b) = (toks(srcMap(sid)), toks(t))
      assert(a.map(_.length) == b.map(_.length),
        s"doc $id token lengths changed: $a -> $b")
    }
    // consistency: the same source token maps to ONE image within a
    // replica (duplication structure preserved), and replicas' token
    // sets are disjoint
    val pairs = out.flatMap { case (id, t) =>
      val k = math.floorDiv(id, ScaleProbe.Stride)
      val sid = ((id % ScaleProbe.Stride) + ScaleProbe.Stride) % ScaleProbe.Stride
      toks(srcMap(sid)).zip(toks(t)).filter(_._1.nonEmpty)
        .map { case (s, o) => ((k, s), o) }
    }
    pairs.groupBy(_._1).foreach { case (key, vs) =>
      assert(vs.map(_._2).distinct.size == 1, s"inconsistent rename for $key")
    }
    val byReplica = pairs.groupBy(_._1._1).view.mapValues(_.map(_._2).toSet)
    assert(byReplica(0L).intersect(byReplica(1L)).isEmpty,
      "replica token images overlap")
    // and the injectivity measurement the builder asserts
    assert(ScaleProbe.distinctTokens(
      ScaleProbe.replicate(src, 2, "chardup")) ==
      2 * ScaleProbe.distinctTokens(src))
  }

  test("a source id at the stride fails loudly instead of aliasing") {
    val bad = Seq((ScaleProbe.Stride, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ScaleProbe.replicate(bad, 2, "dup")
    }
    assert(e.getMessage.contains("alias"))
  }

  // a tiny embedding corpus with a PLANTED near-dup pair (0 ≈ 1) and an
  // orthogonal-ish third vector — the structure the embed mode must
  // carry into every replica
  private def srcEmb = Seq(
    (0L, Array(1.0f, 0.0f, 0.25f, 0.0f), 7),
    (1L, Array(0.9f, 0.1f, 0.25f, 0.0f), 8),
    (2L, Array(0.0f, 1.0f, 0.0f, -0.5f), 9)
  ).toDF("vec_id", "embedding", "label")

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  test("embed: Nx rows, replica 0 bit-identical, within-replica geometry preserved, labels carried") {
    val out = ScaleProbe.replicateEmbeddings(srcEmb, 3)
      .as[(Long, Array[Float], Int)].collect().toSeq
    assert(out.size == 9)
    val src = srcEmb.as[(Long, Array[Float], Int)].collect()
      .map(r => r._1 -> r).toMap
    val byReplica = out.groupBy(r => math.floorDiv(r._1, ScaleProbe.Stride))
    assert(byReplica.keySet == Set(0L, 1L, 2L))
    for ((k, vecs) <- byReplica; (id, ev, label) <- vecs) {
      val (sid, sev, slabel) = src(id - k * ScaleProbe.Stride)
      assert(label == slabel, s"label not carried for $id")
      // the signed permutation moves float BITS, never values: the
      // image's |coordinates| are a permutation of the source's
      assert(ev.map(math.abs).sorted.toSeq == sev.map(math.abs).sorted.toSeq,
        s"replica $k is not a signed permutation of source $sid")
      if (k == 0L) assert(ev.toSeq == sev.toSeq, "replica 0 must be identity")
    }
    // within-replica cosine structure: the planted near-dup pair and the
    // orthogonal-ish pair reproduce in EVERY replica (up to summation
    // reassociation)
    for ((k, vecs) <- byReplica) {
      val m = vecs.map(r => (r._1 - k * ScaleProbe.Stride) -> r._2.toSeq).toMap
      assert(math.abs(cos(m(0L), m(1L)) - cos(src(0L)._2.toSeq, src(1L)._2.toSeq)) < 1e-12)
      assert(math.abs(cos(m(0L), m(2L)) - cos(src(0L)._2.toSeq, src(2L)._2.toSeq)) < 1e-12)
    }
    // replicas differ from each other (the transform is non-trivial for
    // k >= 1), so cross-replica pairs are NOT planted duplicates
    assert(byReplica(1L).map(r => (r._1 % ScaleProbe.Stride, r._2.toSeq)).toSet !=
      byReplica(0L).map(r => (r._1, r._2.toSeq)).toSet)
    // determinism: the probe corpus is reproducible run-to-run
    val again = ScaleProbe.replicateEmbeddings(srcEmb, 3)
      .as[(Long, Array[Float], Int)].collect().toSeq
    assert(again.map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1) ==
      out.map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1))
  }

  test("full-mode contract: dup-docs and embed replications keep ids 1:1-aligned") {
    // the `full` probe mode writes documents (dup) and embeddings (embed)
    // with the same k·Stride offsets — given a source whose doc_ids and
    // vec_ids align 1:1 (the corpus contract), every replica's ids must
    // align too, so composite pipelines see vectors for EVERY scaled doc
    val srcDocs = Seq((0L, "a b"), (1L, "c d"), (2L, "e f"))
      .toDF("doc_id", "text")
    val srcVecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val docIds = ScaleProbe.replicate(srcDocs, 3, "dup")
      .select("doc_id").as[Long].collect().toSet
    val vecIds = ScaleProbe.replicateEmbeddings(srcVecs, 3)
      .select("vec_id").as[Long].collect().toSet
    assert(docIds.size == 9 && docIds == vecIds,
      s"aligned-stride contract broken: ${docIds.diff(vecIds)} / ${vecIds.diff(docIds)}")
  }

  test("embed: ragged dims and stride-breaking ids fail loudly") {
    val ragged = Seq((0L, Array(1.0f, 0.0f), 1), (1L, Array(1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(intercept[IllegalArgumentException] {
      ScaleProbe.replicateEmbeddings(ragged, 2)
    }.getMessage.contains("ragged"))
    val big = Seq((ScaleProbe.Stride, Array(1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(intercept[IllegalArgumentException] {
      ScaleProbe.replicateEmbeddings(big, 2)
    }.getMessage.contains("alias"))
  }
}
