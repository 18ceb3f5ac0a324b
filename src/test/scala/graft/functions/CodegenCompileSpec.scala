package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Forces Janino compilation of every native expression's generated code —
  * Spark's whole-stage codegen swallows compile failures and silently falls
  * back to interpretation, so without this test a broken static call (e.g.
  * a companion `eval` that gets no static forwarder because the case class
  * inherits a member of that name) costs performance invisibly. */
class CodegenCompileSpec extends AnyFunSuite {

  test("rolling_hash generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      RollingHash(BoundReference(0, StringType, nullable = true))))
    val row = proj(InternalRow(UTF8String.fromString("key agg row")))
    assert(row.getLong(0) == RollingHash.eval("key agg row"))
  }

  test("minhash_sig generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      MinHashSig(BoundReference(0, StringType, nullable = true), 8)))
    val row = proj(InternalRow(UTF8String.fromString("abcdefgh")))
    val got = row.getArray(0)
    val want = MinHashSig.eval("abcdefgh", 8)
    assert((0 until 8).forall(i => got.getLong(i) == want.getLong(i)))
  }

  test("simhash64 generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      SimHash64(BoundReference(0, StringType, nullable = true))))
    val row = proj(InternalRow(UTF8String.fromString("the quick brown fox")))
    assert(row.getLong(0) == SimHash64.eval("the quick brown fox"))
  }

  test("vec_dot generated code compiles and evaluates") {
    val at = ArrayType(DoubleType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      VecDot(BoundReference(0, at, nullable = true),
        BoundReference(1, at, nullable = true))))
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    val row = proj(InternalRow(a, b))
    assert(row.getDouble(0) == 32.0)
  }

  test("sig_agree generated code compiles and evaluates") {
    val at = ArrayType(LongType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      SigAgree(BoundReference(0, at, nullable = true),
        BoundReference(1, at, nullable = true))))
    val a = ArrayData.toArrayData(Array(1L, 2L, 3L, 4L))
    val b = ArrayData.toArrayData(Array(1L, 9L, 3L, 4L))
    val row = proj(InternalRow(a, b))
    assert(row.getInt(0) == 3)
  }

  test("gram_hashes generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      GramHashes(BoundReference(0, StringType, nullable = true), 5)))
    val s = "the quick brown fox"
    val row = proj(InternalRow(UTF8String.fromString(s)))
    val got = row.getArray(0)
    val want = GramHashes.eval(s, 5)
    assert(got.numElements() == s.length - 4)
    assert((0 until got.numElements()).forall(i =>
      got.getLong(i) == want.getLong(i)))
  }

  test("gram_hashes: rolling update equals direct per-window hashing; short strings empty") {
    // the rolling recurrence (subtract leading char · B^(n-1), append
    // trailing) must agree with hashing each window from scratch — i.e.
    // gram_hashes(s, n)(i) == gram_hashes(s.substring(i, i+n), n)(0)
    val s = "abcdefghé世xyz0123 with spaces\tand-tab"
    for (n <- Seq(1, 3, 7, 20)) {
      val all = GramHashes.eval(s, n)
      (0 to s.length - n).foreach { i =>
        val solo = GramHashes.eval(s.substring(i, i + n), n)
        assert(all.getLong(i) == solo.getLong(0),
          s"window $i of n=$n diverges from direct hash")
      }
    }
    assert(GramHashes.eval("abc", 4).numElements() == 0,
      "short string must yield NO gram hashes (no sentinel window)")
  }

  test("gram_pack_set generated code compiles; packing is injective, sorted, distinct") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      GramPackSet(BoundReference(0, StringType, nullable = true), 3)))
    val s = "abcabcd"
    val row = proj(InternalRow(UTF8String.fromString(s)))
    val got = row.getArray(0)
    // driver replay: distinct sorted packed code-point triples
    val want = s.sliding(3).map(g =>
      g.codePoints().toArray.foldLeft(0L)((p, c) => (p << 21) | c))
      .toSeq.distinct.sorted
    assert((0 until got.numElements()).map(got.getLong) == want)
    // distinct grams pack to distinct longs even when char sums collide
    // ("ac" vs "bb" style aliasing a weaker packing could produce)
    val a = GramPackSet.eval("ac", 2)
    val b = GramPackSet.eval("bb", 2)
    assert(a.getLong(0) != b.getLong(0), "packing must be injective")
    assert(GramPackSet.eval("ab", 3).numElements() == 0,
      "short string must yield an empty set")
  }

  test("sorted_intersect_count generated code compiles; counts exact set intersection") {
    val at = ArrayType(LongType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      SortedIntersectCount(BoundReference(0, at, nullable = true),
        BoundReference(1, at, nullable = true))))
    val a = ArrayData.toArrayData(Array(1L, 3L, 5L, 9L))
    val b = ArrayData.toArrayData(Array(2L, 3L, 5L, 10L, 11L))
    assert(proj(InternalRow(a, b)).getLong(0) == 2L)
    assert(proj(InternalRow(a, ArrayData.toArrayData(Array.emptyLongArray)))
      .getLong(0) == 0L)
  }

  test("salt_counter generated code compiles; deals (partition + i) mod n") {
    val proj = GenerateUnsafeProjection.generate(Seq(SaltCounter(4)))
    proj.initialize(3) // partition 3 of 4 salts → starts the cycle at 3
    val got = (0 until 6).map(_ => proj(InternalRow.empty).getLong(0))
    assert(got == Seq(3L, 0L, 1L, 2L, 3L, 0L), s"unexpected deal: $got")
  }

  test("nfc_normalize generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(Seq(
      NfcNormalize(BoundReference(0, StringType, nullable = true))))
    val row = proj(InternalRow(UTF8String.fromString("café")))
    assert(row.getUTF8String(0).toString == "café")
  }
}
