package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The SORTED DISTINCT set of a string's n-grams, each gram PACKED
  * injectively into one long (n ≤ 3 code points × 21 bits — Unicode code
  * points are < 2²¹, so packing is exact set membership, NOT a hash; two
  * packed longs are equal iff the grams are equal, so set operations on
  * the longs are set operations on the grams, with zero collision caveat).
  *
  * This is the exact-Jaccard verification primitive's input shape: the SQL
  * formulation explodes one row per (doc, gram) and self-joins on the gram
  * — Σ df(g)² join rows, tens of millions on a 200-doc slice because the
  * trigram alphabet is small and ubiquitous grams pair every doc with
  * every doc. One packed-set row per doc instead feeds the bounded
  * θ-join + [[SortedIntersectCount]] merge, which is |slice|²/2 narrow
  * rows and O(|a|+|b|) primitive compares per pair.
  *
  * Grams are keyed by CODE POINTS (what both Spark's `substring` and
  * DuckDB's `text[i:j]` count), so the packed set is exactly the set the
  * SQL formulation compares; strings shorter than n yield an EMPTY array.
  */
case class GramPackSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType && n > 0 && n <= 3)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_pack_set needs STRING and 0 < n <= 3 (21-bit code points " +
          s"must fit one long), got ${child.dataType}, n=$n")

  override protected def nullSafeEval(input: Any): Any =
    GramPackSet.eval(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramPackSet.compute($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): GramPackSet =
    copy(child = newChild)

  override def prettyName: String = "gram_pack_set"
}

object GramPackSet {

  /** Static-forwarder-friendly alias for generated code (see RollingHash). */
  def compute(s: String, n: Int): ArrayData = eval(s, n)

  def eval(s: String, n: Int): ArrayData = {
    val cps = s.codePoints().toArray
    if (cps.length < n)
      return new GenericArrayData(Array.emptyLongArray)
    val all = new Array[Long](cps.length - n + 1)
    var i = 0
    while (i <= cps.length - n) {
      var p = 0L
      var j = 0
      while (j < n) { p = (p << 21) | cps(i + j); j += 1 }
      all(i) = p
      i += 1
    }
    java.util.Arrays.sort(all)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < all.length) {
      if (all(i) != all(w - 1)) { all(w) = all(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(all, w))
  }

  def gram_pack_set(c: Column, n: Int): Column =
    ColumnBridge.column(GramPackSet(ColumnBridge.expression(c), n))
}

/** |a ∩ b| for two SORTED DISTINCT `array<long>` columns — one two-pointer
  * merge, O(|a|+|b|) primitive long compares, no per-call hash set and no
  * per-element object allocation (the cost that makes `size(
  * array_intersect(...))` on string arrays slower than the exploded join
  * it replaces). Inputs MUST be sorted distinct ([[GramPackSet]] output
  * is); the count is then exact set-intersection cardinality. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<long>, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.eval(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Static-forwarder-friendly alias for generated code (see RollingHash). */
  def compute(a: ArrayData, b: ArrayData): Long = eval(a, b)

  def eval(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
