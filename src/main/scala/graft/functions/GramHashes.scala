package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of every n-character gram of a string, computed in ONE
  * rolling pass — the hashed-probe primitive for benchmark decontamination
  * (ref contract: [[graft.operators.Dedup.decontaminate]]).
  *
  * The SQL formulation (`transform(sequence(...), i -> substring(text, i,
  * n))`) allocates one n-char UTF8String per position — ~2n bytes of copy
  * plus GC pressure per gram, dominating the decontamination scan. This
  * expression rolls a polynomial hash across the char sequence (remove
  * leading char, append trailing — O(1) per position after the first
  * window) and finalizes each window with a splitmix64 avalanche, so the
  * whole gram set costs O(len) longs with zero string allocation.
  *
  * Both sides of the probe (eval set and corpus) must use THIS function —
  * the contract is hash-to-hash equality of the same polynomial, not
  * compatibility with any SQL hash. Grams are keyed by UTF-16 units;
  * strings shorter than n yield an EMPTY array (no degenerate sentinel
  * windows), mirroring the oracle's empty `range(1, length-n+1)`.
  */
case class GramHashes(child: Expression, n: Int,
    base: Long = GramHashes.B) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType && n > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_hashes needs STRING and n>0, got ${child.dataType}, n=$n")

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.eval(input.asInstanceOf[UTF8String].toString, n, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.compute($c.toString(), $n, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)

  override def prettyName: String = "gram_hashes"
}

object GramHashes {

  private[functions] final val B = 0x100000001b3L // FNV prime as the polynomial base

  /** Second, independent polynomial base (odd, golden-ratio constant) for
    * the paired-hash probe: two rolling polynomials over DIFFERENT bases
    * are independent in the fingerprinting sense — a gram pair colliding
    * under both is a ~2^-128 event, vs the structured mod-2^64 cancellation
    * a single polynomial admits. The finalizer alone cannot buy this: two
    * hashes differing only in the avalanche share every raw-polynomial
    * collision. */
  private[functions] final val B2 = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer: decorrelates consecutive windows (a raw rolling
    * polynomial of overlapping windows is highly correlated). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static-forwarder-friendly alias for generated code (see RollingHash —
    * Janino cannot resolve the inherited `eval` on the case class). */
  def compute(s: String, n: Int, base: Long): ArrayData = eval(s, n, base)

  def eval(s: String, n: Int, base: Long = B): ArrayData = {
    if (s.length < n) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L // base^(n-1), the outgoing-char weight
    var i = 0
    while (i < n - 1) { pow *= base; i += 1 }
    val out = new Array[Long](s.length - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * base + s.charAt(i); i += 1 }
    out(0) = mix(h)
    i = 1
    while (i <= s.length - n) {
      h = (h - s.charAt(i - 1) * pow) * base + s.charAt(i + n - 1)
      out(i) = mix(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  def gram_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(c), n))

  /** The independent-second-hash twin of [[gram_hashes]] (base [[B2]]):
    * position-aligned with it, so `arrays_zip` of the two arrays yields a
    * 128-bit fingerprint per gram. */
  def gram_hashes_alt(c: Column, n: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(c), n, B2))
}
