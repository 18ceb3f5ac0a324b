package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: K minimum hashes over the string's
  * character trigrams, computed in one traversal — no gram explode, no
  * shuffle, no 24-way aggregation.
  *
  * Per gram we take one 64-bit base hash (FNV-1a over the trigram's UTF-16
  * units) and derive the K permutations with a cheap avalanche mix of
  * (base, seed) — the standard one-hash minhash construction. Codegen emits
  * a call to the static [[MinHashSig.eval]], so the expression stays inside
  * whole-stage codegen like any built-in.
  *
  * This is the scale path for signature computation: at 100 TB the explode
  * formulation shuffles ~100× the corpus size in gram rows; this computes
  * signatures as a narrow projection on the scan.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType && k > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs STRING and k>0, got ${child.dataType}, k=$k")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.eval(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  /** splitmix64 finalizer — avalanche mix for deriving permutations. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static-forwarder-friendly alias for generated code (see RollingHash). */
  def compute(s: String, k: Int): ArrayData = eval(s, k)

  def eval(s: String, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    if (s.length < 3) {
      // degenerate doc: treat the whole string as its single shingle, so
      // two DIFFERENT short docs get different signatures (the sentinel
      // Long.MaxValue signature would make all of them mutual est=1.0
      // "duplicates")
      var base = 0xcbf29ce484222325L
      var j = 0
      while (j < s.length) { base ^= s.charAt(j); base *= 0x100000001b3L; j += 1 }
      var p = 0
      while (p < k) { mins(p) = mix(base + p * 0x9e3779b97f4a7c15L); p += 1 }
    } else {
      var i = 0
      while (i <= s.length - 3) {
        // FNV-1a base hash over the trigram's chars
        var base = 0xcbf29ce484222325L
        var j = i
        while (j < i + 3) {
          base ^= s.charAt(j)
          base *= 0x100000001b3L
          j += 1
        }
        var p = 0
        while (p < k) {
          val h = mix(base + p * 0x9e3779b97f4a7c15L)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
}
