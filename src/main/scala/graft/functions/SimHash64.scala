package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash over a string's character trigrams: per
  * trigram one FNV-1a base hash + splitmix avalanche, added as a ±1 vote
  * into 64 bit-position counters, assembled into the sketch sign bit by
  * sign bit — all in one traversal with two small stack arrays.
  *
  * Replaces the explode-tokens + 64× `sum(when(...))` aggregation
  * formulation, which shuffled one row PER TOKEN and aggregated a 64-column
  * vote matrix (the round-2 bench cost center: 3.7 s where this is a narrow
  * scan projection). At 100 TB the explode formulation shuffles ~100× the
  * corpus; this computes the sketch where the row is read, exactly like
  * [[MinHashSig]].
  *
  * Feature choice: character trigrams, not whitespace tokens — the same
  * shingle set the exact-verification primitive (`Dedup.dedupNgramJaccard`)
  * and [[MinHashSig]] use. SimHash approximates cosine similarity over the
  * feature multiset, so sketching the trigram multiset makes the hamming
  * distance commensurate with the trigram-Jaccard ground truth the recall
  * pins are measured against (token-feature sketches measured 0/1 recall of
  * j≥0.7 pairs at sf0.1; see PipelineOperatorsSpec for the per-SF floor).
  *
  * Codegen emits a call to the static [[SimHash64.compute]], so the
  * expression stays inside whole-stage codegen like any built-in.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** splitmix64 finalizer (same mix as [[MinHashSig]]) — FNV-1a alone has
    * weak high-bit avalanche, and simhash votes on EVERY bit. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over chars [from, until). */
  @inline private def fnv(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < until) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
    h
  }

  /** Static-forwarder-friendly alias for generated code (see RollingHash). */
  def compute(s: String): Long = eval(s)

  def eval(s: String): Long = {
    val votes = new Array[Int](64)
    if (s.length < 3) {
      // degenerate doc: the whole string is its single feature (mirrors
      // MinHashSig — a zero-vote sketch would make every short doc hamming-0
      // identical to every other short doc)
      vote(votes, mix(fnv(s, 0, s.length)))
    } else {
      var i = 0
      while (i <= s.length - 3) {
        vote(votes, mix(fnv(s, i, i + 3)))
        i += 1
      }
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= 1L << b
      b += 1
    }
    sketch
  }

  @inline private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
