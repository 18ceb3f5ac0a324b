package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over the string's Unicode
  * code points, `acc = (acc * 31 + cp) mod 1e9+7`.
  *
  * A native Catalyst expression (with whole-stage codegen, not a Scala UDF)
  * per the custom-operator preference order — this is the engine's
  * "document fingerprinting (rolling hash)" primitive for the training-data
  * pipeline. The modulus keeps the accumulator < 2^30 so the fold is exact
  * in 64-bit arithmetic — which also makes it expressible in the DuckDB
  * oracle (`list_reduce` over `unicode()` code points) for cross-engine
  * verification.
  *
  * Reference analog: the ref has no scalar function library at all
  * (SURVEY §2.7) — row-level computation lived in map UDFs; this is the
  * Spark-first replacement: a codegen'd columnar function.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod = 1000000007L

  /** Static-forwarder-friendly alias: the companion's `eval` gets no
    * static forwarder (the case class inherits a member named `eval`), so
    * generated Java calls `compute` instead. */
  def compute(s: String): Long = eval(s)

  /** Exact fold over code points (not UTF-16 units — matches DuckDB's
    * `unicode()` on non-BMP input). */
  def eval(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
