package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native agreement count over two `array<bigint>` MinHash signatures:
  * the number of positions where the arrays hold the same value.
  *
  * Exists because both alternatives fail at candidate-pair volume
  * (millions of rows in the LSH near-dup join):
  *  - `zip_with`/`filter`/`size` are HigherOrderFunctions — each row pays
  *    an interpreted per-element lambda outside codegen;
  *  - an unrolled `when(element_at(..)===element_at(..),1)` chain (K=24
  *    terms) inflates the generated method past Janino/JIT limits and
  *    de-optimizes the WHOLE stage, including the join it is inlined into.
  * A native expression is one codegen'd static-loop call per row.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sig_agree needs array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgree.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgree.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigAgree = copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agree"
}

object SigAgree {
  /** Static-forwarder-friendly alias for generated code (see RollingHash). */
  def compute(a: ArrayData, b: ArrayData): Int = eval(a, b)

  /** A null element agrees with nothing — getLong on a null slot would
    * read the zeroed storage and silently count null==0 / null==null as
    * matches (sig_agree is SQL-registered, so arbitrary arrays reach it,
    * not just MinHashSig outputs). */
  def eval(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def sig_agree(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgree(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
