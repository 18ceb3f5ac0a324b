package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-partition round-robin salt: row i of partition p evaluates to
  * `(p + i) mod salts` — the deterministic (partition, position) deal
  * [[graft.operators.ScaleLayout.saltedJoin]] needs, as a codegen'd
  * expression instead of a DataFrame→RDD→DataFrame round-trip (which
  * deserialized every row to `Row` objects and broke whole-stage codegen
  * around the scan; measured ~2× on the salted side).
  *
  * Modeled on Spark's own `MonotonicallyIncreasingID` (the same
  * partition-initialized mutable-counter shape): `Nondeterministic` so
  * the optimizer never moves or collapses it — the salt must be dealt
  * exactly where it is placed — while the VALUE is a pure function of
  * (partitionIndex, row position), so recomputing a partition replays
  * identical salts (determinism pinned in ScaleLayoutSpec). The `p +`
  * stagger keeps bucket 0 from over-filling when many small partitions
  * each start their cycle.
  */
case class SaltCounter(salts: Int) extends LeafExpression with Nondeterministic {
  require(salts > 0, "salt_counter needs salts > 0")

  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  @transient private var count: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    count = partitionIndex.toLong % salts

  override protected def evalInternal(input: InternalRow): Any = {
    val v = count % salts
    count += 1
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "saltCount")
    ctx.addPartitionInitializationStatement(
      s"$countTerm = ((long) partitionIndex) % ${salts}L;")
    ev.copy(
      code = code"""
        final long ${ev.value} = $countTerm % ${salts}L;
        $countTerm++;""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "salt_counter"
}

object SaltCounter {
  def salt_counter(salts: Int): Column = ColumnBridge.column(SaltCounter(salts))
}
