package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.RollingHash

/** Engine extension point (SparkSessionExtensions): registers the library's
  * native Catalyst expressions into the SQL function registry so
  * `spark.sql("SELECT rolling_hash(text) ...")` works, matching the
  * DataFrame API (`RollingHash.rolling_hash`).
  *
  * Activate with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (The reference's engine has no extension mechanism beyond its UDF table;
  * this is the Catalyst-native registration path per SURVEY §7.3.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
  }
}

object GraftExtensions {
  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => RollingHash(children.head))

  /** Idempotent registration on an existing session (used by tests and by
    * callers that did not pass extensions at build time). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      rollingHashDescriptor._1, rollingHashDescriptor._2,
      rollingHashDescriptor._3)
}
