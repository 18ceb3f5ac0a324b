package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{GramPackSet, MinHashSig, NfcNormalize, RollingHash, SigAgree, SimHash64, SortedIntersectCount, VecDot}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def d(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  val descriptors: Seq[Descriptor] = Seq(
    d("rolling_hash", classOf[RollingHash], es => RollingHash(es.head)),
    d("nfc_normalize", classOf[NfcNormalize], es => NfcNormalize(es.head)),
    d("vec_dot", classOf[VecDot], es => VecDot(es(0), es(1))),
    d("sig_agree", classOf[SigAgree], es => SigAgree(es(0), es(1))),
    d("simhash64", classOf[SimHash64], es => SimHash64(es.head)),
    d("sorted_intersect_count", classOf[SortedIntersectCount],
      es => SortedIntersectCount(es(0), es(1))),
    d("gram_pack_set", classOf[GramPackSet], {
      case Seq(child, n) if n.foldable && (n.dataType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }) =>
        GramPackSet(child, n.eval().asInstanceOf[Number].intValue())
      case Seq(_, n) => throw new IllegalArgumentException(
        s"gram_pack_set(text, n): n must be an integer literal, got $n")
      case other => throw new IllegalArgumentException(
        s"gram_pack_set(text, n) expects 2 args, got ${other.size}")
    }),
    d("minhash_sig", classOf[MinHashSig], {
      case Seq(child, k) if k.foldable && (k.dataType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }) =>
        MinHashSig(child, k.eval().asInstanceOf[Number].intValue())
      case Seq(child) =>
        MinHashSig(child, graft.operators.Dedup.MinhashK)
      case Seq(_, k) => throw new IllegalArgumentException(
        s"minhash_sig(text, k): k must be an integer literal, got $k")
      case other => throw new IllegalArgumentException(
        s"minhash_sig(text[, k]) expects 1-2 args, got ${other.size}")
    }))

  /** Idempotent registration on an existing session (used by tests and by
    * callers that did not pass extensions at build time). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
