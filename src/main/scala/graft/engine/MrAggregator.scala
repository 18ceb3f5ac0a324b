package graft.engine

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Catalyst-native execution of an associative reducer (SURVEY §7.3's
  * optional custom aggregate): wraps an [[AssociativeMapReduceFn]] as a
  * typed `Aggregator`, so the whole KMR runs as ONE Spark aggregation with
  * map-side partial reduction — no per-row gather, no driver list.
  *
  * This is the third execution tier for registered functions:
  *  1. `MapReduce.run`      — holistic, exact reference parity (driver gather);
  *  2. `MapReduce.runTree`  — associative, RDD treeReduce;
  *  3. `MrAggregator.column` — associative, Catalyst aggregate (partial agg
  *     in the same whole-stage pipeline as the scan; usable in groupBy too).
  */
object MrAggregator {

  def of(fn: AssociativeMapReduceFn): Aggregator[KV, Array[Byte], Array[Byte]] =
    new Aggregator[KV, Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = fn.zero
      def reduce(buf: Array[Byte], kv: KV): Array[Byte] =
        fn.combine(buf, fn.map(kv.key, kv.value))
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = fn.combine(a, b)
      def finish(buf: Array[Byte]): Array[Byte] = buf
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** As a TypedColumn: `kvDs.select(MrAggregator.column(fn))`. */
  def column(fn: AssociativeMapReduceFn): TypedColumn[KV, Array[Byte]] =
    of(fn).toColumn

  /** Run the full KMR as one Catalyst aggregation. */
  def run(kv: org.apache.spark.sql.Dataset[KV],
      fn: AssociativeMapReduceFn): Result =
    try Result(true, Codes.OK, kv.select(column(fn)).head())
    catch { case _: Throwable => Result(false, Codes.ERR_SERVER) }
}
