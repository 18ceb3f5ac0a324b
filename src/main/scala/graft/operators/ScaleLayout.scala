package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB shape (builder brief:
  * "bucketing for co-located joins, salting for skew"):
  *
  *  - [[bucketize]]: persist a table bucketed+sorted by its join key. Two
  *    tables bucketed the same way join with NO Exchange on either side —
  *    the shuffle is paid once at write time and amortized over every
  *    subsequent join (verified by plan inspection in ScaleLayoutSpec).
  *  - [[saltedJoin]]: skew-safe equi-join — the big side gets a
  *    deterministic salt in [0, n), the small side is replicated n times,
  *    and the join key becomes (key, salt), splitting a hot key across n
  *    reducers. Result-identical to the plain join.
  *
  * (AQE's skew-join handles moderate skew automatically; explicit salting
  * is the tool for pathological single-key skew where even one split of
  * the hot partition is too large.)
  */
object ScaleLayout {

  /** Write `df` as a managed table bucketed (and sorted) by `keyCol` into
    * `numBuckets` buckets; returns the table handle. */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
      keyCol: String, numBuckets: Int): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Skew-safe inner equi-join of `big` (skewed) with `small` on `key`.
    * Salt on the big side is a deterministic hash of the whole row spread
    * over `salts` partitions per key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
