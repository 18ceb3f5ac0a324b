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
    * The salt must NOT be a function of row content (a hash of the row
    * sends byte-identical duplicates of the hot key to ONE salt bucket,
    * defeating the whole point on duplicate-heavy skew). Instead each input
    * partition deals salts round-robin: `monotonically_increasing_id` is
    * partitionId·2³³ + a per-partition counter, so `mod salts` cycles
    * 0,1,2,… within every partition — identical rows land in different
    * buckets. Any assignment in [0, n) is correct (the small side is
    * replicated for all n salts), so task-retry nondeterminism is safe —
    * PROVIDED `big`'s partitions recompute identically (a stable scan, or
    * a checkpointed/materialized input). If `big` sits downstream of a
    * shuffle or an AQE-coalesced exchange, a fetch-failure retry can
    * regenerate different partition contents for map outputs that were
    * already consumed, and rows re-salted differently would be duplicated
    * or dropped by the join. CONTRACT: call saltedJoin on scan-rooted (or
    * persisted) inputs; materialize first otherwise. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
