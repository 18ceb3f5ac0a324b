package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here twice:
  * a Spark implementation in `queries` and (when SQL-expressible) a
  * DuckDB oracle in `oracleSql` with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "q5_multijoin" -> (Relational.q5Multijoin _),
    "window_running" -> (Relational.windowRunning _),
    "topk_orders" -> (Relational.topkOrders _),
    "set_ops" -> (Relational.setOps _),
    "distinct_agg" -> (Relational.distinctAgg _),
    "rollup_agg" -> (Relational.rollupAgg _),
    "events_sessionize" -> (Relational.eventsSessionize _),
  )

  /** DuckDB-runnable ANSI SQL per query key (same column names!). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_top_orders" -> Relational.q3TopOrdersSql,
    "q5_multijoin" -> Relational.q5MultijoinSql,
    "window_running" -> Relational.windowRunningSql,
    "topk_orders" -> Relational.topkOrdersSql,
    "set_ops" -> Relational.setOpsSql,
    "distinct_agg" -> Relational.distinctAggSql,
    "rollup_agg" -> Relational.rollupAggSql,
    "events_sessionize" -> Relational.eventsSessionizeSql,
  )
}
