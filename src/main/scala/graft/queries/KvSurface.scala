package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, dec, asDouble}
import graft.engine.{BuiltinFuncs, KV, KvStore, MapReduce}

/** SURVEY §2.1/§2.2 operator analogs expressed over the driver testdata, so
  * every reference client op has an oracle-checked distributed twin:
  *
  *  - KVG/GET  → pushed-down point lookup           (kv_get_point, get_profile)
  *  - KVA/ALL  → full-scan key projection           (kv_getall_keys, all_users)
  *  - KVI/REG  → insert-if-absent = anti-join       (reg_insert_if_absent)
  *  - auth gate → semi-join                         (auth_semijoin)
  *  - KVU fold → last-writer-wins per key           (kv_upsert_fold)
  *  - KVD fold → tombstone drop                     (kv_delete_fold)
  *  - KVT      → top-k by recency                   (mru_topk)
  *  - quotas   → sliding time-range window sum      (quota_window)
  *  - KMR      → the real engine MapReduce path     (mr_all_keys, mr_odd_key_vals)
  */
object KvSurface {

  /** KVG: point lookup by key with predicate pushdown; the key is resolved
    * by a broadcast scalar (min orderkey) so the plan stays fully
    * declarative (ref: do_with_readonly, p2/server/concurrenthashmap.h:178-192). */
  def kvGetPoint(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    val minKey = ord.agg(min(col("o_orderkey")).as("k"))
    ord.join(broadcast(minKey), col("o_orderkey") === col("k"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  val kvGetPointSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)""".stripMargin

  /** KVA: full-table key projection (ref: p4/server/my_storage.cc:425-464). */
  def kvGetallKeys(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(col("o_orderkey").as("key"))

  val kvGetallKeysSql: String = "SELECT o_orderkey AS key FROM orders"

  /** ALL: username projection (ref: p3/server/my_storage.cc:209-224). */
  def allUsers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_name").as("username"))

  val allUsersSql: String = "SELECT c_name AS username FROM customer"

  /** GET: any user's profile = point lookup + projection
    * (ref: p3/server/my_storage.cc:184-200). */
  def getProfile(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val minKey = cust.agg(min(col("c_custkey")).as("k"))
    cust.join(broadcast(minKey), col("c_custkey") === col("k"))
      .select(col("c_name"), col("c_mktsegment"), col("c_acctbal"))
  }

  val getProfileSql: String =
    """SELECT c_name, c_mktsegment, c_acctbal FROM customer
      |WHERE c_custkey = (SELECT min(c_custkey) FROM customer)""".stripMargin

  /** KVI/REG: insert-if-absent is an anti-join of candidate rows against
    * current keys (SURVEY §2.1 KVI → left_anti): orders with no lineitems
    * yet = "keys not present". */
  def regInsertIfAbsent(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"),
        "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))

  val regInsertIfAbsentSql: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin

  /** Auth gate before every KV op = semi-join of requests against the user
    * directory (ref: p4/server/my_storage.cc:182-183). */
  def authSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    t(spark, dir, "orders")
      .join(broadcast(building), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
  }

  val authSemijoinSql: String =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')""".stripMargin

  /** KVU fold: the op-log → current-table fold, last-writer-wins per key
    * with a deterministic (ts, event_id) total order (SURVEY §1.4 "mutable
    * point-updatable table"; events stand in for the redo log). */
  def kvUpsertFold(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
  }

  val kvUpsertFoldSql: String =
    """SELECT user_id, event_type AS last_type, value AS last_value
      |FROM (SELECT user_id, event_type, value,
      |        ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1""".stripMargin

  /** KVD fold: same fold with tombstones — users whose LAST op is an
    * 'error' event are dropped (tombstone drop semantics, SURVEY §2.1 KVD). */
  def kvDeleteFold(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("value").as("last_value"))
  }

  val kvDeleteFoldSql: String =
    """SELECT user_id, value AS last_value
      |FROM (SELECT user_id, event_type, value,
      |        ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  /** KVT: top-k keys by recency over the touch log (SURVEY §2.5). */
  def mruTopk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_touch"))
      .orderBy(col("last_touch").desc, col("user_id"))
      .limit(10)

  val mruTopkSql: String =
    """SELECT user_id, max(ts) AS last_touch FROM events
      |GROUP BY user_id ORDER BY last_touch DESC, user_id LIMIT 10""".stripMargin

  /** Quota check as analytics: per-user sliding 1-hour byte sum at every
    * event (SURVEY §2.4 → rangeBetween window over event time). */
  def quotaWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    t(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("win_sum", asDouble(sum(dec(col("value"))).over(w)))
      .select(col("user_id"), col("event_id"), col("ts"), col("win_sum"))
  }

  val quotaWindowSql: String =
    """SELECT user_id, event_id, ts,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS win_sum
      |FROM events""".stripMargin

  // ---- KMR through the real engine ----

  private def ordersAsKv(spark: SparkSession, dir: String): KvStore = {
    import spark.implicits._
    val kvDf = t(spark, dir, "orders")
      .select(concat(lit("k"), col("o_orderkey").cast("string")).as("key"),
        encode(col("o_custkey").cast("string"), "UTF-8").as("value"))
      .as[KV]
    val store = new KvStore(spark)
    store.ingest(kvDf)
    store
  }

  /** The KMR result is one contractual gathered blob (possibly MBs at
    * sf0.1); re-emitting it as a 1-row DataFrame through a LocalRelation
    * would serialize it INTO the task binary ("task of very large size"
    * warnings) — broadcast it instead, so the task ships only a handle.
    * Broadcasts are REUSED via a per-result cache (keyed by content
    * digest): repeated driver invocations of the same KMR query would
    * otherwise pin a fresh possibly-MB broadcast block on driver and
    * executors per call for the session lifetime. Destroying after
    * materialization isn't safe here — the returned DataFrame is lazy and
    * may be re-executed (the bench runs every query twice) — so entries
    * live until ENGINE SHUTDOWN / application end (SessionResources),
    * the reference's process-exit point: DataFrames handed out before a
    * BYE are dead with the server that produced them BY DESIGN; a fresh
    * invocation after shutdown simply re-broadcasts. */
  private val resultBroadcasts =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.broadcast.Broadcast[String]]()
  // apps whose releaseBroadcasts hook is already queued: one registration
  // per app, not one per KMR invocation (the cleanup queue would otherwise
  // grow unboundedly with call count over the session lifetime)
  private val gcHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def singleRowResult(spark: SparkSession, s: String): DataFrame = {
    import spark.implicits._
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // applicationId in the key: a cached broadcast from a stopped
    // SparkContext (tests build several sessions) must never be served.
    // Evict other applications' entries on the way in — their possibly-MB
    // broadcast values would otherwise pin heap for the JVM lifetime once
    // their context stops. (If two sessions were live at once this costs a
    // re-broadcast on alternation, never correctness.)
    val appId = spark.sparkContext.applicationId
    resultBroadcasts.keySet.removeIf(k => !k.startsWith(appId + ":"))
    // application-end GC: context stop (or an owning engine's BYE) destroys
    // this app's cached result broadcasts — possibly-MB blocks must not
    // outlive the session that built them. Hooked ONCE per app: the hook
    // sweeps the whole app-prefixed cache, so per-call re-registration
    // would only duplicate work in the cleanup queue. If a release already
    // drained the hook (owning-engine BYE mid-app), re-arm it so later
    // invocations' broadcasts still get swept at application end.
    if (gcHooked.add(appId))
      graft.SessionResources.onRelease(spark)(() =>
        { gcHooked.remove(appId); releaseBroadcasts(appId) })
    val bc = resultBroadcasts.computeIfAbsent(appId + ":" + digest,
      _ => spark.sparkContext.broadcast(s))
    spark.range(1).map(_ => bc.value).toDF("result")
  }

  /** Destroy and drop every cached KMR result broadcast of `appId`. */
  private def releaseBroadcasts(appId: String): Unit = {
    val it = resultBroadcasts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(appId + ":")) {
        try e.getValue.destroy() catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Live cached result broadcasts for an app (spec visibility). */
  private[graft] def resultBroadcastCount(appId: String): Int = {
    var n = 0
    resultBroadcasts.keySet.forEach(k => if (k.startsWith(appId + ":")) n += 1)
    n
  }

  /** KMR(all_keys) over the orders table loaded into the engine: distributed
    * map + gathered reduce (sorted flavor for oracle determinism). */
  def mrAllKeys(spark: SparkSession, dir: String): DataFrame = {
    val res = MapReduce.run(ordersAsKv(spark, dir).view,
      BuiltinFuncs.AllKeysSorted)
    require(res.succeeded, s"KMR failed: ${res.msg}")
    singleRowResult(spark, res.dataUtf8)
  }

  val mrAllKeysSql: String =
    """SELECT string_agg(k, chr(10) ORDER BY k) AS result
      |FROM (SELECT 'k' || CAST(o_orderkey AS VARCHAR) AS k FROM orders)""".stripMargin

  /** KMR(odd_key_vals): values of odd keys, duplicated twice each
    * (ref golden: p5/scripts/p5.py:79). Keys are 'k'||orderkey, values are
    * custkey strings; atoi(key[1:]) parity selects odd orderkeys. */
  def mrOddKeyVals(spark: SparkSession, dir: String): DataFrame = {
    val res = MapReduce.run(ordersAsKv(spark, dir).view,
      BuiltinFuncs.OddKeyValsSorted)
    require(res.succeeded, s"KMR failed: ${res.msg}")
    singleRowResult(spark, res.dataUtf8)
  }

  val mrOddKeyValsSql: String =
    """SELECT string_agg(vv, chr(10) ORDER BY vv) AS result
      |FROM (SELECT CAST(o_custkey AS VARCHAR) || CAST(o_custkey AS VARCHAR) AS vv
      |      FROM orders WHERE o_orderkey % 2 = 1)""".stripMargin
}
