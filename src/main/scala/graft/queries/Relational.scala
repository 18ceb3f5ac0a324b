package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, dec, asDouble}

/** Relational operator coverage per SURVEY.md §2.7: projections, filters,
  * joins (inner/semi/anti/broadcast), aggregations (incl. rollup, distinct),
  * window functions, sorts/limits/top-k, and set operations.
  *
  * Scale notes (100 TB design intent):
  *  - dimension tables (region/nation/customer/supplier/part at TPC-H ratios)
  *    are broadcast explicitly so fact-table joins never shuffle the fact side
  *    on a dimension key;
  *  - aggregations are expressed so Catalyst produces partial (map-side)
  *    aggregation before the exchange;
  *  - every filter/projection is declarative so it reaches the parquet scan
  *    (PushedFilters / ReadSchema pruning).
  */
object Relational {

  /** TPC-H Q1-style pricing summary (ref analog: user-defined aggregation
    * over the whole table, SURVEY §2.7 "aggregations"). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asDouble(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - dec(col("l_discount"))))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: 3-way join + agg + top-k (SURVEY §2.7 "joins",
    * "sorts/limits"). Customer is broadcast (dimension side). */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: 6-way join, dims broadcast (SURVEY §2.7 "joins"). */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - dec(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultijoinSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window functions: per-customer order sequence + running total
    * (SURVEY §2.7 "window functions"; MRU recency-rank is the ref's only
    * ranking construct). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).as("order_seq"),
        asDouble(sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))).as("running_spend"))
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Global top-k with deterministic tie-break (SURVEY §2.7 "sorts/limits"). */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Set operations (SURVEY §2.7 "set ops" — absent in ref, present here):
    * customers with both fulfilled and open orders / only-fulfilled. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    val f = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = f.intersect(o).withColumn("tag", lit("both"))
    val fOnly = f.except(o).withColumn("tag", lit("f_only"))
    both.union(fOnly).orderBy(col("tag"), col("o_custkey"))
  }

  val setOpsSql: String =
    """SELECT o_custkey, 'both' AS tag FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
      |   INTERSECT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |UNION ALL
      |SELECT o_custkey, 'f_only' AS tag FROM
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
      |   EXCEPT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      |ORDER BY tag, o_custkey""".stripMargin

  /** Exact distinct aggregation (SURVEY §2.7 "aggregations"). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val distinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP grouping-sets aggregation (SURVEY §2.7). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val rollupAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** CUBE over (lang, source) — the full grouping-sets lattice (rollup
    * covers the hierarchical prefix sets; cube adds the cross-marginals
    * a mixing dashboard reads: per-lang, per-source, and both). One
    * Expand + one hash aggregation — each input row fans out to its 4
    * grouping sets map-side, partials combine as usual. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  val cubeAggSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY CUBE (lang, source)
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — the non-hierarchical lattice subset that
    * neither rollup nor cube expresses: (status, priority), (priority)
    * and the grand total, deliberately SKIPPING the (status) marginal.
    * Same physical shape as cube: one Expand fans each row to its 3 sets
    * map-side, then one partial-combinable hash aggregation — no extra
    * shuffle vs a plain groupBy. The grouping() indicator columns
    * disambiguate "NULL because aggregated over" from NULL data. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq.empty[Column]),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n"),
        asDouble(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val groupingSetsAggSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())
      |ORDER BY g_status, g_priority, o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Navigation windows — lag / lead / ntile / first_value over the
    * per-customer order sequence (SURVEY §2.7 "window functions";
    * complements the running-sum frame of [[windowRunning]] with the
    * offset-navigation family). All five functions share ONE
    * customer-keyed sort, and customer partitions are bounded (a
    * customer's own orders), so no single-task global sort exists at any
    * scale; ntile is deterministic because (o_orderdate, o_orderkey) is a
    * total order within the partition. */
  def windowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("gap_days"),
        ntile(4).over(w).as("quartile"),
        first(col("o_orderkey")).over(w).as("first_order"))
  }

  val windowNavSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(DATE_DIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE),
      |    CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** EWMA frame width: weights 2^61 (current) down to 2^0 — 62 rows spans
    * the full ratio range a double can distinguish anyway (2^-62 relative
    * weight is far below 1 ulp of the running average). */
  final val EwmaWindow = 62

  /** Rows per EWMA bucket partition (must exceed [[EwmaWindow]] so a
    * frame never spans more than one bucket boundary). */
  final val EwmaBucket = 4096L

  /** Time-decayed moving average (EWMA, α = 1/2) of `value` per event
    * type — the classic monitoring/feature-engineering signal, computed
    * EXACTLY. The recursive definition `e_n = (e_{n-1} + x_n)/2` is a
    * sequential dependency; here it is re-expressed as the closed-form
    * weighted window `Σ x_{n-d}·2^(61-d) / Σ 2^(61-d)` over the last
    * [[EwmaWindow]] rows (the dropped tail is below double resolution —
    * see [[EwmaWindow]]). Numerator terms are DECIMAL(18,6)·2^k — exact,
    * order-independent — folded in DECIMAL(38,6); the denominator is the
    * closed form 2^62 − 2^(62−n) in BIGINT; the ONLY floating step is the
    * final one-op IEEE division, so the estimate itself replays
    * bit-identically in the oracle.
    *
    * Physical form: a `Window.partitionBy(event_type)` would put every
    * row of a type into ONE task (5 types ⇒ parallelism 5, a
    * single-task sort per type at any corpus size — the skewed-window
    * class this suite bans). Instead the per-type sequence position is
    * derived by the [[peakConcurrency]]/[[TextAnalysis.globalShuffle]]
    * two-phase rank decomposition — a DAY-partitioned `row_number`
    * (calendar-bounded partitions) plus per-type day offsets from a
    * bounded θ-join — then rows bucket by `seq div` [[EwmaBucket]], the
    * last [[EwmaWindow]]−1 rows of each bucket are ALSO tagged into the
    * next bucket (a 1.5% carry duplication), and the 62-row frame runs
    * inside (type, bucket) partitions: positions are dense, so every
    * own-row's frame is complete by construction and carry rows are
    * dropped after the window. Parallelism = types × buckets instead of
    * types; results are row-identical to the monolithic window (the
    * oracle below IS the monolithic formulation). */
  /** Events (value non-null) with their DENSE per-type sequence position
    * `seq` — the two-phase rank decomposition shared by [[ewmaDecay]] and
    * [[changepointCusum]] (one copy; a drifted duplicate would give the
    * sequential operators different orderings): a DAY-partitioned
    * row_number (calendar-bounded partitions) plus per-type day offsets
    * from a bounded θ-join, never a per-type monolithic window. Carries
    * (event_type, event_id, ts, value, day, seq). */
  private def eventSeq(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    // per-(type, day) row counts need no ordering — a plain aggregate
    val dayCounts = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    // earlier-day offsets as ONE running-sum window over the day-level
    // aggregate (partitions = days-per-type, calendar-bounded — never a
    // row-level window) instead of the r17 a.day > b.day θ-join, which
    // was O(days²) per type and cost a join + second aggregate (guide
    // §2.4: same exchange, fewer passes). Integer sums — identical
    // offsets.
    val offs = dayCounts
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("event_type"), col("day"), col("off"))
    ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("ts"), col("event_id"))).cast("long"))
      .join(broadcast(offs), Seq("event_type", "day"))
      .withColumn("seq", col("off") + col("rn"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("day"), col("seq"))
  }

  def ewmaDecay(spark: SparkSession, dir: String): DataFrame = {
    val carry = EwmaWindow - 1 // 61 preceding rows feed a frame
    // boundary rows are tagged into BOTH their own and the next bucket by
    // one conditional explode — no union, no second pass over the frame
    val seqd = eventSeq(spark, dir)
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("seq"),
        explode(expr(
          s"""CASE WHEN (seq - 1) % $EwmaBucket >= ${EwmaBucket - carry}
             | THEN array(
             |   struct((seq - 1) div $EwmaBucket AS bkt, true AS is_own),
             |   struct((seq - 1) div $EwmaBucket + 1 AS bkt,
             |          false AS is_own))
             | ELSE array(
             |   struct((seq - 1) div $EwmaBucket AS bkt, true AS is_own))
             | END""".stripMargin)).as("tag"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("seq"), col("tag.bkt").as("bkt"), col("tag.is_own").as("is_own"))
    val w = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("seq")).rowsBetween(-carry, 0)
    seqd
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("is_own"), collect_list(dec(col("value"))).over(w).as("vs"))
      .filter(col("is_own"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        size(col("vs")).as("n_win"),
        expr("""aggregate(
            transform(vs, (x, i) -> x * shiftleft(cast(1 as bigint), 62 - size(vs) + i)),
            cast(0 as decimal(38,6)), (acc, x) -> acc + x)""").as("num"),
        expr("shiftleft(cast(1 as bigint), 62)" +
          " - shiftleft(cast(1 as bigint), 62 - size(vs))").as("den"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("n_win").cast("int").as("n_win"),
        (col("num").cast("string").cast("double") /
          asDouble(col("den"))).as("ewma"))
  }

  val ewmaDecaySql: String =
    """WITH e AS (
      |  SELECT event_type, event_id, ts, value,
      |    list(CAST(value AS DECIMAL(18,6))) OVER (
      |      PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN 61 PRECEDING AND CURRENT ROW) AS vs
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, event_id, ts, value,
      |  CAST(len(vs) AS INT) AS n_win,
      |  CAST(CAST(list_reduce(list_transform(vs, (x, i) ->
      |         x * (CAST(1 AS BIGINT) << (61 - len(vs) + i))),
      |         (a, b) -> a + b) AS VARCHAR) AS DOUBLE)
      |  / CAST((CAST(1 AS BIGINT) << 62)
      |         - (CAST(1 AS BIGINT) << (62 - len(vs))) AS DOUBLE) AS ewma
      |FROM e""".stripMargin

  /** CUSUM alarm threshold, in raw value units (the statistic is scaled
    * by n_type·10⁶ — see [[changepointCusum]]): S/(n·10⁶) > λ alarms.
    * 500 sits below every type's measured maximal excursion at every SF
    * (553–949 units at sf0.001, 1400–3100 at sf0.01) while the statistic
    * starts at 0, so BOTH verdict classes populate everywhere. */
  final val CusumLambda = 500L

  /** CHANGEPOINT DETECTION — one-sided CUSUM (Page 1954) per event type,
    * the mean-shift member of the monitoring family ([[eventsAnomaly]] =
    * point outliers, [[graft.operators.CorpusOps.driftWindows]] =
    * distribution drift): the classic recursion S_n = max(0, S_{n−1} +
    * (x_n − μ)) flags a sustained upward shift when S_n exceeds λ.
    *
    * The recursion LOOKS sequential, but has the closed form
    * S_n = P_n − min(0, min_{j≤n} P_j) over prefix sums P of the
    * deviations — a cumulative sum and a running minimum, BOTH
    * decomposable by the bucketed two-phase machinery ([[peakConcurrency]]
    * / [[graft.operators.TextAnalysis.packShards]]): within-day cumsum
    * and running min (day-bounded windows over the shared [[eventSeq]]
    * positions), day-level sum/min totals combined through a bounded
    * θ-join (offP = Σ earlier-day sums; minBefore = min over earlier
    * days of offP′ + dayMin′), then one broadcast join back. No
    * per-type monolithic window at any corpus size.
    *
    * Arithmetic is EXACT end to end: deviations are n_t·xq_i − Σxq
    * (micro-quantized values, the [[groupedRegression]] discipline,
    * scaled by n_t to avoid the rational mean), all sums carried in
    * DECIMAL(38,0), the verdict an integer comparison against
    * λ·n_t·10⁶ — so the oracle (the monolithic two-window formulation)
    * replays every statistic bit-for-bit and equality proves the
    * decomposition ≡ the sequential definition. */
  def changepointCusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val base = eventSeq(spark, dir)
      .withColumn("xq",
        (dec(col("value")).cast(DecimalType(28, 6)) * lit(1000000))
          .cast("long"))
    val totals = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xq").cast(d38)).as("sq"))
    val wDay = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("seq")).rowsBetween(Window.unboundedPreceding, 0)
    // consumed by BOTH the day-level rollup and the final statistic join —
    // shared, or the windowed deviation frame computes twice
    val local = graft.SharedFrames.shared(
      base.join(broadcast(totals), Seq("event_type"))
        .withColumn("d",
          (col("n").cast(d38) * col("xq").cast(d38) - col("sq")).cast(d38))
        .withColumn("ld", sum(col("d")).over(wDay))
        .withColumn("lm", min(col("ld")).over(wDay)))
    val dayAgg = local.groupBy(col("event_type"), col("day"))
      .agg(sum(col("d")).as("day_sum"), min(col("ld")).as("day_min"))
    // earlier-day prefix sum and running min as TWO windows over the
    // day-level aggregate (partitions = days-per-type, calendar-bounded)
    // instead of the r17 pair of b.day < a.day θ-joins + re-joins —
    // O(days²) per type and four extra exchanges for the same exact
    // DECIMAL(38,0) values (sums/mins are order-independent). An empty
    // preceding frame yields NULL exactly as the left-outer θ-join did.
    val wPrevDays = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)
    val dayTable = dayAgg
      .withColumn("off_p",
        coalesce(sum(col("day_sum")).over(wPrevDays), lit(0L).cast(d38))
          .cast(d38))
      .withColumn("min_before",
        min(col("off_p") + col("day_min")).over(wPrevDays))
      .select(col("event_type"), col("day"), col("off_p"),
        col("min_before"))
    local.join(broadcast(dayTable), Seq("event_type", "day"))
      .withColumn("pn", (col("off_p") + col("ld")).cast(d38))
      .withColumn("rm",
        when(col("min_before").isNull, col("off_p") + col("lm"))
          .otherwise(least(col("min_before"), col("off_p") + col("lm")))
          .cast(d38))
      .withColumn("s_stat",
        (col("pn") - least(lit(0L).cast(d38), col("rm"))).cast(d38))
      // s_stat reported as a canonical decimal STRING (exceeds int64 at
      // 100 TB; DECIMAL(38,0) outputs hash engine-dependently in the gate)
      .select(col("event_type"), col("event_id"), col("ts"), col("seq"),
        col("s_stat").cast("string").as("s_stat"),
        (col("s_stat") >
          (col("n").cast(d38) * lit(CusumLambda * 1000000L).cast(d38))
            .cast(d38)).as("alarm"))
      .orderBy(col("event_type"), col("seq"))
  }

  /** Oracle: the monolithic two-window formulation of the same closed
    * form — prefix sum, running min, S = P − min(0, runmin) — with the
    * identical DECIMAL(38,0) arithmetic. */
  val changepointCusumSql: String =
    s"""WITH e AS (
       |  SELECT event_type, event_id, ts,
       |    CAST(CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,6))
       |         * 1000000 AS BIGINT) AS xq
       |  FROM events WHERE value IS NOT NULL),
       |t AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(xq AS DECIMAL(38,0))) AS sq
       |  FROM e GROUP BY 1),
       |d AS (
       |  SELECT e.*, t.n,
       |    CAST(CAST(t.n AS DECIMAL(38,0)) * CAST(e.xq AS DECIMAL(38,0))
       |         - t.sq AS DECIMAL(38,0)) AS dd
       |  FROM e JOIN t USING (event_type)),
       |p1 AS (
       |  SELECT *, SUM(dd) OVER w AS pn,
       |    CAST(row_number() OVER (PARTITION BY event_type
       |      ORDER BY ts, event_id) AS BIGINT) AS seq
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |p2 AS (
       |  SELECT *, MIN(pn) OVER w AS rm
       |  FROM p1
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, event_id, ts, seq,
       |  CAST(CAST(pn - LEAST(CAST(0 AS DECIMAL(38,0)), rm) AS DECIMAL(38,0))
       |    AS VARCHAR) AS s_stat,
       |  (pn - LEAST(CAST(0 AS DECIMAL(38,0)), rm))
       |    > CAST(n AS DECIMAL(38,0)) * ${CusumLambda * 1000000L} AS alarm
       |FROM p2 ORDER BY event_type, seq""".stripMargin

  /** Largest lag reported by [[acfLags]]. */
  final val AcfMaxLag = 5

  /** AUTOCORRELATION FUNCTION — per-event-type ACF at lags 1..[[AcfMaxLag]],
    * the serial-dependence member of the monitoring family
    * ([[eventsAnomaly]] = point outliers, [[changepointCusum]] = mean
    * shifts): r_k = Σᵢ dᵢ·dᵢ₊ₖ / Σᵢ dᵢ² over mean deviations d, the
    * statistic that tells a pipeline whether a metric's noise is white
    * (sampling per event is sound) or trending (windows must stratify).
    *
    * Exactness: deviations are scaled by n_t — d = n·q − Σq over the
    * [[AnomalyScale]]-quantized values (the [[eventsAnomaly]] discipline),
    * so numerator and denominator are EXACT integers carried in
    * DECIMAL(38,0)/HUGEINT; the n² scale factor cancels in the ratio, and
    * `acf` itself is one correctly-rounded division of two
    * correctly-rounded decimal→double casts — bit-reproducible.
    *
    * Scale shape: ordering positions come from the shared [[eventSeq]]
    * two-phase decomposition (no per-type monolithic window); the lag
    * pairing is ONE partition-local equi-join of the deviation frame
    * against itself on (event_type, seq + k) with the ≤[[AcfMaxLag]]-way
    * lag fan-out exploded map-side — both sides share the
    * (event_type, seq)-hashed exchange, the per-(type, lag) sums are
    * partial-combinable, and the ~|types| stats/denominator tables
    * broadcast. The deviation frame feeds three consumers (denominator +
    * both join sides), so it is materialized once via SharedFrames. */
  def acfLags(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = eventSeq(spark, dir)
      .withColumn("q", round(col("value") * AnomalyScale).cast("long"))
      .select(col("event_type"), col("seq"), col("q"))
    val stats = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("q").cast(d38)).as("s"))
    val dev = graft.SharedFrames.shared(
      base.join(broadcast(stats), Seq("event_type"))
        .withColumn("dd", (col("n").cast(d38) * col("q") - col("s")).cast(d38))
        .select(col("event_type"), col("seq"), col("dd")))
    val den = dev.groupBy(col("event_type"))
      .agg(sum(col("dd") * col("dd")).cast(d38).as("den"))
    val left = dev
      .withColumn("lag", explode(lit((1 to AcfMaxLag).toArray)))
      .withColumn("bseq", col("seq") + col("lag"))
    left.join(dev.as("b"),
        left("event_type") === col("b.event_type") &&
          col("bseq") === col("b.seq"))
      .groupBy(left("event_type").as("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(left("dd") * col("b.dd")).cast(d38).as("num"))
      .join(broadcast(den), Seq("event_type"))
      .withColumn("acf",
        col("num").cast("string").cast("double") /
          col("den").cast("string").cast("double"))
      // exact-integer evidence rides as canonical decimal STRINGS: the
      // values exceed int64 at 100 TB (squared deviations), and the
      // driver's hash canonicalizes DECIMAL(38,0) engine-dependently —
      // strings are the one wide-integer rendering both engines agree on
      .select(col("event_type"), col("lag").cast("int").as("lag"),
        col("n_pairs"), col("num").cast("string").as("num"),
        col("den").cast("string").as("den"), col("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Oracle: the same exact-integer statistic with HUGEINT partials and
    * the identical varchar-routed decimal→double casts. */
  val acfLagsSql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    CAST(row_number() OVER (PARTITION BY event_type
       |      ORDER BY ts, event_id) AS BIGINT) AS seq,
       |    CAST(round(value * $AnomalyScale) AS BIGINT) AS q
       |  FROM events WHERE value IS NOT NULL),
       |t AS (
       |  SELECT event_type, COUNT(*) AS n, CAST(SUM(q) AS HUGEINT) AS s
       |  FROM e GROUP BY 1),
       |d AS (
       |  SELECT e.event_type, e.seq, CAST(n AS HUGEINT)*q - s AS dd
       |  FROM e JOIN t USING (event_type)),
       |den AS (
       |  SELECT event_type, SUM(dd*dd) AS den FROM d GROUP BY 1),
       |lags AS (SELECT CAST(UNNEST(range(1, ${AcfMaxLag + 1})) AS INT) AS lag),
       |num AS (
       |  SELECT a.event_type, l.lag, COUNT(*) AS n_pairs,
       |    SUM(a.dd * b.dd) AS num
       |  FROM d a CROSS JOIN lags l
       |  JOIN d b ON b.event_type = a.event_type AND b.seq = a.seq + l.lag
       |  GROUP BY 1, 2)
       |SELECT event_type, lag, n_pairs,
       |  CAST(num AS VARCHAR) AS num, CAST(den AS VARCHAR) AS den,
       |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS acf
       |FROM num JOIN den USING (event_type)
       |ORDER BY event_type, lag""".stripMargin

  /** Exact (holistic) percentile aggregation — the ref's reduce_func is the
    * only holistic aggregate it has (SURVEY §2.7); this is the built-in
    * columnar form. Spark `percentile` and DuckDB `quantile_cont` both use
    * linear interpolation over the sorted set. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("med"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS med,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ROBUST per-group statistics — the median/MAD family every
    * training-data cleaning pass prefers over mean/σ (a single wild value
    * moves the mean arbitrarily but neither the median nor the MAD):
    * per event type, median, MAD (median absolute deviation), the count
    * of |x − med| > 3·MAD outliers, and the WINSORIZED mean (values
    * clamped to med ± 3·MAD before averaging — outlier clipping, the
    * gentler alternative to dropping). Complements [[eventsAnomaly]]'s
    * moment-based 3σ verdict with its robust twin.
    *
    * Exactness: both medians are the holistic `percentile` (the
    * [[percentiles]] cross-engine parity), every derived bound is a fixed
    * short IEEE sequence on them, the clamp is pure comparison, and the
    * winsorized sum quantizes through DECIMAL(18,6) (the `dec`
    * discipline, parity proven by `ewma_decay`) so only the final
    * mean division floats. Scale shape: two group-bounded holistic
    * aggregations (per-type sorts — groups are event types, each
    * partition-parallel) plus ONE map-side pass against the broadcast
    * 5-row stats table; no corpus-keyed window, no self-join. */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = e.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    e.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("med"), col("mad"), col("value"),
        (col("med") + lit(3.0d) * col("mad")).as("hi"),
        (col("med") - lit(3.0d) * col("mad")).as("lo"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > col("hi") || col("value") < col("lo"), 1L)
          .otherwise(0L)).as("n_outliers"),
        sum(dec(greatest(least(col("value"), col("hi")), col("lo"))))
          .as("wsum"))
      .select(col("event_type"), col("n"), col("med"), col("mad"),
        col("n_outliers"),
        (col("wsum").cast("string").cast("double") /
          asDouble(col("n"))).as("wins_mean"))
      .orderBy(col("event_type"))
  }

  val robustStatsSql: String =
    """WITH e AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM e GROUP BY event_type),
      |mad AS (
      |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM e JOIN med m USING (event_type) GROUP BY e.event_type)
      |SELECT e.event_type, COUNT(*) AS n, m.med, d.mad,
      |  CAST(SUM(CASE WHEN e.value > m.med + 3.0 * d.mad
      |                  OR e.value < m.med - 3.0 * d.mad
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(CAST(SUM(CAST(
      |      greatest(least(e.value, m.med + 3.0 * d.mad),
      |               m.med - 3.0 * d.mad) AS DECIMAL(18,6)))
      |    AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS wins_mean
      |FROM e JOIN med m USING (event_type) JOIN mad d USING (event_type)
      |GROUP BY e.event_type, m.med, d.mad
      |ORDER BY e.event_type""".stripMargin

  /** Correlated EXISTS with aggregation (TPC-H Q4 shape): orders having at
    * least one line shipped after the order date, counted by priority. */
  def q4Exists(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    val late = t(spark, dir, "lineitem")
    ord.join(late, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4ExistsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** LEFT OUTER join preserving customers with zero orders (SURVEY §2.7
    * joins — outer flavor; count(order) is 0 for unmatched, not 1).
    *
    * Orders are aggregated to one row per o_custkey BEFORE the join, so
    * the join shuffles |customers| + |custkeys| rows instead of
    * |customers| + |orders| — at 100 TB the order:customer ratio is ~10×,
    * and aggregate-below-join is the plan that survives it (pinned in
    * PlanShapeSpec). Parity: every order has a non-null o_orderkey, so
    * count(o_orderkey) ≡ count(*) per custkey; the decimal sum is
    * grouping-order independent; an unmatched customer's null count
    * coalesces to 0 and its null sum stays null, exactly as the
    * join-then-aggregate formulation produced. */
  def leftOuterOrders(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("spend"))
    t(spark, dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        asDouble(col("spend")).as("total_spend"))
  }

  val leftOuterOrdersSql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_spend
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  /** FULL OUTER join: per-nation customer vs supplier presence, keeping
    * nations that have only one side. */
  def fullOuterNations(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = t(spark, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val fullOuterNationsSql: String =
    """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Sessionization via lag(): gap > 30 min starts a new session. Shows
    * event-stream windowing on the batch table (streaming twin lives in
    * graft.streaming). */
  /** Events with their 30-minute-gap session ids — ONE copy of the
    * sessionization rule, shared by [[eventsSessionize]] and
    * [[sessionPattern]] (a divergent duplicate would silently
    * desynchronize their oracles). User-partitioned windows only —
    * partition size is one user's history, never the corpus. */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))

  /** The event-sequence regex for [[sessionPattern]]: a view followed by
    * a purchase with no intervening error — in session-initial alphabet
    * (c)lick (s)ignup (e)rror (v)iew (p)urchase. Greedy-quantifier
    * leftmost semantics agree between Java regex and DuckDB's RE2 for
    * this pattern class. */
  final val SessionPatternRe = "v[^e]*p"

  /** COMPLEX-EVENT-PROCESSING pattern match over sessions — the
    * MATCH_RECOGNIZE analog (SQL:2016 row-pattern matching, re-expressed
    * as a regex over the session's event-initial string): per
    * [[sessionized]] session, the time-ordered sequence of event-type
    * initials is assembled and scanned for [[SessionPatternRe]]
    * ("view … purchase with no error between") — the conversion-path
    * detector funnel counting can't express (funnels count stage
    * reachability; this matches ORDER with exclusion).
    *
    * Scale shape: sessionization is the shared user-partitioned window;
    * sequence assembly is ONE per-session aggregation whose state is
    * session-bounded by the 30-minute-gap contract (a human session is
    * minutes long, never corpus-sized — the same bound every session
    * operator here rides); the regex runs once per session row. No
    * data-sized window, no self-join. */
  def sessionPattern(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .select(col("user_id"), col("session_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
          x => x.getField("c")), "").as("seq"))
      .withColumn("matched", col("seq").rlike(SessionPatternRe))
      .withColumn("hit", regexp_extract(col("seq"), SessionPatternRe, 0))
      .orderBy(col("user_id"), col("session_id"))

  /** Oracle: the same session CTEs, sequence assembly via ordered
    * string_agg, and the regex replayed in RE2. */
  val sessionPatternSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
       |         ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |), seqs AS (
       |  SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
       |  FROM sess GROUP BY user_id, session_id)
       |SELECT user_id, session_id, n_events, seq,
       |  regexp_matches(seq, '$SessionPatternRe') AS matched,
       |  regexp_extract(seq, '$SessionPatternRe') AS hit
       |FROM seqs ORDER BY user_id, session_id""".stripMargin

  /** Sweep-point time bucket for [[peakConcurrency]] — one day. The
    * bucket table is TIME-RANGE-bounded, not corpus-bounded: a corpus
    * 100× bigger spans the same calendar, so the bucket-offset θ-join
    * stays constant-sized while all per-row work stays bucket-
    * partitioned. */
  final val ConcBucketUs = 86400000000L

  /** PEAK CONCURRENCY — the sweep-line capacity question over the
    * session table: the maximum number of simultaneously open sessions
    * (the [[eventsSessionize]] 30-minute-gap sessions) and the earliest
    * instant it is reached. Semantically a SEQUENTIAL running sum of
    * +1/−1 sweep points in time order; implemented as the
    * [[graft.operators.TextAnalysis.packDocs]] two-phase decomposition:
    * deltas aggregate per instant (which also makes same-instant
    * open/close ordering irrelevant — concurrency is measured after all
    * deltas at an instant apply, identically in both engines), a window
    * cumsum WITHIN day buckets (parallel across days), day-level offsets
    * via a bounded θ-join broadcast back, and the argmax folds through
    * one min(struct) aggregate — no partition-less window, no
    * single-task sort, at any corpus size. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
    val sessions = ev
      .withColumn("prev", lag(col("tus"), 1).over(byUser))
      .withColumn("brk", when(col("prev").isNull ||
        col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tus")).as("s"), max(col("tus")).as("e"))
    // both sweep-line deltas from ONE row-local explode — the prior
    // union referenced `sessions` (the sessionize window + groupBy) in
    // both legs, executing it twice (guide §2.4)
    val deltas = sessions.select(explode(array(
        struct(col("s").as("ts"), lit(1L).as("d")),
        struct((col("e") + 1).as("ts"), lit(-1L).as("d")))).as("sl"))
      .select(col("sl.ts").as("ts"), col("sl.d").as("d"))
      .groupBy(col("ts")).agg(sum(col("d")).as("d"))
      .withColumn("bucket", expr(s"ts div $ConcBucketUs"))
    val sums = deltas.groupBy(col("bucket")).agg(sum(col("d")).as("bsum"))
    val offsets = sums.alias("a")
      .join(sums.alias("b"), col("b.bucket") < col("a.bucket"), "left_outer")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.bsum")), lit(0L)).as("offset"))
    deltas.join(broadcast(offsets), Seq("bucket"))
      .withColumn("conc", col("offset") + sum(col("d")).over(
        Window.partitionBy(col("bucket")).orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .agg(min(struct((-col("conc")).as("nc"), col("ts").as("t"))).as("m"))
      .select((-col("m.nc")).as("peak_concurrency"),
        col("m.t").as("at_ts_us"))
  }

  /** Oracle for [[peakConcurrency]]: the straight SEQUENTIAL sweep —
    * global running sum in time order, peak with earliest-instant
    * tie-break — so the green row proves the bucket decomposition IS the
    * sequential semantics (integer arithmetic, no FP slack: the
    * [[graft.operators.TextAnalysis.packDocs]] gate argument). */
  val peakConcurrencySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
       |d0 AS (
       |  SELECT user_id, tus, event_id,
       |    CASE WHEN lag(tus) OVER w IS NULL
       |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0
       |    END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
       |d1 AS (
       |  SELECT user_id, tus,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM d0),
       |sess AS (
       |  SELECT user_id, sid, MIN(tus) AS s, MAX(tus) AS e
       |  FROM d1 GROUP BY user_id, sid),
       |pts AS (
       |  SELECT s AS ts, 1 AS d FROM sess
       |  UNION ALL
       |  SELECT e + 1 AS ts, -1 AS d FROM sess),
       |ds AS (SELECT ts, SUM(d) AS d FROM pts GROUP BY ts),
       |run AS (
       |  SELECT ts, SUM(d) OVER (ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
       |  FROM ds)
       |SELECT CAST(conc AS BIGINT) AS peak_concurrency,
       |  CAST(ts AS BIGINT) AS at_ts_us
       |FROM (SELECT conc, ts,
       |        row_number() OVER (ORDER BY conc DESC, ts) AS rn
       |      FROM run)
       |WHERE rn = 1""".stripMargin

  /** NATIVE SESSION WINDOWS — the same 30-minute-gap sessions as
    * [[eventsSessionize]] but through Spark's built-in `session_window`
    * aggregation (one `SessionWindow` hash-agg with per-key session
    * merging, usable verbatim under `readStream`) instead of the
    * lag/cumsum window composition. At scale the two differ in shape:
    * the builtin is a single partial-merge aggregation — no per-user
    * ordered window pass — which is why real pipelines prefer it once
    * it expresses the semantics. Session end here is the builtin's
    * contract: last event + gap (the window's exclusive upper bound),
    * whereas [[eventsSessionize]] reports the last EVENT time; the
    * oracle replays exactly the builtin's bound. */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionWindowAggSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** AS-OF JOIN (SURVEY §2.7 absence — an operator Spark has no native
    * node for): each `click` event is joined to the MOST RECENT prior
    * `view` of the same user. The naive formulation is a range join
    * (every click × every earlier view, then argmax — quadratic in events
    * per user); the scale formulation composed here carries the view
    * columns forward with `last(…, ignoreNulls)` over (user, time) — ONE
    * shuffle by user, linear work, no range explosion. Events at equal
    * timestamps order by event_id (deterministic tie-break, pinned in the
    * oracle's identical window). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1) // strictly earlier rows
    t(spark, dir, "events")
      // ONE last() over a struct, not two independent last()s per column:
      // a view event carrying a NULL value would otherwise pair the latest
      // view's id with an OLDER view's value (ignoreNulls skips per-column)
      // — the (id, value) pair must travel atomically, exactly as the
      // streaming twin [[graft.streaming.EventStreams.asofEnrich]] carries
      // it in one state object.
      .withColumn("pv",
        last(when(col("event_type") === "view",
          struct(col("event_id"), col("value"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("pv.event_id").as("prior_view_id"),
        col("pv.value").as("prior_view_value"))
  }

  val asofJoinSql: String =
    """SELECT user_id, event_id, ts,
      |  (pv).event_id AS prior_view_id, (pv).value AS prior_view_value FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'view'
      |        THEN {'event_id': event_id, 'value': value} END IGNORE NULLS)
      |      OVER w AS pv
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |WHERE event_type = 'click'""".stripMargin

  /** NEAREST-direction as-of join — the full `merge_asof` direction
    * surface: each click pairs with its nearest view in EITHER time
    * direction (min |Δt|, ties to the earlier view — the backward
    * default), reporting which direction won. Same linear shape as
    * [[asofJoin]]: the backward candidate rides `last(…, ignoreNulls)`
    * over strictly-earlier rows, the forward candidate `first(…,
    * ignoreNulls)` over strictly-later rows — BOTH frames share the one
    * (user, time) shuffle and sort (plan: ONE Exchange feeding two
    * Window nodes back to back — the frames differ so Spark keeps two
    * nodes, but no second exchange or sort appears), never a range
    * self-join. The candidate struct carries
    * its own timestamp so the |Δt| comparison and the direction verdict
    * are pure row-local arithmetic. */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val wPrev = order.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = order.rowsBetween(1, Window.unboundedFollowing)
    val viewStruct = when(col("event_type") === "view",
      struct(col("tus").as("t"), col("event_id").as("i"),
        col("value").as("v")))
    t(spark, dir, "events")
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("pv", last(viewStruct, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(viewStruct, ignoreNulls = true).over(wNext))
      .filter(col("event_type") === "click")
      .withColumn("use_prev",
        col("pv").isNotNull && (col("nv").isNull ||
          (col("tus") - col("pv.t")) <= (col("nv.t") - col("tus"))))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("use_prev"), col("pv.i")).otherwise(col("nv.i"))
          .as("nearest_view_id"),
        when(col("use_prev"), col("pv.v")).otherwise(col("nv.v"))
          .as("nearest_view_value"),
        when(col("pv").isNull && col("nv").isNull,
            lit(null).cast("string"))
          .when(col("use_prev"), lit("backward"))
          .otherwise(lit("forward")).as("direction"))
  }

  val asofJoinNearestSql: String =
    """SELECT user_id, event_id, ts,
      |  CASE WHEN use_prev THEN (pv).i ELSE (nv).i END AS nearest_view_id,
      |  CASE WHEN use_prev THEN (pv).v ELSE (nv).v END AS nearest_view_value,
      |  CASE WHEN pv IS NULL AND nv IS NULL THEN NULL
      |       WHEN use_prev THEN 'backward'
      |       ELSE 'forward' END AS direction
      |FROM (
      |  SELECT *,
      |    (pv IS NOT NULL AND (nv IS NULL
      |       OR tus - (pv).t <= (nv).t - tus)) AS use_prev
      |  FROM (
      |    SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS tus,
      |      last_value(CASE WHEN event_type = 'view'
      |          THEN {'t': epoch_us(ts), 'i': event_id, 'v': value} END
      |        IGNORE NULLS) OVER (PARTITION BY user_id
      |          ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |      first_value(CASE WHEN event_type = 'view'
      |          THEN {'t': epoch_us(ts), 'i': event_id, 'v': value} END
      |        IGNORE NULLS) OVER (PARTITION BY user_id
      |          ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
      |    FROM events))
      |WHERE event_type = 'click'""".stripMargin

  /** Funnel step window: each step must follow the previous within 24
    * hours (microseconds — the events table's native resolution). 24 h
    * keeps BOTH verdict classes populated at every SF on this corpus's
    * per-user event density (19 / 246 / 2554 conversions at
    * sf0.001/0.01/0.1, all well under the purchase count — pinned in
    * FunnelSpec); tighter windows go vacuous at the small SFs. */
  final val FunnelWindowUs = 24L * 3600 * 1000000

  /** Three-step FUNNEL (view → click → purchase) via CHAINED as-of
    * windows — the product-analytics sequence query, composed from the
    * [[asofJoin]] primitive instead of a quadratic self-join chain: one
    * per-user pass computes, at every row, the last prior view ts; a
    * second window over the same (user, ts, id) order carries, at every
    * purchase, the last prior click WITH that click's own prior-view ts
    * (the (cts, vts) struct travels atomically — the asofJoin NULL-pair
    * discipline). A purchase converts iff its click is within
    * [[FunnelWindowUs]] and that click's view is within the same window.
    *
    * Scale shape: both windows share one partitioning and sort (user
    * keys are high-cardinality — no hot key), so the whole funnel is ONE
    * shuffle + one per-partition sort; the naive 3-way self-join is two
    * corpus-sized range joins. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "events")
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("pv_ts", last(when(col("event_type") === "view",
        col("tus")), ignoreNulls = true).over(w))
      .withColumn("pc", last(when(col("event_type") === "click",
        struct(col("tus").as("cts"), col("pv_ts").as("vts"))),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("pc").isNotNull &&
          col("tus") - col("pc.cts") <= FunnelWindowUs &&
          col("pc.vts").isNotNull &&
          col("pc.cts") - col("pc.vts") <= FunnelWindowUs, 1L)
          .otherwise(0L)).as("n_funnels"))
      .orderBy(col("user_id"))
  }

  val funnelConversionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
       |  FROM events),
       |s1 AS (
       |  SELECT *, last_value(CASE WHEN event_type = 'view' THEN tus END
       |      IGNORE NULLS) OVER w AS pv_ts
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |s2 AS (
       |  SELECT *, last_value(CASE WHEN event_type = 'click'
       |        THEN {'cts': tus, 'vts': pv_ts} END
       |      IGNORE NULLS) OVER w AS pc
       |  FROM s1
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT user_id, COUNT(*) AS n_purchases,
       |  CAST(SUM(CASE WHEN pc IS NOT NULL
       |    AND tus - (pc).cts <= $FunnelWindowUs
       |    AND (pc).vts IS NOT NULL
       |    AND (pc).cts - (pc).vts <= $FunnelWindowUs
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_funnels
       |FROM s2 WHERE event_type = 'purchase'
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** RETENTION COHORTS — the other canonical product-analytics rollup:
    * users grouped by first-seen day, activity counted per day offset.
    * Shapes: one distinct on (user, day) (map-side partial), one
    * user-keyed min, one co-keyed join, one (cohort, offset) count —
    * every stage partial-combinable, no windows at all. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(col("user_id"),
        expr("cast(floor(unix_micros(ts) / 86400000000) as bigint)")
          .as("day"))
      .distinct()
    val first = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val retentionCohortsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |first AS (
      |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  COUNT(DISTINCT user_id) AS n_active
      |FROM days JOIN first USING (user_id)
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Number of price bands and the bucket granularity for
    * [[rangeJoinBucketed]] (bands overlap by construction: width span/12,
    * stride span/60 → ~5 bands cover any price point). */
  final val RangeBands = 50L
  final val RangeBuckets = 32L

  /** INTERVAL (range) join WITHOUT an equi key, decomposed into an
    * equi-join — the pattern Spark itself lacks (a plain
    * `p BETWEEN lo AND hi` join plans as BroadcastNestedLoopJoin: O(n·m)
    * comparisons and a broadcast that must hold a whole side). Every
    * lineitem row is matched to the overlapping price bands it falls in:
    *
    *   1. quantize the value domain into [[RangeBuckets]] fixed-width
    *      buckets (width = span/32 from a one-row broadcast agg — the
    *      zorder/IVF max-fetch cadence);
    *   2. explode each band into the buckets its [lo, hi] covers —
    *      ≤ width/bucket + 1 rows per band, bounded by construction;
    *   3. EQUI-join probe rows to band-buckets on the bucket id (each
    *      probe carries exactly ONE bucket, so no post-join dedup), then
    *      filter the exact BETWEEN predicate.
    *
    * Shuffle is (n + Σcover) rows hashed on bucket — partition-parallel,
    * AQE-skew-splittable, no nested loop, no full-side broadcast. The
    * oracle is the naive BETWEEN join: equality proves the decomposition
    * finds exactly the containing bands. All band arithmetic is single
    * IEEE ops (sub/div/mul/add/floor) — bit-identical across engines. */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("p"), col("l_quantity"))
    val mx = li.agg(min(col("p")).as("p0"), max(col("p")).as("p1"))
    val bands = spark.range(0, RangeBands).toDF("band_id")
      .crossJoin(broadcast(mx))
      .withColumn("lo", col("p0") + col("band_id") * ((col("p1") - col("p0")) / (RangeBands + 10)))
      .withColumn("hi", col("lo") + (col("p1") - col("p0")) / 12)
      .withColumn("w", (col("p1") - col("p0")) / RangeBuckets)
      .withColumn("bk", explode(expr(
        "sequence(cast(floor(lo / w) as bigint), cast(floor(hi / w) as bigint))")))
      .select(col("band_id"), col("lo"), col("hi"), col("w"), col("bk"))
    val probe = li.crossJoin(broadcast(mx))
      .withColumn("w", (col("p1") - col("p0")) / RangeBuckets)
      .withColumn("bk", expr("cast(floor(p / w) as bigint)"))
      .select(col("p"), col("l_quantity"), col("bk"))
    probe.join(bands, Seq("bk"))
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_items"),
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("band_id"))
  }

  val rangeJoinBucketedSql: String =
    s"""WITH mx AS (
       |  SELECT min(l_extendedprice) AS p0, max(l_extendedprice) AS p1
       |  FROM lineitem),
       |bands AS (
       |  SELECT b.band_id,
       |    p0 + band_id * ((p1 - p0) / ${RangeBands + 10}) AS lo,
       |    p0 + band_id * ((p1 - p0) / ${RangeBands + 10}) + (p1 - p0) / 12
       |      AS hi
       |  FROM (SELECT unnest(range(0, $RangeBands)) AS band_id) b, mx)
       |SELECT band_id, count(*) AS n_items,
       |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR)
       |    AS DOUBLE) AS sum_qty
       |FROM lineitem JOIN bands
       |  ON l_extendedprice >= lo AND l_extendedprice <= hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin

  /** Per-group top-k via BOUNDED PARTIAL AGGREGATION
    * ([[graft.functions.TopKAgg]]) instead of a ranking window: the
    * window formulation shuffles every order row and sorts whole
    * partitions; here the map side reduces each (partition, customer) to
    * ≤ 3 entries before the exchange, and nothing is globally sorted —
    * top-k gains the same partial-combine scaling as count/sum. Oracle =
    * the row_number window query: equality proves the k-bounded merge
    * implements exactly the (price DESC, orderkey ASC) ranking. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopKAgg.top_k(3)
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("o_orderkey"), col("col.v").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val topkPerGroupSql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** SKYLINE (Pareto frontier) over parts maximizing (p_size,
    * p_retailprice) — the multi-criteria "no strictly better row exists"
    * operator (Börzsönyi et al. 2001): a part is on the skyline iff no
    * other part is ≥ in both dimensions and > in at least one.
    *
    * The naive formulation is a quadratic NOT-EXISTS self-join (the
    * oracle below — equality proves this decomposition computes exactly
    * the dominance definition). The engine instead runs the STAIRCASE
    * decomposition, which never compares rows pairwise: dominance by a
    * larger size collapses to ONE number per size (the max price at that
    * size), so a part survives iff (a) it carries the max price of its
    * own size class and (b) that price strictly exceeds the best price
    * among all LARGER sizes. Shape: one partial-combinable `max` by
    * p_size (the domain of p_size, not the row count), a bounded θ-join
    * over the size classes — ≤|size domain|² pairs, never data-sized —
    * and one broadcast join back. At 100 TB the only full-data passes
    * are the map-side max and the final filter; no row-level self-join,
    * no window anywhere. Price comparisons are raw doubles (no
    * arithmetic) — deterministic across engines. */
  def skylinePareto(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val bySize = p.groupBy(col("p_size"))
      .agg(max(col("p_retailprice")).as("mp"))
    // strict_above = best price among strictly larger sizes: a bounded
    // θ-join over the size classes (|domain|² pairs, never data-sized —
    // the same terminal the exclusive-prefix machinery uses; no
    // partition-less window anywhere in the suite)
    val stairs = bySize.as("a")
      .join(bySize.as("b"), col("b.p_size") > col("a.p_size"), "left_outer")
      .groupBy(col("a.p_size").as("p_size"), col("a.mp").as("mp"))
      .agg(max(col("b.mp")).as("strict_above"))
    p.join(broadcast(stairs), Seq("p_size"))
      .filter(col("p_retailprice") === col("mp") &&
        col("p_retailprice") > coalesce(col("strict_above"), lit(-1.0d)))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Reference epoch-day for [[groupedRegression]]'s centered time axis
    * (2023-12; the events calendar starts 2024-01). Centering keeps
    * every per-row product CALENDAR-bounded — |cx| grows with the time
    * span, never the corpus — so cx·yq stays far inside int64 at any
    * data size. */
  final val OlsRefDay = 19700L

  /** GROUPED LINEAR REGRESSION — closed-form per-group OLS (value vs
    * time) in EXACT arithmetic: per event type, the least-squares slope
    * and intercept of the daily trend, the `regr_slope`/`regr_intercept`
    * analytics-SQL surface. The moment sums (n, Σx, Σy, Σxy, Σx²) are
    * partial-combinable — ONE map-side-combined aggregation over the
    * corpus, the textbook distributed-regression shape — and everything
    * until the two reported doubles is integer-exact: x = epoch day
    * centered on [[OlsRefDay]], y quantized to micro-units
    * (DECIMAL(18,6)·10⁶ — exact, the [[graft.Tables.dec]] discipline),
    * sums carried in DECIMAL(38,0), the normal-equation combinations
    * (n·Σxy − ΣxΣy etc.) in DECIMAL(38,0) where BOTH engines cap
    * multiplication at width 38 (fits: the operands are ≤ 10²⁶ even at
    * 10¹² rows/group with a decade-long calendar; past that you shard
    * the group and merge the moment sums — they're associative). The
    * final slope/intercept are text-path double casts and two divisions,
    * correctly rounded in both engines; the exact DECIMAL numerators/
    * denominator are ALSO reported, so the gate pins the integer math
    * directly. Intercept is the fitted value AT [[OlsRefDay]] (cx=0). */
  def groupedRegression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    // value IS NOT NULL: without it a null row would enter n/scx/sxx but
    // silently drop from syq/sxy (null products leave SUM) — the moment
    // sums would describe DIFFERENT row sets, and the oracle, replaying
    // the same omission, could never catch it
    val e = t(spark, dir, "events").filter(col("value").isNotNull)
      .select(col("event_type"),
        (expr("unix_micros(ts) div 86400000000") - OlsRefDay).as("cx"),
        (dec(col("value")).cast(DecimalType(28, 6)) * lit(1000000))
          .cast("long").as("yq"))
    val s = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("cx").cast(d38)).as("scx"),
      sum(col("yq").cast(d38)).as("syq"),
      sum((col("cx") * col("yq")).cast(d38)).as("sxy"),
      sum((col("cx") * col("cx")).cast(d38)).as("sxx"))
    s.select(col("event_type"), col("n"),
        (col("n").cast(d38) * col("sxy") - col("scx") * col("syq"))
          .cast(d38).as("slope_num"),
        (col("n").cast(d38) * col("sxx") - col("scx") * col("scx"))
          .cast(d38).as("slope_den"),
        (col("syq") * col("sxx") - col("scx") * col("sxy"))
          .cast(d38).as("icept_num"))
      // the exact normal-equation integers ride as canonical decimal
      // STRINGS (≤10²⁶ per the scaladoc — past int64; DECIMAL(38,0)
      // outputs hash engine-dependently in the gate)
      .select(col("event_type"), col("n"),
        col("slope_num").cast("string").as("slope_num"),
        col("slope_den").cast("string").as("slope_den"),
        (col("slope_num").cast("string").cast("double") /
          col("slope_den").cast("string").cast("double") /
          lit(1000000.0d)).as("slope"),
        (col("icept_num").cast("string").cast("double") /
          col("slope_den").cast("string").cast("double") /
          lit(1000000.0d)).as("icept"))
      .orderBy(col("event_type"))
  }

  /** Oracle: the identical moment sums and normal-equation combination
    * (DuckDB also caps decimal multiplication at width 38), doubles via
    * the text path. */
  val groupedRegressionSql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    epoch_us(ts) // 86400000000 - $OlsRefDay AS cx,
       |    CAST(CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,6))
       |         * 1000000 AS BIGINT) AS yq
       |  FROM events WHERE value IS NOT NULL),
       |s AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(cx AS DECIMAL(38,0))) AS scx,
       |    SUM(CAST(yq AS DECIMAL(38,0))) AS syq,
       |    SUM(CAST(cx * yq AS DECIMAL(38,0))) AS sxy,
       |    SUM(CAST(cx * cx AS DECIMAL(38,0))) AS sxx
       |  FROM e GROUP BY event_type),
       |c AS (
       |  SELECT event_type, n,
       |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - scx * syq
       |         AS DECIMAL(38,0)) AS slope_num,
       |    CAST(CAST(n AS DECIMAL(38,0)) * sxx - scx * scx
       |         AS DECIMAL(38,0)) AS slope_den,
       |    CAST(syq * sxx - scx * sxy AS DECIMAL(38,0)) AS icept_num
       |  FROM s)
       |SELECT event_type, n,
       |  CAST(slope_num AS VARCHAR) AS slope_num,
       |  CAST(slope_den AS VARCHAR) AS slope_den,
       |  CAST(CAST(slope_num AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS slope,
       |  CAST(CAST(icept_num AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS icept
       |FROM c ORDER BY event_type""".stripMargin

  /** Attribution lookback window (3 days, µs) and credit scale (10¹²). */
  final val AttrWindowUs = 259200000000L
  final val AttrScale = 1000000000000L

  /** MULTI-TOUCH ATTRIBUTION — position-based (U-shaped) conversion
    * credit over the event stream, the marketing-analytics member of the
    * product family ([[funnelConversion]] counts stage reachability;
    * THIS divides each conversion's credit across the touchpoints that
    * preceded it): every purchase credits its same-user view/click
    * touches inside [[AttrWindowUs]] — solo touch 100%, two touches
    * 50/50, otherwise 40% first / 40% last / 20% split across the
    * middles. Credits are INTEGERS scaled by [[AttrScale]] (the middle
    * share is one integer division, floor remainder documented — NOT a
    * floating 0.2/(n−2), whose per-conversion rounding would make the
    * aggregate order-dependent), so the per-(type, role) totals are
    * exact DECIMAL(38,0) and the reported fraction is one final
    * division. All four n-classes (solo / pair / U-shaped / zero-touch
    * excluded) are measured populated at every SF.
    *
    * Scale shape: the conversion×touch pairing is a user-co-keyed range
    * join (both sides hash on user_id — never a cross join; fan-out
    * bounded by touches-per-user-window); per-conversion stats are one
    * partial-combinable (count, min-struct, max-struct) aggregation;
    * role tagging and credit arithmetic are map-side on the pair frame
    * re-joined co-keyed on the conversion id; the final rollup is
    * ~|types × roles| rows. Zero windows. */
  def attributionCredit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("cid"),
        col("ts_us").as("cts"))
    val tch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("tid"),
        col("ts_us").as("tts"), col("event_type").as("ttype"))
    val pairs = graft.SharedFrames.shared(
      conv.join(tch, Seq("user_id"))
        .filter(col("tts") < col("cts") &&
          col("cts") - col("tts") < AttrWindowUs)
        .select(col("cid"), col("tid"), col("tts"), col("ttype")))
    val stats = pairs.groupBy(col("cid")).agg(
      count(lit(1)).as("n"),
      min(struct(col("tts"), col("tid"))).as("f"),
      max(struct(col("tts"), col("tid"))).as("l"))
    val k = struct(col("tts"), col("tid"))
    pairs.join(stats, Seq("cid"))
      .withColumn("role",
        when(col("n") === 1, "solo")
          .when(k === col("f"), "first")
          .when(k === col("l"), "last")
          .otherwise("middle"))
      .withColumn("credit",
        when(col("n") === 1, lit(AttrScale))
          .when(col("n") === 2, lit(AttrScale / 2))
          .when(col("role").isin("first", "last"), lit(AttrScale / 5 * 2))
          .otherwise(expr(s"(${AttrScale / 5}) div (n - 2)")))
      .groupBy(col("ttype"), col("role"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit").cast(d38)).as("credit_scaled"))
      .withColumn("conversions_credited",
        (col("credit_scaled").cast("string").cast("double") /
          lit(AttrScale.toDouble)))
      // exact scaled credit rides as a canonical decimal STRING (sums
      // exceed int64 at corpus scale; DECIMAL(38,0) outputs hash
      // engine-dependently in the gate)
      .withColumn("credit_scaled", col("credit_scaled").cast("string"))
      .orderBy(col("ttype"), col("role"))
  }

  /** Oracle: the identical pairing, role election, and integer credit
    * arithmetic (window-ranked first/last — oracles may sort). */
  val attributionCreditSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |conv AS (
       |  SELECT user_id, event_id AS cid, ts_us AS cts FROM ev
       |  WHERE event_type = 'purchase'),
       |tch AS (
       |  SELECT user_id, event_id AS tid, ts_us AS tts,
       |    event_type AS ttype
       |  FROM ev WHERE event_type IN ('view', 'click')),
       |pairs AS (
       |  SELECT c.cid, t.tid, t.tts, t.ttype
       |  FROM conv c JOIN tch t ON t.user_id = c.user_id
       |    AND t.tts < c.cts AND c.cts - t.tts < $AttrWindowUs),
       |ranked AS (
       |  SELECT *, COUNT(*) OVER (PARTITION BY cid) AS n,
       |    row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rf,
       |    row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC)
       |      AS rl
       |  FROM pairs),
       |credited AS (
       |  SELECT ttype,
       |    CASE WHEN n = 1 THEN 'solo'
       |         WHEN rf = 1 THEN 'first'
       |         WHEN rl = 1 THEN 'last'
       |         ELSE 'middle' END AS role,
       |    CASE WHEN n = 1 THEN $AttrScale
       |         WHEN n = 2 THEN ${AttrScale / 2}
       |         WHEN rf = 1 OR rl = 1 THEN ${AttrScale / 5 * 2}
       |         ELSE ${AttrScale / 5} // (n - 2) END AS credit
       |  FROM ranked)
       |SELECT ttype, role, CAST(COUNT(*) AS BIGINT) AS n_touches,
       |  CAST(SUM(CAST(credit AS HUGEINT)) AS VARCHAR)
       |    AS credit_scaled,
       |  CAST(CAST(SUM(CAST(credit AS HUGEINT)) AS VARCHAR) AS DOUBLE)
       |    / CAST($AttrScale AS DOUBLE) AS conversions_credited
       |FROM credited GROUP BY 1, 2
       |ORDER BY ttype, role""".stripMargin

  /** Paths reported by [[sessionPaths]]. */
  final val PathTopK = 20

  /** PATH ANALYSIS — the top-[[PathTopK]] session event-sequences with
    * their conversion share: which journeys users actually take, the
    * product question between [[funnelConversion]] (stage reachability)
    * and [[sessionPattern]] (one fixed pattern). Rides the SAME
    * sessionization + session-bounded sequence assembly as the CEP
    * operator (collect_list over a ≤session-sized group — the 30-min gap
    * contract bounds it); paths then aggregate partial-combinably and
    * the report is one global TakeOrdered on (count desc, path). The
    * conversion share is exact-integer counts with one final division. */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .select(col("user_id"), col("session_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
        x => x.getField("c")), "").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("path").contains("p"), 1)).as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast("double") / col("n_sessions").cast("double"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(PathTopK)

  /** Oracle: the session CTEs + ordered string_agg + the same rollup. */
  val sessionPathsSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
       |         ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_id
       |  FROM flagged
       |), seqs AS (
       |  SELECT user_id, session_id,
       |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
       |      AS path
       |  FROM sess GROUP BY user_id, session_id)
       |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(COUNT(CASE WHEN path LIKE '%p%' THEN 1 END) AS BIGINT)
       |    AS n_converted,
       |  CAST(COUNT(CASE WHEN path LIKE '%p%' THEN 1 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS conv_rate
       |FROM seqs GROUP BY path
       |ORDER BY n_sessions DESC, path LIMIT $PathTopK""".stripMargin

  /** χ²(1) 95% critical value ×1000 (3.841): the A/B significance
    * verdict compares 1000·N·(ad−bc)² against 3841·(row/col products) —
    * EXACT integers, no floating χ² ever computed for the verdict. */
  final val AbChi2Crit1000 = 3841L

  /** A/B EXPERIMENT ANALYSIS — users hash-split into two arms (the
    * md5-prefix device — deterministic, engine-replayable assignment),
    * conversion = at least one purchase, and the 2×2 contingency tested
    * by the χ² statistic in EXACT integer arithmetic: the verdict is
    * the cross-multiplied comparison 1000·N·(ad−bc)² vs
    * [[AbChi2Crit1000]]·(a+b)(c+d)(a+c)(b+d), both sides DECIMAL(38,0)
    * (at 10⁹ users the products need the wider staging the
    * [[graft.operators.TextAnalysis.chi2Tokens]] family documents); the
    * reported χ² double is one fixed division chain beside it. A
    * hash-split of identical populations is EXPECTED insignificant —
    * the null result is the point: the harness proves the test itself,
    * not a synthetic effect. One partial-combinable per-user rollup,
    * one 4-cell aggregate; nothing data-sized after the first shuffle. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    // metric: MORE purchases than errors ("net-positive user") — every
    // user fires every event type on this corpus, so has-a-purchase is
    // universally true and would zero a margin; the count comparison
    // splits at every SF and is scale-free
    val perUser = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(when(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
          sum(when(col("event_type") === "error", 1L).otherwise(0L)), 1L)
        .otherwise(0L).as("converted"))
      .withColumn("arm", expr(
        "pmod(cast(conv(substring(md5(cast(cast(user_id as string) as binary)" +
          "), 1, 13), 16, 10) as bigint), 2)"))
    val cells = perUser.agg(
      count(when(col("arm") === 0 && col("converted") === 1, 1)).as("a"),
      count(when(col("arm") === 0 && col("converted") === 0, 1)).as("b"),
      count(when(col("arm") === 1 && col("converted") === 1, 1)).as("c"),
      count(when(col("arm") === 1 && col("converted") === 0, 1)).as("d"))
    cells
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("dd",
        (col("a").cast(d19) * col("d") - col("b").cast(d19) * col("c"))
          .cast(d38))
      .withColumn("num",
        (lit(1000L).cast(d19) * col("n") * col("dd") * col("dd")).cast(d38))
      .withColumn("den",
        (((col("a") + col("b")).cast(d19) * (col("c") + col("d")))
          .cast(d38) *
          ((col("a") + col("c")).cast(d19) * (col("b") + col("d")))
            .cast(d38)).cast(d38))
      .select(col("a"), col("b"), col("c"), col("d"), col("n"),
        when(col("den") > 0,
          col("num").cast("string").cast("double") /
            col("den").cast("string").cast("double") / lit(1000.0d))
          .as("chi2"),
        (col("den") > 0 &&
          col("num") > lit(AbChi2Crit1000).cast(d38) * col("den"))
          .as("significant"))
  }

  /** Oracle: identical assignment, cells, and HUGEINT cross-multiplied
    * verdict. */
  val abTestSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |           > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |         THEN 1 ELSE 0 END AS converted,
       |    CAST(CAST(concat('0x',
       |      substring(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT)
       |      AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |cells AS (
       |  SELECT
       |    CAST(COUNT(CASE WHEN arm = 0 AND converted = 1 THEN 1 END)
       |      AS BIGINT) AS a,
       |    CAST(COUNT(CASE WHEN arm = 0 AND converted = 0 THEN 1 END)
       |      AS BIGINT) AS b,
       |    CAST(COUNT(CASE WHEN arm = 1 AND converted = 1 THEN 1 END)
       |      AS BIGINT) AS c,
       |    CAST(COUNT(CASE WHEN arm = 1 AND converted = 0 THEN 1 END)
       |      AS BIGINT) AS d
       |  FROM pu),
       |w AS (
       |  SELECT a, b, c, d, a + b + c + d AS n,
       |    CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS dd,
       |    (CAST(a AS HUGEINT) + b) * (CAST(c AS HUGEINT) + d)
       |      * (CAST(a AS HUGEINT) + c) * (CAST(b AS HUGEINT) + d) AS den
       |  FROM cells)
       |SELECT a, b, c, d, n,
       |  CASE WHEN den > 0 THEN
       |    CAST(CAST(1000 * CAST(n AS HUGEINT) * dd * dd AS VARCHAR)
       |      AS DOUBLE)
       |      / CAST(CAST(den AS VARCHAR) AS DOUBLE)
       |      / CAST(1000 AS DOUBLE) END AS chi2,
       |  (den > 0 AND 1000 * CAST(n AS HUGEINT) * dd * dd
       |     > $AbChi2Crit1000 * den) AS significant
       |FROM w""".stripMargin

  /** RFM CUSTOMER SEGMENTATION — the classic recency/frequency/monetary
    * scoring over the order history: per customer, days since last
    * order (vs the corpus max date), order count, and exact DECIMAL
    * total spend; each dimension scored 1–5 against its own quintile
    * thresholds; a CASE precedence maps scores to the marketing segment
    * labels. Quintiles come from ONE holistic `percentile` aggregation
    * (NOT an NTILE window — a global rank window is the banned
    * partition-less shape; the threshold table is 1 row, broadcast, and
    * scoring is map-side comparisons). Cross-engine exactness of the
    * thresholds rides on the [[percentiles]] precedent: Spark
    * `percentile` ≡ DuckDB `quantile_cont` bit-for-bit on this data
    * (that query's green row IS the proof), inputs are varchar-routed
    * exact casts, and every score is an integer comparison count. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val per = graft.SharedFrames.shared(
      o.groupBy(col("o_custkey"))
        .agg(max(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
            .as("last_day"),
          count(lit(1)).as("f"),
          sum(dec(col("o_totalprice"))).as("m_dec"))
        .crossJoin(broadcast(
          o.agg(max(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
            .as("max_day"))))
        .select(col("o_custkey"),
          (col("max_day") - col("last_day")).as("r_days"), col("f"),
          col("m_dec").cast("string").cast("double").as("m")))
    val th = broadcast(per.agg(
      expr("percentile(CAST(r_days AS DOUBLE), array(0.2, 0.4, 0.6, 0.8))")
        .as("tr"),
      expr("percentile(CAST(f AS DOUBLE), array(0.2, 0.4, 0.6, 0.8))")
        .as("tf"),
      expr("percentile(m, array(0.2, 0.4, 0.6, 0.8))").as("tm")))
    def bucket(v: Column, t: Column): Column =
      (0 to 3).map(i => when(v > element_at(t, i + 1), 1L).otherwise(0L))
        .reduce(_ + _)
    per.crossJoin(th)
      .withColumn("r_score", lit(5L) - bucket(col("r_days").cast("double"),
        col("tr")))
      .withColumn("f_score", lit(1L) + bucket(col("f").cast("double"),
        col("tf")))
      .withColumn("m_score", lit(1L) + bucket(col("m"), col("tm")))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, "champion")
          .when(col("f_score") >= 4, "loyal")
          .when(col("m_score") >= 4, "big_spender")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select(col("o_custkey"), col("r_days"), col("f"), col("m"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy(col("o_custkey"))
  }

  /** Oracle: identical stats, quantile thresholds, comparison-count
    * scores, and segment CASE precedence. */
  val rfmSegmentsSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
      |      AS DOUBLE) AS m
      |  FROM orders GROUP BY o_custkey),
      |mx AS (SELECT MAX(epoch_us(o_orderdate) // 86400000000) AS max_day
      |       FROM orders),
      |base AS (
      |  SELECT o_custkey, max_day - last_day AS r_days, f, m
      |  FROM per CROSS JOIN mx),
      |th AS (
      |  SELECT
      |    quantile_cont(CAST(r_days AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS tr,
      |    quantile_cont(CAST(f AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS tf,
      |    quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS tm
      |  FROM base),
      |scored AS (
      |  SELECT o_custkey, r_days, f, m,
      |    5 - ((CASE WHEN CAST(r_days AS DOUBLE) > tr[1] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(r_days AS DOUBLE) > tr[2] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(r_days AS DOUBLE) > tr[3] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(r_days AS DOUBLE) > tr[4] THEN 1 ELSE 0 END))
      |      AS r_score,
      |    1 + ((CASE WHEN CAST(f AS DOUBLE) > tf[1] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(f AS DOUBLE) > tf[2] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(f AS DOUBLE) > tf[3] THEN 1 ELSE 0 END)
      |       + (CASE WHEN CAST(f AS DOUBLE) > tf[4] THEN 1 ELSE 0 END))
      |      AS f_score,
      |    1 + ((CASE WHEN m > tm[1] THEN 1 ELSE 0 END)
      |       + (CASE WHEN m > tm[2] THEN 1 ELSE 0 END)
      |       + (CASE WHEN m > tm[3] THEN 1 ELSE 0 END)
      |       + (CASE WHEN m > tm[4] THEN 1 ELSE 0 END)) AS m_score
      |  FROM base CROSS JOIN th)
      |SELECT o_custkey, r_days, f, m,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |         THEN 'champion'
      |       WHEN f_score >= 4 THEN 'loyal'
      |       WHEN m_score >= 4 THEN 'big_spender'
      |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |       WHEN r_score <= 2 THEN 'hibernating'
      |       ELSE 'regular' END AS segment
      |FROM scored ORDER BY o_custkey""".stripMargin

  /** Minimum co-occurrence support for [[copurchaseLift]]. */
  final val BasketMinSupport = 2L
  /** Pairs reported. */
  final val BasketTopK = 20

  /** MARKET-BASKET ANALYSIS — top co-purchased part pairs by lift,
    * the association-rule-mining workload (Agrawal et al.'s Apriori
    * family, restricted to 2-itemsets ranked by lift rather than
    * mined by level-wise candidate generation — on a wide catalog the
    * pair layer IS the deliverable): with N baskets, lift(a,b) =
    * N·cnt_ab/(cnt_a·cnt_b) > 1 ⇔ a and b co-occur more than
    * independence predicts — the [[graft.operators.TextAnalysis]] PMI
    * discipline applied to the basket domain.
    *
    * Exactness: all counts are exact integers; N·cnt_ab and cnt_a·cnt_b
    * are staged through DECIMAL(19,0) → DECIMAL(38,0) (at 10¹⁰ baskets
    * the raw products overflow int64), and lift is ONE division of two
    * varchar-routed exact casts. Support floor [[BasketMinSupport]]
    * (measured populated at every SF) kills the 1-co-occurrence noise
    * tier.
    *
    * Scale shape: baskets = one distinct projection; the pair join is
    * SELF-co-keyed on the order key with fan-out bounded by basket
    * WIDTH (≤ C(w,2) pairs per order — a per-row contract, never
    * corpus-sized); item frequencies join co-keyed on each part key;
    * the report is a global top-k (TakeOrderedAndProject). Zero
    * windows, zero cross joins. */
  def copurchaseLift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val b = graft.SharedFrames.shared(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
    val nb = broadcast(b.agg(countDistinct(col("ok")).as("n_baskets")))
    val ci = b.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    val pairs = b.as("x")
      .join(b.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("p1"), col("y.pk").as("p2"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= BasketMinSupport)
    pairs
      .join(ci.select(col("pk").as("p1"), col("c").as("ca")), Seq("p1"))
      .join(ci.select(col("pk").as("p2"), col("c").as("cb")), Seq("p2"))
      .crossJoin(nb)
      .withColumn("num",
        (col("n_baskets").cast(d19) * col("cab")).cast(d38))
      .withColumn("den", (col("ca").cast(d19) * col("cb")).cast(d38))
      .withColumn("lift",
        col("num").cast("string").cast("double") /
          col("den").cast("string").cast("double"))
      .select(col("p1"), col("p2"), col("cab"), col("ca"), col("cb"),
        col("lift"))
      .orderBy(col("lift").desc, col("p1"), col("p2"))
      .limit(BasketTopK)
  }

  /** Oracle: identical counts, DECIMAL staging, and the single-division
    * lift. */
  val copurchaseLiftSql: String =
    s"""WITH b AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM b),
       |ci AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
       |pairs AS (
       |  SELECT x.pk AS p1, y.pk AS p2, CAST(COUNT(*) AS BIGINT) AS cab
       |  FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $BasketMinSupport)
       |SELECT p1, p2, cab, a.c AS ca, b2.c AS cb,
       |  CAST(CAST(CAST(CAST(n_baskets AS DECIMAL(19,0)) * cab
       |         AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(CAST(CAST(a.c AS DECIMAL(19,0)) * b2.c
       |         AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS lift
       |FROM pairs
       |JOIN ci a ON a.pk = p1
       |JOIN ci b2 ON b2.pk = p2
       |CROSS JOIN nb
       |ORDER BY lift DESC, p1, p2 LIMIT $BasketTopK""".stripMargin

  /** SEASONAL-TREND DECOMPOSITION (STL-lite, exact) — each event type's
    * DAILY total decomposed into linear trend + day-of-week seasonality
    * + irregular remainder, the additive model seasonal monitoring runs
    * before alerting on a residual ([[changepointCusum]] finds mean
    * shifts; THIS separates "it's just Saturday" from a real shift):
    *
    *   1. trend: closed-form OLS over (centered day, daily total) — the
    *      [[groupedRegression]] normal equations on the daily layer;
    *      fitted·D = icept_num + slope_num·cx, all exact DECIMAL(38,0);
    *   2. seasonal: day-of-week means of the D-scaled detrended series
    *      R_d = D·y_d − icept_num − slope_num·cx_d (exact integers —
    *      detrending BEFORE the dow average, the decomposition order
    *      that makes the two components orthogonal over whole weeks);
    *   3. remainder: F_d = n_dow·R_d − ΣR_dow, exact integers again.
    *
    * The reported doubles (trend_fit, seasonal, resid in raw value
    * units) are single fixed division chains over varchar-routed exact
    * numerators, and the D-scaled integers ride beside them, so the
    * gate pins the whole decomposition bit-for-bit. Scale shape: one
    * partial-combinable daily rollup (calendar-bounded rows out), a
    * ~|types|-row moment table and a ~7·|types|-row seasonal table both
    * broadcast back, zero windows, zero self-joins. */
  def seasonalTrend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val daily = graft.SharedFrames.shared(
      t(spark, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          (dec(col("value")).cast(DecimalType(28, 6)) * lit(1000000))
            .cast("long").as("yq"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("yq").cast(d38)).as("y"))
        .withColumn("cx", col("day") - OlsRefDay)
        .withColumn("dow", pmod(col("day") + 4, lit(7))))
    val mo = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("cx").cast(d38)).as("scx"),
      sum(col("y")).as("syq"),
      sum(col("cx") * col("y")).cast(d38).as("sxy"),
      sum((col("cx") * col("cx")).cast(d38)).as("sxx"))
    val co = mo.select(col("event_type"),
      (col("n").cast(d38) * col("sxy") - col("scx") * col("syq"))
        .cast(d38).as("slope_num"),
      (col("n").cast(d38) * col("sxx") - col("scx") * col("scx"))
        .cast(d38).as("dd"),
      (col("syq") * col("sxx") - col("scx") * col("sxy"))
        .cast(d38).as("icept_num"))
    val detr = daily.join(broadcast(co), Seq("event_type"))
      .withColumn("r_scaled",
        (col("dd") * col("y") - col("icept_num")
          - col("slope_num") * col("cx")).cast(d38))
    val sea = detr.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("nw"), sum(col("r_scaled")).cast(d38).as("sr"))
    val dbl = (c: Column) => c.cast("string").cast("double")
    detr.join(broadcast(sea), Seq("event_type", "dow"))
      .withColumn("f_scaled",
        (col("nw").cast(d38) * col("r_scaled") - col("sr")).cast(d38))
      // the D-scaled exact integers ride as canonical decimal STRINGS
      // (detrended residuals exceed int64 at corpus scale; DECIMAL(38,0)
      // outputs hash engine-dependently in the gate)
      .select(col("event_type"), col("day"), col("dow"),
        col("y").cast("string").as("y"),
        col("r_scaled").cast("string").as("r_scaled"),
        col("f_scaled").cast("string").as("f_scaled"),
        (dbl(col("icept_num") + col("slope_num") * col("cx")) /
          dbl(col("dd")) / lit(1000000.0d)).as("trend_fit"),
        (dbl(col("sr")) / dbl(col("nw").cast(d38) * col("dd")) /
          lit(1000000.0d)).as("seasonal"),
        (dbl(col("f_scaled")) / dbl(col("nw").cast(d38) * col("dd")) /
          lit(1000000.0d)).as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Oracle: the identical decomposition with HUGEINT exact stages. */
  val seasonalTrendSql: String =
    s"""WITH rows0 AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,6))
       |         * 1000000 AS BIGINT) AS yq
       |  FROM events WHERE value IS NOT NULL),
       |daily AS (
       |  SELECT event_type, day, CAST(SUM(yq) AS HUGEINT) AS y,
       |    day - $OlsRefDay AS cx, (day + 4) % 7 AS dow
       |  FROM rows0 GROUP BY event_type, day),
       |mo AS (
       |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(cx) AS HUGEINT) AS scx, SUM(y) AS syq,
       |    SUM(CAST(cx AS HUGEINT) * y) AS sxy,
       |    CAST(SUM(cx * cx) AS HUGEINT) AS sxx
       |  FROM daily GROUP BY event_type),
       |co AS (
       |  SELECT event_type, n * sxy - scx * syq AS slope_num,
       |    n * sxx - scx * scx AS dd,
       |    syq * sxx - scx * sxy AS icept_num
       |  FROM mo),
       |detr AS (
       |  SELECT d.*, c.slope_num, c.dd, c.icept_num,
       |    c.dd * d.y - c.icept_num - c.slope_num * d.cx AS r_scaled
       |  FROM daily d JOIN co c USING (event_type)),
       |sea AS (
       |  SELECT event_type, dow, CAST(COUNT(*) AS HUGEINT) AS nw,
       |    SUM(r_scaled) AS sr
       |  FROM detr GROUP BY event_type, dow)
       |SELECT d.event_type, d.day, d.dow,
       |  CAST(d.y AS VARCHAR) AS y,
       |  CAST(d.r_scaled AS VARCHAR) AS r_scaled,
       |  CAST(s.nw * d.r_scaled - s.sr AS VARCHAR) AS f_scaled,
       |  CAST(CAST(d.icept_num + d.slope_num * d.cx AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(d.dd AS VARCHAR) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS trend_fit,
       |  CAST(CAST(s.sr AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(s.nw * d.dd AS VARCHAR) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS seasonal,
       |  CAST(CAST(s.nw * d.r_scaled - s.sr AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(s.nw * d.dd AS VARCHAR) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS resid
       |FROM detr d JOIN sea s USING (event_type, dow)
       |ORDER BY d.event_type, d.day""".stripMargin

  /** Oracle: the dominance DEFINITION as a NOT-EXISTS self-join — an
    * independent formulation, so equality proves the staircase. */
  val skylineParetoSql: String =
    """SELECT p_partkey, p_size, p_retailprice FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part o
      |  WHERE o.p_size >= a.p_size AND o.p_retailprice >= a.p_retailprice
      |    AND (o.p_size > a.p_size OR o.p_retailprice > a.p_retailprice))
      |ORDER BY p_partkey""".stripMargin

  /** Calendar aggregation: monthly revenue via date_trunc (SURVEY §2.7 —
    * the ref has no date functions at all; native here). */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      // .cast("date"): Spark's date_trunc returns TIMESTAMP, DuckDB's
      // returns DATE for a DATE input — harmonize to the natural month type
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
      .orderBy(col("month"))

  /** Monthly revenue REAGGREGATED from a materialized daily layer — the
    * incremental-aggregation pattern every 100 TB warehouse runs on: raw
    * facts roll into per-day partials ONCE (append-only as days close),
    * and coarser queries read ~30 daily rows per month instead of
    * rescanning raw orders. Exactness hinges on the partials being
    * DECIMAL, not double: decimal addition is associative, so
    * sum-of-day-sums is bit-identical to the direct monthly sum — the
    * oracle IS [[monthlyRevenueSql]] (the direct query), and equality
    * proves the two-level rollup lossless. (A double partial would drift
    * by association order and hash-mismatch.) */
  def monthlyFromDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders_day"),
        sum(dec(col("o_totalprice"))).as("rev_day"))
    daily
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"))
      .agg(sum(col("n_orders_day")).as("n_orders"),
        asDouble(sum(col("rev_day"))).as("revenue"))
      .orderBy(col("month"))
  }

  val monthlyRevenueSql: String =
    """SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Sparse-series threshold for [[resampleFfill]] — only high-value
    * events enter the daily rollup, so the spine provably has gaps to
    * fill at every SF. */
  final val ResampleMinValue = 250.0d

  /** TIME-SERIES RESAMPLING + FORWARD FILL — the gap-filling primitive
    * behind every monitoring dashboard and feature pipeline that needs a
    * DENSE regular series from sparse facts: per event type, a daily
    * rollup of high-value events (≥ [[ResampleMinValue]] — deliberately
    * sparse) is left-joined onto the complete calendar spine of the
    * corpus and each empty day carries the last known total forward
    * (`last(…, ignoreNulls)`), with n = 0 marking the filled rows and
    * leading NULLs preserved before a series' first observation.
    *
    * Scale shape: the spine is TIME-RANGE × type bounded — a corpus 100×
    * bigger spans the same calendar, so the spine join's build side stays
    * constant-sized (the [[ConcBucketUs]] argument) — the rollup is one
    * partial-combinable aggregation of only the filtered facts, and the
    * fill window partitions by type ordered by day: partition size = the
    * calendar, never the corpus. DECIMAL day totals render to double via
    * the text path, so the carried values replay exactly. */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val daily = e.filter(col("value") >= ResampleMinValue)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("total"))
    val bounds = e.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("total").cast("string").cast("double").as("total"),
        last(col("total"), ignoreNulls = true).over(w)
          .cast("string").cast("double").as("ffill_total"))
      .orderBy(col("event_type"), col("day"))
  }

  val resampleFfillSql: String =
    s"""WITH e AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events),
       |daily AS (
       |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(value AS DECIMAL(18,6))) AS total
       |  FROM e WHERE value >= $ResampleMinValue GROUP BY 1, 2),
       |bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM e),
       |days AS (
       |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
       |    AS day FROM bounds),
       |spine AS (
       |  SELECT t.event_type, d.day
       |  FROM (SELECT DISTINCT event_type FROM e) t, days d)
       |SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n,
       |  CAST(CAST(d.total AS VARCHAR) AS DOUBLE) AS total,
       |  CAST(CAST(last_value(d.total IGNORE NULLS) OVER (
       |      PARTITION BY s.event_type ORDER BY s.day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS VARCHAR) AS DOUBLE) AS ffill_total
       |FROM spine s LEFT JOIN daily d USING (event_type, day)
       |ORDER BY event_type, day""".stripMargin

  /** Months the synthetic IVM delta shifts inserts by (200 years — new
    * group keys, disjoint from history by construction). */
  final val IvmShiftMonths = 2400

  /** INCREMENTAL VIEW MAINTENANCE — [[mergeUpsert]]'s aggregate sibling
    * and the pattern behind every always-fresh 100 TB rollup: a
    * materialized monthly-revenue view is brought current by folding in a
    * change batch's PER-GROUP NET EFFECT (inserts +, deletes −), never
    * rescanning history. Work is O(|delta| + |touched groups|): the delta
    * aggregates partial-combinably, the fold is one co-keyed full-outer
    * join on the month key (view side group-sized, broadcastable), and
    * DECIMAL partials make the maintained totals BIT-IDENTICAL to a full
    * recompute — which is exactly what the oracle does (recompute over
    * (base ∖ deletes) ∪ inserts, verdicts re-derived from set
    * membership), so the green row IS the IVM correctness theorem for
    * this delta, group disappearance included.
    *
    * The in-engine delta deliberately populates every maintenance class:
    * inserts shifted [[IvmShiftMonths]] ahead (`new` groups), partial
    * deletes of March orders (`updated`), untouched months (`unchanged`),
    * and FULL deletion of the earliest month — its count nets to zero and
    * the group vanishes from the maintained view (the n2 > 0 filter). */
  def ivmAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(
      col("o_orderkey").as("k"),
      date_trunc("month", col("o_orderdate")).cast("date").as("m"),
      dec(col("o_totalprice")).as("p"))
    val base = o.filter(col("k") % 5 =!= 0)
    val mv = base.groupBy(col("m"))
      .agg(sum(col("p")).as("total"), count(lit(1)).as("n"))
    val m0 = base.agg(min(col("m")).as("m0"))
    // one disjunctive pass over base — a full-month delete that is ALSO a
    // March %7 row must retract exactly once
    val dels = base.crossJoin(broadcast(m0))
      .filter(col("m") === col("m0") ||
        (col("k") % 7 === 0 && month(col("m")) === 3))
      .select(col("m"), col("p"), lit(-1L).as("sgn"))
    val ins = o.filter(col("k") % 5 === 0)
      .select(add_months(col("m"), IvmShiftMonths).as("m"), col("p"),
        lit(1L).as("sgn"))
    val dAgg = dels.union(ins).groupBy(col("m"))
      .agg(sum(col("p") * col("sgn")).as("dt"), sum(col("sgn")).as("dn"))
    mv.join(dAgg, Seq("m"), "full_outer")
      .select(col("m"),
        (coalesce(col("total"), dec(lit(0))) +
          coalesce(col("dt"), dec(lit(0)))).as("total2"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n2"),
        when(col("total").isNull, "new")
          .when(col("dt").isNull, "unchanged")
          .otherwise("updated").as("verdict"))
      .filter(col("n2") > 0)
      .select(col("m").as("month"), asDouble(col("total2")).as("revenue"),
        col("n2").as("n_orders"), col("verdict"))
      .orderBy(col("month"))
  }

  val ivmAggSql: String =
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, date_trunc('month', o_orderdate) AS m,
       |    CAST(o_totalprice AS DECIMAL(18,6)) AS p
       |  FROM orders),
       |base AS (SELECT * FROM o WHERE k % 5 <> 0),
       |m0 AS (SELECT MIN(m) AS m0 FROM base),
       |dels AS (SELECT b.k, b.m, b.p FROM base b, m0
       |         WHERE b.m = m0.m0 OR (b.k % 7 = 0 AND month(b.m) = 3)),
       |ins AS (SELECT k, CAST(m + INTERVAL $IvmShiftMonths MONTH AS DATE) AS m, p
       |        FROM o WHERE k % 5 = 0),
       |modified AS (
       |  SELECT m, p FROM base WHERE k NOT IN (SELECT k FROM dels)
       |  UNION ALL SELECT m, p FROM ins),
       |agg AS (
       |  SELECT m AS month,
       |    CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS revenue,
       |    COUNT(*) AS n_orders
       |  FROM modified GROUP BY m)
       |SELECT month, revenue, n_orders,
       |  CASE WHEN month NOT IN (SELECT DISTINCT m FROM base) THEN 'new'
       |       WHEN month IN (SELECT m FROM dels UNION SELECT m FROM ins)
       |         THEN 'updated'
       |       ELSE 'unchanged' END AS verdict
       |FROM agg ORDER BY month""".stripMargin

  /** Scalar-function battery: string/math built-ins with cross-engine
    * parity (upper/substring/length/concat_ws/round/abs). */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        round(col("p_retailprice"), 1).as("price_r1"),
        abs(col("p_size") - lit(25)).cast("long").as("size_dist"))

  val scalarFuncsSql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      |  substring(p_type, 1, 5) AS type5,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  round(p_retailprice, 1) AS price_r1,
      |  CAST(abs(p_size - 25) AS BIGINT) AS size_dist
      |FROM part""".stripMargin

  /** Uncorrelated scalar subquery through the SQL entry path (spark.sql) —
    * orders above the global average price, compared exactly in decimal
    * (price × count > total) so no double-average drift can flip rows. */
  def aboveAvgSql(spark: SparkSession, dir: String): DataFrame = {
    Seq("orders").foreach(n =>
      t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
        |        (SELECT COUNT(*) FROM orders) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)""".stripMargin)
  }

  val aboveAvgSqlOracle: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
      |        (SELECT COUNT(*) FROM orders) >
      |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)""".stripMargin

  /** The skew-salting machinery as a driver-visible, ORACLE-CHECKED query:
    * lineitem (big, skewed toward popular orderkeys) joins a filtered
    * orders slice through [[graft.operators.ScaleLayout.saltedJoin]] —
    * the hot keys are split across `salts` reducers, the small side is
    * replicated per salt — and the oracle is the PLAIN join's SQL.
    * Equality proves salting is result-invariant: no row duplicated by
    * the replication, none dropped by the salt split. The salt itself is
    * a deterministic (partition, position) deal — ScaleLayoutSpec pins
    * that two materializations assign identical salts. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("orderkey"), col("l_quantity"))
    val small = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
    graft.operators.ScaleLayout.saltedJoin(big, small, "orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        asDouble(sum(dec(col("l_quantity")))).as("total_qty"))
  }

  val saltedJoinAggSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderpriority""".stripMargin

  /** Columns profiled by [[tableStats]] (a declared subset of orders —
    * doubles are excluded deliberately: min/max STRING rendering of
    * floats differs between engines, while integer/date/varchar
    * renderings are identical). */
  private val StatsCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
      "o_orderdate")

  /** ANALYZE-style EXACT column statistics — the engine-surface stats
    * collection every cost-based optimizer feeds on: per column, row
    * count, null count, exact distinct count, and min/max (rendered as
    * strings so one schema carries every type).
    *
    * Two aggregation legs over the pruned 5-column scan (re-reading a
    * columnar scan twice is cheaper than persisting it), NEITHER of which
    * sorts (the naive `agg(count_distinct…, min(string)…)` lowers to a
    * multi-distinct Expand whose string buffers force a SortAggregate
    * chain — two full sorts of the expanded rows, measured 4× slower):
    * (a) nulls + native-typed min/max in ONE global aggregation — empty
    * grouping key, so even the string-buffer SortAggregate needs no Sort
    * and partials combine per partition; (b) exact distinct counts via
    * `stack` to (col_name, rendered value) — the renderings are
    * injective, so string-side distinct == native distinct — then two
    * stacked HASH aggregations (value-collapse, then count), both
    * partial-combinable. The legs meet in a 5×5 broadcast join keyed on
    * col_name. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(StatsCols.map(col): _*)
    val wideAggs = count(lit(1)).as("n") +: StatsCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val stackArgs = StatsCols.map(c =>
      s"'$c', nn_$c, mn_$c, mx_$c").mkString(", ")
    val wide = base.agg(wideAggs.head, wideAggs.tail: _*)
      .select(col("n"), expr(s"stack(${StatsCols.size}, $stackArgs) AS " +
        "(col_name, n_null, min_val, max_val)"))
    val distStack = StatsCols.map(c =>
      s"'$c', cast($c as string)").mkString(", ")
    val nd = base
      .select(expr(s"stack(${StatsCols.size}, $distStack) AS (col_name, v)"))
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)))
      .groupBy(col("col_name"))
      .agg(sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_distinct"))
    wide.join(broadcast(nd), Seq("col_name"))
      .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
        col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  val tableStatsSql: String = {
    val aggs = StatsCols.map { c =>
      s"""    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nn_$c,
         |    CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd_$c,
         |    CAST(MIN($c) AS VARCHAR) AS mn_$c,
         |    CAST(MAX($c) AS VARCHAR) AS mx_$c""".stripMargin
    }.mkString(",\n")
    val legs = StatsCols.map { c =>
      s"""SELECT '$c' AS col_name, n, nn_$c AS n_null, nd_$c AS n_distinct,
         |  mn_$c AS min_val, mx_$c AS max_val FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |$aggs
       |  FROM orders)
       |$legs
       |ORDER BY col_name""".stripMargin
  }

  /** SCD TYPE-2 HISTORY BUILD — the warehouse temporal-dimension pattern:
    * fold each user's event stream into attribute VALIDITY INTERVALS. A
    * new version opens only when the tracked attribute (`event_type`)
    * actually CHANGES (consecutive duplicates collapse — the defining
    * SCD2 rule); each version carries [valid_from, valid_to) in event
    * time, a per-key version number, and the open-interval current flag
    * (valid_to NULL). This is the set-oriented face of a CDC pipeline's
    * dimension maintenance — the MERGE family's temporal sibling.
    *
    * Scale shape: two window passes and a ranking, ALL partitioned by
    * user_id (a well-spread key; per-partition work bounded by one
    * user's history) — change detection via lag, interval close via
    * lead, version via row_number. Zero joins, one shuffle on user_id
    * reused by every window (same partitioning and ordering → one Sort,
    * three window functions in one Window node). Determinism: ordering
    * pinned by (ts_us, event_id) — a same-microsecond pair folds
    * identically in both engines. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("event_type") =!= col("prev"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byUser))
      .withColumn("version", row_number().over(byUser))
      .select(col("user_id"), col("version").cast("long").as("version"),
        col("event_type").as("attr"), col("ts_us").as("valid_from_us"),
        col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd2HistorySql: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    epoch_us(ts) AS ts_us, event_id
      |  FROM events),
      |d AS (
      |  SELECT *, lag(event_type) OVER w AS prev
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |c AS (
      |  SELECT user_id, event_type, ts_us, event_id FROM d
      |  WHERE prev IS NULL OR event_type <> prev),
      |v AS (
      |  SELECT user_id, event_type, ts_us,
      |    lead(ts_us) OVER w AS valid_to_us,
      |    row_number() OVER w AS version
      |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
      |SELECT user_id, CAST(version AS BIGINT) AS version,
      |  event_type AS attr, ts_us AS valid_from_us, valid_to_us,
      |  (valid_to_us IS NULL) AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** Zipf-key derivation domain for [[skewZipfSalted]]. With u uniform on
    * [0, N), `N div (u+1)` = v occurs for u ∈ [N/(v+1), N/v) — frequency
    * ∝ 1/v², a Zipf(2) law: key 1 alone carries ~50% of all rows, key 2
    * ~17%, a long 1/v² tail after. The multiplier is Knuth's 2⁳²·φ⁻¹
    * scramble so the skew is NOT aligned with l_orderkey's own
    * clustering. */
  final val ZipfN = 1000L
  private final val ZipfMix = 2654435761L

  /** EMPIRICAL SKEW HARNESS, query face — a DELIBERATELY Zipf-skewed join
    * the uniform TPC-H keys cannot produce: every lineitem row derives a
    * Zipf(2) synthetic key in-engine (~50% of the corpus lands on ONE
    * key), folds it onto the 25-key nation dimension, and joins through
    * [[graft.operators.ScaleLayout.saltedJoin]] — the pathological-skew
    * tool — with the per-nation rollup on top. The oracle is the PLAIN
    * join's SQL, so the green row proves salting is result-invariant
    * under real skew (no row duplicated by the small-side replication,
    * none dropped by the salt split). The MEASUREMENT half lives in
    * SkewHarnessSpec: per-task row/straggler bounds for this exact join
    * shape, naive vs salted, on a corpus big enough to resolve them —
    * converting the suite's 100×-skew claims from plan inspection into
    * task-metric evidence. */
  def skewZipfSalted(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .select(expr(s"$ZipfN div (pmod(l_orderkey * $ZipfMix, $ZipfN) + 1)")
        .as("zkey"), col("l_quantity"))
      .withColumn("nkey", pmod(col("zkey"), lit(25L)))
    val small = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("nkey"), col("n_name"))
    graft.operators.ScaleLayout.saltedJoin(big, small, "nkey", salts = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_rows"),
        asDouble(sum(dec(col("l_quantity")))).as("total_qty"))
      .orderBy(col("n_name"))
  }

  val skewZipfSaltedSql: String =
    s"""WITH b AS (
       |  SELECT ($ZipfN // ((l_orderkey * $ZipfMix) % $ZipfN + 1)) % 25
       |      AS nkey,
       |    l_quantity
       |  FROM lineitem)
       |SELECT n.n_name, COUNT(*) AS n_rows,
       |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
       |    AS total_qty
       |FROM b JOIN nation n ON b.nkey = n.n_nationkey
       |GROUP BY n.n_name
       |ORDER BY n.n_name""".stripMargin

  /** Fixed-point scale for [[eventsAnomaly]]: `events.value` carries
    * 2-decimal granularity, so ×100 + round makes the scaled value an
    * exact integer and every downstream moment exact (the
    * [[graft.operators.Similarity.SemDedupQScale]] discipline applied to
    * anomaly stats). `round` (not `floor`): `v*100` can land an ulp below
    * the integer for a 2-decimal double, and half-up rounding of positive
    * values agrees between Spark and DuckDB. */
  final val AnomalyScale = 100L

  /** σ-multiplier for the outlier flag: |x − μ| > 3σ (population σ). */
  final val AnomalyK = 3L

  /** OUTLIER DETECTION over the event stream — flag events whose value
    * sits more than [[AnomalyK]] population standard deviations from its
    * event-type mean, entirely in exact integer arithmetic so the verdict
    * is order-independent and engine-neutral:
    * with q = round(value·S), n = count, s = Σq, qq = Σq² per type, the
    * flag is (n·q − s)² > K²·(n·qq − s²) — both sides exact integers
    * (widened through decimal(38,0)/HUGEINT for the squares), no floating
    * σ ever computed.
    *
    * Scale shape: one partial-combinable aggregation to ~|event_type|
    * rows, broadcast back, then a map-side codegen'd filter — two scans,
    * zero windows, zero per-group sorts. The moment partials (s, qq) are
    * staged through decimal(38,0) — NOT summed in BIGINT — so they are
    * exact to 10³⁸, matching the oracle's HUGEINT partials: a Long
    * Σq² wraps silently past ~10⁹ rows/group at this value range, and
    * wrapped partials would flip verdicts with no error. Decimal sums
    * stay partial-combinable (Spark's decimal sum aggregate folds
    * map-side like the long one). */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("q", round(col("value") * AnomalyScale).cast("long"))
    val qd = col("q").cast("decimal(38,0)")
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(qd).as("s"),
        sum(qd * col("q")).as("qq"))
    val d = col("n").cast("decimal(38,0)") * col("q") - col("s")
    val varN2 = col("n").cast("decimal(38,0)") * col("qq") -
      col("s") * col("s")
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(d * d > lit(AnomalyK * AnomalyK).cast("decimal(38,0)") * varN2)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val eventsAnomalySql: String =
    s"""WITH ev AS (
       |  SELECT event_id, event_type, value,
       |    CAST(round(value * $AnomalyScale) AS BIGINT) AS q
       |  FROM events),
       |st AS (
       |  -- partials stay HUGEINT (no BIGINT narrowing): exact to 10^38,
       |  -- the same headroom as the Spark side's decimal(38,0) sums
       |  SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM(q) AS HUGEINT) AS s,
       |    SUM(CAST(q AS HUGEINT) * q) AS qq
       |  FROM ev GROUP BY event_type)
       |SELECT event_id, event_type, value
       |FROM ev JOIN st USING (event_type)
       |WHERE (CAST(n AS HUGEINT)*q - s) * (CAST(n AS HUGEINT)*q - s)
       |    > ${AnomalyK * AnomalyK} * (CAST(n AS HUGEINT)*qq - CAST(s AS HUGEINT)*s)
       |ORDER BY event_id""".stripMargin

  /** SEMI-STRUCTURED EXTRACTION — schema-on-read over the `events.props`
    * JSON column: parse the typed field with `from_json` (codegen'd
    * Jackson parse, not a per-row UDF), then an integer-exact rollup per
    * (event_type, k-decile). The extraction happens IN the scan
    * projection, so at 100 TB the JSON never survives past the first
    * operator — only the parsed BIGINT shuffles, and the aggregate is
    * partial-combinable. Malformed JSON yields NULL in Spark
    * (`from_json` is permissive); DuckDB's `->>` would ERROR on invalid
    * JSON, so the oracle guards the extraction with `json_valid` to
    * replay the same yield-NULL semantics, and the NULL decile is kept
    * as its own row (ordered first in BOTH engines — NULLS FIRST is
    * pinned in the oracle, since DuckDB's ASC default is NULLS LAST
    * while Spark's is NULLS FIRST) so parse health is visible in the
    * result. */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
      .groupBy(col("event_type"),
        expr("k div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_decile"))

  val jsonExtractAggSql: String =
    """WITH ev AS (
      |  -- json_valid guard replays Spark's permissive from_json: a
      |  -- malformed props row yields k = NULL instead of erroring
      |  SELECT event_type,
      |    CASE WHEN json_valid(props)
      |         THEN TRY_CAST(props->>'k' AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, k // 10 AS k_decile,
      |  COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM ev
      |GROUP BY event_type, k_decile
      |ORDER BY event_type, k_decile NULLS FIRST""".stripMargin

  /** The documents corpus's closed language set — pivot columns are
    * DECLARED, not discovered: an implicit `pivot("lang")` runs a
    * distinct-collect job over the corpus before planning, a hidden
    * full scan at 100 TB. */
  final val PivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** PIVOT — the wide-format rollup: per source, one column of doc
    * counts per language. With the value set declared this is ONE
    * partial-combinable aggregation (the pivot lowers to conditional
    * aggregates inside a single hash-agg); empty (source, lang) cells
    * are filled to 0 so the result matches the conditional-count SQL
    * formulation exactly. */
  def pivotLangCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("source"))

  val pivotLangCountsSql: String = {
    val cols = PivotLangs.map(l =>
      s"  CAST(COUNT(CASE WHEN lang = '$l' THEN 1 END) AS BIGINT) AS $l")
      .mkString(",\n")
    s"""SELECT source,
       |$cols
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  /** UNPIVOT — the inverse reshape of [[pivotLangCounts]]: the wide
    * per-source × per-language count matrix melts back to long
    * (source, lang, n) rows through Spark's native `unpivot` (one
    * Expand node — each wide row fans out to |langs| rows map-side, no
    * shuffle beyond the pivot's own aggregation). Zero-count cells are
    * kept: the unpivoted long table is the pivot's EXACT inverse image,
    * which is what makes the pair round-trippable — and the oracle (the
    * direct long-format conditional count) proves both reshapes at once. */
  def unpivotLong(spark: SparkSession, dir: String): DataFrame =
    pivotLangCounts(spark, dir)
      .unpivot(Array(col("source")), PivotLangs.map(col).toArray, "lang", "n")
      .orderBy(col("source"), col("lang"))

  val unpivotLongSql: String =
    """WITH langs AS (SELECT unnest(['de','en','es','fr','zh']) AS lang),
      |src AS (SELECT DISTINCT source FROM documents)
      |SELECT s.source, l.lang,
      |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      |FROM src s CROSS JOIN langs l
      |LEFT JOIN (SELECT source, lang, COUNT(*) AS n
      |           FROM documents GROUP BY source, lang) c
      |  ON c.source = s.source AND c.lang = l.lang
      |ORDER BY s.source, l.lang""".stripMargin

  /** The stream-stream join's BATCH face, registered on the oracle gate:
    * [[graft.streaming.EventStreams.viewClickStreamJoin]] runs verbatim
    * on a static frame (the watermarks are no-ops there), where it is a
    * per-user interval join — the equi key bounds candidates per user, so
    * unlike [[rangeJoinBucketed]] no bucket decomposition is needed. A
    * green row proves the exact join semantics the streaming twin
    * executes micro-batch by micro-batch. */
  def viewClickPairs(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.viewClickStreamJoin(
      t(spark, dir, "events"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))

  val viewClickPairsSql: String =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      |ORDER BY v.user_id, view_id, click_id""".stripMargin

  /** MERGE / UPSERT — the lakehouse apply-changes contract: a snapshot
    * (customer) merged with a delta of updates, deletes and inserts in
    * ONE co-keyed full-outer hash join (matched+U → update, matched+D →
    * drop, unmatched change → insert, unmatched snapshot row → keep).
    * The delta here is DERIVED deterministically from the snapshot
    * (id%3 updates, id%7 deletes — delete wins where both match, the
    * MERGE precedence — id%11 inserts above the max id) so the oracle
    * replays it exactly; in production it is the batch's change feed.
    * Scale shape: the join is the only shuffle and the delta side is
    * batch-sized — the engine's own LWW/tombstone fold
    * (`kv_upsert_fold`/`kv_delete_fold`) is this operator at log
    * granularity; this is the set-oriented face. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val snap = t(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val mx = snap.agg(max(col("id")).as("mx"))
    val changes = snap
      .filter(col("id") % 7 === 0)
      .select(col("id"), col("name"), lit("D").as("op"))
      .union(snap.filter(col("id") % 3 === 0 && col("id") % 7 =!= 0)
        .select(col("id"), concat(col("name"), lit("*U")).as("name"),
          lit("U").as("op")))
      .union(snap.filter(col("id") % 11 === 0).crossJoin(broadcast(mx))
        .select((col("id") + col("mx")).as("id"),
          concat(col("name"), lit("*I")).as("name"), lit("I").as("op")))
    snap.as("s").join(changes.as("c"), Seq("id"), "full_outer")
      .filter(coalesce(col("c.op"), lit("")) =!= "D")
      .select(col("id"),
        coalesce(col("c.name"), col("s.name")).as("name"),
        when(col("c.op").isNull, "kept")
          .when(col("c.op") === "I", "inserted")
          .otherwise("updated").as("verdict"))
      .orderBy(col("id"))
  }

  val mergeUpsertSql: String =
    """WITH snap AS (SELECT c_custkey AS id, c_name AS name FROM customer),
      |mx AS (SELECT max(id) AS mx FROM snap),
      |changes AS (
      |  SELECT id, name, 'D' AS op FROM snap WHERE id % 7 = 0
      |  UNION ALL
      |  SELECT id, name || '*U', 'U' FROM snap
      |  WHERE id % 3 = 0 AND id % 7 <> 0
      |  UNION ALL
      |  SELECT id + (SELECT mx FROM mx), name || '*I', 'I' FROM snap
      |  WHERE id % 11 = 0)
      |SELECT COALESCE(s.id, c.id) AS id,
      |  COALESCE(c.name, s.name) AS name,
      |  CASE WHEN c.op IS NULL THEN 'kept'
      |       WHEN c.op = 'I' THEN 'inserted'
      |       ELSE 'updated' END AS verdict
      |FROM snap s FULL OUTER JOIN changes c ON s.id = c.id
      |WHERE COALESCE(c.op, '') <> 'D'
      |ORDER BY id""".stripMargin

  val eventsSessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Allowed event-type domain for [[dqReport]]'s enum constraint. */
  final val DqEventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** DATA-QUALITY EXPECTATION SUITE (the Deequ/Great-Expectations
    * surface) — a constraint battery over the raw tables as ONE gated
    * query (column `check_name` — `constraint` is reserved in DuckDB):
    * primary-key uniqueness, two referential-integrity checks,
    * an enum-domain check, completeness, a positivity range, and a
    * non-negativity range that GENUINELY FAILS on this data (TPC-H
    * customers carry negative account balances at every SF — the suite
    * would be vacuous if every verdict passed). One row per constraint:
    * (constraint, n_checked, n_violations, passed) — all exact integers
    * and booleans, the publishable scorecard an ingest job gates a
    * promotion on.
    *
    * Scale shape: each constraint is one scan-shaped aggregation with
    * map-side partials (uniqueness = count − exact distinct — the one
    * key-shuffling check, the price of an exact PK audit; the FK checks
    * are anti-join counts on the join keys, co-keyed equi-joins at any
    * scale; domain/range/completeness checks are pure map-side
    * conditional counts). The legs union to a 7-row frame — at 100 TB
    * each leg is an independent job over its own table scan, nothing
    * cross-contaminates. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val li = t(spark, dir, "lineitem")
    val ev = t(spark, dir, "events")
    val docs = t(spark, dir, "documents")
    def leg(name: String, checked: Column, viol: Column,
        src: DataFrame): DataFrame =
      src.agg(checked.as("n_checked"), viol.as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"))
    val legs = Seq(
      leg("customer_acctbal_nonneg", count(lit(1)),
        count(when(col("c_acctbal") < 0, 1)), cust),
      leg("documents_text_complete", count(lit(1)),
        count(when(col("text").isNull || length(col("text")) === 0, 1)),
        docs),
      leg("events_type_domain", count(lit(1)),
        count(when(!col("event_type").isin(DqEventTypes: _*), 1)), ev),
      // FK checks: left-join the (distinct — correct even if the parent
      // PK itself were broken) key set, count the unmatched rows
      leg("lineitem_orders_fk", count(lit(1)),
        count(when(col("o_orderkey").isNull, 1)),
        li.join(orders.select(col("o_orderkey")).distinct(),
          col("l_orderkey") === col("o_orderkey"), "left_outer")),
      leg("lineitem_qty_positive", count(lit(1)),
        count(when(col("l_quantity") <= 0, 1)), li),
      // no broadcast hint on either FK parent key set: a 100 TB corpus's
      // distinct customer keys don't fit an executor — let AQE pick
      // broadcast only when the measured build side is actually small
      leg("orders_customer_fk", count(lit(1)),
        count(when(col("c_custkey").isNull, 1)),
        orders.join(cust.select(col("c_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_outer")),
      leg("orders_pk_unique", count(lit(1)),
        count(lit(1)) - countDistinct(col("o_orderkey")), orders))
    legs.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  val dqReportSql: String = {
    val enum = DqEventTypes.map(s => s"'$s'").mkString(", ")
    s"""WITH legs AS (
       |  SELECT 'customer_acctbal_nonneg' AS check_name,
       |    CAST(COUNT(*) AS BIGINT) AS n_checked,
       |    CAST(COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT)
       |      AS n_violations
       |  FROM customer
       |  UNION ALL
       |  SELECT 'documents_text_complete', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END)
       |      AS BIGINT)
       |  FROM documents
       |  UNION ALL
       |  SELECT 'events_type_domain', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(CASE WHEN event_type NOT IN ($enum) THEN 1 END)
       |      AS BIGINT)
       |  FROM events
       |  UNION ALL
       |  SELECT 'lineitem_orders_fk', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT)
       |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
       |    ON l.l_orderkey = o.o_orderkey
       |  UNION ALL
       |  SELECT 'lineitem_qty_positive', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'orders_customer_fk', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
       |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
       |    ON o.o_custkey = c.c_custkey
       |  UNION ALL
       |  SELECT 'orders_pk_unique', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
       |  FROM orders)
       |SELECT check_name, n_checked, n_violations,
       |  (n_violations = 0) AS passed
       |FROM legs ORDER BY check_name""".stripMargin
  }
}
