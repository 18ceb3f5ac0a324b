package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event of the stream (mirrors events.parquet, ts in epoch micros). */
final case class Event(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, value: Double)

final case class SessionUpdate(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long, total_value: Double)

final case class QuotaVerdict(user_id: Long, event_id: Long, admitted: Boolean,
    window_sum: Double)

/** A closed session's CEP verdict ([[EventStreams.sessionPatternStream]]). */
final case class PatternVerdict(user_id: Long, session_start_us: Long,
    n_events: Long, seq: String, matched: Boolean, hit: String)

final case class ClickEnriched(user_id: Long, event_id: Long, ts_us: Long,
    prior_view_id: Option[Long], prior_view_value: Option[Double])

/** Streaming funnel state: the latest view ts and the latest click with
  * ITS OWN prior-view ts frozen at click time — exactly the (cts, vts)
  * struct the batch window carries, three longs per user. */
final case class FunnelState(view_ts: Option[Long], click_ts: Option[Long],
    click_view_ts: Option[Long])

final case class PurchaseVerdict(user_id: Long, event_id: Long, ts_us: Long,
    converted: Boolean)

/** Streaming SCD2 state: the one OPEN version of a user's tracked
  * attribute — three fields forever, no event retention. */
final case class Scd2State(attr: String, version: Long, validFrom: Long)

/** A CLOSED SCD2 version row — emitted exactly once, when the closing
  * attribute change arrives (the batch build's `is_current = false`
  * rows, field for field). */
final case class Scd2Version(user_id: Long, version: Long, attr: String,
    valid_from_us: Long, valid_to_us: Long)

/** Event carrying a real TimestampType column (required for watermarks /
  * event-time timeouts). */
final case class TimedEvent(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, value: Double, ts: java.sql.Timestamp)

/** Streaming anomaly state: exact integer moments of everything seen so
  * far for one event type — the
  * [[graft.queries.Relational.eventsAnomaly]] (n, Σq, Σq²) triple. The
  * moments are BigInt (encoded as Decimal(38,0) in the state store), not
  * Long: this operator runs unbounded, and a Long Σq² wraps silently
  * after ~10¹⁰ events/type at this value range — after which EVERY later
  * verdict is corrupt. Decimal state is exact to 10³⁸ (~10²⁶ events),
  * and past that the encoder fails loudly instead of wrapping. */
final case class AnomalyState(n: Long, s: BigInt, qq: BigInt)

/** [[EventStreams.ewmaStream]] state: the type's last ≤62 values as
  * DECIMAL(18,6)·10^6 longs — exact, bounded, mergeless. */
final case class EwmaState(scaled: Array[Long])

final case class EwmaPoint(event_type: String, event_id: Long, ts_us: Long,
    value: Double, n_win: Int, ewma: Double)

final case class AnomalyVerdict(event_type: String, event_id: Long,
    n_so_far: Long, flagged: Boolean)

/** [[EventStreams.cusumStream]] state: Page's prefix statistic S for one
  * event type plus the events-seen count — exact BigInt (the
  * [[AnomalyState]] overflow argument: S accumulates n_ref-scaled
  * deviations and a Long would wrap silently on an unbounded run). */
final case class CusumState(n: Long, s: BigInt)

final case class CusumVerdict(event_type: String, event_id: Long,
    n_seen: Long, s_stat: String, alarm: Boolean)

/** Structured Streaming twins of the batch event operators (SURVEY §2.4/§2.5
  * note the quota sliding window as the reference's only time construct; the
  * builder brief asks for watermarked windows + custom state):
  *
  *  - [[windowedCounts]]: watermarked tumbling-window counts/sums — the
  *    streaming formulation of quota byte-accounting;
  *  - [[sessionize]]: `flatMapGroupsWithState` with emit-on-close semantics
  *    (a session emits when a later event reveals a 30-min gap; batch
  *    replay == stream output); [[sessionizeWithTimeout]] additionally
  *    finalizes trailing sessions via event-time timeout;
  *  - [[quotaAdmission]]: per-user sequential sliding-window admission (the
  *    faithful p4 quota semantics) as arbitrary stateful processing.
  *
  * All operators take a `Dataset`/`DataFrame` so they run identically on
  * `readStream` sources and on batch frames in tests (`MemoryStream` /
  * parquet). State is keyed by user — partitioned, bounded, 100 TB-shaped.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Watermarked tumbling-window per-type aggregates (10-minute windows,
    * 30-minute allowed lateness). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  private val GapUs: Long = 30L * 60 * 1000000

  /** Stateful sessionization with emit-on-close semantics: a session is
    * emitted when a LATER event for the same user reveals a >30-minute gap;
    * each user's trailing session stays open in state (NoTimeout). A
    * wall-clock finalizer would attach GroupStateTimeout and emit the open
    * session on expiry — not used here so batch replays and stream runs
    * produce identical output (the property the tests pin). */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionFn)
  }

  /** Pure state transition, unit-testable without a stream: accumulates the
    * open session; emits closed sessions whenever a gap > 30 min appears in
    * the (per-trigger) sorted event batch. */
  private[streaming] def sessionFn(userId: Long, batch: Iterator[Event],
      state: GroupState[List[Event]]): Iterator[SessionUpdate] = {
    val events = (state.getOption.getOrElse(Nil) ++ batch.toList)
      .sortBy(e => (e.ts_us, e.event_id))
    if (events.isEmpty) return Iterator.empty
    val (closed, open) = splitSessions(events)
    state.update(open)
    closed.iterator.map(s => toUpdate(userId, s))
  }

  private def splitSessions(sorted: List[Event]): (List[List[Event]], List[Event]) = {
    val sessions = sorted.foldLeft(List.empty[List[Event]]) {
      case (Nil, e) => List(List(e))
      case (cur :: done, e) =>
        if (e.ts_us - cur.head.ts_us > GapUs) List(e) :: cur :: done
        else (e :: cur) :: done
    }
    // head of `sessions` is the still-open session (events newest-first)
    (sessions.tail.map(_.reverse).reverse, sessions.head.reverse)
  }

  private def toUpdate(userId: Long, s: List[Event]): SessionUpdate =
    SessionUpdate(userId, s.head.ts_us, s.last.ts_us, s.length,
      s.map(_.value).sum)

  /** STREAMING CEP — the MATCH_RECOGNIZE twin of
    * [[graft.queries.Relational.sessionPattern]]: each CLOSED session's
    * ordered event-initial string is scanned for the SHARED pattern
    * constant ([[graft.queries.Relational.SessionPatternRe]] — one copy,
    * so the faces cannot drift) and the verdict emits exactly once, at
    * session close. Same state contract as [[sessionize]]: per-user open
    * session only, session-bounded by the 30-minute-gap rule; the regex
    * runs on the driver-free executor path over a session-length string.
    * EventStreamsSpec pins closed-session parity with the BATCH
    * registered query across micro-batch splits. */
  def sessionPatternStream(events: Dataset[Event]): Dataset[PatternVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], PatternVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          val evs = (state.getOption.getOrElse(Nil) ++ batch.toList)
            .sortBy(e => (e.ts_us, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val (closed, open) = splitSessions(evs)
            state.update(open)
            closed.iterator.map(s => toVerdict(userId, s))
          }
      }
  }

  private def toVerdict(userId: Long, s: List[Event]): PatternVerdict = {
    // take(1), not substring(0, 1): the batch twin's SQL substring yields
    // "" for an empty event_type where JVM substring would THROW — the
    // stream must not crash on the malformed row batch flows through
    val seq = s.map(_.event_type.take(1)).mkString
    val hit = graft.queries.Relational.SessionPatternRe.r.findFirstIn(seq)
    PatternVerdict(userId, s.head.ts_us, s.length, seq,
      hit.isDefined, hit.getOrElse(""))
  }

  /** Shared event-time-timeout session kernel: sessions close either by a
    * later event revealing a >30-min gap OR by the watermark passing
    * last-event + 30 min (trailing sessions don't linger in state
    * forever); each closed session is rendered once by `emit`. */
  private def sessionedWithTimeout[T: org.apache.spark.sql.Encoder](
      events: Dataset[Event], watermarkDelay: String,
      emit: (Long, List[Event]) => T): Dataset[T] = {
    import events.sparkSession.implicits._
    val timed = events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .as[TimedEvent]
      .withWatermark("ts", watermarkDelay)
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close and emit what's open
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            if (open.isEmpty) Iterator.empty
            else Iterator.single(emit(userId, open))
          } else {
            val events = (state.getOption.getOrElse(Nil) ++
              batch.map(t => Event(t.event_id, t.ts_us, t.user_id,
                t.event_type, t.value)).toList)
              .sortBy(e => (e.ts_us, e.event_id))
            if (events.isEmpty) Iterator.empty
            else {
              val (closed, open) = splitSessions(events)
              state.update(open)
              // clamp: setTimeoutTimestamp throws if below the current
              // (eviction) watermark, which can exceed last-event + gap when
              // a late-but-accepted record arrives (late filtering uses the
              // PREVIOUS batch's watermark) or when watermarkDelay >= gap
              state.setTimeoutTimestamp(
                math.max(open.last.ts_us / 1000 + GapUs / 1000,
                  state.getCurrentWatermarkMs() + 1))
              closed.iterator.map(s => emit(userId, s))
            }
          }
      }
  }

  /** Sessionization with a REAL event-time timeout — the finalizing twin
    * of [[sessionize]]'s emit-on-close contract. */
  def sessionizeWithTimeout(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    sessionedWithTimeout(events, watermarkDelay, toUpdate)
  }

  /** CEP with a REAL event-time timeout — the finalizing twin of
    * [[sessionPatternStream]]: trailing open sessions also receive their
    * pattern verdict once the watermark passes last-event + 30 min, so a
    * user who goes silent still gets scanned. Fed a whole corpus plus a
    * watermark-advancing horizon, the verdict set equals the BATCH
    * registered query on EVERY session, not just the closed ones
    * (pinned in EventStreamsSpec). */
  def sessionPatternStreamWithTimeout(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[PatternVerdict] = {
    import events.sparkSession.implicits._
    sessionedWithTimeout(events, watermarkDelay, toVerdict)
  }

  /** Streaming exact dedup on content fingerprint within the watermark
    * horizon — the streaming twin of Dedup.dedupExact: state stays bounded
    * because fingerprints older than the watermark are dropped
    * (dropDuplicatesWithinWatermark), which is the only dedup contract
    * that survives an unbounded stream. */
  def streamingDedup(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming twin of the CLEANING pipeline
    * (`TextAnalysis.corpusClean`) — the continuous-ingestion form a
    * 100 TB corpus actually arrives in: exact-dedup keeper election
    * becomes streaming keep-FIRST state on the content hash
    * (`dropDuplicates`; equal to batch's min-doc_id keeper when each
    * duplicate group's FIRST-arriving row is its min doc_id — guaranteed
    * for a doc_id-ordered, single-partition-per-batch source as in the
    * spec; a multi-partition source can surface a later duplicate first
    * within one micro-batch, so production re-elects canonical keepers
    * in a periodic batch pass), then the SAME quality+language filter stage the batch
    * query runs (`TextAnalysis.cleanFilter` — shared code, not a copy).
    * For an unbounded stream, bound the dedup state with a timestamp
    * column + `withWatermark` + `dropDuplicatesWithinWatermark`, as in
    * [[streamingDedup]] — the semantic price (re-admitting dups older
    * than the horizon) is the only contract that survives infinity. */
  def corpusCleanStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.cleanFilter(
      docs.withColumn("fp",
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text").cast("binary")))
        .dropDuplicates("fp"))

  /** Streaming DECONTAMINATION — the stream-static twin of
    * [[graft.operators.Dedup.decontaminateFrom]]: documents arrive as a
    * stream and are probed against a STATIC eval-set table (the one
    * streaming join shape no other twin exercises). The probe set is
    * [[graft.operators.Dedup.evalGramHashPairs]]: each eval gram as TWO
    * independent rolling hashes (different polynomial bases), so the
    * broadcast carries 16-byte fingerprints instead of 20-char gram
    * bodies and the per-gram dedup STATE keys are (doc_id, gh, gh2) —
    * 24 bytes. State expires at the watermark horizon via
    * `dropDuplicatesWithinWatermark`, and the windowed count emits each
    * doc's verdict once its event-time window closes.
    *
    * Exactness: the batch operator recounts flagged docs over exact
    * strings in its stage 2; that stage has no bounded-state streaming
    * analogue (it would re-hold every matched gram string), so the stream
    * substitutes the 128-bit paired fingerprint — a false shared-gram
    * admission, or two distinct matched grams merging into one state key,
    * now needs a SIMULTANEOUS collision in two independent 64-bit
    * polynomials (~2^-128 per pair), not the single 2^-64 event the old
    * 8-byte probe accepted. The stream ≡ batch spec stays the gate at
    * test SFs; at corpus scale the residual odds are below memory-error
    * rates — the tolerance every production fingerprinting dedup ships. */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowSize: String = "10 minutes"): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.GramHashes.{gram_hashes, gram_hashes_alt}
    val evalHashes = Dedup.evalGramHashPairs(evalDocs)
    docs
      .filter(length(col("text")) >= Dedup.ContamGram)
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(arrays_zip(
          gram_hashes(col("text"), Dedup.ContamGram),
          gram_hashes_alt(col("text"), Dedup.ContamGram))).as("z"))
      .select(col("doc_id"), col("ts"),
        col("z.0").as("gh"), col("z.1").as("gh2"))
      .join(broadcast(evalHashes), Seq("gh", "gh2"), "left_semi")
      .dropDuplicatesWithinWatermark("doc_id", "gh", "gh2")
      .groupBy(window(col("ts"), windowSize), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"))
  }

  /** Streaming AS-OF enrichment — the streaming twin of
    * [[graft.queries.Relational.asofJoin]]: every click is emitted with
    * the most recent prior view of its user. The carried state is ONE
    * view per user — (ts, id, value), O(1) — where the batch window holds
    * the whole ordering, so the stream runs forever at a bounded
    * footprint. Same (ts_us, event_id) order and strictly-earlier
    * semantics as the batch window; in-order delivery per user across
    * micro-batches assumed (the [[quotaAdmission]] contract).
    * EventStreamsSpec proves EXACT batch parity over in-order
    * micro-batch splits. */
  def asofEnrich(events: Dataset[Event]): Dataset[ClickEnriched] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Double), ClickEnriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          var last = state.getOption // latest view's (ts_us, event_id, value)
          val out = List.newBuilder[ClickEnriched]
          batch.toList.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == "click")
              out += ClickEnriched(userId, e.event_id, e.ts_us,
                last.map(_._2), last.map(_._3))
            if (e.event_type == "view" && last.forall(l =>
              l._1 < e.ts_us || (l._1 == e.ts_us && l._2 < e.event_id)))
              last = Some((e.ts_us, e.event_id, e.value))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming FUNNEL — the O(1)-state twin of
    * [[graft.queries.Relational.funnelConversion]]: every purchase is
    * emitted with its conversion verdict (a click within the step window,
    * whose own prior view was within the step window of the click). The
    * batch query's chained windows hold the whole per-user ordering; the
    * stream carries THREE LONGS per user ([[FunnelState]]) forever —
    * state updates happen AFTER the verdict, matching the batch windows'
    * strictly-earlier frames. In-order per-user delivery across
    * micro-batches assumed (the [[quotaAdmission]]/[[asofEnrich]]
    * contract); EventStreamsSpec proves exact batch parity over in-order
    * splits. */
  def funnelStream(events: Dataset[Event],
      windowUs: Long = graft.queries.Relational.FunnelWindowUs)
      : Dataset[PurchaseVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, PurchaseVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = List.newBuilder[PurchaseVerdict]
          batch.toList.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == "purchase") {
              val conv = (s.click_ts, s.click_view_ts) match {
                case (Some(cts), Some(vts)) =>
                  e.ts_us - cts <= windowUs && cts - vts <= windowUs
                case _ => false
              }
              out += PurchaseVerdict(userId, e.event_id, e.ts_us, conv)
            }
            if (e.event_type == "view") s = s.copy(view_ts = Some(e.ts_us))
            if (e.event_type == "click")
              s = s.copy(click_ts = Some(e.ts_us), click_view_ts = s.view_ts)
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Time bound for [[viewClickStreamJoin]]: a click pairs with views up
    * to this far in its past. */
  final val StreamJoinWindow = "30 minutes"

  /** TRUE STREAM-STREAM JOIN — the two-moving-sides capability the other
    * twins sidestep with per-key state: views and clicks are BOTH
    * unbounded streams (here two filters of one source — a streaming
    * self-join), inner-joined per user with an event-time bound
    * (click within [[StreamJoinWindow]] after the view). Each side
    * carries a 1-hour watermark, so Spark's symmetric hash join can
    * EVICT: a view leaves state once the click-side watermark passes
    * view_ts + bound — state is bounded by the time window × arrival
    * rate, never the stream's history. Works identically on batch frames
    * (the join is just a range join there); EventStreamsSpec pins exact
    * batch parity across micro-batch splits.
    *
    * `joinType = "left_outer"` exercises the semantics only a
    * watermarked stream-stream join can offer: a view with NO click in
    * its window emits (view, NULL) — but only once the watermark proves
    * no matching click can still arrive (emission-on-eviction, the
    * streaming analog of the batch outer join's null row). */
  def viewClickStreamJoin(events: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"interval $StreamJoinWindow"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** The anomaly verdict both the stream and its batch replay share (the
    * [[admitOne]] single-implementation discipline): with prefix moments
    * (n, s=Σq, qq=Σq²) INCLUDING the current scaled value q, flag iff
    * (n·q − s)² > K²·(n·qq − s²) — the
    * [[graft.queries.Relational.eventsAnomaly]] integer z-rule verbatim —
    * the moments arrive as BigInt (the [[AnomalyState]] store type) and
    * every product stays BigInt, so nothing here can overflow. */
  private[streaming] def anomalyFlag(n: Long, s: BigInt, qq: BigInt,
      q: Long): Boolean = {
    val (bn, bq) = (BigInt(n), BigInt(q))
    val d = bn * bq - s
    val k = graft.queries.Relational.AnomalyK
    d * d > BigInt(k * k) * (bn * qq - s * s)
  }

  /** Events with fewer than this many same-type predecessors are never
    * flagged — prefix moments are meaningless on a cold start. */
  final val AnomalyMinN = 30L

  /** STREAMING OUTLIER DETECTION — the prefix twin of
    * [[graft.queries.Relational.eventsAnomaly]]: every event is judged
    * against the exact integer moments of its own type's history SO FAR
    * (inclusive of itself), the deployable semantics when the full-corpus
    * stats of the batch operator do not exist yet. State per event type is
    * ONE moments triple forever (a long count + two Decimal(38,0)
    * moments, see [[AnomalyState]]) — no window buffer, no event
    * retention — and the
    * verdict arithmetic is [[anomalyFlag]], the same code the batch replay
    * in EventStreamsSpec runs, so stream ≡ replay bit-exactly. In-order
    * per-type delivery across micro-batches assumed (the [[funnelStream]]
    * contract). As the prefix grows the verdicts converge to the batch
    * operator's (same rule, same arithmetic, full stats). */
  def anomalyStream(events: Dataset[Event],
      minN: Long = AnomalyMinN): Dataset[AnomalyVerdict] = {
    import events.sparkSession.implicits._
    val scale = graft.queries.Relational.AnomalyScale
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype, batch, state) =>
          var st = state.getOption.getOrElse(
            AnomalyState(0L, BigInt(0), BigInt(0)))
          val out = batch.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            val q = math.round(e.value * scale)
            st = AnomalyState(st.n + 1, st.s + q, st.qq + BigInt(q) * q)
            AnomalyVerdict(etype, e.event_id, st.n,
              st.n >= minN && anomalyFlag(st.n, st.s, st.qq, q))
          }
          state.update(st)
          out.iterator
      }
  }

  /** The CUSUM transition BOTH the stream and any replay share (the
    * [[admitOne]] single-implementation discipline): with trained
    * reference moments (n_ref, s_ref = Σxq) and the micro-quantized
    * incoming value q, the deviation is n_ref·q − s_ref and
    * S' = max(0, S + d) — the
    * [[graft.queries.Relational.changepointCusum]] integers verbatim;
    * alarm iff S' > the pre-scaled λ·n_ref·10⁶ threshold. */
  private[streaming] def cusumStep(nRef: Long, sRef: BigInt,
      lambdaScaled: BigInt, s: BigInt, q: BigInt): (BigInt, Boolean) = {
    val s2 = (s + BigInt(nRef) * q - sRef).max(BigInt(0))
    (s2, s2 > lambdaScaled)
  }

  /** The exact quantization [[graft.queries.Relational.changepointCusum]]
    * applies in-plan — double → DECIMAL(18,6) (half-up) → ×10⁶ integer —
    * replayed on the driver/executor side for the streaming face. */
  private[streaming] def microQuantize(v: Double): BigInt =
    BigInt(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.movePointRight(6).toBigIntegerExact)

  /** STREAMING CHANGEPOINT DETECTION — the deployable face of
    * [[graft.queries.Relational.changepointCusum]]: Page's recursion run
    * live per event type against a TRAINED in-control reference (the
    * stored (n, Σxq) moments of the monitored corpus — Page's CUSUM
    * assumes a KNOWN in-control mean, and the batch operator's full-corpus
    * moments are exactly that stored artifact). State per type is ONE
    * (count, BigInt S) pair forever — no window buffer, no event
    * retention. Fed the training corpus itself in ts-order, the emitted
    * statistics and alarms are BIT-IDENTICAL to the batch operator's rows
    * (same quantization, same integers, same threshold) — the strongest
    * stream ≡ batch gate available, pinned in EventStreamsSpec across
    * micro-batch splits. In-order per-type delivery across micro-batches
    * assumed (the [[funnelStream]] contract). */
  def cusumStream(events: Dataset[Event],
      references: Map[String, (Long, BigInt)],
      lambda: Long = graft.queries.Relational.CusumLambda)
      : Dataset[CusumVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype, batch, state) =>
          // an UNTRAINED type (no stored in-control moments) must not
          // kill the query for every healthy type: skip its events —
          // monitoring starts once a reference artifact exists for it
          references.get(etype) match {
            case None => Iterator.empty
            case Some((nRef, sRef)) =>
              val lam = BigInt(lambda) * BigInt(nRef) * BigInt(1000000L)
              var st = state.getOption.getOrElse(CusumState(0L, BigInt(0)))
              val out = batch.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
                val (s2, alarm) =
                  cusumStep(nRef, sRef, lam, st.s, microQuantize(e.value))
                st = CusumState(st.n + 1, s2)
                // s_stat as the canonical digit string — the batch face
                // renders DECIMAL(38,0) via cast(string) to the same form,
                // keeping the stream ≡ batch twins schema-identical
                CusumVerdict(etype, e.event_id, st.n, s2.toString, alarm)
              }
              state.update(st)
              out.iterator
          }
      }
  }

  /** Per-user sequential sliding-window admission — the p4 quota contract
    * (admit iff in-window sum + amount ≤ max; admitted events join the
    * window; ref: p4/server/my_quota_tracker.cc:44-77) as distributed
    * stateful processing keyed by user. */
  /** Shared admission step — BOTH the streaming operator and the batch
    * replay call exactly this, so their floating-point window sums are
    * bit-identical (same window order — oldest first — same left fold,
    * same op sequence); a divergent implementation could flip an admission
    * decision that lands exactly on the quota boundary. */
  private[streaming] def admitOne(window: List[(Long, Double)], tsUs: Long,
      amount: Double, maxAmount: Double,
      windowUs: Long): (List[(Long, Double)], Boolean, Double) = {
    val kept = window.filter { case (t, _) => tsUs - t < windowUs }
    val inWindow = kept.foldLeft(0.0)(_ + _._2) // oldest-first strict fold
    val admit = inWindow + amount <= maxAmount
    (if (admit) kept :+ (tsUs -> amount) else kept, admit, inWindow)
  }

  def quotaAdmission(events: Dataset[Event], maxAmount: Double,
      windowUs: Long): Dataset[QuotaVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Double)], QuotaVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          var window = state.getOption.getOrElse(Nil) // (ts_us, amount), oldest first
          val out = batch.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            val (w2, admit, inWindow) =
              admitOne(window, e.ts_us, e.value, maxAmount, windowUs)
            window = w2
            QuotaVerdict(userId, e.event_id, admit, inWindow)
          }
          state.update(window)
          out.iterator
      }
  }

  /** STREAMING SCD2 — the live face of
    * [[graft.queries.Relational.scd2History]]: per-user dimension
    * maintenance as events arrive. State is ONE open version per user
    * (attr, version number, valid_from — three fields forever, no event
    * retention); an arriving event whose tracked attribute differs from
    * the open version CLOSES it — emitting the finished
    * (user, version, attr, [valid_from, valid_to)) row, exactly the
    * `is_current = false` rows of the batch build — and opens the next.
    * Same-attribute events are no-ops (the change-only SCD2 rule). The
    * open (current) version lives only in state until its closing change
    * arrives — Append semantics: a row is emitted exactly once, when it
    * is final. In-order per-user delivery across micro-batches assumed
    * (the [[quotaAdmission]] contract); EventStreamsSpec pins stream ≡
    * the batch build's closed rows across micro-batch splits. */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Version] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Version](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st == null)
              st = Scd2State(e.event_type, 1L, e.ts_us)
            else if (e.event_type != st.attr) {
              out += Scd2Version(userId, st.version, st.attr,
                st.validFrom, e.ts_us)
              st = Scd2State(e.event_type, st.version + 1, e.ts_us)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Batch replay of the same admission semantics over the events table —
    * used to cross-check the streaming operator and as the distributed
    * analog of the engine's driver-side QuotaTracker.
    *
    * 100 TB shape: secondary sort, NOT per-user materialization. Events are
    * hash-partitioned by user and sorted (user, ts, id) within partitions;
    * one streaming pass then replays every user sequentially, resetting at
    * user boundaries. Memory per task = the sliding window (bounded by the
    * window span), never a hot user's full history — `flatMapGroups` +
    * `it.toList` would OOM an executor on a pathological user. The window
    * sum is computed by [[admitOne]], the SAME code the streaming twin
    * runs, so batch and stream decisions are bit-identical by
    * construction. */
  def quotaReplayBatch(spark: SparkSession, dir: String, maxAmount: Double,
      windowUs: Long): DataFrame = {
    import spark.implicits._
    graft.Tables.t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .as[Event]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var window = List.empty[(Long, Double)] // oldest first
        it.map { e =>
          if (e.user_id != curUser) { curUser = e.user_id; window = Nil }
          val (w2, admit, inWindow) =
            admitOne(window, e.ts_us, e.value, maxAmount, windowUs)
          window = w2
          QuotaVerdict(e.user_id, e.event_id, admit, inWindow)
        }
      }.toDF()
  }

  /** DuckDB oracle for [[quotaReplayBatch]] — the event-joins-window
    * feedback loop IS SQL-expressible: users are independent and each
    * user's fold is a linear recurrence over its `row_number()`-ordered
    * events, so a recursive CTE that carries the admitted window as a
    * LIST column replays every user in lockstep (iterations = max events
    * per user, not total events). Float parity is exact by construction:
    * the window list stays oldest-first (filter preserves order, admits
    * append), and the sum is the same strict left fold
    * [[admitOne]] runs — `list_reduce(list_prepend(0.0, amounts), +)`
    * ≡ `foldLeft(0.0)(_ + _)`. */
  def quotaReplaySql(maxAmount: Double, windowUs: Long): String =
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY epoch_us(ts), event_id) AS seq
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_id, seq, ts_us, value,
       |         CAST(0 AS DOUBLE) AS window_sum,
       |         (0 + value <= $maxAmount) AS admitted,
       |         CASE WHEN 0 + value <= $maxAmount
       |              THEN [{'t': ts_us, 'a': value}]
       |              ELSE CAST([] AS STRUCT(t BIGINT, a DOUBLE)[]) END AS win
       |  FROM ev WHERE seq = 1
       |  UNION ALL
       |  SELECT user_id, event_id, seq, ts_us, value,
       |         kept_sum AS window_sum,
       |         kept_sum + value <= $maxAmount AS admitted,
       |         CASE WHEN kept_sum + value <= $maxAmount
       |              THEN list_append(kept, {'t': ts_us, 'a': value})
       |              ELSE kept END AS win
       |  FROM (
       |    SELECT q.*, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |             list_transform(kept, w -> w.a)), (a, b) -> a + b) AS kept_sum
       |    FROM (
       |      SELECT e.user_id, e.event_id, e.seq, e.ts_us, e.value,
       |             list_filter(r.win, w -> e.ts_us - w.t < $windowUs) AS kept
       |      FROM r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1) q))
       |SELECT user_id, event_id, admitted, window_sum FROM r""".stripMargin

  // ---- streaming distribution-drift monitor ----

  /** Windowed goodness-of-fit core shared by the streaming monitor and
    * its batch face (same code, [[graft.streaming.EventStreams
    * .corpusCleanStream]] discipline): per (event-time window, dim),
    * Pearson χ² of the window's bucket counts against the REFERENCE
    * distribution `(dim, bucket, p)` from
    * [[graft.operators.CorpusOps.refDriftHistogram]], via the identity
    *   χ² = Σ_b (n_b − p_b·N)²/(p_b·N) = S/N − N,  S = Σ_b n_b²/p_b
    * which needs only two partial-combinable sums — reference buckets
    * UNOBSERVED in the window contribute exactly their p_b·N through the
    * identity, so nothing iterates the reference support. Buckets absent
    * from the reference (p unknown) cannot enter a χ² at all; they are
    * counted out separately as `n_novel` — at scale a novel language in
    * the crawl is THE alarm, not a term.
    *
    * Numeric staging: S is summed as DECIMAL(38,6) — order-independent
    * (so stream ≡ batch bit-exactly regardless of micro-batching), and
    * wide enough for n²/p up to 10³² (dec(18,6) would overflow once
    * window totals pass ~10⁶). 100 TB shape: two chained windowed hash
    * aggregates (bucket level, then dim level), both partial-combinable;
    * the reference is a broadcast dimension table. */
  def driftMonitor(docs: DataFrame, reference: DataFrame,
      windowSize: String = "10 minutes"): DataFrame = {
    val dec38 = (c: org.apache.spark.sql.Column) =>
      c.cast(DecimalType(38, 6))
    val wcounts = graft.operators.CorpusOps
      .driftBucketRows(docs, Seq("ts"))
      .groupBy(window(col("ts"), windowSize), col("dim"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    wcounts
      .join(broadcast(reference), Seq("dim", "bucket"), "left_outer")
      .groupBy(window(col("window"), windowSize), col("dim"))
      .agg(
        sum(when(col("p").isNotNull, col("n")).otherwise(0L)).as("n_obs"),
        sum(when(col("p").isNull, col("n")).otherwise(0L)).as("n_novel"),
        sum(when(col("p").isNotNull,
          dec38((col("n") * col("n")).cast("double") / col("p")))
          .otherwise(dec38(lit(0.0d)))).as("s"))
      .select(col("window.start").as("w_start"), col("dim"),
        col("n_obs"), col("n_novel"),
        when(col("n_obs") > 0,
          (col("s").cast("double") / col("n_obs").cast("double"))
            - col("n_obs").cast("double")).otherwise(lit(0.0d)).as("chi2"))
  }

  /** Streaming face: watermarked event time, append-mode chained window
    * aggregations (bucket counts → per-dim χ²) — each window's verdict
    * emits once the watermark passes it. EventStreamsSpec pins EXACT
    * batch parity across micro-batch splits. */
  def driftStream(docs: DataFrame, reference: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowSize: String = "10 minutes"): DataFrame =
    driftMonitor(docs.withWatermark("ts", watermarkDelay), reference,
      windowSize)

  /** Streaming face of the PRIORITY SAMPLER
    * ([[graft.operators.CorpusOps.prioritySample]]): priority sampling is
    * a MERGEABLE sketch — the (k+1)-bounded buffer merges associatively —
    * so the identical aggregate run as a complete-mode streaming global
    * aggregation yields, after ANY prefix of micro-batches, exactly the
    * batch sample of that prefix (EventStreamsSpec pins the equality).
    * This is the always-fresh weighted sample + subset-sum estimator over
    * an unbounded ingest, at O(k) state. Input needs doc_id + n_chars. */
  def prioritySampleStream(docs: DataFrame): DataFrame = {
    import graft.operators.CorpusOps
    CorpusOps.prioritySampleOf(CorpusOps.priorityCols(docs))
  }

  /** STREAMING EWMA — the live face of
    * [[graft.queries.Relational.ewmaDecay]]: every event is emitted with
    * the α = 1/2 time-decayed average of its type's last
    * [[graft.queries.Relational.EwmaWindow]] values, state is ONE bounded
    * array of ≤62 scaled longs per event type forever. The arithmetic
    * replays the batch operator's exact contract — values quantized to
    * DECIMAL(18,6) (stored as ·10^6 longs, exact), the weighted numerator
    * folded in BigInt (= the batch DECIMAL(38,6) fold, both exact), the
    * closed-form BIGINT denominator, and ONE IEEE division through the
    * identical decimal-text→double path — so stream output is BIT-EQUAL
    * to the batch rows for the same prefix (EventStreamsSpec pins it).
    * In-order per-type delivery across micro-batches assumed (the
    * [[funnelStream]] contract). NULL-valued events must be filtered
    * BEFORE the typed boundary (the batch operator's `value IS NOT
    * NULL`): [[Event]] encodes value as a primitive, so a null reaching
    * `as[Event]` fails the query rather than being skipped — the
    * Event-typed contract every stateful twin in this file shares. */
  def ewmaStream(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    val w = graft.queries.Relational.EwmaWindow
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype, batch, state) =>
          var buf = state.getOption.map(_.scaled.toVector)
            .getOrElse(Vector.empty[Long])
          val out = batch.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            // Spark's double→DECIMAL(18,6) cast: exact binary expansion,
            // then HALF_UP to 6 digits; ·10^6 fits a long exactly
            val scaled = BigDecimal(e.value)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .underlying.unscaledValue.longValueExact
            buf = (buf :+ scaled).takeRight(w)
            val len = buf.length
            var num = BigInt(0)
            buf.zipWithIndex.foreach { case (s, i) =>
              num += BigInt(s) << (62 - len + i)
            }
            val den = (1L << 62) - (1L << (62 - len))
            val ewma = new java.math.BigDecimal(num.bigInteger, 6)
              .toPlainString.toDouble / den.toDouble
            EwmaPoint(etype, e.event_id, e.ts_us, e.value, len, ewma)
          }
          state.update(EwmaState(buf.toArray))
          out.iterator
      }
  }
}
