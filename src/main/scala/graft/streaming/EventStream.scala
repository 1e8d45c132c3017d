package graft.streaming

import java.sql.Timestamp

import graft.operators.IterationCheckpoint
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming-shaped event transforms, written source-agnostic: the same
  * DataFrame→DataFrame function runs over a batch `events` table (the
  * NorthStar n14/n16 queries do) and over a `readStream` source — only
  * the watermark/output-mode wiring differs, which is what the
  * `streaming*` entry points add.
  *
  * The reference has no streaming surface (SURVEY.md §2.8); these are
  * the north-star extensions (§7.4): tumbling/sliding window aggregates
  * and state-store sessionization.
  */
object EventStream {

  /** Tumbling-window counts+sums per event_type. Batch & streaming.
    * The 2-decimal measure sums as integer cents on longs — exact and
    * associative, so the result is independent of partial/final
    * aggregation order (raw double sums are not), and codegen stays on
    * primitives (a DECIMAL aggregate would box per row). The emitted
    * double equals the decimal oracle's: both correctly round the same
    * exact rational n/100. */
  def tumblingAgg(events: DataFrame, tsCol: String, width: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window counts (width/slide). Batch & streaming. */
  def slidingCounts(
      events: DataFrame, tsCol: String, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** Watermarked streaming variant of [[tumblingAgg]] — append mode
    * emits a window once the watermark passes its end. */
  def streamingTumblingAgg(
      stream: DataFrame, tsCol: String, width: String, watermark: String): DataFrame =
    tumblingAgg(stream.withWatermark(tsCol, watermark), tsCol, width)

  /** Batch spelling of watermark late-data ACCOUNTING — the admission
    * rule [[streamingTumblingAgg]]'s watermark applies, replayed over a
    * deterministic arrival schedule so the drop counts are auditable
    * (a feed owner must know how much data the watermark discards, not
    * just what survived). `batchCol` assigns each event its arrival
    * micro-batch; the watermark a row faces is the one PUBLISHED
    * BEFORE its batch ran: max event time over all earlier batches
    * minus `delayMs` (Spark publishes the advanced watermark at batch
    * END — rows of the batch that raised the max are never victims of
    * it). A row is dropped iff its window END is at or below that
    * watermark — the aggregation-state eviction rule, NOT a raw
    * `ts < wm` test: a late row belonging to a still-open window is
    * admitted. Millisecond arithmetic throughout (Spark tracks
    * watermarks in ms; event-time micros floor).
    *
    * Scale shape: the only window function runs over the BATCH-INDEX
    * relation (one row per micro-batch — thousands, not billions);
    * per-batch watermarks broadcast back onto the event stream, and
    * the per-window counts are one two-level agg. Exchanges carry
    * (batch, ms) and (window, count) longs.
    */
  def lateAccountingBatch(
      events: DataFrame, tsCol: String, batchCol: String,
      delayMs: Long, width: String): DataFrame = {
    val bm = events
      .groupBy(col(batchCol).as("graft__b"))
      .agg(max(expr(s"unix_micros($tsCol) div 1000")).as("graft__bmax"))
    val wm = bm
      .withColumn("graft__wm",
        max(col("graft__bmax")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("graft__b"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
          - delayMs)
      .select(col("graft__b"), col("graft__wm"))
    events
      .join(broadcast(wm), col(batchCol) === col("graft__b"))
      .withColumn("graft__w", window(col(tsCol), width))
      .withColumn("graft__late",
        col("graft__wm").isNotNull &&
          expr("unix_micros(graft__w.end) div 1000") <= col("graft__wm"))
      .groupBy(col("graft__w.start").as("window_start"))
      .agg(sum(when(col("graft__late"), 0L).otherwise(1L)).as("n_admitted"),
        sum(when(col("graft__late"), 1L).otherwise(0L)).as("n_late"))
  }

  /** Streaming exact dedup — the streaming twin of the n1 batch hash
    * dedup. `dropDuplicatesWithinWatermark` keeps a seen-key entry only
    * until the watermark passes its event time, so state is bounded by
    * the keys arriving within one watermark horizon, not all history —
    * the shape that survives an unbounded 100 TB/day feed (a plain
    * streaming dropDuplicates accumulates state forever). Dedup on a
    * content hash/key column, never the payload, so the state store
    * holds fingerprints. */
  def streamingDedup(
      stream: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (the standard "attach metadata to the event feed"
    * step). The dim side is explicitly broadcast — per micro-batch
    * Spark re-plans the join, and a dimension small enough to sit on
    * every executor must never force a stream-side shuffle (a
    * shuffled stream join adds a per-batch exchange of the entire
    * micro-batch). Left join: events with no dim row pass through
    * with nulls rather than silently dropping — a feed should never
    * lose events to a stale dimension. Batch & streaming (the same
    * plan shape works for both; tests prove batch ≡ stream).
    */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Watermarked stream-stream interval join: match rows of two feeds
    * on a key within an event-time window (right.ts ∈ [left.ts,
    * left.ts + within]). Both sides carry watermarks and the join
    * condition bounds the time difference in BOTH directions — that
    * pair is what lets Spark age out buffered state: without the
    * bounds each side's state store grows with all history (the
    * stream-stream equivalent of an unbounded shuffle). Batch &
    * streaming: the same function works on static frames, so tests
    * prove stream ≡ batch.
    *
    * Column contract: `left`/`right` must share only the key column;
    * their ts columns are passed by name and kept distinct in the
    * output.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String): DataFrame =
    left.join(
      right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "inner")
      .drop(right(key))

  /** Streaming wiring for [[intervalJoin]] — watermark both feeds
    * before joining (state retention derives from watermark + bound).
    */
  def streamingIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String,
      watermark: String): DataFrame =
    intervalJoin(
      left.withWatermark(leftTs, watermark),
      right.withWatermark(rightTs, watermark),
      key, leftTs, rightTs, within)

  /** Left-outer variant of [[intervalJoin]]: every left row emits —
    * with nulls on the right when no match exists in
    * [leftTs, leftTs + within]. Conversion attribution needs exactly
    * this: an unconverted view is DATA (the negative class), not
    * absence. Same scalable spelling as the inner form (keyed equi-join
    * with the time bound as a predicate). */
  def intervalJoinOuter(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String): DataFrame =
    left.join(
      right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "left_outer")
      .drop(right(key))

  /** Streaming wiring for [[intervalJoinOuter]]. In streaming, the
    * null-padded row for an unmatched left event emits when the RIGHT
    * watermark passes leftTs + within — only then can no match still
    * arrive, so state eviction IS the null trigger; both watermarks
    * plus the two-sided bound in the condition are what make that
    * eviction derivable (the same retention argument as the inner
    * form, with the outer row as its observable). EventStreamSpec
    * proves batch ≡ stream including a left row whose match never
    * arrives. */
  def streamingIntervalJoinOuter(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String,
      watermark: String): DataFrame =
    intervalJoinOuter(
      left.withWatermark(leftTs, watermark),
      right.withWatermark(rightTs, watermark),
      key, leftTs, rightTs, within)

  /** foreachBatch body for an idempotent key-merge sink — the standard
    * exactly-once recipe for sinks without transactions: every
    * micro-batch MERGEs into the target by key (latest per `order`
    * wins), so a replayed batch (failure between write and offset
    * commit) re-merges the same rows into the same state instead of
    * double-appending. Use as
    * `stream.writeStream.foreachBatch(upsertBatch("t", keys, ord) _)`.
    *
    * Crash safety via shadow-and-swap: the merged state is written to
    * `<table>__shadow` FIRST (reading the target, writing elsewhere —
    * no self-overwrite, no driver-side materialization, and the old
    * state stays intact for the whole write), then the target is
    * swapped to the shadow with two metadata ops. The only vulnerable
    * window is between DROP and RENAME — metadata-only, and the shadow
    * still holds the full state, so the next invocation detects the
    * half-finished swap and completes the rename before merging. Data
    * is never lost; a transactional table format (the warehouse-scale
    * deployment) would make the swap itself atomic.
    */
  def upsertBatch(
      table: String,
      keyCols: Seq[String],
      order: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val shadow = s"${table}__shadow"
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(shadow))
      s.sql(s"ALTER TABLE $shadow RENAME TO $table") // finish interrupted swap
    val merged =
      if (s.catalog.tableExists(table))
        graft.warehouse.Warehouse.upsert(s.table(table), batch, keyCols, order)
      else
        graft.warehouse.Warehouse.upsert(
          batch.limit(0), batch, keyCols, order)
    graft.warehouse.Warehouse.stage(merged, shadow)
    graft.warehouse.Warehouse.dropTable(s, table)
    s.sql(s"ALTER TABLE $shadow RENAME TO $table")
  }

  // --- state-store sessionization -----------------------------------

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** THE session fold — the single definition of the gap rule, shared
    * verbatim by the streaming operator (per micro-batch, threading the
    * open session through the state store) and the batch twin
    * [[sessionsBatch]] that the driver's DuckDB gate certifies
    * (`n71_stream_sessions_parity`). Times are epoch MILLIS (the
    * stream's state granularity — `Timestamp.getTime`); `prior` is the
    * open session carried in from the previous micro-batch (None in
    * batch). Returns closed sessions in chronological order plus the
    * still-open tail session. */
  private[graft] def foldSessionTimes(
      times: Seq[Long], gapMs: Long, prior: Option[SessionState])
    : (List[SessionState], Option[SessionState]) = {
    var out = List.empty[SessionState]
    var cur = prior
    times.foreach { t =>
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(s.copy(last = t, n = s.n + 1))
        case Some(s) =>
          out ::= s
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (out.reverse, cur)
  }

  private def toSessionOut(user: Long, s: SessionState): SessionOut =
    SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)

  /** Custom-state sessionization with flatMapGroupsWithState: one state
    * entry per user (start/last/count). A session closes either
    * in-batch (a later event arrives past the gap) or when the EVENT-
    * TIME timeout fires — the watermark passing session_end + gap.
    * Event-time (not processing-time) timeouts keep the operator
    * deterministic and avoid busy-loop empty micro-batches. State size
    * is O(users), independent of event volume — the 100 TB-safe shape.
    */
  def streamingSessions(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(toSessionOut(user, s))
          } else {
            val times = batch.map(_.ts.getTime).toSeq.sorted
            val (closed, open) = foldSessionTimes(times, gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              // must be strictly past the current watermark or Spark
              // rejects the timestamp; the +1 covers late sessions
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map(toSessionOut(user, _))
          }
      }
  }

  /** Batch twin of [[streamingSessions]] — runs the SAME
    * [[foldSessionTimes]] over each user's complete history (prior =
    * None) and flushes the tail session, which is exactly what the
    * stream emits once the watermark passes every event (the event-time
    * timeout). This is the spelling the driver's DuckDB gate checks;
    * EventStreamSpec closes the loop with a stream ≡ batch parity law.
    *
    * Scale shape: one hash shuffle on user_id; per-user event history
    * must fit an executor's working set — true for real users at any
    * corpus size (same envelope as the window-function spelling in
    * [[graft.operators.Sessionize]], which sorts the identical
    * per-user runs). */
  def sessionsBatch(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (user, it) =>
        val times = it.map(_.ts.getTime).toSeq.sorted
        val (closed, open) = foldSessionTimes(times, gapMs, None)
        (closed ++ open.toList).iterator.map(toSessionOut(user, _))
      }
  }

  // --- transformWithState quota admission -----------------------------

  final case class DocArrival(doc_id: Long, source: String)

  /** Per-source admission counter for [[streamingQuotaAdmit]]: one
    * ValueState[Long] per source, no TTL (a corpus quota is lifetime,
    * not sliding). The input iterator is folded EAGERLY before the
    * state update — handleInputRows' iterator is lazy, and deferring
    * the fold past update() would admit a whole batch against the old
    * count. */
  private class QuotaProcessor(quota: Long)
    extends StatefulProcessor[String, DocArrival, DocArrival] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long](
        "admitted", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        source: String,
        rows: Iterator[DocArrival],
        timerValues: TimerValues): Iterator[DocArrival] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = rows.filter { _ =>
        val ok = n < quota
        if (ok) n += 1
        ok
      }.toList
      admitted.update(n)
      out.iterator
    }
  }

  /** Streaming per-source quota admission — the streaming twin of the
    * n23 batch quota dedup, on Spark 4's transformWithState arbitrary-
    * state API: admit documents from each source only until its corpus
    * quota is filled, state = ONE long per source (O(sources), not
    * O(docs) — the 100 TB-safe shape), carried across micro-batches and
    * restarts by the state store (requires the RocksDB provider, which
    * transformWithState mandates). Admission order inside a micro-batch
    * follows arrival order per partition; cross-batch the counter is
    * exact.
    */
  def streamingQuotaAdmit(
      spark: SparkSession,
      docs: Dataset[DocArrival],
      perSourceQuota: Long): Dataset[DocArrival] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(
        new QuotaProcessor(perSourceQuota), TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of [[streamingQuotaAdmit]] for the driver's DuckDB gate
    * (`n72_stream_quota_parity`): when arrival order is doc_id order
    * (how EventStreamSpec feeds the stream), "admit until the source's
    * counter reaches the quota" is exactly "the quota lowest doc_ids
    * per source" — a per-source row_number cut, the same shuffle-once
    * windowed shape as the n23 quota dedup. EventStreamSpec closes the
    * loop with a stream ≡ batch parity law over the same arrival
    * order. */
  def quotaAdmitBatch(docs: DataFrame, perSourceQuota: Long): DataFrame =
    docs
      .withColumn("graft__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("graft__rn") <= perSourceQuota)
      .select(col("doc_id"), col("source"))

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelRow(
      user_id: Long,
      first_view: Option[Timestamp],
      first_purchase: Option[Timestamp])
  /** micros since epoch, -1 = unset. Public for the same
    * Janino-accessibility reason as [[LastEvent]]. */
  final case class FunnelState(view: Long, conv: Long)

  private def tsMicros(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  private def microsTs(m: Long): Option[Timestamp] =
    if (m < 0) None
    else {
      val t = new Timestamp(m / 1000L)
      t.setNanos((m % 1000000L).toInt * 1000)
      Some(t)
    }

  /** Per-user funnel progression for [[streamingFunnel]]: state is TWO
    * longs per user (first view micros, first qualifying purchase
    * micros) — O(users), constant in event volume. Each micro-batch's
    * rows for a user are buffered and folded in EVENT-TIME order (the
    * sessions discipline: handleInputRows' arrival order within a
    * batch is partition-dependent), so within-batch disorder cannot
    * flip a conversion. Across batches the fold is exact whenever each
    * user's purchases arrive after that user's first view has arrived
    * (event-time-ordered feeds trivially satisfy this); a purchase
    * that arrived before a LATER-arriving earlier view is the one case
    * the two-long state cannot re-admit — buffering all purchases
    * would make state O(events), the 100 TB-unsafe shape.
    */
  private class FunnelProcessor
    extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L)
      // Tie-break equal timestamps by type (views before purchases):
      // the batch twin counts a purchase with ts == first_view, so a
      // same-ts pair must fold view-first regardless of arrival order.
      val evs = rows.toArray.sortBy(e =>
        (tsMicros(e.ts), if (e.event_type == "view") 0 else 1))
      evs.foreach { e =>
        val m = tsMicros(e.ts)
        e.event_type match {
          case "view" if s.view < 0 || m < s.view => s = s.copy(view = m)
          case "purchase" if s.view >= 0 && m >= s.view &&
            (s.conv < 0 || m < s.conv) => s = s.copy(conv = m)
          case _ => ()
        }
      }
      st.update(s)
      if (s.view < 0) Iterator.empty
      else Iterator.single(
        FunnelRow(user, microsTs(s.view), microsTs(s.conv)))
    }
  }

  /** Streaming conversion funnel — the streaming twin of the n65 batch
    * funnel's per-user stage relation: for every user, the first view
    * and the first purchase at-or-after it, maintained across
    * micro-batches by the state store (transformWithState, RocksDB).
    * Emits the user's current funnel snapshot each batch their state
    * advances — a changelog the downstream rollup (or the spec's
    * last-row-per-user read) consumes. EventStreamSpec proves
    * stream ≡ [[funnelBatch]] on the same feed. */
  def streamingFunnel(
      spark: SparkSession,
      events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of [[streamingFunnel]] for the driver's DuckDB gate
    * (`n106_stream_funnel_parity`): first view per user (one grouped
    * min), first qualifying purchase via a user-co-partitioned join +
    * grouped min — n65's per-user stage relation WITHOUT the global
    * rollup, which is exactly the state the streaming processor
    * carries. */
  def funnelBatch(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val conv = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(views, Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase"))
    views.join(conv, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view"), col("first_purchase"))
  }

  /** Streaming frequency sketch — the streaming twin of the n49 CMS
    * heavy-hitters: the SAME CountMinSketchAgg the batch query runs,
    * as a sharded STREAMING aggregation. Each shard's sketch is a
    * fixed-size long array updated per micro-batch by the state store;
    * state is O(shards × depth × width) — constant in stream length,
    * the 100 TB/day-safe shape. Sharding by the key hash spreads
    * sketch updates across partitions (a single global sketch key
    * would funnel every row through one state partition); the final
    * global sketch is the ELEMENT-WISE SUM of shard sketches, exact
    * and order-independent because every CMS cell is a plain count —
    * which is precisely why stream ≡ batch holds bit-for-bit
    * regardless of micro-batch boundaries (EventStreamSpec pins it).
    * Query in complete mode; estimates via
    * [[graft.functions.SketchAggregates.cmsEstimate]] over the merged
    * array. `hash31Col` must hold the same 31-bit nonnegative hash the
    * batch sketch is built over. */
  def streamingCms(
      stream: DataFrame,
      hash31Col: String,
      shards: Int,
      depth: Int,
      width: Int): DataFrame =
    stream
      .groupBy(pmod(col(hash31Col), lit(shards.toLong)).as("shard"))
      .agg(expr(s"graft_cms($hash31Col, $depth, $width)").as("cms"))

  // ------------------------------------------------------------------
  // First-order transition matrix (the behavioral Markov family)
  // ------------------------------------------------------------------

  /** Per-user consecutive (from_type, to_type) pairs in (ts, event_id)
    * total order — the transition occurrences the matrix counts. */
  def transitionPairs(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .select(col("from_type"), col("to_type"))
  }

  /** Row-normalized transition matrix over a pair stream: exact counts
    * and exact-integer probability ratios; from-type totals are a
    * k×k-sized aggregate joined back as a broadcast. */
  def transitionMatrix(pairs: DataFrame): DataFrame = {
    val c = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("from_type")).agg(sum(col("n")).as("graft__t"))
    c.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("graft__t")).as("p"))
  }

  /** The BATCH SPELLING of streaming transition maintenance: fold
    * event-time-ordered micro-batches, carrying each user's LAST event
    * across the boundary so the pair that straddles two batches is
    * counted exactly once — the state [[TransitionProcessor]] keeps in
    * the state store, spelled as a one-row-per-user carry relation.
    * With time-ordered batches, fold(batches) ≡ whole-stream
    * [[transitionPairs]] (the n124 build∘refresh ≡ rebuild argument:
    * within-batch pairs plus boundary pairs partition the consecutive-
    * pair set); the n138 gate proves it against the whole-corpus
    * oracle. Carry is O(users) — the same constant-in-volume bound as
    * the processor's state. */
  def transitionsBatchFold(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    val fields = Seq("user_id", "ts", "event_id", "event_type")
    var carry: DataFrame = null
    var pairs: DataFrame = null
    batches.foreach { b0 =>
      val b = b0.select(fields.map(col): _*)
      val aug = if (carry == null) b else b.unionByName(carry)
      val p = transitionPairs(aug)
      pairs = if (pairs == null) p else pairs.unionByName(p)
      carry = aug.groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("graft__last"))
        .select(col("user_id"), col("graft__last.ts").as("ts"),
          col("graft__last.event_id").as("event_id"),
          col("graft__last.event_type").as("event_type"))
    }
    transitionMatrix(pairs)
  }

  final case class TransitionEvent(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  final case class TransitionOut(
      user_id: Long, from_type: String, to_type: String)
  // state case classes are PUBLIC on purpose: `private` nested classes
  // are inaccessible to the Janino-generated (de)serializer projections
  // of Encoders.product, so every state read/write falls back to the
  // interpreter (WARN UnsafeProjection ... "No applicable
  // constructor/method found" / "Private member cannot be accessed")
  final case class LastEvent(
      micros: Long, event_id: Long, event_type: String)

  /** Per-user transition emitter for [[streamingTransitions]]: state is
    * ONE row per user (its last event in (ts, event_id) order) —
    * O(users), constant in stream length. Batch rows are folded in
    * event-time order (the sessions/funnel discipline: arrival order
    * within a batch is partition-dependent), so within-batch disorder
    * cannot flip a transition; across batches the fold is exact for
    * event-time-ordered feeds, the same contract the batch spelling
    * ([[transitionsBatchFold]]) makes explicit. */
  private class TransitionProcessor
    extends StatefulProcessor[Long, TransitionEvent, TransitionOut] {
    @transient private var st: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LastEvent](
        "last", Encoders.product[LastEvent], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[TransitionEvent],
        timerValues: TimerValues): Iterator[TransitionOut] = {
      var last = if (st.exists()) Some(st.get()) else None
      val out = Seq.newBuilder[TransitionOut]
      rows.toArray.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        last.foreach(l => out += TransitionOut(user, l.event_type, e.event_type))
        last = Some(LastEvent(tsMicros(e.ts), e.event_id, e.event_type))
      }
      last.foreach(st.update)
      out.result().iterator
    }
  }

  /** Streaming twin of [[transitionPairs]]: emits one row per observed
    * transition as it happens (a changelog the downstream matrix
    * aggregation consumes), with the cross-batch boundary pair counted
    * exactly once via the per-user last-event state.
    * StreamingTransitionsSpec proves stream ≡ batch on the same feed,
    * including through a checkpointed restart. */
  def streamingTransitions(
      spark: SparkSession,
      events: Dataset[TransitionEvent]): Dataset[TransitionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TransitionProcessor, TimeMode.None(), OutputMode.Append())
  }

  // ---- inter-arrival regularity (the n167 bot signal), streaming ----

  /** Whole-second inter-arrival gaps per user — the batch spelling:
    * per-user lag window in (ts, event_id) order, gap =
    * floor-seconds(ts) − floor-seconds(prev ts) (the unix_timestamp /
    * date_diff('second') cookbook identity). One row per consecutive
    * pair; first events emit nothing. */
  def gapRows(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_s"))
      .filter(col("gap_s").isNotNull)
  }

  /** Per-user gap partials (graft__ng, span_s, graft__g2) — the
    * MERGEABLE summary the regularity test needs: counts and exact
    * integer sums add across any partition of the gap multiset, which
    * is what lets [[regularityBatchFold]] carry users-sized state
    * instead of the raw gap stream. */
  private def gapPartials(gaps: DataFrame): DataFrame =
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("graft__ng"),
        sum(col("gap_s")).as("span_s"),
        sum(col("gap_s") * col("gap_s")).as("graft__g2"))

  /** The report over already-folded per-user partials + event counts:
    * exact-integer dispersion disp2 = n·Σg² − (Σg)² and the CV≤0.1
    * test as 100·disp2 ≤ (Σg)² (see n167). */
  private def reportFromPartials(
      events: DataFrame, partials: DataFrame, minGaps: Long): DataFrame = {
    val counts = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    partials
      .filter(col("graft__ng") >= minGaps)
      .join(counts, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("span_s"),
        (col("graft__ng") * col("graft__g2") - col("span_s") * col("span_s"))
          .as("disp2"),
        (lit(100L) * (col("graft__ng") * col("graft__g2") -
          col("span_s") * col("span_s")) <=
          col("span_s") * col("span_s")).as("is_bot"))
  }

  /** The regularity report over a gap relation + the raw event counts:
    * exact-integer dispersion disp2 = n·Σg² − (Σg)² and the CV≤0.1
    * test as 100·disp2 ≤ (Σg)² (see n167). */
  def regularityReport(
      events: DataFrame, gaps: DataFrame, minGaps: Long): DataFrame =
    reportFromPartials(events, gapPartials(gaps), minGaps)

  /** Batch-fold spelling of the streaming gap maintenance: per batch,
    * gaps are computed over the batch PLUS each user's carried last
    * event, so the cross-batch boundary gap is emitted exactly once —
    * the carry row itself contributes only as a lag predecessor (its
    * own gap was emitted by the batch that saw it). Exact for
    * event-time-ordered batch cuts (the transitionsBatchFold
    * contract); EventStreamSpec proves the real transformWithState
    * stream emits the identical gap multiset.
    *
    * State discipline: the fold carries (a) the per-user last stamp and
    * (b) per-user gap PARTIALS (count / Σg / Σg² — mergeable exact
    * integers, so folding per batch ≡ aggregating the whole gap
    * stream), both users-sized, both checkpointed each round with the
    * superseded blocks released (the labelPropagationTrain
    * checkpoint/release discipline). Without it, each round's carry is
    * a lazy plan over every prior round, so evaluation cost is O(n²)
    * in batch count and lineage grows unboundedly. */
  def regularityBatchFold(
      batches: Seq[DataFrame], minGaps: Long): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    val sc = batches.head.sparkSession.sparkContext
    val fields = Seq("user_id", "ts", "event_id")
    var carry: DataFrame = null
    var partials: DataFrame = null
    var held: scala.collection.Set[Int] = Set.empty
    batches.zipWithIndex.foreach { case (b0, i) =>
      val last = i == batches.length - 1
      val b = b0.select(fields.map(col): _*)
      val aug = if (carry == null) b else b.unionByName(carry)
      val gp = gapPartials(gapRows(aug))
      val next = if (partials == null) gp
        else partials.unionByName(gp)
          .groupBy(col("user_id"))
          .agg(sum(col("graft__ng")).as("graft__ng"),
            sum(col("span_s")).as("span_s"),
            sum(col("graft__g2")).as("graft__g2"))
      // the final round's partials stay lazy (consumed once by the
      // report below); intermediate rounds checkpoint both state
      // relations and release the previous round's blocks — everything
      // the released blocks fed (this round's partials and carry) is
      // materialized first, so nothing live can need a recompute
      if (last) {
        partials = next
        carry = null
      } else {
        val (pCk, pIds, _) = IterationCheckpoint.localCounted(next)
        val (cCk, cIds, _) = IterationCheckpoint.localCounted(
          aug.groupBy(col("user_id"))
            .agg(max(struct(col("ts"), col("event_id"))).as("graft__last"))
            .select(col("user_id"), col("graft__last.ts").as("ts"),
              col("graft__last.event_id").as("event_id")))
        IterationCheckpoint.release(sc, held)
        held = pIds ++ cIds
        partials = pCk
        carry = cCk
      }
    }
    val all = batches.map(_.select(fields.map(col): _*)).reduce(_ unionByName _)
    reportFromPartials(all, partials, minGaps)
  }

  final case class StampedEvent(user_id: Long, ts: Timestamp, event_id: Long)
  final case class GapOut(user_id: Long, gap_s: Long)
  // public for the same Janino-accessibility reason as [[LastEvent]]
  final case class LastStamp(micros: Long, event_id: Long)

  /** Per-user gap emitter — the streaming twin of [[gapRows]]: state is
    * ONE (micros, event_id) stamp per user (16 bytes — O(users),
    * constant in stream length); batch rows fold in (ts, event_id)
    * order so within-batch arrival disorder cannot flip a gap, and the
    * cross-batch boundary gap is emitted exactly once from the carried
    * stamp. Gap arithmetic floors each timestamp to seconds BEFORE
    * subtracting, mirroring the batch unix_timestamp spelling
    * bit-for-bit. */
  private class RegularityProcessor
    extends StatefulProcessor[Long, StampedEvent, GapOut] {
    @transient private var st: ValueState[LastStamp] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LastStamp](
        "stamp", Encoders.product[LastStamp], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[StampedEvent],
        timerValues: TimerValues): Iterator[GapOut] = {
      var last = if (st.exists()) Some(st.get()) else None
      val out = Seq.newBuilder[GapOut]
      rows.toArray.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val m = tsMicros(e.ts)
        last.foreach { l =>
          out += GapOut(user,
            Math.floorDiv(m, 1000000L) - Math.floorDiv(l.micros, 1000000L))
        }
        last = Some(LastStamp(m, e.event_id))
      }
      last.foreach(st.update)
      out.result().iterator
    }
  }

  /** Streaming twin of [[gapRows]] — a changelog of observed gaps the
    * downstream regularity aggregation consumes. */
  def streamingGaps(
      spark: SparkSession,
      events: Dataset[StampedEvent]): Dataset[GapOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RegularityProcessor, TimeMode.None(), OutputMode.Append())
  }
}
