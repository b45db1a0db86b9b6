package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming realization of the engine's incremental side
  * (SURVEY.md §7.1 item 4): the reference is a forward-only single-pass
  * processor (reference Parser.cs:119-208); its distributed analog is a
  * streaming source + incremental operators + watermark-bounded state.
  *
  * Scale: the file source lists and splits files across executors; windowed
  * aggregations keep state only within the watermark horizon; sessionization
  * state is per-key and evicted on event-time timeout.
  */
object StreamOps {

  /** Streaming view of the events table, normalized to micros-precision
    * TimestampType exactly like `Tables.events`. A streaming file source
    * needs an explicit schema, and the fixture's `ts` encoding has changed
    * across generations (int64 nanos vs timestamp[us]); forcing one
    * encoding silently mis-scales the other (a micros value divided by
    * 1000 lands every event in 1970). So probe the actual footer schema
    * with a batch read (metadata-only, no row scan) and feed THAT to the
    * stream, then normalize. */
  /** Per-JVM cache of validated events dirs: the sanity probe is one
    * aggregate job, and gates that stream two sides (the join family)
    * would otherwise pay it twice per construction × reps in the bench.
    * Fixtures are immutable within a process lifetime. */
  private val probedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def eventsStream(sp: SparkSession, dir: String): DataFrame = {
    // Input-sanity tripwire (round 7 post-mortem): a mis-scaled ts corpus
    // collapsed every event into two 1970 windows and the gates handed the
    // driver hashable WRONG answers instead of errors. Refuse to build the
    // stream unless the normalized event times are plausible: min after
    // 2000-01-01 and a span wider than 2 h (> 2 distinct hourly windows).
    // Cost: one aggregate scan of a single narrow column, once per dir per
    // JVM — negligible beside any streaming gate's state machinery.
    val bound = probedDirs.computeIfAbsent(dir, { d =>
      val raw = sp.read.parquet(s"$d/events.parquet")
      val b = graft.Tables.normalizeTs(raw)
        .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).collect()(0)
      val (mn, mx) = (b.getTimestamp(0), b.getTimestamp(1))
      require(mn != null && mn.getTime >= 946684800000L && // 2000-01-01 UTC
        mx.getTime - mn.getTime > 2L * 3600 * 1000,
        s"events time corpus implausible: span [$mn, $mx] — mis-scaled ts " +
          "fixture? refusing to stream a collapsed-timestamp corpus")
      raw.schema
    })
    graft.Tables.normalizeTs(
      sp.readStream.schema(bound)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(dir))
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state. */
  def windowedAgg(events: DataFrame, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))

  /** Streaming gap-based sessionization: merges events into per-user
    * sessions incrementally as micro-batches arrive, with the watermark
    * bounding session state (a session whose close precedes the watermark
    * can never grow again and is finalized/evicted). This is the streaming
    * twin of the batch `session_window` aggregation (gate s2) — same
    * semantics, incremental state instead of a sort. */
  def sessionAgg(events: DataFrame, gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))

  /** Streaming exact dedup with watermark-bounded state: duplicates of a
    * key are dropped as long as they arrive within the watermark horizon,
    * and the key state is evicted afterwards — the only dedup that is safe
    * on an unbounded stream. */
  def streamingDedup(events: DataFrame, keys: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment join: each micro-batch joins the (broadcast)
    * static dimension — STATELESS, unlike stream-stream joins: no
    * watermark, no join state, the static side is just re-read/broadcast
    * per batch. This is the dimension-enrichment shape (events x user
    * table) that should never be written as a stream-stream join. */
  def staticEnrich(stream: DataFrame, dim: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    stream.join(broadcast(dim), cond)

  /** Stream-stream INNER join with event-time bounds: each left row joins
    * right rows of the same key whose timestamp falls in
    * [left.ts, left.ts + maxDelay]. Both sides carry watermarks so the join
    * state is evictable — the only way a stream-stream join stays bounded on
    * an unbounded stream (left rows older than watermark + maxDelay can
    * never match future right rows and are dropped).
    *
    * `left` needs columns (key, ts); `right` (rkey, rts); all four are
    * preserved in the output alongside the payload columns. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, watermark: String,
      maxDelay: String): DataFrame =
    left.withWatermark("ts", watermark)
      .join(right.withWatermark("rts", watermark),
        col("key") === col("rkey") &&
          col("rts") >= col("ts") &&
          col("rts") <= col("ts") + expr(s"interval $maxDelay"),
        "inner")

  /** Stream-stream LEFT OUTER join, same key + event-time bounds as
    * [[streamStreamJoin]]. Matches emit immediately (inner path); an
    * UNMATCHED left row emits its null-extended row only once BOTH
    * watermarks pass the end of its join window (ts + maxDelay) — before
    * that a matching right row could still arrive, after that the state is
    * evicted. This is the streaming form of "enrich if the lookup ever
    * arrives, emit unenriched otherwise", with state bounded exactly like
    * the inner join's. Left rows still inside the horizon when the input
    * ends stay pending (correct on an unbounded stream); a finite-input
    * gate must account for that tail in its oracle. */
  def streamStreamOuterJoin(left: DataFrame, right: DataFrame,
      watermark: String, maxDelay: String): DataFrame =
    left.withWatermark("ts", watermark)
      .join(right.withWatermark("rts", watermark),
        col("key") === col("rkey") &&
          col("rts") >= col("ts") &&
          col("rts") <= col("ts") + expr(s"interval $maxDelay"),
        "left_outer")

  /** Stream-stream LEFT SEMI join, same key + event-time bounds as
    * [[streamStreamJoin]]: a left row emits ONCE when its first in-window
    * match arrives, never duplicates per match, and never emits without a
    * match — "the views that ever converted", state bounded exactly like
    * the inner join's. */
  def streamStreamSemiJoin(left: DataFrame, right: DataFrame,
      watermark: String, maxDelay: String): DataFrame =
    left.withWatermark("ts", watermark)
      .join(right.withWatermark("rts", watermark),
        col("key") === col("rkey") &&
          col("rts") >= col("ts") &&
          col("rts") <= col("ts") + expr(s"interval $maxDelay"),
        "left_semi")

  /** Stream-stream FULL OUTER join, same key + event-time bounds as
    * [[streamStreamJoin]] — completes the join matrix (inner / left
    * outer / semi / anti / full). Matches emit immediately; an unmatched
    * LEFT row null-extends once both watermarks pass its match-window
    * end (ts + maxDelay, the s12 rule); an unmatched RIGHT row
    * null-extends once the watermark passes its OWN event time — the
    * condition `rts >= ts` means a right row at rts can only match left
    * rows with ts ≤ rts, so rts below the watermark is proof no future
    * match exists. Both sides' state evicts on exactly those bounds, so
    * memory stays (delay + maxDelay)-windowed on each side. */
  def streamStreamFullOuterJoin(left: DataFrame, right: DataFrame,
      watermark: String, maxDelay: String): DataFrame =
    left.withWatermark("ts", watermark)
      .join(right.withWatermark("rts", watermark),
        col("key") === col("rkey") &&
          col("rts") >= col("ts") &&
          col("rts") <= col("ts") + expr(s"interval $maxDelay"),
        "full_outer")

  /** Stream-stream LEFT OUTER join on a TWO-SIDED event-time interval —
    * the ad-attribution shape the one-sided [ts, ts + maxDelay] family
    * above doesn't cover: each left row (conversion) joins right rows
    * (impressions) of the same key with rts ∈ [ts − before, ts + after]
    * — the impression may PRECEDE the conversion by up to `before` or
    * trail it (clock skew, late beacon) by up to `after`. Watermark
    * delays are PER SIDE; Spark's global watermark is the min across
    * both watermark operators, and the interval bounds tie each side's
    * state to it: a left row is provably unmatchable once the global
    * watermark passes ts + after (no in-window right row can still
    * arrive) — at that instant an unmatched left row null-extends and
    * its state evicts; a right row evicts once the watermark passes
    * rts + before (no future left row's window can reach back to it).
    * Memory therefore stays (delay + interval)-windowed on each side on
    * an unbounded stream. */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      leftWatermark: String, rightWatermark: String,
      before: String, after: String,
      joinType: String = "left_outer"): DataFrame =
    left.withWatermark("ts", leftWatermark)
      .join(right.withWatermark("rts", rightWatermark),
        col("key") === col("rkey") &&
          col("rts") >= col("ts") - expr(s"interval $before") &&
          col("rts") <= col("ts") + expr(s"interval $after"),
        joinType)

  /** Stream-stream LEFT ANTI join, same key + event-time bounds as
    * [[streamStreamJoin]]. Structured Streaming's join surface covers
    * inner/outer/semi but NOT anti, so the correct composition is the
    * LEFT OUTER join filtered to its null-extended rows: a left row emits
    * exactly once, and only after BOTH watermarks pass the end of its
    * match window (before that a matching right row could still arrive —
    * the outer join's emission rule IS the anti join's correctness proof).
    * The filter is stateless, so state stays bounded exactly like the
    * outer join's. */
  def streamStreamAntiJoin(left: DataFrame, right: DataFrame,
      watermark: String, maxDelay: String): DataFrame =
    streamStreamOuterJoin(left, right, watermark, maxDelay)
      .filter(col("rkey").isNull)

  /** CUSTOM streaming state through the arbitrary-state API
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): a per-key
    * cumulative (count, sum-of-cents) counter. Each micro-batch folds its
    * rows for a key into the key's `GroupState` and emits the RUNNING
    * total — the hand-rolled form of a streaming aggregation, which is
    * exactly what the API is for when the built-in aggregates can't
    * express the state transition (counters are the minimal deterministic
    * example; the same shape carries ML feature state, fraud windows,
    * etc.).
    *
    * Scale: state is per-key (two longs here) and lives in the state
    * store, partitioned by key hash across executors; each micro-batch
    * shuffles only its own rows. Input is (key, cents) — callers convert
    * values to exact integer cents IN Spark SQL so no floating-point
    * arithmetic enters the state transition. */
  def runningTotals(pairs: org.apache.spark.sql.Dataset[(Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, c) => n += 1; cents += c }
          state.update((n, cents))
          Iterator((key, n, cents))
      }
  }

  /** [[runningTotals]]'s state transition re-expressed through Spark 4's
    * ARBITRARY-STATE API (`KeyValueGroupedDataset.transformWithState` +
    * [[org.apache.spark.sql.streaming.StatefulProcessor]]): the
    * replacement for `flatMapGroupsWithState` a Spark-4 user is steered
    * to first, with typed state handles (Value/List/MapState), native
    * TTL, and event-time/processing-time timers. This processor uses one
    * `ValueState[(Long, Long)]` per key — the minimal deterministic
    * transition — so the gate's answer is comparable to s10's and both
    * APIs are pinned against the same oracle.
    *
    * Scale: identical posture to [[runningTotals]] — per-key state in the
    * state store (transformWithState REQUIRES the RocksDB provider, the
    * off-heap store that survives 100 TB keyed state), hash-partitioned
    * across executors, each micro-batch shuffling only its own rows. */
  class TwsRunningTotals
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator((key, n, cents))
    }
  }

  /** Batch-snapshot WARM-START for transformWithState — the one API leg
    * the rest of the TWS ladder (ValueState s22, MapState s23, ListState
    * s27, timers s24, TTL s26) doesn't touch: a
    * `StatefulProcessorWithInitialState` whose `handleInitialState`
    * seeds each key's state from a BATCH dataset before the first
    * micro-batch processes a row. This is the migration path every
    * production stateful job needs when it goes live on top of history —
    * a nightly batch aggregate becomes the day-one state and the stream
    * folds on top — and the only way to re-shape keyed state that a
    * checkpoint cannot carry forward (checkpoint state formats are tied
    * to the old processor). Contract: each initial-state key gets
    * exactly one `handleInitialState` call at query start; snapshot-only
    * keys hold silent state (no phantom emissions until a stream row
    * arrives); stream-only keys start from (0, 0) exactly as in
    * [[TwsRunningTotals]].
    *
    * Scale: the snapshot is a first-batch co-partitioned shuffle into
    * the state store's hash partitioning — O(|keys|) state, the same
    * cost the stream path pays, nothing broadcast or collected. At
    * 100 TB the snapshot is itself the output of a distributed batch
    * aggregate; this operator is the handoff between the two worlds. */
  class TwsWarmStartTotals
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long), (Long, Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInitialState(key: Long, initial: (Long, Long),
        timers: org.apache.spark.sql.streaming.TimerValues): Unit =
      totals.update(initial)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator((key, n, cents))
    }
  }

  /** [[TwsRunningTotals]] semantics seeded from a batch snapshot of
    * (key, n0, cents0) rows via [[TwsWarmStartTotals]] — emissions are
    * cumulative over snapshot + stream. Requires the RocksDB provider
    * like every transformWithState entry point. */
  def runningTotalsWarmStart(
      pairs: org.apache.spark.sql.Dataset[(Long, Long)],
      snapshot: org.apache.spark.sql.Dataset[(Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsWarmStartTotals,
        TimeMode.None(), OutputMode.Update(),
        snapshot.groupByKey(_._1).mapValues(r => (r._2, r._3)))
  }

  /** Per-key cumulative (count, cents) totals via [[TwsRunningTotals]].
    * Same contract as [[runningTotals]]; requires the session to run the
    * RocksDB state store provider (transformWithState rejects the
    * default HDFS-backed store). */
  def runningTotalsTws(pairs: org.apache.spark.sql.Dataset[(Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsRunningTotals,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-key CATEGORY HISTOGRAM through transformWithState's MapState —
    * the third typed-state primitive beside s22's ValueState and the
    * timer spec's session state: each micro-batch folds its rows into a
    * per-(user, category) counter kept as `MapState[String, Long]`, and
    * the batch emits the key's full current histogram (update-mode
    * running totals, one row per category). Map entries are point-read/
    * point-written — the state store never materializes the whole map to
    * update one category, which is the reason MapState exists (a
    * ValueState[Map] would rewrite the full map per batch; at
    * 100 TB-state scale with wide maps that is the difference between
    * O(1) and O(|map|) per update). Additions are order-insensitive, so
    * the emission is deterministic under any shuffle arrival order. */
  class TwsCategoryCounts
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), (Long, String, Long)] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode,
      TTLConfig}
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, String, Long)] = {
      rows.foreach { case (_, cat) =>
        val cur = if (counts.containsKey(cat)) counts.getValue(cat) else 0L
        counts.updateValue(cat, cur + 1L)
      }
      // snapshot eagerly: the store-backed iterator must not be consumed
      // after the handler returns
      counts.iterator().map { case (cat, n) => (key, cat, n) }
        .toVector.iterator
    }
  }

  /** Per-key BOUNDED RECENT-EVENT BUFFER through transformWithState's
    * ListState — the fourth typed-state primitive (ValueState s22,
    * MapState s23, timers s24, TTL s26): each key keeps its `n` most
    * recent (eventTimeMicros, cents) pairs, the "last N events per
    * user" feature a ranker/fraud model reads at serving time. ListState
    * exists because RocksDB implements `appendValue/appendList` as
    * APPEND-ONLY writes — the common no-overflow batch costs O(batch),
    * not O(buffer) (a ValueState[Seq] rewrites the whole buffer every
    * batch); only an overflowing batch pays the `put()` rewrite of n
    * entries. Recency is by EVENT TIME (ties by cents), not arrival:
    * each batch merges state + its rows in (micros, cents) order and
    * keeps the largest n — incremental top-n is exact because trimmed
    * entries are strictly below the kept minimum and later input only
    * adds, so the final buffer equals the global per-key top-n no matter
    * how batches slice. Emits (key, nSeen, "us:cents,..." ascending);
    * `nSeen` strictly increases per key, so max(struct(nSeen, recent))
    * is the deterministic final-state readout. */
  class TwsRecentEvents(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, java.sql.Timestamp), (Long, Long, String)] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode,
      TTLConfig, ValueState}
    @transient private var recent: ListState[(Long, Long)] = _
    @transient private var seen: ValueState[Long] = _
    private def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[(Long, Long)]("recent",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, String)] = {
      val batch = rows.toArray.map(r => (micros(r._3), r._2)).sorted
      val total = (if (seen.exists()) seen.get() else 0L) + batch.length
      seen.update(total)
      // snapshot eagerly: the store-backed iterator must not outlive the
      // handler (the TwsCategoryCounts discipline)
      val cur = recent.get().toVector
      val out: Vector[(Long, Long)] =
        if (cur.size + batch.length <= n && cur.lastOption.forall(last =>
            batch.headOption.forall(b =>
              implicitly[Ordering[(Long, Long)]].lteq(last, b)))) {
          // fast path: no overflow and the batch extends the buffer in
          // order — pure append, no rewrite
          recent.appendList(batch)
          cur ++ batch
        } else {
          val merged = (cur ++ batch).sorted.takeRight(n)
          recent.put(merged.toArray)
          merged
        }
      Iterator((key, total,
        out.map { case (us, c) => s"$us:$c" }.mkString(",")))
    }
  }

  /** Per-key TOKEN-BUCKET ADMISSION CONTROL through transformWithState —
    * the streaming throttle/quota primitive (rate-limit a crawler per
    * domain, cap per-user ingest, bound per-tenant quota): each key owns
    * a bucket of `capacity` tokens that regenerates one token every
    * `periodUs` microseconds of EVENT time; an event is ADMITTED iff a
    * whole token is available, and consumes it. Event-time refill (not
    * wall clock) makes the decision a pure function of the data, so the
    * operator is replayable and the oracle can recompute every verdict.
    *
    * Exactness: token state is held in µtoken units where 1 token =
    * `periodUs` units — refill is then `min(cap, tok + Δus)` and
    * admission costs `periodUs`, ALL integer arithmetic, no division
    * and no float drift. Rows are processed per key in (eventTimeUs,
    * eventId) order within each batch; a non-increasing timestamp
    * contributes zero refill (late rows never un-refill). With the
    * producer feeding batches in event-time order (the s19 gate
    * discipline) the per-key sequence is globally ordered and the
    * verdict stream is deterministic.
    *
    * State per key: ONE (µtokens, lastUs) pair — O(keys) total, the
    * bounded-state contract; emits one (key, eventId, admitted,
    * µtokensAfter) row per input row, exactly once. */
  class TwsTokenBucket(capacity: Long, periodUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, java.sql.Timestamp), (Long, Long, Boolean, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    require(capacity >= 1 && periodUs >= 1,
      s"token bucket needs capacity >= 1 and periodUs >= 1, " +
        s"got ($capacity, $periodUs)")
    require(capacity <= Long.MaxValue / periodUs,
      s"capacity * periodUs must fit in a Long, " +
        s"got ($capacity, $periodUs)")
    @transient private var bucket: ValueState[(Long, Long)] = _
    private def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bucket = getHandle.getValueState[(Long, Long)]("bucket",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Boolean, Long)] = {
      val full = capacity * periodUs
      val batch = rows.toArray.map(r => (micros(r._3), r._2)).sorted
      var (tok, last) =
        if (bucket.exists()) bucket.get() else (full, Long.MinValue)
      val out = batch.map { case (us, eid) =>
        if (last != Long.MinValue && us > last) {
          tok = math.min(full, tok + (us - last))
          last = us
        } else if (last == Long.MinValue) last = us
        val admitted = tok >= periodUs
        if (admitted) tok -= periodUs
        (key, eid, admitted, tok)
      }
      bucket.update((tok, last))
      out.iterator
    }
  }

  /** Token-bucket admission via [[TwsTokenBucket]]; input (key, eventId,
    * eventTime), update-mode emissions, RocksDB provider required as for
    * every transformWithState query. TimeMode.None — refill rides event
    * time inside the rows, no timers — so `processAllAvailable` works
    * normally. */
  def tokenBucketTws(
      rows: org.apache.spark.sql.Dataset[(Long, Long, java.sql.Timestamp)],
      capacity: Long, periodUs: Long)
      : org.apache.spark.sql.Dataset[(Long, Long, Boolean, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new TwsTokenBucket(capacity, periodUs),
        TimeMode.None(), OutputMode.Update())
  }

  /** Last-`n`-events-per-key feature via [[TwsRecentEvents]]; input
    * (key, cents, eventTime), update-mode emissions, RocksDB provider
    * required as for every transformWithState query. TimeMode.None —
    * no timers, no TTL — so `processAllAvailable` works normally. */
  def recentEventsTws(
      rows: org.apache.spark.sql.Dataset[(Long, Long, java.sql.Timestamp)],
      n: Int): org.apache.spark.sql.Dataset[(Long, Long, String)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new TwsRecentEvents(n),
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user event-type running histogram via [[TwsCategoryCounts]];
    * requires the RocksDB provider like every transformWithState query. */
  def categoryCountsTws(pairs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[(Long, String, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsCategoryCounts,
        TimeMode.None(), OutputMode.Update())
  }

  /** Event-time SESSION EXPIRY through transformWithState's TIMER surface
    * (the capability `flatMapGroupsWithState` never had as a first-class
    * API), with BOTH emission paths of a production sessionizer:
    *
    *  - **in-flow split** — a batch's rows are processed in event-time
    *    order; a row at `>= maxTs + gap` finalizes and EMITS the open
    *    session immediately and starts a new one. Without this, two
    *    sessions separated by more than the gap but delivered in one
    *    micro-batch would silently merge (batch boundaries are an
    *    operational accident; session boundaries are data);
    *  - **idle expiry** — each batch re-arms an event-time timer at
    *    `maxTs + gap`; when the WATERMARK passes it, `handleExpiredTimer`
    *    fires exactly once, emits the finalized (key, n, cents, closeMs)
    *    row, and clears the state. Per-key state therefore lives only
    *    until gap past the key's last event — the sessionization eviction
    *    contract expressed with timers instead of `session_window`.
    *
    * Input: (key, cents, eventTime) with the event-time column
    * watermarked by the caller; append semantics. A cross-batch late row
    * (above the watermark, below the open session's maxTs) extends the
    * open session. Per-batch-per-key rows are buffered for the sort —
    * bounded by one key's volume within one micro-batch, the same bound
    * any per-key batch processing carries. */
  class TwsSessionExpiry(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, java.sql.Timestamp), (Long, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var sess: ValueState[(Long, Long, Long)] = _
    // Session-boundary arithmetic runs at MICROSECOND precision — the
    // native resolution of the event timestamps. Timestamp.getTime is
    // millisecond-truncated; comparing gaps at ms while the oracle
    // compares full-precision timestamps would split/merge sessions
    // differently within 1 ms of an exact gap boundary (and mis-sort
    // same-millisecond rows). Timers stay ms (Spark's timer unit),
    // rounded UP so a timer never fires before the true session end.
    private def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    private def timerMsFor(maxMicros: Long): Long =
      Math.floorDiv(maxMicros + gapMs * 1000L + 999L, 1000L)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long, Long)] = {
      var (n, cents, maxUs) =
        if (sess.exists()) sess.get() else (0L, 0L, Long.MinValue)
      val oldTimer = if (n > 0) timerMsFor(maxUs) else Long.MinValue
      val sorted = rows.toArray.sortBy(r => micros(r._3))
      val out = new scala.collection.mutable.ArrayBuffer[
        (Long, Long, Long, Long)](2)
      var i = 0
      while (i < sorted.length) {
        val (_, c, ts) = sorted(i)
        val t = micros(ts)
        if (n > 0 && t >= maxUs + gapMs * 1000L) {
          out += ((key, n, cents, Math.floorDiv(maxUs, 1000L)))
          n = 0L; cents = 0L
        }
        n += 1; cents += c; maxUs = math.max(maxUs, t)
        i += 1
      }
      sess.update((n, cents, maxUs))
      if (oldTimer != Long.MinValue) getHandle.deleteTimer(oldTimer)
      getHandle.registerTimer(timerMsFor(maxUs))
      out.iterator
    }
    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Long, Long, Long)] = {
      val out =
        if (sess.exists()) {
          val (n, cents, maxUs) = sess.get()
          Iterator((key, n, cents, Math.floorDiv(maxUs, 1000L)))
        } else Iterator.empty
      sess.clear()
      out
    }
  }

  /** PROCESSING-TIME timers — the wall-clock half of the timer surface
    * (s24's [[TwsSessionExpiry]] is the event-time half): a per-key
    * IDLE FLUSH, the canonical processing-time timer use case. Each
    * batch folds its rows into per-key (count, cents) state and re-arms
    * a single wall-clock timer at now+idle; when a key stays quiet for
    * the idle window the timer fires, the accumulated totals emit
    * EXACTLY ONCE, and the state clears — the "ship the buffer when the
    * burst ends" pattern behind micro-batch upload coalescing,
    * abandoned-cart notifications, and buffered writes to costly sinks.
    * Distinct from event-time sessions: no watermark is involved and a
    * stalled SOURCE still flushes (wall clock keeps moving), which is
    * precisely why production jobs pick processing time for operational
    * flushes. One pending timer per key (`armed` state re-arms), so
    * timer count is O(keys) like everything else in the store. Emission
    * CONTENT is deterministic (totals of everything folded since the
    * last flush); only the firing instant is wall-clock. */
  class TwsIdleFlush(idleMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var acc: ValueState[(Long, Long)] = _
    @transient private var armed: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      acc = getHandle.getValueState[(Long, Long)]("acc",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (acc.exists()) acc.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      acc.update((n, cents))
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      val t = timers.getCurrentProcessingTimeInMs() + idleMs
      getHandle.registerTimer(t)
      armed.update(t)
      Iterator.empty // nothing emits until the idle flush
    }
    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Long, Long)] = {
      val out =
        if (acc.exists()) {
          val (n, cents) = acc.get()
          Iterator((key, n, cents))
        } else Iterator.empty
      acc.clear()
      armed.clear()
      out
    }
  }

  /** Per-key idle-flush totals via [[TwsIdleFlush]]. ProcessingTime
    * mode: pace the query and poll the sink ([[countsWithTtl]]'s
    * caveat — processAllAvailable never returns). */
  def idleFlushTws(pairs: org.apache.spark.sql.Dataset[(Long, Long)],
      idleMs: Long): org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsIdleFlush(idleMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** State TTL through transformWithState's `TTLConfig` — the eviction
    * knob that bounds keyed-state growth WITHOUT timers or watermarks:
    * a per-key counter whose ValueState the store expires `ttl` of
    * processing time after its last update. At 100 TB keyed state this
    * is the difference between "state grows with distinct keys forever"
    * and "state holds only keys active within the TTL horizon".
    * Emits (key, runningCount); a key whose state expired restarts
    * from zero — spec-pinned in StreamingSpec ("state TTL evicts"). */
  class TwsCountTtl(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig(ttl))
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long)] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator((key, n))
    }
  }

  /** [[TwsCountTtl]] with a caller-supplied PHASE tag riding along —
    * input rows are (key, phase) and each emission is (key, phase, n)
    * where `phase` is the largest tag among the batch's rows for the
    * key. The tag gives a TTL eviction a deterministic, hashable
    * signature: a phase fed entirely after the TTL lapsed emits counts
    * that RESTART from the phase's own row count (expired state reads
    * as absent), while an unexpired state would carry the prior phase's
    * total into the new tag's rows — so a (key, phase)-keyed readout is
    * exactly "the non-TTL recount over only the rows inside the TTL
    * horizon", which a batch oracle can replay. */
  class TwsCountTtlPhased(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
      ValueState}
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig(ttl))
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      var tag = Long.MinValue
      rows.foreach { r => n += 1; tag = math.max(tag, r._2) }
      cnt.update(n)
      Iterator((key, tag, n))
    }
  }

  /** Phase-tagged running counts under state TTL — see
    * [[TwsCountTtlPhased]]; same ProcessingTime pace-and-poll caveat as
    * [[countsWithTtl]]. */
  def countsWithTtlPhased(pairs: org.apache.spark.sql.Dataset[(Long, Long)],
      ttl: java.time.Duration)
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsCountTtlPhased(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Per-key running counts whose state expires `ttl` after last update
    * (processing-time TTL; TTL requires the ProcessingTime time mode).
    *
    * Operational caveat: in ProcessingTime mode the operator always
    * reports that another batch may be needed (TTL can lapse at any
    * wall-clock instant), so `processAllAvailable` on the running query
    * NEVER returns and the default as-fast-as-possible trigger re-runs
    * empty micro-batches continuously. Callers must pace the query with
    * a ProcessingTime trigger and poll the sink — StreamingSpec's
    * "state TTL evicts" test is the worked example. */
  def countsWithTtl(pairs: org.apache.spark.sql.Dataset[(Long, Long)],
      ttl: java.time.Duration)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    pairs.groupByKey(_._1)
      .transformWithState(new TwsCountTtl(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Sessionize rows via [[TwsSessionExpiry]] timers; emits one row per
    * expired session — (key, n, cents, lastEventMs). The caller supplies
    * a streaming Dataset of (key, cents, eventTime) whose TIMESTAMP
    * column already carries a watermark (the `.as[...]` cast preserves
    * the event-time tag; a `.map` would drop it, which is why the tuple
    * keeps the Timestamp type through to the processor). */
  def sessionExpiryTws(
      rows: org.apache.spark.sql.Dataset[(Long, Long, java.sql.Timestamp)],
      gapMs: Long): org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    rows.groupByKey(_._1)
      .transformWithState(new TwsSessionExpiry(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stateful streaming shuffle partition count. Streaming state stores
    * are created one per shuffle partition and the count is FROZEN into
    * the checkpoint at the first batch — it is a deliberate sizing
    * decision, not an inherited session default: AQE never coalesces
    * streaming shuffles, so every micro-batch pays per-partition state
    * commit overhead forever. Sizing rule: enough partitions that the
    * per-key state of the hottest partition fits an executor (at 100 TB
    * state scale that is hundreds to thousands, set BEFORE the first run
    * and changed only by re-checkpointing); small for local gates, where
    * the dominant cost is trigger machinery × partitions, not state
    * volume. */
  val StatePartitions = 4

  /** Streaming CDC-APPLY loop — the lakehouse streaming writer: each
    * micro-batch of change rows is folded into a persistent key-state
    * table via [[graft.operators.Merge.threeWayMerge]], guarded by
    * NEWER-WINS versioning and with DELETE TOMBSTONES RETAINED. This is
    * the `foreachBatch` + `MERGE INTO` pattern every streaming-ingest
    * lakehouse pipeline ships (Delta/Iceberg CDC apply), with its two
    * production subtleties built in rather than hoped for:
    *
    *  - **Newer-wins guard**: a batch row only updates a key whose
    *    stored (ts, id) version it exceeds. This makes the sink
    *    IDEMPOTENT under micro-batch replay (at-least-once delivery →
    *    exactly-once table effect) and ORDER-TOLERANT: the final table
    *    is the global latest version per key no matter how the file
    *    source slices batches.
    *  - **Tombstones retained**: a delete marker is stored, not
    *    dropped, so an out-of-order OLDER upsert arriving in a later
    *    batch cannot resurrect a deleted key (the classic CDC bug —
    *    [[graft.operators.Cdc.applyChanges]] drops deletes, which is
    *    correct for its one-shot compaction but wrong in a loop).
    *    Readers filter markers; compaction can age them out once the
    *    out-of-order horizon passes.
    *
    * Change rows: (key, ts, id, op-ish payload...) with (ts, id)
    * strictly unique per row; within a batch the latest row per key is
    * elected by one max(struct) partial agg (no window). Scale shape
    * per batch: one partial agg over the batch + ONE key-shuffled
    * full-outer join of state x batch-keepers (the threeWayMerge
    * plan); state rewrites are full here but file-pruned in a real
    * table format — the join and guard are the part that carries to
    * 100 TB. State snapshots land under `stateRoot/state_<batchId>`;
    * the returned dir is the final table. */
  /** One CDC-apply step: fold a single micro-batch into the state table
    * at `cur`, write the new snapshot under `stateRoot`, return its dir.
    * Factored out of [[cdcMergeSink]] so tests drive the EXACT
    * production batch body with hand-built batches. */
  def applyCdcBatch(batch: org.apache.spark.sql.DataFrame, key: String,
      stateRoot: String, id: Long,
      cur: Option[String]): Option[String] = {
    val sps = batch.sparkSession
    val payload = batch.columns.filter(_ != key).toSeq
    // latest row per key within the batch: the (ts, event_id) version
    // pair leads the struct regardless of input column order, so max()
    // is argmax over the unique version
    val ordered = Seq("ts", "event_id") ++
      payload.filterNot(Set("ts", "event_id"))
    val keeper = batch.groupBy(col(key))
      .agg(max(struct(ordered.map(col): _*)).as("__m"))
      .select(col(key) +: payload.map(c => col(s"__m.$c").as(c)): _*)
      .select(batch.columns.map(col).toIndexedSeq: _*)
    val state = cur match {
      case Some(d) => sps.read.parquet(d)
      case None => sps.createDataFrame(
        sps.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        keeper.schema)
    }
    val st = state.select(col(key).as("__k"), col("ts").as("__ts"),
      col("event_id").as("__id"))
    val eff = keeper.join(st, col(key) === col("__k"), "left")
      .filter(col("__k").isNull || col("ts") > col("__ts") ||
        (col("ts") === col("__ts") && col("event_id") > col("__id")))
      .drop("__k", "__ts", "__id")
    val merged = graft.operators.Merge
      .threeWayMerge(state, eff, key).drop("action")
    val dir = f"$stateRoot/state_$id%05d"
    merged.write.mode("overwrite").parquet(dir)
    Some(dir)
  }

  def cdcMergeSink(changes: org.apache.spark.sql.DataFrame, key: String,
      stateRoot: String): Option[String] = {
    var cur: Option[String] = None
    val q = changes.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        cur = applyCdcBatch(batch, key, stateRoot, id, cur)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    cur
  }

  /** Drive a streaming DataFrame to completion against currently-available
    * input and return the materialized result (memory sink). This is the
    * batch-shaped harness for incremental queries — production would
    * `.start()` and leave the query running. Pins
    * `spark.sql.shuffle.partitions` to [[StatePartitions]] for the
    * query's lifetime (the value is captured into the stream's checkpoint
    * at start), restoring the session default after. */
  /** One micro-batch of the DUAL-SINK fan-out: write the batch to TWO
    * independent parquet sinks — an aggregated rollup (sink A) and the
    * raw event log (sink B) — each under a `batch_id=<id>` partition
    * directory written with OVERWRITE mode. The partition-per-epoch
    * overwrite is the whole exactly-once mechanism: foreachBatch gives
    * at-least-once delivery (a batch that fails before the checkpoint
    * commits REPLAYS under the SAME batch id), so a sink write is safe
    * iff replaying it is a no-op — overwriting one epoch's partition
    * with identical content is exactly that. Appending here instead
    * would double the replayed batch in whichever sink had already
    * committed. */
  def dualSinkBatch(batch: DataFrame, id: Long, aDir: String,
      bDir: String, betweenWrites: () => Unit = () => ()): Unit = {
    batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .write.mode("overwrite").parquet(f"$aDir/batch_id=$id%05d")
    betweenWrites() // fault-injection seam: the A-committed/B-not window
    batch.write.mode("overwrite").parquet(f"$bDir/batch_id=$id%05d")
  }

  /** Drive a stream through [[dualSinkBatch]] with an injected crash
    * BETWEEN the two sink writes of batch `failAt` on the first run —
    * the torn-write window every multi-sink foreachBatch has (sink A
    * committed, sink B not, epoch uncommitted) — then restart from the
    * same checkpoint. Spark replays the torn epoch under the same batch
    * id; the idempotent partition overwrite absorbs the duplicate A
    * write and completes B, so both sinks converge to exactly-once
    * content. Returns (aDir, bDir). */
  def dualSinkFanout(sp: SparkSession, changes: DataFrame,
      failAt: Long): (String, String) = {
    val aDir = graft.Tables.scratchDir("graft-dualsink-a")
    val bDir = graft.Tables.scratchDir("graft-dualsink-b")
    val ckpt = graft.Tables.scratchDir("graft-dualsink-ckpt")
    // @volatile not needed: foreachBatch bodies run serially and the
    // flag is read/armed across runs on the driver
    var armed = true
    def run(): Unit = {
      val q = changes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          dualSinkBatch(batch, id, aDir, bDir, () =>
            if (armed && id == failAt) {
              armed = false
              throw new RuntimeException(
                s"injected torn-write crash after sink A of batch $id")
            })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val prev = sp.conf.get("spark.sql.shuffle.partitions")
    sp.conf.set("spark.sql.shuffle.partitions", StatePartitions)
    try {
      try run() catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
          if !armed => // the injected tear; anything else propagates
      }
      require(!armed, "the injected crash never fired — failAt batch " +
        "id was not reached, the tear was not exercised")
      run() // restart: torn epoch replays under the same id
    } finally sp.conf.set("spark.sql.shuffle.partitions", prev)
    (aDir, bDir)
  }

  /** STREAMING IVF INGEST — a12's append-only index maintenance driven
    * by foreachBatch: every micro-batch of (id, vec) rows is assigned
    * against the FROZEN `centroids` (config-sized, collected driver-side
    * into literals by [[graft.operators.Ann.ivfIndex]], so no
    * cross-session plan ever joins the stream) and written under its own
    * `batch_id=<epoch>/cid=<cell>` partition tree with per-epoch
    * OVERWRITE — the [[dualSinkBatch]] idempotency rule applied to index
    * postings: foreachBatch is at-least-once, so a torn epoch replays
    * under the SAME id and overwrites its own partition instead of
    * doubling postings. Readers scan the dir and drop `batch_id`;
    * because IVF assignment is per-row independent, the union of
    * per-batch assignments IS the batch rebuild (the a12 losslessness
    * argument) — gate s34 hash-proves it against the full-rebuild
    * oracle.
    *
    * `failAt` >= 0 injects a crash AFTER the postings write of that epoch
    * but BEFORE its checkpoint commit (the torn window where the index
    * already holds the batch), then restarts from the same checkpoint —
    * the replay overwrites the epoch's partition with identical content;
    * an append-mode sink would double those postings and shift every
    * downstream rank. */
  def ivfIngestSink(changes: DataFrame, centroids: DataFrame,
      idxDir: String, failAt: Long = -1L): Unit = {
    val ckpt = graft.Tables.scratchDir("graft-ivfingest-ckpt")
    var armed = failAt >= 0
    def run(): Unit = {
      val q = changes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.operators.Ann.ivfIndex(batch, centroids)
            .write.partitionBy("cid").mode("overwrite")
            .parquet(f"$idxDir/batch_id=$id%05d")
          if (armed && id == failAt) {
            armed = false
            throw new RuntimeException(
              s"injected post-write crash in epoch $id")
          }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try run() catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException
        if failAt >= 0 && !armed => // the injected tear; others propagate
    }
    if (failAt >= 0) {
      require(!armed, "the injected crash never fired — failAt epoch " +
        "was not reached, the tear was not exercised")
      run() // torn epoch replays under the same id; overwrite absorbs it
    }
  }

  /** foreachBatch sink maintaining a count-min sketch INCREMENTALLY:
    * each epoch's events aggregate into ONE serialized CMS blob
    * ([[graft.functions.CmsAgg]]) written under an idempotent
    * `batch_id=<id>` partition with overwrite. The deliberate CONTRAST
    * to [[hllRegisterSink]]: CMS epoch merge is counter-wise ADD —
    * associative and commutative but NOT idempotent, so a replayed
    * epoch would DOUBLE its counts if it appended; exactly-once must
    * come from the partition-overwrite recipe alone, which is exactly
    * what `failAt` exercises (crash after the epoch's write, before
    * its checkpoint commit; the restart replays the same id over its
    * own partition). Because counter-add commutes and epochs partition
    * the stream, the merged sketch equals the single-pass batch sketch
    * COUNTER-FOR-COUNTER — gate s38 pins estimate equality on every
    * probe key. Per-epoch state is one d×w grid; history is never
    * rescanned. */
  def cmsEpochSink(changes: DataFrame,
      value: org.apache.spark.sql.Column, outDir: String,
      eps: Double, delta: Double, seed: Int, failAt: Long = -1L): Unit = {
    val ckpt = graft.Tables.scratchDir("graft-cmsingest-ckpt")
    var armed = failAt >= 0
    def run(): Unit = {
      val q = changes.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.agg(graft.functions.CmsAgg.cmsSketch(eps, delta, seed)(
              value).as("sk"))
            .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
          if (armed && id == failAt) {
            armed = false
            throw new RuntimeException(
              s"injected post-write crash in epoch $id")
          }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try run() catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException
        if failAt >= 0 && !armed => // the injected tear; others propagate
    }
    if (failAt >= 0) {
      require(!armed, "the injected crash never fired — failAt epoch " +
        "was not reached, the tear was not exercised")
      run() // torn epoch replays under the same id; overwrite absorbs it
    }
  }

  /** foreachBatch sink maintaining a [[graft.operators.Sketches
    * .portableHllState]] register table INCREMENTALLY: each epoch's
    * registers land in their own `batch_id=<id>` partition with
    * mode("overwrite") — the s33/s34 idempotent-replay recipe, a torn
    * epoch overwrites instead of doubling — and the reader folds
    * partitions by register-wise max ([[graft.operators.Sketches
    * .mergeHllStates]]): associative, commutative AND idempotent, so
    * neither epoch boundaries nor replays can change the merged state.
    * This is count-distinct maintenance a year-running ingest can
    * afford: per-epoch work is batch-sized, stored state is ≤1024 rows
    * per group per epoch, and no raw history is ever rescanned. */
  def hllRegisterSink(changes: DataFrame,
      grp: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
      outDir: String): Unit = {
    val ckpt = graft.Tables.scratchDir("graft-hllingest-ckpt")
    val q = changes.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.Sketches.portableHllState(batch, grp, value)
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Per-micro-batch BOTTOM-K (KMV) sketch ingest — the streaming leg
    * of the theta-sketch family ([[graft.operators.Sketches
    * .bottomKState]]), beside s37's HLL registers and s38's CMS
    * counters: each epoch reduces its batch to ≤ k distinct hash
    * values per group and lands them in an idempotent `batch_id`
    * partition (the s33/s34/s37/s38 exactly-once recipe — a torn epoch
    * overwrites, never duplicates). The merge story is STRONGER than
    * s38's: bottom-k partials fold by a DEDUP merge
    * ([[graft.operators.Sketches.mergeBottomKStates]]), which is
    * idempotent — re-folding a replayed epoch's values changes nothing
    * — so exactly-once here is belt (partition overwrite) AND
    * suspenders (idempotent merge), where CMS counter-adds rest on the
    * overwrite alone. Per-epoch state is ≤ k·|groups| rows regardless
    * of batch size. */
  def bottomKSketchSink(changes: DataFrame,
      grp: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
      k: Int, outDir: String): Unit = {
    val ckpt = graft.Tables.scratchDir("graft-bkingest-ckpt")
    val q = changes.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.Sketches.bottomKState(batch, grp, value, k)
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** STREAMING MODEL SCORING — the online serving leg of the t60
    * Naive Bayes classifier: the trained model lives as PUBLISHED
    * parquet tables (cond/cls) and is re-read from its paths inside
    * every foreachBatch body (the s40 refresh discipline — a model
    * republish lands at the next micro-batch without a restart), each
    * micro-batch scored by the SAME [[graft.operators.NaiveBayes
    * .classify]] plan the offline job runs, landing in idempotent
    * `batch_id` partitions (the s33/s38 exactly-once recipe). Because
    * scoring is per-row pure given the model, streaming-vs-batch
    * equality is provable row-for-row — the training/serving
    * consistency check real feature pipelines need. Per-epoch work is
    * batch-sized + one vocab×classes model scan; no state store. */
  def nbClassifySink(changes: DataFrame, condDir: String,
      clsDir: String, idCol: String, textCol: String, outDir: String)
      : Unit = {
    val ckpt = graft.Tables.scratchDir("graft-nbscore-ckpt")
    val q = changes.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sp2 = batch.sparkSession
        val model = graft.operators.NaiveBayes.NbModel(
          sp2.read.parquet(condDir), sp2.read.parquet(clsDir))
        graft.operators.NaiveBayes.classify(batch, idCol, textCol,
            model)
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** PER-MICRO-BATCH DIMENSION REFRESH enrichment — the production
    * pattern for joining a long-running stream against a slowly
    * PUBLISHED dimension: the dim is re-read from its path inside
    * EVERY foreachBatch body, so a dimension publish lands at the next
    * micro-batch boundary without restarting the query. The contrast
    * is [[staticEnrich]] (s7), which binds the dimension ONCE at plan
    * time — a mid-stream publish is invisible there for the query's
    * lifetime. The join is a LEFT join (stream rows with no dim match
    * survive with nulls — dimension-coverage drift must be observable,
    * not silently dropped) with the dims-sized table broadcast per
    * epoch; each epoch's enriched rows land in an idempotent
    * `batch_id` partition (the s33/s34/s37/s38 exactly-once recipe, so
    * a torn epoch overwrites instead of duplicating). Per-epoch work
    * is batch-sized; no history is rescanned; at 100 TB/day the re-read
    * dim stays a metadata-cheap parquet scan of a dims-sized table.
    * Caller drives the query (addData / processAllAvailable /
    * publish-v2 between epochs) and stops it. */
  def dimRefreshEnrichStart(changes: DataFrame, dimDir: String,
      key: String, dimKey: String, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val ckpt = graft.Tables.scratchDir("graft-dimref-ckpt")
    changes.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir)
        // Drop via the DIM side's column REFERENCE (advisor, round 14):
        // .drop(dimKey) by name would remove every column named dimKey,
        // including the stream-side join key when key == dimKey.
        batch.join(broadcast(dim),
            batch.col(key) === dim.col(dimKey), "left")
          .drop(dim.col(dimKey))
          .write.mode("overwrite").parquet(f"$outDir/batch_id=$id%05d")
        ()
      }
      .start()
  }

  /** Drive a streaming DataFrame into the `graft-xml` FILE sink
    * (append-mode micro-batch shards + the exactly-once `_spark_metadata`
    * commit log Spark's FileStreamSink keeps; a batch read of `outDir`
    * sees only committed shards). Same pinned-partitions discipline as
    * [[runToMemory]]; the checkpoint lives beside the output and is
    * scratch-scoped. This is the sink half of the streaming XML story —
    * [[graft.xml.XmlParser.readStream]] being the source half. */
  def runToXmlSink(sp: SparkSession, df: DataFrame, outDir: String,
      rowTag: String): Unit = {
    val prev = sp.conf.get("spark.sql.shuffle.partitions")
    sp.conf.set("spark.sql.shuffle.partitions", StatePartitions)
    try {
      val q = df.writeStream
        .format("graft-xml")
        .option("rowTag", rowTag)
        .option("checkpointLocation",
          graft.Tables.scratchDir(s"graft-xmlsink-ckpt"))
        .outputMode("append")
        .start(outDir)
      try q.processAllAvailable() finally q.stop()
    } finally sp.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def runToMemory(sp: SparkSession, df: DataFrame, name: String,
      outputMode: String): DataFrame = {
    val prev = sp.conf.get("spark.sql.shuffle.partitions")
    sp.conf.set("spark.sql.shuffle.partitions", StatePartitions)
    try {
      val q = df.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally sp.conf.set("spark.sql.shuffle.partitions", prev)
    sp.table(name)
  }
}
