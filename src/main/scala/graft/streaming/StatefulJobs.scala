package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state processing via `mapGroupsWithState` — the
  * Structured Streaming primitive for state the built-in windows can't
  * express. Demonstrated with a running per-user activity profile that
  * survives across micro-batches; state is bounded by an event-time
  * timeout tied to the watermark, so idle keys are evicted instead of
  * accumulating forever (the 100 TB-stream posture).
  */
object StatefulJobs {

  /** Batch executions run these functions with NO watermark present, and
    * `GroupState.getCurrentWatermarkMs` / event-time `setTimeoutTimestamp`
    * THROW in that case (verified against Spark 4.1.2's GroupStateImpl) —
    * so every update function takes an explicit `streaming` flag from the
    * caller (who knows `df.isStreaming`) and only touches
    * watermark-dependent state when it is true. Batch state dies with the
    * job anyway; eviction is meaningless there.
    */
  final case class UserEvent(user_id: Long, event_type: String, value: Double,
                             ts: java.sql.Timestamp)
  final case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
                               last_type: String)

  /** Fold a micro-batch of a user's events into the running profile. */
  private[streaming] def updateProfile(streaming: Boolean)(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserProfile]): UserProfile = {
    if (state.hasTimedOut) {
      val last = state.get
      state.remove()
      last
    } else {
      val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, ""))
      // Fold in (event-time, value, type) order — NOT iterator order, which
      // after the groupByKey shuffle is partition-arrival order and thus
      // run-dependent. Within a micro-batch (or a whole batch run: one
      // invocation per key) the resulting profile — in particular
      // last_type — is a pure function of the data. getTime+getNanos
      // reconstructs the full micro-second timestamp order (getTime alone
      // truncates to millis). Across micro-batches the fold remains
      // arrival-order, bounded by the watermark, like every streaming
      // aggregate.
      val ordered = events.toSeq.sortBy(e =>
        (e.ts.getTime, e.ts.getNanos, e.value, e.event_type))
      val next = ordered.foldLeft(prev) { (p, e) =>
        UserProfile(userId, p.n_events + 1, p.total_value + e.value, e.event_type)
      }
      state.update(next)
      // Evict state for keys idle past watermark + 1h. Guarded by the
      // caller's streaming flag: in batch the watermark accessors throw.
      if (streaming && state.getCurrentWatermarkMs() > 0)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600 * 1000L)
      next
    }
  }

  /** Running per-user profiles over a stream (or batch) of events with
    * columns (user_id, event_type, value, ts). On a stream, pair with
    * `OutputMode.Update`; the 1-hour watermark both bounds state and
    * drives timeout-based eviction.
    */
  def userProfiles(spark: SparkSession, events: DataFrame,
                   watermark: String = "1 hour"): Dataset[UserProfile] = {
    import spark.implicits._
    val src = events.select("user_id", "event_type", "value", "ts")
    val marked = if (src.isStreaming) src.withWatermark("ts", watermark) else src
    val timeout = if (src.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        timeout)(updateProfile(src.isStreaming))
  }

  /** The output mode the streaming sink should use with [[userProfiles]]. */
  val outputMode: OutputMode = OutputMode.Update()

  final case class SessionSummary(user_id: Long, n_events: Long,
                                  first_ms: Long, last_ms: Long)

  /** Closed-session emission via `flatMapGroupsWithState`: events
    * accumulate in per-user state and NOTHING is emitted until the
    * watermark passes the session gap — then the timeout fires and the
    * finished session is emitted exactly once (0 or 1 rows per
    * invocation: the flatMap shape). This is the arbitrary-state
    * formulation of sessionize() for sinks that must only see final
    * sessions (append-mode semantics).
    */
  private[streaming] def closeSessions(gapMs: Long, streaming: Boolean)(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[SessionSummary]): Iterator[SessionSummary] = {
    if (state.hasTimedOut) {
      val done = state.get
      state.remove()
      Iterator.single(done)
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      val prev = state.getOption
      val first = prev.map(_.first_ms).getOrElse(sorted.head.ts.getTime)
      val last = math.max(prev.map(_.last_ms).getOrElse(Long.MinValue),
        sorted.last.ts.getTime)
      val n = prev.map(_.n_events).getOrElse(0L) + sorted.size
      val summary = SessionSummary(userId, n, first, last)
      if (streaming) {
        state.update(summary)
        state.setTimeoutTimestamp(last + gapMs) // throws without a watermark
        Iterator.empty
      } else {
        // Batch: no watermark will ever close the session — emit the
        // whole-input session directly (state dies with the job).
        Iterator.single(summary)
      }
    }
  }

  /** Stream of CLOSED sessions (gap-terminated), append-mode. The
    * watermark must be at least the session gap for timely closure.
    */
  def closedSessions(spark: SparkSession, events: DataFrame,
                     gap: String = "30 minutes",
                     watermark: String = "30 minutes"): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapMs.months == 0,
      "month-based gaps have no fixed millisecond length; use days/hours/minutes")
    val ms = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    val src = events.select("user_id", "event_type", "value", "ts")
    val marked = if (src.isStreaming) src.withWatermark("ts", watermark) else src
    val timeout = if (src.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), timeout)(closeSessions(ms, src.isStreaming))
  }

  final case class KeyStats(n: Long, mean: Double, m2: Double)
  final case class Anomaly(user_id: Long, ts_ms: Long, value: Double,
                           zscore: Double, n_seen: Long)

  /** Online anomaly detection: per-key Welford running mean/variance
    * (numerically stable single-pass — a naive Σx² cancels
    * catastrophically at corpus scale), emitting events whose |z-score|
    * vs the state BEFORE the event exceeds the threshold. Events inside a
    * micro-batch are processed in timestamp order, so emissions don't
    * depend on partition arrival order WITHIN a batch; an event arriving
    * in a later micro-batch than a larger timestamp folds in arrival
    * order (bounded by the watermark) — streaming anomaly scores are
    * inherently arrival-order statements. The first `warmup` events per
    * key only train the state (a z-score against 2 points flags
    * everything). State: 3 doubles per key, evicted after `watermark + 1h`
    * idle — bounded regardless of stream length.
    */
  private[streaming] def detectAnomalies(threshold: Double, warmup: Long,
                                         streaming: Boolean)(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[KeyStats]): Iterator[Anomaly] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(KeyStats(0L, 0.0, 0.0))
      val out = Seq.newBuilder[Anomaly]
      events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        if (st.n >= warmup && st.n > 1) {
          val variance = st.m2 / (st.n - 1)
          if (variance > 0) {
            val z = (e.value - st.mean) / math.sqrt(variance)
            if (math.abs(z) >= threshold)
              out += Anomaly(userId, e.ts.getTime, e.value, z, st.n)
          }
        }
        val n1 = st.n + 1
        val delta = e.value - st.mean
        val mean1 = st.mean + delta / n1
        st = KeyStats(n1, mean1, st.m2 + delta * (e.value - mean1))
      }
      state.update(st)
      if (streaming && state.getCurrentWatermarkMs() > 0)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600 * 1000L)
      out.result().iterator
    }
  }

  /** Per-user streaming outlier emission (append-mode); batch-unified like
    * the rest of the streaming surface.
    */
  def anomalies(spark: SparkSession, events: DataFrame,
                threshold: Double = 3.0, warmup: Long = 10L,
                watermark: String = "1 hour"): Dataset[Anomaly] = {
    import spark.implicits._
    val src = events.select("user_id", "event_type", "value", "ts")
    val marked = if (src.isStreaming) src.withWatermark("ts", watermark) else src
    val timeout = if (src.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyStats, Anomaly](
        OutputMode.Append(), timeout)(
        detectAnomalies(threshold, warmup, src.isStreaming))
  }
}
