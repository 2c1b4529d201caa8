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

  final case class UserEvent(user_id: Long, event_type: String, value: Double,
                             ts: java.sql.Timestamp)
  final case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
                               last_type: String)

  /** Fold a micro-batch of a user's events into the running profile. */
  private[streaming] def updateProfile(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserProfile]): UserProfile = {
    if (state.hasTimedOut) {
      val last = state.get
      state.remove()
      last
    } else {
      val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, ""))
      val next = events.foldLeft(prev) { (p, e) =>
        UserProfile(userId, p.n_events + 1, p.total_value + e.value, e.event_type)
      }
      state.update(next)
      // Evict state for keys idle past watermark + 1h (no-op in batch,
      // where the watermark is absent and state dies with the job).
      if (state.getCurrentWatermarkMs() > 0)
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
    marked.as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.EventTimeTimeout)(updateProfile)
  }

  /** The output mode the streaming sink should use with [[userProfiles]]. */
  val outputMode: OutputMode = OutputMode.Update()
}
