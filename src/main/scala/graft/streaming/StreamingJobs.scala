package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is batch-only (COPY), so
  * this is forward capability: the same transform bodies run unchanged on
  * a batch DataFrame or a `readStream` DataFrame — Spark's unified API.
  * Tests drive them with `MemoryStream`; production would swap the source
  * for Kafka/files and add `writeStream` sinks with checkpointing.
  */
object StreamingJobs {

  /** Tumbling-window counts per event type. On a streaming input, callers
    * should first apply `withWatermark("ts", …)` so state is bounded —
    * `windowedCounts(df.withWatermark("ts", "1 hour"))`.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLen), col("event_type"))
      // Exact decimal sum, surfaced as double: order-independent, so the
      // result is bit-identical across partitionings/engines — raw double
      // sums drift with aggregation order at cluster scale.
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Top-k event types per tumbling window by count — the rolling
    * "what's hot right now" leaderboard. Composes [[windowedCounts]]
    * with a WINDOW-PARTITIONED rank (parallel across windows, never
    * global); on a stream, run it as the foreachBatch/complete-mode
    * consumer of the watermarked windowed counts — the rank is one tiny
    * per-window sort over k'ish rows.
    */
  def windowedTopK(events: DataFrame, windowLen: String = "1 hour",
                   k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k >= 1, got $k")
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("event_type").asc)
    windowedCounts(events, windowLen)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Sliding-window rates (5 min window, 1 min slide). */
  def slidingRates(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Watermarked streaming variant — late data beyond the watermark is
    * dropped and per-key state is garbage-collected.
    */
  def streamingWindowedCounts(stream: DataFrame, watermark: String = "10 minutes",
                              windowLen: String = "1 hour"): DataFrame =
    windowedCounts(stream.withWatermark("ts", watermark), windowLen)

  /** In-flight exact dedup for streams: keep the first arrival per key,
    * drop replays that land within the watermark horizon —
    * `dropDuplicatesWithinWatermark`, so per-key state is GARBAGE-
    * COLLECTED once the watermark passes it (plain `dropDuplicates` on a
    * stream retains every key forever — unbounded state at corpus scale).
    * The at-least-once ingestion front of a training-data pipeline runs
    * exactly this shape.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour", tsCol: String = "ts"): DataFrame =
    // Batch-unified: dropDuplicatesWithinWatermark exists only on streams
    // (Spark rejects it on batch frames); the batch equivalent of
    // "first per key, state collected later" is a plain dropDuplicates.
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else events.dropDuplicates(keyCols)

  /** Stream-stream interval join: each left event paired with the right
    * events of the same user that land within [left.ts, left.ts + within]
    * — attribution ("which views followed this click"), enrichment,
    * conversion funnels. Batch-unified: on batch inputs it is a plain
    * equi-join with a range residual (hash shuffle on user_id, the range
    * applied as a post-probe filter); on streaming inputs, callers apply
    * `withWatermark` on BOTH sides first — the time-range condition then
    * bounds both join states, so Spark garbage-collects rows older than
    * `watermark + within` instead of buffering the streams forever.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, within: String = "10 minutes",
                   userCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id"): DataFrame = {
    val l = left.select(col(userCol).as("user_id"), col(tsCol).as("l_ts"),
      col(idCol).as("l_id"))
    val r = right.select(col(userCol).as("r_user"), col(tsCol).as("r_ts"),
      col(idCol).as("r_id"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Stream-static enrichment: join a stream against a slowly-changing
    * dimension frame. The dimension is broadcast (dimensions are small
    * by star-schema construction), so on a stream every micro-batch is
    * a stateless map-side join — no streaming state at all, the cheapest
    * join shape Structured Streaming has — and in batch the same body is
    * a plain broadcast-hash join. `how = "left_outer"` keeps unmatched
    * stream rows (the usual enrichment posture: never drop facts because
    * a dim row is late).
    */
  def enrich(stream: DataFrame, dim: DataFrame, joinCols: Seq[String],
             how: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), joinCols, how)

  /** Sessionization: per-user sessions that close after `gap` of
    * inactivity. `session_window` is Spark's native session operator —
    * state-merging, watermark-compatible (add `withWatermark` on a
    * stream), and batch-unified. A session spans [first event,
    * last event + gap); adjacent windows merge, so only a strictly
    * larger-than-gap silence starts a new session.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 userCol: String = "user_id"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Watermark late-data accounting, batch face: replay the corpus in
    * `arrivalCol` order and count, per event type, the rows a streaming
    * job with `withWatermark(delay)` would have DROPPED — event time
    * below (max event time over all STRICTLY EARLIER arrivals) − delay.
    * The report every watermark choice should be costed against before
    * a stream ships (too tight = silent data loss, this is that loss,
    * quantified).
    *
    * Scale shape: the running maximum never uses a global window —
    * arrivals are range-bucketed by the integer formula
    * `(arr − lo)·B / (hi − lo + 1)` (broadcast min/max scalars), the
    * per-bucket prefix max runs partitioned, and cross-bucket carry-in
    * comes from the ≤B-row bucket-total table (tiny-spine window, the
    * PSI exception) broadcast back. Event times compare as exact
    * epoch-micros BIGINTs — nothing floats.
    */
  def lateEvents(events: DataFrame, delaySeconds: Long = 3600L,
                 buckets: Int = 32, arrivalCol: String = "arr",
                 tsCol: String = "ts",
                 typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val delayUs = delaySeconds * 1000000L
    val e = events.select(col(arrivalCol).cast("long").as("arr"),
      unix_micros(col(tsCol)).as("t"), col(typeCol).as("etype"))
    val bounds = e.agg(min("arr").as("lo"), max("arr").as("hi"))
    val b = e.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        ((col("arr") - col("lo")) * buckets / (col("hi") - col("lo") + 1L))
          .cast("int"))
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("bucket").agg(max("t").as("bmax"))
      .select(col("bucket"), max("bmax").over(wOff).as("carry"))
    val wIn = Window.partitionBy("bucket").orderBy("arr")
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(offsets), "bucket")
      .withColumn("prev_max",
        greatest(coalesce(max("t").over(wIn), lit(Long.MinValue)),
          coalesce(col("carry"), lit(Long.MinValue))))
      .withColumn("late",
        col("prev_max") =!= Long.MinValue &&
          col("t") < col("prev_max") - delayUs)
      .groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("late"), col("prev_max") - delayUs - col("t")))
          .as("max_late_us"))
  }
}
