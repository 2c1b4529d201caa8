package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed per-key grid and forward-fill the gaps — what every downstream
  * window/feature computation assumes ("one row per user per hour"), and
  * what raw event data never gives you.
  */
object TimeSeries {

  /** Per-key fixed-step grid from each key's first to last bucket, with
    * the bucket aggregate where data exists and the last seen value
    * forward-filled across empty buckets (`n = 0` marks the fills).
    * Buckets are epoch-floored to `stepSeconds` (3600 = hourly ≡ UTC
    * `date_trunc('hour')`), so the grid stride and the aggregation
    * bucketing can never disagree.
    *
    * Shuffle shape: one hash aggregation into (key, bucket), a tiny
    * per-key bounds aggregate whose `sequence()` explode generates the
    * grid (rows ∝ key-count × span/step — never a cross join), and one
    * window per key for the fill. The value aggregate is DECIMAL-routed,
    * so results are identical under any partitioning. Skew note: a key
    * spanning years at a fine step explodes to span/step rows — bound
    * the span upstream or coarsen the step; the fill window is per-key
    * and parallelizes across keys.
    */
  def resampleForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    // Pure integer floor (epoch − epoch mod step): no float division.
    val bucket = timestamp_seconds(
      unix_timestamp(col(tsCol)) - pmod(unix_timestamp(col(tsCol)), lit(stepSeconds)))
    val stepInterval = expr(s"INTERVAL $stepSeconds SECONDS")
    val hourly = events
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("v"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(min(bucket).as("b0"), max(bucket).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"), stepInterval)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ff"))
  }
}
