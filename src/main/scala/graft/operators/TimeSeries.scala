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

  /** Per-key fixed-step grid with LINEAR interpolation across the gaps —
    * the fill for continuously-varying signals (sensor values, prices)
    * where forward-fill's step function biases downstream features. Grid
    * and bucket aggregation are shared with [[resampleForwardFill]]; the
    * fill differs: an empty bucket between two observed buckets gets
    * `prev + (next − prev) · (t − t_prev)/(t_next − t_prev)`; leading
    * gaps (no previous observation) take the next value, trailing gaps
    * the previous (flat extrapolation both ways).
    *
    * Determinism: the interpolation is one IEEE double expression of
    * exact inputs (bucket epochs are exact longs, bucket values ride the
    * DECIMAL aggregate). The OUTPUT rounding routes through
    * DECIMAL(24,12) before the 6-dp round: 6-dp-exact endpoints times a
    * small rational weight land EXACTLY on 6-dp half boundaries
    * (…3125), where Spark (shortest-decimal string) and DuckDB (raw
    * binary) round the same double differently; at 12 dp the double's
    * ±1-ulp noise is far below the half threshold, so both engines
    * quantize to the same decimal and the final half-up round agrees
    * (measured: 4/35k rows diverged without this). Bounds: |v| < 1e12
    * fits the (24,12) cast. Shuffle
    * shape: same one aggregation + grid explode as forward-fill, plus
    * TWO per-key windows (forward: last value+bucket so far; backward:
    * first value+bucket ahead) — both partitioned on the key, so the
    * plan parallelizes across keys and PlanGuard stays happy; a key's
    * span/step row count is the same bound as forward-fill.
    */
  def resampleInterpolate(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val bucket = timestamp_seconds(
      unix_timestamp(col(tsCol)) - pmod(unix_timestamp(col(tsCol)), lit(stepSeconds)))
    val agg = events
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("v"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(min(bucket).as("b0"), max(bucket).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"),
          expr(s"INTERVAL $stepSeconds SECONDS"))).as("bucket"))
    val wf = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ep = unix_timestamp(col("bucket"))
    val obsEp = when(col("v").isNotNull, ep)
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
        ep.as("__e"),
        last(col("v"), ignoreNulls = true).over(wf).as("__pv"),
        last(obsEp, ignoreNulls = true).over(wf).as("__pe"),
        first(col("v"), ignoreNulls = true).over(wb).as("__nv"),
        first(obsEp, ignoreNulls = true).over(wb).as("__ne"))
      .select(col(keyCol), col("bucket"), col("n"),
        round(
          when(col("__pv").isNull, col("__nv"))
            .when(col("__nv").isNull, col("__pv"))
            .when(col("__ne") === col("__pe"), col("__pv"))
            .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
              (col("__e") - col("__pe")).cast("double") /
              (col("__ne") - col("__pe")).cast("double"))
            .cast("decimal(24,12)"),
          6).cast("double").as("v_interp"))
  }
}
