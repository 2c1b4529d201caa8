package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleForwardFill: full grid, fills marked n=0 and carry the last value") {
    val ev = Seq(
      (7L, "2024-01-01 10:15:00", 2.0),
      (7L, "2024-01-01 10:45:00", 4.0), // same bucket as above
      (7L, "2024-01-01 13:05:00", 9.0), // 2-hour gap before this
      (8L, "2024-01-01 11:30:00", 1.0)) // single-bucket user
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.resampleForwardFill(ev, "user_id", "ts", "value")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01T10:00:00Z", 2L, 6.0), // both events aggregated
      (7L, "2024-01-01T11:00:00Z", 0L, 6.0), // gap: filled from 10:00
      (7L, "2024-01-01T12:00:00Z", 0L, 6.0),
      (7L, "2024-01-01T13:00:00Z", 1L, 9.0),
      (8L, "2024-01-01T11:00:00Z", 1L, 1.0)))
  }

  test("resampleInterpolate: linear gap fill, flat extrapolation at the edges") {
    val ev = Seq(
      (7L, "2024-01-01 10:10:00", 1.0),
      (7L, "2024-01-01 13:20:00", 7.0), // hours 11,12 are gaps
      (8L, "2024-01-01 11:30:00", 5.0)) // single observation
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.resampleInterpolate(ev, "user_id", "ts", "value")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01T10:00:00Z", 1L, 1.0),
      (7L, "2024-01-01T11:00:00Z", 0L, 3.0), // 1 + (7-1)*1/3
      (7L, "2024-01-01T12:00:00Z", 0L, 5.0), // 1 + (7-1)*2/3
      (7L, "2024-01-01T13:00:00Z", 1L, 7.0),
      (8L, "2024-01-01T11:00:00Z", 1L, 5.0)))
  }

  test("resampleInterpolate: leading gap takes next value (no NULL holes)") {
    // Two observations in one bucket aggregate (sum), then a gap
    // DOWNSTREAM only: grid starts at the first observed bucket, so a
    // "leading gap" can only arise between the grid start and a later
    // first NON-NULL — which cannot happen here; instead verify the
    // aggregated bucket + midpoint math on a 2-hour gap.
    val ev = Seq(
      (1L, "2024-01-01 09:10:00", 2.0),
      (1L, "2024-01-01 09:40:00", 2.0), // same bucket -> v = 4.0
      (1L, "2024-01-01 11:05:00", 1.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.resampleInterpolate(ev, "user_id", "ts", "value")
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01T09:00:00Z", 2L, 4.0),
      ("2024-01-01T10:00:00Z", 0L, 2.5), // midpoint of 4.0 and 1.0
      ("2024-01-01T11:00:00Z", 1L, 1.0)))
  }

  test("resampleForwardFill honors a non-default step (grid and buckets agree)") {
    val ev = Seq(
      (1L, "2024-01-01 10:05:00", 1.0),
      (1L, "2024-01-01 10:40:00", 3.0), // next 30-min bucket
      (1L, "2024-01-01 12:10:00", 7.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.resampleForwardFill(ev, "user_id", "ts", "value",
        stepSeconds = 1800L)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01T10:00:00Z", 1L, 1.0),
      ("2024-01-01T10:30:00Z", 1L, 3.0), // events land in THEIR 30-min bucket
      ("2024-01-01T11:00:00Z", 0L, 3.0),
      ("2024-01-01T11:30:00Z", 0L, 3.0),
      ("2024-01-01T12:00:00Z", 1L, 7.0)))
  }
}
