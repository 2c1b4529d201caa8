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

  private def hourly(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")

  test("ewma: adjust=true renormalization over a short history (hand-computed)") {
    val ev = hourly(
      (1L, "2024-01-01 10:30:00", 2.0),
      (1L, "2024-01-01 11:30:00", 4.0),
      (1L, "2024-01-01 12:30:00", 8.0))
    val out = TimeSeries.ewma(ev, "user_id", "ts", "value", memory = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toInstant.toString, r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01T10:00:00Z", 2.0),      // lone bucket: weight total 1
      ("2024-01-01T11:00:00Z", 3.333333), // (4 + 2*0.5)/1.5
      ("2024-01-01T12:00:00Z", 6.666667))) // (8 + 4*0.5)/1.5 — 10:00 aged out
  }

  test("rollingZscore: NULL z on short/zero-variance windows, threshold flag") {
    val ev = hourly(
      (1L, "2024-01-01 10:30:00", 1.0),
      (1L, "2024-01-01 11:30:00", 1.0),
      (1L, "2024-01-01 12:30:00", 10.0))
    val out = TimeSeries.rollingZscore(ev, "user_id", "ts", "value",
        window = 3, threshold = 1.0)
      .orderBy("bucket").collect()
      .map(r => (Option(r.get(5)).map(_.asInstanceOf[Double]), r.getBoolean(6)))
    // nw=1 -> no variance; nw=2 constant -> std 0; nw=3: mean 4, std
    // sqrt(((1+1+100) - 144/3)/2) = sqrt(27), z = 6/5.196152 = 1.154701.
    assert(out.toSeq == Seq(
      (None, false), (None, false), (Some(1.154701), true)))
  }

  test("autocorr: alternating series is exactly -1; constant series is NULL") {
    val alt = (0 to 4).map(h =>
      (1L, f"2024-01-01 1$h%d:30:00", if (h % 2 == 0) 1.0 else 2.0))
    val const = (0 to 3).map(h => (2L, f"2024-01-01 1$h%d:30:00", 5.0))
    val out = TimeSeries.autocorr(hourly(alt ++ const: _*), "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, 4L, Some(-1.0)),  // perfect alternation
      (2L, 3L, None)))       // zero denominator -> NULL, not NaN
  }

  test("timeWeightedAvg: interval weights vs the biased simple mean; single sample NULL") {
    // v=1 holds 10s, v=10 holds 30s, v=2 is last (no interval):
    // TWA = (1*10 + 10*30)/40 = 7.75 while the simple mean is 13/3
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:00:10", 10.0),
      (1L, "2024-01-01 00:00:40", 2.0),
      (2L, "2024-01-01 00:00:00", 5.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.timeWeightedAvg(df, "user_id", "ts", "value")
      .orderBy("user_id").collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2)) == (3L, 40000000L))
    assert(r1.getDouble(3) == 7.75)
    assert(math.abs(r1.getDouble(4) - 4.333333) < 1e-6)
    val r2 = out(1) // one sample: no covered interval -> NULL TWA
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 0L && r2.isNullAt(3))
    assert(r2.getDouble(4) == 5.0)
  }

  test("pacf: linear ramp matches the hand-run Durbin-Levinson; constant key NULL") {
    // v_t = t for t=1..12 hourly: mu=6.5, s0=143, s1=107.25, s2=72.5,
    // s3=39.75 (hand-computed centered product sums)
    val ramp = (0 until 12).map(h =>
      (1L, f"2024-01-01 $h%02d:30:00", (h + 1).toDouble))
    val const = (0 to 3).map(h => (2L, f"2024-01-01 0$h%d:30:00", 5.0))
    val out = TimeSeries.pacf(hourly(ramp ++ const: _*),
      "user_id", "ts", "value").orderBy("user_id").collect()
    val r = out(0)
    assert(r.getLong(1) == 12L)
    assert(r.getDouble(2) == 0.75) // rho1 = 107.25/143 exactly
    assert(math.abs(r.getDouble(3) - 72.5 / 143) < 1e-6)
    assert(math.abs(r.getDouble(4) - 39.75 / 143) < 1e-6)
    assert(r.getDouble(5) == 0.75) // pacf1 = rho1
    val (rho1, rho2, rho3) = (0.75, 72.5 / 143, 39.75 / 143)
    val phi22 = (rho2 - rho1 * rho1) / (1 - rho1 * rho1)
    val phi21 = rho1 * (1 - phi22)
    val pacf3 = (rho3 - phi21 * rho2 - phi22 * rho1) /
      (1 - phi21 * rho1 - phi22 * rho2)
    assert(math.abs(r.getDouble(6) - phi22) < 1e-5)
    assert(math.abs(r.getDouble(7) - pacf3) < 1e-5)
    // constant series: zero variance -> NULL across the board, no error
    val c = out(1)
    assert(c.getLong(1) == 4L)
    assert(c.isNullAt(2) && c.isNullAt(5) && c.isNullAt(6) && c.isNullAt(7))
  }

  test("changepointScan: finds the level shift; ties break to the earliest bucket") {
    val shift = Seq(0.0, 0.0, 0.0, 10.0, 10.0).zipWithIndex.map {
      case (v, h) => (1L, f"2024-01-01 1$h%d:30:00", v) }
    val sym = Seq(0.0, 10.0, 0.0).zipWithIndex.map {
      case (v, h) => (2L, f"2024-01-01 1$h%d:30:00", v) }
    val out = TimeSeries.changepointScan(hourly(shift ++ sym: _*),
        "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      // best split after bucket 12: |0-10|*sqrt(3*2/5) = 10.954451
      (1L, "2024-01-01T12:00:00Z", 5L, 10.954451, 0.0, 10.0),
      // 0,10,0: splits at t=1 and t=2 score identically -> earliest wins
      (2L, "2024-01-01T10:00:00Z", 3L, 4.082483, 0.0, 5.0)))
  }

  test("olsTrend: exact line fits, flat series slope 0 / NULL r2, singleton NULL") {
    val ev = hourly(
      (1L, "2024-01-01 10:30:00", 1.0), (1L, "2024-01-01 11:30:00", 3.0),
      (1L, "2024-01-01 12:30:00", 5.0),                      // v = 1 + 2t
      (2L, "2024-01-01 10:30:00", 5.0), (2L, "2024-01-01 11:30:00", 5.0),
      (3L, "2024-01-01 10:30:00", 9.0))                      // single bucket
    val out = TimeSeries.olsTrend(ev, "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4))))
    assert(out.toSeq == Seq(
      (1L, 3L, Some(2.0), Some(1.0), Some(1.0)),
      (2L, 2L, Some(0.0), Some(5.0), None),   // no variance to explain
      (3L, 1L, None, None, None)))
  }

  test("crossCorr: lag 0 tracks v~n exactly; lag 1 hand value; constant v NULL") {
    // user 1: v == n in every bucket -> lag-0 r = 1.
    val u1 = Seq(
      (1L, "2024-01-01 10:10:00", 0.5), (1L, "2024-01-01 10:20:00", 1.5), // n=2 v=2
      (1L, "2024-01-01 11:10:00", 1.0),                                   // n=1 v=1
      (1L, "2024-01-01 12:10:00", 1.0), (1L, "2024-01-01 12:20:00", 1.0),
      (1L, "2024-01-01 12:30:00", 1.0))                                   // n=3 v=3
    // user 2: constant v -> zero variance -> NULL.
    val u2 = Seq((2L, "2024-01-01 10:10:00", 7.0), (2L, "2024-01-01 11:10:00", 7.0))
    val lag0 = TimeSeries.crossCorr(hourly(u1 ++ u2: _*), "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(lag0.toSeq == Seq((1L, 3L, Some(1.0)), (2L, 2L, None)))

    // lag 1: v = (4, 2, 6) against prior-bucket n = (1, 2, 1):
    // r = -6/sqrt(24*2) = -0.866025 (hand).
    val u3 = Seq(
      (3L, "2024-01-01 10:10:00", 9.0),                                   // n=1
      (3L, "2024-01-01 11:10:00", 1.0), (3L, "2024-01-01 11:20:00", 3.0), // n=2 v=4
      (3L, "2024-01-01 12:10:00", 2.0),                                   // n=1 v=2
      (3L, "2024-01-01 13:10:00", 6.0))                                   //     v=6
    val lag1 = TimeSeries.crossCorr(hourly(u3: _*), "user_id", "ts", "value", lag = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(lag1.toSeq == Seq((3L, -0.866025)))
  }

  test("seasonalStrength: pure phase signal is 1, phase-free noise is 0") {
    val ev = hourly(
      // user 1: value is a function of hour-of-day alone -> strength 1.
      (1L, "2024-01-01 10:30:00", 2.0), (1L, "2024-01-02 10:30:00", 2.0),
      (1L, "2024-01-01 11:30:00", 4.0), (1L, "2024-01-02 11:30:00", 4.0),
      // user 2: identical within-phase spread, equal phase means ->
      // strength 0; peak ties (means both 2) -> earliest phase.
      (2L, "2024-01-01 10:30:00", 1.0), (2L, "2024-01-02 10:30:00", 3.0),
      (2L, "2024-01-01 11:30:00", 1.0), (2L, "2024-01-02 11:30:00", 3.0))
    val out = TimeSeries.seasonalStrength(ev, "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, 11L, 1.0),
      (2L, 4L, 2L, 10L, 0.0)))
  }

  test("sax: hand-computed 2-segment word; degenerate keys omitted") {
    val ev = hourly(
      (1L, "2024-01-01 10:30:00", 1.0), (1L, "2024-01-01 11:30:00", 2.0),
      (1L, "2024-01-01 12:30:00", 3.0), (1L, "2024-01-01 13:30:00", 4.0),
      (2L, "2024-01-01 10:30:00", 5.0), (2L, "2024-01-01 11:30:00", 5.0), // flat
      (3L, "2024-01-01 10:30:00", 8.0))                                    // single
    val out = TimeSeries.sax(ev, "user_id", "ts", "value", segments = 2)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // user 1: mu=2.5 sigma=sqrt(5/3); segment means ∓0.774597 -> a / d.
    assert(out.toSeq == Seq((1L, 4L, "ad")))
  }

  test("chained pipeline: fill feeds seasonal + sax; gaps interpolated first") {
    // user 1: observations at hours 10 and 13 only — the chain must
    // interpolate 11 and 12 (values 3, 5) BEFORE computing downstream
    // stats, so the seasonal/sax stages see the 4-bucket series
    // 1,3,5,7 rather than the 2-point raw one.
    val ev = Seq(
      (1L, "2024-01-01 10:30:00", 1.0),
      (1L, "2024-01-01 13:30:00", 7.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val filled = TimeSeries.resampleInterpolate(ev, "user_id", "ts", "value")
    val seas = TimeSeries.seasonalStrength(filled, "user_id", "bucket", "v_interp")
      .collect()
    assert(seas.length == 1)
    assert(seas(0).getAs[Long]("n_rows") == 4L)      // filled, not raw 2
    assert(seas(0).getAs[Long]("n_phases") == 4L)
    assert(seas(0).getAs[Long]("peak_phase") == 13L) // hour of the max value
    val shapes = TimeSeries.sax(filled, "user_id", "bucket", "v_interp",
        segments = 2).collect()
    // z of 1,3,5,7: mu=4 sigma=sqrt(20/3)=2.581989; z=∓1.161895,∓0.387298;
    // segment means ∓0.774597 -> "ad" (same shape as the solo sax test).
    assert(shapes.length == 1)
    assert(shapes(0).getAs[Long]("n_buckets") == 4L)
    assert(shapes(0).getAs[String]("sax") == "ad")
  }

  test("m4Downsample: min/max/first/last per hour, values untouched") {
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:05:00", 5.0),
      (2L, 7L, "2024-01-01 10:20:00", 1.0),
      (3L, 7L, "2024-01-01 10:40:00", 9.0),
      (4L, 7L, "2024-01-01 11:10:00", 3.0),
      (5L, 8L, "2024-01-01 10:30:00", 2.0))
      .toDF("event_id", "user_id", "s", "value")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.m4Downsample(ev, "user_id", "ts", "value")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01T10:00:00Z", 3L, 1.0, 9.0, 5.0, 9.0),
      (7L, "2024-01-01T11:00:00Z", 1L, 3.0, 3.0, 3.0, 3.0),
      (8L, "2024-01-01T10:00:00Z", 1L, 2.0, 2.0, 2.0, 2.0)))
  }

  test("m4Downsample: first/last break ts ties on event_id") {
    val ev = Seq(
      (10L, 1L, "2024-01-01 10:00:00", 4.0),
      (2L, 1L, "2024-01-01 10:00:00", 7.0)) // same ts, lower id
      .toDF("event_id", "user_id", "s", "value")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"), $"value")
    val r = TimeSeries.m4Downsample(ev, "user_id", "ts", "value").collect()(0)
    assert(r.getDouble(5) == 7.0 && r.getDouble(6) == 4.0) // first=id2, last=id10
  }

  test("lttbDownsample: endpoints kept, max-area interior point chosen") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // one key, 3 buckets over t in [0, 9): points at t=0,1,2 | 3,4,5 | 6,7,8
    // values flat except a spike at t=4 -> interior bucket must pick t=4
    val rows = Seq(
      (0L, 0.0, 1L), (1L, 0.0, 2L), (2L, 0.0, 3L),
      (3L, 0.0, 4L), (4L, 9.0, 5L), (5L, 0.0, 6L),
      (6L, 0.0, 7L), (7L, 0.0, 8L), (8L, 0.0, 9L))
      .toDF("sec", "value", "event_id")
      .select(lit("k1").as("event_type"), to_timestamp(col("sec")).as("ts"),
        col("value"), col("event_id"))
    val out = graft.operators.TimeSeries.lttbDownsample(
        rows, "event_type", "ts", "value", 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getTimestamp(2).getTime / 1000, r.getDouble(3)))
    assert(out.toSeq == Seq((0, 0L, 0.0), (1, 4L, 9.0), (2, 8L, 0.0)))
  }

  test("lttbDownsample: flat series tie-breaks to earliest point per bucket") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val rows = (0L to 8L).map(i => (i, 5.0, i + 1))
      .toDF("sec", "value", "event_id")
      .select(lit("k").as("event_type"), to_timestamp(col("sec")).as("ts"),
        col("value"), col("event_id"))
    val out = graft.operators.TimeSeries.lttbDownsample(
        rows, "event_type", "ts", "value", 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getTimestamp(2).getTime / 1000))
    // bucket 0 -> first (t=0), bucket 1 -> all areas 0, earliest t=3,
    // bucket 2 -> last (t=8)
    assert(out.toSeq == Seq((0, 0L), (1, 3L), (2, 8L)))
  }


  test("dftSpectrum: pure k=1 cosine concentrates at harmonic 1") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val rows = (0 until 8).map { h =>
      (h * 3600L, math.cos(2 * math.Pi * h / 8.0), h.toLong)
    }.toDF("sec", "value", "event_id")
      .select(lit("k").as("event_type"), to_timestamp(col("sec")).as("ts"),
        col("value"))
    val out = graft.operators.TimeSeries.dftSpectrum(
        rows, "event_type", "ts", "value", 3)
      .orderBy("harmonic").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(math.abs(out(0)._2 - 0.5) < 1e-4, s"k=1 amp ${out(0)._2}")
    assert(out(1)._2 < 1e-4 && out(2)._2 < 1e-4) // no energy at k=2,3
    // constant series: zero amplitude at every k >= 1
    val flat = (0 until 8).map(h => (h * 3600L, 2.5)).toDF("sec", "value")
      .select(lit("k").as("event_type"), to_timestamp(col("sec")).as("ts"),
        col("value"))
    val f = graft.operators.TimeSeries.dftSpectrum(
        flat, "event_type", "ts", "value", 2).collect()
    assert(f.forall(_.getDouble(3) < 1e-4))
  }


  test("seasonalNaiveBacktest: hand-computed MAE over the test tail") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // hours 0..5, period 2, test last 2 hours: pred(4)=v(2), pred(5)=v(3)
    // values 10,20,30,40,50,64 -> errors |50-30|, |64-40| -> MAE 22
    val rows = Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (3L, 40.0),
      (4L, 50.0), (5L, 64.0))
      .toDF("hr", "value")
      .select(lit("k").as("event_type"),
        to_timestamp(col("hr") * 3600).as("ts"), col("value"))
    val r = graft.operators.TimeSeries.seasonalNaiveBacktest(
        rows, "event_type", "ts", "value", periodHours = 2, testHours = 2)
      .collect().head
    assert((r.getLong(1), r.getDouble(2)) == (2L, 22.0))
  }

  test("theilSen: median pairwise slope shrugs off the outlier OLS chases") {
    // hourly values 0,1,2,100,4: true trend 1/bucket, one wild outlier
    val ev = (0 to 4).zip(Seq(0.0, 1.0, 2.0, 100.0, 4.0)).map { case (h, v) =>
      (1L, f"2024-01-01 0$h:00:00", v) }
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val r = TimeSeries.theilSen(ev, "user_id", "ts", "value").collect().head
    // 10 pairwise slopes, median = 1; residuals at slope 1 -> median 0
    assert(r.getLong(1) == 5L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0)
    // OLS on the same series is dragged far off the robust answer
    val ols = TimeSeries.olsTrend(ev, "user_id", "ts", "value").collect().head
    assert(math.abs(ols.getDouble(2) - 1.0) > 5.0)
    // maxBuckets truncates the series BEFORE the quadratic: first 2 only
    val r2 = TimeSeries.theilSen(ev, "user_id", "ts", "value",
      maxBuckets = 2).collect().head
    assert(r2.getLong(1) == 2L && r2.getLong(2) == 1L &&
      r2.getDouble(3) == 1.0)
    // single-bucket keys have no pairs and drop out
    val one = Seq((9L, "2024-01-01 00:30:00", 5.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    assert(TimeSeries.theilSen(one, "user_id", "ts", "value").isEmpty)
  }

  test("motifDiscovery: exact repeat wins with zero distance, earliest positions") {
    // hourly series 1,2,1,2,5,5,1,2,1,2: window [1,2,1,2] recurs at t=0
    // and t=6 (non-overlapping, distance 0)
    val vs = Seq(1.0, 2.0, 1.0, 2.0, 5.0, 5.0, 1.0, 2.0, 1.0, 2.0)
    val ev = vs.zipWithIndex.map { case (v, h) =>
      (1L, f"2024-01-01 $h%02d:00:00", v) }
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val r = TimeSeries.motifDiscovery(ev, "user_id", "ts", "value")
      .collect().head
    // 7 complete length-4 windows; best pair (0, 6) at distance 0
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
      (7L, 0L, 6L, 0.0))
    // a series shorter than 2m has no non-overlapping pair -> no row
    val short = vs.take(6).zipWithIndex.map { case (v, h) =>
      (2L, f"2024-01-01 $h%02d:00:00", v) }
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    assert(TimeSeries.motifDiscovery(short, "user_id", "ts", "value").isEmpty)
  }

  test("spectralEntropy: a pure sinusoid concentrates, noise-like spreads") {
    def series(u: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, h) => (u, f"2024-01-01 $h%02d:00:00", v) }
    val n = 16
    val sine = series("sine", (0 until n)
      .map(h => math.sin(2 * math.Pi * h / n) * 10))
    val spiky = series("spiky", (0 until n)
      .map(h => Seq(1.0, 9.0, 2.0, 7.0, 3.0, 8.0, 1.0, 6.0)(h % 8) *
        (1 + h % 5)))
    val ev = (sine ++ spiky).toDF("event_type", "s", "value")
      .select($"event_type", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.spectralEntropy(ev, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    assert(out("sine")._1 == 4L)
    // harmonic 1 holds ~all the sine's energy -> entropy near 0
    assert(out("sine")._2 < 0.1, s"sine norm entropy ${out("sine")._2}")
    assert(out("spiky")._2 > out("sine")._2 + 0.2,
      s"expected spiky > sine: $out")
  }

  test("permutationEntropy: monotone -> one pattern; alternation -> ln 2") {
    def ev(u: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v) }
    val rows = (ev(1L, (1 to 8).map(_.toDouble)) ++          // increasing
        ev(2L, Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0)))           // alternating
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.permutationEntropy(rows, "user_id", "ts", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == (6L, 1L, 0.0))       // one ordinal pattern, H = 0
    val (nt, np, h) = out(2L)              // two patterns, 2 each
    assert(nt == 4L && np == 2L && math.abs(h - math.log(2.0)) < 1e-5)
  }

  test("cusumScan: a sustained level shift alarms; a stationary series does not") {
    def ev(u: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v) }
    // u1: 10 hours at 0, then 10 hours at 2 — classic drift
    // u2: alternating ±1 around 0 — no drift
    val rows = (ev(1L, Seq.fill(10)(0.0) ++ Seq.fill(10)(2.0)) ++
        ev(2L, (0 until 20).map(i => if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.cusumScan(rows, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // u1: dev = ∓1 for each half -> max upward excursion 10, sigma 1
    val (up1, down1, s1, a1) = out(1L)
    assert(up1 == 10.0 && s1 == 1.0 && a1)
    // downward: the running max is -1 (the FIRST prefix) until the rise,
    // so the drawdown at the trough is -1 - (-10) = 9, not 10
    assert(down1 == 9.0)
    // u2: prefix never strays beyond one step -> no alarm at 4 sigma
    val (up2, _, s2, a2) = out(2L)
    assert(up2 <= 1.0 + 1e-9 && s2 == 1.0 && !a2)
  }

  test("mannKendall: hand-run S, tie-corrected variance, continuity-corrected z") {
    def ev(u: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v) }
    // u1: [1,3,2,2] -> S = +3 - 2 + 0 = 1, tie group {2,2} corrects Var
    // u2: [1,2,3]   -> S = 3, no ties
    // u3: single bucket -> no pairs, dropped
    val rows = (ev(1L, Seq(1.0, 3.0, 2.0, 2.0)) ++ ev(2L, Seq(1.0, 2.0, 3.0)) ++
        ev(3L, Seq(5.0)))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.mannKendall(rows, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // Var = (4*3*13 - 2*1*9)/18 = 138/18; z = (1-1)/sqrt(Var) = 0
    assert(out(1L) == (4L, 6L, 1L, 7.666667, 0.0))
    // Var = 66/18; z = (3-1)/sqrt(66/18)
    assert(out(2L) == (3L, 3L, 3L, 3.666667, 1.044466))
    assert(!out.contains(3L))
  }

  test("runsTest: alternating series runs hand-count; constant series drops") {
    def ev(u: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v) }
    // u1: [1,5,1,5,1,5] -> med 3, 6 runs of length 1, n1 = n2 = 3
    // u2: constant [2,2,2] -> every bucket equals the median, no rows
    val rows = (ev(1L, Seq(1.0, 5.0, 1.0, 5.0, 1.0, 5.0)) ++
        ev(2L, Seq(2.0, 2.0, 2.0)))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.runsTest(rows, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getDouble(7))).toMap
    // E[R] = 1 + 2*9/6 = 4; Var = 18*12/(36*5) = 1.2; z = 2/sqrt(1.2)
    assert(out(1L) == (6L, 3.0, 3L, 3L, 6L, 4.0, 1.825742))
    assert(!out.contains(2L))
  }

  test("hurstExponent: ramp series hand-run R/S at two dyadic sizes") {
    val rows = (0 until 8).map(h => (1L, f"2024-01-01 $h%02d:00:00", h.toDouble))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.hurstExponent(rows, "user_id", "ts", "value",
        windows = Seq(4, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // w=4: both chunks R=8/4=2, s=sqrt(1.25) -> rs 1.788854
    // w=8: R=8, s=sqrt(5.25) -> rs 3.491486
    // slope over (2, log2 1.788854), (3, log2 3.491486) = 0.964805
    assert(out.toSeq == Seq((1L, 8L, 2L, 3L, 0.964805)))
  }

  test("turningPoints: hand peak/valley count; strict inequality; n>=3 gate") {
    def ev(u: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v) }
    // u1: [1,3,2,5,4] -> interior 3 (peak), 2 (valley), 5 (peak) = 3
    // u2: monotone [1,2,3] -> 0 turning points
    // u3: plateau [1,2,2] -> ties are not turning points
    // u4: two buckets -> dropped by the n_buckets >= 3 gate
    val rows = (ev(1L, Seq(1.0, 3.0, 2.0, 5.0, 4.0)) ++
        ev(2L, Seq(1.0, 2.0, 3.0)) ++ ev(3L, Seq(1.0, 2.0, 2.0)) ++
        ev(4L, Seq(1.0, 2.0)))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = TimeSeries.turningPoints(rows, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // E = 2(5-2)/3 = 2; z = (3-2)/sqrt((16*5-29)/90)
    assert(out(1L) == (5L, 3L, 2.0, 1.328422))
    assert(out(2L) == (3L, 0L, 0.666667, -1.450953))
    assert(out(3L) == (3L, 0L, 0.666667, -1.450953))
    assert(!out.contains(4L))
  }

  test("grangerLite: x perfectly leads y, zero-filled spine, hand moments") {
    // hourly counts over buckets 0..4 (zero-filled): y = [0,1,0,0,1],
    // x = [1,0,0,1,0] -> y_t = x_{t-1} exactly. Hand moments (n=4):
    // cyy=4 cuu=3 cvv=4 cuy=-2 cvy=4 cuv=-2 -> R2_ar1 = 4/12,
    // R2_full = 32/32 = 1.
    val rows = Seq(("a", 1), ("a", 4), ("x", 0), ("x", 3))
      .map { case (t, h) => (t, f"2024-01-01 $h%02d:30:00") }
      .toDF("event_type", "s")
      .select($"event_type", to_timestamp($"s").as("ts"))
    val r = TimeSeries.grangerLite(rows, "a", "x").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.333333)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.666667)
  }

  test("bollingerBands: hand-computed envelope; flat window sd exactly 0, NULL %B") {
    val ev = hourly(
      (1L, "2024-01-01 10:30:00", 10.0), (1L, "2024-01-01 11:30:00", 10.0),
      (1L, "2024-01-01 12:30:00", 10.0), (1L, "2024-01-01 13:30:00", 14.0))
    val out = TimeSeries.bollingerBands(ev, "user_id", "ts", "value",
        window = 3, mult = 2.0)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(3), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7))))
    // t0: single obs -> NULL bands; t1/t2: flat window -> sd EXACTLY 0,
    // upper == lower == ma, %B NULL (0/0 via try_divide, never noise)
    assert(out(0) == ((1L, Some(10.0), None, None, None)))
    assert(out(1) == ((2L, Some(10.0), Some(10.0), Some(10.0), None)))
    assert(out(2) == ((3L, Some(10.0), Some(10.0), Some(10.0), None)))
    // t3: window (10,10,14): ma 34/3, sd sqrt(16/3); %B hand-computed
    assert(out(3)._1 == 3L)
    assert(out(3)._2.contains(11.333333))
    assert(out(3)._3.contains(15.952135))
    assert(out(3)._4.contains(6.714531))
    assert(out(3)._5.contains(0.788675))
  }

  test("dickeyFuller: mean-reverting series hand-computed; random-walk-exact NULL t") {
    val ev = hourly(
      // key 1: near-perfect alternation -> strong mean reversion
      (1L, "2024-01-01 10:30:00", 10.0), (1L, "2024-01-01 11:30:00", 0.0),
      (1L, "2024-01-01 12:30:00", 9.0), (1L, "2024-01-01 13:30:00", 1.0),
      (1L, "2024-01-01 14:30:00", 10.0),
      // key 2: perfect linear trend -> Δv constant, zero residual
      // variance AND zero Δv variance: gamma 0, t NULL (0/0)
      (2L, "2024-01-01 10:30:00", 1.0), (2L, "2024-01-01 11:30:00", 2.0),
      (2L, "2024-01-01 12:30:00", 3.0), (2L, "2024-01-01 13:30:00", 4.0))
    val out = TimeSeries.dickeyFuller(ev, "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4))))
    // key 1: x=(10,0,9,1), y=(-10,9,-8,9): Cxx=328, Cxy=-652, Cyy=1304
    // gamma = -652/328 = -1.987805; t = gamma/sqrt(7.95122/656) = -18.0554
    assert(out(0)._1 == 1L && out(0)._2 == 4L)
    assert(out(0)._3.contains(-1.987805))
    assert(math.abs(out(0)._4.get.asInstanceOf[Double] - (-18.0554)) < 0.01)
    assert(out(0)._5.contains(true))
    assert(out(1) == ((2L, 3L, Some(0.0), None, None)))
  }

}
