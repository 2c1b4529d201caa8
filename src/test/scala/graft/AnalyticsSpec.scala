package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.{lit, to_timestamp}
import graft.analytics.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("topSongs: counts, deterministic tie-break, limit") {
    val plays = Seq("s1", "s1", "s2", "s3", "s3").toDF("song_id")
    val songs = Seq(("s1", "A"), ("s2", "B"), ("s3", "C")).toDF("song_id", "title")
    val out = Analytics.topSongs(plays, songs, 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("s1", 2L), ("s3", 2L))) // tie at 2 plays -> song_id order
  }

  test("favoriteArtist: one row per user, most-played wins") {
    val plays = Seq(("u1", "a1"), ("u1", "a1"), ("u1", "a2"), ("u2", "a2"))
      .toDF("user_id", "artist_id")
    val artists = Seq(("a1", "X"), ("a2", "Y")).toDF("artist_id", "name")
    val out = Analytics.favoriteArtist(plays, artists).orderBy("user_id").collect()
    assert(out.map(r => (r.getAs[String]("user_id"), r.getAs[String]("artist_id"))).toSeq
      == Seq(("u1", "a1"), ("u2", "a2")))
  }

  test("userActivity: session counts are distinct") {
    val plays = Seq(("u1", "paid", 1), ("u1", "paid", 1), ("u1", "paid", 2))
      .toDF("user_id", "level", "session_id")
    val r = Analytics.userActivity(plays).collect()(0)
    assert(r.getAs[Long]("n_plays") == 3L)
    assert(r.getAs[Long]("n_sessions") == 2L)
  }

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel: stages must occur in order, strictly after the prior stage") {
    val e = Seq(
      (1L, "signup", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)), // full path
      (2L, "click", ts(0)), (2L, "signup", ts(1)),                          // click BEFORE signup
      (3L, "signup", ts(0)), (3L, "purchase", ts(1)),                       // skips click
      (4L, "purchase", ts(0))                                               // never signed up
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(e, Seq("signup", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_users")))
    // signup: users 1,2,3; click-after-signup: only 1; purchase after that: 1
    assert(out.toSeq == Seq(("signup", 3L), ("click", 1L), ("purchase", 1L)))
  }

  test("funnel: same-timestamp events do not satisfy the strict order") {
    val e = Seq((1L, "signup", ts(0)), (1L, "click", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(e, Seq("signup", "click"))
      .orderBy("stage_idx").collect().map(_.getAs[Long]("n_users"))
    assert(out.toSeq == Seq(1L, 0L))
  }

  test("retention: cohort = first-seen week, offsets count distinct active users") {
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // weeks: Mon 2024-01-01, Mon 2024-01-08, Mon 2024-01-15
    val e = Seq(
      (1L, day(2)), (1L, day(3)),   // cohort w0, active twice in w0
      (1L, day(10)),                // w0 cohort active at offset 1
      (2L, day(9)),                 // cohort w1
      (2L, day(16))                 // offset 1
    ).toDF("user_id", "ts")
    val out = Analytics.retention(e).orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort_week").toString.take(10),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users")))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("transitions: per-user time-ordered pairs, ties broken by event id") {
    val e = Seq(
      (10L, 1L, "a", ts(0)), (11L, 1L, "b", ts(1)), (12L, 1L, "c", ts(2)),
      (13L, 2L, "a", ts(0)), (14L, 2L, "b", ts(0)) // same ts -> id order a->b
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.transitions(e).orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 2L), ("b", "c", 1L)))
  }

  test("rfm: boundary scores, best/worst customers, exact monetary") {
    import java.sql.Date
    // 5 customers, clearly separated metrics so quintile scores are forced:
    // customer i ordered (i+1) times, last order day 10*i, 100*(i+1) total.
    val orders = (0 until 5).flatMap { i =>
      (0 to i).map(j => (100L + i, Date.valueOf(f"2024-01-${10 * i / 2 + 1}%02d"),
        100.0 * (i + 1) / (i + 1))) // each order 100.0 -> monetary = 100*(i+1)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.rfm(orders, lit("2024-02-01").cast("date"), nTiles = 5,
        custCol = "o_custkey", dateCol = "o_orderdate", amountCol = "o_totalprice")
      .orderBy("custkey").collect()
    assert(out.length == 5)
    val best = out.last // custkey 104: most recent, most orders, most revenue
    assert(best.getAs[Long]("r_score") == 1L)
    assert(best.getAs[Long]("f_score") == 1L)
    assert(best.getAs[Long]("m_score") == 1L)
    val worst = out.head // custkey 100: oldest single cheap order
    assert(worst.getAs[Long]("r_score") == 5L)
    assert(worst.getAs[Long]("f_score") == 5L)
    assert(worst.getAs[Long]("m_score") == 5L)
    assert(out.map(_.getAs[java.math.BigDecimal]("monetary").doubleValue()).toSeq
      == Seq(100.0, 200.0, 300.0, 400.0, 500.0))
  }

  test("activityIslands: consecutive days fuse, gaps split, per-user isolation") {
    def d(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s 12:00:00")
    val e = Seq(
      (1L, d("01")), (1L, d("02")), (1L, d("02")), (1L, d("03")), // island 1-3
      (1L, d("05")),                                              // island 5-5
      (2L, d("03")), (2L, d("04"))                                // other user
    ).toDF("user_id", "ts")
    val out = Analytics.activityIslands(e).orderBy("user_id", "island_start")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-03", "2024-01-04", 2L)))
  }

  test("sessionSequences: gap splits sessions, ts ties ordered by event id") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val e = Seq(
      (1L, t(0), 1L, "a"), (1L, t(10), 2L, "b"),  // session 1: a b
      (1L, t(50), 3L, "c"),                        // > 30m gap -> session 2
      (2L, t(0), 5L, "y"), (2L, t(0), 4L, "x")     // same ts -> id order: x y
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.sessionSequences(e, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.map(_.getAs[String]("sequence")).toSeq == Seq("a b", "c", "x y"))
    assert(out(0).getAs[Long]("n_events") == 2L)
    // session end = last event + gap
    assert(out(0).getAs[java.sql.Timestamp]("session_end") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:40:00"))
  }

  test("basketPairs: hand support/confidence/lift; minSupport filters") {
    val lines = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"), (4L, "C"),
      (4L, "C") // duplicate line in a basket must not double-count
    ).toDF("order", "part")
    val out = Analytics.basketPairs(lines, "order", "part", minSupport = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // N=4 baskets; cA=cB=cC=3; each pair co-occurs twice
    assert(out.size == 3)
    val (c12, sup, conf, lift) = out(("A", "B"))
    assert(c12 == 2L && sup == 0.5)
    assert(math.abs(conf - 2.0 / 3) < 1e-6)
    assert(math.abs(lift - 8.0 / 9) < 1e-6)
    // raising minSupport above the co-occurrence counts empties the result
    assert(Analytics.basketPairs(lines, "order", "part", minSupport = 3L, k = 10)
      .count() == 0)
  }

  test("basketPairs: NULL items never pair or count; an all-NULL basket leaves the universe") {
    val lines = Seq(
      (1L, Some("A")), (1L, Some("B")), (1L, None), // null item in a live basket
      (2L, Some("A")), (2L, Some("B")),
      (3L, None), (3L, None)                        // all-NULL basket
    ).toDF("order", "part")
    val out = Analytics.basketPairs(lines, "order", "part", minSupport = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(7))).toMap
    assert(out.keySet == Set(("A", "B"))) // null forms no pair
    val (c12, sup, lift) = out(("A", "B"))
    // denominator = 2 baskets: basket 3 (all NULL) is NOT a basket
    assert(c12 == 2L && sup == 1.0)
    assert(math.abs(lift - 2.0 * 2 / (2 * 2)) < 1e-6) // cA=cB=2, N=2
  }

  test("basketPairs: maxBasketSize excludes a pathological mega-basket whole") {
    // Baskets 1..3 are normal; basket 99 is a bot touching 30 items —
    // uncapped it contributes 435 pairs and inflates every frequency.
    val normal = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"))
    val mega = (0 until 30).map(i => (99L, s"M$i"))
    val lines = (normal ++ mega).toDF("order", "part")
    val capped = Analytics.basketPairs(lines, "order", "part",
      minSupport = 2L, k = 1000, maxBasketSize = 10L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // only the normal pair survives, with the capped-universe denominator
    assert(capped.keySet == Set(("A", "B")))
    val (c12, sup) = capped(("A", "B"))
    assert(c12 == 3L && sup == 1.0) // 3 baskets in the capped universe
    // uncapped, the mega-basket's 435 self-pairs appear (minSupport 1)
    val uncapped = Analytics.basketPairs(lines, "order", "part",
      minSupport = 1L, k = 1000)
    assert(uncapped.count() == 435 + 1)
  }

  test("outliersMad: catches the masked extreme z misses; MAD-0 group silent") {
    // group a: mean 22, sd ~43.6 -> z(100) ~ 1.79 squeaks past a z=2 gate
    // (masking); median 3, MAD 1 -> mad_score(100) = 97 flags loudly.
    val events = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "a", 100.0),
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0)) // constant: MAD 0
      .toDF("event_id", "event_type", "value")
    assert(Analytics.outliers(events, zThreshold = 2.0).count() == 0)
    val out = Analytics.outliersMad(events, kThreshold = 3.0).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L))
    val r = out.head
    assert(r.getAs[Double]("group_median") == 3.0)
    assert(r.getAs[Double]("group_mad") == 1.0)
    assert(r.getAs[Double]("mad_score") == 97.0)
  }

  test("winsorize: tails clip to the exact boundaries, interior untouched") {
    val e = ((1L to 8L).map(i => (i, i.toDouble)) ++ Seq((9L, 1000.0), (0L, -1000.0)))
      .toDF("event_id", "value")
    // quartile clipping on 10 values, sorted [-1000, 1..8, 1000]:
    // p25 = v[2] + 0.25 = 2.25, p75 = v[6] + 0.75 = 6.75 (linear interp)
    val out = Analytics.winsorize(e, 0.25, 0.75).orderBy("event_id").collect()
    val clipped = out.map(r => r.getAs[Long]("event_id") ->
      (r.getAs[Double]("clipped"), r.getAs[Boolean]("was_clipped"))).toMap
    assert(clipped(0L) == ((2.25, true)) && clipped(9L) == ((6.75, true)))
    assert(clipped(4L) == ((4.0, false))) // interior value unchanged
    // below 2.25: -1000, 1, 2; above 6.75: 7, 8, 1000
    assert(out.count(_.getAs[Boolean]("was_clipped")) == 6)
  }

  test("outliers: hand-computed z, inliers dropped, constant group silent") {
    val e = ((1L to 9L).map(i => (i, "a", 0.0)) :+ (10L, "a", 100.0)) ++
      Seq((11L, "b", 5.0), (12L, "b", 5.0), (13L, "b", 5.0)) // sd = 0
    val out = Analytics.outliers(e.toDF("event_id", "event_type", "value"))
      .collect()
    // group a: mean 10, ss = 9*100 + 8100 = 9000, sd = sqrt(1000);
    // z(100) = 90/sqrt(1000) ≈ 2.846050 > 2; z(0) ≈ -0.316 inlier.
    // group b: sd = 0 -> z is NaN/Inf -> never flagged.
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("event_id") == 10L)
    assert(math.abs(r.getAs[Double]("zscore") - 90.0 / math.sqrt(1000.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("group_mean") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("group_sd") - math.sqrt(1000.0)) < 1e-6)
  }

  test("firstTouchAttribution: earliest touch wins; later-touch-only users get NULL") {
    val ev = Seq(
      (1L, 5L, "view",     "2024-01-01 09:00:00"),
      (2L, 5L, "click",    "2024-01-01 10:00:00"),
      (3L, 5L, "purchase", "2024-01-01 11:00:00"),  // -> view @09 (id 1)
      (4L, 6L, "purchase", "2024-01-01 08:00:00"),  // touch only AFTER -> NULL
      (5L, 6L, "click",    "2024-01-01 09:30:00"),
      (6L, 7L, "purchase", "2024-01-01 12:00:00"))  // no touches at all -> NULL
      .toDF("event_id", "user_id", "event_type", "s")
      .select($"event_id", $"user_id", $"event_type", to_timestamp($"s").as("ts"))
    val out = Analytics.firstTouchAttribution(ev, Seq("click", "view"), "purchase")
      .orderBy("conversion_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(out(0).fieldIndex("touch_id")) == 1L
      && out(0).getString(out(0).fieldIndex("touch_type")) == "view")
    assert(out(1).isNullAt(out(1).fieldIndex("touch_id")))
    assert(out(2).isNullAt(out(2).fieldIndex("touch_id")))
  }

  test("intervalUnion: overlapping and touching merge, gaps split, per-key") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> [0,20]
      (1L, 20L, 30L),                 // touching -> still [0,30]
      (1L, 40L, 50L),                 // gap -> new island
      (2L, 0L, 5L))                   // other key
      .toDF("user_id", "start_s", "end_s")
    val out = Analytics.intervalUnion(iv).orderBy("user_id", "covered_from")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 30L, 30L, 3L),
      (1L, 40L, 50L, 10L, 1L),
      (2L, 0L, 5L, 5L, 1L)))
  }

  test("topPaths: exact path counts, deterministic tie order, k cut") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    // user 1: two sessions "a b" (gap > 30min splits); user 2: "a b";
    // user 3: "c" -> paths: "a b" x3, "c" x1
    val events = Seq(
      (1L, 1L, "a", t(0)), (2L, 1L, "b", t(1)),
      (3L, 1L, "a", t(50)), (4L, 1L, "b", t(55)),
      (5L, 2L, "a", t(0)), (6L, 2L, "b", t(2)),
      (7L, 3L, "c", t(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Analytics.topPaths(events, "30 minutes", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a b", 3L, 2.0), ("c", 1L, 1.0)))
    val top1 = graft.analytics.Analytics.topPaths(events, "30 minutes", 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "a b")
  }

  test("markovStationary: two-state flip chain converges to uniform; absorbing state hoards") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    // user 1 alternates a,b,a,b,a -> P(a->b)=1, P(b->a)=1: stationary is
    // exactly (0.5, 0.5) and the uniform start never moves.
    val flip = Seq((1L, "a", t(0)), (2L, "b", t(1)), (3L, "a", t(2)),
      (4L, "b", t(3)), (5L, "a", t(4)))
      .map { case (id, ty, ts) => (id, 1L, ty, ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Analytics.markovStationary(flip, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 0.5, "b" -> 0.5))
    // a -> b, b -> b: b absorbs in ONE round (a pushes everything to b,
    // b keeps its own) and the distribution pins at (0, 1) thereafter.
    val absorb = Seq((1L, "a", t(0)), (2L, "b", t(1)), (3L, "b", t(2)))
      .map { case (id, ty, ts) => (id, 1L, ty, ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out2 = graft.analytics.Analytics.markovStationary(absorb, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2("a") == 0.0 && out2("b") == 1.0)
  }

  test("kaplanMeier: product-limit curve on a hand-built cohort") {
    import spark.implicits._
    def d(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    // u1: days 0..1 (churns — dark for 19 days before corpus end);
    // u2, u3: days 0..20 (active at the end — censored).
    val ev = Seq((1L, 1L, d(0)), (2L, 1L, d(1)),
      (3L, 2L, d(0)), (4L, 2L, d(20)),
      (5L, 3L, d(0)), (6L, 3L, d(20)))
      .toDF("event_id", "user_id", "ts")
    val out = graft.analytics.Analytics.kaplanMeier(ev)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // step 1: 3 at risk, 1 churn -> S = 2/3; step 20: both censored.
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 0L, 0.666667),
      (20L, 2L, 0L, 2L, 0.666667)))
  }

  test("abTest: symmetric arms give zero lift and no significance") {
    import spark.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    // arms by user_id parity: u0,u2 -> A (1 conversion), u1,u3 -> B (1).
    val ev = Seq((1L, 0L, "purchase", t(0)), (2L, 1L, "view", t(1)),
      (3L, 2L, "view", t(2)), (4L, 3L, "purchase", t(3)),
      (5L, 3L, "click", t(4)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = graft.analytics.Analytics.abTest(ev, "purchase").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
    assert(!r.getBoolean(8))
  }

  test("timeDecayAttribution: exponential weights split one conversion") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def at(sec: Long) = new Timestamp(base + sec * 1000L)
    // click 1 day before the purchase (w = 0.5), view half a day before
    // (w = 0.5^0.5 = 0.707107): credits 0.5/1.207107 = 0.414213 and
    // 0.707107/1.207107 = 0.585787.
    val ev = Seq((1L, 1L, "click", at(0L)),
      (2L, 1L, "view", at(43200L)),
      (3L, 1L, "purchase", at(86400L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Analytics
      .timeDecayAttribution(ev, Seq("click", "view"), "purchase")
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("click", 1L, 0.414213), ("view", 1L, 0.585787)))
  }

  test("newVsReturning: first-seen day splits actives") {
    import spark.implicits._
    def d(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$day $h%02d:00:00")
    val ev = Seq((1L, 1L, d(1, 9)), (2L, 1L, d(1, 17)), (3L, 1L, d(2, 9)),
      (4L, 2L, d(2, 10)))
      .toDF("event_id", "user_id", "ts")
    val out = graft.analytics.Analytics.newVsReturning(ev)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L, 1L, 0L),   // u1 new
      ("2024-01-02", 2L, 1L, 1L)))  // u2 new, u1 returning
  }

  test("interarrivalHistogram: hand-computed log2 buckets") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // one user, events at 0s, 1s, 5s, 125s -> gaps 1, 4, 120 s
    // buckets: 1 (1 < 2), 3 (4 < 8), 7 (120 < 128)
    val rows = Seq((0.0, 1L), (1.0, 2L), (5.0, 3L), (125.0, 4L))
      .toDF("sec", "event_id")
      .select(lit(7L).as("user_id"), to_timestamp(col("sec")).as("ts"),
        col("event_id"))
    val out = Analytics.interarrivalHistogram(rows).orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((1, 1L, 1L, 1L), (3, 1L, 4L, 4L),
      (7, 1L, 120L, 120L)))
    // sub-second gap lands in bucket 0
    val sub = Seq((0.0, 1L), (0.5, 2L)).toDF("sec", "event_id")
      .select(lit(1L).as("user_id"), to_timestamp(col("sec")).as("ts"),
        col("event_id"))
    val b0 = Analytics.interarrivalHistogram(sub).collect().head
    assert((b0.getInt(0), b0.getLong(1)) == (0, 1L))
  }


  test("peakConcurrency: hand-computed sweep with same-second churn") {
    // [0,10), [5,15), [5,8), [20,25): concurrency 1,3,2,1,0,1 ->
    // peak 3 first reached at t=5; end-exclusive: at t=8 conc drops to 2
    val iv = Seq((0L, 10L), (5L, 15L), (5L, 8L), (20L, 25L))
      .toDF("start_s", "end_s")
    val r = Analytics.peakConcurrency(iv).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 3L, 5L))
    // an interval ending exactly when another starts never overlaps it
    val touch = Seq((0L, 5L), (5L, 10L)).toDF("start_s", "end_s")
    assert(Analytics.peakConcurrency(touch).collect().head.getLong(1) == 1L)
  }

  test("peakConcurrency is bucket-count invariant") {
    val iv = (0L until 50L).map(i => (i, i + 7L)).toDF("start_s", "end_s")
    val a = Analytics.peakConcurrency(iv, buckets = 1).collect().head
    val b = Analytics.peakConcurrency(iv, buckets = 16).collect().head
    assert(a == b && a.getLong(1) == 7L)
  }

  test("typeOverlapMatrix: exact intersections and Jaccard") {
    val e = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (2L, "y"), (3L, "y"), (4L, "y"), (9L, "z"))
      .toDF("user_id", "event_type")
    val out = Analytics.typeOverlapMatrix(e).orderBy("type_a", "type_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // x:{1,2,3} y:{2,3,4} -> inter 2, union 4 -> 0.5; z disjoint (no row)
    assert(out.toSeq == Seq(("x", "y", 3L, 3L, 2L, 0.5)))
  }


  test("stageLatency: hand-computed first-to-first gaps") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // user 1: signup@0, click@10, purchase@70 -> gaps 10 and 60
    // user 2: signup@100, click@90 (click BEFORE signup -> excluded)
    val rows = Seq(
      (1L, "signup", 0.0), (1L, "click", 10.0), (1L, "purchase", 70.0),
      (2L, "signup", 100.0), (2L, "click", 90.0))
      .toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("sec")).as("ts"))
    val out = Analytics.stageLatency(rows,
        Seq("signup", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0, "signup", "click", 1L, 10.0),
      (1, "click", "purchase", 1L, 60.0)))
  }

  test("windowFunnel: 24h anchor bound, strict order, later anchors rescue the chain") {
    def ev(u: Long, t: String, ty: String) = (u, t, ty)
    val rows = Seq(
      // u1: clean chain inside the window -> level 3
      ev(1, "2024-01-01 00:00:00", "signup"),
      ev(1, "2024-01-01 01:00:00", "click"),
      ev(1, "2024-01-01 02:00:00", "purchase"),
      // u2: click 25h after the only signup -> level 1
      ev(2, "2024-01-01 00:00:00", "signup"),
      ev(2, "2024-01-02 01:00:00", "click"),
      // u3: click ok, purchase falls outside the ANCHOR window -> level 2
      ev(3, "2024-01-01 00:00:00", "signup"),
      ev(3, "2024-01-01 01:00:00", "click"),
      ev(3, "2024-01-02 01:00:00", "purchase"),
      // u4: no signup -> never counted
      ev(4, "2024-01-01 00:00:00", "click"),
      // u5: first anchor expires, the SECOND signup's chain completes
      ev(5, "2024-01-01 00:00:00", "signup"),
      ev(5, "2024-01-02 00:30:00", "signup"),
      ev(5, "2024-01-02 01:00:00", "click"),
      ev(5, "2024-01-02 02:00:00", "purchase"))
      .toDF("user_id", "s", "event_type")
      .select($"user_id", to_timestamp($"s").as("ts"), $"event_type")
    val out = Analytics.windowFunnel(rows,
        Seq("signup", "click", "purchase"), 86400L)
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // signups: u1,u2,u3,u5 = 4; clicks in-window: u1,u3,u5; purchases: u1,u5
    assert(out.toSeq == Seq(
      (1L, "signup", 4L), (2L, "click", 3L), (3L, "purchase", 2L)))
    // same-instant events do NOT chain (strict >)
    val tie = Seq(
      ev(9, "2024-01-01 00:00:00", "signup"),
      ev(9, "2024-01-01 00:00:00", "click"))
      .toDF("user_id", "s", "event_type")
      .select($"user_id", to_timestamp($"s").as("ts"), $"event_type")
    val t2 = Analytics.windowFunnel(tie, Seq("signup", "click"), 3600L)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(t2.toSeq == Seq(1L, 0L))
  }

  test("cohortLtv: weekly values accumulate per cohort") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),  // cohort week 0
      (1L, "2024-01-08 10:00:00", 5.0),   // week offset 1
      (1L, "2024-01-08 11:00:00", 2.0))   // same week, sums with the 5
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = Analytics.cohortLtv(rows).orderBy("week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((0L, 1L, 10.0, 10.0), (1L, 2L, 7.0, 17.0)))
  }

  test("activityConcentration: shares from the frequency table, no ranking") {
    // users with 1, 2, and 4 events: 7 events over 3 users
    val rows = (Seq(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(4)(3L))
      .zipWithIndex.map { case (u, i) => (u, i.toLong) }
      .toDF("user_id", "event_id")
    val out = Analytics.activityConcentration(rows, Seq(1L, 2L, 4L))
      .orderBy("threshold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out(0) == (1L, 3L, 7L, 1.0, 1.0))
    assert(out(1) == (2L, 2L, 6L, 0.666667, 0.857143))
    assert(out(2) == (4L, 1L, 4L, 0.333333, 0.571429))
  }

  test("stickiness: hand DAU/MAU over observed active days") {
    val rows = Seq(
      (1L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
      (1L, "2024-03-05 10:00:00"), (3L, "2024-03-05 11:00:00"),
      (1L, "2024-03-05 12:00:00")) // duplicate same-day activity: 1 DAU
      .toDF("user_id", "s")
      .select($"user_id", to_timestamp($"s").as("ts"))
    val r = Analytics.stickiness(rows).collect().head
    // 2 active days (DAU 2, 2), MAU 3 -> avg_dau 2, stickiness 2/3
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-6)
  }

  test("sessionEntropy: hand per-session Shannon H; boundary event stays") {
    val rows = Seq(
      // u1 session 1: [A, B] -> H = ln 2; session 2 (gap 50 min):
      // [A, A, B, B] -> H = ln 4 - 2*round(2 ln 2)/4 = ln 2
      (1L, "2024-01-01 00:00:00", "A", 1L),
      (1L, "2024-01-01 00:10:00", "B", 2L),
      (1L, "2024-01-01 01:00:00", "A", 3L),
      (1L, "2024-01-01 01:05:00", "A", 4L),
      (1L, "2024-01-01 01:10:00", "B", 5L),
      (1L, "2024-01-01 01:15:00", "B", 6L),
      // u2: +30:00 exactly is NOT a new session (strict >); +31 is
      (2L, "2024-01-01 00:00:00", "A", 7L),
      (2L, "2024-01-01 00:30:00", "A", 8L),
      (2L, "2024-01-01 01:01:00", "B", 9L))
      .toDF("user_id", "s", "event_type", "event_id")
      .select($"user_id", to_timestamp($"s").as("ts"), $"event_type",
        $"event_id")
    val out = Analytics.sessionEntropy(rows).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(out(1L) == (2L, 6L, 0.693147, 0.693147))
    // u2: [A,A] H=0 and [B] H=0
    assert(out(2L) == (2L, 3L, 0.0, 0.0))
  }

  test("giniIndex: hand rank formula; uniform 0; single user 0") {
    // A: counts (1,1,2) -> G = (2*9 - 4*4)/(3*4) = 1/6
    // B: counts (2,2,2) -> 0; C: one user -> 0
    val rows = (Seq((1L, "A"), (2L, "A"), (3L, "A"), (3L, "A")) ++
        Seq(1L, 1L, 2L, 2L, 3L, 3L).map((_, "B")) ++ Seq((1L, "C")))
      .toDF("user_id", "event_type")
    val out = Analytics.giniIndex(rows).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") == (3L, 4L, 0.166667))
    assert(out("B") == (3L, 6L, 0.0))
    assert(out("C") == (1L, 1L, 0.0))
  }

  test("priceElasticity: exact -2 power law; zero price variance -> NULL") {
    // unit prices 2/4/8 vs quantities 8/2/0.5: q = 32·pu^-2, so the
    // log-log slope is -2 (−1.999999 after the 6-dp ln quantization)
    val li = Seq((1L, 8.0, 16.0), (2L, 2.0, 8.0), (3L, 0.5, 4.0),
      // group B: both lines at the same unit price -> cxx = 0
      (4L, 1.0, 3.0), (5L, 2.0, 6.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.priceElasticity(li, part).collect().map(r =>
      r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("A") == (3L, Some(-1.999999), Some(1.0)))
    assert(out("B") == (2L, None, None))
  }

  test("markovEntropyRate: deterministic chain 0; fair-coin chain ln 2") {
    def ev(u: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, h) => (u, t, f"2024-01-01 $h%02d:00:00", h.toLong) }
    // A,B,A,B,A: P(A->B) = P(B->A) = 1 -> H = 0
    val det = ev(1L, Seq("A", "B", "A", "B", "A"))
      .toDF("user_id", "event_type", "s", "event_id")
      .select($"user_id", $"event_type", to_timestamp($"s").as("ts"),
        $"event_id")
    val d = Analytics.markovEntropyRate(det).collect().head
    assert((d.getLong(0), d.getLong(1), d.getDouble(2), d.getDouble(3)) ==
      (2L, 2L, 0.0, 0.0))
    // A,A,B,B,A: all four transitions once -> P uniform, H = ln 2,
    // normalized exactly 1
    val coin = ev(1L, Seq("A", "A", "B", "B", "A"))
      .toDF("user_id", "event_type", "s", "event_id")
      .select($"user_id", $"event_type", to_timestamp($"s").as("ts"),
        $"event_id")
    val c = Analytics.markovEntropyRate(coin).collect().head
    assert((c.getLong(0), c.getLong(1), c.getDouble(2), c.getDouble(3)) ==
      (2L, 4L, 0.693147, 1.0))
  }

  test("diffInDiff: hand 2x2 cells, double difference") {
    val cut = "2024-01-16"
    val rows = Seq(
      (1L, "2024-01-10", 1.0), (1L, "2024-01-11", 3.0), // t_pre mean 2
      (3L, "2024-01-20", 5.0),                          // t_post mean 5
      (2L, "2024-01-10", 2.0),                          // c_pre mean 2
      (2L, "2024-01-20", 3.0))                          // c_post mean 3
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val r = Analytics.diffInDiff(rows, $"user_id" % 2 === 1,
      $"ts" >= to_timestamp(lit(cut))).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 2.0)   // t_pre
    assert(r.getLong(2) == 1L && r.getDouble(3) == 5.0)   // t_post
    assert(r.getLong(4) == 1L && r.getDouble(5) == 2.0)   // c_pre
    assert(r.getLong(6) == 1L && r.getDouble(7) == 3.0)   // c_post
    assert(r.getDouble(8) == 2.0)                         // (5-2)-(3-2)
  }

  test("rollingDistinct: trailing-7-day membership, observed days only") {
    val rows = Seq((1L, "2024-03-01"), (2L, "2024-03-01"),
      (1L, "2024-03-03"), (1L, "2024-03-09"))
      .toDF("user_id", "s")
      .select($"user_id", to_timestamp($"s").as("ts"))
    val out = Analytics.rollingDistinct(rows).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // 03-09 is day 9: u1's 03-03 activity still counts (offset 6), u2's
    // 03-01 does not; gap days (02, 04..08) are not emitted
    assert(out.toSeq == Seq(("2024-03-01", 2L, 2L),
      ("2024-03-03", 1L, 2L), ("2024-03-09", 1L, 1L)))
  }

}
