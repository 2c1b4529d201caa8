package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytic capability the star schema exists to serve ("which songs
  * Sparkify's users listen to", reference README.md:9). The reference ships
  * no analytic query text — these are the representative set over the
  * warehouse tables produced by `etl.Pipeline`. Dimensions are small by
  * construction (star schema), so Catalyst broadcasts them; the fact table
  * is the only large scan.
  */
object Analytics {

  /** Top-k songs by play count. */
  def topSongs(songplays: DataFrame, songs: DataFrame, k: Int): DataFrame =
    songplays.join(songs, "song_id")
      .groupBy(col("song_id"), col("title"))
      .agg(count(lit(1)).as("n_plays"))
      .orderBy(col("n_plays").desc, col("song_id").asc)
      .limit(k)

  /** Plays per hour-of-day and weekday — time-dimension join + agg. */
  def playsByTime(songplays: DataFrame, time: DataFrame): DataFrame =
    songplays.join(time, songplays("start_time") === time("start_time"))
      .groupBy(col("hour"), col("weekday"))
      .agg(count(lit(1)).as("n_plays"))

  /** Per-user listening summary with level breakdown. */
  def userActivity(songplays: DataFrame): DataFrame =
    songplays.groupBy(col("user_id"), col("level"))
      .agg(count(lit(1)).as("n_plays"),
        countDistinct(col("session_id")).as("n_sessions"))

  /** Each user's most-played artist (window rank over an aggregate). */
  def favoriteArtist(songplays: DataFrame, artists: DataFrame): DataFrame = {
    val counts = songplays.join(artists, "artist_id")
      .groupBy(col("user_id"), col("artist_id"), col("name"))
      .agg(count(lit(1)).as("n_plays"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n_plays").desc, col("artist_id").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Ordered conversion funnel: for each stage prefix, how many users
    * performed the stages IN ORDER (stage k+1 strictly after that user's
    * earliest qualifying stage-k event). One aggregated frame per stage —
    * filter → per-user min(ts), chained by a keyed join per step — so
    * the plan is `stages.size` hash joins on user_id, each side already
    * collapsed to one row per user before it shuffles. No windows, no
    * cross-user state: the classic funnel without a sessionization pass.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    val session = events.sparkSession
    import session.implicits._
    // reached(i): user_id -> earliest completion ts of stages 0..i in order
    val reached = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val hits = events.filter(col(typeCol) === stage)
          .select(col(userCol).as("user_id"), col(tsCol).as("__ts"))
        val gated = prev match {
          case None => hits
          case Some(p) => hits.join(p, "user_id")
            .filter(col("__ts") > col("__reached"))
            .select(col("user_id"), col("__ts"))
        }
        Some(gated.groupBy("user_id").agg(min(col("__ts")).as("__reached")))
    }.flatten
    reached.zip(stages).zipWithIndex.map { case ((r, stage), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(stage).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Time-bounded funnel (ClickHouse `windowFunnel` semantics, anchored
    * at the chain start): a user reaches stage i when some stage-0 event
    * starts a chain where each next stage occurs STRICTLY after the
    * previous one and within `windowSeconds` of the ANCHOR — "signup →
    * click → purchase inside one day", where [[funnel]]'s unbounded
    * order-only gate overcounts. Every stage-0 event anchors its own
    * chain, and each step greedily takes the earliest qualifying event
    * (earliest-next maximizes remaining window, so greedy is optimal —
    * a user reaches stage i iff ANY chain does).
    *
    * Scale shape: per step, one user-keyed equi-join of the live
    * (user, anchor) chains onto that stage's events with the window
    * predicate fused, then a (user, anchor)-keyed min — per-user
    * work bounded by anchor-count × stage-hits (the stageLatency cost
    * class), nothing global. Counts are distinct-user per level;
    * timestamps compare as exact epoch micros.
    */
  def windowFunnel(events: DataFrame, stages: Seq[String],
                   windowSeconds: Long = 86400L,
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, s"need >= 2 stages, got $stages")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    val us = windowSeconds * 1000000L
    def hits(stage: String) = events.filter(col(typeCol) === stage)
      .select(col(userCol).as("user_id"), unix_micros(col(tsCol)).as("ti"))
    val anchors = hits(stages.head)
      .select(col("user_id"), col("ti").as("t0")).distinct()
      .withColumn("tprev", col("t0"))
    val frames = stages.drop(1).scanLeft(anchors) { case (prev, stage) =>
      prev.join(hits(stage), "user_id")
        .filter(col("ti") > col("tprev") && col("ti") <= col("t0") + us)
        .groupBy("user_id", "t0").agg(min(col("ti")).as("tprev"))
    }
    frames.zip(stages).zipWithIndex.map { case ((f, stage), i) =>
      f.select("user_id").distinct().agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(stage).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Monthly stickiness (DAU/MAU): average daily active users over the
    * month's OBSERVED active days, divided by the month's distinct
    * actives — the engagement ratio product teams steer by (1.0 = every
    * monthly user shows up every active day; ~0.05 = drive-by usage).
    * Two distinct-count aggregates (day-keyed, month-keyed) and one
    * month-keyed join; the fact table shuffles on user once per grain.
    */
  /** Cohort lifetime value: cumulative summed `value` per (first-seen
    * week, week offset) — [[retention]]'s value-weighted sibling, the
    * "when does a cohort pay back" curve. The cumulative sum runs over
    * each cohort's OFFSET sequence (a cohort has ≤ a few hundred weekly
    * offsets — the window is per-cohort and tiny); weekly sums ride
    * DECIMAL, so the running total is exact in any engine.
    */
  def cohortLtv(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
      date_trunc("week", col(tsCol)).as("week"),
      col(valueCol).cast("decimal(18,6)").as("v"))
    val cohort = weeks.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val wk = weeks.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7.0).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("decimal(38,6)").as("wv"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wk.withColumn("cum", sum(col("wv")).over(w))
      .select(col("cohort_week"), col("week_offset"), col("n_events"),
        round(col("wv").cast("double"), 6).as("week_value"),
        round(col("cum").cast("double"), 6).as("cum_value"))
  }

  /** Activity-concentration report ("do 1% of users generate 50% of
    * events?"): for each activity threshold k, the users with ≥ k events
    * and the share of users/events they carry. Computed from the
    * activity-count FREQUENCY table (one user aggregate + one ≤
    * |distinct-count|-sized rollup) — no global user ranking, no
    * percentile over N (the trick that keeps a Pareto curve scale-free).
    */
  def activityConcentration(events: DataFrame,
                            thresholds: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L),
                            userCol: String = "user_id"): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val ua = events.groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("n"))
    val tot = ua.agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
    val rows = thresholds.map { k =>
      ua.filter(col("n") >= k)
        .agg(count(lit(1)).as("users_ge"), sum(col("n")).as("events_ge"))
        .crossJoin(broadcast(tot))
        .select(lit(k).as("threshold"),
          col("users_ge"),
          coalesce(col("events_ge"), lit(0L)).as("events_ge"),
          graft.functions.Fns.q6(col("users_ge").cast("double") /
            col("n_users").cast("double")).as("frac_users"),
          graft.functions.Fns.q6(coalesce(col("events_ge"), lit(0L)).cast("double") /
            col("n_events").cast("double")).as("frac_events"))
    }
    rows.reduce(_ unionByName _)
  }

  def stickiness(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    val days = events.select(to_date(col(tsCol)).as("day"),
      col(userCol).as("u"))
    val dau = days.groupBy("day").agg(countDistinct(col("u")).as("dau"))
    val mau = days.select(trunc(col("day"), "month").as("month"), col("u"))
      .groupBy("month").agg(countDistinct(col("u")).as("mau"))
    dau.select(trunc(col("day"), "month").as("month"), col("dau"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_active_days"), sum(col("dau")).as("sdau"))
      .join(mau, "month")
      .select(col("month"), col("n_active_days"), col("mau"),
        graft.functions.Fns.q6(col("sdau").cast("double") /
          col("n_active_days").cast("double")).as("avg_dau"),
        graft.functions.Fns.q6(col("sdau").cast("double") /
          col("n_active_days").cast("double") /
          col("mau").cast("double")).as("stickiness"))
  }

  /** Weekly cohort retention: users bucketed by first-activity week, one
    * row per (cohort week, week offset) with the distinct users from the
    * cohort active that week. Two aggregations (first-seen per user,
    * distinct user-weeks) plus one keyed join — the fact table shuffles
    * on user_id only.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
      date_trunc("week", col(tsCol)).as("week"))
    val cohorts = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.distinct()
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        datediff(col("week"), col("cohort_week")).divide(7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-type transition matrix: counts of (event_type → next
    * event_type) per user in event-time order — the Markov-chain view of
    * user behavior. One window shuffle keyed by user (tie-broken by the
    * id column so the sequence is a pure function of the data), then a
    * small pair count.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts",
                  idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Stationary distribution of the [[transitions]] Markov chain by
    * POWER ITERATION — "where does a user's session settle in the long
    * run", the chain-level summary a raw transition-count matrix can't
    * give (long-run occupancy weights each state by the whole loop
    * structure, not just in-edges). π' = π·P with row-stochastic P from
    * the observed transition counts; states with NO outgoing transitions
    * redistribute their mass uniformly (the PageRank dangling
    * convention, keeping Σπ = 1 every round). `iters` fixed rounds from
    * the uniform start; per-round contributions 12-dp-DECIMAL-quantized
    * (the [[graft.operators.Graph.pageRank]] discipline) so every engine
    * walks the same trajectory.
    *
    * Scale shape: P has at most |types|² rows (event-type vocabularies
    * are tiny; the one corpus-sized pass is the transitions aggregate
    * itself). Each round is a from-keyed join + to-keyed DECIMAL
    * aggregate, eager-checkpointed like every fixed-point loop here.
    */
  def markovStationary(events: DataFrame, iters: Int = 5,
                       userCol: String = "user_id", typeCol: String = "event_type",
                       tsCol: String = "ts", idCol: String = "event_id",
                       precomputedTransitions: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    // precomputedTransitions: the eigenGap precedent — callers that
    // share the transition matrix across queries (SparkEntry's
    // _derive_event_transitions memo) pass the already-checkpointed
    // frame instead of paying the corpus pass again. Semantics
    // identical: the memo builds the same [[transitions]] frame.
    val t = precomputedTransitions.getOrElse(
      transitions(events, userCol, typeCol, tsCol, idCol).localCheckpoint())
    val tot = t.groupBy("from_type").agg(sum(col("n")).as("tot"))
    val p = t.join(tot, "from_type")
      .select(col("from_type"), col("to_type"),
        graft.functions.Fns.q12(col("n").cast("double") / col("tot")).as("p"))
    val types = t.select(col("from_type").as("state"))
      .union(t.select(col("to_type").as("state"))).distinct()
    val k = types.agg(count(lit(1)).as("k"))
    def dsum(c: Column) =
      sum(graft.functions.Fns.q12(c).cast("decimal(18,12)"))
    var pi = types.crossJoin(broadcast(k))
      .select(col("state"), (lit(1.0) / col("k")).as("pi"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val flow = pi.join(p, pi("state") === p("from_type"))
        .select(col("to_type").as("state"), (col("pi") * col("p")).as("c"))
        .groupBy("state").agg(dsum(col("c")).as("s"))
      val dangling = pi
        .join(p.select(col("from_type").as("state")).distinct(),
          Seq("state"), "left_anti")
        .agg(coalesce(dsum(col("pi")), lit(0).cast("decimal(18,12)")).as("dm"))
      pi = types
        .join(flow, Seq("state"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(k))
        .select(col("state"),
          (coalesce(col("s").cast("double"), lit(0.0)) +
            col("dm").cast("double") / col("k")).as("pi"))
        .localCheckpoint()
    }
    pi.select(col("state").as("event_type"),
      graft.functions.Fns.q6(col("pi")).as("pi"))
  }

  /** Entropy rate of the [[transitions]] Markov chain:
    * H = −Σᵢ πᵢ Σⱼ Pᵢⱼ·ln Pᵢⱼ over the OBSERVED transitions, with π
    * from [[markovStationary]]'s published 6-dp values — how
    * predictable the next event type is in the long run (0 =
    * deterministic flows, ln k = uniform chaos), normalized by ln k
    * beside it. The one-number sequel to the transition matrix that
    * [[sessionEntropy]] (within-session mix) and the stationary vector
    * (long-run occupancy) each miss.
    *
    * Cost: the transitions aggregate (the only corpus pass, run once
    * more than markovStationary's own) + |types|²-row arithmetic;
    * per-term contributions 12-dp-DECIMAL-summed.
    */
  def markovEntropyRate(events: DataFrame, iters: Int = 5,
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tsCol: String = "ts",
                        idCol: String = "event_id",
                        precomputedTransitions: Option[DataFrame] = None): DataFrame = {
    def d6(c: Column) =
      graft.functions.Fns.q6(c)
    // One transitions frame for BOTH legs (r19): the stationary chain
    // and the per-edge entropy terms read the identical matrix; without
    // the shared frame this operator paid the corpus pass twice.
    val t0 = precomputedTransitions.getOrElse(
      transitions(events, userCol, typeCol, tsCol, idCol).localCheckpoint())
    val pi = markovStationary(events, iters, userCol, typeCol, tsCol, idCol,
        precomputedTransitions = Some(t0))
      .select(col("event_type").as("from_type"), col("pi"))
    val t = t0
    val tot = t.groupBy("from_type").agg(sum(col("n")).as("tot"))
    val p = t.join(tot, "from_type")
      .select(col("from_type"),
        graft.functions.Fns.q12(col("n").cast("double") / col("tot")).as("p"))
    val h = p.join(pi, "from_type")
      .agg(sum(round(col("pi") * col("p") * log(col("p")), 12)
          .cast("decimal(18,12)")).as("sh"),
        count(lit(1)).as("n_transitions"))
    h.crossJoin(broadcast(pi.agg(count(lit(1)).as("n_states"))))
      .select(col("n_states"), col("n_transitions"),
        d6(-col("sh").cast("double")).as("entropy_rate"),
        d6(try_divide(-col("sh").cast("double"),
          log(col("n_states").cast("double")))).as("normalized"))
  }

  /** Difference-in-differences card: outcome means for the 2×2
    * (group, period) design and the DiD estimate — the
    * causal-adjustment counterpart of [[abTest]]'s single-period
    * comparison, removing both the pre-existing group gap and the
    * common time trend. `treatedExpr` and `postExpr` are caller
    * predicates (any assignment rule); the estimate composes the four
    * 6-dp-published cell means so both engines difference identical
    * values.
    *
    * One corpus aggregate (4 cells, map-side combined), then
    * constant-size arithmetic.
    */
  def diffInDiff(events: DataFrame, treatedExpr: Column, postExpr: Column,
                 valueCol: String = "value"): DataFrame = {
    def d6(c: Column) =
      graft.functions.Fns.q6(c)
    val cells = events
      .filter(col(valueCol).isNotNull)
      .groupBy(treatedExpr.cast("boolean").as("treated"),
        postExpr.cast("boolean").as("post"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(24,6)")).as("sv"))
      .select(col("treated"), col("post"), col("n"),
        d6(col("sv").cast("double") / col("n").cast("double")).as("mean"))
    def cell(tr: Boolean, po: Boolean, name: String) =
      cells.filter(col("treated") === tr && col("post") === po)
        .select(col("n").as(s"n_$name"), col("mean").as(s"mean_$name"))
    cell(true, false, "t_pre")
      .crossJoin(broadcast(cell(true, true, "t_post")))
      .crossJoin(broadcast(cell(false, false, "c_pre")))
      .crossJoin(broadcast(cell(false, true, "c_post")))
      .select(col("n_t_pre"), col("mean_t_pre"), col("n_t_post"),
        col("mean_t_post"), col("n_c_pre"), col("mean_c_pre"),
        col("n_c_post"), col("mean_c_post"),
        d6((col("mean_t_post") - col("mean_t_pre")) -
          (col("mean_c_post") - col("mean_c_pre"))).as("did"))
  }

  /** RFM segmentation: per-customer Recency (days since last order as of
    * `asOf`), Frequency (order count) and Monetary (exact DECIMAL revenue
    * sum), each bucketed into `nTiles` scores. Scoring deliberately avoids
    * the textbook global `ntile` window (a single-partition sort over
    * every customer): instead ONE tiny aggregate computes the (nTiles−1)
    * exact quantile boundaries per metric, broadcasts them, and each row
    * scores itself as `1 + #boundaries strictly below its value` — a flat
    * per-row projection. Boundary comparisons are cross-engine stable:
    * the metrics are integer/2-dp valued, so an interpolated boundary
    * either equals a data value exactly (interpolation fraction 0 — both
    * engines return the sorted element itself) or sits a non-ulp distance
    * away from every data value.
    *
    * Scale note: exact `percentile` buffers a value-count map per metric —
    * fine up to tens of millions of DISTINCT metric values (recency/
    * frequency are small-domain by nature), but for a billion-customer
    * monetary column swap the boundary agg for `Sketch.histQuantiles`
    * (mergeable, bounded memory); the scoring projection is unchanged.
    */
  def rfm(orders: DataFrame, asOf: Column, nTiles: Int = 5,
          custCol: String = "o_custkey", dateCol: String = "o_orderdate",
          amountCol: String = "o_totalprice"): DataFrame = {
    require(nTiles >= 2, s"nTiles must be >= 2, got $nTiles")
    val base = orders.groupBy(col(custCol).as("custkey"))
      .agg(datediff(asOf, max(col(dateCol))).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).as("monetary"))
    val fracs = array((1 until nTiles).map(i => lit(i.toDouble / nTiles)): _*)
    val bounds = base.agg(
      percentile(col("recency_days"), fracs).as("rb"),
      percentile(col("frequency"), fracs).as("fb"),
      percentile(col("monetary"), fracs).as("mb"))
    // score 1 = best: most recent (lowest recency), highest frequency /
    // monetary — hence ascending buckets for R, descending for F and M.
    def above(x: Column, bnds: Column) =
      (size(filter(bnds, b => x > b)) + 1).cast("long")
    def below(x: Column, bnds: Column) =
      (size(filter(bnds, b => x < b)) + 1).cast("long")
    base.crossJoin(broadcast(bounds)).select(
      col("custkey"), col("recency_days"), col("frequency"), col("monetary"),
      above(col("recency_days").cast("double"), col("rb")).as("r_score"),
      below(col("frequency").cast("double"), col("fb")).as("f_score"),
      below(col("monetary").cast("double"), col("mb")).as("m_score"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per user.
    * The classic trick — day_ordinal − dense row_number is constant
    * within a run — turns island detection into one per-user window plus
    * a groupBy, no self-joins. Input collapses to distinct (user, day)
    * first, so the window ranks at most days-per-user rows per key.
    */
  def activityIslands(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val days = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("island_start"), max(col("day")).as("island_end"),
        count(lit(1)).as("n_days"))
      .drop("grp")
  }

  /** Per-session ordered behavior sequences: one row per (user, session)
    * with the event-type sequence in (ts, id) order — the export step
    * that turns telemetry into sequence-model training examples.
    * Sessions are Spark `session_window`s (gap-merged, end = last + gap),
    * so the SAME call sessionizes a stream (StreamingJobs.sessionize is
    * the counting flavor of this shape).
    *
    * One hash shuffle keyed by (user, session window); the in-session
    * order is restored with `array_sort ∘ collect_list` over
    * (ts, id, type) structs — no window function, order total via the
    * unique id tiebreak.
    */
  def sessionSequences(events: DataFrame, gap: String = "30 minutes",
                       userCol: String = "user_id", typeCol: String = "event_type",
                       tsCol: String = "ts", idCol: String = "event_id"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol), col(typeCol)))),
          s => s.getField(typeCol)), " ").as("sequence"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("sequence"))

  /** Per-user session behavioural entropy: Shannon entropy (nats) of
    * each session's event-type distribution, reduced to the user's mean
    * and max — "does this user's activity within a session look varied
    * or single-purpose", the behavioural-diversity feature for
    * segmentation and the bot signal (scripted sessions cluster at
    * H = 0, one event type repeated). Rides [[sessionSequences]]'s
    * session_window sessionization.
    *
    * Computed without any p division via H = ln n − (Σ c·ln c)/n
    * (TextAnalysis.entropy's recipe): per-(session, type) counts are
    * exact; Σ c·ln c rides a 6-dp-rounded DECIMAL sum; the per-user
    * mean rides the same. Sessionization is the gap-rule islands form
    * (new session when ts − prev > gap, microsecond-exact interval
    * compare) — NOT a session_window aggregate, which would have to
    * carry event_type in its grouping key and would therefore sessionize
    * each type stream separately. Scale shape: two user-partitioned
    * ordered windows (lag + running sum), then three hash aggregates —
    * no joins.
    */
  def sessionEntropy(events: DataFrame, gap: String = "30 minutes",
                     userCol: String = "user_id", typeCol: String = "event_type",
                     tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) =
      graft.functions.Fns.q6(c)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val sid = events
      .withColumn("new_s",
        when(lag(col(tsCol), 1).over(w).isNull ||
          col(tsCol) > lag(col(tsCol), 1).over(w) + expr(s"INTERVAL $gap"), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cells = sid
      .groupBy(col(userCol), col("sid"), col(typeCol))
      .agg(count(lit(1)).as("c"))
    val sess = cells
      .groupBy(col(userCol), col("sid"))
      .agg(sum(col("c")).as("n"),
        sum(round(col("c") * log(col("c")), 6).cast("decimal(18,6)"))
          .as("sclogc"))
      .select(col(userCol), col("n"),
        graft.functions.Fns.q6((log(col("n")) - col("sclogc").cast("double") /
          col("n").cast("double")))
          .cast("decimal(18,6)").as("h6"))
    sess.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
        (sum(col("h6")).cast("double") / count(lit(1)).cast("double"))
          .as("mraw"),
        max(col("h6")).as("maxh"))
      .select(col(userCol), col("n_sessions"), col("n_events"),
        d6(col("mraw")).as("mean_entropy"),
        col("maxh").cast("double").as("max_entropy"))
  }

  /** Rolling distinct users: per observed day, DAU and the distinct
    * users active in the trailing `windowDays` — the "weekly active"
    * series a naive `COUNT(DISTINCT) OVER (RANGE 6 DAYS)` can't compute
    * distributed (no mergeable distinct state in a window frame).
    * Formulation: collapse to distinct (user, day) FIRST, explode each
    * membership onto the ≤ windowDays future days it keeps the user
    * "active" for, and count distinct per target day — work is
    * windowDays × |user-days|, linear and shuffle-keyed by day, never a
    * window over raw events. (At HLL-tolerance scale, swap the exact
    * distinct for merged per-day registers — sketch_hll_grouped.)
    */
  def rollingDistinct(events: DataFrame, windowDays: Int = 7,
                      userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val ud = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val days = ud.select(col("d").as("day")).distinct()
    val spread = ud
      .select(col("u"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("off"), col("d"))
      .select(col("u"), date_add(col("d"), col("off")).as("day"))
    val rolling = spread.groupBy("day")
      .agg(countDistinct(col("u")).as("rolling_users"))
    val dau = ud.groupBy(col("d").as("day"))
      .agg(countDistinct(col("u")).as("dau"))
    days.join(dau, Seq("day")).join(rolling, Seq("day"))
      .select(col("day"), col("dau"), col("rolling_users"))
  }

  /** Log–log price elasticity of demand per item group: the OLS slope
    * of ln(quantity) on ln(unit price) across order lines — the classic
    * "−1.2 means a 1% price rise costs 1.2% volume" retail coefficient,
    * with R² beside it so a near-zero fit isn't mistaken for
    * inelasticity. `items` (the part dim) broadcasts onto the fact by
    * partkey; moments aggregate per group with map-side combine.
    *
    * Determinism: each ln is 6-dp-quantized then scaled to an EXACT
    * integer (×10⁶, DECIMAL(38,0) — the grangerLite discipline), so
    * the five moment sums and the n-scaled centered moments are exact
    * integers: a zero-variance group yields cxx = 0 EXACTLY (→ NULL
    * via try_divide, never a rounding-noise ratio), the ×10⁶ scale
    * cancels in slope and R², and both engines divide identical
    * doubles, 6-dp-routed.
    */
  def priceElasticity(lineitem: DataFrame, items: DataFrame,
                      groupCol: String = "p_brand"): DataFrame = {
    def scaled(c: Column) =
      (round(log(c), 6).cast("decimal(18,6)") * lit(1000000L))
        .cast("decimal(38,0)")
    val rows = lineitem
      .select(col("l_partkey"),
        col("l_quantity").cast("double").as("q"),
        (col("l_extendedprice").cast("double") /
          col("l_quantity").cast("double")).as("pu"))
      .filter(col("q") > 0 && col("pu") > 0)
      .join(broadcast(items.select(col("p_partkey").as("l_partkey"),
        col(groupCol).as("grp"))), "l_partkey")
      .select(col("grp"), scaled(col("pu")).as("x"), scaled(col("q")).as("y"))
    def d6(c: Column) = graft.functions.Fns.q6(c)
    val m = rows.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    def cS(ab: String, a: String, b: String) =
      (col("n").cast("decimal(38,0)") * col(ab) - col(a) * col(b))
        .cast("double")
    val c = m.select(col("grp").as(groupCol), col("n"),
      cS("sxx", "sx", "sx").as("cxx"), cS("sxy", "sx", "sy").as("cxy"),
      cS("syy", "sy", "sy").as("cyy"))
    c.select(col(groupCol), col("n"),
      d6(try_divide(col("cxy"), col("cxx"))).as("elasticity"),
      d6(try_divide(col("cxy") * col("cxy"), col("cxx") * col("cyy")))
        .as("r2"))
  }

  /** Gini coefficient of per-user activity, per event type: the
    * inequality summary behind [[activityConcentration]]'s fixed
    * thresholds — 0 is uniform engagement, → 1 is a whale economy,
    * and the per-type split shows WHICH behaviors concentrate. Uses
    * the exact rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    * counts sorted ascending (tie order irrelevant: equal x make equal
    * contributions under any rank assignment... rank ties broken by
    * user for a total order anyway).
    *
    * Scale shape: events collapse to (type, user) counts FIRST (map-
    * side combine), so the rank window runs over per-user aggregates —
    * users, not events — partitioned by type. Sums ride DECIMAL(38,0)
    * (rank×count products overflow int64 at ~10⁹ users); one rounded
    * division per type.
    */
  def giniIndex(events: DataFrame, userCol: String = "user_id",
                typeCol: String = "event_type"): DataFrame = {
    val counts = events.groupBy(col(typeCol).as("t"), col(userCol).as("u"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("t")).orderBy(col("x"), col("u"))
    counts
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("t").as(typeCol))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("n_events"),
        sum((col("i") * col("x")).cast("decimal(38,0)")).as("six"))
      .select(col(typeCol), col("n_users"), col("n_events"),
        graft.functions.Fns.q6(try_divide(
          lit(2.0) * col("six").cast("double") -
            (col("n_users") + 1L).cast("double") *
              col("n_events").cast("double"),
          col("n_users").cast("double") * col("n_events").cast("double"))
          ).as("gini"))
  }

  /** Top-k most common session paths — the funnel-DISCOVERY step that
    * precedes [[funnel]]'s fixed-stage measurement: which exact ordered
    * event-type sequences do sessions actually follow, and how often?
    * Rides [[sessionSequences]] (one session_window aggregate), then one
    * sequence-keyed count with map-side combine and a
    * TakeOrderedAndProject top-k (per-partition heaps, k rows to the
    * driver — never a global sort). Ties break on the sequence string so
    * the cut is total.
    */
  def topPaths(events: DataFrame, gap: String = "30 minutes", k: Int = 10,
               userCol: String = "user_id", typeCol: String = "event_type",
               tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    sessionSequences(events, gap, userCol, typeCol, tsCol, idCol)
      .groupBy("sequence")
      .agg(count(lit(1)).as("n_sessions"),
        graft.functions.Fns.q6(avg(col("n_events"))).as("avg_len"))
      .orderBy(col("n_sessions").desc, col("sequence").asc)
      .limit(k)
  }

  /** Market-basket association pairs: for item pairs co-occurring in at
    * least `minSupport` baskets, the classic support / confidence / lift
    * triple, top `k` by lift — the co-purchase (or co-occurrence) miner.
    *
    * Shuffle shape (round 15 — the `copurchaseEdges` derivation): ONE
    * basket-keyed groupBy collapses each basket to its sorted distinct
    * item set, pairs expand IN MEMORY per basket (sorted array →
    * ordered (i1 < i2) pairs, work ∝ Σ basket_size² — the true output;
    * baskets are small by nature and the cap bounds the worst case),
    * and one (i1, i2) aggregate counts co-occurrence. That is 2 keyed
    * shuffles where the previous distinct + basket-key self-join +
    * pair-aggregate chain paid 4 (pair multiset proven identical —
    * same sorted-distinct sets, same ordered pairs). Item frequencies
    * and the basket total ride the same collected frame, so no second
    * scan of `lines` either. All ratios are single divisions of exact
    * BIGINTs, rounded to 6 dp — engine-identical; ordering ties break
    * on the item pair.
    *
    * `maxBasketSize` is the mega-basket guard: one pathological basket
    * (a bot session touching every item, a default/placeholder basket
    * key) costs size² pairs in the expansion AND carries no association
    * signal — every pair trivially co-occurs, flattening lift. Baskets
    * with more than `maxBasketSize` distinct items are excluded WHOLE
    * (now a `size(...)` filter on the collected set — no extra
    * aggregate or semi-join), and the exclusion applies before the
    * denominator and item frequencies so support/confidence/lift stay
    * internally consistent over the capped universe. Default
    * `Long.MaxValue` = no cap (the exact miner).
    */
  def basketPairs(lines: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long = 5L, k: Int = 50,
                  maxBasketSize: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(maxBasketSize >= 2, s"need maxBasketSize >= 2, got $maxBasketSize")
    // NULL items are excluded up front — they can never form a pair
    // (NULL never satisfies i1 < i2), so counting them in basket sizes
    // or item frequencies would only skew the cap and the lift
    // denominators. collect_set would drop them silently anyway; the
    // explicit filter makes the contract visible. CONSEQUENCE (r16,
    // pinned in AnalyticsSpec): a basket whose items are ALL NULL
    // leaves the universe entirely — it does not count in n_baskets,
    // so support/lift denominators cover only baskets with at least
    // one identifiable item (the pre-r15 self-join formulation counted
    // such baskets in the denominator).
    val collected = lines.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("i").isNotNull)
      .groupBy("b").agg(sort_array(collect_set(col("i"))).as("is"))
    val baskets =
      (if (maxBasketSize == Long.MaxValue) collected
       else collected.filter(size(col("is")) <= maxBasketSize))
        .localCheckpoint() // 3 consumers (nb, freq, pairs) — scan once
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    val freq = baskets.select(explode(col("is")).as("i"))
      .groupBy("i").agg(count(lit(1)).as("c"))
    val pairs = baskets
      .select(explode(flatten(transform(col("is"), (x, idx) =>
        transform(slice(col("is"), idx + lit(2),
            greatest(size(col("is")) - idx - 1, lit(0))), y =>
          struct(x.as("i1"), y.as("i2")))))).as("e"))
      .select(col("e.i1").as("i1"), col("e.i2").as("i2"))
      .groupBy("i1", "i2")
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minSupport)
    pairs
      .join(freq.select(col("i").as("i1"), col("c").as("c1")), "i1")
      .join(freq.select(col("i").as("i2"), col("c").as("c2")), "i2")
      .crossJoin(broadcast(nb))
      .select(col("i1"), col("i2"), col("c12"), col("c1"), col("c2"),
        graft.functions.Fns.q6(col("c12").cast("double") / col("n_baskets")).as("support"),
        graft.functions.Fns.q6(col("c12").cast("double") / col("c1")).as("confidence"),
        graft.functions.Fns.q6(col("c12").cast("double") * col("n_baskets") / (col("c1") * col("c2")))
          .as("lift"))
      .orderBy(col("lift").desc, col("i1").asc, col("i2").asc)
      .limit(k)
  }

  /** Per-key union of overlapping [start, end] intervals (epoch-second
    * longs): merge every overlapping/touching run into one covering
    * interval — busy-period detection, GPU-utilization rollups, session
    * coverage. Classic islands-by-overlap: one key-partitioned window
    * pass marks a new island wherever the start exceeds the running max
    * end of all PRIOR intervals (strictly-after ⇒ touching intervals
    * merge), a running sum turns the marks into island ids, and one hash
    * aggregate emits each island's span. All long arithmetic — exact in
    * any engine; both windows partition on the key, so the plan
    * parallelizes across keys (PlanGuard-clean).
    */
  def intervalUnion(intervals: DataFrame, keyCol: String = "user_id",
                    startCol: String = "start_s", endCol: String = "end_s"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = intervals
      .withColumn("__new", when(prevMax.isNull || col(startCol) > prevMax, 1L)
        .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("covered_from"),
        max(col(endCol)).as("covered_to"),
        count(lit(1)).as("n_intervals"))
      .select(col(keyCol), col("covered_from"), col("covered_to"),
        (col("covered_to") - col("covered_from")).as("covered_seconds"),
        col("n_intervals"))
  }

  /** First-touch attribution: each conversion event is credited to the
    * user's EARLIEST touch event (ordered by ts, id as the tiebreak)
    * that happened at or before the conversion — the standard marketing
    * "who gets credit" query, also the provenance shape for "which crawl
    * first surfaced this document". Left semantics: conversions with no
    * prior touch keep NULL touch columns.
    *
    * Shuffle shape: one filter + per-user min-struct aggregate over the
    * touches (map-side combined, one hash shuffle on user), then one
    * user-keyed join — no window at all, because "first ever" is an
    * associative min, unlike last-touch which is [[operators.AsOfJoin]]'s
    * job. The (ts, id, type) struct min makes the tiebreak total and
    * engine-identical.
    */
  def firstTouchAttribution(events: DataFrame, touchTypes: Seq[String],
                            convType: String,
                            userCol: String = "user_id", typeCol: String = "event_type",
                            tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    val firstTouch = events
      .filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol))
      .agg(min(struct(col(tsCol), col(idCol), col(typeCol))).as("__ft"))
      .select(col(userCol),
        col("__ft").getField(tsCol).as("touch_ts"),
        col("__ft").getField(idCol).as("touch_id"),
        col("__ft").getField(typeCol).as("touch_type"))
    events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conversion_id"), col(userCol), col(tsCol))
      .join(firstTouch, Seq(userCol), "left")
      .select(col("conversion_id"), col(userCol),
        when(col("touch_ts") <= col(tsCol), col("touch_id")).as("touch_id"),
        when(col("touch_ts") <= col(tsCol), col("touch_type")).as("touch_type"),
        when(col("touch_ts") <= col(tsCol), col("touch_ts")).as("touch_ts"))
  }

  /** Percentile winsorization: clip a metric at its exact interpolated
    * [pLo, pHi] percentiles — the standard robust-preprocessing step
    * before training on heavy-tailed telemetry (cheaper and more stable
    * than dropping outlier rows). One tiny percentile aggregate rides a
    * broadcast; the clip is a flat codegen'd projection. 2-dp metric
    * values keep the interpolated boundaries engine-stable (the rfm
    * argument).
    */
  def winsorize(events: DataFrame, pLo: Double = 0.01, pHi: Double = 0.99,
                valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1")
    val bounds = events.agg(
      percentile(col(valCol), lit(pLo)).as("lo"),
      percentile(col(valCol), lit(pHi)).as("hi"))
    events.crossJoin(broadcast(bounds))
      .select(col(idCol), col(valCol),
        round(least(greatest(col(valCol), col("lo")), col("hi")), 6)
          .as("clipped"),
        (col(valCol) < col("lo") || col(valCol) > col("hi")).as("was_clipped"))
  }

  /** Per-group z-score outlier flagging: events whose value sits more than
    * `zThreshold` sample standard deviations from their group's mean — the
    * metric-anomaly sweep run over telemetry before it feeds training.
    *
    * Determinism: the naive mean/stddev of doubles depends on accumulation
    * order, so both moments are built from exact DECIMAL sums instead —
    * mean from Σv (two-pass), variance from Σ(v − mean)² with the per-row
    * square rounded to 6 dp before the exact sum (per-row IEEE arithmetic
    * on identical inputs is engine-independent; only the SUM order isn't).
    * Result: bit-identical across engines and cluster re-partitionings.
    *
    * Shuffle shape: two hash shuffles on the group key (count/Σ, then
    * Σdev²) with map-side combine, the per-group stats joined back keyed
    * by group (AQE broadcasts when the group cardinality is small); the
    * z-score itself is a flat codegen'd projection.
    */
  def outliers(events: DataFrame, zThreshold: Double = 2.0,
               groupCol: String = "event_type", valCol: String = "value",
               idCol: String = "event_id"): DataFrame = {
    val means = events.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(18,6)")).as("s"))
      .select(col(groupCol), col("n"),
        (col("s").cast("double") / col("n")).as("mean"))
    val withMean = events.join(means, groupCol)
    val stats = withMean.groupBy(col(groupCol))
      .agg(first(col("n")).as("n"), first(col("mean")).as("mean"),
        sum(round((col(valCol) - col("mean")) * (col(valCol) - col("mean")), 6)
          .cast("decimal(18,6)")).as("ss"))
      .select(col(groupCol), col("mean"),
        sqrt(col("ss").cast("double") / (col("n") - 1)).as("sd"))
    // try_divide: a constant group has sd = 0 — its rows get NULL z and are
    // never flagged (ANSI mode would raise on the plain division).
    events.join(stats, groupCol)
      .withColumn("z", try_divide(col(valCol) - col("mean"), col("sd")))
      .filter(abs(col("z")) > zThreshold)
      .select(col(idCol), col(groupCol), col(valCol),
        graft.functions.Fns.q6(col("mean")).as("group_mean"),
        graft.functions.Fns.q6(col("sd")).as("group_sd"),
        graft.functions.Fns.q6(col("z")).as("zscore"))
  }

  /** Robust per-group outliers via median absolute deviation — the
    * companion to [[outliers]] for heavy-tailed metrics, where a single
    * extreme value inflates mean AND sd enough to mask its siblings
    * (masking). Flags rows with |v − median| / MAD > `kThreshold`
    * (k=3 ≈ the classic Iglewicz–Hoberg cut before their 0.6745
    * normal-consistency constant, which is deliberately NOT applied —
    * document the raw ratio, don't bake in a normality assumption).
    *
    * Cross-engine float discipline: group median and MAD are exact
    * interpolated percentiles QUANTIZED to 6 dp before any division
    * (Spark `percentile` and DuckDB `quantile_cont` agree at 6 dp — the
    * `ana_group_quantiles` parity precedent — but their unrounded
    * interpolations may differ in the last ulp, and here the value
    * decides row MEMBERSHIP, so both engines must score against the
    * same quantized boundaries). The score itself is one subtraction +
    * one division on those quantized inputs, rounded to 6 dp, and the
    * threshold compares the ROUNDED score. A constant group has MAD 0:
    * `try_divide` gives its rows NULL scores, never flagged.
    *
    * Plan shape: two percentile aggregates keyed by group (the second
    * pass re-scans with the tiny median frame joined back — broadcast at
    * any realistic group count) and a final broadcast join + filter; no
    * windows, no global sort.
    */
  def outliersMad(events: DataFrame, kThreshold: Double = 3.0,
                  groupCol: String = "event_type", valCol: String = "value",
                  idCol: String = "event_id"): DataFrame = {
    val med = events.groupBy(col(groupCol))
      .agg(graft.functions.Fns.q6(percentile(col(valCol), lit(0.5))).as("med"))
    val mad = events.join(broadcast(med), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("med")).as("med"),
        graft.functions.Fns.q6(
          percentile(abs(col(valCol) - col("med")), lit(0.5))).as("mad"))
    events.join(broadcast(mad), groupCol)
      .withColumn("score",
        graft.functions.Fns.q6(
          try_divide(abs(col(valCol) - col("med")), col("mad"))))
      .filter(col("score") > kThreshold)
      .select(col(idCol), col(groupCol), col(valCol),
        col("med").as("group_median"), col("mad").as("group_mad"),
        col("score").as("mad_score"))
  }

  /** Kaplan–Meier survival curve over user lifetimes — the
    * churn/retention estimator that handles censoring correctly (naive
    * "fraction still active at t" UNDER-estimates survival because users
    * who joined recently haven't had time to churn). Lifetime = first→
    * last activity, bucketed to `stepSeconds` steps; a user whose last
    * activity is within `inactiveSeconds` of the corpus end is CENSORED
    * (still alive — contributes at-risk time but no death), as is anyone
    * surviving past `horizonSteps` (administrative censoring, which also
    * BOUNDS the curve: ≤ horizonSteps + 1 rows regardless of data size).
    * One row per observed step: at-risk count, deaths, censored,
    * `S(t) = Π_{s≤t}(1 − d_s/n_s)`.
    *
    * Scale shape: one per-user aggregate, one ≤ horizon-row per-step
    * aggregate, then a TRIANGULAR SELF-JOIN on the broadcast step table
    * for both the at-risk prefix count and the cumulative log-survival —
    * ≤ (horizon+1)² pairs of register-sized rows, so no global ordered
    * window anywhere (PlanGuard-clean by construction, not by allowlist).
    *
    * Determinism: durations and counts are exact BIGINTs (timestamps
    * floored to whole seconds on both engines before differencing);
    * each factor's `ln(1 − d/n)` is 6-dp rounded before the exact
    * DECIMAL cumulative sum, and `S = exp(cumlog)` is rounded to 6 dp —
    * the same quantize-before-sum convention as entropy/weightedSample
    * (and the same documented 1-ulp-at-a-rounding-boundary residual risk
    * for libm `ln`/`exp`).
    */
  def kaplanMeier(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", stepSeconds: Long = 86400L,
                  horizonSteps: Int = 90,
                  inactiveSeconds: Long = 7L * 86400L): DataFrame = {
    require(stepSeconds > 0 && horizonSteps >= 1 && inactiveSeconds >= 0,
      s"bad knobs: step=$stepSeconds horizon=$horizonSteps inactive=$inactiveSeconds")
    val spans = events.groupBy(col(userCol))
      .agg(unix_timestamp(min(col(tsCol))).as("t0"),
        unix_timestamp(max(col(tsCol))).as("t1"))
    val end = events.agg(unix_timestamp(max(col(tsCol))).as("t_end"))
    val rawSteps = floor((col("t1") - col("t0")) / stepSeconds).cast("long")
    val churned = (col("t_end") - col("t1")) > inactiveSeconds
    val perUser = spans.crossJoin(broadcast(end))
      .select(
        least(rawSteps, lit(horizonSteps.toLong)).as("step"),
        (churned && rawSteps <= horizonSteps).as("event"))
    val perStep = perUser.groupBy(col("step"))
      .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("event"), 0L).otherwise(1L)).as("c"))
    val total = perUser.agg(count(lit(1)).as("n_total"))
    // Triangular self-join: prior removals (strictly before t) give the
    // at-risk count; the ≤-prefix of rounded log factors gives S(t).
    val lf = when(col("b.d") > 0,
      round(log(lit(1.0) - col("b.d").cast("double") /
        (col("n_total") - col("b.prior")).cast("double")), 6))
      .otherwise(lit(0.0)).cast("decimal(18,6)")
    // Both triangular joins carry an explicit broadcast of the <=
    // (horizon+1)-row side: without the hint Spark has no stats to see
    // the aggregate is tiny and plans the non-equi inner join as a
    // CartesianProduct (r18 registry plan lint) — bounded here, but the
    // broadcast form is the shape the scaladoc promises.
    val withPrior = perStep.as("x").join(broadcast(perStep.as("y")),
        col("y.step") < col("x.step"), "left")
      .groupBy(col("x.step").as("step"))
      .agg(first(col("x.d")).as("d"), first(col("x.c")).as("c"),
        coalesce(sum(col("y.d") + col("y.c")), lit(0L)).as("prior"))
    val curve = withPrior.as("a").join(
        broadcast(withPrior.select(col("step").as("bstep"), col("d"),
          col("c"), col("prior")).as("b")),
        col("b.bstep") <= col("a.step"))
      .crossJoin(broadcast(total))
      .groupBy(col("a.step").as("step"))
      .agg(first(col("a.d")).as("n_events"), first(col("a.c")).as("n_censored"),
        first((col("n_total") - col("a.prior"))).as("n_risk"),
        sum(lf).as("cumlog"))
    curve.select(col("step"), col("n_risk"), col("n_events"), col("n_censored"),
      round(exp(col("cumlog").cast("double")), 6).as("survival"))
  }

  /** Two-proportion A/B z-test on a deterministic arm split: users are
    * armed by `user_id % 2` (swap in a salted hash upstream for real
    * experiments — the operator only needs SOME deterministic partition),
    * conversion = "did the user ever emit `convType`". Emits one row:
    * per-arm exposure/conversion counts and rates, absolute lift, the
    * pooled-variance z statistic, and the |z| > 1.96 two-sided 5%
    * verdict. All inputs to the float closed form are exact BIGINTs, so
    * engines agree bit-for-bit.
    *
    * Scale shape: one distinct-user aggregate (map-side combinable) into
    * a SINGLE summary row — no joins, no windows; the conversion flag
    * rides the same pass as the arm assignment.
    */
  def abTest(events: DataFrame, convType: String,
             userCol: String = "user_id", typeCol: String = "event_type"): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("conv"))
      .select(pmod(col(userCol), lit(2L)).as("arm"), col("conv"))
    val agg = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a")
    val pb = col("x_b").cast("double") / col("n_b")
    val pool = (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = when(se > 0, (pa - pb) / se)
    agg.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      graft.functions.Fns.q6(pa).as("rate_a"),
      graft.functions.Fns.q6(pb).as("rate_b"),
      graft.functions.Fns.q6((pa - pb)).as("lift"),
      graft.functions.Fns.q6(z).as("z"),
      coalesce(abs(z) > 1.96, lit(false)).as("significant"))
  }

  /** Multi-touch attribution, exponential time decay: each conversion's
    * credit is split across the touch events that precede it within
    * `lookbackSeconds`, weighted `0.5^(Δt / halflifeSeconds)` and
    * normalized per conversion; output is per-channel total credit —
    * the standard middle ground between first-touch (all credit to the
    * oldest touch) and last-touch. Touches at the conversion instant
    * count (Δt = 0 → weight 1); conversions with NO touch in the window
    * drop out (their credit is undefined, not silently assigned).
    *
    * Scale shape: a user-keyed self-join bounded by the lookback window
    * (the planner keys the shuffle on the user, the range predicate
    * prunes pairs — same shape as the as-of/interval joins), one
    * conversion-keyed aggregate for the weight totals, one channel
    * aggregate. Weights are 6-dp rounded BEFORE the per-conversion
    * DECIMAL total and the credit fractions are 6-dp rounded before the
    * per-channel DECIMAL total, so sums are order-free; `pow` carries
    * the same documented cross-libm boundary risk as weightedSample's
    * `ln`.
    */
  def timeDecayAttribution(events: DataFrame, touchTypes: Seq[String],
                           convType: String,
                           lookbackSeconds: Long = 7L * 86400L,
                           halflifeSeconds: Long = 86400L,
                           userCol: String = "user_id",
                           typeCol: String = "event_type", tsCol: String = "ts",
                           idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackSeconds > 0 && halflifeSeconds > 0,
      s"bad knobs: lookback=$lookbackSeconds halflife=$halflifeSeconds")
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(idCol).as("conv_id"),
        unix_timestamp(col(tsCol)).as("conv_s"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(typeCol).as("channel"),
        unix_timestamp(col(tsCol)).as("touch_s"))
    val pairs = convs.join(touches, Seq("u"))
      .filter(col("touch_s") <= col("conv_s") &&
        col("conv_s") - col("touch_s") <= lookbackSeconds)
      .withColumn("w",
        round(pow(lit(0.5),
          (col("conv_s") - col("touch_s")).cast("double") / halflifeSeconds), 6)
          .cast("decimal(18,6)"))
    val totals = pairs.groupBy(col("conv_id"))
      .agg(sum(col("w")).as("wsum"))
    pairs.join(totals, Seq("conv_id"))
      // double ÷ double of two exactly-shared DECIMAL inputs: one IEEE op,
      // bit-identical across engines (decimal division scale rules differ).
      .withColumn("credit",
        graft.functions.Fns.q6(col("w").cast("double") / col("wsum").cast("double"))
          .cast("decimal(18,6)"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("credit")).cast("double"), 6).as("credit"))
  }

  /** Daily new-vs-returning split: per activity day, how many distinct
    * users were active, how many were seen for the FIRST time that day,
    * and the remainder — the growth-vs-retention decomposition every
    * activation dashboard leads with. Two aggregates, no window over
    * events: per-user first day (associative min), then per-day rollups
    * joined on the day key. At 100 TB both shuffles carry (user, day) /
    * (day, counters) pairs only.
    */
  def newVsReturning(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts"): DataFrame = {
    val userDays = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day")).distinct()
    val firstDay = userDays.groupBy(col("u")).agg(min(col("day")).as("first_day"))
    val active = userDays.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val fresh = firstDay.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    active.join(fresh, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        (col("n_active") - coalesce(col("n_new"), lit(0L))).as("n_returning"))
  }

  /** Stage-to-stage funnel latency: for each consecutive pair in
    * `stages`, the users whose FIRST occurrence of the later stage
    * falls strictly after their first occurrence of the earlier one,
    * with median and p90 of the gap in whole seconds — the
    * time-to-convert numbers that turn a conversion funnel
    * ([[funnel]]) into an SLA. First-to-first by contract (re-entries
    * don't reset the clock); gaps are exact integer seconds
    * (remainder-subtracted epoch-micros division); percentiles are the
    * exact interpolated `percentile` rounded to 6 dp (the
    * [[rfm]]/quantile convention).
    *
    * One (user, stage) min aggregate, then per pair one user-keyed
    * join and a percentile reduce — stages are a constant list, so the
    * union is plan-width, not data-width.
    */
  def stageLatency(events: DataFrame, stages: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, s"need >= 2 stages, got ${stages.size}")
    val firsts = events.filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol).as("u"), col(typeCol).as("stage"))
      .agg(min(unix_micros(col(tsCol))).as("t"))
    stages.sliding(2).toSeq.zipWithIndex.map { case (pair, i) =>
      val (a, b) = (pair.head, pair.last)
      val fa = firsts.filter(col("stage") === a)
        .select(col("u"), col("t").as("ta"))
      val fb = firsts.filter(col("stage") === b)
        .select(col("u"), col("t").as("tb"))
      val d = col("tb") - col("ta")
      fa.join(fb, "u").filter(col("tb") > col("ta"))
        .select(((d - d % 1000000L) / 1000000L).cast("long").as("dt_s"))
        .agg(count(lit(1)).as("n_users"),
          graft.functions.Fns.q6(percentile(col("dt_s"), lit(0.5)))
            .as("median_s"),
          graft.functions.Fns.q6(percentile(col("dt_s"), lit(0.9)))
            .as("p90_s"))
        .select(lit(i).as("stage_idx"), lit(a).as("from_stage"),
          lit(b).as("to_stage"), col("n_users"), col("median_s"),
          col("p90_s"))
    }.reduce(_ unionByName _)
  }

  /** Peak concurrency over [start, end) intervals: the maximum number
    * of simultaneously-open intervals and the earliest second it is
    * reached — the capacity-planning scalar (peak sessions, peak open
    * connections) behind every "how big does the pool need to be"
    * question. Classic ±1 sweep: +1 at each start, −1 at each end,
    * deltas NETTED PER DISTINCT SECOND first (so same-second starts
    * and ends need no intra-second ordering — [start, end) semantics
    * fall out of the grouping), then a running sum over distinct
    * seconds via the two-level bucketed prefix (range-bucket on
    * broadcast min/max, per-bucket window, ≤`buckets`-row offset
    * spine) — no global window over the timeline.
    */
  def peakConcurrency(intervals: DataFrame, startCol: String = "start_s",
                      endCol: String = "end_s",
                      buckets: Int = 32): DataFrame = {
    val deltas = intervals
      .select(col(startCol).cast("long").as("t"), lit(1L).as("d"))
      .unionByName(intervals
        .select(col(endCol).cast("long").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum("d").as("d"))
    val bounds = deltas.agg(min("t").as("lo"), max("t").as("hi"))
    val b = deltas.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        ((col("t") - col("lo")) * buckets / (col("hi") - col("lo") + 1L))
          .cast("int"))
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("bucket").agg(sum("d").as("bd"))
      .select(col("bucket"), coalesce(sum("bd").over(wOff), lit(0L)).as("off"))
    val wIn = Window.partitionBy("bucket").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val running = b.join(broadcast(offsets), "bucket")
      .select(col("t"), (sum("d").over(wIn) + col("off")).as("conc"))
    val n = intervals.agg(count(lit(1)).as("n_intervals"))
    val peak = running.agg(max("conc").as("peak"))
    running.crossJoin(broadcast(peak)).filter(col("conc") === col("peak"))
      .agg(min("t").as("peak_at_s"), min("peak").as("peak"))
      .crossJoin(broadcast(n))
      .select(col("n_intervals"), col("peak"), col("peak_at_s"))
  }

  /** Pairwise distinct-user overlap between event types: intersection
    * count and exact Jaccard for every unordered type pair — the
    * audience-overlap matrix ([[graft.operators.Sketch.hllSetOps]] is
    * the sketch-space version of one cell; this is the exact small-k
    * matrix). One distinct projection, one user-keyed self-join (pairs
    * bounded by per-user type count ≤ k, never |users|²), one k²-row
    * aggregate with per-type totals broadcast back.
    */
  def typeOverlapMatrix(events: DataFrame, typeCol: String = "event_type",
                        userCol: String = "user_id"): DataFrame = {
    val tu = events.select(col(typeCol).as("et"), col(userCol).as("u"))
      .distinct()
    val totals = tu.groupBy(col("et")).agg(count(lit(1)).as("n"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a.u") === col("b.u") && col("a.et") < col("b.et"))
      .groupBy(col("a.et").as("type_a"), col("b.et").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(totals.select(col("et").as("type_a"), col("n").as("n_a"))),
        "type_a")
      .join(broadcast(totals.select(col("et").as("type_b"), col("n").as("n_b"))),
        "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        graft.functions.Fns.q6(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .as("jaccard"))
  }

  /** Inter-arrival-time histogram: per-user gaps between consecutive
    * events, pooled into log₂-second buckets — the burstiness /
    * session-cadence profile (bucket b holds gaps in [2^(b−1), 2^b)
    * seconds; bucket 0 is sub-second) that prices session-gap and
    * watermark choices before they're hard-coded. Gap seconds are
    * EXACT integers (epoch-micros difference, remainder-subtracted
    * division), the bucket is a pure integer-comparison CASE chain —
    * nothing floats, so the histogram is engine-identical by
    * construction. One per-user lag window (partitioned), one bucket
    * aggregate.
    */
  def interarrivalHistogram(events: DataFrame, userCol: String = "user_id",
                            tsCol: String = "ts",
                            idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("t"), col(idCol))
    val gaps = events
      .select(col(userCol), unix_micros(col(tsCol)).as("t"), col(idCol))
      .withColumn("prev", lag("t", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_us", col("t") - col("prev"))
      .withColumn("gap_s",
        ((col("gap_us") - col("gap_us") % 1000000L) / 1000000L).cast("long"))
    // bucket = position of the highest set bit + 1 (0 for gap 0), via an
    // exact integer-comparison chain — the HLL rhoCase convention.
    val bucket = (1 to 40).foldLeft(when(col("gap_s") === 0L, 0)) {
      (acc, b) => acc.when(col("gap_s") < (1L << b), b)
    }
    gaps.withColumn("bucket", bucket.cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_s").as("min_gap_s"), max("gap_s").as("max_gap_s"))
  }
}
