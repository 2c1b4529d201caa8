package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Declarative data-quality audit (the dbt-test / expectation-suite
  * shape): not-null, uniqueness and referential-integrity checks declared
  * as data, evaluated lazily as one composed DataFrame of
  * `(check, violations)` rows — no driver-side actions, so the whole
  * audit is one job whose pieces Spark schedules together.
  *
  * Cost shape at scale: every not-null check on the same table folds into
  * ONE conditional aggregation pass (no per-check scans); each
  * uniqueness check is a keyed aggregation counting rows in excess of
  * one per key; each referential check is a left-anti join (broadcast
  * when the parent's key side is small, shuffle otherwise — AQE's call).
  */
object DataQuality {

  /** `notNull`: (checkName, table, column). `unique`: (checkName, table,
    * key columns). `refs`: (checkName, child, childKey, parent,
    * parentKey). Tables are passed per check so one audit can span a
    * whole schema.
    */
  def audit(notNull: Seq[(String, DataFrame, String)],
            unique: Seq[(String, DataFrame, Seq[String])],
            refs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(notNull.nonEmpty || unique.nonEmpty || refs.nonEmpty,
      "audit needs at least one check (the union over zero checks is undefined)")
    // Check names become column aliases inside the shared per-table
    // aggregation, so duplicates would surface later as an opaque
    // ambiguous-reference AnalysisException; fail fast with the names.
    val names = notNull.map(_._1) ++ unique.map(_._1) ++ refs.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate check names: ${dups.mkString(", ")}")
    val nn = notNull.groupBy(_._2).toSeq.flatMap { case (df, checks) =>
      // all of a table's null counts in a single aggregation pass
      val aggs = checks.map { case (name, _, c) =>
        // coalesce: sum over an EMPTY table is NULL, not 0 violations
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(name)
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      checks.map { case (name, _, _) =>
        one.select(lit(name).as("check"), col(name).as("violations"))
      }
    }
    val uq = unique.map { case (name, df, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }
    val rf = refs.map { case (name, child, childKey, parent, parentKey) =>
      // SQL FK semantics: a NULL child key is NOT an orphan (declare a
      // not-null check if nulls are also disallowed). Keys are renamed
      // per side so a same-named FK/PK pair (the common case) doesn't
      // hit an ambiguous-reference error in the join condition.
      child.select(col(childKey).as("__ck")).filter(col("__ck").isNotNull)
        .join(parent.select(col(parentKey).as("__pk")),
          col("__ck") === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }
    (nn ++ uq ++ rf).reduce(_ unionByName _)
  }

  private val P31 = 2147483647L // 2^31 - 1

  /** Order-independent table fingerprint: one row of (n_rows, checksum)
    * where checksum = Σ rowMix mod 2³¹−1 and rowMix folds the given LONG
    * components per row ((acc·131 + part mod p) mod p). Because the
    * combine is a plain sum, the result is independent of partitioning
    * and row order — two engines (or two replicas of a 100 TB table) can
    * each compute it with one scan + one tiny agg and compare a single
    * number, the replication-consistency check a warehouse migration
    * needs. NULL components fold as the sentinel p−1 so a value→NULL
    * corruption (almost always) changes the sum — NOTE this is a hash
    * choice, not a reserved code: pmod ranges over [0, p−1], so a real
    * value ≡ −1 (mod p) folds identically to NULL. Cross-engine parity
    * requires the other engine to apply the SAME non-negative pmod and
    * NULL sentinel per component (the registered DuckDB oracles mirror
    * both).
    * The row sum routes through DECIMAL(38,0): exact, overflow-free at
    * any row count (a raw long sum would hit ANSI overflow past ~2⁶³/p
    * rows).
    */
  def tableChecksum(df: DataFrame, parts: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(parts.nonEmpty, "need at least one component column")
    def pmod(x: org.apache.spark.sql.Column, m: Long) = ((x % m) + m) % m
    val rowMix = parts.foldLeft(lit(0L)) { (acc, c) =>
      pmod(acc * 131 + coalesce(pmod(c.cast("long"), P31), lit(P31 - 1)), P31)
    }
    df.select(rowMix.cast("decimal(38,0)").as("__mix"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__mix")) % P31).cast("long").as("checksum"))
  }

  /** Pearson correlation matrix over numeric columns — the feature-drift /
    * redundancy profile: one row per unordered column pair with
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`.
    *
    * SINGLE PASS over the table: every moment (Σx, Σx², Σxy for all
    * pairs) is one wide aggregate — 1 + 2·k + k·(k−1)/2 sums in one scan,
    * then the pair rows are exploded from the single aggregate row (no
    * per-pair rescan, no driver collect). Per-row products quantize at
    * the DECIMAL(28,6) cast itself (no Round pre-pass — measured 4.4 s vs
    * 2.5 s at sf0.1 for the 10-moment aggregate; Round's BigDecimal
    * round-trip doubled the per-row cost). The sum is exact, so every
    * moment — and therefore r — is independent of partitioning; the cast
    * quantization agrees cross-engine for fixed-dp inputs (money-style
    * k-dp columns: products are exact ≤2k-dp rationals, never within
    * float error of a 5e-7 boundary — parity-verified at sf0.01 AND
    * sf0.1). try_divide: a constant column yields NULL r, not an ANSI
    * error.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def dsum(x: org.apache.spark.sql.Column) =
      sum(x.cast("decimal(28,6)"))
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
        cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(dsum(col(c)).as(s"s_$i"), dsum(col(c) * col(c)).as(s"q_$i")) } ++
        pairs.map { case (i, j) => dsum(col(cols(i)) * col(cols(j))).as(s"p_${i}_$j") }
    // spread the projected input: the wide DECIMAL moment aggregate is
    // the whole cost and otherwise runs map-side on the fixture's 1–3
    // scan splits (Fns.spread scaladoc; order-free DECIMAL sums)
    val a = Fns.spread(df.select(cols.map(col): _*)).agg(aggs.head, aggs.tail: _*)
    def d(name: String) = col(name).cast("double")
    val pairStructs = pairs.map { case (i, j) =>
      val num = d("n") * d(s"p_${i}_$j") - d(s"s_$i") * d(s"s_$j")
      val den = sqrt(d("n") * d(s"q_$i") - d(s"s_$i") * d(s"s_$i")) *
        sqrt(d("n") * d(s"q_$j") - d(s"s_$j") * d(s"s_$j"))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        Fns.q6(try_divide(num, den)).as("r"))
    }
    a.select(explode(array(pairStructs: _*)).as("p")).select(col("p.*"))
  }

  /** Per-column statistical profile of one table: row/null/distinct
    * counts and the DECIMAL-exact mean, one row per column from a SINGLE
    * wide aggregate (the q_column_profile shape, plus the mean).
    * `try_divide`: an all-NULL column profiles with NULL mean.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = Seq(count(lit(1)).as("n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        sum(col(c).cast("decimal(28,6)")).as(s"s_$c")) }
    val a = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("n").as("n_rows"),
        (col("n") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        try_divide(col(s"s_$c").cast("double"), col(s"nn_$c")).as("mean"))
    }
    a.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Snapshot profile drift: [[profile]] of an old and a new snapshot
    * joined per column, with the mean delta — the nightly "did the
    * pipeline's input distribution move" check that catches schema-silent
    * data changes (null-rate spikes, mean shifts) BEFORE they poison
    * downstream training. Two single-pass aggregates + a per-column-name
    * join of two k-row frames — cost is two table scans, nothing else.
    */
  /** Daily ingest-volume anomaly monitor — the first alarm every
    * production pipeline wires: per (group, day) row counts, then each
    * day's count z-scored against ITS OWN group's daily history; days
    * beyond `zThreshold` σ are flagged (feed died, feed doubled,
    * backfill replayed). Delegates the two-pass DECIMAL moment recipe
    * to [[graft.analytics.Analytics.outliers]] over the tiny aggregated
    * (group, day) frame — the corpus-sized work is exactly one
    * map-side-combined count aggregate; everything after operates on
    * groups × days rows. Constant-volume groups have sd = 0 → NULL z
    * (try_divide) → never flagged, same convention as outliers.
    */
  def volumeAnomaly(events: DataFrame, zThreshold: Double = 2.0,
                    tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    graft.analytics.Analytics.outliers(daily, zThreshold,
      groupCol = "event_type", valCol = "cnt", idCol = "day")
  }

  def profileDrift(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) = {
      val p = profile(df, cols)
      p.select(col("col_name") +: p.columns.filterNot(_ == "col_name")
        .map(c => col(c).as(s"${c}_$tag")): _*)
    }
    side(oldDf, "old").join(side(newDf, "new"), "col_name")
      .withColumn("mean_delta", round(col("mean_new") - col("mean_old"), 6))
      .withColumn("mean_old", round(col("mean_old"), 6))
      .withColumn("mean_new", round(col("mean_new"), 6))
  }

  /** Population Stability Index of one numeric column between a reference
    * and a current sample — the industry-standard scalar for "has this
    * feature's distribution moved" (rule of thumb: < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 population shift). Complements [[profileDrift]]:
    * mean/null-rate deltas miss a variance explosion or a bimodal split
    * that leaves the mean untouched; PSI's binned shares catch both.
    *
    * Binning: `bins` equal-width bins anchored on the REFERENCE min/max
    * (the production convention — the reference frame defines the
    * expected distribution); current values outside the reference range
    * clamp into the edge bins, a degenerate single-valued reference puts
    * everything in bin 0. Shares are Laplace-smoothed ((c+1)/(n+bins)) so
    * every ln is defined even for empty bins. Per-bin terms
    * (p−q)·ln(p/q) are rounded to 6 dp and summed through DECIMAL —
    * the same cross-engine float discipline as `text_entropy` /
    * `text_pmi` (the share divisions are single IEEE ops on exact
    * integers; ln is the one last-ulp-risky call, tamed by the round).
    *
    * Plan shape: one tiny min/max aggregate on the reference (rides as a
    * one-row broadcast into both binning passes), one hash aggregate per
    * side keyed by ≤ `bins` values, a broadcast join onto a static bin
    * spine so empty bins still emit rows, and a single-row total joined
    * back — no shuffle wider than `bins` rows after the two scans.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val spark = ref.sparkSession
    val bounds = ref.agg(min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    def binCounts(df: DataFrame, tag: String) =
      df.select(col(valueCol).cast("double").as("v")).crossJoin(broadcast(bounds))
        .select(when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(greatest(floor((col("v") - col("lo"))
            / ((col("hi") - col("lo")) / bins)), lit(0L)), lit(bins - 1L)))
          .cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"c_$tag"))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val counts = spine
      .join(binCounts(ref, "ref"), Seq("bin"), "left")
      .join(binCounts(cur, "cur"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val nRef = sum(col("c_ref")).over()
    val nCur = sum(col("c_cur")).over()
    // The OVER () totals are a single-partition window over <= `bins`
    // rows (the counts frame is already tiny) — not a data-scale window.
    val terms = counts
      .withColumn("p_ref", (col("c_ref") + 1).cast("double") / (nRef + bins))
      .withColumn("p_cur", (col("c_cur") + 1).cast("double") / (nCur + bins))
      .withColumn("term",
        round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 6))
    val total = terms.agg(
      sum(col("term").cast("decimal(18,6)")).cast("double").as("psi"))
    terms
      .select(col("bin"), col("c_ref"), col("c_cur"),
        Fns.q6(col("p_ref")).as("p_ref"), Fns.q6(col("p_cur")).as("p_cur"),
        col("term"))
      .crossJoin(broadcast(total))
  }

  /** Benford first-digit audit of a monetary-style column — the classic
    * fabricated-data / unit-mixing screen: naturally-grown amounts
    * follow log₁₀(1+1/d) first-digit shares; hand-entered, capped,
    * generated-uniform, or unit-mismatched data does not. Emits one row
    * per digit 1–9 (observed count, observed vs expected share, chi-square
    * term) plus the total chi-square statistic on every row (29.6 h 8 df
    * at α=0.001 is the usual alarm line — left to the caller, this is a
    * report not a gate).
    *
    * Determinism: the first digit is taken from the INTEGER string of
    * `round(|v|·10^scale)` (for `scale`-decimal fixed-point data the
    * product sits within 1 ulp of the true integer, so both engines round
    * to it identically; integer→string is exact everywhere) — never from
    * float formatting or log₁₀ of the value, which can differ at digit
    * boundaries. Expected shares are hardcoded 6-dp constants, so no
    * engine's `ln` enters; chi-square terms are single IEEE ops rounded
    * to 6 dp and summed through DECIMAL.
    *
    * Plan shape: one projection + a ≤ 9-key hash aggregate, a broadcast
    * digit spine (zero-count digits still report — their absence IS the
    * anomaly), and a one-row broadcast total. Nothing wider than 9 rows
    * after the scan.
    */
  def benford(df: DataFrame, valueCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0, s"need scale >= 0, got $scale")
    val spark = df.sparkSession
    // log10(1 + 1/d), d = 1..9, quantized to 6 dp.
    val expected = Seq(0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
      0.066947, 0.057992, 0.051153, 0.045757)
    val units = df
      .select((abs(col(valueCol)) * math.pow(10, scale).toLong).as("x"))
      .filter(col("x") > 0)
      .select(round(col("x")).cast("long").as("u"))
      .filter(col("u") > 0)
    val counts = units
      .select(substring(col("u").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("c"))
    val spine = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        element_at(array(expected.map(lit): _*), col("id").cast("int"))
          .as("exp_share"))
    val n = sum(col("c")).over() // <= 9 rows — not a data-scale window
    val terms = spine.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("c"), lit(0L)).as("c"),
        col("exp_share"))
      .withColumn("n", n)
      .withColumn("obs_share", Fns.q6(col("c").cast("double") / col("n")))
      .withColumn("chi2_term",
        Fns.q6((col("c") - col("n") * col("exp_share"))
          * (col("c") - col("n") * col("exp_share"))
          / (col("n") * col("exp_share"))))
    val total = terms.agg(
      sum(col("chi2_term").cast("decimal(28,6)")).cast("double").as("chi2"))
    terms.select(col("digit"), col("c"), col("obs_share"), col("exp_share"),
        col("chi2_term"))
      .crossJoin(broadcast(total))
  }

  /** Pairwise categorical association matrix: chi-square independence
    * statistic + Cramér's V for every pair of the declared
    * low-cardinality columns — the "which features are redundant /
    * entangled" screen run before stratifying, mixing, or
    * feature-selecting on categorical metadata (source × lang ×
    * quality-bucket in a corpus; status × priority in telemetry).
    *
    * Empty contingency cells contribute (0−e)²/e = e to chi-square, and
    * Σ over ALL cells of e is exactly n — so chi² = n + Σ_observed
    * ((o−e)²/e − e), computed WITHOUT materializing the empty-cell
    * spine (a k₁×k₂ cross join that dwarfs the data when cardinalities
    * run to thousands). Expected counts cast to double before the
    * product (ra·cb overflows int64 on ~10¹²-row tables); per-cell
    * terms round to 6 dp and sum through DECIMAL; V = √(χ²/(n·(min(k)−1)))
    * is NULL (never flagged ±) for a constant column, via `try_divide`.
    *
    * Plan shape per pair: one cells aggregate keyed by the value pair,
    * two re-aggregates of the CELLS frame (≤ k₁·k₂ rows — never the
    * table) for the marginals, all joined back as broadcasts, one scalar
    * reduce. Pairs union into one plan; Spark schedules the shared scan.
    */
  /** Per-group data FRESHNESS report — the "is this feed still
    * arriving?" monitor every continuously-ingesting pipeline runs: for
    * each group (source, topic, event type), the latest event time, the
    * lag in whole hours behind the freshest group anywhere in the table,
    * and a staleness flag when that lag exceeds `staleHours`. The
    * complement of [[volumeAnomaly]]: volume catches a feed that shrank,
    * freshness catches one that STOPPED (a stopped feed has no daily row
    * to z-score, so the volume monitor goes silent exactly when the
    * problem starts).
    *
    * Lag is computed against the table's own max timestamp, not the wall
    * clock, so the report is deterministic and testable on a fixed
    * corpus; production callers wanting wall-clock lag pass their own
    * `now` upstream by unioning a sentinel row. Plan: one group
    * aggregate, one scalar max broadcast back — two linear passes, no
    * windows, no shuffle of raw rows beyond the group key.
    */
  def freshness(events: DataFrame, staleHours: Long = 24L,
                groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(staleHours >= 0, s"need staleHours >= 0, got $staleHours")
    val per = events
      .groupBy(col(groupCol).as("group_key"))
      .agg(count(lit(1)).as("n_rows"), max(col(tsCol)).as("max_ts"))
    val global = per.agg(max(col("max_ts")).as("global_max_ts"))
    per.crossJoin(broadcast(global))
      .select(col("group_key"), col("n_rows"), col("max_ts"),
        ((unix_timestamp(col("global_max_ts")) - unix_timestamp(col("max_ts")))
          / 3600L).cast("long").as("lag_hours"))
      .withColumn("is_stale", col("lag_hours") > staleHours)
  }

  def association(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got ${cols.size}")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      val cells = df.groupBy(col(a).as("va"), col(b).as("vb"))
        .agg(count(lit(1)).as("o"))
      val rowTot = cells.groupBy("va").agg(sum("o").as("ra"))
      val colTot = cells.groupBy("vb").agg(sum("o").as("cb"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct(col("va")).as("k_a"), countDistinct(col("vb")).as("k_b"))
      val e = col("ra").cast("double") * col("cb") / col("n")
      val chi2 = col("n") + col("ts").cast("double")
      cells.join(broadcast(rowTot), "va")
        .join(broadcast(colTot), "vb")
        .crossJoin(broadcast(tot))
        .select(col("n"), col("k_a"), col("k_b"),
          Fns.q6((col("o") - e) * (col("o") - e) / e - e).as("term"))
        .groupBy("n", "k_a", "k_b")
        .agg(sum(col("term").cast("decimal(28,6)")).as("ts"))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col("k_a"), col("k_b"), round(chi2, 6).as("chi2"),
          graft.functions.Fns.q6(sqrt(try_divide(chi2,
            (least(col("k_a"), col("k_b")) - 1) * col("n"))))
            .as("cramers_v"))
    }.reduce(_ unionByName _)
  }

  /** Distinct values of `ref` ∪ `cur` with per-side counts and EXACT
    * cumulative counts up to (and excluding) each value — the shared
    * substrate of the rank statistics below ([[ksTest]], [[aucScore]]).
    *
    * Scale shape: the corpus collapses to its distinct scores first (one
    * hash shuffle with map-side combine — cardinality is #distinct
    * values, not #rows), then cumulative counts come from a TWO-LEVEL
    * prefix sum: values are range-bucketed on broadcast min/max, a
    * per-bucket window computes intra-bucket running counts, and the
    * ≤`buckets`-row bucket-total table (a global window over ~32 rows,
    * the same documented tiny-spine exception as PSI) supplies exclusive
    * offsets joined back by broadcast. No global window ever touches the
    * value spine, so the plan survives a value cardinality of billions.
    * All cumulative quantities are BIGINT-exact — engine-independent by
    * construction.
    */
  private def rankedCounts(ref: DataFrame, cur: DataFrame, valueCol: String,
                           buckets: Int): DataFrame = {
    val r = ref.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(1L).as("cr"), lit(0L).as("cc"))
    val c = cur.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(0L).as("cr"), lit(1L).as("cc"))
    val byV = r.unionByName(c).groupBy("v")
      .agg(sum("cr").as("cr"), sum("cc").as("cc"))
    val bounds = byV.agg(min("v").as("lo"), max("v").as("hi"),
      sum("cr").as("n_ref"), sum("cc").as("n_cur"))
    val bucketed = byV.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(greatest(floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / buckets)), lit(0)), lit(buckets - 1)))
          .cast("int"))
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket")
      .agg(sum("cr").as("bcr"), sum("cc").as("bcc"))
      .select(col("bucket"),
        coalesce(sum("bcr").over(wOff), lit(0L)).as("off_r"),
        coalesce(sum("bcc").over(wOff), lit(0L)).as("off_c"))
    val wIn = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offsets), "bucket")
      .select(col("v"), col("cr"), col("cc"), col("n_ref"), col("n_cur"),
        (sum("cr").over(wIn) + col("off_r")).as("cum_r"),
        (sum("cc").over(wIn) + col("off_c")).as("cum_c"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of `ref` and `cur`: D = max over observed values of
    * |ECDF_ref − ECDF_cur|, plus the smallest value attaining it — the
    * standard nonparametric drift test, sharper than PSI's fixed bins
    * because it sees EVERY quantile of both samples at once.
    *
    * ECDFs are exact-integer cumulative counts ([[rankedCounts]]) over
    * one IEEE division each, gap rounded to 6 dp before the max — the
    * repo's cross-engine determinism discipline. One row out.
    */
  def ksTest(ref: DataFrame, cur: DataFrame, valueCol: String,
             buckets: Int = 32): DataFrame = {
    val gaps = rankedCounts(ref, cur, valueCol, buckets)
      .select(col("v"), col("n_ref"), col("n_cur"),
        Fns.q6(abs(col("cum_r").cast("double") / col("n_ref").cast("double") -
          col("cum_c").cast("double") / col("n_cur").cast("double")))
          .as("gap"))
    val mx = gaps.agg(max("gap").as("ks_stat"))
    gaps.crossJoin(broadcast(mx)).filter(col("gap") === col("ks_stat"))
      .agg(min("n_ref").as("n_ref"), min("n_cur").as("n_cur"),
        min("ks_stat").as("ks_stat"), min("v").as("ks_at_value"))
  }

  /** Mann–Whitney AUC: the probability that a random positive row's
    * `scoreCol` exceeds a random negative's (ties count half) — the
    * threshold-free quality-classifier evaluation. Computed from grouped
    * score counts as concordant-pairs-plus-half-ties:
    * `Σ_v c_pos(v)·(2·cum_neg(<v) + c_neg(v)) / (2·n_pos·n_neg)` —
    * the numerator stays BIGINT-exact (no rank averaging in floats);
    * the single final division is rounded to 6 dp. Same two-level
    * prefix substrate as [[ksTest]]; one row out.
    */
  def aucScore(df: DataFrame, scoreCol: String,
               labelCol: org.apache.spark.sql.Column,
               buckets: Int = 32): DataFrame = {
    val pos = df.filter(labelCol)
    val neg = df.filter(!labelCol)
    // ref = negatives, cur = positives: cum_r(<v) is then the negative
    // count strictly below v once the current value's own cr is removed.
    rankedCounts(neg, pos, scoreCol, buckets)
      .select(col("n_cur").as("n_pos"), col("n_ref").as("n_neg"),
        (col("cc") * (lit(2L) * (col("cum_r") - col("cr")) + col("cr")))
          .as("num2"))
      .groupBy("n_pos", "n_neg")
      .agg(sum("num2").as("num2"))
      .select(col("n_pos"), col("n_neg"),
        Fns.q6(col("num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }

  /** Reliability (calibration) bins: scores bucketed into `bins`
    * equal-width intervals on the observed range; per bin the row count,
    * positive count, mean score and empirical positive rate — the curve
    * that says whether a quality classifier's scores can be READ as
    * probabilities. One scalar min/max aggregate broadcast back (PSI's
    * binning arithmetic, single IEEE ops), then one hash aggregation on
    * the bin id; mean is a DECIMAL-quantized sum over count.
    */
  def calibrationBins(df: DataFrame, scoreCol: String,
                      labelCol: org.apache.spark.sql.Column,
                      bins: Int = 10): DataFrame = {
    val s = df.select(col(scoreCol).cast("double").as("v"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .filter(col("v").isNotNull)
    val bounds = s.agg(min("v").as("lo"), max("v").as("hi"))
    s.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(greatest(floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / bins)), lit(0)), lit(bins - 1)))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum(round(col("v"), 6).cast("decimal(28,6)")).as("sv"))
      .select(col("bin"), col("n"), col("n_pos"),
        Fns.q6(col("sv").cast("double") / col("n").cast("double"))
          .as("mean_score"),
        Fns.q6(col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
  }

  /** Key-candidate / identifier-quality profile: per column, the
    * distinct count, uniqueness ratio, Shannon entropy of the value
    * distribution and its normalized form H/ln(n_distinct) — the
    * schema-discovery pass that separates true keys (uniqueness 1,
    * norm-entropy 1), category columns (low distinct, high
    * norm-entropy) and degenerate near-constants (norm-entropy → 0)
    * before anyone joins on the wrong column at 100 TB.
    *
    * One value-count aggregate per column (cardinality = distinct
    * values, map-side combined), entropies via the per-term round(6) +
    * DECIMAL(18,6) discipline; columns union into one small report.
    */
  def keyEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 6).cast("decimal(18,6)")).cast("double")
    cols.map { c =>
      val counts = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum("cnt").as("n"),
        count(lit(1)).as("n_distinct"))
      counts.crossJoin(broadcast(tot))
        .groupBy("n", "n_distinct")
        .agg(dsum(col("cnt").cast("double") / col("n").cast("double") *
          log(col("n").cast("double") / col("cnt").cast("double"))).as("h"))
        .select(lit(c).as("column"), col("n"), col("n_distinct"),
          Fns.q6(col("n_distinct").cast("double") / col("n").cast("double"))
            .as("uniq_ratio"),
          round(col("h"), 6).as("entropy"),
          round(try_divide(col("h"), log(col("n_distinct").cast("double"))), 6)
            .as("norm_entropy"))
    }.reduce(_ unionByName _)
  }

  /** Per-group quantile-position score: every row's value maps to its
    * midrank quantile in the GLOBAL distribution (ties get the average
    * rank, the quantile-normalization convention), then each group
    * reports its row count and mean global quantile — 0.5 means the
    * group sits where the corpus sits; a source whose scores
    * stochastically dominate the rest reads directly as mean > 0.5.
    * The one-number-per-source version of a per-source-vs-rest
    * Mann–Whitney sweep.
    *
    * Scale shape: grouped distinct-value counts (cardinality = distinct
    * values), midranks via the same two-level bucketed prefix sum as
    * [[ksTest]] (no global window), one value-keyed join back, one
    * group-keyed DECIMAL mean. Midranks are exact .5-grain doubles; the
    * quantile is one rounded IEEE division.
    */
  def quantileScoreByGroup(df: DataFrame, valueCol: String, groupCol: String,
                           buckets: Int = 32): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val byV = rows.groupBy("v").agg(count(lit(1)).as("c"))
    val bounds = byV.agg(min("v").as("lo"), max("v").as("hi"),
      sum("c").as("n"))
    val bucketed = byV.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(greatest(floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / buckets)), lit(0)), lit(buckets - 1)))
          .cast("int"))
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket").agg(sum("c").as("bc"))
      .select(col("bucket"),
        coalesce(sum("bc").over(wOff), lit(0L)).as("off"))
    val wIn = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = bucketed.join(broadcast(offsets), "bucket")
      .withColumn("cum_excl", coalesce(sum("c").over(wIn), lit(0L)) + col("off"))
      .select(col("v"),
        Fns.q6((col("cum_excl").cast("double") +
          (col("c") + 1L).cast("double") / 2.0) / col("n").cast("double"))
          .as("q"))
    rows.join(ranks, "v")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("q").cast("decimal(18,6)")).as("s"))
      .select(col("grp").as(groupCol), col("n_rows"),
        Fns.q6(col("s").cast("double") / col("n_rows")).as("mean_quantile"))
  }

  /** Mutual information (nats) between two categorical columns, with the
    * marginal entropies and the normalized MI `mi/sqrt(h_a·h_b)` — the
    * dependence measure that, unlike [[association]]'s chi², reads
    * directly as bits-of-shared-information (how much knowing `source`
    * tells you about `lang` in a corpus card).
    *
    * One hash aggregation on the (a,b) cell (cardinality k_a·k_b, not
    * corpus size), marginals re-aggregated from the cells and broadcast
    * back. Every ln argument is a ratio of exact integer counts composed
    * in a fixed operation order; each term is rounded to 6 dp and summed
    * as DECIMAL(18,6) — the PSI/entropy cross-engine discipline.
    */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("va"), col(colB).as("vb"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("va").agg(sum("o").as("ra"))
    val cb = cells.groupBy("vb").agg(sum("o").as("cb"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct(col("va")).as("k_a"), countDistinct(col("vb")).as("k_b"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 6).cast("decimal(18,6)")).cast("double")
    def ent(margin: DataFrame, cnt: String) = margin
      .crossJoin(broadcast(tot.select("n")))
      .agg(dsum(col(cnt).cast("double") / col("n").cast("double") *
        log(col("n").cast("double") / col(cnt).cast("double"))).as("h"))
    val mi = cells.join(broadcast(ra), "va").join(broadcast(cb), "vb")
      .crossJoin(broadcast(tot))
      .groupBy("n", "k_a", "k_b")
      .agg(dsum(col("o").cast("double") / col("n").cast("double") *
        log(col("o").cast("double") * col("n").cast("double") /
          (col("ra").cast("double") * col("cb").cast("double")))).as("mi"))
    mi.crossJoin(broadcast(ent(ra, "ra").select(col("h").as("h_a"))))
      .crossJoin(broadcast(ent(cb, "cb").select(col("h").as("h_b"))))
      .select(col("n"), col("k_a"), col("k_b"),
        round(col("mi"), 6).as("mi"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        Fns.q6(try_divide(col("mi"), sqrt(col("h_a") * col("h_b"))))
          .as("nmi"))
  }

  /** Deequ-style declarative constraint suite: each rule is a NAME plus
    * a boolean predicate rows must satisfy (`value >= 0`,
    * `event_type IN (...)`, `ts BETWEEN ...`); the report is one row per
    * rule with its violation count and rate. A NULL predicate result
    * counts as a violation (the row failed to prove the rule) — the
    * three-valued-logic trap named and closed.
    *
    * Scale shape: ONE pass — every rule compiles to a conditional sum
    * inside a single partial-aggregate (map-side combine, one scalar row
    * out), then the per-rule rows unfold driver-free from an inline
    * array. Adding a rule adds a column to the aggregate, not a scan.
    */
  def constraintSuite(df: DataFrame,
                      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val viols = rules.zipWithIndex.map { case ((_, p), i) =>
      sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"v_$i")
    }
    val one = df.agg(count(lit(1)).as("n_rows"), viols: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("rule_idx"), lit(name).as("rule"),
        col(s"v_$i").as("n_violations"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.rule_idx").as("rule_idx"), col("e.rule").as("rule"),
        col("n_rows"), col("e.n_violations").as("n_violations"),
        Fns.q6(try_divide(col("e.n_violations").cast("double"),
          col("n_rows").cast("double"))).as("violation_rate"),
        (col("e.n_violations") === 0).as("passed"))
  }

  /** Referential-integrity audit: for each (child → parent) foreign-key
    * relation, count child rows whose non-NULL key has no parent — the
    * orphan scan every star-schema load needs before facts go live
    * (reference create_tables.py:12–44 declares the FKs implicitly;
    * this makes them checkable).
    *
    * Scale shape: per relation, one left-anti join keyed on the FK
    * (Catalyst broadcasts the parent side when it's a dim table under
    * the threshold; a fact-to-fact relation shuffles both sides on the
    * key — the correct shape) plus one count; scalar counts attach via
    * broadcast. Relations evaluate independently and union.
    */
  /** Primary-key uniqueness audit across tables: for each declared
    * (possibly composite) key, rows vs distinct keys vs keys appearing
    * more than once — the first Deequ check every warehouse load runs,
    * and the one whose silent failure corrupts every downstream join
    * (a dup key fans out facts). One count + one key-grouped aggregate
    * per table; tables audit independently and union.
    */
  def pkUniqueness(
      tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    tables.map { case (name, df, keys) =>
      require(keys.nonEmpty, s"table $name needs at least one key column")
      val perKey = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("c"))
      perKey.agg(
          sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_distinct_keys"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_keys"))
        .select(lit(name).as("table_name"),
          lit(keys.mkString(",")).as("key_cols"),
          col("n_rows"), col("n_distinct_keys"), col("n_dup_keys"),
          (col("n_dup_keys") === 0).as("is_unique"))
    }.reduce(_ unionByName _)
  }

  def referentialIntegrity(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val ck = child.select(col(childKey).as("k")).filter(col("k").isNotNull)
      val orphans = ck.join(
          parent.select(col(parentKey).as("k")).distinct(),
          Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      ck.agg(count(lit(1)).as("n_child"))
        .crossJoin(broadcast(orphans))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          Fns.q6(try_divide(col("n_orphans").cast("double"),
            col("n_child").cast("double"))).as("orphan_rate"),
          (col("n_orphans") === 0).as("intact"))
    }.reduce(_ unionByName _)
  }

  /** Calendar-completeness audit: per key, the days that SHOULD have
    * data (first observed day through last) versus the days that do —
    * the "silent feed outage" detector that row-count anomaly scoring
    * ([[volumeAnomaly]]) misses when the gap is total rather than
    * partial (zero rows contribute no z-scoreable count). Reports the
    * observed-day count, the expected span, missing days and coverage;
    * `max_gap_days` is the longest run of consecutive missing days
    * (from the lag of the ordered distinct days — exact integer date
    * arithmetic end to end).
    *
    * One distinct-day aggregate, one per-key lag window over the ≤
    * span-many distinct days, one key aggregate — linear,
    * key-partitioned, no calendar table materialized.
    */
  def calendarAudit(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) =
      graft.functions.Fns.q6(c)
    val days = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("d")).distinct()
    val wo = Window.partitionBy(col(keyCol)).orderBy(col("d"))
    days
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(wo)) - 1)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        min(col("d")).as("first_day"), max(col("d")).as("last_day"),
        max(col("gap")).as("mg"))
      .select(col(keyCol), col("n_days"), col("first_day"), col("last_day"),
        (datediff(col("last_day"), col("first_day")) + 1).cast("long")
          .as("span_days"),
        (datediff(col("last_day"), col("first_day")) + 1 - col("n_days"))
          .cast("long").as("missing_days"),
        coalesce(col("mg"), lit(0)).cast("long").as("max_gap_days"),
        d6(col("n_days").cast("double") /
          (datediff(col("last_day"), col("first_day")) + 1).cast("double"))
          .as("coverage"))
  }

  /** Chi-squared goodness-of-fit card for a CATEGORICAL column against
    * the uniform expectation — the discrete companion to [[ksTest]]
    * (continuous) and [[psiDrift]] (binned): `χ² = Σ (O−E)²/E` with
    * `dof = k−1`, plus the single worst-deviating category and its
    * contribution, which is usually the entire story ("error events
    * tripled"). The statistic is reported raw (compare across runs /
    * against the χ²₍dof₎ table); no p-value approximation is smuggled
    * in. One count aggregate over the column, then k-row arithmetic;
    * contributions are 6-dp-quantized before the exact DECIMAL total so
    * the statistic is engine-identical.
    */
  def chiSquaredUniform(df: DataFrame, colName: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) =
      graft.functions.Fns.q6(c)
    val counts = df.filter(col(colName).isNotNull)
      .groupBy(col(colName).cast("string").as("category"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = counts.agg(sum(col("n_obs")).as("n_rows"),
      count(lit(1)).as("k"))
    val contrib = counts.crossJoin(broadcast(tot))
      .withColumn("expected", col("n_rows").cast("double") / col("k"))
      .withColumn("c", d6((col("n_obs").cast("double") - col("expected"))
        * (col("n_obs").cast("double") - col("expected")) / col("expected")))
    contrib
      .agg(max(col("n_rows")).as("n_rows"), max(col("k")).as("n_categories"),
        sum(col("c").cast("decimal(24,6)")).as("chi2sum"),
        // ordering key (c, category) is duplicate-free, so the argmax
        // is deterministic; top_contrib is then simply max(c)
        max_by(col("category"), struct(col("c"), col("category")))
          .as("top_category"),
        max(col("c")).as("top_contrib"))
      .select(col("n_rows"), col("n_categories"),
        (col("n_categories") - 1L).as("dof"),
        col("chi2sum").cast("double").as("chi2"),
        d6(try_divide(col("chi2sum").cast("double"),
          (col("n_categories") - 1L).cast("double"))).as("chi2_per_dof"),
        col("top_category"), col("top_contrib"))
  }

  /** Sequence-order audit: does event time actually increase along the
    * ingestion order within each key — the clock-skew / out-of-order
    * detector every event pipeline needs before trusting windows,
    * sessionization, or as-of joins (a 2% regression rate silently
    * corrupts all three). Rows order by `orderCol` (the write/ingest
    * sequence) per key; a REGRESSION is an adjacent pair whose
    * timestamp moves backwards. One summary row: keys, rows, adjacent
    * pairs, regressions, keys affected, the worst backstep in exact
    * microseconds, and `ordered_rate` = 1 − regressions/pairs.
    *
    * Exact integer comparisons end to end (epoch-micros longs); the one
    * ratio rides the DECIMAL rounding convention. One per-key lag
    * window + two aggregates — linear, key-partitioned.
    */
  def sequenceAudit(df: DataFrame, keyCol: String, orderCol: String,
                    tsCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) =
      graft.functions.Fns.q6(c)
    val wo = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val rows = df.select(col(keyCol), col(orderCol),
        unix_micros(col(tsCol)).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(wo))
      .withColumn("back",
        when(col("us") < col("prev"), col("prev") - col("us")))
    val perKey = rows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("prev").isNotNull, 1L).otherwise(0L)).as("np"),
        sum(when(col("back").isNotNull, 1L).otherwise(0L)).as("nr"),
        max(col("back")).as("mb"))
    perKey.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        sum(col("np")).as("n_pairs"),
        sum(col("nr")).as("n_regressions"),
        sum(when(col("nr") > 0, 1L).otherwise(0L))
          .as("n_keys_with_regressions"),
        max(col("mb")).as("max_backstep_us"))
      .select(col("n_keys"), col("n_rows"), col("n_pairs"),
        col("n_regressions"), col("n_keys_with_regressions"),
        col("max_backstep_us"),
        d6(lit(1.0) - try_divide(col("n_regressions").cast("double"),
          col("n_pairs").cast("double"))).as("ordered_rate"))
  }

  /** Functional-dependency discovery over every ordered column pair of a
    * candidate list — the schema-profiling pass that finds "A determines
    * B" structure nobody documented (surrogate keys, denormalized
    * lookups, derivable columns a 100 TB pipeline can stop carrying):
    * `A → B` holds iff the distinct count of A equals the distinct count
    * of (A, B); `strength` = |A| / |(A,B)| ∈ (0, 1] grades near-FDs
    * (0.98 reads "holds except for a handful of violating groups" — the
    * dirty-data signal worth a quarantine query).
    *
    * All k + k·(k−1) distinct counts ride ONE aggregate over the pruned
    * k-column scan (Spark plans multi-distinct via a single Expand — one
    * pass, expand factor k², map-side partial aggregation; nothing is
    * rescanned per pair), then a `stack` generator unpivots the wide
    * single row into (lhs, rhs) rows. NULL convention: count(DISTINCT)
    * semantics in both engines drop NULL-bearing rows, so an FD is
    * judged on the non-NULL groups only (document per-column NULL rates
    * with [[profile]] — they are a different question).
    */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 candidate columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "candidate columns must be unique")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val aggs = cols.map(c => countDistinct(col(c)).as(s"d_$c")) ++
      pairs.map { case (a, b) =>
        countDistinct(col(a), col(b)).as(s"d_${a}__$b")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.flatMap { case (a, b) =>
      Seq(lit(a), lit(b), col(s"d_$a"), col(s"d_${a}__$b"))
    }
    wide
      .select(stack((lit(pairs.size) +: stackArgs): _*)
        .as(Seq("lhs", "rhs", "n_distinct_lhs", "n_distinct_pair")))
      .select(col("lhs"), col("rhs"), col("n_distinct_lhs"),
        col("n_distinct_pair"),
        (col("n_distinct_pair") === col("n_distinct_lhs")).as("fd_holds"),
        Fns.q6(try_divide(col("n_distinct_lhs").cast("double"),
          col("n_distinct_pair").cast("double"))).as("strength"))
  }
}
