package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.analytics.Analytics
import graft.etl.{Ingest, Merge, Transforms}
import graft.functions.Fns
import graft.operators.{AsOfJoin, BloomJoin, Dedup, Layout, Multimodal, Sampling, Similarity, Sketch, Skew, TextAnalysis}
import graft.streaming.{StatefulJobs, StreamingJobs}

/** Driver contract: every implemented operator (SURVEY.md §2 + the
  * LLM-data-pipeline set) registered as a named query over the harness
  * testdata, with a DuckDB oracle where the semantics are ANSI-SQL
  * expressible.
  *
  * Determinism rules (the driver hash-compares Spark output vs DuckDB):
  *  - every query ends in an ORDER BY over a unique column set, mirrored in
  *    the oracle (harmless for Bench: Catalyst's EliminateSorts removes the
  *    sort under the bench's count() action);
  *  - aggregated doubles go through an exact DECIMAL sum and back to double
  *    (order-independent, so bit-identical across engines AND across
  *    cluster re-partitionings — per-row double arithmetic is left raw,
  *    IEEE ops in a fixed order are already deterministic);
  *  - computed integers are cast to long on the Spark side and BIGINT in
  *    the oracle (DuckDB's natural type for counts/extracts);
  *  - generated surrogate ids use row_number over an explicit total order
  *    (SURVEY.md §7.4.4), only in oracle-compared entries;
  *  - cosine outputs are rounded to 6 decimals on both sides (the one
  *    place engines legitimately differ in accumulation order).
  *
  * Every registered query has a DuckDB oracle — including the hash-driven
  * ones: SimHash votes and sampling use ANSI-expressible integer mixes,
  * and the SRP hyperplane / perturbation constants are embedded in the
  * generated oracle SQL as literals, so DuckDB reproduces bucket
  * assignments and fingerprints bit-for-bit.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    // Every query funnels through here: make graft's native expressions
    // (graft_cosine) available on whatever session the driver hands us.
    graft.expressions.GraftFunctions.register(s)
    Ingest.readTable(s, dir, name)
  }

  /** The shared co-purchase graph for every graph_* query: undirected
    * edges between parts co-occurring in ≥ 2 orders. Derivation is one
    * order-keyed collect_set + in-memory ordered-pair expansion + one
    * (src,dst) aggregate — 2 shuffles where the previous per-query
    * distinct + bk-self-join + pair-aggregate chain paid 4 (measured
    * 1.9 → 1.6 s warm, 4.2 → 2.9 s cold at sf0.1; edge sets proven
    * identical). Per-order part sets are bounded by order size (~7
    * lineitems at any SF — TPC-H's fixed per-order fanout), so the k²
    * expansion is O(1) per order and the shape is shuffle-bound at
    * 100 TB exactly like the join it replaces. sort_array makes pairs
    * (x < y), matching the oracles' `l.pt < r.pt`; collect_set matches
    * their DISTINCT. The oracle SQL keeps the join formulation — same
    * pair multiset, so identical counts is part of what parity proves.
    */
  private[graft] def copurchaseEdgesFresh(s: SparkSession, dir: String): DataFrame = {
    val parts = T(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("bk"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    parts
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2),
            greatest(size(col("ps")) - i - 1, lit(0))), y =>
          struct(x.as("src"), y.as("dst")))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("src", "dst")
  }

  /** Process-local memo of the checkpointed edge frame, keyed by
    * (session, dir) — 21 graph queries each re-derived the identical
    * edge set (~1–3 s apiece per bench/verify run) because the per-query
    * `(s, dir) => DF` contract gives them nowhere to share it. The memo
    * is that shared place: the first caller pays one eager
    * localCheckpoint of [[copurchaseEdgesFresh]]; everyone after reads
    * the materialized blocks. This mirrors what a real pipeline does
    * (materialize the edge table once), while every query stays a pure
    * `(s, dir) => DF` to the harness — the memoized frame is
    * deterministic, so results are unchanged (EntrySpec asserts edge-set
    * parity vs a fresh derivation). Lifetime: entries live until the
    * JVM (or their owning session) dies — bounded by sessions × sf-dirs,
    * a handful in every harness process; checkpoint blocks are tied to
    * their SparkContext, hence the per-session key.
    */
  private val edgeMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** Memo lookup with the derivation OUTSIDE the monitor: the build is
    * a multi-second Spark job, and holding the map lock through it
    * would serialize concurrent callers of UNRELATED keys (parallel
    * suites in one JVM). A rare duplicate race derives twice and keeps
    * the first insert — the loser's checkpoint blocks idle until the
    * session stops, a bounded leak traded for never blocking a Spark
    * job on a map monitor.
    *
    * Each access first EVICTS entries whose owning session has been
    * stopped: their checkpoint blocks are gone with the SparkContext,
    * so the handles are dead weight — and a long-lived embedder that
    * churns through many short-lived sessions would otherwise
    * accumulate them for the JVM lifetime (the "handful of sessions"
    * assumption holds for the harness, not for library users).
    */
  private def memoized(memo: scala.collection.mutable.Map[(SparkSession, String), DataFrame],
                       name: String, s: SparkSession, dir: String)
                      (build: => DataFrame): DataFrame = {
    touched.synchronized(touched += name)
    sweepDead(memo, sess => sess.sparkContext.isStopped)
    memo.synchronized(memo.get((s, dir))).getOrElse {
      val built = build.localCheckpoint()
      memo.synchronized(memo.getOrElseUpdate((s, dir), built))
    }
  }

  /** The eviction sweep, factored out so the PREDICATE path is unit-
    * testable without stopping a SparkContext (one JVM = one context, so
    * a test can't hold both a stopped and a live session; EntrySpec
    * instead pins that entries leave exactly when the predicate says
    * dead, and the single production call site above binds the predicate
    * to `sparkContext.isStopped`).
    */
  private[graft] def sweepDead(
      memo: scala.collection.mutable.Map[(SparkSession, String), DataFrame],
      isDead: SparkSession => Boolean): Unit =
    memo.synchronized {
      memo.filterInPlace { case ((sess, _), _) => !isDead(sess) }
    }

  /** `_derive_*` names touched since the last drain — how graft.Bench
    * discovers memo-family membership AT RUN TIME: pass 1 drains after
    * each timed query, so pass 2 can re-derive exactly the derivations
    * its retried consumers actually read (re-deriving ALL of them paid
    * the quarantined N² baselines twice on every profile with a
    * non-empty retry set — ~17 s of a ~300 s profile). A hand-written
    * consumer map would drift the first time a query gains or loses a
    * memo read; recording at the accessor can't.
    */
  private val touched = scala.collection.mutable.Set.empty[String]
  private[graft] def drainTouchedDerivations(): Set[String] =
    touched.synchronized { val t = touched.toSet; touched.clear(); t }

  private[graft] def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    memoized(edgeMemo, "_derive_copurchase_edges", s, dir)(copurchaseEdgesFresh(s, dir))

  /** Near-dup cluster labels over the documents table (trigram Jaccard
    * ≥ 0.5 pairs → star-contraction components) — the second shared
    * derivation behind a (session, dir) memo: four queries
    * (`dedup_clusters`, `dedup_cluster_stats`, `dedup_keep_best`,
    * `sample_split`) consume the IDENTICAL label frame, and a real
    * pipeline materializes cluster labels once. Same lifetime/purity
    * contract as [[copurchaseEdges]]; parity vs a fresh derivation is
    * asserted in EntrySpec.
    */
  private[graft] def docClustersFresh(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
    // strict: the four consumers' oracles assume EXACT components (the
    // graph_cc_stars rationale), and the memo would otherwise pin one
    // under-merged derivation for the process lifetime. Adaptive (r15
    // judge item 8): a 2-round min-propagation probe answers outright on
    // the shallow families near-dup mining actually produces (measured
    // 1.1 s vs 1.9 s star-only on the sf0.1 graph, identical labels);
    // chain-shaped graphs fall back to star contraction on the
    // probe-contracted edges, so the O(log² n) bound is kept.
    Dedup.dedupClustersAdaptive(docs, Dedup.ngramJaccardPairs(docs, 3, 0.5),
      strict = true)
  }

  private val clusterMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def docClusters(s: SparkSession, dir: String): DataFrame =
    memoized(clusterMemo, "_derive_doc_clusters", s, dir)(docClustersFresh(s, dir))

  /** The d×d embedding covariance matrix — the third shared derivation:
    * five emb_* queries (covariance, pca_power, eigengap, abtt,
    * effective_rank) all start from the identical (i, j, cov) frame,
    * which costs one full corpus pass each time. Same lifetime/purity
    * contract as [[copurchaseEdges]]; parity is free (covarianceMatrix
    * is deterministic and the memo IS its checkpoint).
    */
  private val covMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def embCov(s: SparkSession, dir: String): DataFrame =
    memoized(covMemo, "_derive_emb_cov", s, dir)(
      Similarity.covarianceMatrix(T(s, dir, "embeddings")))

  /** The exact brute-force 5-NN neighbor list over the embeddings —
    * the fourth shared derivation: it is the N² verify BASELINE that
    * both `ann_knn_graph` (the graph itself) and `ann_knn_graph_agree`
    * (the graph's overlap with the LSH swap) consume, and at ~5 s per
    * derivation it topped every r15 profile twice. Deterministic
    * (cosine ties break on neighbor id), so the memo IS its
    * checkpoint; parity vs a fresh derivation is asserted in EntrySpec.
    */
  private val knnMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def knnExactFresh(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb, 5)
  }

  private[graft] def knnExact(s: SparkSession, dir: String): DataFrame =
    memoized(knnMemo, "_derive_knn_exact", s, dir)(knnExactFresh(s, dir))

  /** The exact TwoNN intrinsic-dimension estimate (one row) — the fifth
    * shared derivation: `emb_intrinsic_dim` returns it verbatim and
    * `emb_intrinsic_dim_agree` diffs the ANN estimate against it, so
    * the N² all-pairs distance pass behind it ran twice per profile.
    * Deterministic single-row output; same contract as [[knnExact]].
    */
  private val twoNNMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def twoNNExact(s: SparkSession, dir: String): DataFrame =
    memoized(twoNNMemo, "_derive_twonn_exact", s, dir)(
      Similarity.intrinsicDimension(T(s, dir, "embeddings")))

  /** The LSH self-top-5 neighbor list (the registered 100 TB swap for
    * the brute kNN) — sixth shared derivation: `ann_knn_graph_lsh`
    * consumes it directly and `ann_knn_graph_agree` re-derived the
    * identical frame for its ANN side (~3.5 s each at sf0.1). Same
    * determinism argument as [[knnExact]] (ties break on neighbor id;
    * SRP planes and plane COUNT derive from fixed seeds and the corpus
    * count). ScaleGate still clears memos per measurement, so the gate
    * ratio for ann_knn_graph_lsh keeps paying the full derivation.
    */
  private val knnLshMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def knnLshFresh(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    Similarity.lshSelfTopK(emb, 5, dim = 64,
      nPlanes = Similarity.srpAutoPlanes(emb.count()), nTables = 8)
  }

  private[graft] def knnLsh(s: SparkSession, dir: String): DataFrame =
    memoized(knnLshMemo, "_derive_knn_lsh", s, dir)(knnLshFresh(s, dir))

  /** The ANN-fed TwoNN estimate (one row) — seventh shared derivation:
    * `emb_intrinsic_dim_ann` returns it verbatim and
    * `emb_intrinsic_dim_agree` re-ran the identical candidate pass for
    * its ANN side. Memoizing the ESTIMATE (not the candidate pair
    * frame) keeps the checkpoint a single row instead of N·c vector
    * pairs.
    */
  private val twoNNAnnMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def twoNNAnn(s: SparkSession, dir: String): DataFrame =
    memoized(twoNNAnnMemo, "_derive_twonn_ann", s, dir) {
      val emb = T(s, dir, "embeddings")
      // the fused collisions→d2→dedup form: byte-identical to composing
      // intrinsicDimensionFromCandidates(lshSelfCandidates(...)), but the
      // pair-dedup shuffle carries a scalar d2 instead of both vectors
      Similarity.intrinsicDimensionLshSelf(emb, dim = 64,
        nPlanes = Similarity.srpAutoPlanes(emb.count()), nTables = 8)
    }

  /** The per-user event-type transition matrix — eighth shared
    * derivation (r19 optimization round): SEVEN queries read the
    * identical frame (ana_transitions verbatim; ana_markov_stationary /
    * ana_markov_entropy as their chain matrix — entropy previously paid
    * the corpus pass TWICE, once inside its stationary call and once for
    * its own entropy terms; ana_pagerank / ana_pagerank_pers /
    * graph_hits / graph_reciprocity as their edge list), each paying the
    * events scan + user-keyed window + pair count (~0.5–1 s at sf0.1).
    * Deterministic (the window orders by (ts, event_id)); same
    * lifetime/purity contract as [[copurchaseEdges]].
    */
  private val transMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def eventTransitions(s: SparkSession, dir: String): DataFrame =
    memoized(transMemo, "_derive_event_transitions", s, dir)(
      Analytics.transitions(T(s, dir, "events")))

  /** The self-consistency NB prediction frame (doc_id, y, pred) over the
    * documents corpus — ninth shared derivation (r19): ml_nb_accuracy /
    * ml_confusion / ml_class_report / ml_mcc_kappa each re-trained and
    * re-scored the identical model (~2.4 s apiece at sf0.1) to then run
    * a sub-100 ms aggregate. Deterministic (6-dp score quantization,
    * ties → lower label); same contract as [[copurchaseEdges]].
    */
  private val nbPredMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private[graft] def nbPred(s: SparkSession, dir: String): DataFrame =
    memoized(nbPredMemo, "_derive_nb_pred", s, dir) {
      val d = T(s, dir, "documents")
      operators.ML.naiveBayesPredict(d, d, "lang")
    }

  /** The shared derivations as NAMED bench lines: graft.Bench times
    * each one per pass (after clearMemos) under its `_derive_*` name,
    * so consumers record only their marginal work — r15 attributed each
    * derivation's full cost to its alphabetically-first consumer, which
    * made per-query history inside memo families order-dependent noise
    * (`dedup_cluster_stats` carried 3.59 s of cluster derivation its
    * three siblings then read for ~0.05 s). NOT part of the
    * `queries`/`oracleSql` correctness contract — these are timings of
    * internal materializations, each already parity-checked in
    * EntrySpec and consumed by oracle-checked queries.
    */
  private[graft] val derivations: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "_derive_copurchase_edges" -> ((s, d) => copurchaseEdges(s, d)),
    "_derive_doc_clusters" -> ((s, d) => docClusters(s, d)),
    "_derive_emb_cov" -> ((s, d) => embCov(s, d)),
    "_derive_knn_exact" -> ((s, d) => knnExact(s, d)),
    "_derive_knn_lsh" -> ((s, d) => knnLsh(s, d)),
    "_derive_twonn_exact" -> ((s, d) => twoNNExact(s, d)),
    "_derive_twonn_ann" -> ((s, d) => twoNNAnn(s, d)),
    "_derive_event_transitions" -> ((s, d) => eventTransitions(s, d)),
    "_derive_nb_pred" -> ((s, d) => nbPred(s, d)))

  /** Drop all (session, dir) memo entries. Measurement harnesses call
    * this to keep recorded times honest: Bench clears per PASS (each
    * pass's total contains every shared derivation exactly once — the
    * materialize-once pipeline shape — and a min-of-2 retry can never
    * record a memo hit as the query's cost), ScaleGate per MEASUREMENT
    * (gate ratios must include the derivation's own scaling). The
    * checkpointed blocks themselves live until their session stops;
    * clearing only forgets the handles, which is fine for the handful
    * of entries a harness process creates.
    */
  private[graft] def clearMemos(): Unit = {
    edgeMemo.synchronized(edgeMemo.clear())
    clusterMemo.synchronized(clusterMemo.clear())
    covMemo.synchronized(covMemo.clear())
    knnMemo.synchronized(knnMemo.clear())
    knnLshMemo.synchronized(knnLshMemo.clear())
    twoNNMemo.synchronized(twoNNMemo.clear())
    twoNNAnnMemo.synchronized(twoNNAnnMemo.clear())
    transMemo.synchronized(transMemo.clear())
    nbPredMemo.synchronized(nbPredMemo.clear())
  }

  /** Tie-free 8-dp quantization of a COMPUTED double, engine-identical.
    * `cast(x AS DECIMAL(18,8))` is NOT: Spark casts through the
    * double's SHORTEST decimal representation (BigDecimal.valueOf)
    * while DuckDB rounds the exact binary value, and a product whose
    * shortest repr lands exactly on a 0.5×10⁻⁸ boundary rounds apart —
    * one lineitem row did at sf0.1, moving q1's sum_disc_price by one
    * ulp. Scaling into the integer domain first removes the ambiguity:
    * for |x|·10⁸ < 2⁵², every half IS exactly representable, so both
    * engines' scale-0 round (half away from zero) agree bit-for-bit,
    * and k/10⁸ recovers the same 8-dp decimal on both (the grid point
    * is ≫ one ulp from any cast tie). DuckDB mirror:
    * `CAST(round(x * 100000000) / 100000000 AS DECIMAL(18,8))`.
    * Same family as perplexityBigram's `(2x+m) div 2m` final round.
    */
  private def q8(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (round(c * lit(1e8)) / lit(1e8)).cast("decimal(18,8)")

  /** DECIMAL(·,8) aggregate → DOUBLE, engine-identical even when the
    * UNSCALED value exceeds 2⁵³: a plain cast is correctly rounded by
    * Spark (BigDecimal.doubleValue over the full rational) but DuckDB
    * rounds the unscaled integer to a double FIRST and then divides —
    * q1's sum_disc_price (unscaled ≈ 2.7×10¹⁷) came out one ulp apart
    * at sf0.1. Splitting into whole + fraction/10⁸ makes both addends
    * exactly representable, so the one IEEE add yields the identical
    * double on both engines.
    *
    * The split works on the UNSCALED decimal directly — `s - (s % 1)`
    * and `(s % 1) · 10⁸` — never scaling the whole aggregate into
    * BIGINT: the r16 form `cast(s * 10⁸ as bigint)` overflowed 2⁶³ once
    * the aggregate passed ~9.2×10¹⁰ (sf ≈ 2 for q1's largest group —
    * ADVICE r16 medium). Now only the integral part rides a BIGINT
    * (overflow at an aggregate of 9.2×10¹⁸, sf ≈ 10⁸, and ANSI mode
    * fails loudly there) and the fraction is < 10⁸ by construction.
    * Both engines' `%` follows the dividend's sign, so the two addends
    * reconstruct negatives identically too. The intermediate
    * `decimal(9,8)` cast keeps the fraction's ×10⁸ product inside
    * precision 38 (an unbounded decimal times 10⁸ would trip Spark's
    * precision cap into scale-6 TRUNCATION — 2 fractional digits lost).
    * DuckDB mirror: `CAST(CAST(s - (s % 1) AS BIGINT) AS DOUBLE) +
    * CAST(CAST(CAST(s % 1 AS DECIMAL(9,8)) * 100000000 AS BIGINT) AS
    * DOUBLE) / 1e8`.
    */
  private[graft] def dec8ToDouble(name: String): org.apache.spark.sql.Column =
    expr(s"cast(cast($name - ($name % 1) as bigint) as double)" +
      s" + cast(cast(cast($name % 1 as decimal(9,8)) * 100000000 as bigint)" +
      s" as double) / 1e8")

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- headline aggregations (analytics capability, README.md:9) ----

    // TPC-H Q1-style pricing summary: scan-heavy groupBy with exact
    // decimal sums; the canonical bench headliner.
    "q1_pricing" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum(q8(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sdp_dec"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .withColumn("sum_disc_price", dec8ToDouble("sdp_dec")).drop("sdp_dec")
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style: 3-way join (two broadcastable dims) + agg + top-k.
    "q3_top_orders" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("c_custkey"))
        .agg(
          sum(q8(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_dec"),
          count(lit(1)).as("n_items"))
        .withColumn("revenue", dec8ToDouble("rev_dec")).drop("rev_dec")
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5-style: 6-table snowflake join (region/nation/supplier
    // broadcast; customer co-keyed with supplier nation) + revenue agg.
    "q5_region_volume" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val su = T(s, dir, "supplier")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(
          sum(q8(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_dec"),
          count(lit(1)).as("n_items"))
        .withColumn("revenue", dec8ToDouble("rev_dec")).drop("rev_dec")
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q18-style: large-order semi join (HAVING subquery) + top-k.
    "q18_big_orders" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qs"))
        .filter(col("qs") > 300)
        .select(col("l_orderkey").as("big_orderkey"))
      l.join(big, l("l_orderkey") === big("big_orderkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)"))
          .cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // Point-in-time join: each click gets the user's latest prior signup
    // value. Spark lacks a native as-of join; see operators/AsOfJoin.
    "asof_join" -> ((s, dir) => {
      val clicks = T(s, dir, "events").filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val signups = T(s, dir, "events").filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      AsOfJoin.asOf(clicks, signups, "user_id", "ts", "ts", Seq("signup_value"))
        .select("event_id", "user_id", "signup_value")
        .orderBy("event_id")
    }),

    // Forward as-of: each click's NEXT same-user purchase value.
    "asof_join_forward" -> ((s, dir) => {
      val clicks = T(s, dir, "events").filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = T(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("next_purchase"))
      AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts", "ts",
          Seq("next_purchase"))
        .select("event_id", "user_id", "next_purchase")
        .orderBy("event_id")
    }),

    // Interpolating as-of: the same-user purchase value ESTIMATED AT the
    // click's instant — linear between the bracketing purchases, flat at
    // the edges (mark-to-time semantics; resampleInterpolate's edge
    // rules and DECIMAL(24,12)->6dp rounding discipline).
    "asof_join_interp" -> ((s, dir) => {
      val clicks = T(s, dir, "events").filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = T(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_at_click"))
      AsOfJoin.asOfInterpolate(clicks, purchases, "user_id", "ts", "ts",
          "purchase_at_click")
        .select("event_id", "user_id", "purchase_at_click")
        .orderBy("event_id")
    }),

    // Nearest as-of (either direction, 48 h tolerance, prior wins ties):
    // each click's temporally closest same-user purchase — the sensor-
    // fusion / log-alignment join. Oracle: two native ASOF joins + the
    // same epoch-exact direction CASE.
    "asof_join_nearest" -> ((s, dir) => {
      val clicks = T(s, dir, "events").filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = T(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("near_purchase"))
      AsOfJoin.asOfNearest(clicks, purchases, "user_id", "ts", "ts",
          Seq("near_purchase"), toleranceSeconds = Some(48L * 3600))
        .select("event_id", "user_id", "near_purchase")
        .orderBy("event_id")
    }),

    // First-touch attribution: every purchase credited to the user's
    // earliest click/view at-or-before it (min-struct aggregate + one
    // keyed join — no window; "first ever" is an associative min).
    "ana_attribution" -> ((s, dir) =>
      Analytics.firstTouchAttribution(T(s, dir, "events"),
          Seq("click", "view"), "purchase")
        .orderBy("conversion_id")),

    // Interval-union coverage: each event spans [ts, ts + 60·value] s;
    // overlapping-or-touching spans merge per user (busy periods). All
    // long arithmetic; floor() (not cast) because Spark truncates and
    // DuckDB rounds on double->bigint casts.
    "ana_interval_union" -> ((s, dir) => {
      val iv = T(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("start_s"),
        (unix_timestamp(col("ts")) + floor(col("value") * 60).cast("long"))
          .as("end_s"))
      Analytics.intervalUnion(iv)
        .orderBy("user_id", "covered_from")
    }),

    // Set operations beyond UNION: distinct intersection and difference.
    "q_intersect" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .intersect(e.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    }),

    // Clickers who never made a high-value purchase (the value filter
    // keeps the difference non-empty — every user has SOME purchase).
    "q_except" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .except(e.filter(col("event_type") === "purchase" && col("value") >= 90)
          .select("user_id"))
        .orderBy("user_id")
    }),

    // EXCEPT ALL — the MULTISET difference (occurrence counts subtract,
    // unlike q_except's set semantics): type occurrences above value 1
    // minus those above value 2.
    "q_except_all" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.filter(col("value") > 1).select("event_type")
        .exceptAll(e.filter(col("value") > 2).select("event_type"))
        .orderBy("event_type")
    }),

    // Bucketized range join (operators/RangeJoin): clicks matched to the
    // 1-hour window after each same-user signup. The naive theta-join
    // plans as a nested loop; binning the time axis turns it into one
    // hash join on (user_id, bin) + exact containment filter.
    "q_range_join" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("p"))
      val signups = T(s, dir, "events").filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          unix_millis(col("ts")).as("w_start"),
          (unix_millis(col("ts")) + 3600000L).as("w_end"))
      operators.RangeJoin.pointInInterval(clicks, signups, "p", "w_start", "w_end",
          Seq("user_id"), binWidth = 3600000L)
        .select("event_id", "signup_id")
        .orderBy("event_id", "signup_id")
    }),

    // Left-semi: customers that placed at least one order.
    "q_semi_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // Bloom-pruned semi-join: build Spark's bloom sketch over the dim keys
    // in a scalar subquery, discard fact rows pre-shuffle, exact residual
    // join removes false positives — result ≡ the plain EXISTS oracle.
    "q_bloom_semi_join" -> ((s, dir) =>
      BloomJoin.bloomSemiJoin(
          T(s, dir, "orders"),
          T(s, dir, "customer").filter(col("c_nationkey") === 5),
          "o_custkey", "c_custkey", estimatedItems = 10000L)
        .select("o_orderkey", "o_custkey").orderBy("o_orderkey")),

    // Exact distributed quantiles per group (Spark's `percentile` builds a
    // value→count map per group — no global sort; the sketch path at
    // 100 TB is approx_percentile, same plan shape, bounded memory).
    "q_quantiles" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.9)).as("p90"),
          percentile(col("l_extendedprice"), lit(0.95)).as("price_p95"))
        .select(col("l_returnflag"), round(col("p50"), 6).as("p50"),
          round(col("p90"), 6).as("p90"), round(col("price_p95"), 6).as("price_p95"))
        .orderBy("l_returnflag")),

    // Left-anti: parts with no shipment in the last months of the data.
    "q_anti_join" -> ((s, dir) => {
      val p = T(s, dir, "part")
      val l = T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey", "p_name").orderBy("p_partkey")
    }),

    // Set op: distinct union of two filtered projections.
    "q_union" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.filter(col("event_type") === "click").select("user_id")
        .union(e.filter(col("event_type") === "view").select("user_id"))
        .distinct().orderBy("user_id")
    }),

    // Full outer join: high-value order counts vs one market segment —
    // rows survive from both unmatched sides (the reconciliation shape).
    "q_full_outer" -> ((s, dir) => {
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
        .select(coalesce(o("o_custkey"), c("c_custkey")).as("custkey"),
          col("n_big_orders"), col("c_name"))
        .orderBy("custkey")
    }),

    // Relative-rank window functions: percent_rank + cume_dist within
    // each order priority (exact small-integer ratios, rounded 6 dp).
    "q_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    }),

    // Grouping sets: ROLLUP over (returnflag, linestatus) with exact sums.
    "q_rollup" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // ntile bucketing WITHIN each priority group (a global unpartitioned
    // ntile would funnel the table through one task — never do that).
    "q_ntile" -> ((s, dir) =>
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(4).over(Window.partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("quartile"))
        .orderBy("o_orderkey")),

    // Full CUBE over the same pair of keys (all four grouping levels).
    "q_cube" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Pivot: one column per event type (explicit value list — at scale an
    // implicit pivot runs a distinct-collect job first), count per cell.
    "q_pivot" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // min_by/max_by argmin aggregates: per nation, the poorest/richest
    // customer. Ties are made impossible by construction: the ordering
    // key folds the unique custkey under the cents-exact balance
    // (cents·10⁹ + key — strictly monotone in (cents, key)), so both
    // engines' otherwise-arbitrary tie choice never fires.
    "q_min_by" -> ((s, dir) => {
      val key = round(col("c_acctbal") * 100).cast("long") *
        lit(1000000000L) + col("c_custkey")
      T(s, dir, "customer").groupBy("c_nationkey")
        .agg(min_by(col("c_custkey"), key).as("poorest_cust"),
          max_by(col("c_custkey"), key).as("richest_cust"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }),

    // Array higher-order functions over the embedding column — filter /
    // transform / aggregate / array_max per row (the nested-data API
    // surface; per-row lambdas on a 64-wide array, the documented
    // non-codegen exception that stays narrow).
    "q_array_ops" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      T(s, dir, "embeddings").select(col("vec_id"),
        size(filter(v, x => x > lit(0.0))).cast("long").as("n_pos"),
        round(aggregate(v, lit(0.0), (acc, x) => acc + x * x), 6)
          .as("sum_sq"),
        round(array_max(transform(v, x => abs(x))), 6).as("max_abs"))
        .orderBy("vec_id")
    }),

    // Time-range moving aggregate: per-user trailing 1-hour mean. The
    // range frame is on exact epoch-millis (both engines frame
    // [t−3600000, t] inclusively; equal timestamps are peers in both).
    "q_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, 0L)
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_win"),
          (sum(col("value").cast("decimal(18,6)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg_1h"))
        .orderBy("event_id")
    }),

    // Winsorize: clamp values to the exact per-group [p05, p95] band —
    // outlier taming before stats/training. Percentiles broadcast back.
    "q_winsorize" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val pct = e.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.05)).as("lo"),
          percentile(col("value"), lit(0.95)).as("hi"))
      e.join(broadcast(pct), "event_type")
        .select(col("event_id"), col("event_type"),
          round(greatest(col("lo"), least(col("hi"), col("value"))), 6)
            .as("v_clamped"))
        .orderBy("event_id")
    }),

    // Top-3 orders per customer by price — the warehouse top-N-per-group
    // staple (rank window, deterministic tie-break, heap-friendly).
    "q_topn_per_group" -> ((s, dir) =>
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc))
            .cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")),

    // Windowed analytics: per-user running event count + previous value.
    "q_window_running" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"), col("user_id"),
          count(lit(1)).over(Window.partitionBy("user_id")
            .orderBy("ts", "event_id")).as("running_n"),
          lag(col("value"), 1).over(Window.partitionBy("user_id")
            .orderBy("ts", "event_id")).as("prev_value"))
        .orderBy("event_id")),

    // RANGE-frame window (time-interval frame, not row counts): per
    // user, the event count and DECIMAL-exact value sum over the
    // trailing hour — boundaries are value-based so ties in ts
    // contribute regardless of row order (order-independent by
    // construction, no tie-break needed).
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      T(s, dir, "events").select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_last_hour"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("sum_last_hour"))
        .orderBy("event_id")
    }),

    // ---- SURVEY §2 core operators over the testdata analogs ----

    // op 1: positional JSON path extraction (JSONPaths ≈ ordered path list).
    "op01_json_positional" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    // op 2: name-matched JSON mapping (`JSON 'auto'` semantics).
    "op02_json_auto" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .orderBy("event_id")),

    // op 6: 3-column compound inner equi-join (song=title AND
    // artist=artist_name AND length=duration analog, incl. a double key).
    "op06_join3" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val dim = l.groupBy("l_partkey", "l_suppkey")
        .agg(min("l_extendedprice").as("min_price"))
        .withColumnRenamed("l_partkey", "d_partkey")
        .withColumnRenamed("l_suppkey", "d_suppkey")
      l.join(dim,
          l("l_partkey") === col("d_partkey") &&
          l("l_suppkey") === col("d_suppkey") &&
          l("l_extendedprice") === col("min_price"))
        .select(l("l_orderkey"), l("l_linenumber"), l("l_partkey"),
          l("l_suppkey"), l("l_extendedprice"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column for a total order.
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice")
    }),

    // op 7: string-equality filter (page = 'NextSong' analog).
    "op07_filter" -> ((s, dir) =>
      T(s, dir, "events").filter(col("event_type") === "click")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),

    // op 8: projection + aliasing with per-row arithmetic.
    "op08_project" -> ((s, dir) =>
      T(s, dir, "lineitem").select(
          col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
          col("l_quantity").as("qty"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        .orderBy("order_id", "line_no", "qty", "net_price")),

    // op 9 verbatim: projection with no dedup (reference users insert).
    "op09_users_verbatim" -> ((s, dir) =>
      T(s, dir, "events").select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),

    // op 9 idiomatic variant: keep the latest row per key (SURVEY §7.4.3).
    "op09_dedup_latest" -> ((s, dir) =>
      Transforms.dedupLatest(T(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")),

    // op 10: sentinel → NULL CASE normalization (year=0 analog on p_size=1).
    "op10_nullif" -> ((s, dir) =>
      T(s, dir, "part").select(col("p_partkey"), col("p_name"),
          when(col("p_size") =!= 1, col("p_size")).as("p_size_n"))
        .orderBy("p_partkey")),

    // op 11: 2-column compound equi-join.
    "op11_join2" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val d = l.groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("n_li"))
      l.join(d, Seq("l_partkey", "l_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("n_li"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // op 12: DISTINCT timestamps (time-dimension source).
    "op12_distinct" -> ((s, dir) =>
      T(s, dir, "events").select(col("ts").as("start_time")).distinct()
        .orderBy("start_time")),

    // ops 12+13: the full time dimension — DISTINCT + 6 date parts incl.
    // the Redshift dow (0=Sunday) off-by-one fix.
    "op13_timedim" -> ((s, dir) => {
      val t = Transforms.buildTime(T(s, dir, "events"))
      t.select(col("start_time") +:
          Seq("hour", "day", "week", "month", "year", "weekday")
            .map(c => col(c).cast("long").as(c)): _*)
        .orderBy("start_time")
    }),

    // op 14: epoch-millis → timestamp (TIMEFORMAT 'epochmillisecs').
    "op14_epoch_ms" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"),
          timestamp_millis(unix_millis(col("ts"))).as("ts_ms"))
        .orderBy("event_id")),

    // op 15: surrogate-key generation — deterministic ids 1..N in key
    // order via the two-level distributed prefix-sum (no global window;
    // the scale path for random ids stays monotonically_increasing_id).
    "op15_surrogate" -> ((s, dir) =>
      Transforms.withDeterministicId(
          T(s, dir, "events").select("event_id", "event_type"), Seq("event_id"), "sk")
        .orderBy("event_id")),

    // op 16: typed-load casts + NOT NULL validation filter.
    "op16_typed_cast" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
          col("l_quantity").cast("long").as("qty_int"), col("l_returnflag"))
        .orderBy("l_orderkey", "line_no", "qty_int", "l_returnflag")),

    // ops 3+4: CREATE x7 / DROP x7 / re-CREATE — exercised live against
    // the session catalog; returns the declared table inventory, which
    // the oracle pins as a VALUES literal. Idempotence is what's tested:
    // any failure in the drop/create cycle aborts the query.
    "op03_04_catalog" -> ((s, dir) => {
      T(s, dir, "region").count() // registers graft functions; touches dir
      etl.Catalog.dropTables(s)   // IF EXISTS: safe when absent
      etl.Catalog.createTables(s)
      etl.Catalog.createTables(s) // IF NOT EXISTS: no-op
      val inventory = etl.Catalog.tables.map { case (n, schema) =>
        (n, schema.fields.length.toLong, s.catalog.tableExists(n))
      }
      etl.Catalog.dropTables(s)   // leave the catalog clean
      import s.implicits._
      inventory.toDF("table_name", "n_cols", "existed")
        .filter(col("existed")).drop("existed").orderBy("table_name")
    }),

    // op 5: INSERT…SELECT append — two appends of the time dimension into
    // a cataloged table must double the row count; the oracle computes
    // the same invariant (2 × distinct ts) straight from events.
    "op05_insert_append" -> ((s, dir) => {
      val time = Transforms.buildTime(T(s, dir, "events"))
      s.sql("DROP TABLE IF EXISTS graft_op05_time")
      time.limit(0).write.saveAsTable("graft_op05_time")
      etl.Catalog.insertInto(time, "graft_op05_time")
      etl.Catalog.insertInto(time, "graft_op05_time")
      val n = s.table("graft_op05_time").count()
      s.sql("DROP TABLE IF EXISTS graft_op05_time")
      import s.implicits._
      Seq(n).toDF("n")
    }),

    // op 17: the whole orchestration — staging frames mapped from events
    // (constant join keys so every transform's output count has a closed
    // form the oracle computes straight from events), Pipeline.run with
    // cached staging + five observed writes, counts returned.
    "op17_pipeline_e2e" -> ((s, dir) => {
      val se = T(s, dir, "events").select(
        col("event_type").as("song"), lit("X").as("artist"),
        lit(1.0).as("length"), col("ts"),
        col("user_id").cast("string").as("user_id"),
        col("event_type").as("level"),
        col("event_id").cast("int").as("session_id"),
        lit("L").as("location"), lit("UA").as("user_agent"),
        when(col("event_type") === "click", "NextSong").otherwise("Home").as("page"),
        lit("FN").as("first_name"), lit("LN").as("last_name"), lit("F").as("gender"))
      val ss = T(s, dir, "events").select(col("event_type")).distinct().select(
        concat(lit("SO_"), col("event_type")).as("song_id"),
        concat(lit("AR_"), col("event_type")).as("artist_id"),
        col("event_type").as("title"), lit("X").as("artist_name"),
        lit(1.0).as("duration"), lit(0).as("year"),
        lit("Loc").as("artist_location"),
        lit(1.5).as("artist_latitude"), lit(2.5).as("artist_longitude"))
      val out = java.nio.file.Files.createTempDirectory("graft-op17").toString
      val r = etl.Pipeline.run(s, se, ss, out)
      require(r.failures.isEmpty, s"pipeline failures: ${r.failures.keySet}")
      import s.implicits._
      r.counts.toSeq.toDF("table_name", "n").orderBy("table_name")
    }),

    // ---- analytics module (star-schema read side) ----

    "ana_top_parts" -> ((s, dir) => {
      val plays = T(s, dir, "lineitem").select(col("l_partkey").as("song_id"))
      val songs = T(s, dir, "part")
        .select(col("p_partkey").as("song_id"), col("p_name").as("title"))
      Analytics.topSongs(plays, songs, 10)
    }),

    "ana_plays_by_time" -> ((s, dir) => {
      val plays = T(s, dir, "events").select(col("ts").as("start_time"))
      val time = Transforms.buildTime(T(s, dir, "events"))
      Analytics.playsByTime(plays, time)
        .select(col("hour").cast("long").as("hour"),
          col("weekday").cast("long").as("weekday"), col("n_plays"))
        .orderBy("hour", "weekday")
    }),

    "ana_user_activity" -> ((s, dir) => {
      val plays = T(s, dir, "events").select(col("user_id"),
        col("event_type").as("level"),
        get_json_object(col("props"), "$.k").cast("int").as("session_id"))
      Analytics.userActivity(plays).orderBy("user_id", "level")
    }),

    "ana_favorite_type" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val plays = e.select(col("user_id"), col("event_type").as("artist_id"))
      val artists = T(s, dir, "events")
        .select(col("event_type").as("artist_id"), upper(col("event_type")).as("name"))
        .distinct()
      Analytics.favoriteArtist(plays, artists).orderBy("user_id")
    }),

    // Ordered conversion funnel signup → click → purchase: stage k+1
    // must happen strictly after the user's earliest in-order completion
    // of stage k. One keyed join per stage, both sides pre-collapsed to
    // a row per user.
    "ana_funnel" -> ((s, dir) =>
      Analytics.funnel(T(s, dir, "events"), Seq("signup", "click", "purchase"))
        .orderBy("stage_idx")),

    // Time-bounded funnel (ClickHouse windowFunnel semantics): the chain
    // must complete within 24h of its anchoring signup — the conversion
    // window the unbounded funnel overcounts.
    "ana_window_funnel" -> ((s, dir) =>
      Analytics.windowFunnel(T(s, dir, "events"),
        Seq("signup", "click", "purchase"), 86400L)
        .orderBy("stage_idx")),

    // Weekly cohort retention: (first-activity week, week offset) →
    // distinct active users from that cohort.
    "ana_retention" -> ((s, dir) =>
      Analytics.retention(T(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")),

    // Cohort lifetime value: weekly + cumulative summed value per
    // (cohort week, offset) — retention's value-weighted sibling.
    "ana_cohort_ltv" -> ((s, dir) =>
      Analytics.cohortLtv(T(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")),

    // Activity concentration ("do 1% of users carry 50% of events?"):
    // user/event shares above an activity-threshold ladder, from the
    // frequency table — no global ranking.
    "ana_concentration" -> ((s, dir) =>
      Analytics.activityConcentration(T(s, dir, "events"))
        .orderBy("threshold")),

    // Gini coefficient of per-user activity by event type — the
    // inequality summary behind the concentration ladder.
    "ana_gini" -> ((s, dir) =>
      Analytics.giniIndex(T(s, dir, "events")).orderBy("event_type")),

    // DAU + trailing-7-day distinct users per day (the WAU series) via
    // membership explode — no distinct-over-window.
    "ana_rolling_distinct" -> ((s, dir) =>
      Analytics.rollingDistinct(T(s, dir, "events")).orderBy("day")),

    // Log-log price elasticity of demand per brand, with R² beside it.
    "ana_elasticity" -> ((s, dir) =>
      Analytics.priceElasticity(T(s, dir, "lineitem"), T(s, dir, "part"))
        .orderBy("p_brand")),

    // Stage-to-stage funnel latency: median/p90 seconds from first
    // signup to first click to first purchase — the funnel as an SLA.
    "ana_stage_latency" -> ((s, dir) =>
      Analytics.stageLatency(T(s, dir, "events"),
        Seq("signup", "click", "purchase"))
        .orderBy("stage_idx")),

    // Inter-arrival-time histogram (log2-second buckets, exact integer
    // arithmetic end-to-end) — the burstiness profile behind session-gap
    // and watermark choices.
    "ana_interarrival" -> ((s, dir) =>
      Analytics.interarrivalHistogram(T(s, dir, "events"))
        .orderBy("bucket")),

    // Peak concurrency over ana_interval_union's [start, end) session
    // intervals — ±1 sweep netted per second, two-level prefix sum, the
    // capacity-planning scalar.
    "ana_peak_concurrency" -> ((s, dir) => {
      val e = T(s, dir, "events")
      Analytics.peakConcurrency(e.select(
        unix_timestamp(col("ts")).as("start_s"),
        (unix_timestamp(col("ts")) + floor(col("value") * 60).cast("long"))
          .as("end_s")))
    }),

    // Monthly DAU/MAU stickiness over observed active days — the
    // engagement ratio (1.0 = daily habit, ~0.05 = drive-by).
    "ana_stickiness" -> ((s, dir) =>
      Analytics.stickiness(T(s, dir, "events"))
        .orderBy("month")),

    // Exact distinct-user overlap matrix between event types —
    // the small-k exact face of sketch_hll_setops.
    "ana_type_overlap" -> ((s, dir) =>
      Analytics.typeOverlapMatrix(T(s, dir, "events"))
        .orderBy("type_a", "type_b")),

    // Event-type transition matrix in per-user event-time order (the
    // Markov-chain behavior profile).
    "ana_transitions" -> ((s, dir) =>
      eventTransitions(s, dir)
        .orderBy("from_type", "to_type")),

    // Long-run occupancy of the event-type Markov chain: 5 unrolled
    // power-iteration rounds of pi' = pi*P (dangling mass uniform, 12-dp
    // DECIMAL per-round sums) — the chain-level summary raw transition
    // counts can't give.
    "ana_markov_stationary" -> ((s, dir) =>
      Analytics.markovStationary(T(s, dir, "events"), 5,
          precomputedTransitions = Some(eventTransitions(s, dir)))
        .orderBy("event_type")),

    // Entropy rate of the event-type chain: how predictable the next
    // event is in the long run, normalized by ln k.
    "ana_markov_entropy" -> ((s, dir) =>
      Analytics.markovEntropyRate(T(s, dir, "events"), 5,
        precomputedTransitions = Some(eventTransitions(s, dir)))),

    // Difference-in-differences over the odd/even user split at the
    // mid-corpus cutoff — removes group gap AND common trend.
    "ana_did" -> ((s, dir) =>
      Analytics.diffInDiff(T(s, dir, "events"),
        col("user_id") % 2 === 1,
        col("ts") >= lit("2024-01-16").cast("timestamp"))),

    // Kaplan–Meier survival over user lifetimes: per daily step, the
    // at-risk / churned / censored counts and the product-limit survival
    // estimate (churn = 7 days dark before corpus end, horizon-clamped).
    "ana_survival" -> ((s, dir) =>
      Analytics.kaplanMeier(T(s, dir, "events"))
        .orderBy("step")),

    // Two-proportion z-test on a deterministic arm split (user_id parity),
    // conversion = ever purchased. One summary row.
    "ana_ab_test" -> ((s, dir) =>
      Analytics.abTest(T(s, dir, "events"), "purchase")
        .orderBy("n_a")),

    // Exponential time-decay multi-touch attribution: per channel, total
    // conversion credit under 0.5^(Δt/1d) weighting within a 7-day
    // lookback.
    "ana_attribution_decay" -> ((s, dir) =>
      Analytics.timeDecayAttribution(T(s, dir, "events"),
          Seq("click", "view"), "purchase")
        .orderBy("channel")),

    // Daily new-vs-returning user split (growth vs retention
    // decomposition); first-seen day via an associative min, no windows.
    "ana_new_returning" -> ((s, dir) =>
      Analytics.newVsReturning(T(s, dir, "events"))
        .orderBy("day")),

    // ---- LLM-data-pipeline: deduplication ----

    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(T(s, dir, "documents")).orderBy("keep_id")),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(T(s, dir, "documents"), 3, 0.5)
        .orderBy("doc_a", "doc_b")),

    // Same exact semantics via PPJoin-style prefix filtering — the
    // scale path when posting-list df² makes the naive join quadratic
    // (slower at this sf, bounded at corpus scale; tested equal).
    "dedup_ngram_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(T(s, dir, "documents"), 3, 0.5)
        .orderBy("doc_a", "doc_b")),

    // Oracle is the exact all-pairs Jaccard: at threshold 0.5 with 64
    // perms / 16 bands (r=4) and the corpus' bimodal similarity (near-dups
    // are ≥0.9, background <0.1), LSH recall is 1 − (1 − 0.9⁴)¹⁶ ≈ 1−4e−8.
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashDedupPairs(T(s, dir, "documents"), 3, 0.5, 64, 16)
        .orderBy("doc_a", "doc_b")),

    // LSH banding calibration: measured candidate rate per Jaccard
    // bucket vs the 1-(1-s²)⁸ S-curve, over an ANSI-expressible MinHash
    // whose signatures the oracle rebuilds bit-for-bit.
    "dedup_lsh_curve" -> ((s, dir) =>
      Dedup.lshCalibrationCurve(T(s, dir, "documents"))
        .orderBy("bucket")),

    // MinHash estimator quality: signature-agreement ĵ vs exact Jaccard,
    // bias + RMSE per decile — "how many permutations does MY corpus
    // need", measured rather than assumed.
    "dedup_minhash_est" -> ((s, dir) =>
      Dedup.minhashEstimatorCard(T(s, dir, "documents"))
        .orderBy("bucket")),

    // Winnowing fingerprint profile (k=3-gram hashes, w=4 windows,
    // rightmost-min rule): the guaranteed-detection fingerprint family
    // beside MinHash — any shared >= w+k-1-token run must share a
    // fingerprint.
    "dedup_winnowing" -> ((s, dir) =>
      Dedup.winnowingFingerprints(T(s, dir, "documents"), 3, 4)
        .orderBy("doc_id")),

    // Verbatim-reuse candidates from the winnowing fingerprints:
    // >= 2 shared selections, boilerplate hashes df-capped at 10 —
    // guaranteed to surface any >= 6-token shared run.
    "dedup_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowingPairs(T(s, dir, "documents"), 3, 4, 2L, 10L)
        .orderBy("doc_a", "doc_b")),

    // Pigeonhole-blocked SimHash pairs; the ANSI-expressible token hash
    // (code-point polynomial + per-bit affine remix) lets the oracle
    // rebuild the 64-bit fingerprints and check the pair set exactly.
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(T(s, dir, "documents"), 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")),

    "dedup_embed_cosine" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(T(s, dir, "embeddings"), 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")),

    // Per-source exact-dup rollup: docs vs distinct md5 payloads per
    // source + dup rate — the "stop buying this crawl" report.
    "dedup_source_report" -> ((s, dir) =>
      Dedup.sourceDupReport(T(s, dir, "documents"))
        .orderBy("source")),

    // SemDeDup: coarse-cluster (k lowest-id seeds) then drop any vector
    // with a lower-id cluster-mate at cosine >= 0.4 — the quadratic pair
    // term is bounded per cluster and the kept verdict is deterministic.
    // k is DERIVED from the corpus size (Dedup.semanticK: smallest
    // k >= 8 with 125k² >= 4n — exactly 8 at every committed fixture,
    // ~√(n/31.25) beyond), because round-18's second scale decade
    // measured the pinned-k=8 form at 62x for 10x data: with fixed k
    // the within-cluster pair term is n²/k by construction. The oracle
    // derives the same k in BIGINT arithmetic (assignCtesDerivedK), so
    // parity holds at any corpus size, not just the fixtures'.
    "dedup_semantic" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Dedup.semanticDedup(emb, Dedup.semanticK(emb.count()), 0.4)
        .orderBy("vec_id")
    }),

    // Threshold calibration for the semantic dedup: within-cluster pair
    // counts at each candidate cosine threshold, from ONE pair pass.
    // Same derived k as dedup_semantic (the calibration must sweep the
    // clustering the dedup will actually run).
    "dedup_threshold_sweep" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Dedup.cosineThresholdSweep(emb, Dedup.semanticK(emb.count()),
          Seq(0.2, 0.3, 0.4, 0.5))
        .orderBy("threshold")
    }),

    // The CAPPED (linear) SemDeDup mode — the last decade of the 100 TB
    // posture: k ∝ n hash-chosen seeds (constant expected cluster size
    // 125), vectors find their seed by SRP-LSH ANN (plane count derived
    // from the SEED count, so seeds-per-bucket stays ~32 at any scale),
    // then the identical drop pass. Total work is ~linear in n where the
    // derived-k mode above is ~n^1.5 (its designed IVF operating point).
    // The oracle mirrors the whole chain: BIGINT seed predicate +
    // embedded seed-42 hyperplane prefix + fused-dot d2 (cappedAssignCtes).
    "dedup_semantic_capped" -> ((s, dir) =>
      Dedup.semanticDedupCapped(T(s, dir, "embeddings"), 0.4).orderBy("vec_id")),

    // Threshold calibration for the capped mode — sweeps the SAME capped
    // clustering the dedup runs, one pair pass, per-threshold counters.
    "dedup_threshold_sweep_capped" -> ((s, dir) =>
      Dedup.cosineThresholdSweepCapped(T(s, dir, "embeddings"),
          Seq(0.2, 0.3, 0.4, 0.5))
        .orderBy("threshold")),

    // The SRP-LSH scale path for embedding near-dup, against the exact
    // all-pairs oracle. The synthetic embeddings are isotropic (pairwise
    // cosines ≲ 0.62 — no natural near-dups), so the query plants them:
    // corpus = embeddings ∪ deterministically perturbed copies (ε = 0.003
    // multiplicative hash noise per coordinate, cosine ≈ 1 − O(ε²) ≥
    // 0.9999), rebuilt verbatim by the oracle. At θ/π ≤ 1.5e-3 a planted
    // pair misses one 8-plane table w.p. 1 − (1 − θ/π)⁸ ≤ 0.012, so the
    // 6-table miss probability is ≤ 0.012⁶ ≈ 3e-12 per pair — the same
    // shape of recall argument as dedup_minhash_lsh above. Background
    // pairs that sneak into a bucket are removed by the exact cosine
    // verify, so false positives are impossible.
    "dedup_embed_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupPairsLsh(
          augmentedEmbeddings(T(s, dir, "embeddings")), 0.95,
          dim = 64, nPlanes = 8, nTables = 6)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")),

    // Decontamination: near-dup pairs that CROSS source boundaries — the
    // train/heldout leakage check. Oracle = the exact all-pairs Jaccard
    // joined back to both documents' sources.
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.crossGroupPairs(Dedup.ngramJaccardPairs(docs, 3, 0.5), docs, "source")
        .select(col("doc_a"), col("doc_b"), col("group_a"), col("group_b"),
          col("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // Cluster resolution: pairwise near-dup output → per-doc cluster_id
    // (min reachable id; keep = doc_id == cluster_id). Oracle computes
    // the true transitive closure with a recursive CTE, so the
    // production path — alternating star contraction since round 15,
    // O(log² n) rounds regardless of component diameter — is checked
    // against exact connected components. The propagation formulation
    // survives as Dedup.dedupClustersPropagation, the spec-level parity
    // oracle.
    "dedup_clusters" -> ((s, dir) =>
      docClusters(s, dir).orderBy("doc_id")),

    // Digest-level exact dedup: only 16-byte md5 digests shuffle, never
    // payloads — the binary-asset dedup shape (run here over text as the
    // stand-in content column).
    "dedup_digest" -> ((s, dir) =>
      Dedup.exactByDigest(T(s, dir, "documents"), "text", "doc_id")
        .orderBy("digest")),

    // Dedup observability: the cluster-size histogram (how many docs sit
    // in clusters of size s) — the report that says "dedup removed X% and
    // the worst template family has N copies". Two tiny aggregates over
    // the cluster labels.
    "dedup_cluster_stats" -> ((s, dir) =>
      docClusters(s, dir)
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")),

    // Character-level near-dup: exact-Jaccard >= 0.3 candidates verified
    // by exact Levenshtein <= 10. The candidate definition MATCHES the
    // oracle's prefilter exactly (sound for any corpus, unlike an LSH
    // candidate set whose banding misses are only probabilistically
    // rare); the LSH-candidate default of editDistancePairs is the scale
    // path, covered by DedupSpec.
    "dedup_edit_distance" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.editDistancePairs(docs, 10,
          candidatePairs = Some(Dedup.ngramJaccardPairs(docs, 3, 0.3)
            .select("doc_a", "doc_b")))
        .orderBy("doc_a", "doc_b")
    }),

    // Bag-of-words TF cosine >= 0.95: the vector-space dedup twin —
    // integer dots and squared norms, sqrt/divide only at the edge, so
    // both engines rank identically.
    "dedup_tf_cosine" -> ((s, dir) =>
      Dedup.tfCosinePairs(T(s, dir, "documents"), 0.95)
        .orderBy("doc_a", "doc_b")),

    // Asymmetric containment (quote/subset detection): |A∩B|/|A| >= 0.6,
    // both directions — catches a short doc wholly embedded in a long one.
    "dedup_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(T(s, dir, "documents"), 3, 0.6)
        .orderBy("doc_a", "doc_b")),

    // Verbatim-passage detection: pairs sharing >= 1 full 16-token window
    // (native shingle hashes ARE the window fingerprints — no window
    // strings ever materialize).
    "dedup_substring" -> ((s, dir) =>
      Dedup.sharedWindowPairs(T(s, dir, "documents"), 16)
        .orderBy("doc_a", "doc_b")),

    // Cross-source trigram overlap matrix (all source pairs incl.
    // zero-overlap): the dataset-card "which sources mirror each other"
    // diagnostic — Jaccard + containment over distinct shingle sets.
    "dedup_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(T(s, dir, "documents"), 3)
        .orderBy("source_a", "source_b")),

    // Survivor selection: keep the longest member of each near-dup
    // cluster (score = n_chars, exact integer — tie by doc_id).
    "dedup_keep_best" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.keepBest(docClusters(s, dir), docs.select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars")), "n_chars")
        .select(col("cluster_id"), col("keep_id"), col("n_members"),
          col("best_score"))
        .orderBy("cluster_id")
    }),

    // Leak-free split: hash the CLUSTER id, not the doc id, so near-dups
    // can never straddle the train/eval boundary.
    "sample_split" -> ((s, dir) =>
      Sampling.assignSplit(docClusters(s, dir), "cluster_id", 0.1, 0.1)
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")),

    // Column-level completeness profile: rows / non-null / exact
    // distinct per column, reshaped one-row-per-column with stack() —
    // all in a single aggregation job. (Exact distinct expands the agg;
    // at corpus scale swap in the HLL registers — sketch_hll_grouped —
    // per the same schema.)
    "q_column_profile" -> ((s, dir) => {
      val a = T(s, dir, "events").agg(
        count(lit(1)).as("n"),
        count(col("user_id")).as("nn_user"),
        countDistinct(col("user_id")).as("nd_user"),
        count(col("event_type")).as("nn_type"),
        countDistinct(col("event_type")).as("nd_type"),
        count(col("value")).as("nn_value"),
        countDistinct(col("value")).as("nd_value"))
      a.selectExpr(
        """stack(3,
          |  'event_type', n, nn_type, nd_type,
          |  'user_id', n, nn_user, nd_user,
          |  'value', n, nn_value, nd_value)
          |AS (col_name, n_rows, n_non_null, n_distinct)""".stripMargin)
        .orderBy("col_name")
    }),

    // Distribution profiling: exact interpolated percentiles + moments
    // per group — the per-column statistics a data-quality pass emits.
    "q_profile_stats" -> ((s, dir) =>
      T(s, dir, "events").groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          round(min("value"), 6).as("v_min"),
          round(max("value"), 6).as("v_max"),
          round(stddev("value"), 6).as("v_std"))
        .orderBy("event_type")),

    // Fixed-width histogram of a numeric column: integer bucket counts
    // (explicit floor arithmetic — width_bucket semantics, portable).
    "q_histogram" -> ((s, dir) =>
      T(s, dir, "events")
        .select(when(col("value") < 0, lit(0L))
          .when(col("value") >= 100, lit(11L))
          .otherwise(floor(col("value") / 10) + 1).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // Pure-SQL usage of the native extension functions: the documents
    // table as a temp view, queried with spark.sql text.
    // Correlated scalar subquery (Catalyst decorrelates it into an agg +
    // join — the SQL surface users actually write). The per-customer mean
    // is an exact DECIMAL sum over one double division, so the strict `>`
    // cut is engine-identical.
    "q_correlated_subquery" -> ((s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM graft_orders o
          |WHERE o_totalprice > (
          |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |         / count(*)
          |  FROM graft_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    "q_sql_native_fns" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("graft_docs")
      s.sql(
        """SELECT doc_id,
          |  CAST(size(graft_shingles(text, 3)) AS BIGINT) AS n_shingles,
          |  size(graft_minhash(text, 3, 32)) AS sig_len
          |FROM graft_docs ORDER BY doc_id""".stripMargin)
    }),

    // ---- LLM-data-pipeline: deterministic sampling / data mixing ----

    "sample_deterministic" -> ((s, dir) =>
      Sampling.deterministicSample(T(s, dir, "events"), "event_id", 0.1)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")),

    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedQuota(T(s, dir, "documents"), "lang", "doc_id", 40)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // Training-mixture composition: target source weights w(srcK)=K%4+1
    // + a 10k-token budget → per-source deterministic sampling rates and
    // the target-vs-achieved mixture card (the Pile/Dolma dataset-card
    // step). Oracle derives the same weights from the source name.
    "sample_mixture_card" -> ((s, dir) =>
      Sampling.mixtureCard(T(s, dir, "documents"),
          (0 until 20).map(k => s"src$k" -> (k % 4 + 1).toDouble).toMap,
          10000L)
        .orderBy("source")),

    // Deterministic training-order shuffle: the output's ROW ORDER is the
    // shuffle (the driver's hash-compare is order-sensitive, so the
    // pseudorandom permutation itself is what's verified).
    "sample_shuffle" -> ((s, dir) =>
      Sampling.deterministicShuffle(
          T(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .select(col("doc_id"), col("lang"))),

    // Temperature-weighted data mixing (quota_src ∝ √n_src, τ = 2):
    // low-resource languages up-weighted vs a proportional sample.
    "sample_mixture" -> ((s, dir) =>
      Sampling.temperatureMixture(
          T(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id", 1000L)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Mixture-rate plan for a dictated 50/30/20 mix over three sources:
    // largest exactly-proportioned sample with no oversampling.
    "sample_rates" -> ((s, dir) =>
      Sampling.mixtureRates(T(s, dir, "documents"), "source",
          Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy("source")),

    // Temperature-share planning report (alpha = 0.5): derived per-source
    // target shares p_s ∝ n_s^alpha with raw-share and boost columns —
    // the analysis face of sample_mixture's selection.
    "sample_temp_shares" -> ((s, dir) =>
      Sampling.temperatureShares(T(s, dir, "documents"), 0.5)
        .orderBy("source")),

    // Importance-reweighting card toward uniform language balance:
    // per-lang weight + Kish effective sample size — "is reweighting
    // this skew affordable, or must the tail be upsampled".
    "sample_importance" -> ((s, dir) =>
      Sampling.importanceWeights(T(s, dir, "documents"), "lang")
        .orderBy("lang")),

    // word2vec negative sampler: k unigram^0.75 draws per doc by
    // deterministic CDF inversion.
    "sample_negatives" -> ((s, dir) =>
      Sampling.negativeSampling(T(s, dir, "documents"))
        .orderBy("doc_id", "j")),

    // Neyman optimal allocation of a 1000-row sample over languages,
    // n_h ∝ N_h·σ(n_chars).
    "sample_neyman" -> ((s, dir) =>
      Sampling.neymanAllocation(T(s, dir, "documents"), "lang", "n_chars")
        .orderBy("stratum")),

    // Systematic PPS draw: 50 grid points over the exact n_chars
    // cumulative line, inclusion probability exactly n·w/W.
    "sample_pps" -> ((s, dir) =>
      Sampling.ppsSystematic(T(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("j")),

    // Hansen–Hurwitz total-of-tokens estimate from the n_chars-PPS draw,
    // beside the exact total — the corpus-stats-without-a-full-scan
    // calibration card (chars ∝ tokens ⇒ small rel_error).
    "sample_ht_total" -> ((s, dir) =>
      Sampling.hansenHurwitzTotal(
        T(s, dir, "documents")
          .withColumn("y", size(Fns.tokens(col("text"))).cast("long")),
        "doc_id", "n_chars", "y")),

    // ---- LLM-data-pipeline: mergeable sketches ----

    // Count-Min Sketch built INCREMENTALLY: register tables for the pre-
    // and post-cutoff halves of the stream, union-merged by summing
    // counts, then probed for every distinct key. The oracle recomputes
    // the ONE-SHOT sketch from the same ANSI hash chain, so the
    // hash-match proves (a) the register contents bit-for-bit and
    // (b) merge(build(A), build(B)) == build(A ∪ B) — the sketch's
    // associativity contract. Estimates are exact here (width 32 ≥ key
    // cardinality ⇒ no collisions); CMS error bounds are covered in
    // SketchSpec with a deliberately undersized width.
    "sketch_cms" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val cutoff = lit("2024-01-20").cast("timestamp")
      val part1 = Sketch.cmsBuild(e.filter(col("ts") < cutoff), "event_type", 4, 32)
      val part2 = Sketch.cmsBuild(e.filter(col("ts") >= cutoff), "event_type", 4, 32)
      val merged = part1.unionByName(part2)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      Sketch.cmsEstimate(merged, e.select("event_type").distinct(), "event_type", 4, 32)
        .orderBy("event_type")
    }),

    // Count Sketch (signed CMS): same incremental split-merge contract as
    // sketch_cms, width 16 over ~12 keys so collisions are live — but
    // signed, so they cancel instead of inflating; estimate = median of
    // the 5 signed register reads. The hash-match proves register
    // contents AND merge(build(A), build(B)) == build(A ∪ B) for the
    // SIGNED sum.
    "sketch_countsketch" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val cutoff = lit("2024-01-20").cast("timestamp")
      val part1 = Sketch.countSketchBuild(e.filter(col("ts") < cutoff), "event_type", 5, 16)
      val part2 = Sketch.countSketchBuild(e.filter(col("ts") >= cutoff), "event_type", 5, 16)
      val merged = part1.unionByName(part2)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      Sketch.countSketchEstimate(merged, e.select("event_type").distinct(),
          "event_type", 5, 16)
        .orderBy("event_type")
    }),

    // CMS heavy hitters: top-20 users by estimated event count — 150
    // keys into 64 buckets, so collisions (and the min-over-rows bound)
    // are live, and the ranking is over ESTIMATES; integer-exact in both
    // engines, ties broken by key.
    "sketch_cms_topk" -> ((s, dir) => {
      val e = T(s, dir, "events").select(col("user_id").cast("string").as("key"))
      val sk = Sketch.cmsBuild(e, "key", 4, 64)
      Sketch.cmsTopK(sk, e, "key", 4, 64, 20)
    }),

    // CMS width-error sweep: the calibration curve (lsh_curve's sibling)
    // that sizes the sketch — mean/max over-estimate and the exact-hit
    // share at 16/64/256 buckets against true counts.
    "sketch_cms_sweep" -> ((s, dir) => {
      val e = T(s, dir, "events").select(col("user_id").cast("string").as("key"))
      val exact = e.groupBy("key").agg(count(lit(1)).as("exact"))
      def d6(c: org.apache.spark.sql.Column) =
        round(c.cast("decimal(24,12)"), 6).cast("double")
      Seq(16, 64, 256).map { w =>
        val sk = Sketch.cmsBuild(e, "key", 4, w)
        Sketch.cmsEstimate(sk, e.select("key").distinct(), "key", 4, w)
          .join(exact, "key")
          .agg(count(lit(1)).as("n_keys"),
            sum(col("est") - col("exact")).as("sover"),
            max(col("est") - col("exact")).as("max_over"),
            sum(when(col("est") === col("exact"), 1L).otherwise(0L))
              .as("nex"))
          .select(lit(w.toLong).as("width"), col("n_keys"),
            d6(col("sover").cast("double") / col("n_keys").cast("double"))
              .as("mean_over"),
            col("max_over"),
            d6(col("nex").cast("double") / col("n_keys").cast("double"))
              .as("frac_exact"))
      }.reduce(_ unionByName _).orderBy("width")
    }),

    // Histogram quantile sketch: 64 equi-width bins over l_extendedprice,
    // estimates at p50/p90/p99 (error <= one bin width by construction).
    "sketch_histq" -> ((s, dir) =>
      Sketch.histQuantiles(T(s, dir, "lineitem"), "l_extendedprice", 64,
          Seq(0.5, 0.9, 0.99))
        .select(col("q"), col("est"), col("bin"), col("n"))
        .orderBy("q")),

    // HyperLogLog distinct(event_id), m = 64. Registers are pure integer
    // arithmetic; the harmonic sum is exact in IEEE (every term a
    // multiple of 2⁻²⁷), exported both as the integer register checksum
    // `sum_inv_scaled` and the rounded `est`. 10k keys into 64 buckets
    // leaves no zero registers, so the raw estimator path (no libm ln)
    // is what's exercised end-to-end.
    "sketch_hll" -> ((s, dir) =>
      Sketch.hllEstimate(
        Sketch.hllRegisters(T(s, dir, "events"), "event_id", 6), 6)),

    // Per-group HLL: distinct users per event type from ONE register
    // aggregation (groups × 64 registers shuffle, not rows). ~150 users
    // into 64 buckets leaves zero registers in every group, so this —
    // unlike the global sketch — exercises the linear-counting branch
    // end-to-end (the one `ln`; rounded 4 dp on both engines).
    "sketch_hll_grouped" -> ((s, dir) =>
      Sketch.hllEstimateGrouped(
        Sketch.hllRegistersGrouped(T(s, dir, "events"), "user_id",
          Seq("event_type"), 6),
        Seq("event_type"), 6)
        .orderBy("event_type")),

    // ---- LLM-data-pipeline: similarity search ----

    "ann_brute_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // Mutual 5-NN similarity graph over ALL vectors: an undirected edge
    // survives iff each endpoint is in the other's top-5 — the noisy
    // directed k-NN list turned into the similarity graph that LPA /
    // SemDeDup-style carving consume. Exact brute k-NN here (the verify
    // baseline); at 100 TB feed mutualKnnGraph the lshAnnTopK / ivfTopK
    // neighbor list instead — the graph construction is input-agnostic.
    "ann_knn_graph" -> ((s, dir) =>
      Similarity.mutualKnnGraph(knnExact(s, dir))
        .orderBy("id_a", "id_b")),

    // The registered 100 TB swap for ann_knn_graph: the SAME
    // mutualKnnGraph over lshSelfTopK — per-vector top-5 among SRP
    // bucket-mates from a plain (tbl, bucket)-keyed self-join, no
    // broadcast, no N² stage. 4 planes × 8 tables: the fixture's
    // embeddings are near-isotropic (d̂≈35 in 64 dims — LSH's hardest
    // regime), so the operating point leans recall (~0.7 measured by
    // the agree row below); at scale nPlanes grows ∝ log N to hold
    // bucket occupancy constant, and real clustered corpora sit far
    // above this recall at the same cost.
    // nPlanes from a corpus count (4 at the 500-vector oracle scale,
    // matching the static DuckDB mirror) — fixed planes would make
    // the bucket self-join quadratic in data growth; see srpAutoPlanes
    // (the derivation lives in knnLsh).
    "ann_knn_graph_lsh" -> ((s, dir) =>
      Similarity.mutualKnnGraph(knnLsh(s, dir))
        .orderBy("id_a", "id_b")),

    // Edge-overlap agreement of the LSH graph against the brute graph —
    // the recallAtK discipline applied to graph construction: recall of
    // exact edges plus the symmetric Jaccard. This row is WHY the swap
    // above is trustworthy.
    "ann_knn_graph_agree" -> ((s, dir) => {
      val ex = Similarity.mutualKnnGraph(knnExact(s, dir))
        .select(col("id_a"), col("id_b"))
      val an = Similarity.mutualKnnGraph(knnLsh(s, dir))
        .select(col("id_a"), col("id_b"))
      val j = ex.withColumn("ex", lit(1L))
        .join(an.withColumn("an", lit(1L)), Seq("id_a", "id_b"), "full_outer")
      // coalesce: sum() over an empty/all-NULL side yields NULL where the
      // DuckDB oracle's count(*) yields 0 — a degenerate-fixture (empty
      // graph) divergence the hash comparison would flag spuriously.
      j.agg(
          coalesce(sum(col("ex")), lit(0L)).as("ne"),
          coalesce(sum(col("an")), lit(0L)).as("na"),
          sum(when(col("ex").isNotNull && col("an").isNotNull, 1L)
            .otherwise(0L)).as("nc"))
        .select(col("ne").as("n_exact_edges"), col("na").as("n_ann_edges"),
          col("nc").as("n_common"),
          Fns.q6(try_divide(col("nc").cast("double"),
            col("ne").cast("double"))).as("edge_recall"),
          Fns.q6(try_divide(col("nc").cast("double"),
            col("ne").cast("double") + col("na").cast("double")
              - col("nc").cast("double"))).as("jaccard"))
    }),

    // Exact max-inner-product top-10 for the same 8 probes — the
    // magnitude-aware retrieval semantic (recommendation scoring);
    // the exact baseline the norm-augmented ANN path measures against.
    "ann_mips_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.mipsTopK(emb, emb.filter(col("vec_id") < 8), 10)
        .orderBy("query_id", "rank")
    }),

    // Range search: every neighbor with 6-dp cosine >= 0.3 of the 8
    // lowest-id probes — variable-cardinality retrieval (no top-k cut),
    // pure broadcast map work, zero shuffles.
    "ann_range" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.rangeSearch(emb, emb.filter(col("vec_id") < 8), 0.3)
        .orderBy("query_id", "neighbor_id")
    }),

    // Hard-negative mining for contrastive training: per query, top-5 by
    // cosine among vectors assigned to a DIFFERENT coarse cluster (k=4
    // lowest-id seeds) — near-misses with a known non-match label.
    "ann_hard_negatives" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8), 5, nClusters = 4)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("neighbor_cluster"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // IVF is the inverted-list scale path beside SRP-LSH. Centroids are
    // the nClusters smallest samplingHash(id) vectors — ANSI arithmetic,
    // so the oracle selects the identical set and checks the full
    // assign→probe→rank pipeline.
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), 10,
          nClusters = 16, nProbe = 4)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // Seed-fixed hyperplanes (java.util.Random — algorithm pinned by the
    // Java spec) are embedded as literal double arrays in the generated
    // oracle SQL, so DuckDB reproduces every bucket and the candidate set.
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.lshAnnTopK(emb, emb.filter(col("vec_id") < 8), 10, dim = 64,
          nPlanes = 8, nTables = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ANN evaluation: mean recall@10 of the SRP-LSH result against the
    // exact brute-force ranking — the tuning metric, as a first-class
    // operator (both sides are themselves oracle-verified queries).
    "ann_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      Similarity.recallAtK(
        Similarity.lshAnnTopK(emb, q, 10, dim = 64, nPlanes = 8, nTables = 2),
        Similarity.bruteForceTopK(emb, q, 10))
    }),

    // Two-stage ANN: exact-integer code-dot coarse cut (engine-identical
    // candidate sets), exact cosine rerank of the survivors.
    "ann_refine" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.refineTopK(emb, emb.filter(col("vec_id") < 8), 10, 40)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // Symmetric int8 quantization, exploded to (vec_id, i, q) rows so the
    // driver's scalar hash-compare covers every code.
    "emb_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(T(s, dir, "embeddings"))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"), posexplode(col("q")))
        .select(col("vec_id"), col("scale"), col("pos").cast("long").as("i"),
          col("col").cast("long").as("q"))
        .orderBy("vec_id", "i")),

    // Unit-norm pre-pass (native graft_l2norm), exploded per element.
    // Per-row IEEE arithmetic (square-sum fold, sqrt, divide) is exact on
    // both engines; rounded to 6 dp to match house style for vector math.
    "emb_normalize" -> ((s, dir) =>
      Similarity.normalizeL2(T(s, dir, "embeddings"))
        .select(col("vec_id"), posexplode(col("unit")))
        .select(col("vec_id"), col("pos").cast("long").as("i"),
          round(col("col"), 6).as("x"))
        .orderBy("vec_id", "i")),

    // ---- LLM-data-pipeline: text analysis ----

    // Per-doc top-5 TF-IDF terms: (doc,term) tf shuffle + term df shuffle
    // + broadcast corpus count + per-doc top-k window.
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(T(s, dir, "documents"), 5)
        .orderBy("doc_id", "rank")),

    // Frequency-ordered vocabulary with dense ids: the tokenizer /
    // embedding id-assignment step. Bounded top-200, so the id window
    // never sees more than 200 rows.
    "text_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(T(s, dir, "documents"), 200)
        .orderBy("term_id")),

    // Tokenizer-apply: every doc -> its vocab term-id sequence (unk=-1,
    // exercised here: maxVocab=20 < the corpus's 31 terms). Flattened to
    // (doc_id, pos, term_id) rows for the column-hash compare; the
    // operator itself returns one id-array row per doc.
    "text_encode" -> ((s, dir) =>
      TextAnalysis.encode(T(s, dir, "documents"), 20)
        .select(col("doc_id"), posexplode(col("token_ids")))
        .toDF("doc_id", "pos", "term_id")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term_id"))
        .orderBy("doc_id", "pos")),

    // encode → decode round trip: ids back to text through the same
    // vocab (OOV → <unk>) — proves the tokenizer plumbing lossless for
    // in-vocab text.
    "text_decode" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextAnalysis.decode(
        TextAnalysis.encode(docs, 20),
        TextAnalysis.vocabulary(docs, 20).select("term", "term_id"))
        .orderBy("doc_id")
    }),

    // BM25 top-20 lexical retrieval for a 3-term query — the RAG-corpus /
    // contamination-probe retrieval primitive. Per-document score is an
    // exact DECIMAL sum of 9-dp-rounded per-term weights (order-free).
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(T(s, dir, "documents"),
        Seq("spark", "join", "filter"), 20)),

    // Adjacent-pair PMI collocations (count >= 5, top 50) — the
    // multi-word-expression miner over corpus bigram/unigram counts.
    "text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiBigrams(T(s, dir, "documents"), 50)),

    // Dunning G² collocations: 2×2 contingency over bigram positions,
    // log-likelihood-ratio scored — rewards pairs both surprising AND
    // well-attested where PMI explodes on rare ones. Top-40, c_ab >= 5.
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.g2Collocations(T(s, dir, "documents"), 40)),

    // Pairwise Jensen–Shannon divergence between per-source unigram
    // distributions — "is source X redundant with Y" for mixture design;
    // bounded ≤ ln 2, symmetric, union-of-support exact.
    "text_jsd" -> ((s, dir) =>
      TextAnalysis.jsdBySource(T(s, dir, "documents"))
        .orderBy("source_a", "source_b")),

    // Hot-bigram boilerplate removal: grams in >= 8% of docs are dropped
    // position-wise and each doc is reassembled (CCNet-style cleanup).
    "text_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateRemove(T(s, dir, "documents"), 2, 0.08)
        .orderBy("doc_id")),

    // Quality-ordered token-budget selection: best docs by distinct-token
    // ratio until 10k subword tokens — the final "best N tokens" curation
    // cut, running on the two-level distributed prefix sum (no global
    // window).
    "text_select_budget" -> ((s, dir) =>
      TextAnalysis.selectByBudget(T(s, dir, "documents"), 10000L)
        .orderBy("doc_id")),

    // Within-doc repeated-span removal (trigram spans): tokens covered by
    // an n-gram already seen earlier in the SAME doc are dropped — the
    // crawl-stutter cleaner corpus-level dedup can't see.
    "text_dedup_spans" -> ((s, dir) =>
      TextAnalysis.dedupSpans(T(s, dir, "documents"), 3)
        .orderBy("doc_id")),

    // Per-doc trigram novelty vs the earlier corpus (first occurrence by
    // min doc_id): the "is this source exhausted?" curation curve.
    "text_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(T(s, dir, "documents"), 3)
        .orderBy("doc_id")),

    // Daily ingest-volume anomaly: per-type daily counts z-scored against
    // the type's own history, |z| > 2 flagged — the dead-feed/backfill
    // monitor, riding the outliers DECIMAL moment recipe.
    "dq_volume_anomaly" -> ((s, dir) =>
      operators.DataQuality.volumeAnomaly(T(s, dir, "events"))
        .orderBy("day", "event_type")),

    // Per-type freshness monitor: latest arrival, lag in hours behind the
    // freshest feed, stale flag past 24 h — catches the feed that STOPPED
    // (which the volume z-score cannot see: no daily row, no z).
    "dq_freshness" -> ((s, dir) =>
      operators.DataQuality.freshness(T(s, dir, "events"), 24L)
        .orderBy("group_key")),

    // Per-source quantile quality gate: each doc competes against its OWN
    // source's p25 of the distinct-token-ratio score, so low-register
    // sources aren't deleted wholesale by a global cutoff.
    // Rare-token (corpus-hapax) occurrence ratio per doc — the gibberish
    // / OCR-noise detector: vocabulary no other document corroborates.
    "text_rare_ratio" -> ((s, dir) =>
      TextAnalysis.rareTokenRatio(T(s, dir, "documents"), 1L, 0.5)
        .orderBy("doc_id")),

    "text_quality_gate" -> ((s, dir) =>
      TextAnalysis.qualityGate(T(s, dir, "documents"), 0.25)
        .orderBy("doc_id")),

    // Shannon token entropy per doc (nats) + max-normalized form — the
    // repetitive-sludge detector; Σ c·ln c rides a DECIMAL sum.
    "text_entropy" -> ((s, dir) =>
      TextAnalysis.entropy(T(s, dir, "documents")).orderBy("doc_id")),

    // Single-pass Pearson correlation matrix over lineitem numerics —
    // all moments in ONE wide aggregate, pairs exploded from the single
    // aggregate row.
    "q_corr" -> ((s, dir) =>
      operators.DataQuality.corrMatrix(T(s, dir, "lineitem"),
        Seq("l_discount", "l_extendedprice", "l_quantity"))
        .orderBy("col_a", "col_b")),

    // Join-key skew report on orders.o_custkey: top-10 hottest keys with
    // row share + table totals — the pre-join salting diagnostic.
    "dq_skew_report" -> ((s, dir) =>
      Skew.keyProfile(T(s, dir, "orders"), "o_custkey", 10)
        .orderBy("rank")),

    // Per-dimension z-score standardization of the embedding corpus
    // (flattened rows; DECIMAL two-pass moments per dim).
    "emb_standardize" -> ((s, dir) =>
      Similarity.standardize(T(s, dir, "embeddings"))
        .orderBy("vec_id", "dim")),

    // One Lloyd k-means step (k=4, first-k seeds): DECIMAL-exact
    // distances, argmin assignment, recomputed per-dim centroid means.
    "emb_kmeans_iter" -> ((s, dir) =>
      Similarity.kmeansIterate(T(s, dir, "embeddings"), 4)
        .orderBy("cluster_id", "dim")),

    // Centroid-based silhouette per vector (k=8 coarse clusters): a =
    // own-centroid distance, b = nearest other centroid, s=(b-a)/max —
    // the O(N*k) cluster-quality diagnostic.
    "emb_silhouette" -> ((s, dir) =>
      Similarity.silhouette(T(s, dir, "embeddings"), 8)
        .orderBy("vec_id")),

    // Supervised separability per LABEL: mean centroid margin + nearest-
    // centroid accuracy — names exactly which class collapses into which
    // (the silhouette question with classes given).
    "emb_label_margin" -> ((s, dir) =>
      Similarity.labelMargin(T(s, dir, "embeddings"))
        .orderBy("label")),

    // One spherical (cosine) k-means step (k=4, first-k seeds): argmax
    // cosine assignment, L2-normalized mean centroids — the text-
    // embedding variant beside the L2 Lloyd step.
    "emb_kmeans_cosine" -> ((s, dir) =>
      Similarity.kmeansCosineIterate(T(s, dir, "embeddings"), 4)
        .orderBy("cluster_id", "dim")),

    // Inertia (elbow) curve over k in {2,4,8}: total/mean
    // within-cluster squared distance per candidate k — the
    // choose-k-before-you-cluster pre-pass.
    "emb_inertia" -> ((s, dir) =>
      Similarity.inertiaCurve(T(s, dir, "embeddings"), Seq(2, 4, 8))
        .orderBy("k")),

    // External clustering quality: per-cluster majority ground-truth
    // label and purity over the k=8 nearest-seed assignment — "do the
    // geometric clusters recover the labels".
    "emb_cluster_purity" -> ((s, dir) =>
      Similarity.clusterPurity(T(s, dir, "embeddings"), 8)
        .orderBy("cluster_id")),

    // Linear CKA between the even-id vectors and their id+1 partners —
    // the "same representation?" score for encoder swaps, from three
    // covariance-Frobenius aggregates.
    "emb_cka" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val a = e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding").as("x"))
      val b = e.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("y"))
      Similarity.linearCka(a.join(b, "vec_id"), "x", "y")
    }),

    // Product-quantization codes (IVF-PQ's compression leg): 64 dims ->
    // 4 subspaces of 16, each assigned to its nearest of 4 deterministic
    // sub-centroids; a vector serves ANN from 4 small ints.
    "emb_pq" -> ((s, dir) =>
      Similarity.productQuantize(T(s, dir, "embeddings"), 16, 4)
        .orderBy("vec_id", "subspace")),

    // ADC serving over the PQ codes: queries (vec_id < 8) ranked by the
    // sum of per-subspace code distances — the corpus is scanned as
    // 4 ints/vector, never as vectors.
    "ann_adc_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.annAdcTopK(emb, emb.filter(col("vec_id") < 8), 5, 16, 4)
        .orderBy("query_id", "rank")
    }),

    // Per-cluster distance-percentile outlier gate: vectors in their own
    // cluster's top-decile distance tail — the embedding-space quality
    // filter (mislabeled / out-of-domain suspects).
    "emb_outlier" -> ((s, dir) =>
      Similarity.embeddingOutliers(T(s, dir, "embeddings"), 8, 0.9)
        .orderBy("vec_id")),

    // Exact 64x64 covariance matrix of the embedding space (PCA/whitening
    // input): row-local outer products -> d^2-key aggregate with map-side
    // combine; no self-join, no N-proportional shuffle.
    "emb_covariance" -> ((s, dir) =>
      embCov(s, dir).orderBy("i", "j")),

    // Effective rank trace(C)²/‖C‖²_F — "how many dimensions are in
    // use", no eigendecomposition (anisotropy-collapse alarm).
    "emb_effective_rank" -> ((s, dir) =>
      Similarity.effectiveRank(T(s, dir, "embeddings"),
        precomputedCov = Some(embCov(s, dir)))),

    // TwoNN intrinsic dimension: d̂ = n / Σ ln(r₂/r₁) over each vector's
    // two nearest neighbors — exact N² baseline (ann_knn_graph
    // discipline: NOT in the scale gate; ANN candidates swap in at 100 TB).
    "emb_intrinsic_dim" -> ((s, dir) => twoNNExact(s, dir)),

    // The registered 100 TB swap for emb_intrinsic_dim: the IDENTICAL
    // rank→μ→MLE tail fed from SRP bucket-mate candidates (linear in the
    // candidate list) instead of the N² all-pairs join. This, not the
    // brute baseline, is the form in the scale gate. srpAutoPlanes
    // planes (4 at the 500-vector fixture scale) × 8 tables: TwoNN only
    // needs each point's 2-NN, so this point spends
    // ~¼ of the all-pairs dot products for a d̂ within a few percent of
    // exact (the agree row below measures it).
    "emb_intrinsic_dim_ann" -> ((s, dir) => twoNNAnn(s, dir)),

    // Estimator agreement: d̂ from the exact baseline and from the ANN
    // candidate feed side by side (|Δ| on the two 6-dp estimates) — the
    // measured claim that the scale path estimates the same quantity.
    "emb_intrinsic_dim_agree" -> ((s, dir) => {
      val ex = twoNNExact(s, dir)
        .select(col("n_points").as("n_exact"), col("id_twonn").as("d_exact"))
      val an = twoNNAnn(s, dir)
        .select(col("n_points").as("n_ann"), col("id_twonn").as("d_ann"))
      // two single-row aggregates — the broadcast-scalar crossJoin shape
      ex.crossJoin(an)
        .select(col("n_exact"), col("n_ann"), col("d_exact"), col("d_ann"),
          round(abs(col("d_ann") - col("d_exact")), 6).as("abs_diff"))
    }),

    // JL distortion audit of the ±1 signed projection: projected vs
    // original squared distance (÷ outDims) over the id-adjacent pair
    // chain — all-integer distances, mean ≈ 1 is the JL promise.
    "emb_jl_distortion" -> ((s, dir) =>
      Similarity.jlDistortion(T(s, dir, "embeddings"), dim = 64, outDims = 8)),

    // Greedy k-center (farthest-point) seeding, k = 4: deterministic
    // spread-out kmeans++ stand-in; per round one broadcast seed join +
    // scalar max, 9-dp-quantized argmax ties to lowest id.
    "emb_kcenter" -> ((s, dir) =>
      Similarity.kCenterSeeds(T(s, dir, "embeddings"), 4).orderBy("round")),

    // λ₁/λ₂ by Hotelling deflation: one-dominant-direction vs
    // no-preferred-axis, the top of the spectrum effectiveRank averages.
    "emb_eigengap" -> ((s, dir) =>
      Similarity.eigenGap(T(s, dir, "embeddings"),
        precomputedCov = Some(embCov(s, dir)))),

    // 1-bit (sign) binary quantization retrieval quality: Hamming top-10
    // vs the exact cosine ranking — the 64×-compression recall question.
    // Codes split into two 32-bit halves (bit 63 via single-long shifts
    // overflows DuckDB's checked `<<`).
    "emb_binary_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val codes = Similarity.binaryCodes(emb)
      val q = codes.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("lo").as("qlo"),
          col("hi").as("qhi"))
      val scored = codes
        .select(col("vec_id").as("neighbor_id"), col("lo").as("clo"),
          col("hi").as("chi"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (expr("bit_count(qlo ^ clo)") + expr("bit_count(qhi ^ chi)"))
            .as("ham"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("ham").asc, col("neighbor_id").asc)
      val approx = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      Similarity.recallAtK(approx,
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), 10))
    }),

    // Matryoshka truncation quality: recall@10 of prefix-dim cosine
    // retrieval against the full-dim exact ranking (MRL deployment
    // question: how many dims can the index drop?).
    "emb_matryoshka" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, q, 10)
      def trunc(df: org.apache.spark.sql.DataFrame, p: Int) =
        df.select(col("vec_id"),
          slice(col("embedding"), 1, p).as("embedding"))
      Seq(32, 16, 8).map { p =>
        Similarity.recallAtK(
            Similarity.bruteForceTopK(trunc(emb, p), trunc(q, p), 10),
            exact)
          .select(lit(p.toLong).as("prefix_dim"), col("n_queries"),
            col("mean_recall"))
      }.reduce(_ unionByName _).orderBy("prefix_dim")
    }),

    // Leading principal direction via 3 power iterations on the
    // covariance matrix (9-dp-quantized trajectory, unrolled CTE oracle).
    "emb_pca_power" -> ((s, dir) =>
      Similarity.pcaPowerIteration(T(s, dir, "embeddings"), 3,
          cov = Some(embCov(s, dir)))
        .orderBy("i")),

    // PageRank (3 power iterations, d=0.85) over the event-type
    // transition graph — DECIMAL in-sums + dangling mass each round, the
    // oracle unrolls the identical iterations CTE by CTE.
    "ana_pagerank" -> ((s, dir) => {
      val edges = eventTransitions(s, dir)
        .filter(col("from_type") =!= col("to_type"))
        .select(col("from_type").as("src"), col("to_type").as("dst"))
      operators.Graph.pageRank(edges, 3).orderBy("node")
    }),

    // Personalized PageRank: teleportation restricted to {click, view} —
    // relevance-to-the-seed-set scoring over the same transition graph.
    "ana_pagerank_pers" -> ((s, dir) => {
      import s.implicits._
      val edges = eventTransitions(s, dir)
        .filter(col("from_type") =!= col("to_type"))
        .select(col("from_type").as("src"), col("to_type").as("dst"))
      val seeds = Seq("click", "view").toDF("node")
      operators.Graph.pageRankPersonalized(edges, seeds, 3).orderBy("node")
    }),

    // Per-node triangle counts over the part co-purchase graph (parts
    // sharing >= 2 orders) — degree-oriented O(m^1.5) wedge closure; the
    // oracle's naive a<b<c closure proves orientation-free semantics.
    "graph_triangles" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.triangleCounts(edges).orderBy("node")
    }),

    // Log2-bucketed degree distribution of the same co-purchase graph —
    // the power-law-or-not diagnostic run before heavier graph passes;
    // <=64 histogram rows regardless of graph size.
    "graph_degree_hist" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.degreeHistogram(edges).orderBy("bucket")
    }),

    // Truncated BFS (3 hops) from the 5 smallest-id nodes of the
    // co-purchase graph — frontier-only propagation per round; the
    // bounded-radius reachability pass.
    "graph_bfs_hops" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.orderBy("node").limit(5)
      operators.Graph.bfsHops(edges, seeds, 3).orderBy("node")
    }),

    // Truncated closeness + harmonic centrality for the 3 lowest-id
    // landmark seeds of the co-purchase graph — per-seed BFS to depth 3
    // with the seed carried in the frontier state.
    "graph_closeness" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.orderBy("node").limit(3)
      operators.Graph.closenessCard(edges, seeds, 3).orderBy("node")
    }),

    // Degree assortativity of the co-purchase graph — the one-scalar
    // rich-club-or-hub-spoke diagnostic behind partitioning choices.
    "graph_assortativity" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.assortativity(edges)
    }),

    // Adamic–Adar link prediction over the co-purchase graph: NON-adjacent
    // part pairs ranked by hub-discounted common-neighbor mass (wedge-join
    // bounded; score >= 1.0 prunes the tail).
    "graph_adamic_adar" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.adamicAdar(edges, 1.0).orderBy("x", "y")
    }),

    // Rich-club coefficient ladder (k=2,4,8) — do the hubs
    // preferentially interconnect (the degree-join hotspot diagnostic
    // beside graph_powerlaw's tail exponent).
    "graph_rich_club" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.richClub(edges).orderBy("k")
    }),

    // Power-law tail MLE of the co-purchase degree distribution
    // (Clauset-Shalizi-Newman α at xmin=5) — the hub-skew scalar that
    // decides whether degree-keyed joins need salting.
    "graph_powerlaw" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.powerlawTail(edges, 5L)
    }),

    // Truncated 3-core (3 pruning rounds) of the co-purchase graph —
    // densest-region extraction; threshold-only pruning, no tie-breaks.
    "graph_kcore" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.kCore(edges, 3, 3).orderBy("node")
    }),

    // Common-neighbor Jaccard ≥ 0.25 over the co-purchase graph — the
    // item-item collaborative-filtering similarity (wedge-join bounded,
    // never |V|²).
    "graph_node_jaccard" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.nodeJaccard(edges, 0.25).orderBy("x", "y")
    }),

    // Two synchronous majority-vote LPA rounds over the co-purchase
    // graph, seeded with label = node % 3, ties -> smallest label.
    "graph_label_prop" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val init = nodes.select(col("node"), (col("node") % 3).as("label"))
      operators.Graph.labelPropagate(edges, init, 2).orderBy("node")
    }),

    // Newman modularity of the 2-round LPA partition, per community —
    // "did the propagation find structure" (Q = sum of q_contrib).
    "graph_modularity" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val init = nodes.select(col("node"), (col("node") % 3).as("label"))
      val labels = operators.Graph.labelPropagate(edges, init, 2)
      operators.Graph.modularity(edges, labels).orderBy("label")
    }),

    // Conductance of the same 2-round LPA communities — the boundary-
    // leakiness complement to graph_modularity's density contrast
    // (cut over min volume, the Cheeger quantity).
    "graph_conductance" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val init = nodes.select(col("node"), (col("node") % 3).as("label"))
      val labels = operators.Graph.labelPropagate(edges, init, 2)
      operators.Graph.conductance(edges, labels).orderBy("label")
    }),

    // k_nn(k) degree–neighbor-degree curve: the hub-and-spoke profile
    // the assortativity scalar can hide.
    "graph_knn_degree" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.avgNeighborDegree(edges).orderBy("deg")
    }),

    // Weak ties of the co-purchase graph: edges closing no triangle.
    "graph_local_bridges" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.localBridges(edges).orderBy("src", "dst")
    }),

    // Spectral bisection: deflated power iteration on c·I − L, sign
    // split + algebraic connectivity — "how would I shard this graph".
    "graph_fiedler" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.fiedlerBisection(edges, 5)
    }),

    // Katz centrality over the DIRECTED part co-purchase graph (low id →
    // high id, parts sharing >= 2 orders): 3 unrolled rounds of
    // x' = 1 + 0.05·Aᵀx — walk-counting endorsement centrality, no
    // out-degree split (contrast ana_pagerank).
    "graph_katz" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.katzCentrality(edges, 3, 0.05).orderBy("node")
    }),

    // Link-prediction score panel (common neighbors / resource
    // allocation / preferential attachment) for non-adjacent part pairs
    // with >= 2 shared wedge apexes — one wedge enumeration, three
    // scores; adamic_adar's sibling with the 1/deg weight.
    "graph_link_pred" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.linkPredictionScores(edges, 2).orderBy("x", "y")
    }),

    // Deterministic DeepWalk corpus: 2 hash-driven walks x 3 steps per
    // node over sorted-neighbor indices.
    "graph_walks" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.deterministicWalks(edges)
        .orderBy("start_node", "walk", "step")
    }),

    // HITS hubs/authorities (2 L1-normalized iterations) over the same
    // directed event-type transition graph as ana_pagerank — hub =
    // "links to important types", authority = "linked from good hubs";
    // the oracle unrolls the four half-steps CTE by CTE.
    "graph_hits" -> ((s, dir) => {
      val edges = eventTransitions(s, dir)
        .filter(col("from_type") =!= col("to_type"))
        .select(col("from_type").as("src"), col("to_type").as("dst"))
      operators.Graph.hits(edges, 2).orderBy("node")
    }),

    // Reciprocity of the directed transition graph: the share of edges
    // whose reverse also occurs — near 1 the graph is effectively
    // undirected and the direction-aware scores lose meaning.
    "graph_reciprocity" -> ((s, dir) => {
      val edges = eventTransitions(s, dir)
        .filter(col("from_type") =!= col("to_type"))
        .select(col("from_type").as("src"), col("to_type").as("dst"))
      operators.Graph.reciprocity(edges)
    }),

    // Local clustering coefficients over the same co-purchase graph —
    // every node emits (triangle-free 0, degree-1 NULL).
    "graph_clustering" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.clusteringCoefficients(edges).orderBy("node")
    }),

    // Connected components via alternating large-star/small-star
    // contraction (Kiveris et al. 2014) on the co-purchase graph —
    // O(log² n) rounds regardless of diameter (vs label-prop's
    // O(diameter)), the bounded-job-count CC for unknown similarity
    // graphs. Oracle: exact transitive-closure min per node. strict=true:
    // oracle parity assumes EXACT components, so a no-fixed-point-within-
    // maxRounds run must fail loudly here, not return under-merged labels
    // with only a stderr note (the lenient default stays for exploratory
    // callers).
    "graph_cc_stars" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      operators.Graph.connectedComponentsStars(edges, strict = true)
        .orderBy("node")
    }),

    // Inverted postings index: term -> df + sorted doc-id list (the
    // search-index build; df-capped against stopword skew — uncapped here,
    // the corpus vocabulary is tiny). The public operator returns the
    // ARRAY posting list; the registered query canonicalizes it to a
    // comma-joined string because the harness's pandas comparator cannot
    // hash array cells (same convention as ana_session_sequences).
    "text_postings" -> ((s, dir) =>
      TextAnalysis.postingsIndex(T(s, dir, "documents"))
        .withColumn("postings",
          array_join(transform(col("postings"), _.cast("string")), ","))
        .orderBy("term")),

    // df-capped postings variant: terms with df > 40 (stopword-like in
    // this corpus) are dropped entirely — the index-skew guard exercised.
    "text_postings_capped" -> ((s, dir) =>
      TextAnalysis.postingsIndex(T(s, dir, "documents"), maxDf = 40L)
        .withColumn("postings",
          array_join(transform(col("postings"), _.cast("string")), ","))
        .orderBy("term")),

    // Tokenizer fertility per language: subwords-per-word +
    // chars-per-subword — the cross-lingual tokenizer-cost metric.
    "text_fertility" -> ((s, dir) =>
      TextAnalysis.fertility(T(s, dir, "documents")).orderBy("lang")),

    // Bigram argmax LM: every term's most likely successor + P(next|term) —
    // the template-detection / perplexity-floor baseline.
    "text_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramModel(T(s, dir, "documents")).orderBy("term")),

    // Zipf slope over the top-200 vocabulary (log-freq vs log-rank
    // least squares; ~-1 = natural text) — one row.
    "text_zipf_slope" -> ((s, dir) =>
      TextAnalysis.zipfSlope(T(s, dir, "documents"), 200)),

    // C4-style line-level boilerplate dedup: lines (3-token windows here —
    // the corpus has no newlines; the operator takes any pre-split lines
    // frame) occurring in > 3 distinct docs are dropped from every doc.
    "text_dedup_lines" -> ((s, dir) => {
      val toks = T(s, dir, "documents")
        .select(col("doc_id"), posexplode(graft.functions.Fns.tokens(col("text"))))
      val lines = toks
        .groupBy(col("doc_id"), floor(col("pos") / lit(3)).cast("long").as("line_no"))
        .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("col")))),
          t => t.getField("col")), " ").as("line"))
      TextAnalysis.dedupLines(lines, maxDocs = 3).orderBy("doc_id")
    }),

    // Language-ID with top1−top2 confidence margin and top1 share — the
    // "confidently-English only" corpus filter signals.
    "text_langid_margin" -> ((s, dir) =>
      TextAnalysis.langIdMargin(T(s, dir, "documents")).orderBy("doc_id")),

    // Corpus-wide token-length histogram (bounded domain — one
    // register-sized shuffle regardless of corpus size).
    "text_wordlen_hist" -> ((s, dir) =>
      TextAnalysis.wordLengthHistogram(T(s, dir, "documents"))
        .orderBy("token_len")),

    // Hapax-legomenon ratio per source — vocabulary richness / OCR-noise
    // profile (share of the source's distinct terms occurring once).
    "text_hapax" -> ((s, dir) =>
      TextAnalysis.hapaxProfile(T(s, dir, "documents")).orderBy("source")),

    // Yule's K per source: 10⁴·(Σf² − N)/N² — the length-invariant
    // repetitiveness constant (corpus-level cousin of text_repetition).
    "text_yule_k" -> ((s, dir) =>
      TextAnalysis.yuleK(T(s, dir, "documents")).orderBy("source")),

    // Church–Gale term burstiness: Fano factor (variance/mean of the
    // per-doc count, absences as zeros) for the top-200 corpus terms —
    // content words clump, function words are ~Poisson.
    "text_burstiness" -> ((s, dir) =>
      TextAnalysis.termBurstiness(T(s, dir, "documents"), 200)
        .orderBy("term")),

    // Mean segmental TTR per source (8-token full segments): the
    // document-length-invariant lexical-diversity scale that raw TTR
    // (text_source_profile's mean_distinct_ratio) is not.
    "text_msttr" -> ((s, dir) =>
      TextAnalysis.msttr(T(s, dir, "documents"), segLen = 8)
        .orderBy("source")),

    // Conditional character-bigram entropy H(c2|c1) per source — the
    // sub-token gibberish detector (base64/OCR sludge approaches the
    // unconditional alphabet entropy; natural text sits well below).
    "text_char_bigram_entropy" -> ((s, dir) =>
      TextAnalysis.charBigramEntropy(T(s, dir, "documents"))
        .orderBy("source")),

    // Per-source character-class fractions (letters/digits/whitespace/
    // other) — the pre-tokenization script/garbage gate. Narrow regex
    // counts into one source-keyed aggregate.
    "text_script_hist" -> ((s, dir) =>
      TextAnalysis.charClassProfile(T(s, dir, "documents"))
        .orderBy("source")),

    // Per-source Simpson lexical diversity (repeat-rate complement) —
    // exact integer moments, flags template-heavy sources.
    "text_simpson" -> ((s, dir) =>
      TextAnalysis.simpsonDiversity(T(s, dir, "documents"))
        .orderBy("source")),

    // Heaps'-law vocabulary-growth exponent over 10 doc-id prefixes —
    // "does more crawling still buy new vocabulary?" — one row.
    "text_heaps_law" -> ((s, dir) =>
      TextAnalysis.heapsLaw(T(s, dir, "documents"), 10)),

    // Curriculum interleave ranks: per-source quality rank (distinct-token
    // ratio desc); consuming ordered by (rank_in_source, source) is the
    // source-balanced curriculum. Window is partitioned by source.
    "sample_curriculum" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("source"),
        coalesce(try_divide(
          size(array_distinct(Fns.tokens(col("text")))).cast("double"),
          size(Fns.tokens(col("text")))), lit(0.0)).as("score"))
      Sampling.curriculumOrder(scored, "source", "score", "doc_id")
        .select(col("doc_id"), col("source"), round(col("score"), 6).as("score"),
          col("rank_in_source"))
        .orderBy("rank_in_source", "source", "doc_id")
    }),

    // Skip-gram pairs (±2 window, top 100) — word2vec-style training-pair
    // extraction via an exact (doc, position+offset) equi-join.
    "text_skipgrams" -> ((s, dir) =>
      TextAnalysis.skipgramCounts(T(s, dir, "documents"), 2, 100)),

    // Unigram-LM perplexity per doc (CCNet-style corpus-surprise filter);
    // DECIMAL-summed per-term log-probs.
    "text_perplexity" -> ((s, dir) =>
      TextAnalysis.perplexity(T(s, dir, "documents")).orderBy("doc_id")),

    // Interpolated bigram-LM perplexity (Jelinek–Mercer λ=0.75, unigram
    // back-off) — catches shuffled/disfluent text the unigram filter
    // scores as normal; docs with <2 tokens have no bigram events.
    "text_perplexity_bigram" -> ((s, dir) =>
      TextAnalysis.perplexityBigram(T(s, dir, "documents")).orderBy("doc_id")),

    // Length-quantile bucketing for padding-efficient batching — exact
    // broadcast quartile boundaries, flat scoring, no ntile window.
    "text_length_buckets" -> ((s, dir) =>
      TextAnalysis.lengthBuckets(T(s, dir, "documents")).orderBy("doc_id")),

    // Per-session ordered event-type sequences (sequence-model training
    // export) — session_window groups, array_sort-restored order.
    "ana_session_sequences" -> ((s, dir) =>
      Analytics.sessionSequences(T(s, dir, "events"), "30 minutes")
        .orderBy("user_id", "session_start")),

    // Funnel discovery: the 10 most common exact session paths with
    // session counts and mean length — sequence-keyed count + top-k heap.
    "ana_top_paths" -> ((s, dir) =>
      Analytics.topPaths(T(s, dir, "events"), "30 minutes", 10)
        .orderBy(col("n_sessions").desc, col("sequence").asc)),

    // Per-user session behavioural entropy (mean/max over sessions) —
    // behavioural-diversity feature and bot signal (scripted sessions
    // cluster at H = 0); ln n - (sum c ln c)/n, no p division.
    "ana_session_entropy" -> ((s, dir) =>
      Analytics.sessionEntropy(T(s, dir, "events"))
        .orderBy("user_id")),

    // UNPIVOT/melt: wide metrics to (key, metric, value) rows — the
    // relational dual of pivot (which is covered elsewhere).
    "q_unpivot" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount")), "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")),

    // CMS join-size estimate vs the exact join count — the sketch-only
    // cardinality estimator (upper bound; min over depth rows). Both
    // numbers in one row so the driver compare pins est AND exact.
    "sketch_join_size" -> ((s, dir) => {
      val o = T(s, dir, "orders").select(col("o_custkey").cast("string").as("k"))
      val c = T(s, dir, "customer").select(col("c_custkey").cast("string").as("k"))
      val est = Sketch.cmsJoinSizeEstimate(o, "k", c, "k", 3, 1024)
      val exact = T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("join_size_exact"))
      est.crossJoin(exact)
    }),

    // SCD2 point-in-time lookup: each sampled fact event joined to the
    // dimension VERSION valid at its timestamp (valid_from inclusive,
    // valid_to exclusive) — the canonical versioned-dimension read.
    "q_scd2_lookup" -> ((s, dir) => {
      val events = T(s, dir, "events")
      val hist = Merge.scdType2(events, Seq("user_id"), "ts", "event_id", "event_type")
      val facts = events.filter(col("event_id") % 10 === 0)
        .select(col("event_id"), col("user_id"), col("ts").as("fact_ts"))
      facts.join(hist, Seq("user_id"))
        .filter(col("fact_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("fact_ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("fact_ts"),
          col("state"), col("version"))
        .orderBy("event_id")
    }),

    // Snapshot profile drift: per-column null/distinct/mean deltas
    // between the pre-1997 orders snapshot and the full table — the
    // schema-silent input-shift check.
    "dq_profile_drift" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      operators.DataQuality.profileDrift(
        orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        orders, Seq("o_custkey", "o_totalprice"))
        .orderBy("col_name")
    }),

    // Pairwise categorical association (chi-square + Cramér's V) over
    // lineitem's three low-cardinality columns — empty contingency cells
    // folded via the chi² = n + Σ((o−e)²/e − e) identity, no cell spine.
    "dq_association" -> ((s, dir) =>
      operators.DataQuality.association(T(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus", "l_linenumber"))
        .orderBy("col_a", "col_b")),

    // Benford first-digit audit of order totals: observed vs log10(1+1/d)
    // shares + chi-square, first digit via exact integer-cents strings
    // (never float formatting / log10).
    "dq_benford" -> ((s, dir) =>
      operators.DataQuality.benford(T(s, dir, "orders"), "o_totalprice", 2)
        .orderBy("digit")),

    // Population Stability Index of the value distribution, click
    // (reference) vs error (current) events, 10 reference-anchored
    // equal-width bins — the binned-drift scalar profileDrift's
    // mean/null deltas can't see.
    "dq_psi" -> ((s, dir) => {
      val e = T(s, dir, "events")
      operators.DataQuality.psiDrift(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "error"), "value", 10)
        .orderBy("bin")
    }),

    // Two-sample Kolmogorov–Smirnov drift test, click (ref) vs error
    // (cur) event values — the every-quantile drift statistic PSI's 10
    // fixed bins can't resolve; exact-integer ECDFs via the two-level
    // bucketed prefix sum (no global window over the value spine).
    "dq_ks_test" -> ((s, dir) => {
      val e = T(s, dir, "events")
      operators.DataQuality.ksTest(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "error"), "value")
    }),

    // Mann–Whitney AUC of `value` as a score predicting error events —
    // the threshold-free classifier eval; BIGINT-exact concordant-pair
    // numerator, one rounded division.
    "dq_auc" -> ((s, dir) =>
      operators.DataQuality.aucScore(
        T(s, dir, "events").filter(col("event_type").isin("click", "error")),
        "value", col("event_type") === "error")),

    // Reliability bins: 10 equal-width score buckets with empirical
    // positive rate — whether a quality score reads as a probability.
    "dq_calibration" -> ((s, dir) =>
      operators.DataQuality.calibrationBins(
        T(s, dir, "events").filter(col("event_type").isin("click", "error")),
        "value", col("event_type") === "error", 10)
        .orderBy("bin")),

    // Mutual information (nats) + normalized MI between source and lang
    // on the documents corpus — the dataset-card dependence measure chi²
    // (dq_association) can't read as shared-information.
    "dq_mutual_info" -> ((s, dir) =>
      operators.DataQuality.mutualInfo(T(s, dir, "documents"),
        "source", "lang")),

    // Deequ-style declarative constraint suite over events: every rule is
    // one conditional sum inside a SINGLE partial aggregate (one scan, one
    // scalar row, rules unfold from an inline array; NULL predicate =
    // violation — three-valued logic closed).
    "dq_constraints" -> ((s, dir) =>
      operators.DataQuality.constraintSuite(T(s, dir, "events"), Seq(
        "value_non_negative" -> (col("value") >= 0),
        "event_type_known" -> col("event_type").isin(
          "click", "view", "purchase", "signup", "error"),
        "user_id_present" -> col("user_id").isNotNull,
        "ts_in_range" -> (col("ts") >= lit("2023-01-01") &&
          col("ts") < lit("2027-01-01")),
        "props_parseable" -> col("props").isNotNull))
        .orderBy("rule_idx")),

    // Primary-key uniqueness audit over every table's declared key
    // (incl. lineitem's composite) — the Deequ check whose silent
    // failure fans out every downstream join.
    "dq_pk_uniqueness" -> ((s, dir) =>
      operators.DataQuality.pkUniqueness(Seq(
        ("customer", T(s, dir, "customer"), Seq("c_custkey")),
        ("orders", T(s, dir, "orders"), Seq("o_orderkey")),
        ("part", T(s, dir, "part"), Seq("p_partkey")),
        ("lineitem", T(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber")),
        ("documents", T(s, dir, "documents"), Seq("doc_id")),
        ("events", T(s, dir, "events"), Seq("event_id"))))
        .orderBy("table_name")),

    // Sequence-order audit: does ts increase along event_id order per
    // user — the clock-skew detector run before trusting windows,
    // sessionization, or as-of joins.
    "dq_sequence" -> ((s, dir) =>
      operators.DataQuality.sequenceAudit(
        T(s, dir, "events"), "user_id", "event_id", "ts")),

    // Chi-squared goodness-of-fit of the event-type mix against
    // uniform, with the single worst-deviating category — the
    // categorical drift test beside KS (continuous) and PSI (binned).
    "dq_chi2" -> ((s, dir) =>
      operators.DataQuality.chiSquaredUniform(
        T(s, dir, "events"), "event_type")),

    // Calendar completeness per event type: days with data vs the
    // first→last span, longest total-outage run — the silent-feed-gap
    // detector volume z-scoring can't see.
    "dq_calendar" -> ((s, dir) =>
      operators.DataQuality.calendarAudit(
        T(s, dir, "events"), "event_type", "ts")
        .orderBy("event_type")),

    // Functional-dependency discovery over four orders columns (12
    // ordered pairs in ONE multi-distinct aggregate): o_orderkey -> *
    // comes out as the PK's exact FDs, the rest grade as near-FD
    // strengths — the undocumented-schema-structure profiler.
    "dq_func_deps" -> ((s, dir) =>
      operators.DataQuality.functionalDeps(T(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("lhs", "rhs")),

    // Referential-integrity audit of the star schema: orphan scans for
    // lineitem→orders, orders→customer, lineitem→part (left-anti per
    // relation; Catalyst broadcasts dim-sized parents).
    "dq_referential" -> ((s, dir) =>
      operators.DataQuality.referentialIntegrity(Seq(
        ("lineitem_orders", T(s, dir, "lineitem"), "l_orderkey",
          T(s, dir, "orders"), "o_orderkey"),
        ("orders_customer", T(s, dir, "orders"), "o_custkey",
          T(s, dir, "customer"), "c_custkey"),
        ("lineitem_part", T(s, dir, "lineitem"), "l_partkey",
          T(s, dir, "part"), "p_partkey")))
        .orderBy("relation")),

    // Two full-batch logistic-regression GD steps over the embedding
    // features (label = class < 5) from w = 0 — the quality-classifier
    // training shape: per-step one N-key margin sum + one d-key gradient
    // sum, model state broadcast throughout.
    "ml_logreg" -> ((s, dir) =>
      operators.ML.logregSteps(T(s, dir, "embeddings"), col("label") < 5,
        steps = 2, lr = 0.5).orderBy("dim")),

    // Closed-form ridge (λ=1) of extendedprice on quantity+discount via
    // normal equations: one scan, nine DECIMAL sums, Cramer solve as
    // column expressions over the single aggregate row.
    "ml_ridge" -> ((s, dir) =>
      operators.ML.ridgeNormal(T(s, dir, "lineitem"), col("l_quantity"),
        col("l_discount"), col("l_extendedprice"), lambda = 1.0)),

    // One spherical GMM E-step (k=4 lowest-id seeds, corpus-mean
    // bandwidth): max-subtracted softmax responsibilities — the soft
    // membership table a mixture M-step or soft-dedup weighting eats.
    "ml_gmm_estep" -> ((s, dir) =>
      operators.ML.gmmEStep(T(s, dir, "embeddings"), 4)
        .orderBy("cid")),

    // Precision/recall/F1 operating-point table over a threshold ladder
    // (score = value, label = error events) — one aggregate, all cuts.
    "ml_pr_curve" -> ((s, dir) =>
      operators.ML.prCurve(T(s, dir, "events"), col("value"),
        col("event_type") === "error",
        Seq(1.0, 2.0, 5.0, 10.0, 20.0, 50.0))
        .orderBy("threshold")),

    // Cumulative gains/lift by score-quantile decile over the same
    // click-vs-error frame as dq_auc — "how much better than random is
    // the top k/10 of the ranking"; ties share a bin (no ntile).
    "ml_lift" -> ((s, dir) =>
      operators.ML.liftDeciles(
        T(s, dir, "events").filter(col("event_type").isin("click", "error")),
        "value", col("event_type") === "error")
        .orderBy("decile")),

    // Best single Gini split of the same score/label frame — "is there
    // one cutoff worth filtering at"; all decile candidates in one
    // aggregate, winner by TakeOrdered on (gain, threshold).
    "ml_stump" -> ((s, dir) =>
      operators.ML.decisionStump(
        T(s, dir, "events").filter(col("event_type").isin("click", "error")),
        "value", col("event_type") === "error")),

    // Multinomial NB language classifier trained + self-evaluated over
    // the corpus in one lazy plan: per-lang recall rows (model-card
    // sanity, not a generalization claim).
    "ml_nb_accuracy" -> ((s, dir) =>
      operators.ML.naiveBayesEvalFromPredictions(nbPred(s, dir))
        .orderBy("label")),

    // Confusion matrix of the same NB language classifier — sparse
    // (label, pred, n, row_share) cells: WHERE the misclassifications
    // go, which the aggregate recall hides.
    "ml_confusion" -> ((s, dir) =>
      operators.ML.confusionMatrix(nbPred(s, dir))
        .orderBy("label", "pred")),

    // Per-class precision/recall/F1 report over the same predictions —
    // the sklearn classification_report as a distributed aggregate.
    "ml_class_report" -> ((s, dir) =>
      operators.ML.classReport(nbPred(s, dir))
        .orderBy("label")),

    // Chance-corrected agreement over the same predictions: accuracy,
    // Cohen's kappa, multiclass MCC (Gorodkin R_K) — one scalar row,
    // marginal products on DECIMAL(38,0) so 100 TB counts never wrap.
    "ml_mcc_kappa" -> ((s, dir) =>
      operators.ML.mccKappa(nbPred(s, dir))),

    // Learning curve: NB generalization accuracy on the FIXED held-out
    // decile (doc_id % 10 == 9) as the training pool grows 25% → 50% →
    // 100% — "is more data still buying accuracy", the
    // collect-more-vs-model-work decision card.
    "ml_learning_curve" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val test = d.filter(Fns.pmod(col("doc_id"), lit(10L)) === 9)
      val pool = d.filter(Fns.pmod(col("doc_id"), lit(10L)) =!= 9)
      def acc(frac: Double, train: org.apache.spark.sql.DataFrame) = {
        val pred = operators.ML.naiveBayesPredict(train, test, "lang")
        val nTrain = train.agg(count(lit(1)).as("n_train"))
        pred.agg(count(lit(1)).as("n_test"),
            sum(when(col("pred") === col("y"), 1L).otherwise(0L))
              .as("n_correct"))
          .crossJoin(broadcast(nTrain))
          .select(lit(frac).as("train_frac"), col("n_train"),
            col("n_test"), col("n_correct"),
            Fns.q6(try_divide(col("n_correct").cast("double"),
              col("n_test").cast("double"))).as("accuracy"))
      }
      acc(0.25, pool.filter(Fns.pmod(col("doc_id"), lit(4L)) === 0))
        .unionByName(acc(0.5, pool.filter(Fns.pmod(col("doc_id"), lit(2L)) === 0)))
        .unionByName(acc(1.0, pool))
        .orderBy("train_frac")
    }),

    // Leave-one-out 5-NN accuracy on the embeddings (1-in-10 query
    // sample — the eval-sample convention keeping pairs at N²/10):
    // per-label accuracy of cosine-majority voting.
    "ml_knn_accuracy" -> ((s, dir) =>
      operators.ML.knnAccuracy(T(s, dir, "embeddings"), 5, 10)
        .orderBy("label")),

    // Centroid drift between the even and odd vec_id cohorts: cosine +
    // L2 between per-dim mean vectors — the cheap embedding-distribution
    // monitor (two d-key aggregates, one d-row join).
    "emb_drift" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      operators.Similarity.centroidDrift(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1))
    }),

    // Watermark late-data cost report: replay under a pseudo-shuffled
    // arrival order (Knuth-hash of event_id — bijective mod 2^31, so
    // the replay is deterministic and tie-free) and count what a
    // ONE-WEEK watermark would drop: events from the corpus' last week
    // survive, older ones are the quantified loss.
    "stream_late_events" -> ((s, dir) =>
      StreamingJobs.lateEvents(
        T(s, dir, "events").withColumn("arr",
          Fns.pmod(Fns.pmod(col("event_id"), lit(2147483648L)) *
            lit(2654435761L), lit(2147483648L))),
        delaySeconds = 604800L)
        .orderBy("event_type")),

    // HLL set algebra between two event-id cohorts with KNOWN overlap
    // (last digit < 6 vs >= 4: |A|=|B|=0.6N, |A∩B|=0.2N, Jaccard 0.2):
    // union by register-max merge, intersection by inclusion–exclusion
    // — set overlap answered without materializing either key set, and
    // the known ground truth prices the sketch error on sight
    // (inclusion–exclusion amplifies the per-sketch ±3% — that
    // amplification is exactly what the card should show).
    "sketch_hll_setops" -> ((s, dir) => {
      val e = T(s, dir, "events")
      Sketch.hllSetOps(
        e.filter(Fns.pmod(col("event_id"), lit(10L)) < 6),
        e.filter(Fns.pmod(col("event_id"), lit(10L)) >= 4), "event_id", 10)
    }),

    // Bloom sizing card: 16384-bit / 3-hash filter over part keys, probed
    // with order keys that are provably absent — measured FPR beside the
    // (1-(1-1/m)^kn)^k theory line; the filter bits are oracle-verified.
    "sketch_bloom_fpr" -> ((s, dir) =>
      Sketch.bloomFprCard(T(s, dir, "part"), T(s, dir, "lineitem"),
        "p_partkey", "l_orderkey")),

    // KMV k-minimum-values distinct estimator over event ids (k=1024):
    // (k-1)·2^32/h_(k) beside the exact count — the
    // intersectable-sketch family's calibration card.
    "sketch_kmv" -> ((s, dir) =>
      Sketch.kmvCard(T(s, dir, "events"), "event_id", 1024)),

    // Sketch-driven winsorized mean per event_type: p05/p95 cutoffs from
    // a 64-bin equi-width histogram (two scans + bounded bin aggregate,
    // no per-group sort), values clamped, robust mean beside raw — the
    // heavy-tail-taming aggregate of a 100 TB metric pipeline.
    "sketch_winsorized" -> ((s, dir) =>
      Sketch.winsorizedMeanCard(T(s, dir, "events"), "event_type", "value",
          64, 0.05, 0.95)
        .orderBy("event_type")),

    // Grouped robust-stats card from the same histogram machinery:
    // trimmed mean (drop outside [p05,p95] instead of clamping),
    // histogram median, and MAD via a second bounded histogram over
    // |v - median| whose bounds are closed-form — location AND scale
    // robustly, with no per-group sort anywhere.
    "sketch_robust_stats" -> ((s, dir) =>
      Sketch.robustStatsCard(T(s, dir, "events"), "event_type", "value",
          64, 0.05, 0.95)
        .orderBy("event_type")),

    // MinHash register-min union: per-source 16-perm signatures folded
    // into the corpus-union signature by elementwise MIN (exact in
    // sketch space — the third mergeable fold beside CMS add and HLL
    // max), each source's agreement-ĵ calibrated against its exact
    // containment Jaccard |S_src|/|S_union|.
    "sketch_minhash_union" -> ((s, dir) =>
      Sketch.minhashUnionCard(T(s, dir, "documents")).orderBy("source")),

    // Embedding L2-norm histogram — the encoder-health monitor
    // (collapsed or bimodal norms read off the 10-bin card).
    "emb_norm_hist" -> ((s, dir) =>
      operators.Similarity.normHistogram(T(s, dir, "embeddings"), 10)
        .orderBy("bin")),

    // Isotropy card: exact mean pairwise cosine from the sum-vector
    // identity ‖Σv̂‖² − Σ‖v̂‖² — the all-pairs average with NO pair term
    // (near 1 = embedding collapse, cosine retrieval stops working).
    "emb_isotropy" -> ((s, dir) =>
      operators.Similarity.isotropy(T(s, dir, "embeddings"))),

    // All-but-the-top correction: subtract the mean and the top
    // principal direction (emb_pca_power's component) — mean and PC
    // pack into ONE broadcast row; the corpus never joins itself.
    "emb_abtt" -> ((s, dir) =>
      operators.Similarity.allButTheTop(T(s, dir, "embeddings"),
          cov = Some(embCov(s, dir)))
        .orderBy("vec_id", "dim")),

    // PQ codebook-quality card: per subspace, codes used + mean/max
    // assignment distortion over the emb_pq code table.
    "emb_pq_distortion" -> ((s, dir) =>
      operators.Similarity.pqDistortion(
        operators.Similarity.productQuantize(T(s, dir, "embeddings"), 16, 4))
        .orderBy("subspace")),

    // Per-event-type mean global quantile of `value` (midrank ECDF, the
    // quantile-normalization substrate) — stochastic-dominance-at-a-
    // glance across groups.
    "dq_quantile_score" -> ((s, dir) =>
      operators.DataQuality.quantileScoreByGroup(T(s, dir, "events"),
        "value", "event_type")
        .orderBy("event_type")),

    // Vocabulary-size coverage curve (10/20/30 terms) — the OOV-rate
    // stat behind tokenizer sizing.
    "text_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(T(s, dir, "documents"), Seq(10, 20, 30))
        .orderBy("vocab_size")),

    // Gini coefficient of the top-200 term-frequency distribution — the
    // vocabulary-concentration scalar beside zipf_slope / simpson.
    "text_gini" -> ((s, dir) =>
      TextAnalysis.giniConcentration(T(s, dir, "documents"), 200)),

    // Distinctive terms per source: z-scored smoothed log-odds vs the
    // rest of the corpus over the top-200 vocabulary — what a source
    // talks about, on the dataset card.
    "text_keyness" -> ((s, dir) =>
      TextAnalysis.keynessTopTerms(T(s, dir, "documents"), 5, 200)
        .orderBy("source", "rank")),

    // Term burstiness: variance-to-mean ratio of per-doc counts over
    // the top-200 vocabulary (Church & Gale) — topical vs filler terms.
    "text_term_dispersion" -> ((s, dir) =>
      TextAnalysis.termDispersion(T(s, dir, "documents"), 200)
        .orderBy("term")),

    // Flesch / Flesch-Kincaid readability per doc (regex word/sentence/
    // vowel-group counts) — the classic quality prior.
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(T(s, dir, "documents"))
        .orderBy("doc_id")),

    // PII audit over the documents corpus per source: emails / IPv4 /
    // phone-shaped / long digit runs. One conditional-aggregation scan;
    // a clean corpus legitimately reports zeros — the report IS the
    // compliance artifact.
    "text_pii_scan" -> ((s, dir) =>
      TextAnalysis.patternScan(T(s, dir, "documents"), "text", "source",
        Seq(
          "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
          "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
          "phone" -> "\\+?[0-9][0-9() -]{6,}[0-9]",
          "digitrun" -> "[0-9]{4,}"))
        .orderBy("source")),

    // Same scanner over the events' JSON props per event type — numeric
    // literals and quoted keys, nonzero counts proving the match path.
    "text_pattern_scan" -> ((s, dir) =>
      TextAnalysis.patternScan(T(s, dir, "events"), "props", "event_type",
        Seq("number" -> "[0-9]+", "qkey" -> "\"[a-z]+\""))
        .orderBy("event_type")),

    // BPE merge training (first 3 merges): pair counts weighted by word
    // frequency, greedy left-to-right application — the tokenizer-build
    // step, iterations state = the vocabulary table.
    "text_bpe_merges" -> ((s, dir) =>
      TextAnalysis.bpeMerges(T(s, dir, "documents"), 3)),

    // Materialized training sequences: text_pack's assignment turned into
    // the actual <eos>-joined byte streams a training run consumes.
    "text_pack_materialize" -> ((s, dir) =>
      TextAnalysis.packMaterialize(T(s, dir, "documents"), 400)
        .orderBy("seq_id")),

    // Hashing-trick bag-of-words vectors (dim 64, flattened) — the
    // no-vocabulary fixed-width featurizer.
    "text_feature_hash" -> ((s, dir) =>
      TextAnalysis.hashingTrickVectors(T(s, dir, "documents"), 64)
        .orderBy("doc_id", "slot")),

    // Per-(source, lang) dataset-card profile: doc/token counts + mean
    // distinct-token ratio (DECIMAL mean).
    "text_source_profile" -> ((s, dir) =>
      TextAnalysis.sourceProfile(T(s, dir, "documents"))
        .orderBy("source", "lang")),

    // Corpus bigram table (top 200 by occurrence count): the LM-data
    // profile pass — boilerplate discovery, contamination probes.
    "text_ngrams" -> ((s, dir) =>
      TextAnalysis.ngramCounts(T(s, dir, "documents"), 2, 200)
        .orderBy(col("freq").desc, col("ngram"))),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(T(s, dir, "documents")).orderBy("doc_id")),

    // Deterministic BERT-style masking plan: ~15% of positions, 80/10/10
    // mask/random/keep decided by (doc, pos) hash.
    "text_mlm_masking" -> ((s, dir) =>
      TextAnalysis.mlmMasking(T(s, dir, "documents"))
        .orderBy("doc_id", "pos")),

    // langId measured against the labeled lang column: confusion counts
    // + per-language recall shares.
    "text_langid_eval" -> ((s, dir) =>
      TextAnalysis.langIdEval(T(s, dir, "documents"))
        .orderBy("lang_true", "lang_pred")),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(T(s, dir, "documents")).orderBy("doc_id")),

    "text_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(T(s, dir, "documents")).orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(T(s, dir, "documents")).orderBy("doc_id")),

    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(T(s, dir, "documents")).orderBy("doc_id")),

    // Declared-vs-detected language disagreement (metadata validation):
    // und predictions count as mismatches — unverifiable is not verified.
    "text_lang_mismatch" -> ((s, dir) =>
      TextAnalysis.langMismatch(T(s, dir, "documents")).orderBy("doc_id")),

    // URL/email redaction (ASCII regex, RE2-compatible with the oracle).
    "text_scrub" -> ((s, dir) =>
      TextAnalysis.scrub(T(s, dir, "documents")).orderBy("doc_id")),

    // Fixed-size token chunking with overlap (40-token chunks, 10 shared).
    "text_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(T(s, dir, "documents"), 40, 10)
        .orderBy("doc_id", "chunk_idx")),

    // Gopher/C4-style repetition quality signal: duplicated-n-gram
    // fractions for n = 2, 3 (exact integer ratios, oracle bit-identical).
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(T(s, dir, "documents")).orderBy("doc_id")),

    // Token-budget packing: docs -> ~400-subword training sequences.
    // GLOBAL semantics computed as a two-level distributed prefix-sum
    // (bucket-local cumsum windows + tiny offset join) — r7's constant-
    // shard registration optimized to the same single-partition window it
    // claimed to demote (PlanGuardSpec now proves no registered query
    // plans a global ordered window; this is the fix).
    "text_pack" -> ((s, dir) =>
      TextAnalysis.packSequencesGlobal(T(s, dir, "documents"), 400)
        .orderBy("doc_id")),

    // The scale path: cumsum window partitioned by language shard, so
    // packing is one hash shuffle + per-shard sorts (no global sort).
    // Packing-efficiency report on the sharded packer's output: per
    // shard, sequences produced / token mass / utilization vs budget.
    "text_pack_stats" -> ((s, dir) =>
      TextAnalysis.packStats(
          TextAnalysis.packSequencesSharded(T(s, dir, "documents"), 400, "lang"),
          400)
        .orderBy("shard")),

    "text_pack_sharded" -> ((s, dir) =>
      TextAnalysis.packSequencesSharded(T(s, dir, "documents"), 400, "lang")
        .orderBy("doc_id")),

    // ---- LLM-data-pipeline: multimodal plumbing ----

    "mm_metadata" -> ((s, dir) =>
      Multimodal.metadata(
          Multimodal.assetsFrom(T(s, dir, "documents"), "doc_id", "text"))
        .select(col("asset_id"), col("kind"),
          col("n_bytes").cast("long").as("n_bytes"), col("checksum"),
          col("header_code").cast("long").as("header_code"))
        .orderBy("asset_id")),

    // Text payloads are not a recognized image container, so the dispatch
    // lands on the labeled stub codec; width/height/n_bytes are
    // deterministic functions of the payload bytes, so oracle-checkable.
    "mm_decode" -> ((s, dir) =>
      Multimodal.decode(s,
          Multimodal.assetsFrom(T(s, dir, "documents"), "doc_id", "text")).toDF()
        .select(col("asset_id"), col("kind"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy("asset_id")),

    // REAL codec path: each doc_id becomes a tiny deterministic grayscale
    // PNG (JDK encoder), decoded back via javax.imageio. PNG is lossless
    // and the raster is read as raw samples, so the decoded dimensions and
    // the integer sample sum are pure functions of doc_id the DuckDB
    // oracle recomputes from the same formula. Narrow map end-to-end; the
    // payload bytes never shuffle.
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val assets = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.Asset(id, "image", Multimodal.syntheticPng(id))))
        .toDF()
      Multimodal.decode(s, assets).toDF()
        .select(col("asset_id"), col("codec"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sum_sample"))
        .orderBy("asset_id")
    }),

    // The JPEG face of the real-codec path (real media corpora are
    // overwhelmingly JPEG): same dispatch, but the codec is lossy so the
    // oracle-checkable contract is exact geometry + codec name + the
    // operator's fixed reconstruction-error bounds (always-true booleans
    // by contract — a decode defect, a dispatch regression, or a broken
    // encoder flips them and fails the hash).
    "mm_decode_jpeg" -> ((s, dir) => {
      import s.implicits._
      val ids = T(s, dir, "documents").select(col("doc_id")).as[Long]
      Multimodal.jpegRoundTrip(s, ids).toDF().orderBy("asset_id")
    }),

    // Perceptual near-duplicate images: real PNG decode → 56-bit dHash →
    // 4-band exact blocking → Hamming ≤ 3 pairs. The oracle rebuilds the
    // hash arithmetically from the synthetic raster formula, so the whole
    // decode→hash→band→join path is value-checked.
    "mm_dhash_neardup" -> ((s, dir) => {
      import s.implicits._
      val assets = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.Asset(id, "image", Multimodal.syntheticPngRich(id))))
        .toDF()
      Multimodal.dhashNearDup(
        Multimodal.decodeDHash(s, assets).toDF(), 3)
        .orderBy("id_a", "id_b")
    }),

    // Per-image luma mean/std/min/max through the REAL PNG decode —
    // the image-corpus health probe; the oracle rebuilds every statistic
    // from the synthetic raster formula, so decode→stat is value-checked.
    "mm_luma_stats" -> ((s, dir) => {
      import s.implicits._
      val assets = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.Asset(id, "image", Multimodal.syntheticPngRich(id))))
        .toDF()
      Multimodal.lumaStats(s, assets).orderBy("asset_id")
    }),

    // Audio modality through the REAL javax.sound codec path: synthetic
    // 16-bit PCM WAVs (closed-form waveform per doc id) encoded with the
    // RIFF writer, decoded back, and reduced to duration/RMS/DC/peak/ZCR
    // — the oracle recomputes the exact waveform arithmetically, so the
    // encode→decode→stat chain is hash-checked end to end.
    "mm_audio_stats" -> ((s, dir) => {
      import s.implicits._
      val assets = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.Asset(id, "audio", Multimodal.syntheticWav(id))))
        .toDF()
      Multimodal.audioStats(s, assets).orderBy("asset_id")
    }),

    // REAL ISO-BMFF (MP4) container probe over per-doc synthesized
    // video payloads: the fixture writes genuinely valid box structure
    // (ftyp/moov[mvhd,trak/tkhd]/free/mdat, with mvhd v1 64-bit and
    // mdat largesize variants on id-residue subsets), the probe walks
    // the real binary tree, and the oracle recomputes every metadata
    // field from the id closed forms — hash equality proves the
    // encode→parse round-trip including the v1 and largesize paths.
    // This is the scan-side pre-filter of a 100 TB video pipeline:
    // narrow mapPartitions, a few hundred header bytes of signal out,
    // raw payloads never shuffle.
    "mm_video_probe" -> ((s, dir) => {
      import s.implicits._
      val assets = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.Asset(id, "video", Multimodal.syntheticMp4(id))))
        .toDF()
      Multimodal.videoProbe(s, assets).toDF().orderBy("asset_id")
    }),

    // ---- ingestion / warehouse plumbing, end-to-end ----

    // Ops 1+2+14 against REAL JSON files (the COPY statements'
    // fidelity check, reference sql_queries.py:102–114): shape events
    // into the reference's camelCase log-event JSON with epoch-millis
    // timestamps, write it out, bulk-read it back through the declared
    // schema + JSONPaths rename list (Ingest.readLogEvents), project.
    // The oracle computes the same projection straight from the parquet
    // table, so the whole write→scan→rename→epoch-convert path is
    // hash-checked, not just the staging transform. The staging dir is a
    // DETERMINISTIC per-sf path, overwritten each run (a fresh
    // createTempDirectory per invocation would accumulate a JSON copy of
    // events for every harness run); like every catalog-writing entry it
    // assumes the harness' single-JVM local filesystem — production
    // ingestion reads a real shared path via the same Ingest.readLogEvents.
    "op01_02_json_copy" -> ((s, dir) => {
      // pid-scoped: deterministic WITHIN a process (repeat runs
      // overwrite, no accumulation) but two concurrent harness processes
      // never race on each other's staging files.
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-json-copy-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "events").select(
          col("event_type").as("artist"),
          lit("Logged In").as("auth"),
          col("user_id").cast("string").as("userId"),
          col("event_id").cast("int").as("sessionId"),
          col("event_type").as("song"),
          col("value").as("length"),
          unix_millis(col("ts")).as("ts"),
          lit("NextSong").as("page"),
          lit(200).as("status"))
        .write.mode("overwrite").json(tmp)
      Ingest.readLogEvents(s, tmp)
        .select(col("session_id"), col("user_id"), col("song"), col("length"),
          col("ts"))
        .orderBy("session_id")
    }),

    // Schema evolution: two parquet batches with different schemas in
    // one directory (the second adds `value`), read back with
    // mergeSchema — the additive-column migration every long-lived
    // 100 TB table goes through; old files surface NULL for the new
    // column instead of forcing a rewrite.
    "op_schema_evolution" -> ((s, dir) => {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-schema-evo-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val e = T(s, dir, "events")
      e.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"))
        .write.mode("overwrite").parquet(tmp)
      e.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("value"))
        .write.mode("append").parquet(tmp)
      s.read.option("mergeSchema", "true").parquet(tmp)
        .orderBy("event_id")
    }),

    // Hive-style partitioned write + partition-pruned read: the scan-
    // reduction pattern every selective 100 TB query depends on. The
    // read back of ONE partition is plan-asserted in PipelineSpec to
    // carry PartitionFilters (pruning at planning time, not a filter
    // over the full scan).
    "op_partitioned_prune" -> ((s, dir) => {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-part-events-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp).filter(col("event_type") === "click")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // Corrupt-tolerant ingestion: a JSON copy of events plus three
    // hand-planted malformed lines (broken syntax ×2, type-violating
    // event_id) read through the PERMISSIVE quarantine reader — valid
    // rows load (value-checked via the id sum), bad lines are counted,
    // nothing dies. The log-and-continue COPY posture, verified.
    "op_json_quarantine" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-json-quar-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "events").select(col("event_id"), col("user_id"), col("event_type"))
        .write.mode("overwrite").json(tmp)
      import s.implicits._
      val bad = Seq("{broken", "{\"event_id\":\"xyz\"}", "0}{")
      s.createDataset(bad).write.mode("append").text(tmp)
      val schema = StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      Ingest.readJsonQuarantine(s, tmp, schema)
        .agg(
          count(when(col("_corrupt_record").isNull, 1)).as("n_valid"),
          count(col("_corrupt_record")).as("n_quarantined"),
          sum(when(col("_corrupt_record").isNull, col("event_id"))).as("id_sum"))
    }),

    // CSV source breadth: write a CSV copy, read it back through the
    // schema-declared reader (no inference — SURVEY §1.1), prove the
    // values round-trip (Spark writes shortest-repr doubles, so even the
    // float column survives text exactly).
    "op_csv_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      // pid-scoped like op01_02_json_copy: no cross-process staging races.
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-csv-copy-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_millis(col("ts")).as("ts_ms"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("ts_ms", LongType)))
      Ingest.readCsv(s, tmp, schema)
        .orderBy("event_id")
    }),

    // ORC source breadth: write an ORC copy (timestamps survive natively
    // — no epoch conversion needed, unlike the CSV text roundtrip), read
    // it back schema-enforced, prove values round-trip bit-for-bit.
    // Plain-text source round trip: write the corpus as line files, read
    // back with the native text source — the rawest crawl-delivery format.
    "op_text_source" -> ((s, dir) => {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-textsrc-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      Ingest.textRoundTrip(T(s, dir, "documents"), tmp)
        .select(col("value").as("text")).orderBy("text")
    }),

    // Whole-file binary source: the same text parts read as raw
    // (path, length, content BINARY) files — the multimodal ingestion
    // shape — then decoded and re-split, proving content fidelity.
    "op_binary_source" -> ((s, dir) => {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-binsrc-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "documents").select(col("text"))
        .write.mode("overwrite").text(tmp)
      Ingest.binaryFileLines(s, tmp).orderBy("text")
    }),

    "op_orc_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-orc-copy-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"))
        .write.mode("overwrite").orc(tmp)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("ts", TimestampType)))
      Ingest.readOrc(s, tmp, Some(schema))
        .orderBy("event_id")
    }),

    // Bucketed co-located join (Catalog.materializeBucketed): both sides
    // land pre-hashed and pre-sorted on the join key, so the sort-merge
    // join AND the follow-up aggregation on the same key run with ZERO
    // shuffle exchanges (plan-asserted in PipelineSpec) — the warehouse
    // answer to repeated large-fact joins. Oracle = the plain join.
    // Deliberately a WRITE+read benchmark (the rewrite each run is the
    // point); the fixed table names live in the session catalog, and the
    // harness gives every session its own temp warehouse dir, so
    // concurrent driver runs don't collide.
    "op_bucketed_join" -> ((s, dir) => {
      val l = T(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey")
      etl.Catalog.materializeBucketed(l, "graft_bj_lineitem", Seq("l_orderkey"), 8)
      etl.Catalog.materializeBucketed(o, "graft_bj_orders", Seq("o_orderkey"), 8)
      val lb = s.table("graft_bj_lineitem")
      val ob = s.table("graft_bj_orders")
      lb.join(ob.hint("merge"), lb("l_orderkey") === ob("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_li"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // Z-order layout: Morton key over (l_partkey, l_suppkey) + range
    // repartition + partition-local sort. The verified output is the
    // key and the resulting total order — the bit-interleave is mirrored
    // exactly in the oracle's shift/and/or SQL.
    // Pre-write partition audit: rows/files/skew per (day, type)
    // partition at 1000 rows/file — catches both the giant-partition
    // and the tiny-file failure modes before the write.
    "layout_partition_plan" -> ((s, dir) =>
      Layout.partitionPlan(T(s, dir, "events"),
        Seq(to_date(col("ts")).as("p_date"), col("event_type")), 1000L)
        .orderBy("p_date", "event_type")),

    "layout_zorder" -> ((s, dir) =>
      Layout.zorderLayout(
          T(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey", bits = 16)
        .withColumn("zkey", Layout.zorderKey2(col("l_partkey"), col("l_suppkey"), 16))
        .orderBy("zkey", "l_orderkey", "l_linenumber")),

    // Three-dimension Z-order (part × supplier × line number): the
    // layout pass real tables need — 3-4 clustering dims — with 20 bits
    // per column (3·20 = 60 ≤ 62). Same verified surface as
    // layout_zorder: the key and the total order it induces.
    "layout_zorder3" -> ((s, dir) =>
      Layout.zorderLayoutN(
          T(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          Seq("l_partkey", "l_suppkey", "l_linenumber"), bits = 20)
        .withColumn("zkey", Layout.zorderKeyN(
          Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")), 20))
        .orderBy("zkey", "l_orderkey", "l_linenumber")),

    // Zone-map skip estimator: the same point probes against the
    // insertion-order layout and a user-clustered re-sort — the
    // before/after numbers that justify the re-sort.
    "layout_skipping" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val probes = Seq(7L, 42L, 120L)
      Layout.skippingEstimate(ev, Seq(col("ts"), col("event_id")),
          "user_id", probes, 500L, "by_time")
        .unionByName(Layout.skippingEstimate(ev,
          Seq(col("user_id"), col("event_id")),
          "user_id", probes, 500L, "by_user"))
        .orderBy("layout", "probe")
    }),

    // Two-phase salted aggregation over the known-skewed event_type key
    // (Skew.saltedCount): hot keys spread across 16 reducers in the
    // partial phase, then the tiny partials collapse. Result — and the
    // oracle — is exactly the plain GROUP BY count.
    "q_skew_salted" -> ((s, dir) =>
      Skew.saltedCount(T(s, dir, "events"), Seq("event_type"), 16, Seq("event_id"))
        .orderBy("event_type")),

    // Frame sampling fan-out: one "video" payload → k evenly spaced byte
    // windows (narrow flatMap, payloads never shuffle). The oracle
    // recomputes the window offsets and the k-per-asset fan-out; the FNV
    // frame checksum needs mod-2^64 wrap (not ANSI) and stays spec-covered.
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(s,
          Multimodal.assetsFrom(T(s, dir, "documents"), "doc_id", "text", "video"), 4)
        .toDF()
        .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("offset").cast("long").as("offset"))
        .orderBy("asset_id", "frame_idx")),

    // Skew-spread equi-join (Skew.saltedJoin): the big skewed side is
    // content-salted, the small side replicated, joined on (key, salt) —
    // result is exactly the plain join, which is the oracle.
    "q_skew_salted_join" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val dim = e.select(col("event_type")).distinct()
        .select(col("event_type"), upper(col("event_type")).as("type_name"))
      Skew.saltedJoin(e, dim, "event_type", 16, Seq("event_id"))
        .select("event_id", "event_type", "type_name")
        .orderBy("event_id")
    }),

    // ---- incremental warehouse merge (etl/Merge) ----

    // Latest-wins upsert, run INCREMENTALLY: initial load of the
    // pre-cutoff batch into an empty target, then merge of the
    // post-cutoff delta on top. The oracle computes the ONE-SHOT form
    // (latest row per user over all of events), so the hash-match proves
    // the incremental path is byte-equivalent to the batch path — the
    // soundness contract of incremental loading. One shuffle per merge,
    // key-partitioned window, no global sort.
    "merge_upsert" -> ((s, dir) => {
      val e = T(s, dir, "events").select("user_id", "ts", "event_id", "value")
      val cutoff = lit("2024-01-20").cast("timestamp")
      val initial = Merge.upsert(e.limit(0), e.filter(col("ts") < cutoff),
        Seq("user_id"), Seq("ts", "event_id"))
      Merge.upsert(initial, e.filter(col("ts") >= cutoff),
          Seq("user_id"), Seq("ts", "event_id"))
        .orderBy("user_id")
    }),

    // CDC apply with tombstones: event_type='error' rows act as deletes.
    // Same incremental-vs-one-shot proof shape as merge_upsert: replaying
    // the change stream in two batches must equal replaying it at once
    // (the oracle), including keys whose final change is a delete.
    "merge_cdc" -> ((s, dir) => {
      val changes = T(s, dir, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
      val cutoff = lit("2024-01-20").cast("timestamp")
      val state1 = Merge.applyChanges(changes.drop("op").limit(0),
        changes.filter(col("ts") < cutoff),
        Seq("user_id"), Seq("ts", "event_id"), "op", "D")
      Merge.applyChanges(state1, changes.filter(col("ts") >= cutoff),
          Seq("user_id"), Seq("ts", "event_id"), "op", "D")
        .orderBy("user_id")
    }),

    // SCD Type 2 history: each user's event_type change stream collapsed
    // into versioned validity intervals (runs of equal states merge).
    // is_current goes out as 0/1 BIGINT — engine-portable, unlike bools.
    "merge_scd2" -> ((s, dir) =>
      Merge.scdType2(T(s, dir, "events"), Seq("user_id"), "ts", "event_id",
          "event_type")
        .withColumn("is_current", col("is_current").cast("long"))
        .orderBy("user_id", "version")),

    // ---- streaming surface (batch-unified bodies) ----

    "stream_tumbling" -> ((s, dir) =>
      StreamingJobs.windowedCounts(T(s, dir, "events"), "1 hour")
        .orderBy("window_start", "event_type")),

    // Top-3 event types per tumbling hour — the rolling leaderboard;
    // rank is window-partitioned, never global.
    "stream_topk" -> ((s, dir) =>
      StreamingJobs.windowedTopK(T(s, dir, "events"), "1 hour", 3)
        .orderBy("window_start", "rnk")),

    // Watermark-bounded stream dedup, batch-unified: distinct
    // (user_id, event_type) keys (key-only projection keeps the
    // batch-side survivor choice deterministic for the oracle).
    "stream_dedup" -> ((s, dir) =>
      StreamingJobs.dedupStream(
          T(s, dir, "events").select("user_id", "event_type", "ts"),
          Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
        .orderBy("user_id", "event_type")),

    "stream_sliding" -> ((s, dir) =>
      StreamingJobs.slidingRates(T(s, dir, "events"))
        .orderBy("window_start")),

    // Sessionization via native session_window (strict >gap starts a new
    // session — adjacent windows merge; see StreamingSpec).
    "stream_session" -> ((s, dir) =>
      StreamingJobs.sessionize(T(s, dir, "events"), "30 minutes")
        .orderBy("user_id", "session_start")),

    // Streaming incremental near-dup admission, batch-unified: two
    // arrival waves (doc_id%5=0, then %5=1) gate against a standing
    // corpus (%5>=2) via Dedup.admitWave — wave 2's corpus includes
    // wave 1's ADMITTED docs, so the oracle proves the stateful chain,
    // not just one admission round. The foreachBatch wiring (corpus
    // state + MinHash register fold per batch) runs in StreamingSpec
    // with stream ≡ sequential-wave parity.
    "stream_dedup_incr" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val (v1, corpus1) = Dedup.admitWave(
        docs.filter(col("doc_id") % 5 >= 2),
        docs.filter(col("doc_id") % 5 === 0), 3, 0.5)
      val (v2, _) = Dedup.admitWave(corpus1,
        docs.filter(col("doc_id") % 5 === 1), 3, 0.5)
      v1.withColumn("wave", lit(1L)).unionByName(v2.withColumn("wave", lit(2L)))
        .select("wave", "doc_id", "n_corpus_dups", "n_batch_dups", "verdict")
        .orderBy("wave", "doc_id")
    }),

    // Declarative data-quality audit across the TPC-H-ish schema: one
    // composed job of not-null / uniqueness / referential checks. The
    // lineitem uniqueness check fires on real duplicates in the data.
    "q_dq_audit" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val customer = T(s, dir, "customer")
      val lineitem = T(s, dir, "lineitem")
      val events = T(s, dir, "events")
      operators.DataQuality.audit(
        notNull = Seq(
          ("nn_orders_custkey", orders, "o_custkey"),
          ("nn_orders_orderdate", orders, "o_orderdate"),
          ("nn_events_value", events, "value")),
        unique = Seq(
          ("uq_orders_orderkey", orders, Seq("o_orderkey")),
          ("uq_lineitem_line", lineitem, Seq("l_orderkey", "l_linenumber"))),
        refs = Seq(
          ("fk_orders_customer", orders, "o_custkey", customer, "c_custkey"),
          ("fk_lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey")))
        .orderBy("check")
    }),

    // Order-independent table fingerprint: one number that any engine
    // (or replica) reproduces with one scan — the cross-system
    // consistency check of a warehouse migration. Components: both ids,
    // epoch-micros, and the native string hash of the type column.
    "q_checksum" -> ((s, dir) => {
      val e = T(s, dir, "events")
      operators.DataQuality.tableChecksum(e, Seq(
        col("event_id"), col("user_id"), unix_micros(col("ts")),
        call_function("graft_strhash", col("event_type"))))
    }),

    // The LLM-pipeline flagship: scrub → quality gate → exact dedup →
    // split → per-split packing, all composed from the verified
    // operators — one row per surviving doc with split and sequence id.
    "pipeline_docs_e2e" -> ((s, dir) =>
      operators.DocPipeline.prepare(T(s, dir, "documents"))
        .orderBy("doc_id")),

    // The ML face of the same chain: gate → dedup → leak-free split →
    // NB trained on the train shard, evaluated on the test shard — a
    // real generalization number over pipeline-curated data, checked as
    // one CTE-chain oracle (cross-stage contract drift shows as a
    // recall shift no solo oracle can see).
    "pipeline_ml_e2e" -> ((s, dir) =>
      operators.DocPipeline.prepareAndEval(T(s, dir, "documents"))
        .orderBy("label")),

    // The LLM-PRETRAINING flagship (north-star counterpart of
    // op17_pipeline_e2e): near-dup cluster dedup (the shared
    // star-contraction label frame) → 4-gram eval-set decontamination
    // (eval = src0/src1; trigrams would wipe 404/428 of the synthetic
    // corpus — 4-grams drop a meaningful ~70 docs and leave a real
    // training set) → Pile/Dolma-style mixture sampling (w(srcK)=K%4+1
    // over the 18 train sources, 10k-token budget → per-source rates
    // strictly inside (0,1), so the hash-threshold rule is genuinely
    // exercised) → per-lang sequence packing. Every stage is an
    // independently-green operator; this row proves the handoffs —
    // schemas and end-to-end determinism across five stage boundaries.
    "pipeline_llm_e2e" -> ((s, dir) =>
      operators.DocPipeline.prepareLlm(T(s, dir, "documents"),
          docClusters(s, dir), Seq("src0", "src1"),
          (2 until 20).map(k => s"src$k" -> (k % 4 + 1).toDouble).toMap,
          10000L)
        .orderBy("doc_id")),

    // Gap-fill resample: per-user hourly grid, forward-filled values
    // (n = 0 marks filled buckets). User subset keeps the grid bounded.
    "ts_resample" -> ((s, dir) =>
      operators.TimeSeries.resampleForwardFill(
          T(s, dir, "events").filter(col("user_id") < 50),
          "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // Linear-interpolation resample: the continuous-signal fill (prices,
    // sensors) — gaps take prev + slope·Δt, leading/trailing gaps
    // extrapolate flat. Same per-user grid as ts_resample; two per-key
    // windows instead of one.
    "ts_gapfill" -> ((s, dir) =>
      operators.TimeSeries.resampleInterpolate(
          T(s, dir, "events").filter(col("user_id") < 50),
          "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // Finite-memory EWMA (β = 1/2 over the last 8 observed hourly
    // buckets, pandas adjust=true renormalization): 8-dp-quantized
    // DECIMAL weights ride one bounded per-key window — no grid explode,
    // no range self-join.
    "ts_ewma" -> ((s, dir) =>
      operators.TimeSeries.ewma(
          T(s, dir, "events").filter(col("user_id") < 50),
          "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // Rolling z-score anomaly flags: each hourly bucket scored against
    // its key's trailing 24 observed buckets; moments from exact DECIMAL
    // window sums, NULL z (never NaN/Inf) on degenerate windows.
    "ts_zscore" -> ((s, dir) =>
      operators.TimeSeries.rollingZscore(
          T(s, dir, "events").filter(col("user_id") < 50),
          "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // Lag-1 autocorrelation of each user's hourly series: Pearson r from
    // six exact DECIMAL aggregates — one row per key, float math only in
    // the final per-key closed form.
    "ts_autocorr" -> ((s, dir) =>
      operators.TimeSeries.autocorr(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // ACF+PACF card to lag 3 (autocovariance ACF, Durbin–Levinson
    // partials in closed form) — the ARIMA order-selection diagnostic
    // the single-lag autocorr can't answer.
    "ts_pacf" -> ((s, dir) =>
      operators.TimeSeries.pacf(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Time-weighted average per user over the raw irregular samples —
    // each sample weighted by the interval it covered; mean_simple
    // beside it shows the dense-burst bias.
    "ts_twa" -> ((s, dir) =>
      operators.TimeSeries.timeWeightedAvg(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Single-changepoint scan: best standardized mean-shift split of each
    // user's hourly series, prefix-sum scored (O(n) per key — the naive
    // split×row self-join is O(n²)).
    "ts_changepoint" -> ((s, dir) =>
      operators.TimeSeries.changepointScan(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Per-key OLS trend of the hourly series over the observed-bucket
    // index: slope/intercept/R² from six exact aggregates (Σt² in
    // DECIMAL — BIGINT would overflow on a billion-bucket key).
    "ts_ols" -> ((s, dir) =>
      operators.TimeSeries.olsTrend(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Bollinger bands: trailing-24-bucket mean ± 2·sd envelope + %B per
    // hourly bucket — exact ×10⁶ integer window moments, so a flat
    // window gets sd exactly 0 (NULL %B), never rounding noise.
    "ts_bollinger" -> ((s, dir) =>
      operators.TimeSeries.bollingerBands(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // Dickey–Fuller unit-root stat per user: OLS of Δv on v_{t-1} from
    // exact integer moments; reject flag compares the ROUNDED t to
    // -2.86 so the boolean can't straddle an engine rounding edge.
    "ts_adf" -> ((s, dir) =>
      operators.TimeSeries.dickeyFuller(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Theil–Sen robust trend per user: slope = median pairwise slope over
    // the observed hourly buckets (≤ 512 per key before the per-key
    // quadratic), intercept = median residual — the outlier-immune face
    // of ts_ols.
    "ts_theil_sen" -> ((s, dir) =>
      operators.TimeSeries.theilSen(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Top motif per user: the closest non-overlapping pair of length-4
    // hourly subsequences (the matrix-profile question for the single
    // best motif; per-key quadratic capped at 256 buckets).
    "ts_motif" -> ((s, dir) =>
      operators.TimeSeries.motifDiscovery(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Lag-1 cross-correlation between each user's hourly value-sum and
    // event-count series — both series from ONE bucketize pass.
    "ts_xcorr" -> ((s, dir) =>
      operators.TimeSeries.crossCorr(
          T(s, dir, "events"), "user_id", "ts", "value", lag = 1)
        .orderBy("user_id")),

    // Mann–Kendall monotone-trend test per user: exact integer S over
    // the theilSen pair shape, tie-corrected Var(S), continuity-
    // corrected z — "is there a trend" to ts_theil_sen's "how steep".
    "ts_mann_kendall" -> ((s, dir) =>
      operators.TimeSeries.mannKendall(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Wald–Wolfowitz runs test per user around the 6-dp-routed median:
    // run counts from one ordered lag window, z vs the randomness
    // expectation — serial randomness without a correlation model.
    "ts_runs_test" -> ((s, dir) =>
      operators.TimeSeries.runsTest(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Hurst exponent per user via rescaled-range analysis over dyadic
    // windows {4,8,16,32}: exact scaled-deviation prefix sums, log2
    // R/S slope — long-memory persistence vs mean reversion.
    "ts_hurst" -> ((s, dir) =>
      operators.TimeSeries.hurstExponent(
          T(s, dir, "events"), "user_id", "ts", "value",
          windows = Seq(4, 8, 16, 32))
        .orderBy("user_id")),

    // Turning-point test per user: strict local-extrema count vs the
    // i.i.d. expectation 2(n-2)/3 — the oscillation-rate member of the
    // randomness panel (runs = levels, ACF = linear memory).
    "ts_turning_points" -> ((s, dir) =>
      operators.TimeSeries.turningPoints(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Lag-1 Granger screen: does last hour's click volume improve the
    // AR(1) forecast of purchase volume?
    "ts_granger" -> ((s, dir) =>
      operators.TimeSeries.grangerLite(
        T(s, dir, "events"), "purchase", "click")),

    // Hour-of-day seasonal strength per user: SSB/SST from per-phase
    // exact aggregates (no windows at all); peak phase ranked by the
    // 6-dp-rounded double mean so every engine agrees on ties.
    "ts_seasonal" -> ((s, dir) =>
      operators.TimeSeries.seasonalStrength(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // SAX shape words (8 segments, 4-letter alphabet): z-normalize on
    // exact key moments, PAA segment means over 6-dp DECIMAL z sums,
    // Gaussian-breakpoint letters — degenerate keys omitted.
    "ts_sax" -> ((s, dir) =>
      operators.TimeSeries.sax(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // M4 downsampling (min/max/first/last per hour bucket): the
    // error-free chart/scan reduction as ONE map-side-combinable
    // aggregate — no window, no sort, values pass through untouched.
    "ts_m4" -> ((s, dir) =>
      operators.TimeSeries.m4Downsample(
          T(s, dir, "events").filter(col("user_id") < 100),
          "user_id", "ts", "value")
        .orderBy("user_id", "bucket")),

    // LTTB-style visual downsample (mean-anchor parallel variant): per
    // event type, the 16 most shape-preserving points — the perceptual
    // counterpart of ts_m4's error-free min/max envelope.
    "ts_lttb" -> ((s, dir) =>
      operators.TimeSeries.lttbDownsample(T(s, dir, "events"),
          "event_type", "ts", "value", 16)
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type", "bucket")),

    // Seasonal-naive backtest: forecast each hour as 24h earlier, MAE
    // over the last 48 hours — the "can we just use last week" check.
    "ts_backtest_naive" -> ((s, dir) =>
      operators.TimeSeries.seasonalNaiveBacktest(T(s, dir, "events"),
          "event_type", "ts", "value", 24, 48)
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")),

    // DFT amplitudes at harmonics 1-4 over each event type's hourly
    // mean series — the period-free spectral periodicity profile beside
    // ts_seasonal's fixed-period strength test.
    // Spectral entropy of the 4-harmonic power spectrum: ~0 = periodic,
    // ~ln 4 = noise-like — the predictability gate before seasonal fits.
    "ts_spectral_entropy" -> ((s, dir) =>
      operators.TimeSeries.spectralEntropy(
          T(s, dir, "events"), "event_type", "ts", "value")
        .orderBy("event_type")),

    // Bandt–Pompe permutation entropy (order 3) per user — model-free
    // trend-vs-noise complexity from ordinal patterns of hourly triples.
    "ts_perm_entropy" -> ((s, dir) =>
      operators.TimeSeries.permutationEntropy(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Page's one-sided CUSUM drift scan per user (h = 4σ): sustained
    // small shifts fire here long before any per-point z-score.
    "ts_cusum" -> ((s, dir) =>
      operators.TimeSeries.cusumScan(
          T(s, dir, "events"), "user_id", "ts", "value")
        .orderBy("user_id")),

    "ts_dft" -> ((s, dir) =>
      operators.TimeSeries.dftSpectrum(T(s, dir, "events"),
          "event_type", "ts", "value", 4)
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type", "harmonic")),

    // Key-candidate profile of the orders table: uniqueness + value
    // entropy per column — true key / category / near-constant triage.
    "dq_key_entropy" -> ((s, dir) =>
      operators.DataQuality.keyEntropy(T(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        .orderBy("column")),

    // CHAINED time-series pipeline — the composition the family is
    // actually consumed as (every solo oracle checks one link; this one
    // checks the chain contract): raw events → hourly linear-interpolated
    // grid (resampleInterpolate) → hour-of-day seasonal strength AND SAX
    // shape word, both computed over the FILLED series (tsCol = the grid
    // bucket, valueCol = the 6-dp-quantized interpolated value, so the
    // downstream operators see a gapless signal, which is the entire
    // point of the fill). Inner join on the key: SAX omits degenerate
    // (<2-bucket / zero-variance) keys and the chain output follows that
    // convention. One output row per user. The oracle replays the SAME
    // three stages as one CTE chain — cross-operator contract drift
    // (e.g. a fill output rename or requantization) breaks this row even
    // when all ten solo ts oracles stay green.
    "ts_pipeline_e2e" -> ((s, dir) => {
      val filled = operators.TimeSeries.resampleInterpolate(
        T(s, dir, "events").filter(col("user_id") < 50), "user_id", "ts", "value")
      val seas = operators.TimeSeries.seasonalStrength(
        filled, "user_id", "bucket", "v_interp")
      val shapes = operators.TimeSeries.sax(
        filled, "user_id", "bucket", "v_interp")
      seas.join(shapes, Seq("user_id"))
        .select(col("user_id"), col("n_rows"), col("n_phases"),
          col("peak_phase"), col("strength"), col("n_buckets"), col("sax"))
        .orderBy("user_id")
    }),

    // Stream-stream interval join (batch-unified body): views within
    // 6 hours after each click, per user. On streams both sides get
    // watermarks and the range bound GCs the join state (StreamingSpec
    // drives that path on MemoryStreams).
    "stream_interval_join" -> ((s, dir) => {
      val e = T(s, dir, "events")
      StreamingJobs.intervalJoin(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "view"), "6 hours")
        .select(col("user_id"), col("l_id").as("click_id"),
          col("r_id").as("view_id"))
        .orderBy("user_id", "click_id", "view_id")
    }),

    // Stream-static enrichment (batch-unified body): facts keep flowing
    // even when the dimension has no row — left-outer broadcast join,
    // zero streaming state.
    "stream_enrich" -> ((s, dir) => {
      val e = T(s, dir, "events")
        .select(col("event_id"), col("user_id").as("c_custkey"))
      val dim = T(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
      StreamingJobs.enrich(e, dim, Seq("c_custkey"))
        .select(col("event_id"), col("c_custkey").as("user_id"),
          col("c_name"), col("c_mktsegment"))
        .orderBy("event_id")
    }),

    // Arbitrary-state surface under the oracle gate: the SAME
    // mapGroupsWithState body the streaming job runs, executed on batch
    // events. value is pre-quantized to floor(value·10⁴) — an
    // integer-valued double — so the state fold's running sum is exact
    // and associative (< 2⁵³), and the oracle's unordered SUM matches the
    // fold's ordered sum bit-for-bit; last_type is deterministic because
    // the fold is (ts, value, type)-ordered.
    "stream_profiles" -> ((s, dir) => {
      val e = T(s, dir, "events").select(col("user_id"), col("event_type"),
        floor(col("value") * 10000).cast("double").as("value"), col("ts"))
      StatefulJobs.userProfiles(s, e).toDF().orderBy("user_id")
    }),

    // flatMapGroupsWithState sessionizer on batch input: with no
    // watermark to close gaps, the batch semantics are one whole-input
    // session per key — first/last event-time in epoch millis plus the
    // event count, all order-independent aggregates.
    "stream_closed_sessions" -> ((s, dir) => {
      val e = T(s, dir, "events")
      StatefulJobs.closedSessions(s, e).toDF().orderBy("user_id")
    }),

    // ---- round 7: warehouse ops + pipeline breadth ----

    // RFM segmentation WITHOUT the textbook global-ntile window: exact
    // quantile boundaries from one tiny agg, broadcast back, scores as a
    // flat projection. monetary rides an exact DECIMAL sum; the double
    // cast happens only at the output edge.
    "ana_rfm" -> ((s, dir) =>
      Analytics.rfm(T(s, dir, "orders"), lit("1999-12-31").cast("date"))
        .withColumn("monetary", col("monetary").cast("double"))
        .orderBy("custkey")),

    // Gaps-and-islands: maximal consecutive-day activity runs per user —
    // one per-user window over DISTINCT (user, day), no self-join.
    "ana_islands" -> ((s, dir) =>
      Analytics.activityIslands(T(s, dir, "events"))
        .orderBy("user_id", "island_start")),

    // Per-group z-score outliers (|z| > 2 vs the event_type mean) — the
    // telemetry anomaly sweep; both moments from exact DECIMAL sums.
    "ana_outliers" -> ((s, dir) =>
      Analytics.outliers(T(s, dir, "events"))
        .orderBy("event_id")),

    // Robust MAD outliers (|v − median| / MAD > 3, 6-dp-quantized
    // percentile boundaries) — catches what sd-based z masks in heavy
    // tails.
    "ana_outliers_mad" -> ((s, dir) =>
      Analytics.outliersMad(T(s, dir, "events"))
        .orderBy("event_id")),

    // Percentile winsorization at [p01, p99] — robust clipping before
    // training on heavy-tailed metrics; broadcast boundaries, flat clip.
    "ana_winsorize" -> ((s, dir) =>
      Analytics.winsorize(T(s, dir, "events"))
        .orderBy("event_id")),

    // Market-basket pairs over order baskets of parts: support /
    // confidence / lift, top 50 by lift — the co-purchase miner
    // (minSupport 3 ~ 63 qualifying pairs at sf0.01).
    "ana_basket" -> ((s, dir) =>
      Analytics.basketPairs(T(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L)),

    // Mega-basket guard exercised: baskets with > 5 distinct parts are
    // excluded whole (the regenerated testdata's orders run 1–17 distinct
    // parts, avg ~4, so the cap really filters), denominator and
    // frequencies recomputed over the capped universe — the skew-safety
    // path for bot/default baskets at scale.
    "ana_basket_capped" -> ((s, dir) =>
      Analytics.basketPairs(T(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L, maxBasketSize = 5L)),

    // Per-group exact interpolated quantiles (p25/p50/p95 of value per
    // event_type) — the grouped distribution profile; one tiny aggregate,
    // no window. 2-dp values make the interpolation engine-stable (the
    // ana_rfm boundary argument); outputs rounded to 6 dp.
    "ana_group_quantiles" -> ((s, dir) =>
      T(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(percentile(col("value"), lit(0.25)), 6).as("p25"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95"))
        .orderBy("event_type")),

    // Incremental aggregate maintenance: orders split at a date cutoff
    // into base + delta, partial (DECIMAL-sum, count) states merged and
    // finalized — the oracle recomputes from scratch, so the hash match
    // PROVES merge-of-states == one-shot aggregation cross-engine.
    "op_incr_agg" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val cutoff = lit("1997-01-01").cast("timestamp")
      val base = Merge.aggState(
        orders.filter(col("o_orderdate") < cutoff), Seq("o_custkey"), "o_totalprice")
      val delta = Merge.aggState(
        orders.filter(col("o_orderdate") >= cutoff), Seq("o_custkey"), "o_totalprice")
      Merge.finalizeAggState(Merge.mergeAggStates(Seq("o_custkey"), base, delta))
        .select(col("o_custkey"), col("total"), col("cnt"),
          Fns.q6(col("mean")).as("mean"))
        .orderBy("o_custkey")
    }),

    // Explicit GROUPING SETS (the rollup/cube generalization with a
    // hand-picked level list — here: pair, first key alone, grand total).
    "q_grouping_sets" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Snapshot diff: old/new built deterministically from orders (key-mod
    // deletes, inserts, +100.00 price and priority rewrites), classified
    // by one full outer join. changed_cols flattens to a CSV string at
    // the edge (arrays don't survive the cross-engine dump compare).
    "q_table_diff" -> ((s, dir) => {
      val src = T(s, dir, "orders").filter(col("o_orderkey") < 7000)
      val oldSnap = src.filter(col("o_orderkey") % 7 =!= 3)
      val newSnap = src.filter(col("o_orderkey") % 11 =!= 4)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 10 === 0, lit("RUSH"))
            .otherwise(col("o_orderpriority")))
      operators.Snapshot.diff(oldSnap, newSnap, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("change_type"),
          array_join(col("changed_cols"), ",").as("changed_cols"))
        .orderBy("o_orderkey")
    }),

    // Eval-set n-gram decontamination (the 13-gram-collision rule shape,
    // trigrams here so the synthetic corpus actually collides): any train
    // doc sharing >= 1 n-gram with the eval sources is flagged.
    "text_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val evalSrc = col("source").isin("src0", "src1")
      Dedup.decontaminateNgram(docs.filter(!evalSrc), docs.filter(evalSrc), 3)
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement (Efraimidis-Spirakis clocks
    // on the deterministic hash, weight = document length): distributed
    // top-k, not a global sort.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(T(s, dir, "documents"), "doc_id", "n_chars", 60)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // Priority sampling (Duffield–Lund–Thorup): top-60 by w/u priority
    // with the τ-threshold estimator ŵ = max(w, τ) attached — the
    // fixed-k sample that PRESERVES subset weight sums, planned as
    // TakeOrderedAndProject (per-partition heap, no global sort).
    "sample_priority" -> ((s, dir) =>
      Sampling.prioritySample(
          T(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "doc_id", "n_chars", 60)
        .orderBy("doc_id")),

    // The estimator's one-row witness: Σŵ over the 60-sample vs the
    // true Σw over all documents, relative error reported — the
    // "estimate a 100 TB total from k kept rows" calibration.
    "sample_priority_total" -> ((s, dir) =>
      Sampling.prioritySampleTotalCard(
        T(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", 60)),

    // Distributed Poisson bootstrap: 95% CI on the per-type mean value
    // from 50 deterministic Poisson(1) resamples — error bars on a 100 TB
    // aggregate with one scan and no global coordination (Chamandy et al.).
    "sample_bootstrap_ci" -> ((s, dir) =>
      Sampling.bootstrapCI(T(s, dir, "events"), "event_type", "event_id",
        "value", reps = 50, level = 0.95)
        .orderBy("event_type")),

    // Deterministic 5-fold assignment + per-fold class balance — the
    // cross-validation pre-flight (same row → same fold on every engine
    // and partitioning, unlike randomSplit).
    "sample_kfold" -> ((s, dir) =>
      Sampling.kfoldBalance(T(s, dir, "documents"), "doc_id", "lang", 5)
        .orderBy("fold", "label")),

    // Random-signs projection on int8 codes: exact integer dots, 8 longs
    // per vector — the JL-style distance sketch. NULL-quantized rows
    // (zero/empty vectors) are dropped on both sides.
    "emb_project" -> ((s, dir) =>
      Similarity.signedProjection(T(s, dir, "embeddings"), dim = 64, outDims = 8)
        .na.drop(Seq("proj_0"))
        .orderBy("vec_id")),

    // Dynamic partition pruning: the fact is partitioned on the join key,
    // the filter lives on the DIM side only — static pruning can't fire,
    // so the scan's partition list must come from the broadcast result at
    // RUNTIME (plan-asserted in SnapshotSpec). THE mechanism that keeps a
    // selective dim-filtered star join from scanning all 100 TB of fact.
    "op_dpp" -> ((s, dir) => {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-dpp-events-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val e = T(s, dir, "events")
      e.select("event_id", "user_id", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val dim = e.select("event_type").distinct()
        .withColumn("type_class",
          when(col("event_type").isin("click", "view"), lit("engagement"))
            .otherwise(lit("other")))
      s.read.parquet(tmp)
        .join(broadcast(dim.filter(col("type_class") === "engagement")), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    // Incremental admission: new batch (doc_id % 5 = 0) gated against the
    // standing corpus — near-dup evidence counts + verdict per batch doc.
    "dedup_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.admitIncremental(docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0), 3, 0.5)
        .orderBy("doc_id")
    }),

    // Small-file compaction, content-preservation proven by the
    // order-independent checksum (the rewrite is free to rebalance rows):
    // 48 tiny files in, byte-sized file count out, same n_rows+checksum
    // as reading the SOURCE table directly — which is what the oracle
    // computes without ever seeing the staging dirs.
    "op_compact" -> ((s, dir) => {
      val base = s"/tmp/graft-compact-${ProcessHandle.current().pid()}"
      T(s, dir, "documents").repartition(48)
        .write.mode("overwrite").parquet(s"$base/in")
      val compacted = operators.Snapshot.compact(s, s"$base/in", s"$base/out")
      operators.DataQuality.tableChecksum(compacted, Seq(
        col("doc_id"), call_function("graft_strhash", col("text"))))
    })
  )

  /** Near-dup demo corpus for the LSH dedup query: embeddings ∪
    * deterministically perturbed copies (id + 1 000 000). Copy coordinate
    * i is v_i · (1 + ε·u) with u = samplingHash(id·64 + i)/2³¹ − 1 ∈
    * [−1, 1) — every arithmetic step is ANSI-expressible and ordered
    * identically in the oracle, so both engines build bit-identical
    * corpora; each planted pair lands at cosine ≈ 1 − O(ε²) ≥ 0.9999.
    */
  private def augmentedEmbeddings(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    // The id is renamed before the projection: a lambda inside transform()
    // is resolved LATE, against the projection's own output, so an
    // unrenamed col("vec_id") would silently bind to the shifted alias and
    // hash the wrong key (found the hard way — the oracle caught it).
    val perturbed = base.withColumnRenamed("vec_id", "orig_id")
      .select((col("orig_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.003) *
            (Sampling.samplingHash(col("orig_id") * 64 + i) / lit(2147483648.0)
              - lit(1.0)))).as("embedding"))
    base.unionByName(perturbed)
  }

  /** Shared oracle fragment: per-document whitespace tokens. */
  private val docToks =
    "SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents"

  /** Shared langId oracle pieces: per-language marker-count SELECT list
    * and the priority-argmax CASE — the exact mirror of
    * TextAnalysis.langId, used by text_langid and text_langid_eval.
    */
  private def langidScoreAndCase: (String, String) = {
    val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
      val markers = m.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, t -> list_contains($markers, t))) AS BIGINT) AS s_$lang"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val cases = langs.zipWithIndex.map { case (lang, i) =>
      val earlier = langs.take(i).map(l => s"s_$lang > s_$l")
      val later = langs.drop(i + 1).map(l => s"s_$lang >= s_$l")
      val conds = (earlier ++ later :+ s"s_$lang > 0").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n    ")
    (scores, cases)
  }

  /** Winnowing oracle: the same 3-token shingles hashed with the 131-
    * polynomial, a generate_series window explode, and the rightmost-
    * min row_number — selection-for-selection identical to the Spark
    * window.
    */
  private val winnowingCtes =
    s"""WITH base AS ($docToks),
       |toks AS (SELECT doc_id, unnest(toks) AS t,
       |        generate_subscripts(toks, 1) AS i FROM base),
       |sh AS (SELECT a.doc_id, CAST(a.i - 1 AS BIGINT) AS pos,
       |        a.t || ' ' || b.t || ' ' || c.t AS s
       |      FROM toks a JOIN toks b ON b.doc_id = a.doc_id
       |        AND b.i = a.i + 1
       |      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
       |hs AS (SELECT doc_id, pos,
       |        list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split(s, ''),
       |            cc -> CAST(ord(cc) AS BIGINT))),
       |          (acc, x) -> (acc * 131 + x) % 2147483647) AS h FROM sh),
       |mx AS (SELECT doc_id, max(pos) AS mx, count(*) AS n_grams
       |      FROM hs GROUP BY 1),
       |wnd AS (SELECT doc_id, pos, h,
       |        unnest(generate_series(pos, least(pos + 3, mx))) AS e
       |      FROM hs JOIN mx USING (doc_id)),
       |wf AS (SELECT * FROM wnd WHERE e >= 3),
       |sel AS (SELECT DISTINCT doc_id, pos, h FROM (
       |      SELECT doc_id, pos, h, row_number() OVER (
       |        PARTITION BY doc_id, e ORDER BY h, pos DESC) AS rn
       |      FROM wf) WHERE rn = 1)""".stripMargin

  private val winnowingOracle =
    s"""$winnowingCtes,
       |fp AS (SELECT doc_id, count(*) AS n_fingerprints FROM sel
       |      GROUP BY 1)
       |SELECT mx.doc_id, n_grams,
       |  greatest(n_grams - 3, 0) AS n_windows,
       |  coalesce(n_fingerprints, 0) AS n_fingerprints,
       |  CAST(round((CAST(coalesce(n_fingerprints, 0) AS DOUBLE)
       |    / nullif(CAST(greatest(n_grams - 3, 0) AS DOUBLE), 0e0)
       |   ) * 1000000) / 1000000 AS DOUBLE) AS density
       |FROM mx LEFT JOIN fp USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Winnowing PAIR oracle: fingerprint-set self-join over the same
    * selections, df-capped at 10, shared-count ≥ 2.
    */
  private val winnowingPairsOracle =
    s"""$winnowingCtes,
       |ss AS (SELECT DISTINCT doc_id, h FROM sel),
       |dfc AS (SELECT h FROM ss GROUP BY h HAVING count(*) <= 10),
       |sf AS (SELECT ss.doc_id, ss.h FROM ss JOIN dfc USING (h))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  count(*) AS n_shared
       |FROM sf a JOIN sf b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact all-pairs trigram Jaccard ≥ 0.5 (oracle for both the exact
    * inverted-index query and the MinHash+LSH query — see above).
    */
  private val ngramJaccardOracle =
    s"""WITH base AS ($docToks),
       |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
       |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
       |       FROM toks a
       |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
       |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b,
       |       CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = da
       |JOIN sizes sb ON sb.doc_id = db
       |WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Shared oracle fragment (requires WITH RECURSIVE): exact connected
    * components over the trigram-Jaccard ≥ 0.5 near-dup graph →
    * `clusters(doc_id, cluster_id)` with cluster_id = min reachable id.
    * Used by dedup_clusters, dedup_keep_best and sample_split.
    */
  private val clusterLabelsCte =
    s"""pr AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) q0),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
       |          UNION SELECT doc_b, doc_a FROM pr),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS doc_id, min(dst) AS m FROM reach GROUP BY 1),
       |clusters AS (
       |  SELECT d.doc_id, least(coalesce(l.m, d.doc_id), d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id)""".stripMargin

  private val stopwordList =
    TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared oracle fragment: embeddings as DOUBLE lists. */
  private val embCte =
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"

  /** Shared nearest-seed assignment CTE chain — mirrors
    * `Similarity.assignToSeeds` with `k` lowest-id seeds: defines
    * relations `e` (vec_id, v), `f` (flattened), and `a` (vec_id, cid).
    * Used by the kmeans / SemDeDup / hard-negative oracles.
    */
  private def assignCtes(k: Int): String =
    s"""e AS ($embCte),
       |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
       |        unnest(v) AS x FROM e),
       |seeds AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k),
       |c AS (SELECT f.vec_id AS cid, f.dim, f.x AS cx
       |      FROM f JOIN seeds USING (vec_id)),
       |d AS (SELECT f.vec_id, c.cid,
       |        sum(CAST(round((f.x - c.cx) * (f.x - c.cx), 6)
       |          AS DECIMAL(18,6))) AS d2
       |      FROM f JOIN c USING (dim) GROUP BY 1, 2),
       |a AS (SELECT vec_id, cid FROM
       |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY d2, cid) AS rn FROM d)
       |      WHERE rn = 1)""".stripMargin

  /** [[assignCtes]] with the seed count DERIVED from the corpus size —
    * the all-BIGINT mirror of `Dedup.semanticK` (smallest k ≥ 8 with
    * 125·k² ≥ 4·n; the float sqrt only seeds a ±3 search window, the
    * verdict is integer — the srpAutoPlanes precedent). Keeps the two
    * semantic-dedup oracles provable at ANY corpus size instead of
    * pinning the fixtures' k = 8 (n = 500 and n = 2000 both derive
    * exactly 8, so fixture results are unchanged). 125·c·c on BIGINT
    * throws loudly past n ≈ 2.3×10¹⁵ in both engines.
    */
  private def assignCtesDerivedK: String =
    s"""n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |kk AS (SELECT min(c) AS k FROM
       |         (SELECT greatest(8, CAST(floor(sqrt(CAST(4*n AS DOUBLE)/125))
       |            AS BIGINT) - 1) + x AS c, n
       |          FROM n, unnest([0, 1, 2, 3]) AS u(x))
       |       WHERE c >= 8 AND 125*c*c >= 4*n),
       |e AS ($embCte),
       |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
       |        unnest(v) AS x FROM e),
       |seeds AS (SELECT vec_id FROM e ORDER BY vec_id
       |          LIMIT (SELECT k FROM kk)),
       |c AS (SELECT f.vec_id AS cid, f.dim, f.x AS cx
       |      FROM f JOIN seeds USING (vec_id)),
       |d AS (SELECT f.vec_id, c.cid,
       |        sum(CAST(round((f.x - c.cx) * (f.x - c.cx), 6)
       |          AS DECIMAL(18,6))) AS d2
       |      FROM f JOIN c USING (dim) GROUP BY 1, 2),
       |a AS (SELECT vec_id, cid FROM
       |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY d2, cid) AS rn FROM d)
       |      WHERE rn = 1)""".stripMargin

  /** CAPPED-mode assignment CTE chain — the all-SQL mirror of
    * `Dedup.cappedAssign` (targetClusterSize 125, 4 tables): BIGINT
    * Knuth-hash seed predicate, SRP plane count derived from the SEED
    * count (the srpAutoPlanes integer recurrence over the seed set, not
    * the corpus), buckets from the embedded seed-42 hyperplane prefix
    * (srpBucketTablesDynSql — bucket values equal `Similarity.lshBuckets`
    * at any np ≤ MaxOraclePlanes), candidates = vector×seed bucket-mates,
    * exact d2 via the fused-dot identity (per-pair accumulation order
    * identical to graft_dot — the TwoNN oracle precedent), argmin ties to
    * the lower seed id, bucket-orphans coalesce to their own singleton
    * cluster. Defines relations `e` (vec_id, v) and `a` (vec_id, cid) —
    * the same contract as [[assignCtesDerivedK]], so the dedup/sweep
    * tails are shared verbatim. Loud (DuckDB error()) past the
    * MaxOraclePlanes domain instead of silently under-bucketing.
    */
  private def cappedAssignCtes: String = {
    val seedPred =
      "((vec_id % 2147483648) * 2654435761) % 4294967296 % 125 = 0"
    s"""e AS ($embCte),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM embeddings
       |       WHERE $seedPred),
       |np AS (SELECT coalesce(
       |  (SELECT min(p) FROM range(2, ${MaxOraclePlanes + 1}) t(p)
       |   WHERE 32 * (1::BIGINT << p) >= (SELECT k FROM kk)),
       |  CAST(error('seed set needs > $MaxOraclePlanes SRP planes; extend MaxOraclePlanes') AS INT)) AS np),
       |ball AS (${srpBucketTablesDynSql(64, 4)}),
       |bs AS (SELECT * FROM ball WHERE $seedPred),
       |cand AS (SELECT q.vec_id AS id, c.vec_id AS cid
       |         FROM ball q JOIN bs c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |         GROUP BY 1, 2),
       |dd AS (SELECT cand.id, cand.cid,
       |        list_dot_product(qe.v, qe.v) + list_dot_product(ce.v, ce.v)
       |          - 2.0 * list_dot_product(qe.v, ce.v) AS d2
       |      FROM cand JOIN e qe ON qe.vec_id = cand.id
       |                JOIN e ce ON ce.vec_id = cand.cid),
       |best AS (SELECT id, cid FROM
       |           (SELECT id, cid, row_number() OVER (PARTITION BY id
       |              ORDER BY d2, cid) AS rn FROM dd)
       |         WHERE rn = 1),
       |a AS (SELECT e.vec_id, coalesce(best.cid, e.vec_id) AS cid
       |      FROM e LEFT JOIN best ON best.id = e.vec_id)""".stripMargin
  }

  /** Multinomial-NB model + per-doc argmax prediction CTE chain
    * (documents self-train, +1 smoothing, 6-dp score quantization,
    * ties to the smaller label) — shared by the ml_nb_accuracy /
    * ml_confusion / ml_class_report oracles, all of which consume the
    * final `pred(doc_id, pred)` relation.
    */
  private val nbPredCtes: String =
    """WITH t AS (SELECT doc_id, lang AS y,
      |        unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |          AS term FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |      FROM t GROUP BY 1, 2),
      |ct AS (SELECT y AS l, term, CAST(count(*) AS BIGINT) AS c
      |      FROM t GROUP BY 1, 2),
      |ctot AS (SELECT l, CAST(sum(c) AS BIGINT) AS nl FROM ct GROUP BY 1),
      |voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tf),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      |pri AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS dl
      |      FROM documents GROUP BY 1),
      |langs AS (SELECT pri.l, ctot.nl, voc.v,
      |        round(ln(CAST(dl AS DOUBLE) / CAST(nd.nd AS DOUBLE)), 6)
      |          AS lprior
      |      FROM pri CROSS JOIN nd CROSS JOIN voc
      |      JOIN ctot ON ctot.l = pri.l),
      |tll AS (SELECT tf.doc_id, langs.l, langs.lprior,
      |        round(CAST(tf AS DOUBLE) *
      |          ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE) /
      |            CAST(langs.nl + langs.v AS DOUBLE)), 6) AS ll
      |      FROM tf CROSS JOIN langs
      |      LEFT JOIN ct ON ct.l = langs.l AND ct.term = tf.term),
      |sc AS (SELECT doc_id, l,
      |        round(CAST(sum(CAST(ll AS DECIMAL(28,6))) AS DOUBLE)
      |          + lprior, 6) AS score
      |      FROM tll GROUP BY doc_id, l, lprior),
      |pred AS (SELECT doc_id, l AS pred FROM (
      |      SELECT doc_id, l, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, l) AS rn FROM sc) WHERE rn = 1)""".stripMargin

  /** Train/test-SPLIT variant of [[nbPredCtes]] with prefixed CTE names
    * — one instantiation per learning-curve training fraction. Unlike
    * the self-train chain (where train = test collapses the
    * distinction), vocabulary, class totals and priors here all come
    * from the TRAIN side, mirroring `ML.naiveBayesPredict` exactly.
    * Emits `<p>row(train_frac, n_train, n_test, n_correct, accuracy)`.
    */
  private def nbSplitRow(p: String, frac: String, trainWhere: String,
                         testWhere: String): String =
    s"""${p}tr AS (SELECT doc_id, lang AS y,
       |        unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |          AS term FROM documents WHERE $trainWhere),
       |${p}tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |      FROM (SELECT doc_id,
       |          unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |            AS term FROM documents WHERE $testWhere)
       |      GROUP BY 1, 2),
       |${p}ct AS (SELECT y AS l, term, CAST(count(*) AS BIGINT) AS c
       |      FROM ${p}tr GROUP BY 1, 2),
       |${p}ctot AS (SELECT l, CAST(sum(c) AS BIGINT) AS nl
       |      FROM ${p}ct GROUP BY 1),
       |${p}voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
       |      FROM ${p}ct),
       |${p}nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
       |      WHERE $trainWhere),
       |${p}pri AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS dl
       |      FROM documents WHERE $trainWhere GROUP BY 1),
       |${p}langs AS (SELECT ${p}pri.l, ${p}ctot.nl, ${p}voc.v,
       |        round(ln(CAST(dl AS DOUBLE) / CAST(${p}nd.nd AS DOUBLE)), 6)
       |          AS lprior
       |      FROM ${p}pri CROSS JOIN ${p}nd CROSS JOIN ${p}voc
       |      JOIN ${p}ctot ON ${p}ctot.l = ${p}pri.l),
       |${p}tll AS (SELECT ${p}tf.doc_id, ${p}langs.l, ${p}langs.lprior,
       |        round(CAST(tf AS DOUBLE) *
       |          ln(CAST(coalesce(${p}ct.c, 0) + 1 AS DOUBLE) /
       |            CAST(${p}langs.nl + ${p}langs.v AS DOUBLE)), 6) AS ll
       |      FROM ${p}tf CROSS JOIN ${p}langs
       |      LEFT JOIN ${p}ct ON ${p}ct.l = ${p}langs.l
       |        AND ${p}ct.term = ${p}tf.term),
       |${p}sc AS (SELECT doc_id, l,
       |        round(CAST(sum(CAST(ll AS DECIMAL(28,6))) AS DOUBLE)
       |          + lprior, 6) AS score
       |      FROM ${p}tll GROUP BY doc_id, l, lprior),
       |${p}pred AS (SELECT doc_id, l AS pred FROM (
       |      SELECT doc_id, l, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, l) AS rn FROM ${p}sc) WHERE rn = 1),
       |${p}row AS (SELECT $frac AS train_frac,
       |        (SELECT CAST(count(*) AS BIGINT) FROM documents
       |          WHERE $trainWhere) AS n_train,
       |        CAST(count(*) AS BIGINT) AS n_test,
       |        CAST(sum(CASE WHEN pred = d.lang THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_correct,
       |        round((CAST(sum(CASE WHEN pred = d.lang
       |            THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |          * 1000000) / 1000000 AS accuracy
       |      FROM ${p}pred JOIN documents d USING (doc_id))""".stripMargin

  /** SimHash oracle: rebuild the 64-bit fingerprints from the
    * ANSI-expressible token hash (ShingleUtil.tokenHash31 + the per-bit
    * affine remixes, constants embedded below), pack them into a BIGINT
    * (bit 63 via the two's-complement weight), then exact all-pairs
    * Hamming ≤ 3 — the pigeonhole blocking on the Spark side is lossless,
    * so blocked output ≡ all-pairs output.
    */
  private val simhashOracle: String = {
    import graft.expressions.ShingleUtil
    val p = ShingleUtil.SimHashPrime
    val bits = (0 until 64).map { k =>
      val a = ShingleUtil.simhashA(k)
      val b = ShingleUtil.simhashB(k)
      val weight = if (k == 63) "(-9223372036854775807 - 1)" else (1L << k).toString
      s"(CASE WHEN 2 * len(list_filter(hl, h -> (h * $a + $b) % $p >= 1073741824)) > len(hl) THEN CAST($weight AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH base AS ($docToks),
       |hs AS (SELECT doc_id, list_transform(toks, t ->
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(t, ''), c -> CAST(ord(c) AS BIGINT))),
       |           (acc, x) -> (acc * 131 + x) % $p)) AS hl
       |       FROM base WHERE len(toks) > 0),
       |sh AS (SELECT doc_id, $bits AS simhash FROM hs)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** IVF oracle: identical centroid selection (nClusters smallest
    * samplingHash(id)), nearest-centroid corpus assignment, nProbe query
    * probes, bucket join, per-query rank — the full inverted-list
    * pipeline in SQL.
    */
  private val ivfOracle: String =
    s"""WITH e AS ($embCte),
       |cent AS (SELECT vec_id AS centroid_id, v AS centroid FROM e
       |         ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |         LIMIT 16),
       |ca AS (SELECT vec_id, v, centroid_id,
       |              row_number() OVER (PARTITION BY vec_id
       |                ORDER BY list_cosine_similarity(v, centroid) DESC, centroid_id) AS r
       |       FROM e CROSS JOIN cent),
       |corp AS (SELECT vec_id AS neighbor_id, v AS cv, centroid_id FROM ca WHERE r <= 1),
       |qp AS (SELECT vec_id AS query_id, v AS qv, centroid_id FROM ca
       |       WHERE vec_id < 8 AND r <= 4),
       |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos
       |      FROM corp JOIN qp USING (centroid_id)
       |      WHERE query_id <> neighbor_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, round(cos, 6) AS cosine
       |FROM s
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** SRP-LSH ANN oracle: the seed-42 hyperplanes are embedded as literal
    * double arrays (java.util.Random's algorithm is pinned by the Java
    * spec and Double.toString round-trips exactly), buckets recomputed
    * per table, candidates = bucket-mates, then exact cosine rank.
    */
  /** Exact all-pairs cosine top-10 for the < 8 query vectors — shared by
    * ann_brute_topk and as the truth side of ann_recall.
    */
  private val bruteAnnOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qe FROM e WHERE vec_id < 8),
      |s AS (SELECT query_id, c.vec_id AS neighbor_id,
      |             list_cosine_similarity(qe, c.v) AS cos
      |      FROM q, e c WHERE c.vec_id <> query_id)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
      |  neighbor_id, round(cos, 6) AS cosine
      |FROM s
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** SQL for the exploded SRP bucket table over relation `e` (vec_id, v):
    * one SELECT per hash table with the seed-42 hyperplanes embedded as
    * literal double arrays (java.util.Random's algorithm is pinned by
    * the Java spec and Double.toString round-trips exactly) — mirrors
    * `Similarity.lshBuckets`. Shared by every oracle that reproduces an
    * SRP candidate set (ann_lsh_topk, the self-join kNN graph, the
    * ANN-fed TwoNN).
    */
  private def planeLit(pl: Array[Double]) =
    pl.map(_.toString).mkString("[", ", ", "]")

  private def srpBucketTablesSql(dim: Int, nPlanes: Int, nTables: Int): String = {
    (0 until nTables).map { t =>
      val planes = Similarity.hyperplanes(dim, nPlanes, 42L, t)
      val bucket = (0 until nPlanes).map { h =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(planes(h))}) >= 0 THEN ${1L << h} ELSE 0 END)"
      }.mkString("\n     + ")
      s"SELECT vec_id, v, $t AS tbl, $bucket AS bucket FROM e"
    }.mkString("\nUNION ALL\n")
  }

  private val srpAnnOracle: String = {
    val tables = srpBucketTablesSql(64, 8, 2)
    s"""WITH e AS ($embCte),
       |b AS ($tables),
       |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |         FROM b c JOIN b q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |         WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
       |         GROUP BY 1, 2),
       |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qe.v, ce.v) AS cos
       |      FROM cand JOIN e qe ON qe.vec_id = query_id
       |                JOIN e ce ON ce.vec_id = neighbor_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  neighbor_id, round(cos, 6) AS cosine
       |FROM s
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Directed all-corpus SRP candidate pairs (the
    * `Similarity.lshSelfCandidates` mirror): relation `cand` (id, nid),
    * multi-table collisions collapsed by the GROUP BY. Shared by the
    * self-kNN-graph and ANN-TwoNN oracles (each at its own recall/cost
    * operating point — see the query comments).
    */
  /** Largest SRP plane count the self-candidate oracles embed hyperplane
    * literals for. The Spark side derives its plane count from the live
    * corpus (`srpAutoPlanes(emb.count())`), so the DuckDB mirror must
    * too — through round 16 it instead pinned the count to the 500-vector
    * correctness fixtures, which made the 4 LSH-family rows fail BY
    * DESIGN on any other corpus size (sf0.1's 2,000 vectors → 6 planes
    * vs the pinned 4; r16 judge item 2). Now the SQL computes
    * `np = min p in [2, 16] with 32·2ᵖ ≥ count(*)` — the integer-domain
    * mirror of [[Similarity.srpAutoPlanes]] — and masks the embedded
    * plane terms to the first np. `hyperplanes` draws row-major from one
    * PRNG stream per table, so the np-plane set IS the prefix of the
    * 16-plane set for every np ≤ 16. 16 planes covers corpora up to
    * 32·2¹⁶ ≈ 2.1M vectors (sf ≈ 1000); beyond that the SQL raises via
    * DuckDB `error()` instead of silently under-bucketing.
    */
  private val MaxOraclePlanes = 16

  /** Corpus-derived plane count as a 1-row CTE: the all-integer mirror of
    * `srpAutoPlanes(count, target = 32)` (both sides pick the smallest p
    * with 32·2ᵖ ≥ n — no floating log₂ whose power-of-two ties could
    * ceil apart across engines).
    */
  private val srpNpCte: String =
    s"""np AS (SELECT coalesce(
       |  (SELECT min(p) FROM range(2, ${MaxOraclePlanes + 1}) t(p)
       |   WHERE 32 * (1::BIGINT << p) >= (SELECT count(*) FROM embeddings)),
       |  CAST(error('corpus needs > $MaxOraclePlanes SRP planes; extend MaxOraclePlanes') AS INT)) AS np)""".stripMargin

  /** Exploded SRP bucket table with the plane count taken from the `np`
    * CTE at query time: every table embeds all $MaxOraclePlanes seed-42
    * hyperplanes and each plane h contributes its 2ʰ bit only when
    * h < np, so the bucket value equals `Similarity.lshBuckets` run with
    * `srpAutoPlanes(count)` planes at ANY corpus size in the domain.
    */
  private def srpBucketTablesDynSql(dim: Int, nTables: Int): String =
    (0 until nTables).map { t =>
      val planes = Similarity.hyperplanes(dim, MaxOraclePlanes, 42L, t)
      val bucket = (0 until MaxOraclePlanes).map { h =>
        s"(CASE WHEN $h < np AND list_dot_product(v, ${planeLit(planes(h))}) >= 0 THEN ${1L << h} ELSE 0 END)"
      }.mkString("\n     + ")
      s"SELECT vec_id, v, $t AS tbl, $bucket AS bucket FROM e, np"
    }.mkString("\nUNION ALL\n")

  private def srpSelfCandCte(nTables: Int): String =
    s"""$srpNpCte,
       |b AS (${srpBucketTablesDynSql(64, nTables)}),
       |cand AS (SELECT q.vec_id AS id, c.vec_id AS nid
       |         FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |         WHERE q.vec_id <> c.vec_id
       |         GROUP BY 1, 2)""".stripMargin

  /** TwoNN exact-baseline oracle (shared with the agreement row). */
  private val twoNNExactOracle: String =
    s"""WITH e AS ($embCte),
       |n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
       |p AS (SELECT a.vec_id AS id, b.vec_id AS nid,
       |        a.n2 + b.n2 - 2.0 * list_dot_product(a.v, b.v) AS d2
       |      FROM n a, n b WHERE a.vec_id <> b.vec_id),
       |r AS (SELECT id, d2, row_number() OVER (PARTITION BY id
       |        ORDER BY d2, nid) AS rk
       |      FROM p QUALIFY rk <= 2),
       |g AS (SELECT id, min(CASE WHEN rk = 1 THEN d2 END) AS d1,
       |        min(CASE WHEN rk = 2 THEN d2 END) AS dn
       |      FROM r GROUP BY 1),
       |f AS (SELECT CAST(round(0.5 * ln(dn / d1), 9) AS DECIMAL(18,9))
       |        AS t
       |      FROM g WHERE d1 > 0 AND dn IS NOT NULL)
       |SELECT CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(round(sum(t), 6) AS DOUBLE) AS sum_log_mu,
       |  CAST(round((CAST(count(*) AS DOUBLE)
       |    / nullif(CAST(sum(t) AS DOUBLE), 0.0)
       |   ) * 1000000) / 1000000 AS DOUBLE) AS id_twonn
       |FROM f""".stripMargin

  /** ANN-fed TwoNN oracle: SRP self-candidates → per-pair squared-L2 via
    * the same dot identity (per-pair dots — identical accumulation order
    * to the fused graft_dot) → the IDENTICAL rank→μ→MLE tail as the
    * exact baseline.
    */
  private val twoNNAnnOracle: String =
    s"""WITH e AS ($embCte),
       |${srpSelfCandCte(8)},
       |p AS (SELECT cand.id, cand.nid,
       |        list_dot_product(qe.v, qe.v) + list_dot_product(ce.v, ce.v)
       |          - 2.0 * list_dot_product(qe.v, ce.v) AS d2
       |      FROM cand JOIN e qe ON qe.vec_id = cand.id
       |                JOIN e ce ON ce.vec_id = cand.nid),
       |r AS (SELECT id, d2, nid, row_number() OVER (PARTITION BY id
       |        ORDER BY d2, nid) AS rk
       |      FROM p QUALIFY rk <= 2),
       |g AS (SELECT id, min(CASE WHEN rk = 1 THEN d2 END) AS d1,
       |        min(CASE WHEN rk = 2 THEN d2 END) AS dn
       |      FROM r GROUP BY 1),
       |f AS (SELECT CAST(round(0.5 * ln(dn / d1), 9) AS DECIMAL(18,9))
       |        AS t
       |      FROM g WHERE d1 > 0 AND dn IS NOT NULL)
       |SELECT CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(round(sum(t), 6) AS DOUBLE) AS sum_log_mu,
       |  CAST(round((CAST(count(*) AS DOUBLE)
       |    / nullif(CAST(sum(t) AS DOUBLE), 0.0)
       |   ) * 1000000) / 1000000 AS DOUBLE) AS id_twonn
       |FROM f""".stripMargin

  /** Exact mutual-5-NN-graph oracle (shared with the agreement row). */
  private val knnGraphExactOracle: String =
    """WITH e AS (SELECT vec_id,
      |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |s AS (SELECT a.vec_id AS qid, c.vec_id AS nid,
      |        list_cosine_similarity(a.v, c.v) AS cos
      |      FROM e a, e c WHERE a.vec_id <> c.vec_id),
      |k AS (SELECT qid, nid, cos FROM s WHERE cos IS NOT NULL
      |      QUALIFY row_number() OVER (PARTITION BY qid
      |        ORDER BY cos DESC, nid) <= 5)
      |SELECT a.qid AS id_a, a.nid AS id_b, round(a.cos, 6) AS cosine
      |FROM k a JOIN k b ON a.qid = b.nid AND a.nid = b.qid
      |  AND a.qid < a.nid
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH-fed mutual-5-NN-graph oracle: the same mutuality filter over
    * per-vector top-5 among SRP bucket-mates. A zero-norm vector yields
    * NaN from list_cosine_similarity (sorts above everything in DuckDB);
    * Spark's graft_cosine returns NULL there and lshSelfTopK drops it —
    * the isnan guard filters identically.
    */
  private val knnGraphLshOracle: String =
    s"""WITH e AS ($embCte),
       |${srpSelfCandCte(8)},
       |s AS (SELECT cand.id AS qid, cand.nid,
       |        list_cosine_similarity(qe.v, ce.v) AS cos
       |      FROM cand JOIN e qe ON qe.vec_id = cand.id
       |                JOIN e ce ON ce.vec_id = cand.nid),
       |k AS (SELECT qid, nid, cos FROM s
       |      WHERE cos IS NOT NULL AND NOT isnan(cos)
       |      QUALIFY row_number() OVER (PARTITION BY qid
       |        ORDER BY cos DESC, nid) <= 5)
       |SELECT a.qid AS id_a, a.nid AS id_b, round(a.cos, 6) AS cosine
       |FROM k a JOIN k b ON a.qid = b.nid AND a.nid = b.qid
       |  AND a.qid < a.nid
       |ORDER BY id_a, id_b""".stripMargin

  /** LSH embedding-dedup oracle: rebuild the augmented corpus (original ∪
    * ε-perturbed copies — same hash noise, same operation order as
    * [[augmentedEmbeddings]]) and run the exact all-pairs cosine join; the
    * LSH path must recover every pair (miss probability ≈ 3e-12 per pair,
    * see the query's comment).
    */
  private val embedLshOracle: String = {
    val idx = (1 to 64).mkString("[", ", ", "]")
    s"""WITH e0 AS ($embCte),
       |aug AS (
       |  SELECT vec_id AS id, v FROM e0
       |  UNION ALL
       |  SELECT vec_id + 1000000, list_transform($idx, i ->
       |    v[i] * (CAST(1.0 AS DOUBLE) + CAST(0.003 AS DOUBLE) *
       |      ((((vec_id * 64 + i - 1) % 2147483648) * 2654435761) % 4294967296
       |        / CAST(2147483648.0 AS DOUBLE) - CAST(1.0 AS DOUBLE))))
       |  FROM e0)
       |SELECT a.id AS id_a, b.id AS id_b,
       |       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
       |FROM aug a JOIN aug b ON a.id < b.id
       |WHERE list_cosine_similarity(a.v, b.v) >= 0.95
       |ORDER BY id_a, id_b""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  (CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) - (SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) % 1) AS BIGINT) AS DOUBLE) + CAST(CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) % 1 AS DECIMAL(9,8)) * 100000000 AS BIGINT) AS DOUBLE) / 1e8) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate, c_custkey,
        |  (CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) - (SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) % 1) AS BIGINT) AS DOUBLE) + CAST(CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100000000) / 100000000 AS DECIMAL(18,8))) % 1 AS DECIMAL(9,8)) * 100000000 AS BIGINT) AS DOUBLE) / 1e8) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_volume" ->
      """SELECT n_name,
        |  (CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
        |    * 100000000) / 100000000 AS DECIMAL(18,8))) - (SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
        |    * 100000000) / 100000000 AS DECIMAL(18,8))) % 1) AS BIGINT) AS DOUBLE)
        |    + CAST(CAST(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
        |    * 100000000) / 100000000 AS DECIMAL(18,8))) % 1 AS DECIMAL(9,8)) * 100000000 AS BIGINT) AS DOUBLE) / 1e8) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY 1
        |      HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS signup_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY event_id""".stripMargin,

    "asof_join_forward" ->
      """SELECT l.event_id, l.user_id, r.value AS next_purchase
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY event_id""".stripMargin,

    // Mirrors asOfNearest exactly: backward + forward native ASOF, the
    // epoch-long direction pick with prior-wins ties, 48 h tolerance.
    // Backward + forward native ASOF, then the resampleInterpolate
    // interpolation/edge CASE on epoch longs with the shared
    // DECIMAL(24,12)->6dp rounding route.
    "asof_join_interp" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'purchase'),
        |b AS (SELECT l.event_id, r.value AS pv, r.ts AS pt
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.value AS nv, r.ts AS nt
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT l.event_id, l.user_id,
        |  CAST(round((CASE WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             WHEN epoch_us(nt) = epoch_us(pt) THEN pv
        |             ELSE pv + (nv - pv)
        |                    * CAST(epoch_us(l.ts) - epoch_us(pt) AS DOUBLE)
        |                    / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS purchase_at_click
        |FROM l JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "asof_join_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'purchase'),
        |b AS (SELECT l.event_id, r.value AS v_b, r.ts AS t_b
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.value AS v_f, r.ts AS t_f
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT l.event_id, l.user_id,
        |  CASE WHEN t_f IS NULL OR (t_b IS NOT NULL
        |            AND epoch(l.ts) - epoch(t_b) <= epoch(t_f) - epoch(l.ts))
        |       THEN CASE WHEN epoch(l.ts) - epoch(t_b) <= 172800 THEN v_b END
        |       ELSE CASE WHEN epoch(t_f) - epoch(l.ts) <= 172800 THEN v_f END
        |  END AS near_purchase
        |FROM l JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "ana_attribution" ->
      """WITH ft AS (SELECT user_id, ts AS touch_ts, event_id AS touch_id,
        |    event_type AS touch_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id, event_type) AS rn
        |  FROM events WHERE event_type IN ('click', 'view')),
        |t AS (SELECT user_id, touch_ts, touch_id, touch_type
        |      FROM ft WHERE rn = 1)
        |SELECT c.event_id AS conversion_id, c.user_id,
        |  CASE WHEN t.touch_ts <= c.ts THEN t.touch_id END AS touch_id,
        |  CASE WHEN t.touch_ts <= c.ts THEN t.touch_type END AS touch_type,
        |  CASE WHEN t.touch_ts <= c.ts THEN t.touch_ts END AS touch_ts
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') c
        |LEFT JOIN t ON t.user_id = c.user_id
        |ORDER BY conversion_id""".stripMargin,

    // CAST(floor(epoch)) — events carry fractional seconds; Spark's
    // unix_timestamp floors while a plain BIGINT cast would round.
    "ana_interval_union" ->
      """WITH iv AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      + CAST(floor(value * 60) AS BIGINT) AS end_s
        |  FROM events),
        |m AS (SELECT user_id, start_s, end_s,
        |    max(end_s) OVER (PARTITION BY user_id ORDER BY start_s, end_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |k AS (SELECT user_id, start_s, end_s,
        |    CASE WHEN prev_max IS NULL OR start_s > prev_max
        |         THEN 1 ELSE 0 END AS newi
        |  FROM m),
        |g AS (SELECT user_id, start_s, end_s,
        |    sum(newi) OVER (PARTITION BY user_id ORDER BY start_s, end_s
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM k)
        |SELECT user_id, min(start_s) AS covered_from, max(end_s) AS covered_to,
        |  max(end_s) - min(start_s) AS covered_seconds,
        |  count(*) AS n_intervals
        |FROM g GROUP BY user_id, island
        |ORDER BY user_id, covered_from""".stripMargin,

    // weight normalization mirrors the Scala double sum term-for-term
    // (VALUES literals are DECIMAL in DuckDB — cast before arithmetic)
    "sample_rates" ->
      """WITH w AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3),
        |    ('src2', 0.2)) t(source, wr)),
        |nw AS (SELECT source, CAST(wr AS DOUBLE) /
        |    (CAST(0.5 AS DOUBLE) + CAST(0.3 AS DOUBLE) + CAST(0.2 AS DOUBLE))
        |    AS w FROM w),
        |a AS (SELECT source, count(*) AS n_avail FROM documents GROUP BY 1),
        |j AS (SELECT a.source, a.n_avail, nw.w FROM a JOIN nw USING (source)),
        |t AS (SELECT min(CAST(n_avail AS DOUBLE) / w) AS t_max FROM j)
        |SELECT source, n_avail, round(w, 6) AS target_w,
        |  CAST(floor(w * t_max) AS BIGINT) AS take_n,
        |  round((CAST(floor(w * t_max) AS DOUBLE) / n_avail) * 1000000) / 1000000 AS rate
        |FROM j CROSS JOIN t ORDER BY source""".stripMargin,

    // n^0.5 routes through DECIMAL(24,12) -> 6dp on both engines; shares
    // divide DECIMAL-summed totals; boost divides the ROUNDED shares.
    "sample_temp_shares" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents
        |           GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        round((power(n_docs, 0.5)) * 1000000) / 1000000 AS w
        |      FROM c),
        |t AS (SELECT sum(n_docs) AS n_total,
        |        sum(CAST(w AS DECIMAL(24,6))) AS w_total FROM w)
        |SELECT source, n_docs,
        |  round((CAST(n_docs AS DOUBLE) / n_total) * 1000000) / 1000000
        |    AS raw_share,
        |  round((CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)) * 1000000)
        |    / 1000000 AS temp_share,
        |  round(((round((CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE))
        |        * 1000000) / 1000000)
        |    / (round((CAST(n_docs AS DOUBLE) / n_total) * 1000000)
        |        / 1000000)) * 1000000) / 1000000 AS boost
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin,

    // Kish ESS from the G-row count aggregate: exact decimal x integer
    // products, every rounding edge on the DECIMAL(24,12) cast.
    // PPS: one ordered cum line (window is fine for the oracle), the
    // same integer grid, interval membership by integer compares.
    "sample_pps" ->
      """WITH r AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
        |      FROM documents WHERE n_chars > 0),
        |line AS (SELECT doc_id, w,
        |        sum(w) OVER (ORDER BY doc_id) AS hi FROM r),
        |l2 AS (SELECT doc_id, w, hi, hi - w AS lo FROM line),
        |tot AS (SELECT max(hi) AS W FROM l2),
        |grid AS (SELECT CAST(j AS BIGINT) AS j,
        |        (2 * CAST(j AS BIGINT) + 1) * W // 100 AS t
        |      FROM range(50) r(j) CROSS JOIN tot)
        |SELECT j, doc_id, w AS weight
        |FROM l2 JOIN grid ON t >= lo AND t < hi
        |ORDER BY j""".stripMargin,

    // Hansen–Hurwitz: the same PPS line + grid, y = token count joined
    // onto each draw; per-draw terms y·W/w 9-dp DECIMAL-summed, the /n
    // and error divisions DECIMAL(24,12)-routed.
    "sample_ht_total" ->
      """WITH r AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |        CAST(len(list_filter(string_split(text, ' '),
        |          x -> x <> '')) AS BIGINT) AS y
        |      FROM documents WHERE n_chars > 0),
        |line AS (SELECT doc_id, w, y,
        |        sum(w) OVER (ORDER BY doc_id) AS hi FROM r),
        |l2 AS (SELECT doc_id, w, y, hi, hi - w AS lo FROM line),
        |tot AS (SELECT max(hi) AS W FROM l2),
        |yt AS (SELECT CAST(sum(y) AS BIGINT) AS y_true,
        |        CAST(sum(w) AS BIGINT) AS sw FROM r),
        |grid AS (SELECT CAST(j AS BIGINT) AS j,
        |        (2 * CAST(j AS BIGINT) + 1) * W // 100 AS t
        |      FROM range(50) g(j) CROSS JOIN tot),
        |dr AS (SELECT CAST(l2.y AS DOUBLE) * CAST(yt.sw AS DOUBLE)
        |          / CAST(l2.w AS DOUBLE) AS term, yt.y_true
        |      FROM l2 JOIN grid ON t >= lo AND t < hi CROSS JOIN yt),
        |g AS (SELECT y_true, CAST(count(*) AS BIGINT) AS n_draws,
        |        sum(CAST(round(term, 9) AS DECIMAL(28,9))) AS st
        |      FROM dr GROUP BY 1)
        |SELECT n_draws,
        |  CAST(round((CAST(st AS DOUBLE) / CAST(n_draws AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS hh_total,
        |  y_true AS true_total,
        |  CAST(round((CAST(st AS DOUBLE)
        |      / (CAST(n_draws AS DOUBLE) * CAST(y_true AS DOUBLE)) - 1.0
        |   ) * 1000000) / 1000000 AS DOUBLE) AS rel_error
        |FROM g""".stripMargin,

    // Neyman: exact HUGEINT moments -> 6-dp sample sd; shares compose
    // the published sds; allocations floor against the budget.
    "sample_neyman" ->
      """WITH m AS (SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(n_chars AS HUGEINT)) AS sx,
        |        sum(CAST(n_chars * n_chars AS HUGEINT)) AS sxx
        |      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |sds AS (SELECT stratum, n,
        |        CAST(round((sqrt(
        |          CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
        |          / nullif(CAST(n * (n - 1) AS DOUBLE), 0.0))
        |         ) * 1000000) / 1000000 AS DOUBLE) AS sd
        |      FROM m),
        |ws AS (SELECT stratum, n, sd,
        |        CAST(round(CAST(CAST(n AS DOUBLE) * sd
        |          AS DECIMAL(38,12)), 6) AS DECIMAL(38,6)) AS w6
        |      FROM sds),
        |tot AS (SELECT sum(w6) AS w_total FROM ws)
        |SELECT stratum, n, sd,
        |  CAST(round((CAST(w6 AS DOUBLE) / CAST(w_total AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS alloc_share,
        |  CAST(floor(1000.0 * CAST(round((CAST(w6 AS DOUBLE)
        |    / CAST(w_total AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE))
        |    AS BIGINT) AS alloc_n
        |FROM ws CROSS JOIN tot ORDER BY stratum""".stripMargin,

    // Negative sampler: same double-Knuth 62-bit draw mod the exact
    // x1e6 unigram^0.75 total, CDF membership by integer compares.
    "sample_negatives" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |top AS (SELECT term, freq FROM c ORDER BY freq DESC, term
         |      LIMIT 200),
         |v AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, term)
         |        - 1 AS BIGINT) AS term_id, term,
         |        CAST(CAST(round(pow(CAST(freq AS DOUBLE), 0.75), 6)
         |          AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS w6
         |      FROM top),
         |cdf AS (SELECT term_id, term, w6,
         |        sum(w6) OVER (ORDER BY term_id) AS hi FROM v),
         |cdf2 AS (SELECT term_id, term, hi - w6 AS lo, hi FROM cdf),
         |tot AS (SELECT max(hi) AS w_total FROM cdf2),
         |d AS (SELECT doc_id, CAST(j AS BIGINT) AS j
         |      FROM documents CROSS JOIN range(4) r(j)),
         |h AS (SELECT doc_id, j,
         |    (((((doc_id % 2147483648) * 4 + j) % 2147483648)
         |      * 2654435761) % 4294967296) // 2 AS ha,
         |    (((((doc_id % 2147483648) * 4 + j) % 2147483648)
         |      * 2246822519) % 4294967296) // 2 AS hb
         |  FROM d),
         |dr AS (SELECT doc_id, j,
         |        (ha * 2147483648 + hb) % w_total AS t
         |      FROM h CROSS JOIN tot)
         |SELECT dr.doc_id, dr.j, term_id AS neg_term_id,
         |  term AS neg_term
         |FROM dr JOIN cdf2 ON t >= lo AND t < hi
         |ORDER BY doc_id, j""".stripMargin,

    "sample_importance" ->
      """WITH c AS (SELECT lang AS grp, count(*) AS n_src FROM documents
        |      WHERE lang IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total,
        |        count(*) AS n_groups FROM c),
        |w AS (SELECT grp, n_src, n_total, n_groups,
        |        CAST(round((CAST(n_total AS DOUBLE)
        |          / CAST(n_groups * n_src AS DOUBLE)
        |         ) * 1000000000) / 1000000000 AS DOUBLE) AS weight
        |      FROM c CROSS JOIN t),
        |s AS (SELECT CAST(sum(CAST(
        |        round((weight * weight) * 1000000000) / 1000000000 * n_src
        |        AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sw2 FROM w)
        |SELECT grp AS lang, n_src,
        |  CAST(round((CAST(n_src AS DOUBLE) / CAST(n_total AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS source_share,
        |  CAST(round((1e0 / CAST(n_groups AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS target_share,
        |  weight,
        |  CAST(round((CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
        |    / CAST(sw2 AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE) AS ess,
        |  CAST(round((CAST(n_total AS DOUBLE) / CAST(sw2 AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS ess_ratio
        |FROM w CROSS JOIN s ORDER BY lang""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value >= 90
        |ORDER BY user_id""".stripMargin,

    "q_except_all" ->
      """SELECT event_type FROM events WHERE value > 1
        |EXCEPT ALL
        |SELECT event_type FROM events WHERE value > 2
        |ORDER BY event_type""".stripMargin,

    // Fixed-order IEEE mirror of Sketch.histQuantiles: same clamped
    // floor-binning, same lo + (bin+1)·w estimate.
    "sketch_histq" ->
      """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
        |             count(l_extendedprice) AS n FROM lineitem),
        |binned AS (SELECT CASE WHEN hi = lo THEN 0
        |             ELSE least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / 64)) AS BIGINT), 63)
        |             END AS bin, lo, hi, n
        |           FROM lineitem CROSS JOIN b
        |           WHERE l_extendedprice IS NOT NULL),
        |reg AS (SELECT bin, lo, hi, n, count(*) AS c FROM binned GROUP BY 1, 2, 3, 4),
        |cum AS (SELECT *, sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM reg),
        |-- ::DOUBLE: DuckDB's bare 0.9 is DECIMAL, whose exact ceil(q*n) can
        |-- cross an integer boundary the Spark side's IEEE double product
        |-- doesn't — both engines must do the cutoff in identical arithmetic.
        |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
        |SELECT q,
        |  round((lo + (bin + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS est,
        |  bin, n
        |FROM (SELECT q, lo, hi, n, min(bin) AS bin
        |      FROM qs CROSS JOIN cum
        |      WHERE cum >= ceil(q * n)
        |      GROUP BY 1, 2, 3, 4)
        |ORDER BY q""".stripMargin,

    "q_range_join" ->
      """SELECT c.event_id, s.event_id AS signup_id
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS p FROM events
        |      WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, epoch_ms(ts) AS st,
        |             epoch_ms(ts) + 3600000 AS en FROM events
        |      WHERE event_type = 'signup') s
        |  ON c.user_id = s.user_id AND c.p >= s.st AND c.p <= s.en
        |ORDER BY c.event_id, signup_id""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    // The bloom pre-filter admits a superset (false positives only); the
    // exact residual semi-join collapses it back to plain EXISTS.
    "q_bloom_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_nationkey = 5)
        |ORDER BY o_orderkey""".stripMargin,

    // Both engines interpolate lower + (upper - lower)·frac at position
    // (n-1)·q; round(…,6) absorbs any last-ulp libm divergence.
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS price_p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '2001-06-01 00:00:00')
        |ORDER BY p_partkey""".stripMargin,

    "q_union" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'view'
        |ORDER BY user_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS running_n,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY event_id""".stripMargin,

    // RANGE frame over epoch-micros (numeric order key in both engines,
    // so the interval arithmetic is exact integer comparison).
    "q_window_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |    AS sum_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
        |           FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS n_win,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS avg_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_winsorize" ->
      """WITH p AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  round(greatest(lo, least(hi, value)), 6) AS v_clamped
        |FROM events e JOIN p ON e.event_type = p.event_type
        |ORDER BY event_id""".stripMargin,

    "op01_json_positional" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "op02_json_auto" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "op03_04_catalog" ->
      """SELECT * FROM (VALUES
        |  ('artists', CAST(5 AS BIGINT)), ('songplays', 9), ('songs', 5),
        |  ('staging_events', 18), ('staging_songs', 10), ('time', 7),
        |  ('users', 5)) t(table_name, n_cols)
        |ORDER BY table_name""".stripMargin,

    "op05_insert_append" ->
      "SELECT CAST(2 * count(DISTINCT ts) AS BIGINT) AS n FROM events",

    // Closed forms of the five star-table cardinalities under the op17
    // staging mapping: every event matches exactly one song row on the
    // (song=title, artist=artist_name[, length=duration]) keys.
    "op17_pipeline_e2e" ->
      """SELECT 'artists' AS table_name, CAST(count(*) AS BIGINT) AS n FROM events
        |UNION ALL SELECT 'songplays', count(*) FROM events WHERE event_type = 'click'
        |UNION ALL SELECT 'songs', count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'time', count(DISTINCT ts) FROM events
        |UNION ALL SELECT 'users', count(*) FROM events
        |ORDER BY table_name""".stripMargin,

    "op06_join3" ->
      """WITH dim AS (SELECT l_partkey AS d_partkey, l_suppkey AS d_suppkey,
        |                    min(l_extendedprice) AS min_price
        |             FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, l.l_extendedprice
        |FROM lineitem l JOIN dim
        |  ON l.l_partkey = d_partkey AND l.l_suppkey = d_suppkey
        | AND l.l_extendedprice = min_price
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,

    "op07_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "op08_project" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity AS qty,
        |  l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem ORDER BY order_id, line_no, qty, net_price""".stripMargin,

    "op09_users_verbatim" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY event_id""".stripMargin,

    "op09_dedup_latest" ->
      """SELECT user_id, event_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "op10_nullif" ->
      """SELECT p_partkey, p_name, CASE WHEN p_size <> 1 THEN p_size END AS p_size_n
        |FROM part ORDER BY p_partkey""".stripMargin,

    "op11_join2" ->
      """WITH d AS (SELECT l_partkey, l_suppkey, count(*) AS n_li
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, d.n_li
        |FROM lineitem l JOIN d USING (l_partkey, l_suppkey)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "op12_distinct" ->
      "SELECT DISTINCT ts AS start_time FROM events ORDER BY start_time",

    "op13_timedim" ->
      """SELECT ts AS start_time,
        |  EXTRACT(hour FROM ts) AS hour, EXTRACT(day FROM ts) AS day,
        |  weekofyear(ts) AS week, EXTRACT(month FROM ts) AS month,
        |  EXTRACT(year FROM ts) AS year, dayofweek(ts) AS weekday
        |FROM (SELECT DISTINCT ts FROM events) ORDER BY start_time""".stripMargin,

    "op14_epoch_ms" ->
      """SELECT event_id, epoch_ms(epoch_ms(ts)) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,

    "op15_surrogate" ->
      """SELECT event_id, event_type,
        |  CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS sk
        |FROM events ORDER BY event_id""".stripMargin,

    "op16_typed_cast" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        |  CAST(l_quantity AS BIGINT) AS qty_int, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |ORDER BY l_orderkey, line_no, qty_int, l_returnflag""".stripMargin,

    "ana_top_parts" ->
      """SELECT l_partkey AS song_id, p_name AS title, count(*) AS n_plays
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY n_plays DESC, song_id LIMIT 10""".stripMargin,

    "ana_plays_by_time" ->
      """SELECT EXTRACT(hour FROM ts) AS hour, dayofweek(ts) AS weekday,
        |  count(*) AS n_plays
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ana_user_activity" ->
      """SELECT user_id, event_type AS level, count(*) AS n_plays,
        |  count(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER)) AS n_sessions
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ana_favorite_type" ->
      """SELECT user_id, artist_id, name, n_plays FROM (
        |  SELECT user_id, event_type AS artist_id, upper(event_type) AS name,
        |         count(*) AS n_plays
        |  FROM events GROUP BY 1, 2, 3) t
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n_plays DESC, artist_id) = 1
        |ORDER BY user_id""".stripMargin,

    // Each component mirrors the Scala side exactly: non-negative pmod
    // ((x % p) + p) % p, then NULL -> sentinel p-1. DuckDB's % keeps the
    // dividend's sign, so the +p fold is required for negative values.
    "q_checksum" ->
      """WITH h AS (
        |  SELECT coalesce(((event_id % 2147483647) + 2147483647) % 2147483647,
        |           2147483646) AS p1,
        |    coalesce(((user_id % 2147483647) + 2147483647) % 2147483647,
        |      2147483646) AS p2,
        |    coalesce(((epoch_us(ts) % 2147483647) + 2147483647) % 2147483647,
        |      2147483646) AS p3,
        |    coalesce(((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(length(event_type)),
        |        i -> ascii(substr(event_type, CAST(i + 1 AS INT), 1)))),
        |      (acc, c) -> (acc * 131 + c) % 2147483647)
        |      % 2147483647) + 2147483647) % 2147483647, 2147483646) AS p4
        |  FROM events),
        |m AS (SELECT ((((((p1 * 131 + p2) % 2147483647) * 131 + p3)
        |        % 2147483647) * 131 + p4) % 2147483647) AS mix FROM h)
        |SELECT count(*) AS n_rows,
        |  CAST(sum(mix) % 2147483647 AS BIGINT) AS checksum
        |FROM m""".stripMargin,

    "ana_funnel" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS reached FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |r2 AS (SELECT e.user_id, min(e.ts) AS reached FROM events e
        |       JOIN r1 ON e.user_id = r1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > r1.reached GROUP BY 1),
        |r3 AS (SELECT e.user_id, min(e.ts) AS reached FROM events e
        |       JOIN r2 ON e.user_id = r2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > r2.reached GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
        |         count(*) AS n_users FROM r1
        |  UNION ALL SELECT 2, 'click', count(*) FROM r2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM r3)
        |ORDER BY stage_idx""".stripMargin,

    // Anchored 24h window funnel: every signup starts a chain, each step
    // takes the earliest qualifying event inside the anchor's window.
    "ana_window_funnel" ->
      """WITH s0 AS (SELECT DISTINCT user_id AS u, epoch_us(ts) AS t0
        |      FROM events WHERE event_type = 'signup'),
        |h1 AS (SELECT user_id AS u, epoch_us(ts) AS ti FROM events
        |      WHERE event_type = 'click'),
        |c1 AS (SELECT u, t0, min(ti) AS tp FROM s0 JOIN h1 USING (u)
        |      WHERE ti > t0 AND ti <= t0 + 86400000000 GROUP BY 1, 2),
        |h2 AS (SELECT user_id AS u, epoch_us(ts) AS ti FROM events
        |      WHERE event_type = 'purchase'),
        |c2 AS (SELECT c1.u, c1.t0, min(ti) AS tp FROM c1 JOIN h2 USING (u)
        |      WHERE ti > c1.tp AND ti <= c1.t0 + 86400000000 GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
        |         (SELECT count(DISTINCT u) FROM s0) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(DISTINCT u) FROM c1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(DISTINCT u) FROM c2))
        |ORDER BY stage_idx""".stripMargin,

    "ana_retention" ->
      """WITH weeks AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1),
        |uw AS (SELECT DISTINCT user_id, week FROM weeks)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // LTV: weekly DECIMAL value sums + a per-cohort exact running total.
    "ana_cohort_ltv" ->
      """WITH weeks AS (SELECT user_id, date_trunc('week', ts) AS week,
        |        CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week
        |      FROM weeks GROUP BY 1),
        |wk AS (SELECT cohort_week,
        |        CAST(floor(date_diff('day', cohort_week, week) / 7.0)
        |          AS BIGINT) AS week_offset,
        |        count(*) AS n_events,
        |        CAST(sum(v) AS DECIMAL(38,6)) AS wv
        |      FROM weeks JOIN cohort USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_events,
        |  round(CAST(wv AS DOUBLE), 6) AS week_value,
        |  round(CAST(sum(wv) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset) AS DOUBLE), 6) AS cum_value
        |FROM wk ORDER BY 1, 2""".stripMargin,

    // Concentration ladder: one frequency table, per-threshold shares.
    "ana_concentration" -> {
      def one(k: Long) =
        s"""SELECT CAST($k AS BIGINT) AS threshold,
           |  count(*) AS users_ge,
           |  CAST(coalesce(sum(n), 0) AS BIGINT) AS events_ge
           |FROM ua WHERE n >= $k""".stripMargin
      s"""WITH ua AS (SELECT user_id AS u, count(*) AS n
         |      FROM events GROUP BY 1),
         |tot AS (SELECT count(*) AS n_users,
         |        CAST(sum(n) AS BIGINT) AS n_events FROM ua),
         |l AS (${Seq(1L, 2L, 4L, 8L, 16L).map(one).mkString("\nUNION ALL ")})
         |SELECT threshold, users_ge, events_ge,
         |  round((CAST(users_ge AS DOUBLE) / CAST(n_users AS DOUBLE)) * 1000000) / 1000000
         |    AS frac_users,
         |  round((CAST(events_ge AS DOUBLE) / CAST(n_events AS DOUBLE)) * 1000000) / 1000000
         |    AS frac_events
         |FROM l CROSS JOIN tot ORDER BY threshold""".stripMargin
    },

    // Rolling distinct via the same membership explode (0..6 day
    // offsets), exact distinct per target day, observed days only.
    "ana_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |      FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud),
        |spread AS (SELECT u, d + CAST(off AS INTEGER) AS day
        |      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6))
        |        AS off)),
        |rolling AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT)
        |        AS rolling_users FROM spread GROUP BY 1),
        |dau AS (SELECT d AS day, CAST(count(DISTINCT u) AS BIGINT)
        |        AS dau FROM ud GROUP BY 1)
        |SELECT day, dau, rolling_users
        |FROM days JOIN dau USING (day) JOIN rolling USING (day)
        |ORDER BY day""".stripMargin,

    // Gini by exact rank formula; rank×count sums ride DECIMAL(38,0).
    "ana_gini" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS x
        |      FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, x,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY x, user_id) AS i FROM c),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |        CAST(sum(x) AS BIGINT) AS n_events,
        |        sum(CAST(i * x AS DECIMAL(38,0))) AS six
        |      FROM r GROUP BY 1)
        |SELECT event_type, n_users, n_events,
        |  CAST(round((
        |    (2.0 * CAST(six AS DOUBLE) -
        |      CAST(n_users + 1 AS DOUBLE) * CAST(n_events AS DOUBLE)) /
        |    (CAST(n_users AS DOUBLE) * CAST(n_events AS DOUBLE))
        |   ) * 1000000) / 1000000 AS DOUBLE) AS gini
        |FROM a ORDER BY event_type""".stripMargin,

    // Elasticity: 6-dp-quantized lns scaled to exact ×10⁶ integers
    // (HUGEINT mirrors Spark's DECIMAL(38,0)); centered moments are
    // exact, so zero variance is exactly NULL on both engines.
    "ana_elasticity" ->
      """WITH r AS (SELECT p_brand AS grp,
        |        CAST(CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
        |            / CAST(l_quantity AS DOUBLE)), 6)
        |          AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS x,
        |        CAST(CAST(round(ln(CAST(l_quantity AS DOUBLE)), 6)
        |          AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS y
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      WHERE CAST(l_quantity AS DOUBLE) > 0
        |        AND CAST(l_extendedprice AS DOUBLE)
        |          / CAST(l_quantity AS DOUBLE) > 0),
        |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |        sum(x * y) AS sxy, sum(y * y) AS syy
        |      FROM r GROUP BY 1),
        |c AS (SELECT grp AS p_brand, n,
        |        CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS cxx,
        |        CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS cxy,
        |        CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy
        |      FROM m)
        |SELECT p_brand, n,
        |  CAST(round((cxy / nullif(cxx, 0.0)) * 1000000) / 1000000
        |    AS DOUBLE) AS elasticity,
        |  CAST(round(((cxy * cxy) / nullif(cxx * cyy, 0.0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS r2
        |FROM c ORDER BY p_brand""".stripMargin,

    "ana_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n FROM s
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // n_shingles == count of DISTINCT trigrams (hash-set cardinality);
    // signature length is the constant numPerms.
    "q_sql_native_fns" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2)
         |SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_shingles,
         |       CASE WHEN s.n IS NULL THEN NULL ELSE 32 END AS sig_len
         |FROM documents d
         |LEFT JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1) s
         |  ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_column_profile" ->
      """SELECT * FROM (
        |  SELECT 'event_type' AS col_name, count(*) AS n_rows,
        |    count(event_type) AS n_non_null,
        |    count(DISTINCT event_type) AS n_distinct FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(user_id),
        |    count(DISTINCT user_id) FROM events
        |  UNION ALL
        |  SELECT 'value', count(*), count(value),
        |    count(DISTINCT value) FROM events)
        |ORDER BY col_name""".stripMargin,

    "q_profile_stats" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  round(min(value), 6) AS v_min,
        |  round(max(value), 6) AS v_max,
        |  round(stddev_samp(value), 6) AS v_std
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_histogram" ->
      """SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 11
        |            ELSE CAST(floor(value / 10) AS BIGINT) + 1 END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // ((key mod 2^31) * 2654435761) mod 2^32 — Knuth multiplicative hash
    // with the key folded first so the product can't overflow BIGINT;
    // plain ANSI arithmetic so the oracle reproduces selections exactly.
    "sample_deterministic" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ((event_id % 2147483648) * 2654435761) % 4294967296
        |      < CAST(0.1 * 4294967296 AS BIGINT)
        |ORDER BY event_id""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) <= 40
        |ORDER BY doc_id""".stripMargin,

    // Mixture card: weights reconstructed from the source name
    // (w = substr(source,4)%4 + 1, Σw = 50 over src0..src19), the same
    // Bernoulli hash rule as sample_deterministic, identical IEEE op
    // order for target/rate/threshold.
    "sample_mixture_card" ->
      """WITH base AS (SELECT source,
        |        ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h,
        |        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |          AS BIGINT) AS n_tok
        |      FROM documents),
        |w AS (SELECT source,
        |        CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) AS w
        |      FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT source, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |      FROM base GROUP BY 1),
        |p AS (SELECT t.source, n_docs, total_tokens, w.w,
        |        10000.0 * w.w / 50.0 AS target_raw,
        |        least(1.0, (10000.0 * w.w / 50.0)
        |          / CAST(total_tokens AS DOUBLE)) AS rate
        |      FROM tot t JOIN w ON w.source = t.source),
        |kept AS (SELECT b.source, count(*) AS kept_docs,
        |        CAST(sum(b.n_tok) AS BIGINT) AS kept_tokens
        |      FROM base b JOIN p ON p.source = b.source
        |      WHERE b.h < CAST(floor(p.rate * 4294967296) AS BIGINT)
        |      GROUP BY 1),
        |tk AS (SELECT sum(kept_tokens) AS tk FROM kept)
        |SELECT p.source, n_docs, total_tokens,
        |  round(target_raw, 2) AS target_tokens,
        |  round(rate, 6) AS rate,
        |  coalesce(kept_docs, 0) AS kept_docs,
        |  CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  round((p.w / 50.0) * 1000000) / 1000000 AS target_share,
        |  round((CAST(coalesce(kept_tokens, 0) AS DOUBLE)
        |    / nullif(CAST(tk AS DOUBLE), 0.0)) * 1000000) / 1000000 AS achieved_share
        |FROM p LEFT JOIN kept USING (source) CROSS JOIN tk
        |ORDER BY p.source""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS text_md5
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "sample_shuffle" ->
      """SELECT doc_id, lang FROM documents
        |ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id""".stripMargin,

    // Temperature mixing (τ = 2): quotas from exact-DECIMAL-summed √n
    // weights, rows picked per source in samplingHash order. The √n →
    // DECIMAL(28,10) routing makes every step engine-identical (a double
    // can never hit the decimal cast's rounding tie — k.5×10⁻¹⁰ has a
    // factor-5 denominator).
    "sample_mixture" ->
      """WITH counts AS (SELECT lang, count(*) AS n_src FROM documents GROUP BY 1),
        |w AS (SELECT lang,
        |        CAST(sqrt(CAST(n_src AS DOUBLE)) AS DECIMAL(28,10)) AS w
        |      FROM counts),
        |t AS (SELECT sum(w) AS w_tot FROM w),
        |q AS (SELECT lang,
        |        CAST(floor(1000.0 * (CAST(w AS DOUBLE) / CAST(w_tot AS DOUBLE))) AS BIGINT) AS quota
        |      FROM w CROSS JOIN t),
        |r AS (SELECT d.doc_id, d.lang,
        |        row_number() OVER (PARTITION BY d.lang
        |          ORDER BY ((d.doc_id % 2147483648) * 2654435761) % 4294967296, d.doc_id) AS rn
        |      FROM documents d)
        |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    // One-shot CMS recomputed from the same ANSI hash chain (code-point
    // polynomial mod 2³¹−1, per-row affine remix, Knuth fold): counting
    // events through each key's (row, bucket) cells reproduces the
    // registers exactly, including cross-key collisions.
    "sketch_cms" -> {
      val consts = (0 until 4).map(r =>
        s"($r, ${1103515245L * (r + 1) % 2147483647L}, " +
          s"${12345L * (r + 1) % 2147483647L})").mkString(", ")
      s"""WITH consts(r, a, b) AS (VALUES $consts),
         |kh AS (
         |  SELECT event_type,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(length(event_type)),
         |        i -> ascii(substr(event_type, CAST(i + 1 AS INT), 1)))),
         |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         |  FROM (SELECT DISTINCT event_type FROM events) k),
         |kb AS (
         |  SELECT event_type, r,
         |    ((((h * a + b) % 2147483647) * 2654435761) % 4294967296) % 32 AS bucket
         |  FROM kh CROSS JOIN consts),
         |counts AS (
         |  SELECT kb.r, kb.bucket, count(*) AS cnt
         |  FROM events e JOIN kb ON e.event_type = kb.event_type
         |  GROUP BY kb.r, kb.bucket)
         |SELECT kb.event_type, min(c.cnt) AS est
         |FROM kb JOIN counts c ON kb.r = c.r AND kb.bucket = c.bucket
         |GROUP BY kb.event_type
         |ORDER BY kb.event_type""".stripMargin
    },

    // Count Sketch: one-shot rebuild of the same signed registers (merge
    // associativity is what the match proves); bucket chain as sketch_cms,
    // sign chain with its own (a, b) pair and the second multiplier;
    // median = quantile_disc 0.5 over the 5 signed reads (3rd of 5 —
    // exactly Spark's sorted element_at).
    "sketch_countsketch" -> {
      val consts = (0 until 5).map(r =>
        s"($r, ${1103515245L * (r + 1) % 2147483647L}, " +
          s"${12345L * (r + 1) % 2147483647L}, " +
          s"${1103515245L * (r + 101) % 2147483647L}, " +
          s"${12345L * (r + 101) % 2147483647L})").mkString(", ")
      s"""WITH consts(r, a, b, sa, sb) AS (VALUES $consts),
         |kh AS (
         |  SELECT event_type,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(length(event_type)),
         |        i -> ascii(substr(event_type, CAST(i + 1 AS INT), 1)))),
         |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         |  FROM (SELECT DISTINCT event_type FROM events) k),
         |kb AS (
         |  SELECT event_type, r,
         |    ((((h * a + b) % 2147483647) * 2654435761) % 4294967296)
         |      % 16 AS bucket,
         |    1 - 2 * (((((h * sa + sb) % 2147483647) * 2246822519)
         |      % 4294967296) % 2) AS sign
         |  FROM kh CROSS JOIN consts),
         |regs AS (
         |  SELECT kb.r, kb.bucket, sum(kb.sign) AS cnt
         |  FROM events e JOIN kb ON e.event_type = kb.event_type
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT kb.event_type, kb.sign * coalesce(regs.cnt, 0) AS est_r
         |  FROM kb LEFT JOIN regs ON regs.r = kb.r AND regs.bucket = kb.bucket)
         |SELECT event_type, CAST(quantile_disc(est_r, 0.5) AS BIGINT) AS est
         |FROM est GROUP BY 1 ORDER BY event_type""".stripMargin
    },

    // Same ANSI hash chain as sketch_cms at width 64 over stringified
    // user ids, then the (est DESC, key) top-20 cut.
    "sketch_cms_topk" -> {
      val consts = (0 until 4).map(r =>
        s"($r, ${1103515245L * (r + 1) % 2147483647L}, " +
          s"${12345L * (r + 1) % 2147483647L})").mkString(", ")
      s"""WITH consts(r, a, b) AS (VALUES $consts),
         |keys AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events),
         |kh AS (
         |  SELECT key,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(length(key)),
         |        i -> ascii(substr(key, CAST(i + 1 AS INT), 1)))),
         |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         |  FROM keys),
         |kb AS (
         |  SELECT key, r,
         |    ((((h * a + b) % 2147483647) * 2654435761) % 4294967296) % 64 AS bucket
         |  FROM kh CROSS JOIN consts),
         |ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
         |counts AS (
         |  SELECT kb.r, kb.bucket, count(*) AS cnt
         |  FROM ev e JOIN kb ON e.key = kb.key
         |  GROUP BY kb.r, kb.bucket)
         |SELECT kb.key, min(c.cnt) AS est
         |FROM kb JOIN counts c ON kb.r = c.r AND kb.bucket = c.bucket
         |GROUP BY kb.key
         |ORDER BY est DESC, key LIMIT 20""".stripMargin
    },

    // Width sweep: the same hash chain at 16/64/256 buckets, error
    // stats vs exact per-key counts.
    "sketch_cms_sweep" -> {
      val consts = (0 until 4).map(r =>
        s"($r, ${1103515245L * (r + 1) % 2147483647L}, " +
          s"${12345L * (r + 1) % 2147483647L})").mkString(", ")
      def one(w: Int) =
        s"""SELECT CAST($w AS BIGINT) AS width,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(round((CAST(sum(est - exact) AS DOUBLE) / count(*)
           |   ) * 1000000) / 1000000 AS DOUBLE) AS mean_over,
           |  CAST(max(est - exact) AS BIGINT) AS max_over,
           |  CAST(round((CAST(sum(CASE WHEN est = exact THEN 1
           |      ELSE 0 END) AS DOUBLE) / count(*)
           |   ) * 1000000) / 1000000 AS DOUBLE) AS frac_exact
           |FROM (
           |  SELECT kb.key, min(c.cnt) AS est, min(ex.exact) AS exact
           |  FROM (SELECT key, r,
           |        ((((h * a + b) % 2147483647) * 2654435761)
           |          % 4294967296) % $w AS bucket
           |      FROM kh CROSS JOIN consts) kb
           |  JOIN (SELECT kb2.r, kb2.bucket, count(*) AS cnt
           |      FROM ev e JOIN (SELECT key, r,
           |            ((((h * a + b) % 2147483647) * 2654435761)
           |              % 4294967296) % $w AS bucket
           |          FROM kh CROSS JOIN consts) kb2 ON e.key = kb2.key
           |      GROUP BY kb2.r, kb2.bucket) c
           |    ON kb.r = c.r AND kb.bucket = c.bucket
           |  JOIN (SELECT key, count(*) AS exact FROM ev GROUP BY 1) ex
           |    ON ex.key = kb.key
           |  GROUP BY kb.key)""".stripMargin
      s"""WITH consts(r, a, b) AS (VALUES $consts),
         |keys AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key
         |      FROM events),
         |kh AS (
         |  SELECT key,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(length(key)),
         |        i -> ascii(substr(key, CAST(i + 1 AS INT), 1)))),
         |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         |  FROM keys),
         |ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events)
         |SELECT * FROM (${Seq(16, 64, 256).map(one).mkString(
            "\nUNION ALL\n")})
         |ORDER BY width""".stripMargin
    },

    // HLL registers from the Knuth 32-bit fold of event_id: bucket = low
    // 6 bits, ρ = lowest-set-bit position of the 26-bit suffix (unrolled
    // CASE — no loops, no log2). The harmonic sum uses shift-then-divide
    // (exact powers of two), so everything before the final round(.,4)
    // is bit-pinned across engines.
    "sketch_hll" -> {
      val alphaM2 = 0.709 * 64 * 64
      val rhoCase = (1 to 26).map(j =>
        s"WHEN w % ${1L << j} = ${1L << (j - 1)} THEN $j").mkString(" ")
      s"""WITH h1 AS (
         |  SELECT ((event_id % 2147483648) * 2654435761) % 4294967296 AS h1
         |  FROM events),
         |h2 AS (SELECT (xor(h1, h1 >> 16) * 1597334677) % 4294967296 AS h2 FROM h1),
         |h AS (SELECT xor(h2, h2 >> 16) AS h FROM h2),
         |wb AS (SELECT h % 64 AS bucket, h // 64 AS w FROM h),
         |rho AS (SELECT bucket,
         |  CASE WHEN w = 0 THEN 27 $rhoCase END AS rho FROM wb),
         |reg AS (SELECT bucket, max(rho) AS max_rho FROM rho GROUP BY bucket),
         |agg AS (SELECT count(*) AS nonzero,
         |  sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s
         |  FROM reg)
         |SELECT CAST(64 AS BIGINT) AS m,
         |  CAST(64 - nonzero AS BIGINT) AS zeros,
         |  CAST((s + (64 - nonzero)) * 134217728 AS BIGINT) AS sum_inv_scaled,
         |  round(CASE WHEN CAST('$alphaM2' AS DOUBLE) / (s + (64 - nonzero)) <= 160
         |               AND nonzero < 64
         |        THEN 64 * ln(CAST(64 AS DOUBLE) / (64 - nonzero))
         |        ELSE CAST('$alphaM2' AS DOUBLE) / (s + (64 - nonzero)) END
         |    * 10000) / 10000 AS est
         |FROM agg""".stripMargin
    },

    // Same pipeline as sketch_hll, keyed by user_id and carried per
    // event_type through every stage; the small per-group cardinality
    // activates the linear-counting CASE branch.
    "sketch_hll_grouped" -> {
      val alphaM2 = 0.709 * 64 * 64
      val rhoCase = (1 to 26).map(j =>
        s"WHEN w % ${1L << j} = ${1L << (j - 1)} THEN $j").mkString(" ")
      s"""WITH h1 AS (
         |  SELECT event_type,
         |    ((user_id % 2147483648) * 2654435761) % 4294967296 AS h1
         |  FROM events),
         |h2 AS (SELECT event_type,
         |  (xor(h1, h1 >> 16) * 1597334677) % 4294967296 AS h2 FROM h1),
         |h AS (SELECT event_type, xor(h2, h2 >> 16) AS h FROM h2),
         |wb AS (SELECT event_type, h % 64 AS bucket, h // 64 AS w FROM h),
         |rho AS (SELECT event_type, bucket,
         |  CASE WHEN w = 0 THEN 27 $rhoCase END AS rho FROM wb),
         |reg AS (SELECT event_type, bucket, max(rho) AS max_rho
         |        FROM rho GROUP BY 1, 2),
         |agg AS (SELECT event_type, count(*) AS nonzero,
         |  sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s
         |  FROM reg GROUP BY 1)
         |SELECT event_type, CAST(64 AS BIGINT) AS m,
         |  CAST(64 - nonzero AS BIGINT) AS zeros,
         |  CAST((s + (64 - nonzero)) * 134217728 AS BIGINT) AS sum_inv_scaled,
         |  round(CASE WHEN CAST('$alphaM2' AS DOUBLE) / (s + (64 - nonzero)) <= 160
         |               AND nonzero < 64
         |        THEN 64 * ln(CAST(64 AS DOUBLE) / (64 - nonzero))
         |        ELSE CAST('$alphaM2' AS DOUBLE) / (s + (64 - nonzero)) END
         |    * 10000) / 10000 AS est
         |FROM agg ORDER BY event_type""".stripMargin
    },

    "text_scrub" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(text, '${TextAnalysis.urlPattern}', '<URL>', 'g'),
         |    '${TextAnalysis.emailPattern}', '<EMAIL>', 'g') AS text_scrubbed
         |FROM documents ORDER BY doc_id""".stripMargin,

    // chunkLen 40, step 30; the k bound (range 0..63) is generous for the
    // corpus' ≤100-token docs and the WHERE re-derives the exact count
    // (kMax = ceil((n − 40)/30), min 0 — no pure-suffix trailing chunk).
    "text_chunk" ->
      s"""WITH base AS ($docToks),
         |nz AS (SELECT doc_id, toks, len(toks) AS n FROM base WHERE len(toks) > 0)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
         |  array_to_string(toks[k * 30 + 1 : k * 30 + 40], ' ') AS chunk_text
         |FROM nz CROSS JOIN range(0, 64) t(k)
         |WHERE k <= greatest(CAST(ceil((n - 40) / 30.0) AS BIGINT), 0)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "dedup_decontaminate" ->
      s"""SELECT p.doc_a, p.doc_b, da.source AS group_a, db.source AS group_b, p.jaccard
         |FROM ($ngramJaccardOracle) p
         |JOIN documents da ON p.doc_a = da.doc_id
         |JOIN documents db ON p.doc_b = db.doc_id
         |WHERE da.source <> db.source
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardOracle,

    "dedup_ngram_prefix" -> ngramJaccardOracle,

    "dedup_minhash_lsh" -> ngramJaccardOracle,

    // LSH S-curve: the ANSI MinHash (affine perms of the polynomial
    // shingle hash), bands, candidates, and exact-Jaccard buckets all
    // rebuilt; theory term by pure squaring (no pow).
    "dedup_lsh_curve" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t,
         |        generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id,
         |        a.t || ' ' || b.t || ' ' || c.t AS shingle
         |      FROM toks a
         |      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |xh AS (SELECT doc_id, shingle,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range(length(shingle)),
         |            i -> ascii(substr(shingle, CAST(i + 1 AS INT), 1)))),
         |          (acc, c) -> (acc * 131 + c) % 2147483647) AS x
         |      FROM sh),
         |pm AS (SELECT CAST(p AS BIGINT) AS p FROM range(16) t(p)),
         |hp AS (SELECT doc_id, p,
         |        (x * ((1103515245 * (p + 1)) % 2147483647)
         |          + ((12345 * (p + 1)) % 2147483647)) % 2147483647 AS h
         |      FROM xh CROSS JOIN pm),
         |sig AS (SELECT doc_id, p, min(h) AS m FROM hp GROUP BY 1, 2),
         |bk AS (SELECT doc_id, (p - p % 2) // 2 AS band,
         |        min(CASE WHEN p % 2 = 0 THEN m END) AS m0,
         |        min(CASE WHEN p % 2 = 1 THEN m END) AS m1
         |      FROM sig GROUP BY 1, 2),
         |bkey AS (SELECT doc_id, band,
         |        (m0 * 131 + m1) % 2147483647 AS bkey FROM bk),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |      FROM bkey a JOIN bkey b ON a.band = b.band
         |        AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT x2.doc_id AS da, y2.doc_id AS db,
         |        count(*) AS ni
         |      FROM sh x2 JOIN sh y2 ON x2.shingle = y2.shingle
         |        AND x2.doc_id < y2.doc_id
         |      GROUP BY 1, 2),
         |scored AS (SELECT i2.da, i2.db,
         |        round((CAST(ni AS DOUBLE)
         |          / CAST(sa.n + sb.n - ni AS DOUBLE)) * 1000000) / 1000000 AS j,
         |        CASE WHEN cand.da IS NOT NULL THEN 1 ELSE 0 END AS c
         |      FROM inter i2
         |      JOIN sizes sa ON sa.doc_id = i2.da
         |      JOIN sizes sb ON sb.doc_id = i2.db
         |      LEFT JOIN cand ON cand.da = i2.da AND cand.db = i2.db),
         |bkt AS (SELECT CAST(least(floor(j * 10.0), 9.0) AS BIGINT)
         |        AS bucket, c FROM scored),
         |agg AS (SELECT bucket, count(*) AS n_pairs,
         |        CAST(sum(c) AS BIGINT) AS n_candidates
         |      FROM bkt GROUP BY 1),
         |thy AS (SELECT bucket, n_pairs, n_candidates,
         |        1.0 - ((CAST(bucket AS DOUBLE) + 0.5) / 10.0)
         |            * ((CAST(bucket AS DOUBLE) + 0.5) / 10.0) AS y
         |      FROM agg)
         |SELECT bucket,
         |  round((CAST(bucket AS DOUBLE) + 0.5) / 10.0, 2) AS s_mid,
         |  n_pairs, n_candidates,
         |  round((CAST(n_candidates AS DOUBLE) / CAST(n_pairs AS DOUBLE)) * 1000000) / 1000000
         |    AS measured_rate,
         |  round(1.0 - (y * y) * (y * y) * ((y * y) * (y * y)), 6)
         |    AS theoretical_rate
         |FROM thy ORDER BY bucket""".stripMargin,

    // MinHash estimator card: same ANSI signatures, per-pair agreement
    // count over the p-aligned join, bias/RMSE per exact-j decile.
    "dedup_winnowing" -> winnowingOracle,

    "dedup_winnow_pairs" -> winnowingPairsOracle,

    "dedup_minhash_est" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t,
         |        generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id,
         |        a.t || ' ' || b.t || ' ' || c.t AS shingle
         |      FROM toks a
         |      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |xh AS (SELECT doc_id, shingle,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range(length(shingle)),
         |            i -> ascii(substr(shingle, CAST(i + 1 AS INT), 1)))),
         |          (acc, c) -> (acc * 131 + c) % 2147483647) AS x
         |      FROM sh),
         |pm AS (SELECT CAST(p AS BIGINT) AS p FROM range(16) t(p)),
         |hp AS (SELECT doc_id, p,
         |        (x * ((1103515245 * (p + 1)) % 2147483647)
         |          + ((12345 * (p + 1)) % 2147483647)) % 2147483647 AS h
         |      FROM xh CROSS JOIN pm),
         |sig AS (SELECT doc_id, p, min(h) AS m FROM hp GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT x2.doc_id AS da, y2.doc_id AS db,
         |        count(*) AS ni
         |      FROM sh x2 JOIN sh y2 ON x2.shingle = y2.shingle
         |        AND x2.doc_id < y2.doc_id
         |      GROUP BY 1, 2),
         |pj AS (SELECT i2.da, i2.db,
         |        round((CAST(ni AS DOUBLE)
         |          / CAST(sa.n + sb.n - ni AS DOUBLE)) * 1000000) / 1000000 AS j
         |      FROM inter i2
         |      JOIN sizes sa ON sa.doc_id = i2.da
         |      JOIN sizes sb ON sb.doc_id = i2.db),
         |ag AS (SELECT pj.da, pj.db, j,
         |        CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_agree
         |      FROM pj JOIN sig a ON a.doc_id = pj.da
         |      JOIN sig b ON b.doc_id = pj.db AND b.p = a.p
         |      GROUP BY 1, 2, 3),
         |es AS (SELECT j,
         |        round((CAST(n_agree AS DOUBLE) / 16.0) * 1000000) / 1000000 AS est FROM ag),
         |bk2 AS (SELECT CAST(least(floor(j * 10.0), 9.0) AS BIGINT)
         |        AS bucket, j, est FROM es)
         |SELECT bucket, count(*) AS n_pairs,
         |  round((CAST(sum(CAST(round((est - j) * 1000000) / 1000000 AS DECIMAL(18,6)))
         |    AS DOUBLE) / count(*)) * 1000000) / 1000000 AS mean_bias,
         |  round(sqrt(CAST(sum(CAST(round(((est - j) * (est - j)) * 1000000000) / 1000000000
         |    AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |    * 1000000) / 1000000
         |    AS rmse
         |FROM bk2 GROUP BY 1 ORDER BY bucket""".stripMargin,

    "dedup_simhash" -> simhashOracle,

    // Exact connected components via transitive closure over the same
    // pair set the Spark side derives (the all-pairs Jaccard oracle,
    // nested as a subquery); singletons keep their own id.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $clusterLabelsCte
         |SELECT doc_id, cluster_id FROM clusters
         |ORDER BY doc_id""".stripMargin,

    "dedup_digest" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $clusterLabelsCte,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM clusters GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM sz GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    // Same exact-Jaccard >= 0.3 candidate definition as the Spark side
    // (string trigrams here vs 64-bit shingle hashes there — identical
    // sets modulo ~N²/2⁶⁵ collisions), then the same Levenshtein cut;
    // both engines implement unit-cost edit distance.
    "dedup_edit_distance" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
         |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |pr AS (SELECT da, db FROM inter
         |       JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |       WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.3)
         |SELECT da AS doc_a, db AS doc_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
         |FROM pr JOIN documents a ON a.doc_id = da JOIN documents b ON b.doc_id = db
         |WHERE levenshtein(a.text, b.text) <= 10
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_tf_cosine" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |nm AS (SELECT doc_id, sum(tf * tf) AS sq FROM tf GROUP BY 1),
         |d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |        sum(a.tf * b.tf) AS dot
         |      FROM tf a JOIN tf b
         |        ON a.term = b.term AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |c AS (SELECT doc_a, doc_b,
         |        CAST(dot AS DOUBLE) /
         |          (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))
         |          AS cos
         |      FROM d JOIN nm na ON na.doc_id = d.doc_a
         |             JOIN nm nb ON nb.doc_id = d.doc_b)
         |SELECT doc_a, doc_b, round(cos, 6) AS tf_cosine
         |FROM c WHERE cos >= 0.95
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_containment" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
         |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
         |          GROUP BY 1, 2)
         |SELECT da AS doc_a, db AS doc_b,
         |       CAST(ni AS DOUBLE) / sa.n AS containment
         |FROM inter JOIN sizes sa ON sa.doc_id = da
         |WHERE CAST(ni AS DOUBLE) / sa.n >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Distinct 16-token window STRINGS in SQL vs distinct 64-bit window
    // hashes in Spark — identical counts modulo ~N²/2⁶⁵ collisions.
    "dedup_substring" ->
      s"""WITH base AS ($docToks),
         |st AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 15)) AS s
         |       FROM base WHERE len(toks) >= 16),
         |w AS (SELECT DISTINCT doc_id,
         |        array_to_string(list_slice(toks, s, s + 15), ' ') AS win
         |      FROM st)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // String trigrams mirror the Spark side's 64-bit shingle hashes
    // (identical distinct sets modulo ~N²/2⁶⁵ collisions — the same
    // precedent as the ngram-Jaccard oracles); ratios are single exact
    // divisions of BIGINT counts.
    "dedup_source_overlap" ->
      """WITH base AS (SELECT doc_id, source,
        |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents),
        |t AS (SELECT doc_id, source, unnest(toks) AS tok,
        |        generate_subscripts(toks, 1) AS i FROM base),
        |sh AS (SELECT DISTINCT a.source,
        |        a.tok || ' ' || b.tok || ' ' || c.tok AS g
        |      FROM t a
        |      JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |      JOIN t c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT x.source AS source_a, y.source AS source_b,
        |        count(*) AS shared
        |      FROM sh x JOIN sh y ON x.g = y.g AND x.source < y.source
        |      GROUP BY 1, 2),
        |sp AS (SELECT x.source AS source_a, y.source AS source_b,
        |        x.n AS n_a, y.n AS n_b
        |      FROM sizes x JOIN sizes y ON x.source < y.source)
        |SELECT sp.source_a, sp.source_b, n_a, n_b,
        |  coalesce(shared, 0) AS shared,
        |  round((CAST(coalesce(shared, 0) AS DOUBLE)
        |    / (n_a + n_b - coalesce(shared, 0))) * 1000000) / 1000000 AS jaccard,
        |  round((CAST(coalesce(shared, 0) AS DOUBLE)
        |    / least(n_a, n_b)) * 1000000) / 1000000 AS containment
        |FROM sp LEFT JOIN shared USING (source_a, source_b)
        |ORDER BY source_a, source_b""".stripMargin,

    "dedup_keep_best" ->
      s"""WITH RECURSIVE $clusterLabelsCte,
         |m AS (SELECT c.cluster_id, c.doc_id, d.n_chars,
         |        row_number() OVER (PARTITION BY c.cluster_id
         |          ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk,
         |        count(*) OVER (PARTITION BY c.cluster_id) AS n_members
         |      FROM clusters c JOIN documents d USING (doc_id))
         |SELECT cluster_id, doc_id AS keep_id,
         |  CAST(n_members AS BIGINT) AS n_members,
         |  CAST(n_chars AS BIGINT) AS best_score
         |FROM m WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "sample_split" ->
      s"""WITH RECURSIVE $clusterLabelsCte
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ((cluster_id % 2147483648) * 2654435761) % 4294967296
         |         < ${Sampling.splitCut(0.1)} THEN 'val'
         |       WHEN ((cluster_id % 2147483648) * 2654435761) % 4294967296
         |         < ${Sampling.splitCut(0.2)} THEN 'test'
         |       ELSE 'train' END AS split
         |FROM clusters ORDER BY doc_id""".stripMargin,

    "dedup_embed_lsh" -> embedLshOracle,

    "ann_ivf_topk" -> ivfOracle,

    "ann_lsh_topk" -> srpAnnOracle,

    // list_transform to DOUBLE first: DuckDB computes FLOAT[] cosines in
    // float32, Spark casts to array<double> — must match Spark's double math.
    "dedup_embed_cosine" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_brute_topk" -> bruteAnnOracle,

    // Mutual 5-NN graph: exact brute k-NN per vector, then the pair
    // survives only when membership is mutual (a < b).
    "ann_knn_graph" -> knnGraphExactOracle,

    // LSH-fed mutual 5-NN graph: identical mutuality filter, SRP
    // bucket-mate candidates instead of all pairs.
    "ann_knn_graph_lsh" -> knnGraphLshOracle,

    // Edge-overlap agreement of the LSH graph vs the brute graph: three
    // scalar counts over the two committed graph oracles.
    "ann_knn_graph_agree" ->
      s"""WITH ex AS (SELECT id_a, id_b FROM ($knnGraphExactOracle)),
         |an AS (SELECT id_a, id_b FROM ($knnGraphLshOracle))
         |SELECT
         |  (SELECT count(*) FROM ex) AS n_exact_edges,
         |  (SELECT count(*) FROM an) AS n_ann_edges,
         |  (SELECT count(*) FROM ex JOIN an USING (id_a, id_b))
         |    AS n_common,
         |  round((CAST((SELECT count(*) FROM ex JOIN an USING (id_a, id_b))
         |      AS DOUBLE)
         |    / nullif(CAST((SELECT count(*) FROM ex) AS DOUBLE), 0.0)) * 1000000) / 1000000
         |    AS edge_recall,
         |  round((CAST((SELECT count(*) FROM ex JOIN an USING (id_a, id_b))
         |      AS DOUBLE)
         |    / nullif(CAST((SELECT count(*) FROM ex) AS DOUBLE)
         |      + CAST((SELECT count(*) FROM an) AS DOUBLE)
         |      - CAST((SELECT count(*) FROM ex JOIN an USING (id_a, id_b))
         |          AS DOUBLE), 0.0)) * 1000000) / 1000000 AS jaccard""".stripMargin,

    // MIPS mirror: list_inner_product for graft_dot, 6-dp-rounded
    // before the rank window (same membership discipline as cosine).
    "ann_mips_topk" ->
      s"""WITH e AS ($embCte),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |        round(list_inner_product(q.qv, e.v), 6) AS dot
         |      FROM q JOIN e ON e.vec_id <> q.query_id
         |      WHERE list_inner_product(q.qv, e.v) IS NOT NULL),
         |r AS (SELECT query_id, neighbor_id, dot,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT query_id, rank, neighbor_id, dot FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // Range search mirror: cosines are 6-dp rounded BEFORE the threshold
    // test on both engines (boundary-safe); NaN (zero-norm) → NULL never
    // matches.
    "ann_range" ->
      s"""WITH e AS ($embCte),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |        round(CASE WHEN isnan(list_cosine_similarity(q.qv, e.v))
         |          THEN NULL
         |          ELSE list_cosine_similarity(q.qv, e.v) END, 6) AS cosine
         |      FROM q JOIN e ON e.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, cosine FROM s
         |WHERE cosine >= 0.3
         |ORDER BY query_id, neighbor_id""".stripMargin,

    "dedup_source_report" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  round((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)) * 1000000) / 1000000
        |    AS dup_rate
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    // SemDeDup mirror: assignment CTEs with the corpus-DERIVED seed
    // count (assignCtesDerivedK — BIGINT recurrence, k = 8 at every
    // committed fixture), then the one-pass "any lower-id cluster-mate
    // within cosine 0.4" drop rule — cluster-scoped pairs only, exactly
    // the Spark join. A zero-norm vector yields NaN from
    // list_cosine_similarity and DuckDB sorts/compares NaN as greater
    // than everything; Spark's graft_cosine returns NULL there (never a
    // duplicate) — the CASE maps NaN -> NULL so `NULL >= 0.4` filters
    // the pair identically.
    "dedup_semantic" ->
      s"""WITH $assignCtesDerivedK,
         |v AS (SELECT e.vec_id, a.cid, e.v FROM e JOIN a USING (vec_id)),
         |dup AS (SELECT DISTINCT b.vec_id
         |        FROM v x JOIN v b ON x.cid = b.cid AND x.vec_id < b.vec_id
         |        WHERE (CASE WHEN isnan(list_cosine_similarity(x.v, b.v))
         |                 THEN NULL
         |                 ELSE list_cosine_similarity(x.v, b.v) END) >= 0.4)
         |SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cluster_id,
         |  dup.vec_id IS NULL AS kept
         |FROM v LEFT JOIN dup ON dup.vec_id = v.vec_id
         |ORDER BY v.vec_id""".stripMargin,

    // Threshold-sweep mirror: the same cluster-scoped pair pass as
    // dedup_semantic (derived-k assignment, 6-dp-rounded cosines,
    // NaN → NULL matches nothing), counted once per candidate threshold.
    "dedup_threshold_sweep" ->
      s"""WITH $assignCtesDerivedK,
         |v AS (SELECT e.vec_id, a.cid, e.v FROM e JOIN a USING (vec_id)),
         |p AS (SELECT round(CASE WHEN isnan(list_cosine_similarity(x.v, y.v))
         |          THEN NULL
         |          ELSE list_cosine_similarity(x.v, y.v) END, 6) AS cos
         |      FROM v x JOIN v y ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |t AS (SELECT CAST(unnest([0.2, 0.3, 0.4, 0.5]) AS DOUBLE)
         |        AS threshold)
         |SELECT threshold, CAST(count(p.cos) AS BIGINT) AS n_pairs
         |FROM t LEFT JOIN p ON p.cos >= t.threshold
         |GROUP BY 1 ORDER BY threshold""".stripMargin,

    // Capped-mode SemDeDup mirror: cappedAssignCtes (hash seeds, SRP ANN
    // assignment with the plane count derived from the seed count,
    // bucket-orphans as singletons) + the IDENTICAL drop-pass tail as
    // dedup_semantic — the mode is entirely a clustering choice, and
    // both sides share their tails verbatim.
    "dedup_semantic_capped" ->
      s"""WITH $cappedAssignCtes,
         |v AS (SELECT e.vec_id, a.cid, e.v FROM e JOIN a USING (vec_id)),
         |dup AS (SELECT DISTINCT b.vec_id
         |        FROM v x JOIN v b ON x.cid = b.cid AND x.vec_id < b.vec_id
         |        WHERE (CASE WHEN isnan(list_cosine_similarity(x.v, b.v))
         |                 THEN NULL
         |                 ELSE list_cosine_similarity(x.v, b.v) END) >= 0.4)
         |SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cluster_id,
         |  dup.vec_id IS NULL AS kept
         |FROM v LEFT JOIN dup ON dup.vec_id = v.vec_id
         |ORDER BY v.vec_id""".stripMargin,

    // Capped-mode threshold-sweep mirror: same capped clustering, same
    // 6-dp-rounded pair-cosine counters as dedup_threshold_sweep.
    "dedup_threshold_sweep_capped" ->
      s"""WITH $cappedAssignCtes,
         |v AS (SELECT e.vec_id, a.cid, e.v FROM e JOIN a USING (vec_id)),
         |p AS (SELECT round(CASE WHEN isnan(list_cosine_similarity(x.v, y.v))
         |          THEN NULL
         |          ELSE list_cosine_similarity(x.v, y.v) END, 6) AS cos
         |      FROM v x JOIN v y ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |t AS (SELECT CAST(unnest([0.2, 0.3, 0.4, 0.5]) AS DOUBLE)
         |        AS threshold)
         |SELECT threshold, CAST(count(p.cos) AS BIGINT) AS n_pairs
         |FROM t LEFT JOIN p ON p.cos >= t.threshold
         |GROUP BY 1 ORDER BY threshold""".stripMargin,

    // Hard negatives: brute ranking restricted to cross-cluster pairs;
    // assignment CTEs shared with the kmeans oracle (k=4). The Spark
    // side drops NULL cosines (zero-norm vectors); DuckDB yields NaN
    // there and ranks it FIRST under `cos DESC` — the CASE + IS NOT
    // NULL guard excludes undefined cosines identically in both engines.
    "ann_hard_negatives" ->
      s"""WITH ${assignCtes(4)},
         |q AS (SELECT e.vec_id AS query_id, e.v AS qv, a.cid AS qcid
         |      FROM e JOIN a USING (vec_id) WHERE e.vec_id < 8),
         |s AS (SELECT q.query_id, ce.vec_id AS neighbor_id,
         |        CAST(ca.cid AS BIGINT) AS neighbor_cluster,
         |        CASE WHEN isnan(list_cosine_similarity(q.qv, ce.v))
         |          THEN NULL
         |          ELSE list_cosine_similarity(q.qv, ce.v) END AS cos
         |      FROM q JOIN e ce ON ce.vec_id <> q.query_id
         |      JOIN a ca ON ca.vec_id = ce.vec_id AND ca.cid <> q.qcid
         |      WHERE cos IS NOT NULL)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
         |  neighbor_id, neighbor_cluster, round(cos, 6) AS cosine
         |FROM s
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Both sides are the committed oracles of ann_lsh_topk / ann_brute_topk
    // wrapped as derived tables; recall math mirrors Similarity.recallAtK.
    "ann_recall" ->
      s"""WITH l AS (SELECT query_id, neighbor_id FROM ($srpAnnOracle)),
         |b AS (SELECT query_id, neighbor_id FROM ($bruteAnnOracle)),
         |m AS (SELECT b.query_id, count(l.neighbor_id) AS hits,
         |        count(*) AS k
         |      FROM b LEFT JOIN l ON l.query_id = b.query_id
         |        AND l.neighbor_id = b.neighbor_id
         |      GROUP BY 1)
         |SELECT count(*) AS n_queries,
         |  round((CAST(sum(CAST(round((CAST(hits AS DOUBLE) / k) * 1000000)
         |    / 1000000 AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 1000000)
         |    / 1000000 AS mean_recall
         |FROM m""".stripMargin,

    // Binary-quantization recall: the same two-half sign codes, Hamming
    // rank, recall vs the exact cosine pairs.
    "emb_binary_recall" ->
      s"""WITH e AS ($embCte),
         |fl AS (SELECT vec_id, unnest(v) AS x,
         |        generate_subscripts(v, 1) - 1 AS i FROM e),
         |codes AS (SELECT vec_id,
         |        bit_or(CASE WHEN x > 0 AND i < 32
         |          THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
         |          ELSE CAST(0 AS BIGINT) END) AS lo,
         |        bit_or(CASE WHEN x > 0 AND i >= 32
         |          THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INTEGER)
         |          ELSE CAST(0 AS BIGINT) END) AS hi
         |      FROM fl GROUP BY 1),
         |q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi
         |      FROM codes WHERE vec_id < 8),
         |appx AS (SELECT query_id, neighbor_id FROM (
         |      SELECT query_id, c.vec_id AS neighbor_id,
         |        bit_count(xor(qlo, c.lo)) + bit_count(xor(qhi, c.hi))
         |          AS ham
         |      FROM q, codes c WHERE c.vec_id <> query_id)
         |      QUALIFY row_number() OVER (PARTITION BY query_id
         |        ORDER BY ham, neighbor_id) <= 10),
         |b AS (SELECT query_id, neighbor_id FROM ($bruteAnnOracle)),
         |m AS (SELECT b.query_id, count(appx.neighbor_id) AS hits,
         |        count(*) AS k
         |      FROM b LEFT JOIN appx ON appx.query_id = b.query_id
         |        AND appx.neighbor_id = b.neighbor_id
         |      GROUP BY 1)
         |SELECT count(*) AS n_queries,
         |  round((CAST(sum(CAST(round((CAST(hits AS DOUBLE) / k) * 1000000)
         |    / 1000000 AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 1000000)
         |    / 1000000 AS mean_recall
         |FROM m""".stripMargin,

    // Matryoshka: the brute oracle re-ranked on list prefixes, each
    // prefix's pairs recall-scored against the full-dim exact pairs.
    "emb_matryoshka" -> {
      def one(p: Int) =
        s"""SELECT CAST($p AS BIGINT) AS prefix_dim,
           |  CAST(count(*) AS BIGINT) AS n_queries,
           |  round((CAST(sum(CAST(round((CAST(hits AS DOUBLE) / k) * 1000000)
           |    / 1000000 AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 1000000)
         |    / 1000000 AS mean_recall
           |FROM (SELECT b.query_id, count(t.neighbor_id) AS hits,
           |        count(*) AS k
           |      FROM b LEFT JOIN (
           |        SELECT query_id, neighbor_id FROM (
           |          SELECT query_id, c.vec_id AS neighbor_id,
           |            list_cosine_similarity(qe[1:$p], c.v[1:$p]) AS cos
           |          FROM q, e c WHERE c.vec_id <> query_id)
           |        QUALIFY row_number() OVER (PARTITION BY query_id
           |          ORDER BY cos DESC, neighbor_id) <= 10) t
           |        ON t.query_id = b.query_id
           |          AND t.neighbor_id = b.neighbor_id
           |      GROUP BY 1)""".stripMargin
      s"""WITH e AS (SELECT vec_id,
         |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |      FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qe FROM e
         |      WHERE vec_id < 8),
         |b AS (SELECT query_id, neighbor_id FROM (
         |      SELECT query_id, c.vec_id AS neighbor_id,
         |        list_cosine_similarity(qe, c.v) AS cos
         |      FROM q, e c WHERE c.vec_id <> query_id)
         |      QUALIFY row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) <= 10)
         |SELECT * FROM (${Seq(32, 16, 8).map(one).mkString(
            "\nUNION ALL\n")})
         |ORDER BY prefix_dim""".stripMargin
    },

    "text_quality" ->
      s"""WITH base AS ($docToks)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
         |    / len(toks) AS avg_token_len,
         |  CAST(len(list_filter(toks, t -> list_contains($stopwordList, t))) AS DOUBLE)
         |    / len(toks) AS stopword_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
         |FROM base ORDER BY doc_id""".stripMargin,

    // Same argmax-with-priority as TextAnalysis.langId: lang i wins iff
    // its score beats (strictly) all earlier and (weakly) all later
    // (langidScoreAndCase builds both SQL pieces).
    "text_langid" -> {
      val (scores, cases) = langidScoreAndCase
      s"""WITH base AS ($docToks),
         |scored AS (SELECT doc_id,
         |  $scores
         |FROM base)
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE $cases
         |    ELSE 'und' END AS lang_pred
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    // MLM plan: same (doc,pos) Knuth hash chain, 15%-cut at
    // floor(0.15·2^32), 80/10/10 action split, vocab replacement by
    // (h div 10) mod |vocab|.
    "text_mlm_masking" ->
      s"""WITH base AS ($docToks),
         |tk AS (SELECT doc_id,
         |        CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
         |        unnest(toks) AS token FROM base),
         |hh AS (SELECT doc_id, pos, token,
         |        (((((doc_id % 2147483648) * 2654435761) % 4294967296
         |          + pos) % 2147483648) * 2654435761) % 4294967296 AS h
         |      FROM tk),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |top AS (SELECT term, freq FROM c ORDER BY freq DESC, term
         |      LIMIT 200),
         |v AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, term)
         |        - 1 AS BIGINT) AS term_id, term FROM top),
         |vs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         |m AS (SELECT * FROM hh WHERE h < 644245094)
         |SELECT m.doc_id, m.pos, m.token,
         |  CASE WHEN h % 10 < 8 THEN 'mask'
         |       WHEN h % 10 = 8 THEN 'random' ELSE 'keep' END AS action,
         |  CASE WHEN h % 10 < 8 THEN '[MASK]'
         |       WHEN h % 10 = 8 THEN v.term ELSE m.token END AS replacement
         |FROM m CROSS JOIN vs
         |LEFT JOIN v ON v.term_id = (m.h // 10) % vs.n
         |ORDER BY doc_id, pos""".stripMargin,

    // Confusion of langId vs the labeled lang: counts + row-normalized
    // recall shares.
    "text_langid_eval" -> {
      val (scores, cases) = langidScoreAndCase
      s"""WITH base AS ($docToks),
         |scored AS (SELECT doc_id,
         |  $scores
         |FROM base),
         |pred AS (SELECT doc_id, CASE $cases
         |    ELSE 'und' END AS lang_pred FROM scored),
         |conf AS (SELECT d.lang AS lang_true, p.lang_pred,
         |        CAST(count(*) AS BIGINT) AS n
         |      FROM documents d JOIN pred p ON p.doc_id = d.doc_id
         |      GROUP BY 1, 2),
         |tot AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS t
         |      FROM conf GROUP BY 1)
         |SELECT lang_true, lang_pred, n,
         |  round((CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) / 1000000
         |    AS frac_of_true
         |FROM conf JOIN tot USING (lang_true)
         |ORDER BY lang_true, lang_pred""".stripMargin
    },

    // Same langid scaffolding joined back to the declared tag; an 'und'
    // prediction mismatches every declared tag.
    "text_lang_mismatch" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        val markers = m.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, t -> list_contains($markers, t))) AS BIGINT) AS s_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val cases = langs.zipWithIndex.map { case (lang, i) =>
        val earlier = langs.take(i).map(l => s"s_$lang > s_$l")
        val later = langs.drop(i + 1).map(l => s"s_$lang >= s_$l")
        val conds = (earlier ++ later :+ s"s_$lang > 0").mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }.mkString("\n    ")
      s"""WITH base AS ($docToks),
         |scored AS (SELECT doc_id,
         |  $scores
         |FROM base),
         |pred AS (SELECT doc_id,
         |  CASE $cases
         |    ELSE 'und' END AS lang_pred
         |FROM scored)
         |SELECT p.doc_id, d.lang AS lang_declared, p.lang_pred,
         |  p.lang_pred <> d.lang AS mismatch
         |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
         |ORDER BY p.doc_id""".stripMargin
    },

    "text_token_counts" ->
      s"""WITH base AS ($docToks)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.subwordPattern.replace("\\", "\\\\")}')) AS BIGINT) AS n_subwords,
         |  CAST(list_aggregate(list_transform(toks, t -> (length(t) + 3) // 4), 'sum') AS BIGINT) AS n_bpe_est
         |FROM base ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""WITH base AS ($docToks)
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(toks, t ->
         |        (length(t) * 131 + ascii(substr(t, 1, 1)) * 7 + ascii(right(t, 1))) % 1000000007)),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         |FROM base ORDER BY doc_id""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id, trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh2 AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t AS s
         |        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
         |sh3 AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS s
         |        FROM toks a
         |        JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |        JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |n2 AS (SELECT doc_id, count(*) AS d2 FROM sh2 GROUP BY 1),
         |n3 AS (SELECT doc_id, count(*) AS d3 FROM sh3 GROUP BY 1)
         |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(b.toks) - 1 > 0
         |       THEN CAST(1.0 AS DOUBLE) - CAST(coalesce(d2, 0) AS DOUBLE) / (len(b.toks) - 1) END AS dup2_ratio,
         |  CASE WHEN len(b.toks) - 2 > 0
         |       THEN CAST(1.0 AS DOUBLE) - CAST(coalesce(d3, 0) AS DOUBLE) / (len(b.toks) - 2) END AS dup3_ratio
         |FROM base b LEFT JOIN n2 USING (doc_id) LEFT JOIN n3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Mirrors the two-stage cut exactly: unit vectors, floor-rounded int8
    // codes, EXACT-integer code dot (every partial sum < 2^27 — no float
    // ordering), rescale in the same left-to-right product order, rerank.
    "ann_refine" ->
      s"""WITH e AS ($embCte),
         |n AS (SELECT vec_id,
         |        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
         |      FROM e WHERE list_dot_product(v, v) > 0),
         |s AS (SELECT vec_id, u,
         |        list_aggregate(list_transform(u, x -> abs(x)), 'max') AS scale
         |      FROM n),
         |qt AS (SELECT vec_id, u, scale,
         |         list_transform(u, x -> floor(x * 127.0 / scale + 0.5)) AS q
         |       FROM s WHERE scale > 0),
         |qry AS (SELECT * FROM qt WHERE vec_id < 8),
         |coarse AS (SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
         |             c.u AS cu, qr.u AS qu,
         |             list_dot_product(c.q, qr.q) * c.scale * qr.scale AS coarse
         |           FROM qt c, qry qr WHERE c.vec_id <> qr.vec_id),
         |cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY coarse DESC, neighbor_id) AS crank FROM coarse),
         |rer AS (SELECT query_id, neighbor_id,
         |          list_cosine_similarity(qu, cu) AS cos
         |        FROM cand WHERE crank <= 40)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
         |  neighbor_id, round(cos, 6) AS cosine
         |FROM rer
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cos DESC, neighbor_id) <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "q_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "emb_quantize" ->
      s"""WITH e AS ($embCte),
         |s AS (SELECT vec_id, v,
         |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
         |      FROM e)
         |SELECT vec_id, round(scale, 6) AS scale, CAST(i - 1 AS BIGINT) AS i,
         |  CAST(floor(v[i] * CAST(127.0 AS DOUBLE) / scale + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |FROM s CROSS JOIN range(1, 65) t(i)
         |WHERE scale > 0
         |ORDER BY vec_id, i""".stripMargin,

    // Per-row IEEE math end-to-end (square-sum fold ≡ list_dot_product,
    // correctly-rounded sqrt, exact divide); 6-dp rounding is house style.
    "emb_normalize" ->
      s"""WITH e AS ($embCte),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
         |SELECT vec_id, CAST(i - 1 AS BIGINT) AS i, round((v[i] / nrm) * 1000000) / 1000000 AS x
         |FROM n CROSS JOIN range(1, 65) t(i)
         |WHERE nrm > 0
         |ORDER BY vec_id, i""".stripMargin,

    "text_tfidf" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, tf, df,
         |        tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
         |      FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, term ASC) AS rnk FROM s)
         |SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, tf, df,
         |  round(tfidf, 6) AS tfidf
         |FROM r WHERE rnk <= 5 ORDER BY doc_id, rank""".stripMargin,

    "text_vocab" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |top AS (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 200)
         |SELECT CAST(row_number() OVER (ORDER BY freq DESC, term) - 1 AS BIGINT)
         |    AS term_id, term, freq
         |FROM top ORDER BY term_id""".stripMargin,

    // Gini over the same ranked vocabulary: BIGINT numerator
    // Σ f·(n − 2·term_id − 1), one rounded division.
    "text_gini" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |top AS (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 200),
         |v AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, term) - 1
         |          AS BIGINT) AS term_id, freq FROM top),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |        CAST(sum(freq) AS BIGINT) AS total FROM v)
         |SELECT n_terms, total,
         |  round((CAST(sum(freq * (n_terms - 2 * term_id - 1)) AS DOUBLE) /
         |    (CAST(n_terms AS DOUBLE) * CAST(total AS DOUBLE))) * 1000000)
         |    / 1000000 AS gini
         |FROM v CROSS JOIN tot GROUP BY n_terms, total""".stripMargin,

    // Keyness: the vocabulary CTE, a sources×vocab spine, the four
    // ln-odds operands as exact-integer-plus-half doubles in the Spark
    // side's operation order, z rounded before the rank.
    "text_keyness" ->
      """WITH t AS (SELECT source,
        |        unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |          AS term FROM documents),
        |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
        |v AS (SELECT term, CAST(freq AS BIGINT) AS y_w FROM (
        |      SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 200)),
        |sw AS (SELECT t.source, t.term, CAST(count(*) AS BIGINT) AS y_sw
        |      FROM t JOIN v ON v.term = t.term GROUP BY 1, 2),
        |srcs AS (SELECT source, CAST(sum(y_sw) AS BIGINT) AS n_s
        |      FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM srcs),
        |spine AS (SELECT s.source, s.n_s, v.term, v.y_w,
        |        CAST(coalesce(sw.y_sw, 0) AS BIGINT) AS y_sw
        |      FROM srcs s CROSS JOIN v
        |      LEFT JOIN sw ON sw.source = s.source AND sw.term = v.term),
        |z AS (SELECT source, term, y_sw,
        |        round((ln((CAST(y_sw AS DOUBLE) + 0.5) /
        |            (CAST(n_s - y_sw AS DOUBLE) + 0.5))
        |          - ln((CAST(y_w - y_sw AS DOUBLE) + 0.5) /
        |            (CAST(n - n_s - (y_w - y_sw) AS DOUBLE) + 0.5)))
        |          / sqrt(1.0 / (CAST(y_sw AS DOUBLE) + 0.5)
        |            + 1.0 / (CAST(y_w - y_sw AS DOUBLE) + 0.5)), 6) AS z
        |      FROM spine CROSS JOIN tot)
        |SELECT source, rank, term, y_sw, z FROM (
        |  SELECT source, term, y_sw, z,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY z DESC, term) AS BIGINT) AS rank FROM z)
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    // PII scan: len(regexp_extract_all) is Spark's
    // size(regexp_extract_all) — same RE dialect subset (classes,
    // bounded repeats), zero matches is the honest report on this corpus.
    "text_pii_scan" ->
      """SELECT source, count(*) AS n_rows,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
        |    AS n_email,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_email,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))) AS BIGINT)
        |    AS n_ipv4,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_ipv4,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '\+?[0-9][0-9() -]{6,}[0-9]'))) AS BIGINT) AS n_phone,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(text,
        |    '\+?[0-9][0-9() -]{6,}[0-9]')) > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rows_phone,
        |  CAST(sum(len(regexp_extract_all(text, '[0-9]{4,}'))) AS BIGINT)
        |    AS n_digitrun,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(text, '[0-9]{4,}')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_digitrun
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // Late-data accounting: the sf-scale oracle collapses the two-level
    // prefix max to ONE global strictly-before window over the
    // hash-shuffled arrival key (a bijection on Z_2^31 — odd multiplier
    // — so arrival order is total and tie-free on both engines);
    // epoch-micros BIGINTs throughout, nothing floats.
    "stream_late_events" ->
      """WITH e AS (SELECT ((event_id % 2147483648) * 2654435761)
        |          % 2147483648 AS arr,
        |        epoch_us(ts) AS t, event_type AS etype FROM events),
        |w AS (SELECT etype, t,
        |        max(t) OVER (ORDER BY arr ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND 1 PRECEDING) AS pm
        |      FROM e)
        |SELECT etype AS event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN pm IS NOT NULL AND t < pm - 604800000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  max(CASE WHEN pm IS NOT NULL AND t < pm - 604800000000
        |    THEN pm - 604800000000 - t END) AS max_late_us
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    // HLL set ops: the sketch_hll register/estimator chain instantiated
    // per side (click / purchase) on user_id, union = register-wise max,
    // inclusion–exclusion on the three 4-dp estimates.
    "sketch_hll_setops" -> {
      val m = 1024
      val wBits = 22
      val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m
      val rhoCase = (1 to wBits).map(j =>
        s"WHEN w % ${1L << j} = ${1L << (j - 1)} THEN $j").mkString(" ")
      def reg(nm: String, cond: String) =
        s"""${nm}_h1 AS (SELECT ((event_id % 2147483648) * 2654435761)
           |    % 4294967296 AS h1 FROM events WHERE $cond),
           |${nm}_h2 AS (SELECT (xor(h1, h1 >> 16) * 1597334677)
           |    % 4294967296 AS h2 FROM ${nm}_h1),
           |${nm}_h AS (SELECT xor(h2, h2 >> 16) AS h FROM ${nm}_h2),
           |${nm}_wb AS (SELECT h % $m AS bucket, h // $m AS w FROM ${nm}_h),
           |${nm}_rho AS (SELECT bucket,
           |    CASE WHEN w = 0 THEN ${wBits + 1} $rhoCase END AS rho
           |    FROM ${nm}_wb),
           |${nm}_reg AS (SELECT bucket, max(rho) AS max_rho
           |    FROM ${nm}_rho GROUP BY bucket)""".stripMargin
      def est(nm: String, src: String) =
        s"""${nm}_agg AS (SELECT count(*) AS nonzero,
           |    sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << max_rho)) AS s
           |    FROM $src),
           |${nm}_est AS (SELECT
           |    round(CASE WHEN CAST('$alphaM2' AS DOUBLE)
           |          / (s + ($m - nonzero)) <= ${2.5 * m} AND nonzero < $m
           |      THEN $m * ln(CAST($m AS DOUBLE) / ($m - nonzero))
           |      ELSE CAST('$alphaM2' AS DOUBLE) / (s + ($m - nonzero)) END
           |      * 10000) / 10000 AS est FROM ${nm}_agg)""".stripMargin
      s"""WITH ${reg("a", "event_id % 10 < 6")},
         |${reg("b", "event_id % 10 >= 4")},
         |u_reg AS (SELECT bucket, max(max_rho) AS max_rho FROM (
         |    SELECT * FROM a_reg UNION ALL SELECT * FROM b_reg)
         |    GROUP BY bucket),
         |${est("a", "a_reg")},
         |${est("b", "b_reg")},
         |${est("u", "u_reg")}
         |SELECT a_est.est AS est_a, b_est.est AS est_b,
         |  u_est.est AS est_union,
         |  round(greatest(a_est.est + b_est.est - u_est.est, 0.0) * 10000)
         |    / 10000 AS est_intersection,
         |  round((greatest(a_est.est + b_est.est - u_est.est, 0.0)
         |    / u_est.est) * 10000) / 10000 AS jaccard_est
         |FROM a_est CROSS JOIN b_est CROSS JOIN u_est""".stripMargin
    },

    // Bloom card: the filter bits themselves are rebuilt (3 Knuth-odd
    // multipliers mod 16384), membership = all 3 positions set.
    "sketch_bloom_fpr" ->
      """WITH ins AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS key
        |      FROM part WHERE p_partkey IS NOT NULL),
        |prb AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS key
        |      FROM lineitem WHERE l_orderkey IS NOT NULL
        |        AND l_orderkey NOT IN (SELECT key FROM ins)),
        |ipos AS (SELECT DISTINCT pos FROM (
        |      SELECT ((key % 2147483648) * 2654435761) % 16384 AS pos
        |        FROM ins
        |      UNION ALL
        |      SELECT ((key % 2147483648) * 2654435763) % 16384 FROM ins
        |      UNION ALL
        |      SELECT ((key % 2147483648) * 2654435765) % 16384 FROM ins)),
        |ppos AS (
        |      SELECT key, ((key % 2147483648) * 2654435761) % 16384 AS pos
        |        FROM prb
        |      UNION ALL
        |      SELECT key, ((key % 2147483648) * 2654435763) % 16384
        |        FROM prb
        |      UNION ALL
        |      SELECT key, ((key % 2147483648) * 2654435765) % 16384
        |        FROM prb),
        |hits AS (SELECT key, count(*) AS h FROM ppos
        |      WHERE pos IN (SELECT pos FROM ipos) GROUP BY 1),
        |fp AS (SELECT (SELECT count(*) FROM prb) AS n_probes,
        |        CAST((SELECT count(*) FROM hits WHERE h = 3) AS BIGINT)
        |          AS n_false_pos),
        |ni AS (SELECT count(*) AS n_inserted FROM ins),
        |nb AS (SELECT count(*) AS bits_set FROM ipos)
        |SELECT CAST(16384 AS BIGINT) AS m_bits, CAST(3 AS BIGINT)
        |    AS k_hashes,
        |  n_inserted, bits_set,
        |  round((CAST(bits_set AS DOUBLE) / 16384.0) * 1000000) / 1000000 AS fill_ratio,
        |  n_probes, n_false_pos,
        |  round((CAST(n_false_pos AS DOUBLE)
        |    / nullif(CAST(n_probes AS DOUBLE), 0.0)) * 1000000) / 1000000 AS measured_fpr,
        |  round(exp(3.0 * ln(1.0 - exp(3.0 * CAST(n_inserted AS DOUBLE)
        |    * ln(1.0 - 0.00006103515625)))), 6) AS theoretical_fpr
        |FROM fp CROSS JOIN ni CROSS JOIN nb""".stripMargin,

    // KMV: the avalanche32 chain (Knuth fold, xor-shift finisher) in
    // ANSI integer ops, k smallest distinct hashes, (k-1)*2^32/h_(k);
    // < k distinct hashes -> the count is exact by construction.
    // Mirrors winsorizedMeanCard's two-stage arithmetic: per-group
    // bounds, 64-bin assignment with the identical (v-lo)/((hi-lo)/64)
    // IEEE op order, cumulative bin counts, min-bin cut at each target
    // rank, clamp, DECIMAL(28,6) sums.
    "sketch_winsorized" ->
      """WITH clean AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |      FROM events WHERE value IS NOT NULL),
        |b AS (SELECT g, min(v) AS lo, max(v) AS hi,
        |        CAST(count(*) AS BIGINT) AS n FROM clean GROUP BY 1),
        |bn AS (SELECT c.g,
        |        CASE WHEN b.hi = b.lo THEN 0
        |          ELSE least(CAST(floor((c.v - b.lo)
        |            / ((b.hi - b.lo) / 64)) AS BIGINT), 63) END AS bin,
        |        b.lo, b.hi, b.n
        |      FROM clean c JOIN b ON b.g = c.g),
        |bc AS (SELECT g, bin, lo, hi, n, count(*) AS c
        |      FROM bn GROUP BY 1, 2, 3, 4, 5),
        |cm AS (SELECT g, bin, lo, hi, n,
        |        sum(c) OVER (PARTITION BY g ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM bc),
        |clo AS (SELECT g,
        |        round((lo + (min(bin) + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS cut_lo
        |      FROM cm WHERE cum >= ceil(0.05 * n) GROUP BY g, lo, hi),
        |chi AS (SELECT g,
        |        round((lo + (min(bin) + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS cut_hi
        |      FROM cm WHERE cum >= ceil(0.95 * n) GROUP BY g, lo, hi),
        |w AS (SELECT c.g, c.v, clo.cut_lo, chi.cut_hi,
        |        greatest(least(c.v, chi.cut_hi), clo.cut_lo) AS cv
        |      FROM clean c JOIN clo ON clo.g = c.g JOIN chi ON chi.g = c.g)
        |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(cut_lo) AS cut_lo, min(cut_hi) AS cut_hi,
        |  round((CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000 AS mean_raw,
        |  round((CAST(sum(CAST(round(cv, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000 AS mean_winsorized
        |FROM w GROUP BY g ORDER BY event_type""".stripMargin,

    // Mirrors robustStatsCard: the sketch_winsorized histogram blocks
    // plus the 0.5 cut (median), the trim-window filter, and the
    // closed-form-bounded deviation histogram for MAD — identical IEEE
    // op order throughout.
    "sketch_robust_stats" ->
      """WITH clean AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |      FROM events WHERE value IS NOT NULL),
        |b AS (SELECT g, min(v) AS lo, max(v) AS hi,
        |        CAST(count(*) AS BIGINT) AS n FROM clean GROUP BY 1),
        |bn AS (SELECT c.g,
        |        CASE WHEN b.hi = b.lo THEN 0
        |          ELSE least(CAST(floor((c.v - b.lo)
        |            / ((b.hi - b.lo) / 64)) AS BIGINT), 63) END AS bin,
        |        b.lo, b.hi, b.n
        |      FROM clean c JOIN b ON b.g = c.g),
        |bc AS (SELECT g, bin, lo, hi, n, count(*) AS c
        |      FROM bn GROUP BY 1, 2, 3, 4, 5),
        |cm AS (SELECT g, bin, lo, hi, n,
        |        sum(c) OVER (PARTITION BY g ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM bc),
        |clo AS (SELECT g,
        |        round((lo + (min(bin) + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS cut_lo
        |      FROM cm WHERE cum >= ceil(0.05 * n) GROUP BY g, lo, hi),
        |chi AS (SELECT g,
        |        round((lo + (min(bin) + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS cut_hi
        |      FROM cm WHERE cum >= ceil(0.95 * n) GROUP BY g, lo, hi),
        |cmed AS (SELECT g,
        |        round((lo + (min(bin) + 1) * ((hi - lo) / 64)) * 1000000) / 1000000 AS median_est
        |      FROM cm WHERE cum >= ceil(0.5 * n) GROUP BY g, lo, hi),
        |w AS (SELECT c.g, c.v, clo.cut_lo, chi.cut_hi, cmed.median_est,
        |        b.lo, b.hi, b.n
        |      FROM clean c JOIN clo ON clo.g = c.g JOIN chi ON chi.g = c.g
        |      JOIN cmed ON cmed.g = c.g JOIN b ON b.g = c.g),
        |dbn AS (SELECT g, n,
        |        greatest(median_est - lo, hi - median_est) AS dhi,
        |        CASE WHEN greatest(median_est - lo, hi - median_est) <= 0 THEN 0
        |          ELSE least(CAST(floor(abs(v - median_est)
        |            / (greatest(median_est - lo, hi - median_est) / 64))
        |            AS BIGINT), 63) END AS bin
        |      FROM w),
        |dbc AS (SELECT g, bin, dhi, n, count(*) AS c
        |      FROM dbn GROUP BY 1, 2, 3, 4),
        |dcm AS (SELECT g, bin, dhi, n,
        |        sum(c) OVER (PARTITION BY g ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM dbc),
        |mad AS (SELECT g, round(((min(bin) + 1) * (dhi / 64)) * 1000000) / 1000000 AS mad_est
        |      FROM dcm WHERE cum >= ceil(0.5 * n) GROUP BY g, dhi),
        |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |        min(cut_lo) AS cut_lo, min(cut_hi) AS cut_hi,
        |        min(median_est) AS median_est,
        |        round((CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |          / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000 AS mean_raw,
        |        CAST(sum(CASE WHEN v BETWEEN cut_lo AND cut_hi
        |          THEN CAST(round(v, 6) AS DECIMAL(28,6)) END) AS DOUBLE) AS st,
        |        CAST(sum(CASE WHEN v BETWEEN cut_lo AND cut_hi
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
        |      FROM w GROUP BY g)
        |SELECT agg.g AS event_type, n, cut_lo, cut_hi, median_est, mean_raw,
        |  round((st / nullif(CAST(n_trimmed AS DOUBLE), 0.0)) * 1000000) / 1000000 AS mean_trimmed,
        |  n_trimmed, mad_est
        |FROM agg JOIN mad ON mad.g = agg.g ORDER BY event_type""".stripMargin,

    // Rebuilds the per-source 16-perm signatures bit-for-bit (the
    // dedup_lsh_curve shingle/hash SQL, grouped by source), folds the
    // union signature with min(m) per p, and mirrors the agreement and
    // containment-Jaccard arithmetic.
    "sketch_minhash_union" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t,
         |        generate_subscripts(toks, 1) AS i FROM base),
         |sh0 AS (SELECT DISTINCT a.doc_id,
         |        a.t || ' ' || b.t || ' ' || c.t AS shingle
         |      FROM toks a
         |      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |      JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |gsh AS (SELECT DISTINCT d.source AS g, s.shingle
         |      FROM sh0 s JOIN documents d ON d.doc_id = s.doc_id),
         |xh AS (SELECT g, shingle,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range(length(shingle)),
         |            i -> ascii(substr(shingle, CAST(i + 1 AS INT), 1)))),
         |          (acc, c) -> (acc * 131 + c) % 2147483647) AS x
         |      FROM gsh),
         |pm AS (SELECT CAST(p AS BIGINT) AS p FROM range(16) t(p)),
         |hp AS (SELECT g, p,
         |        (x * ((1103515245 * (p + 1)) % 2147483647)
         |          + ((12345 * (p + 1)) % 2147483647)) % 2147483647 AS h
         |      FROM xh CROSS JOIN pm),
         |sig AS (SELECT g, p, min(h) AS m FROM hp GROUP BY 1, 2),
         |un AS (SELECT p, min(m) AS mu FROM sig GROUP BY 1),
         |ag AS (SELECT g, CAST(sum(CASE WHEN m = mu THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_agree
         |      FROM sig JOIN un USING (p) GROUP BY 1),
         |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n_shingles
         |      FROM gsh GROUP BY 1),
         |us AS (SELECT CAST(count(DISTINCT shingle) AS BIGINT) AS n_union
         |      FROM gsh)
         |SELECT sz.g AS source, n_shingles, n_union, n_agree,
         |  round((CAST(n_agree AS DOUBLE) / 16.0) * 1000000) / 1000000 AS est_jaccard,
         |  round((CAST(n_shingles AS DOUBLE) / CAST(n_union AS DOUBLE)) * 1000000) / 1000000
         |    AS exact_jaccard
         |FROM sz JOIN ag ON ag.g = sz.g CROSS JOIN us
         |ORDER BY source""".stripMargin,

    "sketch_kmv" ->
      """WITH keys AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS key
        |      FROM events WHERE event_id IS NOT NULL),
        |h1 AS (SELECT ((key % 2147483648) * 2654435761) % 4294967296
        |        AS h1 FROM keys),
        |h2 AS (SELECT (xor(h1, h1 >> 16) * 1597334677) % 4294967296
        |        AS h2 FROM h1),
        |hs AS (SELECT DISTINCT xor(h2, h2 >> 16) AS h FROM h2),
        |kmin AS (SELECT h FROM hs ORDER BY h LIMIT 1024),
        |st AS (SELECT count(*) AS n_min, max(h) AS kth_min FROM kmin),
        |ex AS (SELECT count(*) AS n_exact FROM keys),
        |est AS (SELECT n_min, kth_min, n_exact,
        |        CASE WHEN n_min < 1024 THEN CAST(n_min AS DOUBLE)
        |          ELSE 1023e0 * 4294967296e0 / CAST(kth_min AS DOUBLE) END
        |          AS e
        |      FROM st CROSS JOIN ex)
        |SELECT CAST(1024 AS BIGINT) AS k, n_min, kth_min, n_exact,
        |  round(e, 6) AS est_distinct,
        |  round((e / nullif(CAST(n_exact AS DOUBLE), 0.0) - 1e0) * 1000000) / 1000000
        |    AS rel_error
        |FROM est""".stripMargin,

    // Stage latency: first-to-first pairs, exact integer gap seconds,
    // quantile_cont for Spark's interpolated percentile.
    "ana_stage_latency" ->
      """WITH f AS (SELECT user_id AS u, event_type AS stage,
        |        min(epoch_us(ts)) AS t FROM events
        |      WHERE event_type IN ('signup', 'click', 'purchase')
        |      GROUP BY 1, 2),
        |p0 AS (SELECT 0 AS stage_idx, 'signup' AS from_stage,
        |        'click' AS to_stage, count(*) AS n_users,
        |        round(quantile_cont(dt_s, 0.5) * 1000000) / 1000000 AS median_s,
        |        round(quantile_cont(dt_s, 0.9) * 1000000) / 1000000 AS p90_s
        |      FROM (SELECT ((b.t - a.t) - (b.t - a.t) % 1000000)
        |              // 1000000 AS dt_s
        |            FROM f a JOIN f b ON a.u = b.u
        |              AND a.stage = 'signup' AND b.stage = 'click'
        |            WHERE b.t > a.t)),
        |p1 AS (SELECT 1 AS stage_idx, 'click' AS from_stage,
        |        'purchase' AS to_stage, count(*) AS n_users,
        |        round(quantile_cont(dt_s, 0.5) * 1000000) / 1000000 AS median_s,
        |        round(quantile_cont(dt_s, 0.9) * 1000000) / 1000000 AS p90_s
        |      FROM (SELECT ((b.t - a.t) - (b.t - a.t) % 1000000)
        |              // 1000000 AS dt_s
        |            FROM f a JOIN f b ON a.u = b.u
        |              AND a.stage = 'click' AND b.stage = 'purchase'
        |            WHERE b.t > a.t))
        |SELECT * FROM p0 UNION ALL SELECT * FROM p1
        |ORDER BY stage_idx""".stripMargin,

    // Norm histogram: DECIMAL-exact squared sums, one rounded sqrt,
    // PSI binning arithmetic.
    "emb_norm_hist" ->
      """WITH f AS (SELECT vec_id,
        |        CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |n AS (SELECT vec_id, round(sqrt(CAST(sum(CAST(round(x * x, 6)
        |          AS DECIMAL(18,6))) AS DOUBLE)) * 1000000) / 1000000 AS nrm
        |      FROM f GROUP BY 1),
        |b AS (SELECT CAST(min(nrm) AS DOUBLE) AS lo,
        |        CAST(max(nrm) AS DOUBLE) AS hi FROM n),
        |bb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
        |        CAST(least(greatest(floor((nrm - lo) / ((hi - lo) / 10)), 0),
        |          9) AS INT) END AS bin, nrm FROM n CROSS JOIN b)
        |SELECT bin, count(*) AS n, min(nrm) AS min_norm,
        |  max(nrm) AS max_norm
        |FROM bb GROUP BY 1 ORDER BY 1""".stripMargin,

    // Isotropy: unit components DECIMAL-routed to 6 dp, so per-dim sums
    // and the self term are exact and the sum-vector identity holds
    // EXACTLY on the quantized vectors; only su^2 rides a routed double.
    "emb_isotropy" ->
      """WITH f AS (SELECT vec_id,
        |        CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
        |        CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |n AS (SELECT vec_id, round(sqrt(CAST(sum(CAST(round(x * x, 6)
        |          AS DECIMAL(18,6))) AS DOUBLE)) * 1000000) / 1000000 AS nrm
        |      FROM f GROUP BY 1 HAVING round(sqrt(CAST(sum(CAST(round(x * x, 6)
        |          AS DECIMAL(18,6))) AS DOUBLE)) * 1000000) / 1000000 > 0),
        |u AS (SELECT f.vec_id, f.dim,
        |        CAST(round((f.x / n.nrm) * 1000000) / 1000000
        |          AS DECIMAL(18,6)) AS u
        |      FROM f JOIN n ON n.vec_id = f.vec_id),
        |d AS (SELECT dim, CAST(sum(u) AS DECIMAL(38,6)) AS su,
        |        CAST(sum(CAST(u * u AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |          AS self_d
        |      FROM u GROUP BY 1),
        |t AS (SELECT count(*) AS n_dims,
        |        CAST(sum(CAST(round((CAST(su AS DOUBLE)
        |          * CAST(su AS DOUBLE)) * 1000000) / 1000000
        |          AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS ss,
        |        CAST(sum(self_d) AS DECIMAL(38,12)) AS self_sum
        |      FROM d),
        |c AS (SELECT count(*) AS n_vectors FROM n)
        |SELECT n_vectors, n_dims,
        |  CAST(round((CAST(ss AS DOUBLE)) * 1000000) / 1000000
        |    AS DOUBLE) AS norm_sum_sq,
        |  CAST(round((CAST(self_sum AS DOUBLE)) * 1000000) / 1000000
        |    AS DOUBLE) AS self_cos_sum,
        |  CAST(round((CASE WHEN n_vectors > 1 THEN
        |      (CAST(ss AS DOUBLE) - CAST(self_sum AS DOUBLE))
        |      / (CAST(n_vectors AS DOUBLE) * CAST(n_vectors - 1 AS DOUBLE))
        |    ELSE NULL END) * 1000000) / 1000000 AS DOUBLE)
        |    AS mean_pairwise_cos
        |FROM c CROSS JOIN t""".stripMargin,

    // Peak concurrency: ana_interval_union's interval arithmetic, ±1
    // deltas netted per second, ONE global running-sum window (sf-scale
    // stand-in for the two-level prefix), earliest peak second.
    "ana_peak_concurrency" ->
      """WITH iv AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
        |        CAST(floor(epoch(ts)) AS BIGINT)
        |          + CAST(floor(value * 60) AS BIGINT) AS end_s FROM events),
        |d AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM (
        |      SELECT start_s AS t, 1 AS d FROM iv
        |      UNION ALL SELECT end_s, -1 FROM iv) GROUP BY 1),
        |r AS (SELECT t, sum(d) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |      FROM d),
        |p AS (SELECT CAST(max(conc) AS BIGINT) AS peak FROM r),
        |n AS (SELECT count(*) AS n_intervals FROM iv)
        |SELECT n_intervals, p.peak, min(t) AS peak_at_s
        |FROM r CROSS JOIN p CROSS JOIN n WHERE conc = p.peak
        |GROUP BY 1, 2""".stripMargin,

    // Type-overlap matrix: distinct (type, user) self-join, exact
    // BIGINT counts, one rounded division per pair.
    // DAU/MAU: observed-active-day average over the monthly distinct.
    "ana_stickiness" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id AS u
        |      FROM events),
        |dau AS (SELECT day, count(DISTINCT u) AS dau FROM d GROUP BY 1),
        |mau AS (SELECT date_trunc('month', day) AS month,
        |        count(DISTINCT u) AS mau FROM d GROUP BY 1),
        |md AS (SELECT date_trunc('month', day) AS month,
        |        count(*) AS n_active_days,
        |        CAST(sum(dau) AS BIGINT) AS sdau FROM dau GROUP BY 1)
        |SELECT md.month AS month, n_active_days, mau,
        |  round((CAST(sdau AS DOUBLE) / CAST(n_active_days AS DOUBLE)) * 1000000) / 1000000
        |    AS avg_dau,
        |  round((CAST(sdau AS DOUBLE) / CAST(n_active_days AS DOUBLE)
        |    / CAST(mau AS DOUBLE)) * 1000000) / 1000000 AS stickiness
        |FROM md JOIN mau ON md.month = mau.month
        |ORDER BY month""".stripMargin,

    "ana_type_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS et, user_id AS u
        |      FROM events),
        |tot AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1),
        |i AS (SELECT a.et AS type_a, b.et AS type_b,
        |        CAST(count(*) AS BIGINT) AS n_both
        |      FROM tu a JOIN tu b ON a.u = b.u AND a.et < b.et
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
        |  round((CAST(n_both AS DOUBLE)
        |    / CAST(ta.n + tb.n - n_both AS DOUBLE)) * 1000000) / 1000000 AS jaccard
        |FROM i JOIN tot ta ON ta.et = type_a JOIN tot tb ON tb.et = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // Term dispersion: postings-cardinality moments over the top-200
    // vocabulary, exact integer sums, rounded divisions in the Spark
    // side's operation order.
    "text_term_dispersion" ->
      """WITH t AS (SELECT doc_id,
        |        unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |          AS term FROM documents),
        |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
        |v AS (SELECT term FROM (SELECT term, freq FROM c
        |      ORDER BY freq DESC, term LIMIT 200)),
        |dt AS (SELECT t.term, t.doc_id, CAST(count(*) AS BIGINT) AS c
        |      FROM t JOIN v ON v.term = t.term GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |agg AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        |        CAST(sum(c) AS BIGINT) AS freq,
        |        CAST(sum(c * c) AS BIGINT) AS s2 FROM dt GROUP BY 1)
        |SELECT term, df, freq,
        |  round(((CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE)
        |    - (CAST(freq AS DOUBLE) / CAST(nd AS DOUBLE))
        |      * (CAST(freq AS DOUBLE) / CAST(nd AS DOUBLE)))
        |    / (CAST(freq AS DOUBLE) / CAST(nd AS DOUBLE))) * 1000000)
        |    / 1000000 AS vmr
        |FROM agg CROSS JOIN nd ORDER BY term""".stripMargin,

    // Seasonal-naive backtest: the dft hour-index convention, a
    // (key, h−24) self-join, DECIMAL |error| sums.
    "ts_backtest_naive" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts) AS t,
        |        CAST(value AS DOUBLE) AS v FROM events),
        |bd AS (SELECT k, min(t) AS tmin FROM e GROUP BY 1),
        |hh AS (SELECT e.k,
        |        ((t - tmin) - (t - tmin) % 3600000000) // 3600000000 AS h,
        |        count(*) AS nh,
        |        sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS sv
        |      FROM e JOIN bd ON bd.k = e.k GROUP BY 1, 2),
        |hr AS (SELECT k, h, round((CAST(sv AS DOUBLE) / nh) * 1000000) / 1000000 AS vh FROM hh),
        |hm AS (SELECT k, max(h) AS hmax FROM hr GROUP BY 1),
        |test AS (SELECT hr.k, h, vh FROM hr JOIN hm ON hm.k = hr.k
        |      WHERE h > hmax - 48),
        |fc AS (SELECT k, h + 24 AS h, vh AS pred FROM hr)
        |SELECT t2.k AS event_type, count(*) AS n_test,
        |  round((CAST(sum(CAST(round(abs(vh - pred), 6) AS DECIMAL(28,6)))
        |    AS DOUBLE) / count(*)) * 1000000) / 1000000 AS mae
        |FROM test t2 JOIN fc ON fc.k = t2.k AND fc.h = t2.h
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Inter-arrival histogram: per-user lag on (t, id) order, exact
    // integer gap seconds (remainder-subtracted division), the
    // power-of-two CASE chain (rhoCase convention) — nothing floats.
    "ana_interarrival" -> {
      val whens = (1 to 40).map(b =>
        s"WHEN gap_s < ${1L << b} THEN $b").mkString(" ")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS id
         |      FROM events),
         |g AS (SELECT t - lag(t) OVER (PARTITION BY user_id
         |        ORDER BY t, id) AS gap_us FROM e),
         |gs AS (SELECT (gap_us - gap_us % 1000000) // 1000000 AS gap_s
         |      FROM g WHERE gap_us IS NOT NULL),
         |b AS (SELECT CASE WHEN gap_s = 0 THEN 0 $whens END AS bucket,
         |        gap_s FROM gs)
         |SELECT bucket, count(*) AS n_gaps, min(gap_s) AS min_gap_s,
         |  max(gap_s) AS max_gap_s
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Quantile-position score: one global strictly-before window over
    // distinct values stands in for the Spark side's two-level prefix
    // sum; midranks are exact .5-grain doubles.
    "dq_quantile_score" ->
      """WITH r AS (SELECT event_type AS grp, CAST(value AS DOUBLE) AS v
        |      FROM events WHERE value IS NOT NULL),
        |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM byv),
        |rk AS (SELECT v, round(((CAST(coalesce(sum(c) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS DOUBLE) + CAST(c + 1 AS DOUBLE) / 2.0)
        |        / CAST(n AS DOUBLE)) * 1000000) / 1000000 AS q
        |      FROM byv CROSS JOIN tot)
        |SELECT grp AS event_type, count(*) AS n_rows,
        |  round((CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*))
        |    * 1000000) / 1000000 AS mean_quantile
        |FROM r JOIN rk USING (v) GROUP BY 1 ORDER BY 1""".stripMargin,

    // Pattern scan over JSON props — nonzero counts prove the match
    // path the PII report exercises with zeros.
    "text_pattern_scan" ->
      """SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
        |    AS n_number,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_number,
        |  CAST(sum(len(regexp_extract_all(props, '"[a-z]+"'))) AS BIGINT)
        |    AS n_qkey,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(props, '"[a-z]+"')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_qkey
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_encode" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term,
         |        generate_subscripts(toks, 1) AS pos1 FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |v AS (SELECT term, CAST(row_number() OVER (ORDER BY freq DESC, term) - 1
         |          AS BIGINT) AS term_id
         |      FROM (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 20))
         |SELECT t.doc_id, CAST(t.pos1 - 1 AS BIGINT) AS pos,
         |  coalesce(v.term_id, -1) AS term_id
         |FROM t LEFT JOIN v USING (term)
         |ORDER BY doc_id, pos""".stripMargin,

    // Decode round trip: same vocab CTE, OOV -> <unk>, position-ordered
    // string_agg reassembly.
    "text_decode" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term,
         |        generate_subscripts(toks, 1) AS pos1 FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |v AS (SELECT term, CAST(row_number() OVER (ORDER BY freq DESC, term) - 1
         |          AS BIGINT) AS term_id
         |      FROM (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 20)),
         |e AS (SELECT t.doc_id, t.pos1,
         |        coalesce(v.term_id, -1) AS tid,
         |        CASE WHEN v.term_id IS NULL THEN '<unk>' ELSE t.term END
         |          AS tok
         |      FROM t LEFT JOIN v USING (term))
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unk,
         |  string_agg(tok, ' ' ORDER BY pos1) AS decoded
         |FROM e GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_ngrams" ->
      s"""WITH base AS ($docToks),
         |g AS (SELECT list_transform(range(len(toks) - 1),
         |        i -> concat(toks[i + 1], ' ', toks[i + 2])) AS gs
         |      FROM base WHERE len(toks) >= 2),
         |t AS (SELECT unnest(gs) AS ngram FROM g),
         |c AS (SELECT ngram, count(*) AS freq FROM t GROUP BY 1)
         |SELECT ngram, freq FROM c
         |ORDER BY freq DESC, ngram LIMIT 200""".stripMargin,

    // BM25: per-term weights rounded to 9 dp ride an exact DECIMAL(18,9)
    // sum, so the per-doc total is order-free in both engines.
    "text_bm25" ->
      s"""WITH base AS ($docToks),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |        CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM base),
         |tf AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, t.term,
         |        CAST(count(*) AS DOUBLE) AS tf
         |      FROM base, unnest(list_filter(toks,
         |        x -> list_contains(['spark', 'join', 'filter'], x))) AS t(term)
         |      GROUP BY 1, 2, 3),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |w AS (SELECT tf.doc_id,
         |        ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
         |          * tf.tf * 2.2 / (tf.tf + 1.2 * (1.0 - 0.75
         |            + 0.75 * tf.dl / st.avgdl)) AS w
         |      FROM tf JOIN df USING (term) CROSS JOIN st)
         |SELECT doc_id,
         |  round(CAST(sum(CAST(round(w, 9) AS DECIMAL(18,9))) AS DOUBLE), 6)
         |    AS score,
         |  count(*) AS n_terms_hit
         |FROM w GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // PMI over exact BIGINT counts; ln + round(6) is the one accepted
    // cross-engine float caveat (same class as tfidf/hll).
    "text_pmi" ->
      s"""WITH base AS ($docToks),
         |u AS (SELECT unnest(toks) AS t FROM base),
         |uni AS (SELECT t, count(*) AS c FROM u GROUP BY 1),
         |g AS (SELECT list_transform(range(len(toks) - 1),
         |        i -> concat(toks[i + 1], ' ', toks[i + 2])) AS gs
         |      FROM base WHERE len(toks) >= 2),
         |bi AS (SELECT bigram, count(*) AS c_ab
         |       FROM (SELECT unnest(gs) AS bigram FROM g) GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n_tok,
         |               (SELECT CAST(sum(c_ab) AS DOUBLE) FROM bi) AS n_big)
         |SELECT bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
         |  round(ln((c_ab / n_big) /
         |    ((ua.c / n_tok) * (ub.c / n_tok))), 6) AS pmi
         |FROM bi
         |JOIN uni ua ON ua.t = string_split(bigram, ' ')[1]
         |JOIN uni ub ON ub.t = string_split(bigram, ' ')[2]
         |CROSS JOIN tot
         |WHERE c_ab >= 5
         |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin,

    // G² collocations: marginals from the bigram table itself (first/
    // second position), four zero-guarded k·ln(kM/RC) terms, ×2.
    "text_collocations" ->
      s"""WITH base AS ($docToks),
         |g AS (SELECT list_transform(range(len(toks) - 1),
         |        i -> concat(toks[i + 1], ' ', toks[i + 2])) AS gs
         |      FROM base WHERE len(toks) >= 2),
         |bi AS (SELECT bigram, CAST(count(*) AS BIGINT) AS k11
         |       FROM (SELECT unnest(gs) AS bigram FROM g) GROUP BY 1),
         |bw AS (SELECT bigram, k11, string_split(bigram, ' ')[1] AS w1,
         |         string_split(bigram, ' ')[2] AS w2 FROM bi),
         |r AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS ra FROM bw GROUP BY 1),
         |c AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS cb FROM bw GROUP BY 1),
         |tot AS (SELECT CAST(sum(k11) AS BIGINT) AS m FROM bi)
         |SELECT bigram, k11 AS c_ab, ra AS c_a_first, cb AS c_b_second,
         |  round(2.0 * (
         |    CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE) *
         |      ln(CAST(k11 AS DOUBLE) * CAST(m AS DOUBLE)
         |        / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))) ELSE 0 END
         |    + CASE WHEN ra - k11 > 0 THEN CAST(ra - k11 AS DOUBLE) *
         |      ln(CAST(ra - k11 AS DOUBLE) * CAST(m AS DOUBLE)
         |        / (CAST(ra AS DOUBLE) * CAST(m - cb AS DOUBLE))) ELSE 0 END
         |    + CASE WHEN cb - k11 > 0 THEN CAST(cb - k11 AS DOUBLE) *
         |      ln(CAST(cb - k11 AS DOUBLE) * CAST(m AS DOUBLE)
         |        / (CAST(m - ra AS DOUBLE) * CAST(cb AS DOUBLE))) ELSE 0 END
         |    + CASE WHEN m - ra - cb + k11 > 0
         |      THEN CAST(m - ra - cb + k11 AS DOUBLE) *
         |      ln(CAST(m - ra - cb + k11 AS DOUBLE) * CAST(m AS DOUBLE)
         |        / (CAST(m - ra AS DOUBLE) * CAST(m - cb AS DOUBLE)))
         |      ELSE 0 END), 6) AS g2
         |FROM bw JOIN r USING (w1) JOIN c USING (w2) CROSS JOIN tot
         |WHERE k11 >= 5
         |ORDER BY g2 DESC, bigram LIMIT 40""".stripMargin,

    // Jensen–Shannon divergence between source unigram distributions:
    // union-of-support via full outer join per source pair, per-term
    // halves 9-dp-rounded into DECIMAL sums.
    "text_jsd" ->
      """WITH tok AS (SELECT source,
        |        unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |          AS t FROM documents),
        |sc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |n AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
        |pt AS (SELECT sc.source, t,
        |        CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
        |      FROM sc JOIN n USING (source)),
        |pr AS (SELECT a.source AS sa, b.source AS sb
        |      FROM n a JOIN n b ON a.source < b.source),
        |l AS (SELECT sa, sb, t, p AS pa FROM pr
        |      JOIN pt ON pt.source = pr.sa),
        |rr AS (SELECT sa, sb, t, p AS pb FROM pr
        |      JOIN pt ON pt.source = pr.sb),
        |f AS (SELECT sa, sb, t, coalesce(pa, 0.0) AS pa,
        |        coalesce(pb, 0.0) AS pb
        |      FROM l FULL JOIN rr USING (sa, sb, t)),
        |a AS (SELECT sa, sb, count(*) AS n_terms_union,
        |        sum(CAST(round(0.5 * (
        |          CASE WHEN pa > 0
        |            THEN pa * ln(2.0 * pa / (pa + pb)) ELSE 0 END
        |          + CASE WHEN pb > 0
        |            THEN pb * ln(2.0 * pb / (pa + pb)) ELSE 0 END), 9)
        |          AS DECIMAL(18,9))) AS jd
        |      FROM f GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, n_terms_union,
        |  round(CAST(jd AS DOUBLE) * 1000000) / 1000000 AS jsd,
        |  round(sqrt(CAST(jd AS DOUBLE)) * 1000000) / 1000000
        |    AS jsd_distance
        |FROM a ORDER BY source_a, source_b""".stripMargin,

    // Hot-bigram boilerplate removal: mask every token position covered
    // by a bigram present in >= ceil(0.08 * n_docs) documents, reassemble
    // the survivors in position order.
    "text_boilerplate" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT doc_id, unnest(toks) AS t,
         |          generate_subscripts(toks, 1) AS i FROM base),
         |gr AS (SELECT a.doc_id, a.i AS s, a.t || ' ' || b.t AS g
         |       FROM tok a JOIN tok b
         |         ON b.doc_id = a.doc_id AND b.i = a.i + 1),
         |hot AS (SELECT g FROM gr GROUP BY g
         |        HAVING count(DISTINCT doc_id) >=
         |          (SELECT ceil(count(*) * 0.08) FROM documents)),
         |cov AS (SELECT DISTINCT gr.doc_id, gr.s + off.o AS pos
         |        FROM gr JOIN hot USING (g)
         |        CROSS JOIN (SELECT unnest([0, 1]) AS o) off),
         |kept AS (SELECT tok.doc_id, tok.t, tok.i
         |         FROM tok LEFT JOIN cov
         |           ON cov.doc_id = tok.doc_id AND cov.pos = tok.i
         |         WHERE cov.doc_id IS NULL),
         |agg AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS clean_text,
         |          count(*) AS n_kept FROM kept GROUP BY 1)
         |SELECT b.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |  CAST(len(b.toks) AS BIGINT) AS n_tokens,
         |  CAST(len(b.toks) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
         |  CASE WHEN len(b.toks) = 0 THEN 0.0
         |       ELSE CAST(len(b.toks) - coalesce(agg.n_kept, 0) AS DOUBLE)
         |         / len(b.toks) END AS boilerplate_ratio
         |FROM base b LEFT JOIN agg ON agg.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // Token-budget selection: BIGINT cumsum over (score DESC, doc_id) vs
    // the 10k budget; score is one exact division, so the cut is
    // engine-independent.
    "text_select_budget" ->
      s"""WITH base AS ($docToks),
         |sc AS (SELECT doc_id,
         |        coalesce(CAST(len(list_distinct(toks)) AS DOUBLE)
         |          / nullif(len(toks), 0), 0.0) AS score,
         |        CAST(len(regexp_extract_all(text,
         |          '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |      FROM base),
         |c AS (SELECT doc_id, score, n_subwords,
         |        CAST(sum(n_subwords) OVER (ORDER BY score DESC, doc_id
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |      FROM sc)
         |SELECT doc_id, score, n_subwords, cum_tokens
         |FROM c WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin,

    // Novelty over STRING trigrams (the ngram-jaccard oracle's shingle
    // CTE) — the Spark side's hashed shingles group identically absent
    // collisions, the same accepted convention as every shingle op.
    "text_ngram_novelty" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t,
         |           generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |fst AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN fst.first_doc = sh.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  round((CAST(sum(CASE WHEN fst.first_doc = sh.doc_id THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*)) * 1000000) / 1000000 AS novelty
         |FROM sh JOIN fst USING (shingle)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Volume anomaly: ana_outliers' two-pass DECIMAL moment recipe over
    // the (type, day) count frame; sd=0 groups excluded like try_divide.
    "dq_volume_anomaly" ->
      """WITH dly AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |        count(*) AS cnt
        |      FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n,
        |        CAST(sum(CAST(cnt AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |          AS mean
        |      FROM dly GROUP BY 1),
        |s AS (SELECT d.event_type, any_value(m.n) AS n,
        |        any_value(m.mean) AS mean,
        |        sum(CAST(round((d.cnt - m.mean) * (d.cnt - m.mean), 6)
        |          AS DECIMAL(18,6))) AS ss
        |      FROM dly d JOIN m USING (event_type) GROUP BY 1),
        |st AS (SELECT event_type, mean,
        |        sqrt(CAST(ss AS DOUBLE) / (n - 1)) AS sd FROM s)
        |SELECT d.day, d.event_type, d.cnt,
        |  round(st.mean * 1000000) / 1000000 AS group_mean,
        |  round(st.sd * 1000000) / 1000000 AS group_sd,
        |  round(((d.cnt - st.mean) / st.sd) * 1000000) / 1000000 AS zscore
        |FROM dly d JOIN st USING (event_type)
        |WHERE st.sd <> 0 AND abs((d.cnt - st.mean) / st.sd) > 2
        |ORDER BY day, event_type""".stripMargin,

    // Whole-hour lag behind the table-wide max ts; truncation == floor
    // since the difference is non-negative.
    "dq_freshness" ->
      """WITH per AS (SELECT event_type AS group_key, count(*) AS n_rows,
        |        max(ts) AS max_ts
        |      FROM events GROUP BY 1),
        |g AS (SELECT max(max_ts) AS gmax FROM per)
        |SELECT group_key, n_rows, max_ts,
        |  CAST(floor((epoch(gmax) - epoch(max_ts)) / 3600) AS BIGINT)
        |    AS lag_hours,
        |  CAST(floor((epoch(gmax) - epoch(max_ts)) / 3600) AS BIGINT) > 24
        |    AS is_stale
        |FROM per CROSS JOIN g ORDER BY group_key""".stripMargin,

    // Within-doc span dedup: same gram/lead chain, dup-start by
    // min-position window, coverage by running max of span ends; docs
    // with zero tokens drop out on BOTH sides (no explode rows).
    "text_dedup_spans" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT doc_id, unnest(toks) AS t,
         |          generate_subscripts(toks, 1) AS i FROM base),
         |g AS (SELECT doc_id, i, t,
         |        CASE WHEN lead(t, 2) OVER w IS NOT NULL
         |             THEN t || ' ' || lead(t, 1) OVER w || ' ' ||
         |                  lead(t, 2) OVER w END AS gram
         |      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |m AS (SELECT *, gram IS NOT NULL AND
         |        i > min(i) OVER (PARTITION BY doc_id, gram) AS dup_start
         |      FROM g),
         |f AS (SELECT *, coalesce(max(CASE WHEN dup_start THEN i + 3 END)
         |        OVER (PARTITION BY doc_id ORDER BY i
         |          ROWS UNBOUNDED PRECEDING) > i, false) AS dropped
         |      FROM m),
         |k AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS clean_text,
         |        count(*) AS n_kept
         |      FROM f WHERE NOT dropped GROUP BY 1),
         |tot AS (SELECT doc_id, count(*) AS n_tokens FROM f GROUP BY 1)
         |SELECT tot.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  tot.n_tokens, tot.n_tokens - coalesce(k.n_kept, 0) AS n_removed
         |FROM tot LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Per-source p25 gate: score and threshold both 6-dp-rounded before
    // the comparison (quantile_cont ≡ Spark percentile — the one value
    // whose last bits could disagree); zero-token docs NULL -> kept false.
    // Rare = document frequency <= 1 corpus-wide; ratio over token
    // OCCURRENCES. Sums cast to BIGINT (DuckDB sums integers to
    // HUGEINT, which would dtype-mismatch the compare).
    "text_rare_ratio" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |df AS (SELECT term, count(*) AS df FROM
         |         (SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),
         |j AS (SELECT t.doc_id, df.df FROM t JOIN df USING (term))
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  round((CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*)) * 1000000) / 1000000 AS rare_ratio,
         |  round((CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*)) * 1000000) / 1000000 > 0.5 AS flagged
         |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_quality_gate" ->
      """WITH sc AS (SELECT doc_id, source,
        |        round(CAST(len(list_distinct(list_filter(string_split(text, ' '),
        |            x -> x <> ''))) AS DOUBLE)
        |          / nullif(len(list_filter(string_split(text, ' '),
        |            x -> x <> '')), 0) * 1000000) / 1000000 AS score
        |      FROM documents),
        |t AS (SELECT source, round(quantile_cont(score, 0.25) * 1000000) / 1000000 AS thr
        |      FROM sc GROUP BY 1)
        |SELECT sc.doc_id, sc.source, sc.score, t.thr,
        |  coalesce(sc.score >= t.thr, false) AS kept
        |FROM sc JOIN t USING (source) ORDER BY doc_id""".stripMargin,

    // Line dedup: 3-token lines, df > 3 distinct docs -> dropped
    // everywhere; reassembly ordered by line_no (unique per doc).
    "text_dedup_lines" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT doc_id, unnest(toks) AS t,
         |          generate_subscripts(toks, 1) AS i FROM base),
         |ln AS (SELECT doc_id, (i - 1) // 3 AS line_no,
         |         string_agg(t, ' ' ORDER BY i) AS line
         |       FROM tok GROUP BY 1, 2),
         |hot AS (SELECT line FROM ln GROUP BY line
         |        HAVING count(DISTINCT doc_id) > 3),
         |kept AS (SELECT ln.doc_id, ln.line_no, ln.line
         |         FROM ln LEFT JOIN hot ON hot.line = ln.line
         |         WHERE hot.line IS NULL),
         |agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text,
         |          count(*) AS n_kept FROM kept GROUP BY 1),
         |nl AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY 1)
         |SELECT nl.doc_id, coalesce(agg.clean_text, '') AS clean_text,
         |  nl.n_lines, nl.n_lines - coalesce(agg.n_kept, 0) AS n_removed
         |FROM nl LEFT JOIN agg ON agg.doc_id = nl.doc_id
         |ORDER BY nl.doc_id""".stripMargin,

    // Margin = top1 − top2 of the 5 marker scores (list_sort DESC);
    // share via NULLIF so zero-marker docs yield NULL like try_divide.
    "text_langid_margin" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
        val markers = m.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, t -> list_contains($markers, t))) AS BIGINT) AS s_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val cases = langs.zipWithIndex.map { case (lang, i) =>
        val earlier = langs.take(i).map(l => s"s_$lang > s_$l")
        val later = langs.drop(i + 1).map(l => s"s_$lang >= s_$l")
        val conds = (earlier ++ later :+ s"s_$lang > 0").mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }.mkString("\n    ")
      val arr = langs.map(l => s"s_$l").mkString("[", ", ", "]")
      val total = langs.map(l => s"s_$l").mkString(" + ")
      s"""WITH base AS ($docToks),
         |scored AS (SELECT doc_id,
         |  $scores
         |FROM base),
         |m AS (SELECT doc_id,
         |  CASE $cases
         |    ELSE 'und' END AS lang_pred,
         |  list_sort($arr, 'DESC') AS sv, $total AS total
         |FROM scored)
         |SELECT doc_id, lang_pred, sv[1] AS top1, sv[1] - sv[2] AS margin,
         |  round((CAST(sv[1] AS DOUBLE) / nullif(total, 0)) * 1000000)
         |    / 1000000 AS share
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "text_wordlen_hist" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT unnest(toks) AS t FROM base)
         |SELECT CAST(length(t) AS BIGINT) AS token_len,
         |  count(*) AS n_tokens, count(DISTINCT t) AS n_distinct
         |FROM tok GROUP BY 1 ORDER BY token_len""".stripMargin,

    // Shannon entropy: Σ c·ln c through a 6-dp round + DECIMAL sum, outer
    // arithmetic a fixed per-row expression; norm NULL for 1-term docs.
    "text_entropy" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |        count(*) AS n_distinct,
         |        sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6))) AS sclogc
         |      FROM tf GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct,
         |  round(ln(n_tokens) - CAST(sclogc AS DOUBLE) / n_tokens, 6)
         |    AS entropy,
         |  CASE WHEN n_distinct = 1 THEN NULL
         |       ELSE round((ln(n_tokens) - CAST(sclogc AS DOUBLE) / n_tokens)
         |         / ln(n_distinct), 6) END AS norm_entropy
         |FROM a ORDER BY doc_id""".stripMargin,

    // Pearson r from five exact DECIMAL moments per pair; one aggregate.
    // Products quantize at the DECIMAL cast (2-dp money columns -> exact
    // 4-dp products, boundary-safe) — mirrors the Spark side.
    "q_corr" -> {
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
      def ds(x: String) = s"CAST(sum(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
      val moments =
        cols.zipWithIndex.map { case (c, i) =>
          s"${ds(c)} AS s$i, ${ds(s"$c * $c")} AS q$i" } ++
          (for { i <- cols.indices; j <- cols.indices if i < j }
            yield s"${ds(s"${cols(i)} * ${cols(j)}")} AS p${i}_$j")
      val pairRows = (for { i <- cols.indices; j <- cols.indices if i < j } yield
        s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
           |  round(((n * p${i}_$j - s$i * s$j) /
           |    (sqrt(n * q$i - s$i * s$i) * sqrt(n * q$j - s$j * s$j)))
           |    * 1000000) / 1000000 AS r
           |FROM a""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  ${moments.mkString(",\n  ")}
         |  FROM lineitem)
         |$pairRows
         |ORDER BY col_a, col_b""".stripMargin
    },

    // Top-k hottest join keys + totals; rank above LIMIT k is bounded.
    "dq_skew_report" ->
      """WITH f AS (SELECT o_custkey AS key, count(*) AS cnt
        |           FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |          count(*) AS n_keys FROM f),
        |top AS (SELECT key, cnt FROM f ORDER BY cnt DESC, key LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT)
        |    AS rank,
        |  key, cnt, round((CAST(cnt AS DOUBLE) / n_rows) * 1000000) / 1000000 AS share,
        |  n_rows, n_keys
        |FROM top CROSS JOIN tot ORDER BY rank""".stripMargin,

    // Per-dim DECIMAL two-pass moments, same recipe as ana_outliers.
    "emb_standardize" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |m AS (SELECT dim, count(*) AS n,
         |        CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
         |          / count(*) AS mean
         |      FROM f GROUP BY 1),
         |s AS (SELECT f.dim, any_value(m.mean) AS mean, any_value(m.n) AS n,
         |        sum(CAST(round((f.x - m.mean) * (f.x - m.mean), 6)
         |          AS DECIMAL(18,6))) AS ss
         |      FROM f JOIN m USING (dim) GROUP BY 1),
         |st AS (SELECT dim, mean, sqrt(CAST(ss AS DOUBLE) / (n - 1)) AS sd
         |       FROM s)
         |SELECT f.vec_id, f.dim, round(((f.x - st.mean) / st.sd) * 1000000) / 1000000 AS z
         |FROM f JOIN st USING (dim) ORDER BY vec_id, dim""".stripMargin,

    // Spherical k-means mirror: argmax-cosine assignment (ties -> lower
    // cid), 6-dp mean centroids normalized by the norm of the ROUNDED
    // means; zero-norm mean -> NULL centroid. The assignment cosine is
    // 6-dp-rounded on BOTH sides (membership-deciding values are always
    // Elbow curve: per-k nearest-seed assignment (the assignCtes
    // algebra with suffixed CTE names, keeping the winning d2), exact
    // DECIMAL inertia sums.
    "emb_inertia" -> {
      val perK = Seq(2, 4, 8).map { k =>
        s"""s$k AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k),
           |c$k AS (SELECT f.vec_id AS cid, f.dim, f.x AS cx
           |      FROM f JOIN s$k USING (vec_id)),
           |d$k AS (SELECT f.vec_id, c$k.cid,
           |        sum(CAST(round((f.x - c$k.cx) * (f.x - c$k.cx), 6)
           |          AS DECIMAL(18,6))) AS d2
           |      FROM f JOIN c$k ON c$k.dim = f.dim GROUP BY 1, 2),
           |a$k AS (SELECT vec_id, d2 FROM
           |        (SELECT vec_id, d2, row_number() OVER (PARTITION BY vec_id
           |           ORDER BY d2, cid) AS rn FROM d$k) WHERE rn = 1),
           |i$k AS (SELECT CAST($k AS BIGINT) AS k, count(*) AS n_vectors,
           |        round(CAST(sum(d2) AS DOUBLE), 6) AS inertia,
           |        round((CAST(sum(d2) AS DOUBLE) / count(*)) * 1000000) / 1000000 AS mean_d2
           |      FROM a$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT)
         |        AS dim, unnest(v) AS x FROM e),
         |$perK
         |SELECT * FROM i2 UNION ALL SELECT * FROM i4
         |UNION ALL SELECT * FROM i8 ORDER BY k""".stripMargin
    },

    // Purity over the shared nearest-seed assignment; majority vote by
    // (count DESC, label ASC) row_number — the Spark window tie-break.
    "emb_cluster_purity" ->
      s"""WITH ${assignCtes(8)},
         |al AS (SELECT a.vec_id, a.cid, e2.label AS lbl
         |      FROM a JOIN embeddings e2 USING (vec_id)),
         |mem AS (SELECT cid, count(*) AS n_members FROM al GROUP BY 1),
         |v AS (SELECT cid, lbl, count(*) AS n FROM al
         |      WHERE lbl IS NOT NULL GROUP BY 1, 2),
         |top AS (SELECT cid, lbl AS majority_label, n AS n_majority FROM (
         |      SELECT cid, lbl, n, row_number() OVER (PARTITION BY cid
         |        ORDER BY n DESC, lbl) AS rn FROM v) WHERE rn = 1)
         |SELECT mem.cid AS cluster_id, n_members, majority_label,
         |  coalesce(n_majority, 0) AS n_majority,
         |  CAST(round((CAST(coalesce(n_majority, 0) AS DOUBLE)
         |    / CAST(n_members AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE)
         |    AS purity
         |FROM mem LEFT JOIN top USING (cid) ORDER BY cluster_id""".stripMargin,

    // CKA: three cov-Frobenius chains on the emb_covariance quantized
    // recipe (1e9 products, BIGINT/HUGEINT exact sums, 6-dp cells
    // re-quantized at 1e6 for the square sums).
    "emb_cka" -> {
      def frobCtes(tag: String, aF: String, bF: String,
                   aS: String, bS: String) =
        s"""p$tag AS (SELECT a.i AS i, b.i AS j,
           |        sum(CAST(round(a.x * b.x * 1e9, 0) AS BIGINT)) AS sp,
           |        count(*) AS n
           |      FROM $aF a JOIN $bF b ON a.pid = b.pid GROUP BY 1, 2),
           |g$tag AS (SELECT round((CAST(sp AS DOUBLE) / 1e9 / n
           |          - (CAST(sa.s AS DOUBLE) / n)
           |          * (CAST(sb.s AS DOUBLE) / n)) * 1000000) / 1000000
           |          + 0.0 AS g
           |      FROM p$tag JOIN $aS sa ON sa.i = p$tag.i
           |      JOIN $bS sb ON sb.i = p$tag.j),
           |f$tag AS (SELECT CAST(sum(CAST(CAST(round(g * 1e6, 0) AS BIGINT)
           |          AS HUGEINT) * CAST(round(g * 1e6, 0) AS BIGINT))
           |        AS DOUBLE) / 1e12 AS f2 FROM g$tag)""".stripMargin
      s"""WITH e AS ($embCte),
         |pr AS (SELECT a.vec_id AS pid, a.v AS xv, b.v AS yv
         |      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
         |      WHERE a.vec_id % 2 = 0),
         |fx AS (SELECT pid, unnest(xv) AS x,
         |        generate_subscripts(xv, 1) - 1 AS i FROM pr),
         |fy AS (SELECT pid, unnest(yv) AS x,
         |        generate_subscripts(yv, 1) - 1 AS i FROM pr),
         |sx AS (SELECT i, sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS s
         |      FROM fx GROUP BY 1),
         |sy AS (SELECT i, sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS s
         |      FROM fy GROUP BY 1),
         |${frobCtes("xy", "fx", "fy", "sx", "sy")},
         |${frobCtes("xx", "fx", "fx", "sx", "sx")},
         |${frobCtes("yy", "fy", "fy", "sy", "sy")},
         |np AS (SELECT count(*) AS n_pairs FROM pr)
         |SELECT n_pairs,
         |  CAST(round((sqrt(fxx.f2)) * 1000000) / 1000000 AS DOUBLE)
         |    AS x_norm,
         |  CAST(round((sqrt(fyy.f2)) * 1000000) / 1000000 AS DOUBLE)
         |    AS y_norm,
         |  CAST(round((fxy.f2
         |    / nullif(sqrt(fxx.f2) * sqrt(fyy.f2), 0e0)
         |   ) * 1000000) / 1000000 AS DOUBLE) AS cka
         |FROM np CROSS JOIN fxy CROSS JOIN fxx CROSS JOIN fyy""".stripMargin
    },

    // quantized — a last-ulp engine disagreement would flip a cluster);
    // NaN (zero-norm vector) maps to NULL to mirror graft_cosine, and
    // NULLS LAST + the cid tie-break sends it to the lowest seed.
    "emb_kmeans_cosine" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |seeds AS (SELECT vec_id AS cid, v AS sv FROM e ORDER BY vec_id LIMIT 4),
         |sc AS (SELECT e.vec_id, s.cid,
         |        CASE WHEN isnan(list_cosine_similarity(e.v, s.sv))
         |          THEN NULL
         |          ELSE round(list_cosine_similarity(e.v, s.sv), 6) END AS cos
         |      FROM e CROSS JOIN seeds s),
         |a AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC NULLS LAST, cid) AS rn FROM sc)
         |      WHERE rn = 1),
         |mm AS (SELECT a.cid, f.dim, count(*) AS n_members,
         |        round((CAST(sum(CAST(round(f.x, 6) AS DECIMAL(18,6)))
         |          AS DOUBLE) / count(*)) * 1000000) / 1000000 AS m
         |      FROM a JOIN f USING (vec_id) GROUP BY 1, 2),
         |nn AS (SELECT cid, sqrt(CAST(sum(CAST(round(m * m, 6)
         |          AS DECIMAL(18,6))) AS DOUBLE)) AS nrm
         |      FROM mm GROUP BY 1)
         |SELECT mm.cid AS cluster_id, mm.dim,
         |  round((mm.m / nullif(nn.nrm, 0)) * 1000000) / 1000000 AS centroid, mm.n_members
         |FROM mm JOIN nn USING (cid) ORDER BY cluster_id, dim""".stripMargin,

    // PQ mirror: per-subspace argmin-L2 against the 4 lowest-id vectors'
    // subvectors — same 6-dp DECIMAL distance quantization and lower-cid
    // tie rule as every assignment in the library.
    "emb_pq" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |ff AS (SELECT vec_id, dim,
         |        CAST(floor((dim - 1) / 16) AS BIGINT) AS sub, x FROM f),
         |seeds AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4),
         |cent AS (SELECT ff.vec_id AS cid, ff.dim, ff.x AS c
         |      FROM ff JOIN seeds USING (vec_id)),
         |d AS (SELECT ff.vec_id, ff.sub, cent.cid,
         |        sum(CAST(round((ff.x - cent.c) * (ff.x - cent.c), 6)
         |          AS DECIMAL(18,6))) AS d2
         |      FROM ff JOIN cent USING (dim) GROUP BY 1, 2, 3),
         |r AS (SELECT vec_id, sub, cid, d2,
         |        row_number() OVER (PARTITION BY vec_id, sub
         |          ORDER BY d2, cid) AS rn
         |      FROM d)
         |SELECT vec_id, sub AS subspace, cid AS code,
         |  round(CAST(d2 AS DOUBLE), 6) AS distortion
         |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin,

    // The emb_pq chain with a per-subspace codebook-quality aggregate on
    // top — distortions 6-dp-quantized before the DECIMAL mean.
    "emb_pq_distortion" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |ff AS (SELECT vec_id, dim,
         |        CAST(floor((dim - 1) / 16) AS BIGINT) AS sub, x FROM f),
         |seeds AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4),
         |cent AS (SELECT ff.vec_id AS cid, ff.dim, ff.x AS c
         |      FROM ff JOIN seeds USING (vec_id)),
         |d AS (SELECT ff.vec_id, ff.sub, cent.cid,
         |        sum(CAST(round((ff.x - cent.c) * (ff.x - cent.c), 6)
         |          AS DECIMAL(18,6))) AS d2
         |      FROM ff JOIN cent USING (dim) GROUP BY 1, 2, 3),
         |r AS (SELECT vec_id, sub, cid, d2,
         |        row_number() OVER (PARTITION BY vec_id, sub
         |          ORDER BY d2, cid) AS rn
         |      FROM d),
         |pq AS (SELECT vec_id, sub, cid,
         |        round(CAST(d2 AS DOUBLE), 6) AS distortion
         |      FROM r WHERE rn = 1)
         |SELECT sub AS subspace, count(*) AS n,
         |  count(DISTINCT cid) AS codes_used,
         |  round((CAST(sum(CAST(distortion AS DECIMAL(28,6))) AS DOUBLE)
         |    / count(*)) * 1000000) / 1000000 AS mean_distortion,
         |  max(distortion) AS max_distortion
         |FROM pq GROUP BY 1 ORDER BY 1""".stripMargin,

    // ADC top-k mirror: the emb_pq code chain, a (query, subspace, code)
    // distance table from the same sub-centroids, code-joined sums,
    // per-query rank.
    "ann_adc_topk" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |ff AS (SELECT vec_id, dim,
         |        CAST(floor((dim - 1) / 16) AS BIGINT) AS sub, x FROM f),
         |seeds AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4),
         |centk AS (SELECT ff.vec_id AS cid, ff.sub, ff.dim, ff.x AS c
         |      FROM ff JOIN seeds USING (vec_id)),
         |d AS (SELECT ff.vec_id, ff.sub, centk.cid,
         |        sum(CAST(round((ff.x - centk.c) * (ff.x - centk.c), 6)
         |          AS DECIMAL(18,6))) AS d2
         |      FROM ff JOIN centk USING (dim) GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id AS neighbor_id, sub AS subspace, cid AS code
         |      FROM (SELECT vec_id, sub, cid,
         |              row_number() OVER (PARTITION BY vec_id, sub
         |                ORDER BY d2, cid) AS rn FROM d)
         |      WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, dim, x AS qx FROM f WHERE vec_id < 8),
         |dtab AS (SELECT q.query_id, centk.sub AS subspace, centk.cid AS code,
         |        sum(CAST(round((q.qx - centk.c) * (q.qx - centk.c), 6)
         |          AS DECIMAL(18,6))) AS dq2
         |      FROM q JOIN centk USING (dim) GROUP BY 1, 2, 3),
         |sc AS (SELECT dtab.query_id, codes.neighbor_id, sum(dq2) AS adc
         |      FROM codes JOIN dtab USING (subspace, code)
         |      WHERE dtab.query_id <> codes.neighbor_id
         |      GROUP BY 1, 2),
         |rk AS (SELECT query_id, neighbor_id, adc,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY adc, neighbor_id) AS rn
         |      FROM sc)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
         |  round(CAST(adc AS DOUBLE), 6) AS adc_d2
         |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // Outlier gate on the shared assignment CTEs (k=8): the winning d2
    // becomes the distance, per-cluster quantile_cont(0.9) mirrors
    // Spark's exact percentile.
    "emb_outlier" ->
      s"""WITH ${assignCtes(8)},
         |own AS (SELECT vec_id, cid, d2,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |      FROM d),
         |o AS (SELECT vec_id, cid,
         |        round(sqrt(CAST(d2 AS DOUBLE)) * 1000000) / 1000000 AS dist
         |      FROM own WHERE rn = 1),
         |t AS (SELECT cid,
         |        round(quantile_cont(dist, 0.9) * 1000000) / 1000000 AS thr
         |      FROM o GROUP BY 1)
         |SELECT o.vec_id, CAST(o.cid AS BIGINT) AS cluster_id, o.dist, t.thr,
         |  o.dist > t.thr AS is_outlier
         |FROM o JOIN t USING (cid) ORDER BY o.vec_id""".stripMargin,

    // Simplified silhouette on the shared assignment CTEs (k=8):
    // centroids are 6-dp member means (the kmeans convention), distances
    // the same DECIMAL-summed squared-deviation shape; a=b=0 -> s=0.
    "emb_silhouette" ->
      s"""WITH ${assignCtes(8)},
         |cent AS (SELECT a.cid, f.dim,
         |    round(CAST(sum(CAST(round(f.x, 6) AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) * 1000000) / 1000000 AS cc
         |  FROM a JOIN f USING (vec_id) GROUP BY 1, 2),
         |dd AS (SELECT f.vec_id, cent.cid,
         |    sqrt(CAST(sum(CAST(round((f.x - cent.cc) * (f.x - cent.cc), 6)
         |      AS DECIMAL(18,6))) AS DOUBLE)) AS dist
         |  FROM f JOIN cent USING (dim) GROUP BY 1, 2),
         |ab AS (SELECT dd.vec_id, a.cid AS cluster_id,
         |    min(CASE WHEN dd.cid = a.cid THEN dist END) AS ad,
         |    min(CASE WHEN dd.cid <> a.cid THEN dist END) AS bd
         |  FROM dd JOIN a ON a.vec_id = dd.vec_id GROUP BY 1, 2)
         |SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         |  round(ad * 1000000) / 1000000 AS a_dist,
         |  round(bd * 1000000) / 1000000 AS b_dist,
         |  round((CASE WHEN greatest(ad, bd) = 0 THEN 0.0
         |        ELSE (bd - ad) / greatest(ad, bd) END) * 1000000) / 1000000
         |    AS silhouette
         |FROM ab ORDER BY vec_id""".stripMargin,

    // Label-centroid margin: silhouette's DECIMAL distance recipe with
    // the given labels as clusters; rounded-tie distances count correct.
    "emb_label_margin" ->
      """WITH f AS (SELECT vec_id,
        |        CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
        |        CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl
        |      FROM embeddings),
        |cent AS (SELECT lbl AS clbl, dim,
        |        round(CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6)))
        |          AS DOUBLE) / count(*) * 1000000) / 1000000 AS c
        |      FROM f JOIN lab USING (vec_id) GROUP BY 1, 2),
        |d AS (SELECT vec_id, clbl,
        |        round(sqrt(CAST(sum(CAST(round((x - c) * (x - c), 6)
        |          AS DECIMAL(18,6))) AS DOUBLE)) * 1000000) / 1000000 AS dist
        |      FROM f JOIN cent USING (dim) GROUP BY 1, 2),
        |m AS (SELECT d.vec_id, lbl,
        |        min(CASE WHEN clbl = lbl THEN dist END) AS own,
        |        min(CASE WHEN clbl <> lbl THEN dist END) AS other
        |      FROM d JOIN lab ON d.vec_id = lab.vec_id GROUP BY 1, 2)
        |SELECT lbl AS label, count(*) AS n_vecs,
        |  round(CAST(sum(CAST(round(other - own, 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*) * 1000000) / 1000000 AS mean_margin,
        |  round(CAST(sum(CASE WHEN own <= other THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000) / 1000000
        |    AS frac_correct
        |FROM m GROUP BY 1 ORDER BY label""".stripMargin,

    // Products are 9-dp-quantized as scaled int64s (round(x*1e9) ->
    // BIGINT) and summed exactly — mirrors the Scala side's long path.
    "emb_covariance" ->
      s"""WITH e AS ($embCte),
         |x AS (SELECT vec_id, unnest(v) AS xi,
         |        generate_subscripts(v, 1) - 1 AS i FROM e),
         |m AS (SELECT i, sum(CAST(round(xi, 9) AS DECIMAL(28,9))) AS sx
         |      FROM x GROUP BY 1),
         |p AS (SELECT a.i AS i, b.i AS j,
         |        sum(CAST(round(a.xi * b.xi * 1e9, 0) AS BIGINT)) AS sp,
         |        count(*) AS n
         |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2)
         |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
         |  round((CAST(sp AS DOUBLE) / 1e9 / n
         |    - (CAST(mi.sx AS DOUBLE) / n) * (CAST(mj.sx AS DOUBLE) / n)) * 1000000) / 1000000
         |    + 0.0
         |    AS cov
         |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
         |ORDER BY i, j""".stripMargin,

    // Effective rank from the SAME cov chain: exact diagonal DECIMAL
    // trace, 9-dp-rounded square sums.
    "emb_effective_rank" ->
      s"""WITH e AS ($embCte),
         |x AS (SELECT vec_id, unnest(v) AS xi,
         |        generate_subscripts(v, 1) - 1 AS i FROM e),
         |m AS (SELECT i, sum(CAST(round(xi, 9) AS DECIMAL(28,9))) AS sx
         |      FROM x GROUP BY 1),
         |p AS (SELECT a.i AS i, b.i AS j,
         |        sum(CAST(round(a.xi * b.xi * 1e9, 0) AS BIGINT)) AS sp,
         |        count(*) AS n
         |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |cv AS (SELECT p.i, p.j,
         |        round((CAST(sp AS DOUBLE) / 1e9 / n
         |          - (CAST(mi.sx AS DOUBLE) / n)
         |          * (CAST(mj.sx AS DOUBLE) / n)) * 1000000) / 1000000 + 0.0 AS cov
         |      FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j),
         |k6 AS (SELECT i, j, cov,
         |        CAST(round(cov * 1e6) AS BIGINT) AS k FROM cv),
         |a AS (SELECT count(*) AS n_entries,
         |        sum(CASE WHEN i = j
         |          THEN CAST(cov AS DECIMAL(18,6)) END) AS tr,
         |        CAST(sum((CAST(k AS HUGEINT) * k + 500) // 1000)
         |          AS DECIMAL(38,0)) AS fr2i
         |      FROM k6)
         |SELECT n_entries, round(CAST(tr AS DOUBLE), 6) AS trace,
         |  round(sqrt(CAST(fr2i AS DOUBLE) / 1e9) * 1000000) / 1000000
         |    AS frob_norm,
         |  round(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE)
         |    / nullif(CAST(fr2i AS DOUBLE) / 1e9, 0.0) * 1000000) / 1000000
         |    AS effective_rank
         |FROM a""".stripMargin,

    // TwoNN: squared-L2 via the identical ‖a‖²+‖b‖²−2a·b double algebra
    // (list_dot_product matches the fused graft_dot accumulation order);
    // ln μ terms 9-dp DECIMAL-summed, MLE one division.
    "emb_intrinsic_dim" -> twoNNExactOracle,

    // ANN-fed TwoNN: SRP self-candidates, identical MLE tail.
    "emb_intrinsic_dim_ann" -> twoNNAnnOracle,

    // Estimator agreement: exact vs ANN-fed d̂ side by side, abs diff
    // of the two committed 6-dp estimates.
    "emb_intrinsic_dim_agree" ->
      s"""WITH ex AS ($twoNNExactOracle),
         |an AS ($twoNNAnnOracle)
         |SELECT ex.n_points AS n_exact, an.n_points AS n_ann,
         |  ex.id_twonn AS d_exact, an.id_twonn AS d_ann,
         |  round(abs(an.id_twonn - ex.id_twonn), 6) AS abs_diff
         |FROM ex, an""".stripMargin,

    // JL audit: the emb_project quantize+sign chain, integer distances
    // on both sides of the ratio (projected sum of 8 squared diffs;
    // original via per-i diffs — equals the dot identity exactly, all
    // < 2^53), 9-dp DECIMAL mean.
    "emb_jl_distortion" -> {
      val signs = Similarity.projectionSigns(64, 8)
      val projSums = (0 until 8).map { j =>
        s"CAST(sum(qi * ([${signs(j).mkString(",")}])[i]) AS BIGINT) AS proj_$j"
      }.mkString(",\n  ")
      val dpExpr = (0 until 8)
        .map(j => s"(a.proj_$j - b.proj_$j) * (a.proj_$j - b.proj_$j)")
        .mkString("\n      + ")
      s"""WITH e AS ($embCte),
         |s AS (SELECT vec_id, v,
         |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
         |      FROM e),
         |q AS (SELECT vec_id, i,
         |        CAST(floor(v[i] * CAST(127.0 AS DOUBLE) / scale
         |          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qi
         |      FROM s CROSS JOIN range(1, 65) t(i) WHERE scale > 0),
         |pj AS (SELECT vec_id,
         |  $projSums
         |  FROM q GROUP BY vec_id),
         |dq AS (SELECT a.vec_id AS ida,
         |        CAST(sum((a.qi - b.qi) * (a.qi - b.qi)) AS BIGINT) AS dq
         |      FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
         |      GROUP BY 1),
         |dp AS (SELECT a.vec_id AS ida,
         |      $dpExpr AS dp
         |      FROM pj a JOIN pj b ON b.vec_id = a.vec_id + 1),
         |r AS (SELECT CAST(dp.dp AS DOUBLE)
         |        / (8.0 * CAST(dq.dq AS DOUBLE)) AS ratio
         |      FROM dq JOIN dp ON dp.ida = dq.ida WHERE dq.dq > 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(round((CAST(sum(CAST(round(ratio, 9) AS DECIMAL(18,9)))
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |   ) * 1000000) / 1000000 AS DOUBLE) AS mean_ratio,
         |  CAST(round((min(ratio)) * 1000000) / 1000000 AS DOUBLE)
         |    AS min_ratio,
         |  CAST(round((max(ratio)) * 1000000) / 1000000 AS DOUBLE)
         |    AS max_ratio
         |FROM r""".stripMargin
    },

    // Greedy k-center: 3 materialized rounds (ADVICE: unrolled chains
    // materialize per round) of max-of-9-dp-min-distance with lowest-id
    // ties, the identical quantized trajectory the Scala loop walks.
    "emb_kcenter" -> {
      val rounds = (1 to 3).map { r =>
        val prev = s"d${r - 1}"
        s"""m$r AS (SELECT max(d9) AS m FROM $prev),
           |c$r AS (SELECT min(id) AS nid, max(m) AS nd
           |      FROM $prev CROSS JOIN m$r WHERE d9 = m),
           |s$r AS MATERIALIZED (SELECT p.id, p.v, p.n2, c$r.nd
           |      FROM $prev p JOIN c$r ON p.id = c$r.nid),
           |d$r AS MATERIALIZED (SELECT p.id, p.v, p.n2,
           |        least(p.d9, round(p.n2 + s.n2
           |          - 2.0 * list_dot_product(p.v, s.v), 9)) AS d9
           |      FROM $prev p CROSS JOIN s$r s)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS ($embCte),
         |n AS MATERIALIZED (SELECT vec_id AS id, v,
         |      list_dot_product(v, v) AS n2 FROM e),
         |s0 AS MATERIALIZED (SELECT id, v, n2 FROM n
         |      WHERE id = (SELECT min(id) FROM n)),
         |d0 AS MATERIALIZED (SELECT n.id, n.v, n.n2,
         |        round(n.n2 + s.n2 - 2.0 * list_dot_product(n.v, s.v), 9)
         |          AS d9
         |      FROM n CROSS JOIN s0 s),
         |$rounds
         |SELECT 0 AS round, id AS vec_id, CAST(NULL AS DOUBLE) AS dist2
         |FROM s0
         |UNION ALL SELECT 1, id,
         |  CAST(round((nd) * 1000000) / 1000000 AS DOUBLE) FROM s1
         |UNION ALL SELECT 2, id,
         |  CAST(round((nd) * 1000000) / 1000000 AS DOUBLE) FROM s2
         |UNION ALL SELECT 3, id,
         |  CAST(round((nd) * 1000000) / 1000000 AS DOUBLE) FROM s3
         |ORDER BY round""".stripMargin
    },

    // Unrolled power iteration on the SAME cov CTE as emb_covariance:
    // each round is a j-keyed matrix-vector product with 9-dp DECIMAL
    // sums, then a 9-dp normalized vector — the identical quantized
    // trajectory the Scala loop walks, ending with the largest-|x|
    // sign flip and 6-dp outputs.
    "emb_pca_power" -> {
      val covCtes =
        s"""e AS ($embCte),
           |xx AS (SELECT vec_id, unnest(v) AS xi,
           |        generate_subscripts(v, 1) - 1 AS i FROM e),
           |mm AS (SELECT i, sum(CAST(round(xi, 9) AS DECIMAL(28,9))) AS sx
           |      FROM xx GROUP BY 1),
           |pp AS (SELECT a.i AS i, b.i AS j,
           |        sum(CAST(round(a.xi * b.xi * 1e9, 0) AS BIGINT)) AS sp,
           |        count(*) AS n
           |      FROM xx a JOIN xx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
           |cov AS (SELECT CAST(pp.i AS BIGINT) AS i, CAST(pp.j AS BIGINT) AS j,
           |  round((CAST(sp AS DOUBLE) / 1e9 / n
           |    - (CAST(mi.sx AS DOUBLE) / n) * (CAST(mj.sx AS DOUBLE) / n)) * 1000000) / 1000000
           |    + 0.0
           |    AS cov
           |FROM pp JOIN mm mi ON mi.i = pp.i JOIN mm mj ON mj.i = pp.j)""".stripMargin
      // q9/q6 forms in lockstep with Similarity.powerLoop (r18 seed-3
      // fired the plain-round form: grid-product/quotient/sqrt rounds).
      val iterCtes = (1 to 3).map { k =>
        val prev = if (k == 1) "x0" else s"x${k - 1}"
        s"""y$k AS (SELECT c.i,
           |  CAST(sum(CAST(round(c.cov * p.x * 1e9) / 1e9 AS DECIMAL(28,9))) AS DOUBLE) AS y
           |  FROM cov c JOIN $prev p ON p.i = c.j GROUP BY 1),
           |n$k AS (SELECT sqrt(CAST(sum(CAST(round(y * y * 1e9) / 1e9 AS DECIMAL(28,9)))
           |  AS DOUBLE)) AS nrm FROM y$k),
           |x$k AS (SELECT i, round(y / nrm * 1e9) / 1e9 AS x FROM y$k CROSS JOIN n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $covCtes,
         |d AS (SELECT count(DISTINCT i) AS d FROM cov),
         |x0 AS (SELECT DISTINCT i, 1.0 / sqrt(d) AS x FROM cov CROSS JOIN d),
         |$iterCtes,
         |sgn AS (SELECT CASE WHEN x > 0 THEN 1.0 WHEN x < 0 THEN -1.0
         |               ELSE 0.0 END AS sgn
         |        FROM x3 ORDER BY abs(x) DESC, i LIMIT 1)
         |SELECT i, round(x * sgn * 1000000) / 1000000 AS loading,
         |  round(nrm * 1000000) / 1000000 AS eigenvalue_est
         |FROM x3 CROSS JOIN sgn CROSS JOIN n3 ORDER BY i""".stripMargin
    },

    // Eigengap: the pca_power chain run twice — once on cov, once on
    // the 9-dp deflated residual cov − λ₁·v₁v₁ᵀ built from the SAME
    // 6-dp published (loading, eigenvalue) values Spark deflates with.
    "emb_eigengap" -> {
      val covCtes =
        s"""e AS ($embCte),
           |xx AS (SELECT vec_id, unnest(v) AS xi,
           |        generate_subscripts(v, 1) - 1 AS i FROM e),
           |mm AS (SELECT i, sum(CAST(round(xi, 9) AS DECIMAL(28,9))) AS sx
           |      FROM xx GROUP BY 1),
           |pp AS (SELECT a.i AS i, b.i AS j,
           |        sum(CAST(round(a.xi * b.xi * 1e9, 0) AS BIGINT)) AS sp,
           |        count(*) AS n
           |      FROM xx a JOIN xx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
           |cov AS (SELECT CAST(pp.i AS BIGINT) AS i, CAST(pp.j AS BIGINT) AS j,
           |  round((CAST(sp AS DOUBLE) / 1e9 / n
           |    - (CAST(mi.sx AS DOUBLE) / n) * (CAST(mj.sx AS DOUBLE) / n)) * 1000000) / 1000000
           |    + 0.0
           |    AS cov
           |FROM pp JOIN mm mi ON mi.i = pp.i JOIN mm mj ON mj.i = pp.j)""".stripMargin
      // q9/q6 forms in lockstep with Similarity.powerLoop/eigenGap —
      // seed-3 of the r18 multi-seed sweep fired the plain-round form
      // HERE (λ₂ 0.022742 vs 0.022743): grid-product, quotient, sqrt
      // and deflation rounds all ride round(x·10^k)/10^k now.
      def iterChain(covName: String, p: String) = (1 to 3).map { k =>
        val prev = if (k == 1) s"${p}x0" else s"$p" + s"x${k - 1}"
        s"""${p}y$k AS (SELECT c.i,
           |  CAST(sum(CAST(round(c.cov * q.x * 1e9) / 1e9 AS DECIMAL(28,9))) AS DOUBLE) AS y
           |  FROM $covName c JOIN $prev q ON q.i = c.j GROUP BY 1),
           |${p}n$k AS (SELECT sqrt(CAST(sum(CAST(round(y * y * 1e9) / 1e9 AS DECIMAL(28,9)))
           |  AS DOUBLE)) AS nrm FROM ${p}y$k),
           |${p}x$k AS (SELECT i, round((CASE WHEN nrm = 0 THEN 0.0
           |  ELSE y / nrm END) * 1e9) / 1e9 AS x FROM ${p}y$k CROSS JOIN ${p}n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $covCtes,
         |d AS (SELECT count(DISTINCT i) AS d FROM cov),
         |ax0 AS (SELECT DISTINCT i, 1.0 / sqrt(d) AS x FROM cov CROSS JOIN d),
         |${iterChain("cov", "a")},
         |asgn AS (SELECT CASE WHEN x > 0 THEN 1.0 WHEN x < 0 THEN -1.0
         |               ELSE 0.0 END AS sgn
         |        FROM ax3 ORDER BY abs(x) DESC, i LIMIT 1),
         |v1 AS (SELECT i, round(x * sgn * 1000000) / 1000000 AS v
         |      FROM ax3 CROSS JOIN asgn),
         |l1 AS (SELECT round(nrm * 1000000) / 1000000 AS lambda1 FROM an3),
         |cov2 AS (SELECT c.i, c.j,
         |        round((c.cov - l1.lambda1 * a.v * b.v) * 1e9) / 1e9 + 0.0 AS cov
         |      FROM cov c JOIN v1 a ON a.i = c.i JOIN v1 b ON b.i = c.j
         |      CROSS JOIN l1),
         |bx0 AS (SELECT DISTINCT i, 1.0 / sqrt(d) AS x FROM cov2 CROSS JOIN d),
         |${iterChain("cov2", "b")},
         |l2 AS (SELECT round(nrm * 1000000) / 1000000 AS lambda2 FROM bn3)
         |SELECT lambda1, lambda2,
         |  round(lambda1 / nullif(lambda2, 0.0) * 1000000) / 1000000
         |    AS gap_ratio
         |FROM l1 CROSS JOIN l2""".stripMargin
    },

    // ABTT: the emb_pca_power CTE chain (cov + 3 power iterations +
    // sign fix) extended with the routed per-dim mean, the 9-dp DECIMAL
    // projection fold, and the routed corrected components.
    "emb_abtt" -> {
      val covCtes =
        s"""e AS ($embCte),
           |xx AS (SELECT vec_id, unnest(v) AS xi,
           |        generate_subscripts(v, 1) - 1 AS i FROM e),
           |mm AS (SELECT i, sum(CAST(round(xi, 9) AS DECIMAL(28,9))) AS sx
           |      FROM xx GROUP BY 1),
           |pp AS (SELECT a.i AS i, b.i AS j,
           |        sum(CAST(round(a.xi * b.xi * 1e9, 0) AS BIGINT)) AS sp,
           |        count(*) AS n
           |      FROM xx a JOIN xx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
           |cov AS (SELECT CAST(pp.i AS BIGINT) AS i, CAST(pp.j AS BIGINT) AS j,
           |  round((CAST(sp AS DOUBLE) / 1e9 / n
           |    - (CAST(mi.sx AS DOUBLE) / n) * (CAST(mj.sx AS DOUBLE) / n)) * 1000000) / 1000000
           |    + 0.0
           |    AS cov
           |FROM pp JOIN mm mi ON mi.i = pp.i JOIN mm mj ON mj.i = pp.j)""".stripMargin
      // q9/q6 iteration forms in lockstep with Similarity.powerLoop
      // (r18 multi-seed tie-class elimination; the mu/dt/final sites
      // below stay plain — their inputs are raw-float combinations
      // whose 17-significant-digit shortest reprs cannot terminate on
      // a short half).
      val iterCtes = (1 to 3).map { k =>
        val prev = if (k == 1) "x0" else s"x${k - 1}"
        s"""y$k AS (SELECT c.i,
           |  CAST(sum(CAST(round(c.cov * p.x * 1e9) / 1e9 AS DECIMAL(28,9))) AS DOUBLE) AS y
           |  FROM cov c JOIN $prev p ON p.i = c.j GROUP BY 1),
           |n$k AS (SELECT sqrt(CAST(sum(CAST(round(y * y * 1e9) / 1e9 AS DECIMAL(28,9)))
           |  AS DOUBLE)) AS nrm FROM y$k),
           |x$k AS (SELECT i, round(y / nrm * 1e9) / 1e9 AS x FROM y$k CROSS JOIN n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $covCtes,
         |d AS (SELECT count(DISTINCT i) AS d FROM cov),
         |x0 AS (SELECT DISTINCT i, 1.0 / sqrt(d) AS x FROM cov CROSS JOIN d),
         |$iterCtes,
         |sgn AS (SELECT CASE WHEN x > 0 THEN 1.0 WHEN x < 0 THEN -1.0
         |               ELSE 0.0 END AS sgn
         |        FROM x3 ORDER BY abs(x) DESC, i LIMIT 1),
         |v AS (SELECT i, round(x * sgn * 1000000) / 1000000 AS loading
         |      FROM x3 CROSS JOIN sgn),
         |cn AS (SELECT i, count(*) AS n FROM xx GROUP BY 1),
         |mu AS (SELECT mm.i,
         |        CAST(round((CAST(mm.sx AS DOUBLE) / cn.n
         |         ) * 1000000) / 1000000 AS DOUBLE) AS mu
         |      FROM mm JOIN cn ON cn.i = mm.i),
         |xm AS (SELECT xx.vec_id, xx.i, xx.xi - mu.mu AS a,
         |        v.loading AS b
         |      FROM xx JOIN mu ON mu.i = xx.i JOIN v ON v.i = xx.i),
         |dt AS (SELECT vec_id,
         |        CAST(sum(CAST(round(a * b, 9) AS DECIMAL(28,9)))
         |          AS DOUBLE) AS dot
         |      FROM xm GROUP BY 1)
         |SELECT xm.vec_id, CAST(xm.i + 1 AS BIGINT) AS dim,
         |  CAST(round((xm.a - dt.dot * xm.b) * 1000000) / 1000000
         |    AS DOUBLE) AS x_abtt
         |FROM xm JOIN dt ON dt.vec_id = xm.vec_id
         |ORDER BY xm.vec_id, dim""".stripMargin
    },

    // One Lloyd step: DECIMAL-exact distances -> argmin (ties -> lower
    // cid) -> DECIMAL centroid means; first-4-by-id seeds.
    "emb_kmeans_iter" ->
      s"""WITH ${assignCtes(4)}
         |SELECT a.cid AS cluster_id, f.dim,
         |  round((CAST(sum(CAST(round(f.x, 6) AS DECIMAL(18,6))) AS DOUBLE)
         |    / count(*)) * 1000000) / 1000000 AS centroid,
         |  count(*) AS n_members
         |FROM a JOIN f USING (vec_id)
         |GROUP BY 1, 2 ORDER BY cluster_id, dim""".stripMargin,

    // PageRank unrolled: each iteration = DECIMAL in-sums + dangling mass
    // Naive a<b<c triangle closure over the same co-purchase edges —
    // exact-count parity with the Spark side's degree-oriented wedge
    // join proves the orientation is semantics-free.
    "graph_triangles" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS a, r.pt AS b, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |      FROM e e1
        |      JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT x AS node FROM tri UNION ALL
        |      SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, count(*) AS n_triangles
        |FROM n GROUP BY 1 ORDER BY node""".stripMargin,

    // Degree = distinct-neighbor count over the same a<b edge set;
    // bucket via binary digit count (exact), bounds via power(2, b)
    // (exact in double far past any real bucket).
    "graph_degree_hist" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS a, r.pt AS b, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT node, count(*) AS degree FROM (
        |          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |h AS (SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
        |        degree FROM deg)
        |SELECT bucket, CAST(power(2, bucket) AS BIGINT) AS lo,
        |  CAST(power(2, bucket + 1) AS BIGINT) - 1 AS hi,
        |  count(*) AS n_nodes, max(degree) AS max_degree
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Coefficient arithmetic mirrored op-for-op (double cast before the
    // degree product, ×2 then ÷, CASE for degree-1 NULL).
    "graph_clustering" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS a, r.pt AS b, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |      FROM e e1
        |      JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT x AS node FROM tri UNION ALL
        |      SELECT y FROM tri UNION ALL SELECT z FROM tri),
        |tc AS (SELECT node, count(*) AS n_triangles FROM n GROUP BY 1),
        |deg AS (SELECT v, count(*) AS d FROM
        |      (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
        |SELECT deg.v AS node, deg.d AS degree,
        |  coalesce(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.d <= 1 THEN NULL
        |    ELSE round((CAST(coalesce(tc.n_triangles, 0) AS DOUBLE) * 2
        |      / (CAST(deg.d AS DOUBLE) * (deg.d - 1))) * 1000000)
        |      / 1000000 END
        |    AS clustering_coeff
        |FROM deg LEFT JOIN tc ON tc.node = deg.v
        |ORDER BY node""".stripMargin,

    // Exact connected components: transitive-closure min per node over
    // the same co-purchase edges (the clusterLabelsCte discipline) — the
    // star-contraction result must equal the true components exactly.
    "graph_cc_stars" ->
      """WITH RECURSIVE it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |reach AS (
        |  SELECT u, v FROM und
        |  UNION
        |  SELECT r.u, e2.v FROM reach r JOIN und e2 ON r.v = e2.u)
        |SELECT u AS node, least(u, min(v)) AS component
        |FROM reach GROUP BY u ORDER BY node""".stripMargin,

    // + the identical double update expression ((1-d) and d as the same
    // IEEE doubles Spark computes — 1e0-0.85e0, not a decimal literal).
    "ana_pagerank" -> {
      val d = 0.85
      val iterCtes = (1 to 3).map { k =>
        val prev = s"r${k - 1}"
        s"""c$k AS (SELECT e.dst AS node,
           |        sum(CAST(round(($prev.rank / deg.outdeg) * 1e12) / 1e12
           |          AS DECIMAL(18,12))) AS s
           |      FROM e JOIN $prev ON $prev.node = e.src
           |      JOIN deg ON deg.src = e.src GROUP BY 1),
           |d$k AS (SELECT coalesce(sum(CAST(round(rank * 1e12) / 1e12
           |            AS DECIMAL(18,12))),
           |          CAST(0 AS DECIMAL(18,12))) AS dm
           |      FROM $prev WHERE node NOT IN (SELECT src FROM deg)),
           |r$k AS (SELECT n.node,
           |        (1e0 - ${d}e0) / nn.n + ${d}e0 *
           |          (coalesce(CAST(c$k.s AS DOUBLE), 0e0)
           |            + CAST(d$k.dm AS DOUBLE) / nn.n) AS rank
           |      FROM nodes n CROSS JOIN nn CROSS JOIN d$k
           |      LEFT JOIN c$k ON c$k.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT event_type AS cur,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS nxt
         |      FROM events),
         |e AS (SELECT DISTINCT cur AS src, nxt AS dst FROM tr
         |      WHERE nxt IS NOT NULL AND nxt <> cur),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1e0 / nn.n AS rank FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT node, round(rank * 1000000) / 1000000 AS rank
         |FROM r3 ORDER BY node""".stripMargin
    },

    // Same iteration algebra as ana_pagerank with the teleport vector
    // restricted to {click, view}: r' = (1-d)·p + d·(in-sum + dm·p).
    "ana_pagerank_pers" -> {
      val d = 0.85
      val iterCtes = (1 to 3).map { k =>
        val prev = s"r${k - 1}"
        s"""c$k AS (SELECT e.dst AS node,
           |        sum(CAST(round(($prev.rank / deg.outdeg) * 1e12) / 1e12
           |          AS DECIMAL(18,12))) AS s
           |      FROM e JOIN $prev ON $prev.node = e.src
           |      JOIN deg ON deg.src = e.src GROUP BY 1),
           |d$k AS (SELECT coalesce(sum(CAST(round(rank * 1e12) / 1e12
           |            AS DECIMAL(18,12))),
           |          CAST(0 AS DECIMAL(18,12))) AS dm
           |      FROM $prev WHERE node NOT IN (SELECT src FROM deg)),
           |r$k AS (SELECT n.node,
           |        (1e0 - ${d}e0) * pe.p + ${d}e0 *
           |          (coalesce(CAST(c$k.s AS DOUBLE), 0e0)
           |            + CAST(d$k.dm AS DOUBLE) * pe.p) AS rank
           |      FROM nodes n JOIN pers pe ON pe.node = n.node
           |      CROSS JOIN d$k
           |      LEFT JOIN c$k ON c$k.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT event_type AS cur,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS nxt
         |      FROM events),
         |e AS (SELECT DISTINCT cur AS src, nxt AS dst FROM tr
         |      WHERE nxt IS NOT NULL AND nxt <> cur),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_s FROM nodes
         |       WHERE node IN ('click', 'view')),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |pers AS (SELECT node, CASE WHEN node IN ('click', 'view')
         |           THEN 1e0 / ns.n_s ELSE 0e0 END AS p
         |         FROM nodes CROSS JOIN ns),
         |r0 AS (SELECT node, p AS rank FROM pers),
         |$iterCtes
         |SELECT node, round(rank * 1000000) / 1000000 AS rank
         |FROM r3 ORDER BY node""".stripMargin
    },

    // Markov stationary distribution: 5 unrolled pi' = pi*P rounds on the
    // row-normalized transition counts (self-loops kept — transitions()
    // keeps them), dangling mass redistributed uniformly, 12-dp DECIMAL
    // per-round sums — the pagerank CTE algebra minus damping.
    "ana_markov_stationary" -> {
      val iterCtes = (1 to 5).map { k =>
        val prev = s"p${k - 1}"
        s"""f$k AS (SELECT t.to_type AS state,
           |        sum(CAST(round(($prev.pi * t.p) * 1e12) / 1e12
           |          AS DECIMAL(18,12))) AS s
           |      FROM t JOIN $prev ON $prev.state = t.from_type GROUP BY 1),
           |d$k AS (SELECT coalesce(sum(CAST(round(pi * 1e12) / 1e12
           |            AS DECIMAL(18,12))),
           |          CAST(0 AS DECIMAL(18,12))) AS dm
           |      FROM $prev WHERE state NOT IN (SELECT from_type FROM t)),
           |p$k AS (SELECT st.state,
           |        coalesce(CAST(f$k.s AS DOUBLE), 0e0)
           |          + CAST(d$k.dm AS DOUBLE) / nn.k AS pi
           |      FROM states st CROSS JOIN nn CROSS JOIN d$k
           |      LEFT JOIN f$k ON f$k.state = st.state)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT from_type, to_type, count(*) AS n FROM (
         |      SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS to_type
         |      FROM events)
         |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1),
         |t AS (SELECT tr.from_type, tr.to_type,
         |        round((CAST(tr.n AS DOUBLE) / tot.tot) * 1e12) / 1e12 AS p
         |      FROM tr JOIN tot USING (from_type)),
         |states AS (SELECT from_type AS state FROM tr
         |           UNION SELECT to_type FROM tr),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
         |p0 AS (SELECT state, 1e0 / nn.k AS pi FROM states CROSS JOIN nn),
         |$iterCtes
         |SELECT state AS event_type, round(pi * 1000000) / 1000000 AS pi
         |FROM p5 ORDER BY event_type""".stripMargin
    },

    // Entropy rate: the stationary chain above, then
    // −Σ π·p·ln p over observed transitions (12-dp DECIMAL terms).
    "ana_markov_entropy" -> {
      val iterCtes = (1 to 5).map { k =>
        val prev = s"p${k - 1}"
        s"""f$k AS (SELECT t.to_type AS state,
           |        sum(CAST(round(($prev.pi * t.p) * 1e12) / 1e12
           |          AS DECIMAL(18,12))) AS s
           |      FROM t JOIN $prev ON $prev.state = t.from_type GROUP BY 1),
           |d$k AS (SELECT coalesce(sum(CAST(round(pi * 1e12) / 1e12
           |            AS DECIMAL(18,12))),
           |          CAST(0 AS DECIMAL(18,12))) AS dm
           |      FROM $prev WHERE state NOT IN (SELECT from_type FROM t)),
           |p$k AS (SELECT st.state,
           |        coalesce(CAST(f$k.s AS DOUBLE), 0e0)
           |          + CAST(d$k.dm AS DOUBLE) / nn.k AS pi
           |      FROM states st CROSS JOIN nn CROSS JOIN d$k
           |      LEFT JOIN f$k ON f$k.state = st.state)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT from_type, to_type, count(*) AS n FROM (
         |      SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS to_type
         |      FROM events)
         |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1),
         |t AS (SELECT tr.from_type, tr.to_type,
         |        round((CAST(tr.n AS DOUBLE) / tot.tot) * 1e12) / 1e12 AS p
         |      FROM tr JOIN tot USING (from_type)),
         |states AS (SELECT from_type AS state FROM tr
         |           UNION SELECT to_type FROM tr),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
         |p0 AS (SELECT state, 1e0 / nn.k AS pi FROM states CROSS JOIN nn),
         |$iterCtes,
         |pif AS (SELECT state, round(pi * 1000000) / 1000000 AS pi FROM p5),
         |h AS (SELECT sum(CAST(round(pif.pi * t.p * ln(t.p), 12)
         |          AS DECIMAL(18,12))) AS sh,
         |        CAST(count(*) AS BIGINT) AS n_transitions
         |      FROM t JOIN pif ON pif.state = t.from_type)
         |SELECT nn.k AS n_states, h.n_transitions,
         |  CAST(round((-CAST(sh AS DOUBLE)) * 1000000) / 1000000
         |    AS DOUBLE) AS entropy_rate,
         |  CAST(round((-CAST(sh AS DOUBLE)
         |    / nullif(ln(CAST(nn.k AS DOUBLE)), 0.0)) * 1000000) / 1000000
         |    AS DOUBLE) AS normalized
         |FROM h CROSS JOIN nn""".stripMargin
    },

    // DiD: four 6-dp cell means, then the double difference of the
    // published values.
    "ana_did" -> {
      def cell(cond: String, name: String) =
        s"""(SELECT n AS n_$name, mean AS mean_$name FROM cells
           | WHERE $cond) $name""".stripMargin
      s"""WITH cells AS (SELECT (user_id % 2 = 1) AS treated,
         |      (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
         |      CAST(count(*) AS BIGINT) AS n,
         |      CAST(round((CAST(sum(CAST(value AS DECIMAL(24,6)))
         |        AS DOUBLE) / count(*)) * 1000000) / 1000000 AS DOUBLE)
         |        AS mean
         |    FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
         |SELECT n_t_pre, mean_t_pre, n_t_post, mean_t_post,
         |  n_c_pre, mean_c_pre, n_c_post, mean_c_post,
         |  CAST(round(((mean_t_post - mean_t_pre)
         |    - (mean_c_post - mean_c_pre)) * 1000000) / 1000000
         |    AS DOUBLE) AS did
         |FROM ${cell("treated AND NOT post", "t_pre")}
         |CROSS JOIN ${cell("treated AND post", "t_post")}
         |CROSS JOIN ${cell("NOT treated AND NOT post", "c_pre")}
         |CROSS JOIN ${cell("NOT treated AND post", "c_post")}""".stripMargin
    },

    // Kaplan–Meier mirror: per-user spans → daily step + churn flag, then
    // the product-limit curve via running windows instead of the Spark
    // side's triangular join (same arithmetic: 6-dp-rounded ln factors
    // into a DECIMAL running sum, exp at the end).
    "ana_survival" ->
      """WITH spans AS (SELECT user_id,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) AS t1
        |  FROM events GROUP BY 1),
        |endt AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS t_end FROM events),
        |pu AS (SELECT least(CAST(floor((t1 - t0) / 86400.0) AS BIGINT), 90) AS step,
        |         ((t_end - t1) > 604800
        |           AND floor((t1 - t0) / 86400.0) <= 90) AS event
        |       FROM spans CROSS JOIN endt),
        |ps AS (SELECT step,
        |         CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |         CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
        |       FROM pu GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pu),
        |pr AS (SELECT step, d, c,
        |         CAST(coalesce(sum(d + c) OVER (ORDER BY step
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS prior
        |       FROM ps),
        |lf AS (SELECT step, d, c, n_total - prior AS n_risk,
        |         CASE WHEN d > 0 THEN CAST(round(
        |             ln(1.0 - CAST(d AS DOUBLE) / (n_total - prior)), 6)
        |           AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS f
        |       FROM pr CROSS JOIN tot)
        |SELECT step, n_risk, d AS n_events, c AS n_censored,
        |  round(exp(CAST(sum(f) OVER (ORDER BY step
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6) AS survival
        |FROM lf ORDER BY step""".stripMargin,

    // A/B z-test mirror: identical exact integer inputs, the same
    // DECIMAL(24,12)-routed 6-dp rounding on every emitted float.
    "ana_ab_test" ->
      """WITH pu AS (SELECT user_id % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |agg AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
        |  FROM pu),
        |m AS (SELECT n_a, x_a, n_b, x_b,
        |    CAST(x_a AS DOUBLE) / n_a AS pa, CAST(x_b AS DOUBLE) / n_b AS pb,
        |    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pool
        |  FROM agg),
        |z AS (SELECT *, CASE WHEN sqrt(pool * (1.0 - pool)
        |      * (1.0 / n_a + 1.0 / n_b)) > 0
        |    THEN (pa - pb) / sqrt(pool * (1.0 - pool)
        |      * (1.0 / n_a + 1.0 / n_b)) END AS zv
        |  FROM m)
        |SELECT n_a, x_a, n_b, x_b,
        |  CAST(round((pa) * 1000000) / 1000000 AS DOUBLE) AS rate_a,
        |  CAST(round((pb) * 1000000) / 1000000 AS DOUBLE) AS rate_b,
        |  CAST(round((pa - pb) * 1000000) / 1000000 AS DOUBLE) AS lift,
        |  CAST(round((zv) * 1000000) / 1000000 AS DOUBLE) AS z,
        |  coalesce(abs(zv) > 1.96, false) AS significant
        |FROM z ORDER BY n_a""".stripMargin,

    // Time-decay attribution mirror: 6-dp weights into DECIMAL(18,6),
    // double÷double credit shares (both operands exactly shared), 6-dp
    // credit into the per-channel DECIMAL total.
    "ana_attribution_decay" ->
      """WITH convs AS (SELECT user_id AS u, event_id AS conv_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS conv_s
        |  FROM events WHERE event_type = 'purchase'),
        |touches AS (SELECT user_id AS u, event_type AS channel,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS touch_s
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (SELECT conv_id, channel,
        |    CAST(round(pow(0.5,
        |      CAST(conv_s - touch_s AS DOUBLE) / 86400), 6)
        |      AS DECIMAL(18,6)) AS w
        |  FROM convs JOIN touches USING (u)
        |  WHERE touch_s <= conv_s AND conv_s - touch_s <= 604800),
        |tot AS (SELECT conv_id, sum(w) AS wsum FROM pairs GROUP BY 1),
        |cr AS (SELECT channel,
        |    CAST(round((CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE)) * 1000000) / 1000000
        |      AS DECIMAL(18,6)) AS credit
        |  FROM pairs JOIN tot USING (conv_id))
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  round(CAST(sum(credit) AS DOUBLE), 6) AS credit
        |FROM cr GROUP BY 1 ORDER BY channel""".stripMargin,

    "ana_new_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        |            FROM events),
        |fd AS (SELECT u, min(day) AS first_day FROM ud GROUP BY 1),
        |act AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active
        |        FROM ud GROUP BY 1),
        |nw AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
        |       FROM fd GROUP BY 1)
        |SELECT act.day, n_active, coalesce(n_new, 0) AS n_new,
        |  n_active - coalesce(n_new, 0) AS n_returning
        |FROM act LEFT JOIN nw USING (day) ORDER BY day""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS tok,
         |        generate_subscripts(toks, 1) AS i FROM base),
         |pr AS (SELECT a.tok AS term, b.tok AS next, count(*) AS n
         |       FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       GROUP BY 1, 2),
         |tot AS (SELECT term, sum(n) AS n_term FROM pr GROUP BY 1),
         |rk AS (SELECT term, next, n, row_number() OVER (PARTITION BY term
         |         ORDER BY n DESC, next) AS rn FROM pr)
         |SELECT rk.term, next, CAST(n AS BIGINT) AS n,
         |  round((CAST(n AS DOUBLE) / n_term) * 1000000) / 1000000 AS p
         |FROM rk JOIN tot USING (term) WHERE rn = 1 ORDER BY term""".stripMargin,

    "text_zipf_slope" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |top AS (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 200),
         |rk AS (SELECT row_number() OVER (ORDER BY freq DESC, term) AS r,
         |         freq FROM top),
         |xy AS (SELECT round(ln(CAST(r AS DOUBLE)), 6) AS x,
         |         round(ln(CAST(freq AS DOUBLE)), 6) AS y FROM rk),
         |s AS (SELECT count(*) AS n_terms,
         |        sum(CAST(x AS DECIMAL(28,6))) AS sx,
         |        sum(CAST(y AS DECIMAL(28,6))) AS sy,
         |        sum(CAST(round((x * y) * 1000000) / 1000000
         |          AS DECIMAL(28,6))) AS sxy,
         |        sum(CAST(round((x * x) * 1000000) / 1000000
         |          AS DECIMAL(28,6))) AS sxx
         |      FROM xy)
         |SELECT CAST(n_terms AS BIGINT) AS n_terms,
         |  round(((CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_terms)
         |    / (CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_terms))
         |    * 1000000) / 1000000 AS zipf_slope
         |FROM s""".stripMargin,

    // Char-class mirror: length-difference counts per regex class ('g'
    // flag — DuckDB replaces first-match-only by default), BIGINT sums,
    // one double division per fraction.
    "text_script_hist" ->
      """WITH c AS (SELECT source,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    CAST(sum(length(text)
        |      - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS BIGINT)
        |      AS n_alpha,
        |    CAST(sum(length(text)
        |      - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT)
        |      AS n_digit,
        |    CAST(sum(length(text)
        |      - length(regexp_replace(text, '\s', '', 'g'))) AS BIGINT)
        |      AS n_space
        |  FROM documents GROUP BY 1)
        |SELECT source, n_chars,
        |  round((CAST(n_alpha AS DOUBLE) / n_chars) * 1000000) / 1000000 AS frac_alpha,
        |  round((CAST(n_digit AS DOUBLE) / n_chars) * 1000000) / 1000000 AS frac_digit,
        |  round((CAST(n_space AS DOUBLE) / n_chars) * 1000000) / 1000000 AS frac_space,
        |  round((CAST(n_chars - n_alpha - n_digit - n_space AS DOUBLE)
        |    / n_chars) * 1000000) / 1000000 AS frac_other
        |FROM c ORDER BY source""".stripMargin,

    // Simpson mirror: exact integer moments (DECIMAL(19)×DECIMAL(19)
    // products, overflow-free by construction), one double ratio.
    "text_simpson" ->
      """WITH toks AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |f AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(CAST(c AS DECIMAL(19,0)) * CAST(c - 1 AS DECIMAL(19,0)))
        |      AS rep_mass
        |  FROM f GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |  CASE WHEN n_tokens > 1 THEN
        |    round((1.0 - CAST(rep_mass AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)))
        |      * 1000000) / 1000000
        |  END AS simpson_diversity
        |FROM m ORDER BY source""".stripMargin,

    // Heaps mirror: the same equal-width id buckets (double division +
    // floor, least-clamped), first-bucket-per-type counts, nBuckets-row
    // cumulative windows, then the zipf-recipe OLS.
    "text_heaps_law" ->
      s"""WITH base AS ($docToks),
         |bounds AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
         |    CAST(max(doc_id) AS BIGINT) AS hi FROM documents),
         |toks AS (SELECT least(9, CAST(floor(
         |      CAST((doc_id - lo) * 10 AS DOUBLE)
         |        / greatest(hi - lo + 1, 1)) AS BIGINT)) AS b,
         |    unnest(toks) AS tok
         |  FROM base CROSS JOIN bounds),
         |mass AS (SELECT b, CAST(count(*) AS BIGINT) AS mass
         |         FROM toks GROUP BY 1),
         |fb AS (SELECT min(b) AS b FROM toks GROUP BY tok),
         |nt AS (SELECT b, CAST(count(*) AS BIGINT) AS new_types
         |       FROM fb GROUP BY 1),
         |pts AS (SELECT
         |    round(ln(CAST(sum(mass.mass) OVER w AS DOUBLE)), 6) AS x,
         |    round(ln(CAST(sum(coalesce(nt.new_types, 0)) OVER w AS DOUBLE)),
         |      6) AS y
         |  FROM mass LEFT JOIN nt USING (b)
         |  WINDOW w AS (ORDER BY mass.b ROWS UNBOUNDED PRECEDING)),
         |s AS (SELECT count(*) AS n_points,
         |        sum(CAST(x AS DECIMAL(28,6))) AS sx,
         |        sum(CAST(y AS DECIMAL(28,6))) AS sy,
         |        sum(CAST(round((x * y) * 1000000) / 1000000
         |          AS DECIMAL(28,6))) AS sxy,
         |        sum(CAST(round((x * x) * 1000000) / 1000000
         |          AS DECIMAL(28,6))) AS sxx
         |      FROM pts)
         |SELECT CAST(n_points AS BIGINT) AS n_points,
         |  round(((CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_points)
         |    / (CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_points))
         |    * 1000000) / 1000000 AS heaps_beta
         |FROM s""".stripMargin,

    "text_postings" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |u AS (SELECT DISTINCT doc_id, term FROM t)
         |SELECT term, count(*) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         |FROM u GROUP BY term ORDER BY term""".stripMargin,

    "text_postings_capped" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |u AS (SELECT DISTINCT doc_id, term FROM t),
         |g AS (SELECT term, count(*) AS df,
         |        string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         |      FROM u GROUP BY term)
         |SELECT term, df, postings FROM g WHERE df <= 40 ORDER BY term""".stripMargin,

    "text_fertility" ->
      s"""WITH p AS (SELECT lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(text,
         |      '${TextAnalysis.subwordPattern}')) AS BIGINT) AS s,
         |    CAST(length(text) AS BIGINT) AS c
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(s) AS BIGINT) AS n_subwords,
         |  round((CAST(sum(s) AS DOUBLE) / nullif(sum(w), 0)) * 1000000)
         |    / 1000000 AS fertility,
         |  round((CAST(sum(c) AS DOUBLE) / nullif(sum(s), 0)) * 1000000)
         |    / 1000000 AS chars_per_subword
         |FROM p GROUP BY 1 ORDER BY lang""".stripMargin,

    "text_hapax" ->
      """WITH t AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |f AS (SELECT source, term, count(*) AS f FROM t GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  round((CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / nullif(count(*), 0)) * 1000000) / 1000000 AS hapax_ratio
        |FROM f GROUP BY 1 ORDER BY source""".stripMargin,

    // Yule's K: Σf² in HUGEINT mirrors the DECIMAL(38,0) sum; one double
    // division, DECIMAL(24,12)-routed.
    "text_yule_k" ->
      """WITH t AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
        |      FROM t GROUP BY 1, 2),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |        CAST(sum(f) AS BIGINT) AS n_tokens,
        |        sum(CAST(f AS HUGEINT) * CAST(f AS HUGEINT)) AS sff
        |      FROM tc GROUP BY 1)
        |SELECT source, n_terms, n_tokens,
        |  round((10000.0 * (CAST(sff AS DOUBLE)
        |      - CAST(n_tokens AS DOUBLE))
        |    / nullif(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE),
        |      0.0)) * 1000000) / 1000000 AS yule_k
        |FROM m ORDER BY source""".stripMargin,

    // Burstiness: same top-200 vocabulary cut (freq DESC, term) as
    // text_vocab; centered moment n·Σc² − (Σc)² formed exactly in
    // HUGEINT (a term at exactly 1/doc everywhere → numerator 0).
    "text_burstiness" ->
      """WITH base AS (SELECT doc_id,
        |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM base),
        |pd AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
        |      FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
        |      FROM tok GROUP BY 1),
        |top AS (SELECT term FROM cnt ORDER BY freq DESC, term LIMIT 200),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |m AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        |        CAST(sum(c) AS BIGINT) AS sc,
        |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS scc
        |      FROM pd WHERE term IN (SELECT term FROM top) GROUP BY 1)
        |SELECT term, df, sc AS total,
        |  round((CAST(CAST(n_docs AS HUGEINT) * scc
        |      - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS DOUBLE)
        |    / nullif(CAST(n_docs AS DOUBLE) * CAST(sc AS DOUBLE), 0.0))
        |    * 1000000) / 1000000 AS fano
        |FROM m CROSS JOIN nd ORDER BY term""".stripMargin,

    // MSTTR: 0-based positions (generate_subscripts is 1-based) chop
    // into 8-token full segments; each segment TTR is a 6-dp DECIMAL
    // term; the per-source mean is DECIMAL-routed.
    "text_msttr" ->
      """WITH base AS (SELECT source, doc_id,
        |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents),
        |t AS (SELECT source, doc_id, unnest(toks) AS term,
        |        generate_subscripts(toks, 1) - 1 AS pos FROM base),
        |sg AS (SELECT source, doc_id,
        |        CAST(floor(pos / 8) AS BIGINT) AS seg,
        |        count(*) AS n_tok,
        |        CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
        |      FROM t GROUP BY 1, 2, 3 HAVING count(*) = 8)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_segments,
        |  round((CAST(sum(CAST(round((CAST(n_distinct AS DOUBLE)
        |      / 8.0) * 1000000) / 1000000 AS DECIMAL(18,6))) AS DOUBLE)
        |    / nullif(CAST(count(*) AS DOUBLE), 0.0)) * 1000000) / 1000000
        |    AS msttr
        |FROM sg GROUP BY 1 ORDER BY source""".stripMargin,

    // Conditional char-bigram entropy: chain rule with no p division —
    // (sum c ln c over prefixes − over cells)/n, both 6-dp DECIMAL sums
    // (the entropy discipline); per-doc H and the source mean routed.
    "text_char_bigram_entropy" ->
      """WITH d AS (SELECT source, doc_id, substr(text, 1, 256) AS s
        |      FROM documents),
        |g AS (SELECT source, doc_id,
        |        unnest(list_transform(range(1, length(s)),
        |          i -> substr(s, CAST(i AS INT), 2))) AS bg
        |      FROM d WHERE length(s) >= 2),
        |cells AS (SELECT source, doc_id, bg, count(*) AS c
        |      FROM g GROUP BY 1, 2, 3),
        |pre AS (SELECT source, doc_id, substr(bg, 1, 1) AS c1,
        |        CAST(sum(c) AS BIGINT) AS c
        |      FROM cells GROUP BY 1, 2, 3),
        |a12 AS (SELECT source, doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
        |        CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6)))
        |          AS DECIMAL(38,6)) AS s_bg
        |      FROM cells GROUP BY 1, 2),
        |a1 AS (SELECT source, doc_id,
        |        CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6)))
        |          AS DECIMAL(38,6)) AS s_c1
        |      FROM pre GROUP BY 1, 2),
        |pd AS (SELECT a12.source, a12.doc_id, n_bg,
        |        CAST(round((CAST(s_c1 - s_bg AS DOUBLE)
        |          / CAST(n_bg AS DOUBLE)) * 1000000) / 1000000
        |          AS DECIMAL(18,6)) AS h6
        |      FROM a12 JOIN a1 USING (source, doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_bg) AS BIGINT) AS n_bigrams,
        |  CAST(round((CAST(sum(h6) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE)
        |    AS mean_cond_entropy
        |FROM pd GROUP BY 1 ORDER BY source""".stripMargin,

    "sample_curriculum" ->
      """WITH s AS (SELECT doc_id, source,
        |    coalesce(CAST(len(list_distinct(
        |        list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
        |      / nullif(len(list_filter(string_split(text, ' '), x -> x <> '')), 0),
        |      0.0) AS score
        |  FROM documents)
        |SELECT doc_id, source, round(score, 6) AS score,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, doc_id) AS BIGINT) AS rank_in_source
        |FROM s ORDER BY rank_in_source, source, doc_id""".stripMargin,

    "text_skipgrams" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT doc_id, unnest(toks) AS t,
         |          generate_subscripts(toks, 1) AS i FROM base)
         |SELECT a.t AS center, b.t AS context, count(*) AS cnt
         |FROM tok a JOIN tok b ON b.doc_id = a.doc_id
         |  AND b.i BETWEEN a.i - 2 AND a.i + 2 AND b.i <> a.i
         |GROUP BY 1, 2 ORDER BY cnt DESC, center, context LIMIT 100""".stripMargin,

    "text_perplexity" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
         |tot AS (SELECT term, CAST(sum(c) AS BIGINT) AS cw FROM tf GROUP BY 1),
         |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n_corpus FROM tot),
         |a AS (SELECT tf.doc_id, CAST(sum(tf.c) AS BIGINT) AS n_tokens,
         |        sum(CAST(round(tf.c * ln(CAST(tot.cw AS DOUBLE) / n.n_corpus), 6)
         |          AS DECIMAL(18,6))) AS slogp
         |      FROM tf JOIN tot USING (term) CROSS JOIN n GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  round((-CAST(slogp AS DOUBLE) / n_tokens) * 1000000) / 1000000
         |    AS log_perplexity,
         |  round(exp(-CAST(slogp AS DOUBLE) / n_tokens), 6) AS perplexity
         |FROM a ORDER BY doc_id""".stripMargin,

    // Mirrors perplexityBigram exactly: same λ literals, same fixed
    // association λ·(cb/cp) + (1−λ)·(cw/N), same 6-dp DECIMAL fold, and
    // the same TIE-EXACT integer final round — (2x+m)//(2m) on the
    // 10⁶-scaled sum — because the double quotient lands exactly on the
    // 0.5×10⁻⁶ rounding tie for ~1/m of docs (see the operator scaladoc).
    "text_perplexity_bigram" ->
      s"""WITH base AS ($docToks),
         |tok AS (SELECT doc_id, unnest(toks) AS term,
         |          generate_subscripts(toks, 1) AS i FROM base),
         |dbg AS (SELECT a.doc_id, a.term AS prev, b.term AS term,
         |          count(*) AS c
         |        FROM tok a JOIN tok b
         |          ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |        GROUP BY 1, 2, 3),
         |cb AS (SELECT prev, term, CAST(sum(c) AS BIGINT) AS cb
         |       FROM dbg GROUP BY 1, 2),
         |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM cb GROUP BY 1),
         |uni AS (SELECT term, count(*) AS cw FROM tok GROUP BY 1),
         |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n_corpus FROM uni),
         |a AS (SELECT dbg.doc_id, CAST(sum(dbg.c) AS BIGINT) AS n_bigrams,
         |        sum(CAST(round(dbg.c * ln(
         |            0.75 * (CAST(cb.cb AS DOUBLE) / cp.cp)
         |          + 0.25 * (CAST(uni.cw AS DOUBLE) / n.n_corpus)), 6)
         |          AS DECIMAL(18,6))) AS slogp
         |      FROM dbg JOIN cb USING (prev, term) JOIN cp USING (prev)
         |        JOIN uni USING (term) CROSS JOIN n GROUP BY 1),
         |x AS (SELECT doc_id, n_bigrams, slogp,
         |        CAST(-slogp * 1000000 AS BIGINT) AS x FROM a)
         |SELECT doc_id, n_bigrams,
         |  CAST((x * 2 + n_bigrams) // (n_bigrams * 2) AS DOUBLE) / 1000000.0
         |    AS log_perplexity,
         |  round(exp(-CAST(slogp AS DOUBLE) / n_bigrams), 6) AS perplexity
         |FROM x ORDER BY doc_id""".stripMargin,

    // Exact interpolated quartiles as broadcast boundaries (the ana_rfm
    // recipe); integer lengths keep the comparisons engine-stable.
    "text_length_buckets" ->
      s"""WITH lens AS (SELECT doc_id, CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM documents),
         |b AS (SELECT quantile_cont(n_subwords, [0.25, 0.5, 0.75]) AS bnds
         |      FROM lens)
         |SELECT doc_id, n_subwords,
         |  CAST(1 + len(list_filter(bnds, x -> CAST(n_subwords AS DOUBLE) > x))
         |    AS BIGINT) AS bucket
         |FROM lens CROSS JOIN b ORDER BY doc_id""".stripMargin,

    // Same sessionization CTE as stream_session, plus the ordered
    // event-type string_agg (ties broken by event_id on both sides).
    "ana_session_sequences" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events,
        |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS sequence
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // Same session CTE chain grouped by the path string; top-10 with the
    // (count desc, sequence asc) total order mirrored.
    "ana_top_paths" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |seq AS (
        |  SELECT user_id, sid, count(*) AS n_events,
        |    string_agg(event_type, ' ' ORDER BY ts, event_id) AS sequence
        |  FROM s GROUP BY user_id, sid)
        |SELECT sequence, count(*) AS n_sessions,
        |  round(avg(n_events) * 1000000) / 1000000 AS avg_len
        |FROM seq GROUP BY 1
        |ORDER BY n_sessions DESC, sequence LIMIT 10""".stripMargin,

    // Session entropy: the session CTE chain, then H = ln n −
    // (Σ c·ln c)/n per session (6-dp DECIMAL terms), per-user mean
    // routed and max taken on the quantized per-session values.
    "ana_session_entropy" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |cells AS (SELECT user_id, sid, event_type, count(*) AS c
        |      FROM s GROUP BY 1, 2, 3),
        |se AS (SELECT user_id, sid, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6)))
        |          AS DECIMAL(38,6)) AS sclogc
        |      FROM cells GROUP BY 1, 2),
        |h AS (SELECT user_id, n,
        |        CAST(round((ln(n) - CAST(sclogc AS DOUBLE)
        |          / CAST(n AS DOUBLE)) * 1000000) / 1000000
        |          AS DECIMAL(18,6)) AS h6
        |      FROM se)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(round((CAST(sum(h6) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE)
        |    AS mean_entropy,
        |  CAST(max(h6) AS DOUBLE) AS max_entropy
        |FROM h GROUP BY 1 ORDER BY user_id""".stripMargin,

    // ORDER BY includes value: (orderkey, linenumber) has real duplicate
    // rows in this data, so the value column completes the total order.
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

    // CMS registers rebuilt in SQL (same consts/hash as sketch_cms),
    // dot-product per row, min over rows — plus the exact join count.
    "sketch_join_size" -> {
      val consts = (0 until 3).map(r =>
        s"($r, ${1103515245L * (r + 1) % 2147483647L}, " +
          s"${12345L * (r + 1) % 2147483647L})").mkString(", ")
      def side(table: String, key: String, tag: String) =
        s"""k$tag AS (SELECT DISTINCT CAST($key AS VARCHAR) AS k FROM $table),
           |kh$tag AS (
           |  SELECT k,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(length(k)),
           |        i -> ascii(substr(k, CAST(i + 1 AS INT), 1)))),
           |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
           |  FROM k$tag),
           |kb$tag AS (
           |  SELECT k, r,
           |    ((((h * a + b) % 2147483647) * 2654435761) % 4294967296) % 1024
           |      AS bucket
           |  FROM kh$tag CROSS JOIN consts),
           |c$tag AS (
           |  SELECT kb.r, kb.bucket, count(*) AS cnt
           |  FROM $table e JOIN kb$tag kb ON CAST(e.$key AS VARCHAR) = kb.k
           |  GROUP BY kb.r, kb.bucket)""".stripMargin
      s"""WITH consts(r, a, b) AS (VALUES $consts),
         |${side("orders", "o_custkey", "o")},
         |${side("customer", "c_custkey", "c")},
         |dots AS (SELECT o.r, sum(o.cnt * c.cnt) AS dot
         |         FROM co o JOIN cc c ON o.r = c.r AND o.bucket = c.bucket
         |         GROUP BY o.r)
         |SELECT CAST((SELECT min(dot) FROM dots) AS BIGINT) AS join_size_est,
         |  (SELECT count(*) FROM orders JOIN customer
         |   ON o_custkey = c_custkey) AS join_size_exact""".stripMargin
    },

    // Same sessionization-derived SCD2 CTE as merge_scd2, plus the
    // validity-interval lookup (valid_from inclusive, valid_to exclusive).
    "q_scd2_lookup" ->
      """WITH tr AS (SELECT user_id, ts, event_id, event_type,
        |        lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (SELECT user_id, ts, event_id, event_type FROM tr
        |        WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |hist AS (SELECT user_id, event_type AS state, ts AS valid_from,
        |          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            AS valid_to,
        |          CAST(row_number() OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id) AS BIGINT) AS version
        |        FROM chg),
        |f AS (SELECT event_id, user_id, ts AS fact_ts FROM events
        |      WHERE event_id % 10 = 0)
        |SELECT f.event_id, f.user_id, f.fact_ts, h.state, h.version
        |FROM f JOIN hist h ON h.user_id = f.user_id
        |  AND f.fact_ts >= h.valid_from
        |  AND (h.valid_to IS NULL OR f.fact_ts < h.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    "dq_profile_drift" -> {
      def side(src: String, tag: String) =
        Seq("o_custkey", "o_totalprice").map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows_$tag,
             |  count(*) - count($c) AS n_nulls_$tag,
             |  count(DISTINCT $c) AS n_distinct_$tag,
             |  CAST(sum(CAST($c AS DECIMAL(28,6))) AS DOUBLE) / count($c)
             |    AS mean_$tag
             |FROM $src""".stripMargin
        }.mkString("\nUNION ALL\n")
      s"""WITH o AS (SELECT * FROM orders
         |  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
         |po AS (${side("o", "old")}),
         |pn AS (${side("orders", "new")})
         |SELECT col_name, n_rows_old, n_nulls_old, n_distinct_old,
         |  round(mean_old, 6) AS mean_old,
         |  n_rows_new, n_nulls_new, n_distinct_new,
         |  round(mean_new, 6) AS mean_new,
         |  round(mean_new - mean_old, 6) AS mean_delta
         |FROM po JOIN pn USING (col_name) ORDER BY col_name""".stripMargin
    },

    // Same empty-cell identity as the Spark side (chi² = n + Σ over
    // OBSERVED cells of (o−e)²/e − e); e's double conversion order
    // mirrored exactly; terms round(6) + DECIMAL-summed; V NULL for a
    // constant column.
    "dq_association" -> {
      def pairSql(a: String, b: String) =
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  q.n, q.k_a, q.k_b,
           |  round(q.n + q.ts, 6) AS chi2,
           |  round((CASE WHEN least(q.k_a, q.k_b) = 1 THEN NULL
           |    ELSE sqrt((q.n + q.ts)
           |      / ((least(q.k_a, q.k_b) - 1) * q.n)) END) * 1000000)
           |    / 1000000 AS cramers_v
           |FROM (
           |  SELECT any_value(tt.n) AS n, any_value(tt.k_a) AS k_a,
           |    any_value(tt.k_b) AS k_b,
           |    CAST(sum(CAST(tt.term AS DECIMAL(28,6))) AS DOUBLE) AS ts
           |  FROM (
           |    SELECT t.n, t.k_a, t.k_b,
           |      round(((c.o - CAST(r.ra AS DOUBLE) * ct.cb / t.n)
           |        * (c.o - CAST(r.ra AS DOUBLE) * ct.cb / t.n)
           |        / (CAST(r.ra AS DOUBLE) * ct.cb / t.n)
           |        - CAST(r.ra AS DOUBLE) * ct.cb / t.n) * 1000000)
           |        / 1000000 AS term
           |    FROM (SELECT $a AS va, $b AS vb, count(*) AS o
           |          FROM lineitem GROUP BY 1, 2) c
           |    JOIN (SELECT $a AS va, CAST(count(*) AS BIGINT) AS ra
           |          FROM lineitem GROUP BY 1) r USING (va)
           |    JOIN (SELECT $b AS vb, CAST(count(*) AS BIGINT) AS cb
           |          FROM lineitem GROUP BY 1) ct USING (vb)
           |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n,
           |        count(DISTINCT $a) AS k_a, count(DISTINCT $b) AS k_b
           |      FROM lineitem) t
           |  ) tt
           |) q""".stripMargin
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber")
      val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
        yield pairSql(cols(i), cols(j))
      pairs.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    // Benford: first digit from the exact integer-cents string on both
    // engines; expected shares are shared 6-dp literals (no ln anywhere);
    // chi-square terms round(6) + DECIMAL-summed.
    "dq_benford" ->
      """WITH x AS (SELECT abs(o_totalprice) * 100 AS x FROM orders),
        |u AS (SELECT CAST(round(x) AS BIGINT) AS u FROM x WHERE x > 0),
        |d AS (SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS INT) AS digit
        |      FROM u WHERE u > 0),
        |c AS (SELECT digit, count(*) AS c FROM d GROUP BY 1),
        |spine AS (SELECT CAST(d AS INT) AS digit, CAST(e AS DOUBLE) AS exp_share
        |      FROM (VALUES (1, 0.301030), (2, 0.176091), (3, 0.124939),
        |            (4, 0.096910), (5, 0.079181), (6, 0.066947),
        |            (7, 0.057992), (8, 0.051153), (9, 0.045757)) t(d, e)),
        |j AS (SELECT s.digit, coalesce(c.c, 0) AS c, s.exp_share
        |      FROM spine s LEFT JOIN c USING (digit)),
        |t AS (SELECT digit, c, exp_share,
        |        CAST(sum(c) OVER () AS BIGINT) AS n FROM j),
        |t2 AS (SELECT digit, c,
        |        round((CAST(c AS DOUBLE) / n) * 1000000) / 1000000
        |          AS obs_share, exp_share,
        |        round(((c - n * exp_share) * (c - n * exp_share)
        |          / (n * exp_share)) * 1000000) / 1000000 AS chi2_term
        |      FROM t),
        |tot AS (SELECT CAST(sum(CAST(chi2_term AS DECIMAL(28,6))) AS DOUBLE)
        |        AS chi2 FROM t2)
        |SELECT digit, c, obs_share, exp_share, chi2_term, chi2
        |FROM t2 CROSS JOIN tot ORDER BY digit""".stripMargin,

    // PSI: identical reference-anchored binning arithmetic (subtract /
    // divide / floor / clamp — all single IEEE ops), Laplace-smoothed
    // shares as exact-integer divisions, per-bin ln terms through the
    // round(6) + DECIMAL-sum discipline (text_entropy precedent).
    "dq_psi" ->
      """WITH r AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        |      WHERE event_type = 'click'),
        |c AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        |      WHERE event_type = 'error'),
        |b AS (SELECT CAST(min(v) AS DOUBLE) AS lo,
        |        CAST(max(v) AS DOUBLE) AS hi FROM r),
        |br AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
        |        CAST(least(greatest(floor((v - lo) / ((hi - lo) / 10)), 0), 9)
        |          AS INT) END AS bin FROM r CROSS JOIN b),
        |bc AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
        |        CAST(least(greatest(floor((v - lo) / ((hi - lo) / 10)), 0), 9)
        |          AS INT) END AS bin FROM c CROSS JOIN b),
        |spine AS (SELECT CAST(bin AS INT) AS bin FROM range(10) t(bin)),
        |cr AS (SELECT bin, count(*) AS n FROM br GROUP BY 1),
        |cc AS (SELECT bin, count(*) AS n FROM bc GROUP BY 1),
        |counts AS (SELECT s.bin, coalesce(cr.n, 0) AS c_ref,
        |        coalesce(cc.n, 0) AS c_cur
        |      FROM spine s LEFT JOIN cr USING (bin) LEFT JOIN cc USING (bin)),
        |tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
        |        CAST(sum(c_cur) AS BIGINT) AS n_cur FROM counts),
        |terms AS (SELECT bin, c_ref, c_cur,
        |        CAST(c_ref + 1 AS DOUBLE) / (n_ref + 10) AS p_ref,
        |        CAST(c_cur + 1 AS DOUBLE) / (n_cur + 10) AS p_cur
        |      FROM counts CROSS JOIN tot),
        |t2 AS (SELECT bin, c_ref, c_cur, p_ref, p_cur,
        |        round((p_ref - p_cur) * ln(p_ref / p_cur), 6) AS term
        |      FROM terms),
        |tpsi AS (SELECT CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
        |        AS psi FROM t2)
        |SELECT bin, c_ref, c_cur,
        |  round(p_ref * 1000000) / 1000000 AS p_ref,
        |  round(p_cur * 1000000) / 1000000 AS p_cur, term, psi
        |FROM t2 CROSS JOIN tpsi ORDER BY bin""".stripMargin,

    // KS: exact-integer cumulative counts over distinct values (the
    // Spark side's two-level prefix sum collapses to one window here),
    // one IEEE division per side, gap rounded to 6 dp before the max;
    // tie on the max gap broken by smallest value on both engines.
    "dq_ks_test" ->
      """WITH byv AS (SELECT v, CAST(sum(cr) AS BIGINT) AS cr,
        |        CAST(sum(cc) AS BIGINT) AS cc FROM (
        |      SELECT CAST(value AS DOUBLE) AS v, 1 AS cr, 0 AS cc FROM events
        |      WHERE event_type = 'click' AND value IS NOT NULL
        |      UNION ALL
        |      SELECT CAST(value AS DOUBLE) AS v, 0, 1 FROM events
        |      WHERE event_type = 'error' AND value IS NOT NULL) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS n_ref,
        |        CAST(sum(cc) AS BIGINT) AS n_cur FROM byv),
        |g AS (SELECT v, n_ref, n_cur,
        |        round(abs(CAST(sum(cr) OVER w AS DOUBLE) / CAST(n_ref AS DOUBLE)
        |          - CAST(sum(cc) OVER w AS DOUBLE) / CAST(n_cur AS DOUBLE))
        |          * 1000000) / 1000000 AS gap
        |      FROM byv CROSS JOIN tot
        |      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW)),
        |mx AS (SELECT max(gap) AS ks_stat FROM g)
        |SELECT min(g.n_ref) AS n_ref, min(g.n_cur) AS n_cur,
        |  min(mx.ks_stat) AS ks_stat, min(v) AS ks_at_value
        |FROM g CROSS JOIN mx WHERE g.gap = mx.ks_stat""".stripMargin,

    // AUC: concordant-pairs-plus-half-ties from grouped score counts —
    // the numerator is BIGINT-exact on both engines; ONE rounded
    // division at the end.
    "dq_auc" ->
      """WITH s AS (SELECT CAST(value AS DOUBLE) AS v,
        |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |      FROM events WHERE event_type IN ('click', 'error')
        |        AND value IS NOT NULL),
        |byv AS (SELECT v, CAST(sum(y) AS BIGINT) AS cp,
        |        CAST(sum(1 - y) AS BIGINT) AS cn FROM s GROUP BY 1),
        |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
        |        CAST(sum(cn) AS BIGINT) AS n_neg FROM byv),
        |g AS (SELECT cp * (2 * CAST(coalesce(sum(cn) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) + cn) AS num2 FROM byv),
        |n2 AS (SELECT CAST(sum(num2) AS BIGINT) AS num2 FROM g)
        |SELECT n_pos, n_neg,
        |  round((CAST(num2 AS DOUBLE) /
        |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
        |    * 1000000) / 1000000 AS auc
        |FROM tot CROSS JOIN n2""".stripMargin,

    // Calibration: PSI's reference-anchored equal-width binning
    // arithmetic (single IEEE ops), DECIMAL-quantized score sums.
    "dq_calibration" ->
      """WITH s AS (SELECT CAST(value AS DOUBLE) AS v,
        |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |      FROM events WHERE event_type IN ('click', 'error')
        |        AND value IS NOT NULL),
        |b AS (SELECT CAST(min(v) AS DOUBLE) AS lo,
        |        CAST(max(v) AS DOUBLE) AS hi FROM s),
        |bb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
        |        CAST(least(greatest(floor((v - lo) / ((hi - lo) / 10)), 0), 9)
        |          AS INT) END AS bin, v, y FROM s CROSS JOIN b),
        |agg AS (SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |        sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS sv
        |      FROM bb GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  round((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) / 1000000
        |    AS mean_score,
        |  round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)
        |    / 1000000 AS pos_rate
        |FROM agg ORDER BY bin""".stripMargin,

    // MI: every ln argument is a ratio of exact integer counts composed
    // in the Spark side's operation order; per-term round(6) +
    // DECIMAL(18,6) sums (the PSI/entropy discipline); nmi divides the
    // UNrounded decimal-exact mi/h_a/h_b like the Spark select does.
    "dq_mutual_info" ->
      """WITH cells AS (SELECT source AS va, lang AS vb, count(*) AS o
        |      FROM documents GROUP BY 1, 2),
        |ra AS (SELECT va, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
        |cb AS (SELECT vb, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |        count(DISTINCT va) AS k_a, count(DISTINCT vb) AS k_b
        |      FROM cells),
        |mi0 AS (SELECT CAST(sum(CAST(round(
        |        CAST(o AS DOUBLE) / CAST(n AS DOUBLE) *
        |        ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) /
        |          (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))), 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) AS mi
        |      FROM cells JOIN ra USING (va) JOIN cb USING (vb)
        |      CROSS JOIN tot),
        |ha AS (SELECT CAST(sum(CAST(round(
        |        CAST(ra AS DOUBLE) / CAST(n AS DOUBLE) *
        |        ln(CAST(n AS DOUBLE) / CAST(ra AS DOUBLE)), 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) AS h_a FROM ra CROSS JOIN tot),
        |hb AS (SELECT CAST(sum(CAST(round(
        |        CAST(cb AS DOUBLE) / CAST(n AS DOUBLE) *
        |        ln(CAST(n AS DOUBLE) / CAST(cb AS DOUBLE)), 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) AS h_b FROM cb CROSS JOIN tot)
        |SELECT n, k_a, k_b, round(mi, 6) AS mi,
        |  round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
        |  round((mi / sqrt(h_a * h_b)) * 1000000) / 1000000 AS nmi
        |FROM mi0 CROSS JOIN ha CROSS JOIN hb CROSS JOIN tot""".stripMargin,

    // PK uniqueness: one grouped count per declared key, unioned.
    "dq_pk_uniqueness" -> {
      def one(table: String, keys: String) =
        s"""SELECT '$table' AS table_name,
           |  '${keys.replace(" ", "")}' AS key_cols,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  count(*) AS n_distinct_keys,
           |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_keys
           |FROM (SELECT count(*) AS c FROM $table GROUP BY $keys)""".stripMargin
      s"""SELECT table_name, key_cols, n_rows, n_distinct_keys, n_dup_keys,
         |  n_dup_keys = 0 AS is_unique
         |FROM (${one("customer", "c_custkey")}
         |UNION ALL ${one("orders", "o_orderkey")}
         |UNION ALL ${one("part", "p_partkey")}
         |UNION ALL ${one("lineitem", "l_orderkey, l_linenumber")}
         |UNION ALL ${one("documents", "doc_id")}
         |UNION ALL ${one("events", "event_id")})
         |ORDER BY table_name""".stripMargin
    },

    // Calendar audit: exact integer date arithmetic; the longest gap
    // from the lag over ordered distinct days.
    "dq_calendar" ->
      """WITH days AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d
        |      FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT event_type, d,
        |        date_diff('day', lag(d, 1) OVER (PARTITION BY event_type
        |          ORDER BY d), d) - 1 AS gap
        |      FROM days),
        |a AS (SELECT event_type, count(*) AS n_days, min(d) AS first_day,
        |        max(d) AS last_day, max(gap) AS mg
        |      FROM g GROUP BY 1)
        |SELECT event_type, n_days, first_day, last_day,
        |  CAST(date_diff('day', first_day, last_day) + 1 AS BIGINT)
        |    AS span_days,
        |  CAST(date_diff('day', first_day, last_day) + 1 - n_days
        |    AS BIGINT) AS missing_days,
        |  CAST(coalesce(mg, 0) AS BIGINT) AS max_gap_days,
        |  CAST(round((CAST(n_days AS DOUBLE)
        |    / CAST(date_diff('day', first_day, last_day) + 1 AS DOUBLE)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS coverage
        |FROM a ORDER BY event_type""".stripMargin,

    // Chi2: 6-dp-quantized per-category contributions, exact DECIMAL
    // total; argmax mirrored as ORDER BY (c DESC, category DESC) LIMIT 1.
    "dq_chi2" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS category,
        |        count(*) AS n_obs
        |      FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_rows,
        |        count(*) AS k FROM c),
        |x AS (SELECT category, n_obs, n_rows, k,
        |        CAST(n_rows AS DOUBLE) / k AS expected
        |      FROM c CROSS JOIN t),
        |g AS (SELECT category, n_rows, k,
        |        CAST(round(((CAST(n_obs AS DOUBLE) - expected)
        |          * (CAST(n_obs AS DOUBLE) - expected) / expected
        |         ) * 1000000) / 1000000 AS DOUBLE) AS c2 FROM x)
        |SELECT max(n_rows) AS n_rows,
        |  CAST(max(k) AS BIGINT) AS n_categories,
        |  CAST(max(k) - 1 AS BIGINT) AS dof,
        |  CAST(sum(CAST(c2 AS DECIMAL(24,6))) AS DOUBLE) AS chi2,
        |  CAST(round((CAST(sum(CAST(c2 AS DECIMAL(24,6))) AS DOUBLE)
        |    / CAST(max(k) - 1 AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE)
        |    AS chi2_per_dof,
        |  (SELECT category FROM g ORDER BY c2 DESC, category DESC LIMIT 1)
        |    AS top_category,
        |  max(c2) AS top_contrib
        |FROM g""".stripMargin,

    // Sequence audit: exact integer backstep comparisons along the
    // event_id ingestion order.
    "dq_sequence" ->
      """WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |      FROM events),
        |l AS (SELECT user_id, us,
        |        lag(us, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |          AS prev
        |      FROM r),
        |k AS (SELECT user_id, count(*) AS n,
        |        CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS np,
        |        CAST(sum(CASE WHEN us < prev THEN 1 ELSE 0 END)
        |          AS BIGINT) AS nr,
        |        max(CASE WHEN us < prev THEN prev - us END) AS mb
        |      FROM l GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(np) AS BIGINT) AS n_pairs,
        |  CAST(sum(nr) AS BIGINT) AS n_regressions,
        |  CAST(sum(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_keys_with_regressions,
        |  max(mb) AS max_backstep_us,
        |  CAST(round((1e0 - CAST(sum(nr) AS DOUBLE)
        |    / nullif(CAST(sum(np) AS DOUBLE), 0e0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS ordered_rate
        |FROM k""".stripMargin,

    // FD discovery: per-pair distinct counts as scalar subqueries (the
    // oracle pays 12 scans; the Spark side is one Expand aggregate),
    // count(DISTINCT) NULL semantics shared by both engines.
    "dq_func_deps" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
      val sels = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS lhs, '$b' AS rhs,
           |  (SELECT CAST(count(DISTINCT $a) AS BIGINT) FROM orders)
           |    AS n_distinct_lhs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM
           |    (SELECT DISTINCT $a, $b FROM orders
           |     WHERE $a IS NOT NULL AND $b IS NOT NULL))
           |    AS n_distinct_pair""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""SELECT lhs, rhs, n_distinct_lhs, n_distinct_pair,
         |  n_distinct_pair = n_distinct_lhs AS fd_holds,
         |  round((CAST(n_distinct_lhs AS DOUBLE)
         |    / nullif(CAST(n_distinct_pair AS DOUBLE), 0.0)) * 1000000)
         |    / 1000000 AS strength
         |FROM ($sels)
         |ORDER BY lhs, rhs""".stripMargin
    },

    // Constraint suite: one aggregate computes all violation counts;
    // NULL predicates count as violations (NOT coalesce(p, FALSE)).
    "dq_constraints" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN NOT coalesce(value >= 0, FALSE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v0,
        |  CAST(sum(CASE WHEN NOT coalesce(event_type IN
        |      ('click', 'view', 'purchase', 'signup', 'error'), FALSE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN user_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN NOT coalesce(
        |      ts >= TIMESTAMP '2023-01-01'
        |      AND ts < TIMESTAMP '2027-01-01', FALSE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |  CAST(sum(CASE WHEN props IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM events)
        |SELECT rule_idx, rule, n_rows, n_violations,
        |  round((CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |    * 1000000) / 1000000 AS violation_rate,
        |  n_violations = 0 AS passed
        |FROM (
        |  SELECT 0 AS rule_idx, 'value_non_negative' AS rule,
        |    n_rows, v0 AS n_violations FROM a
        |  UNION ALL SELECT 1, 'event_type_known', n_rows, v1 FROM a
        |  UNION ALL SELECT 2, 'user_id_present', n_rows, v2 FROM a
        |  UNION ALL SELECT 3, 'ts_in_range', n_rows, v3 FROM a
        |  UNION ALL SELECT 4, 'props_parseable', n_rows, v4 FROM a)
        |ORDER BY rule_idx""".stripMargin,

    // Referential integrity: orphan counts per FK relation via left
    // joins against the distinct parent keys.
    "dq_referential" ->
      """WITH r1 AS (SELECT 'lineitem_orders' AS relation,
        |        count(*) AS n_child,
        |        CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_orphans
        |      FROM lineitem l LEFT JOIN
        |        (SELECT DISTINCT o_orderkey FROM orders) o
        |        ON l.l_orderkey = o.o_orderkey
        |      WHERE l.l_orderkey IS NOT NULL),
        |r2 AS (SELECT 'orders_customer' AS relation, count(*) AS n_child,
        |        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_orphans
        |      FROM orders o LEFT JOIN
        |        (SELECT DISTINCT c_custkey FROM customer) c
        |        ON o.o_custkey = c.c_custkey
        |      WHERE o.o_custkey IS NOT NULL),
        |r3 AS (SELECT 'lineitem_part' AS relation, count(*) AS n_child,
        |        CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_orphans
        |      FROM lineitem l LEFT JOIN
        |        (SELECT DISTINCT p_partkey FROM part) p
        |        ON l.l_partkey = p.p_partkey
        |      WHERE l.l_partkey IS NOT NULL)
        |SELECT relation, n_child, n_orphans,
        |  round((CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE))
        |    * 1000000) / 1000000 AS orphan_rate,
        |  n_orphans = 0 AS intact
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |      UNION ALL SELECT * FROM r3)
        |ORDER BY relation""".stripMargin,

    // NB: train + score CTE-for-plan — Laplace-smoothed per-term log
    // likelihoods 6-dp-rounded into DECIMAL sums, rounded priors, argmax
    // tie to smaller label; docs with zero tokens carry no evidence and
    // drop from the eval on both engines (inner token join).
    "ml_nb_accuracy" ->
      s"""$nbPredCtes
        |SELECT d.lang AS label, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN pred = d.lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  round((CAST(sum(CASE WHEN pred = d.lang THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000
        |    AS recall
        |FROM pred JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Learning curve: the split-NB chain instantiated per fraction
    // against the fixed held-out decile.
    "ml_learning_curve" -> {
      val test = "doc_id % 10 = 9"
      val pool = "doc_id % 10 <> 9"
      s"""WITH ${nbSplitRow("f25", "CAST(0.25 AS DOUBLE)",
              s"$pool AND doc_id % 4 = 0", test)},
         |${nbSplitRow("f50", "CAST(0.5 AS DOUBLE)",
              s"$pool AND doc_id % 2 = 0", test)},
         |${nbSplitRow("f100", "CAST(1.0 AS DOUBLE)", pool, test)}
         |SELECT * FROM f25row UNION ALL SELECT * FROM f50row
         |UNION ALL SELECT * FROM f100row ORDER BY train_frac""".stripMargin
    },

    // Confusion cells from the same unrolled NB predictions; row_share
    // normalizes within the true label.
    "ml_confusion" ->
      s"""$nbPredCtes,
        |cm AS (SELECT d.lang AS label, pred, CAST(count(*) AS BIGINT) AS n
        |      FROM pred JOIN documents d USING (doc_id) GROUP BY 1, 2),
        |tot AS (SELECT label, CAST(sum(n) AS BIGINT) AS n_label
        |      FROM cm GROUP BY 1)
        |SELECT label, pred, n,
        |  round((CAST(n AS DOUBLE) / CAST(n_label AS DOUBLE)) * 1000000)
        |    / 1000000 AS row_share
        |FROM cm JOIN tot USING (label) ORDER BY label, pred""".stripMargin,

    // Per-class P/R/F1: truth-side and prediction-side counts
    // full-outer-joined; F1 from the unrounded legs, 0/0 -> 0.
    "ml_class_report" ->
      s"""$nbPredCtes,
        |pl AS (SELECT d.lang AS y, pred
        |      FROM pred JOIN documents d USING (doc_id)),
        |tt AS (SELECT y AS label, count(*) AS n_true,
        |        CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
        |          AS tp FROM pl GROUP BY 1),
        |pp AS (SELECT pred AS label, count(*) AS n_pred FROM pl GROUP BY 1),
        |j AS (SELECT coalesce(tt.label, pp.label) AS label,
        |        coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
        |        coalesce(tp, 0) AS tp
        |      FROM tt FULL OUTER JOIN pp ON pp.label = tt.label),
        |k AS (SELECT label, n_true, n_pred, tp,
        |        CAST(tp AS DOUBLE) / nullif(CAST(n_pred AS DOUBLE), 0.0) AS p,
        |        CAST(tp AS DOUBLE) / nullif(CAST(n_true AS DOUBLE), 0.0) AS r
        |      FROM j)
        |SELECT label, n_true, n_pred, tp,
        |  round(p * 1000000) / 1000000 AS "precision",
        |  round(r * 1000000) / 1000000 AS recall,
        |  round((CASE WHEN coalesce(p, 0e0) + coalesce(r, 0e0) = 0e0 THEN 0e0
        |    ELSE 2e0 * coalesce(p, 0e0) * coalesce(r, 0e0)
        |      / (coalesce(p, 0e0) + coalesce(r, 0e0)) END) * 1000000)
        |    / 1000000 AS f1
        |FROM k ORDER BY label""".stripMargin,

    // Kappa/MCC: marginal products on DECIMAL(19,0)x(19,0) -> (38,0)
    // exact; kappa and R_K are DECIMAL-routed doubles of exact decimals.
    "ml_mcc_kappa" ->
      s"""$nbPredCtes,
        |pl AS (SELECT d.lang AS y, pred
        |      FROM pred JOIN documents d USING (doc_id)),
        |tt AS (SELECT y AS label, count(*) AS tk FROM pl GROUP BY 1),
        |pp AS (SELECT pred AS label, count(*) AS pk FROM pl GROUP BY 1),
        |mm AS (SELECT coalesce(tk, 0) AS tk, coalesce(pk, 0) AS pk
        |      FROM tt FULL OUTER JOIN pp ON tt.label = pp.label),
        |mg AS (SELECT
        |        CAST(sum(CAST(tk AS DECIMAL(19,0))
        |          * CAST(pk AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS stp,
        |        CAST(sum(CAST(tk AS DECIMAL(19,0))
        |          * CAST(tk AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS stt,
        |        CAST(sum(CAST(pk AS DECIMAL(19,0))
        |          * CAST(pk AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS spp
        |      FROM mm),
        |bs AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_correct,
        |        CAST(count(DISTINCT y) AS BIGINT) AS n_classes_true,
        |        CAST(count(DISTINCT pred) AS BIGINT) AS n_classes_pred
        |      FROM pl),
        |x AS (SELECT n, n_correct, n_classes_true, n_classes_pred,
        |        CAST(CAST(n_correct AS DECIMAL(19,0))
        |          * CAST(n AS DECIMAL(19,0)) - stp AS DOUBLE) AS num,
        |        CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) AS s2,
        |        stp, stt, spp
        |      FROM bs CROSS JOIN mg)
        |SELECT n, n_correct, n_classes_true, n_classes_pred,
        |  round((CAST(n_correct AS DOUBLE)
        |    / nullif(CAST(n AS DOUBLE), 0.0)) * 1000000) / 1000000
        |    AS accuracy,
        |  round((CASE WHEN CAST(s2 - stp AS DOUBLE) <> 0.0
        |      THEN num / CAST(s2 - stp AS DOUBLE) ELSE NULL END)
        |    * 1000000) / 1000000 AS kappa,
        |  round((CASE WHEN CAST(s2 - spp AS DOUBLE) > 0
        |      AND CAST(s2 - stt AS DOUBLE) > 0
        |      THEN num / sqrt(CAST(s2 - spp AS DOUBLE)
        |        * CAST(s2 - stt AS DOUBLE)) ELSE NULL END)
        |    * 1000000) / 1000000 AS mcc
        |FROM x""".stripMargin,

    // kNN: the bruteAnnOracle ranking convention (unrounded cosine,
    // neighbor-id ties) on the 1-in-10 query sample, majority vote tie
    // to smaller label.
    "ml_knn_accuracy" ->
      """WITH e AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |        label FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qe, label AS qlabel
        |      FROM e WHERE vec_id % 10 = 0),
        |s AS (SELECT query_id, c.vec_id AS neighbor_id, c.label AS nl,
        |        list_cosine_similarity(qe, c.v) AS cos
        |      FROM q, e c WHERE c.vec_id <> query_id),
        |top AS (SELECT query_id, nl FROM (
        |      SELECT query_id, nl, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rn FROM s)
        |      WHERE rn <= 5),
        |votes AS (SELECT query_id, nl, count(*) AS cvotes
        |      FROM top GROUP BY 1, 2),
        |pred AS (SELECT query_id, nl AS pred FROM (
        |      SELECT query_id, nl, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cvotes DESC, nl) AS rn FROM votes) WHERE rn = 1)
        |SELECT qlabel AS label, count(*) AS n,
        |  CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  round((CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000
        |    AS accuracy
        |FROM pred JOIN q USING (query_id) GROUP BY 1 ORDER BY 1""".stripMargin,

    // Logreg: the two GD steps unrolled CTE-for-plan — step 1's margins
    // are exactly 0 from w=0 (p = 0.5 on both engines, no exp), step 2's
    // margins are 6-dp-rounded DECIMAL dot products BEFORE the sigmoid,
    // its output re-rounded, gradients DECIMAL-summed — so exp's libm
    // ulps never reach a comparison.
    "ml_logreg" ->
      """WITH flat AS (SELECT vec_id,
        |        CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
        |        CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |y AS (SELECT vec_id, CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
        |      FROM embeddings),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |r1 AS (SELECT vec_id, 0.5 - y AS r FROM y),
        |g1 AS (SELECT dim, CAST(sum(CAST(round(r * x, 6) AS DECIMAL(18,6)))
        |          AS DOUBLE) AS g
        |      FROM flat JOIN r1 USING (vec_id) GROUP BY 1),
        |w1 AS (SELECT dim, round((0.0 - 0.5 * g / n) * 1000000) / 1000000 AS w
        |      FROM g1 CROSS JOIN n),
        |m2 AS (SELECT vec_id, round(CAST(sum(CAST(round(x * w, 6)
        |          AS DECIMAL(18,6))) AS DOUBLE), 6) AS margin
        |      FROM flat JOIN w1 USING (dim) GROUP BY 1),
        |r2 AS (SELECT m2.vec_id,
        |        round(1.0 / (1.0 + exp(-margin)), 6) - y AS r
        |      FROM m2 JOIN y USING (vec_id)),
        |g2 AS (SELECT dim, CAST(sum(CAST(round(r * x, 6) AS DECIMAL(18,6)))
        |          AS DOUBLE) AS g
        |      FROM flat JOIN r2 USING (vec_id) GROUP BY 1)
        |SELECT w1.dim, round((w - 0.5 * g / n) * 1000000) / 1000000 AS weight
        |FROM w1 JOIN g2 USING (dim) CROSS JOIN n ORDER BY dim""".stripMargin,

    // Ridge: the nine 6-dp-quantized DECIMAL(38,6) Gram sums and the
    // Cramer determinant expansions transcribed in the Spark side's
    // EXACT operation order (symmetric entries substituted identically),
    // so every determinant is the same IEEE value on both engines.
    // PR sweep: one aggregate, per-threshold TP/FP pairs unioned out.
    "ml_pr_curve" -> {
      val ts = Seq(1.0, 2.0, 5.0, 10.0, 20.0, 50.0)
      val sums = ts.zipWithIndex.map { case (t, i) =>
        s"""CAST(sum(CASE WHEN value >= $t AND event_type = 'error'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS tp_$i,
           |  CAST(sum(CASE WHEN value >= $t AND NOT event_type = 'error'
           |    THEN 1 ELSE 0 END) AS BIGINT) AS fp_$i""".stripMargin
      }.mkString(",\n  ")
      val rows = ts.zipWithIndex.map { case (t, i) =>
        s"SELECT CAST($t AS DOUBLE) AS threshold, n, pos, tp_$i AS tp, fp_$i AS fp FROM a"
      }.mkString("\nUNION ALL ")
      s"""WITH a AS (SELECT count(*) AS n,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS pos,
         |  $sums
         |  FROM events),
         |l AS ($rows)
         |SELECT threshold, n, pos, tp, fp,
         |  round((CAST(tp AS DOUBLE)
         |    / nullif(CAST(tp + fp AS DOUBLE), 0.0)) * 1000000) / 1000000
         |    AS precision,
         |  round((CAST(tp AS DOUBLE)
         |    / nullif(CAST(pos AS DOUBLE), 0.0)) * 1000000) / 1000000
         |    AS recall,
         |  round((2.0 * CAST(tp AS DOUBLE)
         |    / nullif(CAST(tp + fp + pos AS DOUBLE), 0.0)) * 1000000)
         |    / 1000000 AS f1
         |FROM l ORDER BY threshold""".stripMargin
    },

    // Lift/gains: quantile_cont thresholds (Spark percentile's (n-1)p
    // interpolation), 6-dp DECIMAL-quantized scores and thresholds so
    // boundary membership is engine-identical, bounded 10-row cumsum.
    "ml_lift" -> {
      val ps = (1 to 9).map(i => s"0.$i").mkString(", ")
      val below = (1 to 9).map(i =>
        s"""CASE WHEN s > round(qs[$i] * 1000000) / 1000000
           |      THEN 1 ELSE 0 END""".stripMargin)
        .mkString("\n    + ")
      s"""WITH base AS (SELECT
         |    round(CAST(value AS DOUBLE) * 1000000) / 1000000 AS s,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
         |  FROM events
         |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
         |th AS (SELECT quantile_cont(s, [$ps]) AS qs FROM base),
         |b AS (SELECT CAST(10 - ($below) AS BIGINT) AS decile, y
         |      FROM base CROSS JOIN th),
         |g AS (SELECT decile, count(*) AS n_rows,
         |        CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
         |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t_n,
         |        CAST(sum(n_pos) AS BIGINT) AS t_pos FROM g),
         |c AS (SELECT decile, n_rows, n_pos,
         |        CAST(sum(n_rows) OVER w AS BIGINT) AS cum_n,
         |        CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos
         |      FROM g WINDOW w AS (ORDER BY decile
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT decile, n_rows, n_pos, cum_n, cum_pos,
         |  round((CAST(cum_pos AS DOUBLE)
         |    / nullif(CAST(t_pos AS DOUBLE), 0e0)) * 1000000) / 1000000
         |    AS gain,
         |  round(((CAST(cum_pos AS DOUBLE)
         |      / nullif(CAST(cum_n AS DOUBLE), 0e0))
         |    / nullif(CAST(t_pos AS DOUBLE)
         |      / nullif(CAST(t_n AS DOUBLE), 0e0), 0e0)) * 1000000)
         |    / 1000000 AS lift
         |FROM c CROSS JOIN t ORDER BY decile""".stripMargin
    },

    // Stump: candidate thresholds via range(1,10) over the quantile
    // array, one grouped conditional count, identical Gini algebra,
    // ORDER BY (gain DESC, threshold) LIMIT 1.
    "ml_stump" -> {
      val ps = (1 to 9).map(i => s"0.$i").mkString(", ")
      s"""WITH base AS (SELECT
         |    round(CAST(value AS DOUBLE) * 1000000) / 1000000 AS s,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
         |  FROM events
         |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
         |th AS (SELECT quantile_cont(s, [$ps]) AS qs FROM base),
         |tot AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
         |      FROM base),
         |cand AS (SELECT DISTINCT
         |        round(qs[CAST(i AS INTEGER)] * 1000000) / 1000000
         |          AS threshold
         |      FROM th, range(1, 10) t(i)),
         |cnt AS (SELECT c.threshold,
         |        CAST(sum(CASE WHEN b.s <= c.threshold THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_left,
         |        CAST(sum(CASE WHEN b.s <= c.threshold AND b.y = 1
         |          THEN 1 ELSE 0 END) AS BIGINT) AS pos_left
         |      FROM cand c CROSS JOIN base b GROUP BY 1),
         |sc AS (SELECT threshold, n, pos, n_left, pos_left,
         |        CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE) AS pl,
         |        CAST(pos - pos_left AS DOUBLE)
         |          / CAST(n - n_left AS DOUBLE) AS pr,
         |        CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS proot
         |      FROM cnt CROSS JOIN tot
         |      WHERE n_left > 0 AND n_left < n),
         |fin AS (SELECT threshold, n, pos, n_left, pos_left,
         |        round(pl * 1000000) / 1000000 AS p_left,
         |        round(pr * 1000000) / 1000000 AS p_right,
         |        round((2e0 * proot * (1e0 - proot)) * 1000000) / 1000000
         |          AS gini_root,
         |        round(((CAST(n_left AS DOUBLE)
         |            * (2e0 * pl * (1e0 - pl))
         |            + CAST(n - n_left AS DOUBLE) * (2e0 * pr * (1e0 - pr)))
         |          / CAST(n AS DOUBLE)) * 1000000) / 1000000 AS gini_split,
         |        round((2e0 * proot * (1e0 - proot)
         |          - (CAST(n_left AS DOUBLE) * (2e0 * pl * (1e0 - pl))
         |            + CAST(n - n_left AS DOUBLE) * (2e0 * pr * (1e0 - pr)))
         |          / CAST(n AS DOUBLE)) * 1000000000) / 1000000000 AS gain
         |      FROM sc)
         |SELECT * FROM fin ORDER BY gain DESC, threshold LIMIT 1""".stripMargin
    },

    // GMM E-step: seed vectors as centroids, silhouette's DECIMAL d²
    // recipe, max-subtracted softmax with 9-dp rounded exponentials.
    "ml_gmm_estep" ->
      s"""WITH e AS ($embCte),
         |f AS (SELECT vec_id,
         |        CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim,
         |        unnest(v) AS x FROM e),
         |cent AS (SELECT vec_id AS cid, dim, x AS c FROM f
         |      WHERE vec_id < 4),
         |d2 AS (SELECT f.vec_id, cid,
         |        CAST(sum(CAST(round((x - c) * (x - c), 6)
         |          AS DECIMAL(18,6))) AS DOUBLE) AS d2
         |      FROM f JOIN cent USING (dim) GROUP BY 1, 2),
         |s2 AS (SELECT round((CAST(sum(CAST(round(d2, 6)
         |          AS DECIMAL(18,6))) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000
         |        AS s2 FROM d2),
         |dm AS (SELECT vec_id, min(d2) AS dmin FROM d2 GROUP BY 1),
         |ee AS (SELECT d2.vec_id, cid,
         |        round(exp(-(d2 - dmin) / (2.0 * s2)), 9) AS e3,
         |        d2 = dmin AS is_min
         |      FROM d2 JOIN dm USING (vec_id) CROSS JOIN s2),
         |se AS (SELECT vec_id, sum(CAST(e3 AS DECIMAL(28,9))) AS se,
         |        min(CASE WHEN is_min THEN cid END) AS hard
         |      FROM ee GROUP BY 1),
         |rr AS (SELECT cid, round((e3 / CAST(se AS DOUBLE)) * 1000000000)
         |          / 1000000000 AS r,
         |        cid = hard AS is_hard
         |      FROM ee JOIN se USING (vec_id)),
         |r6t AS (SELECT cid, is_hard,
         |        (CAST(round(r * 1e9) AS BIGINT) + 500) // 1000 AS r6
         |      FROM rr)
         |SELECT CAST(cid AS BIGINT) AS cid, count(*) AS n_vecs,
         |  CAST(CAST(sum(r6) AS BIGINT) AS DOUBLE) / 1e6 AS soft_count,
         |  CAST(sum(CASE WHEN is_hard THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hard,
         |  CAST((CAST(sum(r6) AS BIGINT) * 2 + count(*))
         |    // (count(*) * 2) AS DOUBLE) / 1e6 AS avg_resp
         |FROM r6t GROUP BY 1 ORDER BY cid""".stripMargin,

    "ml_ridge" ->
      """WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS x1,
        |        CAST(l_discount AS DOUBLE) AS x2,
        |        CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
        |a AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(round(x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(round(x1 * x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s11,
        |    CAST(sum(CAST(round(x1 * x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s12,
        |    CAST(sum(CAST(round(x2 * x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s22,
        |    CAST(sum(CAST(round(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(x1 * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1y,
        |    CAST(sum(CAST(round(x2 * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2y
        |  FROM s),
        |m AS (SELECT n, CAST(n AS DOUBLE) + 1.0 AS a11, s1 AS a12, s2 AS a13,
        |        s11 + 1.0 AS a22, s12 AS a23, s22 + 1.0 AS a33,
        |        sy, s1y, s2y FROM a),
        |d AS (SELECT n, sy, s1y, s2y, a11, a12, a13, a22, a23, a33,
        |        a11 * (a22 * a33 - a23 * a23)
        |          - a12 * (a12 * a33 - a23 * a13)
        |          + a13 * (a12 * a23 - a22 * a13) AS dA FROM m)
        |SELECT n,
        |  round(((sy * (a22 * a33 - a23 * a23)
        |    - a12 * (s1y * a33 - a23 * s2y)
        |    + a13 * (s1y * a23 - a22 * s2y)) / dA) * 1000000) / 1000000
        |    AS beta0,
        |  round(((a11 * (s1y * a33 - a23 * s2y)
        |    - sy * (a12 * a33 - a23 * a13)
        |    + a13 * (a12 * s2y - s1y * a13)) / dA) * 1000000) / 1000000
        |    AS beta1,
        |  round(((a11 * (a22 * s2y - s1y * a23)
        |    - a12 * (a12 * s2y - s1y * a13)
        |    + sy * (a12 * a23 - a22 * a13)) / dA) * 1000000) / 1000000
        |    AS beta2
        |FROM d""".stripMargin,

    // Centroid drift: per-cohort dim-keyed DECIMAL means (6-dp-rounded
    // before the dot/norm products, the kmeans-cosine discipline).
    "emb_drift" ->
      """WITH fa AS (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT)
        |          AS dim, CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings WHERE vec_id % 2 = 0),
        |fb AS (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT)
        |          AS dim, CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings WHERE vec_id % 2 = 1),
        |ma AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_a,
        |        round((CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6)))
        |          AS DOUBLE) / count(*)) * 1000000) / 1000000 AS m_a FROM fa GROUP BY 1),
        |mb AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_b,
        |        round((CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6)))
        |          AS DOUBLE) / count(*)) * 1000000) / 1000000 AS m_b FROM fb GROUP BY 1),
        |agg AS (SELECT CAST(min(n_a) AS BIGINT) AS n_a,
        |        CAST(min(n_b) AS BIGINT) AS n_b,
        |        CAST(sum(CAST(round((m_a * m_b) * 1000000) / 1000000
        |          AS DECIMAL(18,6))) AS DOUBLE) AS dot,
        |        CAST(sum(CAST(round((m_a * m_a) * 1000000) / 1000000
        |          AS DECIMAL(18,6))) AS DOUBLE) AS na2,
        |        CAST(sum(CAST(round((m_b * m_b) * 1000000) / 1000000
        |          AS DECIMAL(18,6))) AS DOUBLE) AS nb2,
        |        CAST(sum(CAST(round((m_a - m_b) * (m_a - m_b), 6)
        |          AS DECIMAL(18,6))) AS DOUBLE) AS d2
        |      FROM ma JOIN mb USING (dim))
        |SELECT n_a, n_b,
        |  round(dot / (sqrt(na2) * sqrt(nb2)) * 1000000) / 1000000 AS cosine,
        |  round(sqrt(d2) * 1000000) / 1000000 AS l2 FROM agg""".stripMargin,

    // Readability: len(regexp_extract_all) counts, the two formulas
    // transcribed in the Spark side's operation order.
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
        |      AS n_words,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT))
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round((206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |    * 1000000) / 1000000 AS flesch_ease,
        |  round((0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - 15.59) * 1000000) / 1000000 AS fk_grade
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,

    // Assortativity: symmetric directed-edge view, five DECIMAL(38,0)
    // exact sums, one rounded Pearson division.
    "graph_assortativity" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM und GROUP BY 1),
        |j AS (SELECT dx.deg AS x, dy.deg AS y FROM und
        |      JOIN deg dx ON dx.node = und.u
        |      JOIN deg dy ON dy.node = und.v),
        |a AS (SELECT count(*) AS m,
        |        CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        |      FROM j)
        |SELECT m AS n_directed_edges,
        |  round(((CAST(m AS DOUBLE) * sxy - sx * sx)
        |    / nullif(CAST(m AS DOUBLE) * sxx - sx * sx, 0.0)) * 1000000)
        |    / 1000000
        |    AS assortativity
        |FROM a""".stripMargin,

    // Adamic–Adar: per common neighbor z, weight 1/ln(deg z) rounded to
    // 9 dp and DECIMAL-summed over wedges; adjacent pairs anti-joined
    // out; score >= 1.0.
    "graph_adamic_adar" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM und GROUP BY 1),
        |ww AS (SELECT und.u, und.v,
        |        CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 9)
        |          AS DECIMAL(28,9)) AS w
        |      FROM und JOIN deg ON deg.node = und.v
        |      WHERE deg >= 2),
        |wg AS (SELECT a.u AS x, b.u AS y, sum(a.w) AS aa,
        |        CAST(count(*) AS BIGINT) AS common
        |      FROM ww a JOIN ww b ON a.v = b.v AND a.u < b.u
        |      GROUP BY 1, 2),
        |na AS (SELECT wg.* FROM wg LEFT JOIN und
        |        ON und.u = wg.x AND und.v = wg.y
        |      WHERE und.u IS NULL)
        |SELECT x, y, common, CAST(round(aa, 6) AS DOUBLE) AS adamic_adar
        |FROM na WHERE CAST(round(aa, 6) AS DOUBLE) >= 1.0
        |ORDER BY x, y""".stripMargin,

    // Rich club: per-k induced-subgraph density via two semijoins.
    "graph_rich_club" -> {
      def one(k: Long) =
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  (SELECT count(*) FROM deg WHERE deg > $k) AS n_club,
           |  (SELECT count(*) // 2 FROM und
           |   JOIN (SELECT node FROM deg WHERE deg > $k) cu
           |     ON und.u = cu.node
           |   JOIN (SELECT node FROM deg WHERE deg > $k) cv
           |     ON und.v = cv.node) AS e_club""".stripMargin
      s"""WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
         |      FROM lineitem),
         |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
         |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS (SELECT src AS u, dst AS v FROM e
         |      UNION SELECT dst, src FROM e),
         |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
         |      FROM und GROUP BY 1),
         |l AS (${Seq(2L, 4L, 8L).map(one).mkString("\nUNION ALL ")})
         |SELECT k, n_club, e_club,
         |  round((2.0 * CAST(e_club AS DOUBLE)
         |    / nullif(CAST(n_club AS DOUBLE)
         |      * CAST(n_club - 1 AS DOUBLE), 0.0)) * 1000000) / 1000000
         |    AS phi
         |FROM l ORDER BY k""".stripMargin
    },

    // Clauset–Shalizi–Newman continuous MLE over the degree tail.
    "graph_powerlaw" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM und GROUP BY 1),
        |t AS (SELECT count(*) AS n_nodes FROM deg),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
        |        sum(CAST(round(ln(CAST(deg AS DOUBLE) / 5.0), 9)
        |          AS DECIMAL(28,9))) AS slog
        |      FROM deg WHERE deg >= 5)
        |SELECT n_nodes, n_tail, CAST(5 AS BIGINT) AS xmin,
        |  round((CAST(n_tail AS DOUBLE)
        |    / nullif(CAST(n_nodes AS DOUBLE), 0.0)) * 1000000) / 1000000
        |    AS tail_frac,
        |  round((1.0 + CAST(n_tail AS DOUBLE)
        |    / nullif(CAST(slog AS DOUBLE), 0.0)) * 1000000) / 1000000
        |    AS alpha_hill
        |FROM a CROSS JOIN t""".stripMargin,

    // k-core: three unrolled pruning rounds — degree within the
    // surviving subgraph via two semijoins, threshold filter, repeat.
    "graph_kcore" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |n0 AS (SELECT DISTINCT u AS node FROM und),
        |d1 AS (SELECT und.u AS node, count(*) AS degree FROM und
        |      JOIN n0 a ON a.node = und.u JOIN n0 b ON b.node = und.v
        |      GROUP BY 1),
        |s1 AS (SELECT node FROM d1 WHERE degree >= 3),
        |d2 AS (SELECT und.u AS node, count(*) AS degree FROM und
        |      JOIN s1 a ON a.node = und.u JOIN s1 b ON b.node = und.v
        |      GROUP BY 1),
        |s2 AS (SELECT node FROM d2 WHERE degree >= 3),
        |d3 AS (SELECT und.u AS node, count(*) AS degree FROM und
        |      JOIN s2 a ON a.node = und.u JOIN s2 b ON b.node = und.v
        |      GROUP BY 1)
        |SELECT node, degree FROM d3 WHERE degree >= 3
        |ORDER BY node""".stripMargin,

    // Node Jaccard: shared-neighbor wedge join (a.v = b.v, u-ordered),
    // exact BIGINT counts, one rounded division.
    "graph_node_jaccard" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1),
        |cmn AS (SELECT a.u AS x, b.u AS y, count(*) AS common
        |      FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
        |      GROUP BY 1, 2),
        |j AS (SELECT x, y, common,
        |        round((CAST(common AS DOUBLE)
        |          / CAST(dx.deg + dy.deg - common AS DOUBLE)) * 1000000)
        |          / 1000000 AS jaccard
        |      FROM cmn JOIN deg dx ON dx.node = x
        |      JOIN deg dy ON dy.node = y)
        |SELECT x, y, common, jaccard FROM j WHERE jaccard >= 0.25
        |ORDER BY x, y""".stripMargin,

    // BFS: Bellman-Ford-shaped full-table relaxation per hop — same min
    // distance as the Spark side's frontier BFS (exact, not just
    // equivalent-in-the-limit: min over (d_k ∪ d_k-propagated) is the
    // BFS distance truncated at k).
    "graph_bfs_hops" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |seeds AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
        |      ORDER BY node LIMIT 5),
        |d1 AS (SELECT node, min(dist) AS dist FROM (
        |      SELECT node, dist FROM seeds UNION ALL
        |      SELECT und.v, seeds.dist + 1 FROM seeds
        |        JOIN und ON und.u = seeds.node) GROUP BY 1),
        |d2 AS (SELECT node, min(dist) AS dist FROM (
        |      SELECT node, dist FROM d1 UNION ALL
        |      SELECT und.v, d1.dist + 1 FROM d1
        |        JOIN und ON und.u = d1.node) GROUP BY 1),
        |d3 AS (SELECT node, min(dist) AS dist FROM (
        |      SELECT node, dist FROM d2 UNION ALL
        |      SELECT und.v, d2.dist + 1 FROM d2
        |        JOIN und ON und.u = d2.node) GROUP BY 1)
        |SELECT node, dist FROM d3 ORDER BY node""".stripMargin,

    // Per-seed BFS unrolled with the seed carried through each level's
    // min; harmonic = DECIMAL sum of 9-dp 1/d terms.
    "graph_closeness" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |s0 AS (SELECT node AS seed FROM nodes ORDER BY node LIMIT 3),
        |b0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist
        |      FROM s0),
        |b1 AS (SELECT seed, node, min(dist) AS dist FROM (
        |      SELECT seed, node, dist FROM b0 UNION ALL
        |      SELECT b0.seed, und.v, b0.dist + 1 FROM b0
        |        JOIN und ON und.u = b0.node) GROUP BY 1, 2),
        |b2 AS (SELECT seed, node, min(dist) AS dist FROM (
        |      SELECT seed, node, dist FROM b1 UNION ALL
        |      SELECT b1.seed, und.v, b1.dist + 1 FROM b1
        |        JOIN und ON und.u = b1.node) GROUP BY 1, 2),
        |b3 AS (SELECT seed, node, min(dist) AS dist FROM (
        |      SELECT seed, node, dist FROM b2 UNION ALL
        |      SELECT b2.seed, und.v, b2.dist + 1 FROM b2
        |        JOIN und ON und.u = b2.node) GROUP BY 1, 2),
        |a AS (SELECT seed, count(*) AS n_reached,
        |        CAST(sum(dist) AS BIGINT) AS total_dist,
        |        CAST(sum(CAST(round((1e0 / dist) * 1000000000) / 1000000000
        |            AS DECIMAL(18,9)))
        |          AS DOUBLE) AS h
        |      FROM b3 WHERE dist > 0 GROUP BY 1)
        |SELECT s0.seed AS node, coalesce(n_reached, 0) AS n_reached,
        |  coalesce(total_dist, 0) AS total_dist,
        |  round((CAST(n_reached AS DOUBLE)
        |    / nullif(CAST(total_dist AS DOUBLE), 0e0)) * 1000000)
        |    / 1000000 AS closeness,
        |  round(coalesce(h, 0e0) * 1000000) / 1000000 AS harmonic
        |FROM s0 LEFT JOIN a USING (seed) ORDER BY node""".stripMargin,

    // LPA: two unrolled synchronous rounds, argmax by (count DESC,
    // label ASC) row_number — the same deterministic tie-break as the
    // Spark window; isolated nodes coalesce back to their own label.
    "graph_label_prop" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |l0 AS (SELECT node, node % 3 AS label FROM nodes),
        |v1 AS (SELECT und.v AS node, l0.label AS label, count(*) AS c
        |      FROM l0 JOIN und ON und.u = l0.node GROUP BY 1, 2),
        |w1 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
        |l1 AS (SELECT l0.node, coalesce(w1.new_label, l0.label) AS label
        |      FROM l0 LEFT JOIN w1 ON w1.node = l0.node),
        |v2 AS (SELECT und.v AS node, l1.label AS label, count(*) AS c
        |      FROM l1 JOIN und ON und.u = l1.node GROUP BY 1, 2),
        |w2 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1)
        |SELECT l1.node AS node, coalesce(w2.new_label, l1.label) AS label
        |FROM l1 LEFT JOIN w2 ON w2.node = l1.node
        |ORDER BY l1.node""".stripMargin,

    // Modularity of the same 2-round LPA labeling: per-community
    // intra-edge and degree masses over the directed edge view.
    "graph_modularity" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |l0 AS (SELECT node, node % 3 AS label FROM nodes),
        |v1 AS (SELECT und.v AS node, l0.label AS label, count(*) AS c
        |      FROM l0 JOIN und ON und.u = l0.node GROUP BY 1, 2),
        |w1 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
        |l1 AS (SELECT l0.node, coalesce(w1.new_label, l0.label) AS label
        |      FROM l0 LEFT JOIN w1 ON w1.node = l0.node),
        |v2 AS (SELECT und.v AS node, l1.label AS label, count(*) AS c
        |      FROM l1 JOIN und ON und.u = l1.node GROUP BY 1, 2),
        |w2 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1),
        |lab AS (SELECT l1.node AS node, coalesce(w2.new_label, l1.label)
        |        AS label FROM l1 LEFT JOIN w2 ON w2.node = l1.node),
        |el AS (SELECT lu.label AS lu, lv.label AS lv
        |      FROM und JOIN lab lu ON lu.node = und.u
        |      JOIN lab lv ON lv.node = und.v),
        |m2 AS (SELECT count(*) AS m2 FROM el),
        |degs AS (SELECT lu AS label, CAST(count(*) AS BIGINT)
        |          AS degree_sum,
        |        CAST(sum(CASE WHEN lu = lv THEN 1 ELSE 0 END) AS BIGINT)
        |          AS intra_directed
        |      FROM el GROUP BY 1),
        |sizes AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1)
        |SELECT sizes.label AS label, n_nodes,
        |  coalesce(intra_directed, 0) AS intra_directed,
        |  coalesce(degree_sum, 0) AS degree_sum,
        |  round((CAST(coalesce(intra_directed, 0) AS DOUBLE)
        |      / nullif(CAST(m2 AS DOUBLE), 0.0)
        |    - (CAST(coalesce(degree_sum, 0) AS DOUBLE)
        |      / nullif(CAST(m2 AS DOUBLE), 0.0))
        |      * (CAST(coalesce(degree_sum, 0) AS DOUBLE)
        |      / nullif(CAST(m2 AS DOUBLE), 0.0))) * 1000000) / 1000000
        |    AS q_contrib
        |FROM sizes LEFT JOIN degs USING (label) CROSS JOIN m2
        |ORDER BY label""".stripMargin,

    // Conductance: same LPA CTE chain as graph_modularity; on the
    // symmetrized edges a crossing undirected edge lands exactly once
    // in the (lu in C, lv outside) count, so cut and volume share one
    // aggregate; ratio DECIMAL-routed (1/128 is an exact 7-dp half).
    "graph_conductance" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT src AS u, dst AS v FROM e
        |      UNION SELECT dst, src FROM e),
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |l0 AS (SELECT node, node % 3 AS label FROM nodes),
        |v1 AS (SELECT und.v AS node, l0.label AS label, count(*) AS c
        |      FROM l0 JOIN und ON und.u = l0.node GROUP BY 1, 2),
        |w1 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
        |l1 AS (SELECT l0.node, coalesce(w1.new_label, l0.label) AS label
        |      FROM l0 LEFT JOIN w1 ON w1.node = l0.node),
        |v2 AS (SELECT und.v AS node, l1.label AS label, count(*) AS c
        |      FROM l1 JOIN und ON und.u = l1.node GROUP BY 1, 2),
        |w2 AS (SELECT node, label AS new_label FROM (
        |      SELECT node, label, row_number() OVER (PARTITION BY node
        |        ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1),
        |lab AS (SELECT l1.node AS node, coalesce(w2.new_label, l1.label)
        |        AS label FROM l1 LEFT JOIN w2 ON w2.node = l1.node),
        |el AS (SELECT lu.label AS lu, lv.label AS lv
        |      FROM und JOIN lab lu ON lu.node = und.u
        |      JOIN lab lv ON lv.node = und.v),
        |m2 AS (SELECT count(*) AS m2 FROM el),
        |per AS (SELECT lu AS label, CAST(count(*) AS BIGINT) AS volume,
        |        CAST(sum(CASE WHEN lu <> lv THEN 1 ELSE 0 END) AS BIGINT)
        |          AS cut
        |      FROM el GROUP BY 1),
        |sizes AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1)
        |SELECT sizes.label AS label, n_nodes,
        |  coalesce(volume, 0) AS volume, coalesce(cut, 0) AS cut,
        |  round((CAST(coalesce(cut, 0) AS DOUBLE)
        |    / nullif(CAST(least(coalesce(volume, 0),
        |        m2 - coalesce(volume, 0)) AS DOUBLE), 0.0)) * 1000000)
        |    / 1000000 AS conductance
        |FROM sizes LEFT JOIN per USING (label) CROSS JOIN m2
        |ORDER BY label""".stripMargin,

    // k_nn(k): per-node mean neighbor degree 12-dp-quantized before the
    // per-degree-class mean (both engines average identical decimals).
    "graph_knn_degree" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst FROM it l
        |      JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT DISTINCT u, v FROM (
        |      SELECT src AS u, dst AS v FROM e
        |      UNION ALL SELECT dst, src FROM e)),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM und GROUP BY 1),
        |pn AS (SELECT und.u AS node, du.deg AS deg,
        |        CAST(round((CAST(sum(CAST(dv.deg AS DECIMAL(38,0)))
        |            AS DOUBLE) / count(*)) * 1e12) / 1e12
        |          AS DECIMAL(24,12)) AS nn12
        |      FROM und JOIN deg du ON du.node = und.u
        |      JOIN deg dv ON dv.node = und.v GROUP BY 1, 2)
        |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes,
        |  round((CAST(sum(nn12) AS DOUBLE) / count(*)) * 1000000) / 1000000
        |    AS avg_nn_deg
        |FROM pn GROUP BY deg ORDER BY deg""".stripMargin,

    // Local bridges by the NAIVE common-neighbor anti-join — Spark's
    // degree-oriented triangle-edge formulation must agree.
    "graph_local_bridges" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst FROM it l
        |      JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT DISTINCT u, v FROM (
        |      SELECT src AS u, dst AS v FROM e
        |      UNION ALL SELECT dst, src FROM e)),
        |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst)
        |        AS b FROM e),
        |closed AS (SELECT DISTINCT e0.a, e0.b FROM e0
        |      JOIN und n1 ON n1.u = e0.a
        |      JOIN und n2 ON n2.u = e0.b AND n2.v = n1.v)
        |SELECT a AS src, b AS dst FROM e0
        |ANTI JOIN closed USING (a, b)
        |ORDER BY src, dst""".stripMargin,

    // Fiedler: 5 unrolled deflated power rounds + the final half-step
    // norm; 12-dp DECIMAL trajectory like the Spark loop.
    "graph_fiedler" -> {
      def half(k: Int, prev: String) =
        s"""m$k AS MATERIALIZED (SELECT sx / nn.n AS mx FROM (
           |        SELECT CAST(sum(CAST(round(x * 1e12) / 1e12 AS DECIMAL(28,12)))
           |          AS DOUBLE) AS sx FROM $prev) CROSS JOIN nn),
           |s$k AS MATERIALIZED (SELECT und.u AS node,
           |        sum(CAST(round(p.x * 1e12) / 1e12 AS DECIMAL(28,12))) AS sn
           |      FROM und JOIN $prev p ON p.node = und.v GROUP BY 1),
           |y$k AS MATERIALIZED (SELECT d.node,
           |        cc.c * p.x - (CAST(d.deg AS DOUBLE) * p.x
           |          - coalesce(CAST(s$k.sn AS DOUBLE), 0.0))
           |          - cc.c * m$k.mx AS y
           |      FROM deg d JOIN $prev p ON p.node = d.node
           |      LEFT JOIN s$k ON s$k.node = d.node
           |      CROSS JOIN cc CROSS JOIN m$k),
           |n$k AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round((y * y) * 1e12)
           |        / 1e12 AS DECIMAL(28,12))) AS DOUBLE)) AS nrm FROM y$k)""".stripMargin
      val rounds = (1 to 5).map { k =>
        half(k, if (k == 1) "x0" else s"x${k - 1}") + s""",
           |x$k AS MATERIALIZED (SELECT node, round((CASE WHEN nrm = 0
           |  THEN 0.0 ELSE y / nrm END) * 1e12) / 1e12 AS x
           |  FROM y$k CROSS JOIN n$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk,
         |      l_partkey AS pt FROM lineitem),
         |e AS MATERIALIZED (SELECT l.pt AS src, r.pt AS dst FROM it l
         |      JOIN it r ON l.bk = r.bk AND l.pt < r.pt
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS MATERIALIZED (SELECT DISTINCT u, v FROM (
         |      SELECT src AS u, dst AS v FROM e
         |      UNION ALL SELECT dst, src FROM e)),
         |deg AS MATERIALIZED (SELECT u AS node,
         |      CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |cc AS (SELECT CAST(2 * max(deg) AS DOUBLE) AS c FROM deg),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |x0 AS (SELECT node, CAST(node % 2 AS DOUBLE) * 2.0 - 1.0 AS x
         |      FROM deg),
         |$rounds,
         |${half(6, "x5")},
         |sides AS (SELECT node, x > 0.0 AS pos FROM x5),
         |sizes AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
         |        AS BIGINT) AS n_pos,
         |        CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
         |          AS n_neg FROM sides),
         |cut AS (SELECT CAST(sum(CASE WHEN a.pos <> b.pos THEN 1
         |        ELSE 0 END) / 2 AS BIGINT) AS cut_edges
         |      FROM und JOIN sides a ON a.node = und.u
         |      JOIN sides b ON b.node = und.v)
         |SELECT nn.n AS n_nodes, n_pos, n_neg, cut_edges,
         |  round((cc.c - n6.nrm) * 1000000) / 1000000 AS lambda2_est
         |FROM nn CROSS JOIN sizes CROSS JOIN cut
         |CROSS JOIN n6 CROSS JOIN cc""".stripMargin
    },

    // Katz: 3 materialized rounds (ADVICE: unrolled chains materialize
    // per round), per-hop contributions 12-dp DECIMAL(18,12) exact.
    "graph_katz" -> {
      val iterCtes = (1 to 3).map { k =>
        val prev = s"x${k - 1}"
        s"""c$k AS MATERIALIZED (SELECT e.dst AS node,
           |        sum(CAST(round((0.05 * p.x) * 1e12) / 1e12
           |          AS DECIMAL(18,12))) AS s
           |      FROM e JOIN $prev p ON p.node = e.src GROUP BY 1),
           |x$k AS MATERIALIZED (SELECT n.node,
           |        1e0 + coalesce(CAST(c$k.s AS DOUBLE), 0e0) AS x
           |      FROM nodes n LEFT JOIN c$k ON c$k.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk,
         |      l_partkey AS pt FROM lineitem),
         |e AS MATERIALIZED (SELECT l.pt AS src, r.pt AS dst FROM it l
         |      JOIN it r ON l.bk = r.bk AND l.pt < r.pt
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e
         |      UNION SELECT dst FROM e),
         |x0 AS (SELECT node, 1e0 AS x FROM nodes),
         |$iterCtes
         |SELECT node, round(x * 1000000) / 1000000 AS katz
         |FROM x3 ORDER BY node""".stripMargin
    },

    // Link-prediction panel: same wedge algebra as graph_adamic_adar
    // with 1/deg weights; RA rounded on the DECIMAL before the cast.
    "graph_link_pred" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
        |      FROM lineitem),
        |e AS (SELECT l.pt AS src, r.pt AS dst, count(*) AS c
        |      FROM it l JOIN it r ON l.bk = r.bk AND l.pt < r.pt
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT DISTINCT u, v FROM (
        |      SELECT src AS u, dst AS v FROM e
        |      UNION ALL SELECT dst, src FROM e)),
        |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM und GROUP BY 1),
        |ww AS (SELECT und.u, und.v,
        |        CAST(round((1.0 / CAST(deg AS DOUBLE)) * 1000000000)
        |          / 1000000000 AS DECIMAL(28,9)) AS w
        |      FROM und JOIN deg ON deg.node = und.v
        |      WHERE deg >= 2),
        |pr AS (SELECT a.u AS x, b.u AS y,
        |        CAST(count(*) AS BIGINT) AS common, sum(a.w) AS ra
        |      FROM ww a JOIN ww b ON a.v = b.v AND a.u < b.u
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |np AS (SELECT pr.* FROM pr
        |      WHERE NOT EXISTS (SELECT 1 FROM und
        |        WHERE und.u = pr.x AND und.v = pr.y))
        |SELECT np.x, np.y, np.common,
        |  CAST(round(ra, 6) AS DOUBLE) AS resource_alloc,
        |  dx.deg * dy.deg AS pref_attach
        |FROM np JOIN deg dx ON dx.node = np.x
        |JOIN deg dy ON dy.node = np.y
        |ORDER BY np.x, np.y""".stripMargin,

    // Walk corpus: same sorted-neighbor indices and two-round Knuth hop
    // hash, 3 unrolled steps.
    "graph_walks" -> {
      def hop(s: Int) =
        s"(((((((f.start_node * 2 + f.walk) % 2147483648) * 2654435761) " +
          s"% 4294967296 + $s) % 2147483648) * 2654435761) % 4294967296)"
      val steps = (1 to 3).map { s =>
        val prev = s"f${s - 1}"
        s"""f$s AS (SELECT f.start_node, f.walk, CAST($s AS BIGINT) AS step,
           |        a.v AS cur
           |      FROM $prev f JOIN deg d ON d.node = f.cur
           |      JOIN adj a ON a.u = f.cur
           |        AND a.idx = ${hop(s)} % d.deg)""".stripMargin
      }.mkString(",\n")
      s"""WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS pt
         |      FROM lineitem),
         |e AS (SELECT l.pt AS src, r.pt AS dst FROM it l
         |      JOIN it r ON l.bk = r.bk AND l.pt < r.pt
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS (SELECT DISTINCT u, v FROM (
         |      SELECT src AS u, dst AS v FROM e
         |      UNION ALL SELECT dst, src FROM e)),
         |adj AS (SELECT u, v, CAST(row_number() OVER (PARTITION BY u
         |        ORDER BY v) - 1 AS BIGINT) AS idx FROM und),
         |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
         |      FROM adj GROUP BY 1),
         |f0 AS (SELECT node AS start_node, CAST(w AS BIGINT) AS walk,
         |        CAST(0 AS BIGINT) AS step, node AS cur
         |      FROM deg CROSS JOIN range(2) r(w)),
         |$steps
         |SELECT start_node, walk, step, cur AS node FROM f0
         |UNION ALL SELECT start_node, walk, step, cur FROM f1
         |UNION ALL SELECT start_node, walk, step, cur FROM f2
         |UNION ALL SELECT start_node, walk, step, cur FROM f3
         |ORDER BY start_node, walk, step""".stripMargin
    },

    // HITS unrolled: each iteration = an authority half-step (DECIMAL
    // in-sum of 12-dp hubs, exact L1 total, 12-dp quotient) then a hub
    // half-step over the fresh authorities — byte-identical to the
    // Spark loop.
    "graph_hits" -> {
      val iterCtes = (1 to 2).map { k =>
        val prev = if (k == 1) "hb0" else s"hb${k - 1}"
        s"""a${k}r AS (SELECT e.dst AS node,
           |        sum(CAST(round(h.hub * 1e12) / 1e12 AS DECIMAL(18,12))) AS s
           |      FROM e JOIN $prev h ON h.node = e.src GROUP BY 1),
           |a${k}t AS (SELECT coalesce(sum(s), CAST(0 AS DECIMAL(28,12)))
           |        AS tot FROM a${k}r),
           |a$k AS (SELECT n.node, CASE WHEN a${k}t.tot = 0 THEN 0e0 ELSE
           |        round((coalesce(CAST(r.s AS DOUBLE), 0e0)
           |          / CAST(a${k}t.tot AS DOUBLE)) * 1e12) / 1e12 END
           |        AS authority
           |      FROM nodes n CROSS JOIN a${k}t
           |      LEFT JOIN a${k}r r ON r.node = n.node),
           |h${k}r AS (SELECT e.src AS node,
           |        sum(CAST(round(a.authority * 1e12) / 1e12 AS DECIMAL(18,12))) AS s
           |      FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
           |h${k}t AS (SELECT coalesce(sum(s), CAST(0 AS DECIMAL(28,12)))
           |        AS tot FROM h${k}r),
           |hb$k AS (SELECT n.node, CASE WHEN h${k}t.tot = 0 THEN 0e0 ELSE
           |        round((coalesce(CAST(r.s AS DOUBLE), 0e0)
           |          / CAST(h${k}t.tot AS DOUBLE)) * 1e12) / 1e12 END
           |        AS hub
           |      FROM nodes n CROSS JOIN h${k}t
           |      LEFT JOIN h${k}r r ON r.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT event_type AS cur,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS nxt
         |      FROM events),
         |e AS (SELECT DISTINCT cur AS src, nxt AS dst FROM tr
         |      WHERE nxt IS NOT NULL AND nxt <> cur),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |hb0 AS (SELECT node, 1e0 / nn.n AS hub FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT node, round(hub * 1000000) / 1000000 AS hub,
         |  round(authority * 1000000) / 1000000 AS authority
         |FROM hb2 JOIN a2 USING (node) ORDER BY node""".stripMargin
    },

    // Reciprocity: EXISTS on the swapped key mirrors the left-semi join.
    "graph_reciprocity" ->
      """WITH tr AS (SELECT event_type AS cur,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS nxt
        |      FROM events),
        |e AS (SELECT DISTINCT cur AS src, nxt AS dst FROM tr
        |      WHERE nxt IS NOT NULL AND nxt <> cur),
        |r AS (SELECT count(*) AS n_reciprocal FROM e
        |      WHERE EXISTS (SELECT 1 FROM e e2
        |        WHERE e2.src = e.dst AND e2.dst = e.src)),
        |n AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_edges, n_reciprocal,
        |  round((CAST(n_reciprocal AS DOUBLE)
        |    / nullif(CAST(n_edges AS DOUBLE), 0e0)) * 1000000) / 1000000
        |    AS reciprocity
        |FROM n CROSS JOIN r""".stripMargin,

    // min_by/max_by with the tie-proof composite ordering key
    // (cents·10⁹ + custkey) rebuilt arithmetically.
    "q_min_by" ->
      """SELECT c_nationkey,
        |  min_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT)
        |    * 1000000000 + c_custkey) AS poorest_cust,
        |  max_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT)
        |    * 1000000000 + c_custkey) AS richest_cust,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    // List lambdas: list_filter/list_transform/list_reduce mirror
    // filter/transform/aggregate element-for-element; the fold runs in
    // array order on both engines (0.0+x₁² ≡ x₁² exactly), so the
    // unquantized running sum is still IEEE-identical.
    "q_array_ops" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.0))
        |    AS BIGINT) AS n_pos,
        |  round(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x), (acc, x) -> acc + x), 6) AS sum_sq,
        |  round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> abs(x))), 6) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // BPE unrolled: per iteration the SAME relational steps as the Spark
    // side — per-word lead pairs, freq-weighted argmax (ties -> lexical),
    // island run-parity greedy application — CTE for CTE.
    "text_bpe_merges" -> {
      val iters = (1 to 3).map { k =>
        val p = k - 1
        s"""tok$k AS (SELECT w, freq, CAST(generate_subscripts(toks, 1) AS BIGINT) AS i,
           |        unnest(toks) AS t FROM w$p),
           |tn$k AS (SELECT w, freq, i, t,
           |        lead(t) OVER (PARTITION BY w ORDER BY i) AS nxt FROM tok$k),
           |top$k AS (SELECT t AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS pf
           |        FROM tn$k WHERE nxt IS NOT NULL
           |        GROUP BY 1, 2 ORDER BY pf DESC, l, r LIMIT 1),
           |st$k AS (SELECT w, i FROM (
           |          SELECT w, i, row_number() OVER (PARTITION BY w, g ORDER BY i) - 1 AS off
           |          FROM (SELECT tn.w, tn.i,
           |                  tn.i - row_number() OVER (PARTITION BY tn.w ORDER BY tn.i) AS g
           |                FROM tn$k tn CROSS JOIN top$k top
           |                WHERE tn.t = top.l AND tn.nxt = top.r))
           |        WHERE off % 2 = 0),
           |ap$k AS (SELECT tn.w, tn.freq, tn.i,
           |          CASE WHEN s1.i IS NOT NULL THEN tn.t || tn.nxt ELSE tn.t END AS t
           |        FROM tn$k tn
           |        LEFT JOIN st$k s1 ON s1.w = tn.w AND s1.i = tn.i
           |        LEFT JOIN st$k s2 ON s2.w = tn.w AND s2.i + 1 = tn.i
           |        WHERE s2.i IS NULL),
           |w$k AS (SELECT w, freq, list(t ORDER BY i) AS toks FROM ap$k GROUP BY 1, 2)"""
          .stripMargin
      }.mkString(",\n")
      val rows = (1 to 3).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS iter, l AS "left", r AS "right",
           |  l || r AS merged, pf AS pair_freq FROM top$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS ($docToks),
         |w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
         |         string_split(w, '') AS toks
         |       FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w),
         |$iters
         |$rows
         |ORDER BY iter""".stripMargin
    },

    "text_pack_materialize" ->
      s"""WITH base AS (
         |  SELECT doc_id, CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM documents),
         |c AS (SELECT doc_id, n_subwords,
         |        sum(n_subwords) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |          AS cum FROM base),
         |p AS (SELECT doc_id, n_subwords,
         |        CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |      FROM c)
         |SELECT p.seq_id, count(*) AS n_docs,
         |  CAST(sum(p.n_subwords) AS BIGINT) AS seq_tokens,
         |  string_agg(d.text, ' <eos> ' ORDER BY p.doc_id) AS seq_text
         |FROM p JOIN documents d USING (doc_id)
         |GROUP BY p.seq_id ORDER BY seq_id""".stripMargin,

    // Same polynomial string hash the CMS oracle rebuilds; slots are
    // pmod(h, 64) over exact BIGINT counts.
    "text_feature_hash" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM base),
         |kh AS (SELECT term,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(length(term)),
         |        i -> ascii(substr(term, CAST(i + 1 AS INT), 1)))),
         |      (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         |  FROM (SELECT DISTINCT term FROM t)),
         |s AS (SELECT t.doc_id, ((kh.h % 64) + 64) % 64 AS slot
         |      FROM t JOIN kh USING (term))
         |SELECT doc_id, CAST(slot AS BIGINT) AS slot, count(*) AS cnt
         |FROM s GROUP BY 1, 2 ORDER BY doc_id, slot""".stripMargin,

    "text_vocab_coverage" ->
      s"""WITH base AS ($docToks),
         |t AS (SELECT unnest(toks) AS term FROM base),
         |c AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |v AS (SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC, term)
         |          - 1 AS BIGINT) AS term_id
         |      FROM (SELECT term, freq FROM c
         |            ORDER BY freq DESC, term LIMIT 30)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM t),
         |sz AS (SELECT CAST(unnest([10, 20, 30]) AS BIGINT) AS vocab_size)
         |SELECT sz.vocab_size, CAST(sum(v.freq) AS BIGINT) AS covered_tokens,
         |  tot.total_tokens,
         |  CAST(sum(v.freq) AS DOUBLE) / tot.total_tokens AS coverage
         |FROM v JOIN sz ON v.term_id < sz.vocab_size CROSS JOIN tot
         |GROUP BY 1, 3 ORDER BY vocab_size""".stripMargin,

    "text_source_profile" ->
      """WITH p AS (SELECT source, lang,
        |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents),
        |r AS (SELECT source, lang, CAST(len(toks) AS BIGINT) AS n_toks,
        |        CAST(len(list_distinct(toks)) AS DOUBLE)
        |          / nullif(len(toks), 0) AS ratio
        |      FROM p)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  round((CAST(sum(CAST(round(ratio * 1000000) / 1000000
        |      AS DECIMAL(18,6))) AS DOUBLE)
        |    / nullif(count(ratio), 0)) * 1000000) / 1000000
        |    AS mean_distinct_ratio
        |FROM r GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,

    "text_pack" ->
      s"""WITH base AS (
         |  SELECT doc_id, CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM documents),
         |c AS (SELECT doc_id, n_subwords,
         |        sum(n_subwords) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM base)
         |SELECT doc_id, n_subwords,
         |  CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_pack_sharded" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang AS shard, CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM documents),
         |c AS (SELECT doc_id, shard, n_subwords,
         |        sum(n_subwords) OVER (PARTITION BY shard ORDER BY doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM base)
         |SELECT doc_id, shard, n_subwords,
         |  CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_pack_stats" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang AS shard, CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM documents),
         |c AS (SELECT doc_id, shard, n_subwords,
         |        sum(n_subwords) OVER (PARTITION BY shard ORDER BY doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM base),
         |p AS (SELECT shard, n_subwords,
         |        CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |      FROM c)
         |SELECT shard, CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
         |  count(*) AS n_docs, CAST(sum(n_subwords) AS BIGINT) AS n_tokens,
         |  round((CAST(sum(n_subwords) AS DOUBLE)
         |    / nullif(count(DISTINCT seq_id) * 400.0, 0)) * 1000000)
         |    / 1000000 AS utilization
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,

    "op01_02_json_copy" ->
      """SELECT CAST(event_id AS INTEGER) AS session_id,
        |  CAST(user_id AS VARCHAR) AS user_id, event_type AS song,
        |  value AS length, epoch_ms(epoch_ms(ts)) AS ts
        |FROM events ORDER BY session_id""".stripMargin,

    "op_csv_roundtrip" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,

    "op_orc_roundtrip" ->
      """SELECT event_id, user_id, event_type, value, ts
        |FROM events ORDER BY event_id""".stripMargin,

    // Both sources must reproduce the document texts byte-for-byte.
    "op_text_source" ->
      "SELECT text FROM documents ORDER BY text",

    "op_binary_source" ->
      "SELECT text FROM documents ORDER BY text",

    "op_json_quarantine" ->
      """SELECT count(*) AS n_valid, CAST(3 AS BIGINT) AS n_quarantined,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events""".stripMargin,

    "op_partitioned_prune" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "op_schema_evolution" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 2 = 1 THEN value END AS value
        |FROM events ORDER BY event_id""".stripMargin,

    "stream_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q_full_outer" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_big_orders FROM orders
        |           WHERE o_totalprice > 150000 GROUP BY 1),
        |c AS (SELECT c_custkey, c_name FROM customer
        |      WHERE c_mktsegment = 'BUILDING')
        |SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
        |  o.n_big_orders, c.c_name
        |FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey
        |ORDER BY custkey""".stripMargin,

    "q_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "op_bucketed_join" ->
      """SELECT l_orderkey, count(*) AS n_li,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_skew_salted" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",

    // Bit-for-bit mirror of Layout.zorderKey2Sql — generated from the
    // same code that builds the Spark Column, so they cannot drift.
    // Partition audit: per-(day, type) counts, ceil files at 1000
    // rows/file, share and skew factor vs the even split.
    "layout_partition_plan" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS p_date, event_type,
        |        count(*) AS n_rows FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
        |        count(*) AS n_partitions FROM c)
        |SELECT p_date, event_type, n_rows,
        |  CAST(floor((n_rows + 999) / 1000.0) AS BIGINT) AS n_files,
        |  round((CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000) / 1000000
        |    AS frac_of_total,
        |  round((CAST(n_rows AS DOUBLE) * CAST(n_partitions AS DOUBLE)
        |    / CAST(total AS DOUBLE)) * 1000000) / 1000000 AS skew_vs_even
        |FROM c CROSS JOIN t ORDER BY p_date, event_type""".stripMargin,

    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ${operators.Layout.zorderKey2Sql("l_partkey", "l_suppkey", 16)} AS zkey
         |FROM lineitem
         |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin,

    "layout_zorder3" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ${operators.Layout.zorderKeyNSql(
                Seq("l_partkey", "l_suppkey", "l_linenumber"), 20)} AS zkey
         |FROM lineitem
         |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin,

    // Zone-map replay: same row_number file cut, min–max per file,
    // point probes against [mn, mx].
    "layout_skipping" -> {
      def one(name: String, order: String) =
        s"""SELECT '$name' AS layout, probe, n_files,
           |  coalesce(h, 0) AS files_hit,
           |  CAST(round((1.0 - CAST(coalesce(h, 0) AS DOUBLE)
           |    / CAST(n_files AS DOUBLE)) * 1000000) / 1000000 AS DOUBLE)
           |    AS skip_ratio
           |FROM (VALUES (CAST(7 AS BIGINT)), (42), (120)) p(probe)
           |LEFT JOIN (
           |  SELECT probe, CAST(count(*) AS BIGINT) AS h
           |  FROM (SELECT CAST(floor((rn - 1) / 500) AS BIGINT) AS f,
           |          min(user_id) AS mn, max(user_id) AS mx
           |        FROM (SELECT user_id,
           |                row_number() OVER (ORDER BY $order) AS rn
           |              FROM events) GROUP BY 1) fs
           |  JOIN (VALUES (CAST(7 AS BIGINT)), (42), (120)) pp(probe)
           |    ON probe BETWEEN mn AND mx
           |  GROUP BY 1) USING (probe)
           |CROSS JOIN (
           |  SELECT CAST(count(DISTINCT CAST(floor((rn - 1) / 500) AS BIGINT))
           |      AS BIGINT) AS n_files
           |  FROM (SELECT row_number() OVER (ORDER BY $order) AS rn
           |        FROM events))""".stripMargin
      s"""SELECT * FROM (${one("by_time", "ts, event_id")}
         |UNION ALL ${one("by_user", "user_id, event_id")})
         |ORDER BY layout, probe""".stripMargin
    },

    "mm_frames" ->
      """SELECT doc_id AS asset_id, i AS frame_idx,
        |  CAST(i * octet_length(encode(text)) // 4 AS BIGINT) AS offset
        |FROM documents CROSS JOIN range(4) t(i)
        |WHERE octet_length(encode(text)) > 0
        |ORDER BY asset_id, frame_idx""".stripMargin,

    "q_skew_salted_join" ->
      """SELECT event_id, event_type, upper(event_type) AS type_name
        |FROM events ORDER BY event_id""".stripMargin,

    "mm_metadata" ->
      """SELECT doc_id AS asset_id, 'image' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1)) AS BIGINT) AS header_code
        |FROM documents ORDER BY asset_id""".stripMargin,

    "mm_decode" ->
      """SELECT doc_id AS asset_id, 'image' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 1024 AS BIGINT) AS width,
        |  CAST(64 + (ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1))) % 1024 AS BIGINT) AS height
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Mirrors Multimodal.syntheticPng's formula: w = 1+id%8, h = 1+id%5,
    // sample i = (id*31+i) % 256 — the engine side must recover these
    // through a real PNG encode/decode round trip to match.
    "mm_decode_png" ->
      """SELECT doc_id AS asset_id, 'png' AS codec,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS width,
        |  CAST(1 + doc_id % 5 AS BIGINT) AS height,
        |  CAST(list_sum(list_transform(
        |    range(0, (1 + doc_id % 8) * (1 + doc_id % 5)),
        |    i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS sum_sample
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Geometry/codec exact; the error-bound booleans are contract
    // constants (Multimodal.jpegRoundTrip scaladoc) — TRUE unless the
    // codec path regresses.
    "mm_decode_jpeg" ->
      """SELECT doc_id AS asset_id, 'jpeg' AS codec,
        |  CAST(8 * (1 + doc_id % 4) AS BIGINT) AS width,
        |  CAST(8 * (1 + doc_id % 3) AS BIGINT) AS height,
        |  TRUE AS mean_err_le_2, TRUE AS max_err_le_8
        |FROM documents ORDER BY asset_id""".stripMargin,

    // dHash rebuilt arithmetically from the synthetic raster formula
    // (pixel i = (id·31+i) mod 256, nearest-neighbor 8×8 grid, integer
    // division //), then brute-force Hamming over all pairs — the exact
    // answer the banded join must reproduce with guaranteed recall.
    "mm_dhash_neardup" ->
      """WITH d AS (SELECT doc_id AS id, 16 + doc_id % 16 AS w,
        |        16 + doc_id % 8 AS h FROM documents),
        |g AS (SELECT id,
        |        (id * 31 + 7 * (((r.r * h) // 8) * w + (c.c * w) // 8)
        |          * (((r.r * h) // 8) * w + (c.c * w) // 8)) % 256 AS p0,
        |        (id * 31 + 7 * (((r.r * h) // 8) * w + ((c.c + 1) * w) // 8)
        |          * (((r.r * h) // 8) * w + ((c.c + 1) * w) // 8)) % 256
        |          AS p1,
        |        r.r * 7 + c.c AS bit
        |      FROM d CROSS JOIN range(8) r(r) CROSS JOIN range(7) c(c)),
        |hh AS (SELECT id, CAST(sum(CASE WHEN p0 > p1
        |          THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT)
        |          AS dhash
        |      FROM g GROUP BY 1),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |        CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        |      FROM hh a JOIN hh b ON a.id < b.id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Luma stats rebuilt arithmetically from the rich raster formula
    // (pixel i = (id·31 + 7i²) mod 256, row-major) — exact integer
    // moments, closed-form mean/std.
    "mm_luma_stats" ->
      """WITH d AS (SELECT doc_id AS asset_id, 16 + doc_id % 16 AS w,
        |        16 + doc_id % 8 AS h FROM documents),
        |px AS (SELECT asset_id, w, h,
        |        (asset_id * 31 + 7 * i.i * i.i) % 256 AS v
        |      FROM d CROSS JOIN range(744) i(i) WHERE i.i < w * h),
        |a AS (SELECT asset_id, CAST(min(w) AS INT) AS width,
        |        CAST(min(h) AS INT) AS height, count(*) AS n_pixels,
        |        CAST(sum(v) AS BIGINT) AS s,
        |        CAST(sum(v * v) AS BIGINT) AS s2,
        |        CAST(min(v) AS INT) AS min_luma,
        |        CAST(max(v) AS INT) AS max_luma
        |      FROM px GROUP BY 1)
        |SELECT asset_id, width, height, n_pixels,
        |  round((CAST(s AS DOUBLE) / CAST(n_pixels AS DOUBLE)) * 1000000) / 1000000
        |    AS mean_luma,
        |  round(sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n_pixels AS DOUBLE)
        |    - (CAST(s AS DOUBLE) / CAST(n_pixels AS DOUBLE))
        |    * (CAST(s AS DOUBLE) / CAST(n_pixels AS DOUBLE)), 0.0)) * 1000000)
        |    / 1000000 AS std_luma,
        |  min_luma, max_luma
        |FROM a ORDER BY asset_id""".stripMargin,

    // Audio: recompute the synthetic PCM waveform from the closed form
    // and reduce with the same integer sums / one-shot double closed
    // forms the decoder path emits.
    "mm_audio_stats" ->
      """WITH d AS (SELECT doc_id AS asset_id, 64 + doc_id % 64 AS n
        |      FROM documents),
        |sm AS (SELECT asset_id, i.i AS i,
        |        ((asset_id * 37 + 11 * i.i * i.i) % 4096) - 2048 AS s
        |      FROM d CROSS JOIN range(128) i(i) WHERE i.i < n),
        |zc AS (SELECT asset_id,
        |        CAST(sum(CASE WHEN s * lead_s < 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS z
        |      FROM (SELECT asset_id, s, lead(s) OVER (PARTITION BY asset_id
        |              ORDER BY i) AS lead_s FROM sm)
        |      WHERE lead_s IS NOT NULL GROUP BY 1),
        |a AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS n_samples,
        |        CAST(sum(s) AS BIGINT) AS ss,
        |        CAST(sum(s * s) AS BIGINT) AS s2,
        |        CAST(max(abs(s)) AS BIGINT) AS peak
        |      FROM sm GROUP BY 1)
        |SELECT a.asset_id, 8000 AS sample_rate, n_samples,
        |  round((CAST(n_samples AS DOUBLE) * 1000.0 / 8000.0) * 1000000) / 1000000
        |    AS duration_ms,
        |  round(sqrt(CAST(s2 AS DOUBLE) / CAST(n_samples AS DOUBLE))
        |    * 1000000) / 1000000 AS rms,
        |  round((CAST(ss AS DOUBLE) / CAST(n_samples AS DOUBLE)) * 1000000) / 1000000
        |    AS dc_offset,
        |  peak, coalesce(z, CAST(0 AS BIGINT)) AS zero_cross,
        |  round((CAST(coalesce(z, CAST(0 AS BIGINT)) AS DOUBLE)
        |    / greatest(CAST(n_samples AS DOUBLE) - 1.0, 1.0)) * 1000000) / 1000000 AS zcr
        |FROM a LEFT JOIN zc ON zc.asset_id = a.asset_id
        |ORDER BY a.asset_id""".stripMargin,

    // Mirrors syntheticMp4's closed forms, including the two container
    // variants: mvhd version 1 (ids ≡ 0 mod 5) adds 12 bytes (three
    // 64-bit fields replace 32-bit), mdat largesize (ids ≡ 0 mod 7)
    // adds 8 header bytes. Base layout: ftyp 20 + moov 216 + free
    // (8 + id%32) + mdat (8 + id%100) = 252 + residues.
    "mm_video_probe" ->
      """SELECT doc_id AS asset_id,
        |  CAST(252 + doc_id % 32 + doc_id % 100
        |       + CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END
        |       + CASE WHEN doc_id % 7 = 0 THEN 8 ELSE 0 END
        |    AS BIGINT) AS n_bytes,
        |  CAST(4 AS INT) AS n_boxes,
        |  'ftyp,moov,free,mdat' AS boxes,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'isom'
        |       WHEN 1 THEN 'mp41' WHEN 2 THEN 'mp42'
        |       ELSE 'avc1' END AS major_brand,
        |  CAST(doc_id % 512 AS BIGINT) AS minor_version,
        |  CAST(600 * (1 + doc_id % 4) AS BIGINT) AS timescale,
        |  CAST(600 * (1 + doc_id % 4) * (5 + doc_id % 120) AS BIGINT)
        |    AS duration,
        |  round(CAST(5 + doc_id % 120 AS DOUBLE), 6) AS duration_sec,
        |  CAST(160 + 16 * (doc_id % 54) AS INT) AS width,
        |  CAST(120 + 9 * (doc_id % 54) AS INT) AS height,
        |  CAST(doc_id % 100 AS BIGINT) AS mdat_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,

    "merge_upsert" ->
      """SELECT user_id, ts, event_id, value FROM (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "merge_cdc" ->
      """SELECT user_id, ts, event_id, value FROM (
        |  SELECT user_id, ts, event_id, value, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,

    "merge_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER w2 AS valid_to,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version,
        |  CAST(lead(ts) OVER w2 IS NULL AS BIGINT) AS is_current
        |FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
        |        event_type, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |          AS total_value
        |      FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n, total_value,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY window_start
        |        ORDER BY n DESC, event_type) AS rnk FROM c)
        |WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin,

    "stream_sliding" ->
      """SELECT window_start, count(*) AS n FROM (
        |  SELECT date_trunc('minute', ts) - k * (INTERVAL 1 MINUTE) AS window_start
        |  FROM events CROSS JOIN range(5) t(k))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gaps-and-islands formulation of session_window: a session breaks
    // only on a STRICTLY larger-than-gap silence (adjacency merges).
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_dq_audit" ->
      """SELECT * FROM (
        |  SELECT 'nn_orders_custkey' AS "check", count(*) - count(o_custkey) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'nn_orders_orderdate', count(*) - count(o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'nn_events_value', count(*) - count(value) FROM events
        |  UNION ALL
        |  SELECT 'uq_orders_orderkey', CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'uq_lineitem_line', CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'fk_orders_customer', count(*) FROM orders o
        |  WHERE o.o_custkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', count(*) FROM lineitem l
        |  WHERE l.l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |ORDER BY "check"""".stripMargin,

    // Chains the proven stage fragments on the SCRUBBED text; the split
    // hash and cumsum mirror sample_split / text_pack_sharded exactly.
    "pipeline_docs_e2e" ->
      s"""WITH scrub AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(text, '${TextAnalysis.urlPattern}', '<URL>', 'g'),
         |      '${TextAnalysis.emailPattern}', '<EMAIL>', 'g') AS text
         |  FROM documents),
         |tk AS (SELECT doc_id, text,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |       FROM scrub),
         |kept AS (SELECT doc_id, text FROM tk
         |         WHERE len(toks) >= 25
         |           AND CAST(len(list_filter(toks, t -> list_contains($stopwordList, t))) AS DOUBLE)
         |               / len(toks) <= 0.15),
         |ded AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
         |base AS (
         |  SELECT k.doc_id,
         |    CASE WHEN ((k.doc_id % 2147483648) * 2654435761) % 4294967296
         |           < ${Sampling.splitCut(0.1)} THEN 'val'
         |         WHEN ((k.doc_id % 2147483648) * 2654435761) % 4294967296
         |           < ${Sampling.splitCut(0.2)} THEN 'test'
         |         ELSE 'train' END AS shard,
         |    CAST(len(regexp_extract_all(k.text,
         |      '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |  FROM kept k JOIN ded USING (doc_id)),
         |c AS (SELECT doc_id, shard, n_subwords,
         |        sum(n_subwords) OVER (PARTITION BY shard ORDER BY doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM base)
         |SELECT doc_id, shard, n_subwords,
         |  CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |FROM c ORDER BY doc_id""".stripMargin,

    // ML pipeline chain: the docs-pipeline front end (same CTEs), then
    // the NB train/score chain with model stats from the TRAIN shard
    // only and scoring over the TEST shard.
    "pipeline_ml_e2e" ->
      s"""WITH scrub AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(text, '${TextAnalysis.urlPattern}', '<URL>', 'g'),
         |      '${TextAnalysis.emailPattern}', '<EMAIL>', 'g') AS text
         |  FROM documents),
         |tk AS (SELECT doc_id, text,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |       FROM scrub),
         |kept AS (SELECT doc_id, text, toks FROM tk
         |         WHERE len(toks) >= 25
         |           AND CAST(len(list_filter(toks, t -> list_contains($stopwordList, t))) AS DOUBLE)
         |               / len(toks) <= 0.15),
         |ded AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
         |sp AS (SELECT k.doc_id, k.toks, d2.lang,
         |    CASE WHEN ((k.doc_id % 2147483648) * 2654435761) % 4294967296
         |           < ${Sampling.splitCut(0.1)} THEN 'val'
         |         WHEN ((k.doc_id % 2147483648) * 2654435761) % 4294967296
         |           < ${Sampling.splitCut(0.2)} THEN 'test'
         |         ELSE 'train' END AS split
         |  FROM kept k JOIN ded USING (doc_id)
         |  JOIN documents d2 USING (doc_id)),
         |ttr AS (SELECT lang AS y, unnest(toks) AS term FROM sp
         |      WHERE split = 'train'),
         |tte AS (SELECT doc_id, unnest(toks) AS term FROM sp
         |      WHERE split = 'test'),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |      FROM tte GROUP BY 1, 2),
         |ct AS (SELECT y AS l, term, CAST(count(*) AS BIGINT) AS c
         |      FROM ttr GROUP BY 1, 2),
         |ctot AS (SELECT l, CAST(sum(c) AS BIGINT) AS nl FROM ct GROUP BY 1),
         |voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM ct),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM sp
         |      WHERE split = 'train'),
         |pri AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS dl FROM sp
         |      WHERE split = 'train' GROUP BY 1),
         |langs AS (SELECT pri.l, ctot.nl, voc.v,
         |        round(ln(CAST(dl AS DOUBLE) / CAST(nd.nd AS DOUBLE)), 6)
         |          AS lprior
         |      FROM pri CROSS JOIN nd CROSS JOIN voc
         |      JOIN ctot ON ctot.l = pri.l),
         |tll AS (SELECT tf.doc_id, langs.l, langs.lprior,
         |        round(CAST(tf AS DOUBLE) *
         |          ln(CAST(coalesce(ct.c, 0) + 1 AS DOUBLE) /
         |            CAST(langs.nl + langs.v AS DOUBLE)), 6) AS ll
         |      FROM tf CROSS JOIN langs
         |      LEFT JOIN ct ON ct.l = langs.l AND ct.term = tf.term),
         |sc AS (SELECT doc_id, l,
         |        round(CAST(sum(CAST(ll AS DECIMAL(28,6))) AS DOUBLE)
         |          + lprior, 6) AS score
         |      FROM tll GROUP BY doc_id, l, lprior),
         |pred AS (SELECT doc_id, l AS pred FROM (
         |      SELECT doc_id, l, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, l) AS rn FROM sc) WHERE rn = 1)
         |SELECT sp.lang AS label, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN pred = sp.lang THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  round((CAST(sum(CASE WHEN pred = sp.lang THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000) / 1000000
         |    AS recall
         |FROM pred JOIN sp USING (doc_id) GROUP BY 1 ORDER BY 1""".stripMargin,

    // LLM-pretraining pipeline chain: exact connected-component cluster
    // labels (recursive CTE) → cluster representatives → 4-gram
    // decontamination vs src0/src1 (string 4-grams vs 64-bit shingle
    // hashes on the Spark side — the text_decontaminate parity argument)
    // → the mixture plan's closed-form rates and hash-threshold keep →
    // the per-lang packing cumsum. Static wt from range(2,20) mirrors
    // the Spark side's literal weights map, so the Σw denominator is
    // independent of which sources survive the earlier stages.
    "pipeline_llm_e2e" ->
      s"""WITH RECURSIVE $clusterLabelsCte,
         |reps AS (SELECT d.doc_id, d.text, d.source, d.lang
         |         FROM documents d JOIN clusters c USING (doc_id)
         |         WHERE c.cluster_id = d.doc_id),
         |tkall AS (SELECT doc_id, unnest(toks) AS t,
         |            generate_subscripts(toks, 1) AS i
         |          FROM ($docToks) b),
         |sh AS (SELECT DISTINCT a.doc_id,
         |         a.t || ' ' || b.t || ' ' || c.t || ' ' || e.t AS shingle
         |       FROM tkall a
         |       JOIN tkall b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN tkall c ON c.doc_id = a.doc_id AND c.i = a.i + 2
         |       JOIN tkall e ON e.doc_id = a.doc_id AND e.i = a.i + 3),
         |ev AS (SELECT DISTINCT sh.shingle FROM sh
         |       JOIN documents d ON d.doc_id = sh.doc_id
         |       WHERE d.source IN ('src0', 'src1')),
         |contaminated AS (SELECT DISTINCT sh.doc_id FROM sh
         |       JOIN reps r ON r.doc_id = sh.doc_id
         |       WHERE r.source NOT IN ('src0', 'src1')
         |         AND sh.shingle IN (SELECT shingle FROM ev)),
         |train AS (SELECT * FROM reps
         |          WHERE source NOT IN ('src0', 'src1')
         |            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |wt AS (SELECT 'src' || CAST(k AS VARCHAR) AS source,
         |              CAST((k % 4) + 1 AS DOUBLE) AS w
         |       FROM range(2, 20) t(k)),
         |tot AS (SELECT source, CAST(sum(len(list_filter(
         |              string_split(text, ' '), x -> x <> ''))) AS BIGINT)
         |            AS total_tokens
         |        FROM train GROUP BY 1),
         |p AS (SELECT w.source,
         |        CASE WHEN coalesce(total_tokens, 0) > 0
         |          THEN least(1.0, (10000.0 * w.w / (SELECT sum(w) FROM wt))
         |                 / CAST(total_tokens AS DOUBLE))
         |          ELSE 0.0 END AS rate
         |      FROM wt w LEFT JOIN tot ON tot.source = w.source),
         |samp AS (SELECT tr.* FROM train tr JOIN p ON p.source = tr.source
         |         WHERE ((tr.doc_id % 2147483648) * 2654435761) % 4294967296
         |               < CAST(floor(p.rate * 4294967296) AS BIGINT)),
         |pk AS (SELECT doc_id, lang AS shard,
         |         CAST(len(regexp_extract_all(text,
         |           '${TextAnalysis.subwordPattern}')) AS BIGINT) AS n_subwords
         |       FROM samp),
         |c2 AS (SELECT doc_id, shard, n_subwords,
         |         sum(n_subwords) OVER (PARTITION BY shard ORDER BY doc_id
         |                               ROWS UNBOUNDED PRECEDING) AS cum
         |       FROM pk)
         |SELECT doc_id, shard, n_subwords,
         |  CAST(floor((cum - n_subwords) / 400.0) AS BIGINT) AS seq_id
         |FROM c2 ORDER BY doc_id""".stripMargin,

    "ts_resample" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value
        |           FROM events WHERE user_id < 50),
        |hourly AS (SELECT user_id, bucket, count(*) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |           FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |      FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |         FROM b)
        |SELECT g.user_id, g.bucket, coalesce(n, 0) AS n,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS v_ff
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.bucket = h.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,

    // M4 mirror: min/max are plain aggregates; first/last resolve the
    // min_by/max_by (ts, event_id) order via row_number windows. Values
    // pass through with no arithmetic.
    "ts_m4" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    ts, event_id, value
        |  FROM events WHERE user_id < 100),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT user_id, bucket, count(*) AS n,
        |  min(value) AS v_min, max(value) AS v_max,
        |  max(CASE WHEN ra = 1 THEN value END) AS v_first,
        |  max(CASE WHEN rd = 1 THEN value END) AS v_last
        |FROM r GROUP BY 1, 2
        |ORDER BY user_id, bucket""".stripMargin,

    // LTTB mean-anchor variant: integer range bucketing on exact
    // micros-from-min, 6-dp anchor means, the doubled-area expression
    // transcribed operation-for-operation, argmax tie-broken
    // (area DESC, dt ASC, id ASC); endpoint buckets keep first/last.
    "ts_lttb" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts) AS t,
        |        CAST(value AS DOUBLE) AS v, event_id AS id FROM events),
        |bd AS (SELECT k, min(t) AS tmin, max(t) AS tmax FROM e GROUP BY 1),
        |b AS (SELECT e.k, t, t - tmin AS dt, v, id,
        |        CAST(((t - tmin) * 16) // (tmax - tmin + 1) AS INT) AS bucket
        |      FROM e JOIN bd ON bd.k = e.k),
        |an AS (SELECT k, bucket,
        |        round((CAST(sum(dt) AS DOUBLE) / count(*)) * 1000000) / 1000000 AS mt,
        |        round((CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6)))
        |          AS DOUBLE) / count(*)) * 1000000) / 1000000 AS mv
        |      FROM b GROUP BY 1, 2),
        |wa AS (SELECT b.k, b.bucket, b.t, CAST(b.dt AS DOUBLE) AS dtd,
        |        b.v, b.id,
        |        coalesce(l.mt, o.mt) AS lt, coalesce(l.mv, o.mv) AS lv,
        |        coalesce(r.mt, o.mt) AS rt, coalesce(r.mv, o.mv) AS rv
        |      FROM b JOIN an o ON o.k = b.k AND o.bucket = b.bucket
        |      LEFT JOIN an l ON l.k = b.k AND l.bucket = b.bucket - 1
        |      LEFT JOIN an r ON r.k = b.k AND r.bucket = b.bucket + 1),
        |ar AS (SELECT k, bucket, t, dtd, v, id,
        |        round(abs((lt - rt) * (v - rv) - (lt - dtd) * (rv - lv)), 6)
        |          AS area FROM wa),
        |firstb AS (SELECT k, bucket, t, v FROM (
        |      SELECT k, bucket, t, v, row_number() OVER (
        |        PARTITION BY k, bucket ORDER BY dt, id) AS rn
        |      FROM b WHERE bucket = 0) WHERE rn = 1),
        |lastb AS (SELECT k, bucket, t, v FROM (
        |      SELECT k, bucket, t, v, row_number() OVER (
        |        PARTITION BY k, bucket ORDER BY dt DESC, id DESC) AS rn
        |      FROM b WHERE bucket = 15) WHERE rn = 1),
        |midb AS (SELECT k, bucket, t, v FROM (
        |      SELECT k, bucket, t, v, row_number() OVER (
        |        PARTITION BY k, bucket ORDER BY area DESC, dtd, id) AS rn
        |      FROM ar WHERE bucket > 0 AND bucket < 15) WHERE rn = 1)
        |SELECT k AS event_type, bucket, make_timestamp(t) AS ts,
        |  v AS value
        |FROM (SELECT * FROM firstb UNION ALL SELECT * FROM midb
        |      UNION ALL SELECT * FROM lastb)
        |ORDER BY event_type, bucket""".stripMargin,

    // DFT: exact integer hour index ((t−tmin) − remainder, exact
    // division), per-term round(6) on the cos/sin products (libm ulps
    // die in the rounding), DECIMAL sums, one rounded sqrt.
    "ts_dft" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts) AS t,
        |        CAST(value AS DOUBLE) AS v FROM events),
        |bd AS (SELECT k, min(t) AS tmin FROM e GROUP BY 1),
        |hh AS (SELECT e.k,
        |        ((t - tmin) - (t - tmin) % 3600000000) // 3600000000 AS h,
        |        count(*) AS nh,
        |        sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS sv
        |      FROM e JOIN bd ON bd.k = e.k GROUP BY 1, 2),
        |hr AS (SELECT k, h, round((CAST(sv AS DOUBLE) / nh) * 1000000) / 1000000 AS vh FROM hh),
        |n AS (SELECT k, max(h) + 1 AS n FROM hr GROUP BY 1),
        |sp AS (SELECT CAST(harmonic AS BIGINT) AS harmonic
        |      FROM range(1, 5) t(harmonic)),
        |terms AS (SELECT hr.k, sp.harmonic, n.n,
        |        round(vh * cos(2.0 * pi() * CAST(sp.harmonic AS DOUBLE)
        |          * CAST(h AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS ca,
        |        round(vh * sin(2.0 * pi() * CAST(sp.harmonic AS DOUBLE)
        |          * CAST(h AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cb
        |      FROM hr JOIN n ON n.k = hr.k CROSS JOIN sp),
        |agg AS (SELECT k, harmonic, CAST(min(n) AS BIGINT) AS n_hours,
        |        CAST(sum(CAST(ca AS DECIMAL(28,6))) AS DOUBLE) AS a,
        |        CAST(sum(CAST(cb AS DECIMAL(28,6))) AS DOUBLE) AS b
        |      FROM terms GROUP BY 1, 2)
        |SELECT k AS event_type, harmonic, n_hours,
        |  round(sqrt(a * a + b * b) / CAST(n_hours AS DOUBLE) * 1000000)
        |    / 1000000 AS amplitude
        |FROM agg ORDER BY event_type, harmonic""".stripMargin,

    // Spectral entropy over the SAME dft chain: normalized 9-dp powers,
    // per-harmonic -p·ln p terms DECIMAL-summed.
    "ts_spectral_entropy" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts) AS t,
        |        CAST(value AS DOUBLE) AS v FROM events),
        |bd AS (SELECT k, min(t) AS tmin FROM e GROUP BY 1),
        |hh AS (SELECT e.k,
        |        ((t - tmin) - (t - tmin) % 3600000000) // 3600000000 AS h,
        |        count(*) AS nh,
        |        sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS sv
        |      FROM e JOIN bd ON bd.k = e.k GROUP BY 1, 2),
        |hr AS (SELECT k, h, round((CAST(sv AS DOUBLE) / nh) * 1000000) / 1000000 AS vh FROM hh),
        |n AS (SELECT k, max(h) + 1 AS n FROM hr GROUP BY 1),
        |sp AS (SELECT CAST(harmonic AS BIGINT) AS harmonic
        |      FROM range(1, 5) t(harmonic)),
        |terms AS (SELECT hr.k, sp.harmonic, n.n,
        |        round(vh * cos(2.0 * pi() * CAST(sp.harmonic AS DOUBLE)
        |          * CAST(h AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS ca,
        |        round(vh * sin(2.0 * pi() * CAST(sp.harmonic AS DOUBLE)
        |          * CAST(h AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cb
        |      FROM hr JOIN n ON n.k = hr.k CROSS JOIN sp),
        |agg AS (SELECT k, harmonic, CAST(min(n) AS BIGINT) AS n_hours,
        |        CAST(sum(CAST(ca AS DECIMAL(28,6))) AS DOUBLE) AS a,
        |        CAST(sum(CAST(cb AS DECIMAL(28,6))) AS DOUBLE) AS b
        |      FROM terms GROUP BY 1, 2),
        |p2 AS (SELECT k, round((amplitude * amplitude) * 1000000000) / 1000000000 AS p2 FROM (
        |      SELECT k, round(sqrt(a * a + b * b)
        |        / CAST(n_hours AS DOUBLE) * 1000000) / 1000000
        |        AS amplitude FROM agg)),
        |t AS (SELECT k, count(*) AS n_harmonics,
        |        sum(CAST(p2 AS DECIMAL(28,9))) AS tot FROM p2 GROUP BY 1),
        |t2 AS (SELECT p2.k, n_harmonics,
        |        CASE WHEN tot > 0 AND p2 > 0
        |          THEN -(p2 / CAST(tot AS DOUBLE)
        |            * ln(p2 / CAST(tot AS DOUBLE)))
        |          ELSE 0.0 END AS term
        |      FROM p2 JOIN t ON t.k = p2.k),
        |h AS (SELECT k, n_harmonics,
        |        sum(CAST(round(term, 9) AS DECIMAL(28,9))) AS h
        |      FROM t2 GROUP BY 1, 2)
        |SELECT k AS event_type, n_harmonics,
        |  round(CAST(h AS DOUBLE) * 1000000) / 1000000 AS spectral_entropy,
        |  round(CAST(h AS DOUBLE) / ln(CAST(n_harmonics AS DOUBLE)), 6)
        |    AS norm_entropy
        |FROM h ORDER BY event_type""".stripMargin,

    // Permutation entropy: lead-built triples, Bandt–Pompe positional
    // tie ranks, corpus-entropy recipe per key.
    "ts_perm_entropy" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT user_id AS k, v AS v0,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY bucket) - 1 AS BIGINT) AS t
        |      FROM b WHERE v IS NOT NULL),
        |ii AS (SELECT * FROM i WHERE t < 4096),
        |tr AS (SELECT k, v0, lead(v0, 1) OVER w AS v1,
        |        lead(v0, 2) OVER w AS v2
        |      FROM ii WINDOW w AS (PARTITION BY k ORDER BY t)),
        |t3 AS (SELECT * FROM tr WHERE v1 IS NOT NULL AND v2 IS NOT NULL),
        |cd AS (SELECT k,
        |        ((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
        |          + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END)) * 9
        |        + ((CASE WHEN v0 <= v1 THEN 1 ELSE 0 END)
        |          + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END)) * 3
        |        + (CASE WHEN v0 <= v2 THEN 1 ELSE 0 END)
        |        + (CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS code
        |      FROM t3),
        |c AS (SELECT k, code, count(*) AS c FROM cd GROUP BY 1, 2),
        |a AS (SELECT k, CAST(sum(c) AS BIGINT) AS n_triples,
        |        count(*) AS n_patterns,
        |        sum(CAST(round(c * ln(c), 6) AS DECIMAL(18,6))) AS sclogc
        |      FROM c GROUP BY 1)
        |SELECT k AS user_id, n_triples, n_patterns,
        |  round(ln(CAST(n_triples AS DOUBLE))
        |    - CAST(sclogc AS DOUBLE) / n_triples, 6) AS perm_entropy,
        |  round((ln(CAST(n_triples AS DOUBLE))
        |    - CAST(sclogc AS DOUBLE) / n_triples) / ln(6.0), 6)
        |    AS norm_entropy
        |FROM a ORDER BY user_id""".stripMargin,

    // Key entropy: one value-count aggregate per column, the
    // PSI/entropy rounding discipline, columns unioned.
    "dq_key_entropy" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", n, n_distinct,
           |  round((CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)
           |    / 1000000 AS uniq_ratio,
           |  round(h, 6) AS entropy,
           |  round(h / ln(CAST(n_distinct AS DOUBLE)), 6) AS norm_entropy
           |FROM (SELECT CAST(min(n) AS BIGINT) AS n,
           |    CAST(min(nd) AS BIGINT) AS n_distinct,
           |    CAST(sum(CAST(round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)
           |      * ln(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
           |      AS DECIMAL(18,6))) AS DOUBLE) AS h
           |  FROM (SELECT $c AS v, count(*) AS cnt FROM orders GROUP BY 1)
           |  CROSS JOIN (SELECT CAST(sum(cnt) AS BIGINT) AS n,
           |      count(*) AS nd FROM
           |      (SELECT $c AS v, count(*) AS cnt FROM orders GROUP BY 1)))
           |""".stripMargin
      Seq("o_custkey", "o_orderkey", "o_orderstatus").map(one)
        .mkString("", "UNION ALL\n", "ORDER BY \"column\"")
    },

    "ts_gapfill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value
        |           FROM events WHERE user_id < 50),
        |hourly AS (SELECT user_id, bucket, count(*) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |           FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |      FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |         FROM b),
        |j AS (SELECT g.user_id, g.bucket, coalesce(n, 0) AS n, v,
        |        epoch(g.bucket) AS ep,
        |        CASE WHEN v IS NOT NULL THEN epoch(g.bucket) END AS oep
        |      FROM grid g LEFT JOIN hourly h
        |        ON g.user_id = h.user_id AND g.bucket = h.bucket),
        |w AS (SELECT user_id, bucket, n, ep,
        |        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pv,
        |        last_value(oep IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pe,
        |        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        first_value(oep IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
        |      FROM j)
        |SELECT user_id, bucket, n,
        |  CAST(round((CASE WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             WHEN ne = pe THEN pv
        |             ELSE pv + (nv - pv) * (ep - pe) / (ne - pe) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS v_interp
        |FROM w ORDER BY user_id, bucket""".stripMargin,

    // Weights are the operator's 8-dp-quantized β^j ladder (β = 1/2, so
    // every weight and cumulative total is a dyadic rational — exact in
    // DECIMAL and in DOUBLE); the weighted sum stays DECIMAL end-to-end,
    // mirroring TimeSeries.ewma's aggregate, so the single float step is
    // the same division both engines perform on identical operands.
    "ts_ewma" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value
        |           FROM events WHERE user_id < 50),
        |b AS (SELECT user_id, bucket, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM e GROUP BY 1, 2),
        |f AS (SELECT * FROM b WHERE v IS NOT NULL),
        |l AS (SELECT user_id, bucket, n, v,
        |        lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
        |        lag(v, 3) OVER w AS v3, lag(v, 4) OVER w AS v4,
        |        lag(v, 5) OVER w AS v5, lag(v, 6) OVER w AS v6,
        |        lag(v, 7) OVER w AS v7,
        |        count(*) OVER (PARTITION BY user_id ORDER BY bucket
        |          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS m
        |      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY bucket))
        |SELECT user_id, bucket, n, CAST(v AS DOUBLE) AS v,
        |  CAST(round((CAST(
        |      coalesce(CAST(v  * CAST(1.00000000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v1 * CAST(0.50000000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v2 * CAST(0.25000000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v3 * CAST(0.12500000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v4 * CAST(0.06250000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v5 * CAST(0.03125000 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v6 * CAST(0.01562500 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    + coalesce(CAST(v7 * CAST(0.00781250 AS DECIMAL(18,8)) AS DECIMAL(38,14)), 0)
        |    AS DOUBLE)
        |    / CASE m WHEN 1 THEN 1.0 WHEN 2 THEN 1.5 WHEN 3 THEN 1.75
        |             WHEN 4 THEN 1.875 WHEN 5 THEN 1.9375 WHEN 6 THEN 1.96875
        |             WHEN 7 THEN 1.984375 ELSE 1.9921875 END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS ewma
        |FROM l ORDER BY user_id, bucket""".stripMargin,

    "ts_zscore" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value
        |           FROM events WHERE user_id < 50),
        |b AS (SELECT user_id, bucket, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM e GROUP BY 1, 2),
        |w AS (SELECT user_id, bucket, n, CAST(v AS DOUBLE) AS v,
        |        count(*) OVER ww AS nw,
        |        CAST(sum(v) OVER ww AS DOUBLE) AS s1,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) OVER ww AS DOUBLE) AS s2
        |      FROM b WINDOW ww AS (PARTITION BY user_id ORDER BY bucket
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |c AS (SELECT *, (s2 - s1 * s1 / nw) / (nw - 1) AS varr FROM w),
        |d AS (SELECT user_id, bucket, n, v, nw,
        |        sqrt(CASE WHEN nw < 2 THEN NULL
        |                  WHEN varr < 0 THEN 0.0 ELSE varr END) AS std,
        |        s1 / nw AS mean
        |      FROM c),
        |z AS (SELECT user_id, bucket, n, v, nw,
        |        CASE WHEN std > 0 THEN (v - mean) / std END AS z
        |      FROM d)
        |SELECT user_id, bucket, n, v, nw,
        |  CAST(round((z) * 1000000) / 1000000 AS DOUBLE) AS z,
        |  coalesce(abs(z) > 3.0, false) AS is_anomaly
        |FROM z ORDER BY user_id, bucket""".stripMargin,

    "ts_autocorr" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |p AS (SELECT user_id, v,
        |        lag(v, 1) OVER (PARTITION BY user_id ORDER BY bucket) AS y
        |      FROM b),
        |q AS (SELECT * FROM p WHERE y IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n_pairs,
        |        CAST(sum(v) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |        CAST(sum(CAST(v * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
        |      FROM q GROUP BY 1),
        |n AS (SELECT *, CAST(n_pairs AS DOUBLE) AS nd FROM a)
        |SELECT user_id, n_pairs,
        |  CAST(round((
        |    CASE WHEN nd * sxx - sx * sx > 0 AND nd * syy - sy * sy > 0 THEN
        |      (nd * sxy - sx * sy)
        |        / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS autocorr
        |FROM n ORDER BY user_id""".stripMargin,

    // ACF (12-dp DECIMAL-quantized centered products, exact sums) + the
    // unrolled Durbin–Levinson partials; every rounding edge rides the
    // DECIMAL(24,12) cast so .5 boundaries round identically.
    "ts_pacf" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, bucket, v,
        |        count(*) OVER (PARTITION BY user_id) AS nb,
        |        sum(v) OVER (PARTITION BY user_id) AS sv FROM b),
        |c AS (SELECT user_id, bucket,
        |        CAST(round((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / nb
        |         ) * 1000000000) / 1000000000 AS DOUBLE) AS c
        |      FROM m),
        |l AS (SELECT user_id, c,
        |        lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
        |        lag(c, 3) OVER w AS c3
        |      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
        |a AS (SELECT user_id, count(*) AS n_buckets,
        |        CAST(sum(CAST(c * c AS DECIMAL(38,12))) AS DOUBLE) AS s0,
        |        CAST(sum(CAST(c * c1 AS DECIMAL(38,12))) AS DOUBLE) AS s1,
        |        CAST(sum(CAST(c * c2 AS DECIMAL(38,12))) AS DOUBLE) AS s2,
        |        CAST(sum(CAST(c * c3 AS DECIMAL(38,12))) AS DOUBLE) AS s3
        |      FROM l GROUP BY 1),
        |r AS (SELECT user_id, n_buckets,
        |        CAST(round((s1 / nullif(s0, 0e0)) * 1000000000) / 1000000000
        |          AS DOUBLE) AS r1,
        |        CAST(round((s2 / nullif(s0, 0e0)) * 1000000000) / 1000000000
        |          AS DOUBLE) AS r2,
        |        CAST(round((s3 / nullif(s0, 0e0)) * 1000000000) / 1000000000
        |          AS DOUBLE) AS r3 FROM a),
        |d AS (SELECT *, (r2 - r1 * r1) / nullif(1e0 - r1 * r1, 0e0)
        |        AS phi22 FROM r),
        |d2 AS (SELECT *, r1 * (1e0 - phi22) AS phi21 FROM d)
        |SELECT user_id, n_buckets,
        |  CAST(round((r1) * 1000000) / 1000000 AS DOUBLE) AS rho1,
        |  CAST(round((r2) * 1000000) / 1000000 AS DOUBLE) AS rho2,
        |  CAST(round((r3) * 1000000) / 1000000 AS DOUBLE) AS rho3,
        |  CAST(round((r1) * 1000000) / 1000000 AS DOUBLE) AS pacf1,
        |  CAST(round((phi22) * 1000000) / 1000000 AS DOUBLE) AS pacf2,
        |  CAST(round(((r3 - phi21 * r2 - phi22 * r1)
        |    / nullif(1e0 - phi21 * r1 - phi22 * r2, 0e0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS pacf3
        |FROM d2 ORDER BY user_id""".stripMargin,

    // TWA: exact decimal values x exact micro intervals; (us, vq) tie
    // order mirrors the Spark window.
    "ts_twa" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS us,
        |        CAST(value AS DECIMAL(18,6)) AS vq FROM events),
        |l AS (SELECT user_id, vq,
        |        lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, vq)
        |          - us AS dt
        |      FROM r),
        |a AS (SELECT user_id, count(*) AS n_samples,
        |        CAST(sum(dt) AS BIGINT) AS dur_us,
        |        CAST(sum(CAST(vq * dt AS DECIMAL(38,6))) AS DECIMAL(38,6))
        |          AS wsum,
        |        sum(vq) AS vsum
        |      FROM l GROUP BY 1)
        |SELECT user_id, n_samples, coalesce(dur_us, 0) AS duration_us,
        |  CAST(round((CAST(wsum AS DOUBLE)
        |    / nullif(CAST(dur_us AS DOUBLE), 0e0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS twa,
        |  CAST(round((CAST(vsum AS DOUBLE) / n_samples
        |   ) * 1000000) / 1000000 AS DOUBLE) AS mean_simple
        |FROM a ORDER BY user_id""".stripMargin,

    "ts_changepoint" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, bucket,
        |        count(*) OVER wr AS t,
        |        CAST(sum(v) OVER wr AS DOUBLE) AS pre,
        |        count(*) OVER wa AS nk,
        |        CAST(sum(v) OVER wa AS DOUBLE) AS tot
        |      FROM b
        |      WINDOW wr AS (PARTITION BY user_id ORDER BY bucket
        |               ROWS UNBOUNDED PRECEDING),
        |             wa AS (PARTITION BY user_id)),
        |s AS (SELECT user_id, bucket, nk,
        |        abs(pre / t - (tot - pre) / (nk - t))
        |          * sqrt(CAST(t * (nk - t) AS DOUBLE) / nk) AS score,
        |        pre / t AS lm, (tot - pre) / (nk - t) AS rm
        |      FROM r WHERE t < nk),
        |best AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |           ORDER BY score DESC, bucket) AS rk FROM s)
        |SELECT user_id, bucket AS split_bucket, nk AS n_buckets,
        |  CAST(round((score) * 1000000) / 1000000 AS DOUBLE) AS score,
        |  CAST(round((lm) * 1000000) / 1000000 AS DOUBLE) AS left_mean,
        |  CAST(round((rm) * 1000000) / 1000000 AS DOUBLE) AS right_mean
        |FROM best WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "ts_ols" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |f AS (SELECT * FROM b WHERE v IS NOT NULL),
        |i AS (SELECT user_id, v,
        |        CAST(row_number() OVER (PARTITION BY user_id ORDER BY bucket) - 1
        |          AS BIGINT) AS t
        |      FROM f),
        |a AS (SELECT user_id, count(*) AS n_buckets, sum(t) AS st,
        |        CAST(sum(v) AS DOUBLE) AS sv,
        |        CAST(sum(CAST(t * v AS DECIMAL(38,12))) AS DOUBLE) AS stv,
        |        CAST(sum(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)))
        |          AS DECIMAL(38,0)) AS stt,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS svv
        |      FROM i GROUP BY 1),
        |c AS (SELECT user_id, n_buckets, sv, st,
        |        CAST(n_buckets AS DOUBLE) AS nd,
        |        CAST(n_buckets AS DOUBLE) * CAST(stt AS DOUBLE)
        |          - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS dent,
        |        CAST(n_buckets AS DOUBLE) * svv - sv * sv AS denv,
        |        CAST(n_buckets AS DOUBLE) * stv - CAST(st AS DOUBLE) * sv AS cov
        |      FROM a),
        |s AS (SELECT *, CASE WHEN n_buckets >= 2 AND dent > 0
        |                     THEN cov / dent END AS slope FROM c)
        |SELECT user_id, n_buckets,
        |  CAST(round((slope) * 1000000) / 1000000 AS DOUBLE) AS slope,
        |  CAST(round(((sv - slope * CAST(st AS DOUBLE)) / nd
        |   ) * 1000000) / 1000000 AS DOUBLE) AS intercept,
        |  CAST(round((CASE WHEN slope IS NOT NULL AND denv > 0
        |      THEN cov * cov / (dent * denv) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS r2
        |FROM s ORDER BY user_id""".stripMargin,

    // Bollinger: HUGEINT window moments mirror the ×10⁶ DECIMAL(38,0)
    // sums; band arithmetic is the identical double expression; %B via
    // nullif mirrors try_divide (flat window -> exact-0 sd -> NULL).
    "ts_bollinger" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, bucket, v,
        |        CAST(v * 1000000 AS HUGEINT) AS x6 FROM b),
        |ws AS (SELECT user_id, bucket, v,
        |        count(x6) OVER wf AS nw,
        |        sum(x6) OVER wf AS sv6,
        |        sum(x6 * x6) OVER wf AS svv6
        |      FROM r WINDOW wf AS (PARTITION BY user_id ORDER BY bucket
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |c AS (SELECT user_id, bucket, CAST(v AS DOUBLE) AS v, nw,
        |        CAST(sv6 AS DOUBLE) / CAST(nw AS DOUBLE) / 1000000.0 AS ma,
        |        CASE WHEN nw >= 2 THEN
        |          sqrt(CAST(nw * svv6 - sv6 * sv6 AS DOUBLE)
        |            / (CAST(nw AS DOUBLE) * (CAST(nw AS DOUBLE) - 1.0)))
        |            / 1000000.0
        |        END AS sd
        |      FROM ws)
        |SELECT user_id, bucket, v, CAST(nw AS BIGINT) AS n_window,
        |  CAST(round((ma) * 1000000) / 1000000 AS DOUBLE) AS ma,
        |  CAST(round((ma + 2.0 * sd) * 1000000) / 1000000 AS DOUBLE)
        |    AS upper,
        |  CAST(round((ma - 2.0 * sd) * 1000000) / 1000000 AS DOUBLE)
        |    AS lower,
        |  CAST(round(((v - (ma - 2.0 * sd))
        |    / nullif((ma + 2.0 * sd) - (ma - 2.0 * sd), 0.0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS pct_b
        |FROM c ORDER BY user_id, bucket""".stripMargin,

    // Dickey–Fuller: exact HUGEINT moments of (x = v_lag, y = Δv) ×10⁶,
    // n-scaled centered moments as exact integers, one double closed
    // form; greatest(·,0) and nullif mirror the Spark guards.
    "ts_adf" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |p AS (SELECT user_id, v,
        |        lag(v) OVER (PARTITION BY user_id ORDER BY bucket) AS xv
        |      FROM b),
        |q AS (SELECT user_id, CAST(xv * 1000000 AS HUGEINT) AS x,
        |        CAST((v - xv) * 1000000 AS HUGEINT) AS y
        |      FROM p WHERE xv IS NOT NULL AND v IS NOT NULL),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |        sum(x * y) AS sxy, sum(y * y) AS syy
        |      FROM q GROUP BY 1),
        |c AS (SELECT user_id, n,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS cyy FROM m),
        |g AS (SELECT user_id, n, cxx, cxy, cyy,
        |        cxy / nullif(cxx, 0.0) AS gamma FROM c),
        |t AS (SELECT user_id, n, gamma,
        |        CASE WHEN n >= 3 THEN gamma / nullif(sqrt(greatest(
        |          (cyy - gamma * cxy)
        |            / ((CAST(n AS DOUBLE) - 2.0) * cxx), 0.0)), 0.0)
        |        END AS t_raw
        |      FROM g),
        |f AS (SELECT user_id, n AS n_obs,
        |        CAST(round((gamma) * 1000000) / 1000000 AS DOUBLE)
        |          AS gamma,
        |        CAST(round((t_raw) * 1000000) / 1000000 AS DOUBLE)
        |          AS t_stat
        |      FROM t)
        |SELECT user_id, n_obs, gamma, t_stat,
        |  CASE WHEN t_stat IS NOT NULL THEN t_stat < -2.86 END
        |    AS reject_unit_root
        |FROM f ORDER BY user_id""".stripMargin,

    // Theil–Sen: median pairwise slope over ≤ 512 observed buckets, then
    // median residual; interpolated quantiles route DECIMAL(24,12)
    // before the 6-dp round.
    "ts_theil_sen" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT user_id AS k, v,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY bucket) - 1 AS BIGINT) AS t
        |      FROM b WHERE v IS NOT NULL),
        |ii AS (SELECT * FROM i WHERE t < 512),
        |p AS (SELECT a.k,
        |        round(((CAST(b2.v AS DOUBLE) - CAST(a.v AS DOUBLE))
        |          / CAST(b2.t - a.t AS DOUBLE)) * 1000000000) / 1000000000 AS ps
        |      FROM ii a JOIN ii b2 ON a.k = b2.k AND a.t < b2.t),
        |s AS (SELECT k, count(*) AS n_pairs,
        |        quantile_cont(ps, 0.5) AS slope_raw
        |      FROM p GROUP BY 1),
        |rs AS (SELECT i2.k, s.n_pairs, s.slope_raw,
        |        round((CAST(i2.v AS DOUBLE)
        |          - s.slope_raw * CAST(i2.t AS DOUBLE)) * 1000000000)
        |          / 1000000000 AS r
        |      FROM ii i2 JOIN s ON i2.k = s.k),
        |f AS (SELECT k, n_pairs, slope_raw, count(*) AS n_buckets,
        |        quantile_cont(r, 0.5) AS icept_raw
        |      FROM rs GROUP BY 1, 2, 3)
        |SELECT k AS user_id, n_buckets, n_pairs,
        |  CAST(round((slope_raw) * 1000000) / 1000000 AS DOUBLE)
        |    AS slope,
        |  CAST(round((icept_raw) * 1000000) / 1000000 AS DOUBLE)
        |    AS intercept
        |FROM f ORDER BY user_id""".stripMargin,

    // Mann–Kendall: S and the tie term are exact integers over the
    // theil_sen pair CTEs; Var(S) and z are DECIMAL-routed doubles.
    "ts_mann_kendall" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT user_id AS k, v,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY bucket) - 1 AS BIGINT) AS t
        |      FROM b WHERE v IS NOT NULL),
        |ii AS (SELECT * FROM i WHERE t < 512),
        |p AS (SELECT a.k, count(*) AS n_pairs,
        |        CAST(sum(CAST(sign(CAST(b2.v AS DOUBLE)
        |          - CAST(a.v AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
        |      FROM ii a JOIN ii b2 ON a.k = b2.k AND a.t < b2.t
        |      GROUP BY 1),
        |tg AS (SELECT k, v, count(*) AS tj FROM ii GROUP BY 1, 2),
        |tt AS (SELECT k, CAST(sum(tj) AS BIGINT) AS nb,
        |        CAST(sum(tj * (tj - 1) * (2 * tj + 5)) AS BIGINT)
        |          AS tie_term
        |      FROM tg GROUP BY 1),
        |j AS (SELECT p.k, tt.nb, p.n_pairs, p.s_stat,
        |        CAST(tt.nb * (tt.nb - 1) * (2 * tt.nb + 5)
        |          - tt.tie_term AS DOUBLE) / 18.0 AS var_raw
        |      FROM p JOIN tt ON p.k = tt.k)
        |SELECT k AS user_id, nb AS n_buckets, n_pairs, s_stat,
        |  CAST(round((var_raw) * 1000000) / 1000000 AS DOUBLE)
        |    AS var_s,
        |  CAST(round((CASE WHEN var_raw > 0 THEN
        |      CASE WHEN s_stat > 0
        |             THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_raw)
        |           WHEN s_stat < 0
        |             THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_raw)
        |           ELSE 0.0 END
        |    ELSE NULL END) * 1000000) / 1000000 AS DOUBLE) AS z
        |FROM j ORDER BY user_id""".stripMargin,

    // Runs test: the above/below classification compares the exact-6-dp
    // bucket value against the DECIMAL-routed median, so run counts are
    // engine-exact; E[R] and z are fixed-order doubles of exact ints.
    "ts_runs_test" ->
      """WITH b AS (SELECT user_id AS k, date_trunc('hour', ts) AS bucket,
        |        CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
        |          AS DECIMAL(18,6)) AS DOUBLE) AS v
        |      FROM events GROUP BY 1, 2),
        |bb AS (SELECT * FROM b WHERE v IS NOT NULL),
        |m AS (SELECT k, count(*) AS n_buckets,
        |        CAST(round(CAST(quantile_cont(v, 0.5) AS DECIMAL(24,12)),
        |          6) AS DOUBLE) AS med
        |      FROM bb GROUP BY 1),
        |c AS (SELECT bb.k, n_buckets, med, bucket, v > med AS above
        |      FROM bb JOIN m ON bb.k = m.k WHERE v <> med),
        |r AS (SELECT k, n_buckets, med, above,
        |        CASE WHEN lag(above) OVER (PARTITION BY k ORDER BY bucket)
        |            IS NULL OR above <> lag(above)
        |            OVER (PARTITION BY k ORDER BY bucket)
        |          THEN 1 ELSE 0 END AS brk
        |      FROM c),
        |a AS (SELECT k, n_buckets, med,
        |        CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_above,
        |        CAST(sum(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
        |          AS n_below,
        |        CAST(sum(brk) AS BIGINT) AS n_runs
        |      FROM r GROUP BY 1, 2, 3)
        |SELECT k AS user_id, n_buckets, med, n_above, n_below, n_runs,
        |  CAST(round((1.0 + CAST(2 * n_above * n_below AS DOUBLE)
        |      / CAST(n_above + n_below AS DOUBLE)) * 1000000) / 1000000
        |    AS DOUBLE) AS expected_runs,
        |  CAST(round((CASE WHEN n_above + n_below > 1
        |      AND 2 * n_above * n_below > n_above + n_below THEN
        |      (CAST(n_runs AS DOUBLE) - (1.0
        |        + CAST(2 * n_above * n_below AS DOUBLE)
        |          / CAST(n_above + n_below AS DOUBLE)))
        |      / sqrt(CAST(2 * n_above * n_below AS DOUBLE)
        |        * CAST(2 * n_above * n_below - (n_above + n_below)
        |            AS DOUBLE)
        |        / (CAST(n_above + n_below AS DOUBLE)
        |          * CAST(n_above + n_below AS DOUBLE)
        |          * CAST(n_above + n_below - 1 AS DOUBLE)))
        |    ELSE NULL END) * 1000000) / 1000000 AS DOUBLE) AS z
        |FROM a ORDER BY user_id""".stripMargin,

    // Hurst R/S: scaled deviations w·v − Σv keep prefix sums exact in
    // DECIMAL; per-window variance 9-dp-routed before the S > 0 gate;
    // R/S, per-size means and log2 points 6-dp-routed; OLS over exact
    // DECIMAL sums with exact-integer x = log2(w).
    "ts_hurst" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT user_id AS k, v,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY bucket) - 1 AS BIGINT) AS t
        |      FROM b WHERE v IS NOT NULL),
        |ii AS (SELECT * FROM i WHERE t < 512),
        |nb AS (SELECT k, count(*) AS n_buckets FROM ii GROUP BY 1),
        |rep AS (SELECT k, t, v, w,
        |        CAST(floor(CAST(t AS DOUBLE) / CAST(w AS DOUBLE))
        |          AS BIGINT) AS chunk
        |      FROM ii CROSS JOIN (SELECT unnest([4, 8, 16, 32]) AS w)),
        |wc AS (SELECT k, w, chunk, t, v,
        |        count(*) OVER (PARTITION BY k, w, chunk) AS cnt,
        |        sum(v) OVER (PARTITION BY k, w, chunk) AS sv
        |      FROM rep),
        |fc AS (SELECT * FROM wc WHERE cnt = w),
        |dv AS (SELECT k, w, chunk, t, v, sv, w * v - sv AS dev FROM fc),
        |px AS (SELECT k, w, chunk, sv, v,
        |        sum(dev) OVER (PARTITION BY k, w, chunk ORDER BY t) AS pfx
        |      FROM dv),
        |ch AS (SELECT k, w, chunk, sv,
        |        max(pfx) - min(pfx) AS r_scaled,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |          AS svv
        |      FROM px GROUP BY 1, 2, 3, 4),
        |r1 AS (SELECT k, w, r_scaled,
        |        CAST(round((CAST(svv AS DOUBLE) / CAST(w AS DOUBLE)
        |          - (CAST(sv AS DOUBLE) / CAST(w AS DOUBLE))
        |            * (CAST(sv AS DOUBLE) / CAST(w AS DOUBLE))
        |         ) * 1000000000) / 1000000000 AS DOUBLE) AS var9
        |      FROM ch),
        |r2 AS (SELECT k, w,
        |        CAST(round((CAST(r_scaled AS DOUBLE)
        |          / CAST(w AS DOUBLE) / sqrt(var9)
        |         ) * 1000000) / 1000000 AS DECIMAL(18,6)) AS rs6
        |      FROM r1 WHERE var9 > 0),
        |pw AS (SELECT k, w, count(*) AS n_chunks,
        |        CAST(sum(rs6) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |          AS mrs_raw
        |      FROM r2 GROUP BY 1, 2),
        |p2 AS (SELECT k, w, n_chunks,
        |        CAST(round((mrs_raw) * 1000000) / 1000000
        |          AS DECIMAL(18,6)) AS mrs
        |      FROM pw),
        |pt AS (SELECT k, n_chunks,
        |        CASE w WHEN 4 THEN 2.0 WHEN 8 THEN 3.0 WHEN 16 THEN 4.0
        |          WHEN 32 THEN 5.0 WHEN 64 THEN 6.0 END AS x,
        |        CAST(round((ln(CAST(mrs AS DOUBLE)) / ln(2.0)
        |         ) * 1000000) / 1000000 AS DECIMAL(18,6)) AS y
        |      FROM p2 WHERE mrs > 0),
        |o AS (SELECT k, count(*) AS n_sizes,
        |        CAST(sum(n_chunks) AS BIGINT) AS n_windows,
        |        sum(CAST(x AS DECIMAL(18,6))) AS sx,
        |        sum(y) AS sy,
        |        sum(CAST(CAST(x AS DECIMAL(18,6)) * y AS DECIMAL(38,12)))
        |          AS sxy,
        |        sum(CAST(x * x AS DECIMAL(18,6))) AS sxx
        |      FROM pt GROUP BY 1 HAVING count(*) >= 2)
        |SELECT o.k AS user_id, nb.n_buckets, n_sizes, n_windows,
        |  CAST(round(((CAST(n_sizes AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n_sizes AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |   ) * 1000000) / 1000000 AS DOUBLE) AS hurst
        |FROM o JOIN nb ON o.k = nb.k ORDER BY user_id""".stripMargin,

    // Turning points: strict comparisons on exact DECIMAL bucket values
    // (ties break nothing), expectation/z DECIMAL-routed doubles.
    "ts_turning_points" ->
      """WITH b AS (SELECT user_id AS k, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |bb AS (SELECT * FROM b WHERE v IS NOT NULL),
        |t AS (SELECT k, v,
        |        lag(v) OVER (PARTITION BY k ORDER BY bucket) AS pv,
        |        lead(v) OVER (PARTITION BY k ORDER BY bucket) AS nv
        |      FROM bb),
        |a AS (SELECT k, count(*) AS n_buckets,
        |        CAST(sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
        |            AND ((v > pv AND v > nv) OR (v < pv AND v < nv))
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
        |      FROM t GROUP BY 1 HAVING count(*) >= 3)
        |SELECT k AS user_id, n_buckets, n_turning,
        |  CAST(round((2.0 * CAST(n_buckets - 2 AS DOUBLE) / 3.0
        |   ) * 1000000) / 1000000 AS DOUBLE) AS expected,
        |  CAST(round(((CAST(n_turning AS DOUBLE)
        |      - 2.0 * CAST(n_buckets - 2 AS DOUBLE) / 3.0)
        |    / sqrt((16.0 * CAST(n_buckets AS DOUBLE) - 29.0) / 90.0)
        |   ) * 1000000) / 1000000 AS DOUBLE) AS z
        |FROM a ORDER BY user_id""".stripMargin,

    // Granger screen: n-scaled centered moments stay exact 128-bit
    // integers (HUGEINT mirrors Spark's DECIMAL(38,0)); both engines
    // then evaluate the identical double ratio.
    "ts_granger" ->
      """WITH b AS (SELECT event_type AS t,
        |        CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bk,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM events WHERE event_type IN ('purchase', 'click')
        |      GROUP BY 1, 2),
        |span AS (SELECT min(bk) AS lo, max(bk) AS hi FROM b),
        |spine AS (SELECT unnest(generate_series(lo, hi)) AS bk FROM span),
        |grid AS (SELECT spine.bk, CAST(coalesce(a.c, 0) AS BIGINT) AS y,
        |        CAST(coalesce(xx.c, 0) AS BIGINT) AS x
        |      FROM spine
        |      LEFT JOIN b a ON a.t = 'purchase' AND a.bk = spine.bk
        |      LEFT JOIN b xx ON xx.t = 'click' AND xx.bk = spine.bk),
        |l AS (SELECT y, lag(y) OVER (ORDER BY bk) AS u,
        |        lag(x) OVER (ORDER BY bk) AS v FROM grid),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(u AS HUGEINT)) AS su,
        |        sum(CAST(v AS HUGEINT)) AS sv,
        |        sum(CAST(y * y AS HUGEINT)) AS syy,
        |        sum(CAST(u * u AS HUGEINT)) AS suu,
        |        sum(CAST(v * v AS HUGEINT)) AS svv,
        |        sum(CAST(u * y AS HUGEINT)) AS suy,
        |        sum(CAST(v * y AS HUGEINT)) AS svy,
        |        sum(CAST(u * v AS HUGEINT)) AS suv
        |      FROM l WHERE u IS NOT NULL),
        |s AS (SELECT n,
        |        CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS cyy,
        |        CAST(CAST(n AS HUGEINT) * suu - su * su AS DOUBLE) AS cuu,
        |        CAST(CAST(n AS HUGEINT) * svv - sv * sv AS DOUBLE) AS cvv,
        |        CAST(CAST(n AS HUGEINT) * suy - su * sy AS DOUBLE) AS cuy,
        |        CAST(CAST(n AS HUGEINT) * svy - sv * sy AS DOUBLE) AS cvy,
        |        CAST(CAST(n AS HUGEINT) * suv - su * sv AS DOUBLE) AS cuv
        |      FROM m),
        |r AS (SELECT n AS n_lags,
        |        CAST(round(((cuy * cuy) / nullif(cuu * cyy, 0.0)
        |         ) * 1000000) / 1000000 AS DOUBLE) AS r2_ar1,
        |        CAST(round((
        |          ((cuy * cvv - cvy * cuv) * cuy +
        |           (cvy * cuu - cuy * cuv) * cvy)
        |          / nullif((cuu * cvv - cuv * cuv) * cyy, 0.0)
        |         ) * 1000000) / 1000000 AS DOUBLE) AS r2_full
        |      FROM s)
        |SELECT n_lags, r2_ar1, r2_full,
        |  CAST(round((r2_full - r2_ar1) * 1000000) / 1000000
        |    AS DOUBLE) AS r2_gain
        |FROM r""".stripMargin,

    // CUSUM: exact DECIMAL prefix sums, running extrema as nested
    // windows, alarm from 6-dp-rounded excursions vs rounded sigma.
    "ts_cusum" ->
      """WITH b AS (SELECT user_id AS k, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |bb AS (SELECT * FROM b WHERE v IS NOT NULL),
        |st AS (SELECT k, count(*) AS n_buckets,
        |        CAST(sum(v) AS DECIMAL(38,6)) AS sv,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS svv
        |      FROM bb GROUP BY 1),
        |wm AS (SELECT bb.k, bucket, n_buckets, sv, svv,
        |        CAST(round((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE)
        |          / CAST(n_buckets AS DOUBLE)) * 1000000) / 1000000
        |          AS DECIMAL(18,6)) AS dev
        |      FROM bb JOIN st ON st.k = bb.k),
        |p1 AS (SELECT k, n_buckets, sv, svv, bucket,
        |        sum(dev) OVER (PARTITION BY k ORDER BY bucket) AS pfx
        |      FROM wm),
        |p2 AS (SELECT k, n_buckets, sv, svv, pfx,
        |        min(pfx) OVER (PARTITION BY k ORDER BY bucket) AS runmin,
        |        max(pfx) OVER (PARTITION BY k ORDER BY bucket) AS runmax
        |      FROM p1),
        |a AS (SELECT k, n_buckets, sv, svv,
        |        max(CAST(pfx - runmin AS DOUBLE)) AS up,
        |        max(CAST(runmax - pfx AS DOUBLE)) AS down
        |      FROM p2 GROUP BY 1, 2, 3, 4),
        |f AS (SELECT k, n_buckets,
        |        round(up, 6) AS cusum_up, round(down, 6) AS cusum_down,
        |        round(sqrt(greatest(svv / CAST(n_buckets AS DOUBLE)
        |          - (CAST(sv AS DOUBLE) / CAST(n_buckets AS DOUBLE))
        |          * (CAST(sv AS DOUBLE) / CAST(n_buckets AS DOUBLE)),
        |          0.0)) * 1000000) / 1000000 AS sigma
        |      FROM a)
        |SELECT k AS user_id, n_buckets, cusum_up, cusum_down, sigma,
        |  greatest(cusum_up, cusum_down) > 4.0 * sigma AS alarm
        |FROM f ORDER BY user_id""".stripMargin,

    // Motif: lead-assembled length-4 windows over the observed index,
    // non-overlapping pairwise distances, per-key argmin.
    "ts_motif" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |i AS (SELECT user_id AS k, v,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY bucket) - 1 AS BIGINT) AS t
        |      FROM b WHERE v IS NOT NULL),
        |ii AS (SELECT * FROM i WHERE t < 256),
        |sb AS (SELECT k, t, CAST(v AS DOUBLE) AS v0,
        |        CAST(lead(v, 1) OVER w AS DOUBLE) AS v1,
        |        CAST(lead(v, 2) OVER w AS DOUBLE) AS v2,
        |        CAST(lead(v, 3) OVER w AS DOUBLE) AS v3
        |      FROM ii WINDOW w AS (PARTITION BY k ORDER BY t)),
        |s2 AS (SELECT * FROM sb WHERE v1 IS NOT NULL
        |        AND v2 IS NOT NULL AND v3 IS NOT NULL),
        |nw AS (SELECT k, count(*) AS n_windows FROM s2 GROUP BY 1),
        |p AS (SELECT a.k, a.t AS pos_a, b2.t AS pos_b,
        |        round(((a.v0 - b2.v0) * (a.v0 - b2.v0)
        |          + (a.v1 - b2.v1) * (a.v1 - b2.v1)
        |          + (a.v2 - b2.v2) * (a.v2 - b2.v2)
        |          + (a.v3 - b2.v3) * (a.v3 - b2.v3)) * 1000000000)
        |          / 1000000000 AS dist2
        |      FROM s2 a JOIN s2 b2 ON a.k = b2.k AND b2.t >= a.t + 4),
        |r AS (SELECT k, pos_a, pos_b, dist2 FROM p
        |      QUALIFY row_number() OVER (PARTITION BY k
        |        ORDER BY dist2, pos_a, pos_b) = 1)
        |SELECT r.k AS user_id, n_windows, pos_a, pos_b,
        |  round(dist2 * 1000000) / 1000000 AS dist2
        |FROM r JOIN nw ON r.k = nw.k ORDER BY user_id""".stripMargin,

    "ts_xcorr" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, v,
        |        lag(n, 1) OVER (PARTITION BY user_id ORDER BY bucket) AS y
        |      FROM b),
        |q AS (SELECT * FROM l WHERE y IS NOT NULL AND v IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n_pairs,
        |        CAST(sum(v) AS DOUBLE) AS sx, sum(y) AS sy,
        |        CAST(sum(CAST(v * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |        CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |          AS DECIMAL(38,0)) AS syy
        |      FROM q GROUP BY 1),
        |c AS (SELECT user_id, n_pairs,
        |        CAST(n_pairs AS DOUBLE) * sxx - sx * sx AS den1,
        |        CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den2,
        |        CAST(n_pairs AS DOUBLE) * sxy
        |          - sx * CAST(sy AS DOUBLE) AS cov
        |      FROM a)
        |SELECT user_id, n_pairs,
        |  CAST(round((
        |    CASE WHEN den1 > 0 AND den2 > 0
        |         THEN cov / (sqrt(den1) * sqrt(den2)) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS xcorr
        |FROM c ORDER BY user_id""".stripMargin,

    "ts_seasonal" ->
      """WITH per AS (SELECT user_id,
        |        CAST(floor((epoch(ts) % 86400) / 3600) AS BIGINT) AS phase,
        |        CAST(value AS DECIMAL(18,6)) AS x
        |      FROM events WHERE value IS NOT NULL),
        |pp AS (SELECT user_id, phase, count(*) AS np,
        |         CAST(sum(x) AS DECIMAL(38,12)) AS sp,
        |         sum(CAST(x * x AS DECIMAL(38,12))) AS sp2
        |       FROM per GROUP BY 1, 2),
        |pk AS (SELECT user_id, phase AS peak_phase,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY round((CAST(sp AS DOUBLE) / np) * 1000000) / 1000000 DESC, phase ASC) AS rk
        |       FROM pp),
        |a AS (SELECT user_id, CAST(sum(np) AS BIGINT) AS n_rows,
        |        count(*) AS n_phases,
        |        CAST(sum(sp) AS DOUBLE) AS s, CAST(sum(sp2) AS DOUBLE) AS s2,
        |        CAST(sum(CAST(round((CAST(sp * sp AS DOUBLE) / np) * 1000000) / 1000000
        |          AS DECIMAL(38,6))) AS DOUBLE) AS ssb_raw
        |      FROM pp GROUP BY 1),
        |c AS (SELECT user_id, n_rows, n_phases,
        |        s2 - s * s / n_rows AS sst,
        |        ssb_raw - s * s / n_rows AS ssb
        |      FROM a)
        |SELECT c.user_id, c.n_rows, c.n_phases, pk.peak_phase,
        |  CAST(round((
        |    CASE WHEN sst > 0 THEN greatest(least(ssb / sst, 1.0), 0.0) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS strength
        |FROM c JOIN pk ON c.user_id = pk.user_id AND pk.rk = 1
        |ORDER BY c.user_id""".stripMargin,

    "ts_sax" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM events GROUP BY 1, 2),
        |f AS (SELECT * FROM b WHERE v IS NOT NULL),
        |m AS (SELECT user_id, count(*) AS nk, CAST(sum(v) AS DOUBLE) AS s1,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS s2
        |      FROM f GROUP BY 1),
        |st AS (SELECT user_id, nk, s1 / nk AS mu,
        |         CASE WHEN nk >= 2 AND (s2 - s1 * s1 / nk) / (nk - 1) > 0
        |              THEN sqrt((s2 - s1 * s1 / nk) / (nk - 1)) END AS sigma
        |       FROM m),
        |z AS (SELECT f.user_id, st.nk,
        |        CAST(row_number() OVER (PARTITION BY f.user_id ORDER BY bucket) - 1
        |          AS BIGINT) AS i,
        |        CAST(round(((CAST(v AS DOUBLE) - mu) / sigma
        |         ) * 1000000) / 1000000 AS DECIMAL(18,6)) AS zz
        |      FROM f JOIN st ON f.user_id = st.user_id
        |      WHERE sigma IS NOT NULL),
        |sg AS (SELECT user_id, max(nk) AS nk,
        |         CAST(floor(i * 8 / nk) AS BIGINT) AS seg,
        |         count(*) AS ns, CAST(sum(zz) AS DOUBLE) AS sz
        |       FROM z GROUP BY user_id, CAST(floor(i * 8 / nk) AS BIGINT)),
        |le AS (SELECT user_id, nk, seg,
        |         CASE WHEN sz / ns < -0.6745 THEN 'a' WHEN sz / ns < 0 THEN 'b'
        |              WHEN sz / ns < 0.6745 THEN 'c' ELSE 'd' END AS letter
        |       FROM sg)
        |SELECT user_id, max(nk) AS n_buckets,
        |  string_agg(letter, '' ORDER BY seg) AS sax
        |FROM le GROUP BY user_id ORDER BY user_id""".stripMargin,

    // One CTE chain replaying the full pipeline: the ts_gapfill fill
    // stage verbatim, then the ts_seasonal and ts_sax stages consuming
    // the FILLED series (phase from the grid bucket, x from v_interp).
    "ts_pipeline_e2e" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, value
        |           FROM events WHERE user_id < 50),
        |hourly AS (SELECT user_id, bucket, count(*) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |           FROM e GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |           FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |         FROM bounds),
        |j AS (SELECT g.user_id, g.bucket, v,
        |        epoch(g.bucket) AS ep,
        |        CASE WHEN v IS NOT NULL THEN epoch(g.bucket) END AS oep
        |      FROM grid g LEFT JOIN hourly h
        |        ON g.user_id = h.user_id AND g.bucket = h.bucket),
        |w AS (SELECT user_id, bucket, ep,
        |        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pv,
        |        last_value(oep IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pe,
        |        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        first_value(oep IGNORE NULLS) OVER (PARTITION BY user_id
        |          ORDER BY bucket
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ne
        |      FROM j),
        |filled AS (SELECT user_id, bucket,
        |  CAST(round((CASE WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             WHEN ne = pe THEN pv
        |             ELSE pv + (nv - pv) * (ep - pe) / (ne - pe) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS v_interp
        |  FROM w),
        |per AS (SELECT user_id,
        |        CAST(floor((epoch(bucket) % 86400) / 3600) AS BIGINT) AS phase,
        |        CAST(v_interp AS DECIMAL(18,6)) AS x
        |      FROM filled WHERE v_interp IS NOT NULL),
        |pp AS (SELECT user_id, phase, count(*) AS np,
        |         CAST(sum(x) AS DECIMAL(38,12)) AS sp,
        |         sum(CAST(x * x AS DECIMAL(38,12))) AS sp2
        |       FROM per GROUP BY 1, 2),
        |pk AS (SELECT user_id, phase AS peak_phase,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY round((CAST(sp AS DOUBLE) / np) * 1000000) / 1000000 DESC, phase ASC) AS rk
        |       FROM pp),
        |a AS (SELECT user_id, CAST(sum(np) AS BIGINT) AS n_rows,
        |        count(*) AS n_phases,
        |        CAST(sum(sp) AS DOUBLE) AS s, CAST(sum(sp2) AS DOUBLE) AS s2,
        |        CAST(sum(CAST(round((CAST(sp * sp AS DOUBLE) / np) * 1000000) / 1000000
        |          AS DECIMAL(38,6))) AS DOUBLE) AS ssb_raw
        |      FROM pp GROUP BY 1),
        |c AS (SELECT user_id, n_rows, n_phases,
        |        s2 - s * s / n_rows AS sst,
        |        ssb_raw - s * s / n_rows AS ssb
        |      FROM a),
        |seas AS (SELECT c.user_id, c.n_rows, c.n_phases, pk.peak_phase,
        |  CAST(round((
        |    CASE WHEN sst > 0 THEN greatest(least(ssb / sst, 1.0), 0.0) END
        |   ) * 1000000) / 1000000 AS DOUBLE) AS strength
        |  FROM c JOIN pk ON c.user_id = pk.user_id AND pk.rk = 1),
        |sb AS (SELECT user_id, bucket,
        |        CAST(sum(CAST(v_interp AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |      FROM filled GROUP BY 1, 2),
        |f AS (SELECT * FROM sb WHERE v IS NOT NULL),
        |m AS (SELECT user_id, count(*) AS nk, CAST(sum(v) AS DOUBLE) AS s1,
        |        CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS s2
        |      FROM f GROUP BY 1),
        |st AS (SELECT user_id, nk, s1 / nk AS mu,
        |         CASE WHEN nk >= 2 AND (s2 - s1 * s1 / nk) / (nk - 1) > 0
        |              THEN sqrt((s2 - s1 * s1 / nk) / (nk - 1)) END AS sigma
        |       FROM m),
        |z AS (SELECT f.user_id, st.nk,
        |        CAST(row_number() OVER (PARTITION BY f.user_id ORDER BY bucket) - 1
        |          AS BIGINT) AS i,
        |        CAST(round(((CAST(v AS DOUBLE) - mu) / sigma
        |         ) * 1000000) / 1000000 AS DECIMAL(18,6)) AS zz
        |      FROM f JOIN st ON f.user_id = st.user_id
        |      WHERE sigma IS NOT NULL),
        |sg AS (SELECT user_id, max(nk) AS nk,
        |         CAST(floor(i * 8 / nk) AS BIGINT) AS seg,
        |         count(*) AS ns, CAST(sum(zz) AS DOUBLE) AS sz
        |       FROM z GROUP BY user_id, CAST(floor(i * 8 / nk) AS BIGINT)),
        |le AS (SELECT user_id, nk, seg,
        |         CASE WHEN sz / ns < -0.6745 THEN 'a' WHEN sz / ns < 0 THEN 'b'
        |              WHEN sz / ns < 0.6745 THEN 'c' ELSE 'd' END AS letter
        |       FROM sg),
        |shapes AS (SELECT user_id, max(nk) AS n_buckets,
        |         string_agg(letter, '' ORDER BY seg) AS sax
        |       FROM le GROUP BY user_id)
        |SELECT seas.user_id, seas.n_rows, seas.n_phases, seas.peak_phase,
        |  seas.strength, shapes.n_buckets, shapes.sax
        |FROM seas JOIN shapes ON seas.user_id = shapes.user_id
        |ORDER BY seas.user_id""".stripMargin,

    "stream_interval_join" ->
      """SELECT l.user_id, l.event_id AS click_id, r.event_id AS view_id
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |  AND l.event_type = 'click' AND r.event_type = 'view'
        |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
        |ORDER BY l.user_id, click_id, view_id""".stripMargin,

    // The state fold is (ts, value, type)-ordered, so last_type is the
    // event_type of the (ts, v, type)-max row; the quantized sum is
    // order-independent (exact integer-valued doubles).
    "stream_profiles" ->
      """WITH e AS (
        |  SELECT user_id, event_type, floor(value * 10000) AS v, ts FROM events),
        |agg AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(v) AS DOUBLE) AS total_value
        |  FROM e GROUP BY user_id),
        |last AS (
        |  SELECT user_id, event_type AS last_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts DESC, v DESC, event_type DESC) AS rn
        |    FROM e) WHERE rn = 1)
        |SELECT a.user_id, a.n_events, a.total_value, l.last_type
        |FROM agg a JOIN last l USING (user_id)
        |ORDER BY a.user_id""".stripMargin,

    // Batch semantics of the gap sessionizer: one whole-input session per
    // key — epoch-millis first/last (both engines truncate micros toward
    // zero on the positive-epoch data) and the event count.
    "stream_closed_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        |  min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- round 7 ----

    // Same quantile definition on both sides (R-7 linear interpolation:
    // Spark `percentile` ≡ DuckDB `quantile_cont`); the boundary
    // comparisons are stable because the metrics are integer/2-dp valued
    // (see Analytics.rfm).
    "ana_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey AS custkey,
        |    date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1999-12-31') AS recency_days,
        |    count(*) AS frequency,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |b AS (SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |        quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |        quantile_cont(CAST(monetary AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS mb
        |      FROM base)
        |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days, frequency,
        |  CAST(monetary AS DOUBLE) AS monetary,
        |  CAST(1 + len(list_filter(rb, x -> CAST(recency_days AS DOUBLE) > x)) AS BIGINT) AS r_score,
        |  CAST(1 + len(list_filter(fb, x -> CAST(frequency AS DOUBLE) < x)) AS BIGINT) AS f_score,
        |  CAST(1 + len(list_filter(mb, x -> CAST(monetary AS DOUBLE) < x)) AS BIGINT) AS m_score
        |FROM base CROSS JOIN b ORDER BY custkey""".stripMargin,

    "ana_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |        row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |      FROM days)
        |SELECT user_id, min(day) AS island_start, max(day) AS island_end,
        |  count(*) AS n_days
        |FROM r GROUP BY user_id, day - CAST(rn AS INT)
        |ORDER BY user_id, island_start""".stripMargin,

    "ana_basket" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |            FROM lineitem),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM it),
        |f AS (SELECT i, count(*) AS c FROM it GROUP BY 1),
        |p AS (SELECT l.i AS i1, r.i AS i2, count(*) AS c12
        |      FROM it l JOIN it r ON l.b = r.b AND l.i < r.i
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.i1, p.i2, p.c12, f1.c AS c1, f2.c AS c2,
        |  round((CAST(p.c12 AS DOUBLE) / n_baskets) * 1000000) / 1000000 AS support,
        |  round((CAST(p.c12 AS DOUBLE) / f1.c) * 1000000) / 1000000 AS confidence,
        |  round((CAST(p.c12 AS DOUBLE) * n_baskets / (f1.c * f2.c)) * 1000000) / 1000000 AS lift
        |FROM p
        |JOIN f f1 ON f1.i = p.i1
        |JOIN f f2 ON f2.i = p.i2
        |CROSS JOIN nb
        |ORDER BY lift DESC, i1, i2 LIMIT 50""".stripMargin,

    "ana_basket_capped" ->
      """WITH it0 AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |             FROM lineitem),
        |keep AS (SELECT b FROM it0 GROUP BY b HAVING count(*) <= 5),
        |it AS (SELECT it0.b, it0.i FROM it0 JOIN keep USING (b)),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM it),
        |f AS (SELECT i, count(*) AS c FROM it GROUP BY 1),
        |p AS (SELECT l.i AS i1, r.i AS i2, count(*) AS c12
        |      FROM it l JOIN it r ON l.b = r.b AND l.i < r.i
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.i1, p.i2, p.c12, f1.c AS c1, f2.c AS c2,
        |  round((CAST(p.c12 AS DOUBLE) / n_baskets) * 1000000) / 1000000 AS support,
        |  round((CAST(p.c12 AS DOUBLE) / f1.c) * 1000000) / 1000000 AS confidence,
        |  round((CAST(p.c12 AS DOUBLE) * n_baskets / (f1.c * f2.c)) * 1000000) / 1000000 AS lift
        |FROM p
        |JOIN f f1 ON f1.i = p.i1
        |JOIN f f2 ON f2.i = p.i2
        |CROSS JOIN nb
        |ORDER BY lift DESC, i1, i2 LIMIT 50""".stripMargin,

    "ana_winsorize" ->
      """WITH b AS (SELECT quantile_cont(value, 0.01) AS lo,
        |        quantile_cont(value, 0.99) AS hi FROM events)
        |SELECT event_id, value,
        |  round(least(greatest(value, lo), hi), 6) AS clipped,
        |  (value < lo OR value > hi) AS was_clipped
        |FROM events CROSS JOIN b ORDER BY event_id""".stripMargin,

    "ana_group_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Two-pass moments from exact DECIMAL sums (mean from Σv, variance
    // from Σround(dev², 6)) — order-free in both engines; z in double.
    "ana_outliers" ->
      """WITH m AS (SELECT event_type, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |          AS mean
        |      FROM events GROUP BY 1),
        |s AS (SELECT e.event_type, any_value(m.n) AS n,
        |        any_value(m.mean) AS mean,
        |        sum(CAST(round((e.value - m.mean) * (e.value - m.mean), 6)
        |          AS DECIMAL(18,6))) AS ss
        |      FROM events e JOIN m USING (event_type) GROUP BY 1),
        |st AS (SELECT event_type, mean,
        |        sqrt(CAST(ss AS DOUBLE) / (n - 1)) AS sd FROM s)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(st.mean, 6) AS group_mean, round(st.sd, 6) AS group_sd,
        |  round(((e.value - st.mean) / st.sd) * 1000000) / 1000000 AS zscore
        |FROM events e JOIN st USING (event_type)
        |WHERE abs((e.value - st.mean) / st.sd) > 2.0
        |ORDER BY e.event_id""".stripMargin,

    // MAD boundaries quantized to 6 dp BEFORE the division on both
    // engines (quantile_cont ≡ percentile at 6 dp — ana_group_quantiles
    // precedent); membership compares the ROUNDED score; MAD-0 groups
    // score NULL and never flag.
    "ana_outliers_mad" ->
      """WITH med AS (SELECT event_type,
        |        round(quantile_cont(value, 0.5) * 1000000) / 1000000 AS med
        |      FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type, any_value(m.med) AS med,
        |        round(quantile_cont(abs(e.value - m.med), 0.5) * 1000000) / 1000000 AS mad
        |      FROM events e JOIN med m USING (event_type)
        |      GROUP BY e.event_type),
        |s AS (SELECT e.event_id, e.event_type, e.value,
        |        m.med AS group_median, m.mad AS group_mad,
        |        round((CASE WHEN m.mad = 0 THEN NULL
        |          ELSE abs(e.value - m.med) / m.mad END) * 1000000)
        |          / 1000000 AS mad_score
        |      FROM events e JOIN mad m USING (event_type))
        |SELECT * FROM s WHERE mad_score > 3.0
        |ORDER BY event_id""".stripMargin,

    // The oracle recomputes the aggregate one-shot over the whole table;
    // the Spark side merges two partial DECIMAL states — the hash match
    // proves incremental maintenance == full recompute.
    "op_incr_agg" ->
      """SELECT o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(o_totalprice) AS cnt,
        |  round((CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(o_totalprice)) * 1000000) / 1000000 AS mean
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_table_diff" ->
      """WITH src AS (SELECT * FROM orders WHERE o_orderkey < 7000),
        |o AS (SELECT * FROM src WHERE o_orderkey % 7 <> 3),
        |n AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
        |             ELSE o_totalprice END AS o_totalprice,
        |        o_orderdate,
        |        CASE WHEN o_orderkey % 10 = 0 THEN 'RUSH'
        |             ELSE o_orderpriority END AS o_orderpriority
        |      FROM src WHERE o_orderkey % 11 <> 4)
        |SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN NULL
        |       ELSE array_to_string(list_filter([
        |         CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey THEN 'o_custkey' END,
        |         CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate THEN 'o_orderdate' END,
        |         CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END,
        |         CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
        |         CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END
        |       ], x -> x IS NOT NULL), ',') END AS changed_cols
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |   OR o.o_custkey IS DISTINCT FROM n.o_custkey
        |   OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
        |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,

    // Trigram-collision decontamination: string trigrams here vs 64-bit
    // shingle hashes on the Spark side — identical distinct-counts modulo
    // ~N²/2⁶⁵ hash collisions (same argument as the dedup family).
    "text_decontaminate" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |ev AS (SELECT DISTINCT sh.shingle FROM sh
         |       JOIN documents d ON d.doc_id = sh.doc_id
         |       WHERE d.source IN ('src0', 'src1')),
         |tr AS (SELECT sh.doc_id, sh.shingle FROM sh
         |       JOIN documents d ON d.doc_id = sh.doc_id
         |       WHERE d.source NOT IN ('src0', 'src1'))
         |SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n_shared_ngrams
         |FROM tr JOIN ev ON tr.shingle = ev.shingle
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Exponential clocks -ln(u)/w on the shared ANSI hash; only the
    // selected ROWS surface (integer columns), the IEEE clock values stay
    // internal to the ranking on both engines.
    "sample_weighted" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars,
        |    -ln((((doc_id % 2147483648) * 2654435761) % 4294967296 + 1)
        |        / CAST(4294967296.0 AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS clock
        |  FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, source, n_chars FROM u ORDER BY clock, doc_id LIMIT 60)
        |SELECT doc_id, source, n_chars FROM k ORDER BY doc_id""".stripMargin,

    // Priority = w / u with the same Knuth-hash uniform as
    // sample_weighted; τ = min over the top-61 frame (0 when the
    // population is smaller), ŵ = max(w, τ).
    "sample_priority" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(n_chars AS DOUBLE) /
        |      ((((doc_id % 2147483648) * 2654435761) % 4294967296 + 1)
        |        / CAST(4294967296.0 AS DOUBLE)) AS priority
        |  FROM documents WHERE n_chars > 0),
        |t AS (SELECT * FROM u ORDER BY priority DESC, doc_id LIMIT 61),
        |tau AS (SELECT CASE WHEN count(*) > 60 THEN min(priority)
        |          ELSE 0.0 END AS tau FROM t),
        |s AS (SELECT * FROM t ORDER BY priority DESC, doc_id LIMIT 60)
        |SELECT doc_id, source, n_chars, round(priority, 6) AS priority,
        |  round(greatest(CAST(n_chars AS DOUBLE), tau), 6) AS w_hat
        |FROM s CROSS JOIN tau ORDER BY doc_id""".stripMargin,

    "sample_priority_total" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    CAST(n_chars AS DOUBLE) /
        |      ((((doc_id % 2147483648) * 2654435761) % 4294967296 + 1)
        |        / CAST(4294967296.0 AS DOUBLE)) AS priority
        |  FROM documents WHERE n_chars > 0),
        |t AS (SELECT * FROM u ORDER BY priority DESC, doc_id LIMIT 61),
        |tau AS (SELECT CASE WHEN count(*) > 60 THEN min(priority)
        |          ELSE 0.0 END AS tau FROM t),
        |s AS (SELECT doc_id, n_chars FROM t ORDER BY priority DESC, doc_id
        |      LIMIT 60),
        |est AS (SELECT sum(CAST(round(greatest(CAST(n_chars AS DOUBLE),
        |          tau), 6) AS DECIMAL(28,6))) AS est_total
        |      FROM s CROSS JOIN tau),
        |tr AS (SELECT sum(CAST(n_chars AS DECIMAL(28,6))) AS true_total
        |      FROM documents WHERE n_chars > 0)
        |SELECT CAST(60 AS INT) AS k,
        |  CAST(round(est_total, 6) AS DOUBLE) AS est_total,
        |  CAST(round(true_total, 6) AS DOUBLE) AS true_total,
        |  round((CAST(est_total - true_total AS DOUBLE)
        |    / CAST(true_total AS DOUBLE)) * 1000000) / 1000000 AS rel_error
        |FROM est CROSS JOIN tr""".stripMargin,

    // Poisson bootstrap: per-(row, rep) Poisson(1) weight from the exact
    // integer CDF thresholds at the Knuth hash of (id, rep); resample
    // means DECIMAL-routed, interpolated quantiles via DECIMAL(24,12).
    "sample_bootstrap_ci" ->
      """WITH base AS (SELECT event_type AS g, event_id AS id,
        |        CAST(round(value, 6) AS DECIMAL(18,6)) AS v FROM events),
        |r AS (SELECT g, id, v, rep FROM base CROSS JOIN range(50) t(rep)),
        |h AS (SELECT g, rep, v,
        |        ((((id % 2147483648) * 31 + rep * 2654435761)
        |          % 2147483648) * 2654435761) % 4294967296 AS hh FROM r),
        |w AS (SELECT g, rep, v,
        |        CASE WHEN hh < 1580030168 THEN 0
        |             WHEN hh < 3160060337 THEN 1
        |             WHEN hh < 3950075421 THEN 2
        |             WHEN hh < 4213413783 THEN 3
        |             WHEN hh < 4279248373 THEN 4 ELSE 5 END AS w FROM h),
        |m AS (SELECT g, rep, CAST(sum(w) AS BIGINT) AS sw,
        |        CAST(sum(v * w) AS DECIMAL(38,6)) AS swv
        |      FROM w GROUP BY 1, 2),
        |mm AS (SELECT g,
        |        round((CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE)) * 1000000000) / 1000000000 AS m
        |      FROM m WHERE sw > 0),
        |ci AS (SELECT g, count(*) AS n_resamples,
        |        quantile_cont(m, 0.025) AS qlo,
        |        quantile_cont(m, 0.5) AS qmed,
        |        quantile_cont(m, 0.975) AS qhi
        |      FROM mm GROUP BY 1),
        |pt AS (SELECT g, count(*) AS n_rows,
        |        CAST(sum(v) AS DECIMAL(38,6)) AS sv FROM base GROUP BY 1)
        |SELECT pt.g AS event_type, n_rows, n_resamples,
        |  round((CAST(sv AS DOUBLE) / CAST(n_rows AS DOUBLE)) * 1000000) / 1000000 AS mean,
        |  CAST(round((qlo) * 1000000) / 1000000 AS DOUBLE) AS ci_lo,
        |  CAST(round((qmed) * 1000000) / 1000000 AS DOUBLE)
        |    AS ci_median,
        |  CAST(round((qhi) * 1000000) / 1000000 AS DOUBLE) AS ci_hi
        |FROM pt JOIN ci ON pt.g = ci.g
        |ORDER BY event_type""".stripMargin,

    // k-fold: Knuth-hash fold assignment, per-(fold, label) cells with
    // within-fold shares.
    "sample_kfold" ->
      """WITH f AS (SELECT
        |        ((doc_id % 2147483648) * 2654435761) % 4294967296 % 5
        |          AS fold,
        |        lang AS label FROM documents),
        |c AS (SELECT fold, label, count(*) AS n FROM f GROUP BY 1, 2),
        |t AS (SELECT fold, CAST(sum(n) AS BIGINT) AS fold_total
        |      FROM c GROUP BY 1)
        |SELECT c.fold AS fold, label, n, fold_total,
        |  round((CAST(n AS DOUBLE) / CAST(fold_total AS DOUBLE)) * 1000000) / 1000000
        |    AS frac_in_fold
        |FROM c JOIN t ON c.fold = t.fold
        |ORDER BY c.fold, label""".stripMargin,

    // int8 quantization (the emb_quantize formula) then exact integer
    // dots against the ±1 sign rows embedded as literals.
    "emb_project" -> {
      val signs = Similarity.projectionSigns(64, 8)
      val sums = (0 until 8).map { j =>
        s"CAST(sum(qi * ([${signs(j).mkString(",")}])[i]) AS BIGINT) AS proj_$j"
      }.mkString(",\n  ")
      s"""WITH e AS ($embCte),
         |s AS (SELECT vec_id, v,
         |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
         |      FROM e),
         |q AS (SELECT vec_id, i,
         |        CAST(floor(v[i] * CAST(127.0 AS DOUBLE) / scale + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qi
         |      FROM s CROSS JOIN range(1, 65) t(i) WHERE scale > 0)
         |SELECT vec_id,
         |  $sums
         |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    // The partitioned roundtrip is content-neutral, so the oracle is the
    // plain dim-filtered join over the source table.
    "op_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
        |         ELSE 'other' END AS type_class
        |  FROM events)
        |SELECT e.event_type, count(*) AS n,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |WHERE dim.type_class = 'engagement'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Batch (doc_id % 5 = 0) vs corpus (the rest): cross-set and in-batch
    // trigram Jaccard >= 0.5 evidence counts, then the verdict CASE.
    "dedup_incremental" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |b AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
         |c AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
         |xc AS (SELECT b.doc_id AS da, c.doc_id AS db, count(*) AS ni
         |       FROM b JOIN c ON b.shingle = c.shingle GROUP BY 1, 2),
         |xcp AS (SELECT da FROM xc
         |        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |        WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |cd AS (SELECT da AS doc_id, count(*) AS n_corpus_dups FROM xcp GROUP BY 1),
         |ib AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
         |       FROM b x JOIN b y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |       GROUP BY 1, 2),
         |ibp AS (SELECT da, db FROM ib
         |        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |        WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |bd AS (SELECT d, count(*) AS n_batch_dups FROM
         |         (SELECT da AS d FROM ibp UNION ALL SELECT db FROM ibp) u
         |       GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(cd.n_corpus_dups, 0) AS n_corpus_dups,
         |  coalesce(bd.n_batch_dups, 0) AS n_batch_dups,
         |  CASE WHEN coalesce(cd.n_corpus_dups, 0) > 0 THEN 'dup_of_corpus'
         |       WHEN coalesce(bd.n_batch_dups, 0) > 0 THEN 'needs_batch_dedup'
         |       ELSE 'admitted' END AS verdict
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN cd ON cd.doc_id = d.doc_id
         |LEFT JOIN bd ON bd.d = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Two chained admission waves: wave-2's corpus is c0 plus wave-1's
    // ADMITTED docs — the stateful foreachBatch chain, proven exactly.
    "stream_dedup_incr" ->
      s"""WITH base AS ($docToks),
         |toks AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
         |sh AS (SELECT DISTINCT a.doc_id, a.t || ' ' || b.t || ' ' || c.t AS shingle
         |       FROM toks a
         |       JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |       JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |w1 AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
         |w2 AS (SELECT * FROM sh WHERE doc_id % 5 = 1),
         |c0 AS (SELECT * FROM sh WHERE doc_id % 5 >= 2),
         |xc1 AS (SELECT b.doc_id AS da, c.doc_id AS db, count(*) AS ni
         |        FROM w1 b JOIN c0 c ON b.shingle = c.shingle GROUP BY 1, 2),
         |xcp1 AS (SELECT da FROM xc1
         |         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |         WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |cd1 AS (SELECT da AS doc_id, count(*) AS n_corpus_dups FROM xcp1 GROUP BY 1),
         |ib1 AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
         |        FROM w1 x JOIN w1 y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |        GROUP BY 1, 2),
         |ibp1 AS (SELECT da, db FROM ib1
         |         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |         WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |bd1 AS (SELECT d, count(*) AS n_batch_dups FROM
         |          (SELECT da AS d FROM ibp1 UNION ALL SELECT db FROM ibp1) u
         |        GROUP BY 1),
         |v1 AS (SELECT d.doc_id,
         |         coalesce(cd1.n_corpus_dups, 0) AS n_corpus_dups,
         |         coalesce(bd1.n_batch_dups, 0) AS n_batch_dups,
         |         CASE WHEN coalesce(cd1.n_corpus_dups, 0) > 0 THEN 'dup_of_corpus'
         |              WHEN coalesce(bd1.n_batch_dups, 0) > 0 THEN 'needs_batch_dedup'
         |              ELSE 'admitted' END AS verdict
         |       FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |       LEFT JOIN cd1 ON cd1.doc_id = d.doc_id
         |       LEFT JOIN bd1 ON bd1.d = d.doc_id),
         |c1 AS (SELECT * FROM c0 UNION ALL
         |       SELECT * FROM w1
         |       WHERE doc_id IN (SELECT doc_id FROM v1 WHERE verdict = 'admitted')),
         |xc2 AS (SELECT b.doc_id AS da, c.doc_id AS db, count(*) AS ni
         |        FROM w2 b JOIN c1 c ON b.shingle = c.shingle GROUP BY 1, 2),
         |xcp2 AS (SELECT da FROM xc2
         |         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |         WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |cd2 AS (SELECT da AS doc_id, count(*) AS n_corpus_dups FROM xcp2 GROUP BY 1),
         |ib2 AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ni
         |        FROM w2 x JOIN w2 y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |        GROUP BY 1, 2),
         |ibp2 AS (SELECT da, db FROM ib2
         |         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         |         WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5),
         |bd2 AS (SELECT d, count(*) AS n_batch_dups FROM
         |          (SELECT da AS d FROM ibp2 UNION ALL SELECT db FROM ibp2) u
         |        GROUP BY 1),
         |v2 AS (SELECT d.doc_id,
         |         coalesce(cd2.n_corpus_dups, 0) AS n_corpus_dups,
         |         coalesce(bd2.n_batch_dups, 0) AS n_batch_dups,
         |         CASE WHEN coalesce(cd2.n_corpus_dups, 0) > 0 THEN 'dup_of_corpus'
         |              WHEN coalesce(bd2.n_batch_dups, 0) > 0 THEN 'needs_batch_dedup'
         |              ELSE 'admitted' END AS verdict
         |       FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 1) d
         |       LEFT JOIN cd2 ON cd2.doc_id = d.doc_id
         |       LEFT JOIN bd2 ON bd2.d = d.doc_id)
         |SELECT CAST(1 AS BIGINT) AS wave, doc_id, n_corpus_dups, n_batch_dups, verdict FROM v1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT) AS wave, doc_id, n_corpus_dups, n_batch_dups, verdict FROM v2
         |ORDER BY wave, doc_id""".stripMargin,

    // The oracle reads the SOURCE table — content preservation through
    // the 48-file write + compaction rewrite is exactly what's asserted.
    "op_compact" ->
      """WITH h AS (
        |  SELECT coalesce(((doc_id % 2147483647) + 2147483647) % 2147483647,
        |           2147483646) AS p1,
        |    coalesce(((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(length(text)),
        |        i -> ascii(substr(text, CAST(i + 1 AS INT), 1)))),
        |      (acc, c) -> (acc * 131 + c) % 2147483647)
        |      % 2147483647) + 2147483647) % 2147483647, 2147483646) AS p2
        |  FROM documents),
        |m AS (SELECT ((p1 % 2147483647) * 131 + p2) % 2147483647 AS mix FROM h)
        |SELECT count(*) AS n_rows,
        |  CAST(sum(mix) % 2147483647 AS BIGINT) AS checksum
        |FROM m""".stripMargin
  )
}
