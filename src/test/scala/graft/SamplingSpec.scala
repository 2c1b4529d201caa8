package graft

import org.apache.spark.sql.functions.{countDistinct, when}
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 10000L).map(i => (i, s"src${i % 7}")).toDF("id", "src")

  test("deterministicSample: reproducible, near-target rate, partition-independent") {
    val a = Sampling.deterministicSample(rows, "id", 0.1)
    val n = a.count()
    assert(n > 800 && n < 1200, s"rate off: $n/10000")
    val b = Sampling.deterministicSample(rows.repartition(13), "id", 0.1)
    assert(b.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      a.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // monotone: a smaller fraction selects a subset of a larger one
    val small = Sampling.deterministicSample(rows, "id", 0.05)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a.select("id").collect().map(_.getLong(0)).toSet))
  }

  test("samplingHash survives keys past 2^31 (no ANSI overflow)") {
    val big = Seq(Long.MaxValue, 4294967296L, 2147483648L, 0L).toDF("id")
    val out = big.select(graft.operators.Sampling.samplingHash($"id").as("h"))
      .collect().map(_.getLong(0))
    assert(out.forall(h => h >= 0 && h < 4294967296L))
  }

  test("stratifiedQuota: at most quota rows per stratum, deterministic") {
    val q = Sampling.stratifiedQuota(rows, "src", "id", 50)
    val perStratum = q.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.forall(_ == 50L)) // every stratum has >= 50 rows
    assert(perStratum.size == 7)
    val again = Sampling.stratifiedQuota(rows.repartition(11), "src", "id", 50)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      q.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureMixture: quotas ∝ sqrt(n), low-resource sources up-weighted") {
    // sources of 100 and 400 rows: weights 10 and 20 -> quotas 33 and 66
    // of a 100-row budget (vs 20/80 proportional).
    val mix = (0L until 100L).map(i => (i, "small")) ++
      (100L until 500L).map(i => (i, "large"))
    val df = mix.toDF("id", "src")
    val out = Sampling.temperatureMixture(df, "src", "id", 100L)
    val per = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("small" -> 33L, "large" -> 66L))
    // deterministic under repartitioning
    val again = Sampling.temperatureMixture(df.repartition(13), "src", "id", 100L)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // output schema is the input schema (helper columns dropped)
    assert(out.columns.toSeq == Seq("id", "src"))
  }

  test("assignSplit: total, deterministic, roughly proportioned; cluster key co-assigns") {
    val df = (0L until 10000L).toDF("id").withColumn("cluster_id", $"id" % 1000L)
    val out = Sampling.assignSplit(df, "cluster_id", 0.1, 0.1)
    val per = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.keySet == Set("train", "val", "test"))
    assert(per("train") > 7000L && per("val") > 500L && per("test") > 500L)
    assert(per.values.sum == 10000L)
    // every row of a cluster lands in the same split (leak-free property)
    val mixedClusters = out.groupBy("cluster_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(mixedClusters == 0L)
    // deterministic under repartitioning
    val again = Sampling.assignSplit(df.repartition(17), "cluster_id", 0.1, 0.1)
    assert(again.orderBy("id").collect().map(_.getString(2)).toSeq ==
      out.orderBy("id").collect().map(_.getString(2)).toSeq)
  }

  test("weightedSample: exactly k, deterministic, weight-proportional inclusion") {
    // two weight classes: ids 0..499 weight 1, ids 500..999 weight 20
    val df = (0L until 1000L).toDF("id")
      .withColumn("w", when($"id" >= 500L, 20L).otherwise(1L))
    val out = Sampling.weightedSample(df, "id", "w", 100)
    val picked = out.collect().map(_.getLong(0)).toSeq
    assert(picked.length == 100)
    assert(picked.distinct.length == 100, "without replacement")
    // E-S inclusion scales with weight: the heavy class (20x) must dominate
    val heavy = picked.count(_ >= 500L)
    assert(heavy > 80, s"heavy class got $heavy of 100; expected ~ >80")
    // deterministic under repartitioning (hash clocks, not rand())
    val again = Sampling.weightedSample(df.repartition(13), "id", "w", 100)
      .collect().map(_.getLong(0)).toSeq
    assert(again.sorted == picked.sorted)
    // zero/negative weights are excluded, never sampled
    val withZero = df.withColumn("w", when($"id" === 7L, 0L).otherwise($"w"))
    assert(!Sampling.weightedSample(withZero, "id", "w", 1000)
      .collect().map(_.getLong(0)).contains(7L))
  }

  test("curriculumOrder: per-source ranks interleave into a balanced curriculum") {
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.7),
      (4L, "b", 0.8), (5L, "b", 0.6))
      .toDF("doc_id", "source", "score")
    val ranked = Sampling.curriculumOrder(docs, "source", "score", "doc_id")
    val order = ranked.orderBy("rank_in_source", "source").collect()
      .map(_.getLong(0)).toSeq
    // round-robin by rank: best-of-a, best-of-b, 2nd-of-a, 2nd-of-b, ...
    assert(order == Seq(1L, 4L, 3L, 5L, 2L))
    // ranks are dense 1..n within each source
    val aRanks = ranked.filter($"source" === "a").collect()
      .map(_.getAs[Long]("rank_in_source")).sorted.toSeq
    assert(aRanks == Seq(1L, 2L, 3L))
  }

  test("mixtureRates: largest exactly-proportioned sample, no oversampling") {
    // avail a=100, b=30, c=100 with weights .5/.3/.2 -> T bound by b:
    // T = min(200, 100, 500) = 100 -> take 50/30/20
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (1 to 30).map(i => (1000L + i, "b")) ++
      (1 to 100).map(i => (2000L + i, "c"))).toDF("id", "source")
    val out = Sampling.mixtureRates(df, "source",
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("a", 100L, 50L, 0.5), ("b", 30L, 30L, 1.0), ("c", 100L, 20L, 0.2)))
  }

  test("temperatureShares: sqrt smoothing boosts the tail, damps the head") {
    // a: 400 docs, b: 100, c: 4. alpha=0.5 -> w = 20, 10, 2; Σw = 32.
    // raw 400/504, 100/504, 4/504; temp 0.625, 0.3125, 0.0625.
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1 to 100).map(i => (1000L + i, "b")) ++
      (1 to 4).map(i => (2000L + i, "c"))).toDF("id", "source")
    val out = Sampling.temperatureShares(df, 0.5, "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.map(t => (t._1, t._2, t._4)).toSeq == Seq(
      ("a", 400L, 0.625), ("b", 100L, 0.3125), ("c", 4L, 0.0625)))
    // head damped (boost < 1), tail boosted (boost > 1), 6-dp shares sum to 1
    val byS = out.map(t => t._1 -> t).toMap
    assert(byS("a")._5 < 1.0 && byS("c")._5 > 1.0)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5)
  }

  test("bootstrapCI: constant series collapses the CI; CI brackets the mean") {
    // constant group: every resample mean IS the constant
    val const = (1L to 40L).map(i => ("c", i, 7.5)).toDF("g", "id", "v")
    val r = Sampling.bootstrapCI(const, "g", "id", "v", reps = 20)
      .collect().head
    assert(r.getLong(1) == 40L && r.getLong(2) == 20L)
    assert(r.getDouble(3) == 7.5 && r.getDouble(4) == 7.5 &&
      r.getDouble(5) == 7.5 && r.getDouble(6) == 7.5)
    // varied group: point mean exact, CI ordered around it, deterministic
    val varied = (1L to 200L).map(i => ("v", i, (i % 10).toDouble))
      .toDF("g", "id", "v")
    val a = Sampling.bootstrapCI(varied, "g", "id", "v").collect().head
    assert(a.getDouble(3) == 4.5) // exact mean of 0..9 cycle
    assert(a.getDouble(4) <= a.getDouble(5) && a.getDouble(5) <= a.getDouble(6))
    assert(a.getDouble(4) < 4.5 && a.getDouble(6) > 4.5)
    val b = Sampling.bootstrapCI(varied, "g", "id", "v").collect().head
    assert(a == b) // hash-driven resamples: bit-identical across runs
  }

  test("bootstrapCI: Poisson(1) weights average ~1 across (row, rep) draws") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 2000L).map(i => ("g", i, 1.0)).toDF("g", "id", "v")
    // weight w=k means row i appears k times in the resample; with the
    // exact CDF inversion the empirical mean over 2000 draws must sit
    // near 1 (binomial noise at n=2000 is ~0.02)
    val h = pmod(pmod(pmod(col("id"), lit(2147483648L)) * 31L +
      lit(0L) * 2654435761L, lit(2147483648L)) * 2654435761L,
      lit(4294967296L))
    val w = when(h < Sampling.Poisson1Cum(0), 0L)
      .when(h < Sampling.Poisson1Cum(1), 1L)
      .when(h < Sampling.Poisson1Cum(2), 2L)
      .when(h < Sampling.Poisson1Cum(3), 3L)
      .when(h < Sampling.Poisson1Cum(4), 4L).otherwise(5L)
    val m = ids.select(w.as("w")).agg(avg("w")).collect().head.getDouble(0)
    assert(math.abs(m - 1.0) < 0.1, s"empirical Poisson mean $m")
  }

  test("kfoldBalance: folds partition the data; shares sum to 1 per fold") {
    val df = (1L to 300L).map(i => (i, s"c${i % 3}")).toDF("id", "label")
    val out = Sampling.kfoldBalance(df, "id", "label", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    assert(out.map(_._3).sum == 300L)            // cells partition the rows
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val byFold = out.groupBy(_._1).values
    assert(byFold.forall(cells => math.abs(cells.map(_._4).sum - 1.0) < 1e-4))
    // deterministic: identical assignment on a re-run
    val again = Sampling.kfoldBalance(df, "id", "label", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    assert(out.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("importanceWeights: hand-computed Kish ESS on an 80/20 skew; balance is free") {
    // A:8, B:2 -> w_A = 10/16 = .625, w_B = 10/4 = 2.5,
    // sum n*w^2 = 8*.390625 + 2*6.25 = 15.625, ESS = 100/15.625 = 6.4
    val df = (Seq.fill(8)("A") ++ Seq.fill(2)("B")).toDF("g")
    val out = Sampling.importanceWeights(df, "g").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      ("A", 8L, 0.8, 0.5, 0.625, 6.4, 0.64),
      ("B", 2L, 0.2, 0.5, 2.5, 6.4, 0.64)))
    // already-uniform corpus: every weight 1, ESS = N exactly
    val bal = (Seq.fill(5)("A") ++ Seq.fill(5)("B")).toDF("g")
    val b = Sampling.importanceWeights(bal, "g").collect()
    assert(b.forall(r => r.getDouble(4) == 1.0 && r.getDouble(6) == 1.0))
    assert(b.head.getDouble(5) == 10.0)
  }

  test("ppsSystematic: hand grid inversion; heavy rows picked repeatedly") {
    // weights 5/1/1/3, W=10, n=5 -> grid t = 1,3,5,7,9; intervals
    // [0,5) [5,6) [6,7) [7,10)
    val df = Seq((1L, 5L), (2L, 1L), (3L, 1L), (4L, 3L)).toDF("id", "w")
    val out = Sampling.ppsSystematic(df, "id", "w", nPicks = 5)
      .orderBy("j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 5L), (1L, 1L, 5L), (2L, 2L, 1L),
      (3L, 4L, 3L), (4L, 4L, 3L)))
  }

  test("neymanAllocation: spread-weighted shares; zero/undefined sd strata") {
    // A: {1,3} sd = sqrt(2) = 1.414214 -> weight 2.828428
    // B: {5,5,5} sd = 0 -> weight 0; C: single row -> sd NULL
    val df = Seq(("A", 1L), ("A", 3L), ("B", 5L), ("B", 5L), ("B", 5L),
      ("C", 7L)).toDF("g", "x")
    val out = Sampling.neymanAllocation(df, "g", "x").collect().map(r =>
      r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out("A") == (2L, Some(1.414214), Some(1.0), Some(1000L)))
    assert(out("B") == (3L, Some(0.0), Some(0.0), Some(0L)))
    assert(out("C") == (1L, None, None, None))
  }

  test("negativeSampling: hand CDF inversions over a 3-term unigram^0.75") {
    // corpus: 'a'×8, 'b', 'c' -> w6 = 4756828 / 1000000 / 1000000;
    // hand-run double-hash draws: doc 1 -> b,b,a,b; doc 2 -> a,a,a,a
    val docs = Seq((1L, "a a a a b c"), (2L, "a a a a"))
      .toDF("doc_id", "text")
    val out = Sampling.negativeSampling(docs, k = 4)
      .orderBy("doc_id", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, "b"), (1L, 1L, 1L, "b"), (1L, 2L, 0L, "a"),
      (1L, 3L, 1L, "b"),
      (2L, 0L, 0L, "a"), (2L, 1L, 0L, "a"), (2L, 2L, 0L, "a"),
      (2L, 3L, 0L, "a")))
  }

  test("hansenHurwitzTotal: y ∝ w estimates exactly; a zeroed unit shifts by its draw share") {
    // W = 100, grid t = 1, 3, …, 99; intervals: doc1 [0,10) doc2 [10,40)
    // doc3 [40,45) doc4 [45,100) -> 5/15/2/28 draws
    val docs = Seq((1L, 10L, 20L), (2L, 30L, 60L), (3L, 5L, 10L),
      (4L, 55L, 110L)).toDF("doc_id", "w", "y")
    val r = Sampling.hansenHurwitzTotal(docs, "doc_id", "w", "y")
      .collect().head
    // y = 2w everywhere: every term is 2W = 200, estimate exact
    assert((r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)) ==
      ((50L, 200.0, 200L, 0.0)))
    // zero doc4's y: its 28 draws contribute 0 -> ŷ = 200·22/50 = 88
    val skew = Seq((1L, 10L, 20L), (2L, 30L, 60L), (3L, 5L, 10L),
      (4L, 55L, 0L)).toDF("doc_id", "w", "y")
    val s = Sampling.hansenHurwitzTotal(skew, "doc_id", "w", "y")
      .collect().head
    assert((s.getLong(0), s.getDouble(1), s.getLong(2), s.getDouble(3)) ==
      ((50L, 88.0, 90L, -0.022222)))
  }

  test("prioritySample: population <= k is returned whole with w_hat = w (tau 0)") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 5L)).toDF("id", "w")
    val out = Sampling.prioritySample(docs, "id", "w", 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // tau = 0 -> the estimator degenerates to the exact weight
    assert(out == Map(1L -> ((10L, 10.0)), 2L -> ((30L, 30.0)),
      3L -> ((5L, 5.0))))
  }

  test("prioritySample: tau is the (k+1)-th priority and w_hat = max(w, tau)") {
    // Replicate the deterministic uniform u = (knuthHash(id)+1)/2^32 and
    // the q = w/u priority; with k = 2 over 4 rows the sample is the two
    // highest priorities, tau the third, each w_hat = max(w, tau), and
    // the DLT identity E[sum w_hat] = total holds per-draw up to the
    // below-tau terms (checked via the explicit formula, not re-derived
    // from the operator).
    def u(id: Long): Double =
      (((id % 2147483648L) * 2654435761L % 4294967296L) + 1).toDouble / 4294967296.0
    val rows = Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 55L))
    val pri = rows.map { case (id, w) => (id, w, w.toDouble / u(id)) }
    val sorted = pri.sortBy { case (id, _, q) => (-q, id) }
    val tau = sorted(2)._3
    val expect = sorted.take(2).map { case (id, w, q) =>
      id -> (BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.max(w.toDouble, tau))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val out = Sampling.prioritySample(rows.toDF("id", "w"), "id", "w", 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out == expect)
  }

  test("prioritySampleTotalCard: k >= population reconstructs the total exactly") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 5L)).toDF("id", "w")
    val r = Sampling.prioritySampleTotalCard(docs, "id", "w", 10).collect().head
    assert(r.getInt(0) == 10 && r.getDouble(1) == 45.0 &&
      r.getDouble(2) == 45.0 && r.getDouble(3) == 0.0)
  }

  test("mixtureCard: hand-computed rates, thresholds, and achieved shares") {
    // A: docs 1,2,3 with 4 tokens each (12 total); B: docs 4,5 with 5
    // tokens each (10 total). weights A:3 B:1 (Σ=4), budget 8 →
    // targets 6/2, rates 0.5/0.2 exactly. Hash walk (Knuth fold mod
    // 2³²): h(1)=2654435761 ≥ .5·2³² drop; h(2)=1014575226 keep;
    // h(3)=3668339987 drop; h(4)=2027808452 ≥ .2·2³² drop;
    // h(5)=387276917 < 858993459 keep. So A keeps doc 2 (4 tokens),
    // B keeps doc 5 (5 tokens); achieved shares 4/9 and 5/9.
    val docs = Seq(
      (1L, "t t t t", "A"), (2L, "t t t t", "A"), (3L, "t t t t", "A"),
      (4L, "t t t t t", "B"), (5L, "t t t t t", "B"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixtureCard(docs, Map("A" -> 3.0, "B" -> 1.0), 8L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    assert(out("A") == ((3L, 12L, 6.0, 0.5, 1L, 4L, 0.75, 0.444444)))
    assert(out("B") == ((2L, 10L, 2.0, 0.2, 1L, 5L, 0.25, 0.555556)))
    // a source absent from the weights map contributes no card row
    val extra = docs.unionByName(Seq((9L, "x y", "C"))
      .toDF("doc_id", "text", "source"))
    assert(Sampling.mixtureCard(extra, Map("A" -> 1.0), 8L)
      .select("source").collect().map(_.getString(0)).toSeq == Seq("A"))
  }

  test("mixtureCard: a requested source absent from the corpus still gets a card row") {
    // weights name A, B AND the missing Z — the card must show Z with
    // zero corpus/kept counts and rate 0 (NOT the least(1.0, NULL)=1.0
    // trap), and target_share must still sum to 1 over ALL requested
    // sources (Z's weight dilutes A/B's shares: 3/5, 1/5, 1/5).
    val docs = Seq(
      (1L, "t t t t", "A"), (2L, "t t t t", "A"), (3L, "t t t t", "A"),
      (4L, "t t t t t", "B"), (5L, "t t t t t", "B"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixtureCard(docs,
        Map("A" -> 3.0, "B" -> 1.0, "Z" -> 1.0), 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))
      .toMap
    assert(out.keySet == Set("A", "B", "Z"))
    assert(out("Z") == ((0L, 0L, 0.0, 0L, 0L, 0.2)))
    assert(math.abs(out.values.map(_._6).sum - 1.0) < 1e-9,
      "target_share must sum to 1 over requested sources")
    // the present sources' plan is unchanged by the missing one beyond
    // the share dilution: rates stay budget·w/Σw / tokens
    assert(out("A")._3 == 0.5 && out("B")._3 == 0.2)
  }
}
