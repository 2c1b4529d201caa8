package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // 2000 rows over a zipf-ish key distribution: key k appears ~2000/k times.
  private lazy val keyed = (1L to 2000L)
    .map(i => (i, s"key${(math.sqrt(i.toDouble).toLong % 40) + 1}"))
    .toDF("id", "k")

  test("stringHash matches the reference code-point polynomial") {
    // independently computed: fold('click', 0, acc*131 + cp mod 2^31-1)
    val expected = "click".foldLeft(0L)((acc, c) => (acc * 131 + c) % 2147483647L)
    val got = Seq("click").toDF("s")
      .select(Sketch.stringHash($"s")).head().getLong(0)
    assert(got == expected)
    // character-exact: anagrams and same-length strings must differ
    val hs = Seq("abc", "acb", "bac", "xyz").toDF("s")
      .select(Sketch.stringHash($"s")).collect().map(_.getLong(0))
    assert(hs.distinct.length == 4)
    // the native expression ≡ the interpreted HOF reference, including
    // multi-byte code points and the empty string
    val samples = Seq("click", "", "a", "naïve", "日本語テキスト", "mixé-π-123")
      .toDF("s")
    val both = samples.select(Sketch.stringHash($"s").as("native"),
      Sketch.stringHashHof($"s").as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("CMS estimate is an upper bound, exact when width is ample") {
    val exact = keyed.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = keyed.select("k").distinct()

    // tight width (8 buckets for 40 keys): collisions guaranteed, but the
    // CMS guarantee est >= true must hold for every key
    val tight = Sketch.cmsEstimate(
      Sketch.cmsBuild(keyed, "k", 4, 8), probes, "k", 4, 8)
    tight.collect().foreach { r =>
      assert(r.getLong(1) >= exact(r.getString(0)),
        s"CMS under-estimated ${r.getString(0)}")
    }

    // ample width (256 buckets): min over 4 rows should dodge collisions
    val wide = Sketch.cmsEstimate(
      Sketch.cmsBuild(keyed, "k", 4, 256), probes, "k", 4, 256)
    wide.collect().foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"CMS inexact at width 256 for ${r.getString(0)}")
    }
  }

  test("CMS merge of split builds equals the one-shot sketch") {
    val oneShot = Sketch.cmsBuild(keyed, "k", 4, 16)
    val merged = Sketch.cmsBuild(keyed.filter($"id" <= 900), "k", 4, 16)
      .unionByName(Sketch.cmsBuild(keyed.filter($"id" > 900), "k", 4, 16))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val a = oneShot.orderBy("row", "bucket").collect().toSeq
    val b = merged.orderBy("row", "bucket").collect().toSeq
    assert(a == b)
  }

  test("HLL estimate lands within expected error of true cardinality") {
    val n = 20000L
    val df = (1L to n).toDF("id")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "id", 6), 6)
      .head().getAs[Double]("est")
    // m=64 -> standard error 1.04/8 = 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"HLL est $est for true $n")
  }

  test("HLL registers merge by max, matching the one-shot registers") {
    val df = (1L to 5000L).toDF("id")
    val oneShot = Sketch.hllRegisters(df, "id", 6)
    val merged = Sketch.hllRegisters(df.filter($"id" % 2 === 0), "id", 6)
      .unionByName(Sketch.hllRegisters(df.filter($"id" % 2 === 1), "id", 6))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    assert(oneShot.orderBy("bucket").collect().toSeq ==
      merged.orderBy("bucket").collect().toSeq)
  }

  test("histQuantiles: estimates within one bin width of exact quantiles; bins merge") {
    val rng = new scala.util.Random(31)
    val vals = Seq.fill(5000)(rng.nextDouble() * 1000.0)
    val df = vals.map(Tuple1(_)).toDF("v")
    val out = graft.operators.Sketch.histQuantiles(df, "v", 100, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    val binWidth = (sorted.last - sorted.head) / 100
    for ((q, est) <- out) {
      val exact = sorted(((sorted.size - 1) * q).toInt)
      assert(math.abs(est - exact) <= 2 * binWidth,
        s"q=$q est=$est exact=$exact width=$binWidth")
    }
  }

  test("cmsTopK: exact top-k when width is ample; cut is (est desc, key)-ordered") {
    val rows = (Seq.fill(30)("hot") ++ Seq.fill(20)("warm") ++
      Seq.fill(20)("tepid") ++ Seq.fill(5)("cold")).map(Tuple1(_))
    val df = rows.toDF("k")
    val sk = graft.operators.Sketch.cmsBuild(df, "k", 4, 1024) // no collisions
    val top = graft.operators.Sketch.cmsTopK(sk, df, "k", 4, 1024, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // 'warm' and 'tepid' tie at 20 -> key order decides rank 2 vs cut
    assert(top.toSeq == Seq(("hot", 30L), ("tepid", 20L), ("warm", 20L)))
  }

  test("grouped HLL: registers and estimates equal the per-group global build") {
    val rng = new scala.util.Random(17)
    val rows = Seq.tabulate(3000)(i => (s"g${i % 3}", rng.nextInt(400).toLong))
    val df = rows.toDF("g", "k")
    val grouped = Sketch.hllRegistersGrouped(df, "k", Seq("g"), 6)
    val est = Sketch.hllEstimateGrouped(grouped, Seq("g"), 6)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("est")).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sub = df.filter($"g" === g)
      // register tables match the single-group builder exactly
      val viaGlobal = Sketch.hllRegisters(sub, "k", 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaGrouped = grouped.filter($"g" === g)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(viaGrouped == viaGlobal, s"register mismatch for $g")
      // and each estimate equals the single-group estimate
      val soloEst = Sketch.hllEstimate(Sketch.hllRegisters(sub, "k", 6), 6)
        .head().getAs[Double]("est")
      assert(est(g) == soloEst)
      val exact = sub.select("k").distinct().count()
      assert(math.abs(est(g) - exact) / exact < 0.35,
        s"group $g est=${est(g)} exact=$exact")
    }
  }

  test("HLL small-range correction engages on tiny cardinalities") {
    val df = (1L to 10L).toDF("id")
    val row = Sketch.hllEstimate(Sketch.hllRegisters(df, "id", 6), 6).head()
    assert(row.getAs[Long]("zeros") > 0)
    val est = row.getAs[Double]("est")
    assert(est > 5 && est < 20, s"linear-counting estimate off: $est")
  }

  test("CMS merge of per-batch sketches == one-shot sketch, register for register") {
    val all = (1 to 300).map(i => s"k${i % 17}").toDF("k")
    val Array(b1, b2, b3) = all.randomSplit(Array(1, 1, 1), seed = 11)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsBuild(df, "k", 3, 64).orderBy("row", "bucket")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val merged = Sketch.cmsMerge(
      Sketch.cmsBuild(b1, "k", 3, 64), Sketch.cmsBuild(b2, "k", 3, 64),
      Sketch.cmsBuild(b3, "k", 3, 64))
      .orderBy("row", "bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == regs(all)) // exact register equality, not just close estimates
  }

  test("cmsJoinSizeEstimate: upper bound, exact when collision-free") {
    val a = (1 to 200).map(i => s"k${i % 20}").toDF("k") // 20 keys x 10
    val b = (1 to 40).map(i => s"k${i % 20}").toDF("k")  // 20 keys x 2
    val exact = a.join(b, "k").count() // 200 * 2 = 400
    assert(exact == 400L)
    // wide sketch: 20 keys in 4096 buckets -> collisions ~0 -> est == exact
    val wide = Sketch.cmsJoinSizeEstimate(a, "k", b, "k", 3, 4096)
      .head().getAs[Long]("join_size_est")
    assert(wide == exact)
    // narrow sketch: collisions only ADD -> still an upper bound
    val narrow = Sketch.cmsJoinSizeEstimate(a, "k", b, "k", 3, 4)
      .head().getAs[Long]("join_size_est")
    assert(narrow >= exact)
  }

  test("HLL merge (register-wise max) == registers of the concatenated stream") {
    val all = (1L to 500L).toDF("id")
    val Array(b1, b2) = all.randomSplit(Array(1, 1), seed = 5)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegisters(df, "id", 5).orderBy("bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val merged = Sketch.hllMerge(Nil,
        Sketch.hllRegisters(b1, "id", 5), Sketch.hllRegisters(b2, "id", 5))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged == regs(all))
    // and therefore identical estimates
    val estMerged = Sketch.hllEstimate(Sketch.hllMerge(Nil,
      Sketch.hllRegisters(b1, "id", 5), Sketch.hllRegisters(b2, "id", 5)), 5)
      .head().getAs[Double]("est")
    val estAll = Sketch.hllEstimate(Sketch.hllRegisters(all, "id", 5), 5)
      .head().getAs[Double]("est")
    assert(estMerged == estAll)
  }

  test("hllSetOps: identical sets give jaccard 1, disjoint sets near 0") {
    val a = (1L to 4000L).toDF("id")
    val same = Sketch.hllSetOps(a, a, "id", 10).collect().head
    assert(same.getDouble(0) == same.getDouble(2))   // est_a == est_union
    assert(same.getDouble(4) == 1.0)                 // jaccard exactly 1
    val b = (100001L to 104000L).toDF("id")
    val disj = Sketch.hllSetOps(a, b, "id", 10).collect().head
    // union of disjoint sets: near est_a + est_b; jaccard near 0
    assert(disj.getDouble(4) < 0.1, s"jaccard ${disj.getDouble(4)}")
    assert(math.abs(disj.getDouble(2) - 8000.0) / 8000.0 < 0.15)
  }

  test("bloomFprCard: probes overlapping the insert set are excluded; a roomy filter has ~zero FPR") {
    val ins = (1L to 50L).toDF("k")
    val prb = (40L to 1039L).toDF("k") // 11 keys overlap the insert set
    val r = Sketch.bloomFprCard(ins, prb, "k", "k", mBits = 1 << 20, k = 3)
      .collect().head
    assert(r.getLong(2) == 50L)             // n_inserted
    assert(r.getLong(3) <= 150L)            // bits_set <= k*n
    assert(r.getLong(5) == 989L)            // probes minus the 11 overlaps
    // 150 bits in a 2^20 filter: theory ~3e-12, measured must be 0
    assert(r.getLong(6) == 0L && r.getDouble(7) == 0.0)
    assert(r.getDouble(8) < 1e-9)
    // a saturated filter (tiny m) flags everything: FPR -> 1, theory high
    val s = Sketch.bloomFprCard(ins, prb, "k", "k", mBits = 4, k = 2)
      .collect().head
    assert(s.getDouble(7) > 0.9 && s.getDouble(8) > 0.9)
    assert(s.getDouble(7) >= 0.0 && s.getDouble(7) <= 1.0)
  }

  test("kmvCard: exact below k, estimator within KMV error above it") {
    // 5 distinct keys (with duplicates), k=1024: the k-min set IS the
    // key set -> exact count, zero relative error
    val small = Seq(1L, 2L, 3L, 4L, 5L, 1L, 2L).toDF("k")
    val r = Sketch.kmvCard(small, "k", 1024).collect().head
    assert(r.getLong(0) == 1024L && r.getLong(1) == 5L)
    assert(r.getLong(3) == 5L)
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 0.0)
    // 100k distinct keys, k=512: (k-1)*2^32/h_(k) lands within a few
    // standard errors (1/sqrt(k) ~ 4.4%) of the truth
    val big = spark.range(1, 100001).toDF("k")
    val e = Sketch.kmvCard(big, "k", 512).collect().head
    assert(e.getLong(1) == 512L && e.getLong(3) == 100000L)
    assert(math.abs(e.getDouble(5)) < 0.15,
      s"KMV estimate off by ${e.getDouble(5)}: ${e.getDouble(4)}")
  }

  test("cms width sweep invariants: over-estimates shrink as width grows") {
    // 200 singleton keys + one hot key: 16 buckets collide heavily,
    // 256 mostly don't; CMS never under-estimates
    val keys = ((0 until 200).flatMap(i => Seq(s"k$i")) ++
      Seq.fill(100)("hot")).toDF("key")
    val exact = keys.groupBy("key").agg(count(lit(1)).as("exact"))
    def sweep(w: Int) = {
      val sk = Sketch.cmsBuild(keys, "key", 4, w)
      Sketch.cmsEstimate(sk, keys.select("key").distinct(), "key", 4, w)
        .join(exact, "key")
        .agg(count(lit(1)).as("n"),
          sum(col("est") - col("exact")).as("sover"),
          min(col("est") - col("exact")).as("mn"))
        .collect().head
    }
    val (s16, s256) = (sweep(16), sweep(256))
    assert(s16.getLong(0) == 201L && s256.getLong(0) == 201L)
    assert(s16.getLong(2) >= 0L && s256.getLong(2) >= 0L) // no under-estimate
    assert(s16.getLong(1) > s256.getLong(1),
      s"16-bucket total over ${s16.getLong(1)} should exceed 256-bucket ${s256.getLong(1)}")
  }

  test("countSketch: collision-free estimates exact; median beats a torn row") {
    val data = (Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq.fill(1)("gamma"))
      .toDF("k")
    val sk = Sketch.countSketchBuild(data, "k", 5, 1024)
    val probes = Seq("alpha", "beta", "gamma").toDF("k")
    val est = Sketch.countSketchEstimate(sk, probes, "k", 5, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // width 1024 over 3 keys: no bucket collides in any row (hash chain
    // is deterministic — verified by this very assertion), so every
    // signed read is exact and the median trivially so
    assert(est == Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("countSketch: signed registers subtract — merge with a negated sketch deletes") {
    val a = (Seq.fill(5)("x") ++ Seq.fill(4)("y")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(1)("y")).toDF("k")
    val union = a.unionByName(b)
    // sketch(A ∪ B) + (−sketch(B)) must estimate exactly like sketch(A)
    val negB = Sketch.countSketchBuild(b, "k", 5, 512)
      .select(col("row"), col("bucket"), (-col("cnt")).as("cnt"))
    val merged = Sketch.countSketchBuild(union, "k", 5, 512)
      .unionByName(negB)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val probes = Seq("x", "y").toDF("k")
    val est = Sketch.countSketchEstimate(merged, probes, "k", 5, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 5L, "y" -> 4L))
  }

  test("winsorizedMeanCard: hand-computed cutoffs tame an outlier; constant group exact") {
    // Group a: 0..8 plus outlier 100, 100 bins of width 1. Cut ranks:
    // ceil(0.01*10)=1 -> bin 0 -> cut_lo = 1.0; ceil(0.9*10)=9 ->
    // bin 8 -> cut_hi = 9.0. Clamped sum 1+(1..8)+9 = 46 -> 4.6 vs raw
    // 13.6. Group b is constant: lo==hi guard pins everything to 5.
    val df = ((0 to 8).map(v => ("a", v.toDouble)) :+ (("a", 100.0)) :+
      (("b", 5.0)) :+ (("b", 5.0))).toDF("g", "v")
    val out = Sketch.winsorizedMeanCard(df, "g", "v", 100, 0.01, 0.9)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("a") == ((10L, 1.0, 9.0, 13.6, 4.6)))
    assert(out("b") == ((2L, 5.0, 5.0, 5.0, 5.0)))
  }

  test("robustStatsCard: hand-computed median/trimmed-mean/MAD; constant group degenerates to zeros") {
    // Group a (0..8 plus outlier 100, 100 bins): cuts as the winsorize
    // test (1.0 / 9.0); median rank ceil(0.5*10)=5 -> bin 4 -> 5.0;
    // trimmed keeps {1..8} -> 36/8 = 4.5 over n_trimmed=8. MAD: dhi =
    // max(5-0, 100-5) = 95, dev bin width .95; devs {0,1,1,2,2,3,3,4,
    // 5,95} put rank-5 in dev-bin 2 -> (2+1)*.95 = 2.85 (true MAD 2.5,
    // within one bin width). Group b constant: all cuts pin to 5, MAD 0.
    val df = ((0 to 8).map(v => ("a", v.toDouble)) :+ (("a", 100.0)) :+
      (("b", 5.0)) :+ (("b", 5.0))).toDF("g", "v")
    val out = Sketch.robustStatsCard(df, "g", "v", 100, 0.01, 0.9)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getLong(7), r.getDouble(8)))
      .toMap
    assert(out("a") == ((10L, 1.0, 9.0, 5.0, 13.6, 4.5, 8L, 2.85)))
    assert(out("b") == ((2L, 5.0, 5.0, 5.0, 5.0, 5.0, 2L, 0.0)))
  }

  test("robustStatsCard: pLo=0/pHi=1 trim nothing (cuts = exact min/max)") {
    // Trimming DROPS rows outside the window, so boundary percentiles
    // must be exact min/max no-ops — a bin-edge cut would silently lose
    // up to a bin's worth of mass at each boundary (the winsorize
    // boundary fix, which matters MORE here).
    val df = Seq(("a", 0.25), ("a", 1.0), ("a", 2.0), ("a", 100.5))
      .toDF("g", "v")
    val r = Sketch.robustStatsCard(df, "g", "v", 4, 0.0, 1.0).collect()(0)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 100.5) // cuts
    assert(r.getLong(7) == 4L)                   // n_trimmed = all rows
    assert(r.getDouble(5) == r.getDouble(6))     // trimmed == raw mean
  }

  test("winsorizedMeanCard: pLo=0/pHi=1 are exact no-ops (cuts = min/max)") {
    // Boundary percentiles must clamp nothing: cut_lo = the group's
    // exact min and cut_hi = its exact max (not a bin upper edge, which
    // would pull the whole lowest bin upward at pLo=0).
    val df = Seq(("a", 0.25), ("a", 1.0), ("a", 2.0), ("a", 100.5))
      .toDF("g", "v")
    val r = Sketch.winsorizedMeanCard(df, "g", "v", 4, 0.0, 1.0).collect()(0)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 100.5) // cuts
    assert(r.getDouble(4) == r.getDouble(5)) // winsorized == raw
    // one-sided: pLo=0 exact low cut, pHi still a histogram estimate
    val r2 = Sketch.winsorizedMeanCard(df, "g", "v", 4, 0.0, 0.75).collect()(0)
    assert(r2.getDouble(2) == 0.25 && r2.getDouble(3) < 100.5)
  }

  test("minhashUnionCard: subset source's registers ARE the union's (est=exact=1)") {
    // Source B's trigram set {"a b c","b c d","c d e"} strictly contains
    // source A's {"a b c","b c d"}: the union signature is exactly B's
    // (register-min closure), so B's agreement estimate and containment
    // Jaccard are both 1.0 with NO dependence on hash values; A's exact
    // Jaccard is 2/3 and its estimate is a valid [0,1] multiple of 1/16.
    val docs = Seq(
      (1L, "a b c d", "A"),
      (2L, "a b c d e", "B")).toDF("doc_id", "text", "source")
    val out = Sketch.minhashUnionCard(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("B") == ((3L, 3L, 16L, 1.0, 1.0)))
    val (na, nu, agree, est, exact) = out("A")
    assert(na == 2L && nu == 3L && exact == 0.666667)
    assert(agree >= 0L && agree <= 16L && est == agree / 16.0)
    // identical corpora in two groups -> both signatures equal the union
    val same = Seq((1L, "x y z w", "g1"), (2L, "x y z w", "g2"))
      .toDF("doc_id", "text", "source")
    Sketch.minhashUnionCard(same).collect().foreach { r =>
      assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
    }
  }

}
