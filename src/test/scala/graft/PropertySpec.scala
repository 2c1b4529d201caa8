package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.Transforms
import graft.functions.Fns

/** SURVEY §5.3 property tests. Strategy: ScalaCheck generators produce a
  * few hundred deterministic samples (fixed seed), which are evaluated in
  * ONE Spark job per property — per-sample Spark jobs would take minutes.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("time dimension invariants hold for arbitrary epoch millis") {
    // full epoch-millis range of interest: 1970..2100
    val millis = samples(Gen.choose(0L, 4102444800000L), 400)
    val df = millis.toDF("ms").select(timestamp_millis($"ms").as("ts"))
    val time = Transforms.buildTime(df)
    val bad = time.filter(
      $"weekday" < 0 || $"weekday" > 6 ||
      $"hour" < 0 || $"hour" > 23 ||
      $"day" < 1 || $"day" > 31 ||
      $"week" < 1 || $"week" > 53 ||
      $"month" < 1 || $"month" > 12 ||
      $"year" < 1970 || $"year" > 2100).count()
    assert(bad == 0)
    // one output row per distinct input timestamp
    assert(time.count() == df.distinct().count())
  }

  test("songplays is contained in the NextSong-filtered events") {
    val pages = Gen.oneOf("NextSong", "Home", "Logout")
    val songs = Gen.oneOf("S1", "S2", "S3", "S4")
    val ev = samples(Gen.zip(songs, pages, Gen.choose(0L, 1e12.toLong)), 300)
      .zipWithIndex.map { case ((s, p, ts), i) =>
        (s, "Art", 100.0, ts, i.toString, "free", i, "L", "UA", p) }
      .toDF("song", "artist", "length", "ts_millis", "user_id", "level",
        "session_id", "location", "user_agent", "page")
      .withColumn("ts", timestamp_millis($"ts_millis")).drop("ts_millis")
    val ss = Seq(("SO1", "AR1", "S1", "Art", 100.0), ("SO2", "AR2", "S2", "Art", 100.0))
      .toDF("song_id", "artist_id", "title", "artist_name", "duration")
    val sp = Transforms.buildSongplays(ev, ss)
    val nextSong = ev.filter($"page" === "NextSong")
    assert(sp.count() ==
      nextSong.filter($"song".isin("S1", "S2") && $"artist" === "Art").count())
    // every songplay's user exists in the filtered events
    assert(sp.join(nextSong, Seq("user_id"), "left_anti").count() == 0)
  }

  test("shingle hash sets: size <= max(0, tokens - n + 1); parity with strings") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val text = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val docs = samples(text, 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = docs.select(
      size(call_function("graft_shingles", $"text", lit(3))).as("n_hashed"),
      size(array_distinct(Fns.shingles(Fns.tokens($"text"), 3))).as("n_string"),
      size(Fns.tokens($"text")).as("n_toks"))
    // hashed-set cardinality == distinct string-shingle cardinality
    assert(out.filter($"n_hashed" =!= $"n_string").count() == 0)
    assert(out.filter($"n_hashed" > greatest(lit(0), $"n_toks" - 2)).count() == 0)
  }

  test("asOf join matches a brute-force reference on random event streams") {
    import graft.operators.AsOfJoin
    val g = Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 1000L))
    val lefts = samples(g, 120).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, s"k$k", new java.sql.Timestamp(t * 1000)) }
    // distinct right timestamps per key so the latest-prior row is unique
    val rights = samples(g, 80).map { case (k, t) => (s"k$k", t) }
      .distinct.zipWithIndex
      .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toDouble) }
    // mirror the unique-latest requirement: dedup rights on (key, ts)
    val rightsUnique = rights.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val expectedU = lefts.map { case (id, k, ts) =>
      val prior = rightsUnique.filter(r => r._1 == k && !r._2.after(ts))
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    val out = AsOfJoin.asOf(
        lefts.toDF("id", "k", "ts"),
        rightsUnique.toDF("k", "rts", "v"),
        "k", "ts", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getDouble(r.fieldIndex("v")))))
      .toMap
    assert(out == expectedU)
  }

  test("cosine is in [-1, 1] (or NULL) for arbitrary vectors") {
    val vec = Gen.listOfN(8, Gen.choose(-100.0, 100.0))
    val zero = Gen.const(List.fill(8)(0.0))
    val pairs = samples(Gen.zip(Gen.frequency(9 -> vec, 1 -> zero), vec), 300)
    val df = pairs.toDF("a", "b")
      .select(Fns.cosine($"a", $"b").as("c"))
    assert(df.filter($"c" < -1.0000000001 || $"c" > 1.0000000001).count() == 0)
    // zero vectors produce NULL, never NaN
    assert(df.filter(isnan($"c")).count() == 0)
  }

  test("minhash permutations stay in [0, p) across the full long range") {
    val hashes = samples(Gen.choose(Long.MinValue, Long.MaxValue), 500)
    val df = hashes.toDF("h")
    val cols = (0 until 16).map(k => Fns.minhashPerm($"h", k).as(s"p$k"))
    val bad = df.select(cols: _*).filter(
      (0 until 16).map(k => col(s"p$k") < 0 || col(s"p$k") >= Fns.MinHashPrime)
        .reduce(_ || _)).count()
    assert(bad == 0)
  }

  test("entropy bounds: 0 <= H <= ln(n_distinct) for arbitrary token bags") {
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 200).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.entropy(docs)
    val bad = out.filter($"entropy" < -1e-9 ||
      $"entropy" > log($"n_distinct") + 1e-6).count()
    assert(bad == 0)
    // norm_entropy, when defined, sits in [0, 1]
    assert(out.filter($"norm_entropy".isNotNull &&
      ($"norm_entropy" < -1e-9 || $"norm_entropy" > 1.0 + 1e-9)).count() == 0)
  }

  test("boilerplate invariants: ratio in [0,1], token accounting adds up") {
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("x", "y", "z", "w")
    val doc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 150).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateRemove(docs, 2, 0.2)
    assert(out.filter($"boilerplate_ratio" < 0 || $"boilerplate_ratio" > 1).count() == 0)
    assert(out.filter($"n_removed" < 0 || $"n_removed" > $"n_tokens").count() == 0)
    // clean token count == n_tokens - n_removed
    val bad = out.filter(
      size(filter(split($"clean_text", " "), t => t =!= "")) =!=
        $"n_tokens" - $"n_removed").count()
    assert(bad == 0)
  }

  test("selectByBudget is a prefix of the quality ordering and stays under budget") {
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("p", "q", "r", "s", "t", "u")
    val doc = Gen.choose(2, 15).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 120).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.selectByBudget(docs, 200L, buckets = 8).collect()
    assert(out.forall(_.getAs[Long]("cum_tokens") <= 200L))
    // prefix property: every selected doc outranks every unselected one
    val sel = out.map(r => (r.getDouble(1), r.getLong(0))).toSet
    if (sel.nonEmpty) {
      val worstSel = sel.map { case (s, id) => (-s, id) }.max
      val all = docs.collect().map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (-(toks.distinct.length.toDouble / toks.length), r.getLong(0))
      }
      val unselected = all.filterNot { case (negS, id) => sel.contains((-negS, id)) }
      assert(unselected.forall(u => implicitly[Ordering[(Double, Long)]].gt(u, worstSel)))
    }
  }

  test("theilSen slope is translation-invariant; intercept shifts by the offset") {
    // random hourly series, then the same series +100: a robust trend
    // estimator must report the identical slope and an intercept exactly
    // 100 higher (the estimator reads shape, not level)
    val vals = samples(Gen.choose(-50, 50), 24).map(_.toDouble)
    def ev(u: Long, off: Double) = vals.zipWithIndex.map { case (v, h) =>
      (u, f"2024-01-01 $h%02d:00:00", v + off) }
    val rows = (ev(1L, 0.0) ++ ev(2L, 100.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = graft.operators.TimeSeries
      .theilSen(rows, "user_id", "ts", "value").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L)._1 == out(2L)._1, s"slopes diverged: $out")
    assert(math.abs(out(2L)._2 - out(1L)._2 - 100.0) < 1e-6)
  }

  test("JSD is bounded by ln 2 and zero only for identical distributions") {
    // random word bags per source; every pairwise divergence obeys the
    // Lin bound, and a source paired with its own copy scores exactly 0
    val words = Vector("a", "b", "c", "d", "e")
    val bags = samples(Gen.listOfN(12, Gen.oneOf(words)), 4)
    val docs = bags.zipWithIndex.flatMap { case (bag, i) =>
      Seq((i.toLong, bag.mkString(" "), s"s$i"),
        (100L + i, bag.mkString(" "), s"t$i")) // tᵢ = copy of sᵢ
    }.toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.jsdBySource(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(out.forall { case (_, j) => j >= 0.0 && j <= math.log(2.0) + 1e-9 })
    val copies = out.filter { case ((a, b), _) =>
      a.drop(1) == b.drop(1) && a.head == 's' && b.head == 't' }
    assert(copies.nonEmpty && copies.forall(_._2 == 0.0),
      s"identical-copy pairs must diverge 0: ${copies.toSeq}")
  }

  test("bootstrapCI brackets narrow as the sample grows (variance shrinks)") {
    def mk(n: Int, g: String) = (1L to n.toLong)
      .map(i => (g, i, (i % 7).toDouble))
    val rows = (mk(60, "small") ++ mk(960, "big")).toDF("g", "id", "v")
    val out = graft.operators.Sampling
      .bootstrapCI(rows, "g", "id", "v", reps = 40).collect()
      .map(r => r.getString(0) -> (r.getDouble(6) - r.getDouble(4))).toMap
    assert(out("big") < out("small"),
      s"CI width must shrink with n: $out")
  }

  test("permutation entropy is invariant under any monotone transform") {
    // ordinal patterns read only the ORDER of values — x -> 2x + 5 and
    // x -> x^3 (odd, monotone) must yield the identical entropy rows
    val vals = samples(Gen.choose(-40, 40), 30).map(_.toDouble)
    // spread over hours within a day then days (unique buckets per idx)
    def ev2(u: Long, f: Double => Double) = vals.zipWithIndex.map {
      case (v, h) => (u, f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:00:00", f(v)) }
    val rows = (ev2(1L, identity) ++ ev2(2L, x => 2 * x + 5) ++
        ev2(3L, x => x * x * x))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = graft.operators.TimeSeries
      .permutationEntropy(rows, "user_id", "ts", "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      s"monotone transforms changed the ordinal profile: $out")
  }

  test("mixtureCard is partitioning-invariant and its target shares sum to 1") {
    // random corpus over 4 sources: the deterministic hash rule must
    // select the SAME rows (hence identical card) regardless of how the
    // input is partitioned, and normalized targets must sum to 1
    val words = samples(Gen.choose(1, 9), 600)
    val docs = words.grouped(3).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString("w", " w", ""), s"s${i % 4}") }.toSeq
      .toDF("doc_id", "text", "source")
    val weights = Map("s0" -> 4.0, "s1" -> 3.0, "s2" -> 2.0, "s3" -> 1.0)
    def card(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.mixtureCard(df, weights, 120L)
        .orderBy("source").collect().map(_.toSeq).toSeq
    val base = card(docs)
    assert(base == card(docs.repartition(7)), "card depends on partitioning")
    assert(base == card(docs.repartition(1)), "card depends on partitioning")
    val shareSum = base.map(_(7).asInstanceOf[Double]).sum
    assert(math.abs(shareSum - 1.0) < 1e-6, s"target shares sum to $shareSum")
  }

  test("all three cluster-resolution paths agree on random graphs") {
    // random edge lists over 40 nodes: star contraction, min-label
    // propagation, and the adaptive probe dispatch each compute the
    // exact min-id per component — parity must hold on ANY graph shape
    // (sparse chains, dense blobs, isolated nodes), not just the
    // hand-built spec fixtures.
    import graft.operators.Dedup
    val docs = (0L to 39L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    for (seed <- 0 until 3) {
      val nEdges = 12 + seed * 18 // sparse -> moderately dense
      val es = samples(Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L)), nEdges)
        .filter { case (a, b) => a != b }
      val pairs = es.toDF("doc_a", "doc_b")
      val star = Dedup.dedupClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = Dedup.dedupClustersPropagation(docs, pairs, maxIter = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val adaptive = Dedup.dedupClustersAdaptive(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"star != propagation at seed $seed")
      assert(adaptive == star, s"adaptive != star at seed $seed")
    }
  }

  test("perplexityBigram is partitioning-invariant and positive") {
    // the DECIMAL fold + tie-exact integer round must produce identical
    // rows on any physical layout; perplexity >= 1 always (probabilities
    // are <= 1 so ln PP >= 0)
    val words = samples(Gen.choose(1, 6), 900)
    val docs = words.grouped(5).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString("w", " w", "")) }.toSeq.toDF("doc_id", "text")
    def pp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.perplexityBigram(df)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = pp(docs)
    assert(base == pp(docs.repartition(11)), "bigram PP depends on partitioning")
    assert(base.forall(_(3).asInstanceOf[Double] >= 1.0), "PP < 1 impossible")
  }
}
