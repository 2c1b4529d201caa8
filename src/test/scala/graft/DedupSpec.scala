package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded corpus: 20 base docs over a small vocab, 5 near-dup copies
    * (one token perturbed), 3 exact dups. Deterministic.
    */
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 20).map { i =>
      (i.toLong, Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = (0 until 5).map { i =>
      val toks = base(i)._2.split(" ")
      toks(rng.nextInt(toks.length)) = "OMEGA"
      (100L + i, toks.mkString(" "))
    }
    val exactDups = (0 until 3).map(i => (200L + i, base(i)._2))
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup: one row per distinct text, keeping the min id") {
    val out = Dedup.exact(corpus)
    assert(out.count() == 25) // 28 docs, 3 exact dups collapse
    val dupRow = out.filter($"n_copies" === 2).collect()
    assert(dupRow.length == 3)
    assert(dupRow.forall(_.getAs[Long]("keep_id") < 20)) // base id kept, not 200+
  }

  test("ngram Jaccard finds near-dups and exact dups, nothing else") {
    val pairs = Dedup.ngramJaccardPairs(corpus, 3, 0.5).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups at jaccard 1.0
    (0 until 3).foreach(i => assert(pairSet.contains((i.toLong, 200L + i))))
    // near-dups: one perturbed token kills <= 3 of 38 shingles -> j >= 0.84
    (0 until 5).foreach(i => assert(pairSet.contains((i.toLong, 100L + i))))
    val jac = pairs.map(_.getDouble(2))
    assert(jac.forall(j => j >= 0.5 && j <= 1.0))
  }

  test("maxShingleFreq skew cap only removes pairs, never adds; huge cap is exact") {
    val exact = Dedup.ngramJaccardPairs(corpus, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val capped = Dedup.ngramJaccardPairs(corpus, 3, 0.5, maxShingleFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // dropping hot shingles can only lower intersections -> pair subset
    assert(capped.toSet.subsetOf(exact.map(p => (p._1, p._2)).toSet))
    val cappedHuge = Dedup.ngramJaccardPairs(corpus, 3, 0.5, maxShingleFreq = Some(1000000))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cappedHuge.toSet == exact.toSet) // cap above every df is a no-op
  }

  test("prefix-filtered exact Jaccard equals the naive inverted-index join") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(corpus, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(corpus, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(prefix == naive, s"threshold $t")
    }
  }

  test("MinHash+LSH verified pairs equal the exact pairs at threshold 0.5") {
    val exact = Dedup.ngramJaccardPairs(corpus, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashDedupPairs(corpus, 3, 0.5, 64, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact) // candidate recall ~1 at j>=0.84; verify is exact
  }

  test("LSH candidates are a superset of true high-similarity pairs") {
    val sigs = Dedup.minhashSignatures(corpus, 3, 64)
    val cands = Dedup.lshCandidatePairs(sigs, 16, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = Dedup.ngramJaccardPairs(corpus, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(cands))
  }

  test("SimHash: exact dups at hamming 0; near-dups within the radius") {
    val pairs = Dedup.simhashPairs(corpus, 3).collect()
    val byPair = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    (0 until 3).foreach(i => assert(byPair((i.toLong, 200L + i)) == 0))
    assert(pairs.forall(_.getInt(2) <= 3))
  }

  test("crossGroupPairs keeps only pairs spanning different groups") {
    val docs = Seq((1L, "train"), (2L, "train"), (3L, "held"), (4L, "held"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L, 1.0), (1L, 3L, 0.9), (3L, 4L, 0.8))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.crossGroupPairs(pairs, docs, "source")
      .select("doc_a", "doc_b", "group_a", "group_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 3L, "train", "held"))) // within-group pairs dropped
  }

  test("dedupClusters (star path) and dedupClustersPropagation label chains, cliques, singletons identically") {
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // chain 0-1-2-3 (diameter 3), clique {5,6,7}, singleton 4, pair 8-9
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (5L, 7L), (6L, 7L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L)
    // production path (star contraction) and its independently-
    // implemented oracle (min-label propagation) must agree exactly
    val star = Dedup.dedupClusters(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.dedupClustersPropagation(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == expected && prop == expected)
    // survivors = docs whose id equals their cluster id
    assert(star.count { case (d, c) => d == c } == 4)
  }

  test("dedupClustersAdaptive: both branches agree with star and propagation") {
    val docs = (0L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // chain 0-1-2-3 forces the probe PAST 2 rounds -> contraction branch
    val deep = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (5L, 7L), (6L, 7L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L)
    val viaContract = Dedup.dedupClustersAdaptive(docs, deep)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaContract == expected)
    // cliques + pairs only (diameter <= 2): the probe converges and the
    // propagation branch IS the answer
    val shallow = Seq((5L, 6L), (5L, 7L), (6L, 7L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val viaProbe = Dedup.dedupClustersAdaptive(docs, shallow)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaProbe == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
    // probeRounds=1 on the deep graph still contracts to exact labels
    val oneRound = Dedup.dedupClustersAdaptive(docs, deep, probeRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneRound == expected)
    // empty pair set: every doc is its own singleton
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val singletons = Dedup.dedupClustersAdaptive(docs, empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(singletons == (0L to 9L).map(i => i -> i).toMap)
  }

  test("dedupClustersAdaptive: deep 16-node chain is exact via the contraction branch") {
    val docs = (0L to 15L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val adaptive = Dedup.dedupClustersAdaptive(docs, pairs, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adaptive == (0L to 15L).map(_ -> 0L).toMap)
  }

  test("dedupClusters star path labels a deep chain that propagation truncates at maxIter=4") {
    // 9-node chain 0-1-…-8: node 8 is at distance 8 from the min label,
    // so 4 PROPAGATION rounds leave it mislabeled (min within distance
    // 4) — while 4 STAR rounds are plenty (O(log² n) convergence), the
    // exact reason star contraction is the production path.
    val docs = (0L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val truncated = Dedup.dedupClustersPropagation(docs, pairs, maxIter = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truncated(8L) != 0L) // the honest failure mode of a fixed bound
    val star = Dedup.dedupClusters(docs, pairs, maxIter = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == (0L to 8L).map(_ -> 0L).toMap)
    val full = Dedup.dedupClustersPropagation(docs, pairs, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == (0L to 8L).map(_ -> 0L).toMap) // early-stops at the fixed point
  }

  test("both cluster paths raise under strict=true when rounds are exhausted") {
    val docs = (0L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.dedupClustersPropagation(docs, pairs, maxIter = 4, strict = true)
    }
    assert(e.getMessage.contains("did not converge"))
    intercept[IllegalStateException] {
      Dedup.dedupClusters(docs, pairs, maxIter = 1, strict = true)
    }
    // strict mode on a convergent run stays silent and exact — both paths
    val ok = Dedup.dedupClustersPropagation(docs, pairs, maxIter = 20,
        strict = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok(8L) == 0L)
    val okStar = Dedup.dedupClusters(docs, pairs, strict = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(okStar(8L) == 0L)
  }

  test("dedupClusters on the seeded corpus: exact+near dup triples collapse to base id") {
    val labels = Dedup.dedupClusters(corpus, Dedup.ngramJaccardPairs(corpus, 3, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 3).foreach { i => // base i, near-dup 100+i, exact dup 200+i
      assert(labels(100L + i) == i.toLong && labels(200L + i) == i.toLong)
    }
    assert(labels(10L) == 10L) // un-duplicated base doc keeps its id
  }

  test("LSH embedding near-dup equals the exact all-pairs join on a planted corpus") {
    // 40 seeded 64-dim vectors + a perturbed copy of each (cosine ≈ 1):
    // the near-dup regime the SRP path is built for.
    val rng = new scala.util.Random(11)
    val base = (0 until 40).map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val copies = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x * (1.0f + 0.002f * rng.nextFloat())))
    }
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(emb, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embeddingNearDupPairsLsh(emb, 0.95, dim = 64,
        nPlanes = 8, nTables = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size == 40) // every planted pair, nothing else
    assert(lsh == exact)
  }

  test("lshBuckets drops wrong-length and null-element vectors entirely") {
    val emb = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(1.0F, 2.0F)),
        |  (2L, array(1.0F)),
        |  (3L, array(1.0F, CAST(NULL AS FLOAT))),
        |  (4L, CAST(NULL AS ARRAY<FLOAT>))
        |AS t(vec_id, embedding)""".stripMargin)
    val b = graft.operators.Similarity.lshBuckets(emb, dim = 2, nPlanes = 2, nTables = 3)
    // wrong-length, null-element, and null vectors all posexplode to zero
    // rows (their cosine could never verify); only the valid vector buckets
    assert(b.collect().map(_.getLong(2)).toSet == Set(1L))
  }

  test("lshBuckets emits one row per (table, vector); buckets within plane range") {
    val rng = new scala.util.Random(13)
    val emb = (0 until 10).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val b = graft.operators.Similarity.lshBuckets(emb, dim = 16, nPlanes = 4, nTables = 3)
      .collect()
    assert(b.length == 30)
    assert(b.map(_.getInt(0)).toSet == Set(0, 1, 2))
    assert(b.forall { r => val bk = r.getLong(1); bk >= 0 && bk < 16 })
  }

  test("embedding near-dup: zero-norm vector produces no pair (NaN guard)") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 1e-6f)), (3L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("editDistancePairs: LSH candidates verified by exact levenshtein") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("tok7", "tokX")),       // 1 substitution
      (3L, base + " extra"),                    // 6 inserts
      (4L, (100 to 130).map(i => s"zz$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 6L)
    assert(out.keySet.forall { case (a, b) => a != 4L && b != 4L })
  }

  test("editDistancePairs rejects numPerms not divisible by bands") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs, 2, numPerms = 64, bands = 7)
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("tfCosinePairs: repetition-sensitive where set-based Jaccard is blind") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha alpha beta gamma delta"), // repeats alpha
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = Dedup.tfCosinePairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("tf_cosine")).toMap
    // docs 1,2 share the same term SET (Jaccard 1.0) but different tf
    // vectors: cos = (4+1+1+1)/(sqrt(4)*sqrt(19)) = 7/(2*sqrt(19))
    val expected = 7.0 / (2.0 * math.sqrt(19.0))
    assert(math.abs(out((1L, 2L)) - expected) < 1e-6)
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L))) // no shared terms
    // identical docs score exactly 1.0
    val twins = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.tfCosinePairs(twins, 0.99).head().getAs[Double]("tf_cosine") == 1.0)
  }

  test("tfCosinePairs: prefix ≡ postings ≡ dense ≡ dispatcher at several thresholds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(0.5, 0.8, 0.95).foreach { t =>
      def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val posting = rows(Dedup.tfCosinePairsPostings(docs, t))
      assert(rows(Dedup.tfCosinePairsPrefix(docs, t)) == posting,
        s"threshold $t: prefix-filtered diverged from posting join")
      assert(rows(Dedup.tfCosinePairsDense(docs, t)) == posting,
        s"threshold $t: dense diverged from posting join")
      assert(rows(Dedup.tfCosinePairs(docs, t)) == posting,
        s"threshold $t: dispatcher diverged from posting join")
    }
  }

  test("tfCosinePairs dispatcher routes long-tail vocabularies to the prefix path") {
    // 30 docs with ~unique vocabularies (V >> denseVocabMax when the cap
    // is forced low) — just proves the dispatch boundary actually flips
    // and the prefix path produces the same pairs.
    val docs = (1L to 30L).map(i =>
      (i, (0 until 12).map(j => s"w${i}_$j").mkString(" ") + " shared common tokens"))
      .toDF("doc_id", "text")
    val viaDispatch = Dedup.tfCosinePairs(docs, 0.3, denseVocabMax = 8)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaPrefix = Dedup.tfCosinePairsPrefix(docs, 0.3)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaDispatch == viaPrefix)
  }

  test("vocabComponents: term-sharing merges, disjoint shards stay apart") {
    val docs = Seq(
      (1L, "a b"), (2L, "b c"),   // chain via b -> one component, label 1
      (3L, "x y"), (4L, "y z"),   // second component, label 3
      (5L, "q q q"))              // singleton component
      .toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{col, explode, split, count, lit}
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val labs = Dedup.vocabComponents(tf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
  }

  test("tfCosinePairs: sharded small-vocab corpus routes per-component dense, exact") {
    // Three term-disjoint shards of near-dup docs: per-shard vocab is 6,
    // global vocab 18 — with the cutoff forced to 8 the GLOBAL stats
    // fail the dense test but every COMPONENT passes it (the 10x scale
    // fixture's shape, where the prefix fallback went quadratic).
    val docs = (for {
      s <- 0 until 3
      i <- 0 until 8
    } yield {
      val toks = (0 until 6).map(j => s"s${s}t$j")
      // doc i keeps tokens rotated so neighbors are similar, not equal
      (s * 100L + i, (toks ++ toks.take(i % 3)).mkString(" "))
    }).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(Dedup.tfCosinePairsPostings(docs, 0.6))
    val dispatched = rows(Dedup.tfCosinePairs(docs, 0.6, denseVocabMax = 8))
    assert(dispatched == exact)
    assert(exact.nonEmpty) // the case actually exercises pair output
    // no cross-shard pair can appear
    assert(exact.forall { case (a, b, _) => a / 100 == b / 100 })
  }

  test("tfCosinePairs: mixed sharded + long-tail corpus unions both paths, exact") {
    // Shard A: small closed vocab (dense-eligible component). Shard B:
    // every doc nearly-unique vocabulary chained by one shared rare term
    // per neighbor -> one long-tail component above the forced cutoff.
    val shardA = (0 until 6).map(i =>
      (i.toLong, (0 until 5).map(j => s"at$j").mkString(" ")))
    val shardB = (0 until 12).map(i =>
      (100L + i, ((0 until 10).map(j => s"b${i}_$j") :+ s"link$i" :+ s"link${i + 1}")
        .mkString(" ")))
    val docs = (shardA ++ shardB).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(Dedup.tfCosinePairsPostings(docs, 0.5))
    val dispatched = rows(Dedup.tfCosinePairs(docs, 0.5, denseVocabMax = 8))
    assert(dispatched == exact)
    assert(exact.exists(_._1 < 100) && rows(
      Dedup.tfCosinePairs(docs, 0.95, denseVocabMax = 8))
      .forall { case (a, b, _) => a < 100 && b < 100 }) // A's clones survive 0.95
  }

  test("tfCosinePairs: maxTermDf cap only LOWERS cosines (recall-only loss)") {
    // Docs 1,2 are identical: four rare terms + one corpus-wide hot term.
    // Background docs 3..10 share ONLY the hot term with everything else.
    val docs = (Seq(
      (1L, "r1 r2 r3 r4 hot"),
      (2L, "r1 r2 r3 r4 hot")) ++
      (3L to 10L).map(i => (i, s"hot y$i z$i w$i v$i"))).toDF("doc_id", "text")
    val exact = Dedup.tfCosinePairsPostings(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // hot has df=10 > cap=5, so it is dropped from the dot but NOT the
    // norms: (1,2) keeps 4 of its 5 unit contributions -> 4/5 = 0.8.
    val capped = Dedup.tfCosinePairsPostings(docs, 0.5, maxTermDf = Some(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact == Map((1L, 2L) -> 1.0))
    assert(capped == Map((1L, 2L) -> 0.8))
    // and a cap nothing exceeds is a no-op (exactness preserved)
    val wide = Dedup.tfCosinePairsPostings(docs, 0.5, maxTermDf = Some(100)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(wide == exact)
  }

  test("containment: short doc embedded in long one scores high one-way") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, long),
      (2L, "alpha beta gamma delta epsilon"), // wholly contained prefix
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, 3, 0.6).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // doc 2 has 3 trigrams, all present in doc 1 -> containment 1.0
    assert(out((2L, 1L)) == 1.0)
    // the reverse direction: 3 of doc 1's 8 trigrams -> 0.375, filtered out
    assert(!out.contains((1L, 2L)))
    assert(out.keySet.forall { case (a, b) => a != 3L && b != 3L })
  }

  test("sharedWindowPairs: only verbatim runs of windowLen tokens pair up") {
    val run = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro words $run trailing stuff"),
      (2L, s"other prefix $run different tail"),  // shares the 16-token run
      (3L, s"no shared passage at all in this one ${(1 to 15).map(i => s"w$i").mkString(" ")}")) // only 15
      .toDF("doc_id", "text")
    val out = Dedup.sharedWindowPairs(docs, 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.contains((1L, 2L)))
    assert(out((1L, 2L)) == 1L) // exactly the one full shared window
    assert(out.keySet == Set((1L, 2L)))
  }

  test("sourceOverlap: hand Jaccard/containment; zero-overlap pairs still emit") {
    val docs = Seq(
      (1L, "s1", "a b c d"),   // s1 trigrams {a b c, b c d}
      (2L, "s1", "a b c"),     // duplicate gram within s1 - distinct once
      (3L, "s2", "a b c x"),   // s2 trigrams {a b c, b c x}
      (4L, "s3", "p q r s"))   // s3 disjoint {p q r, q r s}
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    val (na, nb, sh, jac, cont) = out(("s1", "s2"))
    assert((na, nb, sh) == (2L, 2L, 1L)) // share exactly "a b c"
    assert(math.abs(jac - 1.0 / 3) < 1e-6 && cont == 0.5)
    assert(out(("s1", "s3")) == (2L, 2L, 0L, 0.0, 0.0)) // absence emits too
  }

  test("keepBest: highest score survives per cluster, ties broken by id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 2L), (6L, 2L))
      .toDF("doc_id", "score")
    val out = Dedup.keepBest(clusters, quality, "score").orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 30L), // 2 beats 3 on the id tiebreak, 3 members
      (4L, 4L, 1L, 7L),  // singleton keeps itself
      (5L, 5L, 2L, 2L))) // all-tied cluster keeps the smallest id
  }

  test("keepBest: unscored members still count; unscored clusters keep a member") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("doc_id", "cluster_id")
    val quality = Seq((2L, 5L)).toDF("doc_id", "score") // 1, 3, 4 unscored
    val out = Dedup.keepBest(clusters, quality, "score").orderBy("cluster_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L) // scored member wins
    assert(out(0).getLong(2) == 2L)                            // both members counted
    assert(out(1).getLong(0) == 3L && out(1).getLong(1) == 3L) // all-null: id tiebreak
    assert(out(1).isNullAt(3))                                 // best_score NULL
  }

  test("decontaminateNgram: single shared n-gram flags a train doc; counts are distinct") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),        // shares "the quick brown" + "quick brown fox"
      (2L, "totally unrelated training text"),  // clean
      (3L, "the quick brown the quick brown")   // repeated shared trigram counts ONCE
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")
    val out = Dedup.decontaminateNgram(train, eval, 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("decontaminateNgram: disjoint corpora produce no flags") {
    val train = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val eval = Seq((2L, "xx yy zz ww")).toDF("doc_id", "text")
    assert(Dedup.decontaminateNgram(train, eval, 3).count() == 0)
  }

  test("admitIncremental: corpus dup rejected, in-batch dup routed, novel admitted") {
    val corpus = Seq(
      (1L, "the old corpus document about databases and storage"),
      (2L, "another standing document on query optimization")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the old corpus document about databases and storage"), // = doc 1
      (11L, "fresh unseen content with entirely novel words"),
      (12L, "duplicate twins inside the batch alpha beta gamma"),
      (13L, "duplicate twins inside the batch alpha beta gamma")
    ).toDF("doc_id", "text")
    val out = Dedup.admitIncremental(corpus, batch, 3, 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10L, 1L, 0L, "dup_of_corpus"),
      (11L, 0L, 0L, "admitted"),
      (12L, 0L, 1L, "needs_batch_dedup"),
      (13L, 0L, 1L, "needs_batch_dedup")))
  }

  test("semanticDedup: per-cluster drops, lowest id always kept") {
    // seeds = two lowest ids: 1L -> cluster axis-x, 2L -> cluster axis-y
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),    // seed / survivor of cluster 1
      (2L, Seq(0.0f, 1.0f)),    // seed / survivor of cluster 2
      (3L, Seq(0.99f, 0.01f)),  // cluster 1, cos ~1 to id 1 -> dropped
      (4L, Seq(0.01f, 0.99f)),  // cluster 2, cos ~1 to id 2 -> dropped
      (5L, Seq(0.7f, 0.72f))    // cluster 2, cos ~0.72 to mates -> kept at t=0.9
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, 2, 0.9).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 1L, false), (4L, 2L, false),
      (5L, 2L, true)))
  }

  test("semanticDedup: documented conservative chain over-drop") {
    // one cluster; angles 0, 25, 50 degrees: cos(1,2) and cos(2,3) are
    // ~0.906 >= 0.9 but cos(1,3) ~0.643 -- the one-pass rule drops BOTH
    // 2 and 3 (greedy-sequential would keep 3); the lowest id survives.
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val emb = Seq((1L, v(0)), (2L, v(25)), (3L, v(50))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, 1, 0.9).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, true), (2L, false), (3L, false)))
  }

  test("sourceDupReport: per-source doc/unique counts and dup rate") {
    val docs = Seq(
      (1L, "A", "same text"), (2L, "A", "same text"), (3L, "A", "other"),
      (4L, "B", "x"), (5L, "B", "y")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sourceDupReport(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("A", 3L, 2L, 0.333333), ("B", 2L, 2L, 0.0)))
  }

  test("cosineThresholdSweep: pair counts per threshold from one pass") {
    import spark.implicits._
    // k=1: a single cluster, so all 6 pairs are scoped. Pair cosines:
    // (0,1)=1.0 (0,2)=0.6 (0,3)=0 (1,2)=0.6 (1,3)=0 (2,3)=0.8.
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(0.6f, 0.8f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.cosineThresholdSweep(emb, 1, Seq(0.5, 0.9))
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((0.5, 4L), (0.9, 1L)))
  }

  test("semanticK: integer recurrence, fixture boundaries, sqrt schedule") {
    import graft.operators.Dedup.semanticK
    // floor at 8 for every small corpus, incl. the sf0.01 fixture (500)
    assert(Seq(0L, 1L, 8L, 500L, 1000L).map(semanticK).forall(_ == 8))
    // n = 2000 (sf0.1) lands EXACTLY on the k=8 boundary: 125*64 = 4*2000
    assert(semanticK(2000L) == 8)
    // one vector past the boundary engages the schedule
    assert(semanticK(2001L) == 9)
    // sf1/sf10-equivalent corpora: k ~= sqrt(n/31.25)
    assert(semanticK(20000L) == 26)   // 125*26^2 = 84500 >= 80000; 25^2 falls short
    assert(semanticK(200000L) == 80)  // 125*6400 = 800000 = 4*200000 exactly
    // recurrence minimality: k-1 always fails the bound when k > 8
    for (n <- Seq(2001L, 20000L, 123456L, 200000L, 987654321L)) {
      val k = semanticK(n).toLong
      assert(125 * k * k >= 4 * n)
      if (k > 8) assert(125 * (k - 1) * (k - 1) < 4 * n, s"n=$n k=$k not minimal")
    }
    // loud beyond the BIGINT 125*k*k domain
    intercept[IllegalArgumentException](semanticK(3000000000000000L))
  }

  test("semanticDedupCapped: identical-to-seed members force their cluster; drop pass identical") {
    // Knuth-hash seed predicate: h(id) % 125 == 0 holds for ids 0 and 65
    // (and NOT for 1, 66, 200 — verified against the samplingHash spec
    // values). A member with a vector IDENTICAL to a seed's shares every
    // SRP bucket in every table (same signs), so its candidacy is
    // hyperplane-draw-independent, and d2 = 0 makes the argmin forced.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // seed: cluster 0
      (65L, Seq(0.0f, 1.0f)),  // seed: cluster 65
      (1L, Seq(1.0f, 0.0f)),   // = seed 0 -> cluster 0, cos 1 -> dropped
      (66L, Seq(0.0f, 1.0f)),  // = seed 65 -> cluster 65, cos 1 -> dropped
      (200L, Seq(1.0f, 0.0f))  // = seed 0 -> cluster 0, dropped (not lowest)
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupCapped(emb, 0.9, dim = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, true), (1L, 0L, false), (65L, 65L, true), (66L, 65L, false),
      (200L, 0L, false)))
  }

  test("semanticDedupCapped: a corpus with no hash-chosen seed degrades to all-kept singletons") {
    // none of ids 1..3 satisfy h(id) % 125 == 0, so every vector is a
    // bucket-orphan: cid = own id (coalesce), trivially kept — the
    // documented deterministic degenerate case of the capped mode.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupCapped(emb, 0.5, dim = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 2L, true), (3L, 3L, true)))
  }

  test("cosineThresholdSweepCapped: per-threshold counts over the capped clustering") {
    import spark.implicits._
    // ids 1, 2 carry vectors identical to seed 0's -> forced into cluster
    // 0 with pair cosines all 1.0 (3 pairs). id 3 is orthogonal: whether
    // its draw-dependent buckets reach seed 0 or leave it a singleton,
    // its pair cosines (0.0) clear no threshold — counts are invariant.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.cosineThresholdSweepCapped(emb, Seq(0.5, 0.9), dim = 2)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((0.5, 3L), (0.9, 3L)))
  }

  test("lshCalibrationCurve: identical docs are always candidates; low buckets rarely") {
    // docs 1,2 identical (j=1 -> bucket 9); docs 3,4 share one shingle in
    // ten (j~0.05 -> bucket 0); singletons pad the corpus
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val out = Dedup.lshCalibrationCurve(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    // identical signatures share every band -> measured rate 1.0, and the
    // theory line at s_mid=0.95 is also ~1
    val (np9, nc9, m9, t9) = out(9L)
    assert(np9 == 1L && nc9 == 1L && m9 == 1.0 && t9 > 0.99)
    // the one-shared-shingle pair lands in bucket 0; theory there ~0.16
    val (np0, _, m0, t0) = out(0L)
    assert(np0 == 1L && t0 < 0.2)
    assert(m0 == 0.0 || m0 == 1.0) // a 1-pair bucket is all-or-nothing
    // rates are valid probabilities everywhere
    assert(out.values.forall { case (_, _, m, t) =>
      m >= 0.0 && m <= 1.0 && t >= 0.0 && t <= 1.0 })
  }

  test("minhashEstimatorCard: identical docs estimate exactly 1 with zero error") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashEstimatorCard(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // identical signatures: est = j = 1 -> bias 0, rmse 0 in bucket 9
    assert(out(9L) == (1L, 0.0, 0.0))
    // the dissimilar pair lands in bucket 0; |bias| <= rmse <= 1 always
    assert(out.contains(0L))
    assert(out.values.forall { case (_, b, r) =>
      math.abs(b) <= r + 1e-9 && r <= 1.0 })
  }

  test("winnowing: count profile bounds, short docs, and the detection guarantee") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // 6 shingles, 3 windows
      (2L, "a b c d"),           // 2 shingles < w: no full window
      (3L, "a b")                // < k tokens: no shingles at all
    ).toDF("doc_id", "text")
    val out = Dedup.winnowingFingerprints(docs, 3, 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 emits no row
    val d1 = out(0)
    assert((d1._2, d1._3) == (6L, 3L))
    assert(d1._4 >= 1L && d1._4 <= 3L) // >= 1 per window run, <= 1 per window
    assert(out(1) == (2L, 2L, 0L, 0L)) // too short for any full window
    // GUARANTEE: two docs sharing a >= w+k-1 = 6-token run must share a
    // fingerprint HASH, whatever surrounds the run
    val pair = Seq(
      (10L, "p q r s t u v w x y z zz"),
      (11L, "m1 m2 m3 s t u v w x n1 n2 n3"))
      .toDF("doc_id", "text") // shared run: "s t u v w x"
    val sel = Dedup.winnowingSelections(pair, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h10 = sel.filter(_._1 == 10L).map(_._2).toSet
    val h11 = sel.filter(_._1 == 11L).map(_._2).toSet
    assert((h10 & h11).nonEmpty,
      s"shared 6-token run produced disjoint fingerprints: $h10 vs $h11")
    // ...and the pair operator surfaces exactly that pair
    val pairs = Dedup.winnowingPairs(pair, 3, 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((10L, 11L)))
    // the df cap kills boilerplate-only matches: 5 identical docs share
    // every fingerprint, but each hash's df (5) exceeds maxDf = 4
    val boiler = (1L to 5L).map(i => (i, "b1 b2 b3 b4 b5 b6 b7 b8"))
      .toDF("doc_id", "text")
    assert(Dedup.winnowingPairs(boiler, 3, 4, 1L, maxDf = 4L)
      .collect().isEmpty)
  }
}
