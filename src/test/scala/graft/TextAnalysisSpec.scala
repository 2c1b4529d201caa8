package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId: marker majority wins; priority breaks ties; und fallback") {
    val docs = Seq(
      (1L, "the cat and the dog of to in"),        // en
      (2L, "der hund und die katze ist nicht"),    // de
      (3L, "xyzzy plugh qwerty"),                  // no markers -> und
      (4L, "the der")                              // 1-1 tie -> en (priority)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("lang_pred")).toSeq == Seq("en", "de", "und", "en"))
    assert(out(0).getAs[Long]("s_en") == 6L) // the×2, and, of, to, in — occurrences count
  }

  test("quality: exact ratios on a hand-built doc") {
    val docs = Seq((1L, "a a bb")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(docs).collect()(0)
    assert(r.getAs[Long]("n_chars") == 6L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 4.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 2.0 / 3) < 1e-12) // 'a' twice
    assert(math.abs(r.getAs[Double]("distinct_ratio") - 2.0 / 3) < 1e-12)
  }

  test("tokenCounts: BPE estimate is ceil(len/4) per token") {
    val docs = Seq((1L, "abcd abcdefgh x")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).collect()(0)
    assert(r.getAs[Long]("n_ws_tokens") == 3L)
    assert(r.getAs[Long]("n_bpe_est") == 1L + 2L + 1L)
  }

  test("tokenCounts: subword regex splits letter/digit/punct runs") {
    val docs = Seq((1L, "hello42 world, x-1")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).collect()(0)
    // hello|42, world|',', x|-|1 -> 7 subwords
    assert(r.getAs[Long]("n_subwords") == 7L)
  }

  test("normalize: lowercase, collapse spaces, trim") {
    val docs = Seq((1L, "  Hello   WORLD  x ")).toDF("doc_id", "text")
    val r = TextAnalysis.normalize(docs).collect()(0)
    assert(r.getString(1) == "hello world x")
  }

  test("packSequences: new sequence when the running budget is crossed") {
    // subword counts: 3 docs of 3 tokens each, budget 5:
    // cum-n = 0, 3, 6 -> seq ids 0, 0, 1
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i")).toDF("doc_id", "text")
    val out = TextAnalysis.packSequencesGlobalOracleOnly(docs, 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("seq_id")).toSeq == Seq(0L, 0L, 1L))
    assert(out.map(_.getAs[Long]("n_subwords")).toSeq == Seq(3L, 3L, 3L))
  }

  test("encode: vocab ids in token order, OOV -> -1, decode round-trips in-vocab tokens") {
    // vocab by freq desc, term asc at maxVocab=3: a(5) -> 0, b(3) -> 1,
    // c(2) -> 2; d and e fall out of vocabulary.
    val docs = Seq(
      (1L, "a b a c d"),
      (2L, "b e a c b a a")).toDF("doc_id", "text")
    val out = TextAnalysis.encode(docs, 3).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(5L, 7L))
    assert(out(0).getAs[scala.collection.Seq[Long]]("token_ids").toList == List(0L, 1L, 0L, 2L, -1L))
    assert(out(1).getAs[scala.collection.Seq[Long]]("token_ids").toList == List(1L, -1L, 0L, 2L, 1L, 0L, 0L))
    // decode round-trip: in-vocab positions reproduce the original tokens
    val vocab = TextAnalysis.vocabulary(docs, 3).collect()
      .map(r => r.getAs[Long]("term_id") -> r.getAs[String]("term")).toMap
    val decoded = out(1).getAs[scala.collection.Seq[Long]]("token_ids")
      .map(id => vocab.getOrElse(id, "<unk>")).mkString(" ")
    assert(decoded == "b <unk> a c b a a")
  }

  test("packSequencesGlobal two-level prefix-sum ≡ single-window global pack") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (budget <- Seq(50, 400)) {
      val got = TextAnalysis.packSequencesGlobal(docs, budget, buckets = 7)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = TextAnalysis.packSequencesGlobalOracleOnly(docs, budget)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == want.toSeq, s"budget $budget")
    }
  }

  test("packSequencesSharded: per-shard cumsum equals global packing of each shard") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "d e f", "en"), (3L, "g h i", "en"),
      (4L, "j k", "de"), (5L, "l m n o", "de"), (6L, "p", "de"))
      .toDF("doc_id", "text", "lang")
    val sharded = TextAnalysis.packSequencesSharded(docs, 5, "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    for (shard <- Seq("en", "de")) {
      val global = TextAnalysis.packSequencesGlobalOracleOnly(
          docs.filter($"lang" === shard).drop("lang"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fromSharded = sharded.filter(_._2 == shard)
        .map(t => (t._1, t._3, t._4)).toSet
      assert(fromSharded == global, s"shard $shard")
    }
  }

  test("chunk: windows cover every token; no pure-suffix trailing chunk") {
    // 7 tokens, chunkLen 3, overlap 1 -> step 2 -> kMax = ceil(4/2) = 2:
    // starts 0,2,4 — a 4th chunk ("g") would be a suffix of "e f g".
    val docs = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x"), (4L, "p q r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, 3, 1).orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, "a b c"), (1L, 1L, "c d e"), (1L, 2L, "e f g"),
      (3L, 0L, "x"), // empty doc emits nothing; 1-token doc emits itself
      (4L, 0L, "p q r"), (4L, 1L, "r s"))) // truncated tail with a new token
  }

  test("fingerprint is order-sensitive (unlike shingle sets)") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(docs).collect().map(_.getAs[Long]("fingerprint"))
    assert(fps(0) != fps(1))
  }

  test("vocabulary: dense ids in (freq desc, term asc) order, capped at maxVocab") {
    val docs = Seq(
      (1L, "b a a"),
      (2L, "a c b x")).toDF("doc_id", "text")
    // freqs: a=3, b=2, c=1, x=1 → ids a:0 b:1 c:2 x:3 (tie c<x by term)
    val all = TextAnalysis.vocabulary(docs, 10).orderBy("term_id").collect()
      .map(r => (r.getAs[Long]("term_id"), r.getAs[String]("term"), r.getAs[Long]("freq")))
    assert(all.toSeq == Seq((0L, "a", 3L), (1L, "b", 2L), (2L, "c", 1L), (3L, "x", 1L)))
    // the cap keeps the most frequent terms and ids stay dense from 0
    val top2 = TextAnalysis.vocabulary(docs, 2).orderBy("term_id").collect()
      .map(r => (r.getAs[Long]("term_id"), r.getAs[String]("term")))
    assert(top2.toSeq == Seq((0L, "a"), (1L, "b")))
  }

  test("ngramCounts: occurrence-counted bigrams, short docs drop out") {
    val docs = Seq(
      (1L, "to be or not to be"),
      (2L, "to be is to do"),
      (3L, "solo")).toDF("doc_id", "text") // < 2 tokens → no bigrams
    val out = TextAnalysis.ngramCounts(docs, 2, 100).collect()
      .map(r => r.getAs[String]("ngram") -> r.getAs[Long]("freq")).toMap
    assert(out("to be") == 3L)  // twice in doc 1, once in doc 2
    assert(out("be or") == 1L && out("not to") == 1L)
    assert(!out.keys.exists(_.contains("solo")))
    // top-k cut is total-ordered: k=1 must be the (freq desc, ngram asc) max
    val top1 = TextAnalysis.ngramCounts(docs, 2, 1).collect()
    assert(top1.length == 1 && top1(0).getAs[String]("ngram") == "to be")
  }

  test("tfidfTopK: document-specific terms outrank corpus-wide boilerplate") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the bone"),
      (3L, "the bird flew over the house")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, 2).orderBy("doc_id", "rank").collect()
    // 'the' appears in every doc -> df 3 -> smallest idf; tf 2 doesn't save it
    // against df-1 terms, so the top slots go to document-specific words.
    assert(out.length == 6) // 2 per doc
    val doc1Terms = out.filter(_.getLong(0) == 1L).map(_.getAs[String]("term")).toSet
    assert(!doc1Terms.contains("the"))
    assert(doc1Terms.subsetOf(Set("cat", "sat", "mat", "on")))
    // rank 1 term of each doc has df = 1 (unique to the doc)
    assert(out.filter(_.getAs[Long]("rank") == 1L).forall(_.getAs[Long]("df") == 1L))
    // ties broken by term asc: doc 1's df-1 terms all have tf 1, so rank
    // order is alphabetical among them
    val doc1 = out.filter(_.getLong(0) == 1L).map(_.getAs[String]("term")).toSeq
    assert(doc1 == doc1.sorted)
  }

  test("bm25TopK: hand-computed score, non-matching docs absent, k cut") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("apple"), 10).collect()
    // doc 3 has no query term -> not scored at all
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    // same Lucene-style formula, computed independently here
    val n = 3.0; val avgdl = 7.0 / 3.0; val df = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val byId = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(math.abs(byId(1L) - w(2, 3)) < 1e-6)
    assert(math.abs(byId(2L) - w(1, 2)) < 1e-6)
    assert(byId(1L) > byId(2L)) // more hits at comparable length wins
    // k cut keeps the best
    val top1 = TextAnalysis.bm25TopK(docs, Seq("apple"), 1).collect()
    assert(top1.length == 1 && top1(0).getLong(0) == 1L)
  }

  test("pmiBigrams: ln(4) on a hand corpus; minCount filters") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // N=6 tokens, M=3 bigrams; pmi(a b)=ln((2/3)/((3/6)*(2/6)))=ln 4,
    // pmi(a c)=ln((1/3)/((3/6)*(1/6)))=ln 4 as well
    val all = TextAnalysis.pmiBigrams(docs, 10, minCount = 1L).collect()
    assert(all.length == 2)
    assert(all.forall(r => math.abs(r.getAs[Double]("pmi") - math.log(4.0)) < 1e-6))
    assert(all.map(_.getAs[String]("bigram")).toSeq == Seq("a b", "a c")) // pmi tie -> bigram asc
    val freq = TextAnalysis.pmiBigrams(docs, 10, minCount = 2L).collect()
    assert(freq.map(_.getAs[String]("bigram")).toSeq == Seq("a b"))
  }

  test("boilerplateRemove: hot gram masked position-wise, clean docs intact") {
    val docs = Seq(
      (1L, "click here foo"),
      (2L, "click here bar baz"),
      (3L, "click here qux"),
      (4L, "totally original content"),
      (5L, "click here")).toDF("doc_id", "text")
    // 'click here' in 4/5 docs; frac 0.5 -> threshold ceil(2.5)=3 -> hot
    val out = TextAnalysis.boilerplateRemove(docs, n = 2, maxDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("foo", "bar baz", "qux", "totally original content", ""))
    assert(out.map(_.getAs[Long]("n_removed")).toSeq == Seq(2L, 2L, 2L, 0L, 2L))
    val r5 = out(4)
    assert(r5.getAs[Long]("n_tokens") == 2L &&
      r5.getAs[Double]("boilerplate_ratio") == 1.0)
    assert(out(3).getAs[Double]("boilerplate_ratio") == 0.0)
  }

  test("boilerplateRemove: overlapping hot-gram occurrences cover the union") {
    val docs = Seq(
      (1L, "x y x y z"), (2L, "x y a"), (3L, "x y b"), (4L, "c d e")
    ).toDF("doc_id", "text")
    // 'x y' hot (3/4 docs >= ceil(0.5*4)=2); doc 1 has starts 1 and 3 ->
    // positions 1,2,3,4 covered; 'y x' (df 1) is not hot
    val out = TextAnalysis.boilerplateRemove(docs, 2, 0.5).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "z")
    assert(out(0).getAs[Long]("n_removed") == 4L)
  }

  test("packMaterialize: sequences carry ordered <eos>-joined member texts") {
    // 3 subwords each; budget 6 -> docs (1,2) in seq 0, doc 3 in seq 1
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packMaterialize(docs, 6).orderBy("seq_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("seq_text") == "a b c <eos> d e f")
    assert(out(0).getAs[Long]("n_docs") == 2L && out(0).getAs[Long]("seq_tokens") == 6L)
    assert(out(1).getAs[String]("seq_text") == "g h i")
  }

  test("hashingTrickVectors: counts conserve tokens, slots bounded and stable") {
    val docs = Seq((1L, "x y x"), (2L, "x z")).toDF("doc_id", "text")
    val out = TextAnalysis.hashingTrickVectors(docs, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, s, _) => s >= 0 && s < 16 })
    // token conservation per doc
    assert(out.filter(_._1 == 1L).map(_._3).sum == 3L)
    assert(out.filter(_._1 == 2L).map(_._3).sum == 2L)
    // same term -> same slot in every doc: 'x' contributes to one shared slot
    val xSlot1 = out.filter(t => t._1 == 1L && t._3 == 2L).map(_._2) // x twice in doc 1
    assert(xSlot1.length == 1)
    assert(out.exists(t => t._1 == 2L && t._2 == xSlot1.head)) // x's slot in doc 2 too
  }

  test("bpeMerges: matches an imperative greedy BPE reference") {
    val docs = Seq((1L, "banana banana bandana"), (2L, "naan ban aaaa"))
      .toDF("doc_id", "text")
    // imperative reference: exact greedy left-to-right BPE on word freqs
    def ref(words: Seq[(String, Long)], n: Int): Seq[(Long, String, String, String, Long)] = {
      var ws = words.map { case (w, f) => (w.map(_.toString).toList, f) }
      (1 to n).map { k =>
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        ws.foreach { case (toks, f) =>
          toks.zip(toks.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f) }
        val ((l, r), pf) = pc.toSeq.sortBy { case ((a, b), f) => (-f, a, b) }.head
        ws = ws.map { case (toks, f) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += toks(i); i += 1 }
          }
          (out.toList, f)
        }
        (k.toLong, l, r, l + r, pf)
      }
    }
    val wordFreqs = Seq("banana" -> 2L, "bandana" -> 1L, "naan" -> 1L,
      "ban" -> 1L, "aaaa" -> 1L)
    val expected = ref(wordFreqs, 5)
    val got = TextAnalysis.bpeMerges(docs, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the aaaa word forces the greedy-overlap rule ('a','a' run parity)
    assert(expected.exists { case (_, l, r, _, _) => l == r })
  }

  test("vocabCoverage: occurrence-coverage curve on a hand corpus") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // freqs: a=3, b=2, c=1 (total 6) -> top1 3/6, top2 5/6, top3 6/6
    val out = TextAnalysis.vocabCoverage(docs, Seq(1, 2, 3))
      .orderBy("vocab_size").collect()
    assert(out.map(_.getAs[Long]("covered_tokens")).toSeq == Seq(3L, 5L, 6L))
    assert(out.map(_.getAs[Double]("coverage")).toSeq == Seq(0.5, 5.0 / 6, 1.0))
    assert(out.forall(_.getAs[Long]("total_tokens") == 6L))
  }

  test("sourceProfile: per-(source, lang) counts and mean distinct ratio") {
    val docs = Seq(
      (1L, "a a", "s1", "en"), (2L, "a b", "s1", "en"), (3L, "x", "s2", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.sourceProfile(docs).orderBy("source").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_docs") == 2L && out(0).getAs[Long]("n_tokens") == 4L)
    // ratios 0.5 and 1.0 -> mean 0.75
    assert(out(0).getAs[Double]("mean_distinct_ratio") == 0.75)
    assert(out(1).getAs[String]("lang") == "de" && out(1).getAs[Long]("n_tokens") == 1L)
  }

  test("perplexity: hand-computed unigram-LM surprise") {
    val docs = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    // corpus: c_a=2, c_b=1, N=3. doc1: lnPP = -ln(2/3) = ln 1.5; doc2: ln 3
    val out = TextAnalysis.perplexity(docs).orderBy("doc_id").collect()
    assert(math.abs(out(0).getAs[Double]("log_perplexity") - math.log(1.5)) < 1e-5)
    assert(math.abs(out(0).getAs[Double]("perplexity") - 1.5) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("perplexity") - 3.0) < 1e-5)
    assert(out(0).getAs[Long]("n_tokens") == 2L)
  }

  test("perplexityBigram: hand-computed interpolated bigram-LM surprise") {
    // doc1 "a b a b": bigrams (a,b)×2, (b,a)×1; doc2 "a c": (a,c)×1;
    // doc3 "solo": no bigram events -> no row, but its token still
    // trains the unigram back-off (N counts ALL corpus tokens).
    // Corpus: N=7, c_a=3, c_b=2, c_c=1, c_solo=1; cb(a,b)=2, cb(b,a)=1,
    // cb(a,c)=1; context totals cp(a)=3, cp(b)=1. λ=0.75:
    //   p(a,b)=.75·(2/3)+.25·(2/7)=4/7, p(b,a)=.75·1+.25·(3/7)=6/7,
    //   p(a,c)=.75·(1/3)+.25·(1/7)=2/7.
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBigram(docs).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    val lnPp1 = -(2.0 * math.log(4.0 / 7) + math.log(6.0 / 7)) / 3
    assert(math.abs(out(0).getAs[Double]("log_perplexity") - lnPp1) < 1e-5)
    // doc2: lnPP = -ln(2/7), PP = 3.5 exactly
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(math.abs(out(1).getAs[Double]("perplexity") - 3.5) < 1e-5)
  }

  test("perplexityBigram: shuffled text scores higher than its templated twin") {
    // Same unigram bag in every doc -> the unigram filter can't separate
    // them; the bigram model prefers the corpus-dominant word ORDER.
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"), (4L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBigram(docs).orderBy("doc_id").collect()
    val pp = out.map(_.getAs[Double]("perplexity"))
    assert(pp(3) > pp(0) * 1.5)
    assert(pp(0) == pp(1) && pp(1) == pp(2))
  }

  test("lengthBuckets: quartile boundaries split 1..4 into four buckets") {
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    // lengths 1,2,3,4 -> quartiles (1.75, 2.5, 3.25) -> buckets 1,2,3,4
    val out = TextAnalysis.lengthBuckets(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("n_subwords")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("postingsIndex: sorted lists, df cap drops stopword-sized rows") {
    val docs = Seq((3L, "x common"), (1L, "x y common"), (2L, "y common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.postingsIndex(docs).orderBy("term").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out("common") == (3L, Seq(1L, 2L, 3L))) // sorted despite input order
    assert(out("x") == (2L, Seq(1L, 3L)))
    assert(out("y") == (2L, Seq(1L, 2L)))
    val capped = TextAnalysis.postingsIndex(docs, maxDf = 2L).collect()
      .map(_.getString(0)).toSet
    assert(capped == Set("x", "y")) // 'common' (df 3) dropped entirely
  }

  test("skipgramCounts: window-1 adjacency vs window-2 reach, hand counts") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    def pairs(w: Int) = TextAnalysis.skipgramCounts(docs, w, 100).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w1 = pairs(1)
    assert(w1 == Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L))
    val w2 = pairs(2)
    assert(w2(("a", "c")) == 1L && w2(("c", "a")) == 1L && w2.size == 6)
  }

  test("entropy: ln 2 for a 2-symbol uniform doc; 0 and NULL norm for constant") {
    val docs = Seq((1L, "a a b b"), (2L, "x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.entropy(docs).orderBy("doc_id").collect()
    // doc 1: H = ln4 - (2ln2 + 2ln2)/4 = ln2; norm = ln2/ln2 = 1
    assert(math.abs(out(0).getAs[Double]("entropy") - math.log(2.0)) < 1e-5)
    assert(math.abs(out(0).getAs[Double]("norm_entropy") - 1.0) < 1e-5)
    assert(out(0).getAs[Long]("n_tokens") == 4L && out(0).getAs[Long]("n_distinct") == 2L)
    // doc 2: single symbol -> H = 0, norm 0/0 -> NULL
    assert(out(1).getAs[Double]("entropy") == 0.0)
    assert(out(1).isNullAt(out(1).fieldIndex("norm_entropy")))
  }

  test("selectByBudget: greedy best-first cut matches a serial reference") {
    val docs = (1 to 40).map { i =>
      // vary distinct-ratio and length deterministically
      val reps = 1 + i % 4
      val toks = (0 until 6).map(j => s"w${(i * 7 + j) % (3 + i % 5)}")
      (i.toLong, (toks ++ toks.take(reps)).mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 120L
    val out = TextAnalysis.selectByBudget(docs, budget, buckets = 4)
      .orderBy("doc_id").collect()
    // serial reference: sort by (score desc, id), cumsum, keep <= budget
    val scored = docs.collect().map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val score = toks.distinct.length.toDouble / toks.length
      val sub = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+".r.findAllIn(r.getString(1)).length.toLong
      (r.getLong(0), score, sub)
    }
    var cum = 0L
    val expected = scored.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, s, n) =>
      cum += n; if (cum <= budget) Some((id, s, n, cum)) else None
    }.sortBy(_._1)
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
      == expected.toSeq)
    assert(expected.nonEmpty && expected.length < 40) // the cut actually bites
  }

  test("fertility: hand counts per language; zero-token docs yield NULL ratios") {
    // "ab cd" -> 2 words, 2 subwords, 5 chars; "a1b" -> 1 word, 3 subwords
    // ([a][1][b]), 3 chars
    val docs = Seq((1L, "ab cd", "en"), (2L, "a1b", "xx"), (3L, "", "zz"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.fertility(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getLong(2) == 2 && out("en").getLong(3) == 2)
    assert(out("en").getDouble(4) == 1.0)            // 2 subwords / 2 words
    assert(out("en").getDouble(5) == 2.5)            // 5 chars / 2 subwords
    assert(out("xx").getDouble(4) == 3.0)            // 3 subwords / 1 word
    assert(out("zz").isNullAt(4) && out("zz").isNullAt(5)) // degenerate group
  }

  test("hapaxProfile: exact hapax share per source") {
    val docs = Seq(
      (1L, "a b a", "s1"),   // s1 terms: a(2) b(1) c(1) -> 2/3 hapax
      (2L, "c", "s1"),
      (3L, "x x y y", "s2")) // s2: none hapax
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.hapaxProfile(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((3L, 2L, 0.666667)))
    assert(out("s2") == ((2L, 0L, 0.0)))
  }

  test("packStats: utilization is tokens over sequences times budget") {
    // one shard, budget 10: docs of 6+6+4 subwords -> seqs 0,0,1 (cum 6,12,16)
    val docs = Seq(
      (1L, "aa bb cc dd ee ff", "en"),
      (2L, "aa bb cc dd ee ff", "en"),
      (3L, "aa bb cc dd", "en"))
      .toDF("doc_id", "text", "lang")
    val packed = TextAnalysis.packSequencesSharded(docs, 10, "lang")
    val st = TextAnalysis.packStats(packed, 10).collect()
    assert(st.length == 1)
    val r = st(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L && r.getLong(3) == 16L)
    assert(r.getDouble(4) == 0.8) // 16 / (2 * 10)
  }

  test("bigramModel: argmax successor with exact conditional probability") {
    val docs = Seq(
      (1L, "a b a b a c"),   // a->b x2, b->a x2, a->c x1
      (2L, "a b"))           // a->b x1
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramModel(docs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == (("b", 3L, 0.75)))  // 3 of a's 4 successors
    assert(out("b") == (("a", 2L, 1.0))) // b is only ever followed by a
    assert(!out.contains("c"))             // c ends both docs: no successor
  }

  test("zipfSlope: exact -1 slope on a constructed power-law corpus") {
    // freq(rank) = 60/rank for ranks 1..4 -> log-log slope exactly -1.
    val words = (1 to 4).flatMap(r => Seq.fill(60 / r)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.zipfSlope(docs, 10).collect()(0)
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-3)
  }

  test("dedupLines: corpus-hot lines dropped everywhere, order preserved") {
    // "cookie banner" appears in 3 docs (> maxDocs=2) -> dropped from all;
    // "unique" lines survive; doc 4 is ALL boilerplate -> empty clean_text.
    val lines = Seq(
      (1L, 0L, "cookie banner"), (1L, 1L, "real content one"),
      (2L, 0L, "real content two"), (2L, 1L, "cookie banner"),
      (3L, 5L, "cookie banner"), (3L, 2L, "tail line"),
      (4L, 0L, "cookie banner"))
      .toDF("doc_id", "line_no", "line")
    val out = TextAnalysis.dedupLines(lines, maxDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("real content one", 2L, 1L)))
    assert(out(2L) == (("real content two", 2L, 1L)))
    assert(out(3L) == (("tail line", 2L, 1L)))  // line_no order, not insertion
    assert(out(4L) == (("", 1L, 1L)))           // fully-boilerplate doc kept, empty
  }

  test("dedupLines: duplicate lines WITHIN one doc don't count as corpus-hot") {
    // df counts DISTINCT docs: 3 repeats inside doc 1 = df 1 -> kept.
    val lines = Seq((1L, 0L, "x"), (1L, 1L, "x"), (1L, 2L, "x"))
      .toDF("doc_id", "line_no", "line")
    val out = TextAnalysis.dedupLines(lines, maxDocs = 2).collect()(0)
    assert(out.getString(1) == "x x x" && out.getLong(3) == 0L)
  }

  test("langIdMargin: margin separates confident from ambiguous docs") {
    val docs = Seq(
      (1L, "the the the and of"),       // en score 5, others 0 -> margin 5
      (2L, "the der"),                   // en 1, de 1 -> margin 0, en wins by priority
      (3L, "zzz qqq"))                   // no markers -> und, margin 0, NULL share
      .toDF("doc_id", "text")
    val out = TextAnalysis.langIdMargin(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "en" && out(1L).getLong(3) == 5L
      && out(1L).getDouble(4) == 1.0)
    assert(out(2L).getString(1) == "en" && out(2L).getLong(3) == 0L)
    assert(out(3L).getString(1) == "und" && out(3L).getLong(3) == 0L
      && out(3L).isNullAt(4))
  }

  test("wordLengthHistogram: counts by length with distinct types") {
    val docs = Seq((1L, "aa bb ccc aa"), (2L, "d ccc")).toDF("doc_id", "text")
    val out = TextAnalysis.wordLengthHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)))       // "d"
    assert(out(2L) == ((3L, 2L)))       // aa aa bb
    assert(out(3L) == ((2L, 1L)))       // ccc x2, one type
  }

  test("qualityGate: per-source p25 thresholds; zero-token never passes") {
    val docs = Seq(
      (1L, "A", "a b c d"),  // ratio 1.0
      (2L, "A", "a a b b"),  // 0.5
      (3L, "A", "a a a a"),  // 0.25 < A's p25 -> dropped
      (4L, "A", "x y"),      // 1.0
      (5L, "B", "p p"),      // 0.5 < B's p25 -> dropped
      (6L, "B", "p q"),      // 1.0
      (7L, "B", "")          // zero tokens: NULL score, kept = false
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.qualityGate(docs, 0.25).orderBy("doc_id").collect()
    val kept = out.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(kept == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> true, 7L -> false))
    // interpolated per-source thresholds: A = 0.4375, B = 0.625
    val thr = out.map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(thr("A") == 0.4375 && thr("B") == 0.625)
    // zero-token doc carries a NULL score through to the output
    assert(out.find(_.getLong(0) == 7L).get.isNullAt(2))
  }

  test("dedupSpans: repeated trigram span dropped, first occurrence kept") {
    val docs = Seq(
      (1L, "a b c x a b c y"),      // second "a b c" covers positions 4-6
      (2L, "p q r s"),              // no repeats: untouched
      (3L, "a b a b a b")           // chained bigram... trigram "a b a" at 0 and 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(docs, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c x y", 8L, 3L)))
    assert(out(1) == ((2L, "p q r s", 4L, 0L)))
    // doc 3: grams "a b a"@0, "b a b"@1, "a b a"@2 (dup -> covers 2..4),
    // "b a b"@3 (dup -> covers 3..5): kept = positions 0, 1 -> "a b"
    assert(out(2) == ((3L, "a b", 6L, 4L)))
  }

  test("dedupSpans: chained dup starts extend coverage; uncovered tail survives") {
    // "x y z x y z x y": dup starts at 3 ("x y z"), 4 ("y z x"), and
    // 5 ("z x y") chain their spans over positions 3..7 -> "x y z"
    val docs = Seq((1L, "x y z x y z x y")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(docs, 3).collect()
    assert(out(0).getString(1) == "x y z" && out(0).getLong(3) == 5L)
    // one dup span then fresh tokens: the tail past the span survives
    val docs2 = Seq((1L, "x y z x y z w x")).toDF("doc_id", "text")
    val out2 = TextAnalysis.dedupSpans(docs2, 3).collect()
    assert(out2(0).getString(1) == "x y z w x" && out2(0).getLong(3) == 3L)
  }

  test("ngramNovelty: first occurrence owns the gram; verbatim copy scores 0") {
    val docs = Seq(
      (1L, "a b c d"),      // grams abc, bcd: both novel -> 1.0
      (2L, "a b c d"),      // verbatim copy: 0 novel -> 0.0
      (3L, "a b c x")       // abc seen (doc 1), bcx novel -> 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 1L, 0.5)))
  }

  test("langMismatch: agreement, disagreement, and und-counts-as-mismatch") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),   // en markers -> agrees
      (2L, "the cat and the dog", "fr"),   // en prediction vs declared fr
      (3L, "xyzzy qwerty", "en"))          // no markers -> und -> mismatch
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langMismatch(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, "en", "en", false),
      (2L, "fr", "en", true),
      (3L, "en", "und", true)))
  }

  test("rareTokenRatio: occurrence-counted hapax share; repeats of a rare term stay rare") {
    val docs = Seq(
      (1L, "the cat sat"),          // cat/sat shared below -> only "the" is... see df
      (2L, "cat sat mat"),          // shares cat/sat with 1, mat hapax
      (3L, "zq zq zq the"))         // zq appears in ONE doc (df=1) but 3 times
      .toDF("doc_id", "text")
    // df: the={1,3}=2, cat={1,2}=2, sat={1,2}=2, mat={2}=1, zq={3}=1
    val out = TextAnalysis.rareTokenRatio(docs, maxDf = 1L, maxRatio = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0.0, false),
      (2L, 3L, 1L, 0.333333, false),
      (3L, 4L, 3L, 0.75, true)))   // 3 zq occurrences of a df=1 term
  }

  test("charClassProfile: per-source char-class fractions") {
    val docs = Seq(
      (1L, "a", "ab 12!"), // 2 alpha, 2 digit, 1 space, 1 other
      (2L, "a", "xy"),     // 2 alpha
      (3L, "b", "..."))    // 3 other
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.charClassProfile(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 8L, 0.5, 0.25, 0.125, 0.125),
      ("b", 3L, 0.0, 0.0, 0.0, 1.0)))
  }

  test("simpsonDiversity: exact repeat-rate complement; single token -> null") {
    val docs = Seq(
      (1L, "a", "x x y"), // f(x)=2 f(y)=1: 1 - 2/(3*2) = 0.666667
      (2L, "b", "z"))     // N=1: undefined
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.simpsonDiversity(docs).orderBy("source").collect()
    assert((out(0).getString(0), out(0).getLong(1), out(0).getLong(2),
      out(0).getDouble(3)) == (("a", 3L, 2L, 0.666667)))
    assert(out(1).getString(0) == "b" && out(1).isNullAt(3))
  }

  test("heapsLaw: two-point fit recovers the log-log slope") {
    val docs = Seq(
      (0L, "a b a"), // bucket 0: 3 tokens, types {a, b}
      (1L, "a c"))   // bucket 1: +2 tokens, +1 new type
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, nBuckets = 2).collect()(0)
    assert(r.getLong(0) == 2L)
    // (ln3 - ln2) / (ln5 - ln3) = 0.793745...
    assert(math.abs(r.getDouble(1) - 0.793745) < 1e-3, r.getDouble(1))
  }

  test("giniConcentration: uniform -> 0, hand-computed skewed case") {
    import graft.operators.TextAnalysis
    // uniform: every term once -> gini 0
    val uni = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val g0 = TextAnalysis.giniConcentration(uni, 200).collect().head
    assert((g0.getLong(0), g0.getLong(1), g0.getDouble(2)) == (4L, 4L, 0.0))
    // freqs {a:3, b:1}: ascending (1,3) -> (1*(2-3) + 3*(4-3))/(2*4) = 0.25
    val skew = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val g1 = TextAnalysis.giniConcentration(skew, 200).collect().head
    assert((g1.getLong(0), g1.getLong(1), g1.getDouble(2)) == (2L, 4L, 0.25))
  }

  test("patternScan: per-group totals and row counts in one pass") {
    import graft.operators.TextAnalysis
    val df = Seq(
      ("a", "mail me at x@y.com or z@w.org code 12345"),
      ("a", "no pii here"),
      ("b", "one 9876 two 54321")).toDF("src", "body")
    val out = TextAnalysis.patternScan(df, "body", "src", Seq(
        "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "digitrun" -> "[0-9]{4,}"))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 2L, 2L, 1L, 1L, 1L),   // 2 emails in 1 row; 1 digit run
      ("b", 1L, 0L, 0L, 2L, 1L)))  // 2 digit runs in 1 row
  }

  test("keynessTopTerms: each source's signature token ranks first") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "foo foo foo shared", "A"), (2L, "foo foo shared", "A"),
      (3L, "bar bar bar shared", "B"), (4L, "bar bar shared", "B"))
      .toDF("doc_id", "text", "source")
    val top1 = TextAnalysis.keynessTopTerms(docs, 1, 200)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(top1.toSeq == Seq(("A", 1L, "foo"), ("B", 1L, "bar")))
  }


  test("termDispersion: bursty term has higher VMR than uniform filler") {
    import graft.operators.TextAnalysis
    // "the" once per doc (uniform); "cat" piles into one doc (bursty)
    val docs = Seq((1L, "the cat cat cat cat"), (2L, "the x"),
      (3L, "the y"), (4L, "the z")).toDF("doc_id", "text")
    val out = TextAnalysis.termDispersion(docs, 200).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val (dfThe, fThe, vmrThe) = out("the")
    assert((dfThe, fThe) == (4L, 4L) && vmrThe == 0.0) // exactly uniform
    val (dfCat, fCat, vmrCat) = out("cat")
    // cat: counts (4,0,0,0): mean 1, E[x2] 4 -> var 3 -> vmr 3
    assert((dfCat, fCat) == (1L, 4L) && vmrCat == 3.0)
  }


  test("readability: hand-computed Flesch on a two-sentence doc") {
    import graft.operators.TextAnalysis
    // "See the cat. It ran!": words 5, sentences 2, syllable groups:
    // ee, e, a, I, a -> 5
    val docs = Seq((1L, "See the cat. It ran!"), (2L, "...")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
    assert(out.length == 1) // zero-word doc drops
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (5L, 2L, 5L))
    val ease = 206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5)
    assert(math.abs(r.getDouble(4) - ease) < 1e-6)
    val fk = 0.39 * (5.0 / 2) + 11.8 * (5.0 / 5) - 15.59
    assert(math.abs(r.getDouble(5) - fk) < 1e-6)
  }

  test("g2Collocations: hand-computed 2x2 log-likelihood, zero cells guarded") {
    // corpus "a b a b": bigrams (a b)x2, (b a)x1; m=3
    // for "a b": k11=2, R=c(a·)=2, C=c(·b)=2 -> k12=0, k21=0, k22=1
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.g2Collocations(docs, 10, minCount = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val g2ab = 2.0 * (2.0 * math.log(2.0 * 3.0 / (2.0 * 2.0)) +
      1.0 * math.log(1.0 * 3.0 / (1.0 * 1.0)))
    assert(out("a b")._1 == 2L)
    assert(math.abs(out("a b")._2 - g2ab) < 1e-6)
    // "b a": k11=1, R=c(b·)=1, C=c(·a)=1, k12=k21=0, k22=2
    val g2ba = 2.0 * (1.0 * math.log(1.0 * 3.0 / (1.0 * 1.0)) +
      2.0 * math.log(2.0 * 3.0 / (2.0 * 2.0)))
    assert(math.abs(out("b a")._2 - g2ba) < 1e-6)
    // minCount prunes; top-k caps the list
    assert(TextAnalysis.g2Collocations(docs, 10, minCount = 3).isEmpty)
    assert(TextAnalysis.g2Collocations(docs, 1, minCount = 1).count() == 1L)
  }

  test("jsdBySource: identical sources diverge 0, disjoint hit ln 2") {
    val docs = Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2"),  // identical distributions
      (3L, "x y", "s3"))                          // disjoint from both
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.jsdBySource(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("s1", "s2")) == (2L, 0.0))
    // disjoint supports: jsd = ln 2, union support = 2 + 2 terms
    assert(out(("s1", "s3"))._1 == 4L)
    assert(math.abs(out(("s1", "s3"))._2 - math.log(2.0)) < 1e-5)
    assert(math.abs(out(("s2", "s3"))._2 - math.log(2.0)) < 1e-5)
    // symmetric by construction: only a < b pairs emitted
    assert(out.size == 3)
  }

  test("decode: inverse of encode — in-vocab text round-trips, OOV becomes <unk>") {
    val docs = Seq(
      (1L, "red blue red green"),
      (2L, "red rare")) // "rare" falls outside a 3-term vocab
      .toDF("doc_id", "text")
    val enc = TextAnalysis.encode(docs, 3)
    val out = TextAnalysis.decode(enc,
        TextAnalysis.vocabulary(docs, 3).select("term", "term_id"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // vocab (freq desc, term): red(3), blue(1), green(1) -> rare is OOV
    assert(out(0) == (1L, 4L, 0L, "red blue red green"))
    assert(out(1) == (2L, 2L, 1L, "red <unk>"))
  }

  test("msttr: full segments only, segment TTRs hand-averaged per source") {
    // doc 1 (2-token segments): [a b] TTR 1, [a a] TTR 0.5
    // doc 2: [a b] TTR 1, trailing [c] is a partial segment -> dropped
    // doc 3 (other source): one token -> no full segment, source absent
    val docs = Seq((1L, "s1", "a b a a"), (2L, "s1", "a b c"),
      (3L, "s2", "x")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.msttr(docs, segLen = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("s1", 2L, 3L, 0.833333)))
  }

  test("charBigramEntropy: hand conditional entropy; truncation; len<2 drop") {
    // "abab": bigrams ab×2 ba×1 (s_bg 2 ln 2), prefixes a×2 b×1 (s_c1
    // 2 ln 2) -> H = 0 (deterministic successor). "aabb": bigrams
    // aa ab bb ×1 (s_bg 0), prefixes a×2 b×1 (s_c1 2 ln 2) ->
    // H = round(2 ln 2, 6)/3 = 0.462098. Source mean = 0.231049.
    val docs = Seq((1L, "s1", "abab"), (2L, "s1", "aabb"),
      (3L, "s1", "x")) // len < 2 -> dropped entirely
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.charBigramEntropy(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == (2L, 6L, 0.231049))
    // maxChars truncation: "abcdef" -> "abc" = bigrams ab bc, each
    // prefix unique -> H = 0, and only 2 bigrams counted
    val t = TextAnalysis.charBigramEntropy(
        Seq((4L, "s2", "abcdef")).toDF("doc_id", "source", "text"),
        maxChars = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(t.toSeq == Seq(("s2", 1L, 2L, 0.0)))
  }

  test("mlmMasking: hand-hashed positions, 80/10/10 actions, decorrelated docs") {
    val text = (0 until 20).map(i => f"w$i%02d").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.mlmMasking(docs).collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getString(4))).toMap
    // doc 1 selects positions 1/9/17, doc 2 selects 5/13/18 — the
    // two-round hash decorrelates documents (one round masked the SAME
    // positions in both)
    assert(out.keySet == Set((1L, 1L), (1L, 9L), (1L, 17L),
      (2L, 5L), (2L, 13L), (2L, 18L)))
    // h%10 = 8 at (1,1): random replacement = vocab[(h div 10) % 20] = w09
    assert(out((1L, 1L)) == ("w01", "random", "w09"))
    assert(out((1L, 9L)) == ("w09", "mask", "[MASK]"))
    assert(out((2L, 18L)) == ("w18", "mask", "[MASK]"))
  }

  test("langIdEval: confusion counts and row-normalized recall shares") {
    val docs = Seq(
      (1L, "en", "the cat and the dog"),      // -> en (correct)
      (2L, "en", "der hund und die katze"),   // -> de (miss)
      (3L, "de", "der hund und die katze"),   // -> de (correct)
      (4L, "de", "xyzzy qqq"))                // -> und (miss)
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdEval(docs).collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("en", "en")) == (1L, 0.5))
    assert(out(("en", "de")) == (1L, 0.5))
    assert(out(("de", "de")) == (1L, 0.5))
    assert(out(("de", "und")) == (1L, 0.5))
    assert(out.size == 4)
  }

  test("yuleK: hand-computed K; uniform text scores high, rich text low") {
    val docs = Seq(
      (1L, "a a b", "s1"),      // f = (2,1): N=3, Σf²=5, K = 1e4·2/9
      (2L, "x x x x", "s2"))    // f = (4):   N=4, Σf²=16, K = 1e4·12/16
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.yuleK(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((2L, 3L, 2222.222222)))
    assert(out("s2") == ((1L, 4L, 7500.0)))
  }

  test("termBurstiness: clumped term Fano > spread term; absences count as zeros") {
    val docs = Seq(
      (1L, "a a a"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs, maxVocab = 10).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // a: per-doc counts (3,1,0): Fano = (3·10−16)/(3·4) = 14/12
    assert(out("a") == ((2L, 4L, 1.166667)))
    // b: counts (0,0,1): Fano = (3·1−1)/(3·1) = 2/3
    assert(out("b") == ((1L, 1L, 0.666667)))
  }

}
