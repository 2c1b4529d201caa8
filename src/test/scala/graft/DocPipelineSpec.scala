package graft

import graft.operators.DocPipeline

class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("prepare: every stage fires — scrub-induced dedup, quality gate, split, packing") {
    val words = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"$words see http://a.example/x"),   // URL scrubbed
      (2L, s"$words see http://b.example/y"),   // DIFFERENT url -> same after scrub
      (3L, "too short"),                        // fails min-token gate
      (4L, ("the and of to in " * 6).trim),     // stopword ratio 1.0 -> dropped
      (5L, (100 to 140).map(i => s"w$i").mkString(" "))) // clean survivor
      .toDF("doc_id", "text")
    val out = DocPipeline.prepare(docs, minTokens = 25, maxStopwordRatio = 0.15,
        valFrac = 0.1, testFrac = 0.1, budget = 40)
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // 3 and 4 fail the gate; 1 and 2 become identical after scrubbing -> keep 1
    assert(ids == Seq(1L, 5L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(Set("train", "val", "test").contains(byId(1L)._1))
    // doc 1: 30 words + 'see' + '<URL>' -> subword count > 30; packing starts at seq 0
    assert(byId(1L)._2 > 30L)
    assert(out.map(_.getLong(3)).forall(_ >= 0L))
  }

  test("prepareLlm: every stage fires — cluster dedup, 4-gram decontamination, mixture hash-drop, packing") {
    // Hand-traced chain:
    //  - docs 1,2 share a cluster (labels provided) -> rep 1 survives;
    //  - doc 3 shares the 4-gram "one two three four" with eval doc 10
    //    -> decontaminated away; docs 1,4,5 are vocabulary-disjoint;
    //  - weights A:1 B:1, budget 12 -> target 6 each. A's clean total is
    //    6 tokens -> rate 1 (doc 1 kept though h(1)=2654435761 is high);
    //    B's total is 13 -> thr = floor(2^32*6/13) = 1982292598, so
    //    h(4)=2027808452 drops and h(5)=387276917 stays — the
    //    hash-threshold rule really fires;
    //  - packing shards by lang, both survivors open seq 0.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "A", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "A", "en"),
      (3L, "leak one two three four tail", "A", "en"),
      (4L, "quick brown foxes jump over lazy dogs", "B", "fr"),
      (5L, "five unique tokens here again now", "B", "fr"),
      (10L, "eval doc one two three four end", "EV", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 5L),
      (10L, 10L)).toDF("doc_id", "cluster_id")
    val out = DocPipeline.prepareLlm(docs, clusters, Seq("EV"),
        Map("A" -> 1.0, "B" -> 1.0), 12L, seqBudget = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 5L),
      s"expected survivors 1 (cluster rep, rate-1 source) and 5 " +
        s"(hash-kept); got ${out.mkString(", ")}")
    assert(out.map(_._2).toSeq == Seq("en", "fr"))
    assert(out.forall(r => r._3 > 0L && r._4 == 0L))
  }

  test("prepareAndEval: disjoint vocabularies generalize perfectly through the chain") {
    import org.apache.spark.sql.functions.col
    // 80 unique 26-token docs (pass the gate, survive dedup), two
    // languages with fully disjoint vocabularies -> the NB trained on
    // the train shard must classify every test-shard doc correctly
    val docs = (1L to 80L).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val base = (1 to 25).map(j => s"${lang}tok$j").mkString(" ")
      (i, s"$base uniq$i", lang)
    }.toDF("doc_id", "text", "lang")
    val out = graft.operators.DocPipeline.prepareAndEval(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall(_._3 == 1.0), out.mkString(", "))
    // both sides of the chain saw real data: test shard is a strict
    // subset of the corpus
    assert(out.map(_._2).sum < 80L && out.map(_._2).sum > 0L)
  }
}
