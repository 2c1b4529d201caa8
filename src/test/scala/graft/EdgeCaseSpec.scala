package graft

import org.apache.spark.sql.DataFrame
import graft.analytics.Analytics
import graft.etl.Merge
import graft.operators.{DataQuality, Dedup, Graph, Sketch, TextAnalysis}

/** Degenerate-input behavior: operators must return EMPTY (or the
  * documented degenerate row), never throw, on empty and single-row
  * inputs — the partitions-at-the-tail reality of a 100 TB run, where
  * some shard is always empty.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc: DataFrame = Seq((1L, "solo words here")).toDF("doc_id", "text")

  test("text operators: empty corpus in, empty frame out") {
    assert(TextAnalysis.quality(emptyDocs).count() == 0)
    assert(TextAnalysis.entropy(emptyDocs).count() == 0)
    assert(TextAnalysis.perplexity(emptyDocs).count() == 0)
    assert(TextAnalysis.boilerplateRemove(emptyDocs, 2, 0.5).count() == 0)
    assert(TextAnalysis.selectByBudget(emptyDocs, 100L).count() == 0)
    assert(TextAnalysis.postingsIndex(emptyDocs).count() == 0)
    assert(TextAnalysis.skipgramCounts(emptyDocs, 2, 10).count() == 0)
    assert(TextAnalysis.pmiBigrams(emptyDocs, 10, 1L).count() == 0)
    assert(TextAnalysis.bm25TopK(emptyDocs, Seq("x"), 5).count() == 0)
    assert(TextAnalysis.hashingTrickVectors(emptyDocs, 8).count() == 0)
    assert(TextAnalysis.packMaterialize(emptyDocs, 10).count() == 0)
  }

  test("single-doc corpus: sane degenerate outputs, no division blowups") {
    // distinct ratio 1.0 -> a real quality row; entropy of 3 distinct toks
    val q = TextAnalysis.quality(oneDoc).collect()(0)
    assert(q.getAs[Double]("distinct_ratio") == 1.0)
    val e = TextAnalysis.entropy(oneDoc).collect()(0)
    assert(e.getAs[Double]("entropy") > 0)
    // every token survives boilerplate removal (df 1 of 1 >= ceil(0.5) hot!
    // -> with frac > 1/n_docs nothing is hot)
    val bp = TextAnalysis.boilerplateRemove(oneDoc, 2, 0.5).collect()(0)
    assert(bp.getAs[Double]("boilerplate_ratio") == 1.0 ||
      bp.getAs[Double]("boilerplate_ratio") == 0.0) // frac 0.5 of 1 doc = 1 doc
    // perplexity defined (corpus == the doc)
    assert(TextAnalysis.perplexity(oneDoc).count() == 1)
  }

  test("dedup/graph/sketch: empty inputs flow through") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.exactByDigest(emptyDocs, "text", "doc_id").count() == 0)
    val emptyEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRank(emptyEdges, 2).count() == 0)
    val emptyKeys = Seq.empty[String].toDF("k")
    assert(Sketch.cmsBuild(emptyKeys, "k", 3, 16).count() == 0)
    assert(Sketch.cmsJoinSizeEstimate(emptyKeys, "k", emptyKeys, "k", 3, 16)
      .head().isNullAt(0)) // min over no rows -> NULL estimate, not a crash
    assert(Merge.finalizeAggState(
      Merge.aggState(Seq.empty[(String, Double)].toDF("k", "v"), Seq("k"), "v"))
      .count() == 0)
  }

  test("analytics on empty events: empty out, no ANSI errors") {
    val empty = Seq.empty[(Long, String, Double)].toDF("event_id", "event_type", "value")
    assert(Analytics.outliers(empty).count() == 0)
    assert(DataQuality.corrMatrix(
      Seq.empty[(Double, Double)].toDF("a", "b"), Seq("a", "b"))
      .collect().forall(_.isNullAt(2))) // r NULL on empty, never a throw
  }

  test("round-11 degenerate inputs flow through the new operators") {
    import org.apache.spark.sql.functions._
    // semanticDedup: zero-norm vectors have NULL cosine -> never marked
    // dup, never mark others; both kept
    val z = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val sd = graft.operators.Dedup.semanticDedup(z, 1, 0.5)
      .orderBy("vec_id").collect()
    assert(sd.map(_.getBoolean(2)).forall(identity))
    // qualityGate: a source whose every doc is empty has a NULL threshold
    // and nothing passes; the healthy source is unaffected
    val docs = Seq((1L, "E", ""), (2L, "E", "  "),
      (3L, "H", "x y"), (4L, "H", "p p p q")).toDF("doc_id", "source", "text")
    val qg = graft.operators.TextAnalysis.qualityGate(docs, 0.5)
      .orderBy("doc_id").collect()
    assert(qg.filter(_.getString(1) == "E").forall(!_.getBoolean(4)))
    assert(qg.filter(_.getString(1) == "H").exists(_.getBoolean(4)))
    // dedupSpans: docs shorter than n tokens are untouched
    val short = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val ds = graft.operators.TextAnalysis.dedupSpans(short, 3)
      .orderBy("doc_id").collect()
    assert(ds.length == 1 && ds(0).getString(1) == "a b" && ds(0).getLong(3) == 0L)
    // ngramNovelty: single-doc corpus is 100% novel
    val solo = Seq((9L, "p q r s")).toDF("doc_id", "text")
    val nv = graft.operators.TextAnalysis.ngramNovelty(solo, 3).collect()
    assert(nv(0).getDouble(3) == 1.0)
  }

  test("round-12-final degenerate inputs flow through the new operators") {
    import org.apache.spark.sql.functions._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // calibration cards on an empty corpus: empty out, no errors
    assert(graft.operators.Dedup.lshCalibrationCurve(emptyDocs).isEmpty)
    assert(graft.operators.Dedup.minhashEstimatorCard(emptyDocs).isEmpty)
    // graph ops on an empty edge list: empty/NULL out, no ANSI errors
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.adamicAdar(noEdges).isEmpty)
    val pl = graft.operators.Graph.powerlawTail(noEdges).collect().head
    assert(pl.getLong(0) == 0L && pl.isNullAt(3) && pl.isNullAt(4))
    val rc = graft.operators.Graph.richClub(noEdges, Seq(2L)).collect().head
    assert(rc.getLong(1) == 0L && rc.isNullAt(3))
    // theilSen / motif / cusum / perm entropy on empty events: empty out
    val noEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(graft.operators.TimeSeries.theilSen(noEv, "user_id", "ts", "value").isEmpty)
    assert(graft.operators.TimeSeries.motifDiscovery(noEv, "user_id", "ts", "value").isEmpty)
    assert(graft.operators.TimeSeries.cusumScan(noEv, "user_id", "ts", "value").isEmpty)
    assert(graft.operators.TimeSeries.permutationEntropy(noEv, "user_id", "ts", "value").isEmpty)
    // jsd with a single source: no pairs, empty out
    val oneSrc = Seq((1L, "a b", "s1"), (2L, "c d", "s1"))
      .toDF("doc_id", "text", "source")
    assert(graft.operators.TextAnalysis.jsdBySource(oneSrc).isEmpty)
    // bootstrap on an empty frame: no groups, empty out
    val noRows = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(graft.operators.Sampling.bootstrapCI(noRows, "g", "id", "v").isEmpty)
    // windowFunnel with zero stage-0 events: all levels count 0
    val clicksOnly = Seq((1L, "2024-01-01 00:00:00", "click"))
      .toDF("user_id", "s", "event_type")
      .select($"user_id", to_timestamp($"s").as("ts"), $"event_type")
    val wf = graft.analytics.Analytics
      .windowFunnel(clicksOnly, Seq("signup", "click"), 3600L)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(wf.toSeq == Seq(0L, 0L))
  }

  test("round-15 operators: degenerate inputs stay exact, no ANSI errors") {
    import org.apache.spark.sql.functions._
    // robustStatsCard: all-NULL values -> no groups, empty out
    val allNull = Seq(("a", null.asInstanceOf[java.lang.Double]))
      .toDF("g", "v")
    assert(Sketch.robustStatsCard(allNull, "g", "v").isEmpty)
    // mixtureCard: budget >= corpus -> rate caps at 1, EVERYTHING kept,
    // achieved share then reflects corpus proportions, not targets
    val docs = Seq((1L, "a b c", "A"), (2L, "d e", "B"))
      .toDF("doc_id", "text", "source")
    val full = graft.operators.Sampling
      .mixtureCard(docs, Map("A" -> 1.0, "B" -> 1.0), 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getLong(5), r.getDouble(8))).toMap
    assert(full("A") == ((1.0, 1L, 0.6)) && full("B") == ((1.0, 1L, 0.4)))
    // admitWave: empty batch -> zero verdicts, corpus passes through
    val corpus = Seq((10L, "x y z w", "s")).toDF("doc_id", "text", "source")
    val emptyBatch = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val (v, next) = Dedup.admitWave(corpus, emptyBatch, 3, 0.5)
    assert(v.isEmpty && next.count() == 1)
    // dedupClusters (star path): no pairs -> every doc its own singleton
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val singletons = Dedup.dedupClusters(
        Seq((1L, "t"), (2L, "t")).toDF("doc_id", "text"), noPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(singletons == Map(1L -> 1L, 2L -> 2L))
  }
}
