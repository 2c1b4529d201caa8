package graft

import org.apache.spark.sql.functions.col
import graft.operators.{ML, Similarity}

class MLSpec extends SparkSpec {
  import spark.implicits._

  test("logregSteps: hand-computed one-step gradient on 1-dim data") {
    // x = [1], y=1 and x = [-1], y=0; w0 = 0 -> p = 0.5 for both.
    // g = (0.5-1)*1 + (0.5-0)*(-1) = -1; w1 = 0 - lr*(-1)/2 = lr/2.
    val e = Seq((1L, Seq(1.0f), 1), (2L, Seq(-1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val w = ML.logregSteps(e, col("label") === 1, steps = 1, lr = 1.0)
      .collect().head
    assert((w.getLong(0), w.getDouble(1)) == (1L, 0.5))
  }

  test("logregSteps: separable data moves the weight toward the margin") {
    val e = Seq((1L, Seq(2.0f), 1), (2L, Seq(1.5f), 1),
      (3L, Seq(-1.0f), 0), (4L, Seq(-2.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val w1 = ML.logregSteps(e, col("label") === 1, steps = 1)
      .collect().head.getDouble(1)
    val w2 = ML.logregSteps(e, col("label") === 1, steps = 2)
      .collect().head.getDouble(1)
    assert(w1 > 0 && w2 > w1) // monotone on separable 1-d data
  }

  test("ridgeNormal: lambda=0 recovers an exact linear relation") {
    // y = 2 + 3*x1 + 4*x2 on a full 2x2 design -> OLS solves exactly
    val df = Seq((0.0, 0.0, 2.0), (1.0, 0.0, 5.0),
      (0.0, 1.0, 6.0), (1.0, 1.0, 9.0)).toDF("x1", "x2", "y")
    val r = ML.ridgeNormal(df, col("x1"), col("x2"), col("y"), lambda = 0.0)
      .collect().head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      (4L, 2.0, 3.0, 4.0))
  }

  test("ridgeNormal: lambda shrinks coefficients toward zero") {
    val df = Seq((0.0, 0.0, 2.0), (1.0, 0.0, 5.0),
      (0.0, 1.0, 6.0), (1.0, 1.0, 9.0)).toDF("x1", "x2", "y")
    val ridge = ML.ridgeNormal(df, col("x1"), col("x2"), col("y"), 1.0)
      .collect().head
    assert(math.abs(ridge.getDouble(2)) < 3.0 &&
      math.abs(ridge.getDouble(3)) < 4.0)
  }

  test("centroidDrift: identical cohorts -> cosine 1/l2 0; opposite -> -1") {
    val a = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val same = Similarity.centroidDrift(a, a).collect().head
    assert((same.getLong(0), same.getLong(1), same.getDouble(2),
      same.getDouble(3)) == (2L, 2L, 1.0, 0.0))
    val b = Seq((3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val opp = Similarity.centroidDrift(a, b).collect().head
    assert(opp.getDouble(2) == -1.0 && opp.getDouble(3) == 2.0)
  }

  test("naiveBayesAccuracy: separable vocabularies classify perfectly") {
    val docs = Seq(
      (1L, "hello world", "en"), (2L, "hello there world", "en"),
      (3L, "bonjour monde", "fr"), (4L, "bonjour ici monde", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = ML.naiveBayesAccuracy(docs, "lang").orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("en", 2L, 2L, 1.0), ("fr", 2L, 2L, 1.0)))
  }

  test("naiveBayesAccuracy: shared vocab + priors still favors own class") {
    // both classes share "the"; each has a distinctive token
    val docs = Seq(
      (1L, "the cat", "a"), (2L, "the cat cat", "a"),
      (3L, "the dog", "b"))
      .toDF("doc_id", "text", "lang")
    val out = ML.naiveBayesAccuracy(docs, "lang").orderBy("label").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 1.0), ("b", 1.0)))
  }

  test("knnAccuracy: clustered embeddings vote their own label") {
    // two tight clusters on orthogonal axes; sampleMod=1 queries all
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(1.0f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.1f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = ML.knnAccuracy(e, k = 2, sampleMod = 1L).orderBy("label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 3L, 1.0), (1, 3L, 1.0)))
  }

  test("prCurve: hand TP/FP at each cut; precision/recall/F1 closed forms") {
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.1, false))
      .toDF("score", "is_pos")
    val out = ML.prCurve(df, col("score"), col("is_pos"), Seq(0.5, 0.95))
      .orderBy("threshold").collect()
    // t=0.5: tp=2 fp=1 -> p=2/3, r=1, f1=4/5
    assert(out(0).getLong(3) == 2L && out(0).getLong(4) == 1L)
    assert(out(0).getDouble(5) == 0.666667 && out(0).getDouble(6) == 1.0 &&
      out(0).getDouble(7) == 0.8)
    // t=0.95: nothing predicted positive -> tp=fp=0, precision 0/0 NULL,
    // recall 0, f1 0
    assert(out(1).getLong(3) == 0L && out(1).getLong(4) == 0L)
    assert(out(1).isNullAt(5))
    assert(out(1).getDouble(6) == 0.0 && out(1).getDouble(7) == 0.0)
  }

  test("gmmEStep: tight clusters give near-hard responsibilities; counts partition") {
    // seeds are vec_ids 0,1 (k=2); vectors pile tightly around each seed
    val e = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.0f, 0.1f)),
      (4L, Seq(10.1f, 10.0f)), (5L, Seq(10.0f, 10.1f)))
      .toDF("vec_id", "embedding")
    val out = ML.gmmEStep(e, k = 2).orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // every vector is scored against both centroids
    assert(out.map(_._2).toSeq == Seq(6L, 6L))
    // hard assignments split 3/3, soft counts near the hard ones
    assert(out.map(_._4).toSeq == Seq(3L, 3L))
    assert(out.forall(t => math.abs(t._3 - 3.0) < 0.2),
      s"soft counts should hug 3: ${out.toSeq}")
    // responsibilities are shares: soft counts sum to ~N
    assert(math.abs(out.map(_._3).sum - 6.0) < 1e-3)
  }

  test("liftDeciles: median split captures all positives in the top half; ties share a bin") {
    import org.apache.spark.sql.functions.col
    // scores 1..20, positives = scores 16..20 (all land above the median)
    val df = (1 to 20).map(i => (i.toDouble, i > 15)).toDF("s", "y")
    val out = ML.liftDeciles(df, "s", col("y"), deciles = 2)
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      (1L, 10L, 5L, 10L, 5L, 1.0, 2.0),   // top half: 2x lift
      (2L, 10L, 0L, 20L, 5L, 1.0, 1.0)))  // full depth: lift 1 by identity
    // a constant score cannot be split: every tie lands in ONE bin
    val flat = (1 to 8).map(i => (7.0, i % 2 == 0)).toDF("s", "y")
    val f = ML.liftDeciles(flat, "s", col("y"), deciles = 2).collect()
    assert(f.length == 1 && f.head.getLong(0) == 2L)
    assert(f.head.getLong(1) == 8L && f.head.getDouble(6) == 1.0)
  }

  test("decisionStump: finds the perfect median split; unsplittable score yields no row") {
    import org.apache.spark.sql.functions.col
    // scores 1..10, positives = scores > 5: the median (5.5) separates
    // the classes perfectly -> gini 0.5 -> 0, gain 0.5
    val df = (1 to 10).map(i => (i.toDouble, i > 5)).toDF("s", "y")
    val out = ML.decisionStump(df, "s", col("y"), deciles = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(0) == 5.5)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (10L, 5L, 5L, 0L))
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 1.0)
    assert(r.getDouble(7) == 0.5 && r.getDouble(8) == 0.0)
    assert(r.getDouble(9) == 0.5)
    // a constant score cannot split: every candidate is degenerate
    val flat = (1 to 6).map(i => (3.0, i % 2 == 0)).toDF("s", "y")
    assert(ML.decisionStump(flat, "s", col("y"), deciles = 2).collect()
      .isEmpty)
  }

  test("confusionMatrix: sparse cells with row-normalized shares") {
    val preds = Seq((1L, "a", "a"), (2L, "a", "b"), (3L, "b", "b"),
      (4L, "b", "b"), (5L, "c", "a")).toDF("doc_id", "y", "pred")
    val out = ML.confusionMatrix(preds).orderBy("label", "pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5),
      ("b", "b", 2L, 1.0), ("c", "a", 1L, 1.0)))
  }

  test("classReport: precision/recall/F1 incl. never-predicted and hallucinated classes") {
    val preds = Seq((1L, "a", "a"), (2L, "a", "b"), (3L, "b", "b"),
      (4L, "b", "b"), (5L, "c", "a"), (6L, "a", "d"))
      .toDF("doc_id", "y", "pred")
    val out = ML.classReport(preds).orderBy("label").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]), r.getDouble(6))).toMap
    // a: truth {1,2,6}, preds {1,5}, tp {1}
    val a = out("a")
    assert((a._1, a._2, a._3) == (3L, 2L, 1L))
    assert(math.abs(a._4.get - 0.5) < 1e-6)
    assert(math.abs(a._5.get - 0.333333) < 1e-6)
    assert(math.abs(a._6 - 0.4) < 1e-6) // 2*.5*(1/3)/(.5+1/3)
    // b: truth {3,4}, preds {2,3,4}, tp {3,4}
    val b = out("b")
    assert((b._1, b._2, b._3) == (2L, 3L, 2L))
    assert(math.abs(b._4.get - 0.666667) < 1e-6 && b._5.get == 1.0)
    assert(math.abs(b._6 - 0.8) < 1e-6)
    // c: in truth, never predicted -> precision NULL, recall 0, f1 0
    val c = out("c")
    assert((c._1, c._2, c._3) == (1L, 0L, 0L))
    assert(c._4.isEmpty && c._5.get == 0.0 && c._6 == 0.0)
    // d: hallucinated (never in truth) -> n_true 0, recall NULL, f1 0
    val d = out("d")
    assert((d._1, d._2, d._3) == (0L, 1L, 0L))
    assert(d._4.get == 0.0 && d._5.isEmpty && d._6 == 0.0)
  }

  test("mccKappa: perfect prediction scores 1; majority predictor scores 0 with NULL MCC") {
    val perfect = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "b", "b"),
      (4L, "b", "b")).toDF("doc_id", "y", "pred")
    val p = ML.mccKappa(perfect).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      (4L, 4L, 2L, 2L))
    assert(p.getDouble(4) == 1.0 && p.getDouble(5) == 1.0 &&
      p.getDouble(6) == 1.0)
    // majority-class predictor: accuracy 0.75 but kappa 0 (chance
    // agreement = accuracy) and MCC NULL (single predicted class makes
    // the denominator 0 — the imbalance-inflation case the card exists
    // to expose)
    val maj = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "a", "a"),
      (4L, "b", "a")).toDF("doc_id", "y", "pred")
    val m = ML.mccKappa(maj).collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ==
      (4L, 3L, 2L, 1L))
    assert(m.getDouble(4) == 0.75 && m.getDouble(5) == 0.0 && m.isNullAt(6))
    // anti-diagonal binary: everything wrong -> kappa = MCC = -1
    val anti = Seq((1L, "a", "b"), (2L, "b", "a"), (3L, "a", "b"),
      (4L, "b", "a")).toDF("doc_id", "y", "pred")
    val a = ML.mccKappa(anti).collect().head
    assert(a.getDouble(4) == 0.0 && a.getDouble(5) == -1.0 &&
      a.getDouble(6) == -1.0)
  }

}
