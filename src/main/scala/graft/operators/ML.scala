package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Distributed training steps for the quality-classifier models every
  * large-scale data pipeline ends up fitting over its own corpus (a
  * fasttext-style filter, a regression prior for sampling weights):
  * logistic-regression gradient descent over embedding features and
  * closed-form ridge regression via the normal equations. Both are pure
  * aggregation shapes — per-dimension keyed sums with map-side combine —
  * so they scale exactly like the covariance/k-means family: the model
  * state (d weights, a 3×3 Gram matrix) is broadcast-sized, the data is
  * touched once per step, and nothing ever collects to the driver.
  *
  * Cross-engine determinism discipline (the repo convention): every
  * value that enters an aggregate is rounded to 6 dp and summed as
  * DECIMAL (order-free exact); every transcendental (sigmoid's exp)
  * consumes an already-rounded argument and its result is re-rounded,
  * so a last-ulp libm disagreement between engines cannot propagate.
  */
object ML {

  private def d6sum(c: Column): Column =
    sum(round(c, 6).cast("decimal(18,6)")).cast("double")

  /** `steps` rounds of full-batch gradient descent on logistic
    * regression `P(y=1|x) = sigmoid(wᵀx)` over flattened embedding
    * features, starting from w = 0 (so step 1's predictions are exactly
    * 0.5 — the symmetric start both engines agree on). Output is the
    * final weight vector, one row per 1-based dimension.
    *
    * Scale shape per step: one broadcast of the d-row weight vector
    * into the flattened corpus, one vec-keyed DECIMAL sum for the
    * margins (d-term dot products, map-side combined), one dim-keyed
    * DECIMAL sum for the gradient — two shuffles of cardinality N and
    * d. The weight update is a d-row select; `steps` chains lazily (no
    * materialization barrier, d stays broadcast-sized throughout).
    */
  def logregSteps(embeddings: DataFrame, label: Column, steps: Int = 2,
                  lr: Double = 0.5, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val flat = Similarity.flatten(embeddings, idCol, vecCol)
    val y = embeddings.select(col(idCol).as("vec_id"),
      when(label, 1.0).otherwise(0.0).as("y"))
    val n = embeddings.agg(count(lit(1)).as("n"))
    var w = flat.select("dim").distinct()
      .select(col("dim"), lit(0.0).as("w"))
    for (_ <- 1 to steps) {
      val margins = flat.join(broadcast(w), "dim")
        .groupBy("vec_id")
        .agg(round(d6sum(col("x") * col("w")), 6).as("margin"))
      val resid = margins.join(y, "vec_id")
        .select(col("vec_id"),
          (round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6) - col("y"))
            .as("r"))
      val grad = flat.join(resid, "vec_id")
        .groupBy("dim").agg(d6sum(col("r") * col("x")).as("g"))
      w = w.join(grad, "dim").crossJoin(broadcast(n))
        .select(col("dim"),
          Fns.q6(col("w") - lit(lr) * col("g") / col("n")).as("w"))
    }
    w.select(col("dim"), col("w").as("weight"))
  }

  /** Closed-form ridge regression `y ~ β₀ + β₁x₁ + β₂x₂` by the normal
    * equations: accumulate the 3×3 Gram matrix XᵀX + λI and XᵀY in ONE
    * aggregation pass (9 DECIMAL sums, map-side combined — the whole
    * model state is a single row), then solve by Cramer's rule as
    * column expressions over that row. Fully lazy, nothing collects;
    * at 100 TB this is exactly one scan + one 9-number reduce.
    *
    * λ penalizes all three coefficients including the intercept (the
    * simplest contract to mirror exactly in the oracle; pass λ = 0 for
    * OLS). The Gram sums are 6-dp-quantized DECIMAL(38,6) — exact and
    * order-free on both engines — so the Cramer determinants are pure
    * IEEE arithmetic over identical doubles; βs round to 6 dp.
    */
  def ridgeNormal(df: DataFrame, x1: Column, x2: Column, yCol: Column,
                  lambda: Double = 1.0): DataFrame = {
    def dsum(c: Column) = sum(round(c, 6).cast("decimal(38,6)")).cast("double")
    val a = df.select(x1.cast("double").as("x1"), x2.cast("double").as("x2"),
        yCol.cast("double").as("y"))
      .agg(count(lit(1)).as("n"),
        dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
        dsum(col("x1") * col("x1")).as("s11"),
        dsum(col("x1") * col("x2")).as("s12"),
        dsum(col("x2") * col("x2")).as("s22"),
        dsum(col("y")).as("sy"),
        dsum(col("x1") * col("y")).as("s1y"),
        dsum(col("x2") * col("y")).as("s2y"))
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) -
        a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val l = lit(lambda)
    val (a11, a12, a13) = (col("n").cast("double") + l, col("s1"), col("s2"))
    val (a22, a23, a33) = (col("s11") + l, col("s12"), col("s22") + l)
    val dA = det3(a11, a12, a13, a12, a22, a23, a13, a23, a33)
    val d0 = det3(col("sy"), a12, a13, col("s1y"), a22, a23, col("s2y"), a23, a33)
    val d1 = det3(a11, col("sy"), a13, a12, col("s1y"), a23, a13, col("s2y"), a33)
    val d2 = det3(a11, a12, col("sy"), a12, a22, col("s1y"), a13, a23, col("s2y"))
    a.select(col("n"),
      Fns.q6(d0 / dA).as("beta0"),
      Fns.q6(d1 / dA).as("beta1"),
      Fns.q6(d2 / dA).as("beta2"))
  }

  /** Multinomial Naive Bayes, trained and evaluated in one lazy plan:
    * class-conditional token likelihoods with Laplace smoothing
    * (ln((c+1)/(n_l+V))), log doc priors, per-doc argmax, per-class
    * recall — the fasttext-shaped language/quality classifier baseline
    * a pipeline trains over its own corpus. Self-consistency eval on
    * the training set by design (the model-card sanity row, not a
    * generalization claim); docs with zero tokens carry no evidence and
    * are excluded by the inner token join.
    *
    * Scale shape: the model state is (labels × vocab) keyed counts —
    * one hash aggregate each for class-term counts, class totals,
    * priors; scoring is one term-keyed join of per-doc tfs against the
    * class-term table with the tiny per-label row broadcast-crossed in,
    * then a doc-keyed DECIMAL sum and argmax window. Per-term
    * log-likelihoods are 6-dp-rounded before the order-free sum; the
    * final score and the argmax follow the membership discipline.
    */
  def naiveBayesAccuracy(docs: DataFrame, labelCol: String = "lang",
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    naiveBayesEval(docs, docs, labelCol, textCol, idCol)

  /** The general train/test form of the NB classifier: the model
    * (class-term counts, totals, vocabulary, priors) comes from
    * `train`; every `test` doc is scored and the per-class recall
    * reported. `naiveBayesAccuracy` is the self-consistency
    * specialization (train = test); composed with a leak-free split
    * this is a real generalization measurement
    * ([[DocPipeline.prepareAndEval]]). Test-only terms fall back to the
    * smoothed zero-count likelihood; test docs with zero tokens carry
    * no evidence and drop (inner token join).
    */
  def naiveBayesEval(train: DataFrame, test: DataFrame,
                     labelCol: String = "lang", textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    naiveBayesEvalFromPredictions(
      naiveBayesPredict(train, test, labelCol, textCol, idCol))

  /** The per-class recall aggregate of [[naiveBayesEval]] alone, over an
    * already-computed `(doc_id, y, pred)` frame — so a caller holding a
    * shared prediction materialization (SparkEntry's `_derive_nb_pred`
    * memo) pays only this tiny aggregate. Splitting the method changes
    * no byte of the output (naiveBayesEval delegates here).
    */
  def naiveBayesEvalFromPredictions(predictions: DataFrame): DataFrame =
    predictions
      .groupBy(col("y").as("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("label"), col("n_docs"), col("n_correct"),
        Fns.q6(col("n_correct").cast("double") / col("n_docs").cast("double"))
          .as("recall"))

  /** The per-document leg of [[naiveBayesEval]]: train the multinomial
    * NB model on `train`, score every `test` doc, and emit
    * `(doc_id, y, pred)` — the raw material every downstream eval
    * consumes ([[naiveBayesEval]]'s per-class recall,
    * [[confusionMatrix]]'s error structure, [[classReport]]'s
    * precision/recall/F1). Same smoothing, 6-dp score quantization and
    * tie-break (higher score, then lower label) as always — splitting
    * the method changes no byte of the eval output.
    */
  def naiveBayesPredict(train: DataFrame, test: DataFrame,
                        labelCol: String = "lang", textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    import graft.functions.Fns
    import org.apache.spark.sql.expressions.Window
    val trainToks = train.select(col(labelCol).as("y"),
      explode(Fns.tokens(col(textCol))).as("term"))
    val tf = test.select(col(idCol).as("doc_id"),
        explode(Fns.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val testLabels = test.select(col(idCol).as("doc_id"), col(labelCol).as("y"))
    val trainLabels = train.select(col(labelCol).as("y"))
    val classTerm = trainToks.groupBy(col("y").as("l"), col("term"))
      .agg(count(lit(1)).as("c"))
    val classTot = classTerm.groupBy("l").agg(sum("c").as("nl"))
    val vocab = classTerm.select("term").distinct().agg(count(lit(1)).as("v"))
    val langs = trainLabels.groupBy(col("y").as("l")).agg(count(lit(1)).as("dl"))
      .crossJoin(broadcast(trainLabels.agg(count(lit(1)).as("nd"))))
      .crossJoin(broadcast(vocab))
      .join(classTot, "l")
      .select(col("l"), col("nl"), col("v"),
        round(log(col("dl").cast("double") / col("nd").cast("double")), 6)
          .as("lprior"))
    val termLL = tf.crossJoin(broadcast(langs))
      .join(classTerm, Seq("l", "term"), "left")
      .select(col("doc_id"), col("l"), col("lprior"),
        round(col("tf").cast("double") *
          log((coalesce(col("c"), lit(0L)) + 1L).cast("double") /
            (col("nl") + col("v")).cast("double")), 6).as("ll"))
    val scores = termLL.groupBy("doc_id", "l", "lprior")
      .agg(sum(col("ll").cast("decimal(28,6)")).as("s"))
      .select(col("doc_id"), col("l"),
        round(col("s").cast("double") + col("lprior"), 6).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("l").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("l").as("pred"))
      .join(testLabels, "doc_id")
  }

  /** Confusion matrix over a `(doc_id, y, pred)` prediction frame
    * ([[naiveBayesPredict]] or any classifier emitting that shape):
    * one row per OBSERVED (true label, predicted label) cell with the
    * count and the row-normalized share — "when the truth is X, where
    * do the mistakes go", the error-structure view an aggregate
    * accuracy number hides. Zero cells are absent (sparse convention —
    * a dense k×k grid of a high-cardinality label space is the wrong
    * artifact at scale). Cost: one (y, pred)-keyed count plus a
    * broadcast join of the per-label totals.
    */
  def confusionMatrix(predictions: DataFrame): DataFrame = {
    val cells = predictions.groupBy(col("y").as("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val totals = predictions.groupBy(col("y").as("label"))
      .agg(count(lit(1)).as("n_label"))
    cells.join(broadcast(totals), "label")
      .select(col("label"), col("pred"), col("n"),
        Fns.q6(col("n").cast("double") / col("n_label").cast("double"))
          .as("row_share"))
  }

  /** Per-class precision / recall / F1 over a `(doc_id, y, pred)`
    * prediction frame — the sklearn-style classification report as a
    * distributed aggregate: two label-keyed counts (truth side with
    * true positives, prediction side) full-outer-joined so a class
    * that is never predicted still reports (precision NULL, the honest
    * answer) and a hallucinated class absent from the truth reports
    * n_true 0. F1 is computed from the UNROUNDED precision/recall
    * (one fixed IEEE expression, NULL legs treated as 0, 0/0 → 0 by
    * the standard convention) and rounded once at the edge.
    */
  def classReport(predictions: DataFrame): DataFrame = {
    val t = predictions.groupBy(col("y").as("label"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("tp"))
    val p = predictions.groupBy(col("pred").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val j = t.join(p, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val prec = try_divide(col("tp").cast("double"), col("n_pred").cast("double"))
    val rec = try_divide(col("tp").cast("double"), col("n_true").cast("double"))
    def z(c: Column) = coalesce(c, lit(0.0))
    j.select(col("label"), col("n_true"), col("n_pred"), col("tp"),
      Fns.q6(prec).as("precision"), Fns.q6(rec).as("recall"),
      Fns.q6(when(z(prec) + z(rec) === 0.0, lit(0.0))
        .otherwise(lit(2.0) * z(prec) * z(rec) / (z(prec) + z(rec))))
        .as("f1"))
  }

  /** Chance-corrected agreement card over a `(y, pred)` prediction
    * frame: accuracy, Cohen's κ, and the multiclass Matthews
    * correlation (Gorodkin 2004's R_K) — the two standard statistics
    * that expose an accuracy number inflated by class imbalance (a
    * majority-class predictor scores κ = MCC = 0 however high its
    * accuracy). One scalar row:
    * κ = (c·s − Σ t_k p_k) / (s² − Σ t_k p_k),
    * MCC = (c·s − Σ t_k p_k) / √((s² − Σ p_k²)(s² − Σ t_k²))
    * with s total, c correct, t_k/p_k the truth/prediction marginals.
    *
    * Scale shape: two label-keyed marginal aggregates (cardinality =
    * class count) full-outer-joined, one corpus aggregate — no pair
    * term. Determinism: every product rides DECIMAL(19,0)×DECIMAL(19,0)
    * → DECIMAL(38,0) (exact far past int64 at 100 TB marginals, the CMS
    * join-size discipline); κ and MCC are fixed-order doubles of exact
    * decimals, DECIMAL-routed before the 6-dp round; a degenerate
    * denominator (single class on either side) reports NULL, not ±∞.
    */
  def mccKappa(predictions: DataFrame): DataFrame = {
    def d6(c: Column) = Fns.q6(c)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val t = predictions.groupBy(col("y").as("label"))
      .agg(count(lit(1)).as("tk"))
    val p = predictions.groupBy(col("pred").as("label"))
      .agg(count(lit(1)).as("pk"))
    val marg = t.join(p, Seq("label"), "full_outer")
      .select(coalesce(col("tk"), lit(0L)).as("tk"),
        coalesce(col("pk"), lit(0L)).as("pk"))
      .agg(sum(d19(col("tk")) * d19(col("pk"))).as("stp"),
        sum(d19(col("tk")) * d19(col("tk"))).as("stt"),
        sum(d19(col("pk")) * d19(col("pk"))).as("spp"))
    val base = predictions.agg(count(lit(1)).as("n"),
      sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"),
      countDistinct(col("y")).as("n_classes_true"),
      countDistinct(col("pred")).as("n_classes_pred"))
    val num = (d19(col("n_correct")) * d19(col("n")) - col("stp"))
      .cast("double")
    val s2 = d19(col("n")) * d19(col("n"))
    base.crossJoin(broadcast(marg))
      .select(col("n"), col("n_correct"), col("n_classes_true"),
        col("n_classes_pred"),
        d6(try_divide(col("n_correct").cast("double"),
          col("n").cast("double"))).as("accuracy"),
        d6(when((s2 - col("stp")).cast("double") =!= 0.0,
            num / (s2 - col("stp")).cast("double"))
          .otherwise(lit(null).cast("double"))).as("kappa"),
        d6(when((s2 - col("spp")).cast("double") > 0 &&
            (s2 - col("stt")).cast("double") > 0,
            num / sqrt((s2 - col("spp")).cast("double") *
              (s2 - col("stt")).cast("double")))
          .otherwise(lit(null).cast("double"))).as("mcc"))
  }

  /** k-NN classification accuracy over the embedding corpus:
    * leave-one-out majority vote among the `k` nearest (cosine)
    * neighbors of a deterministic 1-in-`sampleMod` query sample
    * (vec_id ≡ 0 mod `sampleMod` — the eval-sample convention that
    * keeps the exact pair term at N·N/mod instead of N²), per-class
    * counts and accuracy — the standard "are these embeddings any good
    * for this label" probe, and the exact baseline an ANN-backed
    * variant (swap [[Similarity.bruteForceTopK]] for srp/ivf) is
    * measured against. Vote ties break to the smaller label.
    */
  def knnAccuracy(embeddings: DataFrame, k: Int = 5, sampleMod: Long = 10,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    import graft.functions.Fns
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k >= 1, got $k")
    val queries = embeddings.filter(
      Fns.pmod(col(idCol), lit(sampleMod)) === 0)
    val top = Similarity.bruteForceTopK(embeddings, queries, k, idCol, vecCol)
    val votes = top
      .join(embeddings.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("nl")), "neighbor_id")
      .groupBy("query_id", "nl").agg(count(lit(1)).as("cvotes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cvotes").desc, col("nl").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("nl").as("pred"))
      .join(embeddings.select(col(idCol).as("query_id"),
        col(labelCol).as("label")), "query_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        Fns.q6(col("n_correct").cast("double") / col("n").cast("double"))
          .as("accuracy"))
  }

  /** One GMM E-step (spherical, shared bandwidth): soft-assignment
    * responsibilities of every vector over k seed centroids — the soft
    * face of the hard Lloyd step, and the membership-weight table a
    * mixture-model M-step or soft-dedup weighting consumes. Seeds are
    * the k lowest-id vectors (the deterministic oracle-reproducible
    * convention shared with productQuantize); the bandwidth is the
    * corpus mean squared centroid distance (one scalar pass, no knob).
    *
    * Numerics: responsibilities use the max-subtracted softmax —
    * e_k = exp(−(d²_k − min_j d²_j)/(2σ²)) puts the nearest centroid at
    * exactly 1, so Σe ≥ 1 and the ratio can never 0/0-underflow no
    * matter how spread the corpus; each e is 9-dp-rounded before the
    * DECIMAL share sums (the repo's transcendental discipline).
    * Scale shape: the k·d centroid frame broadcasts onto the flattened
    * corpus ([[Similarity.silhouette]]'s join), then vec-keyed and
    * cid-keyed reduces — O(N·k·d) work, no pair joins.
    */
  /** Precision/recall/F1 sweep over a literal threshold ladder for a
    * score column against a boolean label — the operating-point table a
    * quality-classifier gate is tuned from (AUC says "rankable";
    * THIS says "cut at 5.0 and you keep 92% at 61% precision"). ONE
    * pass: every threshold is a pair of conditional sums inside a
    * single partial aggregate (the constraintSuite shape), rows unfold
    * from an inline array — adding a threshold adds columns, not scans.
    */
  def prCurve(df: DataFrame, score: Column, label: Column,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val aggs = Seq(count(lit(1)).as("n"),
      sum(when(label, 1L).otherwise(0L)).as("pos")) ++
      thresholds.zipWithIndex.flatMap { case (t, i) =>
        Seq(sum(when(score >= t && label, 1L).otherwise(0L)).as(s"tp_$i"),
          sum(when(score >= t && !label, 1L).otherwise(0L)).as(s"fp_$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"tp_$i").as("tp"),
        col(s"fp_$i").as("fp"))
    }
    one.select(col("n"), col("pos"), explode(array(entries: _*)).as("e"))
      .select(col("e.threshold").as("threshold"), col("n"), col("pos"),
        col("e.tp").as("tp"), col("e.fp").as("fp"))
      .select(col("threshold"), col("n"), col("pos"), col("tp"), col("fp"),
        Fns.q6(try_divide(col("tp").cast("double"),
          (col("tp") + col("fp")).cast("double"))).as("precision"),
        Fns.q6(try_divide(col("tp").cast("double"),
          col("pos").cast("double"))).as("recall"),
        Fns.q6(try_divide(lit(2.0) * col("tp").cast("double"),
          (col("tp") + col("fp") + col("pos")).cast("double")))
          .as("f1"))
  }

  /** Cumulative gains / lift table over score deciles — the
    * "how much better than random is the top X% of the ranking"
    * campaign-targeting companion to [[prCurve]] (thresholds on the
    * SCORE) and `DataQuality.aucScore` (whole-ranking summary): decile 1
    * is the top-scoring tenth; `gain` = share of all positives captured
    * by deciles 1..k; `lift` = that share over the share of rows — 1.0
    * means the score carries no ranking signal down to that depth.
    *
    * Binning is by SCORE QUANTILE THRESHOLD, not by row rank: the 9
    * interior deciles of the score distribution come from one exact
    * percentile aggregate (broadcast back), and a row's decile is
    * `deciles − #(thresholds strictly below its score)` — fully
    * parallel (no global rank window, the ntile trap at 100 TB), and
    * TIES SHARE A BIN instead of being split by an arbitrary row order,
    * which is what makes the card deterministic. Scores and thresholds
    * are 6-dp DECIMAL-quantized before comparison so both engines make
    * identical boundary decisions; heavy score ties make bins unequal —
    * honest, and visible in `n_rows`. Cumulation is a ≤`deciles`-row
    * ordered window over the aggregate — bounded, not a data-sized
    * global sort.
    */
  def liftDeciles(df: DataFrame, scoreCol: String, label: Column,
                  deciles: Int = 10): DataFrame = {
    require(deciles >= 2, s"need deciles >= 2, got $deciles")
    def d6(c: Column) = Fns.q6(c)
    val base = df.select(d6(col(scoreCol)).as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
    val ps = (1 until deciles).map(_.toDouble / deciles).toArray
    val th = base.agg(percentile(col("s"), lit(ps)).as("qs"))
    val below = (1 until deciles)
      .map(i => when(col("s") > d6(element_at(col("qs"), i)), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    val perBin = base.crossJoin(broadcast(th))
      .select((lit(deciles.toLong) - below).as("decile"), col("y"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("n_pos"))
    val tot = perBin.agg(sum(col("n_rows")).as("t_n"),
      sum(col("n_pos")).as("t_pos"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBin
      .withColumn("cum_n", sum(col("n_rows")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_rows"), col("n_pos"),
        col("cum_n"), col("cum_pos"),
        d6(try_divide(col("cum_pos").cast("double"),
          col("t_pos").cast("double"))).as("gain"),
        d6(try_divide(
          try_divide(col("cum_pos").cast("double"), col("cum_n").cast("double")),
          try_divide(col("t_pos").cast("double"), col("t_n").cast("double"))))
          .as("lift"))
  }

  /** One-level decision stump: the best single threshold split of a
    * numeric score against a boolean label by Gini impurity reduction —
    * the base learner of every boosted-tree pipeline and the honest
    * answer to "is there ONE cutoff worth filtering at" (the
    * quality-score → keep/drop gate). Candidate thresholds are the
    * interior score deciles ([[liftDeciles]]' quantile convention,
    * 6-dp-quantized on both sides); ALL candidates evaluate in ONE
    * aggregate over the scored rows (the [[prCurve]] shape — no
    * per-threshold rescans), then the ≤ deciles−1 candidate rows pick
    * the winner via TakeOrdered on (9-dp gain, threshold) — no global
    * window, no data-sized sort. Degenerate splits (everything on one
    * side) are excluded; gains are fixed IEEE expressions over exact
    * integer counts, so the winner is engine-identical.
    */
  def decisionStump(df: DataFrame, scoreCol: String, label: Column,
                    deciles: Int = 10): DataFrame = {
    require(deciles >= 2, s"need deciles >= 2, got $deciles")
    def d6(c: Column) = Fns.q6(c)
    def d9(c: Column) = Fns.q9(c)
    val base = df.select(d6(col(scoreCol)).as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
    val ps = (1 until deciles).map(_.toDouble / deciles).toArray
    val th = base.agg(percentile(col("s"), lit(ps)).as("qs"))
    val wide = base.crossJoin(broadcast(th))
    val aggs = Seq(count(lit(1)).as("n"), sum(col("y")).as("pos")) ++
      (1 until deciles).flatMap { i =>
        val t = d6(element_at(col("qs"), i))
        Seq(max(t).as(s"t_$i"),
          sum(when(col("s") <= t, 1L).otherwise(0L)).as(s"nl_$i"),
          sum(when(col("s") <= t && col("y") === 1L, 1L).otherwise(0L))
            .as(s"pl_$i"))
      }
    val one = wide.agg(aggs.head, aggs.tail: _*)
    val entries = (1 until deciles).map { i =>
      struct(col(s"t_$i").as("threshold"), col(s"nl_$i").as("n_left"),
        col(s"pl_$i").as("pos_left"))
    }
    val nd = col("n").cast("double")
    val pl = col("pos_left").cast("double") / col("n_left").cast("double")
    val pr = (col("pos") - col("pos_left")).cast("double") /
      (col("n") - col("n_left")).cast("double")
    val proot = col("pos").cast("double") / nd
    val gRoot = lit(2.0) * proot * (lit(1.0) - proot)
    val gSplit = (col("n_left").cast("double") *
      (lit(2.0) * pl * (lit(1.0) - pl)) +
      (col("n") - col("n_left")).cast("double") *
      (lit(2.0) * pr * (lit(1.0) - pr))) / nd
    one.select(col("n"), col("pos"), explode(array(entries: _*)).as("e"))
      .select(col("e.threshold").as("threshold"), col("n"), col("pos"),
        col("e.n_left").as("n_left"), col("e.pos_left").as("pos_left"))
      .dropDuplicates("threshold")
      .filter(col("n_left") > 0 && col("n_left") < col("n"))
      .select(col("threshold"), col("n"), col("pos"), col("n_left"),
        col("pos_left"), d6(pl).as("p_left"), d6(pr).as("p_right"),
        d6(gRoot).as("gini_root"), d6(gSplit).as("gini_split"),
        d9(gRoot - gSplit).as("gain"))
      .orderBy(col("gain").desc, col("threshold").asc)
      .limit(1)
  }

  def gmmEStep(embeddings: DataFrame, k: Int = 4,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val flat = embeddings.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol).cast("array<double>")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").as("x"))
    val cent = flat.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("dim"), col("x").as("c"))
    val d2 = flat.join(broadcast(cent), "dim")
      .groupBy("vec_id", "cid")
      .agg(sum(round((col("x") - col("c")) * (col("x") - col("c")), 6)
        .cast("decimal(18,6)")).cast("double").as("d2"))
    val sigma2 = d2.agg(
      Fns.q6(d6sum(col("d2")) / count(lit(1)).cast("double")).as("s2"))
    val dmin = d2.groupBy("vec_id").agg(min(col("d2")).as("dmin"))
    val e = d2.join(dmin, "vec_id").crossJoin(broadcast(sigma2))
      .select(col("vec_id"), col("cid"),
        round(exp(-(col("d2") - col("dmin")) / (lit(2.0) * col("s2"))), 9)
          .as("e"),
        (col("d2") === col("dmin")).as("is_min"))
    val se = e.groupBy("vec_id").agg(
      sum(col("e").cast("decimal(28,9)")).as("se"),
      // hard assignment = nearest centroid, ties to the lower cid
      min(when(col("is_min"), col("cid"))).as("hard"))
    // r is an exact 9-dp value, so its 6-dp re-round and the avg_resp
    // division are done in exact BIGINT arithmetic: round(r·10⁹)
    // recovers the 9-dp integer bit-exactly on both engines, (k+500)
    // div 1000 is the half-up 6-dp cut (a DOUBLE re-round lands exactly
    // on the 0.5×10⁻⁶ tie whenever the last three digits are 500 —
    // ~1/1000 of rows, observed at sf0.1 — and engines round double
    // ties apart), and (2·sc6+n) div 2n is the tie-exact mean (the
    // perplexityBigram rationale).
    e.join(se, "vec_id")
      .select(col("cid"),
        Fns.q9(col("e") / col("se").cast("double")).as("r"),
        (col("cid") === col("hard")).as("is_hard"))
      .withColumn("r6",
        expr("(cast(round(r * 1e9) as bigint) + 500) div 1000"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("r6")).as("sc6"),
        sum(when(col("is_hard"), 1L).otherwise(0L)).as("n_hard"))
      .select(col("cid").cast("long").as("cid"), col("n_vecs"),
        (col("sc6").cast("double") / lit(1e6)).as("soft_count"),
        col("n_hard"),
        (expr("(sc6 * 2 + n_vecs) div (n_vecs * 2)").cast("double") /
          lit(1e6)).as("avg_resp"))
  }
}
