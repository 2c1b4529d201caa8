package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation — the LLM-pipeline analog of the
  * warehouse ELT in [[graft.etl.Pipeline]]: compose the individual
  * operators into the standard corpus flow
  *
  *   scrub (PII redaction) → quality gate (token count, stopword ratio)
  *   → exact dedup (min-id keeper) → deterministic train/val/test split
  *   → per-split token-budget sequence packing.
  *
  * Every stage is one of the verified operators — this exists to prove
  * (and oracle-check) that they COMPOSE: the output is one row per
  * surviving document with its split and its packed sequence id.
  *
  * Scale shape: two narrow per-row stages, one hash aggregation on the
  * text for the dedup, a narrow hash split, and the per-shard packing
  * window — no stage is quadratic, nothing global except the per-split
  * cumsum, which is sharded by construction.
  */
object DocPipeline {

  def prepare(docs: DataFrame,
              minTokens: Int = 25, maxStopwordRatio: Double = 0.15,
              valFrac: Double = 0.1, testFrac: Double = 0.1,
              budget: Int = 400): DataFrame = {
    val scrubbed = TextAnalysis.scrub(docs)
      .withColumnRenamed("text_scrubbed", "text")
    val metrics = TextAnalysis.quality(scrubbed)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
      .select("doc_id")
    val kept = scrubbed.join(metrics, "doc_id")
    val keepIds = kept.groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = kept.join(keepIds, "doc_id")
    val split = Sampling.assignSplit(deduped, "doc_id", valFrac, testFrac)
    TextAnalysis.packSequencesSharded(split, budget, "split")
  }

  /** The LLM-pretraining face of the pipeline — the round-16 north-star
    * chain over the now-complete stages, each individually verified:
    *
    *   near-dup dedup (star-contraction cluster labels → keep each
    *   cluster's representative) → eval-set decontamination (drop any
    *   train doc sharing ≥ 1 n-gram with the held-out sources) →
    *   mixture sampling ([[Sampling.mixtureSample]]: Pile/Dolma-style
    *   source weights + token budget → deterministic hash-threshold
    *   keep) → per-shard sequence packing.
    *
    * `clusters` is the (doc_id, cluster_id) label frame (the
    * [[Dedup.dedupClusters]] output — callers with a materialized label
    * table pass it directly, which is also what keeps the expensive
    * pair derivation shared). Eval-source documents are excluded from
    * the training corpus AND their n-grams poison matching train docs.
    *
    * Output: one row per packed surviving document —
    * (doc_id, shard, n_subwords, seq_id).
    *
    * Scale shape: every stage is the verified operator's own shape —
    * nothing quadratic, one postings join against the (small) eval
    * side, a |sources|-row broadcast plan, and the per-shard packing
    * cumsum. The chain proves the handoffs compose: schemas line up,
    * and end-to-end determinism survives five stage boundaries.
    */
  def prepareLlm(docs: DataFrame, clusters: DataFrame,
                 evalSources: Seq[String], weights: Map[String, Double],
                 tokenBudget: Long, seqBudget: Int = 400,
                 shardCol: String = "lang", ngramN: Int = 4): DataFrame = {
    val reps = docs.join(
      clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id"),
      "doc_id")
    val isEval = col("source").isin(evalSources: _*)
    val train = reps.filter(!isEval)
    val contaminated = Dedup
      .decontaminateNgram(train, docs.filter(isEval), ngramN)
      .select("doc_id")
    // Eagerly checkpointed: mixtureSample reads its input TWICE (the
    // per-source totals under the broadcast plan, then the keep filter),
    // and without the cut each read re-runs the rep-join + n-gram
    // decontamination subchain — the chain's dominant cost, paid double.
    val cleanTrain = train.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val sampled = Sampling.mixtureSample(cleanTrain, weights, tokenBudget)
    TextAnalysis.packSequencesSharded(sampled, seqBudget, shardCol)
  }

  /** The ML face of the pipeline: the same scrub → quality-gate → exact
    * dedup → leak-free split front end, then a Naive Bayes language
    * classifier TRAINED on the train shard and EVALUATED on the test
    * shard ([[ML.naiveBayesEval]]) — a real generalization measurement
    * over pipeline-curated data, chained end-to-end so contract drift
    * between any two stages (a gate that eats a language, a split that
    * leaks) shows up as a recall shift the solo oracles can't see.
    * Output: per-language test recall rows.
    */
  def prepareAndEval(docs: DataFrame,
                     minTokens: Int = 25, maxStopwordRatio: Double = 0.15,
                     valFrac: Double = 0.1, testFrac: Double = 0.1): DataFrame = {
    val scrubbed = TextAnalysis.scrub(docs)
      .withColumnRenamed("text_scrubbed", "text")
    val metrics = TextAnalysis.quality(scrubbed)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
      .select("doc_id")
    val kept = scrubbed.join(metrics, "doc_id")
    val keepIds = kept.groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = kept.join(keepIds, "doc_id")
    // scrub projects (doc_id, text); the label rides back in by id
    val split = Sampling.assignSplit(deduped, "doc_id", valFrac, testFrac)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    ML.naiveBayesEval(
      split.filter(col("split") === "train"),
      split.filter(col("split") === "test"))
  }
}
