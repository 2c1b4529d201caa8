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
