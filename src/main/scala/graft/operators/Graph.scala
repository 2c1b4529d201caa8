package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Companion to the
  * min-label propagation in [[Dedup.dedupClusters]] — same design rules:
  * fixed-point loops build lazy-checkpointed plans (no driver-side data,
  * no collect), every cross-partition float sum rides an exact DECIMAL,
  * so results are bit-identical across engines and re-partitionings.
  */
object Graph {

  /** PageRank with `iters` synchronous power iterations (damping `d`):
    * `r' = (1−d)/N + d·(Σ_in r/outdeg + danglingMass/N)` — the classic
    * link-quality score, used in data curation to weight crawl domains /
    * citation graphs before sampling.
    *
    * Determinism: per-node in-sums and the dangling mass are 12-dp-rounded
    * exact DECIMAL sums (ranks ≤ 1, so scale-12 quantization is exact in
    * any engine); the rank update itself is a fixed per-row double
    * expression. The DuckDB oracle unrolls the same iterations CTE by CTE
    * and reproduces every bit.
    *
    * Scale shape per iteration: one hash shuffle keyed on dst for the
    * contribution sum (map-side combine), a broadcast single-row dangling
    * aggregate, one key join back to the node set; ranks are
    * EAGER-checkpointed each round so the plan stays iteration-depth-free
    * (the round-5 dedupClusters lesson) and checkpoint materialization
    * stays single-threaded (the deadlock note in dedupClusters). Edges
    * are deduplicated up front; nodes = src ∪ dst. Calling this method
    * therefore RUNS the iterations — it is not a lazy plan builder.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    // EAGER checkpoints throughout the loop: a lazy checkpoint that a
    // broadcast-exchange thread and the DAG scheduler race to materialize
    // deadlocks on Spark's global RDDCheckpointData monitor (see
    // Dedup.dedupClusters scaladoc); creation-order materialization makes
    // every broadcast subtree read an already-materialized checkpoint.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(18,12)"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("rank"), col("n_nodes"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
      val inSum = contrib.groupBy("node").agg(dsum(col("c")).as("s"))
      val dangling = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(dsum(col("rank")), lit(0).cast("decimal(18,12)")).as("dm"))
      ranks = ranks.select("node", "n_nodes")
        .join(inSum, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") + lit(damping) *
            (coalesce(col("s").cast("double"), lit(0.0)) +
              col("dm").cast("double") / col("n_nodes"))).as("rank"),
          col("n_nodes"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
