package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev tool, not harness contract) — edit the
  * body to time whatever operator is under investigation, run with
  * `sbt "runMain graft.tools.Smoke [sfDir]"`.
  *
  * INTENTIONALLY EPHEMERAL: the body is whatever the most recent
  * investigation needed and is overwritten freely between rounds — it
  * is not dead code and carries no compatibility contract.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)

    // Current investigation: exchange census of the 10 most expensive
    // bench queries (PlanGuardSpec pin prep).
    val top = Seq("ts_theil_sen", "ts_pipeline_e2e", "ts_motif",
      "ana_markov_entropy", "dedup_tf_cosine", "dedup_ngram_prefix",
      "emb_silhouette", "emb_kcenter", "q_corr", "ana_basket")
    top.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
        .r.findAllIn(plan).size
      val bcasts = "(?<!Reused)BroadcastExchange".r.findAllIn(plan).size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      println(s"[smoke] $name shuffles=$shuffles bcast=$bcasts reused=$reused smj=$smj bhj=$bhj")
    }
    spark.stop()
  }
}
