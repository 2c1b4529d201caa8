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

    // Current investigation: registry-wide physical-plan inventory
    // (r18 plan-lint prep) + node-line exchange census of the 10 pinned
    // bench queries (reused-reference-free counts, ADVICE r17).
    def nodeLines(plan: String): Seq[String] = plan.linesIterator
      .map(_.dropWhile(c => " :+-*(0123456789)".contains(c))).toSeq
    val top = Seq("ts_theil_sen", "ts_pipeline_e2e", "ts_motif",
      "ana_markov_entropy", "dedup_tf_cosine", "dedup_ngram_prefix",
      "emb_silhouette", "emb_kcenter", "q_corr", "ana_basket")
    top.foreach { name =>
      val nl = nodeLines(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      val shuffles = nl.count(l => l.startsWith("Exchange hashpartitioning")
        || l.startsWith("Exchange rangepartitioning")
        || l.startsWith("Exchange SinglePartition"))
      val bcasts = nl.count(_.startsWith("BroadcastExchange"))
      val reused = nl.count(_.startsWith("ReusedExchange"))
      val smj = nl.count(_.startsWith("SortMergeJoin"))
      println(s"[smoke] $name shuffles=$shuffles bcast=$bcasts reused=$reused smj=$smj")
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val nl = nodeLines(fn(spark, sfDir).queryExecution.executedPlan.toString)
        val cart = nl.count(_.startsWith("CartesianProduct"))
        val rdd = nl.count(_.contains("ExistingRDD"))
        val bnlj = nl.count(_.startsWith("BroadcastNestedLoopJoin"))
        if (cart + rdd + bnlj > 0)
          println(s"[lint] $name cartesian=$cart existingRdd=$rdd bnlj=$bnlj")
      } catch { case e: Throwable =>
        println(s"[lint] $name PLAN BUILD FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
