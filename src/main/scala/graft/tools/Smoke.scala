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
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)

    // r19 investigation: does AQE's post-shuffle coalescing (default
    // minPartitionSize 1m) serialize small-but-compute-heavy shuffles?
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.derivations.toMap
    val names = Seq("ts_theil_sen", "ts_motif", "ts_hurst",
      "dedup_tf_cosine", "dedup_ngram_prefix", "text_bpe_merges",
      "graph_bfs_hops", "graph_label_prop", "graph_kcore",
      "graph_link_pred", "graph_conductance", "emb_eigengap",
      "emb_pca_power", "graph_fiedler", "ana_basket", "ts_pipeline_e2e")
    def t(tag: String, name: String): Unit = {
      graft.SparkEntry.clearMemos()
      val t0 = System.nanoTime()
      val n = all(name)(spark, sfDir).count()
      println(f"[smoke] $name $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    // warm JIT once with the default conf, then interleaved A/B/A/B per
    // query so host-load drift cancels
    names.foreach(n => t("warmup", n))
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    names.foreach { n =>
      for (rep <- 1 to 2) {
        spark.conf.set(key, "1m"); t(s"default$rep", n)
        spark.conf.set(key, "256k"); t(s"min256k$rep", n)
        spark.conf.set(key, "64k"); t(s"min64k-$rep", n)
      }
    }
    spark.stop()
  }
}
