package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)
    import graft.etl.Ingest
    import graft.operators.Similarity

    def t(name: String)(job: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = job
      println(f"[smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    // r19 opt: post-spread timings of the touched operators (each twice).
    val emb = Ingest.readTable(spark, sfDir, "embeddings")
    val li = Ingest.readTable(spark, sfDir, "lineitem")
    for (round <- 1 to 2) {
      t(s"knn_exact r$round")(Similarity.bruteForceTopK(emb, emb, 5).count())
      t(s"twonn r$round")(Similarity.intrinsicDimension(emb).count())
      t(s"emb_cov r$round")(Similarity.covarianceMatrix(emb).count())
      t(s"q_corr r$round")(graft.operators.DataQuality.corrMatrix(
        li, Seq("l_discount", "l_extendedprice", "l_quantity")).count())
      t(s"silhouette r$round")(Similarity.silhouette(emb, 8).count())
      t(s"inertia r$round")(Similarity.inertiaCurve(emb, Seq(2, 4, 8)).count())
      t(s"outliers r$round")(Similarity.embeddingOutliers(emb, 8, 0.9).count())
      t(s"purity r$round")(Similarity.clusterPurity(emb, 8).count())
    }
    spark.stop()
  }
}
