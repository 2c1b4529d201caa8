package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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

    // Current investigation: decompose _derive_doc_clusters' decade-2
    // super-linearity at sf10 — pair mining vs cluster resolution.
    import graft.operators.Dedup
    val docs = graft.etl.Ingest.readTable(spark, sfDir, "documents")
    def t(name: String)(job: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = job
      println(f"[smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    t("docs.count warm")(docs.count())
    val lazyPairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    t("lazy pairs: union+filter+eager-ckpt (the adaptive edges shape)")(
      lazyPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(lazyPairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint().count())
    val p2 = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    t("pairs.count alone (single evaluation)")(p2.count())
    t("adaptive on LAZY pairs (docClustersFresh shape)")(
      Dedup.dedupClustersAdaptive(docs,
        Dedup.ngramJaccardPairs(docs, 3, 0.5), strict = true).count())
    spark.stop()
  }
}
