package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev tool, not harness contract) — edit the
  * body to time whatever operator is under investigation, run with
  * `sbt "runMain graft.tools.Smoke [sfDir]"`.
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

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // Current investigation: cluster resolution on the REAL sf0.1
    // near-dup graph — star contraction vs the adaptive probe dispatch
    // vs propagation, on pre-materialized pairs (mining cost excluded).
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup")(docs.limit(10).count())
    val pairs = time("mine pairs (excluded)")(
      Dedup.ngramJaccardPairs(docs, 3, 0.5).localCheckpoint(true))
    println(s"[smoke] pairs: ${pairs.count()}")
    val star = time("star contraction")(
      Dedup.dedupClusters(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect()(0).getLong(0))
    val adaptive = time("adaptive dispatch")(
      Dedup.dedupClustersAdaptive(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect()(0).getLong(0))
    val prop = time("propagation")(
      Dedup.dedupClustersPropagation(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect()(0).getLong(0))
    println(s"[smoke] clusters star=$star adaptive=$adaptive prop=$prop")
    // second rep each, warm
    time("star rep2")(
      Dedup.dedupClusters(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect())
    time("adaptive rep2")(
      Dedup.dedupClustersAdaptive(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect())
    time("propagation rep2")(
      Dedup.dedupClustersPropagation(docs, pairs, strict = true)
        .agg(countDistinct("cluster_id")).collect())
    spark.stop()
  }
}
