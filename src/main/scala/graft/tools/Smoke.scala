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

    // Current investigation: tf-cosine cost decomposition at sf0.1 —
    // how much is the dense-vector HOF densify vs the rest?
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[smoke] docs = ${docs.count()}")
    time("tfCosinePairs full")(
      graft.operators.Dedup.tfCosinePairs(docs, 0.95).count())
    time("tfCosinePairs full 2nd")(
      graft.operators.Dedup.tfCosinePairs(docs, 0.95).count())

    // stage decomposition
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.Fns.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    time("termFreq + stats")(
      tf.agg(countDistinct(col("term")), countDistinct(col("doc_id"))).head())
    val labs = time("vocabComponents")(graft.operators.Dedup.vocabComponents(tf))
    time("labs count")(labs.count())
    val cstats = tf.join(labs, "doc_id").groupBy("lab")
      .agg(countDistinct(col("term")).as("cv"))
    time("component stats")(cstats.count())
    println("[smoke] n components: " + cstats.count() +
      " max cv: " + cstats.agg(max(col("cv"))).head().getLong(0))
    spark.stop()
  }
}
