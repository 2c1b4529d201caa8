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

    // Current investigation: tf-cosine formulations at sf0.1 (V=31 corpus).
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[smoke] docs = ${docs.count()}")
    time("tf_cosine dense (1st)")(Dedup.tfCosinePairsDense(docs, 0.95).count())
    time("tf_cosine dense (2nd)")(Dedup.tfCosinePairsDense(docs, 0.95).count())
    time("tf_cosine dispatcher")(Dedup.tfCosinePairs(docs, 0.95).count())

    spark.stop()
  }
}
