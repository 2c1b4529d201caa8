package graft.tools

import org.apache.spark.sql.SparkSession

/** Local smoke/profiling runner: drives operators on /root/testdata
  * fixtures and prints results — used during development; not part of the
  * harness contract (Verify/Bench are).
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

    import graft.operators.Dedup
    val docs = graft.etl.Ingest.readTable(spark, sfDir, "documents").cache()
    println(s"[smoke] docs = ${docs.count()}")

    val sets = Dedup.shingleSets(docs, 3)
    time("shingleSets.count")(sets.count())
    val postings = sets
    time("posting self-join pairs") {
      val a = postings.as("a"); val b = postings.as("b")
      a.join(b, org.apache.spark.sql.functions.col("a.shingle") ===
          org.apache.spark.sql.functions.col("b.shingle") &&
          org.apache.spark.sql.functions.col("a.doc_id") <
          org.apache.spark.sql.functions.col("b.doc_id"))
        .groupBy("a.doc_id", "b.doc_id").count().count()
    }
    time("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
    time("minhashSignatures")(Dedup.minhashSignatures(docs, 3, 64).count())
    time("lshCandidatePairs") {
      Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs, 3, 64), 16, 4).count()
    }
    time("full minhashDedupPairs")(Dedup.minhashDedupPairs(docs, 3, 0.5, 64, 16).count())
    spark.stop()
  }
}
