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
    // Current investigation: winnow selection stage decomposition
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hs = docs.select(col("doc_id"),
        posexplode(graft.functions.Fns.shingles(
          graft.functions.Fns.tokens(col("text")), 3)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.operators.Sketch.stringHash(col("sh")).as("h"))
    time("hs (shingle+hash)")(hs.count())
    time("hs again (warm)")(hs.count())
    val mx = hs.groupBy("doc_id").agg(max("pos").as("mx"))
    val wnd = hs.join(mx, "doc_id")
      .select(col("doc_id"), col("pos"), col("h"),
        explode(sequence(col("pos"),
          least(col("pos") + 3, col("mx")))).as("e"))
      .filter(col("e") >= 3)
    time("wnd explode")(wnd.count())
    val winW = Window.partitionBy("doc_id", "e")
      .orderBy(col("h").asc, col("pos").desc)
    time("window+distinct")(wnd.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(winW))
      .filter(col("rn") === 1).select("doc_id", "pos", "h")
      .distinct().count())
    spark.stop()
  }
}
