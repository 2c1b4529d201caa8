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

    // Current investigation: native graft_strhash vs the interpreted HOF
    // in the CMS register build (the sketch_cms bench cost driver).
    import org.apache.spark.sql.functions._
    import graft.operators.Sketch
    val e = graft.etl.Ingest.readTable(spark, sfDir, "events")
      .select(col("user_id").cast("string").as("key")).cache()
    println(s"[smoke] events = ${e.count()}")
    time("warmup native")(e.select(Sketch.stringHash(col("key"))).count())
    time("cmsBuild native x64")(Sketch.cmsBuild(e, "key", 4, 64).count())
    time("cmsBuild again")(Sketch.cmsBuild(e, "key", 4, 64).count())
    time("hash only native")(
      e.select(Sketch.stringHash(col("key")).as("h")).agg(sum("h")).count())
    time("hash only HOF")(
      e.select(Sketch.stringHashHof(col("key")).as("h")).agg(sum("h")).count())
    // isolate: explode+groupBy with a precomputed cheap h
    val pre = e.select(col("key"), Sketch.stringHash(col("key")).as("h")).cache()
    pre.count()
    time("explode+groupBy, h reused") {
      pre.select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("row"),
            Sketch.cmsBucket(col("h"), r, 64).as("bucket"))): _*)).as("rb"))
        .groupBy(col("rb.row"), col("rb.bucket")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
