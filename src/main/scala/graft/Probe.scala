package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: time one registered query in isolation and dump its
  * formatted plan. `runMain graft.Probe <queryName> [sfDir] [reps]`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries("q1_pricing")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, sfDir).count()
      println(s"PROBE $name rep=$i sec=${(System.nanoTime() - t0) / 1e9} rows=$c")
    }
    if (sys.env.get("PROBE_EXPLAIN").contains("1"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
