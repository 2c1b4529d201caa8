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
    // Warm JIT/classloading on the tiny fixture so rep=1 measures the
    // query, not first-run compilation; if the fixture is absent, warm on
    // the target query itself (rep=1 then preloads page cache — noted).
    try SparkEntry.queries("q1_pricing")(spark, "/root/testdata/sf0.001").count()
    catch {
      case e: Exception =>
        println(s"PROBE warmup on sf0.001 failed (${e.getClass.getSimpleName}); warming on target")
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e2: Exception =>
          println(s"PROBE warmup on target failed too: ${e2.getMessage}") }
    }
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
