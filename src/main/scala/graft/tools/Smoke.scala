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
    // Current investigation: cusumScan prefix/runmin decomposition on
    // a hand series (level shift 10x0 then 10x2)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0 until 20).map(h =>
        (1L, f"2024-01-01 $h%02d:00:00", if (h < 10) 0.0 else 2.0))
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    graft.operators.TimeSeries.cusumScan(rows, "user_id", "ts", "value")
      .show(false)
    spark.stop()
  }
}
