package graft.tools

import org.apache.spark.sql.SparkSession

/** Local smoke runner: drives operators on /root/testdata fixtures and
  * prints results — used during development; not part of the harness
  * contract (Verify/Bench are).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = graft.etl.Ingest.readEvents(spark, sfDir)
    events.printSchema()
    events.select($"ts").orderBy($"event_id").show(3, truncate = false)
    println("EVENTS ROWS = " + events.count())
    spark.stop()
  }
}
