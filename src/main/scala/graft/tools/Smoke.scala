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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"DOCS ROWS = ${docs.count()}")
    println("--- langId on documents ---")
    graft.operators.TextAnalysis.langId(docs).show(8, truncate = false)
    println("--- langId edge: empty input ---")
    graft.operators.TextAnalysis.langId(docs.limit(0)).show()
    println("--- langId edge: hand rows ---")
    graft.operators.TextAnalysis.langId(
      Seq((1L, "der die das und ist"), (2L, ""), (3L, "the of to in the"))
        .toDF("doc_id", "text")).show()
    spark.stop()
  }
}
