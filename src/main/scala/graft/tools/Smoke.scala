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

    // Current investigation: q_corr moment-aggregate cost at sf0.1 —
    // is Round(double)->decimal the bottleneck vs a direct decimal cast
    // vs raw double sums?
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_discount", "l_extendedprice", "l_quantity")
    println(s"[smoke] lineitem = ${li.count()}")
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    def run(tag: String)(ds: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      val aggs = Seq(count(lit(1)).as("n")) ++
        cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(sum(ds(col(c))).as(s"s_$i"), sum(ds(col(c) * col(c))).as(s"q_$i")) } ++
        pairs.map { case (i, j) => sum(ds(col(cols(i)) * col(cols(j)))).as(s"p_${i}_$j") }
      time(tag)(li.agg(aggs.head, aggs.tail: _*).collect())
      time(tag + " (2nd)")(li.agg(aggs.head, aggs.tail: _*).collect())
    }
    run("round+decimal(28,6)")(x => round(x, 6).cast("decimal(28,6)"))
    run("direct decimal(28,6)")(x => x.cast("decimal(28,6)"))
    run("raw double")(identity)
    run("scaled long")(x => round(x * 1000000d, 0).cast("long"))

    spark.stop()
  }
}
