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
    // Current investigation: emb_abtt 1e-6 parity diffs — dump the
    // Spark-side projection coefficient (dot) per vec for comparison
    // against the DuckDB oracle chain.
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val flat = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").as("x"))
    val mu = flat.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x"), 9).cast("decimal(28,9)")).as("sx"))
      .select(col("dim"),
        round((col("sx").cast("double") / col("n"))
          .cast("decimal(24,12)"), 6).cast("double").as("mu"))
    val pc = graft.operators.Similarity.pcaPowerIteration(emb)
      .select((col("i") + 1).cast("long").as("dim"), col("loading"))
    val packed = mu.join(pc, "dim").agg(
      transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
        s => s.getField("mu")).as("mus"),
      transform(array_sort(collect_list(struct(col("dim"), col("loading")))),
        s => s.getField("loading")).as("pcs"))
    val dots = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(packed))
      .withColumn("xm", zip_with(col("v"), col("mus"), (a, b) => a - b))
      .withColumn("dot",
        aggregate(
          zip_with(col("xm"), col("pcs"),
            (a, b) => round(a * b, 9).cast("decimal(28,9)")),
          lit(0).cast("decimal(38,9)"),
          (acc, t) => (acc + t).cast("decimal(38,9)"))
          .cast("double"))
      .select("vec_id", "dot")
    emb.filter(col("vec_id") === 19L)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(packed))
      .withColumn("xm", zip_with(col("v"), col("mus"), (a, b) => a - b))
      .select(posexplode(zip_with(col("xm"), col("pcs"),
        (a, b) => round(a * b, 9))))
      .collect().foreach(r => println(s"[smoke] term ${r.getInt(0)} ${r.getDouble(1)}"))
    dots.filter(col("vec_id").isin(11L, 18L, 19L, 20L)).orderBy("vec_id")
      .collect().foreach(r => println(s"[smoke] dot ${r.getLong(0)} = ${r.getDouble(1)}"))
    packed.select(col("mus")(18).as("mu19"), col("pcs")(18).as("pc19"),
        col("mus")(6), col("pcs")(6)).collect()
      .foreach(r => println(s"[smoke] packed $r"))
    spark.stop()
  }
}
