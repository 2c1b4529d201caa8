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

    // Current investigation: co-purchase edge derivation — 4-shuffle
    // distinct+self-join chain vs 2-shuffle collect_set+pair-expansion.
    import org.apache.spark.sql.functions._
    import graft.functions.Fns
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("warmup li")(li.limit(10).count())
    val it = li.select(col("l_orderkey").as("bk"), col("l_partkey").as("pt"))
      .distinct()
    val edgesOld = it.as("l").join(it.as("r"),
        col("l.bk") === col("r.bk") && col("l.pt") < col("r.pt"))
      .groupBy(col("l.pt").as("src"), col("r.pt").as("dst"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("src", "dst")
    time("edges old (4-shuffle)")(edgesOld.count())
    time("edges old rep2")(edgesOld.count())
    val parts = li.groupBy(col("l_orderkey").as("bk"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val edgesNew = parts
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2),
            greatest(size(col("ps")) - i - 1, lit(0))), y =>
          struct(x.as("src"), y.as("dst")))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("src", "dst")
    time("edges new (2-shuffle)")(edgesNew.count())
    time("edges new rep2")(edgesNew.count())
    val diff = edgesOld.unionByName(edgesNew)
      .groupBy("src", "dst").agg(count(lit(1)).as("k"))
      .filter(col("k") =!= 2).count()
    println(s"[smoke] edge-set diff rows: $diff")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup small")(docs.limit(10).count())
    val sh0 = docs.select(col("doc_id"),
        explode(Fns.shingles(Fns.tokens(col("text")), 3)).as("shingle"))
      .distinct()
      .withColumn("h64", xxhash64(col("shingle")))
    time("shingles distinct")(sh0.count())
    val shM = docs
      .select(col("doc_id"), Fns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Fns.shingles(col("toks"), 3)).as("shingle"))
      .distinct()
      .withColumn("h64", xxhash64(col("shingle")))
    time("shingles mat-toks")(shM.count())
    time("shingles mat-toks rep2")(shM.count())
    val sh = time("checkpoint")(sh0.localCheckpoint(true))
    val x = sh.select(col("doc_id"),
      call_function("graft_strhash", col("shingle")).as("x"))
    time("strhash only")(x.count())
    val P31 = 2147483647L
    val aggs = (0 until 16).map { p =>
      val a = (1103515245L * (p + 1)) % P31
      val b = (12345L * (p + 1)) % P31
      min(Fns.pmod(col("x") * lit(a) + lit(b), lit(P31))).as(s"m$p")
    }
    val sig = x.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    time("minhash wide sig")(sig.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h64") === col("b.h64") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ni"))
    time("pair join+agg")(pairs.count())
    val j = pairs
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
    time("pair sizes joins")(j.count())
    time("full curve card")(
      graft.operators.Dedup.lshCalibrationCurve(docs).count())
    time("full est card")(
      graft.operators.Dedup.minhashEstimatorCard(docs).count())
    spark.stop()
  }
}
