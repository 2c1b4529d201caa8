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

    // Current investigation: emb_covariance cost decomposition — the
    // nested-HOF upper-triangle explode (interpreted) vs a no-HOF
    // double-posexplode formulation (codegen end to end).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[smoke] embeddings = ${emb.count()}")

    // A: production path
    time("covarianceMatrix (full)")(
      graft.operators.Similarity.covarianceMatrix(emb).count())
    time("covarianceMatrix (2nd)")(
      graft.operators.Similarity.covarianceMatrix(emb).count())

    // Stage decomposition of the full op
    {
      import org.apache.spark.sql.functions._
      val v2 = col("embedding").cast("array<double>")
      val means = emb
        .select(posexplode(v2).as(Seq("i", "x")))
        .groupBy("i")
        .agg(sum(round(col("x"), 9).cast("decimal(28,9)")).as("sx"))
        .select(col("i").cast("long").as("i"), col("sx"))
      time("means agg alone")(means.count())
      time("means agg 2nd")(means.count())
      val p2 = emb.select(v2.as("v"))
        .select(col("v"), posexplode(col("v")).as(Seq("i0", "xi")))
        .select(col("i0"), col("xi"),
          posexplode(slice(col("v"), col("i0") + 1, size(col("v")) - col("i0")))
            .as(Seq("j0", "xj")))
        .select(col("i0").cast("long").as("i"),
          (col("i0") + col("j0")).cast("long").as("j"),
          round(col("xi") * col("xj"), 9).cast("decimal(28,9)").as("p"))
        .groupBy("i", "j").agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
      val upper = p2
        .join(broadcast(means.select(col("i"), col("sx").as("si"))), "i")
        .join(broadcast(means.select(col("i").as("j"), col("sx").as("sj"))), "j")
        .select(col("i"), col("j"),
          (round(col("sp").cast("double") / col("n")
            - (col("si").cast("double") / col("n"))
            * (col("sj").cast("double") / col("n")), 6) + lit(0.0)).as("cov"))
      time("upper no-checkpoint")(upper.count())
      time("upper no-checkpoint 2nd")(upper.count())
      time("upper + localCheckpoint")(upper.localCheckpoint().count())
      time("upper + localCheckpoint 2nd")(upper.localCheckpoint().count())
      time("upper union self (2x eval)") {
        val u = upper
        u.union(u.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cov"))).count()
      }
      time("upper rdd.count")(upper.rdd.count())
      time("lazy localCheckpoint+count")(upper.localCheckpoint(false).count())
      val pers = upper.persist()
      time("persist+union count") {
        pers.union(pers.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cov"))).count()
      }
      time("persisted union 2nd") {
        pers.union(pers.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cov"))).count()
      }
      pers.unpersist()
      time("upper toRdd (internal rows)")(upper.queryExecution.toRdd.count())
      time("pairs-agg rdd.count")(p2.rdd.count())
      time("pairs-agg toRdd.count")(p2.queryExecution.toRdd.count())
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("upper count AQE off")(upper.count())
      time("pairs-agg count AQE off")(p2.count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")

      // Arithmetic variants, all via toRdd so nothing is pruned:
      def pairsWith(p: org.apache.spark.sql.Column, agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        emb.select(v2.as("v"))
          .select(col("v"), posexplode(col("v")).as(Seq("i0", "xi")))
          .select(col("i0"), col("xi"),
            posexplode(slice(col("v"), col("i0") + 1, size(col("v")) - col("i0")))
              .as(Seq("j0", "xj")))
          .select(col("i0").cast("long").as("i"),
            (col("i0") + col("j0")).cast("long").as("j"), p.as("p"))
          .groupBy("i", "j").agg(agg(col("p")).as("sp"), count(lit(1)).as("n"))
      val xij = col("xi") * col("xj")
      time("sum raw double")(
        pairsWith(xij, sum).queryExecution.toRdd.count())
      time("round9+dec28 sum (current)")(
        pairsWith(round(xij, 9).cast("decimal(28,9)"), sum).queryExecution.toRdd.count())
      time("round9 only, double sum")(
        pairsWith(round(xij, 9), sum).queryExecution.toRdd.count())
      time("scaled-long round, long sum")(
        pairsWith(round(xij * 1e9, 0).cast("long"), sum).queryExecution.toRdd.count())
      time("scaled-long round, dec38 sum")(
        pairsWith(round(xij * 1e9, 0).cast("long").cast("decimal(38,0)"), sum)
          .queryExecution.toRdd.count())
      time("scaled-long 2nd")(
        pairsWith(round(xij * 1e9, 0).cast("long"), sum).queryExecution.toRdd.count())
      // do the two quantizations agree cell-for-cell?
      val viaDec = pairsWith(round(xij, 9).cast("decimal(28,9)"), sum)
        .select(col("i"), col("j"), (col("sp") * 1000000000L).cast("long").as("u"))
      val viaLong = pairsWith(round(xij * 1e9, 0).cast("long"), sum)
        .select(col("i"), col("j"), col("sp").cast("long").as("u"))
      val dv = viaDec.orderBy("i", "j").collect().map(_.toSeq)
      val lv = viaLong.orderBy("i", "j").collect().map(_.toSeq)
      println(s"[smoke] dec == long quantization: ${dv.toSeq == lv.toSeq}")
    }

    // A': just the nested-HOF pairs aggregate (no means join, no union)
    val v = col("embedding").cast("array<double>")
    val pairsHof = emb.select(explode(
      flatten(transform(v, (xi, i) =>
        transform(slice(v, i + lit(1), size(v) - i), (xj, j0) =>
          struct(i.as("i"), (i + j0).as("j"),
            round(xi * xj, 9).cast("decimal(28,9)").as("p"))))))
      .as("e"))
      .select(col("e.i").cast("long").as("i"), col("e.j").cast("long").as("j"),
        col("e.p").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
    time("pairs nested-HOF agg")(pairsHof.count())

    // B: double posexplode, zero HOFs — same (i, j, p) rows
    val step1 = emb.select(v.as("v"))
      .select(col("v"), posexplode(col("v")).as(Seq("i0", "xi")))
    val pairsGen = step1
      .select(col("i0"), col("xi"),
        posexplode(slice(col("v"), col("i0") + 1, size(col("v")) - col("i0")))
          .as(Seq("j0", "xj")))
      .select(col("i0").cast("long").as("i"),
        (col("i0") + col("j0")).cast("long").as("j"),
        round(col("xi") * col("xj"), 9).cast("decimal(28,9)").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
    time("pairs double-posexplode agg")(pairsGen.count())
    time("pairs double-posexplode 2nd")(pairsGen.count())

    // C: how much of B is the decimal round/cast vs the explode shape?
    val pairsRaw = step1
      .select(col("i0"), col("xi"),
        posexplode(slice(col("v"), col("i0") + 1, size(col("v")) - col("i0")))
          .as(Seq("j0", "xj")))
      .select(col("i0").cast("long").as("i"),
        (col("i0") + col("j0")).cast("long").as("j"),
        (col("xi") * col("xj")).as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("sp"), count(lit(1)).as("n"))
    time("pairs posexplode raw-double")(pairsRaw.count())

    // Equivalence check: B reproduces A's aggregate exactly
    val a = pairsHof.select(col("i"), col("j"), col("sp").cast("string"))
      .orderBy("i", "j").collect().toSeq
    val b = pairsGen.select(col("i"), col("j"), col("sp").cast("string"))
      .orderBy("i", "j").collect().toSeq
    println(s"[smoke] A == B: ${a == b} (${a.size} cells)")

    spark.stop()
  }
}
