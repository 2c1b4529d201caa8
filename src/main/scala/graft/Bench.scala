package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The harness environment is local[32] (32 executor threads); honor an
    // explicit override, otherwise use all cores up to 32.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the alphabetically-first query doesn't absorb
    // several seconds of one-time JIT + classloading cost. Runs on the
    // sf0.001 fixture (NOT the benched sfDir — no page-cache preloading
    // of timed data), covering the parquet reader, agg, window and
    // events-timestamp paths.
    Seq("q1_pricing", "op09_dedup_latest", "ana_favorite_type").foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // (name, seconds, error) — a throwing query must NOT be recorded as a
    // normal fast timing; it gets an entry in "errors" instead.
    def pass(): Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    // Two full passes, min per query. BENCH_r05 showed 5-7x swings on four
    // queries whose code did not change since r4 — transient cross-talk
    // (page-cache / GC pressure from the write-heavy alphabetical
    // neighbors op_csv_roundtrip / op_bucketed_join, or sandbox load).
    // min-of-2 reports each query's achievable cost, not whatever the
    // neighbor left behind. All write queries are idempotent (drop-if-
    // exists / overwrite / pid-scoped temp dirs), so a second pass is safe.
    val p1 = pass()
    val p2 = pass()
    // Merge the two passes per query:
    //  - both succeeded        → min time, success
    //  - exactly one succeeded → THAT pass's time, success, flagged flaky
    //    (the failing pass's throw-time must never be the recorded timing)
    //  - both failed           → error (second pass's message)
    val results = p1.zip(p2).map { case ((n, t1, e1), (_, t2, e2)) =>
      (e1, e2) match {
        case (None, None)       => (n, math.min(t1, t2), None, false)
        case (None, Some(_))    => (n, t1, None, true)
        case (Some(_), None)    => (n, t2, None, true)
        case (Some(_), Some(e)) => (n, t1.min(t2), Some(e), false)
      }
    }
    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.collect { case (k, v, None, _) => jq(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => jq(k) + ":" + jq(e) }
      .mkString("{", ",", "}")
    val flaky = results.collect { case (k, _, None, true) => jq(k) }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, None, _) => v }.sum
    // "passes":2 records the min-of-2 methodology (introduced round 6) so
    // round-over-round totals aren't read as comparable to the single-pass
    // rounds 1-5: min-of-2 is systematically lower.
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","passes":2,"queries":$qs,"errors":$errs,"flaky":$flaky,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only the tail of stdout, which has truncated the
    // first ~33 per-query timings in past rounds; persist the identical JSON
    // line to a file so the full profile always survives. Path precedence:
    // argv(0) > SPARK_GRAFT_BENCH_OUT > /tmp/graft-bench.json. The default
    // is a FIXED path on purpose (the driver knows where to look without
    // coordination); it assumes one bench run at a time — concurrent runs
    // must pass distinct argv/env paths or they clobber each other.
    val outPath = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("/tmp/graft-bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
