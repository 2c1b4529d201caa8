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
    // 1-minute system load (from /proc/loadavg) — recorded before each
    // pass and at the end, so an inflated profile is diagnosable as
    // sandbox cross-talk (r5/r7 both saw ~2.5x run-level inflation on
    // unchanged queries) instead of being misread as a code regression.
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // (name, seconds, error) — a throwing query must NOT be recorded as a
    // normal fast timing; it gets an entry in "errors" instead.
    // Optional subset run (scale tests): SPARK_GRAFT_BENCH_ONLY is an
    // anchored regex over query names. Subset runs tag their JSON with
    // "only" and do NOT touch BENCH_FULL.json / BENCH_HISTORY.jsonl —
    // those artifacts are the full-registry profile by contract.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    def pass(keep: String => Boolean = _ => true): Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(kv => only.forall(kv._1.matches) && keep(kv._1))
        .map { case (name, fn) =>
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
    val load0 = loadavg()
    val p1 = pass()
    val load1 = loadavg()
    val p2 = pass()
    val load2 = loadavg()
    // Third pass for SUB-SECOND queries only: at the 0.2-1 s floor the
    // dominant variance is JIT/GC noise, and min-of-2 left one 1.66x
    // run-to-run outlier between otherwise-clean consecutive profiles
    // (r8's q_profile_stats). A third sample for micro queries makes the
    // 1.5x agreement gate meaningfully strict there too, at ~30 s extra
    // wall cost (the slow queries — the ones that dominate the total —
    // still run exactly twice).
    val micro = p1.zip(p2).collect {
      case ((n, t1, e1), (_, t2, e2))
        if e1.isEmpty && e2.isEmpty && math.min(t1, t2) < 1.0 => n
    }.toSet
    val p3 = pass(micro).map(r => r._1 -> r).toMap
    val load3 = loadavg()
    // Merge the passes per query:
    //  - both succeeded        → min time (and the 3rd sample when taken
    //    and itself clean), success
    //  - exactly one succeeded → THAT pass's time, success, flagged flaky
    //    (the failing pass's throw-time must never be the recorded timing)
    //  - both failed           → error (second pass's message)
    val results = p1.zip(p2).map { case ((n, t1, e1), (_, t2, e2)) =>
      (e1, e2) match {
        case (None, None) =>
          p3.get(n) match {
            case Some((_, t3, None)) => (n, math.min(math.min(t1, t2), t3), None, false)
            case Some((_, _, Some(_))) => (n, math.min(t1, t2), None, true)
            case None => (n, math.min(t1, t2), None, false)
          }
        case (None, Some(_))    => (n, t1, None, true)
        case (Some(_), None)    => (n, t2, None, true)
        case (Some(_), Some(e)) => (n, t1.min(t2), Some(e), false)
      }
    }
    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    // The harness keeps only the LAST ~2000 bytes of stdout (plus sbt's
    // trailing "[success] Total time" line), and with 100+ queries one JSON
    // line is ~3000+ bytes — every past round's artifact was truncated and
    // unparseable. Counter-measures, in order of what the tail preserves:
    //  1. the FULL line orders queries ascending by time, and puts the
    //     total/sf trailer AFTER them — so even when its head is cut, the
    //     surviving suffix is the slowest (= interesting) timings + total;
    //  2. a SHORT complete line (slowest queries only, 3-decimal times,
    //     sized well under the tail budget) is printed LAST so a JSON
    //     parser scanning the tail always finds one valid record;
    //  3. the full-precision line is persisted to BENCH_FULL.json in the
    //     repo root (plus /tmp and any argv/env override).
    val asc = results.sortBy(_._2)
    val qsFull = asc.collect { case (k, v, None, _) => jq(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => jq(k) + ":" + jq(e) }
      .mkString("{", ",", "}")
    val flaky = results.collect { case (k, _, None, true) => jq(k) }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, None, _) => v }.sum
    val nOk = results.count(_._3.isEmpty)
    // "passes":2 records the min-of-2 methodology (introduced round 6) so
    // round-over-round totals aren't read as comparable to the single-pass
    // rounds 1-5: min-of-2 is systematically lower.
    // Repo root: user.dir when it looks like this sbt project (sbt runMain
    // sets it to the project root), overridable via SPARK_GRAFT_REPO,
    // /root/repo as the sandbox fallback — no hardcoded absolute path on
    // foreign checkouts.
    val repoRoot = sys.env.get("SPARK_GRAFT_REPO")
      .orElse(Option(System.getProperty("user.dir"))
        .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d, "build.sbt"))))
      .getOrElse("/root/repo")
    val fullPath = s"$repoRoot/BENCH_FULL.json"
    val loads = f"""[$load0%.2f,$load1%.2f,$load2%.2f,$load3%.2f]"""
    val onlyTag = only.map(r => s""","only":${jq(r)}""").getOrElse("")
    val line =
      s"""{"metric":"total","unit":"sec","passes":2,"micro_passes":3,"n_micro":${micro.size},"loadavg":$loads,"flaky":$flaky,"errors":$errs,"queries":$qsFull,"n_ok":$nOk,"value":$total,"sf":"$sfDir","full":${jq(fullPath)}$onlyTag}"""
    println(line)
    // Short line: slowest-first entries until the byte budget is spent.
    val budget = 1600
    val desc = asc.reverse.collect { case (k, v, None, _) =>
      jq(k) + ":" + f"$v%.3f" }
    val header = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","passes":2,"micro_passes":3,"loadavg":$loads,"n_ok":$nOk,"sf":"$sfDir","errors":$errs,"full":${jq(fullPath)},"queries_omitted":@OMIT@,"queries":{"""
    var used = header.length + 60
    val kept = desc.takeWhile { e => used += e.length + 1; used <= budget }
    val short = header.replace("@OMIT@", (nOk - kept.length).toString) +
      kept.mkString(",") + "}}"
    println(short)
    // Persist the identical full-precision JSON line. Path precedence for
    // the extra copy: argv(0) > SPARK_GRAFT_BENCH_OUT > /tmp/graft-bench
    // .json. Fixed defaults on purpose (discoverable without coordination);
    // single-run assumption — concurrent benches must pass distinct paths.
    val outPath = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("/tmp/graft-bench.json")
    (if (only.isDefined) Seq(outPath) else Seq(fullPath, outPath)).distinct.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"bench: could not write $p: ${e.getMessage}") }
    }
    // Append-only history: consecutive committed profiles are how
    // run-to-run variance is told apart from real regressions (each line
    // carries its epoch + loadavg). Never truncated, one JSON per run.
    val histLine = "{\"epoch\":" + (System.currentTimeMillis() / 1000) + "," +
      line.drop(1) + "\n"
    if (only.isEmpty)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$repoRoot/BENCH_HISTORY.jsonl"),
      histLine.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable =>
      System.err.println(s"bench: could not append history: ${e.getMessage}") }
    spark.stop()
  }
}
