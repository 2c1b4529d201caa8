package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [keyRegex] — the optional regex restricts the
    // dump to matching query names (local iteration; the driver passes 2).
    val sfDir = args(0); val outDir = args(1)
    val keep: String => Boolean =
      if (args.length > 2) s => s.matches(args(2)) else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ts as timestamp[ns]; read as long nanos
      // (Ingest.readEvents truncates to micros, matching DuckDB).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same AQE coalescing floor as graft.Bench (see the rationale
      // there) — results are partitioning-independent by the repo's
      // determinism discipline; this only speeds the sweep up
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "256k"))
      // catalog DDL queries must not depend on the driver's CWD
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Manifest of attempted/failed keys: a query that throws must not
    // silently vanish from the sweep's denominator (the dump dir simply
    // wouldn't exist and parity.py would count what's left — ADVICE r17
    // medium). parity.py fails when failed is non-empty or a swept key
    // has no dump directory.
    val swept = SparkEntry.queries.keys.filter(keep).toSeq.sorted
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    swept.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    def arr(ss: Seq[String]) = ss.map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      s"""{"swept": ${arr(swept)}, "failed": ${arr(failed.toSeq)}}""")
    spark.stop()
  }
}
