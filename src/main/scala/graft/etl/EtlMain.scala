package graft.etl

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** One-command end-to-end ETL (reference `make etl`: create_tables.py then
  * etl.py:58–66): stage the two JSON sources, build the five star tables,
  * write them, and report row counts.
  *
  * Usage: runMain graft.etl.EtlMain [logJsonPath songJsonPath outDir]
  * With no args it runs demo mode: a tiny deterministic fixture (the
  * README.md:30–72 record shapes) is written to a temp dir and processed —
  * the same one-command smoke the reference's Makefile gives a new user.
  */
object EtlMain {

  private val demoLog: String = Seq(
    """{"artist":"The Prototypes","auth":"Logged In","firstName":"Ada","gender":"F","itemInSession":0,"lastName":"Lovelace","length":233.40363,"level":"paid","location":"London","method":"PUT","page":"NextSong","registration":1541016707796,"sessionId":100,"song":"Analytical Engine","status":200,"ts":1541105830796,"userAgent":"Mozilla/5.0","userId":"10"}""",
    """{"artist":null,"auth":"Logged In","firstName":"Ada","gender":"F","itemInSession":1,"lastName":"Lovelace","length":null,"level":"paid","location":"London","method":"GET","page":"Home","registration":1541016707796,"sessionId":100,"song":null,"status":200,"ts":1541105900796,"userAgent":"Mozilla/5.0","userId":"10"}""",
    """{"artist":"Nameless","auth":"Logged In","firstName":"Grace","gender":"F","itemInSession":0,"lastName":"Hopper","length":120.5,"level":"free","location":"NYC","method":"PUT","page":"NextSong","registration":1541016807796,"sessionId":200,"song":"Compiler Blues","status":200,"ts":1541106000796,"userAgent":"Mozilla/5.0","userId":"20"}"""
  ).mkString("\n")

  private val demoSongs: String = Seq(
    """{"num_songs":1,"artist_id":"AR1","artist_latitude":51.5,"artist_longitude":-0.1,"artist_location":"London","artist_name":"The Prototypes","song_id":"SO1","title":"Analytical Engine","duration":233.40363,"year":1843}""",
    """{"num_songs":1,"artist_id":"AR2","artist_latitude":null,"artist_longitude":null,"artist_location":"","artist_name":"Nameless","song_id":"SO2","title":"Compiler Blues","duration":120.5,"year":0}"""
  ).mkString("\n")

  def main(args: Array[String]): Unit = {
    val (logPath, songPath, outDir) = args match {
      case Array(l, s, o) => (l, s, o)
      case _ =>
        val tmp = Files.createTempDirectory("graft-etl-demo").toString
        Files.writeString(Paths.get(s"$tmp/log.json"), demoLog)
        Files.writeString(Paths.get(s"$tmp/songs.json"), demoSongs)
        (s"$tmp/log.json", s"$tmp/songs.json", s"$tmp/warehouse")
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Ingest.readLogEvents(spark, logPath)
    val songs = Ingest.readSongs(spark, songPath)
    val result = Pipeline.run(spark, events, songs, outDir)

    result.counts.toSeq.sortBy(_._1).foreach { case (t, n) =>
      println(s"[etl] $t: $n rows -> $outDir/$t")
    }
    result.failures.foreach { case (t, e) =>
      System.err.println(s"[etl] FAILED $t: ${e.getMessage}")
    }
    spark.stop()
    if (result.failures.nonEmpty) sys.exit(1)
  }
}
