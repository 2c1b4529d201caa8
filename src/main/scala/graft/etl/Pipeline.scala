package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** End-to-end ELT orchestration (reference ops 3,4,5,17: create_tables.py +
  * etl.py — drop/create, 2 COPYs, 5 INSERT…SELECTs run sequentially with a
  * log-and-continue error policy).
  *
  * Spark-first shape: read staging once, cache it (it feeds all five
  * transforms, like Redshift's staging tables feed five INSERTs), then five
  * append-mode parquet writes. `songplays` is partitioned by (year, month)
  * of start_time so downstream time-range queries get partition pruning —
  * the 100 TB posture the reference's EVEN distribution lacks.
  */
object Pipeline {

  final case class Result(counts: Map[String, Long], failures: Map[String, Throwable])

  def run(spark: SparkSession, events: DataFrame, songs: DataFrame,
          outDir: String): Result = {
    import org.apache.spark.sql.functions._

    val se = events.cache()
    val ss = songs.cache()

    val songplays = Transforms.withSurrogateId(Transforms.buildSongplays(se, ss))
      .withColumn("year", year(col("start_time")))
      .withColumn("month", month(col("start_time")))

    // (name, df, partition columns) — sequential like the reference's
    // insert loop; each write is an action barrier (etl.py:33–50).
    val writes: Seq[(String, DataFrame, Seq[String])] = Seq(
      ("time", Transforms.buildTime(se), Nil),
      ("users", Transforms.buildUsers(se), Nil),
      ("songs", Transforms.buildSongs(ss), Nil),
      ("artists", Transforms.buildArtists(se, ss), Nil),
      ("songplays", songplays, Seq("year", "month")))

    val (counts, failures) = writes.foldLeft(
      (Map.empty[String, Long], Map.empty[String, Throwable])) {
      case ((ok, bad), (name, df, parts)) =>
        // Log-and-continue per statement, like etl.py:27–30/49–50.
        try {
          val w = df.write.mode(SaveMode.Append)
          (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
            .parquet(s"$outDir/$name")
          (ok + (name -> spark.read.parquet(s"$outDir/$name").count()), bad)
        } catch { case e: Throwable => (ok, bad + (name -> e)) }
    }
    se.unpersist(); ss.unpersist()
    Result(counts, failures)
  }
}
