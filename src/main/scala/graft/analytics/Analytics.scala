package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytic capability the star schema exists to serve ("which songs
  * Sparkify's users listen to", reference README.md:9). The reference ships
  * no analytic query text — these are the representative set over the
  * warehouse tables produced by `etl.Pipeline`. Dimensions are small by
  * construction (star schema), so Catalyst broadcasts them; the fact table
  * is the only large scan.
  */
object Analytics {

  /** Top-k songs by play count. */
  def topSongs(songplays: DataFrame, songs: DataFrame, k: Int): DataFrame =
    songplays.join(songs, "song_id")
      .groupBy(col("song_id"), col("title"))
      .agg(count(lit(1)).as("n_plays"))
      .orderBy(col("n_plays").desc, col("song_id").asc)
      .limit(k)

  /** Plays per hour-of-day and weekday — time-dimension join + agg. */
  def playsByTime(songplays: DataFrame, time: DataFrame): DataFrame =
    songplays.join(time, songplays("start_time") === time("start_time"))
      .groupBy(col("hour"), col("weekday"))
      .agg(count(lit(1)).as("n_plays"))

  /** Per-user listening summary with level breakdown. */
  def userActivity(songplays: DataFrame): DataFrame =
    songplays.groupBy(col("user_id"), col("level"))
      .agg(count(lit(1)).as("n_plays"),
        countDistinct(col("session_id")).as("n_sessions"))

  /** Each user's most-played artist (window rank over an aggregate). */
  def favoriteArtist(songplays: DataFrame, artists: DataFrame): DataFrame = {
    val counts = songplays.join(artists, "artist_id")
      .groupBy(col("user_id"), col("artist_id"), col("name"))
      .agg(count(lit(1)).as("n_plays"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n_plays").desc, col("artist_id").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
