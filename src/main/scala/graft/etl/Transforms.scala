package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five star-schema transforms — each is one pure DataFrame → DataFrame
  * function mapping 1:1 to an `INSERT INTO … SELECT` in the reference
  * (sql_queries.py:118–173; SURVEY.md §2 ops 5–15).
  *
  * Fidelity notes (SURVEY.md §7.4):
  *  - `weekday` is Redshift `EXTRACT(dow)` = 0=Sunday..6=Saturday; Spark
  *    `dayofweek` is 1=Sunday..7, hence the `- 1`.
  *  - The reference's unenforced PKs mean `users`/`songs`/`artists` keep
  *    duplicate keys; the verbatim builds reproduce that, and
  *    `dedupLatest` is the idiomatic variant for analytics.
  *  - Surrogate ids: `withSurrogateId` (monotonically_increasing_id) is the
  *    scale path — no shuffle, no single-partition bottleneck, ids unique
  *    but non-contiguous exactly like Redshift IDENTITY under parallel
  *    load. `withDeterministicId` (row_number over an explicit total
  *    order) exists for oracle-compared outputs only: a global window is a
  *    single-partition sort and must never be used at 100 TB.
  */
object Transforms {

  /** songplays (ops 6,7,8,15,16; sql_queries.py:118–131): filter playback
    * events, 3-column compound inner equi-join to songs, 8-col projection.
    * Catalyst broadcasts the song side when it is under the broadcast
    * threshold; AQE re-plans at runtime otherwise — no manual hint.
    */
  def buildSongplays(stagingEvents: DataFrame, stagingSongs: DataFrame): DataFrame = {
    val se = stagingEvents.filter(col("page") === "NextSong")
    val ss = stagingSongs
    se.join(ss,
        se("song") === ss("title") &&
        se("artist") === ss("artist_name") &&
        se("length") === ss("duration"),
        "inner")
      .select(
        se("ts").as("start_time"), se("user_id"), se("level"),
        ss("song_id"), ss("artist_id"), se("session_id"),
        se("location"), se("user_agent"))
  }

  /** users (op 9; sql_queries.py:133–136): verbatim projection — no dedup,
    * no filter, one row per event, exactly like the reference (PKs are not
    * enforced by Redshift).
    */
  def buildUsers(stagingEvents: DataFrame): DataFrame =
    stagingEvents.select("user_id", "first_name", "last_name", "gender", "level")

  /** songs (op 10; sql_queries.py:139–145): year=0 sentinel → NULL. The
    * reference's comment records that >4000 rows would otherwise be lost.
    */
  def buildSongs(stagingSongs: DataFrame): DataFrame =
    stagingSongs.select(
      col("song_id"), col("title"), col("artist_id"),
      when(col("year") =!= 0, col("year")).as("year"),
      col("duration"))

  /** artists (op 11; sql_queries.py:147–149): 2-column compound equi-join,
    * artist-dimension projection, again no dedup for fidelity.
    */
  def buildArtists(stagingEvents: DataFrame, stagingSongs: DataFrame): DataFrame = {
    val se = stagingEvents
    val ss = stagingSongs
    se.join(ss,
        se("song") === ss("title") && se("artist") === ss("artist_name"),
        "inner")
      .select(
        ss("artist_id"), ss("artist_name").as("name"),
        ss("artist_location").as("location"),
        ss("artist_latitude").as("latitude"),
        ss("artist_longitude").as("longitude"))
  }

  /** time (ops 12,13; sql_queries.py:151–173): DISTINCT event timestamps +
    * six date parts. `weekofyear` is ISO-8601, matching Redshift
    * EXTRACT(week); `dayofweek - 1` maps Spark 1=Sun..7 onto Redshift
    * 0=Sun..6.
    */
  def buildTime(stagingEvents: DataFrame): DataFrame =
    stagingEvents.select(col("ts")).distinct()
      .select(
        col("ts").as("start_time"),
        hour(col("ts")).as("hour"),
        dayofmonth(col("ts")).as("day"),
        weekofyear(col("ts")).as("week"),
        month(col("ts")).as("month"),
        year(col("ts")).as("year"),
        (dayofweek(col("ts")) - 1).as("weekday"))

  /** Scale-path surrogate key: unique, non-contiguous, no shuffle —
    * the distributed analog of Redshift `IDENTITY(0,1)` (sql_queries.py:88).
    */
  def withSurrogateId(df: DataFrame, name: String = "songplay_id"): DataFrame =
    df.withColumn(name, monotonically_increasing_id())

  /** Deterministic surrogate key: ids 1..N in `orderCols` order, computed
    * as a two-level distributed prefix-sum instead of a global row_number
    * window (which funnels the corpus through ONE task). Level 1 buckets
    * rows by an equal-width split of `orderCols.head`'s [min, max] range —
    * monotone in the leading order column, so bucket order IS global
    * order — and ranks within each bucket (a partitioned window that
    * parallelizes across executors). Level 2 turns per-bucket counts into
    * starting offsets with a tiny ≤ buckets² self-join (no window, no
    * sort). Output is IDENTICAL to `row_number() OVER (ORDER BY
    * orderCols)` whenever orderCols is a total order.
    *
    * Requirements: `orderCols.head` must be numeric (the range split needs
    * arithmetic). Skewed leading-key distributions skew the buckets —
    * correctness is unaffected; raise `buckets` or pre-hash if one bucket
    * dominates. The min/max is one tiny broadcast agg, same idiom as
    * temperatureMixture's total.
    */
  def withDeterministicId(df: DataFrame, orderCols: Seq[String],
                          name: String = "songplay_id", buckets: Int = 64): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val key = col(orderCols.head).cast("double")
    val stats = df.agg(min(key).as("__lo"), max(key).as("__hi"))
    // floor((k−lo)·B / (hi−lo+1)) ∈ [0, B): monotone nondecreasing in k,
    // equal keys land in equal buckets — exactly what order-preservation
    // needs. The +1 keeps k = hi strictly below B.
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0L)).otherwise(
          floor((key - col("__lo")) * buckets / (col("__hi") - col("__lo") + 1.0))))
      .drop("__lo", "__hi")
    val local = bucketed.withColumn("__rn",
      row_number().over(
        Window.partitionBy(col("__bkt")).orderBy(orderCols.map(col): _*)).cast("long"))
    val counts = bucketed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__bkt")
      .withColumn(name, col("__off") + col("__rn"))
      .drop("__bkt", "__rn", "__off")
  }

  /** Idiomatic dimension dedup: keep the latest row per key by `tsCol`
    * (tie-broken deterministically by the remaining order columns) —
    * the analytics-module variant of ops 9–11 (SURVEY.md §7.4.3).
    */
  def dedupLatest(df: DataFrame, keyCols: Seq[String], orderDesc: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderDesc.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
