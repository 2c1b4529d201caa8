package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.{Ingest, Transforms}

/** SURVEY.md §5.2 unit cases for the five star-schema transforms. */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def stagingEvents(rows: Seq[(String, String, Double, Long, String, String, Int, String, String, String)]): DataFrame =
    rows.toDF("song", "artist", "length", "ts_millis", "user_id", "level",
        "session_id", "location", "user_agent", "page")
      .withColumn("ts", timestamp_millis(col("ts_millis"))).drop("ts_millis")

  test("buildTime: Redshift dow semantics — Sunday=0, Saturday=6") {
    // 2024-01-07 is a Sunday, 2024-01-06 a Saturday, 2024-01-01 a Monday.
    val df = Seq("2024-01-07 10:00:00", "2024-01-06 23:59:59", "2024-01-01 00:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val time = Transforms.buildTime(df).orderBy("start_time").collect()
    assert(time.map(_.getAs[Int]("weekday")).toSeq == Seq(1, 6, 0))
    assert(time.map(_.getAs[Int]("hour")).toSeq == Seq(0, 23, 10))
    assert(time.map(_.getAs[Int]("year")).distinct.toSeq == Seq(2024))
  }

  test("buildTime: ISO week at year boundary") {
    // 2024-12-30 (Mon) and 2025-01-01 (Wed) are both ISO week 1 of 2025;
    // 2021-01-01 (Fri) is ISO week 53 of 2020.
    val df = Seq("2024-12-30 12:00:00", "2025-01-01 12:00:00", "2021-01-01 12:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val weeks = Transforms.buildTime(df).orderBy("start_time")
      .collect().map(_.getAs[Int]("week")).toSeq
    assert(weeks == Seq(53, 1, 1))
  }

  test("buildTime deduplicates timestamps") {
    val df = Seq("2024-01-07 10:00:00", "2024-01-07 10:00:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    assert(Transforms.buildTime(df).count() == 1)
  }

  test("buildSongs: year=0 sentinel becomes NULL, real years survive") {
    val songs = Seq(("SO1", "T1", "AR1", 0, 100.0), ("SO2", "T2", "AR2", 1999, 200.0))
      .toDF("song_id", "title", "artist_id", "year", "duration")
    val out = Transforms.buildSongs(songs).orderBy("song_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("year")))
    assert(out(1).getAs[Int]("year") == 1999)
  }

  test("epoch-millis conversion: boundaries and a known instant") {
    val raw = Seq((0L, 0L), (1541105830796L, -1000L)).toDF("ts", "registration")
      .withColumn("artist", lit(null).cast("string"))
    val staged = raw.select(timestamp_millis($"ts").as("ts"),
      timestamp_millis($"registration").as("registration"))
    val rows = staged.orderBy("ts").collect()
    assert(rows(0).getTimestamp(0).toInstant.toString == "1970-01-01T00:00:00Z")
    assert(rows(1).getTimestamp(0).toInstant.toEpochMilli == 1541105830796L)
    assert(rows(1).getTimestamp(1).toInstant.toString == "1969-12-31T23:59:59Z")
  }

  test("buildUsers: verbatim — duplicates and empty user_id are kept") {
    val se = Seq(("10", "Ada", "L", "F", "paid"), ("10", "Ada", "L", "F", "free"),
        ("", "Nobody", "X", "M", "free"))
      .toDF("user_id", "first_name", "last_name", "gender", "level")
    val users = Transforms.buildUsers(se)
    assert(users.count() == 3)
    assert(users.filter($"user_id" === "").count() == 1)
  }

  test("buildSongplays: page filter + 3-column compound join") {
    val se = stagingEvents(Seq(
      ("Match", "Art", 100.0, 1700000000000L, "1", "paid", 1, "L", "UA", "NextSong"),
      ("Match", "Art", 100.0, 1700000001000L, "2", "free", 2, "L", "UA", "Home"),
      ("Match", "Art", 999.0, 1700000002000L, "3", "free", 3, "L", "UA", "NextSong"),
      ("Match", "Other", 100.0, 1700000003000L, "4", "free", 4, "L", "UA", "NextSong")))
    val ss = Seq(("SO1", "AR1", "Match", "Art", 100.0))
      .toDF("song_id", "artist_id", "title", "artist_name", "duration")
    val out = Transforms.buildSongplays(se, ss).collect()
    // Only the row with matching (song,artist,length) AND page=NextSong.
    assert(out.length == 1)
    assert(out(0).getAs[String]("user_id") == "1")
    assert(out(0).getAs[String]("song_id") == "SO1")
  }

  test("buildArtists: 2-column join keeps duplicates (unenforced PK)") {
    val se = stagingEvents(Seq(
      ("S", "A", 1.0, 1700000000000L, "1", "paid", 1, "L", "UA", "NextSong"),
      ("S", "A", 2.0, 1700000001000L, "2", "paid", 2, "L", "UA", "Home")))
    val ss = Seq(("SO1", "AR1", "S", "A", "Loc", 1.0, 2.0))
      .toDF("song_id", "artist_id", "title", "artist_name",
        "artist_location", "artist_latitude", "artist_longitude")
    // Both events join (no length in the artists key, no page filter).
    assert(Transforms.buildArtists(se, ss).count() == 2)
  }

  test("dedupLatest keeps exactly the newest row per key, tie-broken") {
    val df = Seq(("u1", 1L, 10L), ("u1", 2L, 20L), ("u1", 3L, 20L), ("u2", 4L, 5L))
      .toDF("user_id", "event_id", "ts")
    val out = Transforms.dedupLatest(df, Seq("user_id"), Seq("ts", "event_id"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("u1", 3L), ("u2", 4L)))
  }

  test("withDeterministicId numbers rows 1..n in the given order") {
    val df = Seq(30L, 10L, 20L).toDF("k")
    val out = Transforms.withDeterministicId(df, Seq("k"), "id")
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("withDeterministicId two-level prefix-sum ≡ global row_number") {
    // Non-contiguous, shuffled, negative-inclusive keys spread across many
    // buckets, plus a secondary order column exercising multi-col order.
    val rows = (1 to 1000).map(i => ((i * 7919 % 997).toLong - 200L, i.toLong))
    val df = rows.toDF("k", "tie")
    val got = Transforms.withDeterministicId(df, Seq("k", "tie"), "id", buckets = 16)
      .orderBy("k", "tie").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = df.withColumn("id",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"k", $"tie")).cast("long"))
      .orderBy("k", "tie").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("events testdata reader yields micros timestamps (nanos truncated)") {
    val e = Ingest.readEvents(spark, "/root/testdata/sf0.001")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.count() > 0)
  }
}
