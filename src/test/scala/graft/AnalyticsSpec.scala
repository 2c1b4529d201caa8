package graft

import graft.analytics.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("topSongs: counts, deterministic tie-break, limit") {
    val plays = Seq("s1", "s1", "s2", "s3", "s3").toDF("song_id")
    val songs = Seq(("s1", "A"), ("s2", "B"), ("s3", "C")).toDF("song_id", "title")
    val out = Analytics.topSongs(plays, songs, 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("s1", 2L), ("s3", 2L))) // tie at 2 plays -> song_id order
  }

  test("favoriteArtist: one row per user, most-played wins") {
    val plays = Seq(("u1", "a1"), ("u1", "a1"), ("u1", "a2"), ("u2", "a2"))
      .toDF("user_id", "artist_id")
    val artists = Seq(("a1", "X"), ("a2", "Y")).toDF("artist_id", "name")
    val out = Analytics.favoriteArtist(plays, artists).orderBy("user_id").collect()
    assert(out.map(r => (r.getAs[String]("user_id"), r.getAs[String]("artist_id"))).toSeq
      == Seq(("u1", "a1"), ("u2", "a2")))
  }

  test("userActivity: session counts are distinct") {
    val plays = Seq(("u1", "paid", 1), ("u1", "paid", 1), ("u1", "paid", 2))
      .toDF("user_id", "level", "session_id")
    val r = Analytics.userActivity(plays).collect()(0)
    assert(r.getAs[Long]("n_plays") == 3L)
    assert(r.getAs[Long]("n_sessions") == 2L)
  }
}
