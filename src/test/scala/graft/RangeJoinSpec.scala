package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    ivs: org.apache.spark.sql.DataFrame) =
    points.join(ivs, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))

  test("bucketized range join equals the naive theta-join at several bin widths") {
    val rng = new scala.util.Random(17)
    val points = (0 until 300).map(i =>
      (i.toLong, s"k${rng.nextInt(5)}", rng.nextInt(10000).toLong))
      .toDF("pid", "k", "p")
    val ivs = (0 until 80).map { i =>
      val s = rng.nextInt(10000).toLong
      (1000L + i, s"k${rng.nextInt(5)}", s, s + rng.nextInt(500))
    }.toDF("iid", "k", "s", "e")
    val expected = naive(points, ivs).select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 100L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, ivs, "p", "s", "e", Seq("k"), w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binWidth $w")
    }
  }

  test("range join handles negative axis values (div truncation stays monotonic)") {
    val points = Seq((1L, "a", -15L), (2L, "a", -5L), (3L, "a", 5L))
      .toDF("pid", "k", "p")
    val ivs = Seq((10L, "a", -20L, -10L), (11L, "a", -7L, 7L)).toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "s", "e", Seq("k"), 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L)))
  }
}
