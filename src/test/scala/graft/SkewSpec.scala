package graft

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows of one hot key + a long tail — the shape that melts a
  // single reducer at scale.
  private lazy val skewed = ((1 to 1000).map(i => ("HOT", i.toLong)) ++
    (1 to 50).map(i => (s"k$i", 10000L + i))).toDF("key", "event_id")

  test("saltedCount equals the plain groupBy count") {
    val plain = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("key"), 8, Seq("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("HOT") == 1000L)
  }

  test("saltedJoin equals the plain equi-join") {
    val dim = (Seq("HOT") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"attr$i") }.toDF("key", "attr")
    val plain = skewed.join(dim, "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", 8, Seq("event_id"))
      .select("key", "event_id", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 1050)
  }

  test("salt is deterministic and spreads a hot key over buckets") {
    val salts = skewed.filter($"key" === "HOT")
      .select(Skew.salt(8, $"event_id").as("s"))
      .collect().map(_.getLong(0))
    assert(salts.forall(s => s >= 0 && s < 8))
    assert(salts.distinct.length == 8) // actually spread, not collapsed
    val again = skewed.filter($"key" === "HOT")
      .select(Skew.salt(8, $"event_id").as("s"))
      .collect().map(_.getLong(0))
    assert(salts.toSeq == again.toSeq) // no Math.random anywhere
  }

  test("keyProfile: hand counts, shares, rank order, totals") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("c1", "c2", "c3"))
      .toDF("k")
    val out = Skew.keyProfile(df, "k", 3).orderBy("rank").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("key")).toSeq == Seq("hot", "warm", "c1")) // cnt desc, key asc tiebreak
    assert(out.map(_.getAs[Long]("cnt")).toSeq == Seq(6L, 3L, 1L))
    assert(math.abs(out(0).getAs[Double]("share") - 0.5) < 1e-9) // 6 of 12
    assert(out.forall(r => r.getAs[Long]("n_rows") == 12L && r.getAs[Long]("n_keys") == 5L))
  }
}
