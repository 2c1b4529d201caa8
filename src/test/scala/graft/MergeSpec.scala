package graft

import org.apache.spark.sql.functions._
import graft.etl.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def changeStream = Seq(
    // (key, ts, id, value, op)
    ("u1", 1L, 1L, 10.0, "U"),
    ("u1", 3L, 2L, 30.0, "U"),
    ("u2", 2L, 3L, 20.0, "U"),
    ("u2", 5L, 4L, 0.0, "D"),
    ("u3", 4L, 5L, 40.0, "U"),
    ("u3", 6L, 6L, 41.0, "U"),
    // equal-ts tie within u4: id breaks it, larger id wins
    ("u4", 7L, 7L, 1.0, "U"),
    ("u4", 7L, 8L, 2.0, "U")
  ).toDF("k", "ts", "id", "v", "op")

  test("upsert keeps the newest row per key, updates beat target, inserts land") {
    val target = Seq(("u1", 1L, 1L, 10.0), ("u2", 2L, 3L, 20.0)).toDF("k", "ts", "id", "v")
    val updates = Seq(("u1", 3L, 2L, 30.0), ("u5", 9L, 9L, 90.0)).toDF("k", "ts", "id", "v")
    val got = Merge.upsert(target, updates, Seq("k"), Seq("ts", "id"))
      .orderBy("k").as[(String, Long, Long, Double)].collect.toSeq
    assert(got == Seq(("u1", 3L, 2L, 30.0), ("u2", 2L, 3L, 20.0), ("u5", 9L, 9L, 90.0)))
  }

  test("upsert is associative: incremental two-batch merge == one-shot merge") {
    val all = changeStream.drop("op")
    val b1 = all.filter($"ts" <= 4)
    val b2 = all.filter($"ts" > 4)
    val empty = all.limit(0)
    val incremental = Merge.upsert(Merge.upsert(empty, b1, Seq("k"), Seq("ts", "id")),
      b2, Seq("k"), Seq("ts", "id"))
    val oneShot = Merge.upsert(empty, all, Seq("k"), Seq("ts", "id"))
    assert(incremental.orderBy("k").collect.toSeq == oneShot.orderBy("k").collect.toSeq)
  }

  test("upsert ties on ts are broken by the id version column") {
    val got = Merge.upsert(changeStream.drop("op").limit(0), changeStream.drop("op"),
        Seq("k"), Seq("ts", "id"))
      .filter($"k" === "u4").as[(String, Long, Long, Double)].collect.toSeq
    assert(got == Seq(("u4", 7L, 8L, 2.0)))
  }

  test("applyChanges: winning tombstone removes the key; later upsert resurrects") {
    val empty = changeStream.drop("op").limit(0)
    val got = Merge.applyChanges(empty, changeStream, Seq("k"), Seq("ts", "id"), "op", "D")
      .orderBy("k").select("k").as[String].collect.toSeq
    // u2's latest change is the tombstone -> gone; others survive.
    assert(got == Seq("u1", "u3", "u4"))

    val resurrect = changeStream.unionByName(
      Seq(("u2", 9L, 10L, 99.0, "U")).toDF("k", "ts", "id", "v", "op"))
    val got2 = Merge.applyChanges(empty, resurrect, Seq("k"), Seq("ts", "id"), "op", "D")
      .filter($"k" === "u2").as[(String, Long, Long, Double)].collect.toSeq
    assert(got2 == Seq(("u2", 9L, 10L, 99.0)))
  }

  test("applyChanges incremental replay == one-shot replay, across a delete") {
    val empty = changeStream.drop("op").limit(0)
    val b1 = changeStream.filter($"ts" <= 4)
    val b2 = changeStream.filter($"ts" > 4)
    val incremental = Merge.applyChanges(
      Merge.applyChanges(empty, b1, Seq("k"), Seq("ts", "id"), "op", "D"),
      b2, Seq("k"), Seq("ts", "id"), "op", "D")
    val oneShot = Merge.applyChanges(empty, changeStream, Seq("k"), Seq("ts", "id"), "op", "D")
    assert(incremental.orderBy("k").collect.toSeq == oneShot.orderBy("k").collect.toSeq)
  }

  test("scdType2 collapses runs, builds half-open intervals, marks current") {
    val hist = Seq(
      ("u1", 1L, 1L, "free"),
      ("u1", 2L, 2L, "free"), // same state: collapses into version 1
      ("u1", 3L, 3L, "paid"),
      ("u1", 5L, 4L, "free"),
      ("u2", 4L, 5L, "paid")
    ).toDF("k", "ts", "id", "state")
    val got = Merge.scdType2(hist, Seq("k"), "ts", "id", "state")
      .orderBy("k", "version")
      .select("k", "state", "valid_from", "valid_to", "version", "is_current")
      .as[(String, String, Long, Option[Long], Long, Boolean)].collect.toSeq
    assert(got == Seq(
      ("u1", "free", 1L, Some(3L), 1L, false),
      ("u1", "paid", 3L, Some(5L), 2L, false),
      ("u1", "free", 5L, None, 3L, true),
      ("u2", "paid", 4L, None, 1L, true)))
  }

  test("scdType2 change detection is null-safe: NULL is a state of its own") {
    val hist = Seq(
      ("u1", 1L, 1L, Some("a")),
      ("u1", 2L, 2L, None), // a -> NULL is a transition
      ("u1", 3L, 3L, None), // NULL run collapses
      ("u1", 4L, 4L, Some("a"))
    ).toDF("k", "ts", "id", "state")
    val got = Merge.scdType2(hist, Seq("k"), "ts", "id", "state")
      .orderBy("version").select("state", "version")
      .as[(Option[String], Long)].collect.toSeq
    assert(got == Seq((Some("a"), 1L), (None, 2L), (Some("a"), 3L)))
  }

  test("scdType2 ts ties are ordered by the tiebreaker id") {
    val hist = Seq(
      ("u1", 1L, 2L, "b"),
      ("u1", 1L, 1L, "a")
    ).toDF("k", "ts", "id", "state")
    val got = Merge.scdType2(hist, Seq("k"), "ts", "id", "state")
      .orderBy("version").select("state").as[String].collect.toSeq
    assert(got == Seq("a", "b"))
  }

  test("scdType2 point-in-time lookup: facts resolve to exactly one version") {
    val hist = Merge.scdType2(Seq(
      ("u1", 10L, 1L, "bronze"),
      ("u1", 20L, 2L, "silver"),
      ("u1", 30L, 3L, "gold")).toDF("k", "ts", "id", "state"),
      Seq("k"), "ts", "id", "state")
    // facts at t=15 (inside v1), t=20 (boundary -> v2, from inclusive),
    // t=99 (open current version)
    val facts = Seq(15L, 20L, 99L).toDF("fact_ts")
    val got = facts.join(hist,
        facts("fact_ts") >= hist("valid_from") &&
          (hist("valid_to").isNull || facts("fact_ts") < hist("valid_to")))
      .orderBy("fact_ts").select("fact_ts", "state").as[(Long, String)]
      .collect().toSeq
    assert(got == Seq((15L, "bronze"), (20L, "silver"), (99L, "gold")))
  }

  test("aggState merge: any merge tree == one-shot aggregation") {
    val rows = (1 to 30).map(i => (s"k${i % 4}", i * 1.01)).toDF("k", "v")
    val Array(p1, p2, p3) = rows.randomSplit(Array(1, 1, 1), seed = 7)
    def fin(df: org.apache.spark.sql.DataFrame) =
      Merge.finalizeAggState(df).orderBy("k")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val oneShot = fin(Merge.aggState(rows, Seq("k"), "v"))
    val s = Seq(p1, p2, p3).map(Merge.aggState(_, Seq("k"), "v"))
    // flat 3-way merge
    assert(fin(Merge.mergeAggStates(Seq("k"), s: _*)) == oneShot)
    // left-leaning tree: merge(merge(a,b),c) — associativity in practice
    assert(fin(Merge.mergeAggStates(Seq("k"),
      Merge.mergeAggStates(Seq("k"), s(0), s(1)), s(2))) == oneShot)
    // a state merged with an empty delta is unchanged
    val empty = Merge.aggState(rows.limit(0), Seq("k"), "v")
    assert(fin(Merge.mergeAggStates(Seq("k"), s(0), empty)) ==
      fin(s(0)))
  }
}
