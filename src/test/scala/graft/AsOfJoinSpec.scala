package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: latest right row at or before each left time, per key") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:05")),
      (2L, "A", t("2024-01-01 10:00:10")),
      (3L, "B", t("2024-01-01 10:00:03")),
      (4L, "C", t("2024-01-01 10:00:03"))) // no quotes for C
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 100.0),
      ("A", t("2024-01-01 10:00:07"), 101.0),
      ("A", t("2024-01-01 10:00:30"), 999.0), // after both trades
      ("B", t("2024-01-01 10:00:03"), 50.0))  // exactly at trade time
      .toDF("sym", "qts", "price")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price"))))).toSeq == Seq(
      (1L, Some(100.0)),  // 10:00:00 quote, not the later one
      (2L, Some(101.0)),  // picks the 10:00:07 update
      (3L, Some(50.0)),   // inclusive: equal timestamps match
      (4L, None)))        // left-join semantics: no prior quote -> null
  }

  test("asOfForward: earliest right row at or after each left time, per key") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:05")),
      (2L, "A", t("2024-01-01 10:00:08")),
      (3L, "B", t("2024-01-01 10:00:03")),
      (4L, "C", t("2024-01-01 10:00:03"))) // no quotes for C
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 100.0), // before both trades
      ("A", t("2024-01-01 10:00:07"), 101.0),
      ("A", t("2024-01-01 10:00:30"), 999.0),
      ("B", t("2024-01-01 10:00:03"), 50.0))  // exactly at trade time
      .toDF("sym", "qts", "price")
    val out = AsOfJoin.asOfForward(trades, quotes, "sym", "ts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(r.fieldIndex("price"))))).toSeq == Seq(
      (1L, Some(101.0)),  // nearest FOLLOWING quote
      (2L, Some(999.0)),  // skips the 10:00:07 (already past)
      (3L, Some(50.0)),   // inclusive at equal timestamps
      (4L, None)))        // no following quote -> null
  }

  test("asOf preserves all left rows and columns") {
    val l = Seq((1L, "A", t("2024-01-01 00:00:01"), "extra"))
      .toDF("id", "k", "ts", "payload")
    val r = Seq(("A", t("2024-01-01 00:00:00"), 7.0)).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(l, r, "k", "ts", "rts", Seq("v"))
    assert(out.columns.toSet == Set("id", "k", "ts", "payload", "v"))
    assert(out.collect()(0).getAs[Double]("v") == 7.0)
  }

  test("asOfNearest: closer side wins, prior wins ties, tolerance nulls") {
    val l = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),  // prior at -2h, next at +1h -> next
      (2L, 7L, "2024-01-01 14:00:00"),  // prior at -3h, next at +3h -> tie -> prior
      (3L, 8L, "2024-01-01 10:00:00"))  // only match is 100h away -> tolerance NULL
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val r = Seq(
      (7L, "2024-01-01 08:00:00", 1.0),
      (7L, "2024-01-01 11:00:00", 2.0),
      (7L, "2024-01-01 17:00:00", 3.0),
      (8L, "2024-01-05 14:00:00", 9.0))
      .toDF("user_id", "s", "v")
      .select($"user_id", to_timestamp($"s").as("ts"), $"v")
    val out = AsOfJoin.asOfNearest(l, r, "user_id", "ts", "ts", Seq("v"),
        toleranceSeconds = Some(24L * 3600))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(out(0).fieldIndex("v")) == 2.0) // +1h beats -2h
    assert(out(1).getDouble(out(1).fieldIndex("v")) == 2.0) // 3h tie -> prior (11:00)
    assert(out(2).isNullAt(out(2).fieldIndex("v")))         // beyond tolerance
  }

  test("asOfInterpolate: linear between brackets, flat at edges, exact hit") {
    val l = Seq(
      (1L, 7L, "2024-01-01 11:00:00"),  // between 10:00 (v=1) and 14:00 (v=9): 1 + 8*1/4 = 3
      (2L, 7L, "2024-01-01 09:00:00"),  // before all -> next value 1.0
      (3L, 7L, "2024-01-01 15:00:00"),  // after all -> prior value 9.0
      (4L, 7L, "2024-01-01 14:00:00"))  // exact bracket hit -> 9.0
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val r = Seq(
      (7L, "2024-01-01 10:00:00", 1.0),
      (7L, "2024-01-01 14:00:00", 9.0))
      .toDF("user_id", "s", "v")
      .select($"user_id", to_timestamp($"s").as("ts"), $"v")
    val out = AsOfJoin.asOfInterpolate(l, r, "user_id", "ts", "ts", "v")
      .orderBy("event_id").collect()
    assert(out.map(_.getAs[Double]("v")).toSeq == Seq(3.0, 1.0, 9.0, 9.0))
    // left columns survive untouched
    assert(out(0).getAs[Long]("user_id") == 7L)
  }
}
