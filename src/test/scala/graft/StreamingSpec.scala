package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingJobs

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def batchEvents = Seq(
    ("2024-01-01 10:05:00", "click", 1.0),
    ("2024-01-01 10:55:00", "click", 2.0),
    ("2024-01-01 11:05:00", "view", 4.0))
    .toDF("s", "event_type", "value")
    .select(to_timestamp($"s").as("ts"), $"event_type", $"value")

  test("tumbling windows: hour buckets, exact decimal-backed sums") {
    val out = StreamingJobs.windowedCounts(batchEvents, "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[java.sql.Timestamp]("window_start").toInstant.toString
      == "2024-01-01T10:00:00Z")
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(0).getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[String]("event_type") == "view")
  }

  test("sliding windows: each event lands in window-length/slide windows") {
    val one = Seq(("2024-01-01 10:05:30", 1.0)).toDF("s", "value")
      .select(to_timestamp($"s").as("ts"), $"value")
    val out = StreamingJobs.slidingRates(one).orderBy("window_start").collect()
    assert(out.length == 5) // 5 min window, 1 min slide
    assert(out.head.getAs[java.sql.Timestamp]("window_start").toInstant.toString
      == "2024-01-01T10:01:00Z")
    assert(out.last.getAs[java.sql.Timestamp]("window_start").toInstant.toString
      == "2024-01-01T10:05:00Z")
  }

  test("same body runs as a real structured stream with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingJobs.streamingWindowedCounts(stream, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n") == 2L)
      assert(rows(0).getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }
}
