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

  test("sessionize: >gap closes a session; exact-gap adjacency merges") {
    val ev = Seq(
      (10L, "2024-01-01 10:00:00"), (10L, "2024-01-01 10:29:00"), // one session
      (10L, "2024-01-01 11:30:00"),                               // 61 min later: new
      (20L, "2024-01-01 10:00:00"), (20L, "2024-01-01 10:30:00")  // exactly gap: merge
    ).toDF("user_id", "s").select($"user_id", to_timestamp($"s").as("ts"))
    val out = StreamingJobs.sessionize(ev, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    val rows = out.map(r => (r.getLong(0),
      r.getAs[java.sql.Timestamp]("session_start").toInstant.toString,
      r.getAs[java.sql.Timestamp]("session_end").toInstant.toString,
      r.getAs[Long]("n_events")))
    assert(rows.toSeq == Seq(
      (10L, "2024-01-01T10:00:00Z", "2024-01-01T10:59:00Z", 2L),
      (10L, "2024-01-01T11:30:00Z", "2024-01-01T12:00:00Z", 1L),
      (20L, "2024-01-01T10:00:00Z", "2024-01-01T11:00:00Z", 2L)))
  }

  test("mapGroupsWithState: running per-user profiles across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, Double, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "event_type", "value", "ts")
    val q = graft.streaming.StatefulJobs.userProfiles(spark, stream)
      .writeStream.format("memory").queryName("profiles")
      .outputMode(graft.streaming.StatefulJobs.outputMode).start()
    try {
      mem.addData((1L, "click", 1.0, ts("2024-01-01 10:00:00")),
        (1L, "view", 2.0, ts("2024-01-01 10:01:00")),
        (2L, "click", 5.0, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      mem.addData((1L, "purchase", 4.0, ts("2024-01-01 10:10:00")))
      q.processAllAvailable() // state carries across micro-batches
      val last = spark.table("profiles").orderBy($"n_events".desc).collect()
      val u1 = last.find(_.getLong(0) == 1L).get
      assert(u1.getAs[Long]("n_events") == 3L)
      assert(u1.getAs[Double]("total_value") == 7.0)
      assert(u1.getAs[String]("last_type") == "purchase")
    } finally q.stop()
  }

  test("flatMapGroupsWithState: sessions emit only when the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, Double, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "event_type", "value", "ts")
    val q = graft.streaming.StatefulJobs
      .closedSessions(spark, stream, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData((1L, "click", 1.0, ts("2024-01-01 10:00:00")),
        (1L, "view", 2.0, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open
      // An event far in the future advances the watermark past the gap.
      mem.addData((2L, "click", 1.0, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((2L, "view", 1.0, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      assert(rows.length == 1) // user 1's session closed; user 2's still open
      assert(rows(0).getLong(0) == 1L)
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Long]("first_ms") == ts("2024-01-01 10:00:00").getTime)
      assert(rows(0).getAs[Long]("last_ms") == ts("2024-01-01 10:05:00").getTime)
    } finally q.stop()
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

  test("file source: several real micro-batches == one-shot batch recompute") {
    // The genuine production shape — a FILE source drained by
    // Trigger.AvailableNow with maxFilesPerTrigger=1, so the run executes
    // one real micro-batch per input file through the checkpointed
    // streaming engine — asserted equal to the one-shot batch face of the
    // same body on the same rows (the unified-API claim, executed).
    val src = java.nio.file.Files.createTempDirectory("graft-file-src").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-file-ck").toString
    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:55:00", "click", 2.0),
      ("2024-01-01 11:05:00", "view", 4.0),
      ("2024-01-01 11:20:00", "click", 8.0),
      ("2024-01-01 12:40:00", "view", 16.0),
      ("2024-01-01 12:59:00", "view", 32.0))
    def frame(rs: Seq[(String, String, Double)]) =
      rs.toDF("s", "event_type", "value")
        .select(to_timestamp($"s").as("ts"), $"event_type", $"value")
    rows.grouped(2).foreach(chunk =>
      frame(chunk).coalesce(1).write.mode("append").parquet(src))
    val stream = spark.readStream.schema(frame(rows).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingJobs.streamingWindowedCounts(stream, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("file_wc").outputMode("complete")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow drain did not finish")
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected >=3 non-empty micro-batches, saw $batches")
      val streamed = spark.table("file_wc").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("total_value"))).toSet
      val batch = StreamingJobs.windowedCounts(frame(rows), "1 hour").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("total_value"))).toSet
      assert(streamed == batch,
        s"streaming face diverged:\n  stream=$streamed\n  batch=$batch")
    } finally q.stop()
  }

  test("streaming dedup: replays within the watermark horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "event_id", "event_type")
    val out = StreamingJobs.dedupStream(stream, Seq("event_id"), "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click"), // replay, same batch
        (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "view"))
      q.processAllAvailable()
      mem.addData( // replay of id 1 in a later micro-batch, still in horizon
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), 3L, "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("stateful jobs run on BATCH inputs (no watermark accessors touched)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch = Seq(
      (1L, "click", 1.0, ts("2024-01-01 10:00:00")),
      (1L, "view", 2.0, ts("2024-01-01 10:05:00")),
      (2L, "click", 5.0, ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_type", "value", "ts")
    // all three must execute without touching watermark state (which
    // THROWS in batch) — regression for the batch-unified contract
    val profiles = graft.streaming.StatefulJobs.userProfiles(spark, batch)
      .collect().map(p => p.user_id -> p.n_events).toMap
    assert(profiles == Map(1L -> 2L, 2L -> 1L))
    val sessions = graft.streaming.StatefulJobs.closedSessions(spark, batch)
      .collect().map(s => s.user_id -> s.n_events).toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L)) // batch: whole input = session
    val anoms = graft.streaming.StatefulJobs
      .anomalies(spark, batch, threshold = 3.0, warmup = 10L).collect()
    assert(anoms.isEmpty) // under warmup, but importantly: it RAN
  }

  test("anomalies: warmup trains silently, then a spike trips the z-score") {
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    val mem = MemoryStream[(Long, String, Double, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "event_type", "value", "ts")
    val q = graft.streaming.StatefulJobs
      .anomalies(spark, stream, threshold = 3.0, warmup = 10L)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      // 12 calm points (value ~10 ± 1), then one spike; state carries
      // across micro-batches because the first batch covers the warmup.
      val calm = (0 until 12).map(i => (1L, "m", 10.0 + (i % 3 - 1) * 1.0, ts(i)))
      mem.addData(calm: _*)
      q.processAllAvailable()
      assert(spark.table("anom").count() == 0) // calm data: no anomalies
      mem.addData((1L, "m", 100.0, ts(20)), (1L, "m", 10.0, ts(21)))
      q.processAllAvailable()
      val rows = spark.table("anom").collect()
      assert(rows.length == 1) // only the spike
      assert(rows(0).getAs[Double]("value") == 100.0)
      assert(rows(0).getAs[Double]("zscore") > 3.0)
      assert(rows(0).getAs[Long]("n_seen") == 12L)
    } finally q.stop()
  }

  test("intervalJoin batch: only right events inside [l_ts, l_ts+within] pair up") {
    def ev(id: Long, user: Long, s: String) = (id, user, java.sql.Timestamp.valueOf(s))
    val clicks = Seq(ev(1L, 7L, "2024-01-01 10:00:00")).toDF("event_id", "user_id", "ts")
    val views = Seq(
      ev(10L, 7L, "2024-01-01 10:05:00"),  // in window
      ev(11L, 7L, "2024-01-01 10:10:00"),  // boundary: inclusive
      ev(12L, 7L, "2024-01-01 10:10:01"),  // past the bound
      ev(13L, 7L, "2024-01-01 09:59:59"),  // before the click
      ev(14L, 8L, "2024-01-01 10:05:00"))  // other user
      .toDF("event_id", "user_id", "ts")
    val out = StreamingJobs.intervalJoin(clicks, views, "10 minutes")
      .orderBy("r_id").collect()
    assert(out.map(_.getAs[Long]("r_id")).toSeq == Seq(10L, 11L))
  }

  test("intervalJoin streams: watermarked stream-stream join emits matches in append mode") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val l = lMem.toDF().toDF("event_id", "user_id", "ts").withWatermark("ts", "1 minute")
    val r = rMem.toDF().toDF("event_id", "user_id", "ts").withWatermark("ts", "1 minute")
    val q = StreamingJobs.intervalJoin(l, r, "10 minutes")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      lMem.addData((1L, 7L, ts("2024-01-01 10:00:00")))
      rMem.addData((10L, 7L, ts("2024-01-01 10:05:00")),
        (12L, 7L, ts("2024-01-01 10:20:00")), // outside the 10-min bound
        (14L, 8L, ts("2024-01-01 10:05:00"))) // other user
      q.processAllAvailable()
      // Advance both watermarks far past the interval so results finalize.
      lMem.addData((2L, 9L, ts("2024-01-01 12:00:00")))
      rMem.addData((20L, 9L, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val pairs = spark.table("ij").collect()
        .map(row => (row.getAs[Long]("l_id"), row.getAs[Long]("r_id"))).toSet
      assert(pairs == Set((1L, 10L)))
    } finally q.stop()
  }

  test("stream-static enrich: dim attributes attach per micro-batch, facts never drop") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "amount")
    val q = StreamingJobs.enrich(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched").start()
    try {
      mem.addData((1L, 10.0), (3L, 30.0)) // user 3 has no dim row
      q.processAllAvailable()
      mem.addData((2L, 20.0))
      q.processAllAvailable()
      val out = spark.table("enriched").orderBy("user_id").collect()
        .map(r => (r.getLong(0), Option(r.getAs[String]("tier"))))
      assert(out.toSeq == Seq((1L, Some("gold")), (2L, Some("silver")),
        (3L, None))) // left-outer: the missing-dim fact survives with NULL
    } finally q.stop()
    // batch plan shape: the dimension side is broadcast
    val plan = StreamingJobs.enrich(
        Seq((1L, 1.0)).toDF("user_id", "amount"), dim, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("foreachBatch incremental aggregation == one-shot batch recompute") {
    // The streaming face of Merge.aggState: each micro-batch folds its
    // partial state into a running table; the DECIMAL monoid makes the
    // final state identical to aggregating all data at once.
    import graft.etl.Merge
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val stream = mem.toDF().toDF("k", "v")
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val partial = Merge.aggState(batch.toDF(), Seq("k"), "v")
        // materialize before the next fold so state doesn't re-read the batch
        val next = state.map(s =>
          Merge.mergeAggStates(Seq("k"), s, partial)).getOrElse(partial)
          .localCheckpoint(true)
        state = Some(next)
    }.start()
    try {
      mem.addData(("a", 1.5), ("b", 2.0)); q.processAllAvailable()
      mem.addData(("a", 3.25));            q.processAllAvailable()
      mem.addData(("b", -1.0), ("c", 7.0)); q.processAllAvailable()
    } finally q.stop()
    val got = Merge.finalizeAggState(state.get).orderBy("k")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val oneShot = Merge.finalizeAggState(Merge.aggState(
        Seq(("a", 1.5), ("b", 2.0), ("a", 3.25), ("b", -1.0), ("c", 7.0)).toDF("k", "v"),
        Seq("k"), "v")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == oneShot)
    assert(got.map(_._1) == Seq("a", "b", "c") && got.head._2 == 4.75)
  }

  test("foreachBatch MinHash register-min fold == one-shot signature build") {
    // The streaming face of Sketch.minhashRegisters: each micro-batch's
    // partial signatures min-fold into running state; idempotent
    // associative min makes the final registers bit-identical to the
    // one-shot build over all documents — including doc 3 re-delivering
    // doc 1's text (duplicate delivery collapses under min).
    import graft.operators.Sketch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "source")
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val partial = Sketch.minhashRegisters(batch.toDF())
        val next = state.map(s => Sketch.minhashMerge(s, partial))
          .getOrElse(partial)
          .localCheckpoint(true)
        state = Some(next)
    }.start()
    val all = Seq(
      (1L, "a b c d e", "s1"), (2L, "c d e f g", "s2"),
      (3L, "a b c d e", "s1"), (4L, "x y z w q", "s2"))
    try {
      mem.addData(all(0)); q.processAllAvailable()
      mem.addData(all(1), all(2)); q.processAllAvailable()
      mem.addData(all(3)); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) -> r.getLong(2)
    val folded = state.get.collect().map(key).toMap
    val oneShot = Sketch.minhashRegisters(
      all.toDF("doc_id", "text", "source")).collect().map(key).toMap
    assert(folded == oneShot && folded.size == 32) // 2 groups x 16 perms
  }

  test("lateEvents: hand-computed watermark drops, bucket-invariant") {
    val rows = Seq(
      (1L, 100L, "a"), (2L, 200L, "a"), (3L, 50L, "a"),
      (4L, 195L, "b"), (5L, 189L, "b"))
      .toDF("arr", "sec", "event_type")
      .select(col("arr"), to_timestamp(col("sec")).as("ts"), col("event_type"))
    // delay 10s: arr3 sees prev_max 200 -> wm 190 -> 50 late by 140s;
    // arr4 (195 >= 190) on time; arr5 (189 < 190) late by 1s
    def run(b: Int) = StreamingJobs.lateEvents(rows, delaySeconds = 10L,
        buckets = b).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = Seq(("a", 3L, 1L, 140000000L), ("b", 2L, 1L, 1000000L))
    assert(run(1).toSeq == expect)
    assert(run(8).toSeq == expect)   // two-level split changes nothing
  }

  test("lateEvents: in-order replay reports zero late rows") {
    val rows = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "a"))
      .toDF("arr", "sec", "event_type")
      .select(col("arr"), to_timestamp(col("sec")).as("ts"), col("event_type"))
    val r = StreamingJobs.lateEvents(rows, delaySeconds = 1L).collect().head
    assert((r.getLong(1), r.getLong(2)) == (3L, 0L))
    assert(r.isNullAt(3)) // no late rows -> max lateness NULL
  }

  test("windowedTopK: per-window leaderboard, count-desc then type, k-capped") {
    val rows = Seq(
      // hour 0: a x3, b x2, c x1, d x1 -> top-3 = a, b, c (ties by name)
      ("2024-01-01 00:05:00", "a"), ("2024-01-01 00:10:00", "a"),
      ("2024-01-01 00:15:00", "a"), ("2024-01-01 00:20:00", "b"),
      ("2024-01-01 00:25:00", "b"), ("2024-01-01 00:30:00", "c"),
      ("2024-01-01 00:35:00", "d"),
      // hour 1: only z -> a single row, rank 1
      ("2024-01-01 01:05:00", "z"))
      .toDF("s", "event_type")
      .select(to_timestamp($"s").as("ts"), $"event_type", lit(1.0).as("value"))
    val out = StreamingJobs.windowedTopK(rows, "1 hour", 3)
      .orderBy("window_start", "rnk").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString,
        r.getString(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01T00:00:00Z", "a", 3L, 1L),
      ("2024-01-01T00:00:00Z", "b", 2L, 2L),
      ("2024-01-01T00:00:00Z", "c", 1L, 3L), // d loses the tie to c
      ("2024-01-01T01:00:00Z", "z", 1L, 1L)))
  }

  test("foreachBatch incremental admission: stream chain == sequential waves, registers fold to corpus signature") {
    // The streaming face of Dedup.admitWave: each micro-batch gates
    // against the standing corpus, the corpus state grows only by
    // ADMITTED docs, and the corpus's MinHash registers fold
    // incrementally (minhashMerge) instead of re-scanning. Hand-checked
    // fixture: doc 10 mirrors corpus doc 1 (dup_of_corpus); 12/13 are an
    // in-batch near-dup pair (needs_batch_dedup — HELD, not admitted);
    // wave-2 doc 20 mirrors wave-1's ADMITTED doc 11 (dup_of_corpus —
    // proves the state chained) while doc 21 mirrors the HELD doc 12
    // and is admitted (proves held docs did NOT enter the corpus).
    import graft.operators.{Dedup, Sketch}
    implicit val sqlCtx = spark.sqlContext
    val corpus0 = Seq((1L, "a b c d e", "s1"), (2L, "p q r s t", "s1"))
      .toDF("doc_id", "text", "source")
    val b1 = Seq((10L, "a b c d e", "s1"), (11L, "u v w x y", "s2"),
      (12L, "m n o p x", "s1"), (13L, "m n o p y", "s1"))
    val b2 = Seq((20L, "u v w x y", "s2"), (21L, "m n o p x", "s2"))
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "source")
    var corpus = corpus0.localCheckpoint(true)
    var regs = Sketch.minhashRegisters(corpus0).localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val (v, next) = Dedup.admitWave(corpus, batch.toDF(), 3, 0.5)
          got ++= v.collect().map(r => r.getLong(0) -> r.getString(3))
          corpus = next.localCheckpoint(true)
          val admitted = batch.toDF().join(
            v.filter(col("verdict") === "admitted").select("doc_id"),
            Seq("doc_id"), "left_semi")
          regs = Sketch.minhashMerge(regs, Sketch.minhashRegisters(admitted))
            .localCheckpoint(true)
        }
    }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == Map(
      10L -> "dup_of_corpus", 11L -> "admitted",
      12L -> "needs_batch_dedup", 13L -> "needs_batch_dedup",
      20L -> "dup_of_corpus", 21L -> "admitted"))
    // stream-fed chain == sequential admitWave over the same waves
    val (v1, c1) = Dedup.admitWave(corpus0,
      b1.toDF("doc_id", "text", "source"), 3, 0.5)
    val (v2, c2) = Dedup.admitWave(c1,
      b2.toDF("doc_id", "text", "source"), 3, 0.5)
    val seq = (v1.collect() ++ v2.collect())
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(seq == got.toMap)
    val streamIds = corpus.select("doc_id").collect().map(_.getLong(0)).sorted
    val seqIds = c2.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(streamIds.toSeq == seqIds.toSeq &&
      streamIds.toSeq == Seq(1L, 2L, 11L, 21L))
    // incrementally folded registers == one-shot build over final corpus
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) -> r.getLong(2)
    val folded = regs.collect().map(key).toMap
    val oneShot = Sketch.minhashRegisters(corpus).collect().map(key).toMap
    assert(folded == oneShot && folded.size == 32) // 2 sources x 16 perms
  }

}
