package graft

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts nulls, duplicate keys, and orphaned references exactly") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (2L, Option(20L)), // dup id 2
      (3L, None),                                              // null fk
      (4L, Option(99L)))                                       // orphan fk
      .toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val out = DataQuality.audit(
      notNull = Seq(("nn_fk", child, "fk")),
      unique = Seq(("uq_id", child, Seq("id"))),
      refs = Seq(("fk_parent", child, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "nn_fk" -> 1L,     // one null fk
      "uq_id" -> 1L,     // id 2 appears twice -> 1 row in excess
      "fk_parent" -> 1L)) // fk 99 has no parent (NULL fk doesn't count)
  }

  test("audit rejects zero checks and duplicate check names eagerly") {
    val t = Seq((1L, Option(10L))).toDF("id", "fk")
    val e1 = intercept[IllegalArgumentException] {
      DataQuality.audit(Seq.empty, Seq.empty, Seq.empty)
    }
    assert(e1.getMessage.contains("at least one check"))
    // duplicate names across kinds fail with the names, not a later
    // ambiguous-column AnalysisException
    val e2 = intercept[IllegalArgumentException] {
      DataQuality.audit(
        notNull = Seq(("chk", t, "fk"), ("chk", t, "id")),
        unique = Seq.empty, refs = Seq.empty)
    }
    assert(e2.getMessage.contains("chk"))
  }

  test("tableChecksum: order/partitioning independent, corruption-sensitive") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    def sum1(d: org.apache.spark.sql.DataFrame) =
      DataQuality.tableChecksum(d, Seq(col("id"), col("v"))).head()
    val base = sum1(df)
    assert(base.getAs[Long]("n_rows") == 3L)
    // hand-computed: rowMix = (id*131 + v) for these small values
    val expected = Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .map { case (i, v) => i * 131 + v }.sum % 2147483647L
    assert(base.getAs[Long]("checksum") == expected)
    // reversing rows and changing partitioning changes nothing
    assert(sum1(df.orderBy(col("id").desc).repartition(7)) == base)
    // a single flipped value changes the checksum
    val corrupted = Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("id", "v")
    assert(sum1(corrupted).getAs[Long]("checksum") != base.getAs[Long]("checksum"))
    // a value->NULL corruption changes it too (sentinel residue)
    val nulled = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L))).toDF("id", "v")
    assert(sum1(nulled).getAs[Long]("checksum") != base.getAs[Long]("checksum"))
  }

  test("profileDrift: null spike and mean shift surface per column") {
    val old = Seq((1L, Some(10.0)), (2L, Some(20.0))).toDF("id", "v")
    val nw = Seq((1L, Some(10.0)), (2L, Some(40.0)), (3L, None)).toDF("id", "v")
    val out = DataQuality.profileDrift(old, nw, Seq("v")).collect()(0)
    assert(out.getAs[Long]("n_rows_old") == 2L && out.getAs[Long]("n_rows_new") == 3L)
    assert(out.getAs[Long]("n_nulls_old") == 0L && out.getAs[Long]("n_nulls_new") == 1L)
    assert(out.getAs[Long]("n_distinct_new") == 2L) // NULL not counted
    assert(out.getAs[Double]("mean_old") == 15.0)
    assert(out.getAs[Double]("mean_new") == 25.0)
    assert(out.getAs[Double]("mean_delta") == 10.0)
  }

  test("profile: all-NULL column gets NULL mean, not an error") {
    val df = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    val r = DataQuality.profile(df, Seq("v")).collect()(0)
    assert(r.getAs[Long]("n_nulls") == 2L)
    assert(r.isNullAt(r.fieldIndex("mean")))
  }

  test("corrMatrix: perfect +/- correlation, constant column yields NULL r") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)).toDF("x", "y2x", "neg", "const")
    val out = DataQuality.corrMatrix(df, Seq("x", "y2x", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.get(2)).toMap
    assert(out.size == 6) // 4 choose 2 pairs, all from one aggregate row
    assert(math.abs(out(("x", "y2x")).asInstanceOf[Double] - 1.0) < 1e-6)
    assert(math.abs(out(("x", "neg")).asInstanceOf[Double] + 1.0) < 1e-6)
    assert(out(("x", "const")) == null) // sd 0 -> try_divide -> NULL
  }

  test("psiDrift: hand-computed bins, smoothing, clamping, and total") {
    // ref anchors [0,10] in 2 bins of width 5: ref 0,1,9 -> counts [2,1]
    val ref = Seq(0.0, 1.0, 9.0, 10.0).toDF("v") // 10.0 clamps into bin 1
    val cur = Seq(6.0, 7.0, 20.0, -5.0).toDF("v") // 20 and -5 clamp in
    val rows = DataQuality.psiDrift(ref, cur, "v", bins = 2)
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 2L)) // c_ref
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 3L)) // c_cur (clamped)
    // p_ref = [(2+1)/6, (2+1)/6] = [.5, .5]; p_cur = [2/6, 4/6]
    val terms = rows.map(_.getAs[Double]("term"))
    assert(math.abs(terms(0) - (0.5 - 1.0 / 3) * math.log(0.5 / (1.0 / 3))) < 1e-6)
    assert(math.abs(terms(1) - (0.5 - 2.0 / 3) * math.log(0.5 / (2.0 / 3))) < 1e-6)
    val psi = rows.head.getAs[Double]("psi")
    assert(math.abs(psi - terms.sum) < 1e-9) // total = DECIMAL sum of terms
    assert(psi > 0.1) // this shift reads as "drifting" on the PSI scale
  }

  test("association: perfect pairing V=1, independence chi2=0, constant col NULL") {
    val df = Seq(("a", 1, "z"), ("a", 1, "z"), ("b", 2, "z"), ("b", 2, "z"))
      .toDF("x", "y", "c")
    val out = DataQuality.association(df, Seq("x", "y", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("x", "y"), ("x", "c"), ("y", "c")))
    val xy = out(("x", "y")) // x determines y exactly
    assert(xy.getAs[Long]("n") == 4L && xy.getAs[Double]("chi2") == 4.0)
    assert(xy.getAs[Double]("cramers_v") == 1.0)
    assert(out(("x", "c")).isNullAt(6)) // constant column: V undefined
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val r2 = DataQuality.association(ind, Seq("x", "y")).collect().head
    assert(r2.getAs[Double]("chi2") == 0.0) // balanced grid: o = e everywhere
    assert(r2.getAs[Double]("cramers_v") == 0.0)
  }

  test("benford: hand digit counts, zero-count digits emit, chi2 totals") {
    // cents: 123 199 201 305 (digits 1,1,2,3) + a negative and a zero
    val df = Seq(1.23, 1.99, 2.01, -3.05, 0.0).toDF("amt")
    val rows = DataQuality.benford(df, "amt", scale = 2)
      .orderBy("digit").collect()
    assert(rows.length == 9) // full spine, absent digits included
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 0L)) // |−3.05| counts, 0.0 dropped
    val r1 = rows.head
    assert(r1.getAs[Double]("obs_share") == 0.5) // 2 of 4
    assert(r1.getAs[Double]("exp_share") == 0.301030)
    // chi2 term for digit 1: (2 - 4*.30103)^2 / (4*.30103)
    val e1 = 4 * 0.301030
    assert(math.abs(r1.getAs[Double]("chi2_term") - (2 - e1) * (2 - e1) / e1) < 1e-6)
    val chi2 = r1.getAs[Double]("chi2")
    val termSum = rows.map(_.getAs[Double]("chi2_term")).sum
    assert(math.abs(chi2 - termSum) < 1e-9)
  }

  test("psiDrift: identical samples score 0; degenerate reference binds bin 0") {
    val d = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val zero = DataQuality.psiDrift(d, d, "v", bins = 4).collect()
    assert(zero.forall(_.getAs[Double]("psi") == 0.0))
    assert(zero.forall(_.getAs[Double]("term") == 0.0))
    val const = Seq(5.0, 5.0).toDF("v") // hi == lo: width-0 guard
    val degen = DataQuality.psiDrift(const, d, "v", bins = 3)
      .orderBy("bin").collect()
    assert(degen.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0, 2L, 4L), (1, 0L, 0L), (2, 0L, 0L)))
  }

  test("volumeAnomaly: the spiked day is flagged, steady days are not") {
    import java.sql.Timestamp
    // type A: 9 days at ~4/day, one day at 40 -> only that day flags
    val rows = (
      (1 to 9).flatMap(d => Seq.fill(4)(("A", s"2024-01-0$d 10:00:00"))) ++
      Seq.fill(40)(("A", "2024-01-10 10:00:00")) ++
      (1 to 10).flatMap(d => Seq.fill(5)(("B", f"2024-01-$d%02d 10:00:00")))
    ).map { case (t, s) => (t, Timestamp.valueOf(s)) }
    val events = rows.toDF("event_type", "ts")
    val out = graft.operators.DataQuality.volumeAnomaly(events).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("event_type") == "A")
    assert(out(0).getAs[java.sql.Date]("day").toString == "2024-01-10")
    assert(out(0).getAs[Long]("cnt") == 40L)
    assert(out(0).getAs[Double]("zscore") > 2.0)
  }

  test("freshness: lag vs freshest feed, whole hours, stale past threshold") {
    val rows = Seq(
      ("A", "2024-01-10 12:00:00"), ("A", "2024-01-10 10:00:00"),
      ("B", "2024-01-10 11:30:00"),   // 0.5h behind -> lag 0, fresh
      ("C", "2024-01-09 11:00:00"),   // 25h behind -> stale at 24h
      ("D", "2024-01-09 13:00:00"))   // 23h behind -> fresh
      .map { case (t, s) => (t, java.sql.Timestamp.valueOf(s)) }
      .toDF("event_type", "ts")
    val out = graft.operators.DataQuality.freshness(rows, staleHours = 24L)
      .orderBy("group_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("A", 2L, 0L, false), ("B", 1L, 0L, false),
      ("C", 1L, 25L, true), ("D", 1L, 23L, false)))
  }

  test("ksTest: hand-computed D on disjoint and identical samples") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    // ECDFs at v=1..6: ref (.25,.5,.75,1,1,1), cur (0,0,.25,.5,.75,1)
    // gaps: .25,.5,.5,.5,.25,0 -> D=0.5 first attained at v=2
    val r = DataQuality.ksTest(ref, cur, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      (4L, 4L, 0.5, 2.0))
    // identical samples -> D = 0
    val same = DataQuality.ksTest(ref, ref, "v").collect().head
    assert(same.getDouble(2) == 0.0)
  }

  test("ksTest matches a single-window formulation across bucket counts") {
    val ref = (1 to 200).map(i => (i * 7 % 97).toDouble).toDF("v")
    val cur = (1 to 150).map(i => ((i * 13 % 89) + 3).toDouble).toDF("v")
    val d1 = DataQuality.ksTest(ref, cur, "v", buckets = 1).collect().head
    val d32 = DataQuality.ksTest(ref, cur, "v", buckets = 32).collect().head
    assert(d1.getDouble(2) == d32.getDouble(2) &&
      d1.getDouble(3) == d32.getDouble(3))
  }

  test("aucScore: perfect, random-tie, and textbook mixed cases") {
    import org.apache.spark.sql.functions.col
    // perfect separation -> 1.0
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)).toDF("s", "y")
    assert(DataQuality.aucScore(perfect, "s", col("y") === 1)
      .collect().head.getDouble(2) == 1.0)
    // all scores tied -> 0.5
    val tied = Seq((0.5, 0), (0.5, 0), (0.5, 1)).toDF("s", "y")
    assert(DataQuality.aucScore(tied, "s", col("y") === 1)
      .collect().head.getDouble(2) == 0.5)
    // mixed with a tie: pos {0.4, 0.8}, neg {0.4, 0.6}
    // pairs: (0.4 vs 0.4)=0.5, (0.4 vs 0.6)=0, (0.8 vs 0.4)=1,
    // (0.8 vs 0.6)=1 -> AUC = 2.5/4 = 0.625
    val mixed = Seq((0.4, 1), (0.8, 1), (0.4, 0), (0.6, 0)).toDF("s", "y")
    val m = DataQuality.aucScore(mixed, "s", col("y") === 1).collect().head
    assert((m.getLong(0), m.getLong(1), m.getDouble(2)) == (2L, 2L, 0.625))
  }

  test("calibrationBins: equal-width binning with exact rates") {
    import org.apache.spark.sql.functions.col
    // range [0,1), 10 bins; bin 0 gets 0.0/0.05 (0 pos of 2),
    // bin 9 gets 0.95/1.0 (2 pos of 2), bin 5 gets 0.5 (1 pos of 1)
    val df = Seq((0.0, 0), (0.05, 0), (0.5, 1), (0.95, 1), (1.0, 1))
      .toDF("s", "y")
    val out = DataQuality.calibrationBins(df, "s", col("y") === 1, 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq((0, 2L, 0L, 0.0), (5, 1L, 1L, 1.0),
      (9, 2L, 2L, 1.0)))
  }

  test("quantileScoreByGroup: midrank quantiles, ties averaged") {
    // values 1,2 (group a), 3,4 (group b): quantiles .25/.5/.75/1
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val out = DataQuality.quantileScoreByGroup(df, "v", "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 2L, 0.375), ("b", 2L, 0.875)))
    // ties: {1,1,2} -> midrank(1) = 1.5 -> q 0.5; midrank(2) = 3 -> q 1
    val ties = Seq(("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val t = DataQuality.quantileScoreByGroup(ties, "v", "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(t.toSeq == Seq(("a", 0.5), ("b", 0.75)))
  }

  test("mutualInfo: independence -> 0; identity -> h_a and nmi = 1") {
    // independent 2x2 uniform: MI = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "w")
    val r0 = DataQuality.mutualInfo(ind, "u", "w").collect().head
    assert(r0.getDouble(3) == 0.0 && r0.getDouble(6) == 0.0)
    // perfectly dependent: MI = H = ln 2 (rounded terms sum to 0.693147)
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "w")
    val r1 = DataQuality.mutualInfo(dep, "u", "w").collect().head
    assert(r1.getDouble(3) == r1.getDouble(4) && r1.getDouble(6) == 1.0)
    assert(math.abs(r1.getDouble(3) - math.log(2)) < 1e-5)
  }

  test("keyEntropy: key / category / constant triage") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"),
      (4L, "b", "x")).toDF("id", "cat", "const")
    val out = DataQuality.keyEntropy(df, Seq("id", "cat", "const"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    val (n1, d1, u1, ne1) = out("id")
    assert((n1, d1, u1) == (4L, 4L, 1.0) &&
      math.abs(ne1.get - 1.0) < 1e-4)                 // true key
    val (_, d2, u2, ne2) = out("cat")
    assert(d2 == 2L && u2 == 0.5 && math.abs(ne2.get - 1.0) < 1e-4)
    val (_, d3, _, ne3) = out("const")
    assert(d3 == 1L && ne3.isEmpty)                   // 0/ln(1) -> NULL
    assert(out("const")._1 == 4L)
  }

  test("constraintSuite: one pass, NULL predicate counts as a violation") {
    import org.apache.spark.sql.functions.col
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, -1.0), (3L, null), (null, 4.0))
      .toDF("id", "v")
    val out = DataQuality.constraintSuite(df, Seq(
      "v_non_negative" -> (col("v") >= 0),
      "id_present" -> col("id").isNotNull))
      .orderBy("rule_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    // v >= 0: row2 violates (-1), row3 violates (NULL -> not proven)
    assert(out(0) == (0, "v_non_negative", 4L, 2L, 0.5, false))
    assert(out(1) == (1, "id_present", 4L, 1L, 0.25, false))
    // all-pass rule reports passed = true
    val ok = DataQuality.constraintSuite(df,
      Seq("always" -> col("id").isNotNull.or(col("id").isNull)))
      .collect().head
    assert(ok.getLong(3) == 0L && ok.getBoolean(5))
  }

  test("referentialIntegrity: orphans counted, NULL FKs excluded") {
    val child = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, 99L), (4L, null)).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = DataQuality.referentialIntegrity(Seq(
      ("child_parent", child, "fk", parent, "pk"))).collect().head
    // 3 non-NULL FK rows, one (99) orphaned
    assert((out.getString(0), out.getLong(1), out.getLong(2)) ==
      ("child_parent", 3L, 1L))
    assert(math.abs(out.getDouble(3) - 0.333333) < 1e-6)
    assert(!out.getBoolean(4))
    // intact relation
    val ok = DataQuality.referentialIntegrity(Seq(
      ("ok", child.filter($"fk" === 10L), "fk", parent, "pk")))
      .collect().head
    assert(ok.getLong(2) == 0L && ok.getBoolean(4))
  }

  test("calendarAudit: span, missing days, longest gap, full-coverage key") {
    import org.apache.spark.sql.functions.to_timestamp
    val df = Seq(
      // key a: days 1,2,5,9 -> span 9, missing 5, longest gap 3 (days 6-8)
      ("a", "2024-01-01 10:00:00"), ("a", "2024-01-02 11:00:00"),
      ("a", "2024-01-02 12:00:00"), ("a", "2024-01-05 09:00:00"),
      ("a", "2024-01-09 23:00:00"),
      // key b: 3 consecutive days -> complete
      ("b", "2024-02-01 00:00:00"), ("b", "2024-02-02 00:00:00"),
      ("b", "2024-02-03 00:00:00"))
      .toDF("k", "s").select($"k", to_timestamp($"s").as("ts"))
    val out = DataQuality.calendarAudit(df, "k", "ts").orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(out.toSeq == Seq(
      ("a", 4L, 9L, 5L, 3L, 0.444444),
      ("b", 3L, 3L, 0L, 0L, 1.0)))
  }

  test("chiSquaredUniform: hand chi2, deterministic tie-break, zero on uniform") {
    // A:4, B:1 -> E=2.5, contribs 0.9 + 0.9 = 1.8; tie on contrib
    // breaks to the LARGER category (the max_by (c, category) order)
    val skew = (Seq.fill(4)("A") ++ Seq("B")).toDF("c")
    val r = DataQuality.chiSquaredUniform(skew, "c").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 2L, 1L))
    assert(math.abs(r.getDouble(3) - 1.8) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.8) < 1e-6)
    assert(r.getString(5) == "B" && r.getDouble(6) == 0.9)
    // perfectly uniform: statistic exactly 0
    val flat = Seq("A", "A", "B", "B").toDF("c")
    val f = DataQuality.chiSquaredUniform(flat, "c").collect().head
    assert(f.getDouble(3) == 0.0 && f.getDouble(6) == 0.0)
  }

  test("sequenceAudit: counts backsteps along ingestion order with the exact worst gap") {
    import org.apache.spark.sql.functions.to_timestamp
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), (1L, 2L, "2024-01-01 00:00:10"),
      (1L, 3L, "2024-01-01 00:00:05"), // backstep of 5s after event 2
      (2L, 4L, "2024-01-01 00:00:00"), (2L, 5L, "2024-01-01 00:01:00"))
      .toDF("user_id", "event_id", "s")
      .select($"user_id", $"event_id", to_timestamp($"s").as("ts"))
    val r = DataQuality.sequenceAudit(df, "user_id", "event_id", "ts")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (2L, 5L, 3L, 1L, 1L, 5000000L))
    assert(math.abs(r.getDouble(6) - 0.666667) < 1e-6)
    // fully ordered input: zero regressions, NULL worst gap, rate 1
    val ok = DataQuality.sequenceAudit(df.filter($"user_id" === 2L),
      "user_id", "event_id", "ts").collect().head
    assert(ok.getLong(3) == 0L && ok.isNullAt(5) && ok.getDouble(6) == 1.0)
  }

  test("functionalDeps: exact FD, near-FD strength, and both directions") {
    val df = Seq((1L, "A", 10L), (2L, "A", 10L), (3L, "B", 20L),
      (4L, "B", 21L)).toDF("id", "grp", "v")
    val out = DataQuality.functionalDeps(df, Seq("id", "grp", "v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5))).toMap
    assert(out.size == 6)
    // id is a key: id -> grp and id -> v hold exactly
    assert(out(("id", "grp")) == (4L, 4L, true, 1.0))
    assert(out(("id", "v")) == (4L, 4L, true, 1.0))
    // grp -> v violated by B -> {20, 21}: strength 2/3
    val (gl, gp, gf, gs) = out(("grp", "v"))
    assert(gl == 2L && gp == 3L && !gf && math.abs(gs - 0.666667) < 1e-6)
    // v -> grp holds (each value maps to one group) without v being a key
    assert(out(("v", "grp")) == (3L, 3L, true, 1.0))
    // nothing determines the key columns backwards
    assert(!out(("grp", "id"))._3 && !out(("v", "id"))._3)
  }

}
