package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty strings from repeated spaces") {
    val out = Seq("a  b ", " ", "x").toDF("t")
      .select(Fns.tokens($"t").as("toks")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).getSeq[String](0) == Seq())
    assert(out(2).getSeq[String](0) == Seq("x"))
  }

  test("shingles: n greater than token count yields empty array, not error") {
    val out = Seq("a b", "a b c d").toDF("t")
      .select(Fns.shingles(Fns.tokens($"t"), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq())
    assert(out(1).getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("cosine: identical=1, orthogonal=0, zero-norm=NULL (not NaN)") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    val out = df.select(Fns.cosine($"a", $"b").as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(0)) < 1e-12)
    assert(out(2).isNullAt(0))
  }

  test("minhashPerm stays in [0, p) for extreme and random hashes") {
    val rng = new scala.util.Random(42)
    val hashes = Seq(Long.MinValue, Long.MaxValue, 0L, -1L) ++
      Seq.fill(200)(rng.nextLong())
    val df = hashes.toDF("h")
    val cols = (0 until 8).map(k => Fns.minhashPerm($"h", k).as(s"p$k"))
    val row = df.select(cols: _*)
      .agg(least((0 until 8).map(k => min(col(s"p$k"))): _*).as("lo"),
           greatest((0 until 8).map(k => max(col(s"p$k"))): _*).as("hi"))
      .collect()(0)
    assert(row.getLong(0) >= 0L)
    assert(row.getLong(1) < Fns.MinHashPrime)
  }

  test("graft functions are callable from plain SQL") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |       size(graft_shingles('a b c d', 3)) AS s,
        |       graft_simhash('hello world') AS h,
        |       size(graft_minhash('a b c d', 3, 8)) AS m""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 23.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(4) == 8)
  }

  test("tokenHash and rollingFingerprint match hand computation") {
    // tokenHash("abc") = 3*131 + 97*7 + 99 = 1171
    val th = Seq("abc").toDF("t").select(Fns.tokenHash($"t")).collect()(0).getLong(0)
    assert(th == 1171L)
    // fingerprint("abc abc") = (0*31+1171)*31 + 1171 mod p = 37472
    val fp = Seq("abc abc").toDF("t")
      .select(Fns.rollingFingerprint(Fns.tokens($"t"))).collect()(0).getLong(0)
    assert(fp == (1171L * 31 + 1171) % Fns.FpMod)
  }

  test("native codegen cosine is bit-identical to the interpreted fold") {
    val rng = new scala.util.Random(99)
    val rows = Seq.fill(300)((Seq.fill(64)(rng.nextGaussian()), Seq.fill(64)(rng.nextGaussian()))) ++
      Seq((Seq.fill(64)(0.0), Seq.fill(64)(1.0))) // zero-norm row
    val df = rows.toDF("a", "b")
      .select(Fns.cosine($"a", $"b").as("fast"), Fns.cosineInterpreted($"a", $"b").as("ref"))
    val bad = df.filter(!($"fast" <=> $"ref")).count()
    assert(bad == 0) // <=> is null-safe: NULL==NULL passes, any drift fails
  }

  test("native graft_dot is bit-identical to the zip_with fold") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((Seq.fill(32)(rng.nextGaussian()), Seq.fill(32)(rng.nextGaussian())))
    val df = rows.toDF("a", "b").select(
      Fns.dotProduct($"a", $"b").as("fast"),
      Fns.dotProductInterpreted($"a", $"b").as("ref"))
    assert(df.filter(!($"fast" <=> $"ref")).count() == 0)
  }

  test("native cosine: mismatched lengths yield NULL, not an error") {
    val out = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(Fns.cosine($"a", $"b")).collect()
    assert(out(0).isNullAt(0))
  }

  test("tokenHash handles multi-megabyte tokens without ANSI overflow") {
    val tok = "x" * 17000000 // length*131 overflows int32; must be long math
    val v = Seq(tok).toDF("t").select(Fns.tokenHash($"t")).collect()(0).getLong(0)
    assert(v >= 0 && v < Fns.FpMod)
  }

  test("dotProduct handles unequal lengths as NULL on both paths") {
    val out = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(Fns.dotProduct($"a", $"b").as("d"),
        Fns.dotProductInterpreted($"a", $"b").as("ref")).collect()
    assert(out(0).isNullAt(0)) // native: length mismatch -> NULL
    assert(out(0).isNullAt(1)) // zip_with pads with null -> null product
  }

  test("graft_shingles31 equals strhash over the concat_ws shingle strings, positions kept") {
    import org.apache.spark.sql.functions._
    val texts = Seq("the quick brown fox jumps", "a a a a", "one two",
      "  padded   tokens  here now ", "unicode héllo wörld tökens xx")
    val df = texts.toDF("text")
    val native = df.select(col("text"),
        call_function("graft_shingles31", col("text"), lit(3)).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaStrings = df.select(col("text"),
        transform(Fns.shingles(Fns.tokens(col("text")), 3),
          s => call_function("graft_strhash", s)).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { t =>
      assert(native(t) == viaStrings(t),
        s"mismatch for '$t': ${native(t)} vs ${viaStrings(t)}")
    }
    // duplicates preserved: "a a a" shingle appears at both positions
    assert(native("a a a a").length == 2 &&
      native("a a a a").distinct.length == 1)
    // fewer than n tokens: empty, not null
    assert(native("one two").isEmpty)
  }
  test("dotProduct/cosine resolve on a session that never ran GraftFunctions.register") {
    // A library caller's session: newSession() has its OWN function
    // registry, so graft_dot/graft_cosine are absent until the lazy
    // ensureRegistered hook (callGraft) lands them on the active
    // session at Column-construction time. Before the hook this threw
    // an unresolved-function AnalysisException at collect().
    val ns = spark.newSession()
    assert(!ns.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(ns)
    try {
      val df = ns.createDataFrame(Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))))
        .toDF("a", "b")
      val row = df.select(Fns.dotProduct(col("a"), col("b")).as("d"),
        Fns.cosine(col("a"), col("a")).as("c")).collect()(0)
      assert(row.getDouble(0) == 32.0 && math.abs(row.getDouble(1) - 1.0) < 1e-12)
      assert(ns.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
    } finally prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }
}
