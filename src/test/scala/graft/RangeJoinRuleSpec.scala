package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def fixtures = {
    val rng = new scala.util.Random(23)
    val points = (0 until 200).map(i =>
      (i.toLong, rng.nextInt(4).toLong, rng.nextInt(5000).toLong))
      .toDF("pid", "pk", "p")
    val ivs = (0 until 60).map { i =>
      val s = rng.nextInt(5000).toLong
      (1000L + i, rng.nextInt(4).toLong, s, s + rng.nextInt(400))
    }.toDF("iid", "ik", "s", "e")
    (points, ivs)
  }

  private def naive(points: org.apache.spark.sql.DataFrame,
                    ivs: org.apache.spark.sql.DataFrame) =
    points.join(ivs, $"pk" === $"ik" && $"p" >= $"s" && $"p" <= $"e")
      .select("pid", "iid")

  test("RangeJoinRule rewrites the theta-join to a hash join and preserves results") {
    val (points, ivs) = fixtures
    val expected = naive(points, ivs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    graft.expressions.GraftFunctions.registerOptimizations(spark)
    spark.conf.set(RangeJoinRule.BinWidthKey, "500")
    try {
      val rewritten = naive(points, ivs)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("NestedLoop"),
        s"expected the binned hash-join rewrite, got:\n$physical")
      assert(physical.contains("Generate") || physical.contains("explode"),
        s"expected the interval-side bin explode in:\n$physical")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally spark.conf.unset(RangeJoinRule.BinWidthKey)
  }

  test("RangeJoinRule rewrites even without an equi key (pure range join)") {
    val (points, ivs) = fixtures
    val expected = points.join(ivs, $"p" >= $"s" && $"p" <= $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.expressions.GraftFunctions.registerOptimizations(spark)
    spark.conf.set(RangeJoinRule.BinWidthKey, "500")
    try {
      val rewritten = points.join(ivs, $"p" >= $"s" && $"p" <= $"e").select("pid", "iid")
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("NestedLoop"), s"expected hash join, got:\n$physical")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally spark.conf.unset(RangeJoinRule.BinWidthKey)
  }

  test("RangeJoinRule is inert without the binWidth config (no bin columns in plan)") {
    val (points, ivs) = fixtures
    graft.expressions.GraftFunctions.registerOptimizations(spark)
    assert(!spark.conf.getOption(RangeJoinRule.BinWidthKey).exists(_ != "0"))
    val plan = naive(points, ivs).queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bin"), s"rule fired without config:\n$plan")
  }

  test("config-time GraftExtensions path: rule runs inside the fixed-point batch without ping-pong") {
    import org.apache.spark.sql.SparkSession
    val base = spark // ensure the shared session (and its context) exists
    // getOrCreate returns the active session and IGNORES withExtensions,
    // so detach the shared session first; the global SparkContext is
    // reused, only the session (with injected extensions) is new.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.expressions.GraftExtensions()).getOrCreate()
    try {
      assert(ext ne base)
      // extensions injected at build time + per-session conf: the rule
      // participates in the fixed-point operator-optimization batch here,
      // the exact environment where the unguarded version overflowed.
      ext.conf.set(RangeJoinRule.BinWidthKey, "500")
      import ext.implicits._
      val points = (0L until 100L).map(i => (i, i % 5000)).toDF("pid", "p")
      val ivs = (0L until 30L).map(i => (1000L + i, i * 150, i * 150 + 400))
        .toDF("iid", "s", "e")
      val joined = points.join(ivs, $"p" >= $"s" && $"p" <= $"e").select("pid", "iid")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        p <- 0L until 100L; i <- 0L until 30L
        if p >= i * 150 && p <= i * 150 + 400
      } yield (p, 1000L + i)).toSet
      assert(got == expected)
    } finally {
      ext.conf.unset(RangeJoinRule.BinWidthKey)
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("RangeJoinRule does not re-match after pushdown folds the filter back (no ping-pong)") {
    // Inside the fixed-point operator-optimization batch (the
    // injectOptimizerRule path), PushPredicateThroughJoin pushes the
    // re-applied range filter straight back into the join condition; the
    // __graft_bin marker must stop the rule from rewriting its own output
    // or the two rules alternate until the iteration limit.
    val (points, ivs) = fixtures
    spark.conf.set(RangeJoinRule.BinWidthKey, "500")
    try {
      val analyzed = naive(points, ivs).queryExecution.analyzed
      val once = RangeJoinRule(analyzed)
      assert(once.toString.contains("__graft_bin")) // rewrite fired
      val pushed = org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(once)
      val twice = RangeJoinRule(pushed)
      assert(twice.fastEquals(pushed), "rule re-matched its own pushed-down output")
    } finally spark.conf.unset(RangeJoinRule.BinWidthKey)
  }
}
