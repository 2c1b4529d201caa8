package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native expressions.
  *
  * Two paths, same registry entries:
  *  - config-time: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)` (idempotent) for sessions
  *    that already exist — the harness mains and `SparkEntry.queries` use
  *    this so any caller-provided session works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // Opt-in plan rewrite (inert unless spark.graft.rangeJoin.binWidth > 0).
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles(text, n) takes two arguments")
        ShingleHashes(children.head, children(1))
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b) takes two arrays")
        ArrayDot(children.head, children(1))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash(text) takes one argument")
        SimHash64(children.head)
      }),
    (FunctionIdentifier("graft_strhash"),
      new ExpressionInfo(classOf[StringHash31].getName, "graft_strhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_strhash(s) takes one argument")
        StringHash31(children.head)
      }),
    (FunctionIdentifier("graft_shingles31"),
      new ExpressionInfo(classOf[Shingle31Hashes].getName, "graft_shingles31"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_shingles31(text, n) takes two arguments")
        Shingle31Hashes(children.head, children(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_minhash(text, n, numPerms) takes three arguments")
        MinHashSignature(children.head, children(1), children(2))
      }),
    (FunctionIdentifier("graft_srp"),
      new ExpressionInfo(classOf[SrpBuckets].getName, "graft_srp"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          "graft_srp(vec, dim, nPlanes, nTables, seed) takes five arguments")
        SrpBuckets(children.head, children(1), children(2), children(3), children(4))
      }),
    (FunctionIdentifier("graft_quant8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quant8"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_quant8(vec) takes one array argument")
        QuantizeInt8(children.head)
      }),
    (FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_l2norm(vec) takes one array argument")
        L2Normalize(children.head)
      }),
    // Spark's own bloom-filter sketch pair (the engine uses them for
    // runtime join filtering) surfaced under stable names: the aggregate
    // is registry-internal upstream, so expose it here for the
    // BloomJoin scalar-subquery pattern. Public Apache Spark classes —
    // codegen'd XxHash64 updates, merge-able buffers.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.size <= 3,
          "graft_bloom_agg(key[, estimatedItems[, numBits]]) takes 1-3 arguments")
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, n) => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        }
      }),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_might_contain(bloom, key) takes two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))

  /** Idempotent runtime registration into an existing session. Fast-path
    * exits on the last-registered name so per-Column-construction calls
    * from [[ensureRegistered]] cost one registry lookup, not twelve puts.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(all.last._1))
      all.foreach { case (ident, info, builder) =>
        reg.registerFunction(ident, info, builder)
      }
  }

  /** Best-effort lazy registration against the thread's active session
    * (or the JVM default) — called at Column-construction time by
    * [[graft.functions.Fns.callGraft]] so library callers who never go
    * through a harness entry point still resolve `graft_*` functions.
    * A caller constructing columns against a DataFrame necessarily has
    * one of the two sessions set; when neither exists this returns
    * false and the caller picks its fallback (interpreted formulation,
    * or let analysis fail with the registry's own unresolved-function
    * error). Multi-session caveat: registration lands on the ACTIVE
    * session — a caller juggling several sessions should still call
    * [[register]] on each explicitly.
    */
  def ensureRegistered(): Boolean =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => register(s); true
      case None => false
    }

  /** Runtime (post-creation) injection of the graft optimizer rules —
    * the per-session analog of the config-time extension path, via
    * Spark's public `experimental.extraOptimizations` hook. Idempotent.
    */
  def registerOptimizations(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations = cur :+ graft.plans.RangeJoinRule
  }
}
