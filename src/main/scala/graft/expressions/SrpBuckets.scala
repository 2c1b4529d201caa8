package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** All `nTables` SRP-LSH bucket ids of a vector in ONE fused native pass:
  * `graft_srp(vec, dim, nPlanes, nTables, seed)` → `array<long>` of length
  * nTables (bucket of table t at index t), NULL when the vector's length ≠
  * dim or any element is NULL — a null array posexplodes to zero rows, so
  * malformed vectors drop out of bucket joins. (The composed `srpBucket`
  * form differs on ONE input class: a correct-length vector with a NULL
  * element got a zero-bit bucket there, here it is dropped entirely —
  * deliberate, since its cosine is NULL and can never verify; pinned by
  * a DedupSpec test.)
  *
  * Replaces the composed `srpBucket` tree (nTables × nPlanes `graft_dot`
  * calls against 64-element array literals): that tree exceeds the
  * generated-method size codegen tolerates and falls back to interpreted
  * eval — the dominant cost of the LSH operators. Here the whole
  * hyperplane bank lives in one reference object and the dots run in a
  * tight loop, with the identical left-to-right IEEE accumulation and
  * `dot >= 0` sign rule, so buckets of valid vectors are bit-identical to
  * the composed form AND to the oracle SQL's literal-embedded
  * `list_dot_product`.
  *
  * The hyperplanes are [[graft.operators.Similarity.hyperplanes]] — the
  * same matrices the oracle generator embeds as SQL literals.
  */
case class SrpBuckets(vec: Expression, dimExpr: Expression, planesExpr: Expression,
                      tablesExpr: Expression, seedExpr: Expression)
  extends Expression {

  override def children: Seq[Expression] =
    Seq(vec, dimExpr, planesExpr, tablesExpr, seedExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, dimExpr.dataType, planesExpr.dataType,
      tablesExpr.dataType, seedExpr.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType, IntegerType, LongType)
        if Seq(dimExpr, planesExpr, tablesExpr, seedExpr).forall(_.foldable) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_srp(vec, dim, nPlanes, nTables, seed) requires " +
          "(array<double>, int, int, int, bigint) with foldable parameters")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_srp"

  @transient private lazy val util = SrpUtil(
    dimExpr.eval().asInstanceOf[Int],
    planesExpr.eval().asInstanceOf[Int],
    tablesExpr.eval().asInstanceOf[Int],
    seedExpr.eval().asInstanceOf[Long])

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else util.buckets(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("srpUtil", util, classOf[SrpUtil].getName)
    val childGen = vec.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |$arrCls ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = $u.buckets((${arrCls}) ${childGen.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SrpBuckets =
    copy(vec = newChildren(0), dimExpr = newChildren(1), planesExpr = newChildren(2),
      tablesExpr = newChildren(3), seedExpr = newChildren(4))
}

/** Runtime for [[SrpBuckets]] — holds the hyperplane bank; ships to
  * executors inside the codegen references array.
  */
case class SrpUtil(dim: Int, nPlanes: Int, nTables: Int, seed: Long)
  extends Serializable {

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(nTables)(t =>
      graft.operators.Similarity.hyperplanes(dim, nPlanes, seed, t))

  def buckets(v: ArrayData): ArrayData = {
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val xs = v.toDoubleArray()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val pt = planes(t)
      var bucket = 0L
      var h = 0
      while (h < nPlanes) {
        val p = pt(h)
        var dot = 0.0
        i = 0
        while (i < dim) { dot += xs(i) * p(i); i += 1 }
        if (dot >= 0) bucket |= (1L << h)
        h += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
