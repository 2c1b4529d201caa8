package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document in one native pass — tokenize,
  * shingle, hash, permute, min — with no explode/shuffle. Formula and
  * constants are exactly the columnwise
  * `min(minhashPerm(xxhash64(shingle)))` formulation (see
  * [[ShingleUtil.minhashSignature]]), so signatures are unchanged; the
  * physical plan just loses its widest shuffle. NULL for documents with
  * fewer than n tokens (they have no shingle set).
  */
case class MinHashSignature(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
        if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash(text, n, numPerms) requires (string, foldable int, foldable int), got $a, $b, $c")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  @transient private lazy val n: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val numPerms: Int = third.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null
    else ShingleUtil.minhashSignature(t.asInstanceOf[UTF8String], n, numPerms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val util = ctx.addReferenceObj("shingleUtil", ShingleUtil,
      ShingleUtil.getClass.getName)
    val childGen = first.genCode(ctx)
    val resultType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    // Not nullSafeCodeGen: the result can be null (doc with < n tokens)
    // even when the input string is non-null.
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        $resultType ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = $util.minhashSignature(${childGen.value}, $n, $numPerms);
          ${ev.isNull} = (${ev.value} == null);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashSignature =
    copy(first = f, second = s, third = t)
}
