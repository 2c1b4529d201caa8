package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one native pass: tokenize on spaces,
  * hash each token with the ANSI-expressible code-point polynomial of
  * [[ShingleUtil.tokenHash31]], per-bit majority vote via affine remixes
  * mod 2³¹−1, sign → bit. Every step is plain integer arithmetic, so a
  * DuckDB oracle reproduces the fingerprints exactly.
  *
  * Replaces explode(tokens) + groupBy(doc) with 64 columnwise
  * conditional sums — that shape shuffles every token and evaluates 64
  * aggregate expressions per token row; this one keeps the whole vote in
  * a 64-int stack array per document and shuffles nothing.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(t: Any): Any =
    ShingleUtil.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ctx.addReferenceObj("shingleUtil", ShingleUtil,
      ShingleUtil.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $util.simhash64($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
