package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Code-point polynomial hash of a whole string, mod 2³¹−1 — the native
  * form of `Sketch.stringHash`'s fold (acc·131 + codePoint) % p, and the
  * per-key hash of the CMS family. One tight loop per row instead of the
  * interpreted `aggregate(transform(sequence(...)))` tree, which
  * dominated the sketch_cms / sketch_cms_topk bench profile (~2 s at
  * sf0.1: the HOF evaluates three nested lambdas per character).
  * Bit-identical to the ANSI chain the oracles repeat
  * (`list_reduce(list_prepend(0, list_transform(range(length(s)),
  * i -> ascii(substr(s, i+1, 1)))), (acc, c) -> (acc*131 + c) % p)`),
  * reusing [[ShingleUtil.tokenHash31]] so the polynomial can never fork
  * from the shingle/SimHash family.
  */
case class StringHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_strhash requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_strhash"

  override def nullSafeEval(t: Any): Any =
    ShingleUtil.codePointHash31(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ctx.addReferenceObj("shingleUtil", ShingleUtil,
      ShingleUtil.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $util.codePointHash31($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): StringHash31 =
    copy(child = newChild)
}
