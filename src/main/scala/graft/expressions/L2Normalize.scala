package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native L2 normalization of a double vector — one fused codegen'd pass
  * (sum of squares, then the divide) producing `array<double>` with unit
  * norm. The standard pre-pass before cosine ANN: normalized vectors turn
  * cosine into a plain dot product and make int8 quantization scales
  * comparable across the corpus.
  *
  * Exists for the same reason as [[QuantizeInt8]]: the HOF formulation
  * (`transform(v, x => x / sqrt(graft_dot(v, v)))`) re-evaluates the norm
  * subtree per ELEMENT (CollapseProject inlines a once-used alias into
  * the lambda) and `transform` itself is interpreted.
  *
  * Semantics: NULL if the input is NULL, empty, contains a NULL element,
  * or has zero norm. Accumulation is left-to-right IEEE; sqrt is
  * correctly rounded — every engine reproduces the output bit-for-bit.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_l2norm requires an array<double> argument, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      ss += x * x
      i += 1
    }
    if (!(ss > 0.0)) return null
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val x = ctx.freshName("x")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |final int $n = $v.numElements();
         |boolean $bad = ($n == 0);
         |double $ss = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $bad = true; break; }
         |  final double $x = $v.getDouble($i);
         |  $ss += $x * $x;
         |}
         |if ($bad || !($ss > 0.0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $norm = java.lang.Math.sqrt($ss);
         |  final double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $v.getDouble($i) / $norm;
         |  }
         |  ${ev.value} = new $arrCls($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}
