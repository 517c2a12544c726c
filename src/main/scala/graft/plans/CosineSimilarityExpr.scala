package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity over two float/double arrays.
  *
  * A single fused loop accumulates dot(a,b), |a|², |b|² in doubles —
  * exactly the arithmetic (and accumulation order) of the
  * `zip_with`/`aggregate` composition in functions/Similarity.scala, but
  * with `doGenCode` so it stays inside whole-stage codegen with zero
  * per-element lambda overhead: this is the hot inner loop of the ANN
  * operators, executed |queries|×|corpus| times.
  *
  * Float elements are widened exactly to double before any arithmetic
  * (bit-exact parity with engines that compute on DOUBLE[]). Null,
  * length-mismatched, or zero-norm arrays yield NULL (never NaN — a NaN
  * would rank unpredictably and diverge across engines once quantized);
  * null ELEMENTS are not supported (embedding vectors are dense).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val va = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val vb = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += va * vb; na += va * va; nb += vb * vb
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      def get(arr: String, e: Expression, idx: String): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $va = ${get(a, left, i)};
         |    double $vb = ${get(b, right, i)};
         |    $dot += $va * $vb; $na += $va * $va; $nb += $vb * $vb;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
