package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst ADC (asymmetric distance computation) lookup for
  * product-quantized vectors: given a packed PQ `code` (4 bits per
  * subspace, subspace 0 in the LOWEST nibble) and a per-query lookup
  * table `lut` laid out `[sub * 16 + cell]`, returns
  *
  *   Σ_s  lut[s * 16 + ((code >>> 4s) & 15)]
  *
  * — the quantized distance between the query and the code's
  * reconstruction. This is THE hot loop of PQ search (evaluated
  * |queries| × |corpus| times over a corpus that stores only 8-byte
  * codes), so like [[CosineSimilarity]] it is a `doGenCode` expression:
  * the m-step lookup loop runs inside whole-stage codegen with zero
  * per-element lambda overhead.
  *
  * The subspace count m is `lut.length / 16` (the code's spare high
  * nibbles are simply never read for shorter tables); a lut whose
  * length is not a multiple of 16, or a null input, yields NULL. All
  * arithmetic is integer — bit-portable across engines by construction.
  */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint code, array<bigint> lut), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codeAny: Any, lutAny: Any): Any = {
    val code = codeAny.asInstanceOf[Long]
    val lut = lutAny.asInstanceOf[ArrayData]
    val n = lut.numElements()
    if (n % 16 != 0) return null
    var acc = 0L
    var s = 0
    val m = n / 16
    while (s < m) {
      acc += lut.getLong(s * 16 + ((code >>> (4 * s)) & 15L).toInt)
      s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $lut.numElements();
         |if ($n % 16 != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  int $m = $n / 16;
         |  for (int $s = 0; $s < $m; $s++) {
         |    $acc += $lut.getLong($s * 16 + (int) (($code >>> (4 * $s)) & 15L));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}
