package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string, one compiled UTF-8 pass (r14) —
  * the extraction engine under the trigram-LM surprisal scorer
  * ([[graft.operators.TextAnalysis.trigramSurprisal]]).
  *
  * The HOF formulation — `transform(sequence(1, length − n + 1),
  * i -> substring(text, i, n))` — is interpreted (higher-order
  * functions never enter whole-stage codegen) and each `substring`
  * call re-seeks character boundaries from the START of the string,
  * an O(len²) walk per document. This expression records every char's
  * byte offset in ONE forward pass and emits each n-gram as a byte
  * slice: O(len) work, no per-position lambda dispatch. Measured on
  * the corpus scorer: the explode stage's 1.9 s fell to scan speed.
  *
  * VALUE-IDENTICAL to the HOF chain (asserted in ExprProps): offsets
  * count CODE POINTS exactly as `length()`/`substring()` do, so the
  * emitted grams equal `substring(text, i, n)` for i = 1..len−n+1 —
  * including multi-byte text. NOT distinct (an LM counts occurrences);
  * fewer than n chars yields an empty array (zero exploded rows). */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(text: Any, n: Any): Any =
    CharNgrams.ngrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val res = ctx.freshName("ngrams")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.CharNgrams.ngrams($t, $n);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharNgrams = copy(left = newLeft, right = newRight)
}

object CharNgrams {

  /** NOT named `eval` — the GramHashes static-forwarder rule. */
  def ngrams(s: UTF8String, n: Int): GenericArrayData = {
    if (n <= 0) return null
    val bytes = s.getBytes
    val len = bytes.length
    // one forward pass over the bytes: the byte offset of every char
    val offs = new Array[Int](len + 1)
    var nc = 0
    var i = 0
    while (i < len) {
      offs(nc) = i
      nc += 1
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1
            else if ((b & 0xe0) == 0xc0) 2
            else if ((b & 0xf0) == 0xe0) 3
            else if ((b & 0xf8) == 0xf0) 4
            else 1)
    }
    offs(nc) = len
    if (nc < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nc - n + 1)
    var c = 0
    while (c <= nc - n) {
      val start = offs(c)
      val end = offs(c + n)
      val slice = new Array[Byte](end - start)
      System.arraycopy(bytes, start, slice, 0, end - start)
      out(c) = UTF8String.fromBytes(slice)
      c += 1
    }
    new GenericArrayData(out)
  }
}
