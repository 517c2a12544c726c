package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string PACKED as BIGINT codes, one
  * compiled UTF-8 pass (r14) — [[CharNgrams]]' fixed-width sibling,
  * the key-side engine under the trigram-LM scorer at scale.
  *
  * Each n-gram's code points (≤ 0x10FFFF, 21 bits each) pack
  * big-endian into one long: `code = cp₀·2⁴² | cp₁·2²¹ | cp₂` for
  * n = 3. The packing is INJECTIVE for n ≤ 3 (63 bits), so
  * grouping/joining on the code is exactly grouping/joining on the
  * n-gram text — but the 1.5B-row explode at the 5M-doc scale carries
  * 8-byte longs instead of freshly allocated string slices, and every
  * downstream hash (shuffle partitioner, broadcast-join probe, hash
  * aggregate) runs on a primitive. Measured on the corpus scorer at
  * sf10m: the scoring stage's string-keyed form was 1.7× slower.
  *
  * The dictionary-encode-your-join-keys trick is internal only: the
  * scorer's OUTPUT (per-doc aggregates) is representation-free, so the
  * DuckDB oracle keeps joining on trigram TEXT and the correctness
  * gate proves the two keyings equivalent end-to-end. n outside
  * [1, 3] → null (the packing would overflow); fewer than n chars →
  * empty array. Code-point equality over the expression's own
  * single-pass decoder — matches [[CharNgrams]]' boundary walk
  * (property-pinned: codes ↔ grams bijectively).
  *
  * Injectivity precondition: VALID UTF-8 (what Spark's own string
  * functions assume; DuckDB refuses invalid bytes at ingest, so no
  * oracle-checked corpus can carry them). For bytes that are not —
  * possible in strings read from external parquet — every MALFORMED
  * sequence (invalid lead, truncated or non-continuation tail,
  * overlong encoding) decodes to U+FFFD, the standard replacement-
  * character semantics (r15 ADVICE: the old keep-the-lead-byte
  * fallback collided a dangling 0xC3 with a literal 0x03, and a bare
  * continuation byte 0xA0 with valid U+00A0). Malformed byte strings
  * therefore collide only WITH EACH OTHER (and with a literal
  * U+FFFD — the inherent cost of lossy decoding, same as every
  * replacement-character decoder), never onto any other valid code
  * point, and the boundary walk itself is unchanged — code arrays
  * stay position-aligned with [[CharNgrams]] on arbitrary bytes
  * (property-pinned over raw invalid sequences in ExprProps). */
case class CharNgramCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_ngram_codes"

  override def nullSafeEval(text: Any, n: Any): Any =
    CharNgramCodes.codes(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val res = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.CharNgramCodes.codes($t, $n);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CharNgramCodes = copy(left = newLeft, right = newRight)
}

object CharNgramCodes {

  /** NOT named `eval` — the GramHashes static-forwarder rule.
    *
    * ARTIFACT COMPATIBILITY (r15 ADVICE): the r15 hardening changed
    * malformed-UTF-8 decoding from keep-lead-byte to U+FFFD, which
    * changes the packed codes this walk emits for invalid byte
    * sequences. A trigram-model / gram store persisted BEFORE that
    * change mismatches probes built after it — but only on corpora
    * that carry invalid UTF-8 (parquet string columns written by Spark
    * or DuckDB are valid by construction; the exposure is external /
    * unvalidated writers). If such corpora must survive the upgrade,
    * rebuild their stores; there is no in-band format marker because
    * the affected inputs are outside every oracle-checked path. */
  def codes(s: UTF8String, n: Int): GenericArrayData = {
    if (n <= 0 || n > 3) return null
    val bytes = s.getBytes
    val len = bytes.length
    // one forward pass: decode every code point
    val cps = new Array[Int](len)
    var nc = 0
    var i = 0
    while (i < len) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var w = 1
      var bad = false
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { w = 2; cp = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { w = 3; cp = b0 & 0x0f }
      else if ((b0 & 0xf8) == 0xf0) { w = 4; cp = b0 & 0x07 }
      else bad = true // bare continuation byte or 0xF8–0xFF lead
      var j = 1
      while (j < w && i + j < len) {
        val bj = bytes(i + j) & 0xff
        if ((bj & 0xc0) != 0x80) bad = true // grabbed a non-continuation
        cp = (cp << 6) | (bj & 0x3f)
        j += 1
      }
      if (j < w) bad = true // truncated at end of string
      // overlong encodings collide with shorter valid forms — malformed;
      // surrogates and cp > U+10FFFF are invalid UTF-8 (RFC 3629) too
      if (w == 2 && cp < 0x80) bad = true
      if (w == 3 && (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff))) bad = true
      if (w == 4 && (cp < 0x10000 || cp > 0x10ffff)) bad = true
      cps(nc) = if (bad) 0xFFFD else cp
      nc += 1
      i += w // the width from the lead byte, exactly CharNgrams' walk
    }
    if (nc < n) return new GenericArrayData(new Array[Long](0))
    val out = new Array[Long](nc - n + 1)
    var c = 0
    while (c <= nc - n) {
      var code = 0L
      var k = 0
      while (k < n) { code = (code << 21) | (cps(c + k) & 0x1fffffL); k += 1 }
      out(c) = code
      c += 1
    }
    new GenericArrayData(out)
  }
}
