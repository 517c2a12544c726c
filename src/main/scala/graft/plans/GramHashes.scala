package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rolling 128-bit gram digests (r11) — the hashing engine under
  * [[graft.operators.Dedup.substringDedup]]'s overlapping-gram stream.
  *
  * The naive formulation re-materializes every L-word window as a
  * joined string and md5s it: O(words × L × wordBytes) per doc, and the
  * dedup pipeline derives the stream twice (df side + mark side). This
  * expression hashes each WORD once (two independent FNV-1a-64 passes)
  * and combines windows with a rolling polynomial — O(words × wordBytes
  * + words) per doc, an L-fold cut of the dominant stage measured at
  * 62 s for sf30.
  *
  * Two independent 64-bit lanes ≈ a 128-bit digest: at 10^12 grams
  * (the 100 TB regime) a single 64-bit lane expects ~10^7 birthday
  * collisions — unusable — while 2^128 expects none. Same contract as
  * the md5 form: equal grams ⇒ equal digests, unequal ⇒ unequal with
  * overwhelming probability, and the DuckDB oracle adjudicates by TEXT
  * equality so a collision would surface as a hash mismatch.
  *
  * The polynomial treats the WORD as the unit (position-weighted word
  * hashes), so word boundaries are part of the digest — "ab c" and
  * "a bc" differ even though their concatenations agree, which the
  * joined-string md5 form got from its separator only when words
  * cannot contain the separator (same assumption, now structural).
  *
  * Returns one struct (h1, h2) per window start (length − L + 1
  * entries); null for a null array, empty array when length < L.
  *
  * CONTRACT (pinned by LlmOpsSpec): a NULL array element hashes as the
  * empty string — both contribute only the lane offset bases. split()
  * never yields null elements, but this expression is registered SQL
  * surface; a caller needing null ≠ "" must pre-encode nulls. */
case class GramHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(words: Any, l: Any): Any =
    GramHashes.hashAll(words.asInstanceOf[ArrayData], l.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, l) => {
      val res = ctx.freshName("grams")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.GramHashes.hashAll($w, $l);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramHashes = copy(left = newLeft, right = newRight)
}

object GramHashes {
  // FNV-1a 64 offset/prime, and an independent second lane (different
  // offset basis, different prime — both odd, both full-period under
  // mod-2^64 wraparound)
  private final val Fnv1Offset = 0xcbf29ce484222325L
  private final val Fnv1Prime = 0x100000001b3L
  private final val Fnv2Offset = 0x6c62272e07bb0142L
  private final val Fnv2Prime = 0x00000100000001b5L
  // polynomial bases for the window combination (distinct odd constants)
  private final val P1 = 0x9e3779b97f4a7c15L
  private final val P2 = 0xc2b2ae3d27d4eb4fL

  /** NOT named `eval` (r12): the case class inherits eval(InternalRow)
    * from Expression, and a companion method sharing that name gets NO
    * static forwarder on the class — the generated Java then fails to
    * compile and every caller silently falls back to interpreted mode
    * (found via the codegen CompileException log in StreamingSpec). */
  def hashAll(words: ArrayData, l: Int): GenericArrayData = {
    if (l <= 0) return null
    val n = words.numElements()
    if (n < l) return new GenericArrayData(new Array[Any](0))
    // pass 1: per-word 64-bit hashes, two independent lanes
    val a = new Array[Long](n)
    val b = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h1 = Fnv1Offset
      var h2 = Fnv2Offset
      if (!words.isNullAt(i)) {
        val bytes = words.getUTF8String(i).getBytes
        var j = 0
        while (j < bytes.length) {
          h1 = (h1 ^ (bytes(j) & 0xffL)) * Fnv1Prime
          h2 = (h2 ^ (bytes(j) & 0xffL)) * Fnv2Prime
          j += 1
        }
      }
      a(i) = h1; b(i) = h2
      i += 1
    }
    // P^(l-1) for the roll-out term, wraparound arithmetic
    var p1l = 1L; var p2l = 1L
    i = 1
    while (i < l) { p1l *= P1; p2l *= P2; i += 1 }
    // pass 2: first window by direct fold, then roll
    val out = new Array[Any](n - l + 1)
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < l) { h1 = h1 * P1 + a(i); h2 = h2 * P2 + b(i); i += 1 }
    out(0) = new GenericInternalRow(Array[Any](h1, h2))
    var s = 1
    while (s <= n - l) {
      h1 = (h1 - a(s - 1) * p1l) * P1 + a(s + l - 1)
      h2 = (h2 - b(s - 1) * p2l) * P2 + b(s + l - 1)
      out(s) = new GenericInternalRow(Array[Any](h1, h2))
      s += 1
    }
    new GenericArrayData(out)
  }
}
