package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row MinHash signature in one compiled pass (r14) — the codegen
  * engine under the STREAMING ingest gates' band keys.
  *
  * The scalar HOF formulation ([[graft.functions.Similarity
  * .minhashFromHashes]] over [[graft.functions.Similarity
  * .shingleHashes]]) is what makes signatures streamable (a per-row
  * projection where the batch groupBy would be stateful), but Catalyst
  * higher-order functions evaluate INTERPRETED — an expression-tree
  * walk per shingle per permutation — and the r14 stream-rate probe
  * put the online path at ~7.6 ms/doc against the batch pipeline's
  * ~1 ms/doc. This expression computes the identical values as a tight
  * JVM loop: one md5 per k-word window, `perms` fused integer
  * permute-and-min updates per window, no intermediate arrays.
  *
  * VALUE-IDENTICAL to both existing formulations, by construction and
  * by test (StreamingSpec asserts stream ≡ batch row-equality through
  * it; LlmOpsSpec asserts the expression ≡ the HOF chain directly):
  *
  *  - the window hash is the first 15 hex chars of md5(window joined
  *    with " ") read base-16 — exactly `conv(substring(md5(s),1,15),
  *    16,10)` ([[graft.functions.Similarity.shingleHash]]);
  *  - permutation p is ((h ⊕ Cₚ) mod P)·Aₚ mod P with the SAME
  *    driver-side constants ([[graft.functions.Similarity.permC]]/
  *    [[permA]]), so the DuckDB oracles' inlined arithmetic still
  *    matches;
  *  - the HOF chain hashes DISTINCT shingles (array_distinct before
  *    md5); a min over the multiset equals the min over the distinct
  *    set, so this pass skips the dedup entirely — fewer allocations,
  *    same signature.
  *
  * Returns null for a null words array OR fewer than k words (the HOF
  * chain yields an all-null signature there and every caller guards
  * with `size(w) >= k`; a single null is the same sentinel without
  * per-element null lanes). Null ELEMENTS hash as the empty string,
  * matching split()'s never-null output contract (GramHashes rule). */
case class MinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(words: Any, k: Any, perms: Any): Any =
    MinhashSig.sign(words.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], perms.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k, p) => {
      val res = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.MinhashSig.sign($w, $k, $p);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MinhashSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinhashSig {
  import graft.functions.Similarity.{permA, permC, PermP}

  /** NOT named `eval` — the GramHashes static-forwarder rule (a
    * companion method named eval suppresses the forwarder and silently
    * drops every caller to interpreted mode). */
  def sign(words: ArrayData, k: Int, perms: Int): GenericArrayData = {
    if (k <= 0 || perms <= 0) return null
    val n = words.numElements()
    if (n < k) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // permutation constants, resolved once per call (perms is a literal
    // 8 in every pipeline — 16 longs, not worth a cache's complexity)
    val cs = new Array[Long](perms)
    val as = new Array[Long](perms)
    var p = 0
    while (p < perms) { cs(p) = permC(p); as(p) = permA(p); p += 1 }
    val mins = Array.fill(perms)(Long.MaxValue)
    val sep = " ".getBytes("UTF-8")
    // per-word UTF-8 bytes once (each word joins k windows)
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      wb(i) = if (words.isNullAt(i)) Array.emptyByteArray
        else words.getUTF8String(i).getBytes
      i += 1
    }
    var s = 0
    while (s <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(sep)
        md.update(wb(s + j))
        j += 1
      }
      val d = md.digest()
      // first 15 hex nibbles base-16 == conv(substring(hex, 1, 15), 16, 10)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      p = 0
      while (p < perms) {
        val v = ((h ^ cs(p)) % PermP) * as(p) % PermP
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}
