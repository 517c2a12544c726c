package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local trigram-LM scoring against an EMBEDDED model (r14) — the
  * serving/streaming face of [[graft.operators.TextAnalysis
  * .trigramSurprisal]]: `[n_tri, n_oov, sum_bl]` for one document in
  * one compiled pass, no explode, no join, no aggregate.
  *
  * The batch scorer's explode → broadcast join → per-doc aggregate is
  * the right CORPUS shape (the model stays a DataFrame, Catalyst owns
  * the distribution); an ONLINE quality gate scores each arriving doc
  * in isolation, and any per-doc re-aggregation after an explode is a
  * STATEFUL streaming operator. This expression makes the gate
  * stateless: the model (`keys` = packed [[CharNgramCodes]] trigram
  * codes, `cnts` = their counts — KB-scale, bounded by alphabet³)
  * must be FOLDABLE (literals, the collected persisted model — the
  * BPE served-model precedent); it compiles once per operator into a
  * sorted-array table with each key's `bitlen(cnt + 1)` precomputed,
  * shipped into generated code as a reference object, and each row
  * pays one n-gram walk + one binary search per trigram.
  *
  * Arithmetic is bit-identical to the batch scorer's: bitlen via
  * `64 − numberOfLeadingZeros` ≡ `length(bin(x))` for positive longs,
  * OOV contributes bitlen(0 + 1) = 1. Null text → null; shorter than
  * n chars → [0, 0, 0] (the caller filters, matching the batch side's
  * length ≥ n exclusion). */
case class LmStats(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, IntegerType,
            ArrayType(LongType, _), ArrayType(LongType, _)) =>
        if (third.foldable && fourth.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires the model arrays be foldable literals " +
            "(the collected persisted model)")
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, array<bigint>, array<bigint>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString}, ${d.catalogString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_stats"

  @transient private lazy val table: LmTable = {
    val ks = third.eval(null).asInstanceOf[ArrayData].toLongArray()
    val cs = fourth.eval(null).asInstanceOf[ArrayData].toLongArray()
    LmTable.build(ks, cs)
  }

  override def nullSafeEval(text: Any, n: Any, keys: Any, cnts: Any): Any =
    LmStats.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("lmTable", table, classOf[LmTable].getName)
    nullSafeCodeGen(ctx, ev, (t, n, _, _) => {
      val res = ctx.freshName("lmStats")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.LmStats.compute($t, $n, $tableRef);
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): LmStats =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Sorted-key model table: `keys` ascending, `bls(i)` = bitlen(cnt+1)
  * of keys(i). Serializable — it rides task broadcasts into executors
  * and generated code holds it as a reference object. */
final class LmTable(val keys: Array[Long], val bls: Array[Long])
    extends Serializable

object LmTable {
  def build(ks: Array[Long], cs: Array[Long]): LmTable = {
    require(ks.length == cs.length,
      s"model arrays misaligned: ${ks.length} keys, ${cs.length} counts")
    val order = ks.indices.sortBy(ks)
    val sk = new Array[Long](ks.length)
    val bl = new Array[Long](ks.length)
    var i = 0
    while (i < ks.length) {
      val o = order(i)
      sk(i) = ks(o)
      bl(i) = 64L - java.lang.Long.numberOfLeadingZeros(cs(o) + 1)
      i += 1
    }
    new LmTable(sk, bl)
  }
}

object LmStats {

  /** NOT named `eval` — the GramHashes static-forwarder rule. */
  def compute(text: UTF8String, n: Int, table: LmTable): GenericArrayData = {
    val codes = CharNgramCodes.codes(text, n)
    if (codes == null) return new GenericArrayData(Array(0L, 0L, 0L))
    val nTri = codes.numElements()
    var oov = 0L
    var sumBl = 0L
    var i = 0
    while (i < nTri) {
      val idx = java.util.Arrays.binarySearch(table.keys, codes.getLong(i))
      if (idx >= 0) sumBl += table.bls(idx)
      else { oov += 1; sumBl += 1L } // bitlen(0 + 1)
      i += 1
    }
    new GenericArrayData(Array(nTri.toLong, oov, sumBl))
  }
}
