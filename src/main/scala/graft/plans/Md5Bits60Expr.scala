package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The sketch family's 60-bit hash, computed natively:
  * `md5(prefix || item)`'s first 15 hex nibbles as a BIGINT — the
  * IDENTICAL value `conv(substring(md5(concat(prefix, item)), 1, 15),
  * 16, 10)` produces (the top 60 bits of the digest), without
  * materializing the 32-char hex string, the substring, or the
  * string-to-long parse per row. On a 60M-row register build the
  * string round-trips were the whole cost profile; this expression is
  * one digest + one shift. The salted-prefix argument stays a separate
  * child so each sketch keeps its decorrelating salt ("hl|", "cm0|",
  * ...) exactly as before — the hash VALUE is contractually unchanged,
  * which is what keeps every DuckDB oracle twin valid. */
case class Md5Bits60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_md5_60"

  override def nullSafeEval(p: Any, x: Any): Any =
    Md5Bits60.top60(p.asInstanceOf[UTF8String], x.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, x) =>
      s"${ev.value} = graft.plans.Md5Bits60.top60($p, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Bits60 =
    copy(left = newLeft, right = newRight)
}

object Md5Bits60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(prefix || item): digest bytes 0..7 big-endian,
    * shifted right 4 — bit-identical to parsing the first 15 hex
    * nibbles of the hex encoding. */
  def top60(prefix: UTF8String, item: UTF8String): Long = {
    val d = md.get()
    d.reset()
    d.update(prefix.getBytes)
    d.update(item.getBytes)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
