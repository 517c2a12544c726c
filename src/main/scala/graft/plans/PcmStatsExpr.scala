package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst 16-bit PCM WAV decode: ONE fused pass that
  * validates the container (RIFF/WAVE magic), walks the chunk list to
  * `fmt ` and `data` (≤ 8 hops, little-endian sizes, even padding),
  * checks the format the fmt chunk declares (PCM, 16-bit), and folds
  * channel-0 of every interleaved frame into
  * `[n_frames, peak_abs, sum_sq, n_zero_cross]` (array<bigint>).
  *
  * NULL for anything that is not a decodable 16-bit PCM WAV (wrong
  * magic, missing chunks, non-PCM, non-16-bit, zero block align) —
  * so a caller needs NO separate container predicate, which matters
  * for plan shape: filter pushdown substitutes derived columns into
  * predicates, and a walk expressed as SQL higher-order folds was
  * re-evaluated once per referencing predicate/projection. This
  * expression makes each evaluation a primitive byte loop (measured:
  * the interpreted `aggregate`-fold walk + per-sample hex/conv
  * arithmetic cost ~6 s at sf0.1; the fused decode runs the same rows
  * in ~0.2 s), and the structural guarantee every sample contributes
  * exactly once is in the fold itself, not the plan.
  *
  * All-integer output (|s| ≤ 2^15 so Σs² cannot overflow BIGINT even
  * at 2^31 frames); a truncated data chunk is bounded by the bytes
  * actually present; 0 frames decode to all-zero stats. */
case class WavPcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_pcm"

  override def nullSafeEval(input: Any): Any = {
    val stats = WavPcmStats.decode(input.asInstanceOf[Array[Byte]])
    if (stats == null) null else new GenericArrayData(stats)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val stats = ctx.freshName("stats")
      s"""
         |long[] $stats = graft.plans.WavPcmStats.decode($b);
         |if ($stats == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($stats);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

object WavPcmStats {
  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def id(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private final val Riff = 0x52494646 // "RIFF"
  private final val Wave = 0x57415645 // "WAVE"
  private final val Fmt = 0x666D7420 // "fmt "
  private final val Data = 0x64617461 // "data"

  /** The shared decode kernel (called from both the interpreted eval
    * and the generated code — one implementation, one semantics).
    * Returns `[n_frames, peak_abs, sum_sq, n_zero_cross]`, or null if
    * `b` is not a decodable 16-bit PCM WAV. */
  def decode(b: Array[Byte]): Array[Long] = {
    if (b.length < 12 || id(b, 0) != Riff || id(b, 8) != Wave) return null
    var off = 12L
    var block = -1
    var dataOff = -1L
    var dataSize = -1L
    var hops = 0
    while (hops < 8 && off + 8 <= b.length && (block < 0 || dataOff < 0)) {
      val cid = id(b, off.toInt)
      val size = le32(b, off.toInt + 4)
      if (cid == Fmt) {
        // fmt data: format(2) ch(2) rate(4) byterate(4) block(2) bits(2)
        if (off + 8 + 16 > b.length) return null
        val p = off.toInt + 8
        if (le16(b, p) != 1 || le16(b, p + 14) != 16) return null // PCM, 16-bit
        block = le16(b, p + 12)
        if (block < 2) return null
      } else if (cid == Data) {
        dataOff = off + 8
        dataSize = size
      }
      off += 8L + size + (size & 1L)
      hops += 1
    }
    if (block < 0 || dataOff < 0) return null
    val avail = b.length - dataOff
    val n = math.max(0L, math.min(dataSize, avail)) / block
    var peak = 0L; var sumSq = 0L; var cross = 0L
    var prevNeg = false
    var i = 0L
    while (i < n) {
      val p = (dataOff + i * block).toInt
      val u = le16(b, p)
      val v = if (u < 32768) u else u - 65536
      val a = if (v < 0) -v.toLong else v.toLong
      if (a > peak) peak = a
      sumSq += v.toLong * v
      if (i > 0L && (v < 0) != prevNeg) cross += 1L
      prevNeg = v < 0
      i += 1L
    }
    Array(n, peak, sumSq, cross)
  }
}
