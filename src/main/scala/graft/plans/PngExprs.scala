package graft.plans

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL PNG decode (r10) — the image rung of the multimodal decode
  * ladder, graduating images from stub to real the way round 9's
  * `graft_wav_pcm` graduated audio: PNG's codec is zlib — the same
  * DEFLATE the git object store reader already inflates
  * (sources/GitRepo.scala) — so a complete decode needs no external
  * codec library: chunk walk → IDAT inflate → per-scanline UNFILTER
  * (all five PNG filter types: None/Sub/Up/Average/Paeth) → channel
  * sums.
  *
  * Same fused-expression rationale as [[WavPcmStats]]: the decoder IS
  * the container sniff (null for anything not a supported PNG), one
  * primitive-loop evaluation per row inside whole-stage codegen, no
  * derived-column re-evaluation hazard.
  *
  * Output `[width, height, sum_r, sum_g, sum_b]` (array<bigint>) —
  * exact integers (a channel byte ≤ 255, so even 2^53 pixels cannot
  * overflow), so the row hash-matches a DuckDB oracle that re-derives
  * the sums from the SYNTHESIS formula without touching bytes: a match
  * proves the inflate found the right stream AND the unfiltering
  * reversed the encoder's filters bit-exactly.
  *
  * Scope (validated, else null): 8-bit truecolor (color type 2),
  * non-interlaced, CRC-checked IHDR/IDAT, multi-IDAT streams
  * concatenated per spec. */
case class PngPixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_pixels"

  override def nullSafeEval(input: Any): Any = {
    val stats = PngPixelStats.decode(input.asInstanceOf[Array[Byte]])
    if (stats == null) null else new GenericArrayData(stats)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val stats = ctx.freshName("stats")
      s"""
         |long[] $stats = graft.plans.PngPixelStats.decode($b);
         |if ($stats == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($stats);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}

object PngPixelStats {
  private final val Signature =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def crcOk(b: Array[Byte], typeOff: Int, dataLen: Int): Boolean = {
    val crc = new CRC32()
    crc.update(b, typeOff, 4 + dataLen)
    crc.getValue == be32(b, typeOff + 4 + dataLen)
  }

  /** `[width, height, sum_r, sum_g, sum_b]`, or null if `b` is not a
    * valid CRC-checked 8-bit truecolor non-interlaced PNG. Trailing
    * bytes after IEND are ignored (the spec's stop rule). */
  def decode(b: Array[Byte]): Array[Long] = {
    val d = decodeRaw(b)
    if (d == null) return null
    val (w, h, raw) = d
    val stride = (w * 3).toInt
    val sums = new Array[Long](3)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride) + 1
      var x = 0
      while (x < stride) { sums(x % 3) += raw(rowOff + x) & 0xff; x += 1 }
      y += 1
    }
    Array(w, h, sums(0), sums(1), sums(2))
  }

  /** Full decode to the UNFILTERED pixel stream: (width, height, raw)
    * where `raw` keeps the scanline layout (1 dead filter byte + 3·w
    * pixel bytes per row — pixel (x, y, c) is
    * `raw(y·(1+3w) + 1 + 3x + c)`); null for anything outside the
    * supported profile or failing CRC/inflate/filter validation. */
  def decodeRaw(b: Array[Byte]): (Long, Long, Array[Byte]) = {
    if (b.length < 8) return null
    var i = 0
    while (i < 8) { if (b(i) != Signature(i)) return null; i += 1 }
    var off = 8
    var w = -1L; var h = -1L
    var idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    var first = true
    while (!sawEnd && off + 12 <= b.length) {
      val len = be32(b, off)
      if (len > Int.MaxValue - 12 || off + 12L + len > b.length) return null
      val dataOff = off + 8
      val ctype = be32(b, off + 4)
      if (first) {
        // IHDR MUST be the first chunk
        if (ctype != 0x49484452L || len != 13 || !crcOk(b, off + 4, 13)) return null
        w = be32(b, dataOff)
        h = be32(b, dataOff + 4)
        // bit depth 8, color type 2 (truecolor), compression 0,
        // filter method 0, non-interlaced — the supported profile
        if (b(dataOff + 8) != 8 || b(dataOff + 9) != 2 || b(dataOff + 10) != 0 ||
          b(dataOff + 11) != 0 || b(dataOff + 12) != 0) return null
        // bound each dimension BEFORE multiplying: w,h come from be32 (up
        // to 2^32-1) and w*h*3 wraps Long for crafted dims, so the product
        // cap alone would pass a negative wrap
        if (w <= 0 || h <= 0 || w > (1L << 24) || h > (1L << 24) ||
          w * h * 3 > (1L << 26)) return null // 64 MiB raw cap
        first = false
      } else if (ctype == 0x49444154L) { // IDAT — may span several chunks
        if (!crcOk(b, off + 4, len.toInt)) return null
        idat.write(b, dataOff, len.toInt)
      } else if (ctype == 0x49454E44L) { // IEND
        sawEnd = true
      }
      off += 12 + len.toInt
    }
    if (first || !sawEnd) return null
    val stride = (w * 3).toInt
    val rawLen = (h * (1 + stride)).toInt
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    val comp = idat.toByteArray
    inf.setInput(comp)
    var got = 0
    try {
      while (got < rawLen && !inf.finished()) {
        val k = inf.inflate(raw, got, rawLen - got)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += k
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got < rawLen) return null
    // unfilter in place: prior row = unfiltered bytes of y-1 (zeros at y=0)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride) + 1
      val priorOff = rowOff - (1 + stride)
      val filter = raw(rowOff - 1) & 0xff
      if (filter > 4) return null
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= 3) raw(rowOff + x - 3) & 0xff else 0
        val up = if (y > 0) raw(priorOff + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raw(priorOff + x - 3) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => (cur + left) & 0xff
          case 2 => (cur + up) & 0xff
          case 3 => (cur + ((left + up) >> 1)) & 0xff
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            (cur + pred) & 0xff
        }
        raw(rowOff + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    (w, h, raw)
  }

  /** Box-filter downsample by integer `factor`: output pixel (X, Y, c)
    * is the FLOOR-average of the decoded pixels in the f×f block
    * (edge blocks smaller — averaged over their actual pixel count, so
    * every input pixel contributes to exactly one output pixel).
    * Returns one (px, py, r, g, b) struct per output pixel, row-major;
    * null where decode fails or factor < 1. */
  def resize(b: Array[Byte], factor: Int): GenericArrayData = {
    if (factor < 1) return null
    val d = decodeRaw(b)
    if (d == null) return null
    val (wL, hL, raw) = d
    val w = wL.toInt; val h = hL.toInt
    val stride = 3 * w
    val outW = (w + factor - 1) / factor
    val outH = (h + factor - 1) / factor
    val out = new Array[Any](outW * outH)
    var oy = 0
    while (oy < outH) {
      var ox = 0
      while (ox < outW) {
        val x0 = ox * factor; val x1 = math.min(w, x0 + factor)
        val y0 = oy * factor; val y1 = math.min(h, y0 + factor)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          val rowOff = y * (1 + stride) + 1
          var x = x0
          while (x < x1) {
            sr += raw(rowOff + 3 * x) & 0xff
            sg += raw(rowOff + 3 * x + 1) & 0xff
            sb += raw(rowOff + 3 * x + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        out(oy * outW + ox) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ox.toLong, oy.toLong, sr / n, sg / n, sb / n))
        ox += 1
      }
      oy += 1
    }
    new GenericArrayData(out)
  }
}

/** REAL image resize (r10) — the one named multimodal operation
  * ([[PngPixelStats]] covers decode, `Multimodal.featurize` the
  * feature-extract plumbing, [[AviFrameStats]] frame-sample) that had
  * no real rung: a box-filter downsample over the ACTUAL decoded
  * pixels of the PNG (full inflate + unfilter via
  * [[PngPixelStats.decodeRaw]]), floor-averaged per block, so the
  * DuckDB oracle re-derives every output pixel arithmetically from the
  * synthesis formula (group the formula bytes by (x div f, y div f, c)
  * and integer-divide the sums). Fused expression for the same reason
  * as the decode: the resize IS the sniff, no derived-column
  * re-evaluation, whole-stage codegen. */
case class PngResize(child: Expression, factor: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = child
  override def right: Expression = factor

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType && factor.dataType == IntegerType &&
        factor.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, int literal) arguments")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("px", LongType, nullable = false),
    StructField("py", LongType, nullable = false),
    StructField("r", LongType, nullable = false),
    StructField("g", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_resize"

  override def nullSafeEval(b: Any, f: Any): Any =
    PngPixelStats.resize(b.asInstanceOf[Array[Byte]], f.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, f) => {
      val res = ctx.freshName("resized")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.PngPixelStats.resize($b, $f);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PngResize = copy(child = newLeft, factor = newRight)
}

/** Deterministic PNG SYNTHESIS for the image rows of the media lake —
  * the test-signal generator the decode rung is adjudicated against
  * (the q_audio_pcm pattern: synth parameters and payload derive from
  * doc_id by a formula BOTH engines know, so the DuckDB oracle computes
  * the expected decode output arithmetically, never touching bytes).
  *
  * Construction (all from `doc_id`): width = 4 + doc_id % 13, height =
  * 3 + doc_id % 11, 8-bit RGB; RAW byte i of the pixel stream is
  * `(doc_id·31 + i·7) % 256`. Every scanline y is filtered with type
  * `y % 5` before deflate — ALL FIVE filter types appear in every image
  * taller than 4 rows, so a decoder that skips unfiltering (or gets
  * Paeth's tie-breaking wrong) cannot hash-match. Chunks carry real
  * CRC32s; the IDAT stream is a real zlib deflate. */
case class PngSynth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_png_synth"

  override def nullSafeEval(input: Any): Any =
    PngSynth.synth(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.plans.PngSynth.synth($id)")

  override protected def withNewChildInternal(newChild: Expression): PngSynth =
    copy(child = newChild)
}

object PngSynth {
  def width(docId: Long): Long = 4 + Math.floorMod(docId, 13L)
  def height(docId: Long): Long = 3 + Math.floorMod(docId, 11L)

  /** Raw (unfiltered) byte i of the RGB stream. */
  def rawByte(docId: Long, i: Long): Int =
    Math.floorMod(docId * 31 + i * 7, 256L).toInt

  def synth(docId: Long): Array[Byte] = {
    val w = width(docId).toInt
    val h = height(docId).toInt
    val stride = w * 3
    // raw scanline stream with per-row filter bytes, filters applied
    val filtered = new Array[Byte](h * (1 + stride))
    val raw = new Array[Byte](h * stride)
    var i = 0
    while (i < raw.length) { raw(i) = rawByte(docId, i).toByte; i += 1 }
    var y = 0
    while (y < h) {
      val f = y % 5
      filtered(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= 3) raw(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) raw((y - 1) * stride + x - 3) & 0xff else 0
        val out = f match {
          case 0 => cur
          case 1 => (cur - left) & 0xff
          case 2 => (cur - up) & 0xff
          case 3 => (cur - ((left + up) >> 1)) & 0xff
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            (cur - pred) & 0xff
        }
        filtered(y * (1 + stride) + 1 + x) = out.toByte
        x += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream (real compression — the decoder
    // must run a real inflate, not a stored-block shortcut)
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    deflater.setInput(filtered)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream(z.length + 64)
    out.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    writeChunk(out, "IHDR", {
      val d = java.nio.ByteBuffer.allocate(13)
      d.putInt(w).putInt(h)
      d.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      d.array()
    })
    writeChunk(out, "IDAT", z)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val t = ctype.getBytes("US-ASCII")
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }
}
