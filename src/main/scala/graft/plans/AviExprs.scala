package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL video decode (r10) — the video rung of the multimodal decode
  * ladder. MP4's codecs (H.264 et al.) genuinely need external
  * libraries, but video-in-a-container does not imply inter-frame
  * compression: the AVI/DIB form (RIFF `AVI ` + `movi` list of `00db`
  * device-independent-bitmap frames) stores each frame as raw 24-bit
  * pixels, so a complete frame decode — container walk, stream-header
  * validation, per-frame pixel extraction — needs no codec at all,
  * exactly the reasoning that graduated audio via 16-bit PCM WAV
  * (`graft_wav_pcm`, reference container tier at
  * flink-repository-analytics/.../README.md:45-56's ingest framing)
  * and images via zlib PNG (`graft_png_pixels`).
  *
  * Same fused-expression rationale as [[PngPixelStats]]: the decoder
  * IS the container sniff (null for anything not a supported AVI), one
  * primitive-loop evaluation per row inside whole-stage codegen.
  *
  * Two format semantics make a shortcut decoder hash-mismatch:
  * DIB rows are BGR (channel = 2 − k%3 in RGB terms), and every row is
  * padded to a DWORD boundary — pad bytes are present in the chunk and
  * in the synthesis byte stream but MUST NOT enter the channel sums.
  *
  * Output: one struct per frame
  * `(frame_idx, width, height, sum_r, sum_g, sum_b)` — exact integers
  * (a channel byte ≤ 255), so rows hash-match a DuckDB oracle that
  * re-derives the sums from the synthesis formula without touching
  * bytes.
  *
  * Scope (validated, else null): RIFF/`AVI ` form, `hdrl` list whose
  * `avih` and `strf` (BITMAPINFOHEADER, 24-bit BI_RGB) agree on
  * dimensions, `movi` list whose `00db` chunk count equals
  * `dwTotalFrames` and whose every chunk is exactly height × stride
  * bytes. Unknown chunks (JUNK, idx1, non-video streams) are walked
  * over by size, never assumed absent. */
case class AviFrameStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frames"

  override def nullSafeEval(input: Any): Any =
    AviFrameStats.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val res = ctx.freshName("frames")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.AviFrameStats.decode($b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviFrameStats =
    copy(child = newChild)
}

object AviFrameStats {
  private[plans] def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private[plans] def fourCC(b: Array[Byte], p: Int, s: String): Boolean =
    b(p) == s.charAt(0).toByte && b(p + 1) == s.charAt(1).toByte &&
      b(p + 2) == s.charAt(2).toByte && b(p + 3) == s.charAt(3).toByte

  /** Validated header facts both AVI consumers ([[decode]]'s stats pass
    * and [[AviDemux]]'s frame extraction) need: geometry, frame count,
    * the avih frame period, and the movi extent. */
  private[plans] final case class Header(w: Long, h: Long, nf: Long,
      usPerFrame: Long, moviOff: Long, moviEnd: Long, frameBytes: Long)

  /** Pass 1 — top-level walk to the hdrl LIST, read + cross-validate
    * avih and strf; null for anything not a supported 24-bit DIB AVI. */
  private[plans] def parseHeader(b: Array[Byte]): Header = {
    if (b.length < 24 || !fourCC(b, 0, "RIFF") || !fourCC(b, 8, "AVI ")) return null
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4))
    var w = -1L; var h = -1L; var totalFrames = -1L; var usPerFrame = 0L
    var strfW = -2L; var strfH = -2L; var bitCount = -1L; var compression = -1L
    var moviOff = -1L; var moviEnd = -1L
    var p = 12L
    while (p + 8 <= riffEnd) {
      val size = le32(b, p.toInt + 4)
      val dataEnd = p + 8 + size
      if (dataEnd > riffEnd) return null
      if (fourCC(b, p.toInt, "LIST") && size >= 4) {
        if (fourCC(b, p.toInt + 8, "hdrl")) {
          // walk the hdrl children: avih, strl LIST (containing strh/strf)
          var q = p + 12
          while (q + 8 <= dataEnd) {
            val csz = le32(b, q.toInt + 4)
            val cEnd = q + 8 + csz
            if (cEnd > dataEnd) return null
            if (fourCC(b, q.toInt, "avih") && csz >= 56) {
              usPerFrame = le32(b, q.toInt + 8)
              totalFrames = le32(b, q.toInt + 8 + 16)
              w = le32(b, q.toInt + 8 + 32)
              h = le32(b, q.toInt + 8 + 36)
            } else if (fourCC(b, q.toInt, "LIST") && csz >= 4 &&
                fourCC(b, q.toInt + 8, "strl")) {
              var r = q + 12
              while (r + 8 <= cEnd) {
                val ssz = le32(b, r.toInt + 4)
                if (r + 8 + ssz > cEnd) return null
                if (fourCC(b, r.toInt, "strf") && ssz >= 40) {
                  // BITMAPINFOHEADER: biWidth +4, biHeight +8,
                  // biBitCount +14 (16-bit), biCompression +16
                  strfW = le32(b, r.toInt + 8 + 4)
                  strfH = le32(b, r.toInt + 8 + 8)
                  bitCount = (b(r.toInt + 8 + 14) & 0xffL) |
                    ((b(r.toInt + 8 + 15) & 0xffL) << 8)
                  compression = le32(b, r.toInt + 8 + 16)
                }
                r += 8 + ssz + (ssz & 1)
              }
            }
            q += 8 + csz + (csz & 1)
          }
        } else if (fourCC(b, p.toInt + 8, "movi")) {
          moviOff = p + 12; moviEnd = dataEnd
        }
      }
      p += 8 + size + (size & 1)
    }
    // bound each dimension BEFORE the stride/frameBytes arithmetic: w,h
    // come from le32 (up to 2^32-1) and h*stride wraps Long for crafted
    // headers, so the frameBytes <= Int.MaxValue check alone would pass
    // a small-positive wrap
    if (w <= 0 || h <= 0 || w > (1L << 16) || h > (1L << 16) ||
      totalFrames < 0 || moviOff < 0) return null
    // header consistency: the stream format must agree with the main
    // header and declare uncompressed 24-bit pixels (BI_RGB = 0)
    if (strfW != w || strfH != h || bitCount != 24 || compression != 0L) return null
    val stride = (w * 3 + 3) & ~3L
    val frameBytes = h * stride
    if (frameBytes <= 0 || frameBytes > Int.MaxValue) return null
    Header(w, h, totalFrames, usPerFrame, moviOff, moviEnd, frameBytes)
  }

  /** Decode a DIB-frame AVI to per-frame channel sums; null for
    * anything that is not a structurally valid 24-bit `00db` AVI. */
  def decode(b: Array[Byte]): GenericArrayData = {
    val hd = parseHeader(b)
    if (hd == null) return null
    val w = hd.w; val h = hd.h
    val stride = (w * 3 + 3) & ~3L
    // ---- pass 2: movi walk — every 00db chunk is one frame
    val rows = new java.util.ArrayList[InternalRow]()
    var q = hd.moviOff
    var idx = 0L
    while (q + 8 <= hd.moviEnd) {
      val csz = le32(b, q.toInt + 4)
      if (q + 8 + csz > hd.moviEnd) return null
      if (fourCC(b, q.toInt, "00db")) {
        if (csz != hd.frameBytes) return null
        var sB = 0L; var sG = 0L; var sR = 0L
        val base = (q + 8).toInt
        var y = 0
        while (y < h) {
          val row = base + (y * stride).toInt
          var k = 0
          val pix = (w * 3).toInt
          // DIB pixel order is B,G,R; bytes k in [3w, stride) are the
          // DWORD pad and never enter the sums
          while (k < pix) {
            sB += b(row + k) & 0xff
            sG += b(row + k + 1) & 0xff
            sR += b(row + k + 2) & 0xff
            k += 3
          }
          y += 1
        }
        rows.add(new GenericInternalRow(Array[Any](idx, w, h, sR, sG, sB)))
        idx += 1
      }
      q += 8 + csz + (csz & 1)
    }
    if (idx != hd.nf) return null
    new GenericArrayData(rows.toArray.asInstanceOf[Array[Any]])
  }
}

/** REAL frame demux (r11) — the extraction twin of [[AviFrameStats]]:
  * instead of reducing frames to channel sums, emit every `every`-th
  * frame's RAW DIB BYTES with its EXACT presentation time — what a
  * vision-training pipeline feeds downstream (resize / embed / filter),
  * retiring the even-byte-slice frameSample stub for the AVI arm. Same
  * validated header walk (shared [[AviFrameStats.parseHeader]]), same
  * decoder-is-the-sniff contract: null for anything not a supported
  * 24-bit DIB AVI, so the router needs no separate container predicate.
  *
  * `pts_us` is the exact integer `frame_idx · dwMicroSecPerFrame`
  * (avih's frame period) — no float division in the contract, so the
  * demux output is oracle-hashable end to end. */
case class AviDemux(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, int) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("pts_us", LongType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_demux"

  override def nullSafeEval(bytes: Any, every: Any): Any =
    AviDemux.demux(bytes.asInstanceOf[Array[Byte]], every.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, e) => {
      val res = ctx.freshName("demux")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.AviDemux.demux($b, $e);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AviDemux = copy(left = newLeft, right = newRight)
}

object AviDemux {
  import AviFrameStats.{fourCC, le32, parseHeader}

  /** Extract every `every`-th DIB frame (raw bytes, exact pts); null for
    * non-AVI input or a non-positive `every`. */
  def demux(b: Array[Byte], every: Int): GenericArrayData = {
    if (every <= 0) return null
    val hd = parseHeader(b)
    if (hd == null) return null
    val rows = new java.util.ArrayList[InternalRow]()
    var q = hd.moviOff
    var idx = 0L
    while (q + 8 <= hd.moviEnd) {
      val csz = le32(b, q.toInt + 4)
      if (q + 8 + csz > hd.moviEnd) return null
      if (fourCC(b, q.toInt, "00db")) {
        if (csz != hd.frameBytes) return null
        if (idx % every == 0) {
          val frame = java.util.Arrays.copyOfRange(b, (q + 8).toInt,
            (q + 8 + csz).toInt)
          rows.add(new GenericInternalRow(Array[Any](idx, idx * hd.usPerFrame, frame)))
        }
        idx += 1
      }
      q += 8 + csz + (csz & 1)
    }
    if (idx != hd.nf) return null
    new GenericArrayData(rows.toArray.asInstanceOf[Array[Any]])
  }
}

/** Deterministic DIB-frame AVI for the media lake's video arm — the
  * `graft_png_synth` idea applied to video: a complete, structurally
  * valid RIFF file (every size field accounts for exactly the bytes
  * present) whose stored frame byte j of frame f is
  * `(doc_id·37 + f·11 + j·5) % 256`, so an oracle can re-derive every
  * channel sum arithmetically. Geometry: width = 4 + doc_id % 9,
  * height = 3 + doc_id % 7, frames = 2 + doc_id % 5 — widths hit every
  * residue mod 4, so the DWORD row padding is present in most rows and
  * absent in some (a decoder that always or never skips pad bytes
  * cannot match). A variable-length JUNK chunk (2 + doc_id % 9 bytes)
  * sits between hdrl and movi so fixed offsets cannot work, and the
  * strl/strf stream header is complete and consistent so the decoder's
  * cross-validation has something real to check. */
case class AviSynth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_avi_synth"

  override def nullSafeEval(input: Any): Any =
    AviSynth.synth(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.plans.AviSynth.synth($id)")

  override protected def withNewChildInternal(newChild: Expression): AviSynth =
    copy(child = newChild)
}

object AviSynth {
  def width(docId: Long): Long = 4 + Math.floorMod(docId, 9L)
  def height(docId: Long): Long = 3 + Math.floorMod(docId, 7L)
  def frames(docId: Long): Long = 2 + Math.floorMod(docId, 5L)

  /** Stored byte j (pad bytes included) of frame f. */
  def storedByte(docId: Long, f: Long, j: Long): Int =
    Math.floorMod(docId * 37 + f * 11 + j * 5, 256L).toInt

  def synth(docId: Long): Array[Byte] = {
    val w = width(docId).toInt
    val h = height(docId).toInt
    val nf = frames(docId).toInt
    val stride = (w * 3 + 3) & ~3
    val frameBytes = h * stride
    val out = new java.io.ByteArrayOutputStream(256 + nf * (8 + frameBytes))

    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    }

    // avih main header (56 bytes)
    def avih(): Unit = {
      cc("avih"); le32(56)
      le32(33333 + Math.floorMod(docId, 3L) * 8334) // dwMicroSecPerFrame
      le32(frameBytes.toLong * 30)                  // dwMaxBytesPerSec
      le32(0); le32(0)                              // padding, flags
      le32(nf); le32(0); le32(1)                    // totalFrames, initial, streams
      le32(frameBytes)                              // suggested buffer
      le32(w); le32(h)
      le32(0); le32(0); le32(0); le32(0)            // reserved
    }
    // strl list: strh (56) + strf BITMAPINFOHEADER (40)
    def strl(): Unit = {
      cc("LIST"); le32(4 + 8 + 56 + 8 + 40); cc("strl")
      cc("strh"); le32(56)
      cc("vids"); cc("DIB ")                        // fccType, fccHandler
      le32(0); le16(0); le16(0); le32(0)            // flags, prio, lang, initial
      le32(1); le32(30)                             // scale, rate (30 fps)
      le32(0); le32(nf)                             // start, length
      le32(frameBytes); le32(0xffffffffL); le32(0)  // bufsize, quality, sampleSize
      le16(0); le16(0); le16(w); le16(h)            // rcFrame
      cc("strf"); le32(40)
      le32(40); le32(w); le32(h)                    // biSize, biWidth, biHeight
      le16(1); le16(24)                             // biPlanes, biBitCount
      le32(0)                                       // biCompression = BI_RGB
      le32(frameBytes); le32(0); le32(0); le32(0); le32(0)
    }

    val hdrlSize = 4 + (8 + 56) + (8 + (4 + 8 + 56 + 8 + 40))
    val junkLen = (2 + Math.floorMod(docId, 9L)).toInt
    val junkPad = junkLen & 1
    val moviSize = 4 + nf * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + junkLen + junkPad) + (8 + moviSize)

    cc("RIFF"); le32(riffSize); cc("AVI ")
    cc("LIST"); le32(hdrlSize); cc("hdrl")
    avih(); strl()
    cc("JUNK"); le32(junkLen)
    var i = 0
    while (i < junkLen + junkPad) { out.write(0x4a); i += 1 }
    cc("LIST"); le32(moviSize); cc("movi")
    var f = 0
    while (f < nf) {
      cc("00db"); le32(frameBytes)
      var j = 0
      while (j < frameBytes) { out.write(storedByte(docId, f, j)); j += 1 }
      f += 1
    }
    out.toByteArray
  }
}
