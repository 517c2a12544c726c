package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL JPEG decode (r11) — the last rung of the multimodal decode
  * ladder (PCM WAV r9, zlib PNG r10, DIB AVI r10): baseline JFIF needs
  * no external codec either, just the spec's own machinery — marker
  * walk, DQT/DHT table parsing, canonical Huffman entropy decode of the
  * DC-difference + AC run-length stream, dequantization, an 8×8 integer
  * inverse DCT, and fixed-point YCbCr→RGB. All of it is deterministic
  * integer arithmetic (the IDCT uses 13-bit fixed-point constants, not
  * libm), so the decoded channel sums hash-match an arithmetic oracle.
  *
  * Same fused-expression rationale as [[PngPixelStats]]: the decoder IS
  * the container sniff (null for anything not a supported baseline
  * JPEG), one primitive-loop evaluation per row inside whole-stage
  * codegen.
  *
  * Output `[width, height, sum_r, sum_g, sum_b]` (array<bigint>),
  * matching the PNG rung's contract.
  *
  * Scope (validated, else null): baseline sequential DCT (SOF0 only),
  * 8-bit precision, 1 or 3 components, 1×1 sampling (4:4:4 — no chroma
  * subsampling), 8-bit quantization tables, optional restart intervals,
  * APPn/COM segments skipped by their self-counting lengths. Lossy
  * formats cannot be adjudicated against a source-pixel formula, so the
  * oracle corpus ([[JpegSynth]]) pins the QUANTIZED COEFFICIENTS
  * instead: DC-only blocks decode to exactly `dc + 128` under any
  * mathematically correct IDCT, making the full decode chain — Huffman,
  * differential DC, dequant, IDCT, color convert — bit-checkable.
  * General AC decoding (run lengths, ZRL, EOB) and the IDCT's AC path
  * are exercised by the coefficient round-trip and double-reference
  * ScalaTest instead. */
case class JpegPixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_pixels"

  override def nullSafeEval(input: Any): Any = {
    val stats = JpegPixelStats.decode(input.asInstanceOf[Array[Byte]])
    if (stats == null) null else new GenericArrayData(stats)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val stats = ctx.freshName("stats")
      s"""
         |long[] $stats = graft.plans.JpegPixelStats.decode($b);
         |if ($stats == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($stats);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegPixelStats =
    copy(child = newChild)
}

object JpegPixelStats {

  /** Zig-zag order: natural (row-major) index of the k-th transmitted
    * coefficient. Shared by the decoder (coefficient placement, DQT
    * de-zigzag) and [[JpegSynth]] (coefficient transmission), so the
    * two sides cannot disagree. */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman code assignment (spec C.2): (codeLength(sym),
    * code(sym)) pairs derived from the BITS/HUFFVAL form. Used by the
    * encoder; the decoder derives its mincode/maxcode/valptr tables
    * from the same BITS/HUFFVAL bytes it reads out of DHT. */
  private[graft] def canonicalCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    require(vals.length == bits.sum, "DHT bits/vals mismatch")
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(k) -> (l, code)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** Decoder-side canonical tables (spec F.2.2.3): for each code length
    * l, the smallest/largest code of that length and the HUFFVAL offset
    * of the smallest. maxcode = -1 where the length is unused. */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing. Returns -1 on
    * exhaustion or an unexpected marker (the caller nulls the decode). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff; pos += 1
          if (m != 0x00) return -1 // a marker mid-symbol: corrupt
          v = 0xff
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val bit = nextBit(); if (bit < 0) return Int.MinValue
        v = (v << 1) | bit; i += 1 }
      v
    }
    /** Drop to the next byte boundary (restart-marker alignment). */
    def align(): Unit = cnt = 0
  }

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = r.nextBit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16 && (t.maxcode(l) < 0 || code > t.maxcode(l))) {
      val bit = r.nextBit(); if (bit < 0) return -1
      code = (code << 1) | bit
      l += 1
    }
    if (l > 16) return -1
    t.vals(t.valptr(l) + code - t.mincode(l))
  }

  /** Spec F.2.2.1 EXTEND: map the t received magnitude bits to the
    * signed coefficient value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- integer inverse DCT (13-bit fixed point, islow-style) ---------------
  // The classic Loeffler/Ligtenberg/Moshovitz factorization in 13-bit
  // fixed point — the algorithm the spec's accuracy tests assume; all
  // constants are round(c · 2^13), no floating point anywhere, so the
  // output is identical on every platform. For a DC-only block the
  // whole transform reduces to round(dc/8) uniformly — the property the
  // oracle corpus leans on.
  private final val Fix0_298631336 = 2446
  private final val Fix0_390180644 = 3196
  private final val Fix0_541196100 = 4433
  private final val Fix0_765366865 = 6270
  private final val Fix0_899976223 = 7373
  private final val Fix1_175875602 = 9633
  private final val Fix1_501321110 = 12299
  private final val Fix1_847759065 = 15137
  private final val Fix1_961570560 = 16069
  private final val Fix2_053119869 = 16819
  private final val Fix2_562915447 = 20995
  private final val Fix3_072711026 = 25172
  private final val ConstBits = 13
  private final val Pass1Bits = 2

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** In-place 8×8 IDCT of dequantized coefficients (natural order);
    * output is the spatial sample + 128 level shift, clamped to 0..255.
    * Public within the package for the double-reference accuracy test. */
  private[graft] def idct8x8(c: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var col = 0
    while (col < 8) {
      if (c(8 + col) == 0 && c(16 + col) == 0 && c(24 + col) == 0 &&
          c(32 + col) == 0 && c(40 + col) == 0 && c(48 + col) == 0 &&
          c(56 + col) == 0) {
        val dc = c(col) << Pass1Bits
        var r = 0
        while (r < 8) { ws(r * 8 + col) = dc; r += 1 }
      } else {
        val z2 = c(16 + col).toLong; val z3 = c(48 + col).toLong
        var z1 = (z2 + z3) * Fix0_541196100
        val tmp2 = z1 + z3 * (-Fix1_847759065)
        val tmp3 = z1 + z2 * Fix0_765366865
        var tmp0 = (c(col).toLong + c(32 + col)) << ConstBits
        var tmp1 = (c(col).toLong - c(32 + col)) << ConstBits
        val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
        val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
        tmp0 = c(56 + col).toLong; tmp1 = c(40 + col).toLong
        val tmp2b = c(24 + col).toLong; val tmp3b = c(8 + col).toLong
        z1 = tmp0 + tmp3b; var z2b = tmp1 + tmp2b
        var z3b = tmp0 + tmp2b; var z4 = tmp1 + tmp3b
        var z5 = (z3b + z4) * Fix1_175875602
        var t0 = tmp0 * Fix0_298631336
        var t1 = tmp1 * Fix2_053119869
        var t2 = tmp2b * Fix3_072711026
        var t3 = tmp3b * Fix1_501321110
        z1 *= -Fix0_899976223
        z2b *= -Fix2_562915447
        z3b = z3b * (-Fix1_961570560) + z5
        z4 = z4 * (-Fix0_390180644) + z5
        t0 += z1 + z3b; t1 += z2b + z4; t2 += z2b + z3b; t3 += z1 + z4
        ws(col) = descale(tmp10 + t3, ConstBits - Pass1Bits)
        ws(56 + col) = descale(tmp10 - t3, ConstBits - Pass1Bits)
        ws(8 + col) = descale(tmp11 + t2, ConstBits - Pass1Bits)
        ws(48 + col) = descale(tmp11 - t2, ConstBits - Pass1Bits)
        ws(16 + col) = descale(tmp12 + t1, ConstBits - Pass1Bits)
        ws(40 + col) = descale(tmp12 - t1, ConstBits - Pass1Bits)
        ws(24 + col) = descale(tmp13 + t0, ConstBits - Pass1Bits)
        ws(32 + col) = descale(tmp13 - t0, ConstBits - Pass1Bits)
      }
      col += 1
    }
    // pass 2: rows
    var row = 0
    while (row < 8) {
      val o = row * 8
      val z2 = ws(o + 2).toLong; val z3 = ws(o + 6).toLong
      var z1 = (z2 + z3) * Fix0_541196100
      val tmp2 = z1 + z3 * (-Fix1_847759065)
      val tmp3 = z1 + z2 * Fix0_765366865
      var tmp0 = (ws(o).toLong + ws(o + 4)) << ConstBits
      var tmp1 = (ws(o).toLong - ws(o + 4)) << ConstBits
      val tmp10 = tmp0 + tmp3; val tmp13 = tmp0 - tmp3
      val tmp11 = tmp1 + tmp2; val tmp12 = tmp1 - tmp2
      tmp0 = ws(o + 7).toLong; tmp1 = ws(o + 5).toLong
      val tmp2b = ws(o + 3).toLong; val tmp3b = ws(o + 1).toLong
      z1 = tmp0 + tmp3b; var z2b = tmp1 + tmp2b
      var z3b = tmp0 + tmp2b; var z4 = tmp1 + tmp3b
      var z5 = (z3b + z4) * Fix1_175875602
      var t0 = tmp0 * Fix0_298631336
      var t1 = tmp1 * Fix2_053119869
      var t2 = tmp2b * Fix3_072711026
      var t3 = tmp3b * Fix1_501321110
      z1 *= -Fix0_899976223
      z2b *= -Fix2_562915447
      z3b = z3b * (-Fix1_961570560) + z5
      z4 = z4 * (-Fix0_390180644) + z5
      t0 += z1 + z3b; t1 += z2b + z4; t2 += z2b + z3b; t3 += z1 + z4
      def clamp(v: Int): Int = if (v < -128) 0 else if (v > 127) 255 else v + 128
      out(o) = clamp(descale(tmp10 + t3, ConstBits + Pass1Bits + 3))
      out(o + 7) = clamp(descale(tmp10 - t3, ConstBits + Pass1Bits + 3))
      out(o + 1) = clamp(descale(tmp11 + t2, ConstBits + Pass1Bits + 3))
      out(o + 6) = clamp(descale(tmp11 - t2, ConstBits + Pass1Bits + 3))
      out(o + 2) = clamp(descale(tmp12 + t1, ConstBits + Pass1Bits + 3))
      out(o + 5) = clamp(descale(tmp12 - t1, ConstBits + Pass1Bits + 3))
      out(o + 3) = clamp(descale(tmp13 + t0, ConstBits + Pass1Bits + 3))
      out(o + 4) = clamp(descale(tmp13 - t0, ConstBits + Pass1Bits + 3))
      row += 1
    }
  }

  // ---- fixed-point JFIF YCbCr → RGB -----------------------------------------
  // round(c · 2^16) constants; >> is arithmetic, so the rounding is
  // floor((x + 32768) / 65536) — the EXACT formula the oracle mirrors
  // (with a positive-bias trick in SQL, where // truncation must be
  // made floor-safe).
  private[graft] def ycc2rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbb = cb - 128; val crr = cr - 128
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    (cl(y + ((91881 * crr + 32768) >> 16)),
      cl(y - ((22554 * cbb + 46802 * crr + 32768) >> 16)),
      cl(y + ((116130 * cbb + 32768) >> 16)))
  }

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  /** `[width, height, sum_r, sum_g, sum_b]`, or null if `b` is not a
    * valid baseline 4:4:4 (or grayscale) 8-bit JFIF stream. Trailing
    * bytes after EOI are ignored. */
  def decode(b: Array[Byte]): Array[Long] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val qt = Array.ofDim[Int](4, 64) // natural order after de-zigzag
    val qtSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = -1; var h = -1; var nComp = 0
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var dri = 0
    var p = 2
    var sosAt = -1
    // ---- marker walk to SOS ----
    while (sosAt < 0) {
      if (p + 4 > b.length) return null
      if ((b(p) & 0xff) != 0xff) return null
      var m = b(p + 1) & 0xff
      p += 2
      while (m == 0xff) { if (p >= b.length) return null; m = b(p) & 0xff; p += 1 }
      if (m == 0xd9) return null // EOI before any scan
      if (p + 2 > b.length) return null // fill bytes may have eaten the length field
      val len = be16(b, p)
      if (len < 2 || p + len > b.length) return null
      val seg = p + 2; val segEnd = p + len
      m match {
        case 0xdb => // DQT: one or more tables
          var q = seg
          while (q < segEnd) {
            val pq = (b(q) & 0xf0) >> 4; val tq = b(q) & 0x0f
            if (pq != 0 || tq > 3 || q + 65 > segEnd) return null // 8-bit only
            var k = 0
            while (k < 64) { qt(tq)(Zigzag(k)) = b(q + 1 + k) & 0xff; k += 1 }
            qtSeen(tq) = true
            q += 65
          }
        case 0xc4 => // DHT: one or more tables
          var q = seg
          while (q < segEnd) {
            if (q + 17 > segEnd) return null
            val tc = (b(q) & 0xf0) >> 4; val th = b(q) & 0x0f
            if (tc > 1 || th > 3) return null
            val bits = new Array[Int](16)
            var n = 0
            var i = 0
            while (i < 16) { bits(i) = b(q + 1 + i) & 0xff; n += bits(i); i += 1 }
            if (q + 17 + n > segEnd || n > 256) return null
            val vals = new Array[Int](n)
            i = 0
            while (i < n) { vals(i) = b(q + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            q += 17 + n
          }
        case 0xc0 => // SOF0 — baseline; any other SOFn is out of scope
          if (segEnd - seg < 6) return null
          if ((b(seg) & 0xff) != 8) return null
          h = be16(b, seg + 1); w = be16(b, seg + 3)
          nComp = b(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 12) || h > (1 << 12)) return null
          if (nComp != 1 && nComp != 3) return null
          if (segEnd - seg < 6 + 3 * nComp) return null
          var ci = 0
          while (ci < nComp) {
            val o = seg + 6 + 3 * ci
            if ((b(o + 1) & 0xff) != 0x11) return null // 1×1 sampling only
            compQ(ci) = b(o + 2) & 0x0f
            if (compQ(ci) > 3) return null // Tq is 0–3; qt has 4 slots
            ci += 1
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return null // non-baseline SOF
        case 0xdd => // DRI
          if (segEnd - seg < 2) return null
          dri = be16(b, seg)
        case 0xda => // SOS
          if (w < 0) return null
          if (segEnd - seg < 1) return null // need at least the Ns byte
          val ns = b(seg) & 0xff
          if (ns != nComp || segEnd - seg < 1 + 2 * ns + 3) return null
          var ci = 0
          while (ci < ns) {
            compDc(ci) = (b(seg + 2 + 2 * ci) & 0xf0) >> 4
            compAc(ci) = b(seg + 2 + 2 * ci) & 0x0f
            // table ids are 0–3 (the table arrays have 4 slots); a
            // crafted nibble above 3 must reject, not index OOB
            if (compDc(ci) > 3 || compAc(ci) > 3) return null
            ci += 1
          }
          // Ss=0, Se=63, AhAl=0 for baseline
          val o = seg + 1 + 2 * ns
          if ((b(o) & 0xff) != 0 || (b(o + 1) & 0xff) != 63 ||
            (b(o + 2) & 0xff) != 0) return null
          sosAt = segEnd
        case mm if mm >= 0xe0 && mm <= 0xef => () // APPn: skip
        case 0xfe => () // COM: skip
        case _ => return null
      }
      if (sosAt < 0) p = segEnd
    }
    // table presence for every scan component
    var ci = 0
    while (ci < nComp) {
      if (!qtSeen(compQ(ci)) || dcTables(compDc(ci)) == null ||
        acTables(compAc(ci)) == null) return null
      ci += 1
    }
    // ---- entropy decode: 4:4:4 ⇒ one block per component per MCU ----
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val nMcu = bw * bh
    val planes = Array.ofDim[Byte](nComp, bw * 8 * bh * 8)
    val pred = new Array[Int](3)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var r = new BitReader(b, sosAt)
    var mcu = 0
    while (mcu < nMcu) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        // expect RSTn at a byte boundary; reset DC predictors. The
        // 1-bit padding before the marker can itself be a stuffed
        // FF 00 byte (all-ones padding) — skip stuffed pairs first
        r.align()
        var rp = r.pos
        while (rp + 1 < b.length && (b(rp) & 0xff) == 0xff &&
          (b(rp + 1) & 0xff) == 0x00) rp += 2
        if (rp + 2 > b.length || (b(rp) & 0xff) != 0xff ||
          ((b(rp + 1) & 0xff) & 0xf8) != 0xd0) return null
        r = new BitReader(b, rp + 2)
        pred(0) = 0; pred(1) = 0; pred(2) = 0
      }
      val bx = mcu % bw; val by = mcu / bw
      ci = 0
      while (ci < nComp) {
        java.util.Arrays.fill(coef, 0)
        val t = huffDecode(r, dcTables(compDc(ci)))
        if (t < 0 || t > 15) return null
        val dv = r.receive(t)
        if (dv == Int.MinValue) return null
        pred(ci) += extend(dv, t)
        coef(0) = pred(ci) * qt(compQ(ci))(0)
        var k = 1
        var eob = false
        while (k <= 63 && !eob) {
          val rs = huffDecode(r, acTables(compAc(ci)))
          if (rs < 0) return null
          val run = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            if (k > 63) return null
            val av = r.receive(s)
            if (av == Int.MinValue) return null
            coef(Zigzag(k)) = extend(av, s) * qt(compQ(ci))(Zigzag(k))
            k += 1
          }
        }
        idct8x8(coef, pix)
        // place the block into the padded component plane
        val plane = planes(ci)
        val rowW = bw * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((by * 8 + yy) * rowW + bx * 8 + xx) = pix(yy * 8 + xx).toByte
            xx += 1
          }
          yy += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // ---- color convert + sum over the VISIBLE (cropped) pixels ----
    var sr = 0L; var sg = 0L; var sb = 0L
    val rowW = bw * 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * rowW + x
        if (nComp == 3) {
          val (rr, gg, bb2) = ycc2rgb(planes(0)(o) & 0xff,
            planes(1)(o) & 0xff, planes(2)(o) & 0xff)
          sr += rr; sg += gg; sb += bb2
        } else {
          val v = planes(0)(o) & 0xff
          sr += v; sg += v; sb += v
        }
        x += 1
      }
      y += 1
    }
    Array(w.toLong, h.toLong, sr, sg, sb)
  }
}

/** Deterministic baseline JFIF for the media lake's JPEG arm — the
  * `graft_png_synth` idea applied to a LOSSY codec: lossy formats cannot
  * be adjudicated against source pixels, so the synthesis pins the
  * QUANTIZED COEFFICIENTS instead. Each 8×8 block of each component
  * carries a single DC coefficient `dc(c, k) = (doc_id·13 + c·29 + k·7)
  * % 128 − 64` (k = raster block index) and no AC — and a DC-only block
  * decodes to exactly `dc + 128` under any mathematically correct IDCT
  * (luma quant table value 8 at position 0 cancels the transform's /8),
  * so an oracle can re-derive every decoded pixel, the fixed-point
  * color conversion, and the channel sums arithmetically.
  *
  * Everything else is REAL encoder machinery the decoder must undo:
  * canonical Huffman codes derived from the spec's Annex-K-style
  * BITS/HUFFVAL tables (transmitted in DHT, so encoder and decoder can
  * never disagree), differential DC coding with category + magnitude
  * bits, EOB-coded empty AC runs, 0xFF byte stuffing, a variable-length
  * COM segment before SOF0 (fixed offsets cannot work), 4:4:4 sampling
  * with distinct luma/chroma quantization tables, and edge blocks that
  * overhang the image (width/height are NOT multiples of 8 for most
  * doc_ids — the decoder must crop). Geometry: width = 9 + doc_id % 24,
  * height = 8 + doc_id % 17. */
case class JpegSynth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_jpeg_synth"

  override def nullSafeEval(input: Any): Any =
    JpegSynth.synth(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.plans.JpegSynth.synth($id)")

  override protected def withNewChildInternal(newChild: Expression): JpegSynth =
    copy(child = newChild)
}

object JpegSynth {
  def width(docId: Long): Int = 9 + Math.floorMod(docId, 24L).toInt
  def height(docId: Long): Int = 8 + Math.floorMod(docId, 17L).toInt

  /** DC coefficient of component c's k-th block (raster order). */
  def dcCoef(docId: Long, c: Int, k: Int): Int =
    Math.floorMod(docId * 13 + c * 29 + k * 7, 128L).toInt - 64

  // Standard-shape Huffman tables (the Annex K BITS/HUFFVAL layout) —
  // transmitted in DHT, so their exact contents are a self-consistent
  // choice, not an interop constraint. DC tables code categories 0..11;
  // the AC tables carry the full 162-symbol run/size alphabet so the
  // decoder's canonical-table construction is exercised across lengths
  // 2..16, even though this encoder only ever emits EOB.
  private[graft] val DcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[graft] val DcVals = (0 to 11).toArray
  private[graft] val DcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private[graft] val AcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[graft] val AcVals: Array[Int] = {
    // run/size alphabet in the standard transmission order: the 57
    // short-code symbols first (EOB, ZRL and the common low-run/
    // low-size pairs interleaved per the Annex K sequence), then the
    // length-16 block in ascending run-major order — runs 4..8 carry
    // sizes 3..10, runs 9..13 sizes 2..10, runs 14..15 sizes 1..10;
    // 57 + 40 + 45 + 20 = 162 = sum(AcBits)
    val first = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a)
    val long16 =
      (4 to 8).flatMap(hi => (3 to 10).map(lo => (hi << 4) | lo)) ++
        (9 to 13).flatMap(hi => (2 to 10).map(lo => (hi << 4) | lo)) ++
        (14 to 15).flatMap(hi => (1 to 10).map(lo => (hi << 4) | lo))
    (first ++ long16).toArray
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (cnt > 0) put(0xff, 8 - cnt)
  }

  def synth(docId: Long): Array[Byte] = {
    val w = width(docId); val h = height(docId)
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream(1024)
    def b16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }

    marker(0xd8) // SOI
    // APP0 JFIF
    marker(0xe0); b16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0) // v1.1, no density units
    b16(1); b16(1); out.write(0); out.write(0)
    // variable-length COM so fixed offsets cannot work
    val comLen = (2 + Math.floorMod(docId, 7L)).toInt
    marker(0xfe); b16(2 + comLen)
    var i = 0
    while (i < comLen) { out.write('J'); i += 1 }
    // DQT: luma table 0 (q[0] = 8 — cancels the IDCT's /8 exactly) and
    // chroma table 1, transmitted in zigzag order
    val qLuma = Array.tabulate(64)(i => if (i == 0) 8 else 16 + i)
    val qChroma = Array.tabulate(64)(i => if (i == 0) 8 else 17 + i)
    marker(0xdb); b16(2 + 65 * 2)
    out.write(0x00)
    i = 0
    while (i < 64) { out.write(qLuma(JpegPixelStats.Zigzag(i))); i += 1 }
    out.write(0x01)
    i = 0
    while (i < 64) { out.write(qChroma(JpegPixelStats.Zigzag(i))); i += 1 }
    // SOF0: 8-bit, 3 components, 1×1 sampling, luma/chroma/chroma quant
    marker(0xc0); b16(8 + 3 * 3)
    out.write(8); b16(h); b16(w); out.write(3)
    out.write(1); out.write(0x11); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    // DHT: DC luma/chroma + one shared AC table registered at both slots
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); b16(2 + 1 + 16 + vals.length)
      out.write(tcTh)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0x00, DcLumaBits, DcVals)
    dht(0x01, DcChromaBits, DcVals)
    dht(0x10, AcBits, AcVals)
    dht(0x11, AcBits, AcVals)
    // SOS
    marker(0xda); b16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00) // Y: DC0/AC0
    out.write(2); out.write(0x11) // Cb: DC1/AC1
    out.write(3); out.write(0x11) // Cr: DC1/AC1
    out.write(0); out.write(63); out.write(0)
    // entropy-coded DC-only MCUs
    val dcLu = JpegPixelStats.canonicalCodes(DcLumaBits, DcVals)
    val dcCh = JpegPixelStats.canonicalCodes(DcChromaBits, DcVals)
    val ac = JpegPixelStats.canonicalCodes(AcBits, AcVals)
    val eob = ac(0x00)
    val bw2 = new BitWriter(out)
    val pred = new Array[Int](3)
    var k = 0
    while (k < bw * bh) {
      var c = 0
      while (c < 3) {
        val dc = dcCoef(docId, c, k)
        val diff = dc - pred(c)
        pred(c) = dc
        // category = number of magnitude bits
        var t = 0; var ad = math.abs(diff)
        while (ad > 0) { t += 1; ad >>= 1 }
        val (dl, dcode) = (if (c == 0) dcLu else dcCh)(t)
        bw2.put(dcode, dl)
        if (t > 0)
          bw2.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        bw2.put(eob._2, eob._1) // empty AC run
        c += 1
      }
      k += 1
    }
    bw2.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
