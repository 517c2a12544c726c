package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL MP4 sample demux (r12) — the ISO-BMFF twin of [[AviDemux]],
  * closing the last fake arm of the frame-extraction router: MP4's
  * VIDEO CODECS (H.264 et al.) genuinely need external libraries, but
  * SAMPLE EXTRACTION does not touch the codec at all — the container's
  * sample tables (`stts` decode times, `stsc` sample→chunk runs, `stsz`
  * sizes, `stco` chunk offsets) fully determine every sample's byte
  * range and exact presentation time, which is precisely what a
  * training pipeline hands to a downstream decoder/embedder. Same
  * reasoning that graduated AVI in r11: extraction is box arithmetic,
  * and pretending it needs a codec was the stub's lie.
  *
  * Accepted profile (validated, else null — the decoder IS the sniff):
  * leading `ftyp`, one `moov` whose single video `trak` (hdlr `vide`)
  * carries version-0 `mdhd`/`stts`/`stsc`/`stsz`/`stco`, one `mdat`;
  * the tables must agree (stts total == stsz count, stsc runs strictly
  * increasing first_chunk starting at 1, every sample range inside the
  * mdat payload). Box sizes must nest exactly — the walk trusts no
  * fixed offsets (the synth plants a variable-length `free` box to
  * make that cheat impossible).
  *
  * `pts_us` is floor(cumulativeTicks · 1_000_000 / mdhd timescale) —
  * exact integer arithmetic, so the demux output is oracle-hashable
  * end to end, like [[AviDemux]]'s `frame_idx · dwMicroSecPerFrame`.
  * Cumulative ticks come from walking the stts runs, so a
  * constant-frame-rate shortcut cannot hash-match (the synth uses two
  * runs with different deltas).
  */
case class Mp4Demux(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_mp4_demux"

  override def nullSafeEval(bytes: Any, every: Any): Any =
    Mp4Demux.demux(bytes.asInstanceOf[Array[Byte]], every.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, e) => {
      val res = ctx.freshName("mp4demux")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.plans.Mp4Demux.demux($b, $e);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Mp4Demux = copy(left = newLeft, right = newRight)
}

object Mp4Demux {
  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def box(b: Array[Byte], p: Int, s: String): Boolean =
    b(p) == s.charAt(0).toByte && b(p + 1) == s.charAt(1).toByte &&
      b(p + 2) == s.charAt(2).toByte && b(p + 3) == s.charAt(3).toByte

  /** Find child box `t` scanning [from, end); -1 if absent/ill-nested.
    * Every size field must account for bytes actually present. */
  private def findBox(b: Array[Byte], from: Long, end: Long, t: String): Long = {
    var p = from
    while (p + 8 <= end) {
      val sz = be32(b, p.toInt)
      if (sz < 8 || p + sz > end) return -1
      if (box(b, p.toInt + 4, t)) return p
      p += sz
    }
    -1
  }

  /** Extract every `every`-th sample (raw bytes, exact floor-µs pts);
    * null for anything outside the accepted ISO-BMFF profile or a
    * non-positive `every`. */
  def demux(b: Array[Byte], every: Int): GenericArrayData = {
    if (every <= 0) return null
    if (b.length < 16 || be32(b, 0) < 16 || !box(b, 4, "ftyp")) return null
    val fileEnd = b.length.toLong
    val moov = findBox(b, 0, fileEnd, "moov")
    val mdat = findBox(b, 0, fileEnd, "mdat")
    if (moov < 0 || mdat < 0) return null
    val moovEnd = moov + be32(b, moov.toInt)
    val mdatLo = mdat + 8
    val mdatHi = mdat + be32(b, mdat.toInt)
    val trak = findBox(b, moov + 8, moovEnd, "trak")
    if (trak < 0) return null
    val trakEnd = trak + be32(b, trak.toInt)
    val mdia = findBox(b, trak + 8, trakEnd, "mdia")
    if (mdia < 0) return null
    val mdiaEnd = mdia + be32(b, mdia.toInt)
    // mdhd v0: ver/flags(4) c/mtime(8) timescale(4) duration(4) — the
    // spec says SAMPLE times tick in the MEDIA header's timescale
    val mdhd = findBox(b, mdia + 8, mdiaEnd, "mdhd")
    if (mdhd < 0 || be32(b, mdhd.toInt) < 32 || (b(mdhd.toInt + 8) & 0xff) != 0)
      return null
    val timescale = be32(b, mdhd.toInt + 20)
    if (timescale <= 0) return null
    // hdlr: this walker only accepts a VIDEO track (handler 'vide')
    val hdlr = findBox(b, mdia + 8, mdiaEnd, "hdlr")
    if (hdlr < 0 || be32(b, hdlr.toInt) < 24 || !box(b, hdlr.toInt + 16, "vide"))
      return null
    val minf = findBox(b, mdia + 8, mdiaEnd, "minf")
    if (minf < 0) return null
    val stbl = findBox(b, minf + 8, minf + be32(b, minf.toInt), "stbl")
    if (stbl < 0) return null
    val stblEnd = stbl + be32(b, stbl.toInt)

    def fullBox(t: String, minBody: Long): Long = {
      val p = findBox(b, stbl + 8, stblEnd, t)
      if (p < 0 || be32(b, p.toInt) < 12 + minBody || (b(p.toInt + 8) & 0xff) != 0)
        -1
      else p
    }
    // ---- stsz: per-sample sizes (fixed-size form allowed) ----
    val stsz = fullBox("stsz", 8)
    if (stsz < 0) return null
    val fixedSz = be32(b, stsz.toInt + 12)
    val ns = be32(b, stsz.toInt + 16)
    if (ns <= 0 || ns > (1 << 20)) return null
    if (fixedSz == 0 && be32(b, stsz.toInt) < 20 + 4 * ns) return null
    val sizes = new Array[Long](ns.toInt)
    var i = 0
    while (i < ns) {
      sizes(i) = if (fixedSz > 0) fixedSz else be32(b, stsz.toInt + 20 + 4 * i)
      if (sizes(i) <= 0 || sizes(i) > Int.MaxValue) return null
      i += 1
    }
    // ---- stts: decode-time runs; Σcounts must equal the sample count ----
    val stts = fullBox("stts", 4)
    if (stts < 0) return null
    val nRuns = be32(b, stts.toInt + 12)
    if (nRuns <= 0 || be32(b, stts.toInt) < 16 + 8 * nRuns) return null
    val runCount = new Array[Long](nRuns.toInt)
    val runDelta = new Array[Long](nRuns.toInt)
    var total = 0L
    i = 0
    while (i < nRuns) {
      runCount(i) = be32(b, stts.toInt + 16 + 8 * i)
      runDelta(i) = be32(b, stts.toInt + 20 + 8 * i)
      if (runCount(i) <= 0 || runDelta(i) < 0) return null
      total += runCount(i)
      i += 1
    }
    if (total != ns) return null
    // ---- stsc: sample→chunk runs (first_chunk strictly increasing from 1) ----
    val stsc = fullBox("stsc", 4)
    if (stsc < 0) return null
    val nScRuns = be32(b, stsc.toInt + 12)
    if (nScRuns <= 0 || be32(b, stsc.toInt) < 16 + 12 * nScRuns) return null
    val scFirst = new Array[Long](nScRuns.toInt)
    val scPer = new Array[Long](nScRuns.toInt)
    i = 0
    while (i < nScRuns) {
      scFirst(i) = be32(b, stsc.toInt + 16 + 12 * i)
      scPer(i) = be32(b, stsc.toInt + 20 + 12 * i)
      if (scPer(i) <= 0 || scFirst(i) < 1 ||
        (i > 0 && scFirst(i) <= scFirst(i - 1))) return null
      i += 1
    }
    if (scFirst(0) != 1) return null
    // ---- stco: chunk offsets (absolute file offsets) ----
    val stco = fullBox("stco", 4)
    if (stco < 0) return null
    val nChunks = be32(b, stco.toInt + 12)
    if (nChunks <= 0 || be32(b, stco.toInt) < 16 + 4 * nChunks) return null
    val chunkOff = new Array[Long](nChunks.toInt)
    i = 0
    while (i < nChunks) { chunkOff(i) = be32(b, stco.toInt + 16 + 4 * i); i += 1 }

    // ---- walk samples in order: chunk mapping + sizes → byte ranges,
    //      stts runs → exact tick times; every range must sit in mdat ----
    val rows = new java.util.ArrayList[InternalRow]()
    var sample = 0L
    var ticks = 0L
    var run = 0; var inRun = 0L     // stts cursor
    var scRun = 0                   // stsc cursor
    var chunk = 0                   // 0-based chunk index
    var within = 0L                 // sample index within current chunk
    var off = if (nChunks > 0) chunkOff(0) else -1L
    while (sample < ns) {
      if (chunk >= nChunks) return null
      val perThisChunk =
        scPer(scRun) // samples per chunk for the run covering `chunk`
      val sz = sizes(sample.toInt)
      if (off < mdatLo || off + sz > mdatHi) return null
      if (sample % every == 0) {
        val bytes = java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
        rows.add(new GenericInternalRow(Array[Any](
          sample, ticks * 1000000L / timescale, bytes)))
      }
      // advance time
      ticks += runDelta(run)
      inRun += 1
      if (inRun == runCount(run) && run + 1 < nRuns) { run += 1; inRun = 0 }
      // advance position
      off += sz
      within += 1
      sample += 1
      if (within == perThisChunk && sample < ns) {
        chunk += 1; within = 0
        if (chunk >= nChunks) return null
        off = chunkOff(chunk)
        while (scRun + 1 < nScRuns && chunk + 1 >= scFirst(scRun + 1)) scRun += 1
      }
    }
    new GenericArrayData(rows.toArray.asInstanceOf[Array[Any]])
  }
}

/** Deterministic ISO-BMFF MP4 for the media lake's video arm — the
  * [[AviSynth]] idea applied to MP4: a complete, structurally valid
  * file (every box size accounts for exactly the bytes present) whose
  * stored byte j of sample i is `(doc_id·41 + i·13 + j·7) % 256`, so an
  * oracle re-derives every demuxed byte arithmetically. Shape designed
  * to break shortcuts: TWO stts runs with different deltas (constant
  * frame rate cannot hash-match), TWO chunks via a 2-run stsc + 2-entry
  * stco (a single-chunk assumption reads the wrong offsets), and a
  * variable-length `free` box between ftyp and moov (fixed offsets
  * cannot work). Timescale = 600 + (doc_id%4)·300 — the same family the
  * media lake's mvhd carries, so `containerParams` agrees. */
case class Mp4Synth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_mp4_synth"

  override def nullSafeEval(input: Any): Any =
    Mp4Synth.synth(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.plans.Mp4Synth.synth($id)")

  override protected def withNewChildInternal(newChild: Expression): Mp4Synth =
    copy(child = newChild)
}

object Mp4Synth {
  def timescale(docId: Long): Long = 600 + Math.floorMod(docId, 4L) * 300
  def samples(docId: Long): Long = 2 + Math.floorMod(docId, 5L)
  def sampleSize(docId: Long, i: Long): Long = 9 + Math.floorMod(docId + 3 * i, 14L)
  def delta1(docId: Long): Long = 100 + Math.floorMod(docId, 50L)
  def delta2(docId: Long): Long = delta1(docId) + 25

  /** Stored byte j of sample i. */
  def storedByte(docId: Long, i: Long, j: Long): Int =
    Math.floorMod(docId * 41 + i * 13 + j * 7, 256L).toInt

  /** Exact tick time of sample i (two stts runs: ceil(ns/2) at d1,
    * the rest at d2). */
  def ptsTicks(docId: Long, i: Long): Long = {
    val n1 = (samples(docId) + 1) / 2
    if (i <= n1) i * delta1(docId)
    else n1 * delta1(docId) + (i - n1) * delta2(docId)
  }

  def synth(docId: Long): Array[Byte] = {
    val ts = timescale(docId)
    val ns = samples(docId).toInt
    val n1 = (ns + 1) / 2          // stts run 1 count == chunk-1 samples
    val n2 = ns - n1
    val d1 = delta1(docId); val d2 = delta2(docId)
    val duration = n1 * d1 + n2 * d2
    val sizes = (0 until ns).map(i => sampleSize(docId, i).toInt)
    val freeLen = (3 + Math.floorMod(docId, 11L)).toInt

    val out = new java.io.ByteArrayOutputStream(512 + sizes.sum)
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { out.write(0); i += 1 } }

    // ---- sizes, computed before writing (stco needs mdat offsets) ----
    val stsdSz = 32; val sttsSz = 16 + 8 * 2; val stscSz = 16 + 12 * 2
    val stszSz = 20 + 4 * ns; val stcoSz = 16 + 4 * 2
    val stblSz = 8 + stsdSz + sttsSz + stscSz + stszSz + stcoSz
    val minfSz = 8 + stblSz
    val hdlrSz = 33
    val mdhdSz = 32
    val mdiaSz = 8 + mdhdSz + hdlrSz + minfSz
    val tkhdSz = 92
    val trakSz = 8 + tkhdSz + mdiaSz
    val mvhdSz = 108
    val moovSz = 8 + mvhdSz + trakSz
    val ftypSz = 24
    val freeSz = 8 + freeLen
    val mdatPayload = ftypSz + freeSz + moovSz + 8L
    val chunk1Off = mdatPayload
    val chunk2Off = mdatPayload + sizes.take(n1).sum

    // ---- ftyp + free ----
    be32(ftypSz); cc("ftyp"); cc("mp42"); be32(0); cc("mp42"); cc("isom")
    be32(freeSz); cc("free"); zeros(freeLen)
    // ---- moov ----
    be32(moovSz); cc("moov")
    be32(mvhdSz); cc("mvhd"); be32(0) // v0 + flags
    be32(0); be32(0)                  // c/mtime
    be32(ts); be32(duration)
    be32(0x00010000L); out.write(0x01); out.write(0); zeros(2) // rate, volume, reserved
    zeros(8)                          // reserved
    // unity matrix
    be32(0x00010000L); be32(0); be32(0)
    be32(0); be32(0x00010000L); be32(0)
    be32(0); be32(0); be32(0x40000000L)
    zeros(24)                         // pre_defined
    be32(2)                           // next_track_ID
    //   trak
    be32(trakSz); cc("trak")
    be32(tkhdSz); cc("tkhd"); be32(0x00000007L) // v0, flags: enabled|in_movie|in_preview
    be32(0); be32(0)                  // c/mtime
    be32(1); be32(0)                  // track_ID, reserved
    be32(duration)
    zeros(8)                          // reserved
    zeros(2 + 2 + 2 + 2)              // layer, alt_group, volume, reserved
    be32(0x00010000L); be32(0); be32(0)
    be32(0); be32(0x00010000L); be32(0)
    be32(0); be32(0); be32(0x40000000L)
    be32(0); be32(0)                  // width, height (fixed-point; codec-opaque)
    //   mdia
    be32(mdiaSz); cc("mdia")
    be32(mdhdSz); cc("mdhd"); be32(0)
    be32(0); be32(0)                  // c/mtime
    be32(ts); be32(duration)
    zeros(2 + 2)                      // language, pre_defined
    be32(hdlrSz); cc("hdlr"); be32(0)
    be32(0); cc("vide"); zeros(12); out.write(0) // pre_defined, handler, reserved, name ""
    //   minf → stbl
    be32(minfSz); cc("minf")
    be32(stblSz); cc("stbl")
    be32(stsdSz); cc("stsd"); be32(0); be32(1)
    be32(16); cc("raw "); zeros(6); out.write(0); out.write(1) // entry: reserved + dref idx 1
    be32(sttsSz); cc("stts"); be32(0); be32(2)
    be32(n1); be32(d1); be32(n2); be32(d2)
    be32(stscSz); cc("stsc"); be32(0); be32(2)
    be32(1); be32(n1); be32(1)        // chunk 1: n1 samples
    be32(2); be32(n2); be32(1)        // chunk 2: the rest
    be32(stszSz); cc("stsz"); be32(0); be32(0); be32(ns)
    sizes.foreach(s => be32(s))
    be32(stcoSz); cc("stco"); be32(0); be32(2)
    be32(chunk1Off); be32(chunk2Off)
    // ---- mdat ----
    be32(8L + sizes.sum); cc("mdat")
    var i = 0
    while (i < ns) {
      var j = 0
      while (j < sizes(i)) { out.write(storedByte(docId, i, j)); j += 1 }
      i += 1
    }
    out.toByteArray
  }
}
