package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus typed metadata; all Spark-side
  * plumbing — schema, magic-byte container sniffing, batch iteration,
  * partition sizing — is real. Only the media DECODE is STUBBED (this
  * container ships no image/audio codecs): [[decodeStub]] derives a
  * deterministic fake feature vector from the bytes so the pipeline shape
  * (binary → fixed-width features) is exercised end-to-end and testable.
  */
object Multimodal {

  val featureDim = 8

  // ---- synthetic container construction ------------------------------------
  //
  // Headers are STRUCTURALLY VALID container prefixes (every length /
  // size field accounts for exactly the bytes present) with media
  // parameters embedded at their spec positions, derived from doc_id:
  //   jpeg  width = 64 + doc_id % 1920, height = 48 + doc_id % 1080
  //   png   width = 16 + doc_id % 4096, height = 16 + doc_id % 2160
  //   wav   channels = 1 + doc_id % 2, sample rate by doc_id % 7
  //   mp4   mvhd timescale = 600 + (doc_id % 4)*300,
  //         duration = timescale * (1 + doc_id % 30)
  // Each container also carries a VARIABLE-LENGTH filler segment before
  // the parameter segment (JPEG COM of 2 + doc_id % 7 bytes; WAV LIST
  // chunk of 4 + (doc_id % 6)*2 bytes), so [[containerParams]] cannot
  // cheat with fixed offsets — it must walk markers/chunks for real.

  /** Big-endian hex of an integer SQL expression, `digits` hex chars. */
  private def beHex(e: String, digits: Int): String =
    s"lpad(hex($e), $digits, '0')"

  /** Little-endian hex of an integer SQL expression over `n` bytes. */
  private def leHex(e: String, n: Int): String =
    (0 until n).map(i =>
      s"lpad(hex((($e) div ${1L << (8 * i)}) % 256), 2, '0')").mkString(", ")

  /** The WAV sample-rate ladder, keyed by doc_id % 7. */
  private val wavRates = Seq(8000, 11025, 16000, 22050, 32000, 44100, 48000)
  private val wavRateCase =
    "CASE CAST(doc_id % 7 AS INT) " +
      wavRates.zipWithIndex.map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString(" ") + " ELSE 8000 END"

  /** Full container-header hex, one CASE arm per modality (doc_id % 5):
    * JPEG = SOI + full JFIF APP0(16) + COM(2 + doc_id%7 filler) + SOF0
    * carrying (height, width); PNG = signature + IHDR(width, height);
    * WAV = RIFF/WAVE + LIST filler chunk + fmt chunk carrying
    * (channels, sample rate, derived byte rate / block align) + a data
    * chunk header sized to the payload, so the UTF-8 payload IS the PCM
    * frame stream and [[audioPcmStats]] decodes real samples; MP4 =
    * full 24-byte ftyp + moov containing a 108-byte v0 mvhd carrying
    * (timescale, duration). Docs with no header are plain text. */
  private val headerHexExpr: String = {
    val jpeg = Seq(
      "'FFD8FFE000104A46494600010100000100010000'",      // SOI + APP0 JFIF
      "'FFFE'", beHex("2 + doc_id % 7", 4),              // COM, self-counting len
      "repeat('00', CAST(doc_id % 7 AS INT))",           // COM filler
      "'FFC0000B08'",                                    // SOF0, len 11, prec 8
      beHex("48 + doc_id % 1080", 4),                    // height
      beHex("64 + doc_id % 1920", 4),                    // width
      "'01011100'")                                      // 1 component
    val png = Seq(
      "'89504E470D0A1A0A'",                              // signature
      "'0000000D49484452'",                              // IHDR, len 13
      beHex("16 + doc_id % 4096", 8),                    // width
      beHex("16 + doc_id % 2160", 8),                    // height
      "'0802000000'",                                    // depth 8, truecolor
      "'00000000'")                                      // CRC (unchecked)
    val wav = Seq(
      "'524946460A00000057415645'",                      // RIFF + size + WAVE
      "'4C495354'", leHex("4 + (doc_id % 6) * 2", 4),    // LIST filler chunk
      "'494E464F'", "repeat('00', CAST((doc_id % 6) * 2 AS INT))",
      "'666D742010000000'",                              // fmt , size 16
      "'0100'",                                          // PCM
      leHex("1 + doc_id % 2", 2),                        // channels
      leHex(wavRateCase, 4),                             // sample rate
      leHex(s"($wavRateCase) * (1 + doc_id % 2) * 2", 4), // byte rate
      leHex("(1 + doc_id % 2) * 2", 2),                  // block align
      "'1000'",                                          // 16-bit
      "'64617461'", leHex("octet_length(text)", 4))      // data chunk = payload
    val mp4 = Seq(
      "'00000018667479706D703432000000006D70343269736F6D'", // ftyp, 24 B
      "'000000746D6F6F76'",                              // moov, 8 + 108
      "'0000006C6D766864'",                              // mvhd v0, 108 B
      "'000000000000000000000000'",                      // flags, c/mtime
      beHex("600 + (doc_id % 4) * 300", 8),              // timescale
      beHex("(600 + (doc_id % 4) * 300) * (1 + doc_id % 30)", 8), // duration
      "repeat('00', 80)")                                // rest of mvhd
    s"""CASE CAST(doc_id % 5 AS INT)
       | WHEN 0 THEN concat(${jpeg.mkString(", ")})
       | WHEN 1 THEN concat(${png.mkString(", ")})
       | WHEN 2 THEN concat(${wav.mkString(", ")})
       | WHEN 3 THEN concat(${mp4.mkString(", ")})
       | ELSE '' END""".stripMargin.linesIterator.mkString(" ")
  }

  /** DuckDB twin of [[headerHexExpr]] — the oracle rebuilds the exact
    * header hex from the same doc_id formulas (DuckDB cannot slice a
    * BLOB, so the whole meta oracle works over hex text). Kept adjacent
    * to the Spark expression so the two constructions stay in lockstep. */
  val duckHeaderHexSql: String = {
    def be(e: String, digits: Int) = s"lpad(to_hex($e), $digits, '0')"
    def le(e: String, n: Int) = (0 until n).map(i =>
      s"lpad(to_hex((($e) // ${1L << (8 * i)}) % 256), 2, '0')").mkString(" || ")
    val rate = "CASE CAST(doc_id % 7 AS INT) " +
      wavRates.zipWithIndex.map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString(" ") + " ELSE 8000 END"
    val jpeg = Seq(
      "'FFD8FFE000104A46494600010100000100010000'",
      "'FFFE'", be("2 + doc_id % 7", 4),
      "repeat('00', CAST(doc_id % 7 AS INT))",
      "'FFC0000B08'", be("48 + doc_id % 1080", 4), be("64 + doc_id % 1920", 4),
      "'01011100'")
    val png = Seq(
      "'89504E470D0A1A0A'", "'0000000D49484452'",
      be("16 + doc_id % 4096", 8), be("16 + doc_id % 2160", 8),
      "'0802000000'", "'00000000'")
    val wav = Seq(
      "'524946460A00000057415645'",
      "'4C495354'", le("4 + (doc_id % 6) * 2", 4),
      "'494E464F'", "repeat('00', CAST((doc_id % 6) * 2 AS INT))",
      "'666D742010000000'", "'0100'",
      le("1 + doc_id % 2", 2), le(rate, 4),
      le(s"($rate) * (1 + doc_id % 2) * 2", 4), le("(1 + doc_id % 2) * 2", 2),
      "'1000'",
      "'64617461'", le("octet_length(encode(text))", 4))
    val mp4 = Seq(
      "'00000018667479706D703432000000006D70343269736F6D'",
      "'000000746D6F6F76'", "'0000006C6D766864'",
      "'000000000000000000000000'",
      be("600 + (doc_id % 4) * 300", 8),
      be("(600 + (doc_id % 4) * 300) * (1 + doc_id % 30)", 8),
      "repeat('00', 80)")
    s"""CASE CAST(doc_id % 5 AS INT)
       | WHEN 0 THEN ${jpeg.mkString(" || ")}
       | WHEN 1 THEN ${png.mkString(" || ")}
       | WHEN 2 THEN ${wav.mkString(" || ")}
       | WHEN 3 THEN ${mp4.mkString(" || ")}
       | ELSE '' END""".stripMargin.linesIterator.mkString(" ")
  }

  /** Synthesize a real `binary` media column: a deterministic container
    * header (structurally valid, parameters embedded — see above)
    * prepended to the UTF-8 payload. Stands in for reading actual media
    * blobs — downstream operators ([[withMeta]], [[containerParams]],
    * [[frameSample]], [[decodeStub]]) see only `bytes` and must recover
    * modality and parameters from the bytes themselves. */
  def synthMedia(docs: DataFrame): DataFrame =
    docs.withColumn("bytes",
      concat(unhex(expr(headerHexExpr)), encode(col("text"), "UTF-8")))

  /** Typed metadata for an opaque media blob, derived from `bytes` ONLY
    * (no side-channel): byte length, content hash, leading magic bytes,
    * and modality via REAL magic-byte sniffing — JPEG `FFD8FF`, PNG
    * `89504E47`, RIFF container with a `WAVE` form type at offset 8,
    * ISO-BMFF `ftyp` at offset 4 (mirrors what the reference's media
    * tier would sniff; pure byte logic, no codec needed).
    *
    * `sha256` hashes the hex encoding of the bytes (not the raw blob) so
    * the DuckDB oracle — whose sha256 only accepts VARCHAR — computes the
    * identical value. */
  def withMeta(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", octet_length(col("bytes")).cast("long"))
      .withColumn("magic", hex(substring(col("bytes"), 1, 12)))
      .withColumn("sha256", sha2(hex(col("bytes")), 256))
      .withColumn("container",
        when(col("magic").startsWith("FFD8FF"), "jpeg")
          .when(col("magic").startsWith("89504E47"), "png")
          .when(col("magic").startsWith("52494646") &&
            substring(col("magic"), 17, 8) === "57415645", "wav")
          .when(substring(col("magic"), 9, 8) === "66747970", "mp4")
          .otherwise("none"))
      .withColumn("modality",
        when(col("container").isin("jpeg", "png"), "image")
          .when(col("container") === "wav", "audio")
          .when(col("container") === "mp4", "video")
          .otherwise("text"))

  /** [[synthMedia]] + [[withMeta]] over a text corpus. */
  def withMetaFromDocs(docs: DataFrame): DataFrame = withMeta(synthMedia(docs))

  // ---- container parameter extraction (real byte parsing) ------------------

  /** Big-endian unsigned read of `n` bytes at 1-based offset expr `off`
    * (hex → decimal via conv — bytes never widen past 4 here). */
  private def rdBe(off: String, n: Int): String =
    s"cast(conv(hex(substring(bytes, $off, $n)), 16, 10) as bigint)"

  /** Little-endian unsigned read of `n` bytes at 1-based offset `off`. */
  private def rdLe(off: String, n: Int): String =
    (0 until n).map(i =>
      s"(${rdBe(s"($off) + $i", 1)} * ${1L << (8 * i)})").mkString("(", " + ", ")")

  /** JPEG dimension walk: from the first marker after SOI, hop segments
    * by their self-counting big-endian lengths until SOF0 (0xFFC0),
    * whose payload is precision(1) height(2) width(2). Bounded at 8
    * hops — headers are APPn / COM / DQT segments, entropy data cannot
    * start before a SOF. State: (off, h, w); a hop past the buffer or a
    * non-0xFF byte (corrupt stream) freezes the state with null dims. */
  private val jpegWalk: String =
    s"""aggregate(sequence(1, 8),
       |  named_struct('off', 3, 'h', cast(null as bigint), 'w', cast(null as bigint)),
       |  (st, i) -> if(st.w is not null or st.off + 9 > octet_length(bytes)
       |                or ${rdBe("st.off", 1)} <> 255, st,
       |    if(${rdBe("st.off + 1", 1)} = 192,
       |      named_struct('off', st.off,
       |        'h', ${rdBe("st.off + 5", 2)}, 'w', ${rdBe("st.off + 7", 2)}),
       |      named_struct('off', cast(st.off + 2 + ${rdBe("st.off + 2", 2)} as int),
       |        'h', st.h, 'w', st.w))),
       |  st -> named_struct('h', st.h, 'w', st.w))""".stripMargin.linesIterator.mkString(" ")

  /** PNG IHDR read: the spec REQUIRES IHDR as the first chunk, so after
    * the 8-byte signature the layout is fixed — verify the chunk type at
    * bytes 13-16 and read width/height big-endian at 17-24. */
  private val pngRead: String =
    s"""if(hex(substring(bytes, 13, 4)) = '49484452',
       |  named_struct('w', ${rdBe("17", 4)}, 'h', ${rdBe("21", 4)}),
       |  named_struct('w', cast(null as bigint), 'h', cast(null as bigint)))"""
      .stripMargin.linesIterator.mkString(" ")

  /** WAV fmt-chunk walk: RIFF chunks are id(4) size(4 LE) data(size,
    * padded to even); hop from offset 13 (after RIFF size WAVE) until
    * `fmt `, whose data is format(2) channels(2 LE) samplerate(4 LE).
    * Bounded at 8 hops. */
  private val wavWalk: String =
    s"""aggregate(sequence(1, 8),
       |  named_struct('off', 13, 'sr', cast(null as bigint), 'ch', cast(null as bigint)),
       |  (st, i) -> if(st.sr is not null or st.off + 15 > octet_length(bytes), st,
       |    if(hex(substring(bytes, st.off, 4)) = '666D7420',
       |      named_struct('off', st.off,
       |        'sr', ${rdLe("st.off + 12", 4)}, 'ch', ${rdLe("st.off + 10", 2)}),
       |      named_struct('off', cast(least(st.off + 8 + ${rdLe("st.off + 4", 4)}
       |          + (${rdLe("st.off + 4", 4)} % 2), 2147483000) as int),
       |        'sr', st.sr, 'ch', st.ch))),
       |  st -> named_struct('sr', st.sr, 'ch', st.ch))""".stripMargin.linesIterator.mkString(" ")

  /** Typed media parameters recovered from `bytes` ONLY, per container:
    * (width, height) for jpeg/png, (sample_rate, channels) for wav,
    * (timescale, duration_ts) for mp4 — every value read at its spec
    * position by a real marker/chunk/box walk (see the walk exprs
    * above), never from a side channel. Columns are null where the
    * modality doesn't define them. Row-local byte arithmetic: no
    * shuffle, no UDF — higher-order `aggregate` folds with ≤ 8 steps
    * per row (interpreted, but bounded and off the corpus hot path —
    * metadata extraction runs once per blob at ingest). */
  def containerParams(media: DataFrame): DataFrame = {
    // ISO-BMFF box walk: boxes are size(4 BE) type(4); hop until the
    // target type or past the buffer. The moov walk runs from the top
    // level, the mvhd walk from moov's first child; each walk's result
    // is only trusted after re-checking the type it claims to have
    // found (a walk that ran off the end parks at an arbitrary offset).
    def boxWalk(start: String, typeHex: String): String =
      s"""aggregate(sequence(1, 8), cast($start as int),
         |  (off, i) -> if(off + 8 > octet_length(bytes)
         |                 or hex(substring(bytes, off + 4, 4)) = '$typeHex', off,
         |    cast(least(off + ${rdBe("off", 4)}, 2147483000) as int)))"""
        .stripMargin.linesIterator.mkString(" ")
    media
      .withColumn("_jpeg", when(col("container") === "jpeg", expr(jpegWalk)))
      .withColumn("_png", when(col("container") === "png", expr(pngRead)))
      .withColumn("_wav", when(col("container") === "wav", expr(wavWalk)))
      .withColumn("_moov", when(col("container") === "mp4",
        expr(boxWalk("1", "6D6F6F76"))))
      .withColumn("_moov",
        when(expr("hex(substring(bytes, _moov + 4, 4)) = '6D6F6F76'"), col("_moov")))
      .withColumn("_mvhd", when(col("_moov").isNotNull,
        expr(boxWalk("_moov + 8", "6D766864"))))
      .withColumn("_mvhd",
        when(expr("hex(substring(bytes, _mvhd + 4, 4)) = '6D766864'"), col("_mvhd")))
      .withColumn("width", coalesce(col("_jpeg.w"), col("_png.w")))
      .withColumn("height", coalesce(col("_jpeg.h"), col("_png.h")))
      .withColumn("sample_rate", col("_wav.sr"))
      .withColumn("channels", col("_wav.ch"))
      // mvhd v0: box header(8) + version/flags(4) + c/mtime(8), then
      // timescale at box-relative +20 and duration at +24 (1-based)
      .withColumn("timescale", expr(s"${rdBe("_mvhd + 20", 4)}"))
      .withColumn("duration_ts", expr(s"${rdBe("_mvhd + 24", 4)}"))
      .drop("_jpeg", "_png", "_wav", "_moov", "_mvhd")
  }

  // ---- real PCM audio decode ----------------------------------------------
  //
  // 16-bit PCM WAV is the one modality that needs NO codec — a sample
  // is two little-endian bytes — so here the decode tier graduates from
  // stub to REAL: locate the fmt and data chunks by walking the RIFF
  // structure, read the interleaved frames, and compute signal features
  // from the actual sample values. All integer arithmetic (sum of
  // squares stays in BIGINT: |s| <= 2^15, so even 2^31 samples cannot
  // overflow 2^30·2^31 < 2^63), so the features hash-match an oracle.

  /** REAL audio decode over 16-bit PCM WAV rows: validates the RIFF/
    * WAVE container, walks the chunk list to `fmt ` and `data`
    * (non-PCM / non-16-bit rows decode to null rather than garbage),
    * reads channel 0 of every interleaved frame as a signed
    * little-endian 16-bit sample, and emits the classic signal
    * features — `n_frames`, `peak_abs`, `sum_sq` (exact integer
    * energy) and `n_zero_cross` (strict sign flips, a pitch/noisiness
    * proxy). Rows that are not decodable 16-bit PCM WAVs are filtered
    * (no separate container predicate needed — the decoder IS the
    * sniff); 0-frame WAVs decode to all-zero stats.
    *
    * The whole decode — validate, walk, fold — is ONE codegen'd
    * Catalyst expression (`graft_wav_pcm`, plans/PcmStatsExpr.scala):
    * row-local, no shuffle, no UDF, scan-speed over a media lake. An
    * earlier SQL formulation (higher-order `aggregate` chunk walk +
    * per-sample hex/conv lambda arithmetic) measured ~30× slower at
    * sf0.1 — and worse, filter pushdown substituted the derived
    * n_frames/offset columns into predicates, re-running the walk once
    * per referencing predicate; the fused expression makes each
    * (re-)evaluation a primitive byte loop, so plan-shape inlining
    * stops mattering. rms/dBFS are one driver-side division away from
    * (sum_sq, n_frames) and deliberately left out of the integer
    * contract. */
  def audioPcmStats(media: DataFrame): DataFrame =
    media
      .withColumn("_st", call_function("graft_wav_pcm", col("bytes")))
      .filter(col("_st").isNotNull)
      .withColumn("n_frames", element_at(col("_st"), 1))
      .withColumn("peak_abs", element_at(col("_st"), 2))
      .withColumn("sum_sq", element_at(col("_st"), 3))
      .withColumn("n_zero_cross", element_at(col("_st"), 4))
      .drop("_st")

  // ---- real PNG image decode (r10) ----------------------------------------

  /** REAL image decode over PNG rows — the image rung graduating from
    * stub to real the way [[audioPcmStats]] graduated audio: PNG's
    * codec is zlib (the DEFLATE the git source already inflates), so
    * `graft_png_pixels` (plans/PngExprs.scala) runs the complete
    * pipeline — CRC-checked chunk walk, multi-IDAT zlib inflate,
    * per-scanline unfilter across all five PNG filter types — and
    * reduces the reconstructed pixels to (width, height, per-channel
    * sums). The decoder IS the sniff (non-PNG / non-truecolor /
    * corrupt rows → null, filtered out here), one fused codegen
    * expression per row: row-local, shuffle-free, scan-speed over a
    * media lake. All-integer output (channel bytes ≤ 255), so the row
    * hash-matches an oracle that re-derives the sums from the
    * synthesis formula — a match proves the inflate and the
    * unfiltering are bit-exact. */
  def imagePixelStats(media: DataFrame): DataFrame =
    media
      .withColumn("_px", call_function("graft_png_pixels", col("bytes")))
      .filter(col("_px").isNotNull)
      .withColumn("width", element_at(col("_px"), 1))
      .withColumn("height", element_at(col("_px"), 2))
      .withColumn("sum_r", element_at(col("_px"), 3))
      .withColumn("sum_g", element_at(col("_px"), 4))
      .withColumn("sum_b", element_at(col("_px"), 5))
      .drop("_px")

  /** REAL image resize over PNG rows (r10): box-filter downsample by
    * integer `factor` over the ACTUAL decoded pixels (full inflate +
    * unfilter inside the fused `graft_png_resize` expression — see
    * plans/PngExprs.scala), floor-averaged per block, one row per
    * output pixel. Row-local fan-out: no shuffle; non-PNG rows drop
    * (the decoder is the sniff). */
  def imageResize(media: DataFrame, factor: Int): DataFrame =
    media
      .withColumn("_px",
        explode(call_function("graft_png_resize", col("bytes"), lit(factor))))
      .withColumn("px", col("_px.px"))
      .withColumn("py", col("_px.py"))
      .withColumn("r", col("_px.r"))
      .withColumn("g", col("_px.g"))
      .withColumn("b", col("_px.b"))
      .drop("_px")

  /** REAL video frame decode + sampling over DIB-frame AVI rows (r10):
    * the full container walk (hdrl avih/strf cross-validation, JUNK
    * skipped by size, movi `00db` frames) runs in the fused
    * `graft_avi_frames` expression — see plans/AviExprs.scala for why
    * this codec-free form is the honest video rung, like 16-bit PCM
    * was for audio — and each decoded frame becomes one row, keeping
    * every `sampleEvery`-th frame (the frame-sampling contract
    * [[frameSample]] could only stub). Row-local fan-out: no shuffle;
    * non-AVI rows drop (the decoder is the sniff). */
  def videoFrameStats(media: DataFrame, sampleEvery: Int = 1): DataFrame =
    media
      .withColumn("_fr", explode(call_function("graft_avi_frames", col("bytes"))))
      .filter(col("_fr.frame_idx") % sampleEvery === 0)
      .withColumn("frame_idx", col("_fr.frame_idx"))
      .withColumn("width", col("_fr.width"))
      .withColumn("height", col("_fr.height"))
      .withColumn("sum_r", col("_fr.sum_r"))
      .withColumn("sum_g", col("_fr.sum_g"))
      .withColumn("sum_b", col("_fr.sum_b"))
      .drop("_fr")

  /** Frame sampling: fan one media row out to evenly-spaced frame rows
    * (frame_idx, pts_sec, frame_bytes) — no shuffle, downstream
    * operators see one row per frame.
    *
    * BOTH video container arms are REAL: AVI via `graft_avi_demux`
    * (r11, plans/AviExprs.scala — raw DIB frames, pts =
    * frame_idx · dwMicroSecPerFrame) and MP4 via `graft_mp4_demux`
    * (r12, plans/Mp4Exprs.scala — the stts/stsc/stsz/stco sample-table
    * walk, pts = floor(ticks·10⁶/timescale)); frame EXTRACTION never
    * needs a codec, only box arithmetic. The demuxers are the sniffs:
    * rows neither accepts (still images, audio, plain text — inputs
    * with no frame structure at all) fall back to the even-byte-slice
    * fan-out, kept as the documented plug-in point for containers
    * outside both accepted profiles. All arms are row-local; the union
    * is of filters of the same scan — with media laid out by container
    * (the [[withMeta]] partitioning), each arm's scan prunes to its own
    * modality instead. `n` bounds the fallback's fan-out and sets the
    * real arms' stride via the frame count. */
  def frameSample(withBytes: DataFrame, n: Int): DataFrame = {
    // Cheap validity probes (r11 ADVICE): an astronomically large stride
    // still walks+validates the container but copies only frame 0's
    // bytes, so no routing predicate pays a full every-frame demux.
    // Null ⇔ not that container; empty array ⇔ valid container with
    // zero frames — BOTH route to the stub so every input row fans out
    // to ≥1 frame row (the frameSample contract; a bare explode would
    // silently drop zero-frame containers).
    def probe(fn: String) = {
      val p = call_function(fn, col("bytes"), lit(1000000000))
      p.isNotNull && size(p) > 0
    }
    // Real demux arms share one shape: both AVI (r11) and MP4 (r12)
    // emit (frame_idx, pts_us, frame_bytes) with exact integer pts.
    def realArm(fn: String, gate: Column) = withBytes
      .filter(gate)
      .withColumn("_frames", call_function(fn, col("bytes"), lit(1)))
      .filter(col("_frames").isNotNull && size(col("_frames")) > 0)
      // n evenly-spaced of the nf real frames: stride = ceil(nf / n)
      .withColumn("_fr", explode(filter(col("_frames"),
        f => f.getField("frame_idx") %
          ceil(size(col("_frames")) / lit(n.toDouble)).cast("long") === 0)))
      .withColumn("frame_idx", col("_fr.frame_idx"))
      .withColumn("pts_sec", col("_fr.pts_us").cast("double") / 1e6)
      .withColumn("frame_bytes", col("_fr.frame_bytes"))
      .drop("_frames", "_fr")
    val avi = realArm("graft_avi_demux", probe("graft_avi_demux"))
    val mp4 = realArm("graft_mp4_demux",
      !probe("graft_avi_demux") && probe("graft_mp4_demux"))
    val stub = withBytes
      .filter(!probe("graft_avi_demux") && !probe("graft_mp4_demux"))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(n - 1L))))
      .withColumn("pts_sec",
        col("frame_idx").cast("double") * octet_length(col("bytes")) / n / 25.0)
      .withColumn("frame_bytes",
        expr(s"substring(bytes, CAST(frame_idx * octet_length(bytes) / $n AS INT) + 1, " +
          s"greatest(CAST(octet_length(bytes) / $n AS INT), 1))"))
    avi.unionByName(mp4).unionByName(stub)
  }

  /** Feature-extraction schema: input rows + fixed-width float vector. */
  def featureSchema(input: StructType): StructType =
    StructType(input.fields :+ StructField("features", ArrayType(FloatType), nullable = false))

  /** Feature extraction over an opaque media column, routed per row to
    * the REAL decode rungs where one exists (r11, retiring the fake for
    * those arms): PNG pixels via `graft_png_pixels`, baseline JPEG via
    * `graft_jpeg_pixels`, 16-bit PCM WAV samples via `graft_wav_pcm`,
    * DIB-AVI frames via `graft_avi_frames` — each arm's
    * `featureDim`-float descriptor is derived from ACTUAL decoded
    * pixels/samples (arm tag, geometry, normalized channel means /
    * signal statistics) — plus the MP4 arm (r12): `graft_mp4_demux`'s
    * sample-table walk proves real stream structure (sample count,
    * byte totals, exact duration), which is the honest descriptor for
    * a container whose PIXELS are codec-bound. The decoders are the
    * sniffs (null for anything they don't support), so no separate
    * container predicate exists to drift from the decode reality; rows
    * no real rung handles (out-of-profile containers, plain text) fall
    * back to [[decodeStub]], the documented codec plug-in point. All
    * five real arms are fused codegen expressions — row-local,
    * shuffle-free; the residual split is two filters of the same scan
    * (with media laid out by container, each arm prunes to its
    * modality instead of rescanning). */
  def decodeFeatures(withBytes: DataFrame): DataFrame = {
    val png = call_function("graft_png_pixels", col("bytes"))
    val jpg = call_function("graft_jpeg_pixels", col("bytes"))
    val wav = call_function("graft_wav_pcm", col("bytes"))
    val avi = call_function("graft_avi_frames", col("bytes"))
    def f(c: Column) = c.cast("float")
    // PNG: [1, w, h, mean_r, mean_g, mean_b in [0,1], n_pixels, 0];
    // JPEG shares the shape (same decode contract) under arm tag 4
    def imgFeat(px: Column, tag: Int) = {
      val n = element_at(px, 1) * element_at(px, 2)
      array(f(lit(tag)), f(element_at(px, 1)), f(element_at(px, 2)),
        f(element_at(px, 3) / n / 255.0), f(element_at(px, 4) / n / 255.0),
        f(element_at(px, 5) / n / 255.0), f(n), f(lit(0)))
    }
    val pngFeat = imgFeat(png, 1)
    val jpgFeat = imgFeat(jpg, 4)
    // WAV: [2, n_frames, peak/2^15, rms/2^15, zero-cross rate, 0, 0, 0]
    val wn = element_at(wav, 1)
    val wavFeat = array(f(lit(2)), f(wn), f(element_at(wav, 2) / 32768.0),
      f(sqrt(element_at(wav, 3) / greatest(wn, lit(1L))) / 32768.0),
      f(element_at(wav, 4) / greatest(wn - 1, lit(1L))),
      f(lit(0)), f(lit(0)), f(lit(0)))
    // AVI: [3, n_frames, w, h, mean_r, mean_g, mean_b in [0,1]] over ALL
    // decoded frames (aggregate over the per-frame sums — still row-local)
    val nf = size(avi).cast("long")
    val aviPix = element_at(avi, 1).getField("width") *
      element_at(avi, 1).getField("height") * nf
    def aviSum(field: String) =
      aggregate(avi, lit(0L), (acc, fr) => acc + fr.getField(field))
    val aviFeat = array(f(lit(3)), f(nf),
      f(element_at(avi, 1).getField("width")), f(element_at(avi, 1).getField("height")),
      f(aviSum("sum_r") / aviPix / 255.0), f(aviSum("sum_g") / aviPix / 255.0),
      f(aviSum("sum_b") / aviPix / 255.0), f(lit(0)))
    // MP4 (r12): the sample-table demux yields REAL sample boundaries
    // and exact times, so the descriptor is real stream structure —
    // [5, n_samples, total_bytes, mean_sample_len, span_sec, 0, 0, 0].
    // Pixel-level stats stay codec-bound by documented contract; these
    // five numbers are what the container actually proves.
    val mp4 = call_function("graft_mp4_demux", col("bytes"), lit(1))
    val mn = size(mp4).cast("long")
    val mp4Len = aggregate(mp4, lit(0L),
      (acc, fr) => acc + octet_length(fr.getField("frame_bytes")))
    val mp4Feat = array(f(lit(5)), f(mn), f(mp4Len),
      f(mp4Len / greatest(mn, lit(1L))),
      f(element_at(mp4, size(mp4)).getField("pts_us") / 1e6),
      f(lit(0)), f(lit(0)), f(lit(0)))
    val routed = withBytes.withColumn("features",
      when(png.isNotNull, pngFeat)
        .when(jpg.isNotNull, jpgFeat)
        .when(wav.isNotNull, wavFeat)
        .when(avi.isNotNull && nf > 0, aviFeat)
        .when(mp4.isNotNull && mn > 0, mp4Feat))
    routed.filter(col("features").isNotNull)
      .unionByName(decodeStub(routed.filter(col("features").isNull).drop("features")))
  }

  /** STUB decode: batch feature extraction over the binary column via
    * mapPartitions (the Spark-side shape a real decoder plugs into — one
    * model/codec instance per partition, rows streamed through it).
    *
    * Every container modality now has a real rung (PNG/JPEG pixels, WAV
    * PCM, AVI frames, MP4 sample tables — r12 closed the last one), so
    * the only rows reaching this stub are OUT-OF-PROFILE containers and
    * plain text: inputs with nothing to decode, for which the
    * byte-position-weighted bucket sums below are an honest byte-level
    * fingerprint rather than a stand-in for decoded media. The schema,
    * batching and partition behavior remain the real codec plug-in
    * contract. */
  def decodeStub(withBytes: DataFrame): DataFrame = {
    val inSchema = withBytes.schema
    val outSchema = featureSchema(inSchema)
    val bytesIdx = inSchema.fieldIndex("bytes")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    withBytes.mapPartitions { rows =>
      // per-partition "codec" setup would go here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        val acc = new Array[Float](featureDim)
        var i = 0
        while (i < bytes.length) {
          acc(i % featureDim) += (bytes(i) & 0xff) * (1.0f / 255f)
          i += 1
        }
        Row.fromSeq(r.toSeq :+ acc.toSeq)
      }
    }(enc)
  }
}
