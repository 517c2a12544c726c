package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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

  /** Real container signatures (hex): JPEG/JFIF, PNG, RIFF+WAVE, MP4
    * `ftyp`. Docs with no header are plain text. */
  private val headerHexExpr =
    """CASE CAST(doc_id % 5 AS INT)
      | WHEN 0 THEN 'FFD8FFE000104A464946'
      | WHEN 1 THEN '89504E470D0A1A0A'
      | WHEN 2 THEN '524946460A00000057415645'
      | WHEN 3 THEN '00000018667479706D703432'
      | ELSE '' END""".stripMargin.linesIterator.mkString(" ")

  /** Synthesize a real `binary` media column: a deterministic container
    * header (magic bytes) prepended to the UTF-8 payload. Stands in for
    * reading actual media blobs — downstream operators ([[withMeta]],
    * [[frameSample]], [[decodeStub]]) see only `bytes` and must recover
    * the modality from the bytes themselves. */
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

  /** Frame sampling: fan one media row out to `n` evenly-spaced frame
    * rows (frame_idx, pts_sec, frame_bytes). The fan-out shape — explode
    * of a computed per-row frame list, no shuffle, downstream operators
    * see one row per frame — is the real contract; actual container
    * demuxing is STUBBED as even byte-range slices (no codecs here), and
    * the fake pts assumes a fixed 25 fps "duration" from byte length. */
  def frameSample(withBytes: DataFrame, n: Int): DataFrame =
    withBytes
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("pts_sec",
        col("frame_idx").cast("double") * octet_length(col("bytes")) / n / 25.0)
      .withColumn("frame_bytes",
        expr(s"substring(bytes, CAST(frame_idx * octet_length(bytes) / $n AS INT) + 1, " +
          s"greatest(CAST(octet_length(bytes) / $n AS INT), 1))"))

  /** Feature-extraction schema: input rows + fixed-width float vector. */
  def featureSchema(input: StructType): StructType =
    StructType(input.fields :+ StructField("features", ArrayType(FloatType), nullable = false))

  /** STUB decode: batch feature extraction over the binary column via
    * mapPartitions (the Spark-side shape a real decoder plugs into — one
    * model/codec instance per partition, rows streamed through it).
    *
    * A real implementation would decode `bytes` (JPEG/WAV/MP4) and run a
    * feature extractor here; this container has no codecs, so features
    * are a DETERMINISTIC FAKE: byte-position-weighted sums folded into
    * `featureDim` buckets. The schema, batching and partition behavior
    * are the real contract. */
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
