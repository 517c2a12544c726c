package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus typed metadata; all Spark-side
  * plumbing — schema, batch iteration, partition sizing — is real. The
  * actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[decodeStub]] derives a deterministic fake feature vector
  * from the bytes so the pipeline shape (binary → fixed-width features)
  * is exercised end-to-end and testable.
  */
object Multimodal {

  val featureDim = 8

  /** Typed metadata for an opaque media blob, from builtins only:
    * byte length, sha256, leading magic bytes, and a deterministic fake
    * modality classification standing in for container sniffing. */
  def withMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("bytes", encode(col("text"), "UTF-8"))
      .withColumn("byte_len", octet_length(col("bytes")).cast("long"))
      .withColumn("sha256", sha2(col("bytes"), 256))
      .withColumn("magic", hex(encode(substring(col("text"), 1, 4), "UTF-8")))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (ascii(substring(col("text"), 1, 1)) % 3).cast("int") + 1))

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
