package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Mbox mailing-list archive source/sink — the offline half of the
  * reference's source tier (reference source-mbox/.../ApacheMboxSource
  * .java:146-157 iterates `From `-delimited messages with mime4j and maps
  * them to Email entities at :237-242; the surrounding HTTP polling needs
  * network and has no batch analogue).
  *
  * Spark-first shape: each mbox FILE is one input row (`wholetext`), the
  * `From ` separator lines split it into messages with a single
  * `explode`, and header/body extraction is codegen'd `regexp_extract` —
  * no UDFs, no driver-side parsing, so a directory of thousands of
  * monthly archives parses as one distributed scan. Writer and reader are
  * exact inverses over the standard mbox conventions:
  *
  *  - messages are delimited by lines starting `From ` (mboxrd-style);
  *  - body lines that would collide are quoted `>From ` on write and
  *    unquoted on read;
  *  - `Message-ID: <id@graft>` carries the doc_id;
  *  - `Date:` is RFC-2822 (`d MMM yyyy HH:mm:ss Z`), second precision;
  *  - the reader strips the single trailing newline the line-oriented
  *    writer appends to each message (mbox cannot distinguish it).
  */
object MboxIO {

  /** A header value written into one `Name: value` line. mbox cannot
    * represent null-vs-empty (an absent header reads back as ""), so null
    * writes as "" — a null must not null out the whole message concat and
    * fail the text sink opaquely. An embedded newline would silently
    * change the message structure: reject it loudly (FAILFAST both ways,
    * like the readers). */
  private def headerValue(name: String, c: org.apache.spark.sql.Column) = {
    val v = coalesce(c, lit(""))
    when(v.contains("\n") || v.contains("\r"),
      raise_error(concat(
        lit(s"mbox write: $name must not contain newlines (doc_id="),
        col("doc_id").cast("string"), lit(")"))))
      .otherwise(v)
  }

  /** One mbox-formatted message text per email, in the entity's field
    * order. `from_email` is embedded as the `From:` display form when it
    * differs from from_raw's address — ApacheMboxSource.java:237-242
    * likewise derives (fromRaw, fromEmail) from the one mailbox header. */
  def toMboxText(emails: Dataset[Email]): DataFrame =
    emails.select(concat(
      lit("From mbox@graft "),
      date_format(col("mail_date"), "EEE MMM d HH:mm:ss yyyy"), lit("\n"),
      lit("Message-ID: <"), col("doc_id").cast("string"), lit("@graft>\n"),
      lit("Date: "), date_format(col("mail_date"), "d MMM yyyy HH:mm:ss Z"), lit("\n"),
      lit("From: "), headerValue("from_raw", col("from_raw")), lit("\n"),
      lit("X-From-Email: "), headerValue("from_email", col("from_email")), lit("\n"),
      lit("Subject: "), headerValue("subject", col("subject")), lit("\n\n"),
      // quote body lines that would read as a message delimiter
      regexp_replace(coalesce(col("text_body"), lit("")),
        "(?m)^From ", ">From ")).as("value"))

  /** Write an mbox archive (possibly several part files — each part is a
    * valid standalone mbox; the reader globs the directory). */
  def write(emails: Dataset[Email], path: String): Unit =
    toMboxText(emails).write.mode("overwrite").text(path)

  /** mbox text (one `value` row per file) → typed Email rows. Pure
    * column expressions, so the same parse serves batch and streaming.
    * Folded (RFC 5322 continuation) header lines unfold before field
    * extraction — the newline before a WSP-led line is removed (the WSP
    * itself survives, per the RFC), so a real-world archive's folded
    * Subject keeps its continuation instead of truncating at the fold. */
  private def parse(files: DataFrame): Dataset[Email] = {
    val msgs = files
      // CRLF archives normalize to LF up front (same contract as the V2
      // reader's per-line CR strip): without this, the blank header
      // terminator is "\r\n\r\n" and every header regex stops matching
      .select(regexp_replace(col("value"), "\r\n", "\n").as("value"))
      .select(explode(split(col("value"), "(?m)^From [^\n]*\n")).as("m"))
      .filter(length(col("m")) > 0)
      .select(
        regexp_replace(
          regexp_extract(col("m"), "(?s)^(.*?)\n\n", 1), "\n(?=[ \t])", "").as("h"),
        regexp_extract(col("m"), "(?s)^.*?\n\n(.*)$", 1).as("body"))
    msgs.select(
      regexp_extract(col("h"), "(?m)^Message-ID: <([0-9]+)@graft>$", 1)
        .cast("long").as("doc_id"),
      to_timestamp(
        regexp_extract(col("h"), "(?m)^Date: (.*)$", 1),
        "d MMM yyyy HH:mm:ss Z").as("mail_date"),
      regexp_extract(col("h"), "(?m)^Subject: (.*)$", 1).as("subject"),
      regexp_extract(col("h"), "(?m)^From: (.*)$", 1).as("from_raw"),
      regexp_extract(col("h"), "(?m)^X-From-Email: (.*)$", 1).as("from_email"),
      regexp_replace(
        regexp_replace(col("body"), "\n$", ""),
        "(?m)^>From ", "From ").as("text_body"))
      .as(Encoders.product[Email])
  }

  /** Parse an mbox directory/file back into typed Email entities.
    * Malformed Message-ID / Date fail the job (ANSI cast + to_timestamp),
    * matching JsonIO's FAILFAST posture — a source must not drop rows
    * silently. */
  def read(spark: SparkSession, path: String): Dataset[Email] =
    parse(spark.read.option("wholetext", "true").text(path))

  /** Streaming variant — the true analogue of the reference source
    * (ApacheMboxSource.java is a Flink `RichSourceFunction` that POLLS
    * for new monthly archives and emits emails incrementally; Spark's
    * file stream source is the same contract: each archive dropped into
    * `path` is discovered, parsed and emitted exactly once, with
    * checkpointable progress replacing the reference's `ListState`). */
  def readStream(spark: SparkSession, path: String): Dataset[Email] =
    parse(spark.readStream.option("wholetext", "true").text(path))
}
