package graft.sources

import java.nio.charset.StandardCharsets
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for mbox mailing-list archives:
  * `spark.read.format("mbox").load(dir)` → the same `Email`-shaped rows
  * as [[MboxIO.read]] (the two parsers are asserted row-identical in
  * SourcesSpec).
  *
  * Why a connector when MboxIO already parses: `wholetext` materializes
  * each archive as ONE row — a 2 GiB string ceiling and an O(file-size)
  * memory spike per task. This reader streams each file line by line and
  * holds only the CURRENT message, so a multi-GiB yearly archive scans in
  * O(message) memory. Scale shape: archives split into `splitSize` byte
  * ranges (delimiter-resynced, see [[MboxScan.planInputPartitions]]), so
  * even ONE huge archive fans out across executors instead of
  * serializing into a single task; column pruning is pushed into the
  * parser, which skips regex/date work for unprojected fields.
  *
  * Mirrors reference source-mbox/.../ApacheMboxSource.java:146-157
  * (`From `-delimited message iteration) and :237-242 (header→Email
  * mapping); the mboxrd conventions (delimiter, `>From ` quoting,
  * trailing-newline strip) are documented at [[MboxIO]].
  */
final class MboxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mbox"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MboxSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("mbox source requires a path: .load(<dir|glob>)"))
    new MboxTable(path)
  }
}

object MboxSource {
  /** graft.sources.Email in field order (Entities.scala). */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mail_date", TimestampType, nullable = false),
    StructField("subject", StringType, nullable = true),
    StructField("from_raw", StringType, nullable = true),
    StructField("from_email", StringType, nullable = true),
    StructField("text_body", StringType, nullable = true)))

  private[sources] val DateFmt = "d MMM yyyy HH:mm:ss Z"

  /** Bytes per input split of a large archive (HDFS-block-ish); override
    * with `.option("splitSize", bytes)`. */
  private[sources] val DefaultSplitSize: Long = 128L * 1024 * 1024

  /** Expand a path/glob into data-file statuses (skips hidden/marker
    * files), driver-side — same discovery contract as the file sources. */
  private[sources] def listStatuses(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def ok(st: FileStatus) = {
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap {
      case d if d.isDirectory => fs.listStatus(d.getPath).toSeq.filter(ok)
      case f => Seq(f).filter(ok)
    }
  }

  private[sources] def listFiles(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    listStatuses(path, conf).map(_.getPath.toString)
}

final class MboxTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"mbox:$path"
  override def schema(): StructType = MboxSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MboxScanBuilder(path,
      Option(options.get("splitSize")).map(_.toLong)
        .getOrElse(MboxSource.DefaultSplitSize))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val got = info.schema().fieldNames.toSeq
    val want = MboxSource.Schema.fieldNames.toSeq
    require(got == want, s"mbox write needs Email-shaped input $want, got $got")
    new MboxWriteBuilder(path)
  }
}

final class MboxScanBuilder(path: String, splitSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MboxSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new MboxScan(path, required, splitSize)
}

final class MboxScan(path: String, required: StructType, splitSize: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** One InputPartition per `splitSize` byte range of each archive — a
    * multi-GiB yearly archive scans as N parallel tasks instead of
    * serializing into one. Each reader resyncs to the first `From `
    * delimiter at-or-after its range start; a message belongs to the
    * split containing its delimiter line, so the split reads are a
    * partition (no loss, no duplication) of the unsplit read. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    MboxSource.listStatuses(path, conf).flatMap { st =>
      val f = st.getPath.toString
      if (st.getLen <= splitSize) Seq(MboxFilePartition(f))
      else {
        val n = ((st.getLen + splitSize - 1) / splitSize).toInt
        (0 until n).map(i => MboxFilePartition(f, i * splitSize,
          if (i == n - 1) Long.MaxValue else (i + 1) * splitSize))
      }
    }.map(p => p: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())
    MboxReaderFactory(conf, required)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MboxMicroBatchStream(path, required)
}

/** Streaming twin of the batch scan — the reference's ApacheMboxSource IS
  * a polling streaming source (its ListState remembers ingested archives;
  * ApacheMboxSource.java:146-157). Here the progress state is an offset:
  * the lexicographic high-water mark over archive file paths, which is
  * monotone for mailing-list corpora (named `YYYY-MM.mbox`). Each micro-
  * batch ingests exactly the files above the last committed mark —
  * exactly-once across restarts comes from the offset log, with no
  * per-file bookkeeping to grow unboundedly. Column pruning flows through
  * the same ScanBuilder as the batch path.
  *
  * The monotone-name assumption is VALIDATED at runtime, not trusted:
  * the offset also carries how many files sat at-or-below the watermark
  * when it was taken PLUS an order-insensitive digest of their names, so
  * a backfilled archive whose name sorts below the committed mark (which
  * the high-water filter would otherwise skip silently, forever) fails
  * the query loudly instead — even when a simultaneous delete cancels it
  * in the count — still O(1) offset state, no unbounded seen-set. */
final class MboxMicroBatchStream(path: String, required: StructType)
    extends MicroBatchStream {
  private val conf =
    new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())

  override def initialOffset(): Offset = MboxOffset("", 0L, Some(0L))
  override def latestOffset(): Offset = {
    val files = MboxSource.listFiles(path, conf.value)
    if (files.isEmpty) MboxOffset("", 0L, Some(0L))
    else MboxOffset(files.max, files.size.toLong, Some(MboxOffset.setDigest(files)))
  }
  override def deserializeOffset(json: String): Offset = MboxOffset.fromJson(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[MboxOffset]
    val hi = end.asInstanceOf[MboxOffset].watermark
    val files = MboxSource.listFiles(path, conf.value)
    // seenBelow < 0 = legacy offset without the count: can't validate.
    // below < seenBelow = archives deleted: harmless for ingestion. A
    // count-only guard has a blind spot — a delete and a backfill in the
    // same interval cancel — which the order-insensitive membership
    // digest catches; MORE deletes than backfills in one interval stays
    // byte-for-byte indistinguishable from pure deletes with O(1) offset
    // state (documented residual). Shared with the github page stream.
    HwmValidation.check(s"mbox stream $path", files, lo)
    files.filter(f => f > lo.watermark && f <= hi).sorted
      .map(MboxFilePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    MboxReaderFactory(conf, required)
  override def commit(end: Offset): Unit = () // progress lives in the offset log
  override def stop(): Unit = ()
}

/** @param seenBelow number of listed files at-or-below `watermark` when
  *                  this offset was taken (-1 = unknown, legacy offset)
  * @param digest    order-insensitive xor of the at-or-below file names'
  *                  md5 prefixes (None = legacy offset without one) —
  *                  detects a delete+backfill pair that cancels in the
  *                  count-only guard */
final case class MboxOffset(watermark: String, seenBelow: Long,
    digest: Option[Long] = None) extends Offset {
  override def json(): String = {
    val d = digest.fold("")(v => s""""d":$v,""")
    s"""{"n":$seenBelow,$d"wm":${graft.Jsons.str(watermark)}}"""
  }
}

object MboxOffset {
  private val ObjRe  = """\{"n":(-?\d+),"wm":(".*")\}""".r
  private val ObjDRe = """\{"n":(-?\d+),"d":(-?\d+),"wm":(".*")\}""".r

  /** Stable order-insensitive digest of a file-name set: xor of each
    * name's leading 8 md5 bytes. Deterministic across JVMs/runs (unlike
    * String.hashCode it has no seed/version hazard) and O(1) state. */
  def setDigest(files: Seq[String]): Long = files.foldLeft(0L) { (acc, f) =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes(StandardCharsets.UTF_8))
    acc ^ java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Parses the current `{"n":…,"d":…,"wm":"…"}` form; the digest-less
    * `{"n":…,"wm":"…"}` form (pre-digest checkpoints) and a bare JSON
    * string (pre-seenBelow checkpoints) still load, with the missing
    * validation state unknown. */
  def fromJson(json: String): MboxOffset = json.trim match {
    case ObjDRe(n, d, wm) => MboxOffset(unquote(wm), n.toLong, Some(d.toLong))
    case ObjRe(n, wm)     => MboxOffset(unquote(wm), n.toLong)
    case s                => MboxOffset(unquote(s), -1L)
  }

  /** Inverse of [[graft.Jsons.str]] (quoted string with \", \\, \n, \r,
    * \t, \\uXXXX escapes). */
  private def unquote(quoted: String): String = {
    val s = quoted.trim
    require(s.length >= 2 && s.head == '"' && s.last == '"', s"bad mbox offset: $quoted")
    val b = new StringBuilder
    var i = 1
    while (i < s.length - 1) {
      s.charAt(i) match {
        case '\\' =>
          s.charAt(i + 1) match {
            case 'n' => b += '\n'; i += 2
            case 'r' => b += '\r'; i += 2
            case 't' => b += '\t'; i += 2
            case 'u' =>
              b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => b += c; i += 2
          }
        case c => b += c; i += 1
      }
    }
    b.toString
  }
}

final case class MboxFilePartition(file: String, start: Long = 0L,
    end: Long = Long.MaxValue) extends InputPartition

final case class MboxReaderFactory(conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MboxPartitionReader(partition.asInstanceOf[MboxFilePartition], conf, required)
}

/** Byte-counting line reader over a raw input stream: splits on '\n',
  * decodes UTF-8 per line, and reports each line's starting byte offset
  * — [[BufferedReader]] can't, and the split-ownership rule needs exact
  * offsets. ASCII '\n' never occurs inside a UTF-8 multi-byte sequence,
  * so byte-level splitting is encoding-safe. */
private[sources] final class CountingLineReader(in: java.io.InputStream, startPos: Long) {
  private val bis = new java.io.BufferedInputStream(in, 128 * 1024)
  private var pos = startPos
  private var last = startPos

  /** Byte offset of the first byte of the line last returned. */
  def lineStart: Long = last

  /** Discard bytes up to and including the next '\n' — positions the
    * reader at the first whole line of a mid-file split. */
  def skipPartialLine(): Unit = {
    var b = bis.read()
    while (b != -1 && b != '\n') { pos += 1; b = bis.read() }
    if (b != -1) pos += 1
  }

  /** Next line without its terminator, or null at EOF. A trailing '\r'
    * (CRLF archive) is part of the terminator, not the line — without
    * this the blank header-terminator line reads as "\r" (never isEmpty)
    * and header parsing runs off the end of the message. Byte offsets
    * still count the CR: ownership/seek math is over raw bytes. */
  def readLine(): String = {
    last = pos
    var b = bis.read()
    if (b == -1) return null
    val out = new java.io.ByteArrayOutputStream(256)
    while (b != -1 && b != '\n') { out.write(b); pos += 1; b = bis.read() }
    if (b != -1) pos += 1 // the newline
    val bytes = out.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }
}

/** Streams one byte range of an mbox file: accumulates lines of the
  * current message, emits a row at each `From ` delimiter / EOF. Parse
  * semantics are field-for-field those of [[MboxIO.parse]]: first
  * matching header line wins, folded (RFC 5322 continuation) header
  * lines unfold into their parent before matching, absent string headers
  * read as "", body `>From ` lines unquote, the writer's single trailing
  * newline disappears (line-join inverts the line-oriented sink), and a
  * malformed/missing Message-ID or Date fails the task (FAILFAST — a
  * source must not drop rows silently).
  *
  * Range ownership: a message belongs to the split containing the first
  * byte of its `From ` delimiter line. A mid-file split seeks to
  * start−1, discards the partial line, skips forward to the first owned
  * delimiter, and keeps reading its last message PAST `end` until the
  * next delimiter (owned by the next split) or EOF. */
final class MboxPartitionReader(
    part: MboxFilePartition,
    conf: SerializableConfiguration,
    required: StructType) extends PartitionReader[InternalRow] {

  private val fmt = DateTimeFormatter.ofPattern(MboxSource.DateFmt, Locale.US)
  private val p = new Path(part.file)
  private val fsIn = p.getFileSystem(conf.value).open(p)
  // seek to start−1: if byte start−1 is '\n' the line beginning exactly
  // at `start` survives the partial-line discard (it is ours); otherwise
  // the straddling line started before `start` and belongs to the
  // previous split
  if (part.start > 0) fsIn.seek(part.start - 1)
  private val in = new CountingLineReader(fsIn,
    if (part.start > 0) part.start - 1 else 0L)
  if (part.start > 0) in.skipPartialLine()

  private val want = required.fieldNames
  private def wants(f: String) = want.contains(f)
  // body text is only assembled when projected — pruning reaches the parser
  private val needBody = wants("text_body")

  private var line: String = in.readLine()
  private var lineOff: Long = in.lineStart
  private var started = false   // saw the first delimiter owned by this split
  private var exhausted = false // next delimiter belongs to a later split
  private var row: InternalRow = _

  private def advance(): Unit = { line = in.readLine(); lineOff = in.lineStart }
  private def isDelim(l: String) = l.startsWith("From ")

  override def next(): Boolean = {
    if (exhausted) return false
    while (true) {
      // skip preamble / the previous split's message tail up to the first
      // delimiter owned by this range (MboxIO's length>0 filter twin)
      while (!started && line != null) {
        if (isDelim(line)) {
          if (lineOff >= part.end) return false // owned by a later split
          started = true
        }
        advance()
      }
      if (line == null) return false // EOF — nothing (more) to emit
      // accumulate one message: headers to first blank line, then body
      var docId: String = null
      var date: String = null
      var subject = ""
      var fromRaw = ""
      var fromEmail = ""
      var pending: String = null // current logical (unfolded) header line
      var inHeaders = true
      var sawAny = false
      val body = new ArrayBuffer[String]()
      def flushHeader(): Unit = if (pending != null) {
        val l = pending
        pending = null
        if (docId == null && l.startsWith("Message-ID: "))
          docId = l.stripPrefix("Message-ID: ")
        if (date == null && l.startsWith("Date: "))
          date = l.stripPrefix("Date: ")
        if (subject.isEmpty && l.startsWith("Subject: "))
          subject = l.stripPrefix("Subject: ")
        if (fromRaw.isEmpty && l.startsWith("From: "))
          fromRaw = l.stripPrefix("From: ")
        if (fromEmail.isEmpty && l.startsWith("X-From-Email: "))
          fromEmail = l.stripPrefix("X-From-Email: ")
      }
      while (line != null && !isDelim(line)) {
        sawAny = true
        if (inHeaders) {
          if (line.isEmpty) { flushHeader(); inHeaders = false }
          else if (pending != null && (line.charAt(0) == ' ' || line.charAt(0) == '\t'))
            pending += line // unfold: drop the newline, keep the leading WSP
          else { flushHeader(); pending = line }
        } else if (needBody) {
          body += (if (line.startsWith(">From ")) line.substring(1) else line)
        }
        advance()
      }
      flushHeader() // headers-only message (no blank line before EOF/delim)
      if (line != null) { // stopped at the next delimiter line
        if (lineOff >= part.end) exhausted = true // later split owns it
        else advance() // consume it; the next message is ours too
      }
      if (sawAny) {
        row = materialize(docId, date, subject, fromRaw, fromEmail, body)
        return true
      }
      if (exhausted) return false
      // empty chunk (back-to-back delimiters) — try the next one
    }
    false
  }

  private def materialize(
      docId: String, date: String, subject: String,
      fromRaw: String, fromEmail: String, body: ArrayBuffer[String]): InternalRow = {
    lazy val id: Long = docId match {
      case MboxPartitionReader.IdRe(d) => d.toLong
      case _ => throw new IllegalStateException(
        s"mbox ${part.file}: missing/malformed Message-ID (got: $docId)")
    }
    lazy val micros: Long = {
      if (date == null) throw new IllegalStateException(s"mbox ${part.file}: missing Date header")
      val odt = OffsetDateTime.parse(date, fmt)
      odt.toInstant.getEpochSecond * 1000000L + odt.toInstant.getNano / 1000L
    }
    lazy val text = UTF8String.fromString(body.mkString("\n"))
    val values: Array[Any] = want.map {
      case "doc_id"     => id
      case "mail_date"  => micros
      case "subject"    => UTF8String.fromString(subject)
      case "from_raw"   => UTF8String.fromString(fromRaw)
      case "from_email" => UTF8String.fromString(fromEmail)
      case "text_body"  => text
      case other => throw new IllegalArgumentException(s"unknown mbox column: $other")
    }
    new GenericInternalRow(values)
  }

  override def get(): InternalRow = row
  override def close(): Unit = fsIn.close()
}

object MboxPartitionReader {
  private val IdRe = "<([0-9]+)@graft>".r
}

/** V2 write path: `emails.write.format("mbox").mode(...).save(dir)`.
  * Each task streams its partition into ONE archive file (a valid
  * standalone mbox — the reader globs the directory), in exactly
  * [[MboxIO.toMboxText]]'s message format, so the wholetext parser, the
  * V2 reader, and this writer all round-trip. Overwrite maps to
  * TRUNCATE: existing data files are removed driver-side before tasks
  * launch. Empty partitions create no file. */
final class MboxWriteBuilder(path: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MboxBatchWrite(path, doTruncate)
  }
}

final class MboxBatchWrite(path: String, doTruncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (doTruncate && fs.exists(dir))
      MboxSource.listFiles(path, conf.value).foreach(f => fs.delete(new Path(f), false))
    fs.mkdirs(dir)
    MboxWriterFactory(path, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    messages.collect { case MboxWritten(f) if f.nonEmpty =>
      val p = new Path(f); p.getFileSystem(conf).delete(p, false)
    }
  }
}

final case class MboxWritten(file: String) extends WriterCommitMessage

final case class MboxWriterFactory(path: String, conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MboxDataWriter(path, partitionId, taskId, conf)
}

final class MboxDataWriter(
    path: String, partitionId: Int, taskId: Long,
    conf: SerializableConfiguration) extends DataWriter[InternalRow] {

  private val file = f"$path/part-$partitionId%05d-$taskId.mbox"
  private val utc = java.time.ZoneOffset.UTC
  private val fromLineFmt = DateTimeFormatter
    .ofPattern("EEE MMM d HH:mm:ss yyyy", Locale.US).withZone(utc)
  private val dateFmt = DateTimeFormatter
    .ofPattern(MboxSource.DateFmt, Locale.US).withZone(utc)
  private var out: java.io.Writer = _

  // mbox cannot represent null-vs-empty (an absent header reads back as
  // ""), so null string fields write as "" — matching MboxIO.toMboxText.
  // A header value with an embedded newline would silently change the
  // message structure on write: reject it loudly (FAILFAST both ways).
  private def strField(r: InternalRow, i: Int, name: String): String = {
    if (r.isNullAt(i)) return ""
    val s = r.getUTF8String(i).toString
    if (i != 5 && (s.indexOf('\n') >= 0 || s.indexOf('\r') >= 0))
      throw new IllegalArgumentException(
        s"mbox write: $name must not contain newlines (doc_id=${r.getLong(0)})")
    s
  }

  override def write(r: InternalRow): Unit = {
    if (out == null) {
      val p = new Path(file)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        p.getFileSystem(conf.value).create(p, true), StandardCharsets.UTF_8))
    }
    val t = java.time.Instant.ofEpochSecond(
      Math.floorDiv(r.getLong(1), 1000000L),
      Math.floorMod(r.getLong(1), 1000000L) * 1000L)
    out.write("From mbox@graft " + fromLineFmt.format(t) + "\n")
    out.write("Message-ID: <" + r.getLong(0) + "@graft>\n")
    out.write("Date: " + dateFmt.format(t) + "\n")
    out.write("From: " + strField(r, 3, "from_raw") + "\n")
    out.write("X-From-Email: " + strField(r, 4, "from_email") + "\n")
    out.write("Subject: " + strField(r, 2, "subject") + "\n\n")
    out.write(strField(r, 5, "text_body").replaceAll("(?m)^From ", ">From "))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    MboxWritten(if (out != null) file else "")
  }
  override def abort(): Unit = {
    if (out != null) { out.close()
      val p = new Path(file); p.getFileSystem(conf.value).delete(p, false) }
  }
  override def close(): Unit = ()
}
