package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.zip.Inflater

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Local git-repository commit source — the offline equivalent of the
  * reference's JGit walker (`source-jgit/.../JGitCommitSource.java`),
  * implemented against the PUBLIC on-disk git formats with zero
  * dependencies: loose objects (zlib-deflated `commit <len>\0...`),
  * pack files (varint-headered entries addressed through the v2 .idx
  * fanout), and both delta encodings (OFS_DELTA / REF_DELTA with
  * copy/insert instruction streams). Commits are discovered by walking
  * parents from every ref (the refs tree, `packed-refs`, `HEAD`).
  *
  * Scale posture, honestly stated: a repository's COMMIT GRAPH is
  * metadata (thousands-to-millions of rows), so enumeration happens
  * where the `.git` directory is readable — exactly like the reference
  * source, which is a single SourceFunction on a local clone — and the
  * result enters Spark as a DataFrame whose downstream analytics
  * (components, activity windows, per-author stats) are the distributed
  * part. The fleet-scale variant points many such sources at many
  * clones; the per-repo walk is not the bottleneck the engine exists
  * for.
  *
  * Verified in SourcesSpec against `git log` itself on this repo —
  * shas, parents, authors, timestamps and messages must match the real
  * git binary's output, which exercises loose objects, the pack, and
  * delta chains in one go.
  */
object GitRepo {

  /** One parsed commit. Timestamps are epoch seconds as authored;
    * `tz` is the raw offset string ("+0000"). */
  final case class GitCommit(sha: String, tree: String, parents: Seq[String],
      author_name: String, author_email: String, author_ts: Long, author_tz: String,
      committer_name: String, committer_email: String, committer_ts: Long,
      message: String)

  /** All commits reachable from the repo's refs, as a DataFrame. */
  def commits(spark: SparkSession, gitDir: String): DataFrame = {
    import spark.implicits._
    walk(gitDir).toDF()
  }

  /** Walk every ref and collect reachable commits (BFS over parents).
    * Annotated tags re-enqueue their TARGET sha, so a commit is only
    * ever parsed and keyed under its own sha (a tag-sha key would both
    * mislabel the row and duplicate any branch-reachable commit), and
    * nested tags (tag → tag → commit) resolve one hop per dequeue. */
  def walk(gitDir: String): Seq[GitCommit] = {
    val store = new ObjectStore(gitDir)
    val seen = mutable.LinkedHashMap.empty[String, GitCommit]
    val visited = mutable.HashSet.empty[String]
    val queue = mutable.Queue.empty[String]
    refs(gitDir).foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val sha = queue.dequeue()
      if (visited.add(sha)) {
        store.read(sha).foreach {
          case ("tag", body) => tagTarget(body).foreach(queue.enqueue)
          case ("commit", body) =>
            val c = parseCommit(sha, body)
            seen.put(sha, c)
            c.parents.foreach(queue.enqueue)
          case _ => () // a tag of a tree/blob reaches no commits
        }
      }
    }
    seen.values.toSeq
  }

  /** Ref tips: HEAD (direct or symbolic), loose refs, packed-refs. */
  private def refs(gitDir: String): Seq[String] = {
    val out = mutable.ListBuffer.empty[String]
    val head = new File(gitDir, "HEAD")
    def resolveRefFile(f: File): Unit = if (f.isFile) {
      val s = new String(Files.readAllBytes(f.toPath), "UTF-8").trim
      if (s.startsWith("ref: ")) resolveRefFile(new File(gitDir, s.drop(5)))
      else if (s.length == 40) out += s
    }
    resolveRefFile(head)
    val refRoot = new File(gitDir, "refs")
    def rec(f: File): Unit =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rec)
      else resolveRefFile(f)
    rec(refRoot)
    val packed = new File(gitDir, "packed-refs")
    if (packed.isFile)
      new String(Files.readAllBytes(packed.toPath), "UTF-8").linesIterator
        .filterNot(l => l.startsWith("#") || l.startsWith("^"))
        .foreach { l => val sha = l.take(40); if (sha.length == 40) out += sha }
    out.distinct.toSeq
  }

  private def tagTarget(body: Array[Byte]): Option[String] =
    new String(body, "UTF-8").linesIterator
      .find(_.startsWith("object ")).map(_.drop(7).trim)

  /** Parse a raw commit body: headers to the first blank line, then the
    * message. Multiple parents; `gpgsig`-style continuation lines are
    * skipped (they begin with a space). */
  private[sources] def parseCommit(sha: String, body: Array[Byte]): GitCommit = {
    val text = new String(body, "UTF-8")
    val sep = text.indexOf("\n\n")
    val (hdr, msg) = if (sep >= 0) (text.take(sep), text.drop(sep + 2)) else (text, "")
    var tree = ""
    val parents = mutable.ListBuffer.empty[String]
    var an = ""; var ae = ""; var ats = 0L; var atz = ""
    var cn = ""; var ce = ""; var cts = 0L
    def person(rest: String): (String, String, Long, String) = {
      val lt = rest.lastIndexOf('<'); val gt = rest.lastIndexOf('>')
      val name = rest.take(math.max(lt - 1, 0)).trim
      val email = if (lt >= 0 && gt > lt) rest.substring(lt + 1, gt) else ""
      val tail = rest.drop(gt + 1).trim.split(" ")
      val ts = tail.headOption.flatMap(t => scala.util.Try(t.toLong).toOption).getOrElse(0L)
      (name, email, ts, tail.lift(1).getOrElse(""))
    }
    hdr.linesIterator.foreach { l =>
      if (l.startsWith("tree ")) tree = l.drop(5).trim
      else if (l.startsWith("parent ")) parents += l.drop(7).trim
      else if (l.startsWith("author ")) {
        val p = person(l.drop(7)); an = p._1; ae = p._2; ats = p._3; atz = p._4
      } else if (l.startsWith("committer ")) {
        val p = person(l.drop(10)); cn = p._1; ce = p._2; cts = p._3
      }
    }
    GitCommit(sha, tree, parents.toSeq, an, ae, ats, atz, cn, ce, cts, msg)
  }

  // ---- object store: loose + packed ---------------------------------------

  private final class ObjectStore(gitDir: String) {
    private val objects = new File(gitDir, "objects")
    private val packs: Seq[Pack] =
      Option(new File(objects, "pack").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".idx")).sortBy(_.getName)
        .map(idx => new Pack(idx,
          new File(idx.getParentFile, idx.getName.stripSuffix(".idx") + ".pack")))

    /** (type, body) of an object, loose first, else from any pack. */
    def read(sha: String): Option[(String, Array[Byte])] = {
      val loose = new File(objects, sha.take(2) + "/" + sha.drop(2))
      if (loose.isFile) {
        val raw = inflate(Files.readAllBytes(loose.toPath))
        val z = raw.indexOf(0.toByte)
        val Array(tpe, _) = new String(raw, 0, z, "UTF-8").split(" ", 2)
        Some((tpe, raw.slice(z + 1, raw.length)))
      } else packs.iterator.flatMap(_.read(sha)).nextOption()
    }
  }

  /** One .pack/.idx pair (idx v2 only — what modern git writes).
    * Whole-file reads and Int offsets bound this reader at 2 GiB per
    * pack — metadata scale, like the walk itself; the require turns a
    * silent offset truncation into a loud error. */
  private final class Pack(idxFile: File, packFile: File) {
    require(packFile.length < Int.MaxValue && idxFile.length < Int.MaxValue,
      s"${packFile.getName}: packs >= 2 GiB exceed this reader's in-memory " +
        "Int-offset design — repack (git repack -a -d --max-pack-size) first")
    private val idx = Files.readAllBytes(idxFile.toPath)
    private val pack = Files.readAllBytes(packFile.toPath)
    require(be32(idx, 0) == 0xff744f63 && be32(idx, 4) == 2,
      s"${idxFile.getName}: not a v2 pack index")
    private val n = be32(idx, 8 + 255 * 4)
    private val shaBase = 8 + 256 * 4
    private val crcBase = shaBase + n * 20
    private val offBase = crcBase + n * 4
    private val off8Base = offBase + n * 4

    private def shaAt(i: Int): String = {
      val sb = new StringBuilder(40)
      var j = 0
      while (j < 20) { sb.append(f"${idx(shaBase + i * 20 + j) & 0xff}%02x"); j += 1 }
      sb.toString
    }

    private def offsetAt(i: Int): Long = {
      val o = be32(idx, offBase + i * 4)
      if ((o & 0x80000000) == 0) o.toLong & 0xffffffffL
      else be64(idx, off8Base + (o & 0x7fffffff) * 8)
    }

    def read(sha: String): Option[(String, Array[Byte])] = {
      // binary search the sorted sha table within the fanout bucket
      val bucket = Integer.parseInt(sha.take(2), 16)
      var lo = if (bucket == 0) 0 else be32(idx, 8 + (bucket - 1) * 4)
      var hi = be32(idx, 8 + bucket * 4) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = shaAt(mid).compareTo(sha)
        if (c == 0) return Some(entry(offsetAt(mid)))
        else if (c < 0) lo = mid + 1 else hi = mid - 1
      }
      None
    }

    /** Decode the entry at `offset`, resolving delta chains. */
    private def entry(offset: Long): (String, Array[Byte]) = {
      var p = offset.toInt
      var b = pack(p) & 0xff
      val tpe = (b >> 4) & 7
      var shift = 4
      while ((b & 0x80) != 0) { p += 1; b = pack(p) & 0xff; shift += 7 }
      p += 1
      tpe match {
        case 1 | 2 | 3 | 4 =>
          (Seq("", "commit", "tree", "blob", "tag")(tpe), inflate(pack, p))
        case 6 => // OFS_DELTA: negative varint base offset
          var c = pack(p) & 0xff; p += 1
          var rel = (c & 0x7f).toLong
          while ((c & 0x80) != 0) {
            c = pack(p) & 0xff; p += 1
            rel = ((rel + 1) << 7) | (c & 0x7f)
          }
          val (bt, base) = entry(offset - rel)
          (bt, applyDelta(base, inflate(pack, p)))
        case 7 => // REF_DELTA: 20-byte base sha
          val baseSha = (0 until 20).map(i => f"${pack(p + i) & 0xff}%02x").mkString
          val (bt, base) = read(baseSha)
            .getOrElse(sys.error(s"delta base $baseSha not in pack"))
          (bt, applyDelta(base, inflate(pack, p + 20)))
        case other => sys.error(s"unsupported pack entry type $other")
      }
    }
  }

  /** git delta format: two varint sizes, then copy (MSB set: offset/size
    * bytes per mask bits) and insert (literal run) instructions. */
  private def applyDelta(base: Array[Byte], delta: Array[Byte]): Array[Byte] = {
    var p = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do { b = delta(p) & 0xff; p += 1; v |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      v
    }
    varint() // base size (unchecked — the base we resolved IS the base)
    val resultSize = varint().toInt
    val out = new Array[Byte](resultSize)
    var w = 0
    while (p < delta.length) {
      val op = delta(p) & 0xff; p += 1
      if ((op & 0x80) != 0) {
        var off = 0L; var size = 0L
        for (i <- 0 until 4) if ((op & (1 << i)) != 0) {
          off |= (delta(p) & 0xffL) << (8 * i); p += 1
        }
        for (i <- 0 until 3) if ((op & (0x10 << i)) != 0) {
          size |= (delta(p) & 0xffL) << (8 * i); p += 1
        }
        if (size == 0) size = 0x10000
        System.arraycopy(base, off.toInt, out, w, size.toInt)
        w += size.toInt
      } else {
        System.arraycopy(delta, p, out, w, op)
        p += op; w += op
      }
    }
    out
  }

  private def inflate(data: Array[Byte], from: Int = 0): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data, from, data.length - from)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val k = inf.inflate(buf)
      if (k > 0) out.write(buf, 0, k)
      else if (k == 0 && inf.needsDictionary()) sys.error("zlib dictionary unsupported")
    }
    inf.end()
    out.toByteArray
  }

  private def be32(a: Array[Byte], p: Int): Int =
    ((a(p) & 0xff) << 24) | ((a(p + 1) & 0xff) << 16) |
      ((a(p + 2) & 0xff) << 8) | (a(p + 3) & 0xff)
  private def be64(a: Array[Byte], p: Long): Long = {
    var v = 0L
    for (i <- 0 until 8) v = (v << 8) | (a(p.toInt + i) & 0xffL)
    v
  }
}
