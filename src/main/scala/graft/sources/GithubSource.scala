package graft.sources

import java.nio.charset.StandardCharsets
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** GitHub REST-replay source — the offline twin of the reference's
  * GitHub API pillar (`source-github/.../GithubSource.java`,
  * `GithubCommitSource.java`, `GithubPullRequestSource.java`): the one
  * reference component whose live form needs network. The same move that
  * closed the jgit gap applies — replay the PUBLIC wire format from
  * disk: an "API directory" holds paged JSON response fixtures in the
  * GitHub REST v3 shape,
  *
  * {{{
  *   <apiDir>/commits/commits-p00001.json   // one JSON array per page,
  *   <apiDir>/pulls/pulls-p00001.json       // ascending by time (the
  *   <apiDir>/users/<login>.json            // API's sort=created asc)
  * }}}
  *
  * and `spark.read.format("github").option("entity", "commits"|"pulls")
  * .load(apiDir)` parses them into EXACTLY the
  * [[JsonIO.readCommits]]/[[JsonIO.readPulls]] entity schemas
  * (`Encoders.product[Commit]`/`[PullRequest]` — asserted in
  * SourcesSpec, which round-trips synthesized entities through
  * [[GithubReplay.writeCommitPages]] and back).
  *
  * Mirrored reference semantics, point by point:
  *  - **Cursor**: `GithubCommitSource.java` snapshots its `lastTime`
  *    `Instant` into `ListState` and fetches `[lastTime, until)` windows;
  *    `GithubPullRequestSource.java` keeps the last created-at. Here the
  *    streaming twin's offset is the page-file high-water mark (pages
  *    are written in time order, so the page cursor IS the date cursor),
  *    checkpointed in the offset log — exactly-once across restarts with
  *    the same backfill validation as the mbox stream (count + membership
  *    digest; a page landing below the committed mark fails loudly).
  *  - **User-detail fill**: the list endpoints return SHALLOW user info
  *    (login only); names come from the per-user endpoint, cached in an
  *    LRU map (`GithubSource.java:28,60-76`, `LRUCache.java`). Here the
  *    `users/<login>.json` fixture plays that endpoint and
  *    [[GithubUserCache]] plays the cache — executor-global (the Spark
  *    unit of "one source instance"), bounded at the reference's 10 000
  *    default, consulted once per distinct login per eviction window.
  *    `getUserName` fallbacks are copied exactly: null user → "unknown",
  *    null name → login (`GithubSource.java:78-86`).
  *  - **Paging**: `PAGE_SIZE = 100` (`GithubCommitSource.java:35`); a
  *    reader holds ONE page in memory — O(page), the API's own bound.
  *
  * Replay-serialization contract (the only places the fixture is not
  * byte-for-byte API output, each needed to carry the graft data model
  * and documented here): `sha` encodes the entity's numeric `event_id`
  * in hex (≙ mbox's `Message-ID: <id@graft>`); the commit message's
  * leading bracketed tag carries `event_type` (the `[FLINK-…][component]`
  * subject convention the reference's analytics extract downstream);
  * `graft_weight` on a pull carries the PR weight (o_totalprice ≙ the
  * detail-endpoint size stats, not replayed here).
  *
  * Scale posture: page files are the parallel unit — a 100k-page archive
  * fans out one task per page, readers stream page-at-a-time, and column
  * pruning reaches the parser. Like the git walker, an API archive is
  * METADATA-scale (rate limits bound it); the distributed part is the
  * analytics downstream.
  */
final class GithubSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "github"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GithubReplay.schemaFor(GithubReplay.entityOf(options))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("github source requires a path: .load(<apiDir>)"))
    val entity = Option(properties.get("entity")).map(_.toLowerCase).getOrElse("commits")
    val maxUsers = Option(properties.get("maxUsersInCache")).map(_.toInt)
      .getOrElse(GithubReplay.DefaultMaxUsersInCache)
    new GithubTable(path, entity, maxUsers)
  }
}

object GithubReplay {
  /** Reference default: GithubSource.java:28. */
  val DefaultMaxUsersInCache = 10000

  /** Reference page size: GithubCommitSource.java:35. */
  val DefaultPageSize = 100

  private[sources] def entityOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("entity")).map(_.toLowerCase).getOrElse("commits")

  private[sources] def schemaFor(entity: String): StructType = entity match {
    case "commits" => Encoders.product[Commit].schema
    case "pulls"   => Encoders.product[PullRequest].schema
    case other => throw new IllegalArgumentException(
      s"github source: unknown entity '$other' (commits | pulls)")
  }

  /** The replay fixture's login for an entity author/creator — distinct
    * from the display name on purpose, so a reader that skips the
    * user-detail fill cannot accidentally produce correct entities. */
  def loginFor(name: String): String = "login-" + name

  private def iso(micros: Long): String =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L).toString

  private[sources] def parseMicros(s: String): Long = {
    val i = Instant.parse(s)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** 40-hex sha carrying the numeric id (the replay contract). */
  private def shaOf(id: Long): String = f"$id%040x"
  private[sources] def idOfSha(sha: String): Long = {
    val t = sha.dropWhile(_ == '0')
    if (t.isEmpty) 0L else java.lang.Long.parseLong(t, 16)
  }

  private def writer(path: Path, conf: org.apache.hadoop.conf.Configuration) =
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      path.getFileSystem(conf).create(path, true), StandardCharsets.UTF_8))

  /** Record a commits archive: entity rows → paged GitHub-API-shaped
    * JSON under `<apiDir>/commits/`, time-ascending (the reference
    * fetches day windows forward), plus the `users/` detail endpoint for
    * every author. Driver-side by design — an API recording is bounded
    * by the API's own rate limits (the GitRepo metadata posture); rows
    * stream through `toLocalIterator`, one page held at a time. */
  def writeCommitPages(commits: Dataset[Commit], apiDir: String,
      pageSize: Int = DefaultPageSize): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = commits.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val sorted = commits.orderBy(col("commit_date"), col("event_id"))
    val logins = scala.collection.mutable.LinkedHashSet.empty[String]
    var page = 0
    var out: java.io.Writer = null
    var inPage = 0
    def renderCommit(c: Commit): String = {
      // a commit whose email matched no account has "author": null in
      // the real API — the reader's getUserName twin reads it back as
      // "unknown" (GithubSource.java:78-80)
      val authorJson =
        if (c.author == null) "null"
        else { logins += c.author; s"""{"login":${graft.Jsons.str(loginFor(c.author))}}""" }
      val files = c.files_changed.map { f =>
        s"""{"filename":${graft.Jsons.str(f.filename)},"additions":${f.linesChanged},""" +
          s""""deletions":0,"changes":${f.linesChanged}}"""
      }.mkString("[", ",", "]")
      val date = graft.Jsons.str(iso(tsMicros(c.commit_date)))
      s"""{"sha":"${shaOf(c.event_id)}",""" +
        s""""commit":{"author":{"name":null,"email":null,"date":$date},""" +
        s""""committer":{"name":null,"email":null,"date":$date},""" +
        s""""message":${graft.Jsons.str(s"[${c.event_type}] commit ${c.event_id}")}},""" +
        s""""author":$authorJson,"committer":$authorJson,""" +
        s""""files":$files}"""
    }
    val it = sorted.toLocalIterator()
    while (it.hasNext) {
      val c = it.next()
      if (out == null) {
        page += 1
        out = writer(new Path(f"$apiDir/commits/commits-p$page%05d.json"), conf)
        out.write("[")
        inPage = 0
      }
      if (inPage > 0) out.write(",\n")
      out.write(renderCommit(c))
      inPage += 1
      if (inPage == pageSize) { out.write("]"); out.close(); out = null }
    }
    if (out != null) { out.write("]"); out.close() }
    writeUsers(logins, apiDir, conf)
  }

  /** Exact Timestamp → epoch micros (getTime alone would double-count
    * the nanos' millisecond part). */
  private def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Record a pulls archive: paged API-shaped JSON under
    * `<apiDir>/pulls/`, created-at ascending (the API's
    * `sort=created&direction=asc`, GithubPullRequestSource.java:60-66). */
  def writePullPages(pulls: Dataset[PullRequest], apiDir: String,
      pageSize: Int = DefaultPageSize): Unit = {
    import org.apache.spark.sql.functions.col
    val conf = pulls.sparkSession.sessionState.newHadoopConf()
    val sorted = pulls.orderBy(col("created_at"), col("number"))
    val logins = scala.collection.mutable.LinkedHashSet.empty[String]
    var page = 0
    var out: java.io.Writer = null
    var inPage = 0
    def ts(o: Option[java.sql.Timestamp]): String =
      o.map(t => graft.Jsons.str(iso(tsMicros(t)))).getOrElse("null")
    def renderPull(p: PullRequest): String = {
      logins += p.creator
      // the API has open/closed + merged_at; the entity's 'merged' state
      // is DERIVED on read (merged_at != null), so the fixture stays in
      // the API's state vocabulary
      val apiState = if (p.state == "merged") "closed" else p.state
      s"""{"number":${p.number},"state":${graft.Jsons.str(apiState)},""" +
        s""""title":${graft.Jsons.str(s"PR ${p.number}")},"body":null,""" +
        s""""user":{"login":${graft.Jsons.str(loginFor(p.creator))}},"labels":[],""" +
        s""""created_at":${ts(Some(p.created_at))},"updated_at":null,""" +
        s""""closed_at":${ts(p.closed_at)},"merged_at":${ts(p.merged_at)},""" +
        s""""merge_commit_sha":null,"comments":${p.comments_count},""" +
        s""""graft_weight":${p.weight}}"""
    }
    val it = sorted.toLocalIterator()
    while (it.hasNext) {
      val p = it.next()
      if (out == null) {
        page += 1
        out = writer(new Path(f"$apiDir/pulls/pulls-p$page%05d.json"), conf)
        out.write("[")
        inPage = 0
      }
      if (inPage > 0) out.write(",\n")
      out.write(renderPull(p))
      inPage += 1
      if (inPage == pageSize) { out.write("]"); out.close(); out = null }
    }
    if (out != null) { out.write("]"); out.close() }
    writeUsers(logins, apiDir, conf)
  }

  /** The per-user detail endpoint fixture: `users/<login>.json` holds
    * what `GET /users/{login}` returns — the name/email the list
    * endpoints omit. The display name is the entity author; the login is
    * [[loginFor]] of it, so entities only reconstruct through the fill. */
  private def writeUsers(logins: Iterable[String], apiDir: String,
      conf: org.apache.hadoop.conf.Configuration): Unit =
    logins.foreach { name =>
      val login = loginFor(name)
      val w = writer(new Path(s"$apiDir/users/$login.json"), conf)
      w.write(s"""{"login":${graft.Jsons.str(login)},"name":${graft.Jsons.str(name)},""" +
        s""""email":${graft.Jsons.str(name + "@users.example")}}""")
      w.close()
    }
}

/** Executor-global user-detail cache — the Spark-shaped twin of the
  * reference's per-source-instance `LRUCache<String, GHUser>`
  * (`GithubSource.java:34,60-76`): one bounded login → (name, email)
  * map per executor and users endpoint, shared by every task the way the
  * reference's cache is shared by every record of its source thread.
  * Reads through to `users/<login>.json` on miss; a missing file is the
  * shallow case and caches as name-less (the reference caches the
  * shallow object after its detail fetch either way). */
object GithubUserCache {
  final case class UserDetail(name: Option[String], email: Option[String])

  // The OUTER map is bounded too (LRU of per-dir caches): a long-lived
  // executor reading many distinct API archive paths would otherwise
  // accumulate one up-to-10k-entry cache per path forever — the
  // reference never hits this (one cache per source instance), but an
  // executor-global twin must bound both tiers. 64 archive dirs resident
  // at once is far beyond any real session's concurrent-source count.
  private val MaxDirs = 64
  private val caches = new LruCache[String, LruCache[String, UserDetail]](MaxDirs)
  private val mapper = new ObjectMapper()

  def lookup(usersDir: String, login: String, maxEntries: Int,
      conf: org.apache.hadoop.conf.Configuration): UserDetail = {
    val cache = caches.synchronized {
      var c = caches.get(s"$usersDir|$maxEntries")
      if (c == null) {
        c = new LruCache[String, UserDetail](maxEntries)
        caches.put(s"$usersDir|$maxEntries", c)
      }
      c
    }
    cache.synchronized {
      val hit = cache.get(login)
      if (hit != null) return hit
    }
    val detail = fetch(usersDir, login, conf)
    cache.synchronized { cache.put(login, detail) }
    detail
  }

  private def fetch(usersDir: String, login: String,
      conf: org.apache.hadoop.conf.Configuration): UserDetail = {
    val p = new Path(s"$usersDir/$login.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) UserDetail(None, None)
    else {
      val in = fs.open(p)
      try {
        val node = mapper.readTree(in)
        def str(f: String) = Option(node.get(f)).filterNot(_.isNull).map(_.asText)
        UserDetail(str("name"), str("email"))
      } finally in.close()
    }
  }

  /** Test hook: drop the cache for a users dir (cache residency must not
    * leak between test fixtures sharing a path). */
  private[graft] def invalidate(usersDir: String): Unit = caches.synchronized {
    val it = caches.keySet.iterator()
    while (it.hasNext) if (it.next().startsWith(usersDir + "|")) it.remove()
  }
}

/** Least-recently-accessed bounded map — the reference's
  * `LRUCache.java:14-24` semantics exactly (access-ordered
  * LinkedHashMap, evict eldest when size reaches the bound on insert). */
final class LruCache[K, V](maxEntries: Int)
    extends java.util.LinkedHashMap[K, V](16, 0.75f, true) {
  override def removeEldestEntry(eldest: java.util.Map.Entry[K, V]): Boolean =
    size() >= maxEntries
}

final class GithubTable(path: String, entity: String, maxUsers: Int)
    extends Table with SupportsRead {
  override def name(): String = s"github:$entity:$path"
  override def schema(): StructType = GithubReplay.schemaFor(entity)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GithubScanBuilder(path, entity, maxUsers)
}

final class GithubScanBuilder(path: String, entity: String, maxUsers: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GithubReplay.schemaFor(entity)
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new GithubScan(path, entity, maxUsers, required)
}

final class GithubScan(path: String, entity: String, maxUsers: Int, required: StructType)
    extends Scan with Batch {
  private def pagesDir = s"$path/$entity"
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    MboxSource.listFiles(pagesDir, conf).sorted
      .map(GithubPagePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())
    GithubReaderFactory(conf, entity, maxUsers, s"$path/users", required)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GithubMicroBatchStream(path, entity, maxUsers, required)
}

/** Streaming twin: the page-file high-water mark plays the reference's
  * checkpointed date cursor (`GithubCommitSource.java:146-167`
  * snapshotState/initializeState over `lastTime`) — pages are written in
  * time order, so "all pages above the committed mark" IS "all records
  * after lastTime". Validation of the monotone assumption (count +
  * membership digest against backfills below the mark) is shared with
  * the mbox stream via [[HwmValidation]]. */
final class GithubMicroBatchStream(path: String, entity: String, maxUsers: Int,
    required: StructType) extends MicroBatchStream {
  private def pagesDir = s"$path/$entity"
  private val conf =
    new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())

  override def initialOffset(): Offset = MboxOffset("", 0L, Some(0L))
  override def latestOffset(): Offset = {
    val files = MboxSource.listFiles(pagesDir, conf.value)
    if (files.isEmpty) MboxOffset("", 0L, Some(0L))
    else MboxOffset(files.max, files.size.toLong, Some(MboxOffset.setDigest(files)))
  }
  override def deserializeOffset(json: String): Offset = MboxOffset.fromJson(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[MboxOffset]
    val hi = end.asInstanceOf[MboxOffset].watermark
    val files = MboxSource.listFiles(pagesDir, conf.value)
    HwmValidation.check(s"github $entity stream $pagesDir", files, lo)
    files.filter(f => f > lo.watermark && f <= hi).sorted
      .map(GithubPagePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GithubReaderFactory(conf, entity, maxUsers, s"$path/users", required)
  override def commit(end: Offset): Unit = () // progress lives in the offset log
  override def stop(): Unit = ()
}

final case class GithubPagePartition(file: String) extends InputPartition

final case class GithubReaderFactory(conf: SerializableConfiguration, entity: String,
    maxUsers: Int, usersDir: String, required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GithubPageReader(partition.asInstanceOf[GithubPagePartition], conf, entity,
      maxUsers, usersDir, required)
}

/** Parses ONE page file (a JSON array in the API response shape) into
  * entity rows. Memory is O(page) — the page is the API's own 100-record
  * unit. Field mapping cites `GithubCommitSource.fromGHCommit`
  * (commit date = committer date, files → (filename, changes), user fill
  * + name fallbacks) and `GithubPullRequestSource.fromGHPullRequest`. */
final class GithubPageReader(part: GithubPagePartition, conf: SerializableConfiguration,
    entity: String, maxUsers: Int, usersDir: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val root: JsonNode = {
    val p = new Path(part.file)
    val in = p.getFileSystem(conf.value).open(p)
    try new ObjectMapper().readTree(in) finally in.close()
  }
  require(root.isArray, s"github page ${part.file}: expected a JSON array (API page body)")

  private val want = required.fieldNames
  private var i = 0
  private var row: InternalRow = _

  private def str(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  /** getUserName + fillUserDetailsFromCache, GithubSource.java:60-86:
    * null user → "unknown"; detail name, else login, else "unknown". */
  private def resolveName(userNode: JsonNode): String = {
    if (userNode == null || userNode.isNull) return "unknown"
    str(userNode, "login") match {
      case None => "unknown"
      case Some(login) =>
        GithubUserCache.lookup(usersDir, login, maxUsers, conf.value)
          .name.getOrElse(login)
    }
  }

  private def commitRow(n: JsonNode): InternalRow = {
    lazy val sha = str(n, "sha").getOrElse(
      sys.error(s"github page ${part.file}: commit without sha"))
    lazy val commit = n.get("commit")
    lazy val message = str(commit, "message").getOrElse("")
    val values: Array[Any] = want.map {
      case "event_id" => GithubReplay.idOfSha(sha)
      case "commit_date" =>
        // the reference keys commits on getCommitDate = the COMMITTER date
        GithubReplay.parseMicros(str(commit.get("committer"), "date").getOrElse(
          sys.error(s"github page ${part.file}: commit without committer date")))
      case "author" => UTF8String.fromString(resolveName(n.get("author")))
      case "event_type" =>
        // the bracketed subject tag carries the component key (the
        // [component] convention the reference's analytics extract)
        val tag = message match {
          case GithubPageReader.TagRe(t) => t
          case _ => ""
        }
        UTF8String.fromString(tag)
      case "files_changed" =>
        val files = Option(n.get("files")).filterNot(_.isNull).map { fn =>
          (0 until fn.size()).map { j =>
            val f = fn.get(j)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(str(f, "filename").getOrElse("")),
              f.get("changes").asInt())): Any
          }.toArray
        }.getOrElse(Array.empty[Any])
        new GenericArrayData(files)
      case other => throw new IllegalArgumentException(s"unknown commit column: $other")
    }
    new GenericInternalRow(values)
  }

  private def pullRow(n: JsonNode): InternalRow = {
    def micros(f: String): Any =
      str(n, f).map(GithubReplay.parseMicros).map(v => v: Any).orNull
    val values: Array[Any] = want.map {
      case "number" => n.get("number").asLong()
      case "creator" => UTF8String.fromString(resolveName(n.get("user")))
      case "state" =>
        // merged is DERIVED: the API vocabulary is open/closed +
        // merged_at (GithubPullRequestSource reads pr.getState; the
        // graft entity's distinct 'merged' state is merged_at != null)
        val s = if (str(n, "merged_at").isDefined) "merged"
                else str(n, "state").getOrElse("open")
        UTF8String.fromString(s)
      case "created_at" => GithubReplay.parseMicros(str(n, "created_at").getOrElse(
        sys.error(s"github page ${part.file}: pull without created_at")))
      case "closed_at" => micros("closed_at")
      case "merged_at" => micros("merged_at")
      case "comments_count" => n.get("comments").asInt()
      case "weight" => n.get("graft_weight").asDouble()
      case other => throw new IllegalArgumentException(s"unknown pull column: $other")
    }
    new GenericInternalRow(values)
  }

  override def next(): Boolean = {
    if (i >= root.size()) return false
    row = if (entity == "commits") commitRow(root.get(i)) else pullRow(root.get(i))
    i += 1
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

object GithubPageReader {
  /** Leading bracketed tag of the commit subject line. */
  private val TagRe = """(?s)^\[([^\]]*)\].*""".r
}

/** Shared high-water-mark validation for file-HWM streaming offsets
  * (mbox archives, github pages): the monotone-name assumption is
  * checked, not trusted — see the rationale at [[MboxMicroBatchStream]]. */
private[sources] object HwmValidation {
  def check(label: String, files: Seq[String], lo: MboxOffset): Unit = {
    val belowFiles = files.filter(_ <= lo.watermark)
    val below = belowFiles.size
    if (lo.seenBelow >= 0 && below > lo.seenBelow) throw new IllegalStateException(
      s"$label: ${below - lo.seenBelow} new file(s) sort at or below the " +
        s"committed watermark '${lo.watermark}' — a backfilled or non-monotonically " +
        "named file would be skipped silently. Ingest backfills with a batch read " +
        "or restart from a fresh checkpoint.")
    if (lo.digest.exists(d => below == lo.seenBelow && MboxOffset.setDigest(belowFiles) != d))
      throw new IllegalStateException(
        s"$label: the file set at or below the committed watermark " +
          s"'${lo.watermark}' changed membership at equal count — a backfilled " +
          "file replaced a deleted one and would be skipped silently. Ingest " +
          "backfills with a batch read or restart from a fresh checkpoint.")
  }
}
