package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** Typed entity accessors (row 39/40) and the declared-schema JSON
  * round-trip (row 41, the Kafka-shape import tier). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("typed catalog: Dataset[Commit]/[Email]/[PullRequest] accessors decode") {
    val t = Tables(spark, sfDir)
    val c = t.commitsTyped.head()
    assert(c.files_changed.nonEmpty && c.files_changed.forall(_.filename.nonEmpty))
    assert(c.author.startsWith("user"))
    val e = t.emailsTyped.head()
    assert(e.subject.nonEmpty && e.from_email.contains("@"))
    val p = t.pullsTyped.filter((p: PullRequest) => p.state != "open").head()
    assert(p.closed_at.isDefined)
  }

  test("JSON lines round-trip preserves the typed entities exactly") {
    val t = Tables(spark, sfDir)
    val dir = "/tmp/graft_json_test"
    val commits = t.commitsTyped
    JsonIO.write(commits, s"$dir/commits")
    val back = JsonIO.readCommits(spark, s"$dir/commits")
    // declared-schema JSON reads are always nullable; types must match
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(back.schema) == shape(commits.schema))
    val a = commits.collect().sortBy(_.event_id).toSeq
    val b = back.collect().sortBy(_.event_id).toSeq
    assert(a == b)

    val emails = t.emailsTyped
    JsonIO.write(emails, s"$dir/emails")
    assert(JsonIO.readEmails(spark, s"$dir/emails").count() == emails.count())
  }
}
