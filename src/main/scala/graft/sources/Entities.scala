package graft.sources

import java.sql.Timestamp

/** Typed entity model mirroring the reference's POJOs
  * (common/src/main/java/com/ververica/platform/entities/
  * {Commit,FileChanged,Email,PullRequest}.java), as case classes with
  * `Encoders.product` — the Spark-native typed surface over the same
  * views the DataFrame queries use. */
final case class FileChanged(filename: String, linesChanged: Int)

final case class Commit(
    event_id: Long,
    commit_date: Timestamp,
    author: String,
    event_type: String,
    files_changed: Seq[FileChanged])

final case class Email(
    doc_id: Long,
    mail_date: Timestamp,
    subject: String,
    from_raw: String,
    from_email: String,
    text_body: String)

final case class PullRequest(
    number: Long,
    creator: String,
    state: String,
    created_at: Timestamp,
    closed_at: Option[Timestamp],
    merged_at: Option[Timestamp],
    comments_count: Int,
    weight: Double)
