package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level ports of the reference's scalar/table SQL functions.
  *
  * Everything here composes builtin (codegen'd) Catalyst expressions —
  * the Spark-native replacement for the reference's `ScalarFunction` /
  * `TableFunction` UDF classes in sql-functions/src/main/java/com/
  * ververica/platform/sql/functions. No Scala UDFs: these stay inside
  * whole-stage codegen and cost the same as handwritten expressions.
  */
object TextFunctions {

  private def nullIfEmpty(c: Column): Column = when(c =!= "", c)

  /** GetSourceComponent.java — component of a repo file path, NULL when none. */
  def sourceComponent(filename: Column): Column =
    nullIfEmpty(regexp_extract(filename, Patterns.SourceComponent, 1))

  /** NormalizeEmailThread.java — strip reply prefixes / surrounding space. */
  def normalizeEmailThread(subject: Column): Column =
    regexp_extract(subject, Patterns.EmailThread, 1)

  /** GetJiraTicketAction.java — e.g. Created/Updated/..., NULL when not a Jira mail. */
  def jiraTicketAction(subject: Column): Column =
    nullIfEmpty(regexp_extract(subject, Patterns.JiraSubject, 1))

  /** GetJiraTicketNumber.java — "FLINK-12345", NULL when not a Jira mail. */
  def jiraTicketNumber(subject: Column): Column =
    nullIfEmpty(regexp_extract(subject, Patterns.JiraSubject, 2))

  /** GetJiraTicketFrom.java — ticket author from the From field. */
  def jiraTicketFrom(fromRaw: Column): Column =
    nullIfEmpty(regexp_extract(fromRaw, Patterns.JiraFrom, 1))

  /** IsJiraTicket.java — whether the From field is Jira's sender format. */
  def isJiraTicket(fromRaw: Column): Column =
    coalesce(fromRaw.rlike(Patterns.JiraFrom), lit(false))

  /** GetJiraTicketComponents.java — raw comma-list line, NULL if absent.
    * (The reference returns String[]; splitting is [[jiraComponents]].) */
  def jiraComponentsRaw(textBody: Column): Column =
    nullIfEmpty(regexp_extract(textBody, Patterns.JiraComponentsLine, 1))

  /** Bracket-aware split of a components list (ExpandJiraTicketComponents.java). */
  def jiraComponents(textBody: Column): Column =
    split(jiraComponentsRaw(textBody), Patterns.ComponentsSplit)

  /** Obfuscate.java — md5-short(6) of the part before '@', domain kept. */
  def obfuscate(email: Column): Column = {
    val local  = substring_index(email, "@", 1)
    val hashed = substring(md5(local), 1, 6)
    when(email.isNull, lit(null).cast("string"))
      .when(email.contains("@"), concat(hashed, lit("@"), substring_index(email, "@", -1)))
      .otherwise(hashed)
  }

  /** The domain ("company") of an email address, NULL when malformed. */
  def emailDomain(email: Column): Column =
    when(email.contains("@") && substring_index(email, "@", -1) =!= "",
      substring_index(email, "@", -1))

  /** GetEmailAliasesAndCompany.java:52-76 — domains never counted as companies. */
  val CompanyExcludes: Seq[String] = Seq(
    "126.com", "163.com", "apache.org", "gmail.com", "gmx.de", "gmx.net", "gmx.org",
    "googlemail.com", "hotmail.com", "hotmail.de", "hotmail.it", "icloud.com", "live.com",
    "live.it", "mail.ru", "mailbox.org", "msn.com", "outlook.com", "outlook.de", "pobox.com",
    "posteo.de", "users.noreply.github.com", "web.de", "yahoo.com", "yahoo.in", "qq.com")
}
