package graft.functions

/** Regex patterns reproducing the reference semantics.
  *
  * Sources (reference, cited by file:line):
  *  - common/src/main/java/com/ververica/platform/PatternUtils.java:8-11
  *    (source-filename component), :17-18 (email thread), :21-23 (jira
  *    subject), :26-27 (jira from), :33-34 (jira components line), :43-44
  *    (bracket-aware comma split).
  *
  * These run through Spark's codegen'd regexp expressions (java.util.regex
  * underneath), so lookaheads used by the reference work verbatim — no UDFs.
  */
object Patterns {

  /** Flink source-code component from a repo-relative path. */
  val SourceComponent: String =
    "^(.+?(?=/src/.*|pom.xml|README.md)|(?:flink-)?docs(?=/.*)|tools(?=/.*)|flink-python(?=/.*)|" +
      "flink-end-to-end-tests/test-scripts(?=/.*)|flink-scala-shell(?=/start-script/.*)|" +
      "flink-container(?=/.*)|flink-contrib/docker-flink(?=/.*)|flink-table/flink-sql-client(?=/.*)|" +
      "flink-end-to-end-tests(?=/[^/]*\\.sh)).*?"

  /** Email subject normalized to its thread (strips reply prefixes). */
  val EmailThread: String = "(?i)^\\s*(?:(?:Re|AW):\\s*)*(.*?)\\s*$"

  /** Jira ticket action + number from an email subject (full-string match,
    * like the reference's `matcher.matches()`). Group 1 = action, 2 = number. */
  val JiraSubject: String = "^\\[jira\\]\\s*\\[(.*)\\]\\s*\\((FLINK-[0-9]+)\\).*$"

  /** Jira ticket author from the From field (full-string match). Group 1 = author. */
  val JiraFrom: String = "^\"(.*)\\s*\\((?:Jira|JIRA)\\)\"\\s*<jira@apache.org>$"

  /** Line of a Jira email body carrying the components list. Group 1 = list. */
  val JiraComponentsLine: String = " {10}Components: (.*)"

  /** Splits a component list on ", " outside parentheses (lookahead over
    * pairwise-bracketed content — e.g. "Formats (JSON, Avro), API" → 2). */
  val ComponentsSplit: String = ", (?=(?:[^(]*\\([^)]*\\))*[^)]*$)"
}
