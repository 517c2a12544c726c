package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unit specs for the scalar function surface (reference
  * sql-functions/src/test mirrors: GetSourceComponentTest,
  * NormalizeEmailThreadTest, ObfuscateTest semantics). */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("sourceComponent extracts the component ahead of /src/, pom.xml, special dirs") {
    assert(one(TextFunctions.sourceComponent(
      lit("flink-streaming-java/src/main/java/X.java"))) == "flink-streaming-java")
    assert(one(TextFunctions.sourceComponent(lit("flink-runtime/pom.xml"))) == "flink-runtime/")
    assert(one(TextFunctions.sourceComponent(lit("docs/content/docs/x.md"))) == "docs")
    assert(one(TextFunctions.sourceComponent(lit("tools/ci/x.sh"))) == "tools")
    assert(one(TextFunctions.sourceComponent(lit("flink-python/pyflink/t.py"))) == "flink-python")
    assert(one(TextFunctions.sourceComponent(lit("LICENSE"))) == null)
  }

  test("normalizeEmailThread strips stacked reply prefixes, case-insensitive") {
    assert(one(TextFunctions.normalizeEmailThread(lit("Re: re: AW: Hello World "))) == "Hello World")
    assert(one(TextFunctions.normalizeEmailThread(lit("Plain subject"))) == "Plain subject")
  }

  test("jira ticket extraction: action, number, from, is-ticket") {
    val subj = lit("[jira] [Created] (FLINK-12345) Some title")
    assert(one(TextFunctions.jiraTicketAction(subj)) == "Created")
    assert(one(TextFunctions.jiraTicketNumber(subj)) == "FLINK-12345")
    val from = lit("\"Jane Doe (Jira)\" <jira@apache.org>")
    // the reference's greedy `(.*)` keeps the trailing space before the
    // bracket (PatternUtils.java:26-27) — reproduced faithfully
    assert(one(TextFunctions.jiraTicketFrom(from)) == "Jane Doe ")
    assert(one(TextFunctions.isJiraTicket(from)) == true)
    assert(one(TextFunctions.isJiraTicket(lit("someone@example.com"))) == false)
  }

  test("jiraComponents splits on ', ' only outside parentheses") {
    import spark.implicits._
    val body = "x\n          Components: Formats (JSON, Avro), API / Python"
    val got = Seq(body).toDF("b")
      .select(TextFunctions.jiraComponents(col("b")).as("c"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("Formats (JSON, Avro)", "API / Python"))
  }

  test("obfuscate hashes the local part, keeps the domain") {
    val got = one(TextFunctions.obfuscate(lit("john@example.com"))).asInstanceOf[String]
    assert(got.endsWith("@example.com") && got.length == 6 + "@example.com".length)
    assert(!got.startsWith("john"))
    // deterministic
    assert(got == one(TextFunctions.obfuscate(lit("john@example.com"))))
  }

  test("sessionIds matches session_window boundary semantics (only gap > duration splits)") {
    import spark.implicits._
    val df = Seq(
      ("u", 0L), ("u", 100L),
      ("u", 100L + 7200L),         // exactly gap apart -> still merged
      ("u", 100L + 7200L + 7201L)  // strictly over gap -> new session
    ).toDF("k", "es").withColumn("ts", col("es").cast("timestamp"))
    val ids = graft.operators.Windows.sessionIds(df, col("k"), col("ts"), 7200L)
      .orderBy("es").select("session_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(0L, 0L, 0L, 1L))
    val nSessions = df.groupBy(session_window(col("ts"), "2 hours"), col("k"))
      .count().count()
    assert(nSessions == 2)
  }
}
