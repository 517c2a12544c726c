package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.{Synth, Tables}

/** §2.a — the reference's own analytics pipelines, Spark-first.
  *
  * Each query returns only scalar columns (epoch-second BIGINTs for
  * timestamps, doubles produced from exact decimal/integer arithmetic) so
  * the driver's DuckDB hash compare is engine-portable.
  */
object QueriesRef {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship: FlinkCommitProgram.java:74-88 — keyed 1h tumbling window,
    * sum of lines changed. Partial aggregation before the single shuffle
    * on (window, key) is Spark's builtin equivalent of the reference's
    * ComponentChangedAggeragator pre-aggregator. */
  val componentActivity: Q = (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sum_dec"), count(lit(1)).as("n_events"))
      .select(
        col("window.start").cast("long").as("w_start"),
        col("event_type"),
        col("sum_dec").cast("double").as("lines_changed"),
        col("n_events"))

  /** README "Commit Activity per Month": 30d tumble + HAVING SUM > t. */
  val componentActivityMonth: Q = (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "30 days"), col("event_type"))
      .agg(sum(floor(col("value")).cast("long")).as("lines_changed"))
      .filter(col("lines_changed") > 1000)
      .select(col("window.start").cast("long").as("w_start"), col("event_type"), col("lines_changed"))

  /** README "Distinct Users per Year" (365d tumble → 7d here: the
    * testdata spans one month): exact COUNT(DISTINCT) per window. */
  val distinctUsersPerWindow: Q = (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "7 days"))
      .agg(countDistinct(col("user_id")).as("num_users"), count(lit(1)).as("num_events"))
      .select(col("window.start").cast("long").as("w_start"), col("num_users"), col("num_events"))

  /** README "Emails with no Reply within 30 Days": session windows (2h
    * gap over the event stream) via Spark's native session_window. */
  val sessionWindows: Q = (s, dir) =>
    Tables(s, dir).events
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(floor(col("value")).cast("long")).as("sum_value"))
      .select(
        col("session_window.start").cast("long").as("sess_start"),
        col("session_window.end").cast("long").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** README "Jira Created Tickets per Month": regex-gated explode of the
    * components list + 7d tumble + HAVING. */
  val jiraTicketsPerMonth: Q = (s, dir) => {
    val emails = Synth.emails(Tables(s, dir).documents)
    emails
      .filter(isJiraTicket(col("from_raw")) && jiraComponentsRaw(col("text_body")).isNotNull)
      .select(
        graft.operators.Windows.tumbleStart(col("mail_date"), 7L * 86400),
        explode(jiraComponents(col("text_body"))).as("component"))
      .groupBy(col("w_start"), col("component"))
      .agg(count(lit(1)).as("created_tickets"))
      .filter(col("created_tickets") > 1)
  }

  /** CROSS JOIN UNNEST(filesChanged) over the nested commits model
    * (FlinkCommitsToKafka.java schema) + component extraction. */
  val explodeFiles: Q = (s, dir) => {
    val commits = Synth.commits(Tables(s, dir).events)
    commits
      .select(explode(col("files_changed")).as("fc"))
      .select(sourceComponent(col("fc.filename")).as("component"), col("fc.linesChanged").as("lines"))
      .groupBy(col("component"))
      .agg(sum(col("lines").cast("long")).as("lines_changed"), count(lit(1)).as("n_files"))
  }

  /** PR lifecycle stats over the pulls view (PullRequest.java shape). */
  val pullRequestStats: Q = (s, dir) => {
    val pulls = Synth.pulls(Tables(s, dir).orders)
    pulls
      .filter(col("state") =!= "open")
      .withColumn("days_to_close", datediff(col("closed_at"), col("created_at")))
      .groupBy(col("state"))
      .agg(
        count(lit(1)).as("n_pulls"),
        (sum(col("days_to_close")).cast("double") / count(col("days_to_close"))).as("avg_days_to_close"),
        expr("CAST(percentile(days_to_close, 0.5) AS DOUBLE)").as("med_days_to_close"),
        max(col("comments_count")).as("max_comments"))
  }

  /** Thread normalization + per-thread message/sender counts
    * (NormalizeEmailThread.java + README session example). */
  val emailThreads: Q = (s, dir) => {
    val emails = Synth.emails(Tables(s, dir).documents)
    emails
      .select(
        normalizeEmailThread(col("subject")).as("thread"),
        col("from_email"), col("mail_date"))
      .groupBy(col("thread"))
      .agg(
        count(lit(1)).as("n_messages"),
        countDistinct(col("from_email")).as("n_senders"),
        min(col("mail_date")).cast("long").as("first_ts"),
        max(col("mail_date")).cast("long").as("last_ts"))
      .filter(col("n_messages") > 1)
  }

  /** The reference's flagship "Emails with no Reply within 30 Days"
    * (README.md:229-235): sessionize by normalized thread with a 30-day
    * gap, keep sessions with a single message
    * (SESSION(date, INTERVAL '30' DAY), NormalizeEmailThread(subject),
    * HAVING COUNT(*) < 2). */
  val emailsNoReply: Q = (s, dir) => {
    val emails = Synth.emails(Tables(s, dir).documents)
    emails
      .select(normalizeEmailThread(col("subject")).as("thread"), col("mail_date"))
      .groupBy(session_window(col("mail_date"), "30 days"), col("thread"))
      .agg(count(lit(1)).as("n_messages"))
      .filter(col("n_messages") < 2)
      .select(col("session_window.start").cast("long").as("sess_start"),
        col("thread"), col("n_messages"))
  }

  /** The composed README flagship "Commit Activity per Month and Flink
    * Component" (reference README.md:241-252): 30d tumble ×
    * GetSourceComponent(filename) over CROSS JOIN UNNEST(filesChanged),
    * HAVING SUM(linesChanged) > 1000. Explode + regex run before the
    * single shuffle on (window, component); partial aggregation shrinks
    * the exploded rows map-side — the plan holds at any fact size. */
  val commitActivityComponent: Q = (s, dir) => {
    val commits = Synth.commits(Tables(s, dir).events)
    commits
      .select(col("commit_date"), explode(col("files_changed")).as("fc"))
      .select(col("commit_date"),
        sourceComponent(col("fc.filename")).as("component"),
        col("fc.linesChanged").cast("long").as("lines"))
      .groupBy(window(col("commit_date"), "30 days"), col("component"))
      .agg(sum(col("lines")).as("lines_changed"))
      .filter(col("lines_changed") > 1000)
      .select((col("window.start").cast("long") + 2592000L).as("w_end"),
        col("component"), col("lines_changed"))
  }

  val queries: Map[String, Q] = Map(
    "q_commit_activity_component" -> commitActivityComponent,
    "q_component_activity"        -> componentActivity,
    "q_emails_no_reply"           -> emailsNoReply,
    "q_component_activity_month"  -> componentActivityMonth,
    "q_distinct_users_per_window" -> distinctUsersPerWindow,
    "q_session_windows"           -> sessionWindows,
    "q_jira_tickets_per_month"    -> jiraTicketsPerMonth,
    "q_explode_files"             -> explodeFiles,
    "q_pull_request_stats"        -> pullRequestStats,
    "q_email_threads"             -> emailThreads)

  // ---- DuckDB oracles ------------------------------------------------------

  // Two-pass paren-comma masking stands in for the reference's lookahead
  // split (PatternUtils.java:43-44); handles up to two commas per group.
  // NOTE: oracle strings interpolating Synth CTEs are built by plain
  // concatenation — stripMargin over interpolated multi-line content would
  // eat leading `||` continuations.
  private val splitComponents =
    """replace(unnest(string_split(
      regexp_replace(regexp_replace(comps_raw, '\(([^),]*), ', '(\1<<C>>', 'g'),
                     '\(([^),]*), ', '(\1<<C>>', 'g'),
      ', ')), '<<C>>', ', ')"""

  val oracle: Map[String, String] = Map(
    "q_component_activity" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_start, event_type,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS lines_changed,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_component_activity_month" ->
      """SELECT e - (e % 2592000) AS w_start, event_type,
        |  CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS lines_changed
        |FROM (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS e, event_type, value FROM events) t
        |GROUP BY 1, 2 HAVING SUM(CAST(FLOOR(value) AS BIGINT)) > 1000""".stripMargin,

    "q_distinct_users_per_window" ->
      """SELECT e - (e % 604800) AS w_start, COUNT(DISTINCT user_id) AS num_users, COUNT(*) AS num_events
        |FROM (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS e, user_id FROM events) t
        |GROUP BY 1""".stripMargin,

    // Session semantics follow Spark's session_window: a row whose gap to
    // the previous row is STRICTLY greater than the gap duration opens a
    // new session (an event exactly `gap` later still merges — verified
    // in FunctionsSpec); the session end is last_ts + gap.
    "q_session_windows" ->
      """WITH e AS (
        |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |         CAST(FLOOR(value) AS BIGINT) AS fv
        |  FROM events
        |), marked AS (
        |  SELECT user_id, es, fv,
        |    CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
        |           OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 7200
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e
        |), sess AS (
        |  SELECT user_id, es, fv,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY es ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked
        |)
        |SELECT MIN(es) AS sess_start, MAX(es) + 7200 AS sess_end, user_id,
        |  COUNT(*) AS n_events, CAST(SUM(fv) AS BIGINT) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q_emails_no_reply" -> (
      "WITH " + Synth.emailsCte + """,
th AS (
  SELECT regexp_extract(subject, '(?i)^\s*(?:(?:Re|AW):\s*)*(.*?)\s*$', 1) AS thread,
         CAST(epoch(mail_date) AS BIGINT) AS es
  FROM emails
), marked AS (
  SELECT thread, es,
    CASE WHEN lag(es) OVER (PARTITION BY thread ORDER BY es) IS NULL
           OR es - lag(es) OVER (PARTITION BY thread ORDER BY es) > 2592000
         THEN 1 ELSE 0 END AS is_new
  FROM th
), sess AS (
  SELECT thread, es,
    SUM(is_new) OVER (PARTITION BY thread ORDER BY es ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT MIN(es) AS sess_start, thread, COUNT(*) AS n_messages
FROM sess GROUP BY thread, sid HAVING COUNT(*) < 2"""),

    "q_explode_files" -> (
      "WITH " + Synth.commitsCte + """,
exploded AS (
  SELECT unnest(files_changed) AS fc FROM commits
), flat AS (
  SELECT fc.filename AS filename, fc.linesChanged AS lines FROM exploded
)
SELECT """ + Synth.componentCaseSql.linesIterator.mkString(" ") + """ AS component,
  CAST(SUM(CAST(lines AS BIGINT)) AS BIGINT) AS lines_changed, COUNT(*) AS n_files
FROM flat GROUP BY 1"""),

    "q_commit_activity_component" -> (
      "WITH " + Synth.commitsCte + """,
exploded AS (
  SELECT CAST(epoch(commit_date) AS BIGINT) AS e, unnest(files_changed) AS fc FROM commits
), flat AS (
  SELECT e, fc.filename AS filename, CAST(fc.linesChanged AS BIGINT) AS lines FROM exploded
)
SELECT e - (e % 2592000) + 2592000 AS w_end,
  """ + Synth.componentCaseSql.linesIterator.mkString(" ") + """ AS component,
  CAST(SUM(lines) AS BIGINT) AS lines_changed
FROM flat GROUP BY 1, 2 HAVING SUM(lines) > 1000"""),

    "q_pull_request_stats" -> (
      "WITH " + Synth.pullsCte + """
SELECT state, COUNT(*) AS n_pulls,
  CAST(SUM(date_diff('day', created_at, closed_at)) AS DOUBLE) / COUNT(*) AS avg_days_to_close,
  CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY date_diff('day', created_at, closed_at)) AS DOUBLE) AS med_days_to_close,
  MAX(comments_count) AS max_comments
FROM pulls WHERE state <> 'open' GROUP BY 1"""),

    "q_email_threads" -> (
      "WITH " + Synth.emailsCte + """
SELECT regexp_extract(subject, '(?i)^\s*(?:(?:Re|AW):\s*)*(.*?)\s*$', 1) AS thread,
  COUNT(*) AS n_messages, COUNT(DISTINCT from_email) AS n_senders,
  CAST(epoch(MIN(mail_date)) AS BIGINT) AS first_ts,
  CAST(epoch(MAX(mail_date)) AS BIGINT) AS last_ts
FROM emails GROUP BY 1 HAVING COUNT(*) > 1"""),

    "q_jira_tickets_per_month" -> (
      "WITH " + Synth.emailsCte + """,
jira AS (
  SELECT CAST(epoch(mail_date) AS BIGINT) AS e,
         regexp_extract(text_body, ' {10}Components: (.*)', 1) AS comps_raw
  FROM emails
  WHERE regexp_matches(from_raw, '^"(.*)\s*\((?:Jira|JIRA)\)"\s*<jira@apache\.org>$')
    AND regexp_matches(text_body, ' {10}Components: ')
), exploded AS (
  SELECT e - (e % 604800) AS w_start, """ + splitComponents + """ AS component FROM jira
)
SELECT w_start, component, COUNT(*) AS created_tickets
FROM exploded GROUP BY 1, 2 HAVING COUNT(*) > 1""")
  )
}
