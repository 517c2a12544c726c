package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.{Synth, Tables}

/** §2.b — the reference's SQL function surface (scalar / table / aggregate),
  * re-expressed as codegen'd Catalyst expressions over synthesized views.
  *
  * Array-valued results are emitted as deterministic joined strings
  * (sorted where the reference is order-insensitive) so the DuckDB hash
  * compare is portable; the in-library API returns real arrays.
  */
object QueriesFn {

  type Q = (SparkSession, String) => DataFrame

  /** GetSourceComponent.java over synthesized repo paths (part table). */
  val fnSourceComponent: Q = (s, dir) =>
    Synth.repoFiles(Tables(s, dir).part)
      .select(col("p_partkey"), col("filename"), sourceComponent(col("filename")).as("component"))

  /** NormalizeEmailThread.java — reply-prefix stripping. */
  val fnNormalizeEmailThread: Q = (s, dir) =>
    Synth.emails(Tables(s, dir).documents)
      .select(col("doc_id"), col("subject"), normalizeEmailThread(col("subject")).as("thread"))

  /** GetJiraTicket{Action,Number,From}.java + IsJiraTicket.java in one pass. */
  val fnJiraTicket: Q = (s, dir) =>
    Synth.emails(Tables(s, dir).documents)
      .select(
        col("doc_id"),
        jiraTicketAction(col("subject")).as("action"),
        jiraTicketNumber(col("subject")).as("ticket"),
        jiraTicketFrom(col("from_raw")).as("ticket_from"),
        isJiraTicket(col("from_raw")).as("is_jira"))

  /** GetJiraTicketComponents.java — bracket-aware component list split
    * (PatternUtils.java:43-44). Joined with '|' for portable compare. */
  val fnJiraComponents: Q = (s, dir) =>
    Synth.emails(Tables(s, dir).documents)
      .filter(jiraComponentsRaw(col("text_body")).isNotNull)
      .select(
        col("doc_id"),
        jiraComponentsRaw(col("text_body")).as("comps_raw"),
        array_join(jiraComponents(col("text_body")), "|").as("components"))

  /** ExpandJiraTicketComponents2.java — table function emitting
    * (component, componentCount) per row. */
  val fnExpandJiraComponents: Q = (s, dir) => {
    val withArr = Synth.emails(Tables(s, dir).documents)
      .filter(jiraComponentsRaw(col("text_body")).isNotNull)
      .select(col("doc_id"), jiraComponents(col("text_body")).as("comps"))
    withArr.select(
      col("doc_id"),
      explode(col("comps")).as("component"),
      size(col("comps")).as("component_count"))
  }

  /** Obfuscate.java — md5-short(6) of the email local part, domain kept. */
  val fnObfuscate: Q = (s, dir) =>
    Synth.emails(Tables(s, dir).documents)
      .select(col("doc_id"), col("from_email"), obfuscate(col("from_email")).as("obfuscated"))
      .distinct()

  /** ArrayRepeat.java — emitted as a joined string. */
  val fnArrayRepeat: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"), col("lang"),
        (col("doc_id") % 4).cast("int").as("n"),
        array_join(array_repeat(col("lang"), (col("doc_id") % 4).cast("int")), ",").as("repeated"))

  // ---- aggregates over the per-user email stream ---------------------------

  /** Per-user message stream with a nullable measurement (every 7th null)
    * used by the order-sensitive aggregate queries. */
  private def stream(s: SparkSession, dir: String): DataFrame =
    Synth.emails(Tables(s, dir).documents)
      .select(
        (col("doc_id") % 50).cast("long").as("user_id"),
        col("mail_date"),
        when(col("doc_id") % 7 =!= 0, col("lang")).as("val"),
        split(col("subject"), " ").as("arr"),
        col("doc_id"))

  /** ArrayListAggFunction.java — null-skipping collect-to-array. */
  val aggArrayCollect: Q = (s, dir) =>
    stream(s, dir)
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_list(col("val"))), ",").as("vals"),
        count(col("val")).as("n_non_null"),
        count(lit(1)).as("n_rows"))

  /** LastNonNullValueAggFunction[2].java — latest non-null by event time. */
  val aggLastNonNull: Q = (s, dir) =>
    stream(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(col("val"), when(col("val").isNotNull, col("mail_date"))).as("last_val"))

  /** LargestStringArrayAggFunction.java — keep the largest array
    * (doc_id tiebreak for determinism). The ordering key is a fixed-width
    * zero-padded string (len, doc_id): lexicographic order == numeric
    * order, no overflow at any doc_id (a packed `len*1e6 + doc_id` long
    * flips once doc_id >= 1e6), and DuckDB's arg_max accepts it (it has
    * no struct-keyed overload). */
  val aggLargestArray: Q = (s, dir) =>
    stream(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(
        array_join(col("arr"), " "),
        concat(
          lpad(size(col("arr")).cast("string"), 10, "0"),
          lpad(col("doc_id").cast("string"), 19, "0"))).as("largest_arr"))

  /** LastValueStringArrayAggFunction.java — keep the latest array by time. */
  val aggLastArray: Q = (s, dir) =>
    stream(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(array_join(col("arr"), " "), col("mail_date")).as("last_arr"))

  /** LISTAGG(DISTINCT …) (ListAggITCase11[23].java) — deterministic order. */
  val aggListaggDistinct: Q = (s, dir) =>
    stream(s, dir)
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("val"))), ",").as("langs"))

  /** GetEmailAliasesAndCompany.java — alias set + most-recent non-freemail
    * domain as company (+ since-date of its trailing run) + ververica
    * domain aliasing. Order-dependent accumulate expressed as
    * gaps-and-islands over the excluded-filtered domain sequence: one
    * window shuffle on user_id, same key as the final agg. */
  val aggEmailAliasesCompany: Q = (s, dir) => {
    val emails = Synth.emails(Tables(s, dir).documents)
      .select(
        (col("doc_id") % 50).cast("long").as("user_id"),
        col("from_email").as("email"),
        col("mail_date"))
    val valid = emails
      .withColumn("domain", emailDomain(col("email")))
      .filter(col("domain").isNotNull && !col("domain").isin(CompanyExcludes: _*))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("mail_date"))
    val runs = valid
      .withColumn("is_new",
        when(lag(col("domain"), 1).over(byUser).isNull ||
          lag(col("domain"), 1).over(byUser) =!= col("domain"), 1).otherwise(0))
      .withColumn("run_id", sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    // max over an unordered window on the SAME partitioning the lag/sum
    // windows already shuffled on — zero extra shuffles, vs a
    // groupBy(max)+join-back which re-shuffles the full runs relation.
    val company = runs
      .withColumn("max_run", max(col("run_id")).over(Window.partitionBy(col("user_id"))))
      .filter(col("run_id") === col("max_run"))
      .groupBy(col("user_id"))
      .agg(
        regexp_replace(min(col("domain")), "(data-artisans|da-platform).com", "ververica.com")
          .as("company"),
        min(col("mail_date")).cast("long").as("company_since"))
    val aliases = emails
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("email"))), ",").as("aliases"))
    aliases.join(company, Seq("user_id"), "left")
      .select(col("user_id"), col("aliases"), col("company"), col("company_since"))
  }

  val queries: Map[String, Q] = Map(
    "q_fn_source_component"        -> fnSourceComponent,
    "q_fn_normalize_email_thread"  -> fnNormalizeEmailThread,
    "q_fn_jira_ticket"             -> fnJiraTicket,
    "q_fn_jira_components"         -> fnJiraComponents,
    "q_fn_expand_jira_components"  -> fnExpandJiraComponents,
    "q_fn_obfuscate"               -> fnObfuscate,
    "q_fn_array_repeat"            -> fnArrayRepeat,
    "q_agg_array_collect"          -> aggArrayCollect,
    "q_agg_last_non_null"          -> aggLastNonNull,
    "q_agg_largest_array"          -> aggLargestArray,
    "q_agg_last_array"             -> aggLastArray,
    "q_agg_listagg_distinct"       -> aggListaggDistinct,
    "q_agg_email_aliases_company"  -> aggEmailAliasesCompany)

  // ---- DuckDB oracles ------------------------------------------------------

  /** DuckDB twin of the per-user stream CTE. */
  private val streamCte: String =
    Synth.emailsCte + """,
stream AS (
  SELECT CAST(doc_id % 50 AS BIGINT) AS user_id, mail_date,
    CASE WHEN doc_id % 7 <> 0 THEN lang END AS val,
    string_split(subject, ' ') AS arr, doc_id
  FROM emails
)"""

  /** Bracket-aware split in RE2-land: mask ", " inside parens (two passes
    * cover the reference corpus's <=2 inner commas), operate, unmask. */
  private def masked(expr: String): String =
    s"""regexp_replace(regexp_replace($expr, '\\(([^),]*), ', '(\\1<<C>>', 'g'),
       |'\\(([^),]*), ', '(\\1<<C>>', 'g')""".stripMargin.linesIterator.mkString(" ")

  val oracle: Map[String, String] = Map(
    "q_fn_source_component" -> (
      "WITH " + Synth.repoFilesCte + """
SELECT p_partkey, filename, """ + Synth.componentCaseSql.linesIterator.mkString(" ") + """ AS component
FROM repo_files"""),

    "q_fn_normalize_email_thread" -> (
      "WITH " + Synth.emailsCte + """
SELECT doc_id, subject,
  regexp_extract(subject, '(?i)^\s*(?:(?:Re|AW):\s*)*(.*?)\s*$', 1) AS thread
FROM emails"""),

    "q_fn_jira_ticket" -> (
      "WITH " + Synth.emailsCte + """
SELECT doc_id,
  nullif(regexp_extract(subject, '^\[jira\]\s*\[(.*)\]\s*\((FLINK-[0-9]+)\).*$', 1), '') AS action,
  nullif(regexp_extract(subject, '^\[jira\]\s*\[(.*)\]\s*\((FLINK-[0-9]+)\).*$', 2), '') AS ticket,
  nullif(regexp_extract(from_raw, '^"(.*)\s*\((?:Jira|JIRA)\)"\s*<jira@apache\.org>$', 1), '') AS ticket_from,
  regexp_matches(from_raw, '^"(.*)\s*\((?:Jira|JIRA)\)"\s*<jira@apache\.org>$') AS is_jira
FROM emails"""),

    "q_fn_jira_components" -> (
      "WITH " + Synth.emailsCte + """,
jira AS (
  SELECT doc_id, regexp_extract(text_body, ' {10}Components: (.*)', 1) AS comps_raw
  FROM emails WHERE regexp_matches(text_body, ' {10}Components: ')
)
SELECT doc_id, comps_raw,
  replace(replace(""" + masked("comps_raw") + """, ', ', '|'), '<<C>>', ', ') AS components
FROM jira"""),

    "q_fn_expand_jira_components" -> (
      "WITH " + Synth.emailsCte + """,
jira AS (
  SELECT doc_id, string_split(""" + masked(
      "regexp_extract(text_body, ' {10}Components: (.*)', 1)") + """, ', ') AS comps
  FROM emails WHERE regexp_matches(text_body, ' {10}Components: ')
)
SELECT doc_id, replace(unnest(comps), '<<C>>', ', ') AS component,
  CAST(len(comps) AS INT) AS component_count
FROM jira"""),

    "q_fn_obfuscate" -> (
      "WITH " + Synth.emailsCte + """
SELECT DISTINCT doc_id, from_email,
  substr(md5(split_part(from_email, '@', 1)), 1, 6) || '@' || split_part(from_email, '@', 2) AS obfuscated
FROM emails"""),

    "q_fn_array_repeat" ->
      """SELECT doc_id, lang, CAST(doc_id % 4 AS INT) AS n,
        |  CASE WHEN doc_id % 4 = 0 THEN ''
        |       ELSE substr(repeat(lang || ',', CAST(doc_id % 4 AS INT)), 1,
        |                   (length(lang)+1) * CAST(doc_id % 4 AS INT) - 1) END AS repeated
        |FROM documents""".stripMargin,

    "q_agg_array_collect" -> (
      "WITH " + streamCte + """
SELECT user_id,
  array_to_string(list_sort(list(val) FILTER (WHERE val IS NOT NULL)), ',') AS vals,
  COUNT(val) AS n_non_null, COUNT(*) AS n_rows
FROM stream GROUP BY 1"""),

    "q_agg_last_non_null" -> (
      "WITH " + streamCte + """
SELECT user_id, arg_max(val, mail_date) FILTER (WHERE val IS NOT NULL) AS last_val
FROM stream GROUP BY 1"""),

    "q_agg_largest_array" -> (
      "WITH " + streamCte + """
SELECT user_id,
  arg_max(array_to_string(arr, ' '),
          lpad(CAST(len(arr) AS VARCHAR), 10, '0') || lpad(CAST(doc_id AS VARCHAR), 19, '0')) AS largest_arr
FROM stream GROUP BY 1"""),

    "q_agg_last_array" -> (
      "WITH " + streamCte + """
SELECT user_id, arg_max(array_to_string(arr, ' '), mail_date) AS last_arr
FROM stream GROUP BY 1"""),

    "q_agg_listagg_distinct" -> (
      "WITH " + streamCte + """
SELECT user_id,
  array_to_string(list_sort(list(DISTINCT val) FILTER (WHERE val IS NOT NULL)), ',') AS langs
FROM stream GROUP BY 1"""),

    "q_agg_email_aliases_company" -> (
      "WITH " + Synth.emailsCte + """,
ustream AS (
  SELECT CAST(doc_id % 50 AS BIGINT) AS user_id, from_email AS email, mail_date
  FROM emails
), valid AS (
  SELECT user_id, email, mail_date, split_part(email, '@', 2) AS domain
  FROM ustream
  WHERE split_part(email, '@', 2) NOT IN (""" +
      graft.functions.TextFunctions.CompanyExcludes.map("'" + _ + "'").mkString(",") + """)
    AND split_part(email, '@', 2) <> ''
), marked AS (
  SELECT user_id, domain, mail_date,
    CASE WHEN lag(domain) OVER w IS NULL OR lag(domain) OVER w <> domain
         THEN 1 ELSE 0 END AS is_new
  FROM valid
  WINDOW w AS (PARTITION BY user_id ORDER BY mail_date)
), runs AS (
  SELECT user_id, domain, mail_date,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY mail_date ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
), last_run AS (
  SELECT user_id, MAX(run_id) AS max_run FROM runs GROUP BY 1
), company AS (
  SELECT r.user_id,
    regexp_replace(MIN(r.domain), '(data-artisans|da-platform).com', 'ververica.com') AS company,
    CAST(epoch(MIN(r.mail_date)) AS BIGINT) AS company_since
  FROM runs r JOIN last_run l ON r.user_id = l.user_id AND r.run_id = l.max_run
  GROUP BY 1
), aliases AS (
  SELECT user_id, array_to_string(list_sort(list(DISTINCT email)), ',') AS aliases
  FROM ustream GROUP BY 1
)
SELECT a.user_id, a.aliases, c.company, c.company_since
FROM aliases a LEFT JOIN company c ON a.user_id = c.user_id""")
  )
}
