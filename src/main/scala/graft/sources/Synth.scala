package graft.sources

import org.apache.spark.sql.DataFrame

/** Deterministic entity synthesis: maps driver testdata onto the
  * reference's data model (SURVEY.md §3) *inside the query*, so the
  * DuckDB oracle sees byte-identical inputs.
  *
  * Every builder has a `*Cte` twin — the same derivation in DuckDB SQL —
  * kept adjacent so they can't drift. Spark side uses `selectExpr`
  * (Catalyst expressions, fully codegen'd).
  *
  * Reference entities: common/src/main/java/com/ververica/platform/
  * entities/{Email,Commit,PullRequest}.java.
  */
object Synth {

  // ---- emails (documents → reference Email.java shape) -------------------

  private val domains = "'gmail.com','ververica.com','alibaba-inc.com','apache.org','163.com','da-platform.com','outlook.com'"
  private val actions = "'Created','Updated','Commented','Resolved','Closed'"
  private val comps =
    "'API / DataStream'," +
      "'Formats (JSON, Avro, Parquet), API / Python'," +
      "'Runtime / Coordination'," +
      "'Table SQL / API, Connectors / Kafka'," +
      "'Formats (CSV, Text)'"

  /** Synthesized mailing-list view: Jira-format subjects/senders on every
    * 3rd doc, reply-prefixed subjects otherwise, a Jira components line
    * (10-space indented, reference PatternUtils.java:33) on every 6th. */
  def emails(documents: DataFrame): DataFrame = documents.selectExpr(
    "doc_id", "lang", "source", "n_chars", "text",
    // BIGINT-safe arithmetic: a CAST(doc_id*37 AS INT) would wrap silently
    // (non-ANSI) once doc_id exceeds ~58M; make_interval keeps it exact.
    "TIMESTAMP'2024-03-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, CAST(doc_id*2220 AS DECIMAL(18,6))) AS mail_date",
    s"""CASE WHEN doc_id % 3 = 0
        THEN concat('[jira] [', element_at(array($actions), CAST(doc_id%5 AS INT)+1),
                    '] (FLINK-', CAST(10000+doc_id AS STRING), ') Question about ', substr(text,1,10))
        ELSE concat(repeat('Re: ', CAST(doc_id%3 AS INT)), 'Question about ', substr(text,1,10))
        END AS subject""",
    s"""CASE WHEN doc_id % 3 = 0
        THEN concat('"user', CAST(doc_id%50 AS STRING), ' (Jira)" <jira@apache.org>')
        ELSE concat('user', CAST(doc_id%50 AS STRING), '@',
                    element_at(array($domains), CAST(doc_id%7 AS INT)+1))
        END AS from_raw""",
    s"concat('user', CAST(doc_id%50 AS STRING), '@', element_at(array($domains), CAST(doc_id%7 AS INT)+1)) AS from_email",
    s"""CASE WHEN doc_id % 6 = 0
        THEN concat(text, chr(10), repeat(' ', 10), 'Components: ',
                    element_at(array($comps), CAST(doc_id%5 AS INT)+1))
        ELSE text END AS text_body""")

  /** DuckDB twin of [[emails]] (list indexing is 1-based, like element_at). */
  val emailsCte: String =
    s"""emails AS (
       |  SELECT doc_id, lang, source, n_chars, text,
       |    TIMESTAMP '2024-03-01 00:00:00' + to_minutes(doc_id*37) AS mail_date,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN '[jira] [' || ([$actions])[CAST(doc_id%5 AS INT)+1]
       |           || '] (FLINK-' || CAST(10000+doc_id AS VARCHAR) || ') Question about ' || substr(text,1,10)
       |      ELSE repeat('Re: ', CAST(doc_id%3 AS INT)) || 'Question about ' || substr(text,1,10)
       |      END AS subject,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN '"user' || CAST(doc_id%50 AS VARCHAR) || ' (Jira)" <jira@apache.org>'
       |      ELSE 'user' || CAST(doc_id%50 AS VARCHAR) || '@' || ([$domains])[CAST(doc_id%7 AS INT)+1]
       |      END AS from_raw,
       |    'user' || CAST(doc_id%50 AS VARCHAR) || '@' || ([$domains])[CAST(doc_id%7 AS INT)+1] AS from_email,
       |    CASE WHEN doc_id % 6 = 0
       |      THEN text || chr(10) || repeat(' ', 10) || 'Components: ' || ([$comps])[CAST(doc_id%5 AS INT)+1]
       |      ELSE text END AS text_body
       |  FROM documents
       |)""".stripMargin

  // ---- repo file paths (part → filenames for component extraction) -------

  /** Path shapes chosen to exercise every regex alternative class:
    * `/src/` lookahead, special-cased dirs, pom.xml, and a no-match. */
  val filenameExpr: String =
    """CASE CAST(p_partkey % 7 AS INT)
      | WHEN 0 THEN concat('flink-streaming-java/src/main/java/', replace(p_name,' ','/'), '.java')
      | WHEN 1 THEN concat('flink-table/flink-sql-client/lib/', replace(p_name,' ','-'), '.txt')
      | WHEN 2 THEN concat('docs/content/docs/', replace(p_name,' ','-'), '.md')
      | WHEN 3 THEN 'flink-runtime/pom.xml'
      | WHEN 4 THEN concat('tools/ci/', replace(p_name,' ','_'), '.sh')
      | WHEN 5 THEN concat('flink-python/pyflink/table/', replace(p_name,' ','_'), '.py')
      | ELSE 'LICENSE' END""".stripMargin

  def repoFiles(part: DataFrame): DataFrame =
    part.selectExpr("p_partkey", s"$filenameExpr AS filename")

  /** DuckDB twin — `concat`/`replace`/CASE are portable, reused verbatim. */
  val repoFilesCte: String =
    s"""repo_files AS (
       |  SELECT p_partkey, ${filenameExpr.linesIterator.mkString(" ")} AS filename
       |  FROM part
       |)""".stripMargin

  /** DuckDB-side component extraction must avoid RE2-unsupported
    * lookaheads; this CASE reproduces the reference pattern's outcome for
    * the path shapes [[filenameExpr]] generates (incl. the trailing '/'
    * the lazy group keeps before `pom.xml`). */
  val componentCaseSql: String =
    """CASE
      | WHEN position('/src/' IN filename) > 0 THEN substr(filename, 1, position('/src/' IN filename)-1)
      | WHEN filename LIKE 'flink-table/flink-sql-client/%' THEN 'flink-table/flink-sql-client'
      | WHEN filename LIKE 'docs/%' THEN 'docs'
      | WHEN filename LIKE 'flink-docs/%' THEN 'flink-docs'
      | WHEN filename LIKE '%pom.xml' THEN substr(filename, 1, length(filename)-7)
      | WHEN filename LIKE 'tools/%' THEN 'tools'
      | WHEN filename LIKE 'flink-python/%' THEN 'flink-python'
      | ELSE NULL END""".stripMargin

  // ---- commits (events → reference Commit.java shape) --------------------

  private def fname(k: String): String =
    s"""CASE CAST(($k) % 5 AS INT)
       | WHEN 0 THEN concat('flink-core/src/main/java/F', CAST($k AS STRING), '.java')
       | WHEN 1 THEN concat('flink-runtime/src/test/java/T', CAST($k AS STRING), '.java')
       | WHEN 2 THEN concat('docs/content/p', CAST($k AS STRING), '.md')
       | WHEN 3 THEN concat('flink-table/flink-sql-client/conf/c', CAST($k AS STRING), '.yaml')
       | ELSE concat('tools/azure/t', CAST($k AS STRING), '.sh') END""".stripMargin.linesIterator.mkString(" ")

  private def fnameDuck(k: String): String =
    s"""CASE CAST(($k) % 5 AS INT)
       | WHEN 0 THEN 'flink-core/src/main/java/F' || CAST($k AS VARCHAR) || '.java'
       | WHEN 1 THEN 'flink-runtime/src/test/java/T' || CAST($k AS VARCHAR) || '.java'
       | WHEN 2 THEN 'docs/content/p' || CAST($k AS VARCHAR) || '.md'
       | WHEN 3 THEN 'flink-table/flink-sql-client/conf/c' || CAST($k AS VARCHAR) || '.yaml'
       | ELSE 'tools/azure/t' || CAST($k AS VARCHAR) || '.sh' END""".stripMargin.linesIterator.mkString(" ")

  /** Commits view: nested ARRAY<STRUCT<filename,linesChanged>> like the
    * reference's Commit.filesChanged (1–3 files per commit). `ts` is
    * pre-truncated to seconds by [[Tables.events]]. */
  def commits(events: DataFrame): DataFrame = events.selectExpr(
    "event_id", "ts AS commit_date", "concat('user', CAST(user_id AS STRING)) AS author",
    "event_type",
    s"""CASE CAST(event_id % 3 AS INT)
        WHEN 0 THEN array(named_struct('filename', ${fname("event_id")}, 'linesChanged', CAST(FLOOR(value) AS INT)))
        WHEN 1 THEN array(named_struct('filename', ${fname("event_id")}, 'linesChanged', CAST(FLOOR(value) AS INT)),
                          named_struct('filename', ${fname("event_id+1")}, 'linesChanged', CAST(FLOOR(value*2) AS INT)))
        ELSE array(named_struct('filename', ${fname("event_id")}, 'linesChanged', CAST(FLOOR(value) AS INT)),
                   named_struct('filename', ${fname("event_id+1")}, 'linesChanged', CAST(FLOOR(value*2) AS INT)),
                   named_struct('filename', ${fname("event_id+2")}, 'linesChanged', CAST(FLOOR(value) AS INT)+7))
        END AS files_changed""")

  val commitsCte: String =
    s"""commits AS (
       |  SELECT event_id, date_trunc('second', ts) AS commit_date,
       |    'user' || CAST(user_id AS VARCHAR) AS author, event_type,
       |    CASE CAST(event_id % 3 AS INT)
       |      WHEN 0 THEN [{'filename': ${fnameDuck("event_id")}, 'linesChanged': CAST(FLOOR(value) AS INT)}]
       |      WHEN 1 THEN [{'filename': ${fnameDuck("event_id")}, 'linesChanged': CAST(FLOOR(value) AS INT)},
       |                   {'filename': ${fnameDuck("event_id+1")}, 'linesChanged': CAST(FLOOR(value*2) AS INT)}]
       |      ELSE [{'filename': ${fnameDuck("event_id")}, 'linesChanged': CAST(FLOOR(value) AS INT)},
       |            {'filename': ${fnameDuck("event_id+1")}, 'linesChanged': CAST(FLOOR(value*2) AS INT)},
       |            {'filename': ${fnameDuck("event_id+2")}, 'linesChanged': CAST(FLOOR(value) AS INT)+7}]
       |      END AS files_changed
       |  FROM events
       |)""".stripMargin

  // ---- pulls (orders → reference PullRequest.java shape) -----------------

  def pulls(orders: DataFrame): DataFrame = orders.selectExpr(
    "o_orderkey AS number",
    "concat('user', CAST(o_custkey % 100 AS STRING)) AS creator",
    "CASE o_orderstatus WHEN 'F' THEN 'closed' WHEN 'O' THEN 'open' ELSE 'merged' END AS state",
    "o_orderdate AS created_at",
    "CASE WHEN o_orderstatus <> 'O' THEN timestampadd(DAY, CAST(o_orderkey%90 AS INT)+1, o_orderdate) END AS closed_at",
    "CASE WHEN o_orderstatus = 'P' THEN timestampadd(DAY, CAST(o_orderkey%90 AS INT)+1, o_orderdate) END AS merged_at",
    "CAST(o_orderkey % 23 AS INT) AS comments_count",
    "o_totalprice AS weight")

  val pullsCte: String =
    """pulls AS (
      |  SELECT o_orderkey AS number,
      |    'user' || CAST(o_custkey % 100 AS VARCHAR) AS creator,
      |    CASE o_orderstatus WHEN 'F' THEN 'closed' WHEN 'O' THEN 'open' ELSE 'merged' END AS state,
      |    o_orderdate AS created_at,
      |    CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + to_days(CAST(o_orderkey%90 AS INT)+1) END AS closed_at,
      |    CASE WHEN o_orderstatus = 'P' THEN o_orderdate + to_days(CAST(o_orderkey%90 AS INT)+1) END AS merged_at,
      |    CAST(o_orderkey % 23 AS INT) AS comments_count,
      |    o_totalprice AS weight
      |  FROM orders
      |)""".stripMargin
}
