package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Behavior
import graft.sources.Tables

/** §2 event-sequence analytics tier — funnel conversion, cohort
  * retention, transition counts over the `events` stream table (the
  * behavioral questions the reference's windowed community analytics
  * stop short of). Operators live in [[graft.operators.Behavior]]; this
  * file binds them to the test tables and states each one's exact
  * DuckDB twin.
  */
object QueriesEvents {

  type Q = (SparkSession, String) => DataFrame

  private val day = 86400L

  /** Ordered funnel over the product-shaped event types: view → click →
    * purchase, strictly increasing timestamps, greedy earliest match. */
  val funnel: Q = (s, dir) =>
    Behavior.funnelReach(Tables(s, dir).events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  /** Daily cohort retention over first-activity cohorts. */
  val cohortRetention: Q = (s, dir) =>
    Behavior.cohortRetention(Tables(s, dir).events, "user_id", "ts", day)

  /** User-journey transition counts, day-chunked two-phase stitching
    * (must equal the oracle's single per-user window — the chunk
    * decomposition is a cost choice, never a semantics choice). */
  val transitions: Q = (s, dir) =>
    Behavior.transitionCounts(Tables(s, dir).events, "user_id", "ts",
      "event_id", "event_type", day)

  /** Daily activity matrix: one row per day, one count column per event
    * type — the pivot/wide reshaping, hand-lowered to per-type
    * conditional counts inside ONE map-side-combined aggregation: a
    * single calendar-keyed shuffle at any event volume, and absent
    * cells are 0 by construction (dense, engine-portable grid).
    * Deliberately NOT `Dataset.pivot`: with an explicit value list it
    * is semantically this exact query, but Spark plans it as TWO
    * aggregates ((key, value) partial then PivotFirst — two exchanges,
    * verified); the conditional-count lowering is what pivot means at
    * scale, so the library states it directly. */
  val pivotDaily: Q = (s, dir) => {
    val e = col("ts").cast("long")
    val types = Seq("view", "click", "purchase", "signup", "error")
    Tables(s, dir).events
      .select((e - (e % day)).as("w_start"), col("event_type"))
      .groupBy(col("w_start"))
      .agg(count(when(col("event_type") === types.head, 1)).as(s"n_${types.head}"),
        types.tail.map(t =>
          count(when(col("event_type") === t, 1)).as(s"n_$t")): _*)
  }

  val queries: Map[String, Q] = Map(
    "q_funnel"           -> funnel,
    "q_cohort_retention" -> cohortRetention,
    "q_pivot"            -> pivotDaily,
    "q_event_transitions" -> transitions)

  val oracle: Map[String, String] = Map(
    // es = second-truncated epoch: Tables.events truncates ts to seconds
    // (the engine-portable contract), so every comparison here must too
    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |r0 AS (
        |  SELECT user_id, MIN(es) AS rts FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |r1 AS (
        |  SELECT e.user_id, MIN(e.es) AS rts FROM ev e
        |  JOIN r0 ON e.user_id = r0.user_id
        |  WHERE e.event_type = 'click' AND e.es > r0.rts GROUP BY 1),
        |r2 AS (
        |  SELECT e.user_id, MIN(e.es) AS rts FROM ev e
        |  JOIN r1 ON e.user_id = r1.user_id
        |  WHERE e.event_type = 'purchase' AND e.es > r1.rts GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |       (SELECT COUNT(*) FROM r0) AS n_users
        |UNION ALL SELECT 1, 'click', (SELECT COUNT(*) FROM r1)
        |UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM r2)
        |""".stripMargin,
    "q_cohort_retention" ->
      s"""WITH grid AS (
        |  SELECT DISTINCT user_id, e - (e % $day) AS b
        |  FROM (SELECT user_id,
        |          CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS e
        |        FROM events) t),
        |c AS (SELECT user_id, MIN(b) AS cohort_start FROM grid GROUP BY 1)
        |SELECT c.cohort_start,
        |       CAST((g.b - c.cohort_start) // $day AS BIGINT) AS period,
        |       COUNT(*) AS n_users
        |FROM grid g JOIN c ON g.user_id = c.user_id
        |GROUP BY 1, 2
        |""".stripMargin,
    "q_pivot" ->
      s"""SELECT e - (e % $day) AS w_start,
        |  COUNT(*) FILTER (event_type = 'view')     AS n_view,
        |  COUNT(*) FILTER (event_type = 'click')    AS n_click,
        |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
        |  COUNT(*) FILTER (event_type = 'error')    AS n_error
        |FROM (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS e,
        |        event_type FROM events) t
        |GROUP BY 1
        |""".stripMargin,
    "q_event_transitions" ->
      """SELECT prev_type, event_type, COUNT(*) AS n
        |FROM (SELECT lag(event_type) OVER
        |        (PARTITION BY user_id
        |         ORDER BY date_trunc('second', ts), event_id) AS prev_type,
        |        event_type
        |      FROM events) t
        |WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2
        |""".stripMargin)
}
