package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence (behavioral) analytics over an event stream — funnel
  * conversion, cohort retention, and transition (user-journey) counts.
  * The reference's windowed community analytics (README "Community Data
  * Analytics Examples") answers "how much activity"; these answer the
  * next questions an event table gets asked: "in what ORDER", "does it
  * RETAIN", "what follows WHAT".
  *
  * Scale posture: none of the three ever windows over an unbounded
  * per-user partition of raw events. Funnel reach tables are user-dim
  * sized and each stage scans only its own type-filtered slice (pushed
  * predicate); retention collapses the corpus to the (user, bucket) grid
  * before anything wider runs; transitions use the time-chunked
  * two-phase carry (the [[Joins.asOfJoinChunked]] construction) so a
  * hot user's window partition is bounded by the chunk duration, never
  * by the user's total event volume.
  */
object Behavior {

  /** Ordered-funnel reach: for each stage k of `stages`, the users whose
    * event history contains the stage sequence `stages(0..k)` at STRICTLY
    * increasing timestamps, matched greedily (each stage matches its
    * EARLIEST occurrence after the previous stage's match — the greedy
    * match is complete: if any increasing assignment exists, the greedy
    * one does, since an earlier reach time only widens what can follow).
    * Returns one row per stage: (stage_idx, stage, n_users).
    *
    * Scale shape (r10 — the LINEAR chain): ONE accumulating user-dim
    * table carries every stage's reach timestamp as a column
    * (reach_0..reach_k, null = not reached), built by folding the
    * stages left to right: stage k's pass scans ONLY events of type
    * `stages(k)` (pushed `=` filter — the scan, not the engine,
    * discards the rest), LEFT-joins the slice onto the accumulator on
    * the user key, and min-aggregates `when(ts > reach_{k-1}, ts)` —
    * the null reach of an unconverted user propagates through the
    * `when`, so no inner-join chain is needed. Every stage slice is
    * scanned EXACTLY ONCE and all k counts come from one final 1-row
    * aggregate over the accumulator (the previous per-stage
    * union-of-counts formulation re-evaluated the shared reach chain
    * per branch — k(k+1)/2 corpus scans; at 100 TB the difference is
    * k-fold scan I/O). No per-user event array is ever collected, so a
    * bot user with 10⁹ events costs map-side-combined mins, not
    * memory. */
  def funnelReach(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "Behavior.funnelReach: at least one stage")
    require(stages.distinct == stages,
      "Behavior.funnelReach: repeated stage types need positional matching — " +
        "split the repeated stage into distinct marker types upstream")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("reach_0"))
    val acc = stages.zipWithIndex.tail.foldLeft(first) {
      case (prev, (stage, k)) =>
        val slice = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol).as("_ts"))
        val carried = (0 until k).map(j => min(col(s"reach_$j")).as(s"reach_$j"))
        val reached =
          min(when(col("_ts") > col(s"reach_${k - 1}"), col("_ts")))
            .as(s"reach_$k")
        prev.join(slice, Seq(userCol), "left")
          .groupBy(col(userCol))
          .agg(carried.head, (carried.tail :+ reached): _*)
    }
    val counts = acc.agg(
      count(col("reach_0")).as("c_0"),
      (1 until stages.size).map(k => count(col(s"reach_$k")).as(s"c_$k")): _*)
    val stageNames = array(stages.map(lit(_)): _*)
    counts
      .select(posexplode(array(stages.indices.map(k => col(s"c_$k")): _*))
        .as(Seq("_pos", "n_users")))
      .select(col("_pos").cast("long").as("stage_idx"),
        element_at(stageNames, col("_pos") + 1).as("stage"),
        col("n_users"))
  }

  /** Cohort retention grid: users cohort by the `bucketSeconds` bucket of
    * their FIRST event; for each (cohort, periods-since-cohort) cell,
    * the number of cohort members active in that bucket. Period 0 is the
    * cohort bucket itself, so each cohort's period-0 row is its size.
    * Returns (cohort_start, period, n_users).
    *
    * Scale shape: the corpus collapses to the distinct (user, bucket)
    * grid FIRST — one shuffle whose width is activity-buckets, not
    * events. Cohorts derive from that grid by a user-keyed min (strictly
    * smaller), and the grid joins back to its own cohort table on the
    * user key, so the widest thing ever shuffled is the grid. The final
    * (cohort, period) aggregation is calendar-bounded. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    val e = col(tsCol).cast("long")
    val grid = events
      .select(col(userCol), (e - (e % bucketSeconds)).as("b"))
      .distinct()
    val cohorts = grid.groupBy(col(userCol)).agg(min(col("b")).as("cohort_start"))
    grid.join(cohorts, userCol)
      .groupBy(col("cohort_start"),
        ((col("b") - col("cohort_start")) / bucketSeconds).cast("long").as("period"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user event-transition counts — the edge weights of the
    * user-journey graph: for every consecutive event pair of a user
    * (ordered by (ts, tie)), count (prev_type, event_type) occurrences.
    * A user's first event overall has no predecessor and contributes
    * nothing; rows whose predecessor has a null type contribute
    * nothing. Returns (prev_type, event_type, n).
    *
    * Scale shape (r10 — SKEW-ADAPTIVE routing, the q_salted_join /
    * AQE-skew-join idea applied to a window): the naive single
    * `Window.partitionBy(user)` puts a hot user's ENTIRE history
    * through one sorted task — but paying a chunked two-phase stitch
    * for EVERY user when none is hot nearly doubles the work (at a
    * uniform 30M-event corpus the (user, day) grid was 12M rows — 40%
    * of the corpus re-shuffled for protection nobody needed; measured
    * 13.7 s vs 6.5 s for this routing at sf30). So: one map-side-
    * combined user-dim COUNT finds the users whose total volume
    * exceeds `maxWindowEvents` (a partition-size bound: 1M rows ≈
    * tens of MB per sorted window partition). If there are none — the
    * overwhelmingly common shape, decided by one metadata-scale
    * driver-side gate — the plan IS the single-window plan: one corpus
    * shuffle+sort, no joins, no second pass. Otherwise the few heavy
    * users (skew means FEW by definition, so the heavy set always
    * broadcasts) are split out by broadcast anti/semi joins: light
    * users keep the plain window, heavy users run the chunked
    * two-phase decomposition — intra-chunk pairs from a window
    * partitioned on (user, chunk = `chunkSeconds` tumble of ts),
    * bounded by the user's rate × chunk duration at any total volume,
    * plus boundary pairs from a `min_by`/`max_by` chunk summary
    * (map-side partial combine; only heavy-grid-sized partials cross
    * the network) lagged over a per-user chunk window. Both unions
    * feed ONE final count. `tieCol` must be unique within (user, ts)
    * so the order — and therefore the transition multiset — is
    * deterministic on any engine (the oracle sorts by the same pair);
    * the light/heavy routing and the chunk decomposition are cost
    * choices, never semantics choices.
    *
    * `userCounts` (r11): the routing gate needs per-user totals, and
    * deriving them ad hoc costs a full corpus aggregate PER INVOCATION —
    * at 100 TB, a second complete scan to answer a question a catalog
    * answers from a dim table. Pass a precomputed user dim (columns:
    * `userCol`, `n_events` — the thing ingest pipelines maintain anyway)
    * and the gate becomes a dim-scale filter; counts may be UPPER BOUNDS
    * (stale stats that over-count only route more users to the chunked
    * path — a cost error, never a semantics error; under-counting can
    * un-protect a hot partition, so refresh stats on append). Omitted →
    * the self-contained corpus aggregate, correct but scan-priced. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, chunkSeconds: Long,
      maxWindowEvents: Long = 1000000L,
      userCounts: Option[DataFrame] = None): DataFrame = {
    def pairs(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.select(lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("_type"))
    def counted(p: DataFrame) = p
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("_type").as(typeCol))
      .agg(count(lit(1)).as("n"))
    val wUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    // heavy set from the provided user dim (dim-scale filter) or, absent
    // one, a user-dim aggregate (partial combine → tiny shuffle); either
    // way the gate is a metadata-scale driver decision, not a corpus
    // collect
    val heavy = userCounts
      .map(_.filter(col("n_events") > maxWindowEvents).select(col(userCol)))
      .getOrElse(events.groupBy(col(userCol))
        .agg(count(lit(1)).as("n_events"))
        .filter(col("n_events") > maxWindowEvents)
        .select(col(userCol)))
    if (heavy.isEmpty) return counted(pairs(events, wUser))
    val light = events.join(broadcast(heavy), Seq(userCol), "left_anti")
    val e = col(tsCol).cast("long")
    val chunked = events.join(broadcast(heavy), Seq(userCol), "left_semi")
      .withColumn("_chunk", e - (e % chunkSeconds))
    val wIntra = Window.partitionBy(col(userCol), col("_chunk"))
      .orderBy(col(tsCol), col(tieCol))
    // heavy boundary pairs: previous non-empty chunk's LAST type →
    // this chunk's FIRST type, built on the heavy (user, chunk) grid
    val wChunks = Window.partitionBy(col(userCol)).orderBy(col("_chunk"))
    val ord = struct(col(tsCol), col(tieCol))
    val boundary = chunked
      .groupBy(col(userCol), col("_chunk"))
      .agg(min_by(col(typeCol), ord).as("_first"),
        max_by(col(typeCol), ord).as("_last"))
      .select(lag(col("_last"), 1).over(wChunks).as("prev_type"),
        col("_first").as("_type"))
    counted(pairs(light, wUser)
      .unionByName(pairs(chunked, wIntra))
      .unionByName(boundary))
  }
}
