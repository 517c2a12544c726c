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
    * nothing. Returns (prev_type, event_type, n).
    *
    * Scale shape (the point of the construction): the naive single
    * `Window.partitionBy(user)` puts a hot user's ENTIRE history through
    * one sorted task. Here the window partitions on (user, chunk) where
    * chunk = `chunkSeconds` tumble of ts — bounded by the user's rate ×
    * chunk duration at any total volume — and the chunk BOUNDARIES are
    * stitched by a second, chunk-table-sized pass: each chunk's last
    * event type (the lead-null row of the SAME sorted window — no second
    * corpus scan or shuffle) lags over a per-user window whose partition
    * is the user's non-empty CHUNK count, then joins back to the
    * chunk-first rows. ONE corpus shuffle total; everything after is
    * grid-sized. `tieCol` must be unique within (user, ts) so the order
    * — and therefore the transition multiset — is deterministic on any
    * engine (the oracle sorts by the same pair). */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, chunkSeconds: Long): DataFrame = {
    val e = col(tsCol).cast("long")
    val wIntra = Window.partitionBy(col(userCol), col("_chunk"))
      .orderBy(col(tsCol), col(tieCol))
    val marked = events
      .withColumn("_chunk", e - (e % chunkSeconds))
      .withColumn("_prev_in", lag(col(typeCol), 1).over(wIntra))
      .withColumn("_is_last", lead(col(typeCol), 1).over(wIntra).isNull)
    // chunk summary: each chunk's last event type, then the previous
    // non-empty chunk's last type via a per-user chunk-table window
    val wChunks = Window.partitionBy(col(userCol)).orderBy(col("_chunk"))
    val carry = marked.filter(col("_is_last"))
      .select(col(userCol), col("_chunk"), col(typeCol).as("_last_type"))
      .withColumn("_prev_last", lag(col("_last_type"), 1).over(wChunks))
      .select(col(userCol), col("_chunk"), col("_prev_last"))
    marked
      .join(carry, Seq(userCol, "_chunk"), "left")
      .select(coalesce(col("_prev_in"), col("_prev_last")).as("prev_type"),
        col(typeCol))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol))
      .agg(count(lit(1)).as("n"))
  }
}
