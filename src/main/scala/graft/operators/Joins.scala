package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's relational algebra lacks as built-ins
  * — as-of join and interval (range) join — re-expressed as shapes that
  * scale: neither ever materializes a time-cross-product, and both key
  * their single shuffle on a bounded-cardinality column.
  *
  * These fill the "operator Spark lacks" tier of the custom-operator
  * ladder at rung ONE (compose existing ops): both semantics reduce
  * exactly to union+window / bucket-equi-join forms, so a custom
  * LogicalPlan would only opt them out of AQE and codegen (see
  * SURVEY.md §4 ladder note).
  */
object Joins {

  /** As-of join: for each left row, the single right row with the
    * greatest `ts <=` the left row's `ts` within the same `key` (ties on
    * right ts broken by greatest `rightId`) — the event-attribution /
    * point-in-time-lookup join (DuckDB/kdb ASOF JOIN, pandas merge_asof).
    *
    * Shape: NOT a range join. Both sides union into one stream tagged
    * left/right and a single window over (key ORDER BY ts, tag, id)
    * carries the latest right payload forward with
    * `last(..., ignoreNulls)`; left rows then read their answer off the
    * running state. ONE shuffle total (the window partition on `key`),
    * zero joins, and no per-left-row scan of right history — at 100 TB
    * the alternative (theta-join on `r.ts <= l.ts` + per-left argmax)
    * re-shuffles BOTH tables into a near-cross-product per key; this
    * form is linear in rows and carries right payloads only as running
    * window state. A right row at the same second as a left row counts
    * as "at or before" (tag orders right rows first within a second,
    * matching ASOF's inclusive `>=`).
    *
    * @param left     rows to enrich; must carry `key`, `ts`, `leftId`
    * @param right    lookup stream; must carry `key`, `ts`, `rightId`
    *                 plus `rightPayload` columns to surface
    * @return left rows + `asof_id` (matched rightId, null if no match) +
    *         the aliased payload columns, null when unmatched
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, leftId: String, rightId: String,
      rightPayload: Seq[(String, String)]): DataFrame = {
    // one unioned stream: right rows carry their payload, left rows null
    val payloadIn = rightPayload.map { case (c, a) => col(c).as(s"_p_$a") }
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_tag"), col(rightId).as("_id"),
        col(rightId).as("_r_id")) ++ payloadIn: _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("_tag"), col(leftId).as("_id"),
        lit(null).cast(r.schema("_r_id").dataType).as("_r_id")) ++
        rightPayload.map { case (c, a) =>
          lit(null).cast(r.schema(s"_p_$a").dataType).as(s"_p_$a") }: _*)
    // within a key: time order, right-before-left at equal ts (inclusive
    // as-of), greatest rightId wins a right-side ts tie
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_tag").asc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val answered = r.unionByName(l)
      .withColumn("asof_id", last(col("_r_id"), ignoreNulls = true).over(w))
      .withColumns(rightPayload.map { case (_, a) =>
        a -> last(col(s"_p_$a"), ignoreNulls = true).over(w) }.toMap)
    answered.filter(col("_tag") === 1)
      .select(Seq(col("_id").as(leftId), col(key), col(ts), col("asof_id")) ++
        rightPayload.map { case (_, a) => col(a) }: _*)
  }

  /** Interval (range) join: pair each probe row with every interval
    * containing its timestamp.
    *
    * Shape: NOT a theta-join. An interval [lo, hi) explodes to one row
    * per fixed-width time bucket it touches and a probe ts falls in
    * exactly ONE bucket — so a bucket equi-join followed by the exact
    * `lo <= ts < hi` refinement produces each qualifying pair exactly
    * once, with no dedup step (the probe's single bucket is either in
    * the interval's touched set or not). The shuffle keys on the bucket
    * number; Catalyst plans a plain hash join (broadcast when one side
    * is small) instead of the BroadcastNestedLoopJoin a raw inequality
    * join forces — the difference between a linear pipeline and an
    * O(|probe|x|interval|) scan at 100 TB.
    *
    * Bucket sizing is a fan-out/candidate trade, not a correctness
    * constraint: an interval touches ~length/bucketSeconds+1 buckets
    * (its side's fan-out), while each probe's candidate set is every
    * interval overlapping its bucket (~density x (length +
    * bucketSeconds)). bucketSeconds ≈ the typical interval length keeps
    * both within 2x of optimal.
    *
    * @param intervals must carry `ivId`, `lo`, `hi` (timestamps, [lo,hi))
    * @param probes    must carry `ts` plus any payload columns
    * @return probe rows + their matching `ivId` (inner-join semantics)
    */
  def rangeJoin(
      intervals: DataFrame, probes: DataFrame,
      ivId: String, lo: String, hi: String, ts: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val loS = unix_timestamp(col(lo))
    val hiS = unix_timestamp(col(hi))
    val ivb = intervals
      // [lo, hi) touches buckets floor(lo/W)..floor((hi-1)/W)
      .withColumn("_bucket",
        explode(sequence(floor(loS / bucketSeconds),
          floor((hiS - 1) / bucketSeconds))))
      .select(col(ivId), col(lo), col(hi), col("_bucket"))
    val pb = probes.withColumn("_bucket",
      floor(unix_timestamp(col(ts)) / bucketSeconds))
    pb.join(ivb, "_bucket")
      .filter(col(ts) >= col(lo) && col(ts) < col(hi))
      .drop("_bucket", lo, hi)
  }

  /** Convenience overload: intervals given as (start, fixed length). */
  def rangeJoinFixed(
      intervals: DataFrame, probes: DataFrame,
      ivId: String, lo: String, lengthSeconds: Long, ts: String): DataFrame = {
    val iv = intervals.withColumn("_hi",
      timestamp_seconds(unix_timestamp(col(lo)) + lengthSeconds))
    rangeJoin(iv, probes, ivId, lo, "_hi", ts, bucketSeconds = lengthSeconds)
  }

  /** Interval AGGREGATION without the pair stream: per-interval count and
    * sum over `[lo, lo+lengthSeconds)`, decomposed segment-tree style.
    *
    * [[rangeJoin]] + groupBy is the right tool when the caller needs the
    * PAIRS; when it only needs algebraic aggregates per interval, the
    * pair stream is pure waste — at high interval density (the 100 TB
    * shape: overlapping monitoring/attribution windows) it carries
    * |probes| × avg-overlap rows, billions where the answer needs
    * millions. Decomposition instead:
    *
    *   1. probes pre-aggregate per SECOND (the ts resolution), then per
    *      `blockSeconds` block — two map-side-heavy aggs whose output is
    *      bounded by the TIME RANGE, not the probe count;
    *   2. an interval covers ≤ lengthSeconds/blockSeconds+1 full blocks
    *      (joined against the tiny block table) plus ≤ 2 second-level
    *      edge ranges (joined against the per-second table on the edge
    *      block key);
    *   3. per-interval partials sum — longs, exact, order-independent.
    *
    * The candidate stream shrinks from |probes| × density to
    * |seconds| × edge-density + |intervals| × blocks-per-interval.
    * Same inner-join semantics as rangeJoin+count: zero-probe intervals
    * emit nothing.
    *
    * @param valueExpr probe-side LONG column to sum (pass `lit(1L)` to
    *                  count only); must be non-null
    */
  def rangeAggFixed(
      intervals: DataFrame, probes: DataFrame,
      ivId: String, lo: String, lengthSeconds: Long, ts: String,
      valueExpr: org.apache.spark.sql.Column,
      blockSeconds: Long = 900L): DataFrame = {
    require(blockSeconds > 0 && lengthSeconds > 0)
    val w = lit(blockSeconds)
    // per-second then per-block pre-aggregation of the probe stream
    val fine = probes
      .select(unix_timestamp(col(ts)).as("sec"), valueExpr.as("v"))
      .groupBy(col("sec"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("vsum"))
      .withColumn("blk", floor(col("sec") / w))
    val blocks = fine.groupBy(col("blk"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("vsum")).as("vsum"))
    val iv = intervals.select(col(ivId),
      unix_timestamp(col(lo)).as("loS"),
      (unix_timestamp(col(lo)) + lengthSeconds).as("hiS"))
    // full blocks: [ceil(lo/W), floor(hi/W)) — entirely inside [lo, hi)
    val fullLo = ceil(col("loS") / w).cast("long")
    val fullHi = floor(col("hiS") / w)
    val fullPart = iv
      .withColumn("blk", explode(when(fullLo < fullHi,
        sequence(fullLo, fullHi - 1)).otherwise(array().cast("array<long>"))))
      .join(blocks, "blk")
      .select(col(ivId), col("cnt"), col("vsum"))
    // edge ranges: the (≤2 distinct) boundary blocks not fully covered,
    // each clamped to [max(lo, blk*W), min(hi, (blk+1)*W)) and resolved
    // at second granularity
    val edgePart = iv
      .withColumn("blk", explode(array_distinct(
        filter(array(floor(col("loS") / w), floor((col("hiS") - 1) / w)),
          b => b < fullLo || b >= fullHi))))
      .withColumn("elo", greatest(col("loS"), col("blk") * w))
      .withColumn("ehi", least(col("hiS"), (col("blk") + 1) * w))
      .join(fine, "blk")
      .filter(col("sec") >= col("elo") && col("sec") < col("ehi"))
      .select(col(ivId), col("cnt"), col("vsum"))
    fullPart.unionByName(edgePart)
      .groupBy(col(ivId))
      .agg(sum(col("cnt")).as("n_events"), sum(col("vsum")).as("sum_val"))
  }
}
