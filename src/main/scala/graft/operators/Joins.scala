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
    * SKEW BOUND: the window partition is one key's ENTIRE history, so
    * the hottest key's row count must fit one task — the right default
    * when keys are users/sessions/devices (millions of modest keys).
    * For a corpus where one key carries a constant fraction of all rows
    * (a global sentinel key, one dominant tenant), use
    * [[asOfJoinChunked]], whose partitions are bounded by
    * rows-per-(key, chunk) at any skew — demonstrated on a 90%-one-key
    * corpus in SkewSpec.
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
    // fail-loud on working-name collisions (same convention as
    // Freq.heavyHitters' require): an input already carrying one of the
    // fabricated columns would silently corrupt the union/window logic
    val reserved = Seq("_tag", "_id", "_r_id", "asof_id") ++
      rightPayload.map { case (_, a) => s"_p_$a" }
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOfJoin: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val aliasClash = rightPayload.map(_._2).filter(Seq(key, ts, leftId, "asof_id").contains)
    require(aliasClash.isEmpty,
      s"asOfJoin: payload aliases shadow output columns: ${aliasClash.mkString(", ")}")
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

  /** [[asOfJoin]] with BOUNDED window partitions — the skew-proof form.
    *
    * The one-window form above puts a key's ENTIRE history through one
    * sorted window task; a 90%-one-key corpus (one hot user, one global
    * sentinel key) serializes 90% of 100 TB into that task. This variant
    * decomposes by time, mirroring [[rangeAggFixed]]'s segment-tree
    * trick and Sampling.packSequences' two-phase prefix sum:
    *
    *   1. the unioned stream windows over (key, chunk) where
    *      `chunk = ts div chunkSeconds` — partition size is bounded by
    *      one key's rows in ONE chunk, whatever the key skew;
    *   2. per-(key, chunk) carry-outs (the chunk's final right-state:
    *      latest right id by (ts, id), plus per-payload latest NON-NULL
    *      value — tracked separately, because the running state the
    *      window carries is last-non-null per column) aggregate to one
    *      row per occupied chunk — bounded by time-range/chunkSeconds,
    *      not by row count;
    *   3. carry-ins (latest carry-out of any EARLIER chunk) resolve with
    *      a window over that tiny spine, join back on (key, chunk) —
    *      reusing the step-1 partitioning — and fill where the local
    *      running state is null.
    *
    * Exactly [[asOfJoin]]'s semantics (property-tested equivalent in
    * JoinsProps over arbitrary geometry and chunk widths, ties and
    * cross-chunk lookbacks included); costs 2 extra bounded-size
    * shuffles, so the one-window form stays the default for corpora
    * whose hottest key fits an executor. */
  def asOfJoinChunked(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, leftId: String, rightId: String,
      rightPayload: Seq[(String, String)], chunkSeconds: Long = 86400L): DataFrame = {
    require(chunkSeconds > 0)
    val aliases = rightPayload.map(_._2)
    val reserved = Seq("_tag", "_id", "_r_id", "_chunk", "asof_id") ++
      aliases.map(a => s"_p_$a") ++ aliases.map(a => s"_co_$a") ++ aliases.map(a => s"_ci_$a")
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOfJoinChunked: input columns collide with reserved working names: ${clash.mkString(", ")}")
    require(aliases.filter(Seq(key, ts, leftId, "asof_id").contains).isEmpty,
      "asOfJoinChunked: payload aliases shadow output columns")

    val payloadIn = rightPayload.map { case (c, a) => col(c).as(s"_p_$a") }
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_tag"), col(rightId).as("_id"),
        col(rightId).as("_r_id")) ++ payloadIn: _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("_tag"), col(leftId).as("_id"),
        lit(null).cast(r.schema("_r_id").dataType).as("_r_id")) ++
        rightPayload.map { case (c, a) =>
          lit(null).cast(r.schema(s"_p_$a").dataType).as(s"_p_$a") }: _*)
    val chunk = floor(unix_timestamp(col(ts)) / chunkSeconds)
    val u = r.unionByName(l).withColumn("_chunk", chunk)

    // 1. running right-state WITHIN (key, chunk) — the bounded window
    val wLoc = Window.partitionBy(col(key), col("_chunk"))
      .orderBy(col(ts).asc, col("_tag").asc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u
      .withColumn("asof_id", last(col("_r_id"), ignoreNulls = true).over(wLoc))
      .withColumns(rightPayload.map { case (_, a) =>
        a -> last(col(s"_p_$a"), ignoreNulls = true).over(wLoc) }.toMap)

    // 2. per-(key, chunk) carry-outs, right rows only; one row per
    // occupied chunk. Per-payload max_by keys on a null-when-payload-null
    // ordinal so it tracks the latest NON-NULL value, matching what
    // last(_, ignoreNulls) carries across the boundary.
    val rc = r.withColumn("_chunk", chunk)
    val ord = struct(col(ts), col("_id"))
    val carryOut = rc.groupBy(col(key), col("_chunk"))
      .agg(max_by(col("_r_id"), ord).as("_co_id"),
        rightPayload.map { case (_, a) =>
          max_by(col(s"_p_$a"), when(col(s"_p_$a").isNotNull, ord)).as(s"_co_$a") }: _*)

    // 3. carry-ins over the occupied-chunk spine (strictly earlier chunks)
    val wPrev = Window.partitionBy(col(key)).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = u.select(col(key), col("_chunk")).distinct()
      .join(carryOut, Seq(key, "_chunk"), "left")
      .withColumn("_ci_id", last(col("_co_id"), ignoreNulls = true).over(wPrev))
      .withColumns(rightPayload.map { case (_, a) =>
        s"_ci_$a" -> last(col(s"_co_$a"), ignoreNulls = true).over(wPrev) }.toMap)
      .select(col(key) +: col("_chunk") +: col("_ci_id") +:
        rightPayload.map { case (_, a) => col(s"_ci_$a") }: _*)

    local.join(spine, Seq(key, "_chunk"))
      .filter(col("_tag") === 1)
      .select(Seq(col("_id").as(leftId), col(key), col(ts),
        coalesce(col("asof_id"), col("_ci_id")).as("asof_id")) ++
        rightPayload.map { case (_, a) =>
          coalesce(col(a), col(s"_ci_$a")).as(a) }: _*)
  }

  /** Explicit SALTED equi-join for hot-key skew — the mitigation for
    * the one regime AQE's runtime skew splitting does not cover: when
    * the join output must stay hash-distributed for a downstream
    * keyed stage, AQE skips the split (see SkewSpec's note), and when
    * the small side outgrows broadcast the naive shuffle join pins the
    * hot key's entire row set on one reducer.
    *
    * Shape: each big-side row takes a deterministic salt in [0, salts)
    * — pmod(hash(saltBy)), so retries re-derive the SAME salt and no
    * RNG state exists (the house determinism rule) — while the small
    * side replicates once per salt value via one row-local explode.
    * The join keys on (key, salt): the hot key's rows now spread over
    * `salts` reducers, each holding a full copy of the small side's
    * rows for that key, and each big row meets exactly the one replica
    * carrying its salt — multiplicity is preserved, so the result is
    * row-identical to the plain join (the oracle IS the plain join).
    * Cost: the small side shuffles salts× its size — the explicit
    * trade a skewed 100 TB join makes, priced at `salts`, and the
    * reason `salts` is a parameter rather than a large constant.
    *
    * The join is hinted SHUFFLE_HASH: this operator exists precisely
    * for the not-broadcastable regime, and a hashed join needs no sort
    * on either side.
    *
    * @param saltBy a roughly-unique big-side column (an id) whose hash
    *               spreads the hot key's rows across salts
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltBy: String, salts: Int): DataFrame = {
    require(salts >= 2, s"saltedJoin: salts=$salts (use a plain join for 1)")
    val clash = (big.columns ++ small.columns).distinct.filter(_ == "_salt")
    require(clash.isEmpty,
      "saltedJoin: input columns collide with reserved working name _salt")
    val b = big.withColumn("_salt", pmod(hash(col(saltBy)), lit(salts)))
    val sm = small.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    b.join(sm.hint("shuffle_hash"),
        b(bigKey) === sm(smallKey) && b("_salt") === sm("_salt"))
      .drop(b("_salt")).drop(sm("_salt"))
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
      // guard BEFORE the explode: an empty/inverted interval ([lo, lo) or
      // hi < lo — bad data) can match nothing under `lo <= ts < hi`, but
      // unguarded it feeds sequence() a start > stop, which silently
      // generates a DESCENDING bucket array (default step -1) — a fan-out
      // cliff, not a correctness error, so it must fail closed here
      .filter(hiS > loS)
      // a non-empty [lo, hi) touches buckets floor(lo/W)..floor((hi-1)/W),
      // an ascending range since hi-1 >= lo
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
