package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowing operators mirroring the reference's Flink windows.
  *
  * Tumble ≙ Spark's `window(ts, dur)` (epoch-aligned, same as Flink
  * TUMBLE — reference README "Community Data Analytics Examples").
  * Session ≙ Spark's native `session_window` for grouped aggregation, or
  * [[sessionIds]] when per-row session assignment is needed (batch
  * gaps-and-islands: one `lag` + one running sum over the same
  * partitioning — a single shuffle on the session key, which is the only
  * shuffle the whole sessionization needs at any scale).
  */
object Windows {

  /** Epoch seconds of the tumbling window start containing `ts`. */
  def tumbleStart(ts: Column, seconds: Long): Column = {
    val e = ts.cast("long")
    (e - (e % seconds)).as("w_start")
  }

  /** Adds `session_id` (0-based per key) for a gap-based session split.
    * Rows whose `ts` is STRICTLY more than `gapSeconds` after the previous
    * row of the same key start a new session — empirically verified to be
    * Spark `session_window`'s boundary rule (an event exactly `gap` after
    * the previous one still merges; see FunctionsSpec). */
  def sessionIds(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val byKey   = Window.partitionBy(key).orderBy(ts)
    val prev    = lag(ts.cast("long"), 1).over(byKey)
    val isNew   = when(prev.isNull || (ts.cast("long") - prev) > gapSeconds, 1).otherwise(0)
    df.withColumn("session_id", sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** Resamples an irregular event stream onto a fixed `stepSeconds` grid
    * per key, carrying the last observed value forward through empty
    * buckets (LOCF — the gap-fill every metrics/feature pipeline needs
    * before a model sees regularly-spaced series).
    *
    * Construction (the scale argument is the point):
    *   1. rows collapse to ONE row per (key, bucket) by map-side-combined
    *      max-struct aggregation (the value of the latest `(ts, tie)` row
    *      wins — `tie` must be unique within (key, ts) so the pick is
    *      deterministic on any engine). The 100 TB input reduces to a
    *      grid-bounded table BEFORE anything wider happens.
    *   2. one window per key ordered by bucket finds each observation's
    *      successor bucket; the gap until that successor is emitted
    *      DIRECTLY by exploding `sequence(b, next_b - 1)` with the carried
    *      value — no calendar spine table, no second join, no second
    *      window: the LOCF semantics ARE the explode.
    *
    * Two grid-sized shuffles total ((key, bucket) agg + per-key window);
    * window partitions are bounded by `time_range / step` per key —
    * independent of input row count, so a hot key costs grid rows, not
    * its raw volume. The trailing observation fills only its own bucket
    * (no invented future); leading time before a key's first observation
    * is not fabricated.
    *
    * @return one row per key per grid bucket from the key's first to its
    *         last observation: (key, bucket_start `b_start` epoch secs,
    *         `value`, `observed` = false where the row is a carried fill)
    */
  def gapFillLocf(df: DataFrame, key: String, ts: String, tie: String,
      value: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "gapFillLocf: stepSeconds must be positive")
    val es = col(ts).cast("long")
    val obs = df
      .select(col(key), floor(es / stepSeconds).cast("long").as("_b"),
        struct(es.as("_es"), col(tie).cast("long").as("_tie"),
          col(value).as("_v")).as("_pick"))
      .groupBy(col(key), col("_b"))
      .agg(max(col("_pick")).getField("_v").as("_v"))
    val w = Window.partitionBy(col(key)).orderBy(col("_b"))
    obs
      .withColumn("_nb", lead(col("_b"), 1).over(w))
      .select(col(key), col("_b"), col("_v"),
        explode(sequence(col("_b"), coalesce(col("_nb") - 1, col("_b")))).as("_g"))
      .select(col(key), (col("_g") * stepSeconds).as("b_start"),
        col("_v").as("value"), (col("_g") === col("_b")).as("observed"))
  }
}
