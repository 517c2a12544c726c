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
}
