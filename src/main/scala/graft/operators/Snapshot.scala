package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot DIFF — the ingest-delta audit between two versions
  * of a training corpus: which documents were added, removed, changed,
  * or untouched.
  *
  * Scale shape: each side projects to (id, 16-byte md5 digest) at scan
  * speed BEFORE the join, so the full-outer join shuffles digests, never
  * documents — at 100 TB that is the difference between shuffling the
  * corpus twice and shuffling ~24 bytes per row. With both snapshots
  * stored bucketed on the id ([[graft.sources.Sinks.saveBucketed]]) the
  * join plans with zero exchanges. */
object Snapshot {

  /** Diff `newDf` against `oldDf` by `idCol`, comparing the md5 of the
    * `payload` columns (null-safe: NULL and absent hash alike to the
    * empty string, columns joined with a  separator so values
    * cannot alias across column boundaries). One row per id present in
    * either snapshot: status ∈ added | removed | changed | unchanged,
    * plus both digests for downstream routing (e.g. re-embed only the
    * changed set). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "Snapshot.diff: payload columns required")
    def digested(df: DataFrame, name: String) =
      df.select(col(idCol),
        md5(concat_ws("",
          payload.map(c => coalesce(col(c).cast("string"), lit(""))): _*)).as(name))
    digested(oldDf, "old_digest")
      .join(digested(newDf, "new_digest"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_digest"), col("new_digest"))
  }
}
