package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Term-distribution DRIFT between two corpus versions: the k terms
    * whose relative frequency moved most — the first question after a
    * snapshot diff says "8% of documents changed" (did the ingest shift
    * the corpus's language, or just touch bytes?).
    *
    * The drift of term t is |c_old(t)·n_new − c_new(t)·n_old| — the
    * cross-multiplied frequency difference |p_old − p_new| scaled by
    * n_old·n_new, kept EXACT: the products run in DECIMAL(38,0) (longs
    * overflow at ~1e19, and 100 TB corpora put c·n near 1e24), so the
    * ranking is deterministic on any engine with exact decimal
    * arithmetic — no float epsilon anywhere. Emitted columns are the
    * raw counts (longs); the decimal lives only in the ORDER BY.
    *
    * Scale shape: each side collapses to per-term counts first
    * (map-side combined; the full-outer join shuffles vocabulary-sized
    * count rows, never text); the two 1-row totals broadcast; the
    * top-k is a TakeOrdered, not a global sort. */
  def termDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"termDrift: k=$k")
    def counts(df: DataFrame, name: String) =
      df.select(explode(split(col(textCol), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as(name))
    val a = counts(oldDf, "c_old")
    val b = counts(newDf, "c_new")
    val totals = a.agg(sum(col("c_old")).as("n_old"))
      .crossJoin(b.agg(sum(col("c_new")).as("n_new")))
    a.join(b, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .crossJoin(broadcast(totals))
      .withColumn("_drift",
        abs(col("c_old").cast("decimal(19,0)") * col("n_new")
          - col("c_new").cast("decimal(19,0)") * col("n_old")))
      .orderBy(col("_drift").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("c_old"), col("c_new"))
  }

  /** Slowly-changing-dimension TYPE-2 history from a change log: collapse
    * a (key, ts, attribute) event stream into validity intervals — one
    * row per key per DISTINCT consecutive attribute value, with
    * half-open [valid_from, valid_to) bounds and a version counter. The
    * lakehouse dimension-snapshot builder: replaying a 100 TB changelog
    * into the table a point-in-time join (as-of) then reads.
    *
    * Semantics: within a (key, ts) collision the row with the largest
    * `tie` wins (same deterministic latest-wins pick as [[Windows
    * .gapFillLocf]]); runs of equal consecutive values are suppressed
    * (null-safe comparison — a null attribute is a value, not a wildcard);
    * the last interval per key is open (`valid_to` null, `is_current`).
    *
    * Scale shape: one shuffle on (key, ts-collision) collapse, then the
    * per-key ordered walk. Change suppression needs each row's
    * predecessor, so the walk is a per-key window — bounded by the KEY'S
    * CHANGE HISTORY, not the corpus (a dimension key with 10⁹ updates is
    * a data-model bug). Where a key's history genuinely cannot fit one
    * task, the time-chunked carry decomposition of [[Joins
    * .asOfJoinChunked]] applies verbatim (per-chunk suppression + carried
    * boundary value); this operator keeps the direct form.
    */
  def scd2(log: DataFrame, key: String, ts: String, tie: String,
      attr: String): DataFrame = {
    val es = col(ts).cast("long")
    val latest = log
      .select(col(key), es.as("_es"),
        struct(col(tie).cast("long").as("_tie"), col(attr).as("_a")).as("_pick"))
      .groupBy(col(key), col("_es"))
      .agg(max(col("_pick")).getField("_a").as("_a"))
    val w = Window.partitionBy(col(key)).orderBy(col("_es"))
    val changed = latest
      .withColumn("_prev", lag(col("_a"), 1).over(w))
      // first row per key (lag null) always opens an interval; after it,
      // keep only genuine value changes (null-safe: NULL ≢ 'x', NULL ≡ NULL)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col("_a") <=> col("_prev")))
    val ws = Window.partitionBy(col(key)).orderBy(col("_es"))
    changed
      .select(col(key), col("_a").as(attr), col("_es").as("valid_from"),
        lead(col("_es"), 1).over(ws).as("valid_to"),
        row_number().over(ws).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Mergeable per-key aggregate STATE over a long measure: (keys...,
    * n_rows, sum_v, min_v, max_v). Every component is a commutative
    * monoid, which is what makes [[refreshAggState]]'s incremental
    * maintenance exact — count and sum add, min and max take the
    * extremum, and any derived value (avg = sum/n) computes from the
    * merged state at read time. One map-side-combined shuffle on the
    * key. The measure is a LONG by contract (callers pass unscaled
    * decimals, the engine-portable discipline everywhere else in this
    * library); sums overflow-check via `try_sum` so a magnitude that
    * exceeds the design headroom fails loudly instead of wrapping. The
    * overflow probe distinguishes "all measures NULL" (try_sum is NULL
    * because there was no input — a legal group, sum_v comes out NULL)
    * from "sum wrapped" (non-null inputs, NULL try_sum — fail loudly):
    * the guard is count(valueCol) > 0, not coalesce alone. `n_rows`
    * counts EVERY row of the group (NULL measures included — it is the
    * group's cardinality, not the measure's support); a NULL-ignoring
    * mean over the measure is sum_v / count(valueCol), not sum_v /
    * n_rows, and callers deriving one should carry that count. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        when(count(col(valueCol)) > 0,
          coalesce(try_sum(col(valueCol)),
            raise_error(lit("aggState: long sum overflowed — use a DECIMAL state"))
              .cast("long"))).as("sum_v"),
        min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"))

  /** Incremental aggregate maintenance — the materialized-view refresh:
    * merge a STORED aggregate state with a delta batch's state, giving
    * bit-identically the state a full recompute over base ∪ delta would
    * (oracle-checked). At 100 TB this is the difference between a
    * nightly refresh that reads |delta| + |state| and one that rescans
    * the corpus: the base side of the union is the persisted key-dim
    * state table, never the base FACTS. Deletions/updates are out of
    * scope by design — min/max are not invertible; a changelog-driven
    * state needs the SCD-2 collapse ([[scd2]]) or a recompute of the
    * touched keys. */
  def refreshAggState(state: DataFrame, deltaState: DataFrame,
      keys: Seq[String]): DataFrame =
    state.union(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        // same NULL-vs-overflow split as aggState: an all-NULL-state
        // merge (every side's sum_v NULL) is a NULL sum, not an error
        when(count(col("sum_v")) > 0,
          coalesce(try_sum(col("sum_v")),
            raise_error(lit("refreshAggState: merged sum overflowed"))
              .cast("long"))).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
}
