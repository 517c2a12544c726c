package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing operators: deterministic stratified sampling and
  * token-budget sequence packing — the two steps between a curated
  * corpus and a training run.
  *
  * Both are engine-portable by construction (md5-derived randomness,
  * window-function packing) so they carry exact DuckDB oracles like
  * every other operator. */
object Sampling {

  /** Uniform-in-[0,256) deterministic coin for a row: the first two hex
    * nibbles of md5(key). Salting the key ("s|") decorrelates this coin
    * from any other md5-keyed decision in the pipeline. */
  private def coin(key: Column): Column =
    conv(substring(md5(concat(lit("s|"), key.cast("string"))), 1, 2), 16, 10)
      .cast("int")

  /** Per-stratum deterministic sampling: keep a row iff its coin falls
    * under the stratum's threshold (rate quantized to /256). This is the
    * corpus-mixing primitive (downsample the dominant language, keep the
    * rare ones whole) with the two properties a 100 TB run needs:
    * reproducible across runs/retries (no RNG state — a task retry keeps
    * the SAME rows) and embarrassingly parallel (a pure projection +
    * filter at scan speed, zero shuffles). `rates` maps stratum value →
    * rate in [0,1]; absent strata fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * 256).toInt)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * 256).toInt)).otherwise(acc)
    }
    df.withColumn("u256", coin(col(keyCol)))
      .filter(col("u256") < threshold)
  }

  /** Token-budget sequence packing: within each shard (partition column),
    * rows are laid out in `orderCol` order and cut into packs by running
    * token count — `pack_id = floor(exclusive_prefix_sum / budget)`, i.e.
    * first-fit in arrival order where a document straddling a boundary
    * opens the next pack. One window shuffle on the shard key; at 100 TB
    * the shard column (language, source, date bucket) keeps each window
    * partition executor-sized. Emits per-row pack assignment; aggregate
    * over (shard, pack_id) for pack manifests. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tokensCol)) / budget).cast("long"))
  }
}
