package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Cosine runs through the native codegen'd
  * [[graft.plans.CosineSimilarity]] expression (via the registered
  * `graft_cosine` SQL function). Scores are quantized to 1e-6 ticks with
  * ties broken by id, making rank output engine-portable.
  *
  * Scale posture: the query set and the centroid codebook are broadcast
  * (both tiny by construction); the corpus — the 100 TB side — only
  * streams: brute force is one scan with no shuffle before the per-query
  * top-k, IVF prunes that scan to the probed cells first.
  */
object Ann {

  /** Quantized cosine via the codegen expression (see Similarity.cosineQ). */
  private def cosQ(a: Column, b: Column): Column =
    floor(call_function("graft_cosine", a, b) * lit(1000000.0)).cast("long")

  /** Brute-force exact top-k: corpus ⨯ broadcast(queries), ranked per
    * query. The rank window partitions by query id — with many queries
    * this parallelizes naturally; WindowGroupLimit bounds each partition
    * to k rows before the sort. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col("query_id"), col("corpus_id"),
        cosQ(col("qe"), col("ce")).as("score_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("corpus_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Per-cell mean centroids ("trained" coarse quantizer — the given
    * cell assignment plays the role of a k-means codebook). Sums run in
    * exact DECIMAL per dimension so centroid doubles are independent of
    * aggregation order; the `dim` per-dimension means are parallel
    * aggregates in ONE groupBy(cell) — a posexplode would 64× the corpus
    * and add a (cell, pos) shuffle before the per-cell one. */
  def centroids(corpus: DataFrame, dim: Int = 64): DataFrame = {
    val means = (0 until dim).map(i =>
      (sum(element_at(col("ce"), i + 1).cast("decimal(27,10)")).cast("double") /
        count(lit(1))).as(s"c$i"))
    corpus
      .groupBy(col("cell"))
      .agg(means.head, means.tail: _*)
      .select(col("cell"), array((0 until dim).map(i => col(s"c$i")): _*).as("ce"))
  }

  /** IVF-style ANN: probe the nearest `nprobe` centroid cells only, then
    * exact top-k within the probed cells. The centroid table (cells ×
    * dim doubles) is broadcast; the corpus is pruned by cell via an
    * equi-join on the cell id — at scale this is the difference between
    * scanning 100 TB and scanning 100 TB / n_cells × nprobe.
    *
    * Recomputes the codebook from the corpus — fine for a one-shot
    * exploration; a serving deployment builds the index ONCE with
    * [[buildIndex]] and queries it with [[searchIndex]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int,
      dim: Int = 64): DataFrame =
    ivfTopKWith(centroids(corpus, dim), queries, corpus, k, nprobe)

  /** IVF search against a given codebook (no centroid computation in the
    * query path). */
  def ivfTopKWith(cents: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val probed = queries.join(broadcast(cents))
      .select(col("query_id"), col("qe"), col("cell"),
        cosQ(col("qe"), col("ce")).as("cscore"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("cell").asc)))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    val scored = corpus.join(broadcast(probed), Seq("cell"))
      .select(col("query_id"), col("cell"), col("corpus_id"),
        cosQ(col("qe"), col("ce")).as("score_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("corpus_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Build the PERSISTENT IVF index under `dir`: the centroid codebook
    * as parquet plus the corpus partitioned BY CELL. At 100 TB the
    * centroid computation is a full-corpus scan — it belongs at
    * index-build time, once; a query batch that recomputes it pays that
    * scan per lookup. Cell-partitioning the corpus turns the probe
    * equi-join into directory-level dynamic partition pruning: a query
    * batch reads only the probed cells' files, never the whole corpus. */
  def buildIndex(corpus: DataFrame, dir: String, dim: Int = 64): Unit = {
    centroids(corpus, dim).write.mode("overwrite").parquet(s"$dir/codebook")
    corpus.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** IVF search against a [[buildIndex]]-persisted index: the query path
    * scans only the (tiny) codebook and the probed cells — asserted in
    * PlanSpec (no aggregate anywhere; a dynamic-pruning partition filter
    * on the cells scan). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/codebook")
    val cells = spark.read.parquet(s"$dir/cells")
      .select(col("cell"), col("corpus_id"), col("ce"))
    ivfTopKWith(cents, queries, cells, k, nprobe)
  }
}
