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
    * nibbles of md5(key) — the top 8 of the string-free 60-bit digest
    * (bit-identical to the hex parse; see plans/Md5Bits60Expr.scala).
    * Salting the key ("s|") decorrelates this coin from any other
    * md5-keyed decision in the pipeline. */
  private def coin(key: Column): Column =
    shiftright(call_function("graft_md5_60", lit("s|"), key.cast("string")), 52)
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

  /** Temperature-weighted corpus mixing at τ = 2 (α = 1/2), the
    * standard multilingual flattening: with per-stratum population
    * share p_i, the target mixture is q_i ∝ p_i^(1/2), realized by
    * keep-rates rate_i = sqrt(n_min / n_i) — the rarest stratum keeps
    * everything, a stratum 100× its size keeps 1/10th, and the OUTPUT
    * shares land proportional to sqrt(n_i), i.e. the α = 1/2 mixture
    * with the largest possible total corpus (no stratum oversampled).
    *
    * α is fixed at 1/2 deliberately: sqrt is correctly rounded in
    * IEEE-754, so the thresholds floor(sqrt(n_min/n_i)·256) are
    * BIT-IDENTICAL on any engine computing from the same counts —
    * an arbitrary pow(p, α) is not correctly rounded and could flip a
    * floor at a boundary between engines. (Other temperatures compose:
    * α = 1/4 is this operator applied twice.)
    *
    * Scale shape: pass 1 aggregates per-stratum counts — a map-side-
    * combined aggregate over ONE pruned column, KB-sized result; the
    * thresholds (strata × 4 bytes) broadcast back, and pass 2 is the
    * same zero-shuffle scan-speed filter as [[stratifiedSample]], with
    * the same md5 coin, so it is retry-stable and reproducible. Rows
    * with a NULL stratum are dropped (they match no threshold row —
    * same rule as the SQL join twin). */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: String): DataFrame = {
    val reserved = Seq("_n", "_nmin", "_thr", "u256")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"temperatureSample: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    // global-window min, NOT counts.agg(min).crossJoin(counts): the
    // latter evaluates the counts aggregate twice — a third full corpus
    // scan. The window moves only the KB-sized stratum rows.
    val thresholds = counts
      .select(col(stratumCol),
        floor(sqrt(min(col("_n")).over(Window.partitionBy()).cast("double")
            / col("_n").cast("double")) * 256)
          .cast("int").as("_thr"))
    df.join(broadcast(thresholds), Seq(stratumCol))
      .withColumn("u256", coin(col(keyCol)))
      .filter(col("u256") < col("_thr"))
      .drop("_thr")
  }

  /** Token-budget MIXTURE sampling — the data-mixing step between a
    * curated corpus and a training run: one token budget for the whole
    * mixture (`total_tokens · num DIV den`), shared among domains
    * proportionally to `tokens_g^α` with α = ½ (the temperature-style
    * reweighting that up-weights small domains without letting head
    * domains swamp the mix — [[temperatureSample]]'s exponent applied
    * to token MASS instead of row count), then each domain admits docs
    * in deterministic md5 order until its share is full. Emits the
    * admitted rows + `cum_tok` (inclusive cumulative tokens in
    * admission order) + `budget` (the domain's share).
    *
    * Integer-exact end to end: a domain's weight is `floor(sqrt(
    * tokens_g))` — IEEE-754 requires sqrt be correctly rounded, so the
    * floor is deterministic on every engine — and its budget is
    * `(B · w_g) DIV Σw`; a doc is admitted iff its inclusive cumulative
    * token count stays within the budget, so the kept set is a hash-
    * order prefix with no float boundary anywhere. The `B · w_g`
    * product runs in DECIMAL(38,0) (r15 ADVICE): at the trillion-token
    * corpora this operator targets, B ≈ 5e12 times w ≈ 4.5e6 exceeds
    * Long.MaxValue — BIGINT arithmetic would silently wrap negative
    * under ANSI-off Spark while the DuckDB twin raises, so both engines
    * now widen exactly this one product (the oracle through HUGEINT)
    * and the quotient, ≤ B by construction, lands back in BIGINT.
    *
    * Scale shape — the running sum does NOT single-reduce per domain:
    * the [[quotaCap]] two-phase decomposition applies to SUMS because
    * `_sub` is the hash's leading byte, so sub-major order IS global
    * hash order; per-(group, sub) token subtotals — a KB-scale table —
    * window into exclusive token offsets that broadcast back, and each
    * doc's global cumulative sum is its offset plus a (group, sub)-
    * bounded running sum. ONE corpus shuffle (the bounded window);
    * budgets and offsets ride broadcasts. */
  def tokenBudgetMixture(df: DataFrame, groupCol: String, idCol: String,
      tokCol: String, num: Long = 1L, den: Long = 4L,
      seed: String = "mix"): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"tokenBudgetMixture: budget fraction $num/$den not in (0, 1]")
    val reserved = Seq("skey", "_sub", "_btok", "_off", "_gtok", "_w", "budget", "cum_tok")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"tokenBudgetMixture: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val keyed = df.withColumn("skey",
        md5(concat(lit(seed + "|"), col(idCol).cast("string"))))
      .withColumn("_sub", substring(col("skey"), 1, 2))
    val subTot = keyed.groupBy(col(groupCol), col("_sub"))
      .agg(sum(col(tokCol)).as("_btok"))
    val offsets = subTot
      .withColumn("_off",
        coalesce(
          sum(col("_btok")).over(Window.partitionBy(col(groupCol)).orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_btok")
    // global-window totals over the KB-sized per-group table (the
    // temperatureSample pattern — no second corpus aggregation)
    val budgets = subTot.groupBy(col(groupCol)).agg(sum(col("_btok")).as("_gtok"))
      .withColumn("_w", floor(sqrt(col("_gtok").cast("double"))).cast("long"))
      .select(col(groupCol),
        // B = total·num DIV den fits BIGINT (≤ total, since num ≤ den)
        // but BOTH products — total·num and B·w — can exceed it at
        // trillion-token scale: widen each to DECIMAL(38,0); each `div`
        // lands back in BIGINT (IntegralDivide returns LONG)
        expr(s"CAST(CAST(sum(_gtok) OVER () AS DECIMAL(38,0)) * $num div $den" +
          " AS DECIMAL(38,0)) * _w div sum(_w) OVER ()").as("budget"))
    keyed
      .join(broadcast(offsets), Seq(groupCol, "_sub"))
      .join(broadcast(budgets), Seq(groupCol))
      .withColumn("cum_tok", col("_off") +
        sum(col(tokCol)).over(Window.partitionBy(col(groupCol), col("_sub"))
          .orderBy(col("skey"), col(idCol))))
      .filter(col("cum_tok") <= col("budget"))
      .drop("skey", "_sub", "_off")
  }

  /** Deterministic corpus shuffle for training order: every row gets
    * `skey = md5(seed | id)` and `train_idx` = its dense rank 0..n−1 in
    * (skey, id) order — a reproducible pseudo-random permutation of the
    * corpus (same seed → same order across runs, retries, engines; a
    * new seed is a fresh epoch shuffle). The consumer reads in
    * train_idx order, or range-partitions on it for sharded loading.
    *
    * The global rank uses the SAME two-phase shape as [[packSequences]]
    * — no single global sort task, no range-partitioner sampling:
    * `_sub` = skey's first hex byte is a MONOTONE 256-way bucketing of
    * the sort key with md5-uniform occupancy ≈ n/256 per bucket, so the
    * local row_number windows over bounded partitions; the 256 bucket
    * counts window into exclusive offsets and broadcast back. One
    * corpus shuffle (the bucket window), two KB-scale stages. Ties on
    * skey (128-bit collisions, or duplicate ids) break by id, so the
    * permutation is total and the oracle's `ROW_NUMBER() OVER (ORDER BY
    * skey, id)` is bit-identical. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val reserved = Seq("skey", "train_idx", "_sub", "_lrank", "_n", "_off")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"shuffleOrder: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val keyed = df.withColumn("skey",
        md5(concat(lit(seed + "|"), col(idCol).cast("string"))))
      .withColumn("_sub", substring(col("skey"), 1, 2))
    val offsets = keyed.groupBy(col("_sub"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_n")
    keyed
      .withColumn("_lrank", row_number()
        .over(Window.partitionBy(col("_sub")).orderBy(col("skey"), col(idCol))))
      .join(broadcast(offsets), Seq("_sub"))
      .withColumn("train_idx", col("_off") + col("_lrank") - 1)
      .drop("_sub", "_lrank", "_off")
  }

  /** Per-group QUOTA capping: keep at most `quota` rows per group,
    * chosen in deterministic md5(seed|id) order — the per-domain cap of
    * web-corpus curation (CCNet/C4-style "at most N pages per host", so
    * no single domain dominates the training mixture), and the
    * group-wise complement of [[stratifiedSample]]'s rate-based mixing:
    * rates scale with group size, a quota bounds it absolutely.
    *
    * Same determinism contract as every sampler here (md5-keyed order —
    * stable across runs, retries and engines; a new seed redraws), and
    * the same BOUNDED TWO-PHASE ranking as [[shuffleOrder]], because the
    * naive form (`row_number over (partition by group order by skey)`)
    * routes the hottest group's ENTIRE row set through one sorted window
    * task — with group=domain, one crawl-heavy domain is one task at
    * 100 TB. Instead: skey's first hex byte sub-buckets each group 256
    * ways (monotone in skey, md5-uniform occupancy), local row_numbers
    * window over (group, sub)-bounded partitions, and the per-(group,
    * sub) counts — groups×256 rows, KBs — window into exclusive offsets
    * and broadcast back. Candidates with a LOCAL rank beyond the quota
    * are pruned before the join (their global rank can only be larger),
    * so the join touches at most 256×quota rows per group. ONE corpus
    * shuffle (the bounded window); emits the kept rows + their
    * `qrank` (1-based rank within the group's kept order). */
  def quotaCap(df: DataFrame, groupCol: String, idCol: String,
      quota: Long, seed: String): DataFrame = {
    require(quota > 0, s"quotaCap: quota=$quota must be positive")
    val reserved = Seq("skey", "qrank", "_sub", "_lrank", "_n", "_off")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"quotaCap: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val keyed = df.withColumn("skey",
        md5(concat(lit(seed + "|"), col(idCol).cast("string"))))
      .withColumn("_sub", substring(col("skey"), 1, 2))
    val offsets = keyed.groupBy(col(groupCol), col("_sub"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.partitionBy(col(groupCol)).orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_n")
    keyed
      .withColumn("_lrank", row_number()
        .over(Window.partitionBy(col(groupCol), col("_sub"))
          .orderBy(col("skey"), col(idCol))))
      // global rank = _off + _lrank >= _lrank, so a local rank past the
      // quota can never be kept — prune before the join
      .filter(col("_lrank") <= quota)
      .join(broadcast(offsets), Seq(groupCol, "_sub"))
      .withColumn("qrank", col("_off") + col("_lrank"))
      .filter(col("qrank") <= quota)
      .drop("_sub", "_lrank", "_off")
  }

  /** Per-group PERCENTILE-RANK trimming — the length-outlier filter of
    * corpus curation ("drop each language's shortest 5% and longest 5%
    * of documents"): keep exactly the rows whose within-group rank by
    * `valueCol` (ties broken by `idCol`) falls in (loPct%, hiPct%] of
    * the group's row count. Rank-based, not value-threshold-based, so
    * it needs no distribution assumptions and the cut adapts per group.
    *
    * The selection rule is pure integer arithmetic —
    * `rank·100 > loPct·n AND rank·100 <= hiPct·n` — so the kept set is
    * engine-portable with no float percentile boundary anywhere.
    *
    * Bounded two-phase ranking like [[quotaCap]], but on the VALUE axis
    * (the packSequences bucketing): `_sub = value DIV subWidth` is
    * monotone in value, so (sub, value, id) order ≡ (value, id) order;
    * local ranks window over (group, sub)-bounded partitions, and the
    * per-(group, sub) counts table — KBs — windows into exclusive
    * offsets AND carries each group's total `n` back on the same
    * broadcast row. ONE corpus shuffle. Rows with a NULL value are
    * dropped up front (engines disagree on null sort order; a null
    * length is not a rankable length). */
  def trimByRank(df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      loPct: Int, hiPct: Int, subWidth: Long = 64L): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"trimByRank: need 0 <= loPct < hiPct <= 100, got [$loPct, $hiPct]")
    require(subWidth > 0)
    val reserved = Seq("grank", "_sub", "_lrank", "_n", "_off", "_tot")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"trimByRank: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val withSub = df.filter(col(valueCol).isNotNull)
      .withColumn("_sub", expr(s"CAST(`$valueCol` AS BIGINT) DIV $subWidth"))
    val offsets = withSub.groupBy(col(groupCol), col("_sub"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.partitionBy(col(groupCol)).orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_tot", sum(col("_n")).over(Window.partitionBy(col(groupCol))))
      .drop("_n")
    withSub
      .withColumn("_lrank", row_number()
        .over(Window.partitionBy(col(groupCol), col("_sub"))
          .orderBy(col(valueCol), col(idCol))))
      .join(broadcast(offsets), Seq(groupCol, "_sub"))
      .withColumn("grank", col("_off") + col("_lrank"))
      .filter(col("grank") * 100 > lit(loPct) * col("_tot") &&
        col("grank") * 100 <= lit(hiPct) * col("_tot"))
      .drop("_sub", "_lrank", "_off", "_tot")
  }

  /** Deterministic SYSTEMATIC weighted (PPS) sampling: rows are laid on
    * a weight axis in md5-shuffled order and one row is taken at every
    * `step` weight units — row i is selected iff its interval
    * (cum_i − w_i, cum_i] contains a multiple of `step`, so inclusion is
    * proportional to weight (exact w_i/step for w_i ≤ step), the sample
    * size is fixed at totalW DIV step (±1), and — unlike independent
    * coin-flipping — a token-budgeted subsample lands ON budget, not
    * just in expectation. With weight = token count this is "give me a
    * 10B-token proportional slice of the corpus", the subsampling step a
    * token-budget training run actually wants.
    *
    * Same determinism contract as every sampler here: the shuffle order
    * is md5(seed|id), so the sample is stable across runs/retries and
    * engines, and a different seed is a fresh draw. All arithmetic is
    * BIGINT (weights are integral); selection uses integer DIV, so there
    * is no float boundary anywhere.
    *
    * Scale shape: the global prefix sum is the same bounded two-phase
    * construction as [[shuffleOrder]] — skey's first hex byte is a
    * monotone 256-way bucketing, local weight prefix sums window over
    * ~n/256-row partitions, 256 bucket totals window into exclusive
    * offsets and broadcast back. ONE corpus shuffle, no global sort
    * task, no range-partitioner sampling. Null weights count 0 (never
    * selected); negative weights are rejected up front. */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      step: Long, seed: String): DataFrame = {
    require(step > 0, s"systematicSample: step=$step must be positive")
    val reserved = Seq("skey", "_w", "_sub", "_lw", "_n", "_off", "cum_w")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"systematicSample: input columns collide with reserved working names: ${clash.mkString(", ")}")
    val keyed = df
      .withColumn("_w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("skey", md5(concat(lit(seed + "|"), col(idCol).cast("string"))))
      .withColumn("_sub", substring(col("skey"), 1, 2))
    val offsets = keyed.groupBy(col("_sub"))
      .agg(sum(col("_w")).as("_n"), min(col("_w")).as("_mn"))
      .withColumn("_off",
        coalesce(
          sum(col("_n")).over(Window.orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_sub"), col("_off"), col("_mn"))
    keyed
      .withColumn("_lw", sum(col("_w"))
        .over(Window.partitionBy(col("_sub")).orderBy(col("skey"), col(idCol))))
      .join(broadcast(offsets), Seq("_sub"))
      // fail loud on negative weights without a separate validation scan:
      // the per-bucket min rides the KB-sized offsets table for free
      .withColumn("cum_w",
        when(col("_mn") < 0,
          raise_error(lit(s"systematicSample: negative weight in $weightCol")))
          .otherwise(col("_lw") + col("_off")))
      .filter(expr(s"cum_w DIV $step") > expr(s"(cum_w - _w) DIV $step"))
      .drop("skey", "_w", "_sub", "_lw", "_off", "_mn")
  }

  /** Token-budget sequence packing: within each shard (partition column),
    * rows are laid out in `orderCol` order and cut into packs by running
    * token count — `pack_id = floor(exclusive_prefix_sum / budget)`, i.e.
    * first-fit in arrival order where a document straddling a boundary
    * opens the next pack.
    *
    * TWO-PHASE prefix sum, because the single-window form
    * (`sum.over(partitionBy(shard).orderBy(order))`) routes a shard's
    * ENTIRE corpus through one sorted window task — with shard=language,
    * a web-scale English corpus is one task, and the operator dies at
    * 100 TB. Instead:
    *
    *   1. rows sub-shard by `orderCol div subWidth` — a MONOTONE
    *      bucketing of the order key, so (sub, orderCol) order ≡ plain
    *      orderCol order and equal order keys always share a sub-shard;
    *      the local prefix sum windows over (shard, sub), whose size is
    *      bounded by the rows in one `subWidth`-wide key range, however
    *      skewed the shards are;
    *   2. per-(shard, sub) token totals — one tiny aggregate, one row
    *      per occupied sub-shard (≤ key-range/subWidth rows, data-size
    *      independent) — window into exclusive per-sub offsets;
    *   3. the offsets broadcast-join back and add: identical pack_id
    *      arithmetic to the single window (property-tested equivalent in
    *      CurationProps under arbitrary shard/key skew).
    *
    * The big side still shuffles exactly once (the (shard, sub) window);
    * the offsets table costs two KB-scale stages. `orderCol` must be
    * integral (or castable to BIGINT — timestamps order by epoch
    * second); a doc straddling a sub-shard boundary packs exactly as in
    * the single-window form because only the running SUM crosses the
    * boundary, never the row. Emits per-row `cum_tokens`/`pack_id`;
    * aggregate over (shard, pack_id) for pack manifests. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long, subWidth: Long = 1L << 20): DataFrame = {
    require(budget > 0 && subWidth > 0)
    val reserved = Seq("_sub", "_cum_local", "_sub_tot", "_off")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"packSequences: input columns collide with reserved working names: ${clash.mkString(", ")}")
    // integer DIV: exact at any BIGINT magnitude (a double floor-div
    // loses monotonicity past 2^53) and monotone in orderCol
    val sub = expr(s"CAST(`$orderCol` AS BIGINT) DIV $subWidth")
    val withSub = df.withColumn("_sub", sub)
    val wLocal = Window.partitionBy(col(shardCol), col("_sub")).orderBy(col(orderCol))
    val offsets = withSub
      .groupBy(col(shardCol), col("_sub"))
      .agg(sum(col(tokensCol)).as("_sub_tot"))
      .withColumn("_off",
        coalesce(
          sum(col("_sub_tot")).over(Window.partitionBy(col(shardCol))
            .orderBy(col("_sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_sub_tot")
    withSub
      .withColumn("_cum_local", sum(col(tokensCol)).over(wLocal))
      .join(broadcast(offsets), Seq(shardCol, "_sub"))
      .withColumn("cum_tokens", col("_cum_local") + col("_off"))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tokensCol)) / budget).cast("long"))
      .drop("_sub", "_cum_local", "_off")
  }
}
