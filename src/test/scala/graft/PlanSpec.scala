package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that matter at 100 TB —
  * broadcasts where expected, pushdown reaching the scan, pruned
  * ReadSchema, rank-limit pushdown — checked on the real optimized
  * plans, not by eyeball. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  test("q_join_star broadcasts all three dims (no shuffle joins)") {
    val plan = physicalPlan(QueriesCore.qJoinStar(spark, sfDir))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast == 3, s"expected 3 broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"star join must not sort-merge:\n$plan")
  }

  test("q1_agg pushes the shipdate filter into the parquet scan and prunes columns") {
    val plan = formattedPlan(QueriesCore.q1Agg(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    // Projection needs 7 of 11 lineitem columns; the scan must not read keys.
    assert(!plan.contains("l_orderkey"), s"ReadSchema not pruned:\n$plan")
    assert(!plan.contains("l_partkey"), s"ReadSchema not pruned:\n$plan")
  }

  test("a persisted bucketed fuzzy signature index probes with zero index-side shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Fuzzy
    import graft.sources.Sinks
    // the Fuzzy.probeSignatureIndex claim, asserted the way the gram
    // index's is: persist the reference names' deletion-signature index
    // bucketed+sorted on sig, then probe with a delta — every remaining
    // exchange is DELTA-sized
    val corpus = (0L until 60L).map(i => (i, f"Customer#$i%09d")).toDF("id", "s")
    val delta = Seq((1000L, "Customer#000000007"), // exact hit, dist 0
      (1001L, "Customer#00000003"),                // one digit dropped, dist 1
      (1002L, "Nobody#Like#This")).toDF("id", "s")
    spark.sql("DROP TABLE IF EXISTS b_fuzzy_index")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/b_fuzzy_index"))
    Sinks.saveBucketed(Fuzzy.signatureIndex(corpus, "id", "s", maxDist = 1),
      "b_fuzzy_index", Seq("sig"), 8)
    val savedThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = Fuzzy.probeSignatureIndex(delta, "id", "s",
        spark.table("b_fuzzy_index"), maxDist = 1)
      val plan = physicalPlan(probed)
      // the property that matters: the INDEX side reads its bucket
      // layout with no exchange at all, and every remaining exchange is
      // DELTA-sized (the signature-family distinct, the re-key onto sig
      // for the join, the surviving-pair distinct — an upper bound, not
      // an exact count: AQE/version drift may fuse but must never ADD)
      assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 3, plan)
      assert(plan.contains("Bucketed: true"),
        s"index side must read its bucket layout:\n$plan")
      val got = probed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute force: every (delta, corpus) pair within distance 1
      val want = (for {
        (di, ds) <- Seq((1000L, "Customer#000000007"),
          (1001L, "Customer#00000003"), (1002L, "Nobody#Like#This"))
        ci <- 0L until 60L
        d = {
          val cs = f"Customer#$ci%09d"
          val m = Array.tabulate(ds.length + 1, cs.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0
          }
          for (i <- 1 to ds.length; j <- 1 to cs.length)
            m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
              m(i - 1)(j - 1) + (if (ds(i - 1) == cs(j - 1)) 0 else 1))
          m(ds.length)(cs.length)
        } if (d <= 1)
      } yield (di, ci, d.toLong)).toSet
      assert(got == want, s"got=$got want=$want")
      assert(got.contains((1000L, 7L, 0L)) && got.exists(_._1 == 1001L))
    } finally savedThreshold match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fuzzy segments probe: no segment-side shuffle, fresh counts over matched rows only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Fuzzy
    import graft.sources.Sinks
    // the r17 maintenance arm's plan contract: the standing index and
    // the append segment are both reached through the broadcast
    // touched-signature semi side (no scan-side exchange), and the
    // fresh-count window + candidate join shuffle only probed-bucket
    // rows — the index scan keeps its bucket layout
    val base = (0L until 40L).map(i => (i, f"Customer#$i%09d")).toDF("id", "s")
    val seg = (40L until 60L).map(i => (i, f"Customer#$i%09d")).toDF("id", "s")
    val delta = Seq((1000L, "Customer#000000047"), // dist 0 into the SEGMENT
      (1001L, "Customer#00000003")).toDF("id", "s") // dist 1 into the base
    spark.sql("DROP TABLE IF EXISTS b_fuzzy_seg_base")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/b_fuzzy_seg_base"))
    Sinks.saveBucketed(Fuzzy.signatureIndex(base, "id", "s", maxDist = 1),
      "b_fuzzy_seg_base", Seq("sig"), 8)
    val segIdx = Fuzzy.signatureIndex(seg, "id", "s", maxDist = 1)
      .localCheckpoint()
    val probed = Fuzzy.probeSignatureSegments(delta, "id", "s",
      Seq(spark.table("b_fuzzy_seg_base"), segIdx), maxDist = 1)
    val plan = physicalPlan(probed)
    // the touched-sig set and the fresh-count path must broadcast into
    // the scans, never shuffle them: the scans' own subtrees carry no
    // Exchange (all hash exchanges sit above, on delta-sized streams)
    assert(plan.contains("BroadcastExchange"),
      s"touched-sig semi side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // delta-sized exchange bound: signature distinct, touched distinct,
    // fresh-count window, candidate join re-key, pair distinct — and
    // nothing scan-sized (upper bound, AQE may fuse)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 5, plan)
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1000L, 47L, 0L)), s"segment hit missing: $got")
    assert(got.exists(t => t._1 == 1001L && t._2 == 3L && t._3 == 1L),
      s"base hit missing: $got")
  }

  test("q_topk_per_group gets the rank-limit pushdown (WindowGroupLimit)") {
    val plan = physicalPlan(QueriesCore.qTopkPerGroup(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), s"no rank-limit pushdown:\n$plan")
  }

  test("q_semi_anti plans semi + anti joins, never an inner materialization") {
    val plan = physicalPlan(QueriesCore.qSemiAnti(spark, sfDir))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q_skew_agg two-phase salted plan equals the direct aggregation") {
    import org.apache.spark.sql.functions._
    val salted = QueriesCore.qSkewAgg(spark, sfDir)
    val direct = graft.sources.Tables(spark, sfDir).events
      .groupBy(col("event_type"))
      .agg(sum(floor(col("value")).cast("long")).as("total_value"),
        count(lit(1)).as("n_events"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("ANN plans broadcast the small side (queries / centroid codebook), corpus only streams") {
    val topk = physicalPlan(QueriesLlm.simTopk(spark, sfDir))
    assert(topk.contains("BroadcastExchange"), topk)
    assert(!topk.contains("CartesianProduct"), topk)
    val ivf = physicalPlan(QueriesLlm.simIvf(spark, sfDir))
    assert("BroadcastExchange".r.findAllIn(ivf).length >= 2, ivf) // codebook + probed queries
    assert(!ivf.contains("SortMergeJoin"), ivf)
  }

  test("persisted IVF index: query path scans only the codebook and the probed cells") {
    val df = QueriesLlm.simIvfProbe2(spark, sfDir) // builds + loads the index
    val plan = physicalPlan(df)
    // no aggregate anywhere: centroids come from the persisted codebook,
    // never recomputed from the corpus in the query path
    assert(!plan.contains("Aggregate"), s"query path must not recompute centroids:\n$plan")
    // the cells scan must carry a runtime partition filter (dynamic
    // partition pruning): only the probed cells' directories are read
    assert(plan.contains("dynamicpruning"),
      s"cells scan must prune unprobed cells at the partition level:\n$plan")
    assert(df.count() > 0)
  }

  test("shuffle budget: every query stays within its audited exchange count") {
    // Measured with Probe's `shuffles` mode; a regression here means a
    // plan gained a shuffle (the thing that breaks first at 100 TB).
    // Counts exclude broadcasts (those are the point) and are upper
    // bounds. Two-phase exact distinct and salted aggs legitimately
    // need 2; dedup pipelines need one per keyed stage.
    val budget = Map(
      "q_commit_activity_component" -> 1,
      "q1_agg" -> 1, "q_component_activity" -> 1, "q_component_activity_month" -> 1,
      "q_distinct_users_per_window" -> 2, "q_session_windows" -> 1,
      "q_emails_no_reply" -> 1, "q_jira_tickets_per_month" -> 1,
      "q_explode_files" -> 1, "q_pull_request_stats" -> 1, "q_email_threads" -> 2,
      "q_agg_email_aliases_company" -> 2, "q_topk_per_group" -> 1, "q_topk_agg" -> 1,
      "q_rollup" -> 1, "q_join_star" -> 2, "q_semi_anti" -> 2, "q_skew_agg" -> 2,
      // salted join: both sides shuffle on (key, salt) + the final agg
      "q_salted_join" -> 3,
      // jaccard: sizes and pairs both derive from the df-filtered bucket
      // relation (consistency requires it), and the static plan
      // sort-merge-joins sizes on; AQE reuses the bucket exchange and
      // converts the joins to broadcast at runtime when sizes is small.
      // minhash/simhash: one per-doc signature agg (map-side partial
      // mins/votes) + one bucket shuffle SHARED by the size window and
      // bucket group-by; pair emission + verify are codegen'd scalar
      // expressions inside the bucket task (Dedup.scala). embcos derives
      // its keys from inlined hyperplane literals with no signature agg,
      // so its bucket shuffle is the whole plan
      "q_dedup_exact" -> 1, "q_dedup_ngram_jaccard" -> 6, "q_dedup_minhash" -> 2,
      "q_dedup_simhash" -> 2, "q_dedup_embcos" -> 1,
      // 4-gate ingest pipeline, audited (plan read 2026-08-15): the
      // INLINE form pays three corpus-artifact builds (band index's
      // signature/window chain, gram index's digest agg, bloom's distinct
      // bits) + the three delta-sized probes + the bounded quota window;
      // the SERVED form drops the build-side exchanges (persisted
      // bucketed indexes read pre-partitioned) and keeps the delta work
      "q_ingest_gates" -> 27, "q_ingest_gates_served" -> 15,
      // r14: the maintenance row appends POST-QUOTA digests (the r13
      // ADVICE tombstone fix), so its static plan nests the full
      // ingestCore — quota's offsets pass derives the cut chain a
      // second time — plus the append's distinct (audited 29). NOT
      // double-paid at runtime: AQE's ReusedExchange serves the offsets
      // pass from the main pass's exchanges (measured: an eager
      // localCheckpoint of the cut output bought ZERO steady-state time
      // at sf1m, 9.19 vs 9.31 s, while regressing the cold run 6×);
      // deployment appends from the materialized store anyway (the
      // Probe `maintain` cycle prices that shape)
      "q_ingest_index_update" -> 29,
      // r14 quality row (audited 33, re-read 2026-08-18 after the r18
      // prefix-verify rewrite): the exact prefix-join truth
      // (q_simjoin_prefix's chain, now array-verify shaped — see that
      // entry) + the staged gate chain + the six per-doc decision
      // joins of the confusion matrix
      "q_ingest_recall" -> 33,
      "q_sim_topk" -> 1, "q_sim_ivf" -> 3, "q_sim_ivf_probe2" -> 3,
      "q_text_langid" -> 0, "q_text_quality" -> 0, "q_text_tokens" -> 1,
      "q_text_fingerprint" -> 1, "q_multimodal_meta" -> 0,
      // pii/repetition are scan-speed projections; decontamination pays
      // the eval-side distinct (tiny) + the train-side per-doc count
      "q_text_pii" -> 0, "q_text_repetition" -> 0, "q_decontaminate" -> 2,
      // fingerprint window + final per-language agg; langid/quality/keep
      // are projections folded into the scan stage
      "q_pipeline_prep" -> 2,
      // sampling is a pure scan-speed filter; two-phase packing pays the
      // bounded (shard, sub) window [the only corpus-sized shuffle] + the
      // map-side-combined per-sub totals agg + the KB-scale offsets
      // window + the (shard, pack) manifest agg — 4 exchanges, of which
      // three carry row counts bounded by occupied sub-shards / packs,
      // never by the corpus (the trade that removed the unbounded
      // per-language window partition)
      "q_sample_stratified" -> 0, "q_pack_sequences" -> 4,
      // quota cap / rank trim: the bounded (group, sub) window [the
      // only corpus shuffle] + the per-(group, sub) counts agg + the
      // KB-scale offsets window; the offsets broadcast back
      "q_sample_quota" -> 3, "q_trim_outliers" -> 3,
      // ranked search: postings agg + the per-term df window over the
      // same filtered subtree + the candidate-doc agg; join-free,
      // top-k is TakeOrdered
      "q_text_search_ranked" -> 3,
      // as-of = union + ONE window shuffle on the key (no join at all);
      // range agg decomposition = per-second agg + per-block agg + the
      // edge join's re-key on blk + final per-interval agg — 4, but
      // every one is bounded by the TIME RANGE (seconds/blocks), never
      // by the probe count, which is the property that matters;
      // span dedup = df count on the span digest + mark join-back +
      // doc reassembly, all keyed on 16-byte digests / doc_id;
      // heavy hitters = candidate-rows group-by (the sketch agg and the
      // total are single-partition, candidates broadcast)
      "q_asof_join" -> 1, "q_range_join" -> 4, "q_dedup_spans" -> 3,
      // substring dedup (r11): same digest-keyed trio as span dedup —
      // (h, doc) distinct + df count + per-doc flagged-start collect
      "q_dedup_substrings" -> 3,
      // incremental probe: index (h, doc) distinct + df agg + the
      // pinned-SMJ mark join's delta-side exchange + flagged-start
      // collect (inline-build shape; a persisted bucketed+sorted index
      // removes its side's exchange AND sort in deployment)
      "q_dedup_substr_incremental" -> 4,
      // recall eval (r11): brute rank window + the IVF chain's probe and
      // result windows + the query-sized join/agg — all query-keyed
      "q_sim_recall" -> 7,
      // decode rungs are row-local fan-outs: zero exchanges, ever
      "q_image_jpeg" -> 0, "q_video_demux" -> 0,
      // chunked as-of: the bounded (key, chunk) window [the only
      // corpus-sized shuffle] + map-side-combined carry-out agg +
      // spine distinct + KB-scale carry-in window; the spine itself
      // broadcasts back (2 BroadcastExchanges, 0 extra shuffles)
      "q_asof_join_chunked" -> 4,
      "q_freq_heavyhitters" -> 1,
      // grouped MG: candidates agg on grp + the per-(grp, item) verify
      "q_freq_hh_grouped" -> 2,
      // pagerank: every iteration localCheckpoints (bounded-round
      // iteration — lineage must not grow), so the final frame reads a
      // materialized vertex table with zero residual exchanges; the
      // per-iteration arithmetic itself is pinned bit-exactly by
      // GraphProps + the unrolled-iteration oracle
      "q_pagerank" -> 0,
      // triangles: the oriented edge list checkpoints, so the residual
      // plan is wedge self-join + closure probe + per-corner count —
      // all hash joins on vertex/pair keys (wedge volume bounded
      // O(m^1.5) by the degree orientation)
      "q_triangles" -> 4,
      // bloom: the probe query is shuffle-free — the bit table
      // materializes (one KB-scale distinct, outside this plan) and
      // broadcasts into the k probe joins (asserted in LlmOpsSpec)
      "q_bloom_probe" -> 0,
      // image decode: synth + decode are fused row-local expressions —
      // a pure scan-speed projection, zero exchanges
      "q_image_pixels" -> 0,
      // sketches partial-aggregate map-side: the (type, hll-bucket)
      // level-1 shuffle + the per-type register/sample fold — both carry
      // sketch-sized state, never distinct values (r10: own deterministic
      // sketches, fully hash-adjudicated)
      "q_profile_sketch" -> 2,
      // grid-bounded shuffles only: the (key, bucket)/(key, ts) collapse
      // + the per-key ordered window — raw rows shuffle exactly once
      "q_gapfill" -> 2, "q_scd2" -> 2,
      // deletion-signature dedup + signature buckets (window shares the
      // bucket group-by's exchange) + surviving-pair distinct
      "q_fuzzy_join" -> 3,
      // funnel (r10 linear chain): stage-0 user-keyed agg + per later
      // stage AT MOST the type-sliced scan's join exchange — the
      // accumulator stays hash-partitioned on user through every
      // join+agg (each stage's groupBy reuses it), so 3 stages bound at
      // 3; at test scale the slices broadcast and the plan carries just
      // the stage-0 exchange (final k-count fold is SinglePartition)
      "q_funnel" -> 3,
      // cohort: the (user, bucket) grid distinct [the only corpus-sized
      // shuffle] + the user-keyed cohort min + the calendar-bounded
      // (cohort, period) agg; cohorts broadcast into the grid join
      "q_cohort_retention" -> 3,
      // transitions (r10 skew-adaptive): with no heavy user — the gate
      // decided at plan time by a user-dim count — the plan IS the
      // single per-user window [the only corpus-sized shuffle] + the
      // (prev, type) agg; the chunked two-phase machinery exists only
      // in the heavy branch, which this corpus never takes
      "q_event_transitions" -> 2,
      // pivot with an explicit value list: per-type conditional counts
      // in one map-side-combined agg — a single calendar-keyed shuffle
      "q_pivot" -> 1,
      // knn classify: the per-query top-k window is the ONLY exchange —
      // queries broadcast into the corpus scan, and both vote aggs are
      // satisfied by the window's query_id hash partitioning (group
      // keys ⊇ partition keys), so the votes never re-shuffle
      "q_sim_knn" -> 1,
      // commonness: token-keyed df agg + the df join-back + the per-doc
      // mean agg (the distinct shares the df agg's exchange)
      "q_text_commonness" -> 3,
      // incremental refresh: the delta-side state agg + the merge agg —
      // the base side is a localCheckpointed state TABLE (its lineage,
      // and its corpus scan, are gone from this plan by design)
      "q_agg_incremental" -> 2,
      // prefix join, audited 14 (plan re-read 2026-08-18, r18 verify
      // rewrite): token df agg + the df join-back re-key + per-doc rank
      // window + prefix bucket agg + the block-pair rebalancing
      // repartition + candidate dedup (doc_a,doc_b) + the per-doc
      // token-ARRAY branch (its own ranked subtree re-key + window +
      // doc_id agg — plan-time duplicates of the rank chain that AQE
      // exchange-reuse serves at runtime) + the SMJ verify re-keys
      // (cands→doc_a, arrays→doc_a, mid→doc_b, arrays→doc_b). MORE
      // exchanges than the pre-r18 fan-out shape (11) but far fewer
      // BYTES: the old chain shuffled candidates × tokens rows (sf0.1:
      // 3.18M rows / 107 MB) into a re-aggregation; the new ones are
      // candidate-sized or per-doc-sized. The verify joins stay SMJ,
      // never broadcast / SHUFFLE_HASH: a post-aggregate candidate
      // table's size is a planner guess, and on a mass-duplicate corpus
      // the true count is quadratic in clique size — a wrong broadcast
      // is a driver OOM and SHJ's non-spilling build side dies too
      // (both measured); SMJ degrades to disk
      "q_simjoin_prefix" -> 14,
      // PQ: the checkpointed codebook hides training's 5 eager exchanges
      // (init means + 2×(assign + means)); the LAZY plan is encode's
      // single corpus exchange + the two query-sized ones (lut agg,
      // rank window) — the codes scan itself never shuffles
      "q_sim_pq" -> 3,
      // IVF-PQ, audited 5 (plan read 2026-08-14): index build = encode's
      // groupBy(corpus_id) + assignCells' corpus_id rank window — their
      // join reuses that shared partitioning, no third corpus exchange —
      // plus the three query-sized serving exchanges (probe window, lut
      // agg, result rank window); both trainings hide behind the
      // checkpointed codebooks. The serving path ALONE is audited at 3
      // in its own PlanSpec test (persisted-index deployment)
      "q_sim_ivfpq" -> 5)
    val over = budget.flatMap { case (name, max) =>
      val plan = physicalPlan(SparkEntry.queries(name)(spark, sfDir))
      val n = "Exchange hashpartitioning".r.findAllIn(plan).length +
        "Exchange rangepartitioning".r.findAllIn(plan).length
      if (n > max) Some(s"$name: $n > $max") else None
    }
    assert(over.isEmpty, s"shuffle budget exceeded: ${over.mkString("; ")}")
  }

  test("scale-killer sweep: no query in the registry plans a cartesian product") {
    // the whole-registry guard (r13): every registered query's physical
    // plan is scanned for CartesianProduct — the one join shape with no
    // 100 TB story. The deliberate O(n²) ground truths (q_sim_* brute
    // force, the embcos eval) plan as BroadcastNestedLoopJoin, which is
    // a different operator and stays exempt BY CONSTRUCTION here; a
    // future query that degrades to a real cartesian fails this sweep
    // instead of waiting for a round-end plan audit to catch it.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = physicalPlan(SparkEntry.queries(name)(spark, sfDir))
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("as-of join plans one window shuffle and NO join operator") {
    val plan = physicalPlan(QueriesCore.qAsofJoin(spark, sfDir))
    // the union+window form must not degrade into a time-range join:
    // any join node here means the rewrite regressed to the
    // per-left-row-scan-of-right-history shape that dies at 100 TB
    assert(!plan.contains("Join"), s"as-of must be join-free:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"as-of is exactly one shuffle (the window partition):\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("range join plans a hash equi-join on the bucket, never a nested loop") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables(spark, sfDir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val incidents = ev
      .filter(col("event_type") === "error" && col("event_id") % 20 === 0)
      .select(col("event_id").as("iv_id"), col("ts").as("lo"))
    val activity = ev.filter(col("event_type").isin("click", "view", "purchase"))
    val pairs = graft.operators.Joins.rangeJoinFixed(incidents, activity,
      ivId = "iv_id", lo = "lo", lengthSeconds = 7200L, ts = "ts")
    // a raw inequality join would plan BroadcastNestedLoopJoin — the
    // O(probes × intervals) scan the bucketing exists to avoid
    val plan = physicalPlan(pairs)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), s"expected a (hash) equi-join on the bucket:\n$plan")
    // the decomposed aggregation (what q_range_join ships) must read the
    // SAME answer out of its block/edge partials as the pair stream does
    val viaPairs = pairs.groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value")).cast("long")).as("sum_val"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = QueriesCore.qRangeJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaPairs, "rangeAgg decomposition diverged from the pair join")
    val aggPlan = physicalPlan(QueriesCore.qRangeJoin(spark, sfDir))
    assert(!aggPlan.contains("BroadcastNestedLoopJoin") &&
      !aggPlan.contains("CartesianProduct"), aggPlan)
  }

  test("heavy hitters: candidates (carrying n) broadcast into the verify pass") {
    val df = QueriesLlm.freqHeavyHitters(spark, sfDir)
    val plan = physicalPlan(df)
    // the <= k candidate rows (each carrying the population count from
    // the SAME scan as the sketch) must broadcast; the only hash shuffle
    // groups the candidate keys' rows. Exactly one broadcast — a second
    // one would mean the total-count re-scan crept back in.
    assert("BroadcastExchange".r.findAllIn(plan).length == 1,
      s"candidates+n must broadcast once:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1, plan)
    // two scans of the item stream — sketch+count, then verify — never three
    assert("Scan parquet".r.findAllIn(plan).length <= 2, plan)
  }

  test("sketch profile: all-null-user type emits NULL hll_n_zero (no fabricated empty sketch)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a type whose user_id values are ALL null has no HLL sketch at all:
    // emitting 512 (m - 0) there would diverge from the oracle's absent
    // hll row — the contract is NULL for both sketch columns
    val dir = java.nio.file.Files.createTempDirectory("pfnull").toString
    Seq(
      (1L, Some(10L), "click", Some(1.5), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Some(11L), "click", Some(2.5), java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (3L, None: Option[Long], "ghost", Some(3.5), java.sql.Timestamp.valueOf("2024-01-01 02:00:00")),
      (4L, None: Option[Long], "ghost", None: Option[Double], java.sql.Timestamp.valueOf("2024-01-01 03:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = QueriesCore.qProfileSketch(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("ghost").isNullAt(out("ghost").fieldIndex("hll_n_zero")),
      "all-null-user type must carry NULL hll_n_zero")
    assert(out("ghost").isNullAt(out("ghost").fieldIndex("n_users_approx")))
    assert(!out("click").isNullAt(out("click").fieldIndex("hll_n_zero")))
  }

  test("sketch profile: bounded sketch shuffles, accuracy vs exact aggregates") {
    import org.apache.spark.sql.functions._
    val df = QueriesCore.qProfileSketch(spark, sfDir)
    val plan = physicalPlan(df)
    // one corpus scan; level-1 (type, bucket) + level-2 type fold — two
    // hash exchanges of sketch-sized state, never of distinct values
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2,
      s"profile must be the two-level sketch fold:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"profile must read the corpus ONCE:\n$plan")
    val exactU = graft.sources.Tables(spark, sfDir).events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // test-only driver-side materialization for rank checking (the
    // query path itself never collects)
    val byKey = graft.sources.Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (r <- df.collect()) {
      val key = r.getString(0)
      // the emitted estimate is the RAW hash-portable one; apply the
      // standard linear-counting correction driver-side (as a consumer
      // would — hll_n_zero is carried for exactly this) before checking
      val rawU = r.getDouble(2)
      val m = 512.0
      val v = r.getLong(3).toDouble
      val estU = if (rawU <= 2.5 * m && v > 0) m * math.log(m / v) else rawU
      val exact = exactU(key).toDouble
      // m=512 → rsd ≈ 1.04/sqrt(512) ≈ 4.6%; allow 3 sigma ≈ 14%
      assert(math.abs(estU - exact) <= math.max(3.0, exact * 0.14),
        s"$key: HLL corrected $estU (raw $rawU, V $v) vs exact $exact")
      // quantile contract: RANK error of the sample order statistic —
      // Bernoulli rate 1/4, so sigma_rank = sqrt(q(1-q)·n/0.25); 4 sigma
      val sorted = byKey(key)
      val n = sorted.length
      // p50/p95/p99 are scalar DOUBLE columns (flat profiling output)
      val approxP = Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6))
      for ((a, q) <- approxP.zip(Seq(0.5, 0.95, 0.99))) {
        val cntLt = sorted.count(_ < a)
        val cntLe = sorted.count(_ <= a)
        val tol = math.max(3.0, 4.0 * math.sqrt(q * (1 - q) * n / 0.25))
        assert(cntLe >= q * n - tol && cntLt <= q * n + tol,
          s"$key q=$q: value $a has rank window [$cntLt, $cntLe] of $n, tol $tol")
      }
      assert(approxP(0) <= approxP(1) && approxP(1) <= approxP(2))
      // quantiles are scale-6-quantized (floor), so allow one tick below min
      assert(approxP(0) >= r.getDouble(7) - 1e-6 && approxP(2) <= r.getDouble(8))
    }
  }

  test("runtime bloom filter prunes the fact side of a selectively-filtered join") {
    import org.apache.spark.sql.functions._
    // at 100 TB a shuffled fact⋈dim join with a selective dim filter
    // should not shuffle the whole fact table: Catalyst injects a bloom
    // filter built from the filtered dim into the fact scan. The
    // thresholds assume cluster-scale tables, so pin them down for the
    // local corpus — production keeps the defaults.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val t = graft.sources.Tables(spark, sfDir)
      val sel = t.customer.filter(col("c_nationkey") === 3)
      val joined = t.orders
        .join(sel, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"expected an injected runtime bloom filter:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_component_activity is a single-shuffle partial-agg plan") {
    val plan = physicalPlan(QueriesRef.componentActivity(spark, sfDir))
    val nExchange = "Exchange".r.findAllIn(plan).length
    // one shuffle for the (window, key) agg; AQE may add a read node but
    // no second Exchange
    assert(nExchange == 1, s"expected exactly 1 shuffle:\n$plan")
  }

  test("PQ ADC search: codegen'd lookup, two query-side exchanges, corpus only streams") {
    import org.apache.spark.sql.execution.debug
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ce"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // pin the index inputs (localCheckpoint) so this audits the SEARCH
    // plan alone — the serving path against a persisted index
    val cb = graft.operators.Ann.pqCodebook(corpus, iters = 0).localCheckpoint()
    val codes = graft.operators.Ann.pqEncode(cb, corpus).localCheckpoint()
    val q = graft.operators.Ann.pqTopK(cb, codes, queries, k = 5)
    val plan = physicalPlan(q)
    // two exchanges, BOTH queries-sized: the lut aggregate and the
    // per-query rank window; the codes scan itself never shuffles
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"PQ search should shuffle only query-side state (lut agg + rank window):\n$plan")
    assert(plan.contains("BroadcastExchange"), s"lut/codebook must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    // the ADC expression's doGenCode must land in generated code (the
    // query must be BUILT with AQE off — an AdaptiveSparkPlanExec wrapper
    // defers codegen and the inspection would see zero subtrees)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q2 = graft.operators.Ann.pqTopK(cb, codes, queries, k = 5)
      val gen = debug.codegenString(q2.queryExecution.executedPlan)
      assert(gen.contains("% 16 != 0"), "PqAdcDistance codegen missing from generated source")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("IVF-PQ serving: query-sized exchanges only, broadcast probe+lut, codegen ADC") {
    import org.apache.spark.sql.execution.debug
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("ce"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // pin the index inputs (localCheckpoint) so this audits the SEARCH
    // plan alone — the serving path against a persisted IVF-PQ index
    val coarse = graft.operators.Ann.kmeansCodebook(corpus, k = 4, iters = 0)
      .localCheckpoint()
    val pqcb = graft.operators.Ann.pqCodebook(corpus, iters = 0).localCheckpoint()
    val codes = graft.operators.Ann.pqEncode(pqcb, corpus)
      .join(graft.operators.Ann.assignCells(coarse, corpus)
        .select(col("corpus_id"), col("cell")), "corpus_id")
      .localCheckpoint()
    val q = graft.operators.Ann.ivfPqTopK(coarse, pqcb, codes, queries,
      k = 5, nprobe = 2)
    val plan = physicalPlan(q)
    // three exchanges, ALL queries-sized: the probe's rank window, the
    // lut aggregate, the per-query result rank window; the codes scan
    // itself never shuffles — probe set and lut reach it broadcast
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 3, s"IVF-PQ serving should shuffle only query-side state:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"probe/lut must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q2 = graft.operators.Ann.ivfPqTopK(coarse, pqcb, codes, queries,
        k = 5, nprobe = 2)
      val gen = debug.codegenString(q2.queryExecution.executedPlan)
      assert(gen.contains("% 16 != 0"), "PqAdcDistance codegen missing from generated source")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("served IVF-PQ: codes scan prunes unprobed cell directories (DPP) and never retrains") {
    // the PERSISTED-store serving path (searchIvfPqIndex), not the
    // pinned-localCheckpoint audit above: the codes live partitionBy("cell")
    // on disk, and the probe's broadcast join must reach the SCAN as a
    // dynamic partition filter — at 100 TB nprobe/kCells of the index is
    // the fraction read, and that claim is a plan property, not a hope
    val df = QueriesLlm.simIvfPqServed(spark, sfDir) // builds + loads the index
    val plan = physicalPlan(df)
    assert(plan.contains("dynamicpruning"),
      s"codes scan must prune unprobed cells at the partition level:\n$plan")
    // no k-means / training aggregate over the corpus in the query path:
    // the only aggregate allowed is the query-sized LUT build
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    assert(df.count() > 0)
  }

  test("hot paths compile into whole-stage codegen, including graft_cosine") {
    import org.apache.spark.sql.execution.debug
    // AQE wraps the plan and defers codegen until execution; disable it
    // for this static inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("q1_agg", "q_text_quality", "q_component_activity")) {
        val gen = debug.codegenString(
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
        assert(!gen.startsWith("Found 0 WholeStageCodegen"), s"$name left codegen:\n${gen.take(300)}")
      }
      // each custom expression's doGenCode must actually land in
      // generated code (a janino failure would silently fall back to
      // interpreted eval)
      val topk = QueriesLlm.simTopk(spark, sfDir)
      val gen = debug.codegenString(topk.queryExecution.executedPlan)
      assert(gen.contains(".getFloat("), "CosineSimilarity codegen missing from generated source")
      val pcm = debug.codegenString(
        QueriesLlm.audioPcm(spark, sfDir).queryExecution.executedPlan)
      assert(pcm.contains("WavPcmStats.decode"),
        "graft_wav_pcm codegen missing from generated source")
      val hll = debug.codegenString(
        QueriesEvents.hllUsers(spark, sfDir).queryExecution.executedPlan)
      assert(hll.contains("Md5Bits60.top60"),
        "graft_md5_60 codegen missing from generated source")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q_agg_email_aliases_company has no join-back (window max instead)") {
    val plan = physicalPlan(QueriesFn.aggEmailAliasesCompany(spark, sfDir))
    val joins = "Join".r.findAllIn(plan).length
    // exactly the final aliases⋈company join; the max-run lookup must not
    // be a second join
    assert(joins <= 2, s"unexpected extra join(s):\n$plan")
  }

  test("deliberate single-partition windows have provably bounded input") {
    // WindowExec's "No Partition Defined" warning appears in the bench
    // log; every intentional site must be structurally bounded — a
    // GlobalLimit (post-limit rank window: <= k rows) or the 256-ary
    // `_sub` sub-bucket aggregate (offsets table: <= 256 rows per group
    // axis) BELOW the window — so a future regression to a corpus-sized
    // global window fails here instead of hiding behind "that warning is
    // expected". Covers all three source sites: Ann.kmeansCodebook's
    // seed ranking, and the two Sampling offset windows.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    for (name <- Seq("q_sim_kmeans", "q_shuffle_order", "q_sample_systematic")) {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      val globalWins = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(globalWins.nonEmpty,
        s"$name: expected a deliberate global window (did the shape change? update this test)")
      globalWins.foreach { w =>
        val bounded = w.child.collectFirst {
          case g: GlobalLimit => g
          case a: Aggregate
            if a.groupingExpressions.exists(_.references.exists(_.name == "_sub")) => a
        }
        assert(bounded.isDefined,
          s"$name: single-partition window over UNBOUNDED input:\n$w")
      }
    }
  }

  test("bpe tokenize vocab join survives a broadcast-threshold-0 session") {
    // the vocab side of the (word -> token count) join must not DEPEND
    // on broadcastability: at raw-crawl scale the distinct-word set is
    // 1e8-1e9 rows, and a forced broadcast hint there is a driver OOM.
    // With auto-broadcast disabled the join must plan as a shuffle join
    // keyed on `word` — and still produce the oracle-checked counts.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Tokenize.bpeTokenCounts(
        graft.sources.Tables(spark, sfDir).documents
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")),
        Seq(("a", "b"), ("c", "d")))
      val plan = physicalPlan(df)
      assert(!plan.contains("BroadcastHashJoin"),
        s"vocab join must not require broadcast:\n$plan")
      assert(plan.contains("Join"), s"expected a join on word:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }
}
