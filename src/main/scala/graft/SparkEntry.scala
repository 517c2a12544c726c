package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed README flagship (reference README.md:241-252): commit
    * activity per 30d window and source component. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRef.commitActivityComponent(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRef.queries ++ QueriesFn.queries ++ QueriesCore.queries ++
      QueriesLlm.queries ++ QueriesEvents.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRef.oracle ++ QueriesFn.oracle ++ QueriesCore.oracle ++
      QueriesLlm.oracle ++ QueriesEvents.oracle
  /** Headline queries benched per round (SURVEY.md §6); every key must
    * exist in [[queries]] — no silent filtering. */
  def headline: Seq[String] = {
    val hs = Seq("q1_agg", "q_join_star", "q_component_activity",
      "q_dedup_minhash", "q_sim_topk", "q_text_quality", "q_session_windows",
      // round-6 temporal/sketch tier, tracked round-over-round
      "q_asof_join", "q_range_join", "q_dedup_spans", "q_freq_heavyhitters",
      // round-7 tier: trained quantizer, CMS, snapshot diff, layout key
      "q_sim_kmeans", "q_freq_cms", "q_corpus_diff", "q_zorder",
      // round-8 tier: link analysis, membership sketch, quota, salted join
      "q_pagerank", "q_bloom_probe", "q_sample_quota", "q_salted_join",
      // round-8b tier: event analytics, exact sim join, incremental agg
      "q_funnel", "q_event_transitions", "q_simjoin_prefix", "q_agg_incremental",
      // round-9 tier: HLL sketch, real PCM decode, user-scale pagerank,
      // composed IVF-PQ serving, chunking, BPE tokenizer training.
      // r10: tokenize serves from the PERSISTED model (q_bpe_tokenize
      // stays registered + oracle-checked; the headline prices training
      // once, in q_bpe_merges, like deployment does)
      "q_hll_users", "q_audio_pcm", "q_pagerank_events", "q_sim_ivfpq",
      "q_chunk_docs", "q_bpe_merges", "q_bpe_tokenize_served",
      // round-10 tier: real image + video decodes (zlib PNG, DIB AVI)
      // and the served IVF-PQ path (q_sim_ivfpq stays: the honest e2e
      // train+encode+serve cost, priced once like q_bpe_merges)
      "q_image_pixels", "q_video_frames", "q_sim_ivfpq_served",
      // round-11 tier: baseline JPEG decode (the last decode rung), the
      // real AVI frame demux (raw frame bytes + exact pts), exact
      // substring dedup over overlapping grams, and the ANN recall eval
      "q_image_jpeg", "q_video_demux", "q_dedup_substrings", "q_sim_recall",
      // round-12 tier: recall rows for the lossy rungs that actually
      // serve (PQ ADC, persisted IVF-PQ) — quality next to their speed —
      // the MP4 sample-table demux closing the frame-extraction ladder,
      // the served gram-index probe (the nightly deployment form of
      // substring dedup: build paid once in the cold run, steady runs
      // price the delta-sized probe like a real standing corpus), and
      // the dedup-quality eval (LSH pair recall/precision vs the exact
      // τ=0.8 join — the q_sim_recall posture for the dedup family)
      "q_sim_recall_pq", "q_sim_recall_ivfpq", "q_video_demux_mp4",
      "q_dedup_substr_served", "q_dedup_recall",
      // round-13: the composed 4-gate admission pipeline (bloom →
      // band probe → gram cut → quota) — the deployable form the
      // r12 verdict asked for, benched as one end-to-end row; the
      // served sibling probes PERSISTED artifacts (build paid once in
      // the cold run, steady runs price the delta-sized probes — the
      // q_sim_ivfpq / q_sim_ivfpq_served convention)
      "q_ingest_gates", "q_ingest_gates_served",
      // round-14: the admission pipeline's QUALITY row — end-to-end
      // false-refusal / false-admission vs exact ground truth (the
      // "speed wins bought with silent loss are not done" standard,
      // applied to the flagship composition itself)
      "q_ingest_recall",
      // round-14b: the LSH banding S-curve measured (the band-gate
      // tuning knob), SemDeDup (kmeans-cell-bounded semantic dedup),
      // trigram-LM surprisal scoring, and token-budget mixture
      "q_dedup_recall_geom", "q_dedup_semdedup",
      "q_text_perplexity", "q_text_perplexity_served", "q_sample_mixture",
      // round-15: SemDeDup with cell probing — the nprobe=2 mitigation
      // for the measured cross-cell miss class, priced next to the
      // top-1 row it improves on
      "q_dedup_semdedup_probe2",
      // round-16: the LM gate's quality row (self-calibrating threshold
      // sweep), phrase search inline + served (the positional index
      // persisted bucketed-by-term builds in the cold run), and the
      // fuzzy family's served probe (signature index likewise)
      "q_lm_gate_recall", "q_text_phrase", "q_text_phrase_served",
      "q_fuzzy_join_served",
      // round-16b: the phrase index's MAINTENANCE row — the standing
      // corpus' index built in the cold run, the delta APPENDED
      // log-structured at delta cost (the 31c4 convention applied to
      // the phrase family); steady runs price probe-after-append
      "q_text_phrase_incremental",
      // round-17: the fuzzy family's MAINTENANCE row — new reference
      // strings land as delta-sized signature segments, the probe
      // recomputes bucket counts over the union (stored bsz is stale
      // after any append — trusting it half-drops a bucket that
      // crosses the cap only via the append); steady runs price
      // probe-after-append, the cold run pays base+segment builds
      "q_fuzzy_join_incremental",
      // round-17b: the ANN family's MAINTENANCE row, completing the
      // append ladder — the delta encodes with the STORED codebooks
      // into the existing cell directories (no retrain, no stale
      // counts; codebook drift is the stated boundary); steady runs
      // price the served probe, the cold run pays build+append
      "q_sim_ivfpq_incremental")
    val missing = hs.filterNot(queries.contains)
    require(missing.isEmpty, s"headline queries not implemented: $missing")
    hs
  }
}
