package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Local testing runs `local[32]`, but every knob here is chosen for the
  * 1000-executor / 100 TB posture: AQE handles runtime coalescing and
  * skew-join splitting, shuffle partitions default low for local runs and
  * are expected to be overridden (or AQE-coalesced) on a real cluster.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects; read nanos as long (Tables.events
      // converts exactly). Set here so every graft-owned session agrees;
      // Tables re-sets it defensively for driver-owned sessions.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Scan-split sizing for the LOCAL bench scale (tens of MB): the
      // 128 MB default bins every file of a small corpus into one map
      // task, serializing the scan while 31 cores idle. 4 MB splits /
      // 1 MB open cost keep ~32-way scan parallelism at bench SFs; a
      // real cluster deployment overrides both via spark-submit --conf
      // (at 100 TB the defaults are right — files outgrow the bins).
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1L * 1024 * 1024).toString)
      // re-running a window job replaces only the partitions it touches
      // (idempotent result sinks — see sources.Sinks)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // The generated-class cache defaults to 100 entries (static conf,
      // applies to the first session of the JVM). This engine's registry
      // runs 58+ multi-stage queries per bench window — thousands of
      // distinct codegen units — so at 100 the cache thrashes and STEADY
      // runs recompile: sampled stacks showed executor tasks BLOCKED in
      // ClassLoader.loadClass under Janino cook for whole seconds
      // (r18, the q_ingest_gates 2.4 s-wall/0.3 s-CPU single-task
      // stages). Sized to hold a full window's classes; compiled classes
      // are KB-scale, so the ceiling is MBs of metaspace, not heap.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Measured and REJECTED (r18): spark.sql.codegen.useIdInClassName=
      // false. The codegen cache keys on the generated source, and the
      // default class name embeds codegenStageId — assigned in AQE
      // stage-MATERIALIZATION order — so timing jitter renames
      // otherwise-identical units and steady runs recompile them
      // (CodegenMetrics: q_ingest_recall 18-50 Janino compiles per
      // STEADY run, 0 with the id off; q_dedup_recall_geom cold
      // 107 -> 55, its three geometry branches deduped). But the full
      // 58-query window went 67.7 -> 84.4 s: one shared class serving
      // many plan positions turns its hot virtual call sites
      // megamorphic (each position sees different concrete iterator/
      // relation types), and the JIT profile pollution costs the
      // hot-loop queries far more than the recompiles cost the
      // composed ones (q_dedup_recall 1.8 -> 5.8 s, q_simjoin_prefix
      // 1.9 -> 4.7). Per-position classes keep inline caches
      // monomorphic; the AQE-order recompiles are the lesser evil.
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // Cluster-deployable: under spark-submit (or any pre-configured
    // deployment) `spark.master` arrives as a system property / existing
    // SparkConf entry — respect it. Only default to local[cores] when
    // nothing has chosen a master, so the same builder serves local tests
    // and a 1000-executor cluster without a fork.
    if (sys.props.contains("spark.master") || sys.env.contains("MASTER")) b
    else b.master(s"local[$cores]")
  }

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
