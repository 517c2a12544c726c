package graft

/** Per-round benchmark: runs the SURVEY §6 headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Uses the same [[GraftSession]] configuration as Verify so benchmarked
  * plans are the verified plans (UTC timezone, AQE, extensions). A query
  * that throws is reported in an `"errors"` map with wall-time -1 — a
  * crashed query must never read as a speedup.
  */
object Bench {
  /** 1-minute load average, or -1 where /proc/loadavg is unavailable. */
  private def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Idle-host gate: a benchmark started on a contended host produces a
    * wrong-by-measurement artifact (round 10 committed one 1.95× off its
    * own idle re-run). Wait, bounded, for the 1-min load to drop below
    * the threshold before timing anything; if it never does, proceed but
    * the recorded `load_start` marks the artifact as suspect.
    */
  private def awaitIdle(maxLoad: Double, maxWaitSec: Int): Double = {
    val deadline = System.nanoTime() + maxWaitSec * 1e9.toLong
    var l = loadAvg()
    while (l >= 0 && l > maxLoad && System.nanoTime() < deadline) {
      System.err.println(f"bench: host load $l%.2f > $maxLoad%.2f, waiting for idle...")
      Thread.sleep(15000)
      l = loadAvg()
    }
    l
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 2.0, not 4.0 (r12): two consecutive rounds committed a graded
    // artifact from a 3.4-load window that distorted the shuffle-heavy
    // queries ~2x while still passing the 4.0 gate. On 32 CPUs a 1-min
    // load of 2 is genuinely idle; anything above it is the neighbors.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0").toDouble
    val maxWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAIT_SEC", "1800").toInt
    val loadStart = awaitIdle(maxLoad, maxWait)
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var errors = List.empty[(String, String)]
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Three executions per query: the first ("cold") pays JVM/codegen/JIT
    // warmup; the min of the remaining two is steady-state engine
    // throughput — the number comparable across rounds and against
    // BASELINE.md (whose DuckDB timings use the same best-of policy).
    // Min, not mean: this host shows 10x wall-clock noise spikes, and
    // min-of-k is the standard noise-robust estimator for that regime.
    // Optional env override of the headline set (dev loop / scale
    // profiling of specific operators); unknown names fail loudly.
    val names = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(SparkEntry.headline)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown bench queries: $unknown")
    val timed = names.map { name =>
      try {
        val cold = once(name)
        // min-of-3 steady runs (was min-of-2 through round 10): one extra
        // execution per query buys another sample against this host's
        // 10× spike regime — cheap insurance for the graded artifact
        val steady = Seq(once(name), once(name), once(name)).min
        (name, cold, steady)
      } catch {
        case e: Throwable =>
          errors ::= (name -> e.toString.take(200))
          (name, -1.0, -1.0)
      }
    }
    val results = timed.map { case (n, _, s) => n -> s }
    val colds = timed.map { case (n, c, _) => n -> c }

    val qs = results.map { case (k, v) => s"${Jsons.str(k)}:$v" }.mkString("{", ",", "}")
    val cs = colds.map { case (k, v) => s"${Jsons.str(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${Jsons.str(k)}:${Jsons.str(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // load_start/load_end make a contended window visible IN the artifact:
    // a reader comparing rounds can reject a run whose load_start exceeded
    // the gate instead of grading a measurement of the neighbors' work.
    // (load_end includes the bench's own 32-thread work — read it only as
    // a gross-contention flag, e.g. a value far above the thread count)
    val loadEnd = loadAvg()
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$cs,"errors":$es,"n_failed":${errors.size},"load_start":$loadStart,"load_end":$loadEnd,"sf":${Jsons.str(sfDir)}}"""
    println(line)
    // also land the line in a file, so the harness never has to scrape it
    // out of the sbt log tail (overridable for concurrent runs)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"bench.json write failed: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
