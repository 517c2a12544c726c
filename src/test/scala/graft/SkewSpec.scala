package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the SURVEY §5 skew story: AQE's runtime skew-join splitting
  * actually engages on a skewed shuffle join under this session's
  * configuration (thresholds scaled down to test size — the mechanism,
  * not the constants, is what transfers to 100 TB). */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 50k rows on ONE hot key + 50 keys with 10 rows each
      val skewed = spark.range(50000).select(lit("hot").as("k"), col("id"))
        .union(spark.range(500).select(concat(lit("k"), (col("id") % 50)).as("k"), col("id")))
      val dim = (0 until 50).map(i => s"k$i").toDF("k").union(Seq("hot").toDF("k"))
        .withColumn("v", length(col("k")))

      // NOTE: aggregate globally, not on the join key — AQE skips skew
      // splitting when the join output must stay hash-distributed on the
      // same key for a downstream stage
      val joined = skewed.join(dim, "k").groupBy().agg(count(lit(1)).as("n"), sum("id").as("s"))
      val rows = joined.collect() // finalize AQE on this execution
      assert(rows(0).getLong(0) == 50500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(300))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n${plan.take(4000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("salted join: keys on (key, salt), hashes not sorts, equals the plain join") {
    import graft.operators.Joins
    import graft.sources.Tables
    val t = Tables(spark, sfDir)
    val big = t.events.select(col("event_id"), col("user_id"), col("value"))
    val dim = t.customer.select(col("c_custkey"), col("c_mktsegment"))
    val salted = Joins.saltedJoin(big, dim,
      bigKey = "user_id", smallKey = "c_custkey", saltBy = "event_id", salts = 8)
    // the plan must key the shuffle on (key, salt) — the spread that
    // un-pins the hot key — and hash-join without a broadcast (the
    // operator's regime is dims too big to broadcast)
    val plan = physicalPlan(salted)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("_salt"), s"join keys must include the salt:\n$plan")
    // row-identical to the plain join, multiplicities included: compare
    // full sorted row sets, not aggregates
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    val plain = big.join(dim, big("user_id") === dim("c_custkey"))
    assert(rows(salted) == rows(plain), "salted join diverged from the plain join")
    // every salt value actually occupied (the spread is real, not
    // degenerate): re-derive the salt the operator assigns
    val nSalts = big.select(pmod(hash(col("event_id")), lit(8)).as("s"))
      .distinct().count()
    assert(nSalts == 8, s"expected all 8 salts occupied, got $nSalts")
  }

  test("as-of join under 90%-one-key skew: chunked carry matches, partitions bounded") {
    import spark.implicits._
    import graft.operators.Joins
    // 90% of all events on ONE key — the geometry where asOfJoin's
    // per-key window serializes the corpus through one task. 10k rows
    // keeps the test fast; the BOUND is what transfers: the chunked
    // form's window partitions by (key, chunk), so the hot key splits
    // across time-range/chunkSeconds partitions instead of one.
    val n = 10000
    val rows = (0 until n).map { i =>
      val key = if (i % 10 == 9) (i % 7).toLong + 1L else 0L // key 0 = 90%
      (i.toLong, key, 1000000L + (i * 13) % 86400,
        if (i % 2 == 0) "purchase" else "click",
        // null payloads on a third of clicks: the carry must track
        // last-NON-NULL per payload column across chunk boundaries
        if (i % 3 == 0) null else s"page${i % 50}")
    }
    val ev = rows.toDF("event_id", "user_id", "es", "event_type", "page")
      .withColumn("ts", col("es").cast("timestamp")).drop("es")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("page"))
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("asof_id"), col("click_page")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val payload = Seq("page" -> "click_page")
    val oneWindow = collect(Joins.asOfJoin(purchases, clicks,
      key = "user_id", ts = "ts", leftId = "event_id", rightId = "event_id",
      rightPayload = payload))
    val chunked = Joins.asOfJoinChunked(purchases, clicks,
      key = "user_id", ts = "ts", leftId = "event_id", rightId = "event_id",
      rightPayload = payload, chunkSeconds = 3600L)
    assert(collect(chunked) == oneWindow,
      "chunked as-of diverged from the one-window form under skew")
    // the plan's big window must partition by (key, chunk), never key alone
    val plan = chunked.queryExecution.executedPlan.toString
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, plan.take(2000))
    assert(winSpecs.exists(s => s.contains("user_id") && s.contains("_chunk")),
      s"expected a (key, chunk)-partitioned window:\n${winSpecs.mkString("\n")}")
  }
}
