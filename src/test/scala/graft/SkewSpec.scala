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
}
