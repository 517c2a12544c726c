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

  test("q_component_activity is a single-shuffle partial-agg plan") {
    val plan = physicalPlan(QueriesRef.componentActivity(spark, sfDir))
    val nExchange = "Exchange".r.findAllIn(plan).length
    // one shuffle for the (window, key) agg; AQE may add a read node but
    // no second Exchange
    assert(nExchange == 1, s"expected exactly 1 shuffle:\n$plan")
  }

  test("q_agg_email_aliases_company has no join-back (window max instead)") {
    val plan = physicalPlan(QueriesFn.aggEmailAliasesCompany(spark, sfDir))
    val joins = "Join".r.findAllIn(plan).length
    // exactly the final aliases⋈company join; the max-run lookup must not
    // be a second join
    assert(joins <= 2, s"unexpected extra join(s):\n$plan")
  }
}
