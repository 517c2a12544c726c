package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Property checks for the behavioral analytics operators: funnel reach,
  * cohort retention and chunked transition counts must agree with the
  * obviously-correct sequential semantics on arbitrary event geometry —
  * same-timestamp ties (broken by id), users missing stages, events
  * landing exactly on chunk boundaries, single-event users. The
  * transition check deliberately uses a chunk far smaller than the time
  * range so the two-phase boundary stitching carries most pairs. */
object BehaviorProps extends Properties("BehaviorSemantics") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  private val types = Vector("view", "click", "purchase")

  // (event_id, user, epoch-second, type-index); seconds span many 60 s
  // chunks and collide often enough to exercise tie-breaks
  private val genEvents: Gen[List[(Long, Long, Long, String)]] =
    for {
      n <- Gen.choose(1, 60)
      mk = for {
        u <- Gen.choose(0L, 3L)
        t <- Gen.choose(0L, 600L)
        k <- Gen.choose(0, types.size - 1)
      } yield (u, t, types(k))
      xs <- Gen.listOfN(n, mk)
    } yield xs.zipWithIndex.map { case ((u, t, ty), i) => (100L + i, u, t, ty) }

  private def df(xs: List[(Long, Long, Long, String)]) = {
    import TestSpark.spark.implicits._
    xs.toDF("event_id", "user_id", "es", "event_type")
      .withColumn("ts", col("es").cast("timestamp")).drop("es")
  }

  /** Sequential greedy funnel: stage k's reach = earliest event of that
    * type strictly after stage k-1's reach. */
  private def bruteFunnel(xs: List[(Long, Long, Long, String)],
      stages: Seq[String]): Seq[Long] = {
    val byUser = xs.groupBy(_._2)
    stages.indices.map { k =>
      byUser.count { case (_, evs) =>
        var last = Long.MinValue
        stages.take(k + 1).forall { st =>
          val nxt = evs.collect { case (_, _, t, ty) if ty == st && t > last => t }
          if (nxt.isEmpty) false else { last = nxt.min; true }
        }
      }.toLong
    }
  }

  property("funnelReach == sequential greedy match") =
    Prop.forAll(genEvents) { xs =>
      val got = Behavior
        .funnelReach(df(xs), "user_id", "ts", "event_type", types)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = bruteFunnel(xs, types).zipWithIndex
        .map { case (n, k) => k.toLong -> n }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("cohortRetention == per-user first-bucket grid") =
    Prop.forAll(genEvents) { xs =>
      val step = 60L
      val got = Behavior.cohortRetention(df(xs), "user_id", "ts", step)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val grid = xs.map { case (_, u, t, _) => (u, t - (t % step)) }.distinct
      val cohort = grid.groupBy(_._1).map { case (u, bs) => u -> bs.map(_._2).min }
      val want = grid
        .groupBy { case (u, b) => (cohort(u), (b - cohort(u)) / step) }
        .map { case (k, rows) => k -> rows.size.toLong }
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("chunked transitionCounts == single sequential pass") =
    Prop.forAll(genEvents) { xs =>
      val want = xs.groupBy(_._2).values.flatMap { evs =>
        evs.sortBy { case (id, _, t, _) => (t, id) }
          .map(_._4).sliding(2).collect { case Seq(a, b) => (a, b) }
      }.toList.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // all three routing regimes must agree: every user light (the
      // single-window fast path), every user heavy (the chunked
      // two-phase path), and the mixed split — routing is a cost
      // choice, never a semantics choice
      Prop.all(Seq(Long.MaxValue, 0L, 10L).map { threshold =>
        val got = Behavior.transitionCounts(df(xs), "user_id", "ts",
            "event_id", "event_type", chunkSeconds = 60L,
            maxWindowEvents = threshold)
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        Prop(got == want) :| s"threshold=$threshold got=$got want=$want"
      }: _*)
    }

  property("transitionCounts with provided user stats == self-derived") =
    Prop.forAll(genEvents) { xs =>
      import TestSpark.spark.implicits._
      val want = xs.groupBy(_._2).values.flatMap { evs =>
        evs.sortBy { case (id, _, t, _) => (t, id) }
          .map(_._4).sliding(2).collect { case Seq(a, b) => (a, b) }
      }.toList.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val exact = xs.groupBy(_._2).map { case (u, es) => (u, es.size.toLong) }
        .toSeq.toDF("user_id", "n_events")
      // stale stats that OVER-count only route more users to the chunked
      // path — a cost error, never a semantics error (the documented
      // contract; under-counting is the caller's refresh obligation)
      val stale = exact.withColumn("n_events",
        org.apache.spark.sql.functions.col("n_events") * 100)
      Prop.all(Seq(exact, stale).map { dim =>
        val got = Behavior.transitionCounts(df(xs), "user_id", "ts",
            "event_id", "event_type", chunkSeconds = 60L,
            maxWindowEvents = 10L, userCounts = Some(dim))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        Prop(got == want) :| s"got=$got want=$want"
      }: _*)
    }
}
