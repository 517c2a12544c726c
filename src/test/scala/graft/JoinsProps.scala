package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Property checks for the temporal joins: the optimized shapes
  * (union+window as-of, segment-tree range aggregation) must agree with
  * the obviously-correct brute-force semantics on arbitrary event
  * geometry — duplicate timestamps, inclusive-boundary hits, intervals
  * shorter/longer than the block, aligned and misaligned starts. These
  * are exactly the edge cases a fixed corpus never exercises all of. */
object JoinsProps extends Properties("TemporalJoinSemantics") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  // timestamps cluster on a coarse grid with ±1 jitter so exact ties
  // (click second == purchase second) and boundary hits actually occur
  private val genEvents: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      mk = for {
        key <- Gen.choose(0L, 2L)
        base <- Gen.choose(0L, 20L)
        jit <- Gen.oneOf(-1L, 0L, 1L)
      } yield (key, 1000000L + base * 900L + jit)
      ls <- Gen.listOfN(nl, mk)
      rs <- Gen.listOfN(nr, mk)
    } yield (
      ls.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) },
      rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  property("asOfJoin == per-left argmax over (ts, id)") =
    Prop.forAll(genEvents) { case (ls, rs) =>
      import TestSpark.spark
      import spark.implicits._
      def df(xs: List[(Long, Long, Long)]) = xs.toDF("event_id", "user_id", "es")
        .withColumn("ts", col("es").cast("timestamp")).drop("es")
      val got = Joins.asOfJoin(df(ls), df(rs), key = "user_id", ts = "ts",
          leftId = "event_id", rightId = "event_id", rightPayload = Nil)
        .select(col("event_id"), col("asof_id")).collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val want = ls.map { case (lid, k, lt) =>
        val cands = rs.filter { case (_, rk, rt) => rk == k && rt <= lt }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  /** The skew-proof chunked decomposition must be indistinguishable from
    * the one-window form — including the payload it carries — for any
    * chunk width: 1 s (every row its own chunk, everything resolves via
    * carry-ins), the 900 s event grid (boundary-aligned chunks), and a
    * width larger than the whole time range (single chunk — degenerates
    * to the one-window form). */
  property("asOfJoinChunked == asOfJoin at any chunk width") =
    Prop.forAll(genEvents, Gen.oneOf(1L, 450L, 900L, 1000000000L)) {
      case ((ls, rs), chunkSeconds) =>
        import TestSpark.spark
        import spark.implicits._
        def df(xs: List[(Long, Long, Long)]) = xs.toDF("event_id", "user_id", "es")
          .withColumn("ts", col("es").cast("timestamp")).drop("es")
        def run(f: => org.apache.spark.sql.DataFrame) = f
          .select(col("event_id"), col("asof_id"), col("r_ts")).collect()
          .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
        val payload = Seq("ts" -> "r_ts")
        val got = run(Joins.asOfJoinChunked(df(ls), df(rs), key = "user_id",
          ts = "ts", leftId = "event_id", rightId = "event_id",
          rightPayload = payload, chunkSeconds = chunkSeconds))
        val want = run(Joins.asOfJoin(df(ls), df(rs), key = "user_id",
          ts = "ts", leftId = "event_id", rightId = "event_id",
          rightPayload = payload))
        Prop(got == want) :| s"chunk=$chunkSeconds got=$got want=$want"
    }

  private val genIntervals: Gen[(List[(Long, Long)], List[(Long, Long, Long)], Long, Long)] =
    for {
      ni <- Gen.choose(1, 10)
      np <- Gen.choose(0, 40)
      len <- Gen.oneOf(1L, 2L, 899L, 900L, 901L, 1800L, 2350L) // < / = / > block
      blk <- Gen.oneOf(300L, 900L)
      ivs <- Gen.listOfN(ni, for {
        base <- Gen.choose(0L, 15L)
        jit <- Gen.oneOf(-1L, 0L, 1L) // aligned and misaligned starts
      } yield 1000000L + base * 900L + jit)
      ps <- Gen.listOfN(np, for {
        base <- Gen.choose(0L, 18L)
        jit <- Gen.oneOf(-1L, 0L, 1L)
        v <- Gen.choose(0L, 50L)
      } yield (1000000L + base * 900L + jit, v))
    } yield (
      ivs.zipWithIndex.map { case (lo, i) => (i.toLong, lo) },
      ps.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) },
      len, blk)

  property("rangeJoin == brute-force containment pairs for any bucket size") =
    Prop.forAll(genIntervals) { case (ivs, ps, len, blk) =>
      import TestSpark.spark
      import spark.implicits._
      // blk may be smaller than len: intervals fan out to many buckets,
      // and every qualifying pair must still emit exactly once
      val ivDf = ivs.toDF("iv_id", "los")
        .withColumn("lo", col("los").cast("timestamp"))
        .withColumn("hi", (col("los") + len).cast("timestamp")).drop("los")
      val pDf = ps.toDF("event_id", "es", "v")
        .withColumn("ts", col("es").cast("timestamp")).drop("es")
      val got = Joins.rangeJoin(ivDf, pDf, ivId = "iv_id", lo = "lo", hi = "hi",
          ts = "ts", bucketSeconds = blk)
        .select(col("iv_id"), col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val want = for {
        (id, lo) <- ivs
        (pid, t, _) <- ps if t >= lo && t < lo + len
      } yield (id, pid)
      Prop(got.sorted == want.sorted) :| s"len=$len blk=$blk got=$got want=$want"
    }

  property("rangeAggFixed == brute-force interval counts/sums") =
    Prop.forAll(genIntervals) { case (ivs, ps, len, blk) =>
      import TestSpark.spark
      import spark.implicits._
      val ivDf = ivs.toDF("iv_id", "los")
        .withColumn("lo", col("los").cast("timestamp")).drop("los")
      val pDf = ps.toDF("event_id", "es", "v")
        .withColumn("ts", col("es").cast("timestamp")).drop("es")
      val got = Joins.rangeAggFixed(ivDf, pDf, ivId = "iv_id", lo = "lo",
          lengthSeconds = len, ts = "ts", valueExpr = col("v"),
          blockSeconds = blk)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = ivs.flatMap { case (id, lo) =>
        val in = ps.filter { case (_, t, _) => t >= lo && t < lo + len }
        if (in.isEmpty) None
        else Some(id -> (in.size.toLong, in.map(_._3).sum))
      }.toMap
      Prop(got == want) :| s"len=$len blk=$blk got=$got want=$want"
    }
}
