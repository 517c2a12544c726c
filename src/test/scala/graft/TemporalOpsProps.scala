package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.{Snapshot, Windows}

/** Property checks for the time-series reshaping operators: the
  * explode-the-gap LOCF resample and the SCD-2 changelog collapse must
  * agree with the obviously-correct sequential semantics on arbitrary
  * event geometry — same-timestamp collisions (tie broken by id),
  * single-observation keys, adjacent and far-apart buckets, immediate
  * value flip-flops and long constant runs. */
object TemporalOpsProps extends Properties("TemporalOpsSemantics") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  // (id, key, epoch-second, value-index): seconds cluster inside a few
  // buckets of the 60 s test grid so collisions and gaps both occur
  private val genLog: Gen[List[(Long, Long, Long, Long)]] =
    for {
      n <- Gen.choose(1, 40)
      mk = for {
        key <- Gen.choose(0L, 2L)
        sec <- Gen.choose(0L, 600L)
        v   <- Gen.choose(0L, 3L)
      } yield (key, 1000000L + sec, v)
      xs <- Gen.listOfN(n, mk)
    } yield xs.zipWithIndex.map { case ((k, t, v), i) => (100L + i, k, t, v) }

  private def df(xs: List[(Long, Long, Long, Long)]) = {
    import TestSpark.spark.implicits._
    xs.toDF("event_id", "user_id", "es", "v")
      .withColumn("ts", col("es").cast("timestamp")).drop("es")
      .withColumn("value", col("v").cast("double")).drop("v")
  }

  /** Latest-wins value per (key, bucket): max (ts, id) row's value. */
  private def observed(xs: List[(Long, Long, Long, Long)], step: Long)
      : Map[(Long, Long), Double] =
    xs.groupBy { case (_, k, t, _) => (k, Math.floorDiv(t, step)) }
      .map { case (kb, rows) =>
        kb -> rows.maxBy { case (id, _, t, _) => (t, id) }._4.toDouble }

  property("gapFillLocf == sequential carry over the bucket grid") =
    Prop.forAll(genLog) { case xs =>
      val step = 60L
      val got = Windows.gapFillLocf(df(xs), key = "user_id", ts = "ts",
          tie = "event_id", value = "value", stepSeconds = step)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getBoolean(3))))
        .toMap
      val obs = observed(xs, step)
      val want = obs.keys.groupBy(_._1).flatMap { case (k, kbs) =>
        val bs = kbs.map(_._2)
        var carry = 0.0
        (bs.min to bs.max).map { b =>
          val hit = obs.get((k, b))
          hit.foreach(carry = _)
          ((k, b * step), (carry, hit.isDefined))
        }
      }
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("scd2 == sequential run-compression of the latest-wins log") =
    Prop.forAll(genLog) { case xs =>
      val got = Snapshot.scd2(
          df(xs).withColumn("event_type", concat(lit("t"), col("value").cast("int"))),
          key = "user_id", ts = "ts", tie = "event_id", attr = "event_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getBoolean(5)))
        .toSet
      val want = xs.groupBy(_._2).flatMap { case (k, rows) =>
        val latest = rows.groupBy(_._3).toList
          .map { case (t, rr) => (t, rr.maxBy(_._1)._4) }
          .sortBy(_._1)
        val compressed = latest.foldLeft(List.empty[(Long, Long)]) {
          case (acc, (t, v)) =>
            if (acc.nonEmpty && acc.head._2 == v) acc else (t, v) :: acc
        }.reverse
        compressed.zipWithIndex.map { case ((t, v), i) =>
          val to = compressed.lift(i + 1).map(_._1)
          (k, s"t$v", t, to, (i + 1).toLong, to.isEmpty)
        }
      }.toSet
      Prop(got == want) :| s"got=$got want=$want"
    }

  // (key, value) rows + an arbitrary split position: merging the two
  // halves' aggregate states must equal the single-pass state — the
  // monoid property incremental maintenance rests on, including the
  // empty-side and disjoint-key-set geometries
  private val genSplit: Gen[(List[(Long, Long)], Int)] = for {
    n  <- Gen.choose(1, 40)
    xs <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 5L)
      v <- Gen.choose(-1000L, 1000L)
    } yield (k, v))
    cut <- Gen.choose(0, n)
  } yield (xs, cut)

  property("refreshAggState(state(a), state(b)) == aggState(a ++ b)") =
    Prop.forAll(genSplit) { case (xs, cut) =>
      import TestSpark.spark.implicits._
      def st(rows: List[(Long, Long)]) =
        Snapshot.aggState(rows.toDF("k", "v"), Seq("k"), "v")
      def collect(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val (a, b) = xs.splitAt(cut)
      val got = collect(Snapshot.refreshAggState(st(a), st(b), Seq("k")))
      val want = collect(st(xs))
      Prop(got == want) :| s"cut=$cut got=$got want=$want"
    }
}
