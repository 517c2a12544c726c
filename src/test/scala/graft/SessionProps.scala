package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.apache.spark.sql.functions._

/** Property check: the batch gaps-and-islands sessionizer
  * (operators.Windows.sessionIds) produces EXACTLY the session
  * boundaries of Spark's native session_window on arbitrary event sets —
  * including duplicate timestamps and boundary-exact gaps. This is the
  * semantics the q_session_windows oracle also encodes; a divergence
  * here is a correctness bug before it ever reaches the oracle. */
object SessionProps extends Properties("SessionSemantics") {

  // Spark-backed properties are expensive; 10 random cases is plenty to
  // hit duplicates and near-boundary gaps with this generator shape.
  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  private val gap = 3600L

  // timestamps cluster around multiples of the gap so exact-boundary
  // deltas (es2 - es1 == gap) actually occur
  private val genEvents: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    evts <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      base <- Gen.choose(0L, 12L)
      jitter <- Gen.oneOf(0L, 1L, gap - 1, gap, gap + 1)
    } yield (u, base * gap + jitter))
  } yield evts

  property("sessionIds boundaries == session_window boundaries") =
    Prop.forAll(genEvents) { evts =>
      import TestSpark.spark
      import spark.implicits._
      val df = evts.toDF("user_id", "es").withColumn("ts", col("es").cast("timestamp"))
      val ours = graft.operators.Windows.sessionIds(df, col("user_id"), col("ts"), gap)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("es")).as("s"), (max(col("es")) + gap).as("e"))
        .select(col("user_id"), col("s"), col("e")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val native = df
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id")).count()
        .select(col("user_id"),
          col("session_window.start").cast("long"),
          col("session_window.end").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      ours == native
    }
}
