package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregation via a bounded-buffer `Aggregator` (the
  * SURVEY's "custom `TypedColumn` for aggregate functions" extension
  * tier).
  *
  * Versus the window-function formulation (row_number + filter), the
  * aggregator keeps at most k entries per group per partition and
  * merges k-buffers map-side — so the shuffle carries |groups|×k rows
  * instead of every row. At 100 TB with few groups this is the
  * difference between shuffling the fact table and shuffling a few KB;
  * the window plan (even with WindowGroupLimit pruning) still shuffles
  * every surviving row to its group's partition. */
object TopK {

  /** Keeps the k largest (value, id) pairs — value desc, id asc tiebreak
    * (same total order as `ORDER BY value DESC, id ASC`).
    *
    * The buffer is UNSORTED: the per-row `reduce` path (runs once per
    * fact-table row) is an O(k) worst-element scan plus a conditional
    * replace — no sort, no allocation when the row loses. Sorting happens
    * once per group in `finish`, and `merge` (once per map partition per
    * group) may sort two k-buffers. A sort-per-row formulation costs
    * O(k log k) + a fresh buffer allocation on every input row, which at
    * 100 TB is billions of needless sorts. */
  final class TopKAgg(k: Int)
      extends Aggregator[(String, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

    /** `ORDER BY value DESC, id ASC` — true when x outranks y. */
    private def outranks(x: (Double, Long), y: (Double, Long)): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

    private def sorted(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      xs.sortBy { case (v, id) => (-v, id) }

    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], e: (String, Long, Double)): Seq[(Double, Long)] = {
      val x = (e._3, e._2)
      if (b.size < k) b :+ x
      else {
        var worst = 0
        var i = 1
        while (i < b.size) { if (outranks(b(worst), b(i))) worst = i; i += 1 }
        if (outranks(x, b(worst))) b.updated(worst, x) else b
      }
    }
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (a.size + b.size <= k) a ++ b else sorted(a ++ b).take(k)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = sorted(r)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** Top-k orders per priority as (priority, key, value, rank) — same
    * result contract as the window formulation, different (smaller)
    * shuffle. */
  def topOrdersPerPriority(spark: SparkSession, orders: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("tops"))
      .flatMap { case (prio, tops) =>
        tops.zipWithIndex.map { case ((v, id), i) => (prio, id, v, i + 1) }
      }
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
  }
}
