package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitters) over a 100 TB stream via a mergeable
  * Misra-Gries sketch + an exact verification pass — the "novel sketch"
  * tier of the custom-operator ladder, at the `TypedColumn` rung.
  *
  * Why not a plain GROUP BY at scale: the item domain (e.g. a web-scale
  * token vocabulary) can be billions of keys, so the exact-count shuffle
  * carries the whole domain. The sketch pass shuffles at most k counters
  * per map partition (KBs), and the verify pass shuffles only the <= k
  * candidate keys' rows. Output is EXACT, not approximate: Misra-Gries
  * with k counters guarantees every item with true count > n/(k+1)
  * survives the sketch, so for any threshold above that bound the
  * candidate set is a superset of the true heavy hitters and the exact
  * verify pass (count only candidate keys, broadcast-joined) recovers
  * precisely the true answer — approximate-then-verify, the standard
  * two-pass trick for sketch-sized shuffles with exact results.
  */
object Freq {

  /** Mergeable Misra-Gries summary of at most k counters.
    *
    * reduce: classic MG — increment a tracked item, insert while free
    * slots remain, else decrement ALL counters (dropping zeros). The
    * decrement rebuild is O(k) but fires at most n/(k+1) times total, so
    * the per-row cost is amortized O(1).
    *
    * merge (per map partition per group, not per row): sum counters,
    * then if over k subtract the (k+1)-largest count from all and drop
    * the non-positive — the standard mergeable-MG reduction
    * (Agarwal et al., "Mergeable Summaries", PODS'12), preserving the
    * n/(k+1) guarantee. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c)            => b.updated(x, c + 1L)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          b.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Exact heavy hitters of `items` (a single string column `item`):
    * every item whose count × `denom` > n (i.e. frequency > 1/denom of
    * the stream), found with a k-counter sketch pass + exact verify.
    *
    * `k` must satisfy k + 1 >= denom, else the sketch's guarantee no
    * longer covers the threshold and true heavy hitters could be missed
    * — enforced here, not documented away.
    *
    * Plan shape (asserted in PlanSpec): pass 1 aggregates the sketch
    * (map-side partial MG buffers merge; the shuffle is k counters per
    * partition); the <= k candidates and the single total-count row then
    * BROADCAST into pass 2, whose only shuffle groups the candidate
    * keys' rows. */
  def heavyHitters(spark: SparkSession, items: DataFrame, k: Int, denom: Long): DataFrame = {
    require(k + 1 >= denom,
      s"heavyHitters: k=$k counters cannot guarantee capture at threshold 1/$denom " +
        s"(need k+1 >= denom) — raise k or the threshold")
    import spark.implicits._
    val strs: Dataset[String] = items.select(col("item").cast("string")).as[String]
    val candidates = strs
      .select(new MisraGries(k).toColumn.name("cands"))
      .select(explode(col("cands")).as("item"))
    val total = items.agg(count(lit(1)).as("n"))
    items.join(broadcast(candidates), "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") * lit(denom) > col("n"))
      .select(col("item"), col("cnt"))
  }
}
