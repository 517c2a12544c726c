package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance string similarity join — the blocking step of entity
  * resolution (matching dirty ids/names across sources) done with a
  * SIGNATURE join instead of the n² block scan a naive blocker
  * degenerates into.
  *
  * The deletion-neighborhood observation (SymSpell's): two strings at
  * Damerau-free edit distance ≤ 1 ALWAYS share a member of their
  * deletion families {s} ∪ {s minus one char} — a substitution at i
  * collides on "both minus position i", an insert/delete collides on
  * "longer minus the extra char = shorter". So emitting every deletion
  * variant as a join signature gives a candidate set that PROVABLY
  * contains all true pairs, and the exact `levenshtein` refine (a
  * codegen'd expression) makes the output precise — approximation only
  * ever lives in the candidate generation, never in the answer.
  *
  * Scale shape: |s|+1 signature rows per string (strings here are ids /
  * names / titles — tens of bytes), shuffled once on the signature;
  * bucket sizes are the number of strings within distance 1 of a common
  * variant — small for natural key-like data, and the mass-duplicate
  * case (many IDENTICAL strings — every bucket they touch goes
  * quadratic) is dropped by the same maxBucket guard as minhash LSH:
  * exact dedup owns identical strings, this operator owns the distance-1
  * halo. The pair stream is emitted inside bucket tasks (sorted-struct
  * slice, id_a < id_b by construction) and deduplicated on the pair key
  * — a shuffle of SURVIVING pairs only, not of the n² candidate space.
  */
object Fuzzy {

  /** All (id_a, id_b, dist) with levenshtein(s_a, s_b) ≤ 1, id_a < id_b,
    * among rows whose every shared signature bucket has ≤ `maxBucket`
    * members (capped buckets = mass-duplicate clusters, see above).
    * Distance-0 pairs (identical strings) are reported too — callers
    * running after exact dedup simply won't have any. */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String,
      maxBucket: Int = 10000): DataFrame = {
    require(maxBucket >= 2, s"editDistance1Pairs: maxBucket=$maxBucket")
    val base = df.select(col(idCol).cast("long").as("_id"), col(strCol).as("_s"))
    // deletion family, deduplicated per string ("aab" yields "ab" twice)
    val sigs = base
      .select(col("_id"), col("_s"),
        explode(sequence(lit(0), length(col("_s")))).as("_i"))
      .select(col("_id"), col("_s"),
        when(col("_i") === 0, col("_s"))
          .otherwise(concat(
            col("_s").substr(lit(1), col("_i") - 1),
            col("_s").substr(col("_i") + 1, length(col("_s"))))).as("_sig"))
      .distinct()
    // bucket-size window and bucket group-by share one signature shuffle
    val surviving = sigs
      .withColumn("_bsz", count(lit(1)).over(Window.partitionBy(col("_sig"))))
      .filter(col("_bsz").between(2, maxBucket))
    val buckets = surviving
      .groupBy(col("_sig"))
      .agg(sort_array(collect_list(struct(col("_id").as("id"), col("_s").as("s"))))
        .as("ds"))
    Dedup.explodePairs(buckets, "ds")
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
