package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted text index — term→document postings as a TABLE, the
  * structure that answers "which documents contain these terms" at
  * 100 TB without ever scanning text at query time.
  *
  * Spark-shaped: the postings build is one explode + distinct-by-
  * construction aggregate (term frequency rides along); persisted
  * BUCKETED BY TERM ([[graft.sources.Sinks.saveBucketed]]) a term
  * lookup reads only the term's buckets and joins with zero exchange.
  * Query time: the probe term set is tiny and becomes a broadcast
  * semi-filter on the postings scan (a pushed `isin` — no join against
  * the corpus at all); only the candidate doc ids shuffle, and only
  * for the conjunctive count. */
object TextIndex {

  /** Postings of `docs(textCol)` split on single spaces: one row per
    * (term, doc_id) with the term's in-doc frequency `tf`. Empty terms
    * (leading/trailing/double spaces) are dropped; NULL text yields no
    * postings. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) search: documents containing EVERY query term,
    * ranked by total matched term frequency (an exact integer — BM25's
    * log-weighted cousin is not engine-portable, raw tf is). Returns
    * (doc_id, tf_sum) for all full matches. The term filter is a
    * literal `isin` pushed into the postings scan: with term-bucketed
    * postings that is bucket pruning, never a full index scan. */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.nonEmpty),
      "searchAll: need at least one non-empty term")
    val distinctTerms = terms.distinct
    postings
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_sum"))
      .filter(col("n_terms") === distinctTerms.length)
      .select(col("doc_id"), col("tf_sum"))
  }
}
