package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for similarity / dedup primitives.
  *
  * Everything composes codegen'd builtins and higher-order array
  * functions; hashes are md5-based so the identical arithmetic is
  * expressible in the DuckDB oracle (and any other engine) — a
  * requirement for cross-engine verified dedup.
  */
object Similarity {

  /** Distinct word k-shingles from a pre-split words array, in first-seen
    * positional order then de-duplicated. Rows with fewer than k words
    * yield an empty array.
    *
    * Pass a MATERIALIZED array column (project `split(text, " ")` in a
    * separate select first): handing `split(text)` in directly would
    * re-evaluate the split inside every `element_at` lambda invocation —
    * O(words²) per document (CollapseProject keeps a non-cheap alias in
    * its own projection, so the boundary is what prevents the inlining). */
  def shinglesOfWords(w: Column, k: Int): Column = {
    val n = size(w)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Per-permutation shingle hash: md5("p|shingle") — a cheap family of
    * independent hash functions; the MinHash signature is the per-doc min
    * of each (lexicographic min over the hex string ≡ min over the
    * 128-bit value). */
  def permHash(perm: Column, shingle: Column): Column =
    md5(concat_ws("|", perm, shingle))

  /** Exact double dot product of two numeric arrays (sequential
    * accumulation — deterministic, same order as a plain loop). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two numeric arrays (float inputs are widened
    * exactly to double before any arithmetic). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine quantized to 1e-6 ticks (floor): turns near-tie floating
    * noise into exact ties, which are then broken by id — the property
    * that makes ANN rank output engine-portable. */
  def cosineQ(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(1000000.0)).cast("long")
}
