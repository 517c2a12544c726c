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

  /** 2³¹−1, the Mersenne prime of the permutation family. */
  val PermP: Long = 2147483647L

  /** Per-permutation constants, computed DRIVER-SIDE in Scala and inlined
    * as literals into both the Spark plan and the DuckDB oracle — the
    * engines only ever do bounded integer arithmetic on them. `permC` is
    * a 60-bit xor mask (golden-ratio multiples), `permA` an odd multiplier
    * in (0, P). */
  def permC(p: Int): Long = ((p + 1).toLong * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1)
  def permA(p: Int): Long = (2654435761L * (p + 1)) % (PermP - 1) + 1

  /** One 60-bit integer hash per shingle: the first 15 hex chars of ONE
    * md5. Every permutation then derives from `h` with four integer ops —
    * versus an md5 per (permutation, shingle), this removes (perms−1)/perms
    * of all digest work, the hot loop of MinHash at any scale. */
  def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long")

  /** Permutation p of a 60-bit shingle hash: ((h ⊕ Cₚ) mod P)·Aₚ mod P.
    * All intermediates fit signed 64-bit ((2³¹)² < 2⁶³), so the identical
    * expression runs on any engine with BIGINT arithmetic — the oracle
    * twin inlines the same constants. */
  def permuted(h: Column, p: Int): Column =
    (h.bitwiseXOR(lit(permC(p))) % lit(PermP)) * lit(permA(p)) % lit(PermP)

  /** The 60-bit hashes of a row's shingles, as one array — materialize
    * this in its OWN projection (same boundary rule as
    * [[shinglesOfWords]]) so the md5s are computed once, not once per
    * downstream permutation. */
  def shingleHashes(w: Column, k: Int): Column =
    transform(shinglesOfWords(w, k), shingleHash(_))

  /** Per-ROW MinHash signature from a materialized hash array:
    * sig[p] = min over shingles of [[permuted]](h, p) — the SAME values
    * as the explode→groupBy formulation (same distinct-shingle set, same
    * permutation arithmetic), but as a scalar projection: ZERO shuffles,
    * so it runs on an unbounded stream (where a per-doc groupBy would be
    * a stateful aggregation) and composes into any per-row pipeline
    * stage. HOF evaluation is interpreted, but per ROW over that row's
    * own shingles — the acceptable side of the per-row/per-pair codegen
    * line (see Dedup's header note). Rows with fewer than k words yield
    * an empty hash array → an all-null signature; filter those first
    * (the batch formulation drops them implicitly).
    *
    * NOT the batch path, by measurement: at sf1 the saved shuffle wins
    * (0.58 s vs 0.73 s) but by sf10 the interpreted per-shingle lambda
    * overtakes it (3.8 s vs 3.3 s for explode+groupBy, whose permuted()
    * mins run inside whole-stage codegen) — so the batch pipelines keep
    * the codegen'd formulation and this one exists for streams, where a
    * per-doc groupBy would be a stateful aggregation. */
  def minhashFromHashes(hs: Column, perms: Int): Column =
    array((0 until perms).map(p => array_min(transform(hs, h => permuted(h, p)))): _*)

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
