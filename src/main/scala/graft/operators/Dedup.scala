package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Deduplication operators for a large-scale text corpus.
  *
  * Scale posture (100 TB): every shuffle below keys on a fixed-width
  * digest / bucket hash, never on raw text; candidate generation is
  * always an equi-grouping on a bucket key (inverted index, LSH band,
  * SimHash chunk) so no plan ever contains a cartesian/all-pairs join.
  * Hot buckets are bounded by an explicit document-frequency guard.
  *
  * SINGLE-EXCHANGE LSH: each approximate pipeline (MinHash, SimHash,
  * embedding-cosine) plans exactly ONE shuffle. Signatures are pure
  * row-local array arithmetic (no explode + re-aggregate), every bucket
  * membership row carries the doc's full signature / key vector (cheap:
  * fixed-width, derived row-locally), the bucket-size window and the
  * bucket group-by share the same (table, key) hash partitioning so the
  * second aggregation reuses the first exchange, and pair emission +
  * similarity math happen inside the bucket's task with no join-back.
  * The n²-sized candidate stream never crosses the network.
  */
object Dedup {

  /** Exact dedup by content digest. One shuffle on the 128-bit digest.
    * Returns one row per distinct content: (digest, survivor =
    * min doc_id, n_copies). */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(md5(col("text")).as("digest"), col("doc_id"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_copies"))

  /** (doc_id, shingle) pairs — distinct word-k-shingles, exploded. The
    * words array is materialized in its own projection first (see
    * Similarity.shinglesOfWords on why that boundary matters). */
  def shingled(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(Similarity.shinglesOfWords(col("w"), k)).as("s"))

  /** Ordered (a < b) element pairs within each bucket, as columns
    * `a`/`b` — the self-join-free inverted index. A self-join would
    * recompute the (expensive) bucket-derivation subtree once per side;
    * this shape scans it once, shuffles once on the bucket key, and emits
    * exactly the same pairs.
    *
    * TWO-LEVEL explosion: first each member (with its position), then
    * that member's partner slice `ids[i+1..]`. No intermediate row ever
    * holds more than one bucket's member list (O(n) per row), whereas a
    * single flatten-of-pairs would materialize all C(n,2) pair structs
    * inside ONE row before exploding — gigabytes in one task for a hot
    * 10k bucket. The C(n,2) output rows still stream through the
    * bucket's task, but as rows, never as one array. */
  private[operators] def explodePairs(buckets: DataFrame, idsCol: String,
      carry: Seq[String] = Nil): DataFrame =
    buckets
      .select(posexplode(col(idsCol)).as(Seq("i", "a")) +:
        col(idsCol).as("ids_") +: carry.map(col): _*)
      .select(col("a") +:
        explode(slice(col("ids_"), col("i") + lit(2), size(col("ids_")))).as("b") +:
        carry.map(col): _*)

  /** 1/0 per-slot match vector of two bucket-key arrays: slot i is 1 iff
    * BOTH docs share the same bucket key in table/band i. */
  private def matchVec(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => when(x.isNotNull && x === y, 1).otherwise(0))

  /** First-co-bucket emission filter: with `m` = [[matchVec]] and `idx`
    * the current bucket's table/band index, keep the pair row iff this
    * is the FIRST slot where the two docs collide. At most one bucket
    * emits each candidate pair, so the pair stream is distinct BY
    * CONSTRUCTION — the n²-sized candidate set never needs a
    * dedup/count shuffle; only per-doc rows ever cross the network.
    *
    * Cap semantics: if the first-colliding bucket was dropped by the
    * maxBucket guard, the pair is not emitted at all (later surviving
    * collisions decline it too). That is deliberate: a capped bucket is
    * a mass-duplicate cluster whose members belong to EXACT dedup, and
    * making emission depend only on the FIRST collision is what lets
    * every doc's key vector be derived row-locally — the alternative
    * (first *surviving* collision) needs per-doc survival vectors, i.e.
    * two more corpus-wide shuffles. The oracle encodes the identical
    * rule (HAVING arg_min(bsz, band) <= cap). */
  private def firstMatch(m: Column, idx: Column): Column =
    array_position(m, 1) === idx.cast("long") + lit(1L)

  /** Exact n-gram Jaccard near-dup pairs via an inverted index.
    *
    * Buckets key on the shingle (the classic set-similarity join, without
    * the self-join — see [[explodePairs]]); shingles in more than
    * `maxDf` documents are dropped (stop-shingle guard: bounds any
    * bucket's pair fan-out at maxDf², and a shingle in >maxDf docs
    * carries ~no similarity signal); pairs sharing fewer than `minCommon`
    * shingles are pruned before the Jaccard math.
    */
  def jaccardPairs(docs: DataFrame, k: Int, maxDf: Int, minCommon: Int,
      minJaccard: Double): DataFrame = {
    // The similarity universe is the df-FILTERED shingle sets: stop
    // -shingles (df > maxDf) are removed before BOTH the pair counts and
    // the per-doc sizes, so numerator and denominator are consistent
    // (Jaccard over the filtered sets — anything else under-reports
    // similarity of docs containing hot shingles).
    val buckets = shingled(docs, k)
      .groupBy(col("s"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf)
    val sizes = buckets
      .select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nsh"))
    val common = explodePairs(buckets.filter(size(col("ids")) >= 2), "ids")
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    common
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("na.nsh") + col("nb.nsh") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures: one row per doc, `perms` minhashes in
    * permutation order — computed entirely ROW-LOCALLY (zero shuffles).
    *
    * The shingle set, its 60-bit hashes, and all `perms` mins are
    * higher-order array expressions over the doc's own words: no
    * explode, no groupBy, nothing leaves the scan task. Digest work is
    * ONE md5 per shingle (Similarity.shingleHash); each permutation is
    * four integer ops on that hash (Similarity.permuted) — at 100 TB
    * the md5-per-(perm,shingle) formulation spends `perms`× the digest
    * compute for the same LSH guarantees. Values are identical to the
    * explode-per-permutation formulation (the oracle's shape): min over
    * an array of the distinct shingles' permuted hashes ≡ min over
    * grouped rows. Each array alias lives in its own projection so the
    * md5 pass runs once, not once per permutation (CollapseProject keeps
    * non-cheap multi-referenced aliases separate). */
  def minhashSignatures(docs: DataFrame, k: Int, perms: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), Similarity.shinglesOfWords(col("w"), k).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => Similarity.shingleHash(s)).as("hs"))
      .select(col("doc_id"), array((0 until perms).map(p =>
        array_min(transform(col("hs"), h => Similarity.permuted(h, p)))): _*).as("sig"))

  /** LSH banding over MinHash signatures: `bands` bands of `perms/bands`
    * rows each; docs sharing any band bucket become a candidate pair.
    * Buckets key on (band, md5-of-band-slice) — fixed 16-byte keys, never
    * signatures or text.
    *
    * ONE SHUFFLE TOTAL. Membership rows (doc_id, sig, band, bk) are
    * derived row-locally from the zero-shuffle signatures; the bucket
    * -size window hash-partitions them on (band, bk) — the plan's only
    * Exchange — and the bucket group-by REUSES that partitioning (same
    * keys), so EnsureRequirements inserts nothing. Each member carries
    * its full signature (perms × 8 bytes), so inside the bucket's task a
    * pair's complete band-agreement vector is computable by comparing
    * signature slices: emission keys off the FIRST matching band
    * ([[firstMatch]] — each pair emitted at most once, no pair-level
    * dedup shuffle), and `n_bands` is the number of agreeing bands (all
    * of them — the similarity estimate does not depend on the maxBucket
    * performance guard). A capped (> maxBucket) bucket is a
    * mass-duplicate cluster: its pairs belong to exact dedup and are
    * dropped here, including pairs whose first collision it is. */
  def minhashCandidates(docs: DataFrame, k: Int, perms: Int, bands: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(perms % bands == 0, s"perms ($perms) must be a multiple of bands ($bands)")
    val rows = perms / bands
    val banded = minhashSignatures(docs, k, perms)
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          md5(concat_ws("|", (0 until rows).map(r =>
            element_at(col("sig"), b * lit(rows) + lit(r + 1))): _*))))
          .as(Seq("band", "bk")))
    // a bucket larger than maxBucket is a mass-duplicate cluster whose
    // n² pair fan-out belongs to EXACT dedup (same digest), not LSH —
    // drop it here to bound the explosion (oracle mirrors the cap);
    // size-1 buckets can't pair and don't survive either
    val surviving = banded
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("band"), col("bk"))))
      .filter(col("bsz").between(2, maxBucket))
    val buckets = surviving
      .groupBy(col("band"), col("bk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
    explodePairs(buckets, "ds", carry = Seq("band"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("band"),
        transform(sequence(lit(0), lit(bands - 1)), b =>
          when(slice(col("a.sig"), b * lit(rows) + lit(1), lit(rows)) ===
               slice(col("b.sig"), b * lit(rows) + lit(1), lit(rows)), 1)
            .otherwise(0)).as("m"))
      .filter(firstMatch(col("m"), col("band")))
      .select(col("doc_a"), col("doc_b"),
        aggregate(col("m"), lit(0), _ + _).cast("long").as("n_bands"))
  }

  /** The `tables × bitsPerTable` random hyperplanes, derived DRIVER-SIDE
    * from md5 (r_p[i] = first-hex-nibble(md5("p|i")) − 7.5, a portable
    * stand-in for a seeded gaussian) and inlined as literal arrays into
    * the plan — the identical constants the DuckDB oracle derives in
    * SQL. Deterministic pure math on constants: no data is collected. */
  private[operators] def hyperplanes(planes: Int, dim: Int): IndexedSeq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$i".getBytes("UTF-8"))
        (((d(0) & 0xFF) >> 4) & 0xF) - 7.5
      }
    }

  /** Embedding-cosine near-dup pairs via banded random-hyperplane LSH.
    *
    * Each vector's bucket in table t is the `bitsPerTable`-bit sign
    * pattern of its hyperplane dots — computed row-locally against the
    * inlined [[hyperplanes]] literals (no codebook join, no per-plane
    * row fan-out). Candidates share a bucket in ANY table
    * (OR-amplification: recall ≈ 1-(1-p^b)^T for per-bit agreement p),
    * then exact quantized cosine filters — computed INSIDE the bucket's
    * task from the carried embeddings, so there is no candidate
    * join-back. ONE shuffle total, on (table, bucket): the bucket-size
    * window partitions membership rows and the bucket group-by reuses
    * that exchange. Carrying `ce` costs tables×dim floats per vector
    * through the single shuffle — versus TWO corpus-wide join shuffles
    * plus shuffling the n² candidate stream twice in the join-back
    * formulation. */
  def embeddingCosPairs(emb0: DataFrame, tables: Int, bitsPerTable: Int,
      minCosQ: Long, dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    // A wrong-width vector must FAIL the job, not degrade: zip_with over a
    // mismatched length null-pads, every hyperplane dot goes NULL, and all
    // vectors silently collapse into one (capped, dropped) bucket → zero
    // pairs. raise_error runs distributed, inside the scan projection.
    val emb = emb0.withColumn("ce",
      when(size(col("ce")) === dim, col("ce"))
        .otherwise(raise_error(concat(
          lit(s"embeddingCosPairs: embedding dim must be $dim, got "),
          size(col("ce")).cast("string")))))
    val hp = hyperplanes(tables * bitsPerTable, dim)
    val keyed = emb.select(col("vec_id"), col("ce"),
      array((0 until tables).map(t =>
        concat((0 until bitsPerTable).map(b =>
          when(Similarity.dot(col("ce"), typedLit(hp(t * bitsPerTable + b))) >= 0, "1")
            .otherwise("0")): _*)): _*).as("keys"))
    val memberships = keyed.select(col("vec_id"), col("keys"), col("ce"),
      posexplode(col("keys")).as(Seq("t", "bucket")))
    // mass-duplicate buckets belong to exact dedup; cap the fan-out.
    // OR-amplification makes a near-dup pair collide in MANY tables, so a
    // distinct() over the emitted pairs would shuffle the n² candidate
    // stream ~T times over — instead only the first colliding table
    // emits a pair ([[firstMatch]]; distinct by construction, on-CPU).
    val surviving = memberships
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("t"), col("bucket"))))
      .filter(col("bsz").between(2, maxBucket))
    val buckets = surviving
      .groupBy(col("t"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("keys"), col("ce")))).as("ds"))
    explodePairs(buckets, "ds", carry = Seq("t"))
      .filter(firstMatch(matchVec(col("a.keys"), col("b.keys")), col("t")))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        floor(Similarity.cosine(col("a.ce"), col("b.ce")) * lit(1000000.0))
          .cast("long").as("cos_q"))
      .filter(col("cos_q") >= minCosQ)
  }

  /** 64-bit SimHash signature per doc as a '0'/'1' bitstring — computed
    * entirely ROW-LOCALLY (zero shuffles).
    *
    * Word weights = term frequency; each word votes its md5-derived 64
    * bits (+1 per occurrence for a set bit, −1 for unset; summing over
    * occurrences IS the tf weighting); signature bit = sign of the vote.
    * The vote fold is a single higher-order `aggregate` over the doc's
    * word-hash array: per word, the md5's first 64 bits are split once
    * into two 32-bit halves (one conv each), and each bit is then two
    * arithmetic ops (floor-divide by a power-of-two literal, mod 2) —
    * exact in doubles since the halves are < 2³². No explode, no
    * (doc, word) shuffle, no per-doc re-aggregation: the bit values (and
    * so the integer vote sums) are identical to the oracle's
    * per-distinct-word × tf formulation. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    // 2^31 … 2^0 as exact double literals: bit i (MSB-first) of a 32-bit
    // half x is floor(x / 2^(31-i)) mod 2
    val pows = typedLit((0 until 32).map(i => math.pow(2.0, 31 - i)))
    def bitsOf(x: Column): Column =
      transform(sequence(lit(0), lit(31)), i =>
        pmod(floor(x / element_at(pows, i + 1)), lit(2)).cast("int") * lit(2) - lit(1))
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), transform(col("ws"), w => md5(w)).as("hs"))
      .select(col("doc_id"), transform(col("hs"), h => struct(
        conv(h.substr(lit(1), lit(8)), 16, 10).cast("long").as("ha"),
        conv(h.substr(lit(9), lit(8)), 16, 10).cast("long").as("hb"))).as("ab"))
      .select(col("doc_id"), aggregate(col("ab"), array_repeat(lit(0L), 64),
        (acc, x) => zip_with(acc,
          concat(bitsOf(x.getField("ha")), bitsOf(x.getField("hb"))),
          (v, s) => v + s)).as("v"))
      .select(col("doc_id"),
        array_join(transform(col("v"), v => when(v > 0, "1").otherwise("0")), "").as("sig"))
  }

  /** Hamming-near pairs over SimHash signatures. Candidates come from a
    * 4×16-bit chunk LSH (two signatures within hamming distance 3 of
    * each other must agree on at least one 16-bit chunk; wider distances
    * trade recall for the same bounded cost).
    *
    * ONE SHUFFLE TOTAL, on (chunk-index, chunk): membership rows carry
    * the full 64-char signature (the chunk keys are its substrings, so
    * the match vector, first-collision test, and the exact hamming
    * verify are all computable inside the bucket's task — see
    * [[minhashCandidates]] for the exchange-reuse structure). */
  def simhashPairs(docs: DataFrame, maxHamming: Int, maxBucket: Int = 10000): DataFrame = {
    val chunks = simhashSignatures(docs)
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)), j =>
          col("sig").substr(j * lit(16) + lit(1), lit(16)))).as(Seq("j", "chunk")))
    // mass-duplicate buckets belong to exact dedup; cap the fan-out.
    // Near-identical docs agree on up to all 4 chunks, so a distinct()
    // over emitted pairs would shuffle the n² candidate stream — the
    // first-collision emission ([[firstMatch]]) keeps it on-CPU.
    val surviving = chunks
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("j"), col("chunk"))))
      .filter(col("bsz").between(2, maxBucket))
    val buckets = surviving
      .groupBy(col("j"), col("chunk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
    val cand = explodePairs(buckets, "ds", carry = Seq("j"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("j"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"),
        transform(sequence(lit(0), lit(3)), jj =>
          when(col("a.sig").substr(jj * lit(16) + lit(1), lit(16)) ===
               col("b.sig").substr(jj * lit(16) + lit(1), lit(16)), 1)
            .otherwise(0)).as("m"))
      .filter(firstMatch(col("m"), col("j")))
    val ham = (0 until 4).map(j =>
      expr(s"bit_count(CAST(conv(substring(sig_a, ${j * 16 + 1}, 16), 2, 10) AS BIGINT) ^ " +
        s"CAST(conv(substring(sig_b, ${j * 16 + 1}, 16), 2, 10) AS BIGINT))"))
      .reduce(_ + _)
    cand
      .select(col("doc_a"), col("doc_b"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
