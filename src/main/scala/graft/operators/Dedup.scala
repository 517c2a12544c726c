package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Deduplication operators for a large-scale text corpus.
  *
  * Scale posture (100 TB): every shuffle below keys on a fixed-width
  * digest / bucket hash, never on raw text; candidate generation is
  * always an equi-join on a bucket key (inverted index, LSH band,
  * SimHash chunk) so no plan ever contains a cartesian/all-pairs join.
  * Hot buckets are bounded by an explicit document-frequency guard.
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

  /** 1/0 per-slot match vector of two surviving-bucket-key arrays: slot i
    * is 1 iff BOTH docs sit in the same surviving bucket of table/band i
    * (a null slot means that doc's bucket there was dropped — by the
    * maxBucket cap or by having no partner — so it can never match). */
  private def matchVec(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => when(x.isNotNull && x === y, 1).otherwise(0))

  /** First-surviving-co-bucket emission filter: with `m` = [[matchVec]]
    * and `idx` the current bucket's table/band index, keep the pair row
    * iff this is the FIRST slot where the two docs collide. Exactly one
    * bucket emits each candidate pair, so the pair stream is distinct BY
    * CONSTRUCTION — the n²-sized candidate set never needs a
    * dedup/count shuffle; only per-doc rows ever cross the network. */
  private def firstMatch(m: Column, idx: Column): Column =
    array_position(m, 1) === idx.cast("long") + lit(1L)

  /** Exact n-gram Jaccard near-dup pairs via an inverted index.
    *
    * Buckets key on the shingle (the classic set-similarity join, without
    * the self-join — see [[pairsInBucket]]); shingles in more than
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
    * permutation order.
    *
    * All `perms` mins are computed as parallel aggregates in a SINGLE
    * groupBy over the shingle rows — no perms× row explosion, one
    * shuffle on doc_id (map-side partial mins shrink it to one row per
    * (doc, partition)), and no second aggregation to re-assemble the
    * signature. Digest work is ONE md5 per shingle (Similarity.shingleHash);
    * each permutation is four integer ops on that hash
    * (Similarity.permuted) — at 100 TB the md5-per-(perm,shingle)
    * formulation spends `perms`× the digest compute for the same LSH
    * guarantees. Values are identical to the explode-per-permutation
    * formulation (the oracle's shape). */
  def minhashSignatures(docs: DataFrame, k: Int, perms: Int): DataFrame = {
    val mins = (0 until perms).map(p =>
      min(Similarity.permuted(col("h"), p)).as(s"m$p"))
    shingled(docs, k)
      .select(col("doc_id"), Similarity.shingleHash(col("s")).as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** LSH banding over MinHash signatures: `bands` bands of `perms/bands`
    * rows each; docs sharing any band bucket become a candidate pair.
    * Buckets key on (band, md5-of-band-slice) — fixed 16-byte keys, never
    * signatures or text — and pairs come from [[explodePairs]], so the
    * signature pipeline is computed exactly once.
    *
    * CANDIDATE PAIRS NEVER SHUFFLE. On a duplicate-heavy corpus the
    * candidate set is ~clusterSize²/2 × clusters — orders of magnitude
    * more rows than the corpus — so a `groupBy(pair)` to count shared
    * bands (the naive formulation) shuffles the n² blow-up itself.
    * Instead each doc's vector of SURVIVING band keys (slot = band, null
    * if its bucket there was dropped) rides into the bucket membership,
    * every bucket emits only the pairs whose FIRST surviving collision it
    * is ([[firstMatch]]), and `n_bands` is the match-vector sum — all
    * computed inside the bucket's task. The extra cost is three per-doc-
    * row shuffles (bucket-size window, key-vector agg, join-back), each
    * O(docs×bands) and fixed-width; the n² pair stream stays on-CPU. */
  def minhashCandidates(docs: DataFrame, k: Int, perms: Int, bands: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(perms % bands == 0, s"perms ($perms) must be a multiple of bands ($bands)")
    val rows = perms / bands
    val sigs = minhashSignatures(docs, k, perms)
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          md5(concat_ws("|", (0 until rows).map(r =>
            element_at(col("sig"), b * lit(rows) + lit(r + 1))): _*)).as("bk"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    // a bucket larger than maxBucket is a mass-duplicate cluster whose
    // n² pair fan-out belongs to EXACT dedup (same digest), not LSH —
    // drop it here to bound the explosion (oracle mirrors the cap);
    // size-1 buckets can't pair and don't survive either
    val surviving = banded
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("band"), col("bk"))))
      .filter(col("bsz").between(2, maxBucket))
      .select(col("doc_id"), col("band"), col("bk"))
    val slots = (0 until bands).map(b =>
      max(when(col("band") === b, col("bk"))).as(s"k$b"))
    val skeys = surviving.groupBy(col("doc_id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("doc_id"),
        array((0 until bands).map(b => col(s"k$b")): _*).as("skeys"))
    val buckets = surviving.join(skeys, "doc_id")
      .groupBy(col("band"), col("bk"))
      .agg(sort_array(collect_set(struct(col("doc_id"), col("skeys")))).as("ds"))
    explodePairs(buckets, "ds", carry = Seq("band"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("band"),
        matchVec(col("a.skeys"), col("b.skeys")).as("m"))
      .filter(firstMatch(col("m"), col("band")))
      .select(col("doc_a"), col("doc_b"),
        aggregate(col("m"), lit(0), _ + _).cast("long").as("n_bands"))
  }

  /** Embedding-cosine near-dup pairs via banded random-hyperplane LSH.
    *
    * `tables`×`bitsPerTable` deterministic hyperplanes are derived from
    * md5 (r_p[i] = first-nibble(md5("p|i")) - 7.5, the portable stand-in
    * for a seeded gaussian); each vector's bucket in table t is the
    * `bitsPerTable`-bit sign pattern of its hyperplane dots. Candidates
    * share a bucket in ANY table (OR-amplification: recall ≈
    * 1-(1-p^b)^T for per-bit agreement p), then exact quantized cosine
    * filters. The hyperplane codebook is broadcast; the corpus streams
    * through one scan + one shuffle on (table, bucket); candidate
    * verification joins back on vec_id only. */
  def embeddingCosPairs(emb0: DataFrame, tables: Int, bitsPerTable: Int,
      minCosQ: Long, dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val planes = tables * bitsPerTable
    // A wrong-width vector must FAIL the job, not degrade: zip_with over a
    // mismatched length null-pads, every hyperplane dot goes NULL, and all
    // vectors silently collapse into one (capped, dropped) bucket → zero
    // pairs. raise_error runs distributed, inside the scan projection.
    val emb = emb0.withColumn("ce",
      when(size(col("ce")) === dim, col("ce"))
        .otherwise(raise_error(concat(
          lit(s"embeddingCosPairs: embedding dim must be $dim, got "),
          size(col("ce")).cast("string")))))
    val spark = emb.sparkSession
    val hp = spark.range(planes).select(
      col("id").cast("int").as("p"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        conv(substring(md5(concat_ws("|", col("id"), i)), 1, 1), 16, 10)
          .cast("double") - 7.5).as("r"))
    val bits = emb.join(broadcast(hp))
      .select(col("vec_id"), (col("p") / bitsPerTable).cast("int").as("t"), col("p"),
        when(Similarity.dot(col("ce"), col("r")) >= 0, "1").otherwise("0").as("b"))
    val memberships = bits
      .groupBy(col("vec_id"), col("t"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("p"), col("b")))),
        x => x.getField("b")), "").as("bucket"))
    // mass-duplicate buckets belong to exact dedup; cap the fan-out.
    // OR-amplification makes a near-dup pair collide in MANY tables, so a
    // distinct() over the emitted pairs would shuffle the n² candidate
    // stream ~T times over — instead each vector's surviving bucket-key
    // vector rides into the bucket and only the first colliding table
    // emits a pair (see minhashCandidates; pairs are distinct by
    // construction and never cross the network).
    val surviving = memberships
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("t"), col("bucket"))))
      .filter(col("bsz").between(2, maxBucket))
      .select(col("vec_id"), col("t"), col("bucket"))
    val slots = (0 until tables).map(t =>
      max(when(col("t") === t, col("bucket"))).as(s"k$t"))
    val skeys = surviving.groupBy(col("vec_id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("vec_id"),
        array((0 until tables).map(t => col(s"k$t")): _*).as("skeys"))
    val cand = explodePairs(
      surviving.join(skeys, "vec_id")
        .groupBy(col("t"), col("bucket"))
        .agg(sort_array(collect_set(struct(col("vec_id"), col("skeys")))).as("ds")),
      "ds", carry = Seq("t"))
      .filter(firstMatch(matchVec(col("a.skeys"), col("b.skeys")), col("t")))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    cand
      .join(emb.select(col("vec_id"), col("ce").as("ca")), col("vec_a") === col("vec_id")).drop("vec_id")
      .join(emb.select(col("vec_id"), col("ce").as("cb")), col("vec_b") === col("vec_id")).drop("vec_id")
      .select(col("vec_a"), col("vec_b"),
        floor(Similarity.cosine(col("ca"), col("cb")) * lit(1000000.0)).cast("long").as("cos_q"))
      .filter(col("cos_q") >= minCosQ)
  }

  /** 64-bit SimHash signature per doc as a '0'/'1' bitstring.
    *
    * Word weights = term frequency; each word votes its md5-derived 64
    * bits (+tf for a set bit, -tf for unset); signature bit = sign of the
    * vote. All bit math runs on hex nibbles so the identical computation
    * is expressible in portable SQL.
    *
    * The 64 bit-votes are 64 parallel sum aggregates in a single
    * groupBy(doc_id) — no 64× bit-explosion (which would materialize
    * 64·|words| rows and force a second keyed shuffle on (doc, bit));
    * the signature assembles from the 64 vote columns directly. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("word")))
    def bit(i: Int) = expr(
      s"((CAST(position(substring(h, ${i / 4 + 1}, 1) IN '0123456789abcdef') AS INT) - 1) >> ${3 - i % 4}) & 1")
    val votes = (0 until 64).map(i => sum(col("cnt") * (bit(i) * 2 - 1)).as(s"v$i"))
    wc.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until 64).map(i => when(col(s"v$i") > 0, "1").otherwise("0")): _*).as("sig"))
  }

  /** Hamming-near pairs over SimHash signatures. Candidates come from a
    * 4×16-bit chunk LSH (two signatures within hamming distance 3 of
    * each other must agree on at least one 16-bit chunk; wider distances
    * trade recall for the same bounded cost). Bucket members carry their
    * signature into the pair explosion, so the signature pipeline runs
    * once and no join-back is needed. */
  def simhashPairs(docs: DataFrame, maxHamming: Int, maxBucket: Int = 10000): DataFrame = {
    val sigs = simhashSignatures(docs)
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("chunk", expr("substring(sig, j * 16 + 1, 16)"))
    // mass-duplicate buckets belong to exact dedup; cap the fan-out.
    // Near-identical docs agree on up to all 4 chunks, so a distinct()
    // over emitted pairs would shuffle the n² candidate stream — the
    // first-surviving-collision emission (see minhashCandidates) keeps it
    // on-CPU; only per-doc rows shuffle.
    val surviving = chunks
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("j"), col("chunk"))))
      .filter(col("bsz").between(2, maxBucket))
      .select(col("doc_id"), col("sig"), col("j"), col("chunk"))
    val slots = (0 until 4).map(j =>
      max(when(col("j") === j, col("chunk"))).as(s"k$j"))
    val skeys = surviving.groupBy(col("doc_id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("doc_id"),
        array((0 until 4).map(j => col(s"k$j")): _*).as("skeys"))
    val cand = explodePairs(
      surviving.join(skeys, "doc_id")
        .groupBy(col("j"), col("chunk"))
        .agg(sort_array(collect_set(struct(col("doc_id"), col("sig"), col("skeys")))).as("ds")),
      "ds", carry = Seq("j"))
      .filter(firstMatch(matchVec(col("a.skeys"), col("b.skeys")), col("j")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    val ham = (0 until 4).map(j =>
      expr(s"bit_count(CAST(conv(substring(sig_a, ${j * 16 + 1}, 16), 2, 10) AS BIGINT) ^ " +
        s"CAST(conv(substring(sig_b, ${j * 16 + 1}, 16), 2, 10) AS BIGINT))"))
      .reduce(_ + _)
    cand
      .select(col("doc_a"), col("doc_b"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
