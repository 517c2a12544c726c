package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** (doc_id, shingle) pairs — distinct word-k-shingles, exploded. */
  def shingled(docs: DataFrame, k: Int): DataFrame =
    docs
      .filter(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"), explode(Similarity.shingles(col("text"), k)).as("s"))

  /** Exact n-gram Jaccard near-dup pairs via an inverted-index self-join.
    *
    * The join keys on the shingle (equi-join — the classic set-similarity
    * join), shingles hotter than `maxDf` documents are dropped first
    * (stop-shingle guard: bounds any join group at maxDf², and a shingle
    * in >maxDf docs carries ~no similarity signal), and pairs sharing
    * fewer than `minCommon` shingles are pruned before the Jaccard math.
    */
  def jaccardPairs(docs: DataFrame, k: Int, maxDf: Int, minCommon: Int,
      minJaccard: Double): DataFrame = {
    val sh = shingled(docs, k)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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
    * permutation order. Single shuffle on doc_id after the per-(doc,perm)
    * partial min (map-side combine does the heavy lifting). */
  def minhashSignatures(docs: DataFrame, k: Int, perms: Int): DataFrame =
    shingled(docs, k)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(perms - 1))).as("p"),
        col("s"))
      .select(col("doc_id"), col("p"), Similarity.permHash(col("p"), col("s")).as("h"))
      .groupBy(col("doc_id"), col("p"))
      .agg(min(col("h")).as("sig"))
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("sig")))),
        x => x.getField("sig")).as("sig"))

  /** LSH banding over MinHash signatures: `bands` bands of `perms/bands`
    * rows each; docs sharing any band bucket become a candidate pair.
    * The self-join keys on (band, md5-of-band-slice) — fixed 16-byte
    * bucket keys, never signatures or text. */
  def minhashCandidates(docs: DataFrame, k: Int, perms: Int, bands: Int): DataFrame = {
    val rows = perms / bands
    val sigs = minhashSignatures(docs, k, perms)
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          md5(concat_ws("", (0 until rows).map(r =>
            element_at(col("sig"), b * lit(rows) + lit(r + 1))): _*)).as("bk"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 64-bit SimHash signature per doc as a '0'/'1' bitstring.
    *
    * Word weights = term frequency; each word votes its md5-derived 64
    * bits (+tf for a set bit, -tf for unset); signature bit = sign of the
    * vote. All bit math runs on hex nibbles so the identical computation
    * is expressible in portable SQL. */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), md5(col("word")).as("h"),
        explode(sequence(lit(0), lit(63))).as("i"))
      .withColumn("bit",
        expr("((CAST(position(substring(h, (i div 4) + 1, 1) IN '0123456789abcdef') AS INT) - 1) >> (3 - i % 4)) & 1"))
      .groupBy(col("doc_id"), col("i"))
      .agg(sum(col("cnt") * (col("bit") * 2 - 1)).as("v"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"),
          when(col("v") > 0, "1").otherwise("0").as("b")))), x => x.getField("b")),
        "").as("sig"))

  /** Hamming-near pairs over SimHash signatures. Candidates come from a
    * 4×16-bit chunk LSH (two signatures within hamming distance 3 of
    * each other must agree on at least one 16-bit chunk; wider distances
    * trade recall for the same bounded cost). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simhashSignatures(docs)
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("chunk", expr("substring(sig, j * 16 + 1, 16)"))
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        col("a.j") === col("b.j") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    val ham = (0 until 4).map(j =>
      expr(s"bit_count(CAST(conv(substring(sig_a, ${j * 16 + 1}, 16), 2, 10) AS BIGINT) ^ " +
        s"CAST(conv(substring(sig_b, ${j * 16 + 1}, 16), 2, 10) AS BIGINT))"))
      .reduce(_ + _)
    cand
      .select(col("doc_a"), col("doc_b"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
