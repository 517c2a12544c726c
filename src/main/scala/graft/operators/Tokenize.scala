package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the "train a tokenizer on the
  * corpus" step of an LLM data pipeline, Spark-shaped.
  *
  * The scalable formulation trains on the WORD VOCABULARY, not the
  * corpus: one corpus-sized shuffle builds (word, count) once, and each
  * merge iteration then runs entirely at vocabulary scale — a pair-count
  * aggregation over the vocab's adjacent symbol pairs (weighted by word
  * count), a 1-row argmax, and a row-local fold that applies the chosen
  * merge to every word's symbol sequence. At 100 TB the corpus is read
  * exactly once; iterations touch only the vocab (millions of rows at
  * web scale, KBs of shuffle after map-side combine).
  *
  * Engine-portable by construction: pair counts are exact integers, the
  * winning pair breaks ties by (count desc, a asc, b asc) — a total
  * order — and the merge application is the canonical left-to-right
  * non-overlapping scan, expressed as an array fold whose DuckDB twin
  * is a delimiter-wrapped string `replace` (same non-overlapping
  * left-to-right semantics, verified identical by the oracle
  * hash-match). The winner never collects to the driver: it re-enters
  * the plan as a 1-row broadcast, so the trainer is a pure dataflow
  * loop like [[Graph.pageRank]]. If no pair remains before `nMerges`
  * rounds (fully merged vocab), both engines stop emitting rows —
  * later merge indices are simply absent.
  */
object Tokenize {

  /** Reserved symbol-stream delimiter of the ORACLE twin's string
    * representation; words containing it are excluded from training on
    * both sides (in practice: none — it is a control character). */
  val Delim = "\u0001"

  /** (word, wc) vocabulary — the one corpus-sized aggregation. */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(Delim))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** Character-split: word → array of single-character symbols. */
  private def charSyms: Column =
    expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")

  /** Adjacent-pair counts over symbol sequences, weighted by `wc`. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wc")).as("n"))

  /** Canonical left-to-right non-overlapping merge of (`_ma`, `_mb`)
    * into one symbol, as a row-local fold: append each symbol unless it
    * is `_mb` directly after an unconsumed `_ma` — then replace the
    * tail. (A just-merged "ab" can never match `_ma`="a" again, so
    * non-overlap falls out of the fold for free.) */
  private def applyMerge(syms: Column, ma: Column, mb: Column): Column =
    aggregate(syms, lit(Array.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, size(acc)) === ma && x === mb,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(ma, mb))))
          .otherwise(concat(acc, array(x))))

  /** ENCODE with a trained merge table: per-document BPE token counts
    * (doc_id, n_words, n_tokens). `merges` is the (a, b) list in
    * merge_idx order — the model, loaded driver-side the way a serving
    * job loads the persisted merge table (8-64 rows, KBs).
    *
    * Scale shape: tokenization is computed once per DISTINCT word (the
    * vocab — one corpus-sized distinct), each word folded through the
    * merge chain row-locally; the corpus then pays one join of
    * (word → token count) keyed on `word` and one doc-keyed count —
    * tokenizing 100 TB costs vocab-scale CPU plus two corpus-sized
    * aggregations, never a per-occurrence fold.
    *
    * The vocab join is deliberately UN-hinted: a clean web corpus's
    * vocabulary broadcasts (AQE picks that at runtime from the REAL
    * post-fold size), but a raw crawl's distinct-"word" set — typos,
    * URLs, code tokens — is 10⁸–10⁹ rows, far past any broadcast bound,
    * and a forced hint there is a guaranteed driver/executor OOM at
    * exactly the scale this operator exists for. The shuffle-join
    * fallback keys both sides on `word`, so the worst case is one extra
    * vocab-sized exchange, never a memory cliff (PlanSpec proves the
    * plan survives autoBroadcastJoinThreshold=-1). */
  def bpeTokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(Delim))
    val wordTokens = toks.select(col("word")).distinct()
      .select(col("word"), size(
        merges.foldLeft(charSyms)((c, m) =>
          applyMerge(c, lit(m._1), lit(m._2)))).as("wt"))
    toks.join(wordTokens, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("wt")).as("n_tokens"))
  }

  /** Train `nMerges` BPE merges over the corpus; returns the merge
    * table (merge_idx, a, b, n) — the tokenizer model. Each iteration
    * localCheckpoints the (small) vocab and the 1-row winner: the loop
    * is iterative dataflow, and without the cut every round would
    * re-plan all previous rounds (the [[Graph.pageRank]] lesson). */
  def bpeMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64,
      s"bpeMerges: nMerges=$nMerges out of range 1..64 (merge table, not full vocab runs)")
    var vocab = wordVocab(docs)
      .select(col("wc"), charSyms.as("syms"))
      .localCheckpoint()
    var out: DataFrame = null
    for (k <- 0 until nMerges) {
      val best = pairCounts(vocab)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .select(lit(k.toLong).as("merge_idx"), col("a"), col("b"), col("n"))
        .localCheckpoint()
      out = if (out == null) best else out.unionByName(best)
      vocab = vocab
        .crossJoin(broadcast(best.select(col("a").as("_ma"), col("b").as("_mb"))))
        .select(col("wc"),
          applyMerge(col("syms"), col("_ma"), col("_mb")).as("syms"))
        .localCheckpoint()
    }
    out
  }
}
