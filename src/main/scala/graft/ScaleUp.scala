package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up: replicates a driver scale-factor dir
  * `reps`× with shifted primary keys, for benchmarking at a scale where
  * the per-query scheduler floor (~0.3-0.6 s) amortizes below the noise
  * floor. Both engines (Spark Bench and the DuckDB baseline) read the
  * SAME output parquet, so ratios stay apples-to-apples.
  *
  * Shifts keep replicas disjoint without changing join topology:
  * fact primary keys move by rep×1e9, per-entity ids (users, docs,
  * vectors) by rep×1e6; foreign keys into the UNreplicated dims stay
  * put. Document text gets a per-replica suffix token so near-dup
  * structure (and LSH bucket sizes) grow ~linearly with the corpus
  * instead of quadratically via byte-identical cross-replica copies.
  * ANN query vectors (vec_id < 5) exist only in replica 0 — the corpus
  * side scales, the query side doesn't, like a real serving workload.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out  = args.lift(1).getOrElse("/root/repo/bench-data/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    // Text replication mode. "suffix" (default) appends one per-replica
    // token — replicas stay NEAR-DUPLICATES of each other (Jaccard ≈
    // 0.9+), so LSH bucket sizes grow linearly but any EXACT τ≈0.8
    // similarity join truthfully owes C(reps, 2) pairs per original doc:
    // the true answer is quadratic in reps, which no engine outruns.
    // "interleave" marks every 8th word instead (~3/8 of shingles change
    // → cross-replica Jaccard ≈ 0.5), so within-replica near-dup
    // structure is preserved while cross-replica pairs fall below the
    // τ=0.8 threshold — the corpus an exact similarity join can be
    // benched on at scale.
    // "mixed" (r12) is the realistic regime for SUBSTRING dedup: docs
    // with doc_id % 5 = 0 replicate byte-identical (every 10-word gram
    // duplicated, df = reps) while the other 80% get the interleave
    // marking (a mark at least every 8 words → every 10-word window
    // contains one → cross-replica grams unique). The suffix-mode bench
    // corpus is the adversarial 100%-duplication worst case (every gram
    // flagged, dup set corpus-sized); mixed bounds the typical ~20%
    // boilerplate regime a production dedup pass actually sees.
    // "mixed-cal" (r17) is mixed with a DISTRIBUTION-PRESERVING
    // held-out slice: mixed's byte-identical class (doc_id % 5 = 0)
    // contains the whole doc_id % 10 = 0 held-out residue, so at scale
    // the held-out docs carry only unmarked (corpus-common) trigrams
    // while 80% of the training slice is rep-marked — held-out scores
    // flood below the training slice's p25 BY CONSTRUCTION and the LM
    // gate's calibration-tracking property becomes unverifiable
    // (measured r16: lm_gate_scale_sf10m distribution_caveat). Here the
    // held-out residue is interleave-marked LIKE THE BULK (the
    // byte-identical class shrinks to doc_id % 10 = 5 — 10% of docs,
    // stated), so held-out replicas stay in-distribution w.r.t. the
    // scaled training slice at every rep.
    val textMode = args.lift(3).getOrElse("suffix")
    // optional table subset (comma list) — the mixed-regime corpora only
    // need documents.parquet; skip the 10 GB of facts they'd never read
    val only = args.lift(4).map(_.split(",").map(_.trim).toSet)
    def wanted(n: String) = only.forall(_.contains(n))
    val spark = GraftSession.get("graft-scaleup")

    def raw(n: String) = spark.read.parquet(s"$src/$n.parquet")
    val r = broadcast(spark.range(reps).select(col("id").as("rep")))
    def scaled(df: DataFrame, overrides: (String, String)*): DataFrame = {
      val over = overrides.toMap
      df.crossJoin(r).selectExpr(
        df.columns.map(c => over.get(c).map(e => s"$e AS `$c`").getOrElse(s"`$c`")): _*)
    }
    // Fact tables are written as 32 files: a single crossJoin output file
    // is one giant parquet row group, and a row group is the atomic scan
    // split — one file would serialize the whole map side into one task
    // no matter what maxPartitionBytes says. 32 files ≙ full local[32]
    // scan parallelism (and models a real lake, which is many files).
    def write(df: DataFrame, n: String, fanOut: Boolean = true): Unit =
      (if (fanOut) df.repartition(32) else df)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")

    // Dim replication mode (r16). Default keeps every dim unreplicated
    // (FKs into them stay valid). "scale-customer" replicates CUSTOMER
    // with shifted keys and REWRITTEN names (the name re-derives from
    // the shifted key, so the scaled name space keeps the dense
    // ≤2-digit-edit structure the fuzzy-join rows stress) — the corpus
    // for the fuzzy family's at-scale points; the fact tables' FKs into
    // customer then only cover replica 0, so scale-customer corpora are
    // for name-space queries, not join benchmarks.
    val dimMode = args.lift(6).getOrElse("dims-asis")
    require(dimMode == "dims-asis" || dimMode == "scale-customer",
      s"unknown dim mode: $dimMode")
    val plainDims =
      if (dimMode == "scale-customer") Seq("region", "nation", "supplier", "part")
      else Seq("region", "nation", "customer", "supplier", "part")
    for (d <- plainDims if wanted(d))
      write(raw(d), d, fanOut = false)
    if (dimMode == "scale-customer" && wanted("customer")) {
      // guards (r16 review): lpad TRUNCATES strings longer than its
      // target, so a shifted key >= 1e9 would silently collapse 10
      // distinct keys onto one 9-digit name; and a base key >= the 1e6
      // shift would make replica key ranges overlap (duplicate
      // c_custkey rows). Both corrupt the fuzzy corpus undetectably —
      // refuse loudly instead.
      val maxBase = raw("customer").agg(max(col("c_custkey"))).head().getLong(0)
      require(maxBase < 1000000L,
        s"scale-customer: base c_custkey up to $maxBase overlaps the 1e6 " +
          "replica shift (source SF too large for this mode)")
      require(maxBase + (reps - 1L) * 1000000L < 1000000000L,
        s"scale-customer: shifted keys exceed 9 digits (reps=$reps) - " +
          "lpad(9) would truncate and collapse names")
      write(scaled(raw("customer"),
        "c_custkey" -> "c_custkey + rep * 1000000",
        "c_name" -> "concat('Customer#', lpad(CAST(c_custkey + rep * 1000000 AS STRING), 9, '0'))"),
        "customer")
    }
    if (wanted("lineitem")) write(scaled(raw("lineitem"),
      "l_orderkey" -> "l_orderkey + rep * 1000000000"), "lineitem")
    if (wanted("orders")) write(scaled(raw("orders"),
      "o_orderkey" -> "o_orderkey + rep * 1000000000"), "orders")
    // second-truncated TIMESTAMP on the way out (micros parquet both
    // engines read natively; Tables.events passes through). Source
    // encoding varies by driver round — nanos-as-long or native
    // timestamp — so branch on the schema exactly like Tables.events.
    if (wanted("events")) {
      val tsExpr = raw("events").schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => "timestamp_seconds(ts div 1000000000)"
        case _ => "date_trunc('second', ts)"
      }
      write(scaled(raw("events"),
        "event_id" -> "event_id + rep * 1000000000",
        "user_id"  -> "user_id + rep * 1000000",
        "ts"       -> tsExpr), "events")
    }
    val interleaveExpr =
      """array_join(
        |  transform(split(text, ' '),
        |    (w, i) -> CASE WHEN i % 8 = 7 THEN concat(w, 'r', CAST(rep AS STRING)) ELSE w END),
        |  ' ')""".stripMargin.linesIterator.mkString(" ")
    val textExpr = textMode match {
      case "suffix" =>
        "CASE WHEN rep = 0 THEN text ELSE concat(text, ' r', CAST(rep AS STRING)) END"
      case "interleave" =>
        s"CASE WHEN rep = 0 THEN text ELSE $interleaveExpr END"
      case "mixed" =>
        s"CASE WHEN rep = 0 OR doc_id % 5 = 0 THEN text ELSE $interleaveExpr END"
      case "mixed-cal" =>
        s"CASE WHEN rep = 0 OR (doc_id % 5 = 0 AND doc_id % 10 <> 0) THEN text" +
          s" ELSE $interleaveExpr END"
      case other => sys.error(s"unknown text mode: $other")
    }
    if (wanted("documents")) write(scaled(raw("documents"),
      "doc_id" -> "doc_id + rep * 1000000",
      "text"   -> textExpr),
      "documents")
    // Embedding replication mode (r13). "copy" (default) keeps replica
    // vectors byte-identical — the re-embedded-re-crawl regime, where a
    // recall eval of any bucketed rung is trivially ~100% (identical
    // vectors share every bucket by construction). "jitter" adds a
    // deterministic per-(replica, coordinate) perturbation of ≤0.02 per
    // coordinate (|Δ| ≈ 0.11 against unit-norm vectors → cos(v, v') ≈
    // 0.994): replicas stay TRUE near-duplicates far above τ=0.45, but
    // their hyperplane signs can flip near the margin — the NEAR-dup
    // regime the LSH rung exists for, measurable at scale. Pure
    // engine-shared arithmetic: the perturbed float32 lands in parquet,
    // both engines read the same bytes, so the recall oracle still
    // hash-matches.
    val embMode = args.lift(5).getOrElse("copy")
    val embExpr = embMode match {
      case "copy" => "embedding"
      case "jitter" =>
        """CASE WHEN rep = 0 THEN embedding ELSE
          |  transform(embedding, (x, i) ->
          |    x + CAST(0.01 AS FLOAT) *
          |        CAST((rep * 7 + i) % 5 - 2 AS FLOAT)) END"""
          .stripMargin.linesIterator.mkString(" ")
      case other => sys.error(s"unknown embeddings mode: $other")
    }
    if (wanted("embeddings")) write(scaled(raw("embeddings"),
      "vec_id" -> "vec_id + rep * 1000000",
      "embedding" -> embExpr), "embeddings")
    spark.stop()
  }
}
