package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}

import graft.operators.Fuzzy

/** The deletion-signature join must agree with brute-force pairwise
  * levenshtein on arbitrary short strings — including empty strings,
  * repeated characters (within-string duplicate deletion variants),
  * exact duplicates (distance-0 pairs), and strings differing by
  * insert / delete / substitute at every position. */
object FuzzyProps extends Properties("FuzzyJoinSemantics") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  private val genStrings: Gen[List[String]] =
    for {
      n  <- Gen.choose(1, 18)
      xs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 6)
        cs  <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield xs

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("editDistance1Pairs == brute-force pairwise levenshtein <= 1") =
    Prop.forAll(genStrings) { xs =>
      import TestSpark.spark.implicits._
      val rows = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Fuzzy.editDistance1Pairs(
          rows.toDF("id", "s"), idCol = "id", strCol = "s",
          maxBucket = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        d = lev(sa, sb) if d <= 1
      } yield (ia, ib, d.toLong)).toSet
      Prop(got == want) :| s"xs=$xs got=$got want=$want"
    }

  property("probeSignatureIndex == brute-force delta x corpus levenshtein") =
    // r16 (served form): the delta probe against the signature index
    // must find exactly the true cross pairs at both radii — including
    // distance-0 exact hits and empty/short strings
    Prop.forAll(genStrings, Gen.oneOf(1, 2)) { (xs, k) =>
      import TestSpark.spark.implicits._
      val rows = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val (corpus, delta) = rows.partition(_._1 % 2 == 0)
      val got =
        if (delta.isEmpty || corpus.isEmpty) Set.empty[(Long, Long, Long)]
        else Fuzzy.probeSignatureIndex(
            delta.toDF("id", "s"), idCol = "id", strCol = "s",
            index = Fuzzy.signatureIndex(
              corpus.toDF("id", "s"), "id", "s", maxDist = k),
            maxDist = k, maxBucket = 1000000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (id, sd) <- delta; (ic, sc) <- corpus
        d = lev(sd, sc) if d <= k
      } yield (id, ic, d.toLong)).toSet
      Prop(got == want) :| s"k=$k xs=$xs got=$got want=$want"
    }

  property("maxBucket cap drops dense-family pairs at maxDist=2 (and only those)") =
    // the r15 ADVICE test: at k=2 every single-char string co-buckets
    // at "" (a family of 8 here), so with the cap below 8 their pairs
    // drop — mass-duplicate semantics — while a pair whose shared
    // buckets are small survives. Uncapped, the same input returns the
    // full brute-force answer (the cap is the ONLY loss).
    Prop.secure {
      import TestSpark.spark.implicits._
      val singles = ('a' to 'h').map(_.toString)
      val rows = (singles ++ Seq("xyzzy", "xyzza")).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "s")
      val capped = Fuzzy.editDistancePairs(df, "id", "s", maxDist = 2,
          maxBucket = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val survivor = (8L, 9L, 1L) // xyzzy/xyzza share only size-2 buckets
      val uncapped = Fuzzy.editDistancePairs(df, "id", "s", maxDist = 2,
          maxBucket = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        d = lev(sa, sb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      Prop(capped == Set(survivor) && uncapped == want) :|
        s"capped=$capped uncapped=$uncapped want=$want"
    }

  property("probeSignatureSegments(base, append) == rebuilt-index probe (any cap)") =
    // r17 (maintenance arm): probing a standing index plus an append
    // segment must equal probing an index REBUILT over the union —
    // including the maxBucket drop set, which is where the naive
    // stale-bsz union diverges
    Prop.forAll(genStrings, Gen.oneOf(1, 2), Gen.choose(2, 8)) { (xs, k, cap) =>
      import TestSpark.spark.implicits._
      val rows = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val base    = rows.filter(_._1 % 3 == 0)
      val segment = rows.filter(_._1 % 3 == 1)
      val delta   = rows.filter(_._1 % 3 == 2)
      if (base.isEmpty || segment.isEmpty || delta.isEmpty) Prop(true)
      else {
        def collect(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val got = collect(Fuzzy.probeSignatureSegments(
          delta.toDF("id", "s"), "id", "s",
          segments = Seq(
            Fuzzy.signatureIndex(base.toDF("id", "s"), "id", "s", k),
            Fuzzy.signatureIndex(segment.toDF("id", "s"), "id", "s", k)),
          maxDist = k, maxBucket = cap))
        val rebuilt = collect(Fuzzy.probeSignatureIndex(
          delta.toDF("id", "s"), "id", "s",
          index = Fuzzy.signatureIndex(
            (base ++ segment).toDF("id", "s"), "id", "s", k),
          maxDist = k, maxBucket = cap))
        Prop(got == rebuilt) :| s"k=$k cap=$cap got=$got rebuilt=$rebuilt"
      }
    }

  property("a bucket crossing the cap ONLY via the append drops whole, never half") =
    // the failure mode the segments probe exists to prevent: the base's
    // '' bucket holds 4 single-char strings (<= cap 5), the append adds
    // 3 more (union 7 > 5). Stored bsz is now stale on BOTH sides
    // (base rows say 4, segment rows say 3 — each under the cap), so a
    // naive stale-bsz union probe KEEPS all 7 candidates; the rebuild
    // drops all 7. probeSignatureSegments must match the rebuild, and
    // the small-bucket pair must survive in both.
    Prop.secure {
      import TestSpark.spark.implicits._
      val base = Seq("a", "b", "c", "d", "pqr").zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val segment = Seq("e", "f", "g").zipWithIndex
        .map { case (s, i) => (100L + i, s) }
      val delta = Seq((200L, "x"), (201L, "pqs"))
      val cap = 5
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val baseIdx = Fuzzy.signatureIndex(base.toDF("id", "s"), "id", "s", 1)
      val segIdx = Fuzzy.signatureIndex(segment.toDF("id", "s"), "id", "s", 1)
      val got = collect(Fuzzy.probeSignatureSegments(delta.toDF("id", "s"),
        "id", "s", Seq(baseIdx, segIdx), maxDist = 1, maxBucket = cap))
      val rebuilt = collect(Fuzzy.probeSignatureIndex(delta.toDF("id", "s"),
        "id", "s", Fuzzy.signatureIndex(
          (base ++ segment).toDF("id", "s"), "id", "s", 1),
        maxDist = 1, maxBucket = cap))
      // the stale-bsz union (what a naive append would serve): every
      // single-char pair wrongly survives its under-cap stale counts
      val naive = collect(Fuzzy.probeSignatureIndex(delta.toDF("id", "s"),
        "id", "s", baseIdx.unionByName(segIdx), maxDist = 1, maxBucket = cap))
      val survivor = (201L, 4L, 1L) // pqs~pqr share only the tiny 'pq' bucket
      Prop(got == rebuilt && got == Set(survivor) &&
        naive.size == 8 && (naive -- got).forall(_._1 == 200L)) :|
        s"got=$got rebuilt=$rebuilt naive=$naive"
    }

  property("editDistancePairs(maxDist=2) == brute-force pairwise levenshtein <= 2") =
    // r15 (FastSS k=2): the iterated single-deletion family must be a
    // COMPLETE candidate rule at the wider radius — every true <=2 pair
    // shares a <=2-deletion variant — incl. the length<=2 strings that
    // all co-bucket at "" (genuinely all within distance 2)
    Prop.forAll(genStrings) { xs =>
      import TestSpark.spark.implicits._
      val rows = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Fuzzy.editDistancePairs(
          rows.toDF("id", "s"), idCol = "id", strCol = "s",
          maxDist = 2, maxBucket = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        d = lev(sa, sb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      Prop(got == want) :| s"xs=$xs got=$got want=$want"
    }
}
