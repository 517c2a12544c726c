package graft.plans

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.Similarity

/** Property checks for the r14 compiled similarity expressions: each
  * must be VALUE-IDENTICAL to the higher-order-function chain it
  * replaced, on arbitrary word arrays — not just the fixture corpus.
  * The generators include empty strings, repeated words (duplicate
  * shingles — the array_distinct case the compiled forms shortcut) and
  * space-containing words (shingle-text ambiguity both forms must
  * resolve identically, since both join with a single space). */
object ExprProps extends Properties("CompiledSimilarityExprs") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  // small vocabulary forces duplicate shingles; "c d" carries a space,
  // "" is the empty word
  private val genWords: Gen[List[String]] = for {
    n  <- Gen.choose(0, 14)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "c d", "", "zz9"))
  } yield ws

  property("graft_minhash_sig == minhashFromHashes over shingleHashes") =
    Prop.forAll(genWords, Gen.choose(1, 4), Gen.oneOf(4, 8)) { (ws, k, perms) =>
      import TestSpark.spark.implicits._
      val df = Seq(Tuple1(ws)).toDF("w")
      val viaExpr = df.select(call_function("graft_minhash_sig",
        col("w"), lit(k), lit(perms)).as("sig")).collect().head
      if (ws.length < k) {
        Prop(viaExpr.isNullAt(0)) :| "sub-k rows must be null"
      } else {
        val viaHof = df
          .select(Similarity.shingleHashes(col("w"), k).as("hs"))
          .select(Similarity.minhashFromHashes(col("hs"), perms).as("sig"))
          .collect().head.getSeq[Long](0)
        val got = viaExpr.getSeq[Long](0)
        Prop(got == viaHof) :| s"k=$k perms=$perms got=$got want=$viaHof"
      }
    }

  property("graft_shingle_md5s == md5 over distinct HOF shingles, same order") =
    Prop.forAll(genWords, Gen.choose(1, 4)) { (ws, k) =>
      import TestSpark.spark.implicits._
      val df = Seq(Tuple1(ws)).toDF("w")
      val viaExpr = df.select(call_function("graft_shingle_md5s",
        col("w"), lit(k)).as("hs")).collect().head.getSeq[String](0)
      // first-occurrence order, exactly array_distinct's
      val viaHof = df
        .select(transform(Similarity.shinglesOfWords(col("w"), k),
          s => md5(s)).as("hs"))
        .collect().head.getSeq[String](0)
      Prop(viaExpr == viaHof) :| s"k=$k got=$viaExpr want=$viaHof"
    }

  // arbitrary text including multi-byte chars (2-, 3- AND 4-byte
  // sequences — "🌍" is a surrogate pair in the JVM but ONE code
  // point) — the byte-offset walk must count CODE POINTS exactly as
  // length()/substring() do
  private val genText: Gen[String] = for {
    n  <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", " ", "é", "的", "🌍", "9"))
  } yield cs.mkString

  property("graft_char_ngrams == transform+substring over every position") =
    Prop.forAll(genText, Gen.choose(1, 4)) { (text, n) =>
      import TestSpark.spark.implicits._
      val df = Seq(Tuple1(text)).toDF("t")
      val viaExpr = df.select(call_function("graft_char_ngrams",
        col("t"), lit(n)).as("g")).collect().head.getSeq[String](0)
      // sequence(1, 0) DESCENDS in Spark — guard the sub-n case the
      // compiled form defines as empty
      val viaHof = df.select(expr(
        s"CASE WHEN length(t) >= $n THEN transform(sequence(1, length(t) - $n + 1), " +
          s"i -> substring(t, i, $n)) ELSE CAST(array() AS array<string>) END")
        .as("g")).collect().head.getSeq[String](0)
      Prop(viaExpr == viaHof) :| s"n=$n text='$text' got=$viaExpr want=$viaHof"
    }

  property("graft_char_ngram_codes packs each gram's code points, position-aligned") =
    Prop.forAll(genText, Gen.choose(1, 3)) { (text, n) =>
      import TestSpark.spark.implicits._
      val df = Seq(Tuple1(text)).toDF("t")
      val codes = df.select(call_function("graft_char_ngram_codes",
        col("t"), lit(n)).as("c")).collect().head.getSeq[Long](0)
      val grams = df.select(call_function("graft_char_ngrams",
        col("t"), lit(n)).as("g")).collect().head.getSeq[String](0)
      def pack(g: String): Long =
        g.codePoints().toArray.foldLeft(0L)((a, cp) => (a << 21) | (cp & 0x1fffffL))
      Prop(codes == grams.map(pack)) :|
        s"n=$n text='$text' codes=$codes grams=$grams"
    }
}
