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

  // arbitrary RAW BYTES — including invalid UTF-8 (bare continuation
  // bytes, dangling leads, overlongs, surrogate encodings): strings
  // read from external parquet carry whatever bytes were written. The
  // r15 ADVICE case: the old fallback collided a dangling 0xC3 lead
  // with a literal 0x03.
  private val genBytes: Gen[Array[Byte]] = for {
    n  <- Gen.choose(0, 16)
    bs <- Gen.listOfN(n, Gen.oneOf[Int](
      0x41, 0x03, 0x20,              // ASCII
      0xc3, 0xa9, 0xc2, 0xa0,        // valid-2-byte material + bare tails
      0xe4, 0xb8, 0xad,              // valid-3-byte material
      0xf0, 0x9f, 0x8c, 0x8d,        // valid-4-byte material
      0xc0, 0x81,                    // overlong lead
      0xed, 0xa0, 0x80,              // surrogate encoding material
      0xf5, 0xf8, 0xff))             // out-of-range / invalid leads
  } yield bs.map(_.toByte).toArray

  property("graft_char_ngram_codes on INVALID UTF-8: boundary-aligned with " +
    "graft_char_ngrams; valid chars decode, malformed chars → U+FFFD") =
    Prop.forAll(genBytes, Gen.choose(1, 3)) { (bytes, n) =>
      import org.apache.spark.unsafe.types.UTF8String
      val s = UTF8String.fromBytes(bytes)
      val codes = Option(CharNgramCodes.codes(s, n))
        .map(a => a.toLongArray.toSeq).getOrElse(Seq.empty)
      val grams = Option(CharNgrams.ngrams(s, n))
        .map(a => (0 until a.numElements()).map(i =>
          a.getUTF8String(i).getBytes.clone())).getOrElse(Seq.empty)
      // the two expressions must agree on CHAR BOUNDARIES regardless of
      // byte validity — same count of n-grams
      val aligned = Prop(codes.length == grams.length) :|
        s"walks disagree: ${codes.length} codes vs ${grams.length} grams"
      // 1-gram spec, judged by the JDK's strict decoder (independent of
      // the expression's own logic): a char slice that round-trips as
      // exactly one code point packs that code point; anything else —
      // truncated, overlong, surrogate, out-of-range — packs U+FFFD
      val spec = if (n != 1) Prop.passed else Prop.all(
        codes.zip(grams).zipWithIndex.map { case ((code, gb), i) =>
          val cps = new String(gb, java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().toArray
          val roundTrips = cps.length == 1 &&
            java.util.Arrays.equals(
              new String(gb, java.nio.charset.StandardCharsets.UTF_8)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8), gb)
          val want = if (roundTrips) cps(0).toLong else 0xFFFDL
          Prop(code == want) :|
            s"pos $i: bytes=${gb.map(b => f"${b & 0xff}%02x").mkString} " +
              s"code=$code want=$want"
        }: _*)
      aligned && spec
    }
}
