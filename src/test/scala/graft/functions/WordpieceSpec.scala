package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def seg(s: String): String =
    WordpieceKernels.segment(UTF8String.fromString(s)).toString

  test("greedy longest-prefix segmentation: pinned corpus words") {
    assert(seg("window") == "wind ow")     // wind(4) beats win-less vocab
    assert(seg("table") == "tab le")
    assert(seg("customer") == "custom er") // 6-char piece wins over cust…
    assert(seg("stream") == "str eam")
    assert(seg("query") == "qu ery")
    assert(seg("spark") == "spark")        // whole-word piece
    assert(seg("the") == "the")
    assert(seg("a") == "a")                // single-char fallback
    assert(seg("zzz") == "z z z")          // fully out-of-vocab word
  }

  test("multi-word text: word boundaries never crossed; counts add up") {
    assert(seg("the fast window") == "the fast wind ow")
    // 'windowthe' as ONE word segments differently than across a space
    assert(seg("windowthe") == "wind ow the")
    assert(seg("") == "")
  }

  test("property: pieces concatenate back to the word; every multi-char piece is in vocab") {
    val word = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val prop = Prop.forAll(word) { w =>
      val pieces = seg(w).split(" ").toSeq
      // greedy first step: the LONGEST vocab prefix of the word wins
      val longest = (math.min(WordpieceVocab.MaxLen, w.length) to 2 by -1)
        .find(l => WordpieceVocab.Pieces.contains(w.take(l)))
      pieces.mkString == w &&
        pieces.forall(p => p.length == 1 || WordpieceVocab.Pieces.contains(p)) &&
        longest.forall(l => pieces.head.length == l)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("wordpiece operator: subword count >= word count; null-safe") {
    val docs = Seq((1L, "the fast window table"), (2L, "spark"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.wordpiece(docs, col("text"), col("doc_id"))
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((Some(4L), Some(6L), Some("the fast wind ow tab le"))))
    assert(out(2L) == ((Some(1L), Some(1L), Some("spark"))))
    assert(out(3L) == ((None, None, None))) // null text passes through
  }

  test("Column API matches the kernel directly") {
    val viaColumn = Seq("customer query").toDF("t")
      .select(WordpieceFunctions.wordpiece(col("t")))
      .as[String].head()
    assert(viaColumn == "custom er qu ery")
  }

  test("non-BMP codepoints segment whole — surrogate pairs never split") {
    // U+1F600 is two UTF-16 units; the single-unit fallback used to
    // emit each lone surrogate as its own piece (encoded '?'),
    // breaking the concat-of-pieces-restores-the-word invariant
    val emoji = new String(Character.toChars(0x1F600))
    val out = Seq(s"hi $emoji${emoji}x").toDF("t")
      .select(WordpieceFunctions.wordpiece(col("t")))
      .as[String].head()
    // 'hi' is not in the static vocab, so it falls back to chars —
    // the emoji must come through whole either way
    assert(out == s"h i $emoji $emoji x", out.codePoints().toArray.toSeq)
    // restoration invariant holds for every word
    assert(out.split(" ", -1).mkString("") == s"hi$emoji${emoji}x".replace(" ", ""))
  }

  test("external vocabulary: fromTable(parquet) reproduces the library " +
      "constant, and a custom artifact changes the segmentation") {
    // round-trip the library pieces through a parquet artifact — the
    // shipped-tokenizer deploy path — and require bit-identical output
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    WordpieceVocab.Pieces.toDF("piece").write.mode("overwrite").parquet(dir)
    val loaded = WordpieceVocab.fromTable(spark.read.parquet(dir), col("piece"))
    assert(loaded.sorted == WordpieceVocab.Pieces.sorted)
    val docs = Seq("customer query", "sparkle datastream", "the big sort")
      .toDF("t")
    val viaConst = docs.select(WordpieceFunctions.wordpiece(col("t")))
      .as[String].collect().toSeq
    val viaLoaded = docs
      .select(WordpieceFunctions.wordpiece(col("t"), loaded))
      .as[String].collect().toSeq
    assert(viaLoaded == viaConst)
    // a DIFFERENT artifact actually drives the encoder: with only
    // 'customer' in the vocabulary, 'custom'/'er' no longer win
    val custom = WordpieceVocab.fromTable(
      Seq("customer", "x", null).toDF("piece"), col("piece")) // 1-char + null dropped
    assert(custom == Seq("customer"))
    val out = Seq("customer query").toDF("t")
      .select(WordpieceFunctions.wordpiece(col("t"), custom))
      .as[String].head()
    assert(out == "customer q u e r y", out)
  }

  test("fromVocabFile: a HF-style vocab.txt (## continuations, bracketed " +
      "specials, CRLF) loads into the same pieces as the table path") {
    val f = java.nio.file.Files.createTempFile("vocab", ".txt")
    // BERT-style: specials first, then whole-word pieces, then ##
    // continuations; one duplicate after ##-stripping; CRLF endings
    java.nio.file.Files.write(f,
      ("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\n" +
        "custom\r\nspark\nthe\nz\n" + // 'z' single-char → implicit fallback
        "##er\n##spark\n##qu\n\n").getBytes("UTF-8"))
    val loaded = WordpieceVocab.fromVocabFile(f.toString)
    // ## strips onto the same piece space; 'spark'/'##spark' collapse
    assert(loaded == Seq("custom", "er", "qu", "spark", "the"), loaded)
    // and the loaded artifact equals the fromTable path on the same set
    assert(loaded == WordpieceVocab.fromTable(
      Seq("custom", "spark", "the", "z", "er", "spark", "qu")
        .toDF("piece"), col("piece")))
    // end-to-end: the file-loaded vocabulary drives the encoder
    val out = Seq("customer sparks").toDF("t")
      .select(WordpieceFunctions.wordpiece(col("t"), loaded))
      .as[String].head()
    assert(out == "custom er spark s", out)
  }
}
