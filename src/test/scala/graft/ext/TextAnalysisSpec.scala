package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId: stopword-dense -> en; long-word -> de; else unk") {
    val df = Seq(
      "the cat sat on the mat with the hat",        // stopword-dense
      "zusammengesetzte wortbildungen kennzeichnen schriftsprache", // long words
      "ab cd ef gh"                                  // neither
    ).toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "unk"))
  }

  test("tokenCounts: whitespace count and bounded BPE-ish count") {
    val df = Seq("the quick brown fox").toDF("text")
    val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
    val (w, b) = df.select(ws.as("w"), bpe.cast("long").as("b"))
      .as[(Long, Long)].head()
    assert(w == 4L)
    assert(b >= w) // subword count never below word count for [a-z] text
  }

  test("qualityRules: each rule trips independently, keep = (mask == 0)") {
    val docs = Seq(
      (1L, "the cat sat with the dog near a tall tree"), // passes all five
      (2L, "one two"),                          // short (1) + no stopwords (8)
      (3L, "a b c d e f g h i j the a"),        // mean word length < 3 (2)
      (4L, "#### #### #### #### ####"),         // alpha (4) + stop (8) + sym (16)
      (5L, "the cats sat upon a mats ... okay") // ellipsis density alone (16)
    ).toDF("doc_id", "text")
    val (mask, keep) = TextAnalysis.qualityRules(col("text"))
    val out = docs.select(col("doc_id"), mask.as("m"), keep.as("k"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, true)), out(1L))
    assert(out(2L) == ((9L, false)), out(2L))
    assert(out(3L) == ((2L, false)), out(3L))
    assert(out(4L) == ((28L, false)), out(4L))
    assert(out(5L) == ((16L, false)), out(5L))
  }

  test("qualityScore stays within [0, 1]") {
    val df = Seq("the a the a the a", "x", ("long " * 300).trim).toDF("text")
    val out = df.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("fingerprint: md5 twin and 48-bit base hash") {
    val df = Seq("hello world").toDF("text")
    val (fp48, fpMd5) = TextAnalysis.fingerprint(col("text"))
    val (h, m) = df.select(fp48.as("h"), fpMd5.as("m")).as[(Long, String)].head()
    assert(m == java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(h == java.lang.Long.parseLong(m.take(12), 16))
  }

  test("meanDocFreq: boilerplate scores high, rare vocabulary low, hand values exact") {
    import org.apache.spark.sql.functions.col
    // 'the' appears in all 3 docs (df=3); rare terms in 1
    val docs = Seq(
      (1L, "the the the"),          // all occurrences df=3 -> mean 3.0
      (2L, "the zebra"),            // (3 + 1) / 2 = 2.0
      (3L, "the quux corge grault") // (3 + 1 + 1 + 1) / 4 = 1.5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.meanDocFreq(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 3.0), (2L, 2L, 2.0), (3L, 4L, 1.5)))
  }

  test("contaminatedBloom equals contaminated exactly — even with a " +
      "deliberately saturated 64-bit bloom (false positives screened " +
      "by the exact stage)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.model.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val corpus = docs.filter(col("doc_id") >= 25)
    val eval = docs.filter(col("doc_id") < 25)
    val exact = TextAnalysis.contaminated(corpus, eval,
        col("text"), col("doc_id"), n = 13, minShared = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(exact.nonEmpty, "fixture must have contaminated docs")
    // 64 bits << distinct eval shingles: nearly every corpus shingle
    // is bloom-positive, so this maximally stresses the exact verify
    for (bits <- Seq(64, 1 << 16)) {
      val got = TextAnalysis.contaminatedBloom(corpus, eval,
          col("text"), col("doc_id"), n = 13, minShared = 1,
          bloomBits = bits)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == exact, s"bloomBits=$bits diverged from exact")
    }
  }

  test("unigramCrossEntropy: rare-token docs score more bits than typical docs") {
    import org.apache.spark.sql.functions.col
    // 'the' dominates the corpus; doc 4 is all rare singletons
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the the cat sat"),
      (3L, "the cat sat mat"),
      (4L, "qux zil vop wug")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramCrossEntropy(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) < got(2L) && got(2L) < got(3L) && got(3L) < got(4L),
      s"monotone rarity ordering violated: $got")
    // all-singleton doc: every token has p = 1/16 -> exactly 4e6 micro-bits
    assert(got(4L) == 4000000L)
    // counts: 4 tokens per doc
    val nTok = TextAnalysis.unigramCrossEntropy(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long)].collect().map(_._2).toSet
    assert(nTok == Set(4L))
  }
}
