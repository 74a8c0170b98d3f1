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

  test("noveltyRate: first occurrence owns the shingle; exact copies score 0") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the cat sat on the mat"),  // everything first-seen
      (2L, "the cat sat on the mat"),  // exact copy -> novelty 0
      (3L, "the cat sat on a mat"),    // shares its 2 leading shingles
      (4L, "a b")                      // too short for 3-grams -> omitted
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyRate(docs, col("text"), col("doc_id"), n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!got.contains(4L), "sub-shingle doc must be omitted")
    assert(got(1L)._3 == 10000L, s"first doc fully novel: ${got(1L)}")
    assert(got(2L)._3 == 0L, s"exact copy has zero novelty: ${got(2L)}")
    val (n3, nov3, bps3) = got(3L)
    assert(nov3 > 0 && nov3 < n3 && bps3 == nov3 * 10000 / n3,
      s"partial overlap must land strictly between: ${got(3L)}")
  }

  test("noveltyRate: per-shingle novel credit is granted exactly once corpus-wide") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 20L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyRate(docs, col("text"), col("doc_id"), n = 3)
    val totalNovel = out.agg(sum("n_novel")).head().getLong(0)
    val distinctShingles = docs
      .select(explode(array_distinct(
        TextHash.shingles(TextHash.tokens(col("text")), 3))).as("sh"))
      .select("sh").distinct().count()
    assert(totalNovel == distinctShingles,
      s"sum(n_novel)=$totalNovel != corpus distinct shingles $distinctShingles")
  }

  test("vocabGrowth: deciles partition the vocabulary; cumulative is monotone") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tok${i % 11} tok${i % 13}"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, col("text"), col("doc_id"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val distinctShingles = docs
      .select(explode(array_distinct(
        TextHash.shingles(TextHash.tokens(col("text")), 3))).as("sh"))
      .select("sh").distinct().count()
    assert(out.map(_._2).sum == distinctShingles,
      s"decile n_new must partition the vocabulary: $out")
    assert(out.last._3 == distinctShingles, s"final cumulative: ${out.last}")
    assert(out.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      s"cumulative must strictly increase: $out")
    assert(out.forall(r => r._1 >= 0 && r._1 <= 9), s"bucket range: $out")
  }

  test("bpeTrain: learns chained merges with exact counts; exhausts gracefully") {
    import org.apache.spark.sql.functions.col
    // aab×3 + ab×1: iter1 'a b' wins 4-3 over 'a a'; iter2 merges the
    // iter-1 product ('a ab' -> aab); iter3 has no pairs left
    val docs = Seq((1L, "aab aab aab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, col("text"), k = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b", "ab", 4L),
      (2L, "a ab", "aab", 3L)),
      s"merge table mismatch: $got")
  }

  test("bpeTrain: same-symbol runs merge left-to-right non-overlapping (list-scan BPE)") {
    import org.apache.spark.sql.functions.col
    // 'oooo' must encode [oo, oo] after the 'o o' merge — the shared-
    // delimiter string-replace formulation yielded [oo, o, o], skewing
    // the next round's pair counts
    val docs = Seq((1L, "oooo oooo")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, col("text"), k = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1L, "o o", "oo", 6L),     // 3 adjacent pairs per word x 2 words
      (2L, "oo oo", "oooo", 2L)), // exact pairing makes oooo reachable
      s"run merge trajectory: $merges")
    val counts = TextAnalysis.bpeEncodeCounts(docs, col("text"),
        col("doc_id"), k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(counts == Seq((1L, 2L, 2L)), counts) // both words one piece
  }

  test("bpeEncodeCounts: trained-tokenizer lengths; survives merge exhaustion") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "aab aab aab ab"), (2L, "ab aab")).toDF("doc_id", "text")
    // k=3 exceeds the 2 learnable merges — the vocabulary state must
    // survive the empty step (left-join sentinel), with both words
    // fully merged to single pieces
    val got = TextAnalysis.bpeEncodeCounts(docs, col("text"), col("doc_id"),
        k = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 4L), (2L, 2L, 2L)), got)
    // with only one merge learned ('a b' -> ab), aab = [a, ab] = 2 pieces
    val one = TextAnalysis.bpeEncodeCounts(docs, col("text"), col("doc_id"),
        k = 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(one == Seq((1L, 4L, 3L * 2 + 1L), (2L, 2L, 3L)), one)
  }

  test("bpeApplyMerges: a shipped merge table round-tripped through " +
      "parquet reproduces bpeEncodeCounts exactly") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "aab aab aab ab"), (2L, "ab aab"),
      (3L, "o o oo aab xyz")).toDF("doc_id", "text")
    // train once, version the artifact, encode from the ARTIFACT — the
    // deploy path where training and application are different jobs
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    TextAnalysis.bpeTrain(docs, col("text"), k = 3)
      .write.mode("overwrite").parquet(dir)
    val applied = TextAnalysis.bpeApplyMerges(docs, col("text"),
        col("doc_id"), spark.read.parquet(dir))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val trained = TextAnalysis.bpeEncodeCounts(docs, col("text"),
        col("doc_id"), k = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(applied == trained, s"applied $applied vs trained $trained")
    // an empty merge table degrades to character-level counts
    val none = TextAnalysis.bpeApplyMerges(docs.filter(col("doc_id") === 2),
        col("text"), col("doc_id"),
        spark.read.parquet(dir).filter(col("step") < 0))
      .as[(Long, Long, Long)].collect().toSeq
    assert(none == Seq((2L, 2L, 5L)), none) // 'ab'=2 chars + 'aab'=3 chars
  }

  test("bpeMergesFromFile: a HF-style merges.txt (rank-ordered pairs, " +
      "#version header, CRLF) reproduces the trained-table encoding") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "aab aab aab ab"), (2L, "ab aab"),
      (3L, "o o oo aab xyz")).toDF("doc_id", "text")
    // serialize bpeTrain's own merge table as a merges.txt — rank IS
    // the line order, exactly the HF artifact convention
    val trained = TextAnalysis.bpeTrain(docs, col("text"), k = 3)
      .orderBy("step")
      .select("pair").as[String].collect()
    val f = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.write(f,
      ("#version: 0.2\n" + trained.mkString("\r\n") + "\n").getBytes("UTF-8"))
    val loaded = TextAnalysis.bpeMergesFromFile(spark, f.toString)
    assert(loaded.orderBy("step").as[(Long, String, String)].collect()
      .map(_._2).toSeq == trained.toSeq)
    // file-loaded merges encode identically to the in-frame table
    val viaFile = TextAnalysis.bpeApplyMerges(docs, col("text"),
        col("doc_id"), loaded)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val direct = TextAnalysis.bpeEncodeCounts(docs, col("text"),
        col("doc_id"), k = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(viaFile == direct, s"file $viaFile vs trained $direct")
    // a malformed line fails loudly, never a silent partial table
    val bad = java.nio.file.Files.createTempFile("merges_bad", ".txt")
    java.nio.file.Files.write(bad, "a b\nc\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergesFromFile(spark, bad.toString)
    }
  }

  test("noveltyRateIncremental: id-ordered batches reproduce the full-corpus novelty") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 30L).map(i =>
      (i, s"w${i % 6} w${(i + 1) % 6} w${(i + 2) % 6} w${i % 4} w${i % 9}"))
      .toDF("doc_id", "text")
    val full = TextAnalysis.noveltyRate(docs, col("text"), col("doc_id"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val b1 = docs.filter(col("doc_id") <= 15)
    val b2 = docs.filter(col("doc_id") > 15)
    val seen = b1.select(explode(array_distinct(
      graft.functions.HashFunctions.shingleHash48(col("text"), 3))).as("sh"))
      .distinct()
    val inc1 = TextAnalysis.noveltyRate(b1, col("text"), col("doc_id"), n = 3)
    val inc2 = TextAnalysis.noveltyRateIncremental(b2, col("text"),
      col("doc_id"), n = 3, seen)
    val stitched = inc1.union(inc2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(stitched == full,
      s"incremental batches diverged from the full corpus:\n$stitched\nvs\n$full")
  }

  test("qualityLogit: repetition and word-length deviation push toward drop") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox jumped over a lazy dog while the tall " +
        "man walked near a quiet river and the old woman read a small " +
        "book under the green tree as the young child played with a " +
        "red ball beside the warm fire"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "pneumonoultramicroscopic silicovolcanoconiosis electrophotomicrographically")
    ).toDF("doc_id", "text")
    val (margin, label) = TextAnalysis.qualityLogit(col("text"))
    val got = docs.select(col("doc_id"), margin.as("m"), label.as("l"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._2 == "keep" && got(1L)._1 >= 0, s"prose row: ${got(1L)}")
    assert(got(2L)._2 == "drop", s"pure repetition must drop: ${got(2L)}")
    assert(got(3L)._2 == "drop", s"extreme word length must drop: ${got(3L)}")
    // decision is exactly margin >= 0 (integer boundary, no float gap)
    got.values.foreach { case (m, l) =>
      assert((m >= 0) == (l == "keep"))
    }
  }

  test("zipfFit: an exact 1/r frequency law fits slope −1, r = −1") {
    // freqs 12, 6, 4, 3 = 12/r for r = 1..4; terms named so frequency
    // rank and lexicographic tie-break agree
    val freqs = Seq("ta" -> 12, "tb" -> 6, "tc" -> 4, "td" -> 3)
    val docs = freqs.zipWithIndex.map { case ((term, f), i) =>
      (i.toLong, Seq.fill(f)(term).mkString(" "))
    }.toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(docs, col("text"), topK = 10)
      .collect().head
    assert(row.getAs[Long]("n") == 4)
    assert(row.getAs[Double]("slope") == -1.0, row.toString)
    // intercept = ln 12 in MICRO-nats (the fit's coordinate unit;
    // slope and r are unit-free ratios), i.e. the Zipf constant
    assert(math.abs(row.getAs[Double]("intercept") / 1e6 - math.log(12.0))
      < 1e-3, row.toString)
    assert(row.getAs[Double]("r") == -1.0, row.toString)
  }

  test("zipfFit: topK caps the fitted vocabulary") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    assert(TextAnalysis.zipfFit(docs, col("text"), topK = 2)
      .collect().head.getAs[Long]("n") == 2)
  }

  test("perplexityBuckets: buckets partition the scored corpus; head beats tail") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.load(spark, d, "documents")
    val out = TextAnalysis.perplexityBuckets(docs, col("text"),
      col("doc_id"), col("source")).collect()
    val scored = TextAnalysis.unigramCrossEntropy(docs, col("text"),
      col("doc_id")).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == scored,
      "every scored doc lands in exactly one bucket")
    // corpus-wide head mean must be strictly below the tail mean
    def weighted(b: String): Double = {
      val rows = out.filter(_.getAs[String]("bucket") == b)
      val n = rows.map(_.getAs[Long]("n_docs")).sum
      assert(n > 0, s"bucket $b is empty at sf0.001")
      rows.map(r => r.getAs[Long]("mean_bits_micro").toDouble *
        r.getAs[Long]("n_docs")).sum / n
    }
    assert(weighted("head") < weighted("tail"),
      "cross-entropy must increase head → tail")
  }

  test("wordpieceFertility: fertility ≥ 1 and sums reconcile with the corpus") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.load(spark, d, "documents")
    val out = TextAnalysis.wordpieceFertility(docs, col("text"),
      col("doc_id"), col("source")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // a subword encode never produces fewer pieces than words
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"), r.toString)
      assert(r.getAs[Long]("fertility_micro") >= 1000000L, r.toString)
      assert(r.getAs[Long]("fertility_micro") ==
        r.getAs[Long]("n_pieces") * 1000000L / r.getAs[Long]("n_words"),
        "ratio must be the exact floor division of the sums")
    }
    // per-source doc counts partition the corpus
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("mooreLewisScore: target-like docs keep, out-of-domain docs drop") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", "tgt"),
      (2L, "alpha beta beta alpha", "tgt"),
      (3L, "gamma delta gamma delta", "web"),
      (4L, "alpha beta alpha beta", "web"), // target-shaped web doc
      (5L, "gamma delta delta gamma", "web")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.mooreLewisScore(docs, col("text"),
        col("doc_id"), col("source") === "tgt")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("label"), r.getAs[Long]("ml_sum_micro")))).toMap
    // the point of the method: a web doc written in target vocabulary
    // is kept even though its source label says otherwise
    assert(out(4L)._1 == "keep", out.toString)
    assert(out(1L)._1 == "keep" && out(2L)._1 == "keep", out.toString)
    assert(out(3L)._1 == "drop" && out(5L)._1 == "drop", out.toString)
    // decision is exactly sign(integer sum) — no float boundary
    out.values.foreach { case (l, s) => assert((s < 0) == (l == "keep")) }
  }

  test("featureHash: buckets partition the token mass; signs are per-term stable") {
    val docs = Seq((1L, "a b a c"), (2L, "a a a a")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, col("text"), col("doc_id"),
      k = 8).collect()
    out.foreach { r =>
      val dim = r.getAs[Long]("dim")
      assert(dim >= 0 && dim < 8, r.toString)
      // signed value can never exceed the unsigned count, same parity
      assert(math.abs(r.getAs[Long]("sval")) <= r.getAs[Long]("cnt"))
      assert((r.getAs[Long]("sval") - r.getAs[Long]("cnt")) % 2 == 0)
    }
    // bucket counts reconstruct each doc's token count exactly
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    assert(byDoc == Map(1L -> 4L, 2L -> 4L), byDoc.toString)
    // doc 2 is one term ×4: exactly one bucket, |sval| = cnt = 4
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && math.abs(d2.head.getAs[Long]("sval")) == 4L)
  }

  test("new text operators degrade gracefully on empty / null-text input") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val nulls = Seq((1L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    for (docs <- Seq(empty, nulls)) {
      // no scoreable tokens anywhere → empty outputs, never a throw
      assert(TextAnalysis.perplexityBuckets(docs, col("text"),
        col("doc_id"), col("source")).count() == 0)
      assert(TextAnalysis.mooreLewisScore(docs, col("text"),
        col("doc_id"), col("source") === "s").count() == 0)
      assert(TextAnalysis.wordpieceFertility(docs, col("text"),
        col("doc_id"), col("source")).count() == 0)
      assert(TextAnalysis.featureHash(docs, col("text"),
        col("doc_id")).count() == 0)
      // zipfFit emits its single closed-form row with n = 0 (NaN fit)
      val z = TextAnalysis.zipfFit(docs, col("text")).collect()
      assert(z.length == 1 && z.head.getAs[Long]("n") == 0L)
      // null text scores NULL — least() would otherwise collapse both
      // credits to their caps (10000) while every oracle null-propagates
      if (docs.count() > 0) {
        val qb = docs.select(TextAnalysis.qualityBps(col("text")))
          .collect().head
        assert(qb.isNullAt(0), s"qualityBps(null) must be NULL, got $qb")
      }
      // session-3 operators: same empty-output-never-throw contract
      assert(TextAnalysis.bigramCrossEntropy(docs, col("text"),
        col("doc_id")).count() == 0)
      assert(TextAnalysis.sourceOverlap(docs, col("text"),
        col("source")).count() == 0)
      assert(TextAnalysis.dsirWeights(docs, col("text"), col("doc_id"),
        col("source") === "s").count() == 0)
      assert(Sampling.cdcChunks(docs, col("doc_id"), col("text"),
        b = 8).count() == 0)
      assert(Sampling.interleaveOrder(docs, col("doc_id"),
        col("source")).count() == docs.count())
    }
  }

  test("lrTrain: gradient steps separate a linearly separable corpus") {
    val docs = ((1 to 10).map(i =>
        (i.toLong, "good clean quality prose here", true)) ++
      (11 to 20).map(i =>
        (i.toLong, "bad noisy spam junk here", false)))
      .toDF("doc_id", "text", "y")
    val w = TextAnalysis.lrTrain(docs, col("text"), col("doc_id"),
      col("y"), k = 64, steps = 3)
    // weights moved off the zero init
    assert(w.filter(col("w_micro") =!= 0L).count() > 0)
    // re-score the corpus with the trained integer weights: every
    // positive doc's margin must exceed every negative doc's
    val feats = TextAnalysis.featureHash(docs, col("text"), col("doc_id"))
      .select(col("doc_id"), col("dim"), col("cnt"))
      .unionAll(docs.select(col("doc_id"), lit(64L).as("dim"),
        lit(1L).as("cnt")))
    val m = feats.join(w, Seq("dim"))
      .groupBy("doc_id").agg(sum(col("cnt") * col("w_micro")).as("m"))
      .as[(Long, Long)].collect().toMap
    val pos = (1 to 10).map(i => m(i.toLong))
    val neg = (11 to 20).map(i => m(i.toLong))
    assert(pos.min > neg.max,
      s"trained margins must separate: pos=$pos neg=$neg")
  }

  test("lrTrain: an EMPTY corpus trains the zero weight vector instead " +
      "of dividing by the zero doc count") {
    // at production scale an empty fold input is routine (a date
    // partition with no rows); every gradient is vacuously 0 and the
    // step must be a no-op, not an ANSI divide-by-zero
    val docs = Seq.empty[(Long, String, Boolean)]
      .toDF("doc_id", "text", "y")
    val w = TextAnalysis.lrTrain(docs, col("text"), col("doc_id"),
      col("y"), k = 64, steps = 3)
      .as[(Long, Long)].collect()
    assert(w.length == 65 && w.forall(_._2 == 0L),
      "zero-doc training must return the 65-dim zero init")
  }

  test("dataCard: shares reconcile; dominant lang elected with tie-break") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "A", "en"),   // 6 tok
      (2L, "the dog sat", "A", "en"),               // 3 tok
      (3L, "le chat", "A", "fr"),                   // 2 tok
      (4L, "ein hund und eine katze hier", "B", "de") // 6 tok
    ).toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.dataCard(docs, col("text"), col("source"),
        col("lang"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("tok_share_bps"), r.getAs[String]("top_lang"),
          r.getAs[Long]("top_lang_bps"))).toMap
    val a = out("A"); val b = out("B")
    assert(a._1 == 3L && a._2 == 11L && b._1 == 1L && b._2 == 6L)
    // shares over the 17-token corpus, floored bps
    assert(a._3 == 11L * 10000 / 17 && b._3 == 6L * 10000 / 17)
    // dominant lang: en 2 of 3 docs in A; de 1 of 1 in B
    assert(a._4 == "en" && a._5 == 6666L)
    assert(b._4 == "de" && b._5 == 10000L)
  }

  test("dataCard: mean quality divides by SCORED docs, not all docs") {
    // null-text docs produce NULL quality (sum skips them); the mean
    // must divide by the scored count or it deflates — and an
    // all-null-text source reports NULL, not a fake zero
    val docs = Seq(
      (1L, "the cat sat on the mat today", "A", "en"),
      (2L, null.asInstanceOf[String], "A", "en"),
      (3L, null.asInstanceOf[String], "B", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val scoredOnly = TextAnalysis.dataCard(
        docs.filter(col("doc_id") === 1L), col("text"), col("source"),
        col("lang"))
      .collect().head.getAs[Long]("mean_quality_bps")
    val rows = TextAnalysis.dataCard(docs, col("text"), col("source"),
        col("lang"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // source A: 1 scored + 1 null-text doc -> same mean as scored-only
    assert(rows("A").getAs[Long]("mean_quality_bps") == scoredOnly)
    assert(rows("A").getAs[Long]("n_docs") == 2L)
    // source B: zero scored docs -> NULL mean, not 0
    assert(rows("B").isNullAt(rows("B").fieldIndex("mean_quality_bps")))
  }

  test("blocklistFilter: exact density bps; keep decision at the threshold") {
    val docs = Seq(
      (1L, "clean words only here"),            // 0 bps -> keep
      (2L, "one bad word here in twenty " +
        "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"), // 1/20 = 500 bps -> keep (boundary)
      (3L, "spam spam spam ok")                 // 7500 bps -> drop
    ).toDF("doc_id", "text")
    val bl = Seq("spam", "bad").toDF("term")
    val out = TextAnalysis.blocklistFilter(docs, col("text"), col("doc_id"),
        bl, maxBps = 500L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_bad"),
          r.getAs[Long]("bad_bps"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == ((4L, 0L, 0L, true)), out)
    assert(out(2L) == ((20L, 1L, 500L, true)), out) // boundary is inclusive
    assert(out(3L) == ((4L, 3L, 7500L, false)), out)
    // a duplicated blocklist entry must not fan out the join and
    // inflate counts (list hygiene is not the caller's problem)
    val dup = Seq("spam", "bad", "spam").toDF("term")
    val out2 = TextAnalysis.blocklistFilter(docs, col("text"),
        col("doc_id"), dup, maxBps = 500L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_bad"),
          r.getAs[Long]("bad_bps"), r.getAs[Boolean]("keep"))).toMap
    assert(out2 == out, s"duplicate blocklist entries changed counts: $out2")
  }

  test("blocklistPhrases: any phrase hit drops; single words alone never match") {
    val docs = Seq(
      (1L, "a perfectly clean document here"),
      (2L, "one bad phrase appears right here"),      // "bad phrase" hits
      (3L, "bad things and another phrase apart"),    // words apart: no hit
      (4L, "bad phrase bad phrase twice"),            // two hits
      (5L, "solo")                                    // <2 tokens: omitted
    ).toDF("doc_id", "text")
    val pl = Seq("bad phrase", "bad phrase").toDF("phrase") // dup-proof
    val out = TextAnalysis.blocklistPhrases(docs, col("text"),
        col("doc_id"), pl)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == ((0L, true)) && out(3L) == ((0L, true)), out)
    assert(out(2L) == ((1L, false)) && out(4L) == ((2L, false)), out)
    assert(!out.contains(5L) && out.size == 4)
  }

  test("dsirWeights: target-like docs weigh positive, off-target negative") {
    // target slice speaks in "the cat sat" bigrams; the off-target
    // mass is "buy pills now" spam. Doc 5 echoes the target, doc 6
    // echoes the spam, doc 7 is too short to have a bigram.
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the cat sat by the door", true),
      (3L, "buy pills now cheap pills now", false),
      (4L, "buy pills now best price now", false),
      (5L, "the cat sat quietly", false),
      (6L, "buy pills now", false),
      (7L, "hello", false)
    ).toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirWeights(docs, col("text"), col("doc_id"),
        col("tgt"), k = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feat"), r.getAs[Long]("dsir_micro"))).toMap
    // DSIR weights are a RANKING signal (tiny-sample smoothing shifts
    // the absolute zero): every target-echoing doc must out-rank every
    // spam doc on per-feature weight
    def perFeat(id: Long): Double = out(id)._2.toDouble / out(id)._1
    val targetLike = Seq(1L, 2L, 5L).map(perFeat)
    val spamLike = Seq(3L, 4L, 6L).map(perFeat)
    assert(targetLike.min > spamLike.max,
      s"target docs should out-rank spam docs per feature: $out")
    // n_feat = bigram occurrences = n_tok - 1
    assert(out(1L)._1 == 5L && out(6L)._1 == 2L)
    // sub-2-token doc omitted
    assert(!out.contains(7L))
  }

  test("sourceOverlap: asymmetric bps; zero-overlap pairs omitted") {
    val docs = Seq(
      (1L, "a b c d e", "A"), // shingles: "a b c","b c d","c d e"
      (2L, "a b c", "B"),     // 1 shingle, shared with A
      (3L, "z z z z", "C")    // 1 distinct shingle, shared with no one
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlap(docs, col("text"), col("source"))
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("overlap_bps"))).toMap
    // asymmetric: 1 of A's 3 shingles is in B; B's single shingle is in A
    assert(out(("A", "B")) == ((3L, 1L, 3333L)), out)
    assert(out(("B", "A")) == ((1L, 1L, 10000L)), out)
    // C overlaps nothing -> no C rows at all
    assert(out.size == 2 && !out.keySet.exists(k => k._1 == "C" || k._2 == "C"))
  }

  test("bigramCrossEntropy: word salad invisible to the unigram scores worse here") {
    // docs 1-3 are identical prose; doc 4 is a SCRAMBLE of the same
    // token multiset (identical unigram distribution by construction);
    // doc 5 has one token -> no transitions -> omitted by contract
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the"),
      (5L, "the")
    ).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramCrossEntropy(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // the unigram CANNOT tell the scramble from the prose
    assert(uni(4L) == uni(1L), s"unigram should be order-blind: $uni")
    val big = TextAnalysis.bigramCrossEntropy(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_big"), r.getAs[Long]("bits_micro"))).toMap
    // the bigram LM does: scrambled transitions are corpus-rare
    assert(big(4L)._2 > big(1L)._2,
      s"scramble should score more bits than prose: $big")
    // n_big = n_tok - 1 transitions; identical docs score identically
    assert(big(1L)._1 == 5L && big(4L)._1 == 5L)
    assert(big(1L) == big(2L) && big(2L) == big(3L))
    // sub-2-token doc omitted
    assert(!big.contains(5L) && big.size == 4)
  }

  test("tokenEntropy: uniform doc hits log2(n) exactly, constant doc " +
      "hits zero, mixed doc matches the hand-computed µ-bit value") {
    val docs = Seq(
      (1L, "a b c d"), // uniform over 4 -> exactly 2.0 bits
      (2L, "a a a a"), // single token -> 0.0
      (3L, "a a b"), // 2/3·0.585 + 1/3·1.585 = 0.9183
      (4L, null.asInstanceOf[String]), // omitted (no term rows)
      (5L, "") // one empty token -> 0.0, n_tok = 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (4L, 2.0))
    assert(got(2L) == (4L, 0.0))
    // hand replay of the µ-bit pipeline for "a a b":
    // w(a) = 2·round(-log2(2/3)·1e6) = 2·584963; w(b) = round(-log2(1/3)·1e6)
    val wsum = 2L * math.round(-math.log(2.0 / 3) / math.log(2.0) * 1e6) +
      math.round(-math.log(1.0 / 3) / math.log(2.0) * 1e6)
    val want = BigDecimal(wsum.toDouble / (3 * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == (3L, want) && want == 0.9183)
    assert(!got.contains(4L), "null text must be omitted, not scored")
    assert(got(5L) == (1L, 0.0))
    // low entropy at equal length separates stuffing from prose —
    // the signal the corpus-LM scorers can't see
    assert(got(2L)._2 < got(1L)._2)
  }

  test("htmlExtract: script/style payloads and nav/footer chrome are " +
      "dropped, tags stripped, entities decoded in lexical order, " +
      "whitespace collapsed") {
    val page = "<html><head><style>body{margin:0}</style>" +
      "<script>var secret=1;</script></head><body>" +
      "<nav><a href=/>Home</a> | <a href=/about>About</a></nav>" +
      "<h1>Title</h1><p>alpha &amp; beta</p>\n<p>x &amp;lt; y</p>" +
      "<div id=footer>Copyright chrome</div></body></html>"
    val got = Seq(page, null).toDF("page")
      .select(TextAnalysis.htmlExtract(col("page")).as("t"))
      .as[String].collect()
    // &amp;lt; decodes to the LITERAL &lt; (order contract), not <
    assert(got(0) == "Title alpha & beta x &lt; y")
    assert(got(1) == null, "NULL html must stay NULL, not empty")
    assert(!got(0).contains("secret") && !got(0).contains("Home") &&
      !got(0).contains("Copyright") && !got(0).contains("margin"))
  }

  test("sentenceSplit keeps raw indexes; terminator stays on the last " +
      "sentence; NULL text explodes to zero rows") {
    val docs = Seq((1L, "One two. Three! Four? Five."),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.sentenceSplit(col("text")))
          .as(Seq("i", "s")))
      .filter(length(col("s")) > 0)
      .as[(Long, Int, String)].collect().toSeq
    assert(rows == Seq((1L, 0, "One two"), (1L, 1, "Three"),
      (1L, 2, "Four"), (1L, 3, "Five.")))
  }
}
