package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-assembly operators: determinism and packing invariants the
  * DuckDB oracle can't phrase (idempotence, subset stability, offset
  * bounds).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0 until n)
    .map(i => (i.toLong, if (i % 3 == 0) "en" else "de",
      Seq.fill(i % 7 + 1)("w").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  test("hashSample is deterministic, idempotent, and monotone in the rate") {
    val d = docs(400)
    val r40 = Sampling.hashSample(d, col("doc_id"), col("lang"), Map("en" -> 0.4))
    val r40b = Sampling.hashSample(d, col("doc_id"), col("lang"), Map("en" -> 0.4))
    val ids = r40.select("doc_id").as[Long].collect().toSet
    assert(ids == r40b.select("doc_id").as[Long].collect().toSet) // deterministic
    // sampling the sample at the same rate keeps everything (idempotent)
    assert(Sampling.hashSample(r40, col("doc_id"), col("lang"), Map("en" -> 0.4))
      .count() == ids.size)
    // a higher rate keeps a superset: previously-kept rows never drop
    val r80 = Sampling.hashSample(d, col("doc_id"), col("lang"), Map("en" -> 0.8))
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(r80))
    // unlisted strata follow the default rate (1.0 keeps all de rows)
    val de = d.filter(col("lang") === "de").count()
    assert(r40.filter(col("lang") === "de").count() == de)
    // rate 0 / rate 1 boundaries are exact
    assert(Sampling.hashSample(d, col("doc_id"), col("lang"),
      Map.empty, defaultRate = 0.0).count() == 0)
    assert(Sampling.hashSample(d, col("doc_id"), col("lang"),
      Map.empty, defaultRate = 1.0).count() == 400)
  }

  test("packSequences: offsets in range, packs contiguous per shard, tokens conserved") {
    val L = 16
    val out = Sampling.packSequences(docs(200), col("doc_id"), col("text"),
      contextLen = L, shards = 4)
      .select("doc_id", "shard", "n_tok", "pack_id", "pack_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall { case (_, _, _, p, o) => p >= 0 && o >= 0 && o < L })
    // within a shard, pack ids are non-decreasing in doc order and the
    // (pack, offset) position equals the running token count mod/div L
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, p, o) =>
        assert(p == cum / L && o == cum % L)
        cum += n
      }
    }
    // total tokens conserved across packing
    val toks = out.map(_._3).sum
    assert(toks == docs(200).select(sum(size(split(col("text"), " "))))
      .as[Long].head())
  }

  test("survivors: unique docs kept with null cluster, only min-id per cluster survives") {
    val d = docs(10)
    val clusters = Seq((3L, 1L), (1L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val kept = Dedup.survivors(d, col("doc_id"), clusters)
      .select("doc_id").as[Long].collect().toSet
    // 3 and 9 are non-survivor cluster members; everyone else stays
    assert(kept == Set(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L))
  }

  test("chunkTokens: stride-spaced starts, clipped last window, digests match slices") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Sampling.chunkTokens(
      Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), win = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "start_tok", "n_tok")
      .as[(Long, Long, Long)].collect().toSeq
    // starts 0,3,6,9; the last window clips to the single trailing token
    assert(out == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    // overlap: stride < win covers every token at least once
    val covered = out.flatMap { case (_, s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("chunkTokens with stride > win samples gapped windows (legal, not overlapping)") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Sampling.chunkTokens(
      Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), win = 2, stride = 4)
      .orderBy("chunk_id")
      .select("chunk_id", "start_tok", "n_tok")
      .as[(Long, Long, Long)].collect().toSeq
    // starts 0,4,8: two-token samples with two-token gaps
    assert(out == Seq((0L, 0L, 2L), (1L, 4L, 2L), (2L, 8L, 2L)))
  }

  test("quantizeInt8: max maps to 127, floor-rounding, zero vector safe") {
    val out = Similarity.quantizeInt8(
      Seq((1L, Seq(1.0f, -0.5f, 0.25f)), (2L, Seq(0.0f, 0.0f)))
        .toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"))
      .select(col("vec_id"), col("scale"), col("q"))
      .as[(Long, Double, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 127.0)
    // floor(x*127 + 0.5): 127, floor(-63.0)= -63, floor(32.25) = 32
    assert(out(1L)._2 == Seq(127L, -63L, 32L))
    assert(out(2L) == ((0.0, Seq(0L, 0L))))
  }

  test("tokenBudgetMix: uncapped source passes whole, capped downsamples, cap is monotone") {
    val docs = (1L to 40L).map { i =>
      (i, if (i <= 30) "big" else "small", Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // big: 300 tokens → rate 3333 bps at cap 100; small: 100 tokens → 10000
    val kept = Sampling.tokenBudgetMix(docs, col("doc_id"), col("text"),
      col("source"), capTokens = 100L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val (big, small) = kept.partition(_._2 == "big")
    assert(small.length == 10, "source under the cap must keep every doc")
    assert(big.length < 30, "source over the cap must downsample")
    // raising the cap only ever ADDS docs (incremental-refresh contract)
    val kept2 = Sampling.tokenBudgetMix(docs, col("doc_id"), col("text"),
      col("source"), capTokens = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet.subsetOf(kept2))
  }

  test("tokenBudgetMixCounted over precomputed counts equals the text form") {
    val docs = (1L to 40L).map { i =>
      (i, if (i <= 30) "big" else "small", Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val fromText = Sampling.tokenBudgetMix(docs, col("doc_id"), col("text"),
      col("source"), capTokens = 100L)
      .select("doc_id", "source", "n_tok")
      .as[(Long, String, Long)].collect().toSet
    // the caller's earlier stage already materialized n_tok
    val counted = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val fromCounts = Sampling.tokenBudgetMixCounted(counted, col("doc_id"),
      col("source"), col("n_tok"), capTokens = 100L)
      .select("doc_id", "source", "n_tok")
      .as[(Long, String, Long)].collect().toSet
    assert(fromText == fromCounts)
  }

  test("prioritySampleByGroup: exactly k per group, fractional weights kept") {
    val d = (1L to 30L)
      .map(i => (i, if (i <= 20) "a" else "b", if (i % 2 == 0) 0.5 else 2.0))
      .toDF("key", "grp", "weight")
    val out = Sampling.prioritySampleByGroup(d, col("key"), col("weight"),
        col("grp"), k = 4)
      .select("grp", "key", "weight").as[(String, Long, Double)].collect()
    assert(out.count(_._1 == "a") == 4 && out.count(_._1 == "b") == 4)
    assert(out.forall(r => r._3 == 0.5 || r._3 == 2.0)) // no truncation
    // a group smaller than k returns whole
    val tiny = Sampling.prioritySampleByGroup(
      d.filter(col("key") <= 2), col("key"), col("weight"), col("grp"), k = 4)
    assert(tiny.count() == 2)
    // matches the global sampler run per group (same priority, same k)
    val globalA = Sampling.prioritySample(
        d.filter(col("grp") === "a").select(col("key"), col("weight")),
        col("key"), col("weight"), k = 4)
      .select("key").as[Long].collect().toSet
    assert(out.filter(_._1 == "a").map(_._2).toSet == globalA)
  }

  test("prioritySample keeps fractional weights and returns exactly k") {
    // weights in (0,1) must NOT truncate to zero and vanish: with nine
    // 0.5-weight rows and one zero-weight row, k=5 must come from the
    // nine, and every returned weight survives un-truncated
    val d = (1L to 10L)
      .map(i => (i, if (i == 10) 0.0 else 0.5))
      .toDF("doc_id", "w")
    val picked = Sampling.prioritySample(
        d.select(col("doc_id").as("key"), col("w").as("weight")),
        col("key"), col("weight"), k = 5)
      .select("key", "weight").as[(Long, Double)].collect()
    assert(picked.length == 5)
    assert(picked.forall(_._2 == 0.5))
    // doubling every weight halves every priority uniformly — the same
    // rows are picked (scale-invariance of the bottom-k)
    val doubled = Sampling.prioritySample(
        d.select(col("doc_id").as("key"), (col("w") * 2).as("weight")),
        col("key"), col("weight"), k = 5)
      .select("key").as[Long].collect().toSet
    assert(picked.map(_._1).toSet == doubled)
  }

  test("temperatureMix: sqrt allocation sits between proportional and uniform") {
    // big: 90% of tokens, small: 10% — α=½ shares are √.9 and √.1
    // normalized ≈ 75% / 25%: the big source is downweighted vs its
    // raw share, the small source upweighted (the point of tempering)
    val docs = ((1L to 90L).map(i => (i, "big")) ++
      (91L to 100L).map(i => (i, "small"))).map { case (i, s) =>
      (i, s, Seq.fill(100)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // budget 5000 of 10000 total tokens: targets ≈ 3750 / 1250
    // → rates ≈ 4166 bps (big, 9000 tok) / 10000 capped (small, 1000)
    val kept = Sampling.temperatureMix(docs, col("doc_id"), col("text"),
      col("source"), budgetTokens = 5000L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val (big, small) = kept.partition(_._2 == "big")
    assert(small.length == 10,
      "small source's tempered target exceeds its size: passes whole")
    assert(big.length < 90, "big source must downsample")
    // raising the budget only ever ADDS docs (incremental-refresh
    // contract: rates are monotone in the budget, hashes are fixed)
    val kept2 = Sampling.temperatureMix(docs, col("doc_id"), col("text"),
      col("source"), budgetTokens = 8000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet.subsetOf(kept2))
  }

  test("trainValTestSplit: total partition, growth-stable, near-declared fractions") {
    val d = docs(1000)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.trainValTestSplit(d, col("doc_id"), splits)
    val byId = assigned.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(byId.size == 1000)                       // every row assigned once
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // hash-band proportions land near the declared fractions
    assert(math.abs(counts("train") - 800) < 60, counts)
    assert(math.abs(counts("val") - 100) < 40, counts)
    // growth stability: assignments on a half-corpus agree exactly with
    // the full corpus (the leakage-safety property)
    val half = Sampling.trainValTestSplit(docs(500), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect()
    half.foreach { case (id, s) => assert(byId(id) == s, s"doc $id moved") }
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.trainValTestSplit(d, col("doc_id"), Seq("a" -> 0.5))
    }
  }

  test("lengthBucket: smallest power of two >= n, floored at 1") {
    val got = Seq(1L, 2L, 3L, 4L, 5L, 63L, 64L, 65L, 1000L)
      .toDF("n").select(Sampling.lengthBucket(col("n")).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 4L, 4L, 8L, 64L, 64L, 128L, 1024L))
    // exact powers of two waste zero padding; bucket always >= n
    Seq(1L, 7L, 64L, 100L).foreach { n =>
      val b = Seq(n).toDF("n")
        .select(Sampling.lengthBucket(col("n")).as("b")).as[Long].head()
      assert(b >= n && b < 2 * n)
    }
  }

  test("leakageSafeSplit: cluster members never straddle splits; singletons keep trainValTestSplit fate") {
    // clusters {1,2,3} and {10,11}; 20 and 21 are singletons
    val docs = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L)).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val out = Sampling.leakageSafeSplit(docs, col("doc_id"), clusters, splits)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 7)
    // no-straddle: every cluster member shares key AND split
    assert(Set(out(1L), out(2L), out(3L)).size == 1, out)
    assert(Set(out(10L), out(11L)).size == 1, out)
    // singleton fate identical to the plain per-doc split (same hash key)
    val plain = Sampling.trainValTestSplit(
        Seq(20L, 21L).toDF("doc_id"), col("doc_id"), splits)
      .as[(Long, String)].collect().toMap
    assert(out(20L)._2 == plain(20L) && out(21L)._2 == plain(21L))
  }

  test("tokenBudgetCut: best-quality-first fill; overshoot bounded; under-budget keeps all") {
    // quality rises with doc structure: long prose with stopwords
    // scores high, short fragments low
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog sat by the door again"),
      (2L, "the quick brown fox jumps over the lazy dog near the gate"),
      (3L, "ab cd"),
      (4L, "xy zw qq")
    ).toDF("doc_id", "text")
    val q = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.qualityBps(col("text")).as("qb"),
      size(split(col("text"), " ")).cast("long").as("nt"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val cut = Sampling.tokenBudgetCut(docs, col("text"), col("doc_id"), 13L)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    // every kept doc's quality >= every dropped doc's quality
    val (kept, dropped) = q.partition { case (id, _) => cut(id) }
    assert(kept.nonEmpty && dropped.nonEmpty)
    assert(kept.values.map(_._1).min >= dropped.values.map(_._1).max)
    // budget reached: kept tokens >= 13; overshoot <= one quality bucket
    val keptTok = kept.values.map(_._2).sum
    assert(keptTok >= 13L, s"budget not reached: $keptTok")
    // under-budget corpus keeps everything
    val all = Sampling.tokenBudgetCut(docs, col("text"), col("doc_id"),
      1000000L).count()
    assert(all == 4L)
    // null-text docs are excluded up front, never scored or budgeted
    val withNull = docs.unionAll(
      Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val ids = Sampling.tokenBudgetCut(withNull, col("text"),
      col("doc_id"), 1000000L).as[(Long, Long, Long)].collect().map(_._1)
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L, 4L), ids.toSeq)
  }

  test("negativeSamples: one draw per position; draws follow the tempered mass") {
    // vocabulary of two words with 16:1 counts -> 8:1 tempered mass
    // (160^0.75 / 10^0.75 = 16^0.75 = 8)
    val docs = (1 to 17).map(i =>
        (i.toLong, (if (i <= 16) Seq.fill(10)("aa") else Seq.fill(10)("zz"))
          .mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.negativeSamples(docs, col("doc_id"), col("text"))
      .collect().map(r => ((r.getAs[Long]("doc_id"), r.getAs[Long]("pos")),
        r.getAs[String]("neg_term")))
    // exactly one negative per token position
    assert(out.length == 170 && out.map(_._1).distinct.length == 170)
    val byNeg = out.groupBy(_._2).view.mapValues(_.size).toMap
    // expected ~8:1 'aa' to 'zz'; allow wide hash noise but the
    // ordering and a 3x margin must hold
    assert(byNeg("aa") > 3 * byNeg.getOrElse("zz", 0), byNeg.toString)
    assert(byNeg.values.sum == 170)
  }

  test("fimTransform: PSM pieces reconstruct the original in PMS order (property)") {
    val docs = (1 to 25).map(i =>
        (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val orig = docs.as[(Long, String)].collect().toMap
    val out = Sampling.fimTransform(docs, col("doc_id"), col("text"))
      .collect()
    assert(out.length == 25)
    out.foreach { r =>
      val (id, n, lo, hi) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      val fim = r.getAs[String]("fim")
      // parse "<PRE> p <SUF> s <MID> m" and reassemble p + m + s
      val pre = fim.substring("<PRE> ".length, fim.indexOf(" <SUF> "))
      val suf = fim.substring(fim.indexOf(" <SUF> ") + " <SUF> ".length,
        fim.indexOf(" <MID> "))
      val mid = fim.substring(fim.indexOf(" <MID> ") + " <MID> ".length)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == orig(id), s"doc $id failed round-trip: $fim")
      // segment token counts = lo / hi-lo / n-hi
      def count(s: String) = if (s.isEmpty) 0L else s.split(" ").length.toLong
      assert(count(pre) == lo && count(mid) == hi - lo &&
        count(suf) == n - hi, s"doc $id segment lengths")
    }
    // cuts vary across docs (content-hash, not a fixed split)
    assert(out.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .distinct.length > 5)
  }

  test("spanCorrupt: corrupted + target reconstruct the original (property)") {
    val docs = (1 to 30).map(i =>
        (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val orig = docs.as[(Long, String)].collect().toMap
    val out = Sampling.spanCorrupt(docs, col("doc_id"), col("text"),
        rate = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_masked"),
        r.getAs[String]("corrupted"), r.getAs[String]("target")))
    assert(out.length == 30 && out.exists(_._2 > 0))
    val sentinel = "<X\\d+>".r
    out.foreach { case (id, nMasked, corrupted, target) =>
      // parse target into run -> tokens
      val runs = scala.collection.mutable.Map.empty[String, Seq[String]]
      var cur: String = null
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (sentinel.matches(t)) { cur = t; runs(cur) = Seq.empty }
        else runs(cur) = runs(cur) :+ t
      }
      // splice each sentinel's tokens back into the corrupted stream
      val rebuilt = corrupted.split(" ").flatMap { t =>
        if (sentinel.matches(t)) runs(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id failed round-trip")
      // n_masked = target tokens minus sentinels
      assert(nMasked == runs.values.map(_.size).sum, s"doc $id count")
      // an unseeded doc passes through verbatim with an empty target
      if (nMasked == 0) assert(corrupted == orig(id) && target.isEmpty)
    }
  }

  test("cdcChunks: an insertion disturbs only local chunks; fixed grid shifts everything") {
    val base = (0 until 60).map(i => s"w$i")
    val edited = (base.take(10) :+ "zzz") ++ base.drop(10)
    val docs = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    def digests(df: org.apache.spark.sql.DataFrame, id: Long): Set[String] =
      df.filter(col("doc_id") === id).select("chunk_md5")
        .as[String].collect().toSet
    val cdc = Sampling.cdcChunks(docs, col("doc_id"), col("text"), b = 4)
    val (ca, cb) = (digests(cdc, 1L), digests(cdc, 2L))
    // CDC: only the chunk(s) touching the insertion differ — the one
    // split chunk can become at most two, everything else re-aligns
    assert((ca diff cb).size <= 1 && (cb diff ca).size <= 2,
      s"CDC should localize the edit: ${ca diff cb} / ${cb diff ca}")
    assert((ca intersect cb).size >= ca.size - 1)
    // same edit under the fixed grid shifts every window at/after it
    val grid = Sampling.chunkTokens(docs, col("doc_id"), col("text"),
      win = 4, stride = 4)
    val (ga, gb) = (digests(grid, 1L), digests(grid, 2L))
    assert((ga intersect gb).size < (ca intersect cb).size,
      s"fixed grid should share fewer chunks: grid=${(ga intersect gb).size} " +
        s"cdc=${(ca intersect cb).size}")
    // chunks tile the doc: token counts sum to the doc length
    val n = cdc.filter(col("doc_id") === 1L)
      .agg(sum("n_tok")).as[Long].head()
    assert(n == 60L)
  }

  test("interleaveOrder: slot order round-robins sources and keeps per-source order") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (10L, "b"), (11L, "b"),
      (20L, "c"), (21L, "c"), (22L, "c")
    ).toDF("doc_id", "source")
    val out = Sampling.interleaveOrder(docs, col("doc_id"), col("source"))
      .orderBy("slot").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("slot")))
    assert(out.length == 9)
    // slots unique and monotone in read order
    assert(out.map(_._3).distinct.length == 9)
    // while every source still has docs, consecutive slots alternate:
    // first 6 reads touch each source twice, never twice in a row
    val firstSix = out.take(6).map(_._2)
    assert(firstSix.sliding(2).forall(w => w(0) != w(1)), firstSix.toSeq)
    assert(firstSix.groupBy(identity).forall(_._2.length == 2), firstSix.toSeq)
    // per-source internal order is doc_id order
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ids = rows.sortBy(_._3).map(_._1)
      assert(ids.sameElements(ids.sorted), ids.toSeq)
    }
    // exhausted sources leave gaps, never reorderings: 'a' and 'c'
    // keep alternating after 'b' runs out
    val tail3 = out.drop(6).map(_._2)
    assert(!tail3.contains("b") && tail3.toSet == Set("a", "c"))
  }
}
