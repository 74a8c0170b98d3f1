package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.TextHash._

/** Text-analysis operators for training-data pipelines ([EXT]):
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All built-ins, per-row (embarrassingly parallel —
  * no shuffle at any scale).
  */
object TextAnalysis {

  /** Function-word markers for the language heuristic. */
  val StopWords: Seq[String] = Seq("the", "a")

  /** Fused per-row surface statistics (n_tok, stop, alpha) — the ONE
    * evaluation of the tokenize/function-word/letter features shared by
    * stats / langId / qualityScore / qualityRules / qualityLogit (a
    * recalibration of [[StopWords]] hits every consumer at once). The
    * size(split)/filter(...) composition this replaces ran interpreted
    * (higher-order functions are CodegenFallback) and knocked each
    * consumer's stage out of whole-stage codegen.
    *
    * "ONE evaluation" relies on whole-stage codegen's common-
    * subexpression elimination: consumers reference several
    * `getField`s of one textStats call, and WSCG evaluates the shared
    * kernel once per row (the plan audits pin the WSCG span). With
    * `spark.sql.subexpressionElimination.enabled=false`, or in
    * interpreted projection paths, each getField re-runs the byte scan
    * (2-3x per row) — still CORRECT (the kernel is pure), just not
    * fused; no query depends on the fusion for semantics.
    */
  private def textStats(text: Column): Column =
    graft.functions.TermFunctions.textStats(text, StopWords)

  /** Exact-BIGINT length credit: min(5000, 25·n_tok). */
  private def lengthCreditBps(nTok: Column): Column =
    least(lit(5000L), nTok * 25)

  /** Exact-BIGINT function-word credit:
    * min(5000, ⌊stop·50000/n_tok⌋).
    */
  private def stopCreditBps(stop: Column, nTok: Column): Column =
    least(lit(5000L), floor(stop * lit(50000L) / nTok).cast("long"))

  /** Per-doc surface statistics reused by langId / quality:
    * n_tok, avg word length, stopword ratio.
    */
  def stats(text: Column): (Column, Column, Column) = {
    val st = textStats(text)
    val nTok = st.getField("n_tok")
    // chars excluding the (n_tok - 1) separating spaces, per token
    val avgWlen = (length(text) - nTok + lit(1)).cast("double") / nTok
    val stopRatio = st.getField("stop").cast("double") / nTok
    (nTok, avgWlen, stopRatio)
  }

  /** n-gram-heuristic language ID: function-word density first, then
    * mean word length as a coarse family split. Deterministic —
    * replicated exactly by the DuckDB oracle.
    */
  def langId(text: Column): Column = {
    val (_, avgWlen, stopRatio) = stats(text)
    when(stopRatio >= 0.08, "en")
      .when(avgWlen >= 4.8, "de")
      .otherwise("unk")
  }

  /** Quality score in [0, 1]: length credit + function-word credit. */
  def qualityScore(text: Column): Column = {
    val (nTok, _, stopRatio) = stats(text)
    least(lit(1.0), nTok.cast("double") / 200.0) * 0.5 +
      least(lit(1.0), stopRatio * 10.0) * 0.5
  }

  /** Integer quality score in basis points [0, 10000]: the same
    * length + function-word credits as [[qualityScore]], but every
    * step is exact BIGINT arithmetic (multiply before divide, floor
    * division), so the value is bit-identical on any engine and safe
    * to threshold/percentile against — a double score compared to a
    * double cutoff can flip borderline rows between engines; an
    * integer score cannot. The magnitudes stay far below 2^53, so the
    * double-typed division below is exact before the floor.
    */
  def qualityBps(text: Column): Column =
    // fused native kernel (one byte pass, WSCG-friendly) — the
    // compositional shape cost three interpreted split()/filter()
    // evaluations per row and knocked consumers out of codegen; values
    // are bit-identical (QualitySpec pins kernel == built-in chain,
    // including the null-propagation the old when() guarded: least()
    // IGNORES nulls, so the unguarded built-in shape would collapse
    // null text to 10000 where every DuckDB twin null-propagates)
    graft.functions.TermFunctions.qualityBps(text, StopWords)

  /** BM25 document ranking for one term query, linearized-idf variant:
    * per matched term,
    * `idf_lin · tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))` with
    * `idf_lin = (N − df + 0.5)/(df + 0.5)` — the inside of the classic
    * log-idf (log dropped for cross-engine bit-stability, the same
    * convention as the linearized tf-idf and PMI operators; per-term
    * rankings are identical, multi-term totals weight high-idf terms
    * more steeply). Every per-term score is quantized to 1e-6 BEFORE
    * the per-doc sum (floor(x·1e6 + 0.5) as BIGINT), so the total is
    * an associative integer sum — stable at any parallelism, where a
    * raw double Σ would depend on shuffle order (SURVEY.md §7.5).
    * Returns the global top-`k` docs by (score, doc_id).
    *
    * Scale posture: term frequencies are a per-row kernel projection
    * (`graft_term_counts`) filtered to the query's terms BEFORE any
    * shuffle (rows out ≤ |query| per doc); df is one bounded aggregate
    * (≤ |query| rows); N and total token mass ride in as ONE broadcast
    * row (never a driver collect); the final top-k is a
    * TakeOrderedAndProject — no global sort.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, text: Column,
               id: Column, queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(queryTerms.nonEmpty, "empty query")
    val base = docs.select(id.as("doc_id"),
      explode(graft.functions.TermFunctions.termCounts(text)).as("e"),
      size(tokens(text)).cast("long").as("dl"))
    val tf = base
      .filter(col("e.term").isin(queryTerms: _*))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"), col("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(tokens(text))).cast("long").as("t"))
    // arithmetic mirrors the oracle token for token (same IEEE op order)
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val den = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") * col("n") / col("t"))
    val score = idf * (col("tf") * lit(k1 + 1.0)) / den
    tf.join(broadcast(df), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(score * lit(1000000.0) + lit(0.5)).cast("long").as("q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("q").as("bm25_q"))
      .orderBy(col("bm25_q").desc, col("doc_id"))
      .limit(k)
  }

  /** Unigram-LM cross-entropy scoring (the CCNet-shape quality
    * signal): train a unigram language model on the corpus itself
    * (term frequency / total tokens), then score every document by its
    * per-token cross-entropy in bits — low = typical prose, high =
    * rare-token noise (gibberish, boilerplate codes, wrong-language
    * fragments). The published pipeline ranks a crawl by LM perplexity
    * and keeps the head/middle; per-token bits is the log2 of that
    * perplexity, monotone-equivalent and cheaper to compare.
    *
    * Determinism: per-term costs are quantized to integer MICRO-BITS
    * (round(-log2(p)·1e6)) so every cross-row sum is exact BIGINT —
    * a raw double sum is shuffle-order-dependent — and the per-doc
    * mean stays integer via floor division (a double mean rounded to
    * 4 decimals flipped on a representation boundary at sf0.1; an
    * integer cannot). The log itself is evaluated on identical doubles
    * both engines; a last-ulp divergence would need to land within
    * ~1e-15 of the micro-bit rounding boundary to matter.
    *
    * Scale posture: the honest two-pass shape — pass 1 aggregates the
    * vocabulary-sized LM table (map-side partial counts), pass 2
    * re-scans the corpus and joins the BROADCAST LM (never a corpus
    * shuffle-join); per-doc aggregation rides the term-counts kernel
    * (distinct-term rows, not token rows). A 100 TB run materializes
    * the LM table once and feeds both passes; here the plan keeps the
    * two scans explicit for per-query independence.
    */
  def unigramCrossEntropy(docs: DataFrame, text: Column,
                          id: Column): DataFrame =
    scoreAgainstLm(docs, text, id, trainUnigramLm(docs, text))

  /** Per-document token Shannon entropy in bits (the distribution-
    * uniformity quality signal, complementary to [[unigramCrossEntropy]]
    * — that one scores docs against the CORPUS distribution, this one
    * scores each doc's OWN distribution: near-zero entropy is a
    * keyword-stuffed / single-token-spam page even when every token is
    * corpus-typical, high entropy at a given length is diverse prose).
    *
    *   H(doc) = Σ_terms (tf/n)·(−log2(tf/n))
    *
    * Determinism: the per-term surprisal is quantized to integer
    * micro-bits (round(−log2(tf/n)·1e6), the [[trainUnigramLm]] idiom),
    * weighted by the exact integer tf, and summed as BIGINT — no float
    * accumulation order anywhere; the final bits readout is one IEEE
    * divide of exact integers, rounded to 4.
    *
    * Scale posture: rides the `graft_term_counts` kernel (distinct-term
    * rows, not token rows); the doc-keyed window and the final
    * aggregate share one hash partitioning on doc_id — a single
    * exchange end-to-end, no corpus-sized join. Docs with NULL text
    * have no term rows and are omitted (the [[scoreAgainstLm]]
    * convention).
    */
  def tokenEntropy(docs: DataFrame, text: Column, id: Column): DataFrame = {
    import graft.functions.TermFunctions
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(id.as("doc_id"), explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("e.tf").cast("long").as("c"))
    tf.withColumn("n_tok",
        sum("c").over(Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("n_tok"),
        (col("c") * round(-log(2.0, col("c").cast("double") / col("n_tok"))
          * 1e6).cast("long")).as("w"))
      .groupBy("doc_id", "n_tok")
      .agg(sum("w").as("wsum"))
      .select(col("doc_id"), col("n_tok"),
        round(col("wsum").cast("double") / (col("n_tok") * lit(1e6)), 4)
          .as("ent_bits"))
  }

  /** Pass 1 of [[unigramCrossEntropy]]: the corpus-trained unigram LM
    * as a (term, cost) table, cost = round(−log2(p)·1e6) µbits. A
    * production pipeline materializes this table once and feeds every
    * scorer — including the STREAMING gate ([[scoreAgainstLm]] inside
    * foreachBatch).
    */
  def trainUnigramLm(docs: DataFrame, text: Column): DataFrame = {
    import graft.functions.TermFunctions
    val tf = docs
      .select(explode(TermFunctions.termCounts(text)).as("e"))
      .groupBy(col("e.term").as("term"))
      .agg(sum(col("e.tf").cast("long")).as("n"))
    val tot = tf.agg(sum("n").as("nn"))
    tf.crossJoin(broadcast(tot))
      .select(col("term"),
        round(-log(2.0, col("n").cast("double") / col("nn")) * 1e6)
          .cast("long").as("cost"))
  }

  /** Pass 2 of [[unigramCrossEntropy]]: score docs against a FIXED
    * (term, cost) LM table — broadcast back, never a corpus
    * shuffle-join. Factored out so a streaming ingest gate can run it
    * per micro-batch against the offline-trained LM (the CCNet deploy
    * shape: train once, gate the stream).
    *
    * Contract: docs with no scoreable tokens (null/empty text) have
    * no term rows and are OMITTED — same convention as noveltyRate's
    * sub-shingle omission. A docs-keyed left-join re-attach would
    * cost a corpus-sized shuffle join (measured: it turns the
    * broadcast-only plan into a SortMergeJoin) for rows whose score
    * is undefined; a quality gate that must fail-closed on them
    * should left-join this output and treat null as reject. Terms
    * absent from the LM (possible only when scoring data the LM was
    * not trained on) are likewise omitted from the cost — pass a
    * smoothed LM when OOV mass matters.
    */
  def scoreAgainstLm(docs: DataFrame, text: Column, id: Column,
                     lm: DataFrame): DataFrame = {
    import graft.functions.TermFunctions
    val dt = docs
      .select(id.as("doc_id"), explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"))
    dt.join(broadcast(lm), Seq("term"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("cost")).as("cost"), sum("tf").as("n_tok"))
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        // per-token mean kept in exact micro-bits (floor division):
        // a double mean rounded to 4 decimals flips on representation
        // boundaries between engines (observed at sf0.1); an integer
        // never does. bits = bits_micro / 1e6 when a float readout is
        // wanted downstream.
        expr("CAST(cost DIV n_tok AS BIGINT)").as("bits_micro"))
  }

  /** Greedy wordpiece subword encode
    * ([[graft.functions.WordpieceKernels]]): per-doc segmented text +
    * whole-word and wordpiece token counts. Whole-word mapping
    * ([[tokenIds]]) under-counts the sequence length a subword
    * tokenizer produces; packing and token-budget decisions need the
    * SUBWORD count. Zero shuffle — one codegen'd kernel projection per
    * row; the static vocabulary lives in the kernel (a trained
    * deployment loads its table into the same structure), so unlike
    * tokenIds there is no vocabulary join at all.
    */
  def wordpiece(docs: org.apache.spark.sql.DataFrame, text: Column,
                id: Column): org.apache.spark.sql.DataFrame =
    docs.select(id.as("doc_id"),
        size(tokens(text)).cast("long").as("n_tok"),
        graft.functions.WordpieceFunctions.wordpiece(text).as("wp_text"))
      .select(col("doc_id"), col("n_tok"),
        size(tokens(col("wp_text"))).cast("long").as("n_wp"),
        col("wp_text"))

  /** Tokenizer fertility per source: subword pieces per whitespace
    * word under the wordpiece vocabulary ([[wordpiece]]) — the
    * tokenizer-quality dial (a fertility of 1.0 means every word is
    * in-vocabulary; high fertility marks domains the tokenizer
    * fragments, which inflates their token budget and training cost).
    * Reported per source so corpus mixing can price each domain in
    * ACTUAL subword tokens rather than whitespace words.
    *
    * Determinism: the ratio is exact µ-units via
    * multiply-before-floor-divide on BIGINT sums. Scale posture: the
    * kernel projection is per-row; the only shuffles are the
    * doc-keyed source join and the source-sized aggregate. Docs with
    * no tokens (null text) are omitted, matching the oracle's
    * token-derived frame.
    */
  def wordpieceFertility(docs: DataFrame, text: Column, id: Column,
                         source: Column): DataFrame =
    wordpiece(docs, text, id)
      .filter(col("n_tok").isNotNull)
      .join(docs.select(id.as("doc_id"), source.as("source")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_words"),
        sum("n_wp").as("n_pieces"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_pieces"),
        expr("CAST(n_pieces * 1000000 DIV n_words AS BIGINT)")
          .as("fertility_micro"))

  /** Corpus vocabulary + token-id mapping: build the top-`vocabSize`
    * term vocabulary (by total frequency, ties → lexicographic — a
    * total order, so the id assignment is deterministic; ids start at
    * 1 by frequency rank) and map every document to its ordered id
    * sequence with OOV → 0 — the tokenize-to-ids step every training
    * loader runs after text curation.
    *
    * Scale posture: term counts are the per-row kernel projection
    * (`graft_term_counts`) aggregated once (map-combined, vocabulary-
    * bounded); the vocabulary is a TakeOrderedAndProject (never a
    * global sort) and BROADCASTS to the mapping join; the id sequence
    * reassembles with one doc-keyed aggregate over (doc, position)
    * rows. OOV handling is a left join + coalesce, not a filter — the
    * sequence keeps its length, which packing depends on.
    */
  def tokenIds(docs: org.apache.spark.sql.DataFrame, text: Column,
               id: Column, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(vocabSize > 0, "vocabSize must be positive")
    val tf = docs
      .select(explode(graft.functions.TermFunctions.termCounts(text)).as("e"))
      .select(col("e.term").as("term"), col("e.tf").cast("long").as("tf"))
      .groupBy("term").agg(sum("tf").as("n"))
    val vocab = tf
      .orderBy(col("n").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("term")))).cast("long").as("tok_id"))
    val toks = docs.select(id.as("doc_id"),
        posexplode(tokens(text)).as(Seq("pos", "term")))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(array_join(
        // GetArrayStructFields + element-wise array cast (both
        // codegen'd) instead of a transform lambda — identical
        // per-element long→string rendering
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("tok_id"), lit(0L)).as("tid"))))
          .getField("tid").cast("array<string>"), ",").as("ids"),
        count(lit(1)).as("n_tok"),
        sum(when(col("tok_id").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Whitespace token count + BPE-ish subword count (greedy <=4-char
    * chunks), the classic cheap token-budget estimators.
    */
  def tokenCounts(text: Column): (Column, Column) = (
    size(tokens(text)).cast("long"),
    regexp_count(text, lit("[a-z]{1,4}")))

  /** Content fingerprint: 48-bit rolling digest + full md5. */
  def fingerprint(text: Column): (Column, Column) = (baseHash(text), md5(text))

  /** Top-k characteristic terms per document by tf-idf.
    *
    * idf is linearized (score = tf x N / df instead of tf x ln(N/df)):
    * rankings per term are identical and the arithmetic stays one
    * exact-rounded IEEE division — bit-stable across engines, where
    * ln() differs in final ulps between libm and the JVM and could
    * flip near-tie rankings (SURVEY.md §7.5 determinism contract).
    *
    * Scale: two hash aggregations (term counts, doc frequencies) + a
    * WindowGroupLimit top-k; the corpus size joins in as a broadcast
    * scalar, never a driver-side collect.
    */
  def topTfidfTerms(docs: org.apache.spark.sql.DataFrame, text: Column,
                    id: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // tf is a pure projection (graft_term_counts: per-row counting in
    // one codegen'd pass) — the old explode → groupBy(doc, term) shape
    // shuffled one row per TOKEN to count duplicates that never leave
    // their source row. The only data-sized exchanges left are the two
    // that genuinely cross rows: document frequency on term, and the
    // per-doc top-k window on doc_id.
    val tf = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf") * col("nd") / col("df")).as("score"))
    graft.ops.Windows.findFirstK(scored,
      keys = Seq(col("doc_id")),
      priority = Seq(col("score").desc, col("term")),
      k = k, rankName = "rnk")
  }

  /** Per-document mean document frequency: the LM-free rarity /
    * perplexity proxy. A document whose token occurrences concentrate
    * in corpus-common words (boilerplate, navigation chrome, templated
    * text) scores high; rare-vocabulary documents score low — the
    * cheap stand-in for the "perplexity of a reference LM" quality
    * dimension published pipelines filter on, computable inside the
    * engine with no model artifact.
    *
    * Determinism: both aggregates are exact integer sums (sum of tf,
    * sum of tf x df); the single final division is one correctly-
    * rounded IEEE op, so scores are bit-identical across engines and
    * partitionings — no float summation order anywhere.
    *
    * Scale: tf is a pure projection (graft_term_counts); the two real
    * exchanges are df-by-term and the per-doc sum — the inverted-index
    * cost class (same as tf-idf), linear in token volume.
    */
  def meanDocFreq(docs: org.apache.spark.sql.DataFrame, text: Column,
                  id: Column): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tok"),
        (sum(col("tf") * col("df")).cast("double") / sum("tf"))
          .as("mean_df"))
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word n-grams with ANY document of an eval
    * set — the overlap check training pipelines run against held-out
    * benchmarks before training. The eval set's distinct shingle hashes
    * are the (small) broadcast side; the corpus is scanned once, so
    * cost is one shuffle-free semi-structure join + one hash-agg per
    * corpus partition regardless of corpus size.
    */
  def contaminated(corpus: org.apache.spark.sql.DataFrame,
                   evalDocs: org.apache.spark.sql.DataFrame,
                   text: Column, id: Column,
                   n: Int, minShared: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val sh = graft.functions.HashFunctions.shingleHash48(text, n)
    val c = corpus.select(id.as("doc_id"),
      explode(array_distinct(sh)).as("s"))
    val e = evalDocs.select(explode(array_distinct(sh)).as("s")).distinct()
    c.join(broadcast(e), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** Bloom-prefiltered decontamination: identical RESULTS to
    * [[contaminated]] (the exact verify stage removes every bloom
    * false positive; a bloom has no false negatives), but the corpus
    * side is first screened against a `bloomBits`-bit Bloom filter of
    * the eval set's shingle hashes — the sketch-accelerated scale
    * shape. The bloom is `bloomBits/64` (word, bits) rows built by one
    * `bit_or` aggregate (a mergeable sketch: partial aggregation
    * combines map-side) and broadcast at a fixed size REGARDLESS of
    * eval-set cardinality; only bloom-POSITIVE corpus shingles (true
    * hits + the fp-rate sliver) reach the exact membership join, so
    * the expensive stage's input shrinks from every corpus shingle to
    * roughly the contaminated fraction. Single-hash bloom: fp rate ≈
    * distinct eval shingles / bloomBits — size accordingly (default
    * 2^20 bits = 16K-row broadcast ≈ one parquet footer).
    *
    * Determinism: the screen is pure arithmetic on the same 48-bit
    * shingle hash the exact stage compares — no RNG, no approximation
    * in the OUTPUT (TextAnalysisSpec pins equality to [[contaminated]]
    * even with a deliberately saturated 64-bit bloom).
    */
  def contaminatedBloom(corpus: org.apache.spark.sql.DataFrame,
                        evalDocs: org.apache.spark.sql.DataFrame,
                        text: Column, id: Column,
                        n: Int, minShared: Int,
                        bloomBits: Int = 1 << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(bloomBits > 0 && bloomBits % 64 == 0,
      s"bloomBits must be a positive multiple of 64: $bloomBits")
    val sh = graft.functions.HashFunctions.shingleHash48(text, n)
    val e = evalDocs.select(explode(array_distinct(sh)).as("s")).distinct()
    // bit position of hash s: word = (s mod bits) div 64, bit = s mod 64
    // (bits is a multiple of 64, so (s mod bits) mod 64 == s mod 64)
    val bloom = e
      .select(expr(s"cast((s % $bloomBits) div 64 as int)").as("w"),
        expr("shiftleft(1L, cast(s % 64 as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
    val c = corpus.select(id.as("doc_id"), explode(array_distinct(sh)).as("s"))
      .select(col("doc_id"), col("s"),
        expr(s"cast((s % $bloomBits) div 64 as int)").as("w"),
        expr("shiftleft(1L, cast(s % 64 as int))").as("m"))
    val screened = c.join(broadcast(bloom), Seq("w"))
      .filter(col("bits").bitwiseAND(col("m")) === col("m"))
      .select("doc_id", "s")
    screened.join(broadcast(e), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** Within-document n-gram repetition ratio (the Gopher-rule quality
    * signal): 1 - distinct/total word n-grams. High values mean the
    * document repeats itself — boilerplate, keyword stuffing, decode
    * loops. Pure per-row projection; docs with fewer than n tokens get
    * ratio 0.
    */
  def repetitionRatio(text: Column, n: Int): (Column, Column, Column) = {
    // native shingle kernel: the HOF composition runs interpreted
    val grams = graft.functions.TermFunctions.stringShingles(text, n)
    val total = size(grams).cast("long")
    val distinctN = size(array_distinct(grams)).cast("long")
    val ratio = when(total > 0,
      lit(1.0) - distinctN.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
    (total, distinctN, ratio)
  }

  /** Pattern scrubbing (PII-redaction shape): replace every regex match
    * and report the per-row hit count for the scrub audit. Pure per-row
    * projection — zero shuffle at any scale.
    */
  def redact(text: Column, pattern: String, replacement: String): (Column, Column) =
    (regexp_replace(text, pattern, replacement),
      regexp_count(text, lit(pattern)))

  /** HTML → text extraction (the crawl pipeline's step 1: raw web
    * pages in, training text out — trafilatura/jusText territory,
    * expressed as a deterministic rule chain both engines can replay):
    *
    *   1. drop `<script>`/`<style>` blocks WITH their payload (code
    *      and CSS are not text),
    *   2. drop `<nav>…</nav>` and `<div id=footer>…</div>` boilerplate
    *      blocks (the chrome every page of a site repeats — leaving
    *      them in is the classic near-dup false-positive generator),
    *   3. strip every remaining tag to a space (content between tags
    *      survives),
    *   4. decode the three structural entities (`&amp;` `&lt;` `&gt;` —
    *      order matters: `&amp;lt;` must decode to `&lt;`, not `<`),
    *   5. collapse `[ \t\n\r]+` runs to one space and trim.
    *
    * Every regex is RE2-compatible (no backreferences, no lookaround)
    * so a DuckDB/Trino oracle replays the chain byte-for-byte; the
    * Java side opts into DOTALL with inline `(?s)` where the block
    * payload spans lines. Pure per-row projection (codegen'd
    * regexp_replace chain) — zero shuffle at any corpus size.
    *
    * Honest scope: this is the deterministic-contract extractor, not a
    * DOM parser — nested same-tag blocks (a `<nav>` inside a `<nav>`)
    * terminate at the first closer, and malformed HTML degrades to
    * tag-stripping. The contract is identical bytes out of both
    * engines, which is what the dedup/quality ops downstream key on.
    */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", " ")
    val noNav = regexp_replace(noStyle, "(?s)<nav>.*?</nav>", " ")
    val noFooter = regexp_replace(noNav,
      "(?s)<div id=footer>.*?</div>", " ")
    val noTags = regexp_replace(noFooter, "<[^>]+>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** Sentence segmentation: split on `[.!?]+` runs followed by
    * whitespace. The returned array keeps raw split positions
    * (including any empty elements) so per-sentence indexes are
    * reproducible across engines — callers filter empties AFTER
    * indexing. Deliberately rule-based (no abbreviation lexicon): the
    * cross-engine determinism contract is the split regex itself,
    * which RE2 replays exactly (lookbehind — the usual "keep the
    * terminator" trick — does not exist in RE2, so the terminator
    * stays attached to nothing and the LAST sentence keeps its final
    * punctuation, a documented asymmetry both engines share). Pure
    * per-row projection; the explode that usually follows is a
    * Generate, not a shuffle.
    */
  def sentenceSplit(text: Column): Column =
    split(text, "[.!?]+[ \t\n\r]+")

  /** Composite quality-rule filter (the published Gopher/C4 rule-set
    * shape): five independent per-document cuts, reported as a failed-
    * rule BITMASK so a pipeline can both filter (`mask = 0`) and audit
    * which rule rejects how much of a source. Every rule is exact
    * integer arithmetic (cross-multiplied ratios — no float division
    * anywhere), so borderline docs cannot flip between engines:
    *
    *   bit 1  token count outside [5, 50000]
    *   bit 2  mean word length outside [3, 10] chars
    *          (3·n_tok ≤ chars-excl-separators ≤ 10·n_tok)
    *   bit 4  fewer than 80% of words contain a letter (5·alpha < 4·n)
    *   bit 8  fewer than 2 function-word hits ([[StopWords]])
    *   bit 16 symbol density ≥ 10% (`#` or `...` count ≥ n_tok/10)
    *
    * Returns (failMask, keep). Pure per-row projection — zero shuffle
    * at any corpus size; the audit aggregate the caller adds on top is
    * a map-side-combined count by mask.
    */
  def qualityRules(text: Column): (Column, Column) = {
    val st = textStats(text)
    val nTok = st.getField("n_tok")
    val charsNoSep = (length(text) - nTok + lit(1)).cast("long")
    // tokens containing an ASCII letter — the kernel's byte test is
    // exactly the old per-token rlike("[a-z]") (UTF-8 lead/continuation
    // bytes are >= 0x80, never inside a-z)
    val alphaWords = st.getField("alpha")
    val stop = st.getField("stop")
    val sym = regexp_count(text, lit("#|\\.\\.\\.")).cast("long")
    val mask =
      when(nTok >= 5 && nTok <= 50000, lit(0L)).otherwise(lit(1L)) +
      when(charsNoSep >= nTok * 3 && charsNoSep <= nTok * 10, lit(0L))
        .otherwise(lit(2L)) +
      when(alphaWords * 5 >= nTok * 4, lit(0L)).otherwise(lit(4L)) +
      when(stop >= 2, lit(0L)).otherwise(lit(8L)) +
      when(sym * 10 < nTok, lit(0L)).otherwise(lit(16L))
    (mask, mask === 0L)
  }

  /** Collocation mining: bigrams scored by LINEARIZED pointwise mutual
    * information, `pmi_lin = c_ab·N / (c_a·c_b)` — the same
    * monotone-in-PMI linearization trick as tf-idf's idf (log dropped:
    * rankings are identical and the score stays ONE exact-integer IEEE
    * division, bit-stable across engines). `minSupport` is the
    * standard low-count cut (PMI's known bias toward hapax pairs).
    *
    * Scale posture: unigram counts ride the codegen'd per-row
    * `graft_term_counts` kernel (tokens pre-aggregated within each doc
    * before the shuffle), bigram counts the `graft_shingles` kernel;
    * N is a 1-row broadcast derived FROM the unigram table (no extra
    * corpus pass). The two bigram→unigram joins are plain equi-joins
    * on the token — broadcast when the vocabulary fits, shuffle-hash
    * when it doesn't; either way cost follows the vocab, not the
    * corpus.
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, text: Column,
                   minSupport: Long): org.apache.spark.sql.DataFrame = {
    import graft.functions.TermFunctions
    val uni = docs
      .select(explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("e.term").as("w"), col("e.tf").cast("long").as("tf"))
      .groupBy("w").agg(sum("tf").as("c"))
    val n1 = uni.agg(sum("c").as("n"))
    val big = docs
      .select(explode(TermFunctions.stringShingles(text, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minSupport)
    big
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n1))
      .select(col("bigram"), col("cab").as("n_pair"),
        round(col("cab").cast("double") * col("n") / (col("c1") * col("c2")), 4)
          .as("pmi_lin"))
  }

  /** Corpus n-gram novelty by ingest order: per document, the fraction
    * of its DISTINCT word n-gram shingles whose first corpus
    * occurrence (minimum doc_id) is this document. The standard
    * redundancy dashboard for an append-ordered crawl — a falling
    * novelty curve says later snapshots mostly repeat earlier ones and
    * dedup should gate ingest; a per-source average locates the
    * boilerplate emitter. Ratio reported in exact integer basis
    * points (floor(n_novel·10000/n_shingles)) — bit-stable on any
    * engine; n_novel·10⁴ ≪ 2⁵³ so the IEEE division is exact before
    * the floor.
    *
    * Contract: documents with fewer than `n` tokens have no shingles
    * and are omitted (novelty of an empty set is undefined, not 0).
    *
    * Scale posture: shingles ride the fused codegen'd `ShingleHash48`
    * kernel (one md5 per window, 8-byte keys over the wire — the HOF
    * string-shingle composition runs interpreted and measured 3.5×
    * slower); the per-doc denominator is a pure per-row projection
    * (never shuffled); the first-doc election is a map-side-combinable
    * min hash aggregate on the shingle hash (NO sort — a window
    * formulation would sort the entire exploded shingle mass), and the
    * per-doc novel counts that come back are a doc-count-sized frame
    * joined on doc_id. Row-linear in shingle mass; at 100 TB the
    * shingle exchange is the same cost class as the n-gram Jaccard
    * index this pipeline already pays for.
    */
  def noveltyRate(docs: DataFrame, text: Column, id: Column,
                  n: Int): DataFrame =
    noveltyReport(docs, text, id, n, seen = None)

  /** Shared novelty shape for the full-corpus and incremental forms —
    * one body so the bps arithmetic and the distinct-shingle contract
    * cannot drift between the two.
    */
  private def noveltyReport(docs: DataFrame, text: Column, id: Column,
                            n: Int, seen: Option[DataFrame]): DataFrame =
    noveltyReportSegs(docs, text, id, n, seen.toSeq)

  /** Segment-chain form of the novelty shape: the seen index arrives
    * as the immutable segments a durable [[NoveltyIndex]] stores, and
    * the first-occurrence frame anti-joins each in sequence. Chaining
    * is exchange-MINIMAL by construction: the batch side is hash-
    * partitioned on `sh` by its own first-occurrence aggregate, every
    * anti-join preserves that partitioning into the next, and a
    * bucketed segment scan arrives pre-partitioned — so the index side
    * never shuffles no matter how many segments have accumulated
    * (NoveltyIndexSpec pins the zero-Exchange plan).
    */
  private[ext] def noveltyReportSegs(docs: DataFrame, text: Column,
                                     id: Column, n: Int,
                                     seenSegs: Seq[DataFrame]): DataFrame = {
    val hs = array_distinct(
      graft.functions.HashFunctions.shingleHash48(text, n))
    // per-doc denominator: per-row, zero shuffle
    val base = docs.select(id.as("doc_id"),
      size(hs).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0)
    // per-shingle first-occurrence election: map-combined hash agg,
    // (minus the already-seen index in the incremental form), then a
    // doc-count-sized novel tally
    val firsts = docs.select(id.as("doc_id"), explode(hs).as("sh"))
      .groupBy("sh").agg(min(col("doc_id")).as("doc_id"))
    val novel = seenSegs.foldLeft(firsts)((acc, idx) =>
        acc.join(idx.select(col("sh")), Seq("sh"), "left_anti"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    base.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        floor(coalesce(col("n_novel"), lit(0L)) * lit(10000L)
          / col("n_shingles")).cast("long").as("novelty_bps"))
  }

  /** Incremental novelty: [[noveltyRate]] for ONE new batch against a
    * persisted seen-shingle index — the production shape for
    * append-ordered ingest (daily crawl snapshots; a Structured
    * Streaming `foreachBatch` maintains the index between batches). A
    * shingle is novel for doc d iff it is absent from `seen` AND its
    * first occurrence WITHIN the batch is d; processing a corpus in
    * id-ordered batches therefore reproduces the full-corpus
    * [[noveltyRate]] exactly (equivalence property-tested). The
    * caller appends the batch's first-occurrence shingles to the index
    * afterwards.
    *
    * Scale posture: same shapes as [[noveltyRate]] plus one anti-join
    * against the index on the 8-byte shingle hash. At scale, hold the
    * index as a durable [[NoveltyIndex]] — its segments are bucketed
    * tables co-located on `sh`, making every anti-join exchange-free
    * on the index side ([[NoveltyIndex.novelty]] is this method over
    * the stored segments; this overload takes any in-memory frame).
    */
  def noveltyRateIncremental(newDocs: DataFrame, text: Column, id: Column,
                             n: Int, seen: DataFrame): DataFrame =
    noveltyReport(newDocs, text, id, n, Some(seen))

  /** Corpus vocabulary growth curve (Heaps-law diagnostic): new
    * distinct word n-gram shingles contributed per ingest-order
    * decile, plus the running cumulative — the saturation curve that
    * says when a crawl stops adding new text (a flattening tail means
    * further snapshots are redundant and ingest can stop early). Each
    * distinct shingle is credited to the decile of its FIRST corpus
    * occurrence (min doc_id), so the deciles partition the vocabulary
    * exactly: sum(n_new) = corpus distinct shingle count.
    *
    * Scale posture: shingles ride the fused codegen'd `ShingleHash48`
    * kernel (8-byte keys, one md5 per window); one shingle exchange
    * for the first-doc election (map-side-combined hash aggregate —
    * same cost class as [[noveltyRate]]), the max-doc bound rides in
    * as ONE broadcast row, and everything after the decile aggregate
    * is `buckets` rows (the cumulative window is over the decile
    * table, never the corpus).
    */
  def vocabGrowth(docs: DataFrame, text: Column, id: Column,
                  n: Int, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = docs.select(id.as("doc_id"), explode(array_distinct(
      graft.functions.HashFunctions.shingleHash48(text, n))).as("sh"))
    val firsts = ex.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    val bound = docs.agg((max(id) + 1).as("n_docs"))
    firsts.crossJoin(broadcast(bound))
      // exact integer decile in [0, buckets): multiply before divide;
      // doc ids start at 0, so the divisor is max+1
      .select(col("first_doc") * buckets / col("n_docs"))
      .toDF("bucket")
      .select(floor(col("bucket")).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
      .select(col("bucket"), col("n_new"),
        sum(col("n_new")).over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_vocab"))
      .orderBy("bucket")
  }

  /** BPE tokenizer TRAINING (merge learning): the `k` highest-count
    * symbol-pair merges, learned iteratively — the other half of the
    * subword story from [[wordpiece]] (which APPLIES a vocabulary).
    * Classic Sennrich-style byte-pair encoding: start from characters,
    * repeatedly (1) count adjacent symbol pairs weighted by word
    * frequency, (2) merge the highest-count pair everywhere
    * (left-to-right, non-overlapping — plain literal replace on the
    * space-delimited symbol string), deterministic tie-break
    * (count desc, pair asc). Returns the learned merge table
    * (step, pair, merged, score) — the artifact a tokenizer ships.
    *
    * Fully declarative: the corpus is touched ONCE (the word-frequency
    * aggregate — word-domain-sized, map-side-combinable); every
    * learning iteration runs over that vocabulary table only, and the
    * per-iteration argmax stays IN the plan as a 1-row
    * TakeOrderedAndProject broadcast back over the vocabulary — no
    * driver-side collect, no mutable state, the whole k-step training
    * is one lazy plan. Pair enumeration rides the codegen'd
    * `graft_shingles` kernel over the symbol string.
    *
    * Scale posture: at 100 TB the corpus pass is one term aggregate
    * (the same cost class as TF-IDF's); training cost then follows
    * |vocabulary| × k, independent of corpus row count. For web-scale
    * vocabularies, pre-filter `wf` by a minimum frequency — the merge
    * ranking only ever depends on high-count pairs.
    */
  def bpeTrain(docs: DataFrame, text: Column, k: Int): DataFrame =
    bpeFold(docs, text, k)._1.reduce(_ union _).orderBy("step")

  /** Token counts under the LEARNED tokenizer: train `k` BPE merges
    * ([[bpeTrain]]) and encode the corpus with them, reporting per-doc
    * whitespace vs post-merge subword counts — the budget estimator a
    * packing decision should actually use (the regex "BPE-ish" counter
    * in [[tokenCounts]] approximates; this one IS the trained
    * tokenizer's length). The final vocabulary state already holds
    * every distinct word's encoding, so application is ONE broadcast
    * join of the corpus words against the vocabulary-sized table —
    * the per-doc sum never touches character level again.
    */
  def bpeEncodeCounts(docs: DataFrame, text: Column, id: Column,
                      k: Int): DataFrame = {
    val state = bpeFold(docs, text, k)._2
    val vocab = state.select(col("w"),
      size(split(trim(col("enc")), "  ")).cast("long").as("pieces"))
    docs.select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .join(broadcast(vocab), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("pieces")).as("n_bpe"))
  }

  /** Encode the corpus under a SHIPPED merge table — [[bpeTrain]]'s
    * (step, pair, merged) artifact or any externally trained one read
    * back from parquet — reporting the same per-doc whitespace vs
    * subword counts as [[bpeEncodeCounts]]. Application decoupled from
    * training is the deploy path: the tokenizer is trained once,
    * versioned as a table, and every downstream corpus pays only
    * encoding. Property-tested: given bpeTrain's own table, this
    * reproduces bpeEncodeCounts exactly.
    *
    * The merge list is collected driver-side (justified class: a
    * tokenizer merge table is a bounded artifact, never corpus-scaled)
    * and folds into a chain of LITERAL replaces over the
    * vocabulary-sized word table — no per-step checkpoint needed,
    * because unlike training each step is consumed exactly once (no
    * argmax side-branch), so the plan is a linear projection chain.
    * Suited to the bounded merge tables the oracle replays; a
    * production 30k-merge artifact would precompute the word→pieces
    * dictionary offline once and broadcast-join it, which is exactly
    * the `vocab` frame this function ends with.
    */
  def bpeApplyMerges(docs: DataFrame, text: Column, id: Column,
                     merges: DataFrame): DataFrame = {
    val ms = merges
      .select(col("step").cast("long").as("step"),
        col("pair").cast("string").as("pair"),
        col("merged").cast("string").as("merged"))
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2)))
    // distinct words, not frequencies: application (unlike training)
    // never ranks pairs, so only the vocabulary itself is needed
    val words = docs.select(explode(tokens(text)).as("w")).distinct()
    // the bpeFold two-space symbol encoding and search/replace shapes,
    // with literal merge strings (the table is already materialized)
    val enc0: Column = concat(lit(" "),
      regexp_replace(col("w"), "(.)", "$1  "))
    val enc = ms.foldLeft(enc0) { case (e, (pair, merged)) =>
      replace(e, lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + merged + " "))
    }
    val vocab = words.select(col("w"),
      size(split(trim(enc), "  ")).cast("long").as("pieces"))
    docs.select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .join(broadcast(vocab), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("pieces")).as("n_bpe"))
  }

  /** Load a HuggingFace-style `merges.txt` artifact into the
    * (step, pair, merged) frame [[bpeApplyMerges]] consumes: one
    * "left right" pair per line, RANK = line order (the application
    * order BPE's correctness depends on), optional `#…` header lines
    * (e.g. `#version: 0.2`) skipped. Read driver-side through the
    * Hadoop filesystem ([[graft.ops.Staging.readString]]) — a merge
    * table is the bounded artifact class, and rank must never depend
    * on a distributed read's partition order.
    */
  def bpeMergesFromFile(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame = {
    import spark.implicits._
    val rows = graft.ops.Staging.readString(path).split('\n').toSeq
      .map(_.stripSuffix("\r"))
      .filter(_.nonEmpty)
      .filterNot(_.startsWith("#"))
      .zipWithIndex.map { case (line, i) =>
        val parts = line.split(' ')
        require(parts.length == 2,
          s"malformed merges line ${i + 1} in $path: '$line' " +
            "(expected 'left right')")
        (i.toLong, s"${parts(0)} ${parts(1)}", parts(0) + parts(1))
      }
    rows.toDF("step", "pair", "merged")
  }

  /** Shared k-step BPE training fold: (per-step merge frames, final
    * vocabulary state (w, f, enc)).
    */
  private def bpeFold(docs: DataFrame, text: Column,
                      k: Int): (Seq[DataFrame], DataFrame) = {
    // one corpus pass: word frequencies (vocabulary-sized thereafter)
    val wf = docs.select(explode(tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    // " a  b  c  " — TWO-space symbol separators, one space of padding
    // at the head. With single-space separators a merge pattern " x y "
    // CONSUMES the shared boundary space, so string replace resumes
    // past it and under-merges same-symbol runs ("o o o o" became
    // [oo,o,o] instead of [oo,oo]). With two-space separators the
    // pattern " x  y " takes one space from each side's own pair of
    // delimiters, leaving the neighbors' intact — plain left-to-right
    // literal replace IS exact list-scan BPE merge application.
    var state = wf.select(col("w"), col("f"),
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1  ")).as("enc"))
    val steps = (1 to k).map { i =>
      // lazily checkpoint each vocabulary generation: state_i is
      // referenced TWICE downstream (by its own argmax and by
      // state_{i+1}), so without the shared materialization the plan
      // tree doubles per iteration — exponential in k. localCheckpoint
      // (lazy), not persist: checkpoint blocks are per-invocation,
      // where a persist would be deduped by the CacheManager across
      // repeated invocations and understate benchmark minima (same
      // reasoning as semanticDedup)
      state = state.localCheckpoint(false)
      // adjacent symbol pairs keyed "a b" (single space) — enumerated
      // over the vocabulary-sized state, off the corpus path
      val syms = split(trim(col("enc")), "  ")
      val pairs = state.select(col("f"),
        explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1), j =>
            concat(element_at(syms, j), lit(" "),
              element_at(syms, j + lit(1)))))
          .otherwise(array().cast("array<string>"))).as("p"))
        .groupBy("p").agg(sum(col("f")).as("score"))
      val best = pairs.orderBy(col("score").desc, col("p").asc).limit(1)
        .select(lit(i.toLong).as("step"), col("p").as("pair"),
          replace(col("p"), lit(" ")).as("merged"), col("score"))
      // LEFT join against the 1-row winner: when merges exhaust before
      // step k, `best` is EMPTY and a plain cross join would wipe the
      // vocabulary state (breaking encode-count consumers). The
      // exhausted-step fallback makes search == replacement (" " -> " ")
      // — a guaranteed no-op on ANY text, unlike a sentinel character
      // corpus text could collide with.
      state = state.join(broadcast(best.select("pair", "merged")),
          lit(true), "left")
        .select(col("w"), col("f"),
          replace(col("enc"),
            coalesce(concat(lit(" "),
              replace(col("pair"), lit(" "), lit("  ")), lit(" ")),
              lit(" ")),
            coalesce(concat(lit(" "), col("merged"), lit(" ")),
              lit(" "))).as("enc"))
      best
    }
    (steps, state)
  }

  /** Linear quality-classifier margin (fastText/CCNet filtering
    * shape): a fixed-weight linear model over four surface features —
    * length credit, function-word density, bigram repetition mass,
    * and mean-word-length deviation — emitting the raw margin and the
    * keep/drop decision. This is the deployment half of the classic
    * quality-classifier filter; a trained deployment swaps the weight
    * constants, the plan is identical. Every feature and the margin
    * are exact BIGINT basis points (multiply-before-divide, floor
    * division), so the keep/drop boundary cannot flip between engines
    * the way a double sigmoid threshold can — the margin is monotone
    * in the logistic score, so thresholding it IS thresholding the
    * probability.
    *
    * Features (all per-row, zero shuffle):
    *   len_bps  = min(5000, 25·n_tok)            — length credit
    *   stop_bps = min(5000, ⌊stop·50000/n_tok⌋)  — function-word credit
    *   rep_bps  = 10000 − ⌊distinct₂·10000/total₂⌋ — repetition penalty
    *   wdev_mil = ⌊|10·chars − 45·n_tok|·100/n_tok⌋ — word-length dev
    * margin = 2·len_bps + 3·stop_bps − 4·rep_bps − wdev_mil − bias
    */
  def qualityLogit(text: Column, bias: Long = 8000L)
      : (Column, Column) = {
    val st = textStats(text)
    val nTok = st.getField("n_tok")
    val lenBps = lengthCreditBps(nTok)
    val stopBps = stopCreditBps(st.getField("stop"), nTok)
    val grams = graft.functions.TermFunctions.stringShingles(text, 2)
    val total = size(grams).cast("long")
    val dist = size(array_distinct(grams)).cast("long")
    val repBps = when(total > 0,
      lit(10000L) - floor(dist * lit(10000L) / total).cast("long"))
      .otherwise(lit(0L))
    // chars excluding separating spaces, vs the 4.5-char prose center
    val chars = (length(text) - nTok + lit(1)).cast("long")
    val wdevMil = floor(abs(chars * 10 - nTok * 45) * lit(100L) / nTok)
      .cast("long")
    val margin = lenBps * 2 + stopBps * 3 - repBps * 4 - wdevMil -
      lit(bias)
    (margin, when(margin >= 0, lit("keep")).otherwise(lit("drop")))
  }

  /** Zipf-law fit over the frequency-ranked vocabulary: OLS of
    * ln(frequency) against ln(rank) for the top-`topK` terms (ties →
    * lexicographic, a total order), slope ≈ −1 for natural language —
    * the standard "is this corpus shaped like text" diagnostic
    * (template/boilerplate corpora flatten the line or step it).
    * Complements the Heaps-law growth curve (`q_vocab_growth`):
    * growth watches NEW vocabulary arriving, this watches the
    * frequency SHAPE of the existing one.
    *
    * Determinism: both coordinates quantize to integer MICRO-NATS
    * (round(ln·1e6) → BIGINT) so every regression moment is an exact
    * integer sum — shuffle-order-safe, same contract as
    * [[graft.ops.Aggregates.linearFit]]; the closed forms evaluate
    * once on doubles and round to 4 decimals. Slope and Pearson r are
    * unit-free (µnat/µnat cancels); the INTERCEPT is in micro-nats —
    * divide by 1e6 to read the Zipf constant ln C. The ln itself runs on
    * identical integer inputs on both engines; a last-ulp divergence
    * would have to land within ~1e-15 of a micro-nat rounding
    * boundary to matter (the `q_unigram_lm` envelope).
    *
    * Scale posture: the vocabulary aggregate is map-side combined on
    * one term exchange; the top-K cut is a TakeOrderedAndProject
    * (never a global sort); the rank window runs over the K retained
    * rows only; the moment aggregate is one partial-combined pass
    * over K rows.
    */
  def zipfFit(docs: DataFrame, text: Column, topK: Int = 500): DataFrame = {
    import graft.functions.TermFunctions
    val tf = docs
      .select(explode(TermFunctions.termCounts(text)).as("e"))
      .groupBy(col("e.term").as("term"))
      .agg(sum(col("e.tf").cast("long")).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(topK)
    val ranked = tf.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("term"))).cast("long"))
    val pts = ranked.select(
      round(log(col("r").cast("double")) * 1e6).cast("long").as("x"),
      round(log(col("n").cast("double")) * 1e6).cast("long").as("y"))
    graft.ops.Aggregates.linearFit(pts, groupKeys = Seq.empty,
      x = col("x"), y = col("y"))
  }

  /** CCNet-style perplexity bucketing: score every doc against the
    * corpus-trained unigram LM ([[unigramCrossEntropy]]) and cut the
    * corpus into head / middle / tail thirds at exact nearest-rank
    * cross-entropy thresholds, reporting per-(source, bucket) doc
    * counts and mean bits — the released-pipeline step that keeps
    * head+middle and drops the noisy tail, with the per-source mix
    * showing WHICH domains the tail eats.
    *
    * Determinism + scale: thresholds are computed on MILLI-bit costs
    * through the bounded-domain histogram
    * ([[graft.ops.Aggregates.boundedGroupQuantiles]]) — the milli
    * domain is a few thousand distinct values at ANY corpus size,
    * where µbit resolution would make the histogram corpus-sized —
    * and docs bucket on the same milli value, so the cut is identical
    * on both engines and the histogram window never sees more rows
    * than the domain. Per-bucket means stay exact µbit BIGINT (floor
    * division). Docs with no scoreable tokens are omitted
    * (the [[unigramCrossEntropy]] contract).
    */
  def perplexityBuckets(docs: DataFrame, text: Column, id: Column,
                        source: Column): DataFrame = {
    // materialized once: the scored table has TWO consumers (the
    // threshold histogram and the bucket classification) and would
    // re-run the full two-pass LM per consumer. Lazy localCheckpoint —
    // per-invocation, so bench minima stay honest (the persist/
    // CacheManager dedup lesson).
    val scored = unigramCrossEntropy(docs, text, id)
      .withColumn("bits_milli",
        expr("CAST(bits_micro DIV 1000 AS BIGINT)"))
      .localCheckpoint(false)
    val thr = graft.ops.Aggregates.boundedGroupQuantiles(
        scored, lit(1), col("bits_milli"),
        Seq("t1" -> PerplexityHeadP, "t2" -> PerplexityMiddleP))
      .select("t1", "t2")
    scored
      .join(docs.select(id.as("doc_id"), source.as("source")), "doc_id")
      .crossJoin(broadcast(thr))
      .select(col("source"),
        when(col("bits_milli") <= col("t1"), lit("head"))
          .when(col("bits_milli") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"),
        col("bits_micro"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("bits_micro").as("__s"))
      .select(col("source"), col("bucket"), col("n_docs"),
        expr("CAST(__s DIV n_docs AS BIGINT)").as("mean_bits_micro"))
  }

  /** Moore–Lewis cross-entropy-difference selection (the intelligent-
    * selection / DSIR shape): score every doc by
    * H_target(doc) − H_corpus(doc) under two unigram LMs — one trained
    * on the in-domain `inTarget` slice (add-1 smoothed over the corpus
    * vocabulary, so out-of-target terms stay finite), one on the whole
    * corpus — and keep docs that look MORE like the target than like
    * the average (negative difference). This is the published recipe
    * for skimming a huge crawl for domain-relevant training data with
    * two cheap LMs instead of a classifier.
    *
    * Determinism: both per-term costs quantize to integer µbits; the
    * per-doc sum of tf·(ct − cc) is exact BIGINT, the keep/drop
    * decision compares THAT integer against zero (never a rounded
    * double), and the reported per-token mean is one double division
    * rounded to 4 (+0.0 folds −0.0).
    *
    * Scale posture: the same two-pass LM shape as
    * [[unigramCrossEntropy]] — vocabulary-sized aggregates (map-side
    * combined), the joint LM table broadcast back over one corpus
    * re-scan; per-doc aggregation rides distinct-term rows. Docs with
    * no scoreable tokens are omitted (same contract).
    */
  def mooreLewisScore(docs: DataFrame, text: Column, id: Column,
                      inTarget: Column): DataFrame = {
    import graft.functions.TermFunctions
    val dt = docs
      .select(id.as("doc_id"), inTarget.as("tgt"),
        explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("tgt"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"))
    val cf = dt.groupBy("term").agg(sum("tf").as("n"))
    val ctot = cf.agg(sum("n").as("nn"))
    val tf2 = dt.filter(col("tgt")).groupBy("term").agg(sum("tf").as("nt"))
    val vsize = cf.agg(count(lit(1)).as("v"))
    val ttot = tf2.agg(coalesce(sum("nt"), lit(0L)).as("nnt"))
    val lm = cf.join(tf2, Seq("term"), "left")
      .crossJoin(broadcast(ctot)).crossJoin(broadcast(ttot))
      .crossJoin(broadcast(vsize))
      .select(col("term"),
        round(-log(2.0, col("n").cast("double") / col("nn")) * 1e6)
          .cast("long").as("cc"),
        round(-log(2.0,
            (coalesce(col("nt"), lit(0L)) + lit(1L)).cast("double") /
              (col("nnt") + col("v")).cast("double")) * 1e6)
          .cast("long").as("ct"))
    dt.join(broadcast(lm), Seq("term"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * (col("ct") - col("cc"))).as("dsum"),
        sum("tf").as("n_tok"))
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("dsum").cast("long").as("ml_sum_micro"),
        (round(col("dsum").cast("double") / col("n_tok").cast("double"),
          4) + lit(0.0)).as("ml_bits"),
        when(col("dsum") < 0, lit("keep")).otherwise(lit("drop"))
          .as("label"))
  }

  /** Per-source corpus data card (the "datasheets for datasets"
    * deliverable): one row per source with doc count, token count,
    * token share of the corpus, mean quality score, and the dominant
    * language with its share — the composition table a dataset release
    * ships and a mixing step reads FIRST (share tells you what a
    * temperature re-weight will actually move; dominant-lang share
    * flags mislabeled or mixed-language sources before they poison a
    * monolingual run). All ratios exact BIGINT bps; the mean quality
    * is floor-division of the exact bps sum.
    *
    * Scale posture: two source-keyed aggregates over one corpus scan
    * each (map-side combined), a domain-sized dominant-lang election
    * (WindowGroupLimit), and domain-sized broadcasts — nothing
    * corpus-global at any size.
    */
  def dataCard(docs: DataFrame, text: Column, source: Column,
               lang: Column): DataFrame = {
    val base = docs.select(source.as("source"), lang.as("lang"),
      when(text.isNull, lit(0L))
        .otherwise(size(split(text, " ")).cast("long")).as("n_tok"),
      qualityBps(text).as("q"))
    val per = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
        sum("q").as("qsum"), count(col("q")).as("n_q"))
    val tot = per.agg(sum("n_tok").as("t"))
    val tl = graft.ops.Windows.findFirst(
        base.groupBy("source", "lang").agg(count(lit(1)).as("c")),
        keys = Seq(col("source")),
        priority = Seq(col("c").desc, col("lang")))
      .select(col("source"), col("lang").as("top_lang"),
        col("c").as("top_c"))
    per.join(broadcast(tl), Seq("source")).crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tok"),
        floor(col("n_tok") * lit(10000L) / col("t")).cast("long")
          .as("tok_share_bps"),
        // divide by the SCORED doc count (sum skips NULL quality from
        // null-text docs; dividing by n_docs would deflate the mean);
        // an all-null-text source reports NULL, not a fake zero
        when(col("n_q") === 0L, lit(null).cast("long"))
          .otherwise(expr("CAST(qsum DIV n_q AS BIGINT)"))
          .as("mean_quality_bps"),
        col("top_lang"),
        floor(col("top_c") * lit(10000L) / col("n_docs")).cast("long")
          .as("top_lang_bps"))
  }

  /** Data-driven blocklist filter (the C4/RefinedWeb bad-word rule as
    * a TABLE join, not a regex): per doc, total tokens, blocklisted
    * occurrences, density in exact bps, and the keep decision at
    * `maxBps`. The blocklist is a DataFrame, which is the shape that
    * survives production lists — a 100k-entry list compiled into a
    * regex alternation blows up the NFA and scans per pattern, while
    * a broadcast hash join costs the same lookup per token regardless
    * of list size (and the list can live in a table under version
    * control, updated without code changes). [[redact]] stays the
    * right tool for PATTERN-shaped scrubbing (emails, phone numbers);
    * this is the term-set rule.
    *
    * Determinism: counts and the bps division are exact BIGINT; the
    * keep decision compares integers. Docs with no tokens are omitted
    * (the termCounts frame contract). Scale posture: blocklist
    * broadcast once; one corpus scan, one doc-keyed aggregate riding
    * the kernel term counts — row-linear at any corpus or list size.
    */
  def blocklistFilter(docs: DataFrame, text: Column, id: Column,
                      blocklist: DataFrame, maxBps: Long): DataFrame = {
    import graft.functions.TermFunctions
    val dt = docs
      .select(id.as("doc_id"), explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").cast("long").as("tf"))
    // distinct: a duplicated blocklist entry would fan out the left
    // join and inflate BOTH counts (and flip keep decisions); list
    // hygiene is not the caller's problem
    dt.join(broadcast(blocklist.select(col("term")).distinct()
          .withColumn("__hit", lit(1L))),
        Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tok"),
        sum(when(col("__hit").isNotNull, col("tf")).otherwise(0L))
          .cast("long").as("n_bad"))
      .select(col("doc_id"), col("n_tok"), col("n_bad"),
        floor(col("n_bad") * lit(10000L) / col("n_tok")).cast("long")
          .as("bad_bps"))
      .withColumn("keep", col("bad_bps") <= maxBps)
  }

  /** PHRASE-level blocklist screen (the C4 rule as published: a page
    * containing ANY listed phrase is dropped, not density-thresholded
    * like [[blocklistFilter]]'s term rule): per doc, the number of
    * blocklisted two-word phrase occurrences and the keep decision
    * (keep = zero hits). The phrase list is a DataFrame of
    * space-joined bigrams — same versioned-table, size-independent
    * broadcast-join shape as the term rule; a regex alternation over
    * phrases is even worse than over terms (multi-word patterns
    * backtrack).
    *
    * Contract: docs with fewer than two tokens have no phrases to
    * match and are OMITTED (the shingle frame convention); a consumer
    * joining back treats absent as keep. Scale posture: one corpus
    * scan over the fused bigram kernel, one doc-keyed aggregate; the
    * deduplicated list broadcasts once.
    */
  def blocklistPhrases(docs: DataFrame, text: Column, id: Column,
                       phrases: DataFrame): DataFrame = {
    import graft.functions.TermFunctions
    docs
      .select(id.as("doc_id"),
        explode(TermFunctions.stringShingles(text, 2)).as("phrase"))
      .join(broadcast(phrases.select(col("phrase")).distinct()
          .withColumn("__hit", lit(1L))),
        Seq("phrase"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_phrases"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** DSIR hashed-ngram importance weights (the Xie-et-al data
    * selection recipe): per doc, log p_target/p_raw over HASHED bigram
    * features — bigrams bucketed into a FIXED k-cell space
    * (dim = hash(bigram) mod k), with both distributions add-1
    * smoothed over the k buckets. Where [[mooreLewisScore]] prices
    * whole-word unigrams against a vocabulary-sized LM (a table that
    * grows with the corpus and must be joined), the hashed feature
    * space is k rows by CONSTRUCTION at any corpus size — the two
    * distribution tables broadcast trivially forever, bigram features
    * see first-order sequence structure, and there is no vocabulary
    * state to ship (the reason the published pipeline scales to
    * full-crawl selection). Positive weight = the doc looks more like
    * the target slice than the raw corpus; importance resampling keeps
    * docs by weight rank.
    *
    * Determinism: per-bucket log-ratio deltas quantize to integer
    * µbits; the per-doc sum of cnt·delta is exact BIGINT
    * (shuffle-order-safe). Docs with no bigrams (< 2 tokens) are
    * omitted by the frame contract.
    *
    * Scale posture: one corpus scan builds the (doc, dim) counts and
    * both k-cell distributions (map-side combined); the delta table is
    * ≤ k rows, broadcast back over the doc-dim counts; nothing
    * vocabulary-sized anywhere.
    */
  def dsirWeights(docs: DataFrame, text: Column, id: Column,
                  inTarget: Column, k: Int = 256): DataFrame = {
    import graft.functions.TermFunctions
    require(k > 1, s"bucket count k must be > 1: $k")
    val f = docs
      .select(id.as("doc_id"), inTarget.as("tgt"),
        explode(TermFunctions.stringShingles(text, 2)).as("bg"))
      .select(col("doc_id"), col("tgt"),
        pmod(TextHash.baseHash(col("bg")), lit(k.toLong)).as("d"))
    val cnt = f.groupBy("doc_id", "d").agg(count(lit(1)).as("c"))
    val raw = f.groupBy("d").agg(count(lit(1)).as("nr"))
    val tg = f.filter(col("tgt")).groupBy("d").agg(count(lit(1)).as("nt"))
    val rt = raw.agg(sum("nr").as("nnr"))
    val tt = tg.agg(coalesce(sum("nt"), lit(0L)).as("nnt"))
    val delta = raw.join(tg, Seq("d"), "left")
      .crossJoin(broadcast(rt)).crossJoin(broadcast(tt))
      .select(col("d"),
        round((log(2.0,
            (coalesce(col("nt"), lit(0L)) + lit(1L)).cast("double") /
              (col("nnt") + lit(k.toLong)).cast("double")) -
          log(2.0,
            (col("nr") + lit(1L)).cast("double") /
              (col("nnr") + lit(k.toLong)).cast("double"))) * 1e6)
          .cast("long").as("delta"))
    cnt.join(broadcast(delta), Seq("d"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_feat"),
        sum(col("c") * col("delta")).cast("long").as("dsir_micro"))
  }

  /** Hashing-trick featurization (Weinberger et al.): map every doc
    * to a k-bucket sparse count vector, dim = hash(term) mod k, with
    * the SIGNED variant alongside (sign from the next hash bit, so
    * collision noise cancels in expectation — the property that makes
    * hashed features usable for linear classifiers). This is the
    * featurize step between curation and training a fastText-style
    * quality/language classifier, with no vocabulary table to build,
    * ship, or grow.
    *
    * Output: (doc_id, dim, cnt, sval) rows, ≤ min(k, distinct terms)
    * per doc — the sparse form downstream trainers consume directly.
    *
    * Determinism + scale: the dim/sign assignment is the portable
    * 48-bit md5 hash (the [[graft.ext.TextHash]] contract — DuckDB
    * replays it exactly); counts are exact BIGINT. One
    * map-side-combined (doc, dim) aggregate over kernel term counts;
    * no join, no vocabulary state, row-linear at any corpus size.
    */
  def featureHash(docs: DataFrame, text: Column, id: Column,
                  k: Int = 64): DataFrame = {
    import graft.functions.TermFunctions
    docs
      .select(id.as("doc_id"), explode(TermFunctions.termCounts(text)).as("e"))
      .select(col("doc_id"),
        (TextHash.baseHash(col("e.term")) % k).as("dim"),
        // the next hash "bit" (h mod 2k >= k) decides the sign: ±1 per
        // TERM, stable across docs, integer-only arithmetic
        when(TextHash.baseHash(col("e.term")) % (2 * k) >= k, lit(-1L))
          .otherwise(lit(1L)).as("sgn"),
        col("e.tf").cast("long").as("tf"))
      .groupBy("doc_id", "dim")
      .agg(sum("tf").as("cnt"), sum(col("sgn") * col("tf")).as("sval"))
  }

  /** In-engine logistic-regression training over the hashed feature
    * space ([[featureHash]] + a bias dimension): full-batch gradient
    * descent, `steps` passes at learning rate 1/2 — the "train the
    * fastText-style quality/language classifier WHERE the data lives"
    * step, closing the loop that [[qualityLogit]] scores with
    * hand-fixed weights. The model is k+1 integer µ-weights; margins
    * are exact-BIGINT sums of cnt·w_µ (a float dot product would be
    * hash-agg-order-dependent), the per-doc residual σ(margin) − y
    * quantizes to µ-units before the gradient sum, and the weight
    * update is one floor-quantized double division — so the ENTIRE
    * trajectory is integer state and DuckDB replays it to the last
    * digit (the q_kmeans discipline applied to a learner; the only
    * cross-engine exposure is exp()'s last ulp under the µ rounding,
    * the accepted µbit class).
    *
    * Scale posture: the feature frame materializes ONCE (lazy
    * localCheckpoint — per-invocation, so bench passes stay honest);
    * per step: one broadcast of the (k+1)-row weight table, one
    * doc-keyed margin aggregate, one doc-keyed residual join, one
    * k-cell gradient aggregate (map-side combined). Nothing grows
    * with the corpus except the two scans per step.
    */
  def lrTrain(docs: DataFrame, text: Column, id: Column, label: Column,
              k: Int = 64, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1, 8]: $steps")
    val fh = featureHash(docs, text, id, k)
      .select(col("doc_id"), col("dim"), col("cnt"))
    val bias = docs.select(id.as("doc_id"), lit(k.toLong).as("dim"),
      lit(1L).as("cnt"))
    val feats = fh.unionAll(bias).localCheckpoint(false)
    // labels and the corpus count are loop-invariant but were plan
    // subtrees: every step's checkpoint materialization re-scanned the
    // corpus for each (2·(steps−1) redundant scans — invisible at
    // sf0.1, corpus-sized at scale). Checkpoint once, like feats.
    val lab = docs.select(id.as("doc_id"), label.cast("long").as("y"))
      .localCheckpoint(false)
    val nf = docs.agg(count(lit(1)).as("nn")).localCheckpoint(false)
    val spark = docs.sparkSession
    var w = spark.range(k + 1L)
      .select(col("id").as("dim"), lit(0L).as("w_micro"))
    for (_ <- 1 to steps) {
      val margins = feats.join(broadcast(w), Seq("dim"))
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("w_micro")).as("mm"))
      val resid = margins.join(lab, Seq("doc_id"))
        .select(col("doc_id"),
          floor((lit(1.0) / (lit(1.0) +
              exp(-(col("mm").cast("double") / lit(1000000.0)))) -
            col("y").cast("double")) * 1000000.0 + 0.5)
            .cast("long").as("rq"))
      val grad = feats.join(resid, Seq("doc_id"))
        .groupBy("dim").agg(sum(col("cnt") * col("rq")).as("g"))
      // checkpoint the 65-row weight state: it feeds BOTH the next
      // step's broadcast and the update join, so an unmaterialized
      // lineage doubles per step (the q_mmr_diversify 2^k plan blowup)
      w = w.join(grad, Seq("dim"), "left").crossJoin(broadcast(nf))
        .select(col("dim"),
          (col("w_micro") - floor(coalesce(col("g"), lit(0L)).cast("double") /
            // nn = 0 (empty corpus) means g is already 0 for every dim
            // — clamp the divisor so the no-op step stays a no-op
            // instead of an ANSI divide-by-zero
            greatest(col("nn") * 2, lit(1L)) + 0.5).cast("long")).as("w_micro"))
        .localCheckpoint(false)
    }
    w
  }

  /** Bucket cut points for [[perplexityBuckets]] — ONE source of truth
    * for the Spark plan and the generated oracle literal (the double
    * must be bit-identical on both engines for the nearest-rank ceil
    * to agree).
    */
  val PerplexityHeadP: Double = 1.0 / 3
  val PerplexityMiddleP: Double = 2.0 / 3

  /** Interpolated (Jelinek–Mercer) bigram LM trained on the corpus:
    * p(w2|w1) = 0.9·n(w1,w2)/n(w1·) + 0.1·n(w2)/N, returned as a
    * (bigram, cost) table with cost = round(−log2(p)·1e6) µbits — the
    * step from [[trainUnigramLm]]'s bag-of-words toward the n-gram
    * LMs the published crawl-curation pipelines rank with (CCNet uses
    * a 5-gram KenLM; the bigram captures the first-order sequence
    * signal a unigram cannot: scrambled word salad scores exactly like
    * prose under a unigram, and visibly worse here). The context
    * denominator n(w1·) is the OUTGOING-bigram mass (Σ_w n(w1,w)), the
    * standard ML estimate; the 0.1 unigram mass keeps every observed
    * bigram's probability bounded away from the w1-conditional
    * extremes. λ literals are fixed doubles mirrored exactly in the
    * oracle — deriving 0.1 as 1.0−0.9 would yield a DIFFERENT double
    * (0.09999999999999998) and a cross-engine µbit flip.
    *
    * Scale posture: all three count tables are vocabulary-bounded
    * (bigram vocabulary grows sublinearly in corpus size — Heaps law —
    * and is the same artifact a shipped KenLM binarizes); the context
    * and unigram joins are vocab-sized equi-joins, the corpus is
    * scanned once. A 100 TB run materializes this table once and
    * feeds every scorer, batch and streaming.
    */
  def trainBigramLm(docs: DataFrame, text: Column): DataFrame = {
    import graft.functions.TermFunctions
    val big = docs
      .select(explode(TermFunctions.stringShingles(text, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).cast("long").as("n12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val ctx = big.groupBy("w1").agg(sum("n12").as("n1"))
    val uni = docs
      .select(explode(TermFunctions.termCounts(text)).as("e"))
      .groupBy(col("e.term").as("w2"))
      .agg(sum(col("e.tf").cast("long")).as("n2"))
    val tot = uni.agg(sum("n2").as("nn"))
    big.join(ctx, "w1").join(uni, "w2").crossJoin(broadcast(tot))
      .select(col("bigram"),
        round(-log(2.0,
          lit(0.9) * (col("n12").cast("double") / col("n1")) +
            lit(0.1) * (col("n2").cast("double") / col("nn"))) * 1e6)
          .cast("long").as("cost"))
  }

  /** Cross-source text-overlap matrix: for every ordered source pair
    * (a, b) sharing at least one distinct word n-gram shingle, the
    * share of a's shingle vocabulary that also occurs in b (exact
    * integer basis points) — the corpus-composition QA that surfaces
    * mirror/syndication structure BETWEEN domains before mixing
    * weights are chosen (two sources that are 80% the same text
    * should not both get full quota; doc-level containment cannot see
    * this because the shared text is spread across different docs).
    * Zero-overlap pairs are omitted (inner-join frame, mirrored by
    * the oracle); the matrix is asymmetric by construction
    * (overlap(a,b) normalizes by |a|).
    *
    * Scale posture: the candidate join is the shared-shingle
    * inverted-index shape on 8-byte hashes (the [[Dedup]] family's
    * cost class) — both sides are the SAME distinct (source, shingle)
    * frame shuffled on the shingle key, shuffle-hash-hinted so AQE
    * reuses one exchange; a shingle present in k sources contributes
    * k² pair rows, bounded by the domain size squared, never by
    * corpus rows. The per-source denominators ride a domain-sized
    * broadcast.
    */
  def sourceOverlap(docs: DataFrame, text: Column, source: Column,
                    n: Int = 3): DataFrame = {
    val sh = docs
      .select(source.as("src"),
        explode(array_distinct(
          graft.functions.HashFunctions.shingleHash48(text, n))).as("sh"))
      .distinct()
    val per = sh.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("src").as("src_a"), col("sh"))
    val b = sh.select(col("src").as("src_b"), col("sh"))
    a.join(b.hint("shuffle_hash"), Seq("sh"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(per.select(col("src").as("src_a"), col("n_sh"))),
        Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("n_sh").as("n_a"),
        col("n_shared"),
        floor(col("n_shared") * lit(10000L) / col("n_sh")).cast("long")
          .as("overlap_bps"))
      .orderBy("src_a", "src_b")
  }

  /** Per-doc cross-entropy under the corpus-trained interpolated
    * bigram LM ([[trainBigramLm]]): mean µbits per TRANSITION
    * (tokens 2..n — n_big = n_tok−1 transitions per doc). Trained and
    * scored on the same corpus, so every scored bigram is in the LM
    * by construction (no OOV path); docs with fewer than two tokens
    * have no transitions and are OMITTED, the same frame convention
    * as [[scoreAgainstLm]]. Costs are exact BIGINT µbits end-to-end
    * (shuffle-order-safe sums, floor-division mean).
    *
    * Scale posture: the honest two-pass shape — vocabulary-bounded LM
    * aggregation, then one corpus re-scan joining the broadcast LM.
    * Past the broadcast threshold (a web-scale bigram table) the
    * lever is a shuffle-hash join on the bigram key; the per-doc
    * rollup shape is unchanged.
    */
  def bigramCrossEntropy(docs: DataFrame, text: Column,
                         id: Column): DataFrame = {
    import graft.functions.TermFunctions
    val lm = trainBigramLm(docs, text)
    docs
      .select(id.as("doc_id"),
        explode(TermFunctions.stringShingles(text, 2)).as("bigram"))
      .join(broadcast(lm), Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_big"), sum("cost").as("cost"))
      .select(col("doc_id"), col("n_big"),
        expr("CAST(cost DIV n_big AS BIGINT)").as("bits_micro"))
  }
}
