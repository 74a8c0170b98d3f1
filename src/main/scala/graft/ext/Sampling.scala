package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextHash.{baseHash, tokens}

/** Training-corpus assembly operators ([EXT]): deterministic sampling
  * and sequence packing — the steps between "deduplicated documents"
  * and "token batches" in an LLM data pipeline.
  *
  * Both are built on the cross-engine 48-bit content hash (TextHash)
  * instead of RNG state: a row's fate depends only on its key, so
  * samples are reproducible across runs, engines, and cluster sizes,
  * and a re-run after adding data keeps every previously-kept row
  * (the property curation pipelines need for incremental refresh).
  *
  * Scale posture: sampling is a pure per-row filter (no shuffle,
  * pushes below later joins). Packing shuffles once on the shard key;
  * the per-shard window is the deliberate unit of parallelism — docs
  * pack greedily WITHIN a shard, shards stream independently, so no
  * global ordering bottleneck exists at any corpus size.
  */
object Sampling {

  /** Per-stratum deterministic sampling: keep a row iff
    * hash(key) mod 10000 < rate(stratum) * 10000 — i.e. rates are
    * basis-point exact. Strata absent from `rates` use `defaultRate`.
    * The usual knob for re-weighting a training mix (e.g. downsample
    * over-represented languages).
    */
  def hashSample(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double],
                 defaultRate: Double = 1.0): DataFrame = {
    def bps(r: Double): Int = {
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r")
      math.round(r * 10000).toInt
    }
    val cutoff = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(bps(defaultRate))) { case (acc, (s, r)) =>
        when(stratum === s, lit(bps(r))).otherwise(acc)
      }
    df.filter(baseHash(key.cast("string")) % 10000 < cutoff)
  }

  /** Deterministic train/validation/test assignment: each row lands in
    * a named split iff hash(key) mod 10000 falls in that split's
    * basis-point band (bands laid out in `splits` declaration order).
    * The standard holdout primitive for training pipelines, with the
    * same determinism contract as [[hashSample]]: a row's split depends
    * only on its key, so the assignment is stable across runs, engines,
    * cluster sizes, AND corpus growth — new documents never move an
    * existing document between splits (the leakage-safety property;
    * with RNG-based splitting, yesterday's training doc can become
    * today's eval doc). Because the hash is independent of any grouping
    * attribute, the split proportions hold within every stratum in
    * expectation. Pure per-row projection: zero shuffle.
    */
  def trainValTestSplit(df: DataFrame, key: Column,
                        splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val bands = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val h = baseHash(key.cast("string")) % 10000
    val assign = splits.map(_._1).zip(bands).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, hi)) =>
        when(h < hi, name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Leakage-safe holdout split: assign splits by NEAR-DUP CLUSTER,
    * not by document — the published dedup-aware eval hygiene
    * (near-identical docs straddling train/eval silently inflate eval
    * scores; Lee et al.'s dedup paper measures the effect). Every doc
    * in a cluster shares the cluster id as its split key (singletons
    * key on themselves), then [[trainValTestSplit]]'s deterministic
    * hash banding applies — so the no-straddle guarantee composes with
    * the stable-under-growth guarantee: adding documents can merge
    * clusters (moving a WHOLE cluster together) but never splits one
    * across sets.
    *
    * Scale posture: the cluster table is pair-graph-sized (≪ corpus)
    * and joins the corpus once on doc_id (broadcast when it fits);
    * everything after is the zero-shuffle hash projection.
    */
  def leakageSafeSplit(docs: DataFrame, id: Column, clusters: DataFrame,
                       splits: Seq[(String, Double)]): DataFrame = {
    // preserves the input frame (same contract as trainValTestSplit):
    // callers get their columns back plus split_key/split — no
    // corpus-sized re-join to recover text/source afterwards
    val keyed = docs.withColumn("__lss_id", id.cast("long"))
      .join(clusters.select(col("doc_id").as("__lss_id"),
        col("cluster_id")), Seq("__lss_id"), "left")
      .withColumn("split_key",
        coalesce(col("cluster_id"), col("__lss_id")).cast("long"))
      .drop("__lss_id", "cluster_id")
    trainValTestSplit(keyed, col("split_key"), splits)
  }

  /** Per-row weighted (Poisson) sampling: keep a row iff
    * hash(key) mod 10000 < min(10000, weightBps) — each row's inclusion
    * probability is its own weight in basis points, the importance-
    * sampling primitive (keep high-quality/long documents at full rate,
    * downsample boilerplate proportionally). Same determinism contract
    * as [[hashSample]]: fate depends only on the key, so re-runs and
    * engine changes keep the same rows, and raising a row's weight can
    * only ever ADD it (monotone — incremental refresh safe). Pure
    * per-row filter: zero shuffle, pushes below later ops.
    */
  def weightedHashSample(df: DataFrame, key: Column, weightBps: Column): DataFrame =
    df.filter(baseHash(key.cast("string")) % 10000 <
      least(lit(10000L), weightBps.cast("long")))

  /** Token-budget-aware source mixing: give every source an equal
    * token budget `capTokens` and derive its deterministic sampling
    * rate — rate_bps = min(10000, capTokens·10000 ÷ source_tokens) —
    * so over-represented sources are downsampled proportionally and
    * small sources pass through whole. THE re-balancing step of a
    * training-mix recipe ("cap every domain at N tokens"), expressed
    * as data: change the cap, rerun, and the same hash-sampling
    * determinism contract as [[hashSample]] keeps previously-selected
    * rows selected when the cap only goes up.
    *
    * Scale posture: the rate table is one row per source (bounded,
    * broadcast); the corpus is touched by one tiny aggregate and one
    * per-row filtered scan — no data-sized shuffle. Rate arithmetic is
    * multiply-then-floor-divide on BIGINTs (exact under 2^53), so the
    * DuckDB oracle reproduces every basis point.
    */
  def tokenBudgetMix(docs: DataFrame, id: Column, text: Column,
                     source: Column, capTokens: Long): DataFrame =
    tokenBudgetMixCounted(
      docs.select(id.as("doc_id"), source.as("source"),
        size(tokens(text)).cast("long").as("n_tok")),
      col("doc_id"), source = col("source"), nTok = col("n_tok"), capTokens)

  /** Packing-style "counted" overload of [[tokenBudgetMix]] (cf.
    * [[packCounted]]): the caller already holds a per-row token count —
    * the normal case in a pipeline whose earlier stage materialized
    * `n_tok` (q_token_count-style) — so the tokenizer never re-runs and
    * the corpus is scanned once for the rate aggregate and once for the
    * filter, both over the cheap counted projection. Output and rate
    * arithmetic are identical to the text form (the spec asserts it).
    */
  def tokenBudgetMixCounted(counted: DataFrame, id: Column, source: Column,
                            nTok: Column, capTokens: Long): DataFrame = {
    require(capTokens > 0, "capTokens must be positive")
    val base = counted.select(id.as("doc_id"), source.as("source"),
      nTok.cast("long").as("n_tok"))
    val rates = base.groupBy("source")
      .agg(sum(col("n_tok")).as("src_tok"))
      .select(col("source"), least(lit(10000L),
        floor(lit(capTokens * 10000L) / col("src_tok")).cast("long"))
        .as("rate_bps"))
    base.join(broadcast(rates), Seq("source"))
      .filter(baseHash(col("doc_id").cast("string")) % 10000 < col("rate_bps"))
      .select(col("doc_id"), col("source"), col("n_tok"))
  }

  /** Temperature-scaled source mixing at α = ½: allocate a global token
    * budget across sources proportionally to share^α — the standard
    * smoothing between proportional sampling (α = 1, big sources
    * dominate) and uniform ([[tokenBudgetMix]], the α = 0 limit where
    * every source gets the same cap). Since p_s ∝ (tok_s/T)^½ ∝
    * √tok_s, each source's target is budget·√tok_s ÷ Σ√tok_t, and its
    * deterministic per-row rate follows as in [[tokenBudgetMix]].
    *
    * α is FIXED at ½ by design, not a parameter: sqrt is the one
    * fractional power IEEE 754 defines correctly-rounded, so both
    * engines produce the identical double from the identical BIGINT
    * token sum — pow(x, α) for general α carries platform-dependent
    * final ulps that could flip a basis point (§7.5 determinism
    * contract). √tok floors to a BIGINT before the cross-source
    * normalizer sums it, so Σ√ is an exact integer too (summation
    * order cannot matter). Caller bound: budget·√tok_s < 2^53.
    *
    * Scale posture: identical to [[tokenBudgetMix]] — one tiny
    * per-source aggregate + a 1-row normalizer, both broadcast; the
    * corpus pays one counted scan and one per-row filter.
    */
  def temperatureMix(docs: DataFrame, id: Column, text: Column,
                     source: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val base = docs.select(id.as("doc_id"), source.as("source"),
      size(tokens(text)).cast("long").as("n_tok"))
    val st = base.groupBy("source")
      .agg(sum(col("n_tok")).as("src_tok"))
      .withColumn("qs", floor(sqrt(col("src_tok").cast("double"))).cast("long"))
    val norm = st.agg(sum("qs").as("qtot"))
    val rates = st.crossJoin(broadcast(norm))
      .select(col("source"), least(lit(10000L),
        floor(floor(lit(budgetTokens) * col("qs") / col("qtot")) * lit(10000L)
          / col("src_tok")).cast("long")).as("rate_bps"))
    base.join(broadcast(rates), Seq("source"))
      .filter(baseHash(col("doc_id").cast("string")) % 10000 < col("rate_bps"))
      .select(col("doc_id"), col("source"), col("n_tok"))
  }

  /** Deterministic weighted priority sampling WITHOUT replacement:
    * exactly k rows, chosen as the bottom-k of priority =
    * hash(key) ÷ weight — the deterministic twin of weighted
    * reservoir/bottom-k sampling (higher weight ⇒ systematically
    * smaller priority ⇒ more likely in the bottom-k). Unlike the
    * Bernoulli samplers above, the OUTPUT SIZE is exact — the contract
    * a "give me exactly 10k calibration docs, favor long ones" request
    * needs. Deterministic in (key, weight); raising ONLY a row's
    * weight can only improve its rank (monotone, refresh-safe).
    *
    * Scale posture: pure projection + TakeOrderedAndProject — each
    * partition keeps its local bottom-k and the driver merges k-sized
    * heaps; no shuffle of the corpus, no global sort materialization.
    */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // divide by the un-cast DOUBLE weight: fractional weights in (0,1)
    // are legal and must scale priority continuously (a long cast would
    // truncate 0.4 to 0 and silently drop the row despite the exact-k
    // contract). weight <= 0 means "never sample" (it would divide to
    // ±Infinity/NaN and sort unpredictably) — excluded BEFORE the
    // projection so the retained `weight` column keeps its source type.
    val w = weight.cast("double")
    df.filter(w > 0)
      .select(key.as("key"), weight.as("weight"),
        (baseHash(key.cast("string")).cast("double") / w).as("priority"))
      .orderBy(col("priority"), col("key"))
      .limit(k)
  }

  /** Per-GROUP exact-k priority sampling: the stratified form of
    * [[prioritySample]] — exactly k rows per group (fewer only when the
    * group is smaller), chosen as each group's bottom-k of the same
    * hash ÷ weight priority. The "k calibration docs PER SOURCE" /
    * "k eval rows per language" contract; determinism and fractional-
    * weight semantics identical to the global form.
    *
    * Scale posture: one shuffle on the group key into a rank window
    * that Spark optimizes to WindowGroupLimit — each task retains only
    * k rows per group before any sort materializes (plan-audited), so
    * a billion-row group costs its scan, not its sort.
    */
  def prioritySampleByGroup(df: DataFrame, key: Column, weight: Column,
                            group: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = weight.cast("double")
    df.filter(w > 0)
      .select(group.as("grp"), key.as("key"), weight.as("weight"),
        (baseHash(key.cast("string")).cast("double") / w).as("priority"))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("priority"), col("key"))))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Power-of-two length bucket of a token count: the smallest power
    * of two >= n (n floored at 1). Length-bucketed batching is the
    * standard padding-waste control for non-packed training/inference
    * batches — batches draw from one bucket, so pad cost per row is
    * bounded by the bucket's headroom. Pure projection; composes with
    * a groupBy(bucket) audit for the capacity-planning report.
    */
  def lengthBucket(nTok: Column): Column =
    pow(lit(2.0), ceil(log2(greatest(nTok.cast("double"), lit(1.0)))))
      .cast("long")

  /** Concat-and-split sequence packing: documents are laid end-to-end
    * in deterministic (shard, id) order and cut into `contextLen`-token
    * windows; each doc is labeled with the pack (window index) where
    * its first token lands and its token offset inside that pack —
    * what an LLM pretraining loader needs to materialize batches.
    * Sharding by content hash bounds the window state: packing is
    * greedy within a shard, and shards are independent units of
    * parallelism (one shuffle, no global sort).
    */
  def packSequences(docs: DataFrame, id: Column, text: Column,
                    contextLen: Int, shards: Int): DataFrame =
    packCounted(docs, id, size(tokens(text)), contextLen, shards)

  /** Packing core over precomputed token counts — lets any unit with a
    * known length pack (whole documents, or chunk rows from
    * [[chunkTokens]], the realistic loader-prep composition).
    */
  def packCounted(df: DataFrame, id: Column, nTok: Column,
                  contextLen: Int, shards: Int): DataFrame = {
    require(contextLen > 0 && shards > 0, "contextLen and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    df
      .select(id.as("doc_id"),
        (baseHash(id.cast("string")) % shards).as("shard"),
        nTok.cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(contextLen.toDouble))
          .cast("long").as("pack_id"),
        ((col("cum") - col("n_tok")) % contextLen).as("pack_offset"))
  }

  /** Sliding token-window chunking (RAG / long-doc training prep):
    * each document yields chunks of up to `win` tokens starting every
    * `stride` tokens (stride < win ⇒ overlapping context). One row per
    * chunk with its start offset, token count, and content digest.
    *
    * Pure projection + explode — no shuffle at any corpus size; chunk
    * identity is (doc_id, chunk_id), deterministic in the text alone.
    */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
                  win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0, "win and stride must be positive")
    // one fused byte pass per document (graft_token_windows): the
    // prior transform(sequence, s -> slice(tok, …)) lambda ran
    // interpreted and re-materialized the token array per window
    docs
      .select(id.as("doc_id"),
        posexplode(graft.functions.TermFunctions.tokenWindows(
          text, win, stride)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("pos") * stride).cast("long").as("start_tok"),
        col("col.n").cast("long").as("n_tok"),
        md5(col("col.txt")).as("chunk_md5"))
  }

  /** Token-budget quality cut (data pruning at a budget): keep the
    * highest-quality documents until `budget` tokens are filled — the
    * "we can afford to train on B tokens, take the best B" decision,
    * which is a token-WEIGHTED quantile of the quality score (a
    * doc-count quantile over-admits long low-quality docs). The
    * threshold is the lowest quality bucket still reached while the
    * running token mass above it is under budget; every doc at or
    * above it is kept, so the kept mass can overshoot by at most one
    * bucket (threshold granularity — documented, oracle-mirrored).
    * An under-budget corpus keeps everything.
    *
    * Scale posture: the histogram is bounded by the quality-bps
    * DOMAIN (≤ ~20k distinct values at any corpus size), so the
    * global cumulative window sees domain-sized rows, never the
    * corpus — the [[graft.ops.Aggregates]] bounded-quantile argument
    * with token weights; the threshold broadcasts back as one row.
    */
  def tokenBudgetCut(docs: DataFrame, text: Column, id: Column,
                     budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // null text carries no tokens and no score — excluded up front on
    // BOTH engines (the oracle filters identically) rather than
    // relying on null-ordering subtleties in the cumulative window
    val q = docs.filter(text.isNotNull).select(id.as("doc_id"),
      TextAnalysis.qualityBps(text).as("quality_bps"),
      size(split(text, " ")).cast("long").as("n_tok"))
    val h = q.groupBy("quality_bps").agg(sum("n_tok").as("tok"))
    val thr = h
      .withColumn("cum", sum("tok").over(
        Window.orderBy(col("quality_bps").desc)))
      .filter(col("cum") - col("tok") < budget)
      .agg(min("quality_bps").as("thr"))
    q.crossJoin(broadcast(thr))
      .filter(col("quality_bps") >= col("thr"))
      .select(col("doc_id"), col("quality_bps"), col("n_tok"))
  }

  /** Content-defined chunking (the Rabin/CDC boundary rule adapted to
    * token streams): a chunk ENDS at every token whose 48-bit content
    * hash ≡ 0 (mod `b`), so boundaries are properties of the TEXT, not
    * of positions — insert a sentence into a document and only the
    * chunks touching the insertion change, where [[chunkTokens]]'s
    * fixed grid shifts every downstream chunk (the property that makes
    * CDC the storage-dedup standard, and here lets chunk-level dedup
    * survive edits/insertions between crawl snapshots). Expected chunk
    * length is `b` tokens; a production path adds a max-length cap via
    * the sessionizer kernel (the cap needs a resetting counter, which
    * is a stateful scan, not a window).
    *
    * One row per chunk: (doc_id, chunk_idx, n_tok, chunk_md5), digest
    * over the space-joined tokens in order. Docs with null text yield
    * no rows (no token stream to cut).
    *
    * Scale posture: one doc-keyed window (the running boundary count)
    * and one (doc, chunk) aggregate riding the same exchange; the
    * within-chunk order is an sort_array fold, never an order-sensitive
    * collect. Nothing corpus-global at any size.
    */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
                b: Int): DataFrame = {
    require(b > 1, s"modulus b must be > 1: $b")
    val tok = docs
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "tok")))
      .withColumn("cut",
        when(pmod(baseHash(col("tok")), lit(b.toLong)) === 0, 1L)
          .otherwise(0L))
    tok
      .withColumn("chunk_idx",
        sum(col("cut")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos")))
          - col("cut"))
      .groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).as("n_tok"),
        sort_array(collect_list(struct(col("pos"), col("tok")))).as("st"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tok"),
        // field extraction via GetArrayStructFields (codegen'd), not a
        // transform lambda (CodegenFallback — the r17 interpreted-HOF
        // class): identical element mapping, stays in WSCG
        md5(array_join(col("st").getField("tok"), " "))
          .as("chunk_md5"))
  }

  /** T5-style span corruption (Raffel et al.): build
    * (corrupted input, target) training pairs by masking token spans —
    * span SEEDS are content-deterministic (48-bit hash of "docid:pos"
    * ≡ 0 mod `rate`), each seed masks 3 tokens, overlapping spans
    * merge into one run, run i is replaced by the sentinel `<Xi>` in
    * the input and introduces the masked tokens in the target (the
    * published denoising objective, reproducible across runs/engines
    * with no RNG state to ship). Docs with no seeded span pass through
    * with an empty target, never dropped.
    *
    * Output: (doc_id, n_masked, corrupted, target).
    *
    * Scale posture: three window passes (seed spreading, run starts,
    * run numbering) all ride ONE doc-keyed exchange; reassembly is
    * two doc-keyed aggregates with sort_array folds (never an
    * order-sensitive collect). Row-linear at any corpus size.
    */
  def spanCorrupt(docs: DataFrame, id: Column, text: Column,
                  rate: Int = 8): DataFrame = {
    require(rate > 1, s"rate must be > 1: $rate")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = docs
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "tok")))
      .withColumn("seed",
        pmod(baseHash(concat_ws(":", col("doc_id"), col("pos"))),
          lit(rate.toLong)) === 0)
    val masked = tok.withColumn("masked",
      col("seed") ||
        coalesce(lag(col("seed"), 1).over(w), lit(false)) ||
        coalesce(lag(col("seed"), 2).over(w), lit(false)))
    // materialize ONCE (lazy localCheckpoint — the cached-plan-reuse
    // hazard of persist() documented in SCALE.md): three consumers
    // (corrupted stream, targets, mask counts) would otherwise each
    // re-run the full window chain — measured as three doc-keyed
    // exchanges in the executed plan, now one (PlanAuditSpec pins it)
    val runs = masked
      .withColumn("run_start",
        col("masked") &&
          !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("run",
        sum(when(col("run_start"), 1L).otherwise(0L)).over(w))
      .localCheckpoint(false)
    val corrupted = runs
      .select(col("doc_id"),
        struct(col("pos"),
          when(!col("masked"), col("tok"))
            .when(col("run_start"),
              concat(lit("<X"), col("run").cast("string"), lit(">")))
            .otherwise(lit(null)).as("out")).as("st"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("st"))).as("sts"))
      .select(col("doc_id"),
        // GetArrayStructFields (codegen'd) instead of a transform
        // lambda, and the explicit isNotNull filter is dropped:
        // array_join SKIPS null elements when no null-replacement is
        // given — same output, two fewer interpreted HOFs in the
        // per-document hot path
        array_join(col("sts").getField("out"), " ").as("corrupted"))
    val targets = runs.filter(col("masked"))
      .groupBy("doc_id", "run")
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("sts"))
      .select(col("doc_id"), col("run"),
        concat(lit("<X"), col("run").cast("string"), lit("> "),
          array_join(col("sts").getField("tok"), " "))
          .as("run_str"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("run"), col("run_str"))))
        .as("rs"))
      .select(col("doc_id"),
        array_join(col("rs").getField("run_str"), " ")
          .as("target"))
    val nMasked = runs.groupBy("doc_id")
      .agg(sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
    corrupted.join(nMasked, Seq("doc_id"))
      .join(targets.select(col("doc_id"), col("target")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_masked"), col("corrupted"),
        coalesce(col("target"), lit("")).as("target"))
  }

  /** Deterministic negative sampling from the unigram^0.75
    * distribution (the word2vec/contrastive-training noise
    * distribution, Mikolov et al.): every token position draws one
    * negative term, where term j's probability mass ∝ count_j^0.75 —
    * the published tempering that keeps rare words reachable without
    * letting stopwords dominate. The draw is the content hash of
    * "neg:doc:pos" mod the total quantized mass mapped through the
    * vocabulary's cumulative intervals — reproducible across runs and
    * engines with no RNG state.
    *
    * Cross-engine exactness: n^0.75 is computed as sqrt(n·sqrt(n)) —
    * sqrt and multiply are IEEE correctly-rounded where pow() is not,
    * so the quantized weights are bit-identical on both engines; the
    * cumulative interval table is then exact BIGINT.
    *
    * Scale posture: the interval lookup is a BANDED equi-join — each
    * vocab interval explodes to the mass bands it spans and draws
    * join on their band, so the match is hash-partitionable (never a
    * nested-loop range probe). The band width adapts to the total
    * mass (~8 bands per vocab term on average), keeping the exploded
    * table VOCABULARY-bounded at any corpus size; it and the 1-row
    * stats broadcast. Row-linear in corpus tokens.
    */
  def negativeSamples(docs: DataFrame, id: Column, text: Column,
                      scale: Long = 1000L): DataFrame = {
    import graft.functions.TermFunctions
    val tf = docs.select(explode(TermFunctions.termCounts(text)).as("e"))
      .groupBy(col("e.term").as("term"))
      .agg(sum(col("e.tf").cast("long")).as("n"))
    val cum = tf.select(col("term"),
        floor(sqrt(col("n").cast("double") * sqrt(col("n").cast("double")))
          * scale + 0.5).cast("long").as("w"))
      .withColumn("hi", sum("w").over(Window.orderBy("term")))
      .withColumn("lo", col("hi") - col("w"))
    // band width ADAPTS to the mass: ~8 bands per vocab term on
    // average, so the exploded table stays vocabulary-bounded at any
    // corpus size (a fixed width would make it mass-sized: one
    // 10^6-count term alone would explode to thousands of band rows,
    // and the broadcast below would grow with the corpus)
    val stats = cum.agg(max("hi").as("t"), count(lit(1)).as("v"))
    val banded = cum.crossJoin(broadcast(stats))
      .withColumn("band", greatest(lit(1L), expr("t DIV (v * 8)")))
      .select(col("term").as("neg_term"), col("lo"), col("hi"),
        col("band"),
        explode(sequence(expr("lo DIV band"), expr("(hi - 1) DIV band")))
          .as("b"))
    docs.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "term")))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("term"),
        pmod(baseHash(concat_ws(":", lit("neg"), col("doc_id"),
          col("pos"))), col("t")).as("u"),
        greatest(lit(1L), expr("t DIV (v * 8)")).as("band"))
      .withColumn("b", expr("u DIV band"))
      .join(broadcast(banded.drop("band")), Seq("b"))
      .filter(col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("doc_id"), col("pos"), col("term"), col("neg_term"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al., "Efficient
    * Training of Language Models to Fill in the Middle"): split every
    * doc at two content-deterministic token cuts and emit the PSM
    * reordering `<PRE> prefix <SUF> suffix <MID> middle` — the
    * data-side half of FIM training (the model learns infilling from
    * reordered plain text; the published recipe applies it to a
    * fraction of docs, here every doc with the rate decision left to
    * the caller's filter). Cut points are hashes of "docid:1/2" mod
    * n_tok, so the transform is reproducible with no RNG state;
    * coincident cuts yield an empty middle, cuts at the edges an
    * empty prefix/suffix — all legal FIM examples.
    *
    * Pure per-row projection (slice + join on the token array):
    * ZERO shuffle at any corpus size. Null text is omitted (no token
    * array to cut).
    */
  def fimTransform(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = tokens(text)
    val n = size(tok)
    val c1 = pmod(baseHash(concat_ws(":", id, lit(1))), n)
    val c2 = pmod(baseHash(concat_ws(":", id, lit(2))), n)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    docs.filter(text.isNotNull)
      .select(id.as("doc_id"), n.cast("long").as("n_tok"),
        lo.cast("long").as("lo"), hi.cast("long").as("hi"),
        concat(lit("<PRE> "), array_join(slice(tok, lit(1), lo), " "),
          lit(" <SUF> "), array_join(slice(tok, hi + 1, n - hi), " "),
          lit(" <MID> "), array_join(slice(tok, lo + 1, hi - lo), " "))
          .as("fim"))
  }

  /** Deterministic source-interleaved training order: assign every doc
    * a global `slot` such that reading in slot order round-robins
    * across sources — position p of source s lands at
    * slot = (p−1)·n_sources + rank(s). Long single-source runs in a
    * training shard (loss spikes, momentum skew toward whichever
    * domain came last) are the failure this prevents; interleaving by
    * construction beats global RNG shuffles because it is stable,
    * engine-portable, and preserves each source's internal order.
    * Slots are unique and monotone but GAPPY once smaller sources
    * exhaust — an ordering key, not a dense index.
    *
    * Scale posture: no corpus-global window — per-source positions
    * ride ONE source-keyed window exchange; the source-rank table is
    * domain-sized and broadcast, n_sources is one broadcast scalar.
    */
  def interleaveOrder(docs: DataFrame, id: Column,
                      source: Column): DataFrame = {
    // a doc with UNKNOWN source can't be round-robined; excluding it
    // here (not just at the join) keeps the rank space dense and n_src
    // honest (null-fixture class)
    val ranked = docs.select(source.as("source"))
      .filter(col("source").isNotNull).distinct()
      .withColumn("src_rank",
        (row_number().over(Window.orderBy("source")) - 1).cast("long"))
    val nSrc = ranked.agg(count(lit(1)).as("n_src"))
    docs.select(id.as("doc_id"), source.as("source"))
      .withColumn("p", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id")))
        .cast("long"))
      .join(broadcast(ranked), "source")
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("p"),
        ((col("p") - 1) * col("n_src") + col("src_rank")).as("slot"))
  }
}
