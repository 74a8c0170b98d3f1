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
    val tok = tokens(text)
    docs
      .select(id.as("doc_id"), tok.as("tok"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("tok")) - 1, lit(stride)),
          start => slice(col("tok"), start + 1, lit(win)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("pos") * stride).cast("long").as("start_tok"),
        size(col("col")).cast("long").as("n_tok"),
        md5(array_join(col("col"), " ")).as("chunk_md5"))
  }
}
