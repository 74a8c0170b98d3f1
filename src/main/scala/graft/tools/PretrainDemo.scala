package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, TextAnalysis}
import graft.model.Tables
import graft.ops.Aggregates

/** End-to-end pretraining-corpus preparation: the full modern curation
  * chain composed from the library's operators, each stage feeding the
  * next —
  *
  *   raw → data card → blocklist + per-source quality filter →
  *   near-dup canonicalization (ONE pair enumeration via
  *   [[Dedup.dupGraph]]) → Bloom 13-gram decontamination vs an eval
  *   slice → token-budget cut → source-interleaved ordering →
  *   span-corruption training pairs → shard write → post data card.
  *
  * This is the composition the 200+ independent suite queries
  * deliberately do not share (per-query isolation is the bench
  * contract); the demo is how a real run wires them: filters are
  * pushed before the expensive pair enumeration, the dup graph is
  * built once and consumed twice (canonical election + the funnel
  * audit), and every stage is a DataFrame a downstream consumer could
  * branch from. Prints the funnel (docs and tokens per stage).
  *
  * Usage: PretrainDemo [sfDir] [outRoot] [tokenBudget]
  */
object PretrainDemo {

  /** Runs the pipeline; returns the per-stage funnel
    * (stage name → (docs, tokens)) for the spec to audit.
    */
  def run(spark: SparkSession, sfDir: String, out: String,
          budget: Long): Seq[(String, (Long, Long))] = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    def funnelRow(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(size(split(col("text"), " ")).cast("long"))).collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val funnel = scala.collection.mutable.ArrayBuffer.empty[(String, (Long, Long))]
    def stage(name: String, df: DataFrame): DataFrame = {
      funnel += name -> funnelRow(df)
      df
    }

    // staged-promote (the Import.scala discipline applied to the EXT
    // pipeline): every output lands under $out/.staging first and is
    // promoted into place only after the WHOLE chain succeeds. A crash
    // mid-pipeline — after some staged writes, before promote — leaves
    // any previously-promoted outputs untouched and an inert staging
    // dir behind; the re-run overwrites the leftover staging and
    // promotes atomically per table (weaker than ACID across tables,
    // documented: moves are ordered, each individually atomic).
    val staging = s"$out/.staging"

    stage("raw", docs)
    TextAnalysis.dataCard(docs, col("text"), col("source"), col("lang"))
      .write.mode("overwrite").parquet(s"$staging/card_pre")

    // 1. cheap per-row gates FIRST, before anything pair-shaped:
    //    term blocklist density + a per-source quality floor (bottom
    //    quartile of each source dropped — fair across domains)
    val bl = Seq("slow", "legacy").toDF("term")
    val keepBl = TextAnalysis.blocklistFilter(docs, col("text"),
        col("doc_id"), bl, maxBps = 2000L)
      .filter(col("keep")).select("doc_id")
    val keepQ = Aggregates.percentileRankBoundedBy(
        docs.select(col("doc_id"), col("source"),
          TextAnalysis.qualityBps(col("text")).as("qb")),
        col("source"), col("qb"))
      .filter(col("pct") >= 0.25).select("doc_id")
    val filtered = stage("filtered",
      docs.join(keepBl, Seq("doc_id"), "left_semi")
        .join(keepQ, Seq("doc_id"), "left_semi"))

    // 2. near-dup canonicalization: ONE pair enumeration, quality
    //    election (best member of each cluster survives)
    val g = Dedup.dupGraph(filtered, col("text"), col("doc_id"))
    val deduped = try {
      val surv = g.canonical(filtered, col("doc_id"),
        TextAnalysis.qualityBps(col("text"))).select("doc_id")
      // checkpoint FIRST: the funnel count below is the action that
      // materializes it, so the canonical election (and its HOF score
      // projection) runs exactly once — and before unpersist releases
      // the pair cache it reads through
      val d = filtered.join(surv, Seq("doc_id"), "left_semi")
        .localCheckpoint(false)
      stage("deduped", d)
      g.sizes.write.mode("overwrite").parquet(s"$staging/dedup_sizes")
      d
    } finally g.unpersist()

    // 3. decontamination: Bloom-prefiltered exact 13-gram screen
    //    against the eval slice (every 100th doc stands in for a
    //    held-out benchmark)
    val eval = docs.filter(col("doc_id") % 100 === 0)
    val dirty = TextAnalysis.contaminatedBloom(deduped, eval,
      col("text"), col("doc_id"), n = 13, minShared = 1)
    val decon = stage("decontaminated",
      deduped.join(dirty.select("doc_id"), Seq("doc_id"), "left_anti"))

    // 4. token budget: keep the best docs until the budget fills
    val kept = Sampling.tokenBudgetCut(decon, col("text"), col("doc_id"),
      budget)
    val budgeted = stage("budgeted",
      decon.join(kept.select("doc_id"), Seq("doc_id"), "left_semi"))

    // 5-6. deterministic source-interleaved order + span-corruption
    //      training pairs, written together as the shard table
    val slots = Sampling.interleaveOrder(budgeted, col("doc_id"),
      col("source"))
    val pairs = Sampling.spanCorrupt(budgeted, col("doc_id"), col("text"))
    pairs.join(slots.select("doc_id", "slot"), Seq("doc_id"))
      .orderBy("slot")
      .write.mode("overwrite").parquet(s"$staging/shards")

    TextAnalysis.dataCard(budgeted, col("text"), col("source"),
        col("lang"))
      .write.mode("overwrite").parquet(s"$staging/card_post")
    promote(out, Seq("card_pre", "dedup_sizes", "shards", "card_post"))
    funnel.toSeq
  }

  /** Promote every staged table into place via the ONE audited
    * staged-promote implementation ([[graft.ops.Staging.promote]]).
    * Runs only after the whole chain has succeeded — the crash-safety
    * boundary PretrainDemoSpec exercises with a genuine mid-pipeline
    * failure.
    */
  private def promote(out: String, tables: Seq[String]): Unit =
    graft.ops.Staging.promote(out, tables)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft-pretrain-demo"
    val budget = if (args.length > 2) args(2).toLong else 200000L
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val funnel = run(spark, sfDir, out, budget)
    funnel.foreach { case (name, (n, tok)) =>
      println(f"[pretrain] $name%-15s $n%7d docs  $tok%9d tokens")
    }
    println(f"[pretrain] shards + cards under $out " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
