package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden e2e for the composed pretraining-prep pipeline: the point is
  * operator INTEROP — every stage's frame must feed the next without
  * adapters, and the funnel invariants must hold end to end.
  */
class PretrainDemoSpec extends SparkSpec {
  import spark.implicits._

  test("pretrain pipeline: monotone funnel, budget honored, shard invariants") {
    val out = java.nio.file.Files.createTempDirectory("pretrain").toString
    val budget = 15000L
    val funnel = PretrainDemo.run(spark, "/root/testdata/sf0.001", out,
      budget).toMap
    // all stages present, docs monotone non-increasing down the funnel
    val order = Seq("raw", "filtered", "deduped", "decontaminated",
      "budgeted")
    assert(funnel.keySet == order.toSet)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a)._1 >= funnel(b)._1, s"$a -> $b grew")
    }
    // every stage cut something on this corpus (the gates all bite)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a)._1 > funnel(b)._1, s"$a -> $b was a no-op")
    }
    // budget honored: supply exceeded it, so kept tokens reach the
    // budget and overshoot by at most one quality bucket (well under
    // 20% here)
    val keptTok = funnel("budgeted")._2
    assert(funnel("decontaminated")._2 > budget)
    assert(keptTok >= budget && keptTok <= budget * 12 / 10,
      s"kept tokens $keptTok vs budget $budget")
    // shard table: one training pair per budgeted doc, slots unique,
    // reconstruction columns present
    val shards = spark.read.parquet(s"$out/shards")
    assert(shards.count() == funnel("budgeted")._1)
    assert(shards.select("slot").distinct().count() == shards.count())
    assert(shards.columns.toSet ==
      Set("doc_id", "n_masked", "corrupted", "target", "slot"))
    // data cards: post-curation sources are a subset of pre-curation,
    // and the post card's doc total reconciles with the funnel
    val pre = spark.read.parquet(s"$out/card_pre")
    val post = spark.read.parquet(s"$out/card_post")
    val preSrc = pre.select("source").as[String].collect().toSet
    val postSrc = post.select("source").as[String].collect().toSet
    assert(postSrc.subsetOf(preSrc))
    assert(post.agg(sum("n_docs")).as[Long].head() ==
      funnel("budgeted")._1)
    // dedup QA table exists and its cluster mass is within the corpus
    val sizes = spark.read.parquet(s"$out/dedup_sizes")
    assert(sizes.agg(sum(col("sz") * col("n_clusters"))).as[Long].head()
      <= funnel("filtered")._1)
    // promote ran: no staging residue after a clean run
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/.staging")))
  }

  test("staged-promote crash safety: mid-pipeline failure leaves promoted " +
      "outputs intact; corrected re-run completes over leftover staging") {
    import java.nio.file.{Files, Paths}
    val out = java.nio.file.Files.createTempDirectory("pretrain_crash").toString
    // successful first run establishes the "previous outputs" state
    PretrainDemo.run(spark, "/root/testdata/sf0.001", out, 15000L)
    def state() = Seq("card_pre", "dedup_sizes", "shards", "card_post")
      .map(t => t -> spark.read.parquet(s"$out/$t").count()).toMap
    val before = state()
    val shardsBefore = spark.read.parquet(s"$out/shards")
      .select("doc_id", "slot").as[(Long, Long)].collect().toSet

    // genuine mid-pipeline crash, not a test seam: the token-budget
    // guard (tokenBudgetCut require(budget > 0)) fires at stage 4 —
    // AFTER card_pre and dedup_sizes are staged, BEFORE shards/post
    // card are written or anything is promoted
    val e = intercept[IllegalArgumentException] {
      PretrainDemo.run(spark, "/root/testdata/sf0.001", out, -1L)
    }
    assert(e.getMessage.contains("budget must be positive"))
    // every previously-promoted output is untouched — promote never ran
    assert(state() == before)
    assert(spark.read.parquet(s"$out/shards")
      .select("doc_id", "slot").as[(Long, Long)].collect().toSet ==
      shardsBefore)
    // the crash leaves an inert staging dir behind (never promoted)
    assert(Files.exists(Paths.get(s"$out/.staging")))

    // corrected re-run completes idempotently over the leftover staging
    PretrainDemo.run(spark, "/root/testdata/sf0.001", out, 15000L)
    assert(state() == before)
    assert(spark.read.parquet(s"$out/shards")
      .select("doc_id", "slot").as[(Long, Long)].collect().toSet ==
      shardsBefore)
    assert(!Files.exists(Paths.get(s"$out/.staging")))
  }
}
