package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the durable seen-shingle index: the id-ordered-batches ==
  * full-corpus novelty property held across the durable round trip,
  * segment-incremental commits, and the zero-Exchange contract on the
  * index side of the anti-join chain (the claim
  * [[TextAnalysis.noveltyRateIncremental]]'s scaladoc makes).
  */
class NoveltyIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) = ids.map(i =>
    (i, s"w${i % 6} w${(i + 1) % 6} w${(i + 2) % 6} w${i % 4} w${i % 9}"))
    .toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_shingles", "n_novel", "novelty_bps")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("durable loop over id-ordered batches reproduces the full-corpus " +
      "noveltyRate; commits are segment-incremental; day-1 untouched") {
    val dir = java.nio.file.Files.createTempDirectory("novidx").toString
    val all = mkDocs(1L to 30L)
    val Seq(b1, b2, b3) = Seq(1L to 10L, 11L to 20L, 21L to 30L).map(mkDocs)
    val full = rows(TextAnalysis.noveltyRate(all, col("text"), col("doc_id"), 3))

    // day 1: the batch IS the corpus — full-corpus form, then build+commit
    val r1 = rows(TextAnalysis.noveltyRate(b1, col("text"), col("doc_id"), 3))
    NoveltyIndex.build(b1, col("text"), col("doc_id"), n = 3).write(dir)

    // day 2/3: read → novelty → update → write
    val i2 = NoveltyIndex.read(spark, dir)
    val r2 = rows(i2.novelty(b2, col("text"), col("doc_id")))
    i2.update(b2, col("text"), col("doc_id")).write(dir)
    val s1After2 = graft.ops.Staging.list(s"$dir/segments").toSet
    assert(s1After2 == Set("s1", "s2"), s1After2)

    val i3 = NoveltyIndex.read(spark, dir)
    val r3 = rows(i3.novelty(b3, col("text"), col("doc_id")))
    i3.update(b3, col("text"), col("doc_id")).write(dir)
    assert(graft.ops.Staging.list(s"$dir/segments").toSet ==
      Set("s1", "s2", "s3"))

    assert((r1 ++ r2 ++ r3) == full,
      s"durable incremental loop diverged from the full corpus")

    // the accumulated set is an exact disjoint union: stored seen ==
    // the corpus's distinct shingles
    val r4 = NoveltyIndex.read(spark, dir)
    val expect = all.select(explode(array_distinct(
        graft.functions.HashFunctions.shingleHash48(col("text"), 3))).as("sh"))
      .distinct().count()
    assert(r4.seen.count() == expect)
    assert(r4.seen.distinct().count() == expect, "segments overlap")

    // compact → one segment, same set
    NoveltyIndex.compact(spark, dir)
    val rc = NoveltyIndex.read(spark, dir)
    assert(rc.segs.size == 1 && rc.seen.count() == expect)
  }

  test("empty-delta commit: a batch of already-seen content (zero new " +
      "shingles) never bricks the stored index") {
    val dir = java.nio.file.Files.createTempDirectory("novidx_empty").toString
    val b1 = mkDocs(1L to 10L)
    NoveltyIndex.build(b1, col("text"), col("doc_id"), n = 3).write(dir)
    val before = NoveltyIndex.read(spark, dir).seen.count()
    // re-crawl of existing pages under new ids: every shingle already
    // seen ⇒ empty delta — pre-fix the empty bucketed segment had no
    // schema-bearing files and every later read threw
    val recrawl = mkDocs(1L to 10L)
      .withColumn("doc_id", col("doc_id") + 1000L)
    val i2 = NoveltyIndex.read(spark, dir)
      .update(recrawl, col("text"), col("doc_id"))
    i2.write(dir)
    val r = NoveltyIndex.read(spark, dir) // must not throw
    assert(r.seen.count() == before)
    // reports and further updates keep working
    val rep = rows(r.novelty(mkDocs(31L to 33L), col("text"), col("doc_id")))
    assert(rep.nonEmpty)
    r.update(mkDocs(31L to 33L), col("text"), col("doc_id")).write(dir)
    assert(NoveltyIndex.read(spark, dir).seen.count() > before)
  }

  test("plan: the index side of every anti-join in the chain reads its " +
      "bucket files with NO Exchange (the 100 TB novelty-refresh cost)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val dir = java.nio.file.Files.createTempDirectory("novidx_plan").toString
    val Seq(b1, b2, b3) = Seq(1L to 10L, 11L to 20L, 21L to 30L).map(mkDocs)
    NoveltyIndex.build(b1, col("text"), col("doc_id"), n = 3).write(dir)
    val i2 = NoveltyIndex.read(spark, dir)
    i2.update(b2, col("text"), col("doc_id")).write(dir)
    // two stored segments now; static plan audit (adaptive off), and
    // broadcast off — at corpus scale the index side could never
    // broadcast, so the plan that matters is the non-broadcast one
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = NoveltyIndex.read(spark, dir)
      assert(idx.segs.size == 2)
      val df = idx.novelty(b3, col("text"), col("doc_id"))
      val plan = df.queryExecution.executedPlan
      val antis = plan.collect {
        case j: BaseJoinExec if j.joinType == LeftAnti => j
      }
      assert(antis.size == 2, s"expected one anti-join per segment:\n$plan")
      antis.foreach { j =>
        assert(j.right.collectFirst { case e: ShuffleExchangeExec => e }.isEmpty,
          s"index side re-shuffled:\n${j.right}")
        val scan = j.right.collectFirst { case f: FileSourceScanExec => f }
          .getOrElse(fail(s"no file scan on the index side:\n${j.right}"))
        assert(scan.bucketedScan, s"index scan not bucketed:\n$scan")
      }
      // and the result over the bucketed reads stays correct
      assert(rows(df) == rows(TextAnalysis.noveltyRateIncremental(
        b3, col("text"), col("doc_id"), 3, idx.seen)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
