package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}

/** Per-leg wall breakdown of the q_ann_refresh lifecycle — the probe
  * behind the commit-floor work (VERDICT r16 #1): which serial job rung
  * actually costs what at sf0.1.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (m, subDim) = (4, 16)
    def leg[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val n = Similarity.withNorm(
      graft.model.Tables.load(spark, sfDir, "embeddings"),
      col("vec_id"), col("embedding"), dim = 64)
    for (round <- 1 to 4) {
      // rounds 3-4 probe the AQE tax on the tiny lifecycle jobs
      if (round >= 3) spark.conf.set("spark.sql.adaptive.enabled", "false")
      println(s"[annprobe] --- round $round (aqe=" +
        spark.conf.get("spark.sql.adaptive.enabled") + ") ---")
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_" +
        s"${ProcessHandle.current().pid()}_$round"
      graft.ops.Staging.deleteTree(dir)
      val corpus = n.filter(col("vec_id") % 2 === 0)
      leg("probe ivf isEmpty")(
        corpus.filter(col("vec_id") % 100 === 0).isEmpty)
      leg("probe pq isEmpty")(
        corpus.filter(col("vec_id") % 100 === 0).isEmpty)
      val seeds = corpus.filter(col("vec_id") % 100 === 0)
      val centPlan = leg("kmeansRefine plan") {
        Similarity.centroidFrame(
          Similarity.kmeansRefine(corpus, seeds, 1))
          .select(col("cid").as("icell"), col("cv"), col("cn"))
      }
      leg("cent localCheckpoint(false)")(centPlan.localCheckpoint(false))
      val pqPlan = leg("pqTrain plan")(
        Similarity.pqTrain(corpus, m, subDim, col("vec_id") % 100 === 0))
      leg("pq localCheckpoint(false)")(pqPlan.localCheckpoint(false))
      val trained = leg("train (lazy)") {
        AnnIndex.train(corpus, m, subDim, lloydIters = 1)
      }
      leg("write v1 (full)")(trained.write(dir))
      val r1 = leg("read v1")(AnnIndex.read(spark, dir))
      val refreshed = leg("refresh (lazy)")(
        r1.refresh(n.filter(col("vec_id") % 2 === 1)))
      val committed = leg("write v2 (delta)")(refreshed.write(dir))
      leg("search from committed") {
        committed.search(n.filter(col("vec_id").isin(1, 2, 3, 4)),
          k = 5, nprobe = 3).orderBy("qid", "rnk").collect()
      }
      leg("search from re-read") {
        AnnIndex.read(spark, dir)
          .search(n.filter(col("vec_id").isin(1, 2, 3, 4)),
            k = 5, nprobe = 3).orderBy("qid", "rnk").collect()
      }
    }
    spark.stop()
  }
}
