package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Graph}
import graft.model.Tables

/** Scratch: job count + per-phase wall time of q_pagerank's plan at a
  * given SF dir (evidence for the checkpoint/AQE shaping decisions).
  */
object PrJobs {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = new scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"[job] id=${j.jobId} ${(j.time - t.getOrElse(j.jobId, j.time)) / 1e3}%.2f s")
    })
    val tracker = spark.sparkContext.statusTracker
    (1 to 3).foreach { pass =>
      val before = tracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val edges = Dedup.fuzzyPairs(Tables.load(spark, d, "part"),
        col("p_name"), substring_index(col("p_name"), " ", -1), maxDist = 4)
      val n = Graph.pagerankFixedPoint(edges,
        col("name_a"), col("name_b"), iters = 2).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val jobs = tracker.getJobIdsForGroup(null).length - before
      println(f"[pr] pass=$pass rows=$n jobs=$jobs wall=$secs%.2f s")
    }
    spark.stop()
  }
}
