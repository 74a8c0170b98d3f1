package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.model.Tables

/** Scratch: count Spark jobs + wall time of connectedComponents at a
  * given SF dir (evidence for the star-contraction rewrite).
  */
object CcJobs {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = Dedup.ngramJaccardPairs(
      Tables.load(spark, d, "documents"), col("text"), col("doc_id"),
      n = 3, threshold = 0.5).persist()
    pairs.count() // materialize input outside the measured window
    val t = new scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"[job] id=${j.jobId} ${(j.time - t.getOrElse(j.jobId, j.time)) / 1e3}%.2f s")
    })
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val n = Dedup.connectedComponents(pairs).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val jobs = tracker.getJobIdsForGroup(null).length - before
    println(f"[cc] rows=$n jobs=$jobs wall=$secs%.2f s")
    spark.stop()
  }
}
