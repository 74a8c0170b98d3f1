package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** Scratch: stage decomposition of q_gif_dedup / q_crossmodal_dedup —
  * the warm QueryJobs taskTime (23 s / 59 s) is 20x the codec
  * microbench cost; which stage holds the gap?
  */
object GifProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) tasks.addAndGet(m.executorRunTime)
        }
      })
    def time(name: String)(f: => Long): Unit = {
      tasks.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[gif] $name%-30s $wall%6.2f s  taskTime ${tasks.get() / 1e3}%7.2f s ($n rows)")
    }
    val ids = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id").repartition(32).localCheckpoint()
    time("ids warmup")(ids.count())
    for (r <- 1 to 2) {
      println(s"-- round $r --")
      val gifs = Multimodal.synthesizeGif(ids, col("doc_id"))
      time("gif synth")(gifs.count())
      time("gif synth+fp")(Multimodal.gifFingerprints(gifs).toDF().count())
      val fps = Multimodal.gifFingerprints(gifs).toDF()
        .filter(col("kind") === "gif" && col("fp").isNotNull)
        .select(col("media_id").as("doc_id"), col("fp"))
      time("synth+fp+pairs")(
        Dedup.simhashHammingPairs(fps, maxDist = 3, bands = 4, bits = 64)
          .count())
    }
    spark.stop()
  }
}
