package graft.ext

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Scratch: the SAME per-id video/gif/image synthesis loop (distinct
  * ids, like the fixture queries) run (a) driver-side on a thread
  * pool and (b) as a bare 32-partition Spark job — isolates whether
  * the ~100x CPU inflation QueryJobs saw lives in the codec work
  * itself or in the Spark task context.
  */
object SynthProbe {
  def videoItem(mid: Long): Long = {
    val bytes =
      if (mid % 19 == 11) Multimodal.mjpegMp4(Seq(
        Multimodal.jpegForFp(Multimodal.targetFp(mid)),
        Multimodal.jpegForFp(Multimodal.fillerFp(mid)))).take(40)
      else Multimodal.mjpegMp4(Seq(
        Multimodal.jpegForFp(Multimodal.targetFp(mid)),
        Multimodal.jpegForFp(Multimodal.fillerFp(mid))))
    bytes.length.toLong
  }
  def videoDecodeItem(payload: Array[Byte]): Long =
    Multimodal.extractMp4SyncSamples(payload).map { d =>
      d.frames.map { case (_, _, b) =>
        Multimodal.decodeVideoFrame(d.codec, b).map(_.getWidth.toLong)
          .getOrElse(0L)
      }.sum
    }.getOrElse(0L)

  def main(args: Array[String]): Unit = {
    if (sys.env.get("SYNTH_NO_IMAGEIO_CACHE").contains("1")) {
      javax.imageio.ImageIO.setUseCache(false)
      println("[synth] ImageIO.setUseCache(false)")
    }
    val n = 5000
    // JIT warm
    (0 until 500).foreach(i => videoItem(i.toLong))
    def pool(threads: Int): Unit = {
      val ex = Executors.newFixedThreadPool(threads)
      val acc = new AtomicLong(0)
      val t0 = System.nanoTime()
      val per = n / threads
      (0 until threads).foreach { t =>
        ex.submit(new Runnable {
          def run(): Unit = {
            var i = t * per
            while (i < (t + 1) * per) { acc.addAndGet(videoItem(i.toLong)); i += 1 }
          }
        })
      }
      ex.shutdown(); ex.awaitTermination(10, TimeUnit.MINUTES)
      println(f"[synth] pool threads=$threads%2d  n=$n  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s (acc=${acc.get()})")
    }
    pool(1)
    pool(32)
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val s = sc.parallelize(0L until n.toLong, 32).map(videoItem).sum()
      println(f"[synth] spark RDD map        n=$n  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s (sum=$s)")
    }
    // and the Dataset path the queries actually use
    import spark.implicits._
    val ids = spark.range(n.toLong).select($"id".as("doc_id"))
      .repartition(32).localCheckpoint()
    ids.count()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = Multimodal.synthesizeVideo(ids, $"doc_id").count()
      println(f"[synth] synthesizeVideo DS   n=$c  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = Multimodal.videoFrameFingerprints(
        Multimodal.synthesizeVideo(ids, $"doc_id")).count()
      println(f"[synth] synth+frameFps DS    n=$c  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
