package graft.ext

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Scratch micro: same codec loop on 1 vs 32 threads. If the JDK
  * entry points (ImageIO.read / AudioSystem.getAudioInputStream)
  * serialize on a global registry lock, 32-thread throughput will not
  * exceed 1-thread throughput — the smoking gun behind the media
  * rows' taskTime ≈ 32 × their real CPU (QueryJobs finding).
  */
object CodecContention {
  def main(args: Array[String]): Unit = {
    val png = Multimodal.pngForFp(0x5a5a5a5a5a5a5a5aL)
    val wav = Multimodal.wavForFp(0x5a5a5a5a5a5a5a5aL)
    def bench(name: String, threads: Int, perThread: Int)(work: () => Long): Unit = {
      val pool = Executors.newFixedThreadPool(threads)
      val acc = new AtomicLong(0)
      val t0 = System.nanoTime()
      (1 to threads).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < perThread) { acc.addAndGet(work()); i += 1 }
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.MINUTES)
      val total = threads * perThread
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[codec] $name%-24s threads=$threads%2d  n=$total%6d  " +
        f"${dt}%6.2f s  ${dt * 1e6 / total}%8.1f us/item (acc=${acc.get()}%d)")
    }
    // JIT warm
    (1 to 500).foreach { _ =>
      Multimodal.decodeImage(png).foreach(i => assert(i.getWidth > 0))
      Multimodal.decodeAudio(wav).foreach(a => assert(a.samples.length > 0))
    }
    val gif = Multimodal.gifForFp(0x5a5a5a5a5a5a5a5aL, 0x1234567890abcdefL)
    val jpg = Multimodal.jpegForFp(0x5a5a5a5a5a5a5a5aL)
    val mp4 = Multimodal.mjpegMp4(Seq(jpg, Multimodal.jpegForFp(1L)))
    (1 to 200).foreach { _ =>
      Multimodal.decodeGifFrames(gif).foreach(f => assert(f.nonEmpty))
      Multimodal.extractMp4SyncSamples(mp4).foreach(d => assert(d.frames.nonEmpty))
    }
    for (r <- 1 to 2) {
      println(s"-- round $r --")
      bench("png decode", 1, 2000)(() =>
        Multimodal.decodeImage(png).map(_.getWidth.toLong).getOrElse(0L))
      bench("png decode", 32, 160)(() =>
        Multimodal.decodeImage(png).map(_.getWidth.toLong).getOrElse(0L))
      bench("wav decode", 1, 2000)(() =>
        Multimodal.decodeAudio(wav).map(_.samples.length.toLong).getOrElse(0L))
      bench("wav decode", 32, 160)(() =>
        Multimodal.decodeAudio(wav).map(_.samples.length.toLong).getOrElse(0L))
      bench("png encode", 1, 2000)(() => Multimodal.pngForFp(12345L).length.toLong)
      bench("png encode", 32, 160)(() => Multimodal.pngForFp(12345L).length.toLong)
      bench("wav encode", 1, 500)(() => Multimodal.wavForFp(12345L).length.toLong)
      bench("wav encode", 32, 60)(() => Multimodal.wavForFp(12345L).length.toLong)
      bench("gif encode", 1, 500)(() => Multimodal.gifForFp(12345L, 777L).length.toLong)
      bench("gif encode", 32, 60)(() => Multimodal.gifForFp(12345L, 777L).length.toLong)
      bench("gif decode", 1, 500)(() =>
        Multimodal.decodeGifFrames(gif).map(_.size.toLong).getOrElse(0L))
      bench("gif decode", 32, 60)(() =>
        Multimodal.decodeGifFrames(gif).map(_.size.toLong).getOrElse(0L))
      bench("jpeg encode", 1, 500)(() => Multimodal.jpegForFp(12345L).length.toLong)
      bench("jpeg encode", 32, 60)(() => Multimodal.jpegForFp(12345L).length.toLong)
      def demuxDecode(): Long =
        Multimodal.extractMp4SyncSamples(mp4).map { demux =>
          demux.frames.map { case (_, _, bytes) =>
            Multimodal.decodeVideoFrame(demux.codec, bytes)
              .map(_.getWidth.toLong).getOrElse(0L)
          }.sum
        }.getOrElse(0L)
      bench("mp4 demux+jpeg dec", 1, 500)(() => demuxDecode())
      bench("mp4 demux+jpeg dec", 32, 60)(() => demuxDecode())
    }
  }
}
