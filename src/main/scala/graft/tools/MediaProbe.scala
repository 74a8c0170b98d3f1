package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** Scratch profiler for the multimodal dedup rows: stage-level walls
  * for synthesis, decode+fingerprint, the fingerprint-table write, and
  * the banded pair search — the [[Profile]] harness applied to the
  * media columns (which stage to optimize is unguessable from the
  * query total: synthesis is CPU, decode is codec overhead, the pair
  * search is the only shuffle).
  *
  * Usage: runMain graft.tools.MediaProbe [SF_DIR]
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val ids = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id").repartition(32).localCheckpoint()
    time("ids warmup")(ids.count())
    // driver-side micro split: where inside one clip's decode →
    // fingerprint chain does the time go? (JIT-warmed second loop)
    for (round <- 1 to 2) {
      val wav = Multimodal.wavForFp(0x5a5a5a5a5a5a5a5aL)
      val n = 1000
      var t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < n) { acc += Multimodal.decodeAudio(wav).get.samples.length; i += 1 }
      val tDec = (System.nanoTime() - t0) / 1e6 / n
      val decoded = Multimodal.decodeAudio(wav).get
      t0 = System.nanoTime()
      i = 0
      while (i < n) { acc += Multimodal.audioFingerprint(decoded); i += 1 }
      val tFp = (System.nanoTime() - t0) / 1e6 / n
      t0 = System.nanoTime()
      i = 0
      while (i < n) { acc += Multimodal.wavForFp(i.toLong).length; i += 1 }
      val tSyn = (System.nanoTime() - t0) / 1e6 / n
      println(f"[probe] micro r$round: decode $tDec%.3f ms  fp $tFp%.3f ms  " +
        f"synth $tSyn%.3f ms per clip (acc=$acc)")
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      time("audio synth")(
        Multimodal.synthesizeAudio(ids, col("doc_id")).count())
      time("audio synth+fp")(
        Multimodal.audioFingerprints(
          Multimodal.synthesizeAudio(ids, col("doc_id"))).count())
      val afp = s"/tmp/graft_probe_afp_${ProcessHandle.current().pid()}"
      graft.ops.Staging.deleteTree(afp)
      time("audio synth+fp+write") {
        Multimodal.audioFingerprints(
            Multimodal.synthesizeAudio(ids, col("doc_id"))).toDF()
          .write.parquet(afp)
        spark.read.parquet(afp).count()
      }
      time("audio pair search") {
        Dedup.simhashHammingPairs(
          spark.read.parquet(afp)
            .filter(col("kind") === "audio" && col("fp").isNotNull)
            .select(col("media_id").as("doc_id"), col("fp")),
          maxDist = 3, bands = 4, bits = 64).count()
      }
      time("image synth")(
        Multimodal.synthesizeMedia(ids, col("doc_id")).count())
      time("image synth+fp")(
        Multimodal.perceptualFingerprints(
          Multimodal.synthesizeMedia(ids, col("doc_id"))).count())
      time("video synth")(
        Multimodal.synthesizeVideo(ids, col("doc_id")).count())
      time("video synth+fp")(
        Multimodal.videoFingerprints(
          Multimodal.synthesizeVideo(ids, col("doc_id"))).count())
    }
    spark.stop()
  }
}
