package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Media fixture generator (the [[NullFixture]] of the multimodal
  * surface): synthesizes the deterministic media corpora —
  * [[graft.ext.Multimodal.synthesizeMedia]] and
  * [[graft.ext.Multimodal.synthesizeAudio]] /
  * [[graft.ext.Multimodal.synthesizeVideo]] over the source fixture's
  * `documents.doc_id` space — and writes them as `media.parquet` /
  * `audio.parquet` / `video.parquet` under the destination dir.
  * Payloads are REAL PNGs, 16-bit PCM WAVs, and MJPEG-in-MP4
  * containers with closed-form perceptual fingerprints plus the
  * corrupt (truncated) and cross-kind row classes, so decode pipelines
  * and their drop rules can be gated against stable on-disk tables.
  *
  * Usage: runMain graft.tools.MediaFixture SRC_SF_DIR DST_DIR
  */
object MediaFixture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.MediaFixture SRC_SF_DIR DST_DIR")
    val Array(src, dst) = args.take(2)
    val spark = graft.Sessions.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ids = spark.read.parquet(s"$src/documents.parquet").select("doc_id")
    graft.ext.Multimodal.synthesizeMedia(ids, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/media.parquet")
    graft.ext.Multimodal.synthesizeAudio(ids, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/audio.parquet")
    graft.ext.Multimodal.synthesizeVideo(ids, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/video.parquet")
    println(s"[mediafixture] wrote $dst/media.parquet + audio.parquet " +
      "+ video.parquet")
    spark.stop()
  }
}
