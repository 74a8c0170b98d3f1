package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Media fixture generator (the [[NullFixture]] of the multimodal
  * surface): synthesizes the deterministic media corpus —
  * [[graft.ext.Multimodal.synthesizeMedia]] over the source fixture's
  * `documents.doc_id` space — and writes it as `media.parquet` under
  * the destination dir. Payloads are REAL PNGs with closed-form
  * perceptual fingerprints plus the corrupt (truncated) and non-image
  * row classes, so decode pipelines and their drop rules can be gated
  * against a stable on-disk table.
  *
  * Usage: runMain graft.tools.MediaFixture SRC_SF_DIR DST_DIR
  */
object MediaFixture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.MediaFixture SRC_SF_DIR DST_DIR")
    val Array(src, dst) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ext.Multimodal.synthesizeMedia(
        spark.read.parquet(s"$src/documents.parquet").select("doc_id"),
        col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/media.parquet")
    println(s"[mediafixture] wrote $dst/media.parquet")
    spark.stop()
  }
}
