package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unicode-injected twin of a testdata directory (VERDICT r12 item 5):
  * the text kernels split on single 0x20 BYTES over UTF8String — safe
  * for any UTF-8 content by construction (multibyte sequences never
  * contain 0x20), but until this fixture nothing exercised that
  * contract cross-engine. Deterministic key-mod injection over
  * `documents.text` only (n_chars recomputed to stay consistent):
  *
  *   doc_id%31==3  → CJK with NO whitespace prepended + the row's own
  *                   text with spaces stripped (the no-segmentation
  *                   script: the whole line is ONE token by contract)
  *   doc_id%31==7  → NFD-style combining marks ("cafe" + U+0301 …)
  *   doc_id%31==11 → the precomposed NFC twin ("café …") — the NFD/NFC
  *                   pair documents that kernels compare BYTES: the
  *                   twins are different tokens unless normalizeNfc
  *                   runs first (q_normalize_nfc is that operator)
  *   doc_id%31==15 → astral-plane emoji (surrogate pairs in UTF-16,
  *                   4-byte sequences in UTF-8) + a regional-indicator
  *                   flag pair
  *   doc_id%31==19 → RTL Hebrew/Arabic prefix
  *
  * Usage: `runMain graft.tools.UnicodeFixture SRC_SF_DIR DST_DIR`,
  * then the standard gate pair on the text-kernel queries.
  */
object UnicodeFixture {

  def unicodeify(name: String, df: DataFrame): DataFrame = name match {
    case "documents" =>
      val m = col("doc_id") % 31
      val text =
        when(m === 3, concat(lit("汉字测试文本"),
          regexp_replace(col("text"), " ", "")))
        // NFD: base letter + combining mark (U+0301 / U+0308), spelled
        // as escapes so no editor/toolchain silently normalizes them
        .when(m === 7, concat(lit("cafe\u0301 nai\u0308ve "), col("text")))
        // the NFC twin of the same words, precomposed (U+00E9 / U+00EF)
        .when(m === 11, concat(lit("café naïve "), col("text")))
        .when(m === 15, concat(lit("😀🚀 "), col("text"),
          lit(" 🇦🇺")))
        .when(m === 19, concat(lit("שלום " +
          "مرحبا "), col("text")))
        .otherwise(col("text"))
      df.select(col("doc_id"), text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    case _ => df
  }

  def generate(spark: SparkSession, src: String, dst: String): Unit =
    FixtureIo.writeTwin(spark, src, dst, unicodeify)

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val spark = graft.Sessions.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst)
    spark.stop()
  }
}
