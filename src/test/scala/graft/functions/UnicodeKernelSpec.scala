package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the text kernels' segmentation contract on non-ASCII input
  * (VERDICT r12 item 5). The contract: kernels split on single 0x20
  * BYTES over UTF8String — safe for any UTF-8 content by construction
  * (multibyte sequences never contain a 0x20 byte), which means
  *   - CJK text without whitespace is ONE token (no script-aware
  *     segmentation — the wordpiece/BPE layer is where subword
  *     splitting happens),
  *   - NFD and NFC spellings are DIFFERENT tokens unless normalizeNfc
  *     runs first (kernels compare bytes, not canonical equivalence),
  *   - astral-plane emoji and combining marks pass through whole.
  * The UnicodeFixture gate proves the same bytes-in/bytes-out rules
  * hold in DuckDB (string_split shares the contract), so the oracle
  * comparison is sound on real multilingual corpora.
  */
class UnicodeKernelSpec extends SparkSpec {
  import spark.implicits._

  private val cjk = "汉字测试文本没有空格"
  private val nfd = "café naïve"
  private val nfc = "café naïve"

  test("CJK without whitespace is one token through count, terms, shingles") {
    val df = Seq(s"$cjk", s"$cjk $cjk word").toDF("text")
    val (ws, _) = graft.ext.TextAnalysis.tokenCounts(col("text"))
    assert(df.select(ws).as[Long].collect().toSeq == Seq(1L, 3L))
    // termCounts: the whole run is one term with its exact bytes
    val terms = df.limit(1)
      .select(explode(TermFunctions.termCounts(col("text"))).as("e"))
      .select($"e.term", $"e.tf").as[(String, Int)].collect().toSeq
    assert(terms == Seq((cjk, 1)))
    // 3-gram shingles need >= 3 tokens: the one-token line has none,
    // the three-token line exactly one
    val sh = df.select(size(HashFunctions.shingleHash48(col("text"), 3)))
      .as[Int].collect().toSeq
    assert(sh == Seq(0, 1))
  }

  test("NFD and NFC are different tokens until normalizeNfc; equal after") {
    val df = Seq((1L, nfd), (2L, nfc)).toDF("doc_id", "text")
    val raw = df.select(TermFunctions.termCounts(col("text")).as("tc"))
      .select(transform(col("tc"), e => e.getField("term")).as("terms"))
      .as[Seq[String]].collect()
    assert(raw(0) != raw(1), "byte-level kernels must NOT canonicalize")
    val norm = df.select(
        TermFunctions.termCounts(HashFunctions.nfc(col("text"))).as("tc"))
      .select(transform(col("tc"), e => e.getField("term")).as("terms"))
      .as[Seq[String]].collect()
    assert(norm(0).toSeq == norm(1).toSeq,
      "after NFC normalization the twins must collide")
  }

  test("astral emoji and flags survive wordpiece + fingerprint round trips") {
    val s = "😀🚀 data 🇦🇺"
    val df = Seq(s).toDF("text")
    val wp = df.select(WordpieceFunctions.wordpiece(col("text")))
      .as[String].head()
    // restoration invariant: concatenating pieces restores every word
    assert(wp.split(" ", -1).mkString("") == s.replace(" ", ""), wp)
    // the 48-bit fingerprint is defined (md5 over the exact bytes) and
    // stable — two rows with the same emoji text hash identically
    val fps = Seq(s, s).toDF("text")
      .select(HashFunctions.md5Prefix48(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("mixed RTL text tokenizes on spaces only, order preserved") {
    val df = Seq("שלום مرحبا data").toDF("text")
    val terms = df.select(explode(split(col("text"), " ")).as("t"))
      .as[String].collect().toSeq
    assert(terms == Seq("שלום", "مرحبا", "data"))
    val (ws, _) = graft.ext.TextAnalysis.tokenCounts(col("text"))
    assert(df.select(ws).as[Long].head() == 3L)
  }
}
