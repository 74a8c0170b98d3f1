package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible text hashing primitives for the dedup /
  * fingerprint operators ([EXT], SURVEY.md §0 north-star).
  *
  * All built from codegen'd built-in expressions (md5 / conv / array
  * lambdas) — no UDFs — and chosen so the exact same arithmetic is
  * expressible in the DuckDB oracle:
  *   base(s)    = first 48 bits of md5(s) as BIGINT
  *   h_i(s)     = ((base(s) mod P) * a_i + b_i) mod P,  P = 2^31 - 1
  * 48-bit base keeps (base mod P) * a_i < 2^63 for a_i < 2^20.
  */
object TextHash {

  /** Mersenne prime 2^31 - 1: modulus of the universal hash family. */
  val P = 2147483647L

  /** (a, b) parameters of the k=8 hash family used for MinHash. */
  val Params: Seq[(Long, Long)] = Seq(
    (131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L),
    (151L, 19L), (157L, 23L), (163L, 29L), (167L, 31L))

  /** Whitespace tokenizer (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** 48-bit content hash: BIGINT from the first 12 hex chars of md5.
    * DuckDB twin: CAST('0x' || substr(md5(s), 1, 12) AS BIGINT).
    * Native codegen'd kernel (graft.functions.Md5Prefix48) — value
    * bit-identical to conv(substring(md5(s), 1, 12), 16, 10) without
    * the three per-call string allocations of that chain.
    */
  def baseHash(s: Column): Column =
    graft.functions.HashFunctions.md5Prefix48(s)

  /** One member of the universal hash family over a base hash. */
  def hashAB(h: Column, a: Long, b: Long): Column =
    (h % P * a + b) % P

  /** Word n-gram shingles. Multiset (use array_distinct for set
    * semantics). Guarded: Spark's sequence() descends when size < n.
    * NULL input yields NULL (not an empty array) — the contract the
    * native `ShingleHash48` kernel and the `duckShingles` oracle twin
    * both follow; an empty-array fallback here would be the one place
    * the three formulations disagree on null text.
    */
  def shingles(tok: Column, n: Int): Column =
    when(tok.isNull, lit(null).cast("array<string>"))
      .when(size(tok) >= n,
        transform(sequence(lit(1), size(tok) - lit(n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(tok, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash value for one hash-family member over a shingle multiset
    * (min over a multiset equals min over the set).
    */
  def minhash(shingleCol: Column, a: Long, b: Long): Column =
    array_min(transform(shingleCol, s => hashAB(baseHash(s), a, b)))

  // -------- DuckDB oracle fragments (kept next to the Spark twins so
  // -------- the two dialects can't drift apart silently)

  /** DuckDB twin of baseHash. `||`, not concat(): DuckDB's concat
    * IGNORES nulls, so a NULL input would yield the unparseable '0x'
    * instead of null-propagating like the Spark twin (null-fixture
    * class).
    */
  def duckBaseHash(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 12) AS BIGINT)"

  /** DuckDB twin of hashAB. */
  def duckHashAB(h: String, a: Long, b: Long): String =
    s"(($h % $P) * $a + $b) % $P"

  /** DuckDB twin of shingles(tokens(text), n) (multiset). */
  def duckShingles(textExpr: String, n: Int): String =
    s"list_transform(generate_series(1, len(string_split($textExpr, ' ')) - ${n - 1}), " +
      s"i -> array_to_string(string_split($textExpr, ' ')[i:i+${n - 1}], ' '))"
}
