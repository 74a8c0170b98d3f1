package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the Jaro-Winkler kernel to values probed from DuckDB
  * `jaro_winkler_similarity` / `jaro_similarity` (the oracle engine),
  * full double precision — any semantic drift (window, boost
  * threshold, byte-vs-codepoint, empty handling) breaks these exactly.
  */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSimilarityKernels.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def jaro(a: String, b: String): Double =
    StringSimilarityKernels.jaro(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro matches DuckDB jaro_similarity bit-for-bit on probed cases") {
    assert(jaro("", "") == 0.0)                 // DuckDB: empty -> 0
    assert(jaro("a", "") == 0.0)
    assert(jaro("abc", "abc") == 1.0)
    assert(jaro("martha", "marhta") == 0.94444444444444453)
    assert(jaro("dixon", "dicksonx") == 0.76666666666666661)
    assert(jaro("jellyfish", "smellyfish") == 0.89629629629629637)
    assert(jaro("dwayne", "duane") == 0.8222222222222223)
    assert(jaro("ab", "ba") == 0.0)             // window 0: no matches
    assert(jaro("crate", "trace") == 0.73333333333333339)
    assert(jaro("abcdef", "fedcba") == 0.38888888888888884)
    assert(jaro("prefixmatch", "prefixmatchlonger") == 0.88235294117647056)
    assert(jaro("AB", "ab") == 0.0)             // case-sensitive
  }

  test("jaro-winkler boost matches DuckDB: threshold 0.7, 4-byte prefix cap") {
    assert(jw("martha", "marhta") == 0.96111111111111114)
    assert(jw("dixon", "dicksonx") == 0.81333333333333324)
    assert(jw("dwayne", "duane") == 0.84000000000000008)
    assert(jw("aaaaaab", "aaaaaac") == 0.94285714285714284) // prefix capped at 4
    assert(jw("prefixmatch", "prefixmatchlonger") == 0.92941176470588238)
    // below the 0.7 boost threshold the prefix is ignored
    assert(jw("crate", "trace") == 0.73333333333333339)  // prefix 0: unboosted
    assert(jw("abqqqqqq", "abzzzzzzzzzzzzzzzz") == 0.45370370370370372)
    assert(jw("abcdzzzz", "abcdyyyyyyyyyyyyyyyyyy") == 0.56060606060606066)
  }

  test("operates on UTF-8 bytes like DuckDB (multi-byte codepoints)") {
    // 'héllo' is 6 bytes; DuckDB scores it as dwayne/duane's shape
    assert(jw("héllo", "hello") == 0.84000000000000008)
    assert(jw("ßs", "ss") == 0.0)
  }

  test("symmetry and range over random-ish pairs") {
    val words = Seq("", "a", "ab", "abc", "abcd", "banana", "bananas",
      "ananab", "chocolate", "chocolat", "späte", "spate", "aaaa", "aaab")
    for (x <- words; y <- words) {
      val s = jw(x, y)
      assert(s == jw(y, x), s"asymmetric on ($x, $y)")
      assert(s >= 0.0 && s <= 1.0, s"out of range on ($x, $y): $s")
      if (x == y && x.nonEmpty) assert(s == 1.0)
    }
  }

  test("column API evaluates under codegen and handles nulls") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("crate", "trace"), (null, "x"))
      .toDF("a", "b")
      .select(StringSimilarityFunctions.jaroWinkler(col("a"), col("b")).as("s"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 0.96111111111111114)
    assert(got(1) == 0.73333333333333339)
    assert(got(2) == null)
  }
}
