package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.ext.TextHash

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("Md5Prefix48 is bit-identical to the conv(substring(md5)) chain") {
    val strs = Gen.listOfN(30, Gen.asciiPrintableStr.map(_.take(40)))
    val prop = Prop.forAll(strs) { ss =>
      val df = ss.toDF("s")
      df.select(
        HashFunctions.md5Prefix48(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("builtin"))
        .as[(Long, Long)].collect().forall { case (n, b) => n == b }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("ShingleHash48 matches hash-of-reassembled-shingle, incl. odd spacing") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l",
      "double  space and trailing ",
      " leading space here too",
      "xx yy zz")
    val df = texts.toDF("text")
    val native = df.select(
      HashFunctions.shingleHash48(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().toSeq
    val builtin = df.select(
      transform(TextHash.shingles(TextHash.tokens(col("text")), 3),
        s => HashFunctions.md5Prefix48(s)).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(native == builtin)
  }

  test("MinHashSig matches per-member array_min over the same hash family") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l",
      "xx yy zz").toDF("text")
    val sh = HashFunctions.shingleHash48(col("text"), 3)
    val k = 4
    val fused = docs.select(
      HashFunctions.minhashSig(sh, TextHash.Params.take(k)).as("sig"))
      .select((0 until k).map(i => col("sig").getItem(i)): _*)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val perMember = docs.select(
      (0 until k).map { i =>
        val (a, b) = TextHash.Params(i)
        array_min(transform(sh, h => TextHash.hashAB(h, a, b)))
      }: _*)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fused == perMember)
  }

  test("SimHashFp matches the explode + bit-vote aggregation at 16 and 64 bits") {
    // reference implementation = the pre-kernel formulation: one row per
    // token, per-bit ±1 vote sums, fingerprint from the vote signs
    def reference(df: org.apache.spark.sql.DataFrame, bits: Int) = {
      val tk = df.select(col("doc_id"), explode(TextHash.tokens(col("text"))).as("t"))
        .select(col("doc_id"), md5(col("t")).as("m"))
        .select(col("doc_id"),
          conv(substring(col("m"), 1, 12), 16, 10).cast("long").as("lo"),
          conv(substring(col("m"), 13, 4), 16, 10).cast("long").as("hi"))
      val bitSums = (0 until bits).map { j =>
        val w = if (j < 48) shiftright(col("lo"), j) else shiftright(col("hi"), j - 48)
        sum(when(w.bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
      }
      val fp = (0 until bits)
        .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      tk.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), fp.as("fp"))
    }
    val texts = Gen.listOfN(12, Gen.asciiPrintableStr.map(_.take(60)))
    val prop = Prop.forAll(texts) { ss =>
      val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      Seq(16, 64).forall { bits =>
        val fused = df.select(col("doc_id"),
          HashFunctions.simhashFp(col("text"), bits).as("fp"))
          .as[(Long, Long)].collect().toMap
        fused == reference(df, bits).as[(Long, Long)].collect().toMap
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("NfcNormalize composes combining marks; ASCII passes through identical") {
    val eAcute = "e\u0301"        // decomposed: e + combining acute
    val df = Seq(eAcute + " plain ascii", "plain ascii").toDF("s")
    val out = df.select(
      HashFunctions.nfc(col("s")).as("n"), col("s")).as[(String, String)].collect()
    assert(out(0)._1 == "\u00e9 plain ascii") // composed e-acute
    assert(out(0)._1 != out(0)._2)
    assert(out(1)._1 == out(1)._2)            // already-NFC fast path
  }

  test("MinHashSig yields null for docs with no shingles") {
    val out = Seq("one two").toDF("text").select(
      HashFunctions.minhashSig(
        HashFunctions.shingleHash48(col("text"), 3),
        TextHash.Params.take(2)).as("sig"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
