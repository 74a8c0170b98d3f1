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

  test("MinHashSig yields null for docs with no shingles") {
    val out = Seq("one two").toDF("text").select(
      HashFunctions.minhashSig(
        HashFunctions.shingleHash48(col("text"), 3),
        TextHash.Params.take(2)).as("sig"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
