package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TermCounts kernel: must be equivalent by construction to the
  * compositional explode → groupBy(doc, term) shape it replaces (the
  * tf-idf oracle counts terms with string_split in DuckDB, so the
  * kernel's tokenization has to match split-on-single-space exactly).
  */
class TermExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def viaKernel(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), explode(TermFunctions.termCounts(col("text"))).as("e"))
      .select(col("id"), col("e.term"), col("e.tf").cast("long").as("tf"))
      .as[(Long, String, Long)].collect().toSet

  private def viaGroupBy(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet

  test("termCounts equals explode + groupBy on varied inputs (property)") {
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "déjà", "中文", "x")
    val texts = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "))
    assert(viaKernel(texts) == viaGroupBy(texts))
  }

  test("termCounts handles degenerate spacing exactly like split") {
    // repeated/leading/trailing spaces produce empty tokens in both
    val texts = Seq("a  b", " a", "a ", "a", " ", "a a a")
    assert(viaKernel(texts) == viaGroupBy(texts))
  }

  test("termCounts output order is first occurrence (deterministic)") {
    val row = Seq((1L, "b a b c a b")).toDF("id", "text")
      .select(TermFunctions.termCounts(col("text")).as("tc"))
      .selectExpr("transform(tc, e -> e.term) AS terms",
        "transform(tc, e -> e.tf) AS tfs")
      .as[(Seq[String], Seq[Int])].collect().head
    assert(row == ((Seq("b", "a", "c"), Seq(3, 2, 1))))
  }

  test("termCounts rejects non-string input at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(TermFunctions.termCounts(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("termCounts stays inside whole-stage codegen") {
    val plan = Seq((1L, "a b a")).toDF("id", "text")
      .select(TermFunctions.termCounts(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("stringShingles equals the HOF composition, incl. repeated-space and short docs") {
    import graft.ext.TextHash
    val texts = Seq("a b c d e", "a  b c", "one", "x y", " lead", "trail ",
      "a b c d e f g h i j")
    for (n <- Seq(2, 3)) {
      val df = texts.toDF("text")
      val native = df.select(TermFunctions.stringShingles(col("text"), n))
        .as[Seq[String]].collect().toSeq
      val hof = df.select(TextHash.shingles(TextHash.tokens(col("text")), n))
        .as[Seq[String]].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("stringShingles stays inside whole-stage codegen") {
    val plan = Seq((1L, "a b a")).toDF("id", "text")
      .select(TermFunctions.stringShingles(col("text"), 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
