package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis

/** QualityBps kernel: must be value-identical to the compositional
  * split/filter chain it replaced (the oracle twins replay that chain
  * in SQL — `duckQbps` — so a one-bps drift anywhere breaks five
  * hash-gated queries), including the null propagation the old
  * formulation needed an explicit when() for.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  /** The pre-kernel Column formulation, verbatim (incl. the null guard
    * — least() IGNORES nulls, so unguarded credits would collapse a
    * null text to 10000).
    */
  private def builtinBps(text: Column): Column = {
    val tok = split(text, " ")
    val nTok = size(tok).cast("long")
    val stop = size(filter(tok,
      t => TextAnalysis.StopWords.map(w => t === w).reduce(_ || _)))
      .cast("long")
    when(text.isNull, lit(null).cast("long"))
      .otherwise(least(lit(5000L), nTok * 25) +
        least(lit(5000L), floor(stop * lit(50000L) / nTok).cast("long")))
  }

  private def compare(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val kernel = df.select(TextAnalysis.qualityBps(col("text")))
      .as[Option[Long]].collect().toSeq
    val builtin = df.select(builtinBps(col("text")))
      .as[Option[Long]].collect().toSeq
    assert(kernel == builtin, s"kernel=$kernel builtin=$builtin")
  }

  test("kernel equals the built-in chain on varied inputs (property)") {
    val rnd = new scala.util.Random(29)
    val words = Seq("the", "a", "alpha", "beta", "théâtre", "中文词",
      "emoji😀", "x", "thé", "ab", "THE")
    val texts = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(400))).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "))
    compare(texts)
  }

  test("kernel matches on degenerate spacing, empties, and nulls") {
    compare(Seq("", " ", "  ", "a", "the", " the", "the ", "a  the",
      "the the the", "b", "a a a a a a a a a a a a a a a a a a a a a a"))
    // null text scores null on both shapes
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "the a"))
      .toDF("id", "text")
    val kernel = df.select(TextAnalysis.qualityBps(col("text")))
      .as[Option[Long]].collect().toSeq
    val builtin = df.select(builtinBps(col("text")))
      .as[Option[Long]].collect().toSeq
    assert(kernel == builtin)
    assert(kernel.contains(None))
  }

  test("caps engage exactly: length credit at 200 tokens, stop credit at 10%") {
    // 200 single-char tokens -> length credit 5000 exactly
    val len200 = (1 to 200).map(_ => "x").mkString(" ")
    // 1 stop in 10 tokens -> stop credit 5000 exactly (floor(50000/10))
    val stop10 = ("the" +: (1 to 9).map(_ => "x")).mkString(" ")
    compare(Seq(len200, len200 + " x", stop10, "the " + stop10))
  }

  test("kernel stays inside whole-stage codegen") {
    val plan = Seq((1L, "the a b")).toDF("id", "text")
      .select(TextAnalysis.qualityBps(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  /** The textStats struct kernel vs the size/filter chains it replaced
    * (stats, qualityRules' alpha predicate, qualityLogit's stop count).
    */
  private def compareStats(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val tok = split(col("text"), " ")
    val kernel = df.select(
      TermFunctions.textStats(col("text"), TextAnalysis.StopWords).as("st"))
      .select(col("st.n_tok"), col("st.stop"), col("st.alpha"))
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSeq
    val builtin = df.select(
      size(tok).cast("long"),
      size(filter(tok,
        t => TextAnalysis.StopWords.map(w => t === w).reduce(_ || _)))
        .cast("long"),
      size(filter(tok, t => t.rlike("[a-z]"))).cast("long"))
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(kernel == builtin, s"kernel=$kernel builtin=$builtin")
  }

  test("textStats equals the size/filter chains on varied inputs (property)") {
    val rnd = new scala.util.Random(31)
    val words = Seq("the", "a", "Alpha", "BETA", "42", "#!?", "théâtre",
      "中文", "mixed中a文", "x", "", "A-Z")
    val texts = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(60))).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")) ++
      Seq("", " ", "  the  ", "a", "THE A", "no letters 123 456")
    compareStats(texts)
  }

  test("textStats null text yields a null struct (null-propagating fields)") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "the a"))
      .toDF("id", "text")
    val rows = df.select(
      TermFunctions.textStats(col("text"), TextAnalysis.StopWords).as("st"))
      .select(col("st.n_tok")).as[Option[Long]].collect().toSeq
    assert(rows.contains(None) && rows.contains(Some(2L)))
  }

  test("textStats consumers stay inside whole-stage codegen") {
    val (mask, keep) = TextAnalysis.qualityRules(col("text"))
    val plan = Seq((1L, "the a b")).toDF("id", "text")
      .select(mask.as("m"), keep.as("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
