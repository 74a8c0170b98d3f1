package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Similarity

/** ArrayAbsMax / QuantizeArray kernels (r19): must be value-identical
  * to the interpreted-HOF compositions they replaced — the DuckDB twins
  * of q_quantize_int8 / q_ann_quantized / q_rrf_fusion /
  * q_embed_covariance / q_embed_standardize replay those compositions
  * in SQL, so any drift (incl. the null-fixture edge classes: null
  * vector, EMPTY vector, null elements, all-zero vector) breaks
  * hash-gated rows.
  */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-kernel staged HOF formulation of quantizeInt8, verbatim. */
  private def hofQuantize(df: org.apache.spark.sql.DataFrame,
                          vec: Column): org.apache.spark.sql.DataFrame =
    df.select(col("vec_id"),
      transform(vec, x => x.cast("double")).as("__v"))
      .select(col("vec_id"), col("__v"),
        array_max(transform(col("__v"), x => abs(x))).as("__mx"))
      .select(col("vec_id"), col("__v"),
        when(col("__mx") === 0.0, lit(0.0))
          .otherwise(lit(127.0) / col("__mx")).as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("__v"),
          x => floor(x * col("scale") + 0.5).cast("long")).as("q"))

  private val edgeVectors: Seq[(Long, Seq[Option[Float]])] = Seq(
    1L -> Seq(Some(1.0f), Some(-2.5f), Some(0.25f)),
    2L -> Seq(Some(0.0f), Some(0.0f)),       // all-zero: scale 0
    3L -> Seq.empty[Option[Float]],          // empty: scale null, q []
    4L -> null,                              // null vector
    5L -> Seq(None, None),                   // all-null elements
    6L -> Seq(Some(3.5f), None, Some(-3.5f)), // mixed nulls
    7L -> Seq(Some(-127.0f)),
    8L -> Seq(Some(1e-8f), Some(-1e8f), Some(42.42f)))

  private def randomVectors(n: Int): Seq[(Long, Seq[Option[Float]])] = {
    val rnd = new scala.util.Random(19)
    (1 to n).map(i => (100L + i,
      Seq.fill(1 + rnd.nextInt(16))(
        Option((rnd.nextFloat() - 0.5f) * 20f))))
  }

  test("quantizeInt8 kernel path equals the staged HOF formulation, " +
      "incl. null/empty/all-null/all-zero vectors (property)") {
    val df = (edgeVectors ++ randomVectors(60)).toDF("vec_id", "v")
    val kernel = Similarity.quantizeInt8(df, col("vec_id"), col("v"))
      .orderBy("vec_id")
      .as[(Long, Option[Double], Option[Seq[Option[Long]]])].collect().toSeq
    val hof = hofQuantize(df, col("v"))
      .orderBy("vec_id")
      .as[(Long, Option[Double], Option[Seq[Option[Long]]])].collect().toSeq
    assert(kernel == hof)
  }

  test("absMax equals array_max(transform(v, abs)) on float AND double arrays") {
    val df = (edgeVectors ++ randomVectors(40)).toDF("vec_id", "v")
    val kf = df.select(VectorFunctions.absMax(col("v")))
      .as[Option[Double]].collect().toSeq
    val hf = df.select(array_max(transform(col("v"),
      x => abs(x.cast("double"))))).as[Option[Double]].collect().toSeq
    assert(kf == hf)
    val dd = df.select(col("vec_id"),
      col("v").cast("array<double>").as("v"))
    val kd = dd.select(VectorFunctions.absMax(col("v")))
      .as[Option[Double]].collect().toSeq
    assert(kd == hf) // float→double widening is exact
  }

  test("quantize with a literal scale equals the fixed-scale transform " +
      "(the covariance/standardize µ-unit form)") {
    val df = (edgeVectors ++ randomVectors(40)).toDF("vec_id", "v")
    val kernel = df.select(
      VectorFunctions.quantize(col("v"), lit(1000.0)))
      .as[Option[Seq[Option[Long]]]].collect().toSeq
    val hof = df.select(transform(col("v"),
      x => floor(x.cast("double") * 1000L + 0.5).cast("long")))
      .as[Option[Seq[Option[Long]]]].collect().toSeq
    assert(kernel == hof)
  }

  test("tokenWindows equals the transform(sequence, slice) composition " +
      "(clipped tails, repeated spaces, empty text) and stays codegen'd") {
    import graft.ext.TextHash
    val texts = Seq("a b c d e f g h i j k", "one", "", "a  b  c",
      "x y z", " lead", "trail ", "a b c d e",
      (1 to 200).map(i => s"w$i").mkString(" "))
    for ((win, stride) <- Seq((3, 2), (4, 4), (64, 48), (1, 1))) {
      val df = texts.toDF("text")
      val kernel = df.select(posexplode(
          TermFunctions.tokenWindows(col("text"), win, stride)))
        .select(col("pos"), col("col.txt"), col("col.n").cast("long"))
        .as[(Int, String, Long)].collect().toSeq
      val tok = TextHash.tokens(col("text"))
      val hof = df.select(col("text").as("t"), tok.as("tok"))
        .select(posexplode(transform(
          sequence(lit(0), size(col("tok")) - 1, lit(stride)),
          s => slice(col("tok"), s + 1, lit(win)))))
        .select(col("pos"), array_join(col("col"), " "),
          size(col("col")).cast("long"))
        .as[(Int, String, Long)].collect().toSeq
      assert(kernel == hof, s"win=$win stride=$stride")
    }
    // null text: one null array (posexplode drops the row), like the
    // transform-over-null-tokens shape
    val nulls = Seq[(Long, String)]((1L, null)).toDF("id", "text")
    assert(nulls.select(posexplode(
      TermFunctions.tokenWindows(col("text"), 4, 4))).count() == 0)
    val plan = Seq("a b c").toDF("text")
      .select(TermFunctions.tokenWindows(col("text"), 3, 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("kernels stay inside whole-stage codegen AND compile there " +
      "(fallback disabled, so a broken generated class throws instead " +
      "of silently degrading to the interpreter)") {
    val df = (edgeVectors ++ randomVectors(10)).toDF("vec_id", "v")
    val q = Similarity.quantizeInt8(df, col("vec_id"), col("v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try q.collect()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
