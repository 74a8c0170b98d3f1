package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-injected twin of a testdata directory — the fourth correctness
  * fixture (r13 VERDICT item 4). The synthetic tables are uniformly
  * distributed, so the adversary every capped/salted operator exists
  * for (ops/Skew, q_minhash_lsh_bounded's bucket cap,
  * q_ngram_jaccard_capped's df cap, AQE skew handling) never appears
  * in the gate: a plan can be hot-key-quadratic and still look green
  * and fast. This twin makes the hot-key world a fixture the FULL
  * oracle suite must survive — correctness is unchanged by
  * construction (both engines read the same skewed bytes; skew is a
  * DISTRIBUTION property, not a semantics one), so the gate is
  * 209/209 PLUS a wall-clock sanity bound (≈1.5× the primary fixture;
  * a quadratic blow-up shows up as minutes, not percent).
  *
  * Injection is DETERMINISTIC (key-mod rules, no RNG — the
  * [[NullFixture]] convention):
  *
  *   documents:  doc_id%5==0  → boilerplate text, 13 variants by
  *               doc_id%13 (duplicate-text clusters that grow with sf:
  *               ~8 copies each at sf0.001, ~77 at sf0.01 — hot shingle
  *               buckets, hot LSH bands, dup-graph clusters);
  *               n_chars follows the new text.
  *               doc_id%3==0  → source 'src0' (dominant source ~33%+);
  *               doc_id%2==0  → lang 'en' (dominant language ~50%+)
  *   embeddings: vec_id%7==0  → constant vector per vec_id%11 variant
  *               (identical-direction clusters: hot cosine pairs, hot
  *               sign-LSH buckets, degenerate k-means cells);
  *               vec_id%3==0  → label 1 (dominant class)
  *   events:     event_id%4==0 → user_id 42 (one hot user holds ~25%
  *               of the stream: hot session windows, hot group keys)
  *   orders:     o_orderkey%4==0 → o_custkey 0 (hot customer fact key)
  *   lineitem:   l_orderkey%5==0 → l_partkey 0 AND l_suppkey 0 (hot
  *               join keys into part/supplier — the AQE-skew class)
  *   customer:   c_custkey%2==0 → c_mktsegment 'BUILDING' (dominant
  *               segment for membership filters and group-bys)
  *   region/nation/supplier/part: copied unchanged (dimension keys
  *   stay intact; hot FACT keys point at them).
  *
  * All hot values are drawn from each column's existing domain, so
  * every predicate in the suite still selects and every foreign key
  * still resolves.
  *
  * Usage: `runMain graft.tools.SkewFixture SRC_SF_DIR DST_DIR`, then
  * the standard gate pair (`graft.Verify DST_DIR OUT` +
  * `tools/local_verify.py DST_DIR OUT`), timed.
  */
object SkewFixture {

  def skew(name: String, df: DataFrame): DataFrame = name match {
    case "documents" =>
      val hotText = concat(
        lit("hot boilerplate navigation footer copyright notice all " +
          "rights reserved click here subscribe newsletter terms " +
          "privacy variant "),
        (col("doc_id") % 13).cast("string"))
      val text = when(col("doc_id") % 5 === 0, hotText)
        .otherwise(col("text"))
      df.select(
        col("doc_id"),
        text.as("text"),
        when(col("doc_id") % 2 === 0, lit("en"))
          .otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 3 === 0, lit("src0"))
          .otherwise(col("source")).as("source"),
        when(col("doc_id") % 5 === 0, length(hotText).cast("long"))
          .otherwise(col("n_chars")).as("n_chars"))
    case "embeddings" =>
      df.select(
        col("vec_id"),
        when(col("vec_id") % 7 === 0,
          // identical direction per variant: every element the same
          // positive constant, 11 variants — length AND element type
          // preserved (the division promotes to double, so cast the
          // RESULT back to float or the when/otherwise coerces the
          // whole twin column to array<double> and the float kernel
          // paths silently stop being exercised)
          transform(col("embedding"),
            _ => ((col("vec_id") % 11 + 1) / lit(10.0)).cast("float")))
          .otherwise(col("embedding")).as("embedding"),
        when(col("vec_id") % 3 === 0, lit(1))
          .otherwise(col("label")).as("label"))
    case "events" =>
      df.withColumn("user_id",
        when(col("event_id") % 4 === 0, lit(42L))
          .otherwise(col("user_id")))
    case "orders" =>
      df.withColumn("o_custkey",
        when(col("o_orderkey") % 4 === 0, lit(0L))
          .otherwise(col("o_custkey")))
    case "lineitem" =>
      df.withColumn("l_partkey",
          when(col("l_orderkey") % 5 === 0, lit(0L))
            .otherwise(col("l_partkey")))
        .withColumn("l_suppkey",
          when(col("l_orderkey") % 5 === 0, lit(0L))
            .otherwise(col("l_suppkey")))
    case "customer" =>
      df.withColumn("c_mktsegment",
        when(col("c_custkey") % 2 === 0, lit("BUILDING"))
          .otherwise(col("c_mktsegment")))
    case _ => df
  }

  /** Write each table as a single `name.parquet` file (the testdata
    * layout; see [[FixtureIo.writeTwin]]).
    */
  def generate(spark: SparkSession, src: String, dst: String): Unit =
    FixtureIo.writeTwin(spark, src, dst, skew)

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val spark = graft.Sessions.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst)
    spark.stop()
  }
}
