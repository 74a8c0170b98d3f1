package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Null-injected twin of a testdata directory — the second correctness
  * fixture (VERDICT r12 item 1). The synthetic tables are null-free, so
  * every oracle row can be green while Spark and DuckDB silently
  * disagree on NULL semantics (`least()` null-skipping, NULLS FIRST
  * ordering defaults, `array_to_string` on empty input — all three
  * classes were caught by hand in r12 code review, never by the
  * harness). A user's first real corpus has NULL text, empty arrays,
  * and NULL keys on day one; this fixture makes that a gate instead of
  * review luck.
  *
  * Injection is DETERMINISTIC (key-mod rules, no RNG) so the fixture is
  * reproducible from the read-only testdata at any time — nothing
  * binary needs committing:
  *
  *   documents:  doc_id%19==3 → NULL text (n_chars NULL too),
  *               doc_id%19==7 → empty text (n_chars 0),
  *               doc_id%23==5 → NULL lang, doc_id%23==11 → NULL source
  *   embeddings: vec_id%29==3 → NULL embedding,
  *               vec_id%29==7 → EMPTY embedding,
  *               vec_id%29==11 → all-ZERO embedding (no direction),
  *               vec_id%29==17 → RAGGED embedding (truncated to 32 of
  *               the declared 64 dims — the corrupt-row class where
  *               the engines DIVERGE without the shared declared-dim
  *               drop: Spark's dot kernel yields NULL on a length
  *               mismatch, silently sinking the row in rankings, while
  *               DuckDB's list_dot_product hard-errors; withNorm's
  *               `dim` rule and duckEmbUnit's len() guard must agree),
  *               vec_id%31==5 → NULL label
  *   events:     event_id%19==3 → NULL props, event_id%19==7 → NULL
  *               user_id (null join/group key), event_id%23==5 → NULL
  *               value, event_id%101==13 → NULL ts (the reference's
  *               open-ended nullable timespan, datasets_parquet.py:119)
  *   customer:   c_custkey%17==3 → NULL c_acctbal,
  *               c_custkey%17==7 → NULL c_mktsegment
  *   orders:     o_orderkey%19==5 → NULL o_orderpriority
  *   lineitem:   l_orderkey%43==3 → NULL l_returnflag (null group key),
  *               %43==7 → NULL l_linestatus, %101==17 → NULL l_shipdate
  *               (the open-ended timespan on the fact side: first-wins
  *               priorities, range-join probes)
  *   part:       p_partkey%29==3 → NULL p_brand, %29==7 → NULL p_type
  *   region/nation/supplier: copied unchanged (join keys and the money
  *   measure columns the exact-cents sums depend on stay intact).
  *
  * The events `ts` column is written as TIMESTAMP_NTZ — one of the
  * three physical encodings the generator has actually shipped
  * (TablesSpec pins all three), so `Tables.load` normalizes it
  * identically to the primary fixture and DuckDB reads the same naive
  * micros.
  *
  * Usage: `runMain graft.tools.NullFixture SRC_SF_DIR DST_DIR`, then
  * the standard gate pair (`graft.Verify DST_DIR OUT` +
  * `tools/local_verify.py DST_DIR OUT`).
  */
object NullFixture {

  def nullify(name: String, df: DataFrame): DataFrame = name match {
    case "documents" =>
      df.select(
        col("doc_id"),
        when(col("doc_id") % 19 === 3, lit(null).cast("string"))
          .when(col("doc_id") % 19 === 7, lit(""))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 23 === 5, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 23 === 11, lit(null).cast("string"))
          .otherwise(col("source")).as("source"),
        when(col("doc_id") % 19 === 3, lit(null).cast("long"))
          .when(col("doc_id") % 19 === 7, lit(0L))
          .otherwise(col("n_chars")).as("n_chars"))
    case "embeddings" =>
      df.select(
        col("vec_id"),
        when(col("vec_id") % 29 === 3, lit(null).cast("array<float>"))
          .when(col("vec_id") % 29 === 7,
            array().cast("array<float>"))
          // all-ZERO vector (failed encoder / padding row): full length
          // but no direction — the zero-norm row-drop contract's case
          // (cosine would be 0/0 = NaN, which Spark sorts above every
          // real double)
          .when(col("vec_id") % 29 === 11,
            transform(col("embedding"), _ => lit(0.0f)))
          // RAGGED vector (truncated write / mixed encoder versions):
          // wrong length for the declared 64-dim space — the class the
          // declared-dim drop exists for
          .when(col("vec_id") % 29 === 17, slice(col("embedding"), 1, 32))
          .otherwise(col("embedding")).as("embedding"),
        when(col("vec_id") % 31 === 5, lit(null).cast("int"))
          .otherwise(col("label")).as("label"))
    case "events" =>
      df.select(
        col("event_id"),
        when(col("event_id") % 101 === 13,
            lit(null).cast(TimestampNTZType))
          .otherwise(col("ts").cast(TimestampNTZType)).as("ts"),
        when(col("event_id") % 19 === 7, lit(null).cast("long"))
          .otherwise(col("user_id")).as("user_id"),
        col("event_type"),
        when(col("event_id") % 23 === 5, lit(null).cast("double"))
          .otherwise(col("value")).as("value"),
        when(col("event_id") % 19 === 3, lit(null).cast("string"))
          .otherwise(col("props")).as("props"))
    case "customer" =>
      df.select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        when(col("c_custkey") % 17 === 3, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        when(col("c_custkey") % 17 === 7, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    case "orders" =>
      df.withColumn("o_orderpriority",
        when(col("o_orderkey") % 19 === 5, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
    case "lineitem" =>
      df.select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"),
        when(col("l_orderkey") % 43 === 3, lit(null).cast("string"))
          .otherwise(col("l_returnflag")).as("l_returnflag"),
        when(col("l_orderkey") % 43 === 7, lit(null).cast("string"))
          .otherwise(col("l_linestatus")).as("l_linestatus"),
        // a NULL ship date: the open-ended-timespan case on the fact
        // side (first-wins priorities, range-join probes)
        when(col("l_orderkey") % 101 === 17, lit(null).cast("timestamp"))
          .otherwise(col("l_shipdate")).as("l_shipdate"))
    case "part" =>
      df.select(
        col("p_partkey"), col("p_name"),
        when(col("p_partkey") % 29 === 3, lit(null).cast("string"))
          .otherwise(col("p_brand")).as("p_brand"),
        when(col("p_partkey") % 29 === 7, lit(null).cast("string"))
          .otherwise(col("p_type")).as("p_type"),
        col("p_size"), col("p_retailprice"))
    case _ => df
  }

  /** Write each table as a SINGLE `name.parquet` FILE (the testdata
    * layout both `Tables.load` and the DuckDB oracle views read) by
    * relocating the one part file out of Spark's output directory.
    */
  def generate(spark: SparkSession, src: String, dst: String): Unit =
    FixtureIo.writeTwin(spark, src, dst, nullify)

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val spark = graft.Sessions.localBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst)
    spark.stop()
  }
}
