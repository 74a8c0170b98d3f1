package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Catalog of the driver testdata tables (TESTDATA.md / FIXTURES.md §1) and
  * of the reference-shaped export layout (FIXTURES.md §2).
  *
  * Plays the role of the reference's "dimension universe" — the component
  * that derives schemas from metadata instead of hand-writing them
  * (reference: python/lsst/dp1_data_wrangling/datasets_parquet.py:92-116).
  */
object Tables {

  /** TPC-H-ish star schema + events/documents/embeddings. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. Plain columnar scan — Catalyst pushes any
    * later select/filter into the parquet reader (column pruning +
    * predicate pushdown).
    *
    * Timestamp-unit normalization (FIXTURES.md caveat / SURVEY.md §7.6):
    * the testdata generator has shipped events.ts in several physical
    * encodings across regenerations, so normalize every one of them to
    * session-TZ TimestampType (micros), which is what the whole events
    * query family and the DuckDB oracle agree on:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
    *     nanos as INT64 (legacy conf) and truncate to micros — the same
    *     truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *     TIMESTAMP_NTZ, which time functions like unix_micros reject at
    *     analysis. Session TZ is pinned UTC and DuckDB reads the same
    *     column as naive TIMESTAMP, so a cast to TimestampType preserves
    *     the instants the oracle compares.
    *   - TIMESTAMP(MICROS, UTC): already TimestampType; pass through.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // idempotent, but guard anyway: avoid re-setting session conf (and
    // invalidating conf-derived state) on every catalog call
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(nanosKey).forall(_ != "true"))
      spark.conf.set(nanosKey, "true")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** The `ts` normalization alone, for callers that build their own
    * scan — in particular `readStream` over an events-shaped directory
    * (a stream can't go through [[load]], but must apply the SAME
    * unit/zone rules or the r10 NTZ analysis failure reappears on the
    * streaming path).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Nullable nanosecond validity interval — the reference's Timespan
    * (datasets_parquet.py:119-121): a nullable struct of two int64
    * nanoseconds, open-ended bounds encoded as nulls.
    */
  val timespanType: StructType = StructType(Seq(
    StructField("begin_nsec", LongType, nullable = true),
    StructField("end_nsec", LongType, nullable = true)))

  /** Flattened datastore record (datastore_parquet.py:79-92). */
  val datastoreSchema: StructType = StructType(Seq(
    StructField("datastore_name", StringType, nullable = false),
    StructField("dataset_id", BinaryType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("formatter", StringType, nullable = true),
    StructField("storage_class", StringType, nullable = true),
    StructField("component", StringType, nullable = true),
    StructField("checksum", StringType, nullable = true),
    StructField("file_size", LongType, nullable = true)))

  /** Dataset table schema for a dataset type: UUID + run + one column per
    * data-ID dimension (datasets_parquet.py:92-116). Schema is computed
    * from the dimension list, never hand-written per type.
    */
  def datasetSchema(dataIdColumns: Seq[StructField]): StructType =
    StructType(
      StructField("dataset_id", BinaryType, nullable = false) +:
      StructField("run", StringType, nullable = false) +:
      dataIdColumns)

  /** Association table = dataset schema + collection + validity timespan
    * (datasets_parquet.py:39-49).
    */
  def associationSchema(dataIdColumns: Seq[StructField]): StructType =
    StructType(datasetSchema(dataIdColumns).fields :+
      StructField("collection", StringType, nullable = false) :+
      StructField("timespan", timespanType, nullable = true))
}
