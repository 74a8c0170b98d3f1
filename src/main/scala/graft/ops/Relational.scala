package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operators: joins (incl. semi/anti/range/literal-batch),
  * set ops, deterministic dedup.
  *
  * Scale posture: every operator is DataFrame -> DataFrame, no driver-side
  * collect on the data path (SURVEY.md §7.4.6). Small sides are broadcast
  * explicitly; AQE handles the rest (skew, runtime broadcast conversion).
  */
object Relational {

  /** Semi-join: keep left rows whose key appears on the right.
    * Reference: exporter.py:136 (only export associations for released
    * datasets) and importer.py:124 (only import datastore rows for
    * imported datasets). At scale this is the IN-set filter of P4 done
    * as a distributed join instead of a collected set.
    */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Anti-join: keep left rows whose key is absent on the right.
    * Reference: importer.py:71 `skip_existing=True` idempotent inserts —
    * insert only records not already present.
    */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Join against a small literal key batch, always broadcast.
    * Reference: export_dp1.py:110-116 `join_data_coordinates` — constrain
    * a query by an explicit list of (instrument, visit)-style pairs.
    */
  def literalKeyJoin(df: DataFrame, keyDf: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(keyDf), keys, "inner")

  /** Interval (range) join: rows of `fact` whose `ts` falls in
    * [begin, end) of an interval row. Reference: calibration validity
    * ranges (exporter.py:81-84,129; importer.py:110-112).
    *
    * Plan shape: the interval side is broadcast (it is small in every
    * reference-shaped workload — validity ranges per calibration
    * collection), so this is a BroadcastNestedLoopJoin with the range
    * predicate evaluated in codegen, not a cartesian shuffle. If the
    * interval side ever grows large, bucket both sides by coarse time
    * bands first (band = floor(ts / width)) and equi-join on the band.
    */
  def rangeJoin(fact: DataFrame, intervals: DataFrame,
                ts: Column, begin: Column, end: Column): DataFrame =
    fact.join(broadcast(intervals), ts >= begin && ts < end, "inner")

  /** Range join for a LARGE interval side: both sides are bucketed into
    * coarse bands (caller supplies the monotone `band` mapping, e.g.
    * `c => floor(unix_micros(c) / width)`), each interval is exploded
    * into every band it touches, and the range predicate runs after a
    * plain equi-join on the band — a shuffle join instead of an
    * O(facts x intervals) nested loop. Exact: the post-filter keeps
    * half-open [begin, end) semantics; a boundary-landing end only
    * costs one harmless extra candidate band.
    */
  def bandedRangeJoin(fact: DataFrame, intervals: DataFrame,
                      ts: Column, begin: Column, end: Column,
                      band: Column => Column): DataFrame = {
    val factB = fact.withColumn("__band", band(ts))
    val ivB = intervals.withColumn("__band",
      explode(sequence(band(begin), band(end))))
    factB.join(ivB, Seq("__band"))
      .filter(ts >= begin && ts < end)
      .drop("__band")
  }

  /** Deterministic dedup on a key subset: keeps the first row per key
    * under `order` (must be total). Spark's dropDuplicates picks an
    * arbitrary row; the reference's dedup (dimension_record_parquet.py:
    * 48-58) is value-stable because duplicate dimension records are
    * identical — here we make survivor choice explicit instead.
    */
  def dedupBySubset(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    Windows.findFirst(df, keys, order)

  /** Set difference used for validation (importer.py:36-39):
    * requested minus available; nonempty result = error upstream.
    */
  def validateSubset(requested: DataFrame, available: DataFrame): DataFrame =
    requested.except(available)
}
