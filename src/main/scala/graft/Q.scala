package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark pipeline plus (when SQL-expressible)
  * an equivalent DuckDB oracle. Determinism contract (SURVEY.md §7.5):
  * final op is an ORDER BY over a unique key; additive money aggregates
  * are exact scaled-integer sums; float outputs rounded to 4 decimals;
  * computed integer outputs are BIGINT on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
