package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Scalars

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by market segment: scan + multi-join + filter + aggregate +
    * sort + limit in one plan (SURVEY.md §7.2 step 1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.load(spark, d, "lineitem")
      .join(Tables.load(spark, d, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.load(spark, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("c_mktsegment"))
      .agg(
        Scalars.sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("revenue_cents").desc, col("c_mktsegment"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
