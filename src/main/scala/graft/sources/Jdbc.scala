package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5: SQL-database (JDBC) source — the last SURVEY §2.1 row.
  *
  * The reference reads its registry tables out of a Postgres database
  * (export_dp1.py:66 opens the Butler over a server URI configured in
  * butler-configs/idfprod.yaml:1-4) before ever touching Parquet. The
  * Spark-first equivalent is `spark.read.jdbc`: the scan arrives as a
  * DataSource relation, so later `.select`/`.filter` become pushed
  * projections and WHERE clauses executed BY the database
  * (PushedFilters on the JDBCRelation scan), not post-hoc Spark work.
  *
  * 100 TB posture: a single-connection JDBC read funnels the whole
  * table through one task, so [[loadPartitioned]] is the scale path —
  * N executors each issue a bounded range query on a numeric column
  * (the registry's bigint surrogate keys), giving the same parallel
  * extraction shape as a Parquet scan. fetchsize keeps the per-task
  * memory bounded (cursor streaming, not whole-resultset buffering).
  *
  * The unit suite exercises this against in-memory Derby (the only
  * JDBC engine shipped with Spark); the options are engine-neutral —
  * a Postgres deployment changes the URL/driver, nothing else.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String],
                    fetchSize: Int): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  /** Single-partition read of `table` (a table name or a derived-table
    * subquery like `"(SELECT ...) t"`). Catalog-sized tables only —
    * dimension/metadata reads where one connection is the right cost.
    */
  def load(spark: SparkSession, url: String, table: String,
           user: Option[String] = None, password: Option[String] = None,
           fetchSize: Int = 1000): DataFrame =
    spark.read.jdbc(url, table, props(user, password, fetchSize))

  /** Parallel read: `numPartitions` tasks each scan one stride of
    * `partitionColumn` in [lowerBound, upperBound] (Spark widens the
    * first/last strides to catch values outside the bounds, so the
    * bounds need not be exact). This is the path for row-count-sized
    * tables — the JDBC analog of a multi-split file scan.
    */
  def loadPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      user: Option[String] = None,
                      password: Option[String] = None,
                      fetchSize: Int = 1000): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password, fetchSize))
}
