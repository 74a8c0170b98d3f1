package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S5 JDBC source against in-memory Derby (the JDBC engine shipped in
  * Spark's own jars — no new dependency): registration, predicate/
  * projection pushdown into the database, parallel partitioned reads,
  * and an existing engine operator running over the loaded frame.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE registry (id BIGINT NOT NULL, run VARCHAR(32), n INT)")
      val ins = conn.prepareStatement("INSERT INTO registry VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 2 == 0) "run_a" else "run_b")
        ins.setInt(3, i * 10)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("load reads a JDBC table and an existing operator runs over it") {
    seeded
    val df = Jdbc.load(spark, url, "registry")
    assert(df.count() == 100)
    // an existing engine op over the loaded frame (A4 group-by-key)
    val counts = df.groupBy("RUN").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("run_a" -> 50L, "run_b" -> 50L))
  }

  test("filters and projections push down INTO the database scan") {
    seeded
    val df = Jdbc.load(spark, url, "registry")
      .filter(col("ID") > 90).select("ID", "N")
    val plan = df.queryExecution.executedPlan.toString
    // JDBCRelation advertises what it shipped to the DB as SQL: the
    // REAL predicate must be in the pushed set (IsNotNull alone would
    // mean the range filter ran in Spark over a full table pull)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(ID,90)"), plan)
    assert(plan.contains("IsNotNull(ID)"), plan)
    assert(!plan.contains("RUN"), s"projection not pruned:\n$plan")
    assert(df.count() == 10)
  }

  test("loadPartitioned splits the scan into parallel range queries") {
    seeded
    val df = Jdbc.loadPartitioned(spark, url, "registry",
      partitionColumn = "ID", lowerBound = 1L, upperBound = 100L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // same rows as the single-connection read (stride edges widened)
    assert(df.count() == 100)
    assert(df.agg(sum("N")).as[Long].collect().head ==
      (1 to 100).map(_ * 10L).sum)
  }
}
