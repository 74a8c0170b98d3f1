package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("distinctKeys removes duplicates") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "v")
    assert(Aggregates.distinctKeys(df, Seq(col("id"), col("v"))).count() == 2)
  }

  test("nestCollect produces canonically sorted per-group lists") {
    val df = Seq(("d1", "pZ"), ("d1", "pA"), ("d2", "pQ")).toDF("ds", "path")
    val out = Aggregates.nestCollect(df, Seq(col("ds")), col("path"), "paths")
      .as[(String, Seq[String])].collect().toMap
    assert(out("d1") == Seq("pA", "pZ")) // sorted, not insertion order
    assert(out("d2") == Seq("pQ"))
  }

  test("routeAndCount dispatches rows by routing expression") {
    val df = Seq(("TAGGED", 1), ("CALIBRATION", 2), ("TAGGED", 3)).toDF("ctype", "n")
    val route = when(col("ctype") === "TAGGED", "associate").otherwise("certify")
    val out = Aggregates.routeAndCount(df, route, Seq(count(lit(1)).as("n")))
      .as[(String, Long)].collect().toMap
    assert(out == Map("associate" -> 2L, "certify" -> 1L))
  }
}
