package graft.ops


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed tables co-locate join keys at WRITE time, so repeated joins
  * on the bucket key need no shuffle at all — the scale lever for a
  * fact table joined on the same key by many downstream queries
  * (SURVEY.md §4: "bucketing for co-located joins").
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed join plans without a shuffle exchange") {
    // tables land in the default spark-warehouse/ dir (gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    val orders = (1L to 1000L).map(k => (k, s"o$k")).toDF("key", "ov")
    val lines = (1L to 3000L).map(i => (i % 1000 + 1, s"l$i")).toDF("key", "lv")
    orders.write.bucketBy(4, "key").sortBy("key").saveAsTable("b_orders")
    lines.write.bucketBy(4, "key").sortBy("key").saveAsTable("b_lines")

    val joined = spark.table("b_orders").join(spark.table("b_lines"), "key")
      // disable broadcast so the co-location, not a broadcast, removes
      // the shuffle
      .hint("merge")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 3000)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }
}
