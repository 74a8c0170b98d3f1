package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 500 of 520 left rows share k=0
    val left = ((0 until 500).map(i => (0, i)) ++ (1 to 20).map(i => (i, i)))
      .toDF("k", "lv")
    val right = (0 to 20).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
      .select("k", "lv", "rv").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("saltedAgg equals direct aggregation") {
    val df = ((0 until 300).map(i => (0, i.toLong)) ++ Seq((1, 7L), (2, 9L)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"))
      .as[(Int, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq(col("k")), salt = 4,
        partial = sum, merge = sum, valueCol = col("v"), as = "s")
      .as[(Int, Long)].collect().toSet
    assert(salted == direct)
  }
}
