package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("k1", 2, "b"), ("k1", 1, "a"), ("k1", 3, "c"),
    ("k2", 5, "x"), ("k2", 4, "y")).toDF("k", "prio", "v")

  test("findFirst keeps exactly the min-priority row per key") {
    val out = Windows.findFirst(df, Seq(col("k")), Seq(col("prio")))
      .select("k", "prio", "v").as[(String, Int, String)].collect().toSet
    assert(out == Set(("k1", 1, "a"), ("k2", 4, "y")))
  }

  test("findFirstK returns k ranked rows per key with 1-based rank") {
    val out = Windows.findFirstK(df, Seq(col("k")), Seq(col("prio")), k = 2,
        rankName = "rnk")
      .select("k", "v", "rnk").as[(String, String, Int)].collect().toSet
    assert(out == Set(("k1", "a", 1), ("k1", "b", 2), ("k2", "y", 1), ("k2", "x", 2)))
  }

  test("findFirst invariants hold on random data (property)") {
    val rows = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100), Gen.choose(0, 1000)))
    val prop = Prop.forAll(rows) { data =>
      val in = data.toDF("k", "prio", "v")
      val out = Windows.findFirst(in, Seq(col("k")), Seq(col("prio"), col("v")))
        .select("k", "prio", "v").as[(Int, Int, Int)].collect()
      val inSet = data.toSet
      val byKey = data.groupBy(_._1)
      // one row per key, row ∈ input, and it is the lexicographic min
      out.length == byKey.size &&
        out.forall(inSet.contains) &&
        out.forall { case (k, p, v) =>
          (p, v) == byKey(k).map(r => (r._2, r._3)).min
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("running aggregate accumulates in order within partition") {
    val in = Seq(("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 2.5), ("b", 1, 7.0))
      .toDF("k", "seq", "x")
    val out = in.select(col("k"), col("seq"),
        Windows.running(sum(col("x")), Seq(col("k")), Seq(col("seq"))).as("r"))
      .as[(String, Int, Double)].collect().toSet
    assert(out == Set(("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 17.5), ("b", 1, 7.0)))
  }

  test("rangeFrame is value-based: gaps shrink the frame, peers all enter it") {
    // days 1, 2, 10, 10, 11 with 2-unit trailing frame: the day-10 rows
    // are peers (both included for both), day-11 sees 10+10+11, and the
    // gap before 10 excludes days 1-2 entirely
    val in = Seq(("a", 1L, 1L), ("a", 2L, 10L), ("a", 10L, 100L),
      ("a", 10L, 1000L), ("a", 11L, 10000L), ("b", 10L, 7L))
      .toDF("k", "d", "x")
    val out = in.select(col("k"), col("d"), col("x"),
        Windows.rangeFrame(sum(col("x")), Seq(col("k")), col("d"),
          precedingUnits = 2).as("s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", 1L, 1L, 1L), ("a", 2L, 10L, 11L),
      ("a", 10L, 100L, 1100L), ("a", 10L, 1000L, 1100L), // peers: same frame
      ("a", 11L, 10000L, 11100L),
      ("b", 10L, 7L, 7L)))
  }

  test("lagOf/leadOf defaults fill partition edges; ntileOf covers 1..n") {
    val in = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 1))
      .toDF("k", "seq")
    val out = in.select(col("k"), col("seq"),
        Windows.lagOf(col("seq"), 1, -1, Seq(col("k")), Seq(col("seq"))).as("lg"),
        Windows.leadOf(col("seq"), 1, -1, Seq(col("k")), Seq(col("seq"))).as("ld"),
        Windows.ntileOf(2, Seq(col("k")), Seq(col("seq"))).as("nt"))
      .as[(String, Int, Int, Int, Int)].collect().toSet
    assert(out == Set(
      ("a", 1, -1, 2, 1), ("a", 2, 1, 3, 1),
      ("a", 3, 2, 4, 2), ("a", 4, 3, -1, 2),
      ("b", 1, -1, -1, 1)))
  }

  test("globalNtile equals builtin ntile for every (n, k) regime (property)") {
    import org.apache.spark.sql.expressions.{Window => W}
    val rnd = new scala.util.Random(11)
    // regimes: n < k, n = k, k | n, k does not divide n, heavy value ties
    for ((n, k) <- Seq((3, 10), (10, 10), (40, 8), (37, 5), (100, 7))) {
      val rows = (1 to n).map(i => (i.toLong, rnd.nextInt(5).toLong))
      val df = rows.toDF("id", "v").repartition(7) // scrambled input
      val order = Seq(col("v"), col("id"))         // total: id is unique
      val expected = df.select(col("id"),
          ntile(k).over(W.orderBy(order: _*)).as("b"))
        .as[(Long, Int)].collect().toMap
      val got = Windows.globalNtile(df, k, order, partitions = 4, "b")
        .select(col("id"), col("b")).as[(Long, Int)].collect().toMap
      assert(got == expected, s"n=$n k=$k")
    }
  }

  test("globalNtile never funnels the data through one task") {
    val df = spark.range(1000).select(col("id"), (col("id") % 97).as("v"))
    val out = Windows.globalNtile(df, 10, Seq(col("v"), col("id")),
      partitions = 8, "b")
    out.collect() // exchange reuse is an AQE runtime decision
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.toLowerCase.contains("ntile"), plan)
    // the side table rides the SAME range exchange, not a second scan
    assert(plan.contains("ReusedExchange") || plan.contains("reused"), plan)
  }
}
