package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("clusteringCoefficients: clique is 1.0, star center is 0.0, leaves degree-1") {
    // triangle {1,2,3} plus a star leaf 4 hanging off node 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("u", "v")
    val out = Graph.clusteringCoefficients(edges, col("u"), col("v"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(2L) == ((2L, 1L, 1.0)))   // neighborhood {1,3} fully connected
    assert(out(3L) == ((2L, 1L, 1.0)))
    // node 1: deg 3, one triangle of C(3,2)=3 possible wedges closed
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(4L) == ((1L, 0L, 0.0)))   // degree-1 leaf: cc defined as 0
  }

  test("pagerankFixedPoint: higher-degree nodes rank higher on a star") {
    // star: center 0 connected to 1..5
    val star = (1L to 5L).map(i => (0L, i)).toDF("u", "v")
    val pr = Graph.pagerankFixedPoint(star, col("u"), col("v"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(i => pr(0L) > pr(i)))
    assert((1L to 5L).map(pr).distinct.size == 1) // leaves symmetric
  }

  test("pagerankFixedPoint reads the edge source only during the cache fill") {
    // accumulator-instrumented source: every partition evaluation of
    // the edge input bumps the counter, so the count IS the number of
    // source scans x partitions. The symmetrizing union reads the
    // source twice (once per branch) in the single cache-fill job; an
    // unpersisted plan would instead re-read it in every one of the
    // `iters` join subtrees (2 x iters x partitions here).
    val acc = spark.sparkContext.longAccumulator("edge-source-evals")
    val edges = (1L to 5L).map(i => (0L, i)).toDF("u", "v")
      .coalesce(1)
      .as[(Long, Long)]
      .mapPartitions { it => acc.add(1); it }
      .toDF("u", "v")
    Graph.pagerankFixedPoint(edges, col("u"), col("v"), iters = 4).collect()
    assert(acc.value <= 2L,
      s"edge source evaluated ${acc.value} times — persist regressed")
  }

  test("pagerankFixedPoint: empty edge frame returns empty, not divide-by-zero") {
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    val out = Graph.pagerankFixedPoint(none, col("u"), col("v"), iters = 2)
    assert(out.columns.toSeq == Seq("node", "pr"))
    assert(out.count() == 0L)
  }

  test("pagerank restores AQE on every exit path") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val star = (1L to 5L).map(i => (0L, i)).toDF("u", "v")
    Graph.pagerankFixedPoint(star, col("u"), col("v"), iters = 1).collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == prev)
    // the throwing path (bad iters) must not flip AQE either
    intercept[IllegalArgumentException] {
      Graph.pagerankFixedPoint(star, col("u"), col("v"), iters = 0)
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == prev)
  }
}
