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

  test("linearFit recovers an exact line (slope, intercept, r = 1)") {
    val df = (1L to 100L).map(x => ("g", x, 2 * x + 1)).toDF("g", "x", "y")
    val r = Aggregates.linearFit(df, Seq(col("g")), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r") == 1.0)
  }

  test("linearFit detects negative correlation") {
    val df = (1L to 50L).map(x => ("g", x, -3 * x + 500)).toDF("g", "x", "y")
    val r = Aggregates.linearFit(df, Seq(col("g")), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Double]("slope") == -3.0)
    assert(r.getAs[Double]("r") == -1.0)
  }

  test("linearFit is bit-stable across partitionings (exact moments)") {
    // a noisy (non-degenerate) relation where float accumulation order
    // WOULD change low-order bits if moments were running doubles
    val rows = (1L to 1000L).map(x => ("g", x, x * 7 + (x * x) % 13))
    val a = Aggregates.linearFit(rows.toDF("g", "x", "y").repartition(1),
      Seq(col("g")), col("x"), col("y")).collect().head
    val b = Aggregates.linearFit(rows.toDF("g", "x", "y").repartition(16),
      Seq(col("g")), col("x"), col("y")).collect().head
    assert(a == b)
  }

  test("linearFit excludes half-null pairs from n and every moment") {
    // regression: n was count(*) while the sums skipped nulls, so a
    // null x or y silently skewed slope/intercept/r
    val clean = (1L to 100L).map(x => ("g", Some(x), Some(2 * x + 1)))
    val noisy = clean ++ Seq(
      ("g", None, Some(999999L)),      // null x, extreme y
      ("g", Some(999999L), None),      // extreme x, null y
      ("g", Option.empty[Long], Option.empty[Long]))
    val r = Aggregates.linearFit(noisy.toDF("g", "x", "y"),
      Seq(col("g")), col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r") == 1.0)
  }

  test("skylineMinMin keeps exactly the non-dominated points") {
    val pts = Seq((1, 10L), (1, 7L), (2, 5L), (3, 6L), (4, 4L), (5, 9L))
      .toDF("x", "y")
    val out = Aggregates.skylineMinMin(pts, col("x"), col("y"))
      .as[(Int, Long)].collect().toSet
    // brute-force dominance over the per-x minima cross-checks the
    // sort-based frontier
    val mins = Map(1 -> 7L, 2 -> 5L, 3 -> 6L, 4 -> 4L, 5 -> 9L)
    val brute = mins.collect { case (x, y) if !mins.exists { case (x2, y2) =>
      x2 <= x && y2 <= y && (x2 < x || y2 < y) } => (x, y) }.toSet
    assert(out == brute)
    assert(out == Set((1, 7L), (2, 5L), (4, 4L)))
  }

  test("boundedQuantileThreshold equals percentile_disc on the sorted list") {
    val vals = Seq(5L, 1L, 3L, 3L, 9L, 7L, 3L, 1L) // sorted: 1 1 3 3 3 5 7 9
    val df = vals.toDF("v")
    for (p <- Seq(0.25, 0.5, 0.75, 1.0)) {
      val thr = Aggregates.boundedQuantileThreshold(df, col("v"), p)
        .collect().head.getLong(0)
      val expect = vals.sorted.apply(math.ceil(vals.size * p).toInt - 1)
      assert(thr == expect, s"p=$p: got $thr, want $expect")
    }
  }

  test("percentileRankBounded equals the count(<=)/n definition, ties share pct") {
    val vals = Seq(5L, 1L, 3L, 3L, 9L, 7L, 3L, 1L)
    val out = Aggregates.percentileRankBounded(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
        col("v"))
      .select("id", "v", "pct").as[(Long, Long, Double)].collect()
    assert(out.length == vals.length)
    out.foreach { case (_, v, pct) =>
      val expect = BigDecimal(vals.count(_ <= v).toDouble / vals.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pct == expect, s"v=$v: got $pct, want $expect")
    }
    // the maximum always calibrates to 1.0
    assert(out.filter(_._2 == 9L).forall(_._3 == 1.0))
  }

  test("percentileRankBoundedBy: per-group CDFs are independent") {
    // same value 3 sits at different ranks in each group
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 9L),
      ("b", 3L), ("b", 5L), ("b", 7L), ("b", 9L))
    val out = Aggregates.percentileRankBoundedBy(
        rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
          .toDF("id", "g", "v"),
        col("g"), col("v"))
      .select("g", "v", "pct").as[(String, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    // v=3 is 2/3 of group a but 1/4 of group b
    assert(m(("a", 3L)) == 0.6667 && m(("b", 3L)) == 0.25, m)
    // each group's maximum calibrates to 1.0 independently
    assert(m(("a", 9L)) == 1.0 && m(("b", 9L)) == 1.0)
  }

  test("percentile ranks: NULL values stay out of histogram, counts, and output") {
    // Spark sorts NULLS FIRST — an unfiltered null bucket would fold
    // into every cumulative count and shift every pct
    val rows = Seq(("a", Some(1L)), ("a", Some(3L)), ("a", None),
      ("b", Some(5L)))
    val df = rows.zipWithIndex.map { case ((g, v), i) =>
      (i.toLong, g, v.map(java.lang.Long.valueOf).orNull) }
      .toDF("id", "g", "v")
    val grouped = Aggregates.percentileRankBoundedBy(df, col("g"), col("v"))
      .select("g", "v", "pct").as[(String, Long, Double)].collect()
    // the null row is absent; group a's two non-null values calibrate
    // over n=2, unpolluted by the null
    assert(grouped.length == 3)
    val m = grouped.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("a", 1L)) == 0.5 && m(("a", 3L)) == 1.0 && m(("b", 5L)) == 1.0, m)
    val global = Aggregates.percentileRankBounded(df, col("v"))
      .select("v", "pct").as[(Long, Double)].collect().toMap
    assert(global.size == 3 && global(5L) == 1.0)
  }

  test("linearFit: constant-x and single-pair groups report NULL, never throw") {
    // ANSI mode: an unguarded covN/varXN would DIVIDE_BY_ZERO and kill
    // the whole query on the first degenerate group
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), // perfect fit
      ("b", 5L, 10L), ("b", 5L, 20L),                 // constant x
      ("c", 7L, 7L)                                   // single pair
    ).toDF("g", "x", "y")
    val out = Aggregates.linearFit(df, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("a").getAs[Double]("slope") == 10.0)
    assert(out("a").getAs[Double]("r") == 1.0)
    for (g <- Seq("b", "c")) {
      assert(out(g).isNullAt(out(g).fieldIndex("slope")), s"group $g slope")
      assert(out(g).isNullAt(out(g).fieldIndex("r")), s"group $g r")
    }
  }

  test("skylineMinMin: null coordinates are excluded, not frontier-polluting") {
    // a null-x row used to BOTH appear in the output and evict genuine
    // frontier points (NULLS FIRST put its y into every running min)
    val df = Seq((Some(1L), Some(5L)), (None, Some(1L)), (Some(3L), Some(4L)),
        (Some(2L), None))
      .toDF("x", "y")
    val out = Aggregates.skylineMinMin(df, col("x"), col("y"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 5L), (3L, 4L)), out)
  }

  test("percentileRankBoundedBy: a NULL group is a real partition") {
    val df = Seq((Some("a"), 1L), (Some("a"), 2L), (None, 3L), (None, 4L))
      .toDF("g", "v")
    val out = Aggregates.percentileRankBoundedBy(df, col("g"), col("v"))
      .collect().map(r => (Option(r.getAs[String]("g")), r.getAs[Long]("v")) ->
        r.getAs[Double]("pct")).toMap
    // null-group rows are ranked WITHIN the null partition, not dropped
    assert(out((None, 3L)) == 0.5 && out((None, 4L)) == 1.0, out)
    assert(out((Some("a"), 1L)) == 0.5 && out((Some("a"), 2L)) == 1.0)
  }

  test("medianAbsDeviationBounded is outlier-robust where mean/stddev are not") {
    // tight cluster at 10..14 plus one extreme outlier
    val vals = Seq(10L, 11L, 12L, 13L, 14L, 1000000L)
    val r = Aggregates.medianAbsDeviationBounded(vals.toDF("v"), col("v"))
      .as[(Long, Long)].collect().head
    // ceil(6*0.5)=3rd ranked: med=12; deviations sorted 0 1 1 2 2 999988
    assert(r == ((12L, 1L)), r.toString)
    // a 3-MAD cut keeps the whole cluster (deviations <= 2), drops the
    // outlier — the robustness a mean/stddev cut lacks (here the mean
    // is ~166k and stddev-based bounds would keep the outlier itself)
    val kept = vals.count(v => math.abs(v - r._1) <= 3 * r._2)
    assert(kept == 5)
  }

  test("boundedWeightedQuantileThreshold: weight mass moves the median") {
    // values 10 (weight 1 each) vs one value 100 carrying weight 20:
    // doc-count median is 10, but >half the MASS sits at 100
    val df = (Seq.fill(10)((10L, 1L)) :+ ((100L, 20L))).toDF("v", "w")
    val wmed = Aggregates.boundedWeightedQuantileThreshold(
      df, col("v"), col("w"), 0.5).as[Long].collect().head
    assert(wmed == 100L, s"weighted median: $wmed")
    val dmed = Aggregates.boundedQuantileThreshold(df, col("v"), 0.5)
      .as[Long].collect().head
    assert(dmed == 10L, s"unweighted median: $dmed")
    // weight=1 everywhere reduces to the unweighted form exactly
    val uni = Aggregates.boundedWeightedQuantileThreshold(
      df, col("v"), lit(1L), 0.5).as[Long].collect().head
    assert(uni == dmed)
  }
}
