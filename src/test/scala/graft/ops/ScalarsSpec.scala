package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("p").select(colExpr.as("r")).as[String].head()

  test("stripFragment drops #fragment, keeps fragment-free paths intact") {
    assert(one(Scalars.PathOps.stripFragment(col("p")), "a/b.zip#unzip=x") == "a/b.zip")
    assert(one(Scalars.PathOps.stripFragment(col("p")), "a/b.fits") == "a/b.fits")
  }

  test("replacePrefix is anchored — mid-string occurrences survive") {
    val c = Scalars.PathOps.replacePrefix(col("p"), "file:///sdf/", "ext/")
    assert(one(c, "file:///sdf/data/x") == "ext/data/x")
    assert(one(c, "other/file:///sdf/x") == "other/file:///sdf/x")
  }

  test("route: first matching prefix wins, default prepends") {
    val c = Scalars.PathOps.route(col("p"),
      Seq("raw/" -> "zone-a/", "refcat/" -> "zone-a/"), "dp1/")
    assert(one(c, "raw/img.fits") == "zone-a/raw/img.fits")
    assert(one(c, "refcat/cat.parq") == "zone-a/refcat/cat.parq")
    assert(one(c, "coadd/x.fits") == "dp1/coadd/x.fits")
  }

  test("timespan contains: half-open with null = open-ended") {
    val df = Seq(
      (Some(10L), Some(20L), 10L, true),   // begin inclusive
      (Some(10L), Some(20L), 20L, false),  // end exclusive
      (None: Option[Long], Some(20L), -999L, true), // open begin
      (Some(10L), None: Option[Long], 999L, true),  // open end
      (None: Option[Long], None: Option[Long], 0L, true)) // fully open
      .toDF("b", "e", "t", "expected")
    val got = df.select(
      Scalars.TimespanOps.contains(
        Scalars.TimespanOps.make(col("b"), col("e")), col("t")).as("got"),
      col("expected")).as[(Boolean, Boolean)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }

  test("timespan overlaps: symmetric, half-open, null-tolerant") {
    val mk = (b: Option[Long], e: Option[Long]) =>
      struct(lit(b.orNull).cast("long").as("begin_nsec"),
        lit(e.orNull).cast("long").as("end_nsec"))
    def ov(a: (Option[Long], Option[Long]), b: (Option[Long], Option[Long])): Boolean =
      Seq(1).toDF("x").select(
        Scalars.TimespanOps.overlaps(mk(a._1, a._2), mk(b._1, b._2)).as("r"))
        .as[Boolean].head()
    assert(ov((Some(0L), Some(10L)), (Some(5L), Some(15L))))
    assert(!ov((Some(0L), Some(10L)), (Some(10L), Some(20L)))) // adjacent: no overlap
    assert(ov((None, Some(10L)), (Some(5L), None)))
    assert(ov((None, None), (Some(5L), Some(6L))))
    // symmetry
    assert(ov((Some(5L), Some(15L)), (Some(0L), Some(10L))))
  }

  test("moneyCents scales exactly (round-half-up per row)") {
    val df = Seq(1.005, 2.675, 0.0, 999.99).toDF("x")
    val out = df.select(Scalars.moneyCents(col("x")).as("c")).as[Long].collect().toSeq
    // IEEE per-row results (1.005*100 -> 100.4999... -> 100;
    // 2.675*100 -> 267.50000000000006 -> 268): the contract is
    // cross-engine bit-stability of the same double arithmetic, not
    // decimal ideals — DuckDB computes these identical values.
    assert(out == Seq(100L, 268L, 0L, 99999L))
  }
}
