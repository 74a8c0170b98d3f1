package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("totalVariation: 0 on identical, 1 on disjoint, exact on a half-shift") {
    // g1: identical histograms; g2: disjoint supports; g3: A = {1,1,2,2}
    // vs B = {1,1,1,1} -> TV = |2/4 - 4/4|/2 + |2/4 - 0|/2 = 0.5;
    // g4: present only in A -> defined as 1 (disjoint by construction)
    val a = Seq(
      ("g1", 1L), ("g1", 1L), ("g1", 2L), ("g1", 2L),
      ("g2", 1L), ("g2", 1L),
      ("g3", 1L), ("g3", 1L), ("g3", 2L), ("g3", 2L),
      ("g4", 7L)).toDF("g", "v")
    val b = Seq(
      ("g1", 1L), ("g1", 1L), ("g1", 2L), ("g1", 2L),
      ("g2", 2L), ("g2", 2L),
      ("g3", 1L), ("g3", 1L), ("g3", 1L), ("g3", 1L)).toDF("g", "v")
    val out = Drift.totalVariation(a, b, col("g"), col("v"))
      .select("g", "tv").as[(String, Double)].collect().toMap
    assert(out == Map("g1" -> 0.0, "g2" -> 1.0, "g3" -> 0.5, "g4" -> 1.0), out)
  }

  test("totalVariation is symmetric and within [0, 1]") {
    val a = Seq(("s", 1L), ("s", 1L), ("s", 2L), ("s", 3L)).toDF("g", "v")
    val b = Seq(("s", 1L), ("s", 3L), ("s", 3L)).toDF("g", "v")
    val ab = Drift.totalVariation(a, b, col("g"), col("v"))
      .select("tv").as[Double].head()
    val ba = Drift.totalVariation(b, a, col("g"), col("v"))
      .select("tv").as[Double].head()
    assert(ab == ba, s"$ab != $ba")
    assert(ab >= 0.0 && ab <= 1.0)
    // hand check: pA = (2/4, 1/4, 1/4), pB = (1/3, 0, 2/3);
    // TV = (|2/4-1/3| + |1/4-0| + |1/4-2/3|)/2 = (2+3+5)/24 = 5/12
    // exact integer form: |2*3-1*4| + |1*3-0| + |1*3-2*4| = 10; 10/(2*4*3)
    assert(ab == 10.0 / 24.0, ab)
  }
}
