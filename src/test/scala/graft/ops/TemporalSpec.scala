package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral contract of the union-sort backward as-of join
  * (graft.ops.Temporal). The oracle query q_asof_join proves it equal to
  * DuckDB's native ASOF LEFT JOIN on real data; this spec pins the edge
  * semantics on constructed rows.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    // (key, ts, l_id)
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L),
    ("b", 100L, 4L), ("c", 7L, 5L))
    .toDF("k", "ts", "l_id")

  private def right = Seq(
    // (key, rts, r_val)
    ("a", 10L, "a@10"), ("a", 15L, "a@15"), ("a", 1L, "a@1"),
    ("b", 200L, "b@200"))
    .toDF("k", "rts", "r_val")

  test("backward as-of: most recent right row at or before each left ts") {
    val out = Temporal.asofJoinBackward(left, right, Seq("k"), "ts", "rts")
      .orderBy("l_id")
      .select("l_id", "rts", "r_val")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, "a@10"),   // equal timestamp matches (>= semantics)
      (2L, 15L, "a@15"),   // most recent prior, not first prior
      (3L, 1L, "a@1"),
      (4L, null, null),    // right row exists but only AFTER the left ts
      (5L, null, null)))   // key absent on the right entirely
  }

  test("inner variant drops unmatched left rows, keeps the rest") {
    val out = Temporal.asofJoinBackward(left, right, Seq("k"), "ts", "rts",
      inner = true)
    assert(out.select("l_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    val out = Temporal.asofJoinBackward(left, right, Seq("k"), "ts", "rts")
    assert(out.count() == left.count())
    assert(out.columns.toSet == Set("k", "ts", "l_id", "rts", "r_val"))
  }

  test("plan: single exchange on the key, no join node (union-sort shape)") {
    val p = Temporal.asofJoinBackward(left, right, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }
}
