package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral contract of the changelog merge (graft.ops.Cdc). The oracle
  * query q_merge_upsert proves the update/delete paths against DuckDB on
  * real data; the insert path (key only in the changelog) can't occur
  * there — every order's custkey exists — so it is pinned here.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def base = Seq(
    (1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
    .toDF("id", "name", "bal")

  private def changes = Seq(
    // (id, seq, op, new_bal)
    (1L, 1L, "U", 11.0),  // superseded by seq 3
    (1L, 3L, "U", 13.0),  // latest for id 1: update
    (2L, 2L, "D", 99.0),  // latest for id 2: delete
    (2L, 1L, "U", 21.0),  // superseded delete-precursor
    (9L, 1L, "U", 90.0))  // id not in base: insert
    .toDF("id", "seq", "op", "new_bal")

  private def applied = Cdc.applyChangelog(
    base, changes, "id", "seq", "op", Map("bal" -> "new_bal"))

  test("latest-wins update, delete, insert, and passthrough") {
    val out = applied.orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).orNull, r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "one", 13.0),   // updated to the seq-3 value
      (3L, "three", 30.0), // untouched passthrough
      (9L, null, 90.0)))   // inserted; unpatched base columns null
    // id 2 deleted
  }

  test("result schema is exactly the base schema") {
    assert(applied.columns.toSeq == base.columns.toSeq)
  }

  test("extra change-side payload columns do not leak into the result") {
    val noisy = changes.withColumn("audit_user", lit("etl"))
      .withColumn("ingest_ts", lit(12345L))
    val out = Cdc.applyChangelog(
      base, noisy, "id", "seq", "op", Map("bal" -> "new_bal"))
    assert(out.columns.toSeq == base.columns.toSeq)
    // and the merge result itself is unchanged by the noise
    assert(out.orderBy("id").collect().toSeq ==
      applied.orderBy("id").collect().toSeq)
  }

  test("plan: latest-change election is a WindowGroupLimit, not a full sort") {
    val p = applied.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
