package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) merge — the batch "MERGE INTO" the reference's importer
  * approximates with skip_existing inserts plus per-run overwrites
  * (importer.py:71 idempotent insert; exporter re-runs replace rows).
  *
  * Scale posture: latest-change election is a WindowGroupLimit (rank 1
  * per key — no full sort of the changelog), and the apply step is one
  * key-partitioned full-outer join. Both sides stream through a single
  * hash exchange each; nothing is collected or broadcast, so a 100 TB
  * base table with a multi-TB changelog holds the same plan.
  */
object Cdc {

  /** Apply a keyed upsert/delete changelog to a base table.
    *
    * `changes` carries `key` (same column name as in `base`), a `seq`
    * column totally ordering changes within a key (caller contract:
    * unique per key — ties would make the survivor nondeterministic),
    * an `op` column in {"U","D"}, and payload columns. Per key, only the
    * latest change applies: op "D" deletes the key, op "U" patches each
    * base column `b` with the change column `patch(b)` when non-null.
    * Keys present only in `changes` insert (base columns stay null
    * unless patched); keys present only in `base` pass through. The
    * result schema is exactly `base`'s schema: change-side columns
    * outside `key`/`seq`/`op`/`patch.values` are ignored. NOTE a null
    * patch value means "keep the base value" — this merge cannot erase
    * a column to NULL (patch and erase are indistinguishable); model
    * erasure as a sentinel value or a D+reinsert if needed.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, key: String,
                     seq: String, op: String,
                     patch: Map[String, String]): DataFrame = {
    val latest = Windows.findFirst(changes, Seq(col(key)), Seq(col(seq).desc))
      // project to exactly the columns the merge consumes, so stray
      // change-side payload can't leak into (and widen) the result schema
      .select((Seq(key, seq, op) ++ patch.values).distinct.map(col): _*)
    // full-outer USING join: Spark emits coalesce(left.key, right.key)
    val merged = base.join(latest, Seq(key), "full_outer")
      .filter(col(op).isNull || col(op) =!= "D")
    val patched = patch.foldLeft(merged) { case (df, (b, c)) =>
      df.withColumn(b, coalesce(col(c), col(b)))
    }
    patched.drop(seq, op).drop(patch.values.toSeq: _*)
  }

  /** Build a slowly-changing-dimension Type 2 history from a change feed:
    * each surviving change becomes a version row carrying
    * `valid_from` (its own timestamp), `valid_to` (the next version's
    * timestamp within the key, null while open) and `is_current`.
    *
    * When `tracked` is non-empty, a change that leaves every tracked
    * column unchanged (null-safe) from the key's previous change is
    * collapsed away first — the warehouse semantics where only attribute
    * transitions open a new version. `order` must totally order changes
    * within a key (ts plus a unique tiebreak), or version boundaries at
    * ties are nondeterministic — same contract as [[Windows.findFirst]].
    *
    * Scale posture: both the collapse (lag) and the versioning (lead)
    * are windows over the SAME (key, order) spec, so the whole build is
    * ONE hash exchange on the key and one sort per partition — linear in
    * the change feed, nothing collected, no join. A 100 TB feed holds
    * the same two-window plan.
    */
  def scdType2(changes: DataFrame, keys: Seq[String], ts: String,
               order: Seq[String], tracked: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val collapsed =
      if (tracked.isEmpty) changes
      else {
        val attrs = struct(tracked.map(col): _*)
        val PREV = "__scd_prev"
        changes.withColumn(PREV, lag(attrs, 1).over(w))
          .filter(col(PREV).isNull || !(col(PREV) <=> attrs))
          .drop(PREV)
      }
    collapsed
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Keyed snapshot diff: compare two same-schema snapshots and emit one
    * row per changed key — `change_type` "I" (only in `newer`), "D"
    * (only in `older`), "U" (present in both with any payload column
    * differing, null-safe) — with every payload column carried twice as
    * `old_<c>` / `new_<c>`. Unchanged keys are dropped. The inverse of
    * [[applyChangelog]]: applying the emitted diff to `older`
    * reconstructs `newer`.
    *
    * Scale posture: one key-partitioned full-outer join (both sides
    * stream through a single hash exchange each; AQE splits skewed
    * keys), and the change predicate is a per-row null-safe comparison —
    * no broadcast requirement, no collect, so two 100 TB snapshots diff
    * in one shuffle round. Keys must be unique per snapshot (it is a
    * snapshot), or the join fans out.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keys: Seq[String],
                   changeCol: String = "change_type"): DataFrame = {
    require(older.columns.toSeq == newer.columns.toSeq,
      s"snapshotDiff: snapshots must share a schema, got " +
        s"${older.columns.mkString(",")} vs ${newer.columns.mkString(",")}")
    val payload = older.columns.filterNot(keys.contains).toSeq
    val IN_OLD = "__diff_in_old"
    val IN_NEW = "__diff_in_new"
    val o = payload.foldLeft(older)((d, c) => d.withColumnRenamed(c, s"old_$c"))
      .withColumn(IN_OLD, lit(true))
    val n = payload.foldLeft(newer)((d, c) => d.withColumnRenamed(c, s"new_$c"))
      .withColumn(IN_NEW, lit(true))
    val changed = payload.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn(changeCol,
        when(col(IN_OLD).isNull, "I")
          .when(col(IN_NEW).isNull, "D")
          .when(changed, "U"))
      .filter(col(changeCol).isNotNull)
      .select((keys.map(col) :+ col(changeCol)) ++
        payload.map(c => col(s"old_$c")) ++ payload.map(c => col(s"new_$c")): _*)
  }
}
