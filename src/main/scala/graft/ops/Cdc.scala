package graft.ops

import org.apache.spark.sql.DataFrame
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
}
