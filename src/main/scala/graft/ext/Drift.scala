package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring ([EXT]): compare two corpus snapshots'
  * value distributions per group — the "did yesterday's crawl shift
  * under me" probe a training pipeline runs between ingests, and the
  * regression gate for a filter change (same corpus through old vs new
  * filter, distance per source).
  */
object Drift {

  /** Total-variation distance per group between snapshots A and B over
    * a discrete value column: TV = ½ Σ_v |p_A(v) − p_B(v)| ∈ [0, 1].
    *
    * TV over KL/JS by design: the numerator Σ_v |c_A(v)·N_B −
    * c_B(v)·N_A| is EXACT BIGINT arithmetic (no logs, no float
    * accumulation — summation order cannot matter), and the single
    * IEEE division by 2·N_A·N_B at the end is bit-identical on any
    * engine (SURVEY.md §7.5 determinism contract). KL would also be
    * infinite on any value seen in only one snapshot — the common case
    * for drift — where TV degrades gracefully. Caller bound:
    * c_A(v)·N_B < 2^63 (holds to ~3×10^9 rows per group per side).
    *
    * A group present in only one snapshot reports TV = 1 (the
    * distributions are disjoint).
    *
    * Scale posture: one map-side-combined hash aggregate on (group,
    * value) over the union — the only corpus-sized shuffle, bounded by
    * the value domain after combine; the per-group totals are a tiny
    * second aggregate broadcast back; the final fold sees domain-many
    * rows. Nothing corpus-sized crosses the wire twice.
    */
  def totalVariation(a: DataFrame, b: DataFrame,
                     group: Column, value: Column): DataFrame = {
    val ta = a.select(group.as("g"), value.as("v"),
      lit(1L).as("ca"), lit(0L).as("cb"))
    val tb = b.select(group.as("g"), value.as("v"),
      lit(0L).as("ca"), lit(1L).as("cb"))
    val h = ta.unionByName(tb)
      .groupBy("g", "v")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val tot = h.groupBy("g").agg(sum("ca").as("na"), sum("cb").as("nb"))
    h.join(broadcast(tot), Seq("g"))
      .groupBy("g")
      .agg(max("na").as("na"), max("nb").as("nb"),
        sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num"))
      .select(col("g"), col("na"), col("nb"),
        when(col("na") > 0 && col("nb") > 0,
          col("num").cast("double") / (lit(2L) * col("na") * col("nb")))
          .otherwise(lit(1.0)).as("tv"))
  }
}
