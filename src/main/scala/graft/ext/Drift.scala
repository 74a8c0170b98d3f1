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
        // denominator in DOUBLE: 2·na·nb overflows BIGINT already at
        // ~2.1e9 rows per side (inside the numerator's own safe bound),
        // and ANSI would throw mid-report; the single double product is
        // exact for all counts below 2^52 and mirrored by the oracle
        when(col("na") > 0 && col("nb") > 0,
          col("num").cast("double") /
            (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
          .otherwise(lit(1.0)).as("tv"))
  }

  /** One-pass column profile: per column of `df`, row count, non-null
    * count, null count, and exact distinct count — the table-health
    * summary a pipeline materializes next to every ingested snapshot
    * (and diffs between snapshots to catch schema drift a TV monitor
    * on one column misses: a column going null-heavy, an id column
    * losing uniqueness, an enum gaining a value).
    *
    * Scale posture: ONE aggregate over one scan — Catalyst plans the
    * N-way distinct via Expand (rows × N before partial aggregation),
    * the standard multi-distinct shape; counts combine map-side. At
    * petabyte scale swap the exact distincts for the mergeable HLL
    * sketch (`SketchExpressions`) — exact here because the oracle
    * compares exact values. Output is LONG-form (one row per column)
    * so the profile of any table has the same schema.
    */
  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    val aggs = columns.flatMap { c =>
      // backtick-quoted reads: a literal dotted column name must not
      // parse as a struct-field access
      Seq(count(lit(1)).as(s"__n_$c"), count(col(s"`$c`")).as(s"__nn_$c"),
        countDistinct(col(s"`$c`")).as(s"__d_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.map { c =>
      struct(lit(c).as("column_name"), col(s"`__n_$c`").as("n_rows"),
        col(s"`__nn_$c`").as("n_nonnull"),
        (col(s"`__n_$c`") - col(s"`__nn_$c`")).as("n_null"),
        col(s"`__d_$c`").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
