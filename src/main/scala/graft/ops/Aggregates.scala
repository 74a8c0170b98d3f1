package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation / grouping / re-nesting operators (SURVEY.md §2.4). */
object Aggregates {

  /** Distinct key accumulation (exporter.py:73,89,106 — the set of
    * exported DatasetIds). Shuffle-based, map-side partial dedup first.
    */
  def distinctKeys(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.select(keys: _*).distinct()

  /** Group -> nested collect: re-nest flat rows into per-group lists,
    * mirroring datastore_mapping.py:39-64 ({datastore -> {dataset_id ->
    * [file infos]}}). `sort_array` makes element order canonical so the
    * result is hash-stable (SURVEY.md §7.5e).
    */
  def nestCollect(df: DataFrame, groupKeys: Seq[Column],
                  payload: Column, as: String): DataFrame =
    df.groupBy(groupKeys: _*).agg(sort_array(collect_list(payload)).as(as))

  /** Routed group dispatch (importer.py:106-117): tag each row by a
    * routing expression (e.g. collection type -> associate/certify),
    * then aggregate per route.
    */
  def routeAndCount(df: DataFrame, route: Column, aggs: Seq[Column]): DataFrame =
    df.groupBy(route.as("route")).agg(aggs.head, aggs.tail: _*)

  /** Deterministic distributed least-squares fit and correlation from
    * EXACT integer moments.
    *
    * Why not Spark's `regr_slope`/`corr`: those accumulate running
    * double covariances, so the result depends on partition merge order —
    * re-running the same query on a different partition count changes
    * low-order bits, which breaks reproducible pipelines (and any
    * hash-compared oracle). Here every moment (n, Σx, Σy, Σxy, Σx², Σy²)
    * is an exact BIGINT sum — associative, order-insensitive, map-side
    * combinable — and the closed-form estimates are evaluated once per
    * group from those exact integers, so the output is bit-stable at any
    * parallelism. Caller contract: x and y are integer-valued columns
    * (scale fixed-point inputs first, e.g. [[Scalars.moneyCents]]) whose
    * moment sums fit in 64 bits.
    *
    * Null contract (SQL `REGR_*` semantics): a row where EITHER x or y
    * is null is excluded from the fit entirely — n counts only complete
    * pairs, so it stays consistent with the moment sums (a count(*) n
    * against null-skipping sums would silently skew slope/intercept/r).
    *
    * Returns per-group: n, slope, intercept (y = slope·x + intercept),
    * and Pearson r — each rounded to `scale` decimals.
    */
  def linearFit(df: DataFrame, groupKeys: Seq[Column], x: Column, y: Column,
                scale: Int = 4): DataFrame = {
    // null out BOTH coordinates when either is null: every moment
    // (including n) then skips exactly the same rows
    val pairOk = x.isNotNull && y.isNotNull
    val xl = when(pairOk, x.cast("long"))
    val yl = when(pairOk, y.cast("long"))
    val m = df.groupBy(groupKeys: _*).agg(
      count(xl).as("n"),
      sum(xl).as("__sx"), sum(yl).as("__sy"),
      sum(xl * xl).as("__sxx"), sum(xl * yl).as("__sxy"),
      sum(yl * yl).as("__syy"))
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val covN = nD * sxy - sx * sy   // n²·cov — shared numerator
    val varXN = nD * sxx - sx * sx  // n²·var(x)
    val varYN = nD * syy - sy * sy
    val slope = covN / varXN
    m.withColumn("slope", round(slope, scale))
      .withColumn("intercept", round((sy - slope * sx) / nD, scale))
      .withColumn("r", round(covN / (sqrt(varXN) * sqrt(varYN)), scale))
      .drop("__sx", "__sy", "__sxx", "__sxy", "__syy")
  }
}
