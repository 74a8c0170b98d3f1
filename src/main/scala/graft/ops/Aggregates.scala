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
    // null-guarded divisors (the repo-wide ANSI rule): a constant-x
    // group — including every single-pair group — has var(x) = 0 and
    // an undefined slope; it must report NULL, not throw
    // DIVIDE_BY_ZERO and kill the query. Same for r when either
    // variance is 0. `n` can also be 0 (a group whose every pair has
    // a null side) — intercept guards it.
    val slope = covN / when(varXN =!= 0.0, varXN)
    m.withColumn("slope", round(slope, scale))
      .withColumn("intercept",
        round((sy - slope * sx) / when(col("n") >= 1, nD), scale))
      .withColumn("r", round(covN /
        when(varXN > 0.0 && varYN > 0.0, sqrt(varXN) * sqrt(varYN)), scale))
      .drop("__sx", "__sy", "__sxx", "__sxy", "__syy")
  }

  /** Exact quantile threshold for a BOUNDED-DOMAIN integer column via
    * its value histogram: returns a 1-row frame `(thr)` holding the
    * smallest value v with cume_count(v) >= ceil(n·p) — the
    * percentile_disc definition — meant to be broadcast back as a
    * filter cutoff (see q_quality_cut).
    *
    * Scale posture: the corpus-sized work is ONE hash aggregate
    * (map-side combined); the cumulative window then runs over the
    * HISTOGRAM, whose row count is bounded by the value domain (e.g.
    * <= 10001 rows for a basis-points score) at ANY corpus size — so
    * the single-task global-window collapse that makes naive
    * `ntile`/`percent_rank` quantiles a bottleneck never sees more
    * than domain-many rows here. This is why the threshold column must
    * be integer-valued: a double score has an unbounded domain and
    * degrades this plan back to a global sort.
    */
  def boundedQuantileThreshold(df: DataFrame, value: Column, p: Double): DataFrame =
    boundedWeightedQuantileThreshold(df, value, lit(1L), p)

  /** Weight-aware form of [[boundedQuantileThreshold]]: the smallest
    * value v whose cumulative WEIGHT reaches ceil(W·p) — e.g. with
    * weight = token count, p = 0.5 gives the token-mass median length
    * ("half of all training tokens live in docs at or below this
    * length"), which is what a packing/budget decision actually needs;
    * the unweighted doc-count median answers a different question when
    * long docs carry most of the mass. Weights must be non-negative
    * integers (exact BIGINT cumulative sums — no float accumulation
    * order to disagree on).
    *
    * Same scale posture: one map-side-combined hash aggregate builds
    * the weighted histogram; the cumulative window sees only
    * domain-many rows at any corpus size.
    */
  def boundedWeightedQuantileThreshold(df: DataFrame, value: Column,
                                       weight: Column, p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"p out of (0,1]: $p")
    import org.apache.spark.sql.expressions.Window
    // a quantile is a statistic of OBSERVED values: null values carry
    // no rank and must not shift cf/n (null-fixture class)
    val h = df.filter(value.isNotNull)
      .groupBy(value.as("v")).agg(sum(weight.cast("long")).as("c"))
    h.select(col("v"),
        sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cf"),
        sum("c").over(Window.partitionBy()).as("n"))
      .filter(col("cf") >= ceil(col("n") * p))
      .agg(min("v").as("thr"))
  }

  /** Winsorized per-group means: every value clipped to the corpus-wide
    * exact [pLo, pHi] quantile band before an exact-integer mean — the
    * robust location statistic a monitoring dashboard wants for
    * integer scores (a handful of pathological documents cannot drag a
    * source's mean; unlike trimming, the clipped rows still count, so
    * group sizes stay comparable).
    *
    * Scale posture: ONE bounded-domain histogram (map-combined hash
    * agg; the cumulative window sees ≤ domain-many rows at any corpus
    * size — the [[boundedQuantileThreshold]] argument) yields BOTH
    * thresholds in one pass; the 1-row band broadcasts back over the
    * corpus; the per-group rollup is exact BIGINT sums with ONE final
    * IEEE division per group (bit-stable at any parallelism).
    */
  def winsorizedMeans(df: DataFrame, group: Column, value: Column,
                      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 < pLo && pLo < pHi && pHi <= 1.0, s"bad band [$pLo, $pHi]")
    import org.apache.spark.sql.expressions.Window
    // null values can be neither ranked nor clipped (least/greatest
    // IGNORE nulls — a null row would silently clip to the hi band);
    // winsorized means are statistics of observed values only
    val s = df.select(group.as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val h = s.groupBy("v").agg(count(lit(1)).as("c"))
    val band = h.select(col("v"),
        sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cf"),
        sum("c").over(Window.partitionBy()).as("n"))
      .agg(
        min(when(col("cf") >= ceil(col("n") * pLo), col("v"))).as("lo"),
        min(when(col("cf") >= ceil(col("n") * pHi), col("v"))).as("hi"))
    s.crossJoin(broadcast(band))
      .select(col("g"), greatest(col("lo"), least(col("hi"), col("v"))).as("w"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("w").as("s"))
      .select(col("g"), col("n"), col("s"),
        (col("s").cast("double") / col("n")).as("wmean"))
  }

  /** Per-GROUP exact quantiles of an integer-valued column via the
    * bounded histogram — the per-source length/score profile
    * (p50/p90/p99 per domain) a corpus dashboard tabulates, where
    * [[boundedQuantileThreshold]] answers the corpus-wide question.
    * One row per group with one column per requested probability
    * (nearest-rank, exact).
    *
    * Scale posture: one map-side-combined hash aggregate builds the
    * (group, value) histogram — bounded by groups × value domain, not
    * the corpus; the cumulative window partitions BY GROUP over that
    * bounded frame (each partition ≤ domain-many rows), so no
    * corpus-sized sort exists anywhere. The same bounded-domain
    * argument as the global threshold, applied per partition.
    */
  def boundedGroupQuantiles(df: DataFrame, group: Column, value: Column,
                            ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"probabilities out of (0,1]: $ps")
    import org.apache.spark.sql.expressions.Window
    val h = df.select(group.as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull) // observed values only (see threshold op)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col("g"), col("v"),
      sum("c").over(w).as("cf"),
      sum("c").over(Window.partitionBy("g")).as("n"))
    val aggs = ps.map { case (name, p) =>
      min(when(col("cf") >= ceil(col("n") * p), col("v"))).as(name)
    }
    cum.groupBy("g").agg(aggs.head, aggs.tail: _*)
  }

  /** 2-D Pareto frontier, both dimensions minimized: the points
    * (x, min y at x) not dominated by any other point (one with <= on
    * both coordinates and < on at least one). Skyline/dominance is the
    * classic multi-criteria shortlist operator ("no part is both
    * smaller and cheaper").
    *
    * Scale posture: NOT the quadratic NOT-EXISTS self-join — the 2-D
    * frontier falls out of a sort: collapse to one row per distinct x
    * (min y) with a hash aggregate, then keep a point iff every
    * strictly-smaller x has a strictly-larger y, i.e. its y beats the
    * running min over the x-sorted prefix. The window runs over the
    * DISTINCT-x frame, bounded by x's domain, not the corpus (the
    * same bounded-domain argument as [[boundedQuantileThreshold]];
    * x here is an integer attribute like `p_size`).
    */
  def skylineMinMin(df: DataFrame, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // dominance is undefined for unknown coordinates: a null-x row
    // would sort NULLS FIRST, enter every later row's running min, and
    // evict genuine frontier points while itself being emitted —
    // excluded up front like every other bounded-domain statistic here
    val pts = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("x")).agg(min(y).as("y"))
    val prev = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("__pm", min("y").over(prev))
      .filter(col("__pm").isNull || col("y") < col("__pm"))
      .select(col("x"), col("y"))
  }

  /** Per-row percentile rank of an integer-valued score:
    * pct = count(score' <= score) / n, rounded to 4 — the calibration
    * step that turns a raw quality score into a corpus-relative one
    * before mixing/filtering ("keep the top 30%" composed as
    * `pct >= 0.7` stays meaningful as the corpus shifts).
    *
    * Scale posture: the [[boundedQuantileThreshold]] histogram-CDF
    * argument, extended to every row — aggregate counts per distinct
    * score (bounded by the score DOMAIN at any corpus size), cumulate
    * with one domain-bounded window, then broadcast the tiny CDF table
    * back onto the corpus. A naive `cume_dist()` window would instead
    * sort the whole corpus through one partition. Integer-valued
    * scores only, for the same domain-boundedness reason.
    */
  def percentileRankBounded(df: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL values stay out of the histogram: Spark's ORDER BY sorts
    // NULLS FIRST (the null bucket would pollute every cumulative
    // count) while the join below drops null rows anyway — the
    // percentile contract is over non-null values on both engines
    val h = df.filter(value.isNotNull)
      .groupBy(value.as("__v")).agg(count(lit(1)).as("__c"))
    val cdf = h.select(col("__v"),
        sum("__c").over(Window.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("__cf"),
        sum("__c").over(Window.partitionBy()).as("__n"))
      .select(col("__v"),
        round(col("__cf").cast("double") / col("__n"), 4).as("pct"))
    df.join(broadcast(cdf), value === col("__v")).drop("__v")
  }

  /** Per-GROUP twin of [[percentileRankBounded]]: every row's exact
    * percentile within its group's value distribution — the
    * normalization that makes scores comparable ACROSS groups ("keep
    * the top 30% per source" instead of a global cut that lets one
    * well-scoring domain crowd out the rest). Same bounded-histogram
    * CDF shape, partitioned: the windows see at most
    * |groups|·|value domain| rows at any corpus size, and the CDF
    * broadcasts back.
    */
  def percentileRankBoundedBy(df: DataFrame, group: Column,
                              value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same non-null contract as [[percentileRankBounded]] (Spark's
    // NULLS FIRST would fold a null bucket into every cumulative sum)
    val h = df.filter(value.isNotNull)
      .groupBy(group.as("__g"), value.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cdf = h.select(col("__g"), col("__v"),
        sum("__c").over(Window.partitionBy("__g").orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("__cf"),
        sum("__c").over(Window.partitionBy("__g")).as("__n"))
      .select(col("__g"), col("__v"),
        round(col("__cf").cast("double") / col("__n"), 4).as("pct"))
    // null-SAFE group equality: a NULL group is a real partition (a
    // PARTITION BY oracle keeps it), and plain === would silently drop
    // its rows from the output entirely; null VALUES still drop per
    // the documented non-null value contract
    df.join(broadcast(cdf), group <=> col("__g") && value === col("__v"))
      .drop("__g", "__v")
  }

  /** One row (med, mad): discrete median and median absolute deviation
    * of an integer column — the robust location/scale pair behind
    * outlier cuts that, unlike mean ± k·stddev, a few extreme rows
    * cannot drag ("drop docs wildly off the typical length" stays
    * meaningful when the corpus contains megabyte outliers).
    * Both medians take the ceil(n/2)-ranked element
    * ([[boundedQuantileThreshold]] p = 0.5 semantics).
    *
    * Scale posture: two bounded-histogram passes — the deviation
    * histogram's domain is at most the value domain's width, so both
    * windows stay domain-bounded at any corpus size; the 1-row median
    * broadcasts into the deviation pass.
    */
  def medianAbsDeviationBounded(df: DataFrame, value: Column): DataFrame = {
    val med = boundedQuantileThreshold(df, value, 0.5)
      .select(col("thr").as("med"))
    val dev = df.crossJoin(broadcast(med))
      .select(abs(value - col("med")).as("__d"))
    val mad = boundedQuantileThreshold(dev, col("__d"), 0.5)
      .select(col("thr").as("mad"))
    med.crossJoin(broadcast(mad))
  }
}
