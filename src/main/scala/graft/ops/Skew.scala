package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins and aggregations.
  *
  * First line of defense is AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default) — it needs no
  * code changes and handles sort-merge skew transparently. Salting is
  * the explicit fallback for the cases AQE can't fix: hot keys in
  * shuffle-hash joins, or aggregations where one key dominates
  * (the classic null-key / default-value pile-up).
  */
object Skew {

  /** Salted equi-join: replicate each right row `salt` times, scatter
    * left rows uniformly across the replicas. The hot left key spreads
    * over `salt` reducers instead of melting one.
    *
    * Use when: left is large with skewed `keys`, right is too big to
    * broadcast but small enough to replicate `salt`x.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    val l = left.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (keys, salt), then final-aggregate on keys. Spark's hash
    * aggregation already does map-side partials, so this is only for
    * pathological cases where a single key's partials still overwhelm
    * one reducer (e.g. high-cardinality intermediate state like
    * collect_list).
    *
    * `partial` aggregates within a salt bucket; `merge` combines the
    * bucket results (e.g. partial = collect_list, merge =
    * flatten(collect_list)).
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salt: Int,
                partial: Column => Column, merge: Column => Column,
                valueCol: Column, as: String): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salt).cast("int"))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial(valueCol).as("__p"))
      .groupBy(keys: _*)
      .agg(merge(col("__p")).as(as))
}
