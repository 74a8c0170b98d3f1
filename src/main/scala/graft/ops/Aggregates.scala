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
}
