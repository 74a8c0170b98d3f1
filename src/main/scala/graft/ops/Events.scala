package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window operators over event streams (SURVEY.md §2.10).
  *
  * The same aggregation expressions serve both the batch path (oracle-
  * checkable vs DuckDB) and the Structured Streaming twin
  * (graft.streaming.StreamingEvents): `window`/`session_window` work
  * identically on static and streaming DataFrames; the streaming twin
  * only adds `withWatermark`.
  */
object Events {

  /** Tumbling window aggregate: one bucket per `duration`, epoch-aligned. */
  def tumbling(df: DataFrame, ts: Column, duration: String,
               extraKeys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, duration) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window aggregate: each event lands in duration/slide buckets. */
  def sliding(df: DataFrame, ts: Column, duration: String, slide: String,
              extraKeys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, duration, slide) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window: events closer than `gap` merge into one session;
    * session end = last event + gap.
    */
  def session(df: DataFrame, ts: Column, gap: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Within-session event-type transition counts (path mining): how
    * often does `a` immediately precede `b` inside one session? A
    * transition exists iff the next event of the same key arrives
    * within `gapSeconds` — by the gaps-and-islands session rule
    * (gap >= threshold starts a new session) that is EXACTLY "next
    * event is in the same session", so no explicit sessionization pass
    * is needed: one lead() window over (key, order) and one count
    * aggregate, a single exchange on the key. `order` must extend to a
    * tiebreaker column if `ts` can tie (SURVEY §7.5 determinism).
    */
  def sessionTransitions(df: DataFrame, key: Column, ts: Column,
                         kind: Column, order: Seq[Column],
                         gapSeconds: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order: _*)
    df.select(kind.as("from_type"),
        lead(kind, 1).over(w).as("to_type"),
        (unix_micros(lead(ts, 1).over(w)) - unix_micros(ts)).as("gap_us"))
      .filter(col("to_type").isNotNull &&
        col("gap_us") < gapSeconds * 1000000L)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Flatten a window struct into stable BIGINT epoch-micros bounds —
    * dialect-proof for oracle comparison (no timestamp-unit drift,
    * SURVEY.md §7.6).
    */
  def windowBoundsMicros(df: DataFrame, windowCol: String = "window"): DataFrame =
    df.withColumn("ws", unix_micros(col(s"$windowCol.start")))
      .withColumn("we", unix_micros(col(s"$windowCol.end")))
      .drop(windowCol)
}
