package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event-window operators
  * (graft.ops.Events) — SURVEY.md §2.10 T1–T5.
  *
  * The aggregation expressions are shared with the batch path;
  * `window`/`session_window` behave identically on static and streaming
  * DataFrames. These wrappers add only the streaming-specific pieces:
  * event-time watermarks (late-data bound + state eviction) and
  * within-watermark dedup. They accept any streaming DataFrame
  * (readStream source or MemoryStream in tests) — source wiring stays
  * at the call site, transformations stay source-agnostic.
  *
  * Scale posture: state size is bounded by the watermark horizon x key
  * cardinality; all operators shuffle once on the grouping key, state
  * lives in the executor state store (RocksDB-backed on a real
  * cluster via spark.sql.streaming.stateStore.providerClass).
  */
object StreamingEvents {

  /** Tumbling event-time window aggregate with watermark (T1 + T4). */
  def tumbling(stream: DataFrame, ts: Column, duration: String,
               watermark: String, extraKeys: Seq[Column],
               aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsName(ts), watermark)
      .groupBy(window(ts, duration) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window aggregate with watermark (T2). */
  def sliding(stream: DataFrame, ts: Column, duration: String, slide: String,
              watermark: String, extraKeys: Seq[Column],
              aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsName(ts), watermark)
      .groupBy(window(ts, duration, slide) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window with watermark (T3): events closer than `gap` merge;
    * a session closes (and its state is evicted) once the watermark
    * passes session end + gap.
    */
  def session(stream: DataFrame, ts: Column, gap: String, watermark: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsName(ts), watermark)
      .groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Stateful streaming dedup (T5): drop rows whose `keys` were already
    * seen within the watermark horizon. State is evicted as the
    * watermark advances — bounded memory, unlike plain dropDuplicates
    * on a stream (whose state grows forever).
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
                           watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  private def tsName(ts: Column): String = ts.toString
}
