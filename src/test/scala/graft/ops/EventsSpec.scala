package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  private def events = Seq(
    (ts(0), "click"), (ts(5), "click"), (ts(59), "view"))
    .toDF("ts", "event_type")

  test("tumbling windows bucket by epoch-aligned duration") {
    val out = Events.tumbling(events, col("ts"), "30 minutes", Nil,
        Seq(count(lit(1)).as("n")))
    val buckets = Events.windowBoundsMicros(out)
      .select("ws", "n").as[(Long, Long)].collect().toMap
    assert(buckets.values.sum == 3)
    assert(buckets.size == 2) // 10:00-10:30 (2 events), 10:30-11:00 (1)
  }

  test("sliding windows assign each event to duration/slide buckets") {
    val out = Events.sliding(events, col("ts"), "30 minutes", "15 minutes",
        Nil, Seq(count(lit(1)).as("n")))
    // every event lands in exactly 2 overlapping windows
    val total = out.agg(sum("n")).as[Long].head()
    assert(total == 6)
  }

  test("session windows merge within gap, split beyond it") {
    val df = Seq(
      (ts(0), "u1"), (ts(10), "u1"),  // one session (gap 15m)
      (ts(40), "u1"),                  // second session
      (ts(0), "u2")).toDF("ts", "user_id")
    val out = Events.session(df, col("ts"), "15 minutes",
        Seq(col("user_id")), Seq(count(lit(1)).as("n")))
      .select("user_id", "n").as[(String, Long)].collect()
    assert(out.count(_._1 == "u1") == 2)
    assert(out.filter(_._1 == "u1").map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(out.count(_._1 == "u2") == 1)
  }

  test("sessionTransitions: counts within-gap successors only, per key") {
    // u1: view -(5m)-> click -(31m)-> view -(1m)-> buy
    //     session break at the 31m gap: transitions view->click, view->buy
    // u2: click -(10m)-> click (same type transition counts too)
    val df = Seq(
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(5), "click"),
      (1L, 3L, ts(36), "view"), (1L, 4L, ts(37), "buy"),
      (2L, 5L, ts(0), "click"), (2L, 6L, ts(10), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.sessionTransitions(df, col("user_id"), col("ts"),
      col("event_type"), Seq(col("ts"), col("event_id")), gapSeconds = 1800L)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("view", "click", 1L), ("view", "buy", 1L),
      ("click", "click", 1L)))
    // the 31-minute gap produced NO transition (click -> view absent)
  }
}
