package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming twins (SURVEY.md §2.10 T4/T5) — semantics the batch oracle
  * can't check: watermark-driven window finalization and stateful dedup
  * with bounded state.
  */
class StreamingEventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("T4: watermark finalizes tumbling windows; late data is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = StreamingEvents.tumbling(
      input.toDF().toDF("ts", "event_type"),
      col("ts"), "10 minutes", "5 minutes", Nil, Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("t4_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "a"), (ts(3), "b"))   // window [10:00,10:10)
      q.processAllAvailable()
      input.addData((ts(20), "c"))                // advances watermark to 10:15
      q.processAllAvailable()
      input.addData((ts(1), "late"))              // behind watermark -> dropped
      q.processAllAvailable()
      input.addData((ts(40), "d"))                // close [10:20,10:30)
      q.processAllAvailable()
      val rows = spark.table("t4_out")
        .select(col("window.start").cast("string"), col("n"))
        .as[(String, Long)].collect().toMap
      // the finalized 10:00 window counts 2 — the late event never lands
      assert(rows("2026-01-01 10:00:00") == 2L)
      assert(rows("2026-01-01 10:20:00") == 1L)
    } finally q.stop()
  }

  test("sessionizer accepts the REAL testdata events schema via " +
      "Tables.normalizeTs (NTZ regression guard, all sf dirs)") {
    // The MemoryStream twins construct their own typed data and never
    // saw the r10 NTZ regeneration; this case streams the actual
    // events.parquet bytes (TIMESTAMP_NTZ on disk) through the same
    // normalization Tables.load applies, into the sessionizer.
    val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    // every sf dir's schema must normalize to TimestampType (cheap)
    sfDirs.foreach { d =>
      val t = graft.model.Tables.load(spark, d, "events")
        .schema("ts").dataType
      assert(t == org.apache.spark.sql.types.TimestampType, s"$d: $t")
    }
    // full stream drive on the smallest dir; the testdata table is a
    // single FILE and a file-source stream needs a directory, so link
    // the same bytes under a temp dir
    val src = s"${sfDirs.head}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("ntz-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(src) // schema as the file stores it
    val stream = graft.model.Tables.normalizeTs(
        spark.readStream.schema(raw.schema).parquet(dir.toString))
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("string").as("user_id"), col("ts"))
      .as[StatefulSessions.Event]
    val out = StatefulSessions.sessionize(stream, gapMs = 30 * 60 * 1000L,
      watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("ntz_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // watermark trails max event time, so only sessions closed behind
      // it emit — with the full file in one batch there may be none;
      // the assertion that matters is the stream ANALYZED and RAN (the
      // r10 failure threw before any batch), plus state was exercised
      val processed = q.recentProgress.map(_.numInputRows).sum
      assert(processed > 0, "stream processed no rows")
    } finally q.stop()
  }

  test("T5: dropDuplicatesWithinWatermark dedups keys within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingEvents.dedupWithinWatermark(
      input.toDF().toDF("ts", "k"), "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.format("memory").queryName("t5_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b")) // a duplicated
      q.processAllAvailable()
      input.addData((ts(3), "a")) // still within horizon -> dropped
      q.processAllAvailable()
      val seen = spark.table("t5_out").select("k").as[String].collect().toSeq
      assert(seen.sorted == Seq("a", "b"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer assigns ids and closes on timeout") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .selectExpr("user_id", "ts").as[Event](
        org.apache.spark.sql.Encoders.product[Event])
    val out = sessionize(events, gapMs = 5 * 60 * 1000, watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "u1"), (ts(2), "u1"), (ts(1), "u2"))
      q.processAllAvailable()
      // 40 min later: watermark passes both open sessions' timeouts
      input.addData((ts(40), "u3"))
      q.processAllAvailable()
      input.addData((ts(59), "u3")) // push watermark further
      q.processAllAvailable()
      val rows = spark.table("fmgws_out")
        .select("user_id", "session_id", "n_events")
        .as[(String, Long, Long)].collect().toSet
      // session_id = session start epoch millis
      assert(rows.contains(("u1", ts(0).getTime, 2L))) // two events merged
      assert(rows.contains(("u2", ts(1).getTime, 1L)))
    } finally q.stop()
  }

  test("sessionizer ids never repeat across a timeout-closed/reopened session") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .selectExpr("user_id", "ts").as[Event](
        org.apache.spark.sql.Encoders.product[Event])
    val out = sessionize(events, gapMs = 5 * 60 * 1000, watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("fmgws_reuse")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "u1"), (ts(2), "u1"))
      q.processAllAvailable()
      input.addData((ts(30), "other")) // watermark passes u1's timeout: closes via TIMEOUT path
      q.processAllAvailable()
      input.addData((ts(40), "u1"))    // u1 reopens from empty state
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2026-01-01 11:30:00"), "other")) // close the reopened session
      q.processAllAvailable()
      val u1 = spark.table("fmgws_reuse")
        .where(col("user_id") === "u1")
        .select("session_id", "start_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)
      assert(u1.map(_._1).distinct.size == u1.size,
        s"session ids must not repeat after a timeout-close: $u1")
      assert(u1 == Seq(
        (ts(0).getTime, ts(0).getTime, 2L),
        (ts(40).getTime, ts(40).getTime, 1L)))
    } finally q.stop()
  }

  test("streaming fingerprint dedup: corpus refresh keeps first-seen docs, drops re-ingests") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingEvents.dedupByFingerprint(
      input.toDF().toDF("ts", "doc_id", "text"),
      col("text"), "ts", "30 minutes")
    val q = out.writeStream.format("memory").queryName("fp_dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "alpha doc"), (ts(1), 2L, "beta doc"))
      q.processAllAvailable()
      // refresh batch: doc 1's text re-ingested under a new id (dropped),
      // one genuinely new doc (kept)
      input.addData((ts(5), 3L, "alpha doc"), (ts(6), 4L, "gamma doc"))
      q.processAllAvailable()
      val kept = spark.table("fp_dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L),
        s"previously-kept rows must survive the refresh, re-ingests must not: $kept")
      // the dedup key is internal: output schema is the input schema
      assert(spark.table("fp_dedup_out").columns.toSeq == Seq("ts", "doc_id", "text"))
    } finally q.stop()
  }

  test("watermark helpers reject a computed event-time expression") {
    val df = Seq((ts(0), "a")).toDF("ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      StreamingEvents.tumbling(df, col("ts") + expr("INTERVAL 1 MINUTE"),
        "10 minutes", "5 minutes", Nil, Seq(count(lit(1)).as("n")))
    }
    assert(e.getMessage.contains("plain column reference"))
    // a qualified reference still passes
    StreamingEvents.tumbling(df, col("ts"),
      "10 minutes", "5 minutes", Nil, Seq(count(lit(1)).as("n")))
  }

  test("hashSample is stream-safe: same deterministic subset as the batch path") {
    // stateless per-row filter -> valid on an unbounded stream with no
    // state store; content-hash determinism means the streaming subset
    // equals the batch subset of the same rows
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sampled = graft.ext.Sampling.hashSample(
      input.toDF().toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), Map("en" -> 0.4))
    val q = sampled.writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_out")
        .select("doc_id").as[Long].collect().toSet
      val batch = graft.ext.Sampling.hashSample(
        rows.toDF("doc_id", "lang"), col("doc_id"), col("lang"), Map("en" -> 0.4))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed.size < 200 && rows.filter(_._2 == "de").map(_._1).toSet.subsetOf(streamed))
    } finally q.stop()
  }

  test("composed streaming curation: quality gate + fingerprint dedup + sampling in one query") {
    // the batch curation stages are stateless projections/filters except
    // the dedup (bounded watermark state), so the whole chain runs
    // incrementally on a stream with no code changes to the operators
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val gated = input.toDF().toDF("ts", "doc_id", "text")
      .filter(graft.ext.TextAnalysis.qualityScore(col("text")) >= 0.0)
    val deduped = StreamingEvents.dedupByFingerprint(
      gated, col("text"), "ts", "30 minutes")
    val sampled = graft.ext.Sampling.hashSample(
      deduped, col("doc_id"), lit("en"), Map("en" -> 0.6))
    // weighted (importance) sampling is stateless too — composes onto
    // the same incremental query with no operator changes
    val weighted = graft.ext.Sampling.weightedHashSample(
      sampled, col("doc_id"), length(col("text")) * 400)
    val q = weighted.writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "good doc one"), (ts(1), 2L, "good doc two"))
      q.processAllAvailable()
      input.addData((ts(5), 3L, "good doc one"), (ts(6), 4L, "good doc three"))
      q.processAllAvailable()
      val kept = spark.table("curate_out").select("doc_id").as[Long].collect().toSet
      // expected = the batch pipeline over the same rows: first-seen
      // survivors (3 duplicates 1), then the same deterministic samples
      val expected = graft.ext.Sampling.weightedHashSample(
        graft.ext.Sampling.hashSample(
          Seq((1L, "good doc one"), (2L, "good doc two"),
            (4L, "good doc three")).toDF("doc_id", "text"),
          col("doc_id"), lit("en"), Map("en" -> 0.6)),
        col("doc_id"), length(col("text")) * 400)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == expected, s"composed stream must equal the batch pipeline: $kept vs $expected")
      assert(!kept.contains(3L))
    } finally q.stop()
  }

  test("streaming decontamination: bloom screen + exact verify run " +
      "incrementally on an ingest stream, equal to batch") {
    // contaminatedBloom is a stream-static shape end to end: the bloom
    // and the eval shingle set derive from the STATIC eval frame
    // (broadcast), the ingest stream explodes + joins against them,
    // and the per-doc shared count is the one stateful aggregation —
    // so the SAME operator runs unmodified on a stream. Complete mode
    // (the running contamination report); equality vs the batch path.
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.model.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val eval = docs.filter(col("doc_id") < 25)
    val corpus = docs.filter(col("doc_id") >= 25)
    val expected = graft.ext.TextAnalysis.contaminated(corpus, eval,
        col("text"), col("doc_id"), n = 13, minShared = 1)
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must have contaminated docs")
    val dir = java.nio.file.Files.createTempDirectory("bloom-stream")
    corpus.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir.toString)
    val out = graft.ext.TextAnalysis.contaminatedBloom(stream, eval,
      col("text"), col("doc_id"), n = 13, minShared = 1,
      bloomBits = 1 << 16)
    val q = out.writeStream.format("memory").queryName("bloom_stream_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("bloom_stream_out")
        .as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"streaming decontamination diverged from batch")
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the fMGWS semantics (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    import StatefulSessions._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, String)]
      val events = input.toDF().toDF("ts", "user_id")
        .withWatermark("ts", "5 minutes")
        .selectExpr("user_id", "ts").as[Event](
          org.apache.spark.sql.Encoders.product[Event])
      val out = TwsSessions.sessionize(events, gapMs = 5 * 60 * 1000)
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      try {
        input.addData((ts(0), "u1"), (ts(2), "u1"), (ts(1), "u2"))
        q.processAllAvailable()
        input.addData((ts(30), "other")) // watermark passes both timers
        q.processAllAvailable()
        input.addData((ts(40), "u1"))    // u1 reopens after timeout-close
        q.processAllAvailable()
        input.addData((Timestamp.valueOf("2026-01-01 11:30:00"), "other"))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .select("user_id", "session_id", "n_events")
          .as[(String, Long, Long)].collect().toSet
        assert(rows.contains(("u1", ts(0).getTime, 2L)))
        assert(rows.contains(("u2", ts(1).getTime, 1L)))
        // reopened session has a fresh id — no reuse across timeout-close
        assert(rows.contains(("u1", ts(40).getTime, 1L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("session stream emits merged sessions after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = StreamingEvents.session(
      input.toDF().toDF("ts", "user_id"),
      col("ts"), "5 minutes", "5 minutes",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("t3s_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "u1"), (ts(2), "u1")) // one session
      q.processAllAvailable()
      input.addData((ts(30), "u1"))               // far ahead: finalizes it
      q.processAllAvailable()
      val rows = spark.table("t3s_out").select("user_id", "n")
        .as[(String, Long)].collect()
      assert(rows.contains(("u1", 2L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val views = MemoryStream[(Timestamp, String, Long)]
    val cdf = clicks.toDF().toDF("c_ts", "c_user", "c_id")
    val vdf = views.toDF().toDF("v_ts", "v_user", "v_id")
    val joined = StreamingEvents.intervalJoin(
      cdf, "c_ts", vdf, "v_ts", "c_user", "v_user",
      horizon = "30 minutes", watermark = "10 minutes")
      .select("c_id", "v_id")
    val q = joined.writeStream.format("memory").queryName("ssij_out")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((ts(0), "u1", 100L), (ts(40), "u1", 101L), (ts(5), "u2", 102L))
      clicks.addData((ts(30), "u1", 1L), (ts(50), "u1", 2L), (ts(50), "u2", 3L))
      q.processAllAvailable()
      val rows = spark.table("ssij_out").as[(Long, Long)].collect().toSet
      // u1@30 sees v@0 (exactly on the 30-min boundary) but u2@50 does
      // not see v@5 (45 min stale); u1@50 sees v@40 only
      assert(rows == Set((1L, 100L), (2L, 101L)))
      // batch twin: identical condition on the same static data agrees
      val bc = Seq((ts(30), "u1", 1L), (ts(50), "u1", 2L), (ts(50), "u2", 3L))
        .toDF("c_ts", "c_user", "c_id")
      val bv = Seq((ts(0), "u1", 100L), (ts(40), "u1", 101L), (ts(5), "u2", 102L))
        .toDF("v_ts", "v_user", "v_id")
      val batch = bc.join(bv, expr("c_user = v_user AND " +
        "v_ts BETWEEN c_ts - INTERVAL 30 minutes AND c_ts"))
        .select("c_id", "v_id").as[(Long, Long)].collect().toSet
      assert(rows == batch)
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val views = MemoryStream[(Timestamp, String, Long)]
    val joined = StreamingEvents.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "c_id"), "c_ts",
      views.toDF().toDF("v_ts", "v_user", "v_id"), "v_ts",
      "c_user", "v_user", horizon = "30 minutes", watermark = "10 minutes",
      joinType = "leftOuter")
      .select("c_id", "v_id")
    val q = joined.writeStream.format("memory").queryName("ssij_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((ts(0), "u1", 100L))
      clicks.addData((ts(20), "u1", 1L), (ts(20), "u2", 2L)) // u2: no view
      q.processAllAvailable()
      // push both watermarks far past u2@20 + horizon so the engine can
      // prove no matching view can still arrive
      views.addData((Timestamp.valueOf("2026-01-01 14:00:00"), "zz", 999L))
      clicks.addData((Timestamp.valueOf("2026-01-01 14:00:00"), "zz", 998L))
      q.processAllAvailable()
      val rows = spark.table("ssij_outer").as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((1L, Some(100L))))   // matched within horizon
      assert(rows.contains((2L, None)))         // unmatched left emitted with null
    } finally q.stop()
  }

  test("full-outer interval join emits unmatched rows from BOTH sides") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val views = MemoryStream[(Timestamp, String, Long)]
    val joined = StreamingEvents.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "c_id"), "c_ts",
      views.toDF().toDF("v_ts", "v_user", "v_id"), "v_ts",
      "c_user", "v_user", horizon = "30 minutes", watermark = "10 minutes",
      joinType = "fullOuter")
      .select("c_id", "v_id")
    val q = joined.writeStream.format("memory").queryName("ssij_full")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((ts(0), "u1", 100L), (ts(0), "u3", 300L)) // u3: no click
      clicks.addData((ts(20), "u1", 1L), (ts(20), "u2", 2L))  // u2: no view
      q.processAllAvailable()
      views.addData((Timestamp.valueOf("2026-01-01 14:00:00"), "zz", 999L))
      clicks.addData((Timestamp.valueOf("2026-01-01 14:00:00"), "zz", 998L))
      q.processAllAvailable()
      val rows = spark.table("ssij_full")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(rows.contains((Some(1L), Some(100L)))) // matched
      assert(rows.contains((Some(2L), None)))       // left-unmatched
      assert(rows.contains((None, Some(300L))))     // right-unmatched
    } finally q.stop()
  }

  test("interval join rejects ambiguous shared column names") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Timestamp, String)].toDF().toDF("ts", "user")
    val b = MemoryStream[(Timestamp, String)].toDF().toDF("ts", "user")
    val e = intercept[IllegalArgumentException] {
      StreamingEvents.intervalJoin(a, "ts", b, "ts", "user", "user",
        "30 minutes", "10 minutes")
    }
    assert(e.getMessage.contains("ts"))
  }

  test("transformWithState as-of join equals the batch union-sort as-of (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ee: org.apache.spark.sql.Encoder[TwsAsof.Ev] =
      org.apache.spark.sql.Encoders.product[TwsAsof.Ev]
    import TwsAsof.Ev
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // lefts (clicks) and rights (views) for two keys, delivered out
      // of order: the right at ts(1) arrives AFTER the left at ts(2)
      // but within the watermark, so it must still win the match
      val evs = Seq(
        Ev("u1", ts(0), 0, 0L, "v@0"),
        Ev("u1", ts(2), 1, 1L, null),    // left@2 -> v@1 (arrives later!)
        Ev("u1", ts(1), 0, 0L, "v@1"),
        Ev("u1", ts(5), 1, 2L, null),    // left@5 -> v@5 (equal ts matches)
        Ev("u1", ts(5), 0, 0L, "v@5"),
        Ev("u2", ts(3), 1, 3L, null))    // no right for u2 at all
      val input = MemoryStream[Ev]
      val out = TwsAsof.asofBackward(
        input.toDS().withWatermark("ts", "5 minutes"))
      val q = out.writeStream.format("memory").queryName("tws_asof")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(evs(0), evs(1))            // left@2 sees only v@0 so far
        q.processAllAvailable()
        input.addData(evs(2), evs(3), evs(4), evs(5)) // late-but-in-watermark v@1
        q.processAllAvailable()
        // advance the watermark far past every left -> all matches final
        input.addData(Ev("zz", Timestamp.valueOf("2026-01-01 12:00:00"), 0, 0L, "x"))
        q.processAllAvailable()
        val streamed = spark.table("tws_asof")
          .select("k", "ts_ms", "l_id", "r_ts_ms", "r_val")
          .as[(String, Long, Long, Option[Long], Option[String])]
          .collect().toSet
        // batch twin on the identical events
        val lefts = evs.filter(_.side == 1)
          .map(e => (e.k, e.ts.getTime, e.l_id)).toDF("k", "ts_ms", "l_id")
        val rights = evs.filter(_.side == 0).filter(_.k != "zz")
          .map(e => (e.k, e.ts.getTime, e.r_val)).toDF("k", "r_ts_ms", "r_val")
        val batch = graft.ops.Temporal.asofJoinBackward(
          lefts, rights, Seq("k"), "ts_ms", "r_ts_ms")
          .select("k", "ts_ms", "l_id", "r_ts_ms", "r_val")
          .as[(String, Long, Long, Option[Long], Option[String])]
          .collect().toSet
        assert(streamed == batch)
        // the out-of-order right really did win
        assert(streamed.exists { case (_, _, id, _, v) =>
          id == 1L && v.contains("v@1") })
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState CDC election converges to the batch merge (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ce: org.apache.spark.sql.Encoder[TwsCdc.Change] =
      org.apache.spark.sql.Encoders.product[TwsCdc.Change]
    import TwsCdc.Change
    import graft.ops.Cdc
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
        .toDF("id", "name", "bal")
      // the same feed CdcSpec uses, delivered out of order with a replay
      val all = Seq(
        Change(1L, 3L, "U", Some(13.0)), Change(2L, 1L, "U", Some(21.0)),
        Change(9L, 1L, "U", Some(90.0)), Change(1L, 1L, "U", Some(11.0)),
        Change(2L, 2L, "D", Some(99.0)))
      val input = MemoryStream[Change]
      val q = TwsCdc.latestChanges(input.toDS())
        .writeStream.format("memory").queryName("tws_cdc")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(all(0), all(1), all(2)) // winners: 1->s3, 2->s1, 9->s1
        q.processAllAvailable()
        input.addData(all(3), all(4))         // 1->s1 stale; 2->s2 advances
        q.processAllAvailable()
        input.addData(all(0))                 // at-least-once replay: no-op
        q.processAllAvailable()
        val emissions = spark.table("tws_cdc").as[Change].collect()
        // the stale change and the replay emit nothing
        assert(emissions.count(_.id == 1L) == 1, emissions.toSeq.toString)
        assert(emissions.count(_.id == 2L) == 2) // s1 then s2
        // incremental view: per key, the highest-seq emission is current
        val current = emissions.groupBy(_.id).values
          .map(_.maxBy(_.seq)).toSeq
          .toDF("id", "seq", "op", "patch")
        val viaStream = Cdc.applyChangelog(base, current, "id",
          seq = "seq", op = "op", patch = Map("bal" -> "patch"))
        val viaBatch = Cdc.applyChangelog(base,
          all.toDF("id", "seq", "op", "patch"), "id",
          seq = "seq", op = "op", patch = Map("bal" -> "patch"))
        assert(viaStream.orderBy("id").collect().toSeq ==
          viaBatch.orderBy("id").collect().toSeq)
        assert(viaBatch.count() == 3) // 1 updated, 3 kept, 9 inserted; 2 deleted
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState SCD2 closes the batch-built versions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ce: org.apache.spark.sql.Encoder[TwsScd2.Change] =
      org.apache.spark.sql.Encoders.product[TwsScd2.Change]
    import TwsScd2.Change
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the CdcSpec SCD2 feed: id 1 goes a->b->b->a, id 2 stays x
      val feed = Seq(
        Change(1L, 10L, "a"), Change(1L, 20L, "b"), Change(1L, 30L, "b"),
        Change(1L, 40L, "a"), Change(2L, 10L, "x"), Change(2L, 50L, "x"))
      val input = MemoryStream[Change]
      val q = TwsScd2.closedVersions(input.toDS())
        .writeStream.format("memory").queryName("tws_scd2")
        .outputMode(OutputMode.Append()).start()
      try {
        // batch 1 unordered within the micro-batch; batch 2 advances;
        // batch 3 replays the open change (at-least-once) — no-op
        input.addData(feed(1), feed(0), feed(4))
        q.processAllAvailable()
        input.addData(feed(2), feed(3), feed(5))
        q.processAllAvailable()
        input.addData(feed(3))
        q.processAllAvailable()
        val streamed = spark.table("tws_scd2")
          .as[TwsScd2.ClosedVersion].collect()
          .map(v => (v.id, v.tier, v.valid_from, v.valid_to)).toSet
        val batch = graft.ops.Cdc.scdType2(
          feed.toDF("id", "ts", "tier", "seq"),
          Seq("id"), "ts", order = Seq("ts", "seq"), tracked = Seq("tier"))
          .filter(!col("is_current"))
          .select("id", "tier", "valid_from", "valid_to")
          .as[(Long, String, Long, Long)].collect().toSet
        assert(streamed == batch, s"streamed=$streamed batch=$batch")
        // open versions live in state, not emissions: id 2 never closed
        assert(!streamed.exists(_._1 == 2L))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState SCD2 folds equal-ts ties deterministically by seq") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ce: org.apache.spark.sql.Encoder[TwsScd2.Change] =
      org.apache.spark.sql.Encoders.product[TwsScd2.Change]
    import TwsScd2.Change
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two changes at the SAME ts delivered in reverse seq order within
      // one micro-batch: without the seq tiebreak the fold order (and so
      // which tier survives as open) depended on unstable row order
      val input = MemoryStream[Change]
      val q = TwsScd2.closedVersions(input.toDS())
        .writeStream.format("memory").queryName("tws_scd2_tie")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          Change(7L, 10L, "q", seq = 2L), Change(7L, 10L, "p", seq = 1L))
        q.processAllAvailable()
        // p (seq 1) folds first, q (seq 2) closes it as a zero-width
        // version — exactly what batch scdType2's lead() emits for a tie
        input.addData(Change(7L, 20L, "r", seq = 3L))
        q.processAllAvailable()
        val got = spark.table("tws_scd2_tie")
          .as[TwsScd2.ClosedVersion].collect()
          .map(v => (v.tier, v.valid_from, v.valid_to)).toSet
        assert(got == Set(("p", 10L, 10L), ("q", 10L, 20L)), got.toString)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState EWMA emissions are bit-identical to the batch column") {
    implicit val sqlCtx = spark.sqlContext
    implicit val pe: org.apache.spark.sql.Encoder[TwsEwma.Point] =
      org.apache.spark.sql.Encoders.product[TwsEwma.Point]
    import TwsEwma.Point
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two keys, > 8 points each so the lag window saturates; values
      // chosen non-representable (thirds) to make bit-equality a real test
      val pts = (1 to 12).flatMap { i =>
        Seq(Point("a", i.toLong, i / 3.0), Point("b", i.toLong, (100 - i) / 7.0))
      }
      val input = MemoryStream[Point]
      val q = TwsEwma.smoothed(input.toDS())
        .writeStream.format("memory").queryName("tws_ewma").start()
      try {
        val (first, rest) = pts.splitAt(7)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        val streamed = spark.table("tws_ewma").as[TwsEwma.Smoothed].collect()
          .map(s => (s.k, s.seq) -> s.ewma).toMap
        val batch = graft.ops.Temporal.ewmaBounded(
            pts.toDF("k", "seq", "v"), Seq("k"), Seq("seq"), col("v"))
          .select("k", "seq", "ewma")
          .as[(String, Long, Double)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(streamed.keySet == batch.keySet)
        assert(streamed.forall { case (k, v) => batch(k) == v },
          streamed.collect { case (k, v) if batch(k) != v =>
            s"$k stream=$v batch=${batch(k)}" }.mkString(", "))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
  test("transformWithState priority sample reconstructs to the exact batch bottom-k") {
    implicit val sqlCtx = spark.sqlContext
    implicit val de: org.apache.spark.sql.Encoder[TwsSampler.Doc] =
      org.apache.spark.sql.Encoders.product[TwsSampler.Doc]
    import TwsSampler.Doc
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two groups, fractional + integer weights (the batch operator's
      // fractional-weight contract must hold on the stream too)
      val docs = (1 to 30).flatMap { i =>
        Seq(Doc("g1", s"d$i", if (i % 3 == 0) 0.5 else i.toDouble),
          Doc("g2", s"e$i", 1.0 + (i % 5)))
      }
      val input = MemoryStream[Doc]
      val q = TwsSampler.sampled(input.toDS(), k = 7)
        .writeStream.format("memory").queryName("tws_sample").start()
      try {
        val (first, rest) = docs.splitAt(11)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        val events = spark.table("tws_sample")
          .as[TwsSampler.SampleEvent].collect()
        // current sample per group = added keys minus evicted keys
        val streamed = events.groupBy(_.g).map { case (g, evs) =>
          g -> (evs.filter(!_.evicted).map(_.key).toSet --
            evs.filter(_.evicted).map(_.key).toSet)
        }
        val batchOf = Map("g1" -> "g1", "g2" -> "g2").map { case (g, _) =>
          g -> graft.ext.Sampling.prioritySample(
              docs.filter(_.g == g).map(d => (d.key, d.weight))
                .toDF("key", "weight"),
              col("key"), col("weight"), k = 7)
            .select("key").as[String].collect().toSet
        }
        assert(streamed.keySet == Set("g1", "g2"))
        assert(streamed("g1") == batchOf("g1"),
          s"g1 stream=${streamed("g1")} batch=${batchOf("g1")}")
        assert(streamed("g2") == batchOf("g2"),
          s"g2 stream=${streamed("g2")} batch=${batchOf("g2")}")
        // replaying already-admitted members is a no-op (at-least-once)
        input.addData(first: _*)
        q.processAllAvailable()
        val replayed = spark.table("tws_sample")
          .as[TwsSampler.SampleEvent].collect()
        assert(replayed.length == events.length,
          "replay of current members must not emit")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState drift emissions converge to the batch TV distance") {
    implicit val sqlCtx = spark.sqlContext
    implicit val oe: org.apache.spark.sql.Encoder[TwsDrift.Obs] =
      org.apache.spark.sql.Encoders.product[TwsDrift.Obs]
    import TwsDrift.Obs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ref = Map(
        "s1" -> Map(1L -> 2L, 2L -> 2L),
        "s2" -> Map(5L -> 1L))
      val obs = Seq(
        Obs("s1", 1L), Obs("s1", 1L), Obs("s1", 2L), Obs("s2", 5L),
        Obs("s1", 2L), Obs("s1", 3L), Obs("s2", 5L), Obs("s3", 9L))
      val input = MemoryStream[Obs]
      val q = TwsDrift.drift(input.toDS(), ref)
        .writeStream.format("memory").queryName("tws_drift").start()
      try {
        val (first, rest) = obs.splitAt(4)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        // latest emission per group = the row with that group's max na
        val streamed = spark.table("tws_drift").as[TwsDrift.Tv].collect()
          .groupBy(_.g).map { case (g, rows) =>
            val last = rows.maxBy(_.na)
            g -> ((last.na, last.nb, last.tv))
          }
        val refDf = ref.toSeq.flatMap { case (g, h) =>
          h.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)((g, v)) }
        }.toDF("g", "v")
        val batch = graft.ext.Drift.totalVariation(
            obs.map(o => (o.g, o.v)).toDF("g", "v"), refDf,
            col("g"), col("v"))
          .select("g", "na", "nb", "tv")
          .as[(String, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        assert(streamed == batch, s"stream=$streamed batch=$batch")
        // spot value: s1 streamed {1:2, 2:2, 3:1} vs ref {1:2, 2:2} ->
        // num = |2*4-2*5| + |2*4-2*5| + |1*4-0| = 8; 8/(2*5*4) = 0.2
        assert(batch("s1") == ((5L, 4L, 0.2)), batch("s1"))
        assert(batch("s3")._3 == 1.0) // group absent from the reference
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState quantile sketch is bit-identical to the batch " +
      "aggregate after the last micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    implicit val oe: org.apache.spark.sql.Encoder[TwsQuantiles.Obs] =
      org.apache.spark.sql.Encoders.product[TwsQuantiles.Obs]
    import TwsQuantiles.Obs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val probs = Seq(0.5, 0.9, 0.99)
      // long-tailed values spanning unit buckets and several octaves,
      // deterministically shuffled across micro-batch boundaries
      val rnd = new scala.util.Random(11L)
      val values = rnd.shuffle(
        (1 to 400).map(_.toLong) ++
          (1 to 100).map(_ => (rnd.nextInt(100000) + 1000).toLong))
      val input = MemoryStream[Obs]
      val q = TwsQuantiles.quantiles(input.toDS(), probs)
        .writeStream.format("memory").queryName("tws_q").start()
      try {
        values.grouped(120).foreach { batch =>
          input.addData(batch.map(Obs("g", _)): _*)
          q.processAllAvailable()
        }
        val n = values.size.toLong
        val streamed = spark.table("tws_q").as[TwsQuantiles.Qs].collect()
          .filter(_.n == n)
        assert(streamed.length == 1, "exactly one final emission")
        val batchRes = values.toDF("v")
          .agg(graft.functions.SketchFunctions
            .approxQuantiles(col("v"), probs).as("qs"))
          .as[Seq[Double]].collect().head
        assert(streamed.head.qs == batchRes,
          s"streaming ${streamed.head.qs} != batch $batchRes")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState heavy hitters keep the Misra-Gries guarantee " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val oe: org.apache.spark.sql.Encoder[TwsHeavyHitters.Obs] =
      org.apache.spark.sql.Encoders.product[TwsHeavyHitters.Obs]
    import TwsHeavyHitters.Obs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // zipf-ish skew + singleton tail, deterministically shuffled so
      // heavy items arrive interleaved across batch boundaries
      val items = new scala.util.Random(7L).shuffle(
        (1 to 10).flatMap(i => Seq.fill(200 / i)(s"item-$i")) ++
          (1 to 300).map(i => s"tail-$i"))
      val exact = items.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong }
      val n = items.size.toLong
      val capacity = 16
      val input = MemoryStream[Obs]
      val q = TwsHeavyHitters.heavyHitters(
          input.toDS(), capacity = capacity)
        .writeStream.format("memory").queryName("tws_hh").start()
      try {
        items.grouped(250).foreach { batch =>
          input.addData(batch.map(Obs("src", _)): _*)
          q.processAllAvailable()
        }
        val all = spark.table("tws_hh").as[TwsHeavyHitters.HH].collect()
        val latest = all.filter(_.n == n).map(h => h.item -> h.count_lo).toMap
        assert(all.map(_.n).max == n, "final emission must cover every row")
        assert(latest.size <= capacity, s"state exceeded capacity: ${latest.size}")
        // MG guarantee on the full stream: anything with true frequency
        // > n/(cap+1) survives, and counts are lower bounds within that slack
        val slack = n / (capacity + 1)
        val mustReport = exact.filter { case (_, c) => c > slack }.keySet
        assert((mustReport -- latest.keySet).isEmpty,
          s"missing guaranteed heavy hitters: ${mustReport -- latest.keySet}")
        latest.foreach { case (item, lo) =>
          assert(lo <= exact(item), s"$item overcounted: $lo > ${exact(item)}")
          assert(exact(item) - lo <= slack, s"$item drained past the slack")
        }
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState CMS estimates are bit-identical to the batch " +
      "sketch after the last micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    implicit val oe: org.apache.spark.sql.Encoder[TwsCms.Obs] =
      org.apache.spark.sql.Encoders.product[TwsCms.Obs]
    import TwsCms.Obs
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // zipf-ish skew + tail, shuffled across micro-batch boundaries
      val rnd = new scala.util.Random(13L)
      val items = rnd.shuffle(
        (1 to 10).flatMap(i => Seq.fill(200 / i)(s"w$i")) ++
          (1 to 300).map(i => s"t$i"))
      val probes = Seq("w1", "w5", "t1", "absent")
      val input = MemoryStream[Obs]
      val q = TwsCms.estimates(input.toDS(), probes, depth = 4, width = 64)
        .writeStream.format("memory").queryName("tws_cms").start()
      try {
        items.grouped(150).foreach { batch =>
          input.addData(batch.map(Obs("g", _)): _*)
          q.processAllAvailable()
        }
        val n = items.size.toLong
        val streamed = spark.table("tws_cms").as[TwsCms.Est].collect()
          .filter(_.n == n).map(e => e.item -> e.est).toMap
        assert(streamed.size == probes.size, "one final emission per probe")
        val sk = items.toDF("v")
          .agg(graft.functions.SketchFunctions
            .countMin(col("v"), depth = 4, width = 64).as("sk"))
        val batchEst = probes.map(p => p -> sk
          .select(graft.functions.SketchFunctions
            .cmsEstimate(col("sk"), lit(p))).as[Long].head()).toMap
        // CMS accumulation is counter-wise exact -> strict equality
        assert(streamed == batchEst, s"streaming $streamed != batch $batchEst")
        // sanity on the estimator itself: the true heavy count survives
        assert(streamed("w1") >= 200L)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState gap emissions equal the batch gap detector") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ee: org.apache.spark.sql.Encoder[TwsGaps.Ev] =
      org.apache.spark.sql.Encoders.product[TwsGaps.Ev]
    import TwsGaps.Ev
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // irregular per-key cadence: some adjacent deltas over the 200us
      // threshold, some under, one exactly AT it (strict > must exclude)
      val evs = Seq(
        Ev("a", 1L, 100L), Ev("a", 2L, 150L), Ev("a", 3L, 500L),
        Ev("a", 4L, 700L), Ev("a", 5L, 720L), Ev("b", 6L, 0L),
        Ev("b", 7L, 1000L), Ev("b", 8L, 1010L), Ev("c", 9L, 5L))
      val input = MemoryStream[Ev]
      val q = TwsGaps.gaps(input.toDS(), minGapUs = 200L)
        .writeStream.format("memory").queryName("tws_gaps").start()
      try {
        // split mid-key so a gap spans the micro-batch boundary
        val (first, rest) = evs.splitAt(4)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        val streamed = spark.table("tws_gaps").as[TwsGaps.Gap].collect()
          .map(g => (g.k, g.prev_id, g.id, g.gap_us)).toSet
        val batch = graft.ops.Temporal.gaps(
            evs.map(e => (e.k, e.id, e.tsUs)).toDF("k", "id", "tus"),
            Seq("k"), col("tus"), col("id"), minGapUs = 200L)
          .select("k", "prev_id", "id", "gap_us")
          .as[(String, Long, Long, Long)].collect().toSet
        assert(streamed == batch, s"stream=$streamed batch=$batch")
        // a: 150->500 (350) and 500->700 (200, AT bound: excluded); b: 0->1000
        assert(batch == Set(("a", 2L, 3L, 350L), ("b", 6L, 7L, 1000L)))
        // at-least-once replay of each key's current latest event: no-op
        input.addData(Ev("a", 5L, 720L), Ev("b", 8L, 1010L)): Unit
        q.processAllAvailable()
        assert(spark.table("tws_gaps").count() == batch.size,
          "replay of the latest event must not emit")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState covariance is bit-identical to the batch pass " +
      "after the last micro-batch (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ve: org.apache.spark.sql.Encoder[TwsCov.Vec] =
      org.apache.spark.sql.Encoders.product[TwsCov.Vec]
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dim = 3
      val vecs = Seq(
        TwsCov.Vec("g", Seq(1.5f, -0.25f, 2f)),
        TwsCov.Vec("g", Seq(0.5f, 0.75f, -1f)),
        TwsCov.Vec("g", Seq(-1.25f, 0.1f, 0.3f)),
        TwsCov.Vec("g", Seq(2.25f, -0.6f, 1.1f)),
        TwsCov.Vec("g", Seq(0.05f, 0.9f, -0.7f)))
      val input = MemoryStream[TwsCov.Vec]
      val q = TwsCov.covariance(input.toDS(), dim)
        .writeStream.format("memory").queryName("tws_cov").start()
      try {
        // split mid-stream so moments accumulate across batch boundaries
        val (first, rest) = vecs.splitAt(2)
        input.addData(first: _*)
        q.processAllAvailable()
        input.addData(rest: _*)
        q.processAllAvailable()
        val streamed = spark.table("tws_cov").as[TwsCov.Cell].collect()
          .filter(_.n == vecs.size) // final emission
          .map(c => (c.i, c.j) -> c.cov).toMap
        val batch = graft.ext.Similarity.covarianceCells(
            vecs.map(v => (v.g, v.v)).toDF("g", "embedding"),
            col("embedding"), dim = dim)
          .collect()
          .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
            r.getAs[Double]("cov")).toMap
        assert(streamed.keySet == batch.keySet)
        // bit-identical, not approximate: exact integer moments + the
        // same closed-form double arithmetic on both paths
        streamed.foreach { case (k, v) =>
          assert(v == batch(k), s"cell $k: stream $v vs batch ${batch(k)}")
        }
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState covariance matches batch on null and short " +
      "vectors (per-cell counts)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ve: org.apache.spark.sql.Encoder[TwsCov.Vec] =
      org.apache.spark.sql.Encoders.product[TwsCov.Vec]
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dim = 3
      // a null vector (contributes nothing — batch posexplode(null)
      // emits no rows) and a 2-element vector (contributes only cells
      // (0,0),(0,1),(1,1), each with its OWN count) interleaved with
      // full-length rows — the batch contract on malformed input
      val vecs = Seq(
        TwsCov.Vec("g", Seq(1.5f, -0.25f, 2f)),
        TwsCov.Vec("g", null),
        TwsCov.Vec("g", Seq(0.5f, 0.75f)),
        TwsCov.Vec("g", Seq(-1.25f, 0.1f, 0.3f)))
      val input = MemoryStream[TwsCov.Vec]
      val q = TwsCov.covariance(input.toDS(), dim)
        .writeStream.format("memory").queryName("tws_cov_ragged").start()
      try {
        input.addData(vecs.take(2): _*)
        q.processAllAvailable()
        input.addData(vecs.drop(2): _*)
        q.processAllAvailable()
        // final emission = the micro-batch 2 output (every cell was
        // touched there); keep the last row per cell
        val rows = spark.table("tws_cov_ragged").as[TwsCov.Cell].collect()
        val streamed = rows.groupBy(c => (c.i, c.j))
          .map { case (k, cs) => k -> cs.maxBy(_.n) }
        val batch = graft.ext.Similarity.covarianceCells(
            vecs.map(v => (v.g, v.v)).toDF("g", "embedding"),
            col("embedding"), dim = dim)
          .collect()
          .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
            (r.getAs[Long]("n"), r.getAs[Double]("cov"))).toMap
        assert(streamed.keySet == batch.keySet)
        streamed.foreach { case (k, c) =>
          assert((c.n, c.cov) == batch(k),
            s"cell $k: stream (${c.n}, ${c.cov}) vs batch ${batch(k)}")
        }
        // short cells carry their own counts: (0,1) saw 3 rows, (0,2) 2
        assert(streamed((0L, 1L)).n == 3L && streamed((0L, 2L)).n == 2L)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("foreachBatch LM quality gate: streamed micro-batches score " +
      "bit-identically to the batch scorer") {
    // The CCNet deploy shape: train the unigram LM OFFLINE on the
    // corpus, then gate the ingest stream per micro-batch against the
    // frozen table (TextAnalysis.scoreAgainstLm inside foreachBatch —
    // stateless, no watermark, no store). Per-doc scores must equal
    // the batch scorer exactly: every cost is integer µbits, so batch
    // boundaries cannot perturb a sum.
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.load(spark, d, "documents")
    // freeze the trained table — the stream must not retrain per batch
    val lm = graft.ext.TextAnalysis.trainUnigramLm(docs, col("text"))
      .localCheckpoint()
    val expected = graft.ext.TextAnalysis.unigramCrossEntropy(
        docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long)].collect().toSet
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.ext.TextAnalysis.scoreAgainstLm(
            b, col("text"), col("doc_id"), lm)
          .as[(Long, Long, Long)](implicitly).collect()
        ()
      }.start()
    try {
      rows.grouped(170).foreach { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream scored ${got.size} docs vs batch ${expected.size}")
  }
}
