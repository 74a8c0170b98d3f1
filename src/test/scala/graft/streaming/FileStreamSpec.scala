package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** File-source streaming integration: readStream over a parquet
  * directory (the production source shape — new files appear, Spark
  * discovers and processes them incrementally) driving the same shared
  * window aggregations as the batch path.
  */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("readStream(parquet dir) -> tumbling agg -> memory sink") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))

    // batch 0 on disk before the stream starts
    Seq(("2026-01-01 10:00:00", "click"), ("2026-01-01 10:05:00", "view"))
      .toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
      .write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamingEvents.tumbling(stream, col("ts"), "10 minutes",
      "5 minutes", Seq(col("event_type")), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // new file arrives; far-future ts advances the watermark and
      // finalizes the first windows
      Seq(("2026-01-01 11:00:00", "click")).toDF("s", "event_type")
        .select(to_timestamp(col("s")).as("ts"), col("event_type"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("fs_out")
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2026-01-01 10:00:00", "click", 1L)))
      assert(rows.contains(("2026-01-01 10:00:00", "view", 1L)))
    } finally q.stop()
  }
}
