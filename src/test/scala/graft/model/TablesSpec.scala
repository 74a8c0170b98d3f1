package graft.model

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins [[Tables.load]] timestamp-unit robustness across every physical
  * encoding the testdata generator has shipped for events.ts. Round 10
  * went red because a regeneration silently switched from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (Spark-inferred TIMESTAMP_NTZ) and all six events-time queries failed
  * analysis at `unix_micros(ts)`. This spec writes the events shape
  * three ways to temp parquet and asserts the catalog normalizes each
  * to session-TZ TimestampType with identical instants, so the NEXT
  * regeneration cannot break analysis without a local red test.
  */
class TablesSpec extends SparkSpec {

  // known instants (epoch micros), deliberately spanning epoch + far future
  private val micros = Seq(0L, 1696159330123456L, 4102444799999999L)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables.load(spark, dir, "events")
    val tsType = df.schema.fields.find(_.name == "ts").get.dataType
    assert(tsType == TimestampType,
      s"Tables.load must normalize ts to TimestampType, got $tsType")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("micros-UTC (TimestampType) passes through with instants intact") {
    val dir = tmp("tables-utc")
    import spark.implicits._
    micros.toDF("us").selectExpr("timestamp_micros(us) AS ts",
        "us AS event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("micros-NTZ (TIMESTAMP_NTZ, the r10 regeneration) casts to " +
      "TimestampType with the same instants") {
    val dir = tmp("tables-ntz")
    import spark.implicits._
    val df = micros.toDF("us")
      .selectExpr("timestamp_micros(us) AS ts", "us AS event_id")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // precondition: the raw file really reads back as NTZ (session TZ is
    // UTC, so the naive datetimes carry the same instants)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "fixture must exercise the NTZ inference path")
    assert(loadedMicros(dir) == micros)
  }

  test("TIMESTAMP(NANOS) (the pre-r10 encoding) truncates to micros") {
    val dir = tmp("tables-nanos")
    // Spark cannot write nanos timestamps; author the file with
    // parquet-mr directly, with sub-micro residue to pin the truncation
    val schema = MessageTypeParser.parseMessageType(
      "message events { required int64 ts (TIMESTAMP(NANOS,false)); " +
        "required int64 event_id; }")
    val conf = new Configuration()
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    micros.zipWithIndex.foreach { case (us, i) =>
      val g = new SimpleGroup(schema)
      g.add("ts", us * 1000L + 789L) // 789ns residue must truncate away
      g.add("event_id", i.toLong)
      writer.write(g)
    }
    writer.close()
    assert(loadedMicros(dir) == micros)
  }
}
