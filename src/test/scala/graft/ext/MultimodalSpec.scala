package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3, 4), "image/jpeg",
      Some(640), Some(480), None, None),
    MediaRow(2L, "audio", Array[Byte](5, 6, 7), "audio/wav",
      None, None, Some(16000), Some(2000L)),
    MediaRow(3L, "video", (0 until 100).map(_.toByte).toArray, "video/mp4",
      Some(1920), Some(1080), None, Some(1000L))).toDS()

  test("feature extraction: fixed dim, unit norm, deterministic") {
    val f = extractFeatures(media, dim = 16).collect().map(r => r.media_id -> r).toMap
    assert(f.size == 3)
    assert(f.values.forall(_.feature.length == 16))
    f.values.foreach { r =>
      val n = math.sqrt(r.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // deterministic across runs (stub is pure in the payload)
    val again = extractFeatures(media, dim = 16).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    assert(f.view.mapValues(_.feature.toSeq).toMap == again)
  }

  test("resize touches only images and updates metadata with payload") {
    val out = resize(media, 64, 64).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).width.contains(64) && out(1L).height.contains(64))
    assert(new String(out(1L).payload, "UTF-8").startsWith("resized:64x64"))
    assert(out(2L).sample_rate.contains(16000))       // audio untouched
    assert(out(3L).width.contains(1920))              // video untouched
  }

  test("frame sampling: one row per window, videos only, payload sliced") {
    val frames = sampleFrames(media, everyMs = 250).collect()
    assert(frames.forall(_.media_id == 3L))           // only the video
    assert(frames.length == 4)                        // 1000ms / 250ms
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.ts_ms).sorted.toSeq == Seq(0L, 250L, 500L, 750L))
    assert(frames.map(_.frame_payload.length).sum == 100) // partition of the bytes
  }

  test("schema round-trips through parquet with payload pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    // parquet read relaxes nullability; names+types are the contract
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // metadata-only projection must not read the payload column
    val pruned = back.select("media_id", "mime", "width")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("payload"),
      s"payload not pruned from scan:\n$scan")
    assert(pruned.count() == 3)
  }

  test("skew repartition balances by payload bytes") {
    val out = repartitionByPayloadSize(media.toDF(), 2)
    assert(out.rdd.getNumPartitions == 2)
    assert(out.count() == 3)
  }
}
