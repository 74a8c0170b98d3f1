package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing ([EXT]).
  *
  * Media are opaque `binary` payloads + typed metadata structs; decode /
  * feature-extraction / resize / frame-sampling run as partition-local
  * transforms over typed Datasets (`mapPartitions`/`flatMap` with
  * case-class Encoders — the Scala analog of mapInPandas: one iterator
  * per partition, codec state initialized once per task, vectorized
  * batches in, rows out).
  *
  * The *codec* is a clearly-marked deterministic STUB — real image/audio
  * libraries are not in this environment. Everything around it is real
  * and load-bearing at scale: schema, encoders, per-partition batching,
  * skew-aware repartitioning, and the transform signatures.
  *
  * 100 TB posture: payloads never pass through the driver; blob skew is
  * handled by repartitionByPayloadSize (range-partition on byte size so
  * a few giant videos don't serialize one task); metadata-only queries
  * prune the payload column at the Parquet scan (columnar projection —
  * keep payload and meta in separate columns, never one struct).
  */
object Multimodal {

  /** One media row: id + kind + payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,             // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Option[Int],       // images/video
      height: Option[Int],
      sample_rate: Option[Int], // audio
      duration_ms: Option[Long])

  case class FeatureRow(media_id: Long, kind: String, feature: Array[Float])

  case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long,
      frame_payload: Array[Byte])

  val mediaSchema: StructType = Encoders.product[MediaRow].schema

  // ---------------------------------------------------------------- STUB
  // Deterministic fake codec. A real deployment swaps these three
  // functions for JNI/javacpp bindings (libjpeg/ffmpeg); their
  // signatures and the surrounding dataflow do not change.

  /** STUB decode->embed: hashes payload bytes into a unit-norm vector.
    * Deterministic in the payload, so tests and oracle-style replays are
    * stable.
    */
  private[ext] def stubEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling state
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(j) = ((h % 1000L).toFloat / 1000.0f)
      j += 1
    }
    val n = math.sqrt(out.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) { var k = 0; while (k < dim) { out(k) /= n; k += 1 } }
    out
  }

  /** STUB resize: replaces the payload with a size-tagged digest slice.
    * Real impl: decode, scale, re-encode.
    */
  private[ext] def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    (s"resized:${w}x$h:" + payload.length).getBytes("UTF-8")

  /** STUB frame extraction: slices the payload into fixed windows as
    * fake frames. Real impl: ffmpeg keyframe iterator.
    */
  private[ext] def stubFrames(payload: Array[Byte], everyMs: Long,
      durationMs: Long): Iterator[(Int, Long, Array[Byte])] = {
    val n = math.max(1, (durationMs / math.max(1, everyMs)).toInt)
    (0 until n).iterator.map { i =>
      val t = i * everyMs
      val start = ((payload.length.toLong * i) / n).toInt
      val end = ((payload.length.toLong * (i + 1)) / n).toInt
      (i, t, java.util.Arrays.copyOfRange(payload, start, math.max(start, end)))
    }
  }
  // ------------------------------------------------------------ end STUB

  /** Feature extraction: payload -> dense unit vector, partition-local.
    * Output feeds straight into Similarity.* (ANN / near-dup search).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    media.mapPartitions { rows =>
      // per-task codec init goes here (once per partition, not per row)
      rows.map(m => FeatureRow(m.media_id, m.kind, stubEmbed(m.payload, dim)))
    }
  }

  /** Image resize: payload rewrite + metadata update in one pass. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind == "image")
          m.copy(payload = stubResize(m.payload, w, h),
            width = Some(w), height = Some(h))
        else m
      }
    }
  }

  /** Frame sampling: one row per sampled frame (flatMap — the typed
    * analog of a generator/UDTF).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else stubFrames(m.payload, everyMs, m.duration_ms.getOrElse(0L))
        .map { case (i, t, bytes) => FrameRow(m.media_id, i, t, bytes) }
    }
  }

  /** Balance blob skew before expensive decode stages: range-partition
    * by payload size so each task gets a comparable byte budget, not a
    * comparable row count.
    */
  def repartitionByPayloadSize(media: DataFrame, partitions: Int): DataFrame =
    media.repartitionByRange(partitions, length(col("payload")))
}
