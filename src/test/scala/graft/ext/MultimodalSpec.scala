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

  test("resize: undecodable image blobs and non-images pass through untouched") {
    val out = resize(media, 64, 64).collect().map(r => r.media_id -> r).toMap
    // row 1's payload is not a decodable image: corrupt blobs must not
    // be rewritten (nor kill the job) — metadata stays as scanned
    assert(out(1L).payload.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(out(1L).width.contains(640) && out(1L).height.contains(480))
    assert(out(2L).sample_rate.contains(16000))       // audio untouched
    assert(out(3L).width.contains(1920))              // video untouched
  }

  /** A real PNG: 20x10 horizontal gradient, built with the same JDK
    * imageio the codec uses.
    */
  private def pngBytes(w: Int = 20, h: Int = 10): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("resize: real PNG decodes, scales, re-encodes at the target pixel size") {
    val real = Seq(MediaRow(10L, "image", pngBytes(), "image/png",
      Some(20), Some(10), None, None)).toDS()
    val out = resize(real, 8, 6).collect().head
    assert(out.width.contains(8) && out.height.contains(6) && out.mime == "image/png")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(back.getWidth == 8 && back.getHeight == 6,
      s"re-encoded payload decodes to ${back.getWidth}x${back.getHeight}")
  }

  test("feature extraction embeds real pixels for decodable images") {
    val dark = pngBytes()
    val bright = {
      val img = new java.awt.image.BufferedImage(
        20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      MediaRow(20L, "image", dark, "image/png", Some(20), Some(10), None, None),
      MediaRow(21L, "image", bright, "image/png", Some(20), Some(10), None, None))
      .toDS()
    val f = extractFeatures(ds, dim = 8).collect().map(r => r.media_id -> r.feature).toMap
    // all-white image: every pixel in the top luminance bin
    assert(math.abs(f(21L)(7) - 1.0f) < 1e-6)
    // gradient spreads across bins — histograms must differ
    assert(f(20L).toSeq != f(21L).toSeq)
    f.values.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    }
  }

  /** A real WAV: `hz`-tone sine at 8 kHz 16-bit mono, built with the
    * same javax.sound.sampled the codec uses.
    */
  private def wavBytes(hz: Double = 440.0, seconds: Double = 0.5,
      rate: Float = 8000f, amp: Double = 0.6): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("melFeatures: tone energy lands in the filter covering its " +
      "frequency; higher tone -> higher mel index; corrupt passes through") {
    val rows = Seq(
      MediaRow(50L, "audio", wavBytes(hz = 300.0), "audio/wav",
        None, None, Some(8000), Some(500L)),
      MediaRow(51L, "audio", wavBytes(hz = 2000.0), "audio/wav",
        None, None, Some(8000), Some(500L)),
      MediaRow(52L, "audio", Array[Byte](9, 9), "audio/wav",
        None, None, None, None))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val out = Multimodal.melFeatures(ds, nMels = 16).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(50L).mel_db.length == 16)
    val lo = out(50L).mel_db.indexOf(out(50L).mel_db.max)
    val hi = out(51L).mel_db.indexOf(out(51L).mel_db.max)
    // mel centers are monotone in Hz: the 2 kHz tone peaks strictly
    // above the 300 Hz tone's filter index
    assert(hi > lo, s"mel argmax not monotone: $lo vs $hi")
    // 300 Hz sits in the lower third of a 0..4 kHz mel grid
    assert(lo < 8, s"300 Hz tone peaked implausibly high: $lo")
    assert(out(52L).mel_db.isEmpty)
  }

  test("spectralFeatures: FFT finds the sine's frequency; non-audio passes through") {
    // bin width at 8 kHz / 4096-point FFT is ~1.95 Hz; the Hann-windowed
    // peak must land within one bin of the synthesized tone
    val rows = Seq(
      MediaRow(40L, "audio", wavBytes(hz = 440.0), "audio/wav",
        None, None, Some(8000), Some(500L)),
      MediaRow(41L, "audio", wavBytes(hz = 1000.0), "audio/wav",
        None, None, Some(8000), Some(500L)),
      MediaRow(42L, "audio", Array[Byte](9, 9), "audio/wav",
        None, None, None, None),               // corrupt: empty bands
      MediaRow(43L, "image", Array[Byte](1), "image/png",
        None, None, None, None))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val out = Multimodal.spectralFeatures(ds, bands = 8).collect()
      .map(r => r.media_id -> r).toMap
    assert(math.abs(out(40L).dominant_hz - 440.0) < 2.0, out(40L).dominant_hz)
    assert(math.abs(out(41L).dominant_hz - 1000.0) < 2.0, out(41L).dominant_hz)
    assert(out(40L).band_db.length == 8)
    // the band holding the tone carries the max energy: 440 Hz sits in
    // band floor(440 / (4000/8)) = 0; 1000 Hz in band 2
    assert(out(40L).band_db.indexOf(out(40L).band_db.max) == 0, out(40L).band_db.toSeq)
    assert(out(41L).band_db.indexOf(out(41L).band_db.max) == 2, out(41L).band_db.toSeq)
    assert(out(42L).band_db.isEmpty && out(42L).dominant_hz == 0f)
    assert(out(43L).band_db.isEmpty)
  }

  test("fft: parseval + impulse sanity on a known transform") {
    // impulse -> flat unit spectrum
    val re = new Array[Double](8); val im = new Array[Double](8)
    re(0) = 1.0
    Multimodal.fft(re, im)
    (0 until 8).foreach { k =>
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12)
    }
    // pure cosine at bin 1 of 8 -> spikes only at bins 1 and 7 (n/2 each)
    val re2 = Array.tabulate(8)(i => math.cos(2 * math.Pi * i / 8))
    val im2 = new Array[Double](8)
    Multimodal.fft(re2, im2)
    (0 until 8).foreach { k =>
      val mag = math.sqrt(re2(k) * re2(k) + im2(k) * im2(k))
      val expect = if (k == 1 || k == 7) 4.0 else 0.0
      assert(math.abs(mag - expect) < 1e-9, s"bin $k: $mag")
    }
  }

  test("audio codec: real WAV decodes to its sample rate, duration, and samples") {
    val decoded = Multimodal.decodeAudio(wavBytes(seconds = 0.5)).get
    assert(decoded.sampleRate == 8000)
    assert(decoded.channels == 1)
    assert(decoded.durationMs == 500L)
    assert(decoded.samples.length == 4000)
    // the sine's extremes survive the 16-bit round trip
    assert(math.abs(decoded.samples.max - 0.6f) < 0.01f)
    assert(math.abs(decoded.samples.min + 0.6f) < 0.01f)
  }

  test("probeAudio: metadata refreshed from the real stream; corrupt/non-audio untouched") {
    val rows = Seq(
      MediaRow(30L, "audio", wavBytes(seconds = 0.25), "audio/wav",
        None, None, Some(999), Some(999L)),      // stale metadata to overwrite
      MediaRow(31L, "audio", Array[Byte](9, 9, 9), "audio/wav",
        None, None, Some(44100), Some(123L)),    // corrupt: passthrough
      MediaRow(32L, "video", Array[Byte](1), "video/mp4",
        None, None, None, Some(77L))).toDS()
    val out = probeAudio(rows).collect().map(r => r.media_id -> r).toMap
    assert(out(30L).sample_rate.contains(8000) && out(30L).duration_ms.contains(250L))
    assert(out(31L).sample_rate.contains(44100) && out(31L).duration_ms.contains(123L))
    assert(out(32L).duration_ms.contains(77L))
  }

  test("feature extraction embeds real PCM for decodable audio") {
    // loud first half, near-silent second half -> energy profile must
    // be front-loaded; a stub hash embed could not see this structure
    val loudThenQuiet = {
      val a = wavBytes(seconds = 0.25, amp = 0.9)
      val b = wavBytes(seconds = 0.25, amp = 0.01)
      // decode-side concat: build one WAV with both halves' PCM
      val pa = Multimodal.decodeAudio(a).get.samples
      val pb = Multimodal.decodeAudio(b).get.samples
      val n = pa.length + pb.length
      val pcm = new Array[Byte](n * 2)
      for ((s, i) <- (pa ++ pb).zipWithIndex) {
        val v = (s * 32767).toInt
        pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ds = Seq(MediaRow(40L, "audio", loudThenQuiet, "audio/wav",
      None, None, None, None)).toDS()
    val f = extractFeatures(ds, dim = 8).collect().head.feature
    assert(f.take(4).sum > 10 * f.drop(4).sum, f.toSeq.toString)
    assert(math.abs(math.sqrt(f.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
  }

  test("perceptual dHash: resize-stable, sensitive to different content") {
    def gradientPng(w: Int, h: Int, reversed: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((if (reversed) w - 1 - x else x) * 255) / math.max(1, w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(50L, "image", gradientPng(64, 48, false), "image/png",
        Some(64), Some(48), None, None),
      MediaRow(51L, "image", gradientPng(256, 192, false), "image/png",
        Some(256), Some(192), None, None),  // same content, 4x the size
      MediaRow(52L, "image", gradientPng(64, 48, true), "image/png",
        Some(64), Some(48), None, None),    // reversed gradient
      MediaRow(53L, "image", Array[Byte](1, 2, 3), "image/png",
        None, None, None, None),            // corrupt
      MediaRow(54L, "audio", Array[Byte](9), "audio/wav",
        None, None, None, None))            // wrong kind
      .toDS()
    val fp = perceptualFingerprints(rows).collect()
      .map(r => r.media_id -> r.fp).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the same content at different resolutions hashes nearly equal...
    assert(hamming(fp(50L).get, fp(51L).get) <= 4,
      s"resize moved ${hamming(fp(50L).get, fp(51L).get)} bits")
    // ...while reversed content flips most of the 56 gradient bits
    assert(hamming(fp(50L).get, fp(52L).get) >= 32,
      s"different content only ${hamming(fp(50L).get, fp(52L).get)} bits apart")
    assert(fp(53L).isEmpty && fp(54L).isEmpty)
  }

  test("frame sampling: one row per window, videos only, payload sliced") {
    val frames = sampleFrames(media, everyMs = 250).collect()
    assert(frames.forall(_.media_id == 3L))           // only the video
    assert(frames.length == 4)                        // 1000ms / 250ms
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.ts_ms).sorted.toSeq == Seq(0L, 250L, 500L, 750L))
    assert(frames.map(_.frame_payload.length).sum == 100) // partition of the bytes
  }

  /** A real animated GIF: `colors.length` solid 8x8 frames, `delayMs`
    * apart, written with the JDK imageio GIF writer (delayTime +
    * sequence metadata) — the same stack the decoder reads with.
    */
  private def gifBytes(colors: Seq[Int], delayMs: Int): Array[Byte] =
    gifBytesFrames(colors.map(c => (c, 8, "none")), delayMs)

  /** Per-frame (color, square size, disposalMethod) variant: solid
    * size x size patches at (0,0) on an 8x8 logical screen — the shape
    * disposal semantics are observable on (a partial later frame lets
    * the disposed region show through).
    */
  private def gifBytesFrames(frames: Seq[(Int, Int, String)],
                             delayMs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (c, size, disposal) =>
      val img = new java.awt.image.BufferedImage(
        size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until size; x <- 0 until size) img.setRGB(x, y, c)
      val md = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", (delayMs / 10).toString) // 1/100 s units
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md),
        writer.getDefaultWriteParam: ImageWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("GIF frame sampling decodes REAL frames with real timing") {
    val red = 0xff0000
    val green = 0x00ff00
    val blue = 0x0000ff
    val gif = gifBytes(Seq(red, green, blue), delayMs = 200) // 600 ms total
    val vids = Seq(MediaRow(40L, "video", gif, "image/gif",
      Some(8), Some(8), None, None)).toDS()
    // ticks at 0/200/400 ms land exactly on the three frames
    val frames = sampleFrames(vids, everyMs = 200).collect().sortBy(_.ts_ms)
    assert(frames.length == 3, frames.length.toString)
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 200L, 400L))
    val pixels = frames.map { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_payload))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
      img.getRGB(4, 4) & 0xffffff
    }
    // GIF palettes may quantize slightly: match the dominant channel
    def dominant(rgb: Int): Int =
      Seq(rgb >> 16 & 0xff, rgb >> 8 & 0xff, rgb & 0xff).zipWithIndex.maxBy(_._1)._2
    assert(pixels.map(dominant).toSeq == Seq(red, green, blue).map(dominant),
      pixels.map(_.toHexString).mkString(","))
    // oversampling emits the frame on screen at each tick (100 ms ticks
    // see each 200 ms frame twice)
    val dense = sampleFrames(vids, everyMs = 100).collect()
    assert(dense.length == 6)
    // corrupt GIF: skipped, never a job kill
    val bad = Seq(MediaRow(41L, "video",
      "GIF89a garbage".getBytes("ISO-8859-1"), "image/gif",
      None, None, None, Some(500L))).toDS()
    assert(sampleFrames(bad, everyMs = 100).collect().isEmpty)
  }

  test("GIF disposal: restoreToBackgroundColor clears, restoreToPrevious rewinds") {
    val red = 0xff0000
    val green = 0x00ff00
    val blue = 0x0000ff
    def dominant(rgb: Int): Int =
      Seq(rgb >> 16 & 0xff, rgb >> 8 & 0xff, rgb & 0xff).zipWithIndex.maxBy(_._1)._2
    def px(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      img.getRGB(x, y) & 0xffffff
    // frame 0: full-screen red, restoreToBackgroundColor; frame 1: 4x4
    // green patch. At frame 1 the red must be GONE outside the patch
    // (draw-over would leave (6,6) red).
    val bg = Multimodal.decodeGifFrames(gifBytesFrames(
      Seq((red, 8, "restoreToBackgroundColor"), (green, 4, "none")), 200)).get
    assert(bg.length == 2)
    assert(dominant(px(bg(1).image, 1, 1)) == 1, "patch pixel must be green")
    val cleared = px(bg(1).image, 6, 6)
    assert((cleared >> 16 & 0xff) > 200 && (cleared >> 8 & 0xff) > 200 &&
      (cleared & 0xff) > 200, f"expected background white, got $cleared%06x")
    // frame 0: red, none; frame 1: 4x4 green, restoreToPrevious;
    // frame 2: 2x2 blue. Frame 2 composites onto the REWOUND canvas:
    // (3,3) is red again (draw-over would keep it green), (1,1) blue.
    val prev = Multimodal.decodeGifFrames(gifBytesFrames(
      Seq((red, 8, "none"), (green, 4, "restoreToPrevious"),
        (blue, 2, "none")), 200)).get
    assert(prev.length == 3)
    assert(dominant(px(prev(1).image, 3, 3)) == 1, "frame 1 patch green")
    assert(dominant(px(prev(2).image, 1, 1)) == 2, "frame 2 patch blue")
    assert(dominant(px(prev(2).image, 3, 3)) == 0,
      "restoreToPrevious must rewind the green patch back to red")
  }

  test("sampleFrames reuses one PNG encode per source frame when oversampling") {
    // 2 source frames at 200 ms, sampled every 50 ms -> 8 ticks; ticks
    // within one source frame must return the IDENTICAL cached payload
    val gif = gifBytes(Seq(0xff0000, 0x00ff00), delayMs = 200)
    val vids = Seq(MediaRow(44L, "video", gif, "image/gif",
      Some(8), Some(8), None, None)).toDS()
    val frames = sampleFrames(vids, everyMs = 50).collect().sortBy(_.ts_ms)
    assert(frames.length == 8)
    val payloads = frames.map(_.frame_payload.toSeq)
    assert(payloads.distinct.size == 2,
      "each source frame should encode to exactly one distinct PNG")
    assert(payloads.take(4).distinct.size == 1 &&
      payloads.drop(4).distinct.size == 1)
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

  // ------------------------------------------------------ video container

  /** Build a minimal valid ISO BMFF tree: ftyp + moov(mvhd v0 +
    * trak(tkhd v0)) — 90 s at timescale 600, display 640x360.
    */
  private def syntheticMp4(timescale: Int = 600, duration: Int = 54000,
                           w: Int = 640, h: Int = 360): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload size
      bb.putInt(0)                   // version+flags
        .putInt(0).putInt(0)         // creation/modification
        .putInt(timescale).putInt(duration)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload size
      bb.putInt(0)                             // version+flags
        .putInt(0).putInt(0)                   // creation/modification
        .putInt(1).putInt(0).putInt(0)         // track id, reserved, duration
      bb.position(4 + 20 + 8 + 8 + 36)         // skip reserved/layer/matrix
      bb.putInt(w << 16).putInt(h << 16)       // 16.16 fixed point
      box("tkhd", bb.array())
    }
    val ftyp = box("ftyp", "isom0000isom".getBytes("ISO-8859-1"))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  test("video container parse: real mvhd/tkhd metadata from the box tree") {
    val meta = Multimodal.probeMp4(syntheticMp4())
    assert(meta.contains(Multimodal.VideoMeta(90000L, 640, 360)))
    // v1 mvhd (64-bit times) parses too
    val v1 = {
      def box(typ: String, p: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + p.length)
        bb.putInt(8 + p.length).put(typ.getBytes("ISO-8859-1")).put(p)
        bb.array()
      }
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000)          // version 1
        .putLong(0L).putLong(0L)     // creation/modification (64-bit)
        .putInt(1000).putLong(5000L) // timescale, duration
      box("moov", box("mvhd", bb.array()))
    }
    assert(Multimodal.probeMp4(v1).map(_.durationMs).contains(5000L))
    // corrupt payloads parse to None, never throw
    assert(Multimodal.probeMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.probeMp4(syntheticMp4().take(20)).isEmpty)
  }

  test("probeVideo: metadata refreshed from the container; others untouched") {
    val rows = Seq(
      MediaRow(1L, "video", syntheticMp4(), "video/mp4",
        None, None, None, None),
      MediaRow(2L, "video", Array[Byte](9, 9), "video/mp4",
        None, None, None, Some(7L)),         // unparseable: untouched
      MediaRow(3L, "audio", syntheticMp4(), "audio/wav",
        None, None, Some(44100), None))      // wrong kind: untouched
    val out = Multimodal.probeVideo(spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow]))
      .collect().sortBy(_.media_id)
    assert(out(0).duration_ms.contains(90000L))
    assert(out(0).width.contains(640) && out(0).height.contains(360))
    assert(out(1).duration_ms.contains(7L))
    assert(out(2).duration_ms.isEmpty)
  }

  /** MP4 with a full video sample table: 4 samples (sizes 5,7,6,4) in
    * 2 chunks of 2, timescale 1000, uniform delta 500 ticks, sync
    * samples 1 and 3. Sample bytes are distinct fills so extraction
    * can be byte-verified.
    */
  private def syntheticMp4WithSamples(): (Array[Byte], Seq[Array[Byte]]) = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    def full(typ: String, ints: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * (ints.length + 1))
      bb.putInt(0) // version+flags
      ints.foreach(bb.putInt)
      box(typ, bb.array())
    }
    val samples = Seq(
      Array.fill(5)('A'.toByte), Array.fill(7)('B'.toByte),
      Array.fill(6)('C'.toByte), Array.fill(4)('D'.toByte))
    val ftyp = box("ftyp", "isom0000isom".getBytes("ISO-8859-1"))
    val mdhd = full("mdhd", Seq(0, 0, 1000, 2000)) // v0: times, timescale, dur
    val hdlr = box("hdlr", java.nio.ByteBuffer.allocate(12).putInt(0).putInt(0)
      .put("vide".getBytes("ISO-8859-1")).array())
    val stts = full("stts", Seq(1, 4, 500))        // one run: 4 samples x 500
    val stss = full("stss", Seq(2, 1, 3))          // sync samples 1 and 3
    val stsz = full("stsz", Seq(0, 4, 5, 7, 6, 4)) // per-sample sizes
    val stsc = full("stsc", Seq(1, 1, 2, 1))       // from chunk 1: 2 per chunk
    def assemble(off1: Int, off2: Int): Array[Byte] = {
      val stco = full("stco", Seq(2, off1, off2))
      val stbl = box("stbl", stts ++ stss ++ stsz ++ stsc ++ stco)
      val moov = box("moov",
        box("trak", box("mdia", mdhd ++ hdlr ++ box("minf", stbl))))
      val mdat = box("mdat", samples.flatten.toArray)
      ftyp ++ moov ++ mdat
    }
    // chunk offsets depend on moov size: assemble once to measure, again for real
    val probeLen = assemble(0, 0).length
    val mdatPayloadAt = probeLen - samples.map(_.length).sum
    (assemble(mdatPayloadAt, mdatPayloadAt + 5 + 7), samples)
  }

  test("MP4 keyframe demux: exact sync-sample bytes at true timestamps") {
    val (mp4, samples) = syntheticMp4WithSamples()
    val got = Multimodal.extractMp4SyncSamples(mp4)
    assert(got.isDefined)
    val frames = got.get.frames
    assert(got.get.codec == "") // builder writes no stsd box
    assert(frames.map(f => (f._1, f._2)) == Vector((0, 0L), (1, 1000L)))
    assert(frames(0)._3.toSeq == samples(0).toSeq) // sample 1 = the A bytes
    assert(frames(1)._3.toSeq == samples(2).toSeq) // sample 3 = the C bytes
    // corrupt payloads: None, never throw
    assert(Multimodal.extractMp4SyncSamples(mp4.take(40)).isEmpty)
    assert(Multimodal.extractMp4SyncSamples(Array[Byte](9, 9)).isEmpty)
  }

  /** MJPEG-in-MP4: `jpegs.length` samples in one chunk, timescale
    * 1000, 500-tick deltas, no stss (every sample sync), stsd sample
    * entry "jpeg" — each sample a REAL JPEG codestream.
    */
  private def syntheticMjpegMp4(jpegs: Seq[Array[Byte]]): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    def full(typ: String, ints: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * (ints.length + 1))
      bb.putInt(0)
      ints.foreach(bb.putInt)
      box(typ, bb.array())
    }
    val ftyp = box("ftyp", "isom0000isom".getBytes("ISO-8859-1"))
    val mdhd = full("mdhd", Seq(0, 0, 1000, 500 * jpegs.length))
    val hdlr = box("hdlr", java.nio.ByteBuffer.allocate(12).putInt(0).putInt(0)
      .put("vide".getBytes("ISO-8859-1")).array())
    val stsd = box("stsd", java.nio.ByteBuffer.allocate(24).putInt(0).putInt(1)
      .putInt(16).put("jpeg".getBytes("ISO-8859-1")).array())
    val stts = full("stts", Seq(1, jpegs.length, 500))
    val stsz = full("stsz", Seq(0, jpegs.length) ++ jpegs.map(_.length))
    val stsc = full("stsc", Seq(1, 1, jpegs.length, 1))
    def assemble(off: Int): Array[Byte] = {
      val stco = full("stco", Seq(1, off))
      val stbl = box("stbl", stsd ++ stts ++ stsz ++ stsc ++ stco)
      val moov = box("moov",
        box("trak", box("mdia", mdhd ++ hdlr ++ box("minf", stbl))))
      ftyp ++ moov ++ box("mdat", jpegs.flatten.toArray)
    }
    val probeLen = assemble(0).length
    assemble(probeLen - jpegs.map(_.length).sum)
  }

  /** Color on one half, near-black on the other (solid frames would
    * dHash to 0 — no luminance gradient).
    */
  private def jpegBytes(color: Int, leftHalf: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if ((x < 4) == leftHalf) color else 0x101010)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG-in-MP4 keyframes decode to REAL pixels and feed the dHash chain") {
    val mp4 = syntheticMjpegMp4(Seq(
      jpegBytes(0xff0000, leftHalf = true), jpegBytes(0x0000ff, leftHalf = false)))
    val demux = Multimodal.extractMp4SyncSamples(mp4).get
    assert(demux.codec == "jpeg")
    assert(demux.frames.length == 2)
    val ds = spark.createDataset(Seq(MediaRow(50L, "video", mp4, "video/mp4",
      None, None, None, None)))(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val frames = Multimodal.sampleFrames(ds, everyMs = 1L)
      .collect().sortBy(_.ts_ms)
    assert(frames.length == 2)
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 500L))
    // emitted payloads are PNG re-encodes of decoded pixels, not the
    // raw JPEG codestream (the GIF-path contract)
    frames.foreach { f =>
      assert((f.frame_payload(0) & 0xff) == 0x89 &&
        f.frame_payload(1) == 'P'.toByte, "expected PNG payload")
    }
    def dominant(rgb: Int): Int =
      Seq(rgb >> 16 & 0xff, rgb >> 8 & 0xff, rgb & 0xff).zipWithIndex.maxBy(_._1)._2
    val imgs = frames.map(f => javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(f.frame_payload)))
    assert(dominant(imgs(0).getRGB(1, 4) & 0xffffff) == 0, "frame 0 left red")
    assert(dominant(imgs(1).getRGB(6, 4) & 0xffffff) == 2, "frame 1 right blue")
    // and the decoded frames hash in the existing perceptual chain
    val fps = imgs.map(Multimodal.imageDHash)
    assert(fps(0) != fps(1), "distinct frames must fingerprint apart")
    // a frame from an H.26x-style entry (non-JPEG bytes) stays raw
    val (plain, samples) = syntheticMp4WithSamples()
    val rawOut = Multimodal.sampleFrames(
      spark.createDataset(Seq(MediaRow(51L, "video", plain, "video/mp4",
        None, None, None, None)))(
        org.apache.spark.sql.Encoders.product[MediaRow]), everyMs = 1L)
      .collect().sortBy(_.ts_ms)
    assert(rawOut(0).frame_payload.toSeq == samples(0).toSeq,
      "non-decodable codec must emit exact demuxed bytes")
  }

  test("sampleFrames demuxes MP4 keyframes and thins by everyMs") {
    val (mp4, samples) = syntheticMp4WithSamples()
    val rows = Seq(MediaRow(9L, "video", mp4, "video/mp4",
      None, None, None, Some(2000L)))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val all = Multimodal.sampleFrames(ds, everyMs = 1L)
      .collect().sortBy(_.frame_idx)
    assert(all.length == 2)
    assert(all(0).ts_ms == 0L && all(0).frame_payload.toSeq == samples(0).toSeq)
    assert(all(1).ts_ms == 1000L && all(1).frame_payload.toSeq == samples(2).toSeq)
    // a wide everyMs keeps only the first keyframe
    val thinned = Multimodal.sampleFrames(ds, everyMs = 10000L).collect()
    assert(thinned.length == 1 && thinned(0).ts_ms == 0L)
  }

  test("synthesizeMedia: every decodable payload dHashes to its " +
      "closed-form target fingerprint (the decode-path gate); corrupt " +
      "and non-image rows fingerprint to None; generation is " +
      "byte-deterministic") {
    val ids = (0L until 120L).toDF("doc_id")
    val corpus = synthesizeMedia(ids, col("doc_id")).collect()
    assert(corpus.length == 120)
    val fps = perceptualFingerprints(synthesizeMedia(ids, col("doc_id")))
      .collect().map(r => r.media_id -> r.fp).toMap
    corpus.foreach { m =>
      if (m.media_id % 29 == 17) {
        assert(m.kind == "image" && m.payload.length == 24)
        assert(fps(m.media_id).isEmpty,
          s"corrupt payload ${m.media_id} must fingerprint to None")
      } else if (m.media_id % 31 == 5) {
        assert(m.kind == "audio")
        assert(fps(m.media_id).isEmpty,
          s"non-image ${m.media_id} must not ride the image path")
      } else {
        // the REAL decode → downscale → dHash pipeline must land on the
        // fingerprint the pixels were constructed for
        assert(fps(m.media_id).contains(Multimodal.targetFp(m.media_id)),
          s"media ${m.media_id}: dHash != closed-form target")
      }
    }
    // same-group survivors sit within hamming 3; cross-group ids do not
    def ham(a: Long, b: Long) =
      java.lang.Long.bitCount(Multimodal.targetFp(a) ^ Multimodal.targetFp(b))
    assert(ham(0L, 1L) <= 3 && ham(3L, 4L) <= 3)
    assert(ham(0L, 3L) > 3 && ham(1L, 4L) > 3)
    // byte determinism: a second synthesis is identical payload bytes
    val again = synthesizeMedia(ids, col("doc_id")).collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(corpus.map(m => m.media_id -> m.payload.toSeq).toMap == again)
  }

  test("synthesized banded hamming dedup == brute-force pair truth") {
    val ids = (0L until 200L).toDF("doc_id")
    val fps = perceptualFingerprints(synthesizeMedia(ids, col("doc_id")))
      .filter(_.fp.isDefined)
      .map(r => (r.media_id, r.fp.get)).toDF("doc_id", "fp")
      .localCheckpoint()
    val banded = Dedup.simhashHammingPairs(fps, maxDist = 3,
        bands = 4, bits = 64)
      .as[(Long, Long, Long)].collect().toSet
    val rows = fps.as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- rows; (b, fb) <- rows if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute && banded.nonEmpty)
  }

  test("synthesizeVideo: every parseable MP4's first MJPEG keyframe " +
      "decodes and dHashes to its closed-form target THROUGH the lossy " +
      "JPEG roundtrip; corrupt and non-video rows fingerprint to None; " +
      "generation is byte-deterministic") {
    val ids = (0L until 120L).toDF("doc_id")
    val corpus = Multimodal.synthesizeVideo(ids, col("doc_id")).collect()
    assert(corpus.length == 120)
    val fps = Multimodal.videoFingerprints(
        Multimodal.synthesizeVideo(ids, col("doc_id")))
      .collect().map(r => r.media_id -> r.fp).toMap
    corpus.foreach { m =>
      if (m.media_id % 19 == 11) {
        assert(m.kind == "video" && m.payload.length == 40)
        assert(fps(m.media_id).isEmpty,
          s"corrupt container ${m.media_id} must fingerprint to None")
      } else if (m.media_id % 31 == 5) {
        assert(m.kind == "image")
        assert(fps(m.media_id).isEmpty,
          s"non-video ${m.media_id} must not ride the video path")
      } else if (m.media_id % 37 == 13) {
        // the trimmed/re-encoded class: keyframe-0 is the per-id
        // filler — keyframe-0 hashing must see the FILLER, not the
        // group target (that is what makes the class invisible to the
        // cheap pass and the multi-keyframe pass necessary)
        assert(fps(m.media_id).contains(Multimodal.fillerFp(m.media_id)),
          s"trim-class video ${m.media_id}: keyframe-0 != filler")
      } else {
        // container demux → first keyframe → REAL JPEG pixel decode →
        // dHash must land on the target despite DCT loss (the ±14
        // walk's margin) — this is the whole video chain end-to-end
        assert(fps(m.media_id).contains(Multimodal.targetFp(m.media_id)),
          s"video ${m.media_id}: keyframe dHash != closed-form target")
        // and the container is a real multi-sample MP4, not a bare JPEG
        val demux = Multimodal.extractMp4SyncSamples(m.payload).get
        assert(demux.codec == "jpeg" && demux.frames.length == 2)
        assert(demux.frames.map(_._2) == Vector(0L, 500L))
      }
    }
    val again = Multimodal.synthesizeVideo(ids, col("doc_id")).collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(corpus.map(m => m.media_id -> m.payload.toSeq).toMap == again)
  }

  test("video banded hamming dedup == brute-force pair truth (the " +
      "keyframe fingerprints ride the shared pair search)") {
    val ids = (0L until 200L).toDF("doc_id")
    val fps = Multimodal.videoFingerprints(
        Multimodal.synthesizeVideo(ids, col("doc_id")))
      .filter(_.fp.isDefined)
      .map(r => (r.media_id, r.fp.get)).toDF("doc_id", "fp")
      .localCheckpoint()
    val banded = Dedup.simhashHammingPairs(fps, maxDist = 3,
        bands = 4, bits = 64)
      .as[(Long, Long, Long)].collect().toSet
    val rows = fps.as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- rows; (b, fb) <- rows if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute && banded.nonEmpty)
  }

  test("videoFrameFingerprints: one row per keyframe (both hash to " +
      "their closed-form fps), undecodable containers keep one None " +
      "row; the any-match pass recovers the trim-class pairs " +
      "keyframe-0 hashing is blind to") {
    val ids = (0L until 240L).toDF("doc_id")
    val frames = Multimodal.videoFrameFingerprints(
      Multimodal.synthesizeVideo(ids, col("doc_id"))).collect()
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (mid, rows) =>
      if (mid % 19 == 11 || mid % 31 == 5) {
        assert(rows.length == 1 && rows.head.frame_idx.isEmpty &&
          rows.head.fp.isEmpty, s"$mid: undecodable/non-video row shape")
      } else {
        assert(rows.length == 2, s"$mid: expected 2 keyframe rows")
        val m = rows.map(r => r.frame_idx.get -> r.fp.get).toMap
        val (kf0, kf1) =
          if (mid % 37 == 13)
            (Multimodal.fillerFp(mid), Multimodal.targetFp(mid))
          else (Multimodal.targetFp(mid), Multimodal.fillerFp(mid))
        assert(m(0) == kf0 && m(1) == kf1, s"$mid: keyframe fps")
      }
    }
    // at least one trim-class id with a group sibling in range
    val trim = (0L until 240L).find(i => i % 37 == 13 && i % 19 != 11 &&
      i % 31 != 5 && {
        val g = i / Multimodal.NearDupGroup
        (0L until 240L).exists(j => j != i && j / Multimodal.NearDupGroup == g
          && j % 19 != 11 && j % 31 != 5 && j % 37 != 13)
      }).get
    // keyframe-0 pass: trim id absent from every pair
    val kf0 = Multimodal.videoFingerprints(
        Multimodal.synthesizeVideo(ids, col("doc_id")))
      .filter(_.fp.isDefined)
      .map(r => (r.media_id, r.fp.get)).toDF("doc_id", "fp")
    val kf0Pairs = Dedup.simhashHammingPairs(kf0, 3, 4, 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(!kf0Pairs.exists(p => p._1 == trim || p._2 == trim),
      s"trim-class $trim must be invisible to keyframe-0 hashing")
    // any-match multi-keyframe pass: composite (media, frame) ids
    // through the shared pair search, collapsed to min-hamming per
    // video pair — the trim id links to its group sibling
    val comp = frames.filter(_.fp.isDefined)
      .map(r => (r.media_id * 4 + r.frame_idx.get, r.fp.get))
      .toSeq.toDF("doc_id", "fp")
    val multi = Dedup.simhashHammingPairs(comp, 3, 4, 64)
      .select((col("da") / 4).cast("long").as("da"),
        (col("db") / 4).cast("long").as("db"), col("hamming"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(min("hamming").as("hamming"))
      .as[(Long, Long, Long)].collect().toSet
    assert(multi.exists(p => p._1 == trim || p._2 == trim),
      s"any-match pass must recover trim-class $trim")
    assert(kf0Pairs.map(p => (p._1, p._2))
      .subsetOf(multi.map(p => (p._1, p._2))),
      "multi-keyframe pairs must contain every keyframe-0 pair")
  }

  test("synthesizeGif: every decodable animated GIF's first composited " +
      "frame dHashes to its closed-form target EXACTLY (indexed palette " +
      "⇒ lossless roundtrip through the real JDK GIF codec); corrupt " +
      "and non-gif rows fingerprint to None; generation is " +
      "byte-deterministic; frames carry real timing") {
    val ids = (0L until 130L).toDF("doc_id")
    val corpus = Multimodal.synthesizeGif(ids, col("doc_id")).collect()
    assert(corpus.length == 130)
    val fps = Multimodal.gifFingerprints(
        Multimodal.synthesizeGif(ids, col("doc_id")))
      .collect().map(r => r.media_id -> r.fp).toMap
    corpus.foreach { m =>
      if (m.media_id % 41 == 3) {
        assert(m.kind == "gif" && m.payload.length == 24)
        assert(fps(m.media_id).isEmpty,
          s"corrupt GIF ${m.media_id} must fingerprint to None")
      } else if (m.media_id % 31 == 5) {
        assert(m.kind == "image")
        assert(fps(m.media_id).isEmpty,
          s"non-gif ${m.media_id} must not ride the gif path")
      } else {
        assert(fps(m.media_id).contains(Multimodal.targetFp(m.media_id)),
          s"gif ${m.media_id}: frame-0 dHash != closed-form target")
        // and it is a real 2-frame animation with 100 ms delays
        val frames = Multimodal.decodeGifFrames(m.payload).get
        assert(frames.length == 2 &&
          frames.map(f => (f.startMs, f.delayMs)) ==
            Vector((0L, 100L), (100L, 100L)))
        // frame 1 composites to the per-id filler (full-frame overlay)
        assert(Multimodal.imageDHash(frames(1).image) ==
          Multimodal.fillerFp(m.media_id))
      }
    }
    val again = Multimodal.synthesizeGif(ids, col("doc_id")).collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(corpus.map(m => m.media_id -> m.payload.toSeq).toMap == again)
  }

  test("synthesizeAudio: every decodable WAV's spectro-temporal hash " +
      "equals its closed-form target (the PCM decode → FFT → band-" +
      "ordering gate); corrupt and non-audio rows fingerprint to None; " +
      "generation is byte-deterministic") {
    val ids = (0L until 120L).toDF("doc_id")
    val corpus = Multimodal.synthesizeAudio(ids, col("doc_id")).collect()
    assert(corpus.length == 120)
    val fps = Multimodal.audioFingerprints(
        Multimodal.synthesizeAudio(ids, col("doc_id")))
      .collect().map(r => r.media_id -> r.fp).toMap
    corpus.foreach { m =>
      if (m.media_id % 23 == 7) {
        assert(m.kind == "audio" && m.payload.length == 16)
        assert(fps(m.media_id).isEmpty,
          s"corrupt payload ${m.media_id} must fingerprint to None")
      } else if (m.media_id % 31 == 5) {
        assert(m.kind == "image")
        assert(fps(m.media_id).isEmpty,
          s"non-audio ${m.media_id} must not ride the audio path")
      } else {
        // the REAL WAV decode → framed FFT → band-power-ordering
        // pipeline must land on the fingerprint the tones were
        // constructed for — every amplitude comparison survives the
        // 16-bit quantize + Hann leakage with margin
        assert(fps(m.media_id).contains(Multimodal.targetFp(m.media_id)),
          s"audio ${m.media_id}: fingerprint != closed-form target")
        assert(m.payload.length > 8000, "must be a real, whole WAV")
      }
    }
    // byte determinism: a second synthesis is identical payload bytes
    val again = Multimodal.synthesizeAudio(ids, col("doc_id")).collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(corpus.map(m => m.media_id -> m.payload.toSeq).toMap == again)
  }

  test("audio banded hamming dedup == brute-force pair truth, and the " +
      "pair table differs from the image fixture's (distinct corrupt " +
      "classes)") {
    val ids = (0L until 200L).toDF("doc_id")
    val fps = Multimodal.audioFingerprints(
        Multimodal.synthesizeAudio(ids, col("doc_id")))
      .filter(_.fp.isDefined)
      .map(r => (r.media_id, r.fp.get)).toDF("doc_id", "fp")
      .localCheckpoint()
    val banded = Dedup.simhashHammingPairs(fps, maxDist = 3,
        bands = 4, bits = 64)
      .as[(Long, Long, Long)].collect().toSet
    val rows = fps.as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- rows; (b, fb) <- rows if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute && banded.nonEmpty)
    val imagePairs = Dedup.simhashHammingPairs(
        perceptualFingerprints(synthesizeMedia(ids, col("doc_id")))
          .filter(_.fp.isDefined)
          .map(r => (r.media_id, r.fp.get)).toDF("doc_id", "fp")
          .localCheckpoint(),
        maxDist = 3, bands = 4, bits = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded != imagePairs,
      "audio and image fixtures must gate different pair tables")
  }

  test("encodeWav: byte-identical to the AudioSystem WAVE writer") {
    val samples = Array.tabulate(1234)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * 0.6).toFloat)
    val ours = Multimodal.encodeWav(samples, rate = 8000)
    // reference: the JDK writer on the same quantized PCM
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      val v = math.max(-32768,
        math.min(32767, math.round(samples(i) * 32767f))).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(java.util.Arrays.equals(ours, bos.toByteArray))
  }

  test("decodeAudio: canonical-WAV fast path equals the AudioSystem " +
      "route (mono, stereo, fallback containers)") {
    // mono canonical WAV (fast path) vs the same bytes through the SPI
    // reader: identical samples/params. The SPI reference is obtained
    // by prepending a junk chunk (breaks the canonical parse, not the
    // reader) — no switch exists, so divergence is caught by shape.
    val mono = wavBytes(seconds = 0.25)
    val d = Multimodal.decodeAudio(mono).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.samples.length == 2000)
    // stereo WAV via the JDK writer: fast path must mix down exactly
    // like the old inline loop (mean over channels)
    val n = 500
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val l = (math.sin(2 * math.Pi * 300 * i / 8000.0) * 0.5 * 32767).toInt
      val r = (math.sin(2 * math.Pi * 600 * i / 8000.0) * 0.3 * 32767).toInt
      pcm(4 * i) = (l & 0xff).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (r & 0xff).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
    }
    val sfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val sbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), sfmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sbos)
    val ds = Multimodal.decodeAudio(sbos.toByteArray).get
    assert(ds.channels == 2 && ds.samples.length == n)
    for (i <- 0 until n) {
      val l = ((pcm(4 * i) & 0xff) | (pcm(4 * i + 1) << 8)).toShort / 32768f
      val r = ((pcm(4 * i + 2) & 0xff) | (pcm(4 * i + 3) << 8)).toShort / 32768f
      assert(ds.samples(i) == (l + r) / 2f, s"frame $i")
    }
    // non-canonical container (AU) still decodes via the fallback
    val afmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val abos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](200)), afmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.AU, abos)
    assert(Multimodal.decodeAudio(abos.toByteArray).exists(_.samples.length == 100))
    // corrupt RIFF stub: still None
    assert(Multimodal.decodeAudio(Array[Byte](0x52, 0x49, 0x46, 0x46)).isEmpty)
  }
}
