package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
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
  * The IMAGE codec is real (JDK-only `javax.imageio`: decode -> scale ->
  * re-encode, plus a pixel-histogram embed). The AUDIO codec is real
  * (JDK-only `javax.sound.sampled`: WAV/AIFF/AU PCM decode -> mono
  * samples, RMS-energy embed, metadata probe). VIDEO container metadata
  * is real (pure-byte ISO BMFF box-tree parse: mvhd duration, tkhd
  * dimensions — [[probeMp4]]), VIDEO FRAME DECODE is real for
  * animated GIF (javax.imageio multi-frame read + timed compositing —
  * [[decodeGifFrames]]) and for MJPEG-in-MP4 (keyframe demux →
  * per-sample JPEG codestream → javax.imageio — [[decodeVideoFrame]]),
  * and MP4 keyframe DEMUX is real for every codec
  * ([[extractMp4SyncSamples]]: sample-table walk → exact keyframe byte
  * ranges at true timestamps); only pixel DECODE of H.26x codestream
  * bytes remains a clearly-marked deterministic STUB, since no such
  * codec library exists in this environment. Everything
  * around the codecs is real
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

  // ImageIO's stream factories default to useCache=true, which spools
  // EVERY decode/encode through a fresh temp FILE on disk
  // (FileCacheImageInput/OutputStream) — per-item file create/write/
  // delete syscalls that serialize 32 concurrent decode tasks on the
  // filesystem and cost ~10-25x the actual codec work for these small
  // payloads (measured: the fixture synth+fingerprint pass dropped
  // 2.2-8.6 s → 0.33 s at sf0.1 with the cache off). Memory-backed
  // streams produce byte-identical results; payloads here are KB-scale
  // so the memory cost is nil. Object-init runs once per JVM, driver
  // and executors alike (every codec call site lives in this object).
  javax.imageio.ImageIO.setUseCache(false)

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

  // --------------------------------------------------------- image codec
  // Real JDK image codec (javax.imageio — zero new dependencies,
  // headless-safe). Corrupt/undecodable payloads decode to None and the
  // transforms pass them through untouched: at 100 TB a corpus always
  // contains broken blobs, and one of them must not kill a
  // 1000-executor job — route survivors through a quality gate instead.

  private[ext] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // NonFatal, not just IOException: imageio plugin readers throw
    // unchecked exceptions (AIOOBE, NegativeArraySize, IAE) on payloads
    // whose magic bytes parse but whose headers are malformed — exactly
    // the corrupt blobs this Option exists to absorb
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  private[ext] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[ext] def scaleImage(img: java.awt.image.BufferedImage,
      w: Int, h: Int): java.awt.image.BufferedImage = {
    import java.awt.RenderingHints
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      // deterministic background for alpha sources: transparent pixels
      // composite over white, not the buffer's uninitialized black
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, w, h)
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Real image embed: unit-norm luminance histogram over `dim` bins
    * (Rec.601 luma weights). Deterministic in the decoded pixels.
    */
  private[ext] def imageEmbed(img: java.awt.image.BufferedImage,
      dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        out((lum * dim) / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.sqrt(out.map(v => v.toDouble * v).sum).toFloat
    if (n > 0) { var k = 0; while (k < dim) { out(k) /= n; k += 1 } }
    out
  }
  // --------------------------------------------------------- audio codec
  // Real JDK audio codec (javax.sound.sampled — zero new dependencies,
  // same move as the imageio image codec). Handles WAV/AIFF/AU PCM;
  // compressed formats the JDK can't open decode to None and pass
  // through, exactly like corrupt image blobs.

  /** Decoded audio: normalized mono samples in [-1, 1] + stream params. */
  private[graft] final case class DecodedAudio(
      sampleRate: Int, channels: Int, durationMs: Long, samples: Array[Float])

  /** Direct parse of a canonical PCM 16-bit little-endian WAV: RIFF →
    * chunk walk → (fmt, data). Returns the (channels, sampleRate,
    * dataOff, dataLen) the [[decodeAudio]] fast path needs, or None
    * when the payload is not that exact shape (compressed, 8/24-bit,
    * extensible-tagged, truncated, or a different container) — those
    * take the full AudioSystem route unchanged. Why this exists:
    * `AudioSystem.getAudioInputStream` runs a synchronized SPI-registry
    * scan per call, which SERIALIZES concurrent decode tasks — 32
    * threads measured slower in aggregate than one (CodecContention);
    * the canonical-WAV case (every fixture clip, and the dominant
    * real-lake shape) is a 40-line header parse with no shared state.
    */
  private def parsePcm16Wav(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int) = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
      p(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int)] = None // (channels, rate), tag 1 + 16-bit only
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, "ISO-8859-1")
      val len = u32(off + 4)
      if (len < 0 || off + 8 + len > p.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val tag = u16(off + 8)
        val bits = u16(off + 22)
        if (tag != 1 || bits != 16) return None
        fmt = Some((u16(off + 10), u32(off + 12).toInt))
      } else if (id == "data") {
        return fmt.collect { case (ch, rate) if ch >= 1 && rate > 0 =>
          (ch, rate, off + 8, len.toInt - (len.toInt % (2 * ch)))
        }
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    None
  }

  private[graft] def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    parsePcm16Wav(payload) match {
      case Some((channels, rate, dataOff, dataLen)) =>
        // canonical PCM16LE WAV: extract in place — same bytes, same
        // mixdown arithmetic as the AudioSystem path below
        val nFrames = dataLen / (2 * channels)
        val samples = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0f
          var c = 0
          while (c < channels) {
            val i = dataOff + (f * channels + c) * 2
            val s = ((payload(i) & 0xff) | (payload(i + 1) << 8)).toShort
            acc += s / 32768f
            c += 1
          }
          samples(f) = acc / channels
          f += 1
        }
        return Some(DecodedAudio(rate, channels,
          if (rate > 0) nFrames * 1000L / rate else 0L, samples))
      case None => ()
    }
    // NonFatal for the same reason as decodeImage: header-fuzzed blobs
    // throw unchecked exceptions out of the SPI readers
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        // normalize to 16-bit signed PCM so sample extraction is uniform
        // — but SKIP the AudioSystem conversion chain when the stream
        // already IS little-endian signed 16-bit PCM (every WAV): the
        // codec chain costs ~10x the raw read even for an identity
        // conversion (measured via MediaProbe: the conversion stream
        // dominated the whole decode+FFT fingerprint path)
        val already = src.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          src.getSampleSizeInBits == 16 && !src.isBigEndian
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm =
          if (already) in
          else javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
        val bytes = pcm.readAllBytes()
        val channels = fmt.getChannels
        val nFrames = bytes.length / (2 * channels)
        // mix down to mono: mean over channels per frame
        val samples = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0f
          var c = 0
          while (c < channels) {
            val i = (f * channels + c) * 2
            val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
            acc += s / 32768f
            c += 1
          }
          samples(f) = acc / channels
          f += 1
        }
        val rate = math.round(fmt.getSampleRate)
        Some(DecodedAudio(rate, channels,
          if (rate > 0) nFrames * 1000L / rate else 0L, samples))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real audio embed: unit-norm RMS-energy profile over `dim` equal
    * time windows — deterministic in the decoded samples, the audio
    * analog of the image luminance histogram.
    */
  private[ext] def audioEmbed(audio: DecodedAudio, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = audio.samples.length
    if (n > 0) {
      var w = 0
      while (w < dim) {
        val start = (n.toLong * w / dim).toInt
        val end = math.max(start + 1, (n.toLong * (w + 1) / dim).toInt)
        var acc = 0.0
        var i = start
        while (i < math.min(end, n)) { acc += audio.samples(i) * audio.samples(i); i += 1 }
        out(w) = math.sqrt(acc / math.max(1, math.min(end, n) - start)).toFloat
        w += 1
      }
      val norm = math.sqrt(out.map(v => v.toDouble * v).sum).toFloat
      if (norm > 0) { var k = 0; while (k < dim) { out(k) /= norm; k += 1 } }
    }
    out
  }

  // ----------------------------------------------------- GIF frame codec
  // REAL video-frame decode for the one container the JDK can open:
  // animated GIF (javax.imageio's GIF reader iterates sub-images
  // natively). Frames carry real presentation timestamps from each
  // frame's GraphicControlExtension delay, and inter-frame patches are
  // composited at their ImageDescriptor offsets onto the logical
  // screen, so every emitted frame is a full canvas. All four GIF
  // disposal methods are honored: none/doNotDispose draw over,
  // restoreToBackgroundColor clears the frame's own rect before the
  // next composite (to the white canvas base — an RGB canvas has no
  // alpha, matching players that flatten transparency), and
  // restoreToPrevious rewinds the canvas to its pre-frame state. A 0
  // delay takes the 100 ms convention players use. For MP4/MOV
  // the keyframe DEMUX is real ([[extractMp4SyncSamples]]) but pixel
  // decode of the extracted codestream bytes stays honestly stubbed:
  // no H.26x codec exists in this environment.

  private[ext] def isGif(payload: Array[Byte]): Boolean =
    payload.length >= 6 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8'

  private[ext] final case class GifFrame(startMs: Long, delayMs: Long,
      image: java.awt.image.BufferedImage)

  private[ext] def decodeGifFrames(payload: Array[Byte]): Option[Vector[GifFrame]] =
    try {
      import javax.imageio.ImageIO
      import javax.imageio.metadata.IIOMetadataNode
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false) // sequential=no: keep metadata
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else {
            // logical screen from stream metadata; frame-0 size fallback
            var screenW = 0
            var screenH = 0
            val smd = reader.getStreamMetadata
            if (smd != null) {
              val root = smd.getAsTree("javax_imageio_gif_stream_1.0")
                .asInstanceOf[IIOMetadataNode]
              val kids = root.getChildNodes
              var i = 0
              while (i < kids.getLength) {
                val k = kids.item(i).asInstanceOf[IIOMetadataNode]
                if (k.getNodeName == "LogicalScreenDescriptor") {
                  screenW = k.getAttribute("logicalScreenWidth").toInt
                  screenH = k.getAttribute("logicalScreenHeight").toInt
                }
                i += 1
              }
            }
            var canvas: java.awt.image.BufferedImage = null
            var ts = 0L
            val out = Vector.newBuilder[GifFrame]
            var f = 0
            while (f < n) {
              val patch = reader.read(f)
              var delayMs = 100L
              var x = 0
              var y = 0
              var disposal = "none"
              val root = reader.getImageMetadata(f)
                .getAsTree("javax_imageio_gif_image_1.0")
                .asInstanceOf[IIOMetadataNode]
              val kids = root.getChildNodes
              var i = 0
              while (i < kids.getLength) {
                val k = kids.item(i).asInstanceOf[IIOMetadataNode]
                k.getNodeName match {
                  case "GraphicControlExtension" =>
                    val d = k.getAttribute("delayTime").toLong * 10L
                    if (d > 0) delayMs = d
                    val dm = k.getAttribute("disposalMethod")
                    if (dm != null && dm.nonEmpty) disposal = dm
                  case "ImageDescriptor" =>
                    x = k.getAttribute("imageLeftPosition").toInt
                    y = k.getAttribute("imageTopPosition").toInt
                  case _ => ()
                }
                i += 1
              }
              if (canvas == null) {
                val w = if (screenW > 0) screenW else patch.getWidth
                val h = if (screenH > 0) screenH else patch.getHeight
                canvas = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = canvas.createGraphics()
                try { g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, w, h) }
                finally g.dispose()
              }
              // pre-draw copy, taken only when this frame's disposal
              // will need to rewind to it
              val pre = if (disposal != "restoreToPrevious") null else {
                val p = new java.awt.image.BufferedImage(
                  canvas.getWidth, canvas.getHeight, canvas.getType)
                val pg = p.createGraphics()
                try pg.drawImage(canvas, 0, 0, null) finally pg.dispose()
                p
              }
              val g = canvas.createGraphics()
              try g.drawImage(patch, x, y, null) finally g.dispose()
              val snap = new java.awt.image.BufferedImage(
                canvas.getWidth, canvas.getHeight, canvas.getType)
              val sg = snap.createGraphics()
              try sg.drawImage(canvas, 0, 0, null) finally sg.dispose()
              out += GifFrame(ts, delayMs, snap)
              ts += delayMs
              // this frame's disposal prepares the canvas the NEXT
              // frame composites onto (the emitted snapshot above is
              // always the on-screen state at this frame's tick)
              disposal match {
                case "restoreToBackgroundColor" =>
                  val dg = canvas.createGraphics()
                  try {
                    dg.setColor(java.awt.Color.WHITE)
                    dg.fillRect(x, y, patch.getWidth, patch.getHeight)
                  } finally dg.dispose()
                case "restoreToPrevious" =>
                  val dg = canvas.createGraphics()
                  try dg.drawImage(pre, 0, 0, null) finally dg.dispose()
                case _ => ()
              }
              f += 1
            }
            Some(out.result())
          }
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ----------------------------------------------------------------- STUB
  // Deterministic fake codec for the media kind whose libraries are
  // NOT in this environment (MP4/MOV frame decode). A real deployment
  // swaps this for JNI/javacpp bindings (ffmpeg); its signature and the
  // surrounding dataflow do not change. GIF payloads never reach it —
  // they decode for real above.

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
    * Images embed from real decoded pixels (luminance histogram), audio
    * from real decoded PCM (RMS-energy profile); undecodable payloads
    * and video take the stub. Output feeds straight into Similarity.*
    * (ANN / near-dup search).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    media.mapPartitions { rows =>
      // per-task codec init goes here (once per partition, not per row)
      rows.map { m =>
        val feat = m.kind match {
          case "image" => decodeImage(m.payload).map(imageEmbed(_, dim))
            .getOrElse(stubEmbed(m.payload, dim))
          case "audio" => decodeAudio(m.payload).map(audioEmbed(_, dim))
            .getOrElse(stubEmbed(m.payload, dim))
          case _ => stubEmbed(m.payload, dim)
        }
        FeatureRow(m.media_id, m.kind, feat)
      }
    }
  }

  /** Iterative radix-2 Cooley-Tukey FFT, in place over (re, im).
    * Standard public-domain algorithm; length must be a power of two.
    * Deterministic: fixed evaluation order, no parallelism inside a
    * frame.
    */
  private[ext] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft size must be a power of two: $n")
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr0 = re(blk + k + len / 2); val vi0 = im(blk + k + len / 2)
          val vr = vr0 * cwr - vi0 * cwi
          val vi = vr0 * cwi + vi0 * cwr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Spectral profile of a decoded clip: Hann-windowed `fftSize`-point
    * FFT of the leading mono samples (zero-padded when shorter), folded
    * to `bands` log-energy bands over the positive spectrum plus the
    * dominant frequency in Hz (argmax magnitude bin, DC excluded) —
    * the classic cheap audio descriptor pair (language/music/noise
    * separation, constant-tone detection) one step up from
    * [[audioEmbed]]'s time-domain energy profile.
    */
  private[ext] def audioSpectral(audio: DecodedAudio, bands: Int,
      fftSize: Int = 4096): (Array[Float], Float) = {
    require(bands > 0 && bands <= fftSize / 2, s"bands out of range: $bands")
    val n = math.min(fftSize, audio.samples.length)
    val re = new Array[Double](fftSize)
    val im = new Array[Double](fftSize)
    var i = 0
    while (i < n) {
      // Hann window: kills the rectangular frame's spectral leakage
      val w = 0.5 * (1 - math.cos(2 * math.Pi * i / (fftSize - 1)))
      re(i) = audio.samples(i) * w
      i += 1
    }
    fft(re, im)
    val half = fftSize / 2
    val mag = new Array[Double](half)
    var k = 0
    while (k < half) { mag(k) = re(k) * re(k) + im(k) * im(k); k += 1 }
    val out = new Array[Float](bands)
    var b = 0
    while (b < bands) {
      val s = (1 + (half - 1).toLong * b / bands).toInt
      val e = math.max(s + 1, (1 + (half - 1).toLong * (b + 1) / bands).toInt)
      var acc = 0.0
      var q = s
      while (q < e) { acc += mag(q); q += 1 }
      out(b) = (10.0 * math.log10(acc / (e - s) + 1e-12)).toFloat
      b += 1
    }
    var best = 1
    var bv = -1.0
    k = 1
    while (k < half) { if (mag(k) > bv) { bv = mag(k); best = k }; k += 1 }
    (out, audio.sampleRate.toFloat * best / fftSize)
  }

  /** Log-mel filterbank energies over the magnitude spectrum — THE
    * standard neural-audio front end (what an audio-embedding or ASR
    * model actually consumes, where [[audioSpectral]]'s linear bands
    * are a monitoring descriptor). `nMels` triangular filters with
    * centers equally spaced on the mel scale (m = 2595·log10(1+f/700))
    * between 0 Hz and Nyquist, unit peak, applied to the Hann-windowed
    * power spectrum; output is 10·log10(energy). Deterministic pure
    * DSP — no RNG, no library.
    */
  private[ext] def audioMel(audio: DecodedAudio, nMels: Int,
      fftSize: Int = 4096): Array[Float] = {
    require(nMels > 0 && nMels <= fftSize / 2, s"nMels out of range: $nMels")
    val n = math.min(fftSize, audio.samples.length)
    val re = new Array[Double](fftSize)
    val im = new Array[Double](fftSize)
    var i = 0
    while (i < n) {
      val w = 0.5 * (1 - math.cos(2 * math.Pi * i / (fftSize - 1)))
      re(i) = audio.samples(i) * w
      i += 1
    }
    fft(re, im)
    val half = fftSize / 2
    val mag = new Array[Double](half)
    var k = 0
    while (k < half) { mag(k) = re(k) * re(k) + im(k) * im(k); k += 1 }
    def mel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
    def invMel(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val nyquist = audio.sampleRate / 2.0
    val melHi = mel(nyquist)
    // nMels filters need nMels + 2 edge points on the mel grid
    val edges = (0 to nMels + 1).map(j => invMel(melHi * j / (nMels + 1)))
    val binHz = audio.sampleRate.toDouble / fftSize
    val out = new Array[Float](nMels)
    var b = 0
    while (b < nMels) {
      val (lo, c, hi) = (edges(b), edges(b + 1), edges(b + 2))
      var acc = 0.0
      var q = 1
      while (q < half) {
        val f = q * binHz
        val w =
          if (f <= lo || f >= hi) 0.0
          else if (f <= c) (f - lo) / (c - lo)
          else (hi - f) / (hi - c)
        if (w > 0) acc += w * mag(q)
        q += 1
      }
      out(b) = (10.0 * math.log10(acc + 1e-12)).toFloat
      b += 1
    }
    out
  }

  case class MelRow(media_id: Long, kind: String, mel_db: Array[Float])

  /** Log-mel embedding extraction for the audio column: real PCM
    * decode → Hann FFT → triangular mel filterbank. Same broken-blob
    * pass-through policy as [[spectralFeatures]].
    */
  def melFeatures(media: Dataset[MediaRow], nMels: Int): Dataset[MelRow] = {
    implicit val enc = Encoders.product[MelRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val decoded =
          if (m.kind == "audio") decodeAudio(m.payload) else None
        decoded match {
          case Some(a) if a.samples.nonEmpty && a.sampleRate > 0 =>
            MelRow(m.media_id, m.kind, audioMel(a, nMels))
          case _ => MelRow(m.media_id, m.kind, Array.empty)
        }
      }
    }
  }

  case class SpectralRow(media_id: Long, kind: String,
      band_db: Array[Float], dominant_hz: Float)

  /** Spectral feature extraction for the audio column: real PCM decode
    * (any javax.sound container) → Hann-windowed radix-2 FFT →
    * per-band log energies + dominant frequency. Same broken-blob
    * policy as [[extractFeatures]]: non-audio or undecodable rows pass
    * through with empty bands rather than killing the job. Typed
    * mapPartitions is justified here for the same reason as the other
    * codec paths — per-row DSP over opaque binary, not relational work.
    */
  def spectralFeatures(media: Dataset[MediaRow], bands: Int): Dataset[SpectralRow] = {
    implicit val enc = Encoders.product[SpectralRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val decoded =
          if (m.kind == "audio") decodeAudio(m.payload) else None
        decoded match {
          case Some(a) if a.samples.nonEmpty && a.sampleRate > 0 =>
            val (bd, hz) = audioSpectral(a, bands)
            SpectralRow(m.media_id, m.kind, bd, hz)
          case _ => SpectralRow(m.media_id, m.kind, Array.empty, 0f)
        }
      }
    }
  }

  /** 64-bit perceptual difference hash (dHash) of a decoded image:
    * scale to 9x8 luma, emit one bit per horizontal neighbor pair
    * (left brighter = 1). Resize/re-encode/small edits preserve most
    * bits, so near-duplicate images sit at small hamming distance —
    * the output feeds graft.ext.Dedup.simhashHammingPairs unchanged
    * (banded bucket join, never all-pairs), linking the multimodal
    * column family to the dedup family at 100 TB scale.
    */
  private[ext] def imageDHash(img: java.awt.image.BufferedImage): Long = {
    val small = scaleImage(img, 9, 8)
    var fp = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def luma(px: Int): Int = {
          val rgb = small.getRGB(px, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        if (luma(x) > luma(x + 1)) fp |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    fp
  }

  case class FingerprintRow(media_id: Long, kind: String, fp: Option[Long])

  /** One row per (item, keyframe) — the multi-keyframe fingerprint
    * shape ([[videoFrameFingerprints]]). Undecodable items keep ONE
    * row with `frame_idx = None, fp = None` so the declared drop rule
    * (`fp IS NOT NULL`) governs them on both engines, exactly like
    * [[FingerprintRow]].
    */
  case class FrameFingerprintRow(media_id: Long, kind: String,
                                 frame_idx: Option[Int], fp: Option[Long])

  /** Perceptual fingerprints for a media set: images hash from real
    * decoded pixels (dHash); undecodable payloads and other kinds get
    * None (a caller deciding to fall back to byte-exact md5 dedup does
    * so explicitly — silently hashing bytes here would make corrupt
    * blobs look perceptually similar to each other).
    */
  def perceptualFingerprints(media: Dataset[MediaRow]): Dataset[FingerprintRow] = {
    implicit val enc = Encoders.product[FingerprintRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val fp =
          if (m.kind == "image") decodeImage(m.payload).map(imageDHash)
          else None
        FingerprintRow(m.media_id, m.kind, fp)
      }
    }
  }

  /** 64-bit spectro-temporal difference hash of a decoded clip — the
    * audio analog of [[imageDHash]]: split the samples into 8 equal
    * time frames, compute 9 log-spaced-free linear band mean powers
    * per frame (Hann-windowed `fftSize`-point FFT of each frame's
    * leading samples, the [[audioSpectral]] binning over the positive
    * spectrum), and emit one bit per adjacent band pair — bit
    * `y*8 + x` set ⇔ frame y's band x is louder than its band x+1.
    * Re-encode/resample/level shifts preserve most band ORDERINGS even
    * when they move absolute energies, so near-duplicate clips sit at
    * small hamming distance; the output feeds
    * [[Dedup.simhashHammingPairs]] unchanged, same as the image path.
    * Caller guarantees >= 8 samples and a positive rate
    * ([[audioFingerprints]] maps everything else to None).
    */
  private[graft] def audioFingerprint(audio: DecodedAudio,
                                    fftSize: Int = 512): Long = {
    val frameLen = audio.samples.length / 8
    var fp = 0L
    var y = 0
    while (y < 8) {
      val e = frameBandPowers(audio.samples, y * frameLen,
        math.min(frameLen, fftSize), fftSize)
      var x = 0
      while (x < 8) {
        if (e(x) > e(x + 1)) fp |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** Mean power of 9 linear bands over one Hann-windowed frame (the
    * [[audioSpectral]] band edges; positive spectrum, DC excluded).
    */
  private def frameBandPowers(samples: Array[Float], off: Int, len: Int,
                              fftSize: Int): Array[Double] = {
    val re = new Array[Double](fftSize)
    val im = new Array[Double](fftSize)
    var i = 0
    while (i < len) {
      val w = 0.5 * (1 - math.cos(2 * math.Pi * i / (fftSize - 1)))
      re(i) = samples(off + i) * w
      i += 1
    }
    fft(re, im)
    val half = fftSize / 2
    val out = new Array[Double](9)
    var b = 0
    while (b < 9) {
      val s = (1 + (half - 1).toLong * b / 9).toInt
      val e = math.max(s + 1, (1 + (half - 1).toLong * (b + 1) / 9).toInt)
      var acc = 0.0
      var q = s
      while (q < e) { acc += re(q) * re(q) + im(q) * im(q); q += 1 }
      out(b) = acc / (e - s)
      b += 1
    }
    out
  }

  /** Perceptual fingerprints for the AUDIO column: real PCM decode →
    * per-frame spectral band orderings → 64-bit hash
    * ([[audioFingerprint]]). Same None policy as
    * [[perceptualFingerprints]]: non-audio kinds, undecodable payloads,
    * and clips too short to frame (< 8 samples) get None — a dedup
    * that wants byte-exact fallback for those opts in explicitly.
    */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[FingerprintRow] = {
    implicit val enc = Encoders.product[FingerprintRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val fp =
          if (m.kind == "audio")
            decodeAudio(m.payload)
              .filter(a => a.samples.length >= 8 && a.sampleRate > 0)
              .map(audioFingerprint(_))
          else None
        FingerprintRow(m.media_id, m.kind, fp)
      }
    }
  }

  /** Audio metadata probe: fill sample_rate / duration_ms from the real
    * decoded stream (the audio analog of resize's metadata refresh).
    * Non-audio rows and undecodable payloads pass through untouched.
    */
  def probeAudio(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "audio") m
        else decodeAudio(m.payload) match {
          case Some(a) => m.copy(sample_rate = Some(a.sampleRate),
            duration_ms = Some(a.durationMs))
          case None => m
        }
      }
    }
  }

  // ----------------------------------------------------- video container

  private[ext] case class VideoMeta(durationMs: Long, width: Int, height: Int)

  /** REAL ISO BMFF (MP4/MOV) container parse — pure big-endian byte
    * walking of the box tree (size+fourcc headers; moov/trak recursed),
    * zero dependencies: `mvhd` yields timescale+duration (v0 and v1
    * layouts), the first `tkhd` with a nonzero 16.16 fixed-point
    * width/height yields the display size. This is CONTAINER metadata,
    * not codec work — frame decode stays honestly stubbed (no video
    * codec library exists in this environment) — but it means video
    * rows now get real duration/dimensions the same way audio rows get
    * real sample rates. Corrupt/truncated payloads return None and
    * pass through, like every decoder here.
    */
  private[ext] def probeMp4(payload: Array[Byte]): Option[VideoMeta] = try {
    val bb = java.nio.ByteBuffer.wrap(payload)
    var durationMs = -1L
    var w = 0
    var h = 0
    def scan(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) return
      var off = start
      while (off + 8 <= end) {
        val size32 = bb.getInt(off.toInt) & 0xffffffffL
        val typ = new String(payload, off.toInt + 4, 4, "ISO-8859-1")
        var hdr = 8L
        val size =
          if (size32 == 1) { hdr = 16; bb.getLong(off.toInt + 8) }
          else if (size32 == 0) end - off // box extends to EOF
          else size32
        if (size < hdr || off + size > end) return // malformed: stop
        val p = off + hdr
        typ match {
          case "moov" | "trak" => scan(p, off + size, depth + 1)
          case "mvhd" =>
            val v = payload(p.toInt) & 0xff
            val (ts, dur) =
              if (v == 1) (bb.getInt((p + 20).toInt), bb.getLong((p + 24).toInt))
              else (bb.getInt((p + 12).toInt),
                bb.getInt((p + 16).toInt) & 0xffffffffL)
            if (ts > 0) durationMs = dur * 1000L / ts
          case "tkhd" =>
            val v = payload(p.toInt) & 0xff
            val dims = p + (if (v == 1) 88L else 76L)
            val ww = bb.getInt(dims.toInt) >>> 16 // 16.16 fixed point
            val hh = bb.getInt((dims + 4).toInt) >>> 16
            if (ww > 0 && hh > 0 && w == 0) { w = ww; h = hh }
          case _ => ()
        }
        off += size
      }
    }
    scan(0L, payload.length.toLong, 0)
    if (durationMs >= 0) Some(VideoMeta(durationMs, w, h)) else None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** A demuxed video track: the stsd sample-entry fourcc (codec id,
    * "" when the container carries no stsd) and the sync samples as
    * (syncIdx, tMs, exact codestream bytes).
    */
  private[ext] final case class Mp4Demux(codec: String,
      frames: Vector[(Int, Long, Array[Byte])])

  /** Sync-sample (keyframe) BYTE extraction from an MP4 container: the
    * real demuxer path. Walks moov/trak to the video track's sample
    * tables — stss (sync list; absent ⇒ every sample is sync), stsz
    * (sizes), stsc (sample→chunk runs), stco/co64 (chunk offsets),
    * stts (decode deltas), mdhd (timescale), stsd (codec fourcc) — and
    * slices each keyframe's exact byte range out of the file. The
    * frame BYTES and TIMESTAMPS are real for every codec; whether the
    * bytes then DECODE depends on the codec — MJPEG flavors do in-JVM
    * ([[decodeVideoFrame]]), H.26x stays honestly stubbed (no such
    * decoder exists in this JVM/environment). Returns None when the
    * payload has no parseable video sample table; malformed tables
    * return None, never throw.
    */
  private[ext] def extractMp4SyncSamples(
      payload: Array[Byte]): Option[Mp4Demux] = try {
    val bb = java.nio.ByteBuffer.wrap(payload)
    // per-trak tables; committed on trak exit iff the handler is video
    var handler = ""
    var timescale = 0L
    var fourcc = ""
    var stss: Array[Int] = null
    var sizes: Array[Long] = null
    var stsc: Array[(Long, Long)] = null // (firstChunk 1-based, samplesPerChunk)
    var chunkOffs: Array[Long] = null
    var stts: Array[(Long, Long)] = null // (sampleCount, delta)
    var video: Option[(Long, String, Array[Int], Array[Long],
      Array[(Long, Long)], Array[Long], Array[(Long, Long)])] = None
    def u32(at: Long): Long = bb.getInt(at.toInt) & 0xffffffffL
    def scan(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) return
      var off = start
      while (off + 8 <= end) {
        val size32 = u32(off)
        val typ = new String(payload, off.toInt + 4, 4, "ISO-8859-1")
        var hdr = 8L
        val size =
          if (size32 == 1) { hdr = 16; bb.getLong(off.toInt + 8) }
          else if (size32 == 0) end - off
          else size32
        if (size < hdr || off + size > end) return
        val p = off + hdr
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => scan(p, off + size, depth + 1)
          case "trak" =>
            handler = ""; timescale = 0L; fourcc = ""
            stss = null; sizes = null; stsc = null; chunkOffs = null; stts = null
            scan(p, off + size, depth + 1)
            if (handler == "vide" && video.isEmpty && timescale > 0 &&
                sizes != null && stsc != null && chunkOffs != null && stts != null)
              video = Some((timescale, fourcc, stss, sizes, stsc, chunkOffs, stts))
          case "hdlr" => handler = new String(payload, p.toInt + 8, 4, "ISO-8859-1")
          case "stsd" =>
            // version+flags(4) entry_count(4), then first sample entry:
            // size(4) format-fourcc(4) — the codec identifier
            if (u32(p + 4) > 0 && p + 16 <= off + size)
              fourcc = new String(payload, p.toInt + 12, 4, "ISO-8859-1")
          case "mdhd" =>
            val v = payload(p.toInt) & 0xff
            timescale = if (v == 1) u32(p + 20) else u32(p + 12)
          case "stss" =>
            val n = u32(p + 4).toInt
            stss = Array.tabulate(n)(i => u32(p + 8 + 4L * i).toInt)
          case "stsz" =>
            val uniform = u32(p + 4)
            val n = u32(p + 8).toInt
            sizes =
              if (uniform != 0) Array.fill(n)(uniform)
              else Array.tabulate(n)(i => u32(p + 12 + 4L * i))
          case "stsc" =>
            val n = u32(p + 4).toInt
            stsc = Array.tabulate(n)(i =>
              (u32(p + 8 + 12L * i), u32(p + 12 + 12L * i)))
          case "stco" =>
            val n = u32(p + 4).toInt
            chunkOffs = Array.tabulate(n)(i => u32(p + 8 + 4L * i))
          case "co64" =>
            val n = u32(p + 4).toInt
            chunkOffs = Array.tabulate(n)(i => bb.getLong((p + 8 + 8L * i).toInt))
          case "stts" =>
            val n = u32(p + 4).toInt
            stts = Array.tabulate(n)(i =>
              (u32(p + 8 + 8L * i), u32(p + 12 + 8L * i)))
          case _ => ()
        }
        off += size
      }
    }
    scan(0L, payload.length.toLong, 0)
    video.map { case (ts, codec, sync, szs, sc, chunks, deltas) =>
      val n = szs.length
      // sample -> file offset: expand the stsc runs over the chunk list
      val sampleOff = new Array[Long](n)
      var s = 0
      var c = 0
      while (c < chunks.length && s < n) {
        val run = sc.lastIndexWhere(_._1 <= c + 1)
        val perChunk = if (run >= 0) sc(run)._2.toInt else 0
        var within = 0
        var at = chunks(c)
        while (within < perChunk && s < n) {
          sampleOff(s) = at
          at += szs(s)
          within += 1
          s += 1
        }
        c += 1
      }
      if (s < n) throw new IllegalArgumentException("stsc/stco underflow")
      // sample -> decode time (track timescale) via the stts runs
      val sampleT = new Array[Long](n)
      var t = 0L
      var i = 0
      deltas.foreach { case (cnt, d) =>
        var k = 0L
        while (k < cnt && i < n) { sampleT(i) = t; t += d; i += 1; k += 1 }
      }
      val syncIdx: Array[Int] =
        if (sync != null) sync.map(_ - 1).filter(x => x >= 0 && x < n)
        else Array.range(0, n) // no stss box: every sample is sync
      Mp4Demux(codec, syncIdx.toVector.zipWithIndex.map { case (sIdx, outIdx) =>
        val from = sampleOff(sIdx)
        val until = math.min(from + szs(sIdx), payload.length.toLong)
        require(from >= 0 && from <= until, "sample range out of file")
        (outIdx, sampleT(sIdx) * 1000L / ts,
          java.util.Arrays.copyOfRange(payload, from.toInt, until.toInt))
      })
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Pixel decode of one demuxed keyframe codestream, for the codecs
    * the JVM can actually decode: MJPEG-in-MP4 stores each sample as a
    * plain JPEG codestream ("jpeg"/"mjpa"/"mjpb" sample entries — or
    * any sample whose bytes open with the JPEG SOI marker, covering
    * MJPEG muxed under generic "mp4v" entries), which `javax.imageio`
    * reads natively. H.26x codestreams return None — THE remaining
    * stub in the video path (no such decoder exists in this
    * environment; a real deployment swaps this branch for an ffmpeg
    * binding without touching the demux or the dataflow around it).
    */
  private[ext] def decodeVideoFrame(codec: String,
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val soi = bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
    val mjpeg = codec == "jpeg" || codec == "mjpa" || codec == "mjpb"
    if (mjpeg || soi) decodeImage(bytes) else None
  }

  /** Video metadata probe: fill duration_ms / width / height from the
    * real container parse (the video analog of [[probeAudio]]).
    * Non-video rows and unparseable payloads pass through untouched.
    */
  def probeVideo(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "video") m
        else probeMp4(m.payload) match {
          case Some(v) => m.copy(duration_ms = Some(v.durationMs),
            width = if (v.width > 0) Some(v.width) else m.width,
            height = if (v.height > 0) Some(v.height) else m.height)
          case None => m
        }
      }
    }
  }

  /** Image resize: real decode -> bilinear scale -> PNG re-encode, with
    * the metadata updated in the same pass. Non-images and undecodable
    * payloads pass through untouched (see the codec note above).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "image") m
        else decodeImage(m.payload) match {
          case Some(img) =>
            m.copy(payload = encodePng(scaleImage(img, w, h)),
              mime = "image/png", width = Some(w), height = Some(h))
          case None => m
        }
      }
    }
  }

  /** Frame sampling: one row per sampled frame (flatMap — the typed
    * analog of a generator/UDTF). Each tick t = 0, everyMs, 2·everyMs …
    * emits the frame on screen at that instant.
    *
    * GIF payloads decode for REAL ([[decodeGifFrames]]): the emitted
    * payload is the PNG of the composited canvas at the tick, with the
    * animation's own timing deciding the duration (the stored
    * duration_ms metadata is not trusted over the stream). MP4 payloads
    * demux for REAL ([[extractMp4SyncSamples]]): each emitted frame is
    * the exact keyframe codestream byte range at its true decode
    * timestamp, thinned to one per `everyMs`; MJPEG keyframes then
    * DECODE for real too ([[decodeVideoFrame]]) and re-emit as PNG —
    * only H.26x pixel decode stays stubbed (raw codestream bytes
    * emitted; no such decoder in this environment); payloads with no
    * parseable sample table fall back to the stub slicer. The GIF and
    * MJPEG PNG frames feed decodeImage → imageDHash →
    * Dedup.simhashHammingPairs unchanged, so near-duplicate VIDEO
    * detection runs on real pixels for GIF and MJPEG corpora today.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else if (isGif(m.payload)) decodeGifFrames(m.payload) match {
        case Some(frames) if frames.nonEmpty =>
          val total = frames.last.startMs + frames.last.delayMs
          val step = math.max(1L, everyMs)
          // ticks advance monotonically, so the on-screen frame index
          // is non-decreasing: a single cursor walk is O(frames+ticks)
          // (vs a takeWhile scan per tick), and caching the PNG per
          // SOURCE frame encodes each frame once even when it spans
          // many ticks (everyMs << delay)
          var cursor = 0
          var cachedFor = -1
          var cachedPng: Array[Byte] = null
          Iterator.iterate(0L)(_ + step).takeWhile(_ < total).zipWithIndex
            .map { case (t, idx) =>
              while (cursor + 1 < frames.length &&
                frames(cursor + 1).startMs <= t) cursor += 1
              if (cachedFor != cursor) {
                cachedPng = encodePng(frames(cursor).image)
                cachedFor = cursor
              }
              FrameRow(m.media_id, idx, t, cachedPng)
            }
        case _ => Iterator.empty // corrupt GIF: skip, like every decoder
      }
      else extractMp4SyncSamples(m.payload) match {
        case Some(demux) if demux.frames.nonEmpty =>
          // thin to one keyframe per everyMs window (first always kept)
          var nextAt = Long.MinValue
          demux.frames.iterator.filter { case (_, t, _) =>
            if (t >= nextAt) { nextAt = t + math.max(1L, everyMs); true }
            else false
          }.zipWithIndex.map { case ((_, t, bytes), idx) =>
            // MJPEG keyframes decode to real pixels and re-emit as PNG
            // (same contract as the GIF path); H.26x keyframes emit
            // their exact demuxed codestream bytes (decode stubbed)
            val payload = decodeVideoFrame(demux.codec, bytes)
              .map(encodePng).getOrElse(bytes)
            FrameRow(m.media_id, idx, t, payload)
          }
        case _ => stubFrames(m.payload, everyMs, m.duration_ms.getOrElse(0L))
          .map { case (i, t, bytes) => FrameRow(m.media_id, i, t, bytes) }
      }
    }
  }

  /** Balance blob skew before expensive decode stages: range-partition
    * by payload size so each task gets a comparable byte budget, not a
    * comparable row count.
    */
  def repartitionByPayloadSize(media: DataFrame, partitions: Int): DataFrame =
    media.repartitionByRange(partitions, length(col("payload")))

  // ------------------------------------------------ synthetic media corpus
  // The deterministic media fixture generator (tools/MediaFixture and the
  // q_media_dedup oracle row both ride it): REAL PNG payloads whose
  // perceptual dHash is known in closed form, so the full decode →
  // downscale → fingerprint path is gated by construction, plus a
  // corrupt-payload class (truncated PNG — the ragged-embedding
  // discipline applied to media) and a non-image kind for routing.

  /** Near-dup group width for [[synthesizeMedia]]: ids in the same
    * group of `NearDupGroup` CONSECUTIVE ids render near-duplicate
    * images (0-2 jittered fingerprint bits each — pairwise hamming
    * <= 3), different groups render unrelated ones (~32 bits apart).
    * Small groups keep the true-pair count LINEAR in the corpus — the
    * honest dedup shape; one big visual class would make it quadratic.
    */
  val NearDupGroup = 3

  /** splitmix64 finalizer — the fixture tools' stateless scramble. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The fingerprint [[synthesizeMedia]]'s image for `id` is BUILT to
    * dHash to: the id's group base pattern XOR 0-2 per-id jitter bits —
    * same-group ids land within small hamming distance (near-dups),
    * different groups land ~32 bits apart (unrelated).
    */
  private[graft] def targetFp(id: Long): Long = {
    val base = mix64(id / NearDupGroup)
    val k = (id % NearDupGroup).toInt.min(2)
    var fp = base
    var i = 0
    while (i < k) {
      fp ^= 1L << java.lang.Long.remainderUnsigned(mix64(id * 31 + i), 64L).toInt
      i += 1
    }
    fp
  }

  /** The 9x8 gray image whose [[imageDHash]] equals `fp` exactly: each
    * row's 9 levels walk ±`step` luma per step so every adjacent-pixel
    * comparison realizes the corresponding fingerprint bit (max drift
    * 8·step from the 128 start stays inside [128−8·step, 128+8·step] —
    * no clipping for step <= 14).
    */
  private def fpImage(fp: Long, step: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var l = 128
      img.setRGB(0, y, (l << 16) | (l << 8) | l)
      var x = 0
      while (x < 8) {
        // bit set ⇔ luma(x) > luma(x+1)
        l = if (((fp >>> (y * 8 + x)) & 1L) == 1L) l - step else l + step
        img.setRGB(x + 1, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A real 9x8 PNG realizing `fp` ([[fpImage]] at ±10; PNG is
    * lossless so decode returns the written pixels).
    */
  private[ext] def pngForFp(fp: Long): Array[Byte] =
    encodePng(fpImage(fp, step = 10))

  /** A real 9x8 JPEG realizing `fp` — the keyframe payload of the
    * video fixture. JPEG is LOSSY, so the walk runs at ±14 (the
    * no-clipping maximum) and the encode at quality 0.95: DCT error on
    * the smooth ramps is a few luma levels, far inside the 14-level
    * comparison margin, so decode → dHash still lands on `fp` exactly
    * (MultimodalSpec pins it across the corpus). Encoding via the JDK
    * writer with EXPLICIT quality — deterministic bytes for a given
    * JDK, and the fingerprint contract survives any conformant decoder.
    */
  private[ext] def jpegForFp(fp: Long): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    try {
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(
          fpImage(fp, step = 14), null, null), p)
      } finally ios.close()
      bos.toByteArray
    } finally w.dispose()
  }

  /** Deterministic synthetic media corpus keyed by an id column — one
    * [[MediaRow]] per non-null id:
    *
    *  - `id % 29 == 17`: CORRUPT image (the PNG truncated to 24 bytes —
    *    parses as a PNG magic, dies in the header). The declared drop
    *    rule: undecodable payloads fingerprint to None and every
    *    downstream dedup/quality gate drops them explicitly.
    *  - else `id % 31 == 5`: an `audio` row (opaque stub payload) —
    *    kind routing; never fingerprinted by the image path.
    *  - else: a real PNG built by [[pngForFp]] whose dHash equals
    *    [[targetFp]]`(id)` by construction.
    *
    * Scale posture: generation is partition-local (mapPartitions, no
    * shuffle, payloads never pass through the driver) and pure in the
    * id, so any two engines/processes synthesize bit-identical corpora.
    */
  def synthesizeMedia(ids: DataFrame, id: Column): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.select(id.cast("long").as("media_id")).na.drop()
      .as[Long](Encoders.scalaLong)
      .mapPartitions(_.map { mid =>
        if (mid % 29 == 17)
          MediaRow(mid, "image", pngForFp(targetFp(mid)).take(24),
            "image/png", Some(9), Some(8), None, None)
        else if (mid % 31 == 5)
          MediaRow(mid, "audio", Array[Byte](0x52, 0x49, 0x46, 0x46),
            "audio/wav", None, None, Some(8000), Some(100L))
        else
          MediaRow(mid, "image", pngForFp(targetFp(mid)),
            "image/png", Some(9), Some(8), None, None)
      })
  }

  // -------------------------------------------- audio fixture synthesis
  // The dHash-by-construction discipline applied to the audio column:
  // every clip is a REAL 16-bit PCM WAV whose [[audioFingerprint]]
  // equals a closed-form target exactly, so decode → FFT → band
  // ordering → hash is gated end-to-end against known answers (and the
  // cross-engine dedup row gates the extracted fingerprint table, the
  // q_media_dedup pattern).

  /** WAV synthesis frame length == the fingerprint FFT size: one tone
    * per band at the band-CENTER bin with integer cycles per frame, so
    * the Hann-windowed spectrum concentrates each tone inside its own
    * band and the 9 band powers order exactly like the 9 synthesis
    * amplitudes.
    */
  private val AudioFrame = 512

  /** Per-step amplitude ratio of the walk (~±2.9 dB): band powers
    * differ by >= 1.96x at every compared pair — far above 16-bit
    * quantization noise and inter-band Hann leakage, so the decoded
    * fingerprint is bit-exact in practice (MultimodalSpec pins it).
    */
  private val AudioWalkRatio = 1.4

  /** Base tone amplitude: the worst-case monotone walk sums to ~0.62
    * full-scale — no clipping at the 16-bit encode.
    */
  private val AudioBaseAmp = 0.012

  /** The 9 band-center tones sampled over one frame — shared by every
    * synthesized clip (the tone value depends only on (band, sample
    * index), never on the fingerprint), so per-row synthesis is 9
    * multiply-adds per sample instead of 9 `sin` calls: at corpus
    * scale that is the difference between a table lookup and ~10^8
    * transcendental evaluations per 5k clips (measured 2.7 → ~1.2 s
    * on the sf0.1 bench row).
    */
  @transient private lazy val AudioTones: Array[Array[Double]] = {
    val half = AudioFrame / 2
    Array.tabulate(9) { b =>
      val s = (1 + (half - 1).toLong * b / 9).toInt
      val e = math.max(s + 1, (1 + (half - 1).toLong * (b + 1) / 9).toInt)
      val c = (s + e) / 2
      Array.tabulate(AudioFrame)(i =>
        math.sin(2 * math.Pi * c * i / AudioFrame))
    }
  }

  /** A real 8000 Hz mono PCM WAV (8 x 512 samples, 512 ms) whose
    * [[audioFingerprint]] equals `fp` exactly: per frame y the 9 tone
    * amplitudes walk x[[AudioWalkRatio]] up or down so every adjacent
    * band-power comparison realizes bit `y*8 + x` — the [[pngForFp]]
    * construction transposed to the spectro-temporal grid.
    */
  private[graft] def wavForFp(fp: Long): Array[Byte] = {
    val tones = AudioTones
    val samples = new Array[Float](8 * AudioFrame)
    var y = 0
    while (y < 8) {
      val k = new Array[Int](9) // amplitude-walk exponents, k(0) = 0
      var x = 0
      while (x < 8) {
        // bit set ⇔ band x louder than band x+1
        k(x + 1) = k(x) + (if (((fp >>> (y * 8 + x)) & 1L) == 1L) -1 else 1)
        x += 1
      }
      val amps = k.map(e => AudioBaseAmp * math.pow(AudioWalkRatio, e))
      var i = 0
      while (i < AudioFrame) {
        var acc = 0.0
        var b = 0
        while (b < 9) {
          acc += amps(b) * tones(b)(i)
          b += 1
        }
        samples(y * AudioFrame + i) = acc.toFloat
        i += 1
      }
      y += 1
    }
    encodeWav(samples, rate = 8000)
  }

  /** Encode mono float samples as a 16-bit little-endian PCM WAV —
    * the canonical 44-byte RIFF/fmt/data layout, written directly.
    * Byte-identical to what `AudioSystem.write(..., Type.WAVE, ...)`
    * emits for this format (MultimodalSpec pins the identity), but
    * without the synchronized SPI-registry walk that serialized 32
    * concurrent synthesis tasks (CodecContention: 32-thread WAV encode
    * measured SLOWER in aggregate than 1-thread).
    */
  private[ext] def encodeWav(samples: Array[Float], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    w32(4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    w32(16, 16)      // fmt chunk length
    w16(20, 1)       // PCM tag
    w16(22, 1)       // mono
    w32(24, rate)
    w32(28, rate * 2) // byte rate = rate * blockAlign
    w16(32, 2)       // blockAlign = channels * 2
    w16(34, 16)      // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    w32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768,
        math.min(32767, math.round(samples(i) * 32767f))).toShort
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic synthetic AUDIO corpus keyed by an id column — the
    * audio twin of [[synthesizeMedia]], one [[MediaRow]] per non-null
    * id:
    *
    *  - `id % 23 == 7`: CORRUPT clip (the WAV truncated to 16 bytes —
    *    parses as a RIFF magic, dies in the header). A corrupt class
    *    DISTINCT from the image fixture's `%29==17` so the two
    *    modalities' gated pair tables differ, not just their codecs.
    *  - else `id % 31 == 5`: an `image` row (stub payload) — kind
    *    routing; never fingerprinted by the audio path.
    *  - else: a real WAV built by [[wavForFp]] whose
    *    [[audioFingerprint]] equals [[targetFp]]`(id)` by construction
    *    (same near-dup group geometry as the images: pairwise hamming
    *    <= 3 inside an id-triple, ~32 bits across).
    *
    * Same scale posture as the image synthesis: partition-local, pure
    * in the id, payloads never pass through the driver.
    */
  def synthesizeAudio(ids: DataFrame, id: Column): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.select(id.cast("long").as("media_id")).na.drop()
      .as[Long](Encoders.scalaLong)
      .mapPartitions(_.map { mid =>
        if (mid % 23 == 7)
          MediaRow(mid, "audio", wavForFp(targetFp(mid)).take(16),
            "audio/wav", None, None, Some(8000), None)
        else if (mid % 31 == 5)
          MediaRow(mid, "image", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47),
            "image/png", Some(9), Some(8), None, None)
        else
          MediaRow(mid, "audio", wavForFp(targetFp(mid)),
            "audio/wav", None, None, Some(8000), Some(512L))
      })
  }

  // -------------------------------------------- video fixture synthesis

  /** A minimal-but-valid MJPEG-in-MP4: one `vide` track, timescale
    * 1000, 500-tick sample deltas, every sample a sync sample (no
    * stss — the MJPEG convention: all frames are keyframes), stsd
    * sample entry `jpeg`, all samples in one chunk. Exactly the
    * container shape [[extractMp4SyncSamples]] demuxes and a real
    * MJPEG-in-MP4 producer writes. The chunk offset is resolved by
    * assembling once at offset 0 to learn the header length — the
    * standard two-pass flat-MP4 trick.
    */
  private[ext] def mjpegMp4(jpegs: Seq[Array[Byte]]): Array[Byte] = {
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

  /** Perceptual fingerprints for the VIDEO column: real container
    * demux ([[extractMp4SyncSamples]]) → FIRST keyframe → pixel decode
    * where a real codec exists (MJPEG via the JDK JPEG reader — the
    * honest boundary: H.26x codestreams have no decoder in this
    * environment and get None, never a fake hash) → [[imageDHash]].
    * Keyframe-0 hashing is the standard video near-dup cheap pass
    * (same first scene ⇒ candidate pair); a full-video variant maps
    * [[sampleFrames]] through the image hash instead. None for
    * non-video kinds, unparseable containers, and undecodable codecs.
    */
  def videoFingerprints(media: Dataset[MediaRow]): Dataset[FingerprintRow] = {
    implicit val enc = Encoders.product[FingerprintRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val fp =
          if (m.kind == "video")
            extractMp4SyncSamples(m.payload).flatMap { demux =>
              demux.frames.headOption.flatMap { case (_, _, bytes) =>
                decodeVideoFrame(demux.codec, bytes).map(imageDHash)
              }
            }
          else None
        FingerprintRow(m.media_id, m.kind, fp)
      }
    }
  }

  /** Multi-keyframe perceptual fingerprints for the VIDEO column: EVERY
    * demuxed keyframe decodes and dHashes (one output row per frame),
    * not just keyframe-0 — the any-match shape that keeps a re-encoded
    * or TRIMMED duplicate visible when its first keyframe differs but
    * later content matches ([[videoFingerprints]]'s keyframe-0 pass is
    * blind to that class by construction). Consumers band the frame
    * rows through the shared hamming pair search and collapse to video
    * pairs with min-hamming (any matching frame pair links the
    * videos). Undecodable containers, undecodable codecs (H.26x — the
    * honest boundary), and non-video kinds keep ONE `fp = None` row so
    * the declared drop rule governs them; a parseable container whose
    * individual frame fails pixel decode emits `fp = None` for that
    * frame only.
    *
    * Scale posture: same as keyframe-0 — demux + decode are
    * partition-local over opaque payload bytes, and what leaves the
    * decode stage grows only to 8 bytes × keyframes/item (keyframes,
    * not frames: sync-sample density is the knob a media lake already
    * controls at encode time).
    */
  def videoFrameFingerprints(media: Dataset[MediaRow]): Dataset[FrameFingerprintRow] = {
    implicit val enc = Encoders.product[FrameFingerprintRow]
    media.flatMap { m =>
      val none = Seq(FrameFingerprintRow(m.media_id, m.kind, None, None))
      if (m.kind != "video") none
      else extractMp4SyncSamples(m.payload) match {
        case Some(demux) if demux.frames.nonEmpty =>
          demux.frames.zipWithIndex.map { case ((_, _, bytes), idx) =>
            FrameFingerprintRow(m.media_id, m.kind, Some(idx),
              decodeVideoFrame(demux.codec, bytes).map(imageDHash))
          }
        case _ => none
      }
    }
  }

  /** Deterministic synthetic VIDEO corpus keyed by an id column — the
    * video twin of [[synthesizeMedia]]/[[synthesizeAudio]]:
    *
    *  - `id % 19 == 11`: CORRUPT container (the MP4 truncated to 40
    *    bytes — ftyp parses, the box walk dies before moov). A corrupt
    *    class DISTINCT from the image (`%29==17`) and audio (`%23==7`)
    *    fixtures, so each modality gates a different pair table.
    *  - else `id % 31 == 5`: an `image` row (stub payload) — kind
    *    routing; never fingerprinted by the video path.
    *  - else `id % 37 == 13`: the TRIMMED/RE-ENCODED near-dup class —
    *    keyframe-0 is a per-id UNIQUE filler ([[fillerFp]]; unrelated
    *    to every group), keyframe-1 is [[jpegForFp]]`(`[[targetFp]]
    *    `(id))`: invisible to keyframe-0 hashing, linked to its group
    *    by the multi-keyframe any-match pass. The class that motivates
    *    [[videoFrameFingerprints]].
    *  - else: a real MJPEG-in-MP4 whose FIRST keyframe is
    *    [[jpegForFp]]`(`[[targetFp]]`(id))` (decode → dHash lands on
    *    the closed-form target THROUGH the lossy JPEG roundtrip — the
    *    ±14 walk buys the margin) plus a second per-id UNIQUE filler
    *    keyframe (multi-sample demux exercised on every row; unique,
    *    NOT a shared constant — a shared filler would link every video
    *    pair under any-match semantics and drown the signal).
    */
  def synthesizeVideo(ids: DataFrame, id: Column): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.select(id.cast("long").as("media_id")).na.drop()
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { mid =>
          if (mid % 19 == 11)
            MediaRow(mid, "video",
              mjpegMp4(Seq(jpegForFp(targetFp(mid)),
                jpegForFp(fillerFp(mid)))).take(40),
              "video/mp4", None, None, None, None)
          else if (mid % 31 == 5)
            MediaRow(mid, "image", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47),
              "image/png", Some(9), Some(8), None, None)
          else if (mid % 37 == 13)
            MediaRow(mid, "video",
              mjpegMp4(Seq(jpegForFp(fillerFp(mid)),
                jpegForFp(targetFp(mid)))),
              "video/mp4", Some(9), Some(8), None, Some(1000L))
          else
            MediaRow(mid, "video",
              mjpegMp4(Seq(jpegForFp(targetFp(mid)),
                jpegForFp(fillerFp(mid)))),
              "video/mp4", Some(9), Some(8), None, Some(1000L))
        }
      }
  }

  /** Per-id UNIQUE filler fingerprint for the video fixture's second
    * keyframes: a full mix64 re-hash keyed away from [[targetFp]]'s
    * group bases, so fillers are ~32 bits from every target and from
    * each other (band-key chance collisions survive the exact
    * bit_count post-filter like any other non-pair).
    */
  private[ext] def fillerFp(id: Long): Long =
    mix64(mix64(id) ^ 0x9e3779b97f4a7c15L)

  // ---------------------------------------------- gif fixture synthesis

  /** [[fpImage]]'s walk rendered INDEXED (identity 256-gray palette):
    * the JDK GIF writer emits an indexed image's own palette verbatim,
    * so the GIF roundtrip is exactly lossless and decode → dHash lands
    * on `fp` — TYPE_INT_RGB input would pass through the writer's
    * color QUANTIZER, which can merge adjacent walk levels and flip
    * fingerprint bits (the MultimodalSpec GIF-sampling test documents
    * that quantization).
    */
  private def fpImageIndexed(fp: Long, step: Int): java.awt.image.BufferedImage = {
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var y = 0
    while (y < 8) {
      var l = 128
      raster.setSample(0, y, 0, l)
      var x = 0
      while (x < 8) {
        l = if (((fp >>> (y * 8 + x)) & 1L) == 1L) l - step else l + step
        raster.setSample(x + 1, y, 0, l)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A real 2-frame animated GIF (JDK imageio writer — the same codec
    * stack [[decodeGifFrames]] reads with): frame 0 realizes `fp`
    * exactly (indexed palette ⇒ lossless roundtrip), frame 1 realizes
    * `filler`, 100 ms delays via per-frame GraphicControlExtension.
    */
  private[ext] def gifForFp(fp: Long, filler: Long): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      Seq(fp, filler).foreach { f =>
        val img = fpImageIndexed(f, step = 10)
        val md = writer.getDefaultImageMetadata(
          new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10") // 100 ms in 1/100 s units
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        md.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, md),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Perceptual fingerprints for the ANIMATED-GIF column: real JDK
    * GIF decode ([[decodeGifFrames]] — palette, frame compositing,
    * timing) → first composited frame → [[imageDHash]]. None for
    * non-gif kinds, unparseable payloads, and frameless files — the
    * [[perceptualFingerprints]] contract on the fourth modality.
    */
  def gifFingerprints(media: Dataset[MediaRow]): Dataset[FingerprintRow] = {
    implicit val enc = Encoders.product[FingerprintRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val fp =
          if (m.kind == "gif" && isGif(m.payload))
            decodeGifFrames(m.payload).flatMap(_.headOption)
              .map(f => imageDHash(f.image))
          else None
        FingerprintRow(m.media_id, m.kind, fp)
      }
    }
  }

  /** Deterministic synthetic ANIMATED-GIF corpus keyed by an id column
    * — the fourth modality fixture ([[synthesizeMedia]] discipline):
    *
    *  - `id % 41 == 3`: CORRUPT payload (the GIF truncated to 24
    *    bytes — signature + logical screen parse, the frame data is
    *    gone). A FOURTH distinct corrupt class (image %29==17, audio
    *    %23==7, video %19==11), so all four modalities gate different
    *    pair tables.
    *  - else `id % 31 == 5`: an `image` row (stub payload) — kind
    *    routing, never fingerprinted by the gif path.
    *  - else: a real 2-frame animated GIF whose FIRST frame realizes
    *    [[targetFp]]`(id)` exactly (lossless indexed roundtrip) and
    *    whose second frame is the per-id unique [[fillerFp]].
    */
  def synthesizeGif(ids: DataFrame, id: Column): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ids.select(id.cast("long").as("media_id")).na.drop()
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { mid =>
          if (mid % 41 == 3)
            MediaRow(mid, "gif",
              gifForFp(targetFp(mid), fillerFp(mid)).take(24),
              "image/gif", None, None, None, None)
          else if (mid % 31 == 5)
            MediaRow(mid, "image", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47),
              "image/png", Some(9), Some(8), None, None)
          else
            MediaRow(mid, "gif", gifForFp(targetFp(mid), fillerFp(mid)),
              "image/gif", Some(9), Some(8), None, Some(200L))
        }
      }
  }
}
