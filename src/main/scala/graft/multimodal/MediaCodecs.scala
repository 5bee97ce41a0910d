package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL media codecs over JDK-built-in libraries — no external deps.
  *
  * Images: `javax.imageio` (part of Java SE) encodes/decodes PNG and BMP —
  * both lossless RGB, so pixel statistics computed on the DECODED raster are
  * exact and a SQL oracle can mirror them from the generator's closed form.
  * Audio: `javax.sound.sampled.AudioSystem` parses RIFF/WAVE and yields the
  * PCM frames. This replaces round-2/3's declared `decodeStub` fake: the
  * decode step is now a genuine byte→raster / byte→samples codec pass, the
  * swap-in point the earlier rounds promised (reference treats media as
  * opaque bytea + typed metadata; decode belongs to the pipeline layer,
  * reference `src/repr/src/row.rs` Datum::Bytes).
  *
  * Determinism contract (what makes the oracle possible): payloads are
  * synthesized from `(doc_id, n_chars)` by closed-form integer arithmetic,
  * so every post-decode feature equals a SQL expression over the same
  * columns. The DECODE itself is real work on real PNG/BMP/WAV bytes.
  */
object MediaCodecs {
  // ImageIO needs no display, but some JDKs touch AWT statics — force headless.
  System.setProperty("java.awt.headless", "true")

  // ---------------------------------------------------------------- images

  /** Raster dims derived from the document length: 8..31 × 8..31. */
  def imageDims(nChars: Long): (Int, Int) =
    (8 + (nChars % 24).toInt, 8 + ((nChars * 3) % 24).toInt)

  /** Closed-form pixel channels — mirrored verbatim by the SQL oracle. */
  def pixelRgb(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((docId * 31 + 7L * x + 13L * y) % 256).toInt,
    ((docId * 17 + 11L * x + 5L * y) % 256).toInt,
    ((docId * 23 + 3L * x + 19L * y) % 256).toInt)

  def imageFormat(docId: Long): String = if (docId % 2 == 0) "png" else "bmp"

  /** Render the deterministic raster and encode with ImageIO (real PNG/BMP
    * bytes, magic numbers and all). */
  def encodeImage(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imageDims(nChars)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelRgb(docId, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, imageFormat(docId), out), s"no ${imageFormat(docId)} writer")
    out.toByteArray
  }

  /** Post-decode image features. `thumbMean` is the mean of r+g+b over a
    * 4×4 nearest-neighbor thumbnail — a real (tiny) resample of the decoded
    * raster with exactly mirrorable arithmetic. */
  final case class ImageFeatures(
      doc_id: Long, fmt: String, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, thumb_mean: Double)

  /** REAL decode: sniff the container with ImageIO's reader registry (format
    * name from the actual reader, not a filename), decode to a raster, and
    * compute channel statistics from the decoded pixels. Returns None for
    * payloads no reader accepts (exercised by the corrupt-payload spec). */
  def decodeImage(docId: Long, payload: Array[Byte]): Option[ImageFeatures] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      reader.setInput(iis)
      val fmt = reader.getFormatName.toLowerCase
      val img =
        try reader.read(0)
        catch { case _: Exception => return None }
        finally reader.dispose()
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      // 4×4 nearest-neighbor thumbnail of the DECODED raster
      var ts = 0L
      var j = 0
      while (j < 4) {
        var i = 0
        while (i < 4) {
          val p = img.getRGB(i * w / 4, j * h / 4)
          ts += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          i += 1
        }
        j += 1
      }
      val n = w.toLong * h
      Some(ImageFeatures(docId, fmt,
        w, h,
        round6(sr.toDouble / n), round6(sg.toDouble / n), round6(sb.toDouble / n),
        round6(ts.toDouble / 16)))
    } finally iis.close()
  }

  // ----------------------------------------------------------------- audio

  /** Deterministic 16-bit mono PCM: 64..255 samples in [-2000, 2000]. */
  def audioSampleCount(docId: Long): Int = 64 + ((docId * 37) % 192).toInt

  def audioSample(docId: Long, i: Int): Int =
    ((docId * 131 + 197L * i) % 4001).toInt - 2000

  val AudioRateHz = 8000

  /** Hand-assembled canonical RIFF/WAVE container (fmt + data chunks) around
    * the deterministic PCM — real WAV bytes that any decoder accepts. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = audioSampleCount(docId)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(AudioRateHz)
      .putInt(AudioRateHz * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(audioSample(docId, i).toShort); i += 1 }
    buf.array()
  }

  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_samples: Long,
      duration_ms: Double, peak: Int, rms: Double)

  /** REAL decode via `javax.sound.sampled`: AudioSystem parses the RIFF
    * chunks and exposes the format + frame stream; features come from the
    * decoded little-endian PCM frames. None for non-audio payloads. */
  def decodeWav(docId: Long, payload: Array[Byte]): Option[AudioFeatures] = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    try {
      val f = in.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1) return None
      val n = in.getFrameLength
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
      var peak = 0; var sumSq = 0L
      var i = 0
      while (i < n) {
        val s = bb.getShort(i * 2).toInt
        if (math.abs(s) > peak) peak = math.abs(s)
        sumSq += s.toLong * s
        i += 1
      }
      Some(AudioFeatures(docId,
        f.getSampleRate.toInt, n,
        round6(n * 1000.0 / f.getSampleRate),
        peak, round6(math.sqrt(sumSq.toDouble / n))))
    } finally in.close()
  }

  /** Same rounding Spark's `round(col, 6)` applies to DoubleType
    * (BigDecimal.valueOf → HALF_UP), which round-2 verified hash-matches
    * DuckDB's `round(x, 6)` — keeps Scala-computed features portable. */
  private def round6(d: Double): Double =
    BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
