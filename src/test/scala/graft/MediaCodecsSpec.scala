package graft

import graft.multimodal.MediaCodecs

/** Round-trip + negative tests for the REAL JDK-codec media path
  * (javax.imageio for PNG/BMP, javax.sound.sampled for WAV). */
class MediaCodecsSpec extends SparkSpec {

  test("PNG round-trip: decoded features equal the generator's closed form") {
    val docId = 0L; val nChars = 200L
    val payload = MediaCodecs.encodeImage(docId, nChars)
    // genuine PNG magic
    assert(payload.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
    val f = MediaCodecs.decodeImage(docId, payload).get
    val (w, h) = MediaCodecs.imageDims(nChars)
    assert(f.fmt == "png" && f.width == w && f.height == h)
    val expMeanR = (for { x <- 0 until w; y <- 0 until h }
      yield MediaCodecs.pixelRgb(docId, x, y)._1).sum.toDouble / (w * h)
    assert(math.abs(f.mean_r - expMeanR) < 1e-6)
  }

  test("BMP round-trip: format sniffed from bytes, pixels exact") {
    val docId = 1L; val nChars = 37L
    val payload = MediaCodecs.encodeImage(docId, nChars)
    assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
    val f = MediaCodecs.decodeImage(docId, payload).get
    assert(f.fmt == "bmp")
    val (w, h) = MediaCodecs.imageDims(nChars)
    val expThumb = (for { j <- 0 until 4; i <- 0 until 4 } yield {
      val (r, g, b) = MediaCodecs.pixelRgb(docId, i * w / 4, j * h / 4)
      r + g + b
    }).sum.toDouble / 16
    assert(math.abs(f.thumb_mean - expThumb) < 1e-6)
  }

  test("WAV round-trip: AudioSystem-decoded PCM matches the closed form") {
    val docId = 5L
    val payload = MediaCodecs.encodeWav(docId)
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    val f = MediaCodecs.decodeWav(docId, payload).get
    val n = MediaCodecs.audioSampleCount(docId)
    assert(f.sample_rate == 8000 && f.n_samples == n)
    val samples = (0 until n).map(MediaCodecs.audioSample(docId, _))
    assert(f.peak == samples.map(math.abs).max)
    val rms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / n)
    assert(math.abs(f.rms - rms) < 1e-6)
  }

  test("corrupt payloads are rejected, not mis-decoded") {
    val junk = Array.tabulate[Byte](256)(i => (i * 7).toByte)
    assert(MediaCodecs.decodeImage(9L, junk).isEmpty)
    assert(MediaCodecs.decodeWav(9L, junk).isEmpty)
    // truncated PNG: magic sniffs but raster decode must fail loudly → None
    val png = MediaCodecs.encodeImage(2L, 100L)
    assert(MediaCodecs.decodeImage(2L, png.take(20)).isEmpty)
  }

  test("media_image_decode query matches the oracle arithmetic on sf0.001") {
    val df = SparkEntry.queries("media_image_decode")(spark, Sf)
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 500)
    val r0 = rows(0L)
    assert(r0.getString(1) == "png")
    val r1 = rows(1L)
    assert(r1.getString(1) == "bmp")
  }

  test("media_audio_decode query yields one feature row per document") {
    val df = SparkEntry.queries("media_audio_decode")(spark, Sf)
    assert(df.count() == 500)
    assert(df.filter(org.apache.spark.sql.functions.col("peak") > 2000).count() == 0)
  }
}
