package graft.multimodal

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column pipeline: media as opaque `binary` columns with typed
  * metadata, decoded + feature-extracted per partition (SURVEY §7.2 M7).
  *
  * Round 4 replaced the earlier declared `decodeStub` fake with REAL codecs
  * (`MediaCodecs`): images are genuine PNG/BMP bytes decoded through
  * `javax.imageio`, audio is genuine RIFF/WAVE PCM decoded through
  * `javax.sound.sampled` — both JDK-built-in, no external deps. Payload
  * synthesis is closed-form in `(doc_id, n_chars)` so every post-decode
  * feature has an exact DuckDB oracle; the decode work itself (container
  * sniffing, raster/PCM extraction, pixel statistics, thumbnail resample)
  * is real byte-level computation.
  *
  * Scale shape: binary column + iterator-based `mapPartitions` (one decoder
  * per partition, zero driver involvement) — the same plan that handles real
  * crawled media at 100 TB; only the payload source changes.
  */
object MultimodalQueries {

  val defs: Seq[Q] = Seq(
    // documents → REAL PNG/BMP payloads (ImageIO encode) → REAL decode
    // (ImageIO reader registry sniffs the container, raster is decoded,
    // channel means + a 4×4 nearest-neighbor thumbnail resample computed
    // from the decoded pixels). Lossless formats ⇒ the oracle mirrors the
    // generator's closed form exactly.
    Q("media_image_decode",
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    8 + CAST(n_chars % 24 AS INT) AS w,
        |    8 + CAST((n_chars * 3) % 24 AS INT) AS h,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.fmt, d.w, d.h,
        |    (d.doc_id*31 + 7*x.i + 13*y.i) % 256 AS r,
        |    (d.doc_id*17 + 11*x.i + 5*y.i) % 256 AS g,
        |    (d.doc_id*23 + 3*x.i + 19*y.i) % 256 AS b
        |  FROM d,
        |    LATERAL (SELECT unnest(range(d.w)) AS i) x,
        |    LATERAL (SELECT unnest(range(d.h)) AS i) y),
        |stats AS (
        |  SELECT doc_id, fmt, w, h,
        |    round(CAST(sum(r) AS DOUBLE) / (w*h), 6) AS mean_r,
        |    round(CAST(sum(g) AS DOUBLE) / (w*h), 6) AS mean_g,
        |    round(CAST(sum(b) AS DOUBLE) / (w*h), 6) AS mean_b
        |  FROM px GROUP BY 1, 2, 3, 4),
        |thumb AS (
        |  SELECT d.doc_id, round(CAST(sum(
        |      (d.doc_id*31 + 7*(i.i*d.w//4) + 13*(j.i*d.h//4)) % 256
        |    + (d.doc_id*17 + 11*(i.i*d.w//4) + 5*(j.i*d.h//4)) % 256
        |    + (d.doc_id*23 + 3*(i.i*d.w//4) + 19*(j.i*d.h//4)) % 256
        |    ) AS DOUBLE) / 16, 6) AS thumb_mean
        |  FROM d,
        |    LATERAL (SELECT unnest(range(4)) AS i) i,
        |    LATERAL (SELECT unnest(range(4)) AS i) j
        |  GROUP BY 1)
        |SELECT s.doc_id, s.fmt, s.w AS width, s.h AS height,
        |  s.mean_r, s.mean_g, s.mean_b, t.thumb_mean
        |FROM stats s JOIN thumb t USING (doc_id)""".stripMargin) { (s, dir) =>
      import s.implicits._
      // loadSpread: encode+decode runs a real codec per row — one parquet
      // split at bench SFs would serialize it on one core (guide §2.5)
      val docs = Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      // stage 1: binary payload column (real encoded media)
      val media = docs.map { case (id, nc) => (id, MediaCodecs.encodeImage(id, nc)) }
      // stage 2: per-partition decode → relational features
      media.mapPartitions(_.flatMap { case (id, p) => MediaCodecs.decodeImage(id, p) })
        .toDF()
    },

    // documents → REAL WAV payloads (canonical RIFF/WAVE, 16-bit mono PCM)
    // → REAL decode via AudioSystem (chunk walk, format extraction, PCM
    // frame read) → amplitude features from the decoded samples.
    Q("media_audio_decode",
      """WITH d AS (
        |  SELECT doc_id, 64 + CAST((doc_id*37) % 192 AS INT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT d.doc_id, d.n, ((d.doc_id*131 + 197*t.i) % 4001) - 2000 AS smp
        |  FROM d, LATERAL (SELECT unnest(range(d.n)) AS i) t)
        |SELECT doc_id,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  round(n * 1000.0 / 8000, 6) AS duration_ms,
        |  CAST(max(abs(smp)) AS INT) AS peak,
        |  round(sqrt(CAST(sum(smp*smp) AS DOUBLE) / n), 6) AS rms
        |FROM s GROUP BY doc_id, n""".stripMargin) { (s, dir) =>
      import s.implicits._
      // plain loader: the WAV encode/decode is light enough that a fan-out
      // exchange measured as net overhead (A/B r19: 0.32 → 0.76 s) — unlike
      // the image path above, whose raster work dominates
      val docs = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      val media = docs.map(id => (id, MediaCodecs.encodeWav(id)))
      media.mapPartitions(_.flatMap { case (id, p) => MediaCodecs.decodeWav(id, p) })
        .toDF()
    },

    // REAL byte-level plumbing kept from round 2: payloads carrying actual
    // magic bytes (PNG/JPEG/GIF), content-type sniffing on the prefix, and
    // fixed-size frame sampling (every 4th 128-byte frame) with per-frame
    // digests — the video-keyframe-extraction shape. All byte-level work
    // runs on the hex encoding (2 chars/byte) because the oracle engine has
    // no blob slicing; the payload itself is genuine binary.
    Q("media_sniff_frames",
      """WITH media AS (
        |  SELECT doc_id,
        |    from_hex(CASE doc_id % 3 WHEN 0 THEN '89504e47'
        |             WHEN 1 THEN 'ffd8ffe0' ELSE '47494638' END)
        |      || text::BLOB AS payload
        |  FROM documents),
        |hexed AS (
        |  SELECT doc_id, lower(hex(payload)) AS hexp,
        |    CAST(octet_length(payload) AS BIGINT) AS n_bytes
        |  FROM media)
        |SELECT doc_id,
        |  CASE WHEN starts_with(hexp, '89504e47') THEN 'png'
        |       WHEN starts_with(hexp, 'ffd8ff') THEN 'jpeg'
        |       WHEN starts_with(hexp, '47494638') THEN 'gif'
        |       ELSE 'unknown' END AS fmt,
        |  n_bytes,
        |  CAST(i AS INT) AS frame_idx,
        |  md5(substr(hexp, i * 256 + 1, 256)) AS frame_md5
        |FROM hexed,
        |LATERAL (SELECT unnest(range(0, CAST(greatest(n_bytes // 128, 1) AS INT), 4)) AS i) t""".stripMargin) { (s, dir) =>
      val magic = expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '89504e47' " +
        "WHEN 1 THEN 'ffd8ffe0' ELSE '47494638' END")
      // plain loader: hex+md5 framing is cheap per row; a fan-out exchange
      // measured as net overhead here (A/B r19: 0.14 → 0.29 s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(unhex(magic), encode(col("text"), "UTF-8")).as("payload"))
        .select(col("doc_id"), lower(hex(col("payload"))).as("hexp"),
          length(col("payload")).cast("long").as("n_bytes"))
        .select(col("doc_id"),
          when(expr("startswith(hexp, '89504e47')"), "png")
            .when(expr("startswith(hexp, 'ffd8ff')"), "jpeg")
            .when(expr("startswith(hexp, '47494638')"), "gif")
            .otherwise("unknown").as("fmt"),
          col("n_bytes"),
          posexplode(expr(
            "transform(sequence(0, CAST(greatest(n_bytes div 128, 1) AS INT) - 1, 4), x -> x)"))
            .as(Seq("pos", "i")),
          col("hexp"))
        .select(col("doc_id"), col("fmt"), col("n_bytes"),
          col("i").cast("int").as("frame_idx"),
          md5(expr("CAST(substr(hexp, i * 256 + 1, 256) AS BINARY)")).as("frame_md5"))
    }
  )
}
