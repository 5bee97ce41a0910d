package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition (SURVEY §7.2 M7).
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked DETERMINISTIC FAKE — it derives "dimensions" from the byte length.
  * Everything around it is the real Spark shape for this workload: binary
  * payload column, typed `Dataset` with case-class encoders, iterator-based
  * `mapPartitions` (one decoder instance per partition, zero driver
  * involvement, scales with executor count), and a relational projection of
  * the extracted features. Swapping `decodeStub` for a JNI/codec call is the
  * only change needed for real media.
  */
object MultimodalQueries {

  /** Binary payload + metadata, the on-wire shape of a media row. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Extracted features, the post-decode relational shape. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, aspect: Double, fmt: String)

  /** STUB decoder — deterministic fake standing in for a real image decode
    * (no codec libs in this container). Pure function of the payload bytes. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val width = 64 + (n % 512).toInt
    val height = 64 + ((n * 7) % 512).toInt
    MediaFeatures(r.doc_id, n, width, height, width.toDouble / height, r.fmt)
  }

  val defs: Seq[Q] = Seq(
    // documents.text re-encoded as a binary payload → per-partition decode →
    // feature projection. Oracle reproduces the stub arithmetic in SQL.
    Q("media_features",
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + strlen(text) % 512 AS INT) AS width,
        |  CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height,
        |  CAST(64 + strlen(text) % 512 AS DOUBLE)
        |    / (64 + (strlen(text) * 7) % 512) AS aspect,
        |  'png' AS fmt
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
          lit("png").as("fmt"))
        .as[MediaRecord]
      media.mapPartitions(_.map(decodeStub)).toDF()
    },

    // REAL (non-stub) multimodal plumbing: binary payloads carrying actual
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
