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
    }
  )
}
