package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.Changelog
import graft.views.ViewCatalog

/** Envelope-framed sink over the file transport (reference
  * `src/storage/src/sink/kafka.rs` with the topic replaced by a directory —
  * the transport swap the ARCHITECTURE.md connector contract documents).
  *
  * Layout: `<path>/batch=<viewVersion>/` holds one commit's framed
  * key/value messages as parquet; Spark's partition discovery exposes
  * `batch` as a column, so a reader gets `(key, value, batch)` — offset
  * order — from one scan of the root. `_registry.tsv` (Avro envelope only)
  * carries the key/value writer schemas under their Confluent ids, so the
  * engine's own `registry_decode` replays the frames.
  *
  * Resume position = max committed batch dir (the reference's
  * `retrieve_upper_from_snapshots` over topic metadata): a replayed view
  * version is a no-op, and a version SKIPPED by a failed hook is healed by
  * folding the view's stored deltas `(resume, version]` into this commit's
  * frame batch — always ∝ |delta|.
  */
object FileEnvelopeSink {

  val KeySchemaId = 1
  val ValueSchemaId = 2

  /** Last view version this sink committed, from the batch dirs. */
  def resumeUpper(path: String): Long = {
    val root = Paths.get(path)
    if (!Files.exists(root)) -1L
    else {
      val listing = Files.list(root)
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
        .foldLeft(-1L)(math.max)
      finally listing.close()
    }
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Seed the sink: registry file (avro) + the snapshot as an all-insert
    * frame batch at the seeded view version. */
  def create(spark: SparkSession, snapshot: DataFrame, path: String,
      keys: Seq[String], envelope: String, version: Long): Unit = {
    require(resumeUpper(path) < 0, s"envelope sink already exists at $path")
    Files.createDirectories(Paths.get(path))
    if (envelope == "UPSERT") {
      val keyDdl = snapshot.select(keys.map(org.apache.spark.sql.functions.col): _*)
        .schema.toDDL
      Confluent.writeRegistryFile(Paths.get(path, "_registry.tsv").toString, Seq(
        (KeySchemaId, "avro", keyDdl), (ValueSchemaId, "avro", snapshot.schema.toDDL)))
    }
    Files.write(Paths.get(path, "_envelope"),
      s"$envelope\n${keys.mkString(",")}\n".getBytes(StandardCharsets.UTF_8))
    writeBatch(spark, Changelog.fromRows(snapshot), path, keys, envelope, version)
  }

  /** The commit hook body: frame THIS commit's delta (catching up from the
    * sink's recorded position when a prior hook failed) and append it as one
    * batch dir. */
  def applyCommit(spark: SparkSession, cat: ViewCatalog, view: String, path: String,
      keys: Seq[String], envelope: String, delta: DataFrame, version: Long): Unit = {
    val resume = resumeUpper(path)
    if (resume >= version) return // replayed refresh
    val eff =
      if (resume == version - 1) delta
      else Changelog.consolidate(Changelog.unionAll(
        ((math.max(resume, -1L) + 1) to version).map(v => cat.deltaAt(view, v)): _*))
    writeBatch(spark, eff, path, keys, envelope, version)
  }

  private def writeBatch(spark: SparkSession, delta: DataFrame, path: String,
      keys: Seq[String], envelope: String, version: Long): Unit = {
    val frames = envelope match {
      case "UPSERT" =>
        val (inserts, goneKeys) = SinkEnvelopes.changes(delta, keys)
        SinkEnvelopes.upsertAvroFrames(spark, inserts, goneKeys, keys,
          KeySchemaId, ValueSchemaId)
      case "DEBEZIUM" =>
        SinkEnvelopes.debeziumJsonFrames(Changelog.consolidate(delta), keys, version)
      case other => throw new IllegalArgumentException(s"unknown ENVELOPE $other")
    }
    frames.write.mode("overwrite")
      .parquet(Paths.get(path, s"batch=$version").toString)
  }

  /** All frames in offset order: `(key, value, batch)` from one root scan.
    * The frame schema is fixed by the envelope recorded at create time
    * (UPSERT/AVRO frames are binary, DEBEZIUM/JSON frames are strings), so
    * state it instead of paying a schema-inference job per read; `batch` is
    * the partition column the dir layout carries. */
  def readFrames(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val envFile = Paths.get(path, "_envelope")
    val frameType: DataType =
      if (Files.exists(envFile) &&
        new String(Files.readAllBytes(envFile), StandardCharsets.UTF_8)
          .linesIterator.next().trim == "DEBEZIUM") StringType
      else BinaryType
    spark.read.schema(StructType(Seq(
        StructField("key", frameType), StructField("value", frameType),
        StructField("batch", LongType))))
      .parquet(path)
  }
}
