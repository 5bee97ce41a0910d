package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared MinHash-LSH candidate pipeline over 5-word shingles.
  *
  * Hash scheme: ONE md5 per shingle, split into two 60-bit halves reduced
  * mod P=1e9+7; the 32 permutation hashes are `(h1 + p·h2) mod P` — the
  * classic two-hash minwise family (one digest per shingle instead of 32,
  * ~7× cheaper at bench; same cross-engine portability since both Spark and
  * DuckDB compute md5/substr/% identically on non-negative BIGINTs).
  *
  * Banding: 8 bands × 4 rows (OR-construction); a pair is a candidate iff
  * some band's 4-minhash digest matches. Candidate generation is a
  * hash-bucket shuffle join — the quadratic pair space never materializes,
  * which is THE property that survives 100 TB.
  */
object MinHashLsh {

  val P = 1000000007L

  /** (doc_id, sig: array<bigint>[32]) per document. */
  def signatures(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    val sh = toks.select(col("doc_id"),
      explode(array_distinct(expr(
        "transform(sequence(1, greatest(size(toks) - 4, 1)), " +
          "i -> concat_ws(' ', slice(toks, i, 5)))"))).as("sh"))
    val hashes = sh
      .withColumn("hex", md5(col("sh")))
      .select(col("doc_id"),
        (expr("CAST(conv(substr(hex, 1, 15), 16, 10) AS BIGINT)") % P).as("h1"),
        (expr("CAST(conv(substr(hex, 16, 15), 16, 10) AS BIGINT)") % P).as("h2"))
    // 32 min-aggregates in ONE aggregation (not an explode): map-side
    // partial aggregation collapses each partition to one 32-value row per
    // doc before the shuffle — the explode formulation shuffles 32× the
    // shingle count.
    val mins = (0 until 32).map(p => min((col("h1") + lit(p) * col("h2")) % P).as(s"m$p"))
    hashes.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 32).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** Banded candidate pairs (id_a < id_b), deduplicated across bands. */
  def candidates(sig: DataFrame): DataFrame = {
    val banded = sig.select(col("doc_id"),
      explode(expr("transform(sequence(0, 7), " +
        "b -> struct(b AS band, md5(concat(concat_ws('|', " +
        "transform(slice(sig, b * 4 + 1, 4), x -> CAST(x AS STRING))), '#', b)) AS bh))"))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** The DuckDB oracle CTE chain producing `sig(doc_id, sig)` and
    * `cand(id_a, id_b)` — textually shared by every oracle that composes on
    * LSH candidates, so Spark and DuckDB can never drift apart. */
  val oracleCtes: String =
    s"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |wsh AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS sh
       |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i) t),
       |hashes AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % $P AS h1,
       |    CAST('0x' || substr(md5(sh), 16, 15) AS BIGINT) % $P AS h2
       |  FROM wsh),
       |minh AS (
       |  SELECT doc_id, p, min((h1 + p * h2) % $P) AS mh
       |  FROM hashes, range(32) t(p) GROUP BY doc_id, p),
       |sig AS (SELECT doc_id, list(mh ORDER BY p) AS sig FROM minh GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b AS band,
       |    md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], '|') || '#' || b) AS bh
       |  FROM sig, range(8) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
}
