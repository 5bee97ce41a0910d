package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Embedding similarity + probabilistic near-dup operators (SURVEY §7.2 M7):
  * brute-force cosine top-k (the exact baseline), random-hyperplane LSH
  * bucketing (the scale path: candidates only meet inside a bucket, so the
  * quadratic pair space never materializes), MinHash-LSH for set similarity,
  * and SimHash fingerprints.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions over
  * `array<double>` — codegen'd, no UDFs. Hash-based variants use `xxhash64`
  * (engine-deterministic, not portable SQL) and are therefore rows-only
  * checks; the exact cosine query has a full DuckDB oracle.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** dot(a, b) as a codegen'd higher-order expression. */
  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")

  val defs: Seq[Q] = Seq(

    // Brute-force cosine top-k — exact ANN baseline. Rank on the ROUNDED
    // similarity (+ id tiebreak) so ordering is stable across engines.
    Q("ann_cosine_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q_id, c.vec_id AS c_id,
        |    round(list_cosine_similarity(qv, c.v), 6) AS cos_sim
        |  FROM q, e c WHERE c.vec_id <> q_id)
        |SELECT q_id, c_id, cos_sim FROM (
        |  SELECT q_id, c_id, cos_sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn
        |  FROM pairs) WHERE rn <= 5""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
      val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"))
      val cos = dot("qv", "cv") / (sqrt(dot("qv", "qv")) * sqrt(dot("cv", "cv")))
      val pairs = q.crossJoin(c).filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"), round(cos, 6).as("cos_sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id").asc)
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_id"), col("c_id"), col("cos_sim"))
    },

    // Random-hyperplane LSH: 16 deterministic pseudo-hyperplanes from
    // xxhash64 → 16-bit bucket per vector → candidates only within a bucket
    // → exact cosine verification. The scale path for ANN: candidate
    // generation is a hash-bucket shuffle, not a cross join.
    Q.rowsOnly("ann_lsh_bucketed") { (s, dir) =>
      val e = emb(s, dir)
      val hyper = s.range(16).select(col("id").cast("int").as("j"),
        expr("transform(sequence(0, 63), " +
          "d -> CAST(xxhash64(id * 64 + d) % 1001 AS DOUBLE) / 500.0 - 1.0)").as("u"))
      val bits = e.crossJoin(broadcast(hyper))
        .select(col("vec_id"), col("j"),
          (dot("v", "u") >= 0).cast("long").as("bit"))
      // 4 bands × 4 bits: a pair is a candidate if it matches in ANY band
      // (standard LSH OR-construction — tune bits/bands for target recall).
      val buckets = bits
        .withColumn("band", expr("j div 4"))
        .groupBy(col("vec_id"), col("band"))
        .agg(sum(expr("shiftleft(bit, j % 4)")).as("bucket"))
      val a = buckets.as("a"); val b = buckets.as("b")
      val cand = a.join(b,
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
      val ea = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val eb = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
      val cos = dot("va", "vb") / (sqrt(dot("va", "va")) * sqrt(dot("vb", "vb")))
      cand.join(ea, "id_a").join(eb, "id_b")
        .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.3)
    },

    // MinHash + banded LSH over 5-word shingles
    // (shingle → 32 minhashes → 8 bands of 4 → bucket join → estimate).
    Q.rowsOnly("dedup_minhash_lsh") { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      val sh = d.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(size(toks) - 4, 1)), " +
            "i -> concat_ws(' ', slice(toks, i, 5)))")))
          .as("sh"))
      val minh = sh
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, 31), p -> struct(p AS p, xxhash64(sh, p) AS h))"))
            .as("ph"))
        .select(col("doc_id"), col("ph.p").as("p"), col("ph.h").as("h"))
        .groupBy(col("doc_id"), col("p")).agg(min(col("h")).as("mh"))
      val sig = minh.groupBy(col("doc_id"))
        .agg(expr("transform(array_sort(collect_list(struct(p, mh))), s -> s.mh)").as("sig"))
      val banded = sig.select(col("doc_id"),
          explode(expr("transform(sequence(0, 7), " +
            "b -> struct(b AS band, xxhash64(slice(sig, b * 4 + 1, 4), b) AS bh))")).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val a = banded.as("a"); val b = banded.as("b")
      val cand = a.join(b,
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val sa = sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val sb = sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
      cand.join(sa, "id_a").join(sb, "id_b")
        .select(col("id_a"), col("id_b"),
          (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, x) -> acc + x)")
            .cast("double") / 32.0).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.4)
    },

    // SimHash: 64-bit token-hash fingerprint; near-dup candidates block on
    // four 16-bit sub-bands, then Hamming-filter via bit_count(xor).
    Q.rowsOnly("dedup_simhash") { (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h", xxhash64(col("tok")))
      val bits = toks
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 63), b -> IF((shiftright(h, b) & 1) = 1, 1, -1))"))
            .as(Seq("bit_idx", "contrib")))
      val fp = bits.groupBy(col("doc_id"), col("bit_idx"))
        .agg(sum(col("contrib")).as("s"))
        .withColumn("bit", (col("s") >= 0).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("shiftleft(bit, bit_idx)")).as("simhash"))
      val banded = fp.select(col("doc_id"), col("simhash"),
          explode(expr("transform(sequence(0, 3), " +
            "b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS bh))")).as("bb"))
        .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b,
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 12)
    }
  )
}
