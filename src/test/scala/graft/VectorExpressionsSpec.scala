package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorExpressionsSpec extends SparkSpec {

  test("native cosine_similarity matches the higher-order-function formulation") {
    VectorFunctions.register(spark)
    val e = Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va")).filter(col("ia") < 20)
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb")).filter(col("ib") < 20)
    def hofDot(x: String, y: String) =
      expr(s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
    val rows = a.crossJoin(b)
      .select(
        expr("cosine_similarity(va, vb)").as("native"),
        (hofDot("va", "vb") /
          (sqrt(hofDot("va", "va")) * sqrt(hofDot("vb", "vb")))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine_similarity is null-safe") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 2.0D))").collect()
    assert(r.head.isNullAt(0))
  }
}
