package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization round: pins the rewritten hot-path formulations to the
  * reference formulations they replaced, so a future refactor cannot drift
  * values (the bench-side queries are also oracle-checked end-to-end; these
  * specs isolate the three expression-level equivalences).
  */
class OptimizedExprSpec extends AnyFunSuite with SparkSpec {

  test("DotProduct is bit-identical to the aggregate(zip_with(...)) fold") {
    graft.functions.VectorFunctions.register(spark)
    val df = spark.range(200).selectExpr(
      "transform(sequence(0, 63), d -> CAST((id * 31 + d * 7) % 1001 AS DOUBLE) / 500.0 - 1.0) AS a",
      "transform(sequence(0, 63), d -> CAST((id * 17 + d * 13) % 1001 AS DOUBLE) / 500.0 - 1.0) AS b")
    val n = df.selectExpr(
      "dot_product(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS ref")
      .filter("fast <> ref OR (fast IS NULL) <> (ref IS NULL)").count()
    assert(n == 0L)
  }

  test("sorted-run topCount equals the distinct×filter modal frequency") {
    // the text_gopher_repetition rewrite: max run length over the sorted
    // array == frequency of the most frequent element; empty array -> NULL
    val texts = Seq(
      "a b c a b a", "x", "", "w w w w", "p q p q r r r q",
      "one two two three three three")
    import spark.implicits._
    val df = texts.toDF("text")
      .withColumn("toks", when(length(col("text")) > 0, split(col("text"), " "))
        .otherwise(expr("CAST(array() AS array<string>)")))
    def refTop(arr: org.apache.spark.sql.Column) =
      array_max(transform(array_distinct(arr), w => size(filter(arr, x => x === w))))
    def fastTop(arr: org.apache.spark.sql.Column) =
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("p"), lit(0).as("r"), lit(0).as("b")),
        (acc, x) => {
          val run = when(acc.getField("p") <=> x, acc.getField("r") + 1).otherwise(lit(1))
          struct(x.as("p"), run.as("r"), greatest(acc.getField("b"), run).as("b"))
        },
        acc => when(acc.getField("p").isNull, lit(null).cast("int"))
          .otherwise(acc.getField("b")))
    val bad = df.select(refTop(col("toks")).as("ref"), fastTop(col("toks")).as("fast"))
      .filter("NOT (ref <=> fast)").count()
    assert(bad == 0L)
  }

  test("single-pass 60-sum simhash equals the exploded bit-position sums") {
    // the dedup_simhash rewrite: one groupBy(doc) with 60 partial-agg sums
    // must produce the same fingerprint as the explode-60-ways formulation
    val docs = spark.range(50).selectExpr("id AS doc_id",
      "concat_ws(' ', transform(sequence(0, CAST(id % 37 AS INT) + 3), " +
        "i -> concat('w', (id * 7 + i * i) % 11))) AS text")
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h",
        expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
    val ref = toks.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 59), b -> IF((shiftright(h, b) & 1) = 1, cnt, -cnt))"))
        .as(Seq("bit_idx", "contrib")))
      .groupBy(col("doc_id"), col("bit_idx"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bit", (col("s") >= 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(bit, bit_idx)")).as("ref_simhash"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val fast = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fast_simhash"))
    val bad = ref.join(fast, "doc_id")
      .filter(col("ref_simhash") =!= col("fast_simhash")).count()
    assert(bad == 0L)
    assert(ref.count() == 50L)
  }

  test("IntDotProduct equals the aggregate(zip_with(...)) integer fold") {
    graft.functions.VectorFunctions.register(spark)
    val df = spark.range(200).selectExpr(
      "transform(sequence(0, 63), d -> CAST((id * 31 + d * 7) % 256 AS INT)) AS a",
      "transform(sequence(0, 63), d -> CAST((id * 17 + d * 13) % 256 AS INT)) AS b")
    val n = df.selectExpr(
      "int_dot_product(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, p) -> acc + p) AS ref")
      .filter("fast <> ref OR (fast IS NULL) <> (ref IS NULL)").count()
    assert(n == 0L)
    // null element and length mismatch both yield NULL, like the replaced form
    val edge = spark.sql(
      """SELECT int_dot_product(array(1, CAST(NULL AS INT), 3), array(1, 2, 3)) AS a,
        |  int_dot_product(array(1, 2), array(1, 2, 3)) AS b,
        |  aggregate(zip_with(array(1, CAST(NULL AS INT), 3), array(1, 2, 3),
        |    (x, y) -> x * y), CAST(0 AS BIGINT), (acc, p) -> acc + p) AS ra,
        |  aggregate(zip_with(array(1, 2), array(1, 2, 3),
        |    (x, y) -> x * y), CAST(0 AS BIGINT), (acc, p) -> acc + p) AS rb
        |""".stripMargin).collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2) && edge.isNullAt(3))
  }

  test("ArrayMatchCount equals the aggregate(zip_with(IF(x=y,1,0))) fold") {
    graft.functions.VectorFunctions.register(spark)
    val df = spark.range(200).selectExpr(
      "transform(sequence(0, 31), d -> CAST((id * 31 + d * 7) % 5 AS BIGINT)) AS a",
      "transform(sequence(0, 31), d -> CAST((id * 17 + d * 13) % 5 AS BIGINT)) AS b")
    val n = df.selectExpr(
      "array_match_count(a, b) AS fast",
      "aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, x) -> acc + x) AS ref")
      .filter("fast <> ref OR (fast IS NULL) <> (ref IS NULL)").count()
    assert(n == 0L)
    // length mismatch / null elements contribute 0 matches, like the fold
    val edge = spark.sql(
      """SELECT
        |  array_match_count(array(CAST(1 AS BIGINT), 2), array(CAST(1 AS BIGINT), 2, 3)) AS a,
        |  aggregate(zip_with(array(CAST(1 AS BIGINT), 2), array(CAST(1 AS BIGINT), 2, 3),
        |    (x, y) -> IF(x = y, 1, 0)), 0, (acc, x) -> acc + x) AS ra,
        |  array_match_count(array(CAST(NULL AS BIGINT), 2), array(CAST(1 AS BIGINT), 2)) AS b,
        |  aggregate(zip_with(array(CAST(NULL AS BIGINT), 2), array(CAST(1 AS BIGINT), 2),
        |    (x, y) -> IF(x = y, 1, 0)), 0, (acc, x) -> acc + x) AS rb
        |""".stripMargin).collect()(0)
    assert(edge.getInt(0) == edge.getInt(1) && edge.getInt(2) == edge.getInt(3))
  }
}
