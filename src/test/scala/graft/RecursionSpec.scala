package graft

import graft.plans.Recursion

class RecursionSpec extends SparkSpec {
  import spark.implicits._

  test("fixpoint computes transitive closure") {
    val edges = Seq(1 -> 2, 2 -> 3, 3 -> 4, 10 -> 11).toDF("u", "v")
    val base = Seq(1).toDF("n")
    val out = Recursion.fixpoint(base,
      f => f.join(edges, f("n") === edges("u")).select(edges("v").as("n")))
      .as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2, 3, 4))
  }

  test("fixpoint respects iteration limit") {
    val edges = Seq(1 -> 2, 2 -> 1).toDF("u", "v") // cycle
    val base = Seq(1).toDF("n")
    val out = Recursion.fixpoint(base,
      f => f.join(edges, f("n") === edges("u")).select(edges("v").as("n")),
      maxIter = 5)
      .as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2))
  }
}
