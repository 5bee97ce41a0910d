package graft

import org.apache.spark.sql.functions._
import graft.plans.Recursion

class MutualRecursionSpec extends SparkSpec {
  import spark.implicits._

  test("mutually recursive evens/odds reach the joint fixpoint") {
    val even0 = Seq(0L).toDF("n")
    val odd0 = spark.emptyDataFrame.select(lit(0L).as("n")).limit(0)
    val Seq(evens, odds) = Recursion.mutualFixpoint(
      Seq(even0, odd0),
      { case Seq(e, o) =>
        Seq(
          Seq(0L).toDF("n").unionByName(o.select((col("n") + 1).as("n"))).filter(col("n") <= 20),
          e.select((col("n") + 1).as("n")).filter(col("n") <= 20))
      })
    assert(evens.collect().map(_.getLong(0)).sorted.toSeq == (0L to 20L by 2))
    assert(odds.collect().map(_.getLong(0)).sorted.toSeq == (1L to 20L by 2))
  }

  test("per-binding LetRecLimit freezes one binding while the other continues") {
    val even0 = Seq(0L).toDF("n")
    val odd0 = spark.emptyDataFrame.select(lit(0L).as("n")).limit(0)
    val Seq(evens, odds) = Recursion.mutualFixpoint(
      Seq(even0, odd0),
      { case Seq(e, o) =>
        Seq(
          Seq(0L).toDF("n").unionByName(o.select((col("n") + 1).as("n"))).filter(col("n") <= 20),
          e.select((col("n") + 1).as("n")).filter(col("n") <= 20))
      },
      limits = Seq(Some(Recursion.LetRecLimit(4)), None))
    // evens froze after 4 rounds: {0} ∪ odds≤3 + 1 = {0, 2, 4} at most
    val e = evens.collect().map(_.getLong(0)).sorted.toSeq
    assert(e.max <= 4 && e.contains(0L))
    // odds kept iterating but can only chase the frozen evens one step ahead
    val o = odds.collect().map(_.getLong(0)).sorted.toSeq
    assert(o.max <= e.max + 1)
  }

  test("stepsPerCheck batches rounds but reaches the same fixpoint") {
    val even0 = Seq(0L).toDF("n")
    val odd0 = spark.emptyDataFrame.select(lit(0L).as("n")).limit(0)
    for (k <- Seq(2, 5, 7)) {
      val Seq(evens, odds) = Recursion.mutualFixpoint(
        Seq(even0, odd0),
        { case Seq(e, o) =>
          Seq(
            Seq(0L).toDF("n").unionByName(o.select((col("n") + 1).as("n"))).filter(col("n") <= 20),
            e.select((col("n") + 1).as("n")).filter(col("n") <= 20))
        },
        stepsPerCheck = k)
      assert(evens.collect().map(_.getLong(0)).sorted.toSeq == (0L to 20L by 2), s"k=$k")
      assert(odds.collect().map(_.getLong(0)).sorted.toSeq == (1L to 20L by 2), s"k=$k")
    }
  }

  test("stepsPerCheck > 1 refuses per-binding limits (round accounting)") {
    val base = Seq(0L).toDF("n")
    intercept[IllegalArgumentException] {
      Recursion.mutualFixpoint(Seq(base), { case s => s },
        limits = Seq(Some(Recursion.LetRecLimit(2))), stepsPerCheck = 2)
    }
  }
}
