package graft.matrix

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Combination/permutation streams as DataFrames — rebuild of the
  * reference's `mathematics/Combinatorics.scala:46-219` (which
  * enumerated C(n,k)/P(n,k) tuples as pipes, and knapsack-style
  * weighted sums).
  *
  * Generated distributively from `spark.range` self-joins, so large n
  * fan out across the cluster instead of a driver loop.
  */
object Combinatorics {

  /** All k-combinations of 1..n (ascending tuples), one row per
    * combination, columns c1..ck.
    */
  def combinations(spark: SparkSession, n: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= n)
    val base = spark.range(1, n + 1).toDF("c1")
    (2 to k).foldLeft(base) { (acc, i) =>
      acc.join(spark.range(1, n + 1).toDF(s"c$i"),
        col(s"c${i - 1}") < col(s"c$i"))
    }
  }

  /** All k-permutations of 1..n. */
  def permutations(spark: SparkSession, n: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= n)
    val base = spark.range(1, n + 1).toDF("c1")
    (2 to k).foldLeft(base) { (acc, i) =>
      val cond = (1 until i)
        .map(j => col(s"c$j") =!= col(s"c$i"))
        .reduce(_ && _)
      acc.join(spark.range(1, n + 1).toDF(s"c$i"), cond)
    }
  }

  /** Non-negative integer solutions of Σ xᵢ·wᵢ = target (bounded
    * enumeration — the reference's `weightedSum`,
    * Combinatorics.scala:170-219).
    */
  def weightedSum(spark: SparkSession, weights: Seq[Long], target: Long): DataFrame = {
    require(weights.nonEmpty)
    val k = weights.size
    val base = spark.range(0, target / weights.head + 1).toDF("x1")
    val joined = (2 to k).foldLeft(base) { (acc, i) =>
      acc.crossJoin(spark.range(0, target / weights(i - 1) + 1).toDF(s"x$i"))
    }
    val total = (1 to k).map(i => col(s"x$i") * weights(i - 1))
      .reduce(_ + _)
    joined.filter(total === target)
  }

  /** Strictly-positive variant (`positiveWeightedSum`). */
  def positiveWeightedSum(spark: SparkSession, weights: Seq[Long],
      target: Long): DataFrame = {
    val all = weightedSum(spark, weights, target)
    val positive = (1 to weights.size).map(i => col(s"x$i") > 0).reduce(_ && _)
    all.filter(positive)
  }
}
