package graft

import org.apache.spark.sql.functions._
import graft.examples.{WeightedPageRank, WeightedPageRankFromMatrix}
import graft.matrix.{ColVector, Matrix}

/** Golden-value parity with the reference's two weighted-PageRank
  * jobs: the adjacency-list form (WeightedPageRankTest.scala:20-53)
  * and the Matrix-API form
  * (examples/WeightedPageRankFromMatrixTest.scala:28-105, whose
  * expected ranks come from the Octave reference in that file).
  */
class WeightedPageRankSpec extends SparkSpec {

  test("weighted iteration reproduces the reference golden ranks") {
    import spark.implicits._
    // reference fixture: nodes (src, dsts, weights, prior), ranks_0
    val nodes = Seq(
      (1L, Seq(2L, 3L), Seq(1.0, 2.0), 0.26),
      (2L, Seq(3L), Seq(1.0), 0.54),
      (3L, Seq.empty[Long], Seq.empty[Double], 0.2))
      .toDF("src_id", "dst_ids", "weights", "mass_prior")
    val ranks = Seq((1L, 0.086), (2L, 0.192), (3L, 0.722))
      .toDF("src_id", "mass_input")

    val out = WeightedPageRank.iterate(nodes, ranks, alpha = 0.1,
      weighted = true, numNodes = 3L)
    val pr = out.select("src_id", "mass_n").as[(Long, Double)]
      .collect().toMap

    // expected per the reference test: deadMass + userMass + massNext
    val deadMass = 0.722 / 3 * 0.9
    val userMass = Seq(0.26, 0.54, 0.2).map(_ * 0.1)
    val massNext = Seq(0.0, 0.086 / 3, 0.086 * 2 / 3 + 0.192).map(_ * 0.9)
    val expected = userMass.zip(massNext).map { case (u, m) => u + m + deadMass }

    assert(math.abs(pr(1L) + pr(2L) + pr(3L) - 1.0) < 0.001)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(math.abs(pr(i + 1L) - e) < 0.001, s"node ${i + 1}: ${pr(i + 1L)} vs $e")
    }
    val expectedDiff = (0.722 - 0.461) + (0.2964 - 0.192) + (0.2426 - 0.086)
    assert(math.abs(WeightedPageRank.totalDiff(out) - expectedDiff) < 0.001)
  }

  test("unweighted iteration distributes mass by out-degree") {
    import spark.implicits._
    val nodes = Seq(
      (1L, Seq(2L, 3L), Seq(1.0, 2.0), 0.26),
      (2L, Seq(3L), Seq(1.0), 0.54),
      (3L, Seq.empty[Long], Seq.empty[Double], 0.2))
      .toDF("src_id", "dst_ids", "weights", "mass_prior")
    val ranks = Seq((1L, 0.086), (2L, 0.192), (3L, 0.722))
      .toDF("src_id", "mass_input")
    val pr = WeightedPageRank.iterate(nodes, ranks, alpha = 0.1,
        weighted = false, numNodes = 3L)
      .select("src_id", "mass_n").as[(Long, Double)].collect().toMap
    val deadMass = 0.722 / 3 * 0.9
    // node 2 receives 0.086/2, node 3 receives 0.086/2 + 0.192
    assert(math.abs(pr(2L) - (0.54 * 0.1 + 0.086 / 2 * 0.9 + deadMass)) < 1e-9)
    assert(math.abs(pr(3L) - (0.2 * 0.1 + (0.086 / 2 + 0.192) * 0.9 + deadMass)) < 1e-9)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("matrix-form iteration matches the reference Octave solution") {
    import spark.implicits._
    // the Wikipedia 5-node graph of WeightedPageRankFromMatrixTest
    val edges = Seq(
      (0L, 4L, 1.0),
      (1L, 0L, 0.5),
      (2L, 0L, 0.5),
      (3L, 1L, 1.0),
      (3L, 2L, 0.5),
      (4L, 2L, 0.5),
      (4L, 3L, 1.0)).toDF("row", "col", "val")
    val d = 0.4
    val n = 5L
    val a = Matrix.fromCoo(edges, "row", "col", "val")
    val mHat = WeightedPageRankFromMatrix.mHat(a, d)

    // M_hat golden entries from the reference test
    val mh = mHat.df.as[(Long, Long, Double)].collect()
      .map { case (r, c, v) => (r, c) -> v }.toMap
    assert(mh.size == 7)
    assert(math.abs(mh((0L, 1L)) - 0.4) < 1e-9)
    assert(math.abs(mh((0L, 2L)) - 0.4) < 1e-9)
    assert(math.abs(mh((1L, 3L)) - 0.26666) < 1e-5)
    assert(math.abs(mh((2L, 3L)) - 0.13333) < 1e-5)
    assert(math.abs(mh((2L, 4L)) - 0.13333) < 1e-5)
    assert(math.abs(mh((3L, 4L)) - 0.26666) < 1e-5)
    assert(math.abs(mh((4L, 0L)) - 0.4) < 1e-9)

    val nodes = spark.range(n).select(col("id").as("idx"))
    val prior = WeightedPageRankFromMatrix.priorVector(nodes, d, n)
    assert(prior.df.select(Matrix.V).as[Double].collect()
      .forall(v => math.abs(v - (1 - d) / n) < 1e-12))

    val r0 = ColVector(nodes.select(col("idx"), lit(1.0 / n).as(Matrix.V)))
    val r1 = WeightedPageRankFromMatrix.iterate(mHat, r0, prior)
    val ranks = r1.df.select(col("idx"), col(Matrix.V))
      .as[(Long, Double)].collect().toMap
    val expected = Seq(0.28, 0.173333, 0.173333, 0.173333, 0.2)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(math.abs(ranks(i.toLong) - e) < 1e-5, s"node $i: ${ranks(i.toLong)} vs $e")
    }
    val expectedDiff = expected.map(e => math.abs(e - 0.2)).sum
    assert(math.abs(WeightedPageRankFromMatrix.diff(r0, r1) - expectedDiff) < 1e-5)
  }
}
