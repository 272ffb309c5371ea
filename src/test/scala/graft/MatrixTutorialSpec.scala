package graft

import org.apache.spark.sql.DataFrame
import graft.examples.MatrixTutorials
import graft.matrix.Matrix

/** The reference's seven matrix tutorials
  * (tutorial/MatrixTutorial0-6.scala) against hand-computed golden
  * outputs on the reference's own tutorial/data fixtures
  * (graph.tsv, graph2.tsv, docBOW.tsv).
  */
class MatrixTutorialSpec extends SparkSpec {

  import spark.implicits._

  // tutorial/data/graph.tsv
  private def graph: Matrix = Matrix.fromCoo(
    Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (3L, 2L, 1.0), (4L, 2L, 2.0))
      .toDF("row", "col", "val"), "row", "col", "val")

  // tutorial/data/graph2.tsv
  private def graph2: Matrix = Matrix.fromCoo(
    Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
      .toDF("row", "col", "val"), "row", "col", "val")

  private def cells(m: Matrix): Map[(Long, Long), Double] =
    m.df.as[(Long, Long, Double)].collect()
      .map { case (r, c, v) => (r, c) -> v }.toMap

  private def approx(got: Map[(Long, Long), Double],
      want: Map[(Long, Long), Double]): Unit = {
    assert(got.keySet == want.keySet, s"cells: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (k, v) =>
      assert(got(k) == v || math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} vs $v")
    }
  }

  test("tutorial 0: out-degree of each node") {
    val got = MatrixTutorials.outDegree(graph).df
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 2.0, 3L -> 1.0, 4L -> 2.0))
  }

  test("tutorial 1: co-follows = A * Aᵀ") {
    approx(cells(MatrixTutorials.cofollows(graph)), Map(
      (1L, 1L) -> 2.0, (1L, 3L) -> 1.0, (1L, 4L) -> 2.0,
      (3L, 1L) -> 1.0, (3L, 3L) -> 1.0, (3L, 4L) -> 2.0,
      (4L, 1L) -> 2.0, (4L, 3L) -> 2.0, (4L, 4L) -> 4.0))
  }

  test("tutorial 2: keep rows with out-degree under the cap") {
    approx(cells(MatrixTutorials.filterByOutDegree(graph, 2.0)),
      Map((3L, 2L) -> 1.0))
  }

  test("tutorial 3: graph intersection and both differences") {
    val (inter, leftDiff, rightDiff) =
      MatrixTutorials.intersection(graph, graph2)
    approx(cells(inter), Map((1L, 2L) -> 1.0, (1L, 3L) -> 1.0))
    approx(cells(leftDiff), Map((3L, 2L) -> 1.0, (4L, 2L) -> 2.0))
    approx(cells(rightDiff), Map((2L, 3L) -> 1.0))
  }

  test("tutorial 4: cosine similarity of row pairs") {
    val s = 1.0 / math.sqrt(2.0)
    approx(cells(MatrixTutorials.cosineSimilarity(graph)), Map(
      (1L, 1L) -> 1.0, (1L, 3L) -> s, (1L, 4L) -> s,
      (3L, 1L) -> s, (3L, 3L) -> 1.0, (3L, 4L) -> 1.0,
      (4L, 1L) -> s, (4L, 3L) -> 1.0, (4L, 4L) -> 1.0))
  }

  test("tutorial 5: jaccard similarity (reference arithmetic, directed-graph quirks included)") {
    val inf = Double.PositiveInfinity
    approx(cells(MatrixTutorials.jaccardSimilarity(graph)), Map(
      (1L, 1L) -> inf, (1L, 3L) -> 0.5, (1L, 4L) -> 1.0,
      (3L, 1L) -> inf, (3L, 3L) -> 1.0, (3L, 4L) -> inf,
      (4L, 1L) -> inf, (4L, 3L) -> 1.0, (4L, 4L) -> inf))
  }

  test("tutorial 6: per-document top TF-IDF terms") {
    // tutorial/data/docBOW.tsv
    val docWord = Matrix.fromCoo(
      Seq((1L, "hello", 2.0), (1L, "twitter", 1.0),
        (2L, "conversation", 1.0), (2L, "celebrities", 1.0),
        (2L, "twitter", 1.0),
        (3L, "elections", 1.0), (3L, "debate", 1.0),
        (3L, "twitter", 1.0), (3L, "political", 1.0))
        .toDF("row", "col", "val"), "row", "col", "val")

    val got = MatrixTutorials.tfIdf(docWord, nrWords = 3).df
      .as[(Long, String, Double)].collect()
      .map { case (r, c, v) => (r, c) -> v }.toMap

    // df-sum L1 norm = 9; idf(w) = log2(9 / df(w))
    val log2_9 = math.log(9.0) / math.log(2.0)
    val log2_3 = math.log(3.0) / math.log(2.0)
    val want = Map(
      (1L, "hello") -> 2.0 * log2_9, (1L, "twitter") -> log2_3,
      (2L, "conversation") -> log2_9, (2L, "celebrities") -> log2_9,
      (2L, "twitter") -> log2_3,
      // doc 3 has three equal-idf singleton terms + twitter; top-3 by
      // (value desc, term asc) keeps debate, elections, political
      (3L, "debate") -> log2_9, (3L, "elections") -> log2_9,
      (3L, "political") -> log2_9)
    assert(got.keySet == want.keySet, s"${got.keySet} vs ${want.keySet}")
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} vs $v")
    }
  }
}
