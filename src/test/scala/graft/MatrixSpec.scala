package graft

import graft.matrix.Matrix

/** Golden tests on a small sparse matrix (reference MatrixTest.scala
  * golden-output pattern; graph from tutorial/data/graph.tsv shape).
  */
class MatrixSpec extends SparkSpec {

  private def m(entries: (Long, Long, Double)*): Matrix = {
    import spark.implicits._
    Matrix(entries.toDF("row", "col", "val"))
  }

  private def entriesOf(x: Matrix): Set[(Long, Long, Double)] =
    x.df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  //  A = | 1 2 |      B = | 1 0 |
  //      | 3 4 |          | 0 2 |
  private lazy val a = m((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0))
  private lazy val diag = m((0, 0, 1.0), (1, 1, 2.0))

  test("product") {
    assert(entriesOf(a.product(diag)) ==
      Set((0L, 0L, 1.0), (0L, 1L, 4.0), (1L, 0L, 3.0), (1L, 1L, 8.0)))
    // A * A = | 7 10 ; 15 22 |
    assert(entriesOf(a * a) ==
      Set((0L, 0L, 7.0), (0L, 1L, 10.0), (1L, 0L, 15.0), (1L, 1L, 22.0)))
  }

  test("grammian equals the general A * transpose(A)") {
    assert(entriesOf(a.grammian) == entriesOf(a.product(a.transpose)))
  }

  test("transpose / add / subtract / hadamard") {
    assert(entriesOf(a.transpose) ==
      Set((0L, 0L, 1.0), (1L, 0L, 2.0), (0L, 1L, 3.0), (1L, 1L, 4.0)))
    assert(entriesOf(a + a) ==
      Set((0L, 0L, 2.0), (0L, 1L, 4.0), (1L, 0L, 6.0), (1L, 1L, 8.0)))
    assert(entriesOf((a - a).dropZeros) == Set.empty)
    assert(entriesOf(a.hProd(a)) ==
      Set((0L, 0L, 1.0), (0L, 1L, 4.0), (1L, 0L, 9.0), (1L, 1L, 16.0)))
  }

  test("normalizations") {
    assert(entriesOf(a.rowL1Normalize) == Set(
      (0L, 0L, 1.0 / 3), (0L, 1L, 2.0 / 3),
      (1L, 0L, 3.0 / 7), (1L, 1L, 4.0 / 7)).map {
      case (r, c, v) => (r, c, math.rint(v * 1e9) / 1e9)
    })
    val l2 = entriesOf(a.rowL2Normalize)
    val n0 = math.sqrt(1 + 4)
    assert(l2.contains((0L, 0L, math.rint(1.0 / n0 * 1e9) / 1e9)))
  }

  test("col normalizations, mean centering, moments, mapRows, elemWiseOp") {
    // colL1: col 0 sums |1|+|3|=4, col 1 sums 6
    assert(entriesOf(a.colL1Normalize) == Set(
      (0L, 0L, 0.25), (1L, 0L, 0.75),
      (0L, 1L, math.rint(2.0 / 6 * 1e9) / 1e9),
      (1L, 1L, math.rint(4.0 / 6 * 1e9) / 1e9)))
    // L0: divides by PRESENT entries (3, explicit zero included) and
    // drops exact-zero outputs — reference mapValues{1.0} + product
    // filterOutZeros semantics
    assert(entriesOf(m((0, 0, 2.0), (0, 1, 4.0), (0, 2, 0.0)).rowL0Normalize)
      == Set((0L, 0L, math.rint(2.0 / 3 * 1e9) / 1e9),
        (0L, 1L, math.rint(4.0 / 3 * 1e9) / 1e9)))
    // mean centering over PRESENT entries: row 0 mean 1.5
    assert(entriesOf(a.rowMeanCentering) == Set(
      (0L, 0L, -0.5), (0L, 1L, 0.5), (1L, 0L, -0.5), (1L, 1L, 0.5)))
    // a single-entry row centers to exactly 0.0 and vanishes — the
    // reference's filterOutZeros sparse-zero policy
    assert(entriesOf(m((5, 1, 7.0)).rowMeanCentering).isEmpty)
    // moments: row 0 = (2 entries, mean 1.5, stddev_pop 0.5)
    assert(entriesOf(a.rowSizeAveStdev).filter(_._1 == 0L) == Set(
      (0L, 1L, 2.0), (0L, 2L, 1.5), (0L, 3L, 0.5)))
    // mapRows: keep only the max entry of each row
    val kept = a.mapRows(cells => Seq(cells.maxBy(_._2)))
    assert(entriesOf(kept) == Set((0L, 1L, 2.0), (1L, 1L, 4.0)))
    // elemWiseOp with sparse zeros: disjoint supports add
    val e = m((0, 0, 1.0)).elemWiseOp(m((1, 1, 2.0)))((x, y) => x + y)
    assert(entriesOf(e) == Set((0L, 0L, 1.0), (1L, 1L, 2.0)))
    // topColElems: strongest row per column
    assert(entriesOf(a.topColElems(1)) == Set((1L, 0L, 3.0), (1L, 1L, 4.0)))
  }

  test("topRowElems / diagonal / trace") {
    assert(entriesOf(a.topRowElems(1)) ==
      Set((0L, 1L, 2.0), (1L, 1L, 4.0)))
    assert(entriesOf(a.diagonal) == Set((0L, 0L, 1.0), (1L, 1L, 4.0)))
    assert(a.trace.collect().head.getDouble(0) == 5.0)
  }

  test("element/row/col set ops preserve reference semantics") {
    val keep = m((0, 0, 9.0), (1, 1, 9.0))
    assert(entriesOf(a.keepElementsBy(keep)) ==
      Set((0L, 0L, 1.0), (1L, 1L, 4.0)))
    assert(entriesOf(a.removeElementsBy(keep)) ==
      Set((0L, 1L, 2.0), (1L, 0L, 3.0)))
    import spark.implicits._
    val rows = Seq(0L).toDF("row")
    assert(entriesOf(a.keepRowsBy(rows)) == Set((0L, 0L, 1.0), (0L, 1L, 2.0)))
    assert(entriesOf(a.removeRowsBy(rows)) == Set((1L, 0L, 3.0), (1L, 1L, 4.0)))
  }

  test("mapWithIndex / reduce vectors / total sum / nonZerosWith / inverse") {
    import org.apache.spark.sql.functions._
    // keep the strict upper triangle; produced zeros drop
    assert(entriesOf(a.mapWithIndex((v, r, c) =>
      when(r < c, v).otherwise(0.0))) == Set((0L, 1L, 2.0)))
    // column-wise max folded into a row vector; row-wise min into a col
    assert(a.reduceRowVectors(max).df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(0L -> 3.0, 1L -> 4.0))
    assert(a.reduceColVectors(min).df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(0L -> 1.0, 1L -> 3.0))
    assert(a.sum_.collect().head.getDouble(0) == 10.0)
    // normalize by the total via the broadcast-scalar zip
    assert(entriesOf(a.nonZerosWith(a.sum_)((v, s) => v / s)) ==
      Set((0L, 0L, 0.1), (0L, 1L, 0.2), (1L, 0L, 0.3), (1L, 1L, 0.4)))
    // D^-1 * D = I on the present diagonal
    val dVec = graft.matrix.ColVector(
      diag.df.filter(col("row") === col("col"))
        .select(col("row").as("idx"), col("val")))
    assert(entriesOf(dVec.inverse.diag * diag) ==
      Set((0L, 0L, 1.0), (1L, 1L, 1.0)))
  }

  test("propagate pushes labels along edges") {
    import spark.implicits._
    // graph 1->2, 1->3, 3->2 with unit weights; labels: node 1 = 5, node 3 = 7
    val g = m((1, 2, 1.0), (1, 3, 1.0), (3, 2, 1.0))
    val labels = Seq((1L, 5.0), (3L, 7.0)).toDF("row", "val")
    val out = g.propagate(labels).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(2L -> 12.0, 3L -> 5.0))
  }

  test("row/col vectors: products, dot, outer, diag") {
    import graft.matrix.{ColVector, RowVector, Vectors}
    val v = RowVector(Vectors.fromSeq(spark, Seq((0L, 1.0), (1L, 2.0))))
    // v * A = (1*1+2*3, 1*2+2*4) = (7, 10)
    val vA = (v * a).df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vA == Map(0L -> 7.0, 1L -> 10.0))
    // A * v (as column) = (1*1+2*2, 3*1+4*2) = (5, 11)
    val cv = ColVector(Vectors.fromSeq(spark, Seq((0L, 1.0), (1L, 2.0))))
    val Av = cv.leftMultiply(a).df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Av == Map(0L -> 5.0, 1L -> 11.0))
    // dot = 1*1 + 2*2 = 5
    assert(v.dot(cv).collect().head.getDouble(0) == 5.0)
    // outer product is rank-1
    assert(cv.outer(v).df.count() == 4)
    // diag embeds on the diagonal
    assert(entriesOf(v.diag) == Set((0L, 0L, 1.0), (1L, 1L, 2.0)))
    // row extraction round-trip
    assert(Vectors.rowOf(a, 1L).df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap == Map(0L -> 3.0, 1L -> 4.0))
  }

  test("DIMSUM sampled cosine: exact when t covers norms, close when sampling") {
    import spark.implicits._
    // two 400-entry unit rows overlapping on 200 columns (cos = 0.5),
    // plus a light 3-entry row that must never be sampled
    val entries =
      (0 until 400).map(c => (1L, c.toLong, 1.0)) ++
        (200 until 600).map(c => (2L, c.toLong, 1.0)) ++
        Seq((3L, 0L, 1.0), (3L, 1L, 1.0), (3L, 200L, 1.0))
    val mat = Matrix(entries.toDF("row", "col", "val"))
    val exact = mat.rowCosineSimilarity.df
      .filter($"row" < $"col").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // t >= every norm (max norm = 20): no entry sampled away, the
    // estimate IS the exact cosine matrix
    val full = mat.rowCosineDimsum(t = 25.0).df
      .filter($"row" < $"col").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exact.foreach { case (k, v) => assert(math.abs(full(k) - v) < 1e-9) }

    // t = 10: heavy rows thinned to p = 0.5 — sampling really drops
    // entries, light row untouched, estimates stay close
    val sampled = mat.dimsumSample(t = 10.0).df
    assert(sampled.count() < entries.size)
    assert(sampled.filter($"row" === 3L).count() == 3)
    val est = mat.rowCosineDimsum(t = 10.0).df
      .filter($"row" === 1L && $"col" === 2L).collect()
    assert(est.nonEmpty)
    assert(math.abs(est.head.getDouble(2) - exact((1L, 2L))) < 0.25,
      s"estimate ${est.head.getDouble(2)} too far from ${exact((1L, 2L))}")
  }

  test("pagerank converges on a small graph (iterative driver loop)") {
    import spark.implicits._
    // reference examples/PageRank.scala semantics: damping 0.85
    val edges = m((1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)).rowL1Normalize
    var ranks = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0)).toDF("row", "val")
    (1 to 10).foreach { _ =>
      ranks = edges.propagate(ranks)
        .select(org.apache.spark.sql.functions.col("row"),
          (org.apache.spark.sql.functions.col("val") * 0.85 + 0.15).as("val"))
      ranks.persist()
    }
    val r = ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // symmetric cycle ⇒ all ranks equal 1.0
    assert(r.values.forall(v => math.abs(v - 1.0) < 1e-6), r.toString)
  }

  test("topSingularVector matches a driver-side power iteration exactly and SVD approximately") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val cells = for {
      r <- 0L until 30L; c <- 0L until 8L
      if rnd.nextDouble() < 0.5
    } yield (r, c, rnd.nextDouble() * 4 - 1)
    val m = Matrix.fromCoo(cells.toDF("row", "col", "val"),
      "row", "col", "val")
    val (vDf, sigma) = m.topSingularVector(iters = 40)
    val got = vDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // driver replay: dense power iteration on A^T A
    val a = Array.ofDim[Double](30, 8)
    cells.foreach { case (r, c, v) => a(r.toInt)(c.toInt) = v }
    var v = Array.fill(8)(1.0)
    var lam = 0.0
    for (_ <- 0 until 40) {
      val w = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      val u = (0 until 8).map(c => a.indices.map(r => a(r)(c) * w(r)).sum)
        .toArray
      lam = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / lam)
    }
    (0 until 8).foreach { c =>
      assert(math.abs(got.getOrElse(c.toLong, 0.0) - v(c)) < 1e-9, s"col $c")
    }
    assert(math.abs(sigma - math.sqrt(lam)) < 1e-9)
    // Rayleigh check: ||A v|| achieves sigma (within convergence slack)
    val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
    assert(math.abs(math.sqrt(av.map(x => x * x).sum) - sigma) < 1e-6)
    // unit norm
    assert(math.abs(got.values.map(x => x * x).sum - 1.0) < 1e-9)
  }
}
