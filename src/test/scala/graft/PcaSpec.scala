package graft

import graft.ml.Pca

/** PCA: Jacobi eigensolver against algebraic invariants, the
  * distributed moments/covariance pass against a driver brute-force
  * replay, and the projection/whitening contracts (projected variance
  * = eigenvalue; whitened variance = 1).
  */
class PcaSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  private val d = 6
  // anisotropic cloud: x0 dominates, x1 correlated with x0, rest noise
  private lazy val data: Seq[Array[Float]] = (1 to 400).map { _ =>
    val t = rnd.nextGaussian()
    val a = Array.fill(d)(rnd.nextGaussian() * 0.1)
    a(0) += (3.0 * t).toFloat.toDouble
    a(1) += (1.5 * t).toFloat.toDouble
    a.map(_.toFloat)
  }

  private lazy val df = {
    import spark.implicits._
    data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
  }

  private def bruteCov: Array[Array[Double]] = {
    val n = data.size
    val mean = Array.tabulate(d)(i => data.map(_(i).toDouble).sum / n)
    Array.tabulate(d, d) { (i, j) =>
      data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
  }

  test("distributed covariance equals the driver brute-force replay") {
    val got = Pca.covarianceMatrix(df, "vec", d)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    val want = bruteCov
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(got((i, j)) - want(i)(j)) < 1e-9,
        s"cov($i,$j): ${got((i, j))} vs ${want(i)(j)}")
  }

  test("jacobiEigen solves A v = lambda v with orthonormal vectors") {
    val a = bruteCov
    val (values, vectors) = Pca.jacobiEigen(a)
    // residual per eigenpair
    for (c <- 0 until d) {
      val v = Array.tabulate(d)(r => vectors(r)(c))
      val av = Array.tabulate(d)(r => (0 until d).map(k => a(r)(k) * v(k)).sum)
      val res = math.sqrt((0 until d).map(r => math.pow(av(r) - values(c) * v(r), 2)).sum)
      assert(res < 1e-10, s"eigenpair $c residual $res")
    }
    // orthonormality
    for (c1 <- 0 until d; c2 <- c1 until d) {
      val dot = (0 until d).map(r => vectors(r)(c1) * vectors(r)(c2)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10)
    }
    // trace preserved
    val traceA = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(values.sum - traceA) < 1e-10)
  }

  test("fit orders components by descending eigenvalue and finds the planted axis") {
    val model = Pca.fit(df, "vec", d, 3)
    assert(model.eigenvalues(0) >= model.eigenvalues(1) &&
      model.eigenvalues(1) >= model.eigenvalues(2))
    // the dominant component points along the planted (3, 1.5, 0...) direction
    val c0 = model.components(0)
    val planted = Array(3.0, 1.5) ++ Array.fill(d - 2)(0.0)
    val nPlanted = math.sqrt(planted.map(x => x * x).sum)
    val cosAlign = (0 until d).map(i => c0(i) * planted(i) / nPlanted).sum
    assert(math.abs(cosAlign) > 0.99, s"alignment ${cosAlign}")
    // variance of the cloud along c0 must dominate: lambda0 ≈ 3²+1.5² + noise
    assert(model.eigenvalues(0) > 10.0 && model.eigenvalues(0) < 13.0)
  }

  test("projected variance equals the eigenvalue; whitening normalizes it") {
    val model = Pca.fit(df, "vec", d, 2)
    def variances(whiten: Boolean): Array[Double] = {
      val rows = Pca.project(df, "id", "vec", model, whiten)
        .collect().map(_.getSeq[Double](1).toArray)
      Array.tabulate(2) { c =>
        val xs = rows.map(_(c))
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }
    }
    val raw = variances(whiten = false)
    for (c <- 0 until 2)
      assert(math.abs(raw(c) - model.eigenvalues(c)) < 1e-9 * math.max(1, model.eigenvalues(c)))
    val white = variances(whiten = true)
    for (c <- 0 until 2) assert(math.abs(white(c) - 1.0) < 1e-9)
  }

  test("component sign is deterministic (largest-|coordinate| entry positive)") {
    val m1 = Pca.fit(df, "vec", d, 3)
    val m2 = Pca.fit(df, "vec", d, 3)
    for (c <- 0 until 3) {
      assert(m1.components(c).toSeq == m2.components(c).toSeq)
      val pivot = m1.components(c).indices.maxBy(i => math.abs(m1.components(c)(i)))
      assert(m1.components(c)(pivot) > 0)
    }
  }
}
