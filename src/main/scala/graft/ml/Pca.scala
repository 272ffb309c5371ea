package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * whitening / dimensionality-reduction step in front of SemDeDup-style
  * semantic dedup and IVF/PQ indexing (lower-d centroids train faster
  * and quantize better on decorrelated axes).
  *
  * 100 TB shape: the only distributed work is ONE map-side-combined
  * aggregate producing the (count, mean, E[xxᵀ]) moments — a
  * (1 + d + d²)-double buffer per task, independent of row count. The
  * d×d eigendecomposition is driver-local (d ≤ ~1k by contract —
  * 64..4096-dim embeddings are KB..MB-scale matrices), exactly like the
  * IVF centroid trainer; projection is a broadcast-model typed map,
  * one corpus scan, no shuffle.
  */
object Pca {

  /** mean (length d), components (k rows × d, orthonormal, descending
    * eigenvalue order), eigenvalues (length k, population covariance).
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** One-pass moments: buffer = [n, Σx (d), Σ xxᵀ (d², row-major)]. */
  private final class MomentsAgg(dim: Int)
      extends Aggregator[Array[Float], Array[Double], Array[Double]] {
    def zero: Array[Double] = new Array[Double](1 + dim + dim * dim)
    def reduce(b: Array[Double], v: Array[Float]): Array[Double] = {
      require(v.length == dim, s"expected dim $dim, got ${v.length}")
      b(0) += 1.0
      var i = 0
      while (i < dim) {
        val xi = v(i).toDouble
        b(1 + i) += xi
        var j = 0
        val off = 1 + dim + i * dim
        while (j < dim) { b(off + j) += xi * v(j).toDouble; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Array[Double] = b
    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Array[Double]] = bufferEncoder
  }

  /** Raw moments of `vecCol`: [n, Σx…, Σxxᵀ…] as one driver-bounded
    * array (33 KB at d=64; 128 MB at d=4096 — still one row).
    */
  private def moments(df: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(vecCol).cast("array<float>")).as[Array[Float]]
      .select(new MomentsAgg(dim).toColumn)
      .head()
  }

  /** Population covariance matrix as (i, j, cov) rows — the
    * distributed heart of [[fit]] exposed for gating: cov(i,j) =
    * E[xᵢxⱼ] − E[xᵢ]E[xⱼ] off the single one-pass aggregate.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim)
    val cov = covFromMoments(m, dim)
    spark.createDataset(for {
      i <- 0 until dim; j <- 0 until dim
    } yield (i.toLong, j.toLong, cov(i)(j))).toDF("i", "j", "cov")
  }

  private def covFromMoments(m: Array[Double], dim: Int): Array[Array[Double]] = {
    val n = m(0)
    require(n > 0, "Pca: empty input")
    Array.tabulate(dim, dim) { (i, j) =>
      m(1 + dim + i * dim + j) / n - (m(1 + i) / n) * (m(1 + j) / n)
    }
  }

  /** Fit a k-component model: one distributed moments pass + a
    * driver-local cyclic-Jacobi eigendecomposition of the d×d
    * covariance (deterministic — no random init, unlike power
    * iteration; sign fixed so each component's largest-|coordinate|
    * entry is positive).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val m = moments(df, vecCol, dim)
    val n = m(0)
    val mean = Array.tabulate(dim)(i => m(1 + i) / n)
    val (values, vectors) = jacobiEigen(covFromMoments(m, dim))
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, comps, order.map(values).toArray)
  }

  /** Project (idCol, vecCol) rows onto the model's components:
    * proj_c = Σ_d (x_d − μ_d)·v_cd, optionally whitened by
    * 1/√eigenvalue (unit variance per axis). Broadcast model + typed
    * primitive loop — one scan, zero shuffle.
    */
  def project(df: DataFrame, idCol: String, vecCol: String, model: Model,
      whiten: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val scales: Array[Double] =
      if (whiten) model.eigenvalues.map(ev => 1.0 / math.sqrt(math.max(ev, 1e-300)))
      else Array.fill(model.eigenvalues.length)(1.0)
    val bScales = spark.sparkContext.broadcast(scales)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val mdl = bc.value
        val sc = bScales.value
        val k = mdl.components.length
        val out = new Array[Double](k)
        var c = 0
        while (c < k) {
          val comp = mdl.components(c)
          var s = 0.0
          var d = 0
          while (d < comp.length) { s += (v(d) - mdl.mean(d)) * comp(d); d += 1 }
          out(c) = s * sc(c)
          c += 1
        }
        (id, out)
      }
      .toDF(idCol, "proj")
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix V with columns as eigenvectors), unordered.
    * Converges quadratically; sweeps until the off-diagonal Frobenius
    * mass is below 1e-14 of the total, capped at 64 sweeps.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm2: Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val tot = {
      var s = 0.0
      for (i <- 0 until d; j <- 0 until d) s += a(i)(j) * a(i)(j)
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < 64 && offNorm2 / tot > 1e-28) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) { // rotate rows/cols p,q of A
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) { // accumulate V
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
  /** Spectrum-shape diagnostics of the embedding covariance — how
    * many directions carry the variance: participation ratio
    * (Σλ)²/Σλ² (= trace(C)²/‖C‖²_F, eigen-free), effective rank
    * exp(−Σp·ln p) over the normalized spectrum, and the top
    * eigenvalue's share. A 768-dim embedding with effective rank 25
    * wastes storage and breaks isotropy assumptions downstream
    * (whitening/ANN) — this is the read that says so. One moments
    * pass (the [[fit]] aggregate) + driver Jacobi; returns one row
    * (dim, n, trace, participation_ratio, effective_rank,
    * top_share).
    */
  def effectiveRank(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim)
    val n = m(0)
    val cov = covFromMoments(m, dim)
    var trace = 0.0
    var frob2 = 0.0
    var i = 0
    while (i < dim) {
      trace += cov(i)(i)
      var j = 0
      while (j < dim) { frob2 += cov(i)(j) * cov(i)(j); j += 1 }
      i += 1
    }
    val values = jacobiEigen(cov)._1.filter(_ > 0).sorted(
      Ordering.Double.TotalOrdering.reverse)
    val tot = values.sum
    val ent = values.map { v =>
      val p = v / tot
      -p * math.log(p)
    }.sum
    // zero covariance (constant column) has NO variance directions —
    // report NaN like the other spectrum columns, not exp(0) = 1
    val erank = if (values.isEmpty) Double.NaN else math.exp(ent)
    Seq((dim.toLong, n.toLong, trace,
      if (frob2 > 0) trace * trace / frob2 else Double.NaN,
      erank, if (tot > 0) values.head / tot else Double.NaN))
      .toDF("dim", "n", "trace", "participation_ratio",
        "effective_rank", "top_share")
  }
}
