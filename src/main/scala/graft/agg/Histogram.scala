package graft.agg

import scala.collection.immutable.SortedMap

/** Client-side histogram statistics — port of the reference's
  * `mathematics/Histogram.scala:3-47` surface (the distributed part is
  * a `groupBy(floor(x/w)*w).count`; this class consumes the collected
  * bin→count map on the driver, exactly like the reference).
  */
final case class Histogram(binWidth: Double, bins: SortedMap[Double, Long]) {

  lazy val total: Long = bins.values.sum

  def min: Double = bins.firstKey
  def max: Double = bins.lastKey

  def mean: Double =
    if (total == 0) Double.NaN
    else bins.iterator.map { case (b, c) => b * c }.sum / total

  def stdDev: Double = {
    if (total == 0) return Double.NaN
    val mu = mean
    math.sqrt(bins.iterator.map { case (b, c) => (b - mu) * (b - mu) * c }.sum / total)
  }

  /** Cumulative distribution at each bin boundary. */
  def cdf: Seq[(Double, Double)] = {
    var acc = 0L
    bins.toSeq.map { case (b, c) =>
      acc += c
      (b, acc.toDouble / total)
    }
  }

  /** Value at or below which `q` (0..1) of the mass sits. */
  def percentile(q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    val target = q * total
    var acc = 0L
    bins.iterator.foreach { case (b, c) =>
      acc += c
      if (acc >= target) return b
    }
    max
  }

  def median: Double = percentile(0.5)

  /** Gini-style concentration profile (the reference's `lorenz`). */
  def lorenz: Seq[(Double, Double)] = {
    var cnt = 0L
    var mass = 0.0
    val totalMass = bins.iterator.map { case (b, c) => b * c }.sum
    bins.toSeq.map { case (b, c) =>
      cnt += c
      mass += b * c
      (cnt.toDouble / total, if (totalMass == 0) 0.0 else mass / totalMass)
    }
  }
}

object Histogram {
  /** Build from collected (bin, count) rows. */
  def apply(binWidth: Double, rows: Seq[(Double, Long)]): Histogram =
    Histogram(binWidth, SortedMap(rows: _*))
}
