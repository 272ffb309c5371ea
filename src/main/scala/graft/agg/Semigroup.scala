package graft.agg

/** Minimal algebraic typeclasses powering generic aggregation — the
  * rebuild of the reference's algebird-based `sum[T: Semigroup]` /
  * `mapReduceMap` design (ReduceOperations.scala:46-62,327-352).
  * Fresh implementation of the standard algebra (public concepts).
  */
trait Semigroup[T] extends Serializable {
  def plus(a: T, b: T): T
}

trait Monoid[T] extends Semigroup[T] {
  def zero: T
}

object Monoid {
  def apply[T](implicit m: Monoid[T]): Monoid[T] = m

  def from[T](z: T)(p: (T, T) => T): Monoid[T] = new Monoid[T] {
    def zero: T = z
    def plus(a: T, b: T): T = p(a, b)
  }

  implicit val intMonoid: Monoid[Int] = from(0)(_ + _)
  implicit val longMonoid: Monoid[Long] = from(0L)(_ + _)
  implicit val doubleMonoid: Monoid[Double] = from(0.0)(_ + _)
  implicit val floatMonoid: Monoid[Float] = from(0.0f)(_ + _)
  implicit val stringMonoid: Monoid[String] = from("")(_ + _)
  implicit val boolOrMonoid: Monoid[Boolean] = from(false)(_ || _)

  implicit def listMonoid[T]: Monoid[List[T]] = from(List.empty[T])(_ ::: _)
  implicit def vectorMonoid[T]: Monoid[Vector[T]] = from(Vector.empty[T])(_ ++ _)
  implicit def setMonoid[T]: Monoid[Set[T]] = from(Set.empty[T])(_ ++ _)

  /** Map union with value-wise semigroup merge — the workhorse behind
    * word-count-as-sum and `writeIncremental` store merges
    * (VersionedKeyValSource.scala:163-210).
    */
  implicit def mapMonoid[K, V](implicit vs: Semigroup[V]): Monoid[Map[K, V]] =
    from(Map.empty[K, V]) { (a, b) =>
      b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, acc.get(k).map(vs.plus(_, v)).getOrElse(v))
      }
    }

  implicit def optionMonoid[T](implicit s: Semigroup[T]): Monoid[Option[T]] =
    from(Option.empty[T]) {
      case (None, b) => b
      case (a, None) => a
      case (Some(a), Some(b)) => Some(s.plus(a, b))
    }

  implicit def tuple2Monoid[A, B](implicit ma: Monoid[A], mb: Monoid[B]): Monoid[(A, B)] =
    from((ma.zero, mb.zero)) { (x, y) => (ma.plus(x._1, y._1), mb.plus(x._2, y._2)) }

  implicit def tuple3Monoid[A, B, C](implicit
      ma: Monoid[A], mb: Monoid[B], mc: Monoid[C]): Monoid[(A, B, C)] =
    from((ma.zero, mb.zero, mc.zero)) { (x, y) =>
      (ma.plus(x._1, y._1), mb.plus(x._2, y._2), mc.plus(x._3, y._3))
    }

  /** Multiplicative monoids, for `times[T: Ring]`
    * (ReduceOperations.scala:357-370).
    */
  def product[T](implicit num: Numeric[T]): Monoid[T] =
    from(num.one)(num.times)
}

object Semigroup {
  def apply[T](implicit s: Semigroup[T]): Semigroup[T] = s
  def from[T](p: (T, T) => T): Semigroup[T] = (a: T, b: T) => p(a, b)

  implicit def fromMonoid[T](implicit m: Monoid[T]): Semigroup[T] = m

  def min[T](implicit ord: Ordering[T]): Semigroup[T] = from(ord.min)
  def max[T](implicit ord: Ordering[T]): Semigroup[T] = from(ord.max)
}
