package graft.core

/** Command-line argument parser — rebuild of scalding-args
  * (`Args.scala:23-147`): `--key v1 v2 --flag` tokens into
  * key → value-list, positional args under "".
  */
final class Args(val m: Map[String, List[String]]) extends Serializable {

  /** Required single value (Args.apply/required). */
  def apply(key: String): String = required(key)

  def required(key: String): String = m.get(key) match {
    case Some(List(v)) => v
    case Some(Nil) | None => sys.error(s"Please provide a value for --$key")
    case Some(vs) => sys.error(s"Please only provide a single value for --$key (got $vs)")
  }

  def optional(key: String): Option[String] = m.get(key) match {
    case Some(List(v)) => Some(v)
    case Some(Nil) | None => None
    case Some(vs) => sys.error(s"Please only provide a single value for --$key (got $vs)")
  }

  def list(key: String): List[String] = m.getOrElse(key, Nil)

  /** Flag presence (`--verbose`). */
  def boolean(key: String): Boolean = m.contains(key)

  def getOrElse(key: String, default: String): String =
    optional(key).getOrElse(default)

  def positional: List[String] = m.getOrElse("", Nil)

  def int(key: String): Int = required(key).toInt
  def long(key: String): Long = required(key).toLong
  def double(key: String): Double = required(key).toDouble

  def +(kv: (String, Iterable[String])): Args =
    new Args(m + (kv._1 -> kv._2.toList))

  override def toString: String = m.toSeq.sortBy(_._1).map {
    case ("", vs) => vs.mkString(" ")
    case (k, Nil) => s"--$k"
    case (k, vs) => s"--$k ${vs.mkString(" ")}"
  }.mkString(" ")

  override def equals(other: Any): Boolean = other match {
    case a: Args => a.m == m
    case _ => false
  }
  override def hashCode: Int = m.hashCode
}

/** Validated inclusive range parsed from an argument — rebuild of
  * scalding-args `Range[T]` (RangedArgs.scala:23-46; renamed to avoid
  * shadowing scala.Range). Construction asserts lower ≤ upper; the
  * bound assertions are the reference's job-submission guards.
  */
final case class ArgRange[T](lower: T, upper: T)(
    implicit ord: Ordering[T]) {
  require(ord.lteq(lower, upper), s"Bad range: $lower > $upper")

  def assertLowerBound(min: T): Unit =
    require(ord.lteq(min, lower), s"Range out of bounds: $lower < $min")

  def assertUpperBound(max: T): Unit =
    require(ord.gteq(max, upper), s"Range out of bounds: $upper > $max")

  def assertBounds(min: T, max: T): Unit = {
    assertLowerBound(min)
    assertUpperBound(max)
  }

  /** "lo<sep>hi", collapsed to one value when degenerate
    * (RangedArgs.scala:39-45).
    */
  def mkString(sep: String): String =
    if (ord.equiv(lower, upper)) lower.toString
    else s"$lower$sep$upper"
}

/** `args.range("date")(parse)` — one value makes a point range, two
  * make an interval, anything else is rejected (reference
  * `RangedArgs`, RangedArgs.scala:48-57; here an implicit extension
  * on [[Args]] via `import graft.core.RangedArgs._`).
  */
object RangedArgs {
  implicit class Ranged(val args: Args) extends AnyVal {
    def range[T](argName: String)(cnv: String => T)(
        implicit ord: Ordering[T]): ArgRange[T] =
      args.list(argName) match {
        case List(v) => ArgRange(cnv(v), cnv(v))
        case List(v1, v2) => ArgRange(cnv(v1), cnv(v2))
        case other => throw new IllegalArgumentException(
          s"--$argName must have either 1 or 2 values specified " +
            s"(got ${other.size})")
      }
  }
}

object Args {
  /** Tokenize: values attach to the most recent `--key`; a bare `-x`
    * where x is not a number is also a key (reference Args.scala:35-54
    * treats `-` keys; negative numbers stay values).
    */
  def apply(argv: Iterable[String]): Args = {
    val keyRe = "^--?([^-\\d][^\\s]*)$".r
    var current = ""
    val acc = scala.collection.mutable.Map[String, List[String]]("" -> Nil)
    argv.foreach {
      case keyRe(k) =>
        current = k
        if (!acc.contains(k)) acc(k) = Nil
      case v =>
        acc(current) = acc.getOrElse(current, Nil) :+ v
    }
    new Args(acc.toMap.filter { case (k, v) => k.nonEmpty || v.nonEmpty }
      .withDefaultValue(Nil))
  }

  def apply(argLine: String): Args =
    apply(argLine.split("\\s+").filter(_.nonEmpty).toSeq)
}
