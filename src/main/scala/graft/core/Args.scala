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
