package graft.core

/** Friendly exception-to-message mapping for [[Tool]] failures —
  * rebuild of the reference's `XHandler`/`RichXHandler`
  * (XHandler.scala:10-49): a Class→message map with a default,
  * `handlers` as class-equality predicates, applied at the tool
  * boundary so a wall of stack trace starts with a one-line GUESS a
  * user can act on. The Cascading-era entries map to their Spark
  * equivalents (PlannerException/"requires sinks" has no analogue —
  * Spark plans lazily; AnalysisException is where unresolved
  * sources/columns surface instead).
  */
final class XHandler(
    val xMap: Map[Class[_ <: Throwable], String], dVal: String) {

  def handlers: List[Throwable => Boolean] =
    xMap.keys.map(kCls => (t: Throwable) => kCls == t.getClass).toList

  def mapping: Class[_ <: Throwable] => String = xMap.withDefaultValue(dVal)

  /** Walks the cause chain so a wrapped root cause (Spark wraps user
    * exceptions liberally) still finds its mapping, and matches
    * subclasses (Spark throws AnalysisException SUBTYPES); falls back
    * to the default value.
    */
  def messageFor(t: Throwable): String = {
    var cur: Throwable = t
    var seen = List.empty[Throwable]
    while (cur != null && !seen.contains(cur)) {
      val hit = xMap.find(_._1.isAssignableFrom(cur.getClass))
      if (hit.isDefined) return hit.get._2
      seen ::= cur
      cur = cur.getCause
    }
    dVal
  }
}

object RichXHandler {

  val Default = "Unknown type of throwable"

  val BinaryProblem: String =
    "GUESS: This may be a problem with the binary version of a " +
      "dependency. Check which versions of dependencies you're " +
      "pulling in."

  val DataIsMissing: String =
    "GUESS: Data is missing from the path you provided."

  val UnresolvedPlan: String =
    "GUESS: A table, column or path failed to resolve in the query " +
      "plan. Check source paths and column names."

  val mapping: Map[Class[_ <: Throwable], String] = Map(
    classOf[NoClassDefFoundError] -> BinaryProblem,
    classOf[AbstractMethodError] -> BinaryProblem,
    classOf[NoSuchMethodError] -> BinaryProblem,
    classOf[java.io.FileNotFoundException] -> DataIsMissing,
    classOf[org.apache.spark.sql.AnalysisException] -> UnresolvedPlan)

  def apply(xMap: Map[Class[_ <: Throwable], String] = mapping,
      dVal: String = Default): XHandler = new XHandler(xMap, dVal)
}
