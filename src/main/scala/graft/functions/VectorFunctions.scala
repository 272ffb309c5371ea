package graft.functions

import org.apache.spark.sql.Column

/** Public facade for the native vector expressions (implementation in
  * the org.apache.spark.sql.graft shim, which needs private[sql]
  * access for type checking and Column construction).
  */
object VectorFunctions {
  def dot_f(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.dot_f(a, b)
  def cosine_f(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.cosine_f(a, b)
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.VectorFunctions.register(spark)
}
