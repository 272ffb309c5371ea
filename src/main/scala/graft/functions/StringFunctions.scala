package graft.functions

import org.apache.spark.sql.Column

/** Public facade for the native string-similarity expressions
  * (implementation in the org.apache.spark.sql.graft shim).
  */
object StringFunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.StringFunctions.jaro_winkler(a, b)
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.StringFunctions.register(spark)
}
