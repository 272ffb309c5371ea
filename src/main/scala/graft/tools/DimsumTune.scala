package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.matrix.Matrix

/** Scratch tuner for the q_matrix_gram_dimsum contract margins. */
object DimsumTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- (if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))) {
      val coo = graft.core.GraftSession.table(spark, dir, "lineitem")
        .groupBy(col("l_suppkey").as("row"), col("l_partkey").as("col"))
        .agg(sum("l_quantity").as("val"))
      val base = Matrix.fromCoo(coo, "row", "col", "val")
      val nb = base.df.count()
      val exact = base.rowCosineSimilarity.df
        .filter(col("row") < col("col"))
        .filter(round(col("val"), 6) >= 0.15)
        .select(col("row"), col("col"), col("val").as("cos")).cache()
      val npairs = exact.count()
      for (t <- Seq(500.0, 650.0, 800.0)) {
        val est = base.rowCosineDimsum(t).df
          .filter(col("row") < col("col"))
          .select(col("row"), col("col"), col("val").as("est"))
        val r = exact.join(est, Seq("row", "col"), "left")
          .select(abs(coalesce(col("est"), lit(0.0)) - col("cos")).as("err"))
          .agg(coalesce(max("err"), lit(-1.0)).as("maxerr"),
            coalesce(avg("err"), lit(-1.0)).as("avgerr")).collect().head
        val ns = base.dimsumSample(t).df.count()
        println(f"TUNE dir=$dir t=$t%.0f pairs=$npairs maxerr=${r.getDouble(0)}%.4f avgerr=${r.getDouble(1)}%.4f sampled=$ns/$nb")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
