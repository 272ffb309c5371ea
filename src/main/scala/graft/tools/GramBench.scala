package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A·Aᵀ strategy shootout (drives the q_matrix_product
  * optimization): sort-merge join vs shuffled-hash join vs a typed
  * per-contraction-key pair kernel. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.GramBench /root/testdata/sf0.1"
  */
object GramBench {

  def coo(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_suppkey").as("row"), col("l_partkey").as("col"))
      .agg(sum("l_quantity").as("val"))

  /** Current production path: SMJ + filter + agg + mirror explode. */
  def vJoin(a: DataFrame): DataFrame = {
    val l = a.select(col("row").as("r1"), col("col").as("k"), col("val").as("v1"))
    val r = a.select(col("row").as("r2"), col("col").as("k"), col("val").as("v2"))
    mirror(l.join(r, Seq("k")).filter(col("r1") <= col("r2"))
      .groupBy("r1", "r2").agg(sum(col("v1") * col("v2")).as("val")))
  }

  /** Same but forcing a shuffled hash join (skips sorting both sides). */
  def vHashJoin(a: DataFrame): DataFrame = {
    val l = a.select(col("row").as("r1"), col("col").as("k"), col("val").as("v1"))
    val r = a.select(col("row").as("r2"), col("col").as("k"), col("val").as("v2"))
    mirror(l.hint("SHUFFLE_HASH").join(r, Seq("k")).filter(col("r1") <= col("r2"))
      .groupBy("r1", "r2").agg(sum(col("v1") * col("v2")).as("val")))
  }

  /** Typed kernel: one shuffle groups each contraction key's entries,
    * a while-loop emits the upper-triangle pairs, hash agg finishes.
    */
  def vKernel(a: DataFrame): DataFrame = {
    import a.sparkSession.implicits._
    val pairs = a.select(col("col").as("k"), col("row").as("r"), col("val").as("v"))
      .groupBy("k").agg(collect_list(struct(col("r"), col("v"))).as("es"))
      .select(col("es").as[Seq[(Long, Double)]])
      .flatMap { es =>
        val arr = es.toArray
        java.util.Arrays.sort(arr, Ordering.by((p: (Long, Double)) => p._1))
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)](
          arr.length * (arr.length + 1) / 2)
        var i = 0
        while (i < arr.length) {
          val (ri, vi) = arr(i)
          var j = i
          while (j < arr.length) {
            out += ((ri, arr(j)._1, vi * arr(j)._2))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("r1", "r2", "val")
    mirror(pairs.groupBy("r1", "r2").agg(sum("val").as("val")))
  }

  private def mirror(upper: DataFrame): DataFrame =
    upper.select(explode(array(
        struct(col("r1").as("row"), col("r2").as("col"), col("val")),
        when(col("r1") =!= col("r2"),
          struct(col("r2").as("row"), col("r1").as("col"), col("val"))))).as("e"))
      .filter(col("e").isNotNull)
      .select(col("e.row"), col("e.col"), col("e.val"))

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = coo(spark, dir)
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "join" -> vJoin, "hashJoin" -> vHashJoin, "kernel" -> vKernel)
    // warmup all
    variants.foreach { case (_, f) =>
      f(coo(spark, "/root/testdata/sf0.001"))
        .write.format("noop").mode("overwrite").save()
    }
    // sanity: identical results
    val ref = vJoin(a).selectExpr("row", "col", "round(val, 2) AS v")
    variants.foreach { case (n, f) =>
      val got = f(a).selectExpr("row", "col", "round(val, 2) AS v")
      val diff = ref.exceptAll(got).count() + got.exceptAll(ref).count()
      println(s"[gram] $n diff=$diff")
    }
    (1 to 3).foreach { round =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f(a).write.format("noop").mode("overwrite").save()
        println(f"[gram] round$round $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // with the production tail (round + global sort), join vs kernel
    Seq("join" -> vJoin _, "kernel" -> vKernel _).foreach { case (n, f) =>
      val t0 = System.nanoTime()
      f(a).select(col("row"), col("col"), round(col("val"), 2).as("val"))
        .orderBy("row", "col")
        .write.format("noop").mode("overwrite").save()
      println(f"[gram] tail $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
