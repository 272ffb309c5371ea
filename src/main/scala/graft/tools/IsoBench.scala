package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated repetition bench for one registered query: replicates
  * Bench.scala's exact harness (same session config, same sf0.001
  * warmup, same noop sink, same cache drop) but runs the sf target
  * N times in one JVM — separating first-touch cost (cold codegen /
  * AQE replan / page cache) from steady-state. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IsoBench q_matrix_product /root/testdata/sf0.1 5"
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val warmDir = sys.env.getOrElse("ISO_WARM_DIR", "/root/testdata/sf0.001")
    // optional second warmup with auto-broadcast disabled, so the
    // shuffle-join/agg codegen the large-SF plan uses gets compiled
    // even when AQE broadcasts everything at the warmup SF
    val warmNoBroadcast = sys.env.get("ISO_WARM_NOBROADCAST").contains("1")
    fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    graft.ml.Dedup.unpersistPipelineCaches()
    if (warmNoBroadcast) {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe =
        spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        prevAqe match {
          case Some(v) =>
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
          case None =>
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
        graft.ml.Dedup.unpersistPipelineCaches()
      }
    }
    val (l1b, stb) = graft.Bench.loadEvidence()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ml.Dedup.unpersistPipelineCaches()
      println(f"[iso] $name rep$i: $dt%.2f s")
    }
    val (l1a, sta) = graft.Bench.loadEvidence()
    // same adjudication evidence Bench embeds in BENCH_SUMMARY.json
    println(f"[iso] load1 $l1b%.2f -> $l1a%.2f, steal_delta ${sta - stb}")
    spark.stop()
  }
}
