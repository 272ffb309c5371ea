package graft.tools

import org.apache.spark.sql.SparkSession

/** IsoBench over a LIST of queries in one JVM: per query, one sf0.001
  * warmup then `reps` timed noop-sink runs at the target SF, with the
  * same cache-drop hygiene as Bench. Prints one line per rep plus a
  * min/median summary per query — the cheap way to A/B a batch of
  * candidate optimizations without paying a JVM+sbt launch each.
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IsoMulti q_a,q_b[,..] [sfDir] [reps]"
  */
object IsoMulti {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = graft.SparkEntry.queries
    val (_, stb) = graft.Bench.loadEvidence()
    val summary = names.map { name =>
      val fn = queries(name)
      try {
        fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => }
      finally graft.ml.Dedup.unpersistPipelineCaches()
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ml.Dedup.unpersistPipelineCaches()
        println(f"[iso] $name rep$i: $dt%.2f s")
        dt
      }
      name -> times
    }
    val (_, sta) = graft.Bench.loadEvidence()
    summary.foreach { case (n, ts) =>
      val sorted = ts.sorted
      println(f"[iso] SUMMARY $n min=${sorted.head}%.2f med=${sorted(sorted.size / 2)}%.2f")
    }
    println(s"[iso] steal_delta ${sta - stb}")
    spark.stop()
  }
}
