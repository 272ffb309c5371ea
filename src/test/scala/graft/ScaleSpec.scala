package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-mechanics evidence: bucketed co-located joins skip the
  * shuffle; the PageRank example job converges end-to-end via Tool.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without an exchange on either side") {
    import spark.implicits._
    // force a shuffle-family join so bucketing (not broadcast) is the
    // mechanism under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val a = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    val b = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_b")
    val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 10000)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE bucketed_a")
    spark.sql("DROP TABLE bucketed_b")
  }

  test("PageRankJob runs via Tool and converges on a cycle graph") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pr").toString
    // 3-cycle: stationary ranks are all 1.0
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .write.parquet(s"$dir/edges")
    graft.core.Tool.run("graft.examples.PageRankJob",
      graft.core.Args(s"--edges $dir/edges --output $dir/ranks --maxiters 15"),
      spark)
    val ranks = spark.read.parquet(s"$dir/ranks").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 3)
    ranks.values.foreach(v => assert(math.abs(v - 1.0) < 0.01, ranks.toString))
  }
}
