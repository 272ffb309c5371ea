package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: SQL-registered native functions and
  * the self-cosine optimizer rule. Uses its own session (extensions
  * are installed at session build time).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.core.GraftSession
      .configure(SparkSession.builder()
        .master("local[2]").appName("graft-ext")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions), 2)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("vec functions callable from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       round(vec_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)), 6) AS c
      """.stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("self-cosine rewrites to SelfCosine via the optimizer rule") {
    import spark.implicits._
    // a real scan — over a LocalRelation, ConvertToLocalRelation
    // evaluates the expression before user-injected rules run
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString + "/v"
    Seq((1L, Array(1.0f, 2.0f))).toDF("id", "vec").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val out = df.selectExpr("vec_cosine(vec, vec) AS c")
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("selfcosine"),
      s"rule did not rewrite:\n$optimized")
    // value is exactly 1.0 with no float round-off — proof the rule
    // replaced the computation
    assert(out.head().getDouble(0) == 1.0)
  }

  test("self-cosine rewrite preserves NaN for zero/empty and null for null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString + "/v2"
    Seq((1L, Array(0.0f, 0.0f)), (2L, Array.empty[Float]), (3L, null))
      .toDF("id", "vec").write.parquet(dir)
    val out = spark.read.parquet(dir)
      .selectExpr("id", "vec_cosine(vec, vec) AS c").orderBy("id").collect()
    assert(out(0).getDouble(1).isNaN, "zero vector must stay NaN")
    assert(out(1).getDouble(1).isNaN, "empty vector must stay NaN")
    assert(out(2).isNullAt(1), "null vector must stay null")
  }
}
