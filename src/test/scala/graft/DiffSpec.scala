package graft

import org.apache.spark.sql.functions._
import graft.tools.Diff

/** Dataset regression diff: classification, per-column attribution,
  * summary counts, hard gate.
  */
class DiffSpec extends SparkSpec {

  test("rows classifies and attributes changed columns, null-safe") {
    import spark.implicits._
    val l = Seq((1L, Some("a"), 10), (2L, Some("b"), 20),
      (3L, None: Option[String], 30), (4L, Some("d"), 40))
      .toDF("id", "s", "n")
    val r = Seq((1L, Some("a"), 10), (2L, Some("B"), 21),
      (3L, None: Option[String], 30), (5L, Some("e"), 50))
      .toDF("id", "s", "n")
    val got = Diff.rows(l, r, Seq("id")).collect()
      .map(row => row.getLong(0) ->
        (row.getString(1), row.getSeq[String](2).toList)).toMap
    assert(got(1L) == (("unchanged", Nil)))
    assert(got(2L) == (("changed", List("n", "s"))))
    assert(got(3L) == (("unchanged", Nil)), "null <=> null is unchanged")
    assert(got(4L) == (("left_only", Nil)))
    assert(got(5L) == (("right_only", Nil)))

    val s = Diff.summary(l, r, Seq("id")).head()
    assert(s.getAs[Long]("n_left_only") == 1L)
    assert(s.getAs[Long]("n_right_only") == 1L)
    assert(s.getAs[Long]("n_changed") == 1L)
    assert(s.getAs[Long]("n_unchanged") == 2L)
    assert(s.getAs[Long]("diff_s") == 1L && s.getAs[Long]("diff_n") == 1L)

    Diff.assertIdentical(l, l, Seq("id"))
    intercept[AssertionError](Diff.assertIdentical(l, r, Seq("id")))
    intercept[IllegalArgumentException](Diff.rows(l, r, Seq.empty))
  }

  test("schemas reports added/removed/type-changed columns only") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq((1L, "a", 10)).toDF("id", "s", "n")
    val r = Seq((1L, 1.5, true)).toDF("id", "n", "flag")
      .select(col("id"), col("n"), col("flag"))
    val got = Diff.schemas(l, r).collect()
      .map(x => x.getString(0) -> (x.getString(1), x.getString(2), x.getString(3))).toMap
    assert(got("s") == (("removed", "string", null)))
    assert(got("flag") == (("added", null, "boolean")))
    assert(got("n")._1 == "changed" &&
      got("n")._2.startsWith("int") && got("n")._3.startsWith("double"))
    assert(!got.contains("id"), "identical columns are not reported")
    assert(Diff.schemas(l, l).isEmpty)
  }
}
