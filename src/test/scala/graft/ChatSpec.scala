package graft

import org.apache.spark.sql.functions._

class ChatSpec extends SparkSpec {

  test("flattenChat: protocol validation, reasons, rendering") {
    import spark.implicits._
    val rows = Seq(
      // valid, with system turn and extra JSON fields (ignored)
      (1L, """[{"role":"system","content":"be kind","ts":9},
             |{"role":"user","content":"hi"},
             |{"role":"assistant","content":"hello"}]""".stripMargin),
      // valid, no system, ends on user
      (2L, """[{"role":"user","content":"q"},
             |{"role":"assistant","content":"a"},
             |{"role":"user","content":"q2"}]""".stripMargin),
      // broken alternation
      (3L, """[{"role":"user","content":"x"},{"role":"user","content":"y"}]"""),
      // unknown role
      (4L, """[{"role":"tool","content":"x"}]"""),
      // system-only: no non-system turn
      (5L, """[{"role":"system","content":"x"}]"""),
      // assistant first
      (6L, """[{"role":"assistant","content":"x"}]"""),
      // empty content mid-conversation
      (7L, """[{"role":"user","content":"x"},{"role":"assistant","content":""}]"""),
      // null content
      (8L, """[{"role":"user"}]"""),
      // truncated JSON
      (9L, """[{"role":"user","content":"x""""),
      // empty array
      (10L, "[]")
    ).toDF("id", "j")
    val got = graft.ml.Chat.flattenChat(rows, "id", "j")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getString(3), if (r.isNullAt(4)) null else r.getString(4)))).toMap
    assert(got(1L) == ((3L, true, "ok",
      "<|system|> be kind\n<|user|> hi\n<|assistant|> hello")))
    assert(got(2L) == ((3L, true, "ok",
      "<|user|> q\n<|assistant|> a\n<|user|> q2")))
    assert(got(3L) == ((2L, false, "role", null)))
    assert(got(4L) == ((1L, false, "role", null)))
    assert(got(5L) == ((1L, false, "role", null)))
    assert(got(6L) == ((1L, false, "role", null)))
    assert(got(7L) == ((2L, false, "content", null)))
    assert(got(8L) == ((1L, false, "content", null)))
    assert(got(9L) == ((0L, false, "parse", null)))
    assert(got(10L) == ((0L, false, "empty", null)))
  }

  test("flattenChat: the valid stream feeds packing unchanged") {
    import spark.implicits._
    val n = 50
    val rows = (1L to n.toLong).map { i =>
      (i, s"""[{"role":"user","content":"q$i"},{"role":"assistant","content":"a$i"}]""")
    }.toDF("id", "j")
    val flat = graft.ml.Chat.flattenChat(rows, "id", "j")
    assert(flat.filter(col("valid")).count() == n)
    // rendered text is non-degenerate and deterministic
    val t1 = flat.filter(col("id") === 7L).head().getString(4)
    assert(t1 == "<|user|> q7\n<|assistant|> a7")
  }
}
