package graft

import org.apache.spark.sql.functions._
import graft.ml.{TextAnalysis => TA}

/** Script profiling, mojibake detection and control-char stripping on
  * planted multilingual / damaged fixtures (the synthetic documents
  * table is pure ASCII, so these operators are spec-gated on
  * constructed text rather than oracle-gated).
  */
class TextCleaningSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "hello plain ascii world 123"),
      (2L, "привет мир как дела сегодня"), // Cyrillic
      (3L, "你好世界 mixed with latin words here"), // CJK + more Latin letters
      (4L, "γεια σου κόσμε"), // Greek
      (5L, "café résumé naïve"), // accented Latin
      (6L, "broken Ã© text â€™ quotes ï¿½"), // mojibake artifacts
      (7L, "ctrl\u0001here\u0007and\u001Fthere\tkeep\nlines")
    ).toDF("doc_id", "text")
  }

  test("scriptProfile counts per-script characters") {
    val rows = docs.select(col("doc_id"), TA.scriptProfile(col("text")).as("p"))
      .select("doc_id", "p.n_latin", "p.n_cyrillic", "p.n_cjk", "p.n_greek", "p.n_digit")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(rows(1L) == ((20, 0, 0, 0, 3)))
    assert(rows(2L)._2 == 23 && rows(2L)._1 == 0) // Cyrillic letters only
    assert(rows(3L)._3 == 4 && rows(3L)._1 > 0) // 4 CJK chars + latin tail
    assert(rows(4L)._4 > 0 && rows(4L)._1 == 0)
    assert(rows(5L)._1 == "cafe resume naive".count(_.isLetter) + 0) // accents are Latin range
  }

  test("dominantScript routes by majority script with deterministic ties") {
    val got = docs.select(col("doc_id"), TA.dominantScript(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "latin")
    assert(got(2L) == "cyrillic")
    assert(got(3L) == "latin") // more latin chars than the 4 CJK
    assert(got(4L) == "greek")
    import spark.implicits._
    val none = Seq((9L, "1234 ... !!")).toDF("doc_id", "text")
      .select(TA.dominantScript(col("text"))).head().getString(0)
    assert(none == "none")
  }

  test("mojibakeCount flags damaged docs and passes clean ones") {
    val got = docs.select(col("doc_id"), TA.mojibakeCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(6L) >= 3, s"planted artifacts not all found: ${got(6L)}")
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_) == 0),
      "clean multilingual text must not be flagged")
  }

  test("stripControlChars removes C0/C1 but keeps tab and newline") {
    val out = docs.filter(col("doc_id") === 7)
      .select(TA.stripControlChars(col("text"))).head().getString(0)
    assert(out == "ctrlhereandthere\tkeep\nlines")
  }
}
