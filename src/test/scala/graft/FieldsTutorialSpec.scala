package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.dsl.FieldsApi._
import graft.join.Joins
import graft.sources.{Delimited, TextLine}

/** The reference's introductory tutorials (tutorial/Tutorial0-6.scala)
  * replayed on the fields facade over its own fixture texts — the
  * minimal read/transform/write pipelines a first-time user writes,
  * kept as end-to-end smoke coverage of TextLine/Tsv round-trips plus
  * the fields ops they compose.
  */
class FieldsTutorialSpec extends SparkSpec {

  import spark.implicits._

  // tutorial/data/hello.txt and words.txt
  private val helloLines = Seq("Hello world", "Goodbye world")
  private val wordLines = Seq("hello", "world", "goodbye")

  private def tmp(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tut").toString
    val p = s"$dir/$name"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      lines.mkString("\n").getBytes("UTF-8"))
    p
  }

  test("tutorials 0-1: read text, copy/project, write, read back") {
    val in = tmp("hello.txt", helloLines)
    val outDir = java.nio.file.Files.createTempDirectory("tut0").toString + "/out"
    // Tutorial0: input.read.write(output); Tutorial1 projects 'line
    val piped = TextLine(in).read(spark).project("line")
    TextLine(outDir).write(piped, SaveMode.Overwrite)
    assert(TextLine(outDir).read(spark).as[String].collect().toSet ==
      helloLines.toSet)
  }

  test("tutorial 2: map a line to its reverse") {
    val in = tmp("hello.txt", helloLines)
    val got = TextLine(in).read(spark)
      .mapField("reversed", reverse(col("line")))
      .project("reversed")
      .as[String].collect().toSet
    assert(got == helloLines.map(_.reverse).toSet)
  }

  test("tutorial 3: flatMap lines to words (intermediate write kept)") {
    val in = tmp("hello.txt", helloLines)
    val words = TextLine(in).read(spark)
      .mapField("word", split(col("line"), "\\s"))
      .flatten("word", "word")
    val got = words.project("word").as[String].collect()
    assert(got.sorted.toSeq ==
      Seq("Goodbye", "Hello", "world", "world"))
  }

  test("tutorial 4: word count") {
    val in = tmp("hello.txt", helloLines)
    val got = TextLine(in).read(spark)
      .mapField("word", explode(split(col("line"), "\\s")))
      .groupByFields("word")(_.size("count"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("Hello" -> 1L, "Goodbye" -> 1L, "world" -> 2L))
  }

  test("tutorial 5: line score = sum of word ranks via dictionary join") {
    val in = tmp("hello.txt", helloLines)
    val dict = tmp("words.txt", wordLines)
    // scores: rename offset->score, lowercase the word
    val scores = TextLine(dict, withOffset = true).read(spark)
      .rename("offset" -> "score")
      .mapField("word", lower(col("line")))
      .project("score", "word")
    val got = Joins.joinWithLarger(
        TextLine(in).read(spark)
          .mapField("word", explode(split(lower(col("line")), "\\s"))),
        scores, Seq("word"))
      .groupByFields("line")(_.sum("score"))
      .as[(String, Long)].collect().toMap
    // hello=0, world=1, goodbye=2 (line ranks in words.txt)
    assert(got == Map("Hello world" -> 1L, "Goodbye world" -> 3L))
  }

  test("tutorial 6: schema'd csv, full-name map, project") {
    // tutorial/data/phones.txt (space-separated, first 3 rows)
    val in = tmp("phones.txt", Seq(
      "john smith 5551212 30 US",
      "harry bovik 4122680000 55 US",
      "jane doe 4125551212 40 CN"))
    val schema = org.apache.spark.sql.types.StructType(
      Seq("first", "last", "phone", "age", "country").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    val got = Delimited(in, sep = " ", schema = Some(schema))
      .read(spark)
      .mapField("full", concat_ws(" ", col("first"), col("last")))
      .project("full", "age")
      .as[(String, String)].collect().toSet
    assert(got == Set(("john smith", "30"), ("harry bovik", "55"),
      ("jane doe", "40")))
  }
}
