package graft

import org.apache.spark.sql.functions._
import graft.ml.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Naive O(text·patterns) reference counter. */
  private def naive(text: String, patterns: Seq[String]): Map[String, Long] =
    patterns.map { p =>
      var c = 0L
      var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
      p -> c
    }.toMap

  test("classic he/she/his/hers overlap case matches the naive counter") {
    val pats = Seq("he", "she", "his", "hers")
    val text = "ushers say she has his hers"
    val ac = Blocklist.build(pats)
    val got = pats.zip(ac.countAll(text)).toMap
    assert(got == naive(text, pats))
    assert(got("he") == 3L) // usHErs, sHE, HErs — every end position
  }

  test("random texts: automaton equals the naive counter") {
    val rnd = new scala.util.Random(5)
    val pats = Seq("ab", "aba", "bb", "aab", "b")
    val ac = Blocklist.build(pats)
    (1 to 50).foreach { _ =>
      val text = (1 to 60).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      assert(pats.zip(ac.countAll(text)).toMap == naive(text, pats),
        s"mismatch on $text")
    }
  }

  test("containsAny early-exits correctly") {
    val ac = Blocklist.build(Seq("needle", "pin"))
    assert(ac.containsAny("a haystack with a needle inside"))
    assert(ac.containsAny("pinned"))
    assert(!ac.containsAny("just hay"))
    assert(!ac.containsAny(""))
  }

  test("matchCounts emits only occurring (doc, pattern) pairs") {
    val docs = Seq(
      (1L, "spark runs fast and spark scales"),
      (2L, "no matches here"),
      (3L, "slow table scan")
    ).toDF("doc_id", "text")
    val got = Blocklist.matchCounts(docs, "doc_id", "text",
        Seq("spark", "slow", "absent"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "spark", 2L), (3L, "slow", 1L)))
  }

  test("filterClean drops documents over the hit budget") {
    val docs = Seq(
      (1L, "clean text"),
      (2L, "one bad word"),
      (3L, "bad bad bad")
    ).toDF("doc_id", "text")
    val strict = Blocklist.filterClean(docs, "doc_id", "text", Seq("bad"))
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(1L))
    val lenient = Blocklist.filterClean(docs, "doc_id", "text", Seq("bad"),
        maxHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(lenient == Set(1L, 2L))
  }

  test("build validates patterns") {
    intercept[IllegalArgumentException] { Blocklist.build(Seq.empty) }
    intercept[IllegalArgumentException] { Blocklist.build(Seq("ok", "")) }
  }
}
