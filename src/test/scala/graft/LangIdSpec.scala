package graft

import org.apache.spark.sql.functions._
import graft.ml.LangId

class LangIdSpec extends SparkSpec {

  // three planted "languages" with disjoint character distributions
  private val vocab = Map(
    "aa" -> Seq("alpha", "area", "arcade", "banana", "cascade", "arena"),
    "kk" -> Seq("kick", "knock", "kiosk", "skunk", "kayak", "kraken"),
    "zz" -> Seq("zigzag", "fuzzy", "pizza", "buzz", "dizzy", "zesty"))

  private def doc(lang: String, seed: Int, n: Int = 40): String = {
    val rnd = new scala.util.Random(seed)
    val ws = vocab(lang)
    (0 until n).map(_ => ws(rnd.nextInt(ws.size))).mkString(" ")
  }

  test("TextCat profiles separate planted languages; held-out accuracy is perfect") {
    import spark.implicits._
    val train = (for {
      (lang, _) <- vocab.toSeq
      i <- 0 until 10
    } yield (lang, doc(lang, i))).toDF("lang", "text")
    val profiles = LangId.trainProfiles(train, "lang", "text", k = 100)
    // profile sanity: ranked 1..k, per-language, deterministic
    val p = profiles.collect()
    assert(p.map(_.getAs[String]("lang")).toSet == vocab.keySet)
    val ranks = p.filter(_.getAs[String]("lang") == "aa")
      .map(_.getAs[Int]("rank")).sorted
    assert(ranks.head == 1 && ranks.toSeq == (1 to ranks.length))

    val test = (for {
      (lang, _) <- vocab.toSeq
      i <- 100 until 110
    } yield (lang.hashCode.toLong * 1000 + i, lang, doc(lang, i)))
      .toDF("id", "truth", "text")
    val got = LangId.classify(test.select("id", "text"), "id", "text",
        profiles, k = 100, docTop = 20)
      .join(test.select("id", "truth"), "id")
    val acc = got.filter(col("lang") === col("truth")).count()
    assert(acc == 30L, s"expected 30/30, got $acc")
    // determinism: a second run returns identical rows
    val again = LangId.classify(test.select("id", "text"), "id", "text",
      profiles, k = 100, docTop = 20)
    assert(got.select("id", "lang", "distance").collect().toSet ==
      again.collect().toSet)
  }

  test("out-of-place penalty: unknown grams charge k to every language equally") {
    import spark.implicits._
    val train = (for {
      (lang, _) <- vocab.toSeq
      i <- 0 until 6
    } yield (lang, doc(lang, i))).toDF("lang", "text")
    val profiles = LangId.trainProfiles(train, "lang", "text", k = 50)
    // a doc of PURE out-of-vocabulary grams: all languages get the
    // same all-penalty distance -> alphabetically first language wins
    val alien = Seq((1L, "qqq www qqq www qqq")).toDF("id", "text")
    val r = LangId.classify(alien, "id", "text", profiles, k = 50).head()
    assert(r.getString(1) == "aa") // tie -> lexicographically first
    // and the distance is exactly nGrams * k for every language
    val gCount = (" qqq www qqq www qqq ".length - 2)
    val distinctTop = math.min(20,
      " qqq www qqq www qqq ".sliding(3).toSeq.distinct.size)
    assert(r.getLong(2) == distinctTop.toLong * 50)
  }
}
