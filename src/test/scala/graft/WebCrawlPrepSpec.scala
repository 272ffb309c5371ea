package graft

import org.apache.spark.sql.functions._
import graft.examples.WebCrawlPrepJob

/** The raw-crawl pipeline end-to-end on planted pages: every filter
  * stage must fire on exactly its planted victim and nothing else.
  */
class WebCrawlPrepSpec extends SparkSpec {

  private val goodText =
    "the quick brown fox jumps over the lazy dog while many other " +
      "animals watch the spectacle with great interest and some of " +
      "them write detailed reports about it for the morning paper"

  private def page(body: String): String =
    s"<html><head><title>t</title></head><body><p>$body</p></body></html>"

  test("each stage drops exactly its planted victim; the cap keeps best-quality pages") {
    import spark.implicits._
    val rows = Seq(
      // canonical-URL duplicates: fragment + query-order variants -> id 1 wins
      (1L, "https://a.example.com/p?b=2&a=1#top", page(goodText + " one")),
      (2L, "https://a.example.com/p?a=1&b=2", page(goodText + " two")),
      (3L, "https://A.EXAMPLE.com/p:?b=2&a=1".replace(":", ""), page(goodText + " three")),
      // unparseable URL -> dropped at parse
      (4L, "not a url at all", page(goodText)),
      // link-farm shell: markup huge, text tiny -> text_ratio floor
      (5L, "https://b.example.com/links",
        "<div>" + ("<a href=\"/some/long/path/elsewhere\"></a>" * 400) +
          "ok</div>"),
      // machine-generated repetition -> compression-ratio floor
      (6L, "https://b.example.com/spam", page("spam and eggs " * 2000)),
      // honest distinct pages on domain c (for the cap): vary quality
      // by padding with punctuation-noise that lowers the score
      (7L, "https://one.c-site.com/1", page(goodText)),
      (8L, "https://two.c-site.com/2", page(goodText + " extra readable words here")),
      (9L, "https://three.c-site.com/3",
        page(goodText + " !!!! #### $$$$ %%%% ^^^^ &&&& **** (((( ))))" * 3)))
      .toDF("id", "url", "html")

    val out = WebCrawlPrepJob.prepare(rows, minTextRatio = 0.05, cap = 2)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    // dup collapse: 1 kept; 2 and 3 are the same canonical URL
    assert(out.contains(1L) && !out.contains(2L) && !out.contains(3L))
    // unparseable, link farm, spam all gone
    assert(!out.contains(4L) && !out.contains(5L) && !out.contains(6L))
    // c-site.com is ONE registered domain across subdomains: cap 2
    // keeps the two best-quality pages and ranks them
    val cSite = out.values.filter(_.getAs[String]("domain") == "c-site.com")
    assert(cSite.map(_.getAs[Long]("id")).toSet == Set(7L, 8L),
      s"cap should keep 7, 8; got ${cSite.map(_.getAs[Long]("id"))}")
    assert(!out.contains(9L)) // the punct-noise page lost the cap
    assert(cSite.forall(r => r.getAs[Long]("domain_rank") <= 2))
    // surviving rows carry the full annotation surface
    val r1 = out(1L)
    assert(r1.getAs[String]("text").contains("quick brown fox"))
    assert(r1.getAs[String]("lang") == "en")
    assert(r1.getAs[Double]("quality") > 0.5)
    assert(r1.getAs[Double]("ratio") > 0.02 && r1.getAs[Double]("ratio") < 1.0)
  }

  test("host authority: the host every page links to outranks the rest") {
    import spark.implicits._
    def linkTo(host: String) = s"""<a href="https://$host/x">l</a>"""
    val rows = Seq(
      // three pages on distinct hosts all link to hub.example.com
      (1L, "https://a1.example.com/p", page(goodText + " one " +
        linkTo("hub.example.com"))),
      (2L, "https://a2.example.org/p", page(goodText + " two " +
        linkTo("hub.example.com"))),
      (3L, "https://a3.example.net/p", page(goodText + " three " +
        linkTo("hub.example.com"))),
      // the hub itself links out to one of them
      (4L, "https://hub.example.com/p", page(goodText + " hub " +
        linkTo("a1.example.com"))))
      .toDF("id", "url", "html")
    val out = WebCrawlPrepJob.prepare(rows, minTextRatio = 0.05, cap = 10)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.size == 4)
    val hub = out(4L).getAs[Double]("host_authority")
    val others = Seq(1L, 2L, 3L).map(out(_).getAs[Double]("host_authority"))
    assert(hub > 0.5, s"hub authority $hub") // 3-of-4 links point at it
    assert(others.forall(_ < hub), s"hub $hub vs $others")
    assert(out(1L).getAs[String]("host") == "a1.example.com")
  }
}
