package graft

import graft.ml.Web

class WebSpec extends SparkSpec {

  // --- HTML extraction ---------------------------------------------------

  test("extractText strips tags, drops script/style content, decodes entities") {
    val html = """<html><head><title>My Page</title>
      |<script type="text/javascript">var secret = "LEAK";</script>
      |<style>.x { color: red }</style></head>
      |<body><h1>Header</h1><p>Hello &amp; welcome to &lt;graft&gt;.</p>
      |<!-- invisible comment -->
      |<div class="c">Tail&nbsp;text &#65;&#x42;</div></body></html>""".stripMargin
    val got = Web.extractText(html)
    assert(got == "My Page Header Hello & welcome to <graft>. Tail text AB", got)
    assert(!got.contains("LEAK") && !got.contains("color"))
  }

  test("extractText is salvage-lenient on broken markup") {
    // '<' with no '>' is literal text from there on
    assert(Web.extractText("a < b and c") == "a < b and c")
    // unclosed script drops to end (content must never leak)
    assert(Web.extractText("keep <script>var x = 1; never closed") == "keep")
    // unclosed ordinary tag at the very end
    assert(Web.extractText("text <div unclosed") == "text <div unclosed")
    // unknown entity passes through
    assert(Web.extractText("&bogus; &amp;") == "&bogus; &")
    // nested angle inside attribute values (crawl reality): first '>' ends tag
    assert(Web.extractText("""<a href="x">link</a>""") == "link")
    assert(Web.extractText("") == "")
    // case-insensitive script/style
    assert(Web.extractText("<SCRIPT>no</SCRIPT>yes") == "yes")
  }

  test("htmlStats counts tags and anchors, computes text ratio") {
    val html = """<p>Six words of actual page text</p><a href="/x">l1</a><a href="/y">l2</a><abbr>n</abbr>"""
    val s = Web.htmlStats(html)
    assert(s.tags == 8, s) // p /p a /a a /a abbr /abbr
    assert(s.anchors == 2, s) // <abbr> must NOT count as an anchor
    assert(s.textRatio > 0 && s.textRatio < 1)
    assert(Web.htmlStats("").textRatio == 0.0)
  }

  // --- URLs --------------------------------------------------------------

  test("parseUrl handles ports, queries, fragments, and rejects non-URLs") {
    val u = Web.parseUrl("HTTPS://Example.COM:8443/a/b?x=1&y=2#frag").get
    assert(u.scheme == "https" && u.host == "example.com" && u.port == 8443)
    assert(u.path == "/a/b" && u.query == "x=1&y=2" && u.fragment == "frag")
    val bare = Web.parseUrl("http://host").get
    assert(bare.path == "/" && bare.port == -1 && bare.query == "")
    assert(Web.parseUrl("not a url").isEmpty)
    assert(Web.parseUrl("://nohost").isEmpty)
    assert(Web.parseUrl("http://").isEmpty)
    assert(Web.parseUrl(null).isEmpty)
    // query before any path
    val q = Web.parseUrl("http://h?k=v").get
    assert(q.path == "/" && q.query == "k=v")
  }

  test("registeredDomain: plain TLDs, second-level country suffixes, IPs") {
    assert(Web.registeredDomain("www.example.com") == "example.com")
    assert(Web.registeredDomain("a.b.c.example.org") == "example.org")
    assert(Web.registeredDomain("news.bbc.co.uk") == "bbc.co.uk")
    assert(Web.registeredDomain("www.keio.ac.jp") == "keio.ac.jp")
    assert(Web.registeredDomain("example.com") == "example.com")
    assert(Web.registeredDomain("localhost") == "localhost")
    assert(Web.registeredDomain("10.1.2.3") == "10.1.2.3")
    // co.uk-style suffix only under 2-letter TLDs: x.co.com -> co.com
    assert(Web.registeredDomain("x.co.com") == "co.com")
  }

  test("normalizeUrl: lowercase, default ports, sorted query, no fragment") {
    assert(Web.normalizeUrl("HTTP://Ex.COM:80/p?b=2&a=1#f")
      .contains("http://ex.com/p?a=1&b=2"))
    assert(Web.normalizeUrl("https://h:443/").contains("https://h/"))
    assert(Web.normalizeUrl("https://h:8443/x").contains("https://h:8443/x"))
    assert(Web.normalizeUrl("http://h").contains("http://h/"))
    assert(Web.normalizeUrl("http://h/p?").contains("http://h/p"))
    // same canonical key for crawler-order variants
    assert(Web.normalizeUrl("http://h/p?z=1&a=2") ==
      Web.normalizeUrl("http://H/p?a=2&z=1#x"))
  }

  // --- HTML tables -------------------------------------------------------

  test("extractTables: rows/cells, th+td, implicit closes, nested tables stay inner") {
    val html = """<p>before</p>
      |<table><tr><th>Name</th><th>Age</th></tr>
      |<tr><td>Ada</td><td>36</td></tr>
      |<tr><td>Alan</td><td>41</td>
      |</table>
      |<table><tr><td>x</td><td><table><tr><td>inner</td></tr></table></td></tr></table>
      |""".stripMargin
    val tables = Web.extractTables(html)
    assert(tables.length == 2, tables)
    assert(tables(0) == Seq(Seq("Name", "Age"), Seq("Ada", "36"),
      Seq("Alan", "41")), tables(0))
    // the nested table's text lands inside the outer cell
    assert(tables(1).head.head == "x")
    assert(tables(1).head(1).contains("inner"))
    assert(Web.extractTables("<p>no tables</p>").isEmpty)
  }

  // --- robots.txt --------------------------------------------------------

  test("robots.txt: group selection, longest-match precedence, wildcards, anchors") {
    val txt = """# crawl policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Crawl-delay: 2
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /only-graft/
      |Allow: /
      |
      |User-agent: graftbot-images
      |Disallow: /
      |""".stripMargin
    // generic agent gets the * group
    val star = Web.parseRobots(txt, "SomeCrawler/1.0")
    assert(!Web.robotsAllowed(star, "/private/x"))
    assert(Web.robotsAllowed(star, "/private/ok/page")) // longest match: allow
    assert(Web.robotsAllowed(star, "/public"))
    assert(star.crawlDelay.contains(2.0))
    // graftbot matches its named group (stacked UA lines)
    val gb = Web.parseRobots(txt, "Mozilla/5.0 (compatible; GraftBot/2)")
    assert(!Web.robotsAllowed(gb, "/only-graft/x"))
    assert(Web.robotsAllowed(gb, "/private/x")) // its group allows /
    // the LONGEST matching UA token wins
    val gbi = Web.parseRobots(txt, "graftbot-images/1")
    assert(!Web.robotsAllowed(gbi, "/anything"))
    // wildcards and anchors
    val wc = Web.parseRobots(
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n", "any")
    assert(!Web.robotsAllowed(wc, "/docs/file.pdf"))
    assert(Web.robotsAllowed(wc, "/docs/file.pdfx")) // $ anchors
    assert(!Web.robotsAllowed(wc, "/tmp123/x"))
    assert(Web.robotsAllowed(wc, "/tmp123/y"))
    // empty Disallow allows everything; empty file allows everything
    assert(Web.robotsAllowed(
      Web.parseRobots("User-agent: *\nDisallow:\n", "x"), "/a"))
    assert(Web.robotsAllowed(Web.parseRobots("", "x"), "/a"))
  }

  // --- WARC --------------------------------------------------------------

  test("WARC: record parse, HTTP split, gzip members, junk resilience, Spark read") {
    import graft.sources.WarcSource
    val r1 = WarcSource.writeRecord("https://ex.com/a",
      "2026-08-15T00:00:00Z", "<html><body><p>page one</p></body></html>")
    val r2 = WarcSource.writeRecord("https://ex.com/b",
      "2026-08-15T00:00:01Z", "<html><body><p>page two</p></body></html>",
      status = 404)
    // a warcinfo-ish record that must be skipped (not response type)
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Length: 5\r\n\r\nhello\r\n\r\n").getBytes("ISO-8859-1")
    val recs = WarcSource.parseFile("f", info ++ r1 ++ r2)
    assert(recs.length == 2)
    assert(recs(0).targetUri == "https://ex.com/a" && recs(0).httpStatus == 200)
    assert(new String(recs(0).body, "UTF-8").contains("page one"))
    assert(recs(1).httpStatus == 404)
    // gzip per-record members concatenated (.warc.gz convention)
    val gz = WarcSource.writeRecord("https://ex.com/z", "d",
      "<p>zipped</p>", gzip = true) ++
      WarcSource.writeRecord("https://ex.com/y", "d", "<p>two</p>",
        gzip = true)
    val gzRecs = WarcSource.parseFile("g", gz)
    assert(gzRecs.map(_.targetUri) == Seq("https://ex.com/z", "https://ex.com/y"))
    // garbage between records is skipped, valid tail still parses
    val withJunk = "random junk bytes\r\n".getBytes ++ r1
    assert(WarcSource.parseFile("j", withJunk).map(_.targetUri) ==
      Seq("https://ex.com/a"))
    // Spark read path: write files, read back, compose with extractText
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-0.warc").toPath, r1 ++ r2)
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-1.warc.gz").toPath, gz)
      val df = WarcSource.read(spark, dir.getAbsolutePath + "/*")
      val rows = df.collect()
      assert(rows.length == 4)
      val texts = graft.ml.Web.extractHtml(
        df.select(org.apache.spark.sql.functions
          .monotonically_increasing_id().as("id"),
          org.apache.spark.sql.functions.col("body").cast("string")
            .as("html")), "id", "html")
        .collect().map(_.getAs[String]("text")).toSet
      assert(texts.contains("page one") && texts.contains("zipped"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  // --- compression signal ------------------------------------------------

  test("compressionRatio orders repetitive < natural < random") {
    val rep = "the same phrase again " * 100
    val rnd = new scala.util.Random(31)
    val random = (0 until 2000).map(_ => rnd.nextPrintableChar()).mkString
    val natural = ("quick brown foxes jump over lazy dogs while seventeen " +
      "magistrates deliberate obscure statutes ") * 5
    val (rRep, rNat, rRnd) = (Web.compressionRatio(rep),
      Web.compressionRatio(natural), Web.compressionRatio(random))
    assert(rRep < rNat && rNat < rRnd, s"$rRep $rNat $rRnd")
    assert(rRep < 0.1)
    assert(Web.compressionRatio("") == 1.0)
  }

  // --- Spark wrappers ----------------------------------------------------

  test("extractHtml / parseUrls / compressionSignals run distributed") {
    import spark.implicits._
    val html = (1L to 6L).map(id =>
      (id, s"<body><p>doc $id</p><a href='/x'>go</a></body>"))
    val ex = Web.extractHtml(html.toDF("id", "html"), "id", "html")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ex(3L) == "doc 3 go")
    val urls = (1L to 6L).map(id => (id, s"https://w.ex.com/p/$id?b=$id&a=1#z"))
    val pu = Web.parseUrls(urls.toDF("id", "url"), "id", "url").collect()
    assert(pu.length == 6)
    pu.foreach { r =>
      assert(r.getAs[String]("domain") == "ex.com")
      assert(r.getAs[String]("normalized") ==
        s"https://w.ex.com/p/${r.getLong(0)}?a=1&b=${r.getLong(0)}")
    }
    val cs = Web.compressionSignals(
      Seq((1L, "abc " * 500), (2L, "")).toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cs(1L) < 0.1 && cs(2L) == 1.0)
  }

  test("extractLinks: quoting styles, case, malformed tags, document order") {
    assert(Web.extractLinks(
      """<a href="/a">x</a><A
        |HREF='b.html'>y</A><a class=q href=c>z</a>""".stripMargin) ==
      Seq("/a", "b.html", "c"))
    // href must be an attribute of an <a> tag, not <area>/<link>/text
    assert(Web.extractLinks(
      "<area href=\"/m\"><link href=\"/css\"> href=\"/t\" <a id=3>n</a>")
      == Nil)
    // xhref is not href; second attr wins the scan only if first absent
    assert(Web.extractLinks("<a xhref=\"/n\" href=\"/y\">k</a>") == Seq("/y"))
    // malformed: unterminated quote, tag never closed
    assert(Web.extractLinks("<a href=\"/u>never closes") == Nil)
    assert(Web.extractLinks(null) == Nil)
  }

  test("resolveLink: absolute, scheme-relative, root, directory, pseudo") {
    val page = Web.parseUrl("https://h.example.org/dir/sub/p.html").get
    def r(h: String) = Web.resolveLink(page, h)
    assert(r("https://other.com/q") == Some("https://other.com/q"))
    assert(r("//cdn.net/l.js") == Some("https://cdn.net/l.js"))
    assert(r("/top") == Some("https://h.example.org/top"))
    assert(r("next.html") ==
      Some("https://h.example.org/dir/sub/next.html"))
    assert(r("#frag").isEmpty && r("mailto:a@b.c").isEmpty &&
      r("javascript:void(0)").isEmpty && r("").isEmpty)
    // root page (path "/"): relative resolves at the root
    val root = Web.parseUrl("http://h.io").get
    assert(Web.resolveLink(root, "a.html") == Some("http://h.io/a.html"))
  }

  test("linkEdges: distributed edge list with resolution and host fields") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://s1.org/d/p.html",
        "<a href=\"/x\">a</a><a href=\"https://e.com/y\">b</a>" +
          "<a href=\"#skip\">c</a>"),
      (2L, "not a url", "<a href=\"/never\">d</a>") // unparseable page drops
    ).toDF("id", "url", "html")
    val got = Web.linkEdges(df, "id", "url", "html")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3),
        r.getString(4))).toSet
    assert(got == Set(
      (1L, "/x", "https://s1.org/x", "s1.org"),
      (1L, "https://e.com/y", "https://e.com/y", "e.com")))
  }
}
