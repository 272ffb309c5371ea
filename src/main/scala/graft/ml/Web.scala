package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Web-crawl preprocessing kernels — the step BEFORE every text
  * operator in this library when the corpus is raw crawl data: HTML →
  * text extraction, URL parsing / normalization / registered-domain
  * grouping, and the deflate compression-ratio quality signal.
  *
  * All kernels are hand-rolled single-pass string walkers (no
  * regex-per-row on the hot path, no external parsing libraries) and
  * run Spark-side as narrow mapPartitions kernels — one row in, one
  * row out, nothing shuffles. The reference repo has no web handling
  * at all; this is part of the training-data superset.
  */
object Web {

  // --- HTML → text --------------------------------------------------------

  /** Extract readable text from HTML in one pass:
    *
    *  - `<script>`/`<style>` elements are dropped WITH their content
    *    (case-insensitive, attribute-tolerant), as are `<!-- -->`
    *    comments;
    *  - every other tag is replaced by a single space (block/inline
    *    distinction doesn't survive whitespace collapsing anyway);
    *  - the standard named entities (`&amp; &lt; &gt; &quot; &apos;
    *    &nbsp;`) and numeric forms (`&#NN;` / `&#xHH;`) are decoded;
    *    unknown entities pass through literally;
    *  - whitespace runs collapse to single spaces, ends trimmed.
    *
    * Robust to unclosed/garbage markup: a `<` with no closing `>` is
    * treated as literal text from that point (salvage over
    * strictness — crawl data is full of broken HTML).
    */
  def extractText(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    val n = html.length
    var i = 0
    var lastSpace = true // suppress leading space
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\u00A0') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else { sb.append(c); lastSpace = false }
    }
    // case-insensitive region match without allocating
    def matches(at: Int, s: String): Boolean = {
      if (at + s.length > n) return false
      var k = 0
      while (k < s.length) {
        if (Character.toLowerCase(html.charAt(at + k)) != s.charAt(k))
          return false
        k += 1
      }
      true
    }
    // find the end of the element whose name starts at `at` (already
    // inside `<name`), i.e. the matching case-insensitive `</name`
    def skipElement(at: Int, name: String): Int = {
      var j = at
      while (j < n) {
        if (html.charAt(j) == '<' && j + 1 < n && html.charAt(j + 1) == '/' &&
          matches(j + 2, name)) {
          var k = j + 2 + name.length
          while (k < n && html.charAt(k) != '>') k += 1
          return math.min(n, k + 1)
        }
        j += 1
      }
      n // unclosed: drop to end (script content must never leak)
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matches(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          emit(' ')
        } else if (matches(i, "<script") || matches(i, "<style")) {
          val name = if (matches(i, "<script")) "script" else "style"
          // skip past this tag's '>' then to the closing tag
          var k = i + 1
          while (k < n && html.charAt(k) != '>') k += 1
          i = if (k >= n) n else skipElement(k + 1, name)
          emit(' ')
        } else {
          // ordinary tag: skip to '>'; a '<' with no '>' is literal
          var k = i + 1
          var ok = false
          while (k < n && !ok) {
            if (html.charAt(k) == '>') ok = true else k += 1
          }
          if (ok) { i = k + 1; emit(' ') }
          else { emit('<'); i += 1 }
        }
      } else if (c == '&') {
        // entity
        val semi = html.indexOf(';', i + 1)
        // numeric references may name supplementary-plane code points
        // (emoji): decode to the full char sequence, not a truncated
        // BMP char
        def codePoint(cp: Int): Option[String] =
          if (Character.isValidCodePoint(cp))
            Some(new String(Character.toChars(cp)))
          else None
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 8) None
          else html.substring(i + 1, semi) match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try codePoint(Integer.parseInt(e.drop(2), 16))
              catch { case _: NumberFormatException => None }
            case e if e.startsWith("#") =>
              try codePoint(Integer.parseInt(e.drop(1)))
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        decoded match {
          case Some(s) =>
            var k = 0
            while (k < s.length) { emit(s.charAt(k)); k += 1 }
            i = semi + 1
          case None => emit('&'); i += 1
        }
      } else { emit(c); i += 1 }
    }
    // trim trailing space
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  /** Markup-density stats for boilerplate/quality filtering: tag
    * count, anchor (`<a`) count, script+style content share, and the
    * extracted-text-to-raw ratio (the readability signal: content
    * pages sit high, navigation/ad shells low).
    */
  final case class HtmlStats(textChars: Int, rawChars: Int, tags: Int,
      anchors: Int, textRatio: Double)

  def htmlStats(html: String): HtmlStats = {
    val text = extractText(html)
    var tags = 0
    var anchors = 0
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<' && i + 1 < n &&
        (Character.isLetter(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
        tags += 1
        val c1 = Character.toLowerCase(html.charAt(i + 1))
        if (c1 == 'a' && (i + 2 >= n || !Character.isLetter(html.charAt(i + 2))))
          anchors += 1
      }
      i += 1
    }
    HtmlStats(text.length, n, tags, anchors,
      if (n == 0) 0.0 else text.length.toDouble / n)
  }

  /** Spark wrapper: (id, text, text_chars, raw_chars, tags, anchors,
    * text_ratio) per document — extraction and stats in one pass.
    */
  def extractHtml(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions(_.map { case (id, html) =>
        val h = if (html == null) "" else html
        val s = htmlStats(h)
        (id, extractText(h), s.textChars, s.rawChars, s.tags, s.anchors,
          s.textRatio)
      })
      .toDF(idCol, "text", "text_chars", "raw_chars", "tags", "anchors",
        "text_ratio")
  }

  /** Extract HTML tables as rows of cell text: one entry per
    * `<table>` (top-level — a nested table's cells stay inside the
    * outer cell's text), each a list of `<tr>` rows of `<td>`/`<th>`
    * cell texts run through [[extractText]]. The structured-data
    * mining pass of a crawl pipeline.
    */
  def extractTables(html: String): Seq[Seq[Seq[String]]] = {
    val lower = html.toLowerCase
    // (openIdx, contentStart, contentEnd, afterClose) for each
    // top-level <table> within [from, to), nesting-matched
    def tableSpans(from: Int, to: Int): Seq[(Int, Int, Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int, Int, Int)]
      var i = from
      while (i < to) {
        val s = lower.indexOf("<table", i)
        if (s < 0 || s >= to) i = to
        else {
          val tagEnd = lower.indexOf('>', s)
          if (tagEnd < 0) i = to
          else {
            var depth = 1
            var j = tagEnd + 1
            var contentEnd = -1
            var afterClose = to
            while (contentEnd < 0 && j < to) {
              val nOpen = lower.indexOf("<table", j)
              val nClose = lower.indexOf("</table", j)
              if (nClose < 0) { contentEnd = to }
              else if (nOpen >= 0 && nOpen < nClose) { depth += 1; j = nOpen + 6 }
              else {
                depth -= 1
                if (depth == 0) {
                  contentEnd = nClose
                  afterClose = math.min(to, nClose + 8)
                } else j = nClose + 8
              }
            }
            if (contentEnd < 0) contentEnd = to
            out += ((s, tagEnd + 1, contentEnd, afterClose))
            i = afterClose
          }
        }
      }
      out.result()
    }
    tableSpans(0, lower.length).map { case (_, ts, te, _) =>
      // nested tables inside this one: their regions are excluded from
      // the outer row/cell scan (their CONTENT still lands inside the
      // containing outer cell's extracted text)
      val inner = tableSpans(ts, te)
      def inInner(p: Int): Boolean =
        inner.exists { case (o, _, _, a) => p >= o && p < a }
      // tag starts of `names` at the outer level, implicit closes
      def starts(names: Seq[String], from: Int, to: Int): Seq[Int] = {
        val b = Seq.newBuilder[Int]
        var i = from
        while (i < to) {
          val cands = names.map(n => lower.indexOf(n, i)).filter(x =>
            x >= 0 && x < to)
          if (cands.isEmpty) i = to
          else {
            val s = cands.min
            val e = lower.indexOf('>', s)
            if (e < 0) i = to
            else {
              if (!inInner(s)) b += e + 1
              i = e + 1
            }
          }
        }
        b.result()
      }
      val rowStarts = starts(Seq("<tr"), ts, te)
      rowStarts.zipWithIndex.map { case (rs, ri) =>
        val re = if (ri + 1 < rowStarts.length)
          lower.lastIndexOf("<tr", rowStarts(ri + 1) - 1) else te
        val cellStarts = starts(Seq("<td", "<th"), rs, re)
        cellStarts.zipWithIndex.map { case (cs, ci) =>
          val ce = if (ci + 1 < cellStarts.length) {
            val nxt = cellStarts(ci + 1)
            val td = lower.lastIndexOf("<td", nxt - 1)
            val th = lower.lastIndexOf("<th", nxt - 1)
            math.max(td, th)
          } else re
          extractText(html.substring(cs, math.max(cs, ce)))
        }
      }.filter(_.nonEmpty)
    }.filter(_.nonEmpty)
  }

  // --- robots.txt ----------------------------------------------------------

  /** One user-agent group's rules: (isAllow, pathPattern) in file
    * order, plus crawl-delay if present.
    */
  final case class RobotsRules(rules: Seq[(Boolean, String)],
      crawlDelay: Option[Double])

  /** Parse robots.txt for `userAgent` per the public REP
    * (RFC 9309 / the Google spec): consecutive `User-agent` lines
    * stack onto one group; the group with the LONGEST user-agent
    * token that case-insensitively substring-matches ours applies,
    * `*` as fallback; comments (#) stripped.
    */
  def parseRobots(txt: String, userAgent: String): RobotsRules = {
    val ua = userAgent.toLowerCase
    var bestLen = -1
    var best: (Seq[(Boolean, String)], Option[Double]) = (Seq.empty, None)
    var groupAgents = List.empty[String]
    var groupRules = Seq.newBuilder[(Boolean, String)]
    var groupDelay: Option[Double] = None
    var inRules = false
    def closeGroup(): Unit = {
      if (groupAgents.nonEmpty) {
        val rules = groupRules.result()
        groupAgents.foreach { agent =>
          val matchLen =
            if (agent == "*") 0
            else if (ua.contains(agent)) agent.length
            else -1
          if (matchLen > bestLen) {
            bestLen = matchLen
            best = (rules, groupDelay)
          }
        }
      }
      groupAgents = Nil; groupRules = Seq.newBuilder; groupDelay = None
      inRules = false
    }
    (if (txt == null) "" else txt).split('\n').foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val k = line.substring(0, c).trim.toLowerCase
        val v = line.substring(c + 1).trim
        k match {
          case "user-agent" =>
            if (inRules) closeGroup()
            groupAgents = v.toLowerCase :: groupAgents
          case "allow" => inRules = true; groupRules += ((true, v))
          case "disallow" => inRules = true; groupRules += ((false, v))
          case "crawl-delay" =>
            inRules = true
            groupDelay = try Some(v.toDouble)
            catch { case _: NumberFormatException => None }
          case _ => inRules = true // unknown directive still binds group
        }
      }
    }
    closeGroup()
    RobotsRules(best._1, best._2)
  }

  /** REP path match: `*` matches any run, a trailing `$` anchors the
    * end; otherwise a prefix match.
    */
  private def repMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    // greedy sequential substring walk
    var pos = 0
    var ok = true
    parts.zipWithIndex.foreach { case (p, i) =>
      if (ok) {
        if (i == 0) {
          if (path.startsWith(p)) pos = p.length else ok = false
        } else {
          val at = path.indexOf(p, pos)
          if (at < 0) ok = false else pos = at + p.length
        }
      }
    }
    if (!ok) false
    else if (anchored) {
      // last literal part must reach the end (re-check tail)
      if (parts.last.isEmpty) true else path.endsWith(parts.last) &&
        pos <= path.length
    } else true
  }

  /** Is `path` fetchable under `rules`? Longest-pattern match wins;
    * allow wins ties (the Google REP rule); no match → allowed.
    * An empty Disallow value matches nothing (the classic
    * "Disallow:" = allow-all idiom).
    */
  def robotsAllowed(rules: RobotsRules, path: String): Boolean = {
    var bestLen = -1
    var allowed = true
    rules.rules.foreach { case (allow, pat) =>
      if (pat.nonEmpty && repMatches(pat, path)) {
        if (pat.length > bestLen ||
          (pat.length == bestLen && allow && !allowed)) {
          bestLen = pat.length
          allowed = allow
        }
      }
    }
    allowed
  }

  // --- URLs ---------------------------------------------------------------

  final case class ParsedUrl(scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  /** Hand-rolled URL parse (crawl-tolerant — `java.net.URI` throws on
    * half the real web). Returns None when there is no `scheme://host`
    * shape. Port −1 when absent; path defaults to "/"; query and
    * fragment empty when absent.
    */
  def parseUrl(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val s = url.trim
    val si = s.indexOf("://")
    if (si <= 0) return None
    val scheme = s.substring(0, si).toLowerCase
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-'))
      return None
    var i = si + 3
    val n = s.length
    val hostStart = i
    while (i < n && s.charAt(i) != '/' && s.charAt(i) != '?' &&
      s.charAt(i) != '#' && s.charAt(i) != ':') i += 1
    val host = s.substring(hostStart, i).toLowerCase
    if (host.isEmpty) return None
    var port = -1
    if (i < n && s.charAt(i) == ':') {
      val ps = i + 1
      i = ps
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i > ps)
        try port = s.substring(ps, i).toInt
        catch { case _: NumberFormatException => return None }
    }
    var path = ""
    if (i < n && s.charAt(i) == '/') {
      val p0 = i
      while (i < n && s.charAt(i) != '?' && s.charAt(i) != '#') i += 1
      path = s.substring(p0, i)
    }
    var query = ""
    if (i < n && s.charAt(i) == '?') {
      val q0 = i + 1
      i = q0
      while (i < n && s.charAt(i) != '#') i += 1
      query = s.substring(q0, i)
    }
    val fragment = if (i < n && s.charAt(i) == '#') s.substring(i + 1) else ""
    Some(ParsedUrl(scheme, host, port,
      if (path.isEmpty) "/" else path, query, fragment))
  }

  /** Common multi-label public suffixes (a deterministic subset of
    * the public-suffix idea — good enough for domain grouping; a full
    * PSL would be config data, not code).
    */
  private val secondLevelSuffixes: Set[String] = Set(
    "co", "com", "org", "net", "ac", "gov", "edu", "or", "ne")

  /** Registered domain for grouping/caps: last two labels, or last
    * three when the second-to-last is a known second-level suffix
    * under a 2-letter country code ("bbc.co.uk" → "bbc.co.uk", not
    * "co.uk"). IP literals and single-label hosts return as-is.
    */
  def registeredDomain(host: String): String = {
    if (host == null || host.isEmpty) return ""
    val labels = host.toLowerCase.split('.')
    if (labels.length <= 2) return host.toLowerCase
    if (labels.forall(l => l.nonEmpty && l.forall(_.isDigit)))
      return host.toLowerCase // IPv4 literal
    val tld = labels.last
    val sld = labels(labels.length - 2)
    val take =
      if (tld.length == 2 && secondLevelSuffixes.contains(sld)) 3 else 2
    labels.takeRight(take).mkString(".")
  }

  /** Canonical URL form for exact-dedup keys: lowercase scheme+host,
    * default ports dropped (http 80 / https 443), fragment dropped,
    * query KEPT with its parameters sorted by key (stable across
    * crawler orderings), trailing "?" removed, empty path → "/".
    */
  def normalizeUrl(url: String): Option[String] = parseUrl(url).map { u =>
    val portPart =
      if (u.port < 0 || (u.scheme == "http" && u.port == 80) ||
        (u.scheme == "https" && u.port == 443)) ""
      else s":${u.port}"
    val queryPart =
      if (u.query.isEmpty) ""
      else "?" + u.query.split('&').filter(_.nonEmpty).sortBy(p =>
        p.takeWhile(_ != '=')).mkString("&")
    s"${u.scheme}://${u.host}$portPart${u.path}$queryPart"
  }

  /** Spark wrapper: (id, scheme, host, domain, path, normalized) per
    * row; unparseable URLs drop (count them upstream if needed).
    */
  def parseUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions(_.flatMap { case (id, url) =>
        for {
          p <- parseUrl(url)
          norm <- normalizeUrl(url)
        } yield (id, p.scheme, p.host, registeredDomain(p.host), p.path, norm)
      })
      .toDF(idCol, "scheme", "host", "domain", "path", "normalized")
  }

  // --- compression-ratio quality signal -----------------------------------

  /** Deflate compression ratio of the UTF-8 text: compressed/raw
    * bytes. Natural text sits ~0.3-0.5; machine-generated repetition
    * approaches 0; already-compressed/encrypted junk approaches (or
    * exceeds) 1. The classic cheap complement to [[TextAnalysis
    * .charEntropy]] — entropy sees the symbol DISTRIBUTION, deflate
    * sees REPEATED STRUCTURE (a million distinct shuffled words have
    * high entropy AND high ratio; boilerplate repeated 1000× has high
    * entropy but ratio ≈ 0). Empty text → 1.0.
    */
  def compressionRatio(text: String, level: Int = 6): Double = {
    if (text == null || text.isEmpty) return 1.0
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(level)
    d.setInput(raw); d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / raw.length
  }

  /** Spark wrapper: (id, raw_bytes, compressed_bytes, ratio). */
  def compressionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions(_.map { case (id, text) =>
        val t = if (text == null) "" else text
        val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val ratio = compressionRatio(t)
        val compressed =
          if (raw.isEmpty) 0L else math.round(ratio * raw.length)
        (id, raw.length.toLong, compressed, ratio)
      })
      .toDF(idCol, "raw_bytes", "compressed_bytes", "ratio")
  }

  // --- outlink extraction / link graph -------------------------------------

  /** Href values of `<a>` tags in document order — the edge-list
    * input of the crawl link graph. Same one-pass scanner philosophy
    * as [[extractText]]: case-insensitive tag/attribute names,
    * single-/double-/un-quoted values, whitespace-tolerant `=`, no
    * regex per row. A malformed tag (no closing `>` / unterminated
    * quote) contributes nothing and scanning resumes after it.
    */
  def extractLinks(html: String): Seq[String] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 2 >= n) i = n
      else if ((html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
        html.charAt(lt + 2).isWhitespace) {
        var j = lt + 2
        var href: String = null
        while (j < n && html.charAt(j) != '>' && href == null) {
          if (html.regionMatches(true, j, "href", 0, 4) &&
            !Character.isLetterOrDigit(html.charAt(j - 1))) {
            var k = j + 4
            while (k < n && html.charAt(k).isWhitespace) k += 1
            if (k < n && html.charAt(k) == '=') {
              k += 1
              while (k < n && html.charAt(k).isWhitespace) k += 1
              if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                val ve = html.indexOf(html.charAt(k), k + 1)
                if (ve >= 0) { href = html.substring(k + 1, ve); j = ve }
                else j = n // unterminated quote: skip the rest
              } else { // unquoted value: up to whitespace or '>'
                var ve = k
                while (ve < n && !html.charAt(ve).isWhitespace &&
                  html.charAt(ve) != '>') ve += 1
                if (ve > k) href = html.substring(k, ve)
                j = ve
              }
            } else j = k
          } else j += 1
        }
        if (href != null) out += href
        val gt = html.indexOf('>', lt + 1)
        i = if (gt < 0) n else gt + 1
      } else i = lt + 1
    }
    out.toSeq
  }

  /** Resolve an href against its page URL (RFC-3986-lite, the crawl
    * subset): absolute http(s) passes through, `//` inherits the page
    * scheme, `/` is host-root-relative, anything else resolves
    * against the page path's directory. Fragments-only, `javascript:`,
    * `mailto:`, `data:` and `tel:` pseudo-links resolve to None.
    */
  def resolveLink(page: ParsedUrl, href0: String): Option[String] = {
    if (href0 == null) return None
    val href = href0.trim
    val low = href.toLowerCase
    if (href.isEmpty || href.startsWith("#") ||
      low.startsWith("javascript:") || low.startsWith("mailto:") ||
      low.startsWith("data:") || low.startsWith("tel:")) None
    else if (low.startsWith("http://") || low.startsWith("https://"))
      Some(href)
    else if (href.startsWith("//")) Some(page.scheme + ":" + href)
    else if (href.startsWith("/"))
      Some(s"${page.scheme}://${page.host}$href")
    else {
      val dir = page.path.substring(0, page.path.lastIndexOf('/') + 1)
      Some(s"${page.scheme}://${page.host}$dir$href")
    }
  }

  /** Spark wrapper: the crawl's outlink edge list — one row per
    * resolvable href, (id, src_host, href, resolved, dst_host).
    * Narrow mapPartitions kernel (nothing shuffles); aggregate to the
    * host graph with a groupBy(src_host, dst_host) downstream and
    * feed it straight into the graph suite (PageRank/HITS/k-core) —
    * hosts are the natural 100 TB-scale vertex set.
    */
  def linkEdges(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"),
        col(htmlCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.STRING))
      .mapPartitions(_.flatMap { case (id, url, html) =>
        parseUrl(url).toSeq.flatMap { page =>
          extractLinks(html).flatMap { href =>
            resolveLink(page, href).flatMap { resolved =>
              parseUrl(resolved).map(rp =>
                (id, page.host, href, resolved, rp.host))
            }
          }
        }
      })
      .toDF(idCol, "src_host", "href", "resolved", "dst_host")
  }
}
