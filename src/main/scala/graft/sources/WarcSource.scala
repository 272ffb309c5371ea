package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, the Common Crawl / Internet Archive format)
  * reader — hand-parsed from the public spec, no external libraries:
  * a WARC file is a sequence of records, each
  *
  * {{{
  * WARC/1.0\r\n
  * <name>: <value>\r\n ...          (record headers)
  * \r\n
  * <Content-Length bytes of block>
  * \r\n\r\n                         (record separator)
  * }}}
  *
  * For `response` records the block is an HTTP response: status line,
  * HTTP headers, blank line, body — [[parseRecord]] splits those too,
  * so the returned body is the actual page payload ready for
  * [[graft.ml.Web.extractText]].
  *
  * Scale shape: files are read whole (`binaryFile` source) and split
  * into records in a narrow mapPartitions kernel — one task per file,
  * parallelism = file count, exactly how WARC archives ship (tens of
  * thousands of ~1 GB segment files). Records that fail to parse are
  * skipped, not fatal (salvage-lenient like every crawl-facing
  * kernel here). Gzip members (.warc.gz per-record compression) are
  * inflated with the JVM's GZIPInputStream when the magic matches.
  */
object WarcSource {

  /** One parsed record: WARC headers of interest + the payload body
    * (HTTP headers stripped for response records).
    */
  final case class WarcRecord(file: String, recordType: String,
      targetUri: String, date: String, contentType: String,
      httpStatus: Int, body: Array[Byte])

  /** Parse one WARC file's bytes into records. */
  def parseFile(name: String, bytes: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F &&
        (bytes(1) & 0xFF) == 0x8B) gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    while (i < data.length) {
      parseRecord(name, data, i) match {
        case Some((rec, next)) =>
          rec.foreach(out += _)
          i = next
        case None => i = data.length // unrecoverable tail
      }
    }
    out.result()
  }

  /** Concatenated-member gzip (the .warc.gz convention: one member
    * per record — GZIPInputStream handles member concatenation).
    */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // salvage partial
    finally in.close()
    out.toByteArray
  }

  /** Parse the record at `from`; returns (record-or-skip, nextOffset),
    * or None when no further record can be located.
    */
  private def parseRecord(file: String, b: Array[Byte],
      from: Int): Option[(Option[WarcRecord], Int)] = {
    // locate "WARC/" at or after `from`
    var i = from
    while (i + 5 <= b.length &&
      !(b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
        b(i + 3) == 'C' && b(i + 4) == '/')) i += 1
    if (i + 5 > b.length) return None
    // read header lines to the blank line
    var p = lineEnd(b, i)
    val headers = scala.collection.mutable.Map[String, String]()
    var done = false
    while (!done && p < b.length) {
      val e = lineEnd(b, p)
      val line = new String(b, p, lineLen(b, p, e),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (line.isEmpty) done = true
      else {
        val c = line.indexOf(':')
        if (c > 0)
          headers(line.substring(0, c).trim.toLowerCase) =
            line.substring(c + 1).trim
      }
      p = e
    }
    val len = headers.get("content-length").flatMap(s =>
      try Some(s.toInt) catch { case _: NumberFormatException => None })
      .getOrElse(return Some((None, p)))
    if (len < 0 || p + len > b.length) return Some((None, b.length))
    val block = java.util.Arrays.copyOfRange(b, p, p + len)
    val next = p + len
    val recType = headers.getOrElse("warc-type", "")
    val rec =
      if (recType != "response" && recType != "resource" &&
        recType != "conversion") None
      else {
        val (status, ctype, body) =
          if (recType == "response" &&
            headers.getOrElse("content-type", "")
              .startsWith("application/http")) splitHttp(block)
          else (0, headers.getOrElse("content-type", ""), block)
        Some(WarcRecord(file, recType,
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""), ctype, status, body))
      }
    Some((rec, next))
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    math.min(b.length, i + 1)
  }

  private def lineLen(b: Array[Byte], from: Int, end: Int): Int = {
    var len = end - from
    if (len > 0 && b(from + len - 1) == '\n') len -= 1
    if (len > 0 && b(from + len - 1) == '\r') len -= 1
    len
  }

  /** Split an HTTP response block: (status, content-type, body). */
  private def splitHttp(block: Array[Byte]): (Int, String, Array[Byte]) = {
    var p = 0
    var status = 0
    var ctype = ""
    var first = true
    var done = false
    while (!done && p < block.length) {
      val e = lineEnd(block, p)
      val line = new String(block, p, lineLen(block, p, e),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (line.isEmpty) done = true
      else if (first) {
        first = false
        val parts = line.split(" ")
        if (parts.length >= 2)
          status = try parts(1).toInt catch {
            case _: NumberFormatException => 0
          }
      } else {
        val c = line.indexOf(':')
        if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("content-type"))
          ctype = line.substring(c + 1).trim
      }
      p = e
    }
    (status, ctype, java.util.Arrays.copyOfRange(block, p, block.length))
  }

  /** Read WARC files into a DataFrame of
    * (file, record_type, url, warc_date, content_type, http_status,
    * body) — one task per file, the archive-native parallelism.
    */
  def read(spark: SparkSession, paths: String*): DataFrame = {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[WarcRecord]
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.flatMap { case (path, bytes) =>
        parseFile(path, bytes)
      })
      .toDF("file", "record_type", "url", "warc_date", "content_type",
        "http_status", "body")
  }

  /** Build one WARC response record's bytes (the round-trip partner —
    * tests and fixtures; `gzip` wraps it as one .warc.gz member).
    */
  def writeRecord(targetUri: String, date: String, htmlBody: String,
      status: Int = 200, gzip: Boolean = false): Array[Byte] = {
    val body = htmlBody.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val http = (s"HTTP/1.1 $status OK\r\n" +
      "Content-Type: text/html\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val block = http ++ body
    val rec = (s"WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      block ++ "\r\n\r\n".getBytes
    if (!gzip) rec
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(rec); gz.close()
      bos.toByteArray
    }
  }
}
