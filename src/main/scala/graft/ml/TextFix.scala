package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Unicode text repair — the ftfy-shaped cleaning pass a crawl corpus
  * needs BEFORE tokenization: control-character scrubbing, unicode
  * punctuation/space normalization (both as pure Column expressions —
  * they run at scan speed and push down), and mojibake repair (the
  * UTF-8-read-as-Latin-1 double-encoding class) as a narrow JVM
  * kernel. The reference repo has no unicode handling; training-data
  * superset.
  */
object TextFix {

  /** Strip C0/C1 control characters (keeping \n and \t), the BOM /
    * zero-width family, and the soft hyphen — pure Column expression.
    */
  def stripControls(text: Column): Column =
    regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u0080-\\u009F" +
        "\\uFEFF\\u200B\\u200C\\u200D\\u00AD]", "")

  /** Normalize typographic unicode to ASCII: curly quotes, en/em
    * dashes, ellipsis, unicode spaces → their plain forms. Column
    * expression (translate + one regexp for multi-char targets).
    */
  def normalizePunct(text: Column): Column = {
    val spaces = regexp_replace(text,
      "[\\u00A0\\u2000-\\u200A\\u202F\\u205F\\u3000]", " ")
    val ell = regexp_replace(spaces, "\\u2026", "...")
    translate(ell,
      "‘’‚‛“”„‟–—―−",
      "''''\"\"\"\"----")
  }

  /** The composed scan-speed cleaning pass. */
  def cleanUnicode(text: Column): Column =
    normalizePunct(stripControls(text))

  // --- mojibake ----------------------------------------------------------

  /** Does the string show the UTF-8-as-Latin-1 signature? (Ã/Â/â
    * followed by continuation-range characters — the famous "Ã©".)
    */
  def looksMojibake(s: String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if ((c == 'Ã' || c == 'Â' || c == 'â' || c == 'Å' || c == 'Î' ||
        c == 'Ð' || c == 'Ñ') && s.charAt(i + 1) >= 0x80 &&
        s.charAt(i + 1) <= 0xBF) return true
      i += 1
    }
    false
  }

  /** Repair UTF-8-read-as-Latin-1 mojibake: reinterpret the string's
    * Latin-1 bytes as UTF-8; accept the result only when it decodes
    * cleanly (strict CharsetDecoder — no replacement characters) AND
    * the input showed the mojibake signature. Up to `maxRounds`
    * passes (double-encoded text needs two). Non-mojibake text passes
    * through untouched — the repair can never fire on plain ASCII
    * (multi-byte signatures require chars ≥ 0x80).
    */
  def repairMojibake(s: String, maxRounds: Int = 2): String = {
    var cur = s
    var round = 0
    while (round < maxRounds && looksMojibake(cur) && isLatin1(cur)) {
      val bytes = cur.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try {
        cur = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      } catch {
        case _: java.nio.charset.CharacterCodingException => round = maxRounds
      }
      round += 1
    }
    cur
  }

  private def isLatin1(s: String): Boolean = s.forall(_ <= 0xFF)

  /** Unicode canonical composition (NFC): combining sequences
    * collapse to their precomposed forms, so visually identical
    * strings hash/compare identically — run it BEFORE any
    * fingerprint/dedup step on crawl text (the same page arrives in
    * both forms routinely). Narrow kernel over java.text.Normalizer;
    * returns the input plus `(textCol)_nfc` and a `composed` flag.
    * (NFKC — compatibility folding — is deliberately NOT the default:
    * it destroys meaning-bearing distinctions like ² vs 2; pass
    * `compat = true` where that trade is wanted.)
    */
  def normalizeNfc(df: DataFrame, idCol: String, textCol: String,
      compat: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val form =
      if (compat) java.text.Normalizer.Form.NFKC
      else java.text.Normalizer.Form.NFC
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions(_.map { case (id, t) =>
        val s = if (t == null) "" else t
        val n = java.text.Normalizer.normalize(s, form)
        (id, s, n, n != s)
      })
      .toDF(idCol, textCol, s"${textCol}_nfc", "composed")
  }

  /** Spark wrapper: (id, text, repaired, changed) — mojibake repair +
    * the Column cleaning pass in one narrow kernel + projection.
    */
  def fixText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val repaired = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions(_.map { case (id, t) =>
        val s = if (t == null) "" else t
        val r = repairMojibake(s)
        (id, s, r, r != s)
      })
      .toDF(idCol, textCol, "__repaired", "changed")
    repaired.select(col(idCol), col(textCol),
      cleanUnicode(col("__repaired")).as("repaired"), col("changed"))
  }
}
