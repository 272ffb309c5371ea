package graft.ml

/** Pure-JVM image codec — no external libraries, hand-parsed from the
  * PUBLIC format specifications. Replaces the former decode stub in
  * [[Multimodal]] for every format it recognizes:
  *
  *  - FULL pixel decode: BMP (uncompressed 24/32-bit, the Windows
  *    BITMAPINFOHEADER layout), binary netpbm PPM (P6) and PGM (P5);
  *  - header-only metadata (width/height/format): PNG (IHDR), GIF
  *    (logical screen descriptor), JPEG (SOF0/1/2 frame header) —
  *    the fast-metadata pass a 100 TB media crawl runs without
  *    paying for full decode;
  *  - real pixel kernels on decoded images: nearest-neighbor resize,
  *    BT.601 grayscale, and an 8×8 average-hash feature vector (the
  *    classic perceptual-dedup embedding).
  *
  * Decoded pixels are row-major top-down RGB (or single-channel
  * gray); BMP's bottom-up BGR rows and 4-byte row padding are
  * normalized away at decode.
  */
object ImageCodec {

  /** A decoded raster: `channels` is 3 (RGB) or 1 (gray); `pixels`
    * is row-major top-down, `width * height * channels` bytes.
    */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
  }

  // --- format detection / header-only metadata ---------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  def detect(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 10) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes(0) == 'P' && (bytes(1) == '6' || bytes(1) == '5') &&
      (bytes(2) == '\n' || bytes(2) == ' ' || bytes(2) == '\t' || bytes(2) == '\r'))
      Some(if (bytes(1) == '6') "ppm" else "pgm")
    else if (bytes.length >= 8 && u8(bytes, 0) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') Some("gif")
    else if (u8(bytes, 0) == 0xFF && u8(bytes, 1) == 0xD8) Some("jpeg")
    else None
  }

  /** (width, height, format) from the header alone — no pixel work. */
  def meta(bytes: Array[Byte]): Option[(Int, Int, String)] =
    detect(bytes).flatMap {
      case "bmp" if bytes.length >= 30 =>
        Some((le32(bytes, 18), math.abs(le32(bytes, 22)), "bmp"))
      case f @ ("ppm" | "pgm") =>
        pnmHeader(bytes).map { case (w, h, _, _) => (w, h, f) }
      case "png" if bytes.length >= 24 =>
        // IHDR is the first chunk: length(4) type(4) at offset 8,
        // width/height big-endian at 16/20
        if (bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
          bytes(15) == 'R') Some((be32(bytes, 16), be32(bytes, 20), "png"))
        else None
      case "gif" if bytes.length >= 10 =>
        Some((le16(bytes, 6), le16(bytes, 8), "gif"))
      case "jpeg" => jpegDims(bytes).map { case (w, h) => (w, h, "jpeg") }
      case _ => None
    }.filter { case (w, h, _) => w > 0 && h > 0 }

  /** Walk JPEG markers to the first SOF0/1/2 frame header. */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xFF) return None
      val marker = u8(b, i + 1)
      if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2)
        return Some((be16(b, i + 7), be16(b, i + 5)))
      else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** Parse a binary netpbm header: (width, height, maxval, dataOffset).
    * Handles '#' comments and arbitrary whitespace per the spec.
    */
  private def pnmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\t' || c == '\r') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 || i >= b.length) None
    else Some((w, h, mx, i + 1)) // single whitespace after maxval
  }

  // --- full pixel decode -------------------------------------------------

  def decode(bytes: Array[Byte]): Option[Image] = detect(bytes).flatMap {
    case "ppm" => decodePnm(bytes, 3)
    case "pgm" => decodePnm(bytes, 1)
    case "bmp" => decodeBmp(bytes)
    case _ => None // png/gif/jpeg: metadata only (entropy coding)
  }

  private def decodePnm(b: Array[Byte], ch: Int): Option[Image] =
    pnmHeader(b).flatMap { case (w, h, _, off) =>
      val n = w * h * ch
      if (b.length < off + n) None
      else Some(Image(w, h, ch, java.util.Arrays.copyOfRange(b, off, off + n)))
    }

  private def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (b.length < 54) return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val h = math.abs(rawH)
    val topDown = rawH < 0
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || compression != 0 || (bpp != 24 && bpp != 32))
      return None
    val bytesPerPx = bpp / 8
    val rowSize = ((w * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (b.length < dataOff + rowSize * h) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y // BMP default: bottom-up
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * rowSize + x * bytesPerPx
        val d = (y * w + x) * 3
        out(d) = b(s + 2) // BGR -> RGB
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, 3, out))
  }

  // --- pixel kernels -----------------------------------------------------

  /** Nearest-neighbor resample: target (tx, ty) reads source
    * (floor(tx*w/tw), floor(ty*h/th)) — the standard index map, exact
    * integer arithmetic (replayable by the oracle).
    */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0)
    val out = new Array[Byte](tw * th * img.channels)
    var ty = 0
    while (ty < th) {
      val sy = (ty.toLong * img.height / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = (tx.toLong * img.width / tw).toInt
        var c = 0
        while (c < img.channels) {
          out((ty * tw + tx) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    Image(tw, th, img.channels, out)
  }

  /** BT.601 integer luma: (299 r + 587 g + 114 b) / 1000. */
  def grayscale(img: Image): Image =
    if (img.channels == 1) img
    else {
      val out = new Array[Byte](img.width * img.height)
      var i = 0
      while (i < out.length) {
        val p = i * 3
        val y = (299 * (img.pixels(p) & 0xFF) + 587 * (img.pixels(p + 1) & 0xFF) +
          114 * (img.pixels(p + 2) & 0xFF)) / 1000
        out(i) = y.toByte
        i += 1
      }
      Image(img.width, img.height, 1, out)
    }

  /** Average-hash embedding: resize to 8×8 gray, center on the mean,
    * L2-normalize — 64 floats. The classic perceptual-dedup vector:
    * near-identical images land at cosine ≈ 1 regardless of scale.
    */
  def aHash64(img: Image): Array[Float] = {
    val g = resizeNearest(grayscale(img), 8, 8).pixels.map(_ & 0xFF)
    val mean = g.sum.toDouble / g.length
    val v = g.map(p => (p - mean).toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** Write P6/P5 (binary netpbm) — the round-trip encoder. */
  def encodePnm(img: Image): Array[Byte] = {
    val magic = if (img.channels == 1) "P5" else "P6"
    val header = s"$magic\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }
}
