package graft.ml

/** Pure-JVM image codec — no external libraries, hand-parsed from the
  * PUBLIC format specifications. Replaces the former decode stub in
  * [[Multimodal]] for every format it recognizes:
  *
  *  - FULL pixel decode: BMP (uncompressed 24/32-bit, the Windows
  *    BITMAPINFOHEADER layout), binary netpbm PPM (P6) and PGM (P5),
  *    PNG (8-bit gray / gray+alpha / RGB / RGBA / palette, all 5
  *    scanline filters, via the JVM's own zlib Inflater; Adam7
  *    interlace is rejected, not misdecoded), GIF (87a/89a LZW,
  *    global or local color table, interlaced or not, first frame),
  *    and baseline JPEG (via [[JpegCodec]]: Huffman + IDCT, 4:4:4 /
  *    4:2:2 / 4:2:0, restart markers; progressive rejected);
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
    case "png" => decodePng(bytes)
    case "gif" => decodeGif(bytes)
    case "jpeg" => JpegCodec.decode(bytes) // baseline sequential
    case _ => None
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

  /** Full PNG pixel decode (RFC 2083 / W3C PNG spec): 8-bit samples,
    * color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    * 6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
    * zlib inflate via `java.util.zip.Inflater`. Alpha channels are
    * DROPPED (straight truncation — the raster model is RGB/gray);
    * palette indices resolve through PLTE. Adam7 interlace is decoded
    * (7 passes, each its own filtered sub-image, scattered back by
    * the standard origin/step grid); bit depths other than 8 return
    * None rather than garbage pixels. Chunk CRCs are not validated
    * (lenient decode — a media crawl prefers salvage over strictness;
    * the ENCODER writes real CRCs).
    */
  private def decodePng(b: Array[Byte]): Option[Image] = {
    if (b.length < 33) return None
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
    var interlace = 0
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 12 + len > b.length) return None
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(b, i + 8); h = be32(b, i + 12)
          bitDepth = u8(b, i + 16); colorType = u8(b, i + 17)
          // compression (18) and filter method (19) must be 0
          if (u8(b, i + 18) != 0 || u8(b, i + 19) != 0) return None
          interlace = u8(b, i + 20)
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace > 1) return None
    val srcCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && (plte == null || plte.length % 3 != 0)) return None
    val bpp = srcCh // bytes per pixel at bit depth 8
    // guard absurd dimensions before allocating (w*h*ch can overflow)
    // (interlace overhead: ≤ h extra filter bytes per pass boundary)
    val rawLen =
      if (interlace == 0) h.toLong * (1L + w.toLong * srcCh)
      else adam7.map { case (x0, y0, dx, dy) =>
        val pw = passDim(w, x0, dx); val ph = passDim(h, y0, dy)
        if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + pw.toLong * srcCh)
      }.sum
    if (rawLen <= 0 || rawLen > Int.MaxValue - 64) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
      // a stream LONGER than IHDR promises means the geometry and the
      // pixel data disagree (e.g. an interlace flag flipped on a
      // non-interlaced body) — corrupt, don't scatter garbage
      if (!inf.finished()) {
        val extra = new Array[Byte](1)
        if (inf.inflate(extra, 0, 1) > 0) return None
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val stride = w * srcCh
    val px = new Array[Byte](h * stride)
    if (interlace == 0) {
      if (!defilter(raw, 0, px, w, h, bpp)) return None
    } else {
      // Adam7: each pass is an independently-filtered sub-image whose
      // pixels scatter back at (x0 + i·dx, y0 + j·dy)
      var rawOff = 0
      var p = 0
      while (p < 7) {
        val (x0, y0, dx, dy) = adam7(p)
        val pw = passDim(w, x0, dx); val ph = passDim(h, y0, dy)
        if (pw > 0 && ph > 0) {
          val sub = new Array[Byte](ph * pw * bpp)
          if (!defilter(raw, rawOff, sub, pw, ph, bpp)) return None
          rawOff += ph * (1 + pw * bpp)
          var j = 0
          while (j < ph) {
            var i2 = 0
            while (i2 < pw) {
              val dst = ((y0 + j * dy) * w + (x0 + i2 * dx)) * bpp
              System.arraycopy(sub, (j * pw + i2) * bpp, px, dst, bpp)
              i2 += 1
            }
            j += 1
          }
        }
        p += 1
      }
    }
    // normalize to the RGB/gray raster model
    colorType match {
      case 0 => Some(Image(w, h, 1, px))
      case 2 => Some(Image(w, h, 3, px))
      case 3 =>
        val out = new Array[Byte](w * h * 3)
        var k = 0
        while (k < w * h) {
          val idx = u8(px, k) * 3
          if (idx + 2 >= plte.length) return None
          out(k * 3) = plte(idx); out(k * 3 + 1) = plte(idx + 1)
          out(k * 3 + 2) = plte(idx + 2)
          k += 1
        }
        Some(Image(w, h, 3, out))
      case 4 =>
        val out = new Array[Byte](w * h)
        var k = 0
        while (k < out.length) { out(k) = px(k * 2); k += 1 }
        Some(Image(w, h, 1, out))
      case 6 =>
        val out = new Array[Byte](w * h * 3)
        var k = 0
        while (k < w * h) {
          out(k * 3) = px(k * 4); out(k * 3 + 1) = px(k * 4 + 1)
          out(k * 3 + 2) = px(k * 4 + 2)
          k += 1
        }
        Some(Image(w, h, 3, out))
      case _ => None
    }
  }

  /** Adam7 pass grid: (xOrigin, yOrigin, xStep, yStep) per pass. */
  private val adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pixels a pass covers along one axis: ceil((dim − origin) / step). */
  private def passDim(dim: Int, origin: Int, step: Int): Int =
    if (dim <= origin) 0 else (dim - origin + step - 1) / step

  /** Reconstruct `heightPx` filtered scanlines (each 1 filter byte +
    * widthPx·bpp data) from `raw` at `rawOff` into `out` (contiguous
    * rows). Returns false on an invalid filter type.
    */
  private def defilter(raw: Array[Byte], rawOff: Int, out: Array[Byte],
      widthPx: Int, heightPx: Int, bpp: Int): Boolean = {
    val stride = widthPx * bpp
    var y = 0
    while (y < heightPx) {
      val f = u8(raw, rawOff + y * (stride + 1))
      val src = rawOff + y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = u8(raw, src + x)
        val a = if (x >= bpp) u8(out, dst + x - bpp) else 0 // left
        val bb = if (y > 0) u8(out, dst - stride + x) else 0 // up
        val c = if (y > 0 && x >= bpp) u8(out, dst - stride + x - bpp) else 0
        val recon = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + bb
          case 3 => cur + ((a + bb) >> 1)
          case 4 =>
            // Paeth predictor
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
          case _ => return false
        }
        out(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    true
  }

  /** GIF87a/89a full decode of the FIRST image: LZW with variable
    * code width (spec appendix), global or local color table, Adam-
    * style 4-pass interlace undone. Extension blocks (graphic
    * control, comments, application) are skipped. Returns RGB; GIF
    * transparency (a palette index, not an alpha channel) is ignored.
    */
  private def decodeGif(b: Array[Byte]): Option[Image] = {
    if (b.length < 13) return None
    val packed = u8(b, 10)
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var i = 13
    var gct: Array[Byte] = null
    if (gctSize > 0) {
      if (i + gctSize * 3 > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, i, i + gctSize * 3)
      i += gctSize * 3
    }
    while (i < b.length) {
      u8(b, i) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          i += 1
        case 0x2C => // image descriptor
          if (i + 10 > b.length) return None
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val ip = u8(b, i + 9)
          val interlaced = (ip & 0x40) != 0
          val lctSize = if ((ip & 0x80) != 0) 2 << (ip & 7) else 0
          i += 10
          var table = gct
          if (lctSize > 0) {
            if (i + lctSize * 3 > b.length) return None
            table = java.util.Arrays.copyOfRange(b, i, i + lctSize * 3)
            i += lctSize * 3
          }
          if (table == null || iw <= 0 || ih <= 0) return None
          // untrusted 16-bit dims: bound iw*ih*3 in Long before any
          // Int-space allocation (65535*65535*3 overflows Int)
          if (iw.toLong * ih * 3 > Int.MaxValue - 64) return None
          val mcs = u8(b, i); i += 1
          if (mcs < 2 || mcs > 8) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && u8(b, i) != 0) {
            val n = u8(b, i)
            if (i + 1 + n > b.length) return None
            data.write(b, i + 1, n); i += 1 + n
          }
          val indices = lzwDecode(data.toByteArray, mcs, iw * ih)
            .getOrElse(return None)
          // undo interlace: rows arrive in passes 0,8.. 4,8.. 2,4.. 1,2..
          val rowOrder =
            if (!interlaced) (0 until ih).toArray
            else ((0 until ih by 8) ++ (4 until ih by 8) ++
              (2 until ih by 4) ++ (1 until ih by 2)).toArray
          val out = new Array[Byte](iw * ih * 3)
          var r = 0
          while (r < ih) {
            val destRow = rowOrder(r)
            var x = 0
            while (x < iw) {
              val idx = u8(indices, r * iw + x) * 3
              if (idx + 2 >= table.length) return None
              val d = (destRow * iw + x) * 3
              out(d) = table(idx); out(d + 1) = table(idx + 1)
              out(d + 2) = table(idx + 2)
              x += 1
            }
            r += 1
          }
          return Some(Image(iw, ih, 3, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW decode: variable code width starting at
    * `mcs`+1 bits, clear code 2^mcs, EOI clear+1, dictionary capped
    * at 4096 entries, width bumps when the next allocation crosses a
    * power of two. Emits exactly `n` pixel indices (extra input is
    * ignored; short input is an error).
    */
  private def lzwDecode(data: Array[Byte], mcs: Int, n: Int): Option[Array[Byte]] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var width = mcs + 1
    var bitPos = 0
    val out = new Array[Byte](n)
    var outPos = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def readCode(): Int = {
      if ((bitPos + width + 7) / 8 > data.length) return -1
      var v = 0; var got = 0
      while (got < width) {
        val byteI = (bitPos + got) / 8
        if (byteI >= data.length) return -1
        val bit = (data(byteI) >> ((bitPos + got) % 8)) & 1
        v |= bit << got
        got += 1
      }
      bitPos += width
      v
    }
    def expand(code0: Int): Int = { // push code's string, return first byte
      var code = code0
      var sp = 0
      while (code >= clear) { // composite entry
        stack(sp) = suffix(code); sp += 1; code = prefix(code)
      }
      val first = code
      // literal byte + reversed stack
      if (outPos < n) { out(outPos) = code.toByte; outPos += 1 }
      while (sp > 0 && outPos < n) {
        sp -= 1; out(outPos) = stack(sp); outPos += 1
      }
      first
    }
    while (outPos < n) {
      val code = readCode()
      if (code < 0 || code == eoi) return if (outPos == n) Some(out) else None
      if (code == clear) {
        dictSize = eoi + 1; width = mcs + 1; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None
        expand(code); prev = code
      } else {
        val first =
          if (code < dictSize) expand(code)
          else if (code == dictSize) { // KwKwK case
            // emit string(prev) + first(string(prev))
            var c = prev; while (c >= clear) c = prefix(c)
            expand(prev)
            if (outPos < n) { out(outPos) = c.toByte; outPos += 1 }
            c
          } else return None
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first.toByte
          dictSize += 1
        }
        // width bump: when the NEXT code to allocate needs more bits
        if (dictSize == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    Some(out)
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

  /** Difference hash (dHash): 64 bits from a 9×8 grayscale resize,
    * bit = left pixel < right neighbor — more robust to global
    * brightness/contrast shifts than [[aHash64]] (a gamma change
    * flips aHash bits near the mean but rarely flips adjacent-pixel
    * ORDER). Returned as a packed Long; near-duplicate distance =
    * Hamming via `java.lang.Long.bitCount(h1 ^ h2)`. The standard
    * complement: block on dHash bands, verify with aHash cosine.
    */
  def dHash64(img: Image): Long = {
    val g = resizeNearest(grayscale(img), 9, 8).pixels.map(_ & 0xFF)
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
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

  /** Write a spec-conformant PNG (real CRCs, real zlib stream) from a
    * raw raster: `channels` 1 (gray, color type 0), 2 (gray+alpha,
    * type 4), 3 (RGB, type 2) or 4 (RGBA, type 6); every scanline
    * filtered with `filterType` 0-4 (the encoder applies the FORWARD
    * filter, so each type exercises the decoder's matching
    * reconstruction); `interlaced` writes Adam7 (each pass an
    * independently-filtered sub-image). The round-trip partner of
    * [[decode]].
    */
  def encodePng(width: Int, height: Int, channels: Int,
      pixels: Array[Byte], filterType: Int = 0,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0)
    require(Set(1, 2, 3, 4)(channels), s"channels must be 1-4, got $channels")
    require(filterType >= 0 && filterType <= 4)
    require(pixels.length == width * height * channels)
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val bpp = channels
    // forward-filter a contiguous sub-image into `dst` at `dstOff`
    def filterInto(src: Array[Byte], pw: Int, ph: Int,
        dst: Array[Byte], dstOff: Int): Unit = {
      val stride = pw * bpp
      var y = 0
      while (y < ph) {
        dst(dstOff + y * (stride + 1)) = filterType.toByte
        var x = 0
        while (x < stride) {
          val cur = u8(src, y * stride + x)
          val a = if (x >= bpp) u8(src, y * stride + x - bpp) else 0
          val b = if (y > 0) u8(src, (y - 1) * stride + x) else 0
          val c = if (y > 0 && x >= bpp) u8(src, (y - 1) * stride + x - bpp)
            else 0
          val filtered = filterType match {
            case 0 => cur
            case 1 => cur - a
            case 2 => cur - b
            case 3 => cur - ((a + b) >> 1)
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          dst(dstOff + y * (stride + 1) + 1 + x) = filtered.toByte
          x += 1
        }
        y += 1
      }
    }
    val raw: Array[Byte] =
      if (!interlaced) {
        val r = new Array[Byte](height * (width * bpp + 1))
        filterInto(pixels, width, height, r, 0)
        r
      } else {
        // Adam7: gather each pass's sub-image, filter it independently
        val passes = adam7.map { case (x0, y0, dx, dy) =>
          (passDim(width, x0, dx), passDim(height, y0, dy), x0, y0, dx, dy)
        }.filter(p => p._1 > 0 && p._2 > 0)
        val total = passes.map { case (pw, ph, _, _, _, _) =>
          ph * (1 + pw * bpp)
        }.sum
        val r = new Array[Byte](total)
        var off = 0
        passes.foreach { case (pw, ph, x0, y0, dx, dy) =>
          val sub = new Array[Byte](pw * ph * bpp)
          var j = 0
          while (j < ph) {
            var i2 = 0
            while (i2 < pw) {
              System.arraycopy(pixels,
                ((y0 + j * dy) * width + (x0 + i2 * dx)) * bpp,
                sub, (j * pw + i2) * bpp, bpp)
              i2 += 1
            }
            j += 1
          }
          filterInto(sub, pw, ph, r, off)
          off += ph * (1 + pw * bpp)
        }
        r
      }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be(crc.getValue.toInt))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Write a GIF89a (one image frame) from palette indices: `palette`
    * is 3·256 RGB bytes (a full 8-bit global color table), `indices`
    * one byte per pixel. Uses the classic "uncompressed GIF" LZW
    * strategy — literal codes at min-code-size 8 with a clear code
    * re-emitted whenever the dictionary would force a width bump —
    * valid LZW that any conformant decoder (including [[decode]])
    * reads back bit-exact. `interlaced` writes rows in the 4-pass
    * order so the decoder's deinterlace is exercised.
    */
  def encodeGif(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0)
    require(palette.length == 768, s"palette must be 768 bytes")
    require(indices.length == width * height)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le(width); le(height)
    out.write(0x80 | 7) // GCT present, 2^(7+1)=256 entries
    out.write(0); out.write(0) // bg color, aspect
    out.write(palette)
    out.write(0x2C) // image descriptor
    le(0); le(0); le(width); le(height)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(8) // LZW min code size
    // bit-pack LSB-first at a fixed 9-bit width, clearing before the
    // dictionary (which grows by 1 per literal emitted) reaches 511
    val codes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += 9
      while (accBits >= 8) { codes.write((acc & 0xFF).toInt); acc >>= 8; accBits -= 8 }
    }
    val clear = 256; val eoi = 257
    val rowOrder =
      if (!interlaced) (0 until height).toArray
      else ((0 until height by 8) ++ (4 until height by 8) ++
        (2 until height by 4) ++ (1 until height by 2)).toArray
    emit(clear)
    var dictSize = eoi + 1
    rowOrder.foreach { y =>
      var x = 0
      while (x < width) {
        if (dictSize >= 511) { emit(clear); dictSize = eoi + 1 }
        emit(u8(indices, y * width + x))
        dictSize += 1
        x += 1
      }
    }
    emit(eoi)
    if (accBits > 0) codes.write((acc & 0xFF).toInt)
    // data sub-blocks of <= 255 bytes
    val cb = codes.toByteArray
    var off = 0
    while (off < cb.length) {
      val n = math.min(255, cb.length - off)
      out.write(n); out.write(cb, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
