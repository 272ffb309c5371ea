package graft.ml

/** Pure-JVM baseline JPEG codec — hand-built from the PUBLIC ITU-T
  * T.81 specification (the JPEG standard) with the Annex K example
  * quantization and Huffman tables. No external imaging libraries.
  *
  *  - DECODER: baseline + extended sequential DCT (SOF0/SOF1),
  *    8-bit samples, grayscale or YCbCr, chroma sampling factors 1-2
  *    (4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn), multiple
  *    DQT/DHT segments, APPn/COM skipped. Progressive (SOF2),
  *    arithmetic coding, and 12-bit precision return None — rejected,
  *    never misdecoded.
  *  - ENCODER: baseline sequential, 4:4:4 (no subsampling), grayscale
  *    or color, Annex K tables scaled by the libjpeg quality formula
  *    (q<50 → 5000/q, else 200−2q; quality 100 → all-ones tables, the
  *    near-lossless setting the round-trip specs pin).
  *
  * JPEG is lossy: round-trips are pinned by ERROR BOUNDS (DCT/IDCT
  * float rounding stays within a few code values at quality 100), not
  * bit equality — the q_multimodal_jpeg gate reports dims exactly and
  * the error bound as a self-verifying boolean, the style the
  * semantic-dedup recall and DIMSUM error gates use.
  *
  * Upstream reference for the scalding-era multimodal surface: the
  * reference repo has no media handling at all (scalding-commons
  * sources are byte/record codecs only) — this is part of the
  * training-data superset, not a port.
  */
object JpegCodec {
  import ImageCodec.Image

  // --- shared tables (ITU T.81 Annex K — public spec constants) ----------

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val stdQuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val stdQuantChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val dcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumVals = (0 to 11).toArray
  private val dcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromVals = (0 to 11).toArray

  private val acLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private val acChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // precomputed cos((2x+1)·u·π/16) for the naive separable DCT/IDCT
  private val cosTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private def cC(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // --- encoder ------------------------------------------------------------

  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { t =>
      math.max(1, math.min(255, (t * scale + 50) / 100))
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(value: Int, len: Int): Unit = {
      acc = (acc << len) | (value & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad final byte with 1s per spec
      val pad = 8 - nbits
      put((1 << pad) - 1, pad)
    }
  }

  /** Canonical Huffman code assignment: (symbol → (code, length)). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  /** Encode a raster as baseline JPEG. 3-channel input → YCbCr
    * (4:2:0 when `chromaSubsample`, else 4:4:4); 1-channel →
    * grayscale single-component scan. `restartInterval` > 0 emits
    * DRI + RSTn markers every that many MCUs (and exercises the
    * decoder's restart path).
    */
  def encode(img: Image, quality: Int = 90,
      chromaSubsample: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"jpeg encode expects 1 or 3 channels, got ${img.channels}")
    require(restartInterval >= 0)
    val w = img.width; val h = img.height
    val gray = img.channels == 1
    val qLum = scaleQuant(stdQuantLum, quality)
    val qChrom = scaleQuant(stdQuantChrom, quality)

    // full-resolution YCbCr (or gray) planes
    val nComp = if (gray) 1 else 3
    val full = Array.ofDim[Double](nComp, w * h)
    var i = 0
    while (i < w * h) {
      if (gray) full(0)(i) = (img.pixels(i) & 0xFF).toDouble
      else {
        val r = (img.pixels(i * 3) & 0xFF).toDouble
        val g = (img.pixels(i * 3 + 1) & 0xFF).toDouble
        val b = (img.pixels(i * 3 + 2) & 0xFF).toDouble
        full(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b
        full(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        full(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      }
      i += 1
    }
    val sub = !gray && chromaSubsample
    // per-component: (plane, planeW, planeH, hFactor, vFactor)
    final case class Plane(data: Array[Double], pw: Int, ph: Int,
        hf: Int, vf: Int)
    val planes: Array[Plane] =
      if (gray) Array(Plane(full(0), w, h, 1, 1))
      else if (!sub) Array(Plane(full(0), w, h, 1, 1),
        Plane(full(1), w, h, 1, 1), Plane(full(2), w, h, 1, 1))
      else {
        // box-average 2×2 chroma downsample (edge-replicating)
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        def down(src: Array[Double]): Array[Double] = {
          val d = new Array[Double](cw * ch)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              val x0 = 2 * x; val x1 = math.min(w - 1, 2 * x + 1)
              val y0 = 2 * y; val y1 = math.min(h - 1, 2 * y + 1)
              d(y * cw + x) = (src(y0 * w + x0) + src(y0 * w + x1) +
                src(y1 * w + x0) + src(y1 * w + x1)) / 4.0
              x += 1
            }
            y += 1
          }
          d
        }
        Array(Plane(full(0), w, h, 2, 2),
          Plane(down(full(1)), cw, ch, 1, 1),
          Plane(down(full(2)), cw, ch, 1, 1))
      }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    // APP0 / JFIF
    marker(0xE0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    u16(1); u16(1); out.write(0); out.write(0)
    // DQT: table 0 (lum), table 1 (chrom) — zigzag order
    marker(0xDB); u16(2 + (if (gray) 65 else 130))
    out.write(0x00)
    zigzag.foreach(z => out.write(qLum(z)))
    if (!gray) {
      out.write(0x01)
      zigzag.foreach(z => out.write(qChrom(z)))
    }
    // SOF0
    marker(0xC0); u16(8 + 3 * nComp)
    out.write(8); u16(h); u16(w); out.write(nComp)
    for (c <- 0 until nComp) {
      out.write(c + 1) // component id
      out.write((planes(c).hf << 4) | planes(c).vf)
      out.write(if (c == 0) 0 else 1) // quant table
    }
    // DHT: 4 tables (2 for grayscale)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, dcLumBits, dcLumVals)
    dht(1, 0, acLumBits, acLumVals)
    if (!gray) {
      dht(0, 1, dcChromBits, dcChromVals)
      dht(1, 1, acChromBits, acChromVals)
    }
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    // SOS
    marker(0xDA); u16(6 + 2 * nComp)
    out.write(nComp)
    for (c <- 0 until nComp) {
      out.write(c + 1)
      out.write(if (c == 0) 0x00 else 0x11) // dc/ac table ids
    }
    out.write(0); out.write(63); out.write(0)

    val dcCodes = Array(buildCodes(dcLumBits, dcLumVals),
      buildCodes(dcChromBits, dcChromVals))
    val acCodes = Array(buildCodes(acLumBits, acLumVals),
      buildCodes(acChromBits, acChromVals))
    val bw = new BitWriter(out)
    val prevDc = new Array[Int](nComp)
    val maxH = planes.map(_.hf).max
    val maxV = planes.map(_.vf).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var rstN = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xD0 + rstN)
        rstN = (rstN + 1) % 8
        java.util.Arrays.fill(prevDc, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < nComp) {
        val pl = planes(c)
        val tbl = if (c == 0) 0 else 1
        val quant = if (c == 0) qLum else qChrom
        var vb = 0
        while (vb < pl.vf) {
          var hb = 0
          while (hb < pl.hf) {
            val baseX = (mx * pl.hf + hb) * 8
            val baseY = (my * pl.vf + vb) * 8
            // extract 8×8 with edge replication, level shift
            var yy = 0
            while (yy < 8) {
              val sy = math.min(pl.ph - 1, baseY + yy)
              var xx = 0
              while (xx < 8) {
                val sx = math.min(pl.pw - 1, baseX + xx)
                block(yy * 8 + xx) = pl.data(sy * pl.pw + sx) - 128.0
                xx += 1
              }
              yy += 1
            }
            // forward DCT + quantize (natural order)
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                var sum = 0.0
                var y0 = 0
                while (y0 < 8) {
                  var x0 = 0
                  while (x0 < 8) {
                    sum += block(y0 * 8 + x0) * cosTab(x0 * 8 + u) *
                      cosTab(y0 * 8 + v)
                    x0 += 1
                  }
                  y0 += 1
                }
                val g = 0.25 * cC(u) * cC(v) * sum
                coef(v * 8 + u) = math.round(g / quant(v * 8 + u)).toInt
                u += 1
              }
              v += 1
            }
            // entropy encode: DC diff + AC runs over zigzag order
            val dc = coef(0)
            val diff = dc - prevDc(c)
            prevDc(c) = dc
            val s = category(diff)
            val (dcode, dlen) = dcCodes(tbl)(s)
            bw.put(dcode, dlen)
            if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            var run = 0
            var k = 1
            while (k < 64) {
              val ac = coef(zigzag(k))
              if (ac == 0) run += 1
              else {
                while (run >= 16) {
                  val (zc, zl) = acCodes(tbl)(0xF0); bw.put(zc, zl); run -= 16
                }
                val sz = category(ac)
                val (acd, acl) = acCodes(tbl)((run << 4) | sz)
                bw.put(acd, acl)
                bw.put(if (ac < 0) ac + (1 << sz) - 1 else ac, sz)
                run = 0
              }
              k += 1
            }
            if (run > 0) { val (e, el) = acCodes(tbl)(0x00); bw.put(e, el) }
            hb += 1
          }
          vb += 1
        }
        c += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // --- decoder ------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // standard mincode/maxcode/valptr decode (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    /** Next entropy bit; handles 0xFF00 unstuffing. At a real marker
      * sets hitMarker and returns 0s (the caller checks).
      */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < data.length) data(pos) & 0xFF else 0xD9
          if (b2 == 0x00) pos += 1 // stuffed
          else { hitMarker = true; pos -= 1; return 0 }
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = { nbits = 0 }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // corrupt
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable = 0
    var acTable = 0
  }

  /** Decode a baseline/extended-sequential JPEG to gray or RGB.
    * Truncated/corrupt streams return None (salvage-lenient: a media
    * crawl hits clipped payloads constantly and must skip, not throw).
    */
  def decode(bytes: Array[Byte]): Option[Image] =
    try decodeUnsafe(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException     => None
    }

  private def decodeUnsafe(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
      (bytes(1) & 0xFF) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      val m = bytes(i + 1) & 0xFF
      if (m == 0xD9) return None // EOI before scan
      val len = u16(i + 2)
      m match {
        case 0xDB => // DQT: one or more tables
          var p = i + 4
          val end = i + 2 + len
          while (p < end) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0x0F
            if (pq != 0) return None // 16-bit tables: reject
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(zigzag(k)) = bytes(p + 1 + k) & 0xFF; k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xC4 => // DHT
          var p = i + 4
          val end = i + 2 + len
          while (p < end) {
            val tc = (bytes(p) & 0xFF) >> 4
            val th = bytes(p) & 0x0F
            val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xFF)
            val n = bits.sum
            val vals = Array.tabulate(n)(k => bytes(p + 17 + k) & 0xFF)
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            p += 17 + n
          }
        case 0xC0 | 0xC1 => // SOF0/1 baseline-compatible
          if ((bytes(i + 4) & 0xFF) != 8) return None // precision
          h = u16(i + 5); w = u16(i + 7)
          val nc = bytes(i + 9) & 0xFF
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { c =>
            val p = i + 10 + c * 3
            Component(bytes(p) & 0xFF, (bytes(p + 1) & 0xFF) >> 4,
              bytes(p + 1) & 0x0F, bytes(p + 2) & 0xFF)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2))
            return None
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
          0xCD | 0xCE | 0xCF =>
          return None // progressive / hierarchical / arithmetic
        case 0xDD => restartInterval = u16(i + 4)
        case 0xDA => // SOS — entropy data follows
          if (comps == null || w <= 0 || h <= 0) return None
          val ns = bytes(i + 4) & 0xFF
          if (ns != comps.length) return None
          var p = i + 5
          var c = 0
          while (c < ns) {
            val cid = bytes(p) & 0xFF
            val comp = comps.find(_.id == cid).getOrElse(return None)
            comp.dcTable = (bytes(p + 1) & 0xFF) >> 4
            comp.acTable = bytes(p + 1) & 0x0F
            p += 2; c += 1
          }
          p += 3 // Ss, Se, Ah/Al
          return decodeScan(bytes, p, w, h, comps, quant, dcTabs, acTabs,
            restartInterval)
        case _ => () // APPn, COM, others: skip
      }
      i += 2 + len
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int): Option[Image] = {
    // per T.81 a non-interleaved (single-component) scan has MCU = 1
    // data unit regardless of the SOF sampling factors; honoring the
    // factors here would misdecode valid grayscale files with h=v=2
    if (comps.length == 1 && (comps(0).h != 1 || comps(0).v != 1)) {
      val c0 = comps(0)
      val r = Component(c0.id, 1, 1, c0.tq)
      r.dcTable = c0.dcTable; r.acTable = c0.acTable
      comps(0) = r
    }
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // per-component full plane at ITS resolution; untrusted 16-bit
    // dims → bound the plane size in Long before Int-space allocation
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    if (comps.indices.exists(ci =>
        planeW(ci).toLong * planeH(ci) > Int.MaxValue - 64) ||
      w.toLong * h * 3 > Int.MaxValue - 64) return None
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    val br = new BitReader(bytes, start)
    val prevDc = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn: byte-align, consume marker, reset predictors
        br.byteAlign()
        br.hitMarker = false
        if (br.pos + 1 < bytes.length && (bytes(br.pos) & 0xFF) == 0xFF) {
          val m = bytes(br.pos + 1) & 0xFF
          if (m >= 0xD0 && m <= 0xD7) br.pos += 2 else return None
        } else return None
        java.util.Arrays.fill(prevDc, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val q = quant(comp.tq)
        if (q == null) return None
        val dcT = dcTabs(comp.dcTable)
        val acT = acTabs(comp.acTable)
        if (dcT == null || acT == null) return None
        var vb = 0
        while (vb < comp.v) {
          var hb = 0
          while (hb < comp.h) {
            // --- one block ---
            java.util.Arrays.fill(coef, 0)
            val s = br.decodeHuff(dcT)
            if (s < 0 || br.hitMarker) return None
            val diff = extend(br.bits(s), s)
            prevDc(ci) += diff
            coef(0) = prevDc(ci) * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = br.decodeHuff(acT)
              if (rs < 0 || br.hitMarker) return None
              val r = rs >> 4
              val sz = rs & 0x0F
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true     // EOB
              } else {
                k += r
                if (k > 63) return None
                val zz = zigzag(k)
                coef(zz) = extend(br.bits(sz), sz) * q(zz)
                k += 1
              }
            }
            // IDCT
            var y0 = 0
            while (y0 < 8) {
              var x0 = 0
              while (x0 < 8) {
                var sum = 0.0
                var v = 0
                while (v < 8) {
                  var u = 0
                  while (u < 8) {
                    val cuv = coef(v * 8 + u)
                    if (cuv != 0)
                      sum += cC(u) * cC(v) * cuv *
                        cosTab(x0 * 8 + u) * cosTab(y0 * 8 + v)
                    u += 1
                  }
                  v += 1
                }
                px(y0 * 8 + x0) = sum / 4.0 + 128.0
                x0 += 1
              }
              y0 += 1
            }
            // write block into the component plane
            val baseX = (mx * comp.h + hb) * 8
            val baseY = (my * comp.v + vb) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val value = math.max(0, math.min(255,
                  math.round(px(yy * 8 + xx)).toInt))
                planes(ci)((baseY + yy) * planeW(ci) + baseX + xx) = value
                xx += 1
              }
              yy += 1
            }
            hb += 1
          }
          vb += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble: upsample chroma by factor replication, color convert
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      val sx = comps.map(c => maxH / c.h)
      val sy = comps.map(c => maxV / c.v)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)((y / sy(0)) * planeW(0) + x / sx(0)).toDouble
          val cb = planes(1)((y / sy(1)) * planeW(1) + x / sx(1)) - 128.0
          val cr = planes(2)((y / sy(2)) * planeW(2) + x / sx(2)) - 128.0
          val d = (y * w + x) * 3
          out(d) = clamp8(yv + 1.402 * cr)
          out(d + 1) = clamp8(yv - 0.344136 * cb - 0.714136 * cr)
          out(d + 2) = clamp8(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 3, out))
    }
  }

  private def clamp8(v: Double): Byte =
    math.max(0, math.min(255, math.round(v).toInt)).toByte
}
