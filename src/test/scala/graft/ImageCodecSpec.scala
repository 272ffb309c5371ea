package graft

import org.apache.spark.sql.functions._
import graft.ml.{ImageCodec, Multimodal}
import graft.ml.ImageCodec.Image

/** The hand-rolled image codec against hand-built format fixtures:
  * every byte below is written out from the public format specs, so a
  * parse error can't hide behind a library round-trip.
  */
class ImageCodecSpec extends SparkSpec {

  // --- fixture builders --------------------------------------------------

  /** Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER). */
  private def bmp24(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up rows, BGR, padded to 4 bytes
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val (r, g, b) = rgb(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until rowSize).foreach(_ => out.put(0.toByte))
    }
    out.array()
  }

  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC (unchecked by the header parser)
    out.array()
  }

  private def gifHeader(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  /** Minimal JPEG: SOI, one APP0 to skip, then SOF0 with the dims. */
  private def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 4 + 2 + 2 + 2 + 9)
    out.put(0xFF.toByte).put(0xD8.toByte)                  // SOI
    out.put(0xFF.toByte).put(0xE0.toByte).putShort(4)      // APP0, len 4
    out.putShort(0)                                        // APP0 payload
    out.put(0xFF.toByte).put(0xC0.toByte).putShort(9)      // SOF0, len 9
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(1.toByte)
    out.array()
  }

  // --- decode ------------------------------------------------------------

  test("BMP 24-bit decode normalizes bottom-up BGR padded rows to top-down RGB") {
    // 3×2 image, pixel (x,y) = (x*10, y*10, x+y) — row padding = 3 bytes
    val bytes = bmp24(3, 2, (x, y) => (x * 10, y * 10, x + y))
    assert(ImageCodec.detect(bytes).contains("bmp"))
    assert(ImageCodec.meta(bytes).contains((3, 2, "bmp")))
    val img = ImageCodec.decode(bytes).get
    assert((img.width, img.height, img.channels) == (3, 2, 3))
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val p = (y * 3 + x) * 3
      ((img.pixels(p) & 0xFF), (img.pixels(p + 1) & 0xFF), (img.pixels(p + 2) & 0xFF))
    }
    for (y <- 0 until 2; x <- 0 until 3)
      assert(px(x, y) == (x * 10, y * 10, x + y), s"pixel ($x,$y)")
  }

  test("PPM/PGM round-trip through the binary netpbm encoder, with header comments") {
    val img = Image(4, 3, 3, Array.tabulate(36)(i => (i * 7).toByte))
    val back = ImageCodec.decode(ImageCodec.encodePnm(img)).get
    assert(back == img.copy(pixels = back.pixels) && back.pixels.sameElements(img.pixels))
    val gray = Image(5, 2, 1, Array.tabulate(10)(i => (200 - i).toByte))
    val gback = ImageCodec.decode(ImageCodec.encodePnm(gray)).get
    assert(gback.channels == 1 && gback.pixels.sameElements(gray.pixels))
    // spec allows comments and arbitrary whitespace in the header
    val commented = ("P6\n# a comment\n 4\t3 #inline\n255\n").getBytes("US-ASCII") ++
      img.pixels
    val c = ImageCodec.decode(commented).get
    assert((c.width, c.height) == (4, 3) && c.pixels.sameElements(img.pixels))
  }

  test("PNG, GIF and JPEG headers yield metadata without pixel decode") {
    assert(ImageCodec.meta(pngHeader(640, 480)).contains((640, 480, "png")))
    assert(ImageCodec.meta(gifHeader(320, 200)).contains((320, 200, "gif")))
    assert(ImageCodec.meta(jpegHeader(1024, 768)).contains((1024, 768, "jpeg")))
    assert(ImageCodec.decode(pngHeader(640, 480)).isEmpty) // no IDAT
    // garbage stays unrecognized (the stub-fallback contract)
    assert(ImageCodec.detect("not an image at all".getBytes).isEmpty)
  }

  // --- PNG full decode ---------------------------------------------------

  test("PNG round-trips 8-bit gray/RGB under all 5 scanline filters") {
    val rnd = new scala.util.Random(13)
    for {
      ch <- Seq(1, 3)
      filter <- 0 to 4
    } {
      val (w, h) = (11, 7) // odd dims: exercises non-aligned strides
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val bytes = ImageCodec.encodePng(w, h, ch, px, filter)
      assert(ImageCodec.detect(bytes).contains("png"))
      assert(ImageCodec.meta(bytes).contains((w, h, "png")))
      val dec = ImageCodec.decode(bytes)
        .getOrElse(fail(s"decode failed: ch=$ch filter=$filter"))
      assert((dec.width, dec.height, dec.channels) == ((w, h, ch)),
        s"ch=$ch filter=$filter")
      assert(dec.pixels.sameElements(px), s"pixels differ: ch=$ch filter=$filter")
    }
  }

  test("PNG alpha channels (gray+alpha, RGBA) decode by dropping alpha") {
    val rnd = new scala.util.Random(17)
    for (filter <- 0 to 4) {
      val (w, h) = (6, 5)
      // RGBA: planted rgb + varying alpha
      val rgba = Array.fill(w * h * 4)(rnd.nextInt(256).toByte)
      val decRgba = ImageCodec.decode(
        ImageCodec.encodePng(w, h, 4, rgba, filter)).get
      assert(decRgba.channels == 3)
      val wantRgb = Array.tabulate(w * h * 3) { i =>
        rgba((i / 3) * 4 + i % 3)
      }
      assert(decRgba.pixels.sameElements(wantRgb), s"rgba filter=$filter")
      // gray+alpha
      val ga = Array.fill(w * h * 2)(rnd.nextInt(256).toByte)
      val decGa = ImageCodec.decode(
        ImageCodec.encodePng(w, h, 2, ga, filter)).get
      assert(decGa.channels == 1)
      assert(decGa.pixels.sameElements(
        Array.tabulate(w * h)(i => ga(i * 2))), s"ga filter=$filter")
    }
  }

  test("PNG palette (color type 3) resolves through PLTE; interlace and 16-bit reject") {
    // hand-build a palette PNG: 4×2, 3-entry palette, filter 0
    val plte = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val idx = Array[Byte](0, 1, 2, 0, 2, 1, 0, 0)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until 2) {
      raw.write(0) // filter none
      raw.write(idx, y * 4, 4)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zb = new Array[Byte](256)
    val zn = deflater.deflate(zb); deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(t: String, d: Array[Byte]): Unit = {
      val be = java.nio.ByteBuffer.allocate(4).putInt(d.length).array()
      out.write(be)
      val tb = t.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(d)
      out.write(tb); out.write(d)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(4).putInt(2)
      .put(8.toByte).put(3.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("PLTE", plte)
    chunk("IDAT", java.util.Arrays.copyOf(zb, zn))
    chunk("IEND", Array.emptyByteArray)
    val dec = ImageCodec.decode(out.toByteArray).get
    assert((dec.width, dec.height, dec.channels) == ((4, 2, 3)))
    assert(dec.pixels.sameElements(idx.flatMap(i =>
      Seq(plte(i * 3), plte(i * 3 + 1), plte(i * 3 + 2)))))
    // flipping the interlace flag on a NON-interlaced body makes the
    // declared geometry disagree with the stream length — must be
    // rejected as corrupt, not scattered as garbage
    val il = out.toByteArray.clone()
    // interlace byte lives at offset 8 + 8 + 12 = 28 (last IHDR byte)
    il(28) = 1
    assert(ImageCodec.decode(il).isEmpty)
    // 16-bit depth rejected too (offset 24 is the bit-depth byte)
    val bd = out.toByteArray.clone(); bd(24) = 16
    assert(ImageCodec.decode(bd).isEmpty)
  }

  test("PNG Adam7 interlace round-trips for every channel count and filter") {
    val rnd = new scala.util.Random(23)
    for {
      ch <- Seq(1, 3, 4)
      filter <- Seq(0, 2, 4) // none / up / paeth exercise cross-row state
    } {
      // 13×11: all 7 passes non-empty, odd steps hit edge pixels
      val (w, h) = (13, 11)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val bytes = ImageCodec.encodePng(w, h, ch, px, filter, interlaced = true)
      val dec = ImageCodec.decode(bytes)
        .getOrElse(fail(s"interlaced decode failed: ch=$ch filter=$filter"))
      val want =
        if (ch == 4) Array.tabulate(w * h * 3)(i => px((i / 3) * 4 + i % 3))
        else px
      assert(dec.pixels.sameElements(want), s"ch=$ch filter=$filter")
      // and the interlaced file must equal the plain file's pixels
      val plain = ImageCodec.decode(
        ImageCodec.encodePng(w, h, ch, px, filter)).get
      assert(dec.pixels.sameElements(plain.pixels))
    }
    // degenerate dims where several passes are empty
    for ((w, h) <- Seq((1, 1), (2, 3), (8, 1), (1, 9))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val dec = ImageCodec.decode(
        ImageCodec.encodePng(w, h, 1, px, 4, interlaced = true)).get
      assert(dec.pixels.sameElements(px), s"dims ($w,$h)")
    }
  }

  // --- GIF full decode ---------------------------------------------------

  /** 256-entry grayscale-ish test palette: entry i -> (i, 255-i, i^0x5A). */
  private def testPalette: Array[Byte] =
    (0 until 256).flatMap(i =>
      Seq(i.toByte, (255 - i).toByte, (i ^ 0x5A).toByte)).toArray

  test("GIF LZW round-trips pixels through the uncompressed-LZW encoder") {
    val rnd = new scala.util.Random(19)
    val (w, h) = (23, 9)
    val pal = testPalette
    val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val bytes = ImageCodec.encodeGif(w, h, pal, idx)
    assert(ImageCodec.detect(bytes).contains("gif"))
    assert(ImageCodec.meta(bytes).contains((w, h, "gif")))
    val dec = ImageCodec.decode(bytes).get
    assert((dec.width, dec.height, dec.channels) == ((w, h, 3)))
    val want = idx.flatMap { b =>
      val i = b & 0xFF
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))
    }
    assert(dec.pixels.sameElements(want))
  }

  test("GIF interlaced rows deinterlace to the original raster") {
    val (w, h) = (8, 13) // odd height: all four passes non-empty
    val idx = Array.tabulate(w * h)(i => (i % 251).toByte)
    val bytes = ImageCodec.encodeGif(w, h, testPalette, idx, interlaced = true)
    val plain = ImageCodec.decode(
      ImageCodec.encodeGif(w, h, testPalette, idx)).get
    val inter = ImageCodec.decode(bytes).get
    assert(inter.pixels.sameElements(plain.pixels))
  }

  test("GIF decode handles REAL compressed LZW (composite codes + KwKwK)") {
    // a genuine LZW compressor (dictionary, variable width) — the
    // uncompressed-style encoder never emits composite codes, so this
    // exercises the decoder's dictionary walk and the KwKwK case
    // (triggered immediately by runs: 'aaaa' emits a code that is not
    // yet in the decoder's table).
    def lzwCompress(data: Array[Byte], mcs: Int): Array[Byte] = {
      val clear = 1 << mcs; val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var accBits = 0; var width = mcs + 1
      def emit(code: Int): Unit = {
        acc |= code.toLong << accBits; accBits += width
        while (accBits >= 8) {
          out.write((acc & 0xFF).toInt); acc >>= 8; accBits -= 8
        }
      }
      var dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
      def resetDict(): Unit = {
        dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
        (0 until clear).foreach(i => dict(Seq(i.toByte)) = i)
        width = mcs + 1
      }
      resetDict()
      var next = eoi + 1
      emit(clear)
      var cur: Seq[Byte] = Seq.empty
      data.foreach { b =>
        val ext = cur :+ b
        if (dict.contains(ext)) cur = ext
        else {
          emit(dict(cur))
          dict(ext) = next; next += 1
          // decoder bumps width when ITS dict size reaches 1<<width;
          // its size tracks ours
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next >= 4096) { emit(clear); resetDict(); next = eoi + 1 }
          cur = Seq(b)
        }
      }
      if (cur.nonEmpty) emit(dict(cur))
      emit(eoi)
      if (accBits > 0) out.write((acc & 0xFF).toInt)
      out.toByteArray
    }
    val (w, h) = (16, 8)
    // long runs: immediate KwKwK; then structure for composite codes
    val idx = Array.tabulate(w * h)(i =>
      if (i < 40) 7.toByte else ((i / 3) % 11).toByte)
    val lzw = lzwCompress(idx, 8)
    // wrap in a GIF container by hand
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le(w); le(h); out.write(0x80 | 7); out.write(0); out.write(0)
    out.write(testPalette)
    out.write(0x2C); le(0); le(0); le(w); le(h); out.write(0)
    out.write(8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0); out.write(0x3B)
    val dec = ImageCodec.decode(out.toByteArray).get
    val pal = testPalette
    val want = idx.flatMap { b =>
      val i = b & 0xFF
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))
    }
    assert(dec.pixels.sameElements(want))
  }

  test("GIF extension blocks and local color tables are handled") {
    val (w, h) = (5, 4)
    val idx = Array.tabulate(w * h)(_.toByte)
    val base = ImageCodec.encodeGif(w, h, testPalette, idx)
    // splice a graphic-control extension between the GCT and the
    // image descriptor: 0x21 0xF9 size-4 block + terminator
    val gctEnd = 13 + 768
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(gctEnd) ++ ext ++ base.drop(gctEnd)
    val dec = ImageCodec.decode(spliced).get
    assert(dec.pixels.sameElements(ImageCodec.decode(base).get.pixels))
  }

  // --- kernels -----------------------------------------------------------

  test("nearest-neighbor resize reads exactly the floor-mapped source pixels") {
    // 4×4 gradient, downsample to 2×2: targets read sources (0,0),(2,0),(0,2),(2,2)
    val img = Image(4, 4, 1, Array.tabulate(16)(_.toByte))
    val r = ImageCodec.resizeNearest(img, 2, 2)
    assert(r.pixels.toSeq == Seq[Byte](0, 2, 8, 10))
    // upsample replicates
    val up = ImageCodec.resizeNearest(Image(2, 1, 1, Array[Byte](5, 9)), 4, 1)
    assert(up.pixels.toSeq == Seq[Byte](5, 5, 9, 9))
  }

  test("grayscale is integer BT.601 luma") {
    val img = Image(2, 1, 3, Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0))
    val g = ImageCodec.grayscale(img)
    assert((g.pixels(0) & 0xFF) == 299 * 255 / 1000)
    assert((g.pixels(1) & 0xFF) == 587 * 255 / 1000)
  }

  test("aHash embeds a scaled copy of an image at cosine ~ 1, a distinct image far lower") {
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val rnd = new scala.util.Random(7)
    val base = Image(16, 16, 3, Array.fill(768)(rnd.nextInt(256).toByte))
    val scaled = ImageCodec.resizeNearest(base, 32, 32)
    val other = Image(16, 16, 3, Array.fill(768)(rnd.nextInt(256).toByte))
    val same = cos(ImageCodec.aHash64(base), ImageCodec.aHash64(scaled))
    val diff = cos(ImageCodec.aHash64(base), ImageCodec.aHash64(other))
    assert(same > 0.95, s"scaled copy cosine $same")
    assert(diff < 0.5, s"unrelated cosine $diff")
  }

  test("dHash: brightness-shift invariant, scaled copy near, unrelated far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val rnd = new scala.util.Random(11)
    val base = Image(16, 16, 3, Array.fill(768)(rnd.nextInt(256).toByte))
    // +40 brightness with clipping: adjacent-pixel ORDER mostly holds
    val bright = Image(16, 16, 3, base.pixels.map(p =>
      math.min(255, (p & 0xFF) + 40).toByte))
    val scaled = ImageCodec.resizeNearest(base, 32, 32)
    val other = Image(16, 16, 3, Array.fill(768)(rnd.nextInt(256).toByte))
    val h = ImageCodec.dHash64(base)
    assert(ham(h, ImageCodec.dHash64(bright)) <= 8,
      s"brightness shift moved ${ham(h, ImageCodec.dHash64(bright))} bits")
    assert(ham(h, ImageCodec.dHash64(scaled)) <= 8)
    assert(ham(h, ImageCodec.dHash64(other)) >= 16,
      s"unrelated at ${ham(h, ImageCodec.dHash64(other))} bits")
  }

  // --- Spark plumbing with the real codec --------------------------------

  test("decodeMetadata uses the real parser for images and the stub for opaque bytes") {
    import spark.implicits._
    val rows = Seq(
      (1L, ImageCodec.encodePnm(Image(6, 5, 3, Array.fill(90)(3.toByte)))),
      (2L, bmp24(7, 4, (x, y) => (x, y, 0))),
      (3L, pngHeader(12, 34)),
      (4L, "just some opaque payload bytes".getBytes("UTF-8")))
      .toDF("id", "media")
    val meta = Multimodal.decodeMetadata(rows).collect()
      .map(m => m.id -> ((m.width, m.height, m.format))).toMap
    assert(meta(1L) == ((6, 5, "ppm")))
    assert(meta(2L) == ((7, 4, "bmp")))
    assert(meta(3L) == ((12, 34, "png")))
    // opaque → deterministic stub dims (the md5-derived fake)
    val stub = Multimodal.decodeStub(4L, "just some opaque payload bytes".getBytes("UTF-8"))
    assert(meta(4L) == ((stub.width, stub.height, stub.format)))
  }

  test("decodeImages + resizeImages + imageFeatures run distributed over mixed payloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val imgs = (1L to 20L).map { id =>
      val px = Array.fill(16 * 16 * 3)(rnd.nextInt(256).toByte)
      (id, ImageCodec.encodePnm(Image(16, 16, 3, px)), px)
    }
    val withJunk = imgs.map(t => (t._1, t._2)) :+ (99L, Array[Byte](1, 2, 3))
    val df = withJunk.toDF("id", "media").repartition(4)
    val decoded = Multimodal.decodeImages(df).collect()
    assert(decoded.length == 20) // junk row dropped, not crashed
    decoded.foreach { d =>
      assert((d.width, d.height, d.channels) == (16, 16, 3))
      assert(d.pixels.sameElements(imgs(d.id.toInt - 1)._3))
    }
    val resized = Multimodal.resizeImages(df, 8, 8).collect()
    assert(resized.length == 20)
    resized.foreach { r =>
      val dec = ImageCodec.decode(r.getAs[Array[Byte]]("resized")).get
      assert((dec.width, dec.height) == (8, 8))
    }
    // feature vectors: unit-norm 64-dim, scaled copy of image 1 lands near it
    val feats = Multimodal.imageFeatures(df).collect().map(f => f.id -> f.embedding).toMap
    assert(feats.size == 20)
    feats.values.foreach { v =>
      assert(v.length == 64)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4 || n == 0.0)
    }
  }
}
