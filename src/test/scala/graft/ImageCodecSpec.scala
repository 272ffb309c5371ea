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
    assert(ImageCodec.decode(pngHeader(640, 480)).isEmpty) // entropy-coded
    // garbage stays unrecognized (the stub-fallback contract)
    assert(ImageCodec.detect("not an image at all".getBytes).isEmpty)
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
