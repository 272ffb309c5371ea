package graft

import graft.ml.{ImageCodec, JpegCodec}
import graft.ml.ImageCodec.Image

/** The hand-rolled baseline JPEG codec. JPEG is lossy, so round-trips
  * are pinned by error bounds: at quality 100 the quant tables are all
  * ones and the only loss is DCT/IDCT float rounding (a few code
  * values); at normal qualities smooth images must reconstruct with
  * small mean error. Structure (dims, channels, marker layout,
  * restart/subsampling variants) is exact.
  */
class JpegCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) {
      m = math.max(m, math.abs((a(i) & 0xFF) - (b(i) & 0xFF)))
      i += 1
    }
    m
  }

  private def meanErr(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += math.abs((a(i) & 0xFF) - (b(i) & 0xFF)); i += 1
    }
    s.toDouble / a.length
  }

  /** Smooth 2-D gradient with mild structure — JPEG's favorable case. */
  private def gradient(w: Int, h: Int, ch: Int, seed: Int): Image = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
      val v = (2 * x + 3 * y + 17 * c + seed +
        (8 * math.sin(x / 5.0) + 8 * math.cos(y / 7.0)).toInt) & 0xFF
      px((y * w + x) * ch + c) = v.toByte
    }
    Image(w, h, ch, px)
  }

  test("quality-100 RGB round-trip: only DCT float rounding (small max error)") {
    val img = gradient(37, 23, 3, 0) // odd dims: partial edge blocks
    val bytes = JpegCodec.encode(img, quality = 100)
    assert(ImageCodec.detect(bytes).contains("jpeg"))
    assert(ImageCodec.meta(bytes).contains((37, 23, "jpeg")))
    val dec = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert((dec.width, dec.height, dec.channels) == ((37, 23, 3)))
    // color convert is float both ways; all-ones quant leaves only
    // rounding — a handful of code values
    assert(maxErr(img.pixels, dec.pixels) <= 6,
      s"maxErr=${maxErr(img.pixels, dec.pixels)}")
    assert(meanErr(img.pixels, dec.pixels) <= 1.5)
  }

  test("quality-100 grayscale round-trip (single-component scan)") {
    val img = gradient(24, 17, 1, 5)
    val bytes = JpegCodec.encode(img, quality = 100)
    val dec = JpegCodec.decode(bytes).get
    assert((dec.width, dec.height, dec.channels) == ((24, 17, 1)))
    // no color conversion: pure DCT rounding, tighter bound
    assert(maxErr(img.pixels, dec.pixels) <= 2,
      s"maxErr=${maxErr(img.pixels, dec.pixels)}")
  }

  test("quality-85 smooth image reconstructs with small mean error") {
    val img = gradient(64, 48, 3, 11)
    val dec = JpegCodec.decode(JpegCodec.encode(img, quality = 85)).get
    assert(meanErr(img.pixels, dec.pixels) < 4.0,
      s"meanErr=${meanErr(img.pixels, dec.pixels)}")
    // and quality degrades monotonically-ish: q10 is visibly worse
    val dec10 = JpegCodec.decode(JpegCodec.encode(img, quality = 10)).get
    assert(meanErr(img.pixels, dec10.pixels) >
      meanErr(img.pixels, dec.pixels))
  }

  test("4:2:0 chroma subsampling round-trips (decoder upsampling path)") {
    val img = gradient(35, 21, 3, 3) // odd dims: chroma edge replication
    val bytes = JpegCodec.encode(img, quality = 95, chromaSubsample = true)
    val dec = JpegCodec.decode(bytes).get
    assert((dec.width, dec.height, dec.channels) == ((35, 21, 3)))
    // chroma is half-res: luma-dominated gradient still lands close
    assert(meanErr(img.pixels, dec.pixels) < 6.0,
      s"meanErr=${meanErr(img.pixels, dec.pixels)}")
    // at sizes where MCU padding is negligible, 4:2:0 carries 2×
    // fewer chroma blocks and must compress smaller at equal quality
    val big = gradient(96, 64, 3, 9)
    assert(JpegCodec.encode(big, quality = 95, chromaSubsample = true).length <
      JpegCodec.encode(big, quality = 95).length)
  }

  test("restart markers (DRI + RSTn) decode identically to the unrestarted stream") {
    val img = gradient(50, 34, 3, 7)
    val plain = JpegCodec.decode(JpegCodec.encode(img, quality = 90)).get
    val rst = JpegCodec.decode(
      JpegCodec.encode(img, quality = 90, restartInterval = 2)).get
    assert(rst.pixels.sameElements(plain.pixels))
    // and with subsampling + restarts together
    val rstSub = JpegCodec.decode(JpegCodec.encode(img, quality = 90,
      chromaSubsample = true, restartInterval = 3)).get
    val plainSub = JpegCodec.decode(JpegCodec.encode(img, quality = 90,
      chromaSubsample = true)).get
    assert(rstSub.pixels.sameElements(plainSub.pixels))
  }

  test("ImageCodec.decode routes jpeg payloads to the real decoder") {
    val img = gradient(16, 16, 3, 1)
    val dec = ImageCodec.decode(JpegCodec.encode(img, quality = 100)).get
    assert((dec.width, dec.height, dec.channels) == ((16, 16, 3)))
  }

  test("progressive and truncated streams are rejected, not misdecoded") {
    val bytes = JpegCodec.encode(gradient(16, 16, 3, 2), quality = 90)
    // flip SOF0 (FFC0) to SOF2 (FFC2): progressive must return None
    val prog = bytes.clone()
    var i = 2
    var found = false
    while (i + 1 < prog.length && !found) {
      if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0) {
        prog(i + 1) = 0xC2.toByte; found = true
      }
      i += 1
    }
    assert(found)
    assert(JpegCodec.decode(prog).isEmpty)
    // truncation inside the entropy stream must not throw
    assert(JpegCodec.decode(bytes.take(bytes.length / 2)).isEmpty ||
      JpegCodec.decode(bytes.take(bytes.length / 2)).isDefined == false)
    // garbage
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("flat color stays flat at any quality (DC-only blocks, bounded DC loss)") {
    // a flat image quantizes to DC-only blocks: reconstruction must be
    // UNIFORM (identical blocks decode identically — no blocking
    // artifacts) with error bounded by DC quantization alone
    val px = Array.fill(32 * 16 * 3)(0.toByte)
    for (i <- px.indices) px(i) = (i % 3 match {
      case 0 => 200; case 1 => 100; case _ => 50
    }).toByte
    val img = Image(32, 16, 3, px)
    for (q <- Seq(10, 50, 90)) {
      val dec = JpegCodec.decode(JpegCodec.encode(img, quality = q)).get
      // uniformity: every pixel of a channel identical
      for (c <- 0 to 2) {
        val vals = dec.pixels.indices.filter(_ % 3 == c)
          .map(dec.pixels(_)).toSet
        assert(vals.size == 1, s"quality $q channel $c not flat: $vals")
      }
      assert(maxErr(img.pixels, dec.pixels) <= 8, s"quality $q")
    }
    // at quality 90 the DC step is small: near-exact
    val dec90 = JpegCodec.decode(JpegCodec.encode(img, quality = 90)).get
    assert(maxErr(img.pixels, dec90.pixels) <= 2)
  }
}
