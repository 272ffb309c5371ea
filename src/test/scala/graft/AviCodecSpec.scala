package graft

import graft.ml.{AviCodec, ImageCodec, Multimodal}

/** The hand-rolled AVI container codec: chunk-tree walking (hdrl /
  * movi lists, even-length padding), header metadata, frame
  * extraction, and the container→image-codec composition.
  */
class AviCodecSpec extends SparkSpec {

  private def ppm(w: Int, h: Int, seed: Int): Array[Byte] =
    ImageCodec.encodePnm(ImageCodec.Image(w, h, 3,
      Array.tabulate(w * h * 3)(i => (seed + i).toByte)))

  test("encode/meta/frames round-trip, including odd-length frame padding") {
    // 5-byte frames force the odd-length pad byte between chunks
    val odd = Seq(Array[Byte](1, 2, 3, 4, 5), Array[Byte](6, 7, 8, 9, 10),
      Array[Byte](11, 12, 13, 14, 15))
    val avi = AviCodec.encodeAvi(odd, 320, 240, 40000)
    assert(AviCodec.isAvi(avi))
    val m = AviCodec.meta(avi).get
    assert((m.width, m.height, m.nFrames, m.microSecPerFrame) ==
      (320, 240, 3, 40000))
    val back = AviCodec.frames(avi)
    assert(back.length == 3)
    back.zip(odd).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("frames compose with the image codec: netpbm payloads decode per frame") {
    val frames = (0 until 4).map(f => ppm(6, 3, f * 40))
    val avi = AviCodec.encodeAvi(frames, 6, 3, 33333)
    val decoded = AviCodec.frames(avi).map(ImageCodec.decode(_).get)
    assert(decoded.length == 4)
    decoded.foreach(img => assert((img.width, img.height) == (6, 3)))
    assert(decoded(2).pixels(0) == (80).toByte)
  }

  test("non-AVI payloads yield no metadata and no frames") {
    assert(AviCodec.meta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AviCodec.frames(Array[Byte](1, 2, 3)).isEmpty)
    // a WAV is RIFF but not AVI
    val wav = graft.ml.AudioCodec.encodeWav(
      graft.ml.AudioCodec.Audio(8000, 1, 16, Array(1, 2, 3)))
    assert(AviCodec.meta(wav).isEmpty && AviCodec.frames(wav).isEmpty)
  }

  test("Spark plumbing: videoFrames strides, decodeVideoMeta reads the container") {
    import spark.implicits._
    val rows = (1L to 6L).map { id =>
      val frames = (0 until 5).map(f => ppm(4, 4, (id * 10 + f).toInt))
      (id, AviCodec.encodeAvi(frames, 4, 4, 40000))
    } :+ (99L, "not a container".getBytes)
    val df = rows.toDF("id", "media").repartition(3)
    val meta = Multimodal.decodeVideoMeta(df).collect()
    assert(meta.length == 6 && meta.forall(_.nFrames == 5))
    val all = Multimodal.videoFrames(df).collect()
    assert(all.length == 30)
    val strided = Multimodal.videoFrames(df, stride = 2).collect()
    assert(strided.length == 18) // frames 0, 2, 4 per video
    assert(strided.forall(_.frameIdx % 2 == 0))
    // every sampled frame still decodes
    strided.foreach(v => assert(ImageCodec.decode(v.frame).nonEmpty))
  }

  test("sceneCuts finds planted scene boundaries and ignores within-scene jitter") {
    import spark.implicits._
    def flat(w: Int, h: Int, v: Int, jitter: Int): Array[Byte] = {
      val px = Array.tabulate(w * h * 3)(i => (v + (i % (jitter + 1))).toByte)
      ImageCodec.encodePnm(ImageCodec.Image(w, h, 3, px))
    }
    // clip: frames 0-2 scene A (value 40, jitter ±2), frames 3-5
    // scene B (value 160), frame 6 scene C (value 80)
    val frames = Seq(
      flat(8, 6, 40, 2), flat(8, 6, 40, 2), flat(8, 6, 40, 2),
      flat(8, 6, 160, 2), flat(8, 6, 160, 2), flat(8, 6, 160, 2),
      flat(8, 6, 80, 2))
    val df = Seq((1L, AviCodec.encodeAvi(frames, 8, 6, 40000)))
      .toDF("id", "media")
    val cuts = Multimodal.sceneCuts(df, threshold = 30.0).collect()
      .map(c => (c.frameIdx, c.diff)).sortBy(_._1)
    assert(cuts.map(_._1).toSeq == Seq(3, 6), cuts.toSeq)
    assert(cuts.forall(_._2 > 30.0))
    // a threshold above every diff finds nothing
    assert(Multimodal.sceneCuts(df, threshold = 200.0).collect().isEmpty)
  }
}
