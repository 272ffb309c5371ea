package graft

import graft.ml.{AudioCodec, Multimodal}
import graft.ml.AudioCodec.Audio

/** The hand-rolled WAV/PCM codec against hand-built RIFF fixtures —
  * chunk walking (extra chunks, odd-length padding), both PCM widths,
  * the exact-arithmetic signal kernels, and the Spark-side batch
  * plumbing.
  */
class AudioCodecSpec extends SparkSpec {

  /** RIFF with an extra odd-length LIST chunk before fmt/data — the
    * layout real encoders emit (chunks pad to even length).
    */
  private def wavWithExtraChunk(a: Audio): Array[Byte] = {
    val canonical = AudioCodec.encodeWav(a)
    val fmtAndData = java.util.Arrays.copyOfRange(canonical, 12, canonical.length)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val buf = java.nio.ByteBuffer
      .allocate(12 + extra.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(4 + extra.length + fmtAndData.length)
      .put("WAVE".getBytes).put(extra).put(fmtAndData)
    buf.array()
  }

  test("16-bit stereo round-trip, including through an extra padded chunk") {
    val a = Audio(8000, 2, 16, Array(-32768, 32767, 0, -1, 1000, -1000))
    val back = AudioCodec.decode(AudioCodec.encodeWav(a)).get
    assert(back.sampleRate == 8000 && back.channels == 2 && back.nFrames == 3)
    assert(back.samples.sameElements(a.samples))
    val viaExtra = AudioCodec.decode(wavWithExtraChunk(a)).get
    assert(viaExtra.samples.sameElements(a.samples))
    assert(AudioCodec.meta(wavWithExtraChunk(a)).contains((8000, 2, 16, 3L, 0L)))
  }

  test("8-bit mono decodes unsigned bytes centered to [-128, 127]") {
    val a = Audio(4000, 1, 8, Array(-128, 0, 127, 5))
    val back = AudioCodec.decode(AudioCodec.encodeWav(a)).get
    assert(back.bitsPerSample == 8 && back.samples.sameElements(a.samples))
  }

  test("non-PCM and non-WAV payloads: metadata-or-nothing, never a wrong decode") {
    // format tag 3 (IEEE float): meta still reads dims, decode refuses
    val pcm = AudioCodec.encodeWav(Audio(16000, 1, 16, Array(1, 2, 3)))
    pcm(20) = 3 // fmt tag -> float
    assert(AudioCodec.meta(pcm).contains((16000, 1, 16, 3L, 0L)))
    assert(AudioCodec.decode(pcm).isEmpty)
    assert(AudioCodec.decode("RIFFxxxx not really wave".getBytes).isEmpty)
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("signal kernels: mono mix floors, RMS/ZCR/silence/peak hand-checked") {
    // stereo frames: (10,-21) -> floor(-11/2) = -6; (4,3) -> 3;
    // (-8,-9) -> -9; (600,600) -> 600
    val a = Audio(1000, 2, 16, Array(10, -21, 4, 3, -8, -9, 600, 600))
    assert(AudioCodec.monoMix(a).toSeq == Seq(-6, 3, -9, 600))
    val f = AudioCodec.features(a, silenceAbs = 10)
    // sign sequence -,+,-,+ -> 3 crossings
    assert(f.zeroCrossings == 3L)
    assert(f.peak == 600)
    assert(f.silenceRatio == 3.0 / 4) // |-6|,|3|,|-9| < 10
    val expectedRms = math.sqrt((36.0 + 9 + 81 + 360000) / 4)
    assert(math.abs(f.rms - expectedRms) < 1e-12)
  }

  test("nearest-neighbor resample reads floor-mapped source frames") {
    val a = Audio(1000, 1, 16, Array.tabulate(10)(identity))
    assert(AudioCodec.resampleNearest(a, 5).samples.toSeq == Seq(0, 2, 4, 6, 8))
    assert(AudioCodec.resampleNearest(a, 20).samples.toSeq ==
      (0 until 20).map(t => t * 10 / 20))
  }

  test("Spark plumbing: meta/features/resample run distributed, junk rows drop") {
    import spark.implicits._
    val rows = (1L to 10L).map { id =>
      val samples = Array.tabulate(20)(i => ((id * 100 + i * 313) % 2001 - 1000).toInt)
      (id, AudioCodec.encodeWav(Audio(16000, 1, 16, samples)))
    } :+ (99L, Array[Byte](9, 9, 9))
    val df = rows.toDF("id", "media").repartition(3)
    val meta = Multimodal.decodeAudioMeta(df).collect()
    assert(meta.length == 10 && meta.forall(m => m.nFrames == 20L && m.sampleRate == 16000))
    val feats = Multimodal.audioFeatures(df).collect()
    assert(feats.length == 10 && feats.forall(f => f.rms > 0 && f.peak <= 1000))
    val res = Multimodal.resampleAudio(df, 4).collect()
    assert(res.length == 10 &&
      res.forall(_.getAs[Seq[Int]]("samples").length == 4))
  }

  test("G.711 mu-law / A-law expansion matches the CPython audioop reference vectors") {
    // vectors generated with CPython's audioop (ulaw2lin/alaw2lin,
    // width 2) — the de-facto public G.711 reference
    val ulaw = Seq(0x00 -> -32124, 0x10 -> -15996, 0x2A -> -5372,
      0x55 -> -716, 0x7F -> 0, 0x80 -> 32124, 0x9D -> 9340,
      0xAA -> 5372, 0xD5 -> 716, 0xFF -> 0)
    ulaw.foreach { case (c, v) =>
      assert(AudioCodec.ulawToLinear(c) == v, s"ulaw $c")
    }
    val alaw = Seq(0x00 -> -5504, 0x10 -> -2752, 0x2A -> -32256,
      0x55 -> -8, 0x7F -> -848, 0x80 -> 5504, 0x9D -> 3136,
      0xAA -> 32256, 0xD5 -> 8, 0xFF -> 848)
    alaw.foreach { case (c, v) =>
      assert(AudioCodec.alawToLinear(c) == v, s"alaw $c")
    }
    // sign symmetry across the whole code space
    (0 until 128).foreach { c =>
      assert(AudioCodec.ulawToLinear(c) == -AudioCodec.ulawToLinear(c | 0x80))
      assert(AudioCodec.alawToLinear(c) == -AudioCodec.alawToLinear(c | 0x80))
    }
    // companded WAV round-trip through the container
    val codes = Array.tabulate(256)(_.toByte)
    val dec = AudioCodec.decode(
      AudioCodec.encodeWavCompanded(codes, 8000, 1, uLaw = true)).get
    assert(dec.bitsPerSample == 16 && dec.sampleRate == 8000)
    assert(dec.samples.toSeq ==
      (0 until 256).map(AudioCodec.ulawToLinear))
    val decA = AudioCodec.decode(
      AudioCodec.encodeWavCompanded(codes, 8000, 1, uLaw = false)).get
    assert(decA.samples.toSeq ==
      (0 until 256).map(AudioCodec.alawToLinear))
  }

  test("vadSegments finds planted speech runs, bridges short gaps, drops blips") {
    val frame = 160
    def block(active: Boolean, frames: Int): Array[Int] =
      if (active) Array.tabulate(frames * frame)(i =>
        if (i % 2 == 0) 4000 else -4000)
      else new Array[Int](frames * frame)
    // S(2) T(3) S(1) T(2) S(4) T(1) S(2): with minGap=2 the 1-frame
    // gap bridges, with minSpeech=2 the final 1-frame blip drops
    val sig = block(false, 2) ++ block(true, 3) ++ block(false, 1) ++
      block(true, 2) ++ block(false, 4) ++ block(true, 1) ++
      block(false, 2)
    val a = Audio(16000, 1, 16, sig)
    val merged = AudioCodec.vadSegments(a, frame, 500.0,
      minSpeechFrames = 2, minGapFrames = 2)
    // frames 2-7 fuse (the 1-frame gap at 5 bridges); end-exclusive
    // sample offset is (7+1)·160
    assert(merged == Seq((2 * frame, 8 * frame)), merged)
    // strict settings: no bridging, no minimum -> three raw segments
    val strict = AudioCodec.vadSegments(a, frame, 500.0, 1, 1)
    assert(strict == Seq((2 * frame, 5 * frame), (6 * frame, 8 * frame),
      (12 * frame, 13 * frame)), strict)
    // silence-only clip: nothing
    assert(AudioCodec.vadSegments(Audio(16000, 1, 16, block(false, 8)),
      frame, 500.0, 1, 1).isEmpty)
  }

  test("fft matches hand-computed DFTs (impulse, constant, pure tone)") {
    // impulse -> flat spectrum
    val re1 = Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)
    val im1 = new Array[Double](8)
    AudioCodec.fft(re1, im1)
    (0 until 8).foreach { k =>
      assert(math.abs(re1(k) - 1.0) < 1e-12 && math.abs(im1(k)) < 1e-12)
    }
    // constant -> all mass at DC
    val re2 = Array.fill(8)(1.0); val im2 = new Array[Double](8)
    AudioCodec.fft(re2, im2)
    assert(math.abs(re2(0) - 8.0) < 1e-12)
    (1 until 8).foreach(k =>
      assert(math.abs(re2(k)) < 1e-12 && math.abs(im2(k)) < 1e-12))
    // cos(2π·2k/16): mass at bins 2 and 14, magnitude n/2
    val n = 16
    val re3 = Array.tabulate(n)(i => math.cos(2 * math.Pi * 2 * i / n))
    val im3 = new Array[Double](n)
    AudioCodec.fft(re3, im3)
    def mag(k: Int) = math.sqrt(re3(k) * re3(k) + im3(k) * im3(k))
    assert(math.abs(mag(2) - n / 2.0) < 1e-9)
    assert(math.abs(mag(n - 2) - n / 2.0) < 1e-9)
    (0 until n).filterNot(k => k == 2 || k == n - 2)
      .foreach(k => assert(mag(k) < 1e-9, s"bin $k leaked ${mag(k)}"))
  }

  test("spectralFeatures localizes a planted tone; flux flags a transient") {
    val sr = 16000
    val f0 = 1250.0 // exactly bin 20 at frameSize 256
    val sine = Array.tabulate(4096)(i =>
      math.round(8000 * math.sin(2 * math.Pi * f0 * i / sr)).toInt)
    val s = AudioCodec.spectralFeatures(Audio(sr, 1, 16, sine))
    assert(s.nFrames == (4096 - 256) / 128 + 1)
    assert(math.abs(s.dominantHz - f0) <= sr / 256.0, s"dominant ${s.dominantHz}")
    assert(math.abs(s.centroidHz - f0) <= 2 * sr / 256.0, s"centroid ${s.centroidHz}")
    assert(s.rolloffHz >= f0 - 2 * sr / 256.0, s"rolloff ${s.rolloffHz}")
    // a time-shift-invariant magnitude spectrum: stationary tone has
    // near-zero flux; a mid-clip frequency JUMP has much higher flux
    val jump = Array.tabulate(4096) { i =>
      val f = if (i < 2048) 500.0 else 3000.0
      math.round(8000 * math.sin(2 * math.Pi * f * i / sr)).toInt
    }
    val sj = AudioCodec.spectralFeatures(Audio(sr, 1, 16, jump))
    assert(sj.fluxMean > 10 * math.max(s.fluxMean, 1e-9),
      s"flux ${sj.fluxMean} vs stationary ${s.fluxMean}")
    // too-short clip degrades gracefully
    assert(AudioCodec.spectralFeatures(Audio(sr, 1, 16, Array(1, 2, 3)))
      .nFrames == 0)
  }

  test("Spark plumbing: audioSpectral localizes per-clip tones distributed") {
    import spark.implicits._
    val sr = 16000
    val rows = (0L until 8L).map { id =>
      val f = 500.0 + id * 250.0
      val sine = Array.tabulate(2048)(i =>
        math.round(8000 * math.sin(2 * math.Pi * f * i / sr)).toInt)
      (id, AudioCodec.encodeWav(Audio(sr, 1, 16, sine)))
    } :+ (99L, Array[Byte](1, 2, 3))
    val got = Multimodal.audioSpectral(rows.toDF("id", "media").repartition(3))
      .collect().map(r => r.id -> r).toMap
    assert(got.size == 8) // junk dropped
    (0L until 8L).foreach { id =>
      val f = 500.0 + id * 250.0
      assert(math.abs(got(id).dominantHz - f) <= sr / 256.0,
        s"id $id: ${got(id).dominantHz} vs $f")
    }
  }

  test("resampleLinear: exact on ramps, tone frequency preserved, stereo") {
    import graft.ml.AudioCodec.Audio
    // a linear ramp is reproduced exactly by linear interpolation
    val ramp = Audio(8000, 1, 16, Array.tabulate(801)(i => i * 4))
    val up = AudioCodec.resampleLinear(ramp, 16000)
    assert(up.sampleRate == 16000 && up.nFrames == 1602)
    // endpoint-matched: first/last preserved; interior on the line
    assert(up.samples.head == 0 && up.samples.last == 800 * 4)
    (0 until up.nFrames).foreach { t =>
      val expect = t.toDouble * 800 / (up.nFrames - 1) * 4
      assert(math.abs(up.samples(t) - expect) <= 0.5 + 1e-9, s"t=$t")
    }
    // a resampled tone keeps its physical frequency: 1 kHz at 8 kHz
    // resampled to 12 kHz still reads ~1 kHz through the FFT features
    val sr = 8000
    val tone = Audio(sr, 1, 16, Array.tabulate(4096)(i =>
      (8000 * math.sin(2 * math.Pi * 1000.0 * i / sr)).toInt))
    val rs = AudioCodec.resampleLinear(tone, 12000)
    val feats = AudioCodec.spectralFeatures(rs)
    assert(math.abs(feats.dominantHz - 1000.0) <= 12000.0 / 256.0,
      s"dominant ${feats.dominantHz}")
    // stereo: channels resample independently
    val st = Audio(8000, 2, 16, Array.tabulate(402)(i =>
      if (i % 2 == 0) (i / 2) * 10 else 5000))
    val st2 = AudioCodec.resampleLinear(st, 4000)
    assert(st2.channels == 2 && st2.nFrames == 101)
    assert(st2.samples.zipWithIndex.filter(_._2 % 2 == 1)
      .forall(_._1 == 5000))
    // identity when rates match (same backing array, no copy)
    assert(AudioCodec.resampleLinear(ramp, 8000).samples eq ramp.samples)
  }
}
