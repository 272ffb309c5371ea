package graft.ml

/** Pure-JVM WAV/PCM audio codec — the audio-modality counterpart of
  * [[ImageCodec]], hand-parsed from the public RIFF/WAVE layout, no
  * libraries. Full decode for integer PCM (8-bit unsigned, 16-bit
  * signed little-endian), header-only metadata for any other `fmt `
  * encoding, plus the deterministic signal kernels a training-data
  * pipeline runs at scan time: RMS energy, zero-crossing rate,
  * silence ratio, peak, and nearest-neighbor resampling — all exact
  * integer/double arithmetic, replayable by a relational oracle.
  */
object AudioCodec {

  /** Decoded PCM: interleaved samples normalized to Int (the raw
    * integer sample values, NOT rescaled — exactness over convenience;
    * 16-bit range [-32768, 32767], 8-bit stored as centered [-128, 127]).
    */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Walk the RIFF chunks; returns (fmtOffset, dataOffset, dataLen). */
  private def chunks(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 12
    var fmt = -1; var data = -1; var dataLen = 0
    while (i + 8 <= b.length && (fmt < 0 || data < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      if (id == "fmt ") fmt = i + 8
      else if (id == "data") { data = i + 8; dataLen = len }
      i += 8 + len + (len & 1) // chunks pad to even length
    }
    if (fmt >= 0 && data >= 0) Some((fmt, data, dataLen)) else None
  }

  /** (sampleRate, channels, bitsPerSample, nFrames, durationMs) from
    * the headers alone.
    */
  def meta(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] =
    if (!isWav(bytes)) None
    else chunks(bytes).flatMap { case (fmt, _, dataLen) =>
      if (fmt + 16 > bytes.length) None
      else {
        val channels = le16(bytes, fmt + 2)
        val rate = le32(bytes, fmt + 4)
        val bits = le16(bytes, fmt + 14)
        if (channels <= 0 || rate <= 0 || bits <= 0) None
        else {
          val frames = dataLen.toLong / (channels * (bits / 8).max(1))
          Some((rate, channels, bits, frames, frames * 1000L / rate))
        }
      }
    }

  /** G.711 μ-law expansion (ITU-T G.711, the closed form every
    * telephony stack ships): 8-bit code → 16-bit linear.
    */
  def ulawToLinear(code: Int): Int = {
    val c = ~code & 0xFF
    val exp = (c >> 4) & 7
    val mant = c & 0x0F
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((c & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law expansion: 8-bit code → 16-bit linear. */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val exp = (a >> 4) & 7
    val mant = a & 0x0F
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Full decode of integer PCM (format tag 1, 8 or 16 bits) plus the
    * G.711 companded telephony formats (tag 6 A-law, tag 7 μ-law —
    * 8-bit codes expanded to 16-bit linear).
    */
  def decode(bytes: Array[Byte]): Option[Audio] =
    if (!isWav(bytes)) None
    else chunks(bytes).flatMap { case (fmt, data, dataLen) =>
      val tag = le16(bytes, fmt)
      val channels = le16(bytes, fmt + 2)
      val rate = le32(bytes, fmt + 4)
      val bits = le16(bytes, fmt + 14)
      if (channels <= 0 || rate <= 0) None
      else if ((tag == 6 || tag == 7) && bits == 8) {
        val out = new Array[Int](dataLen)
        var i = 0
        while (i < dataLen) {
          val c = u8(bytes, data + i)
          out(i) = if (tag == 7) ulawToLinear(c) else alawToLinear(c)
          i += 1
        }
        Some(Audio(rate, channels, 16, out))
      }
      else if (tag != 1 || (bits != 8 && bits != 16))
        None
      else if (bits == 16) {
        val n = dataLen / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = le16(bytes, data + 2 * i).toShort.toInt
          i += 1
        }
        Some(Audio(rate, channels, 16, out))
      } else {
        // 8-bit WAV is unsigned; center to [-128, 127]
        val out = new Array[Int](dataLen)
        var i = 0
        while (i < dataLen) { out(i) = u8(bytes, data + i) - 128; i += 1 }
        Some(Audio(rate, channels, 8, out))
      }
    }

  /** Write a canonical 44-byte-header PCM WAV. */
  def encodeWav(a: Audio): Array[Byte] = {
    require(a.bitsPerSample == 8 || a.bitsPerSample == 16)
    val bytesPer = a.bitsPerSample / 8
    val dataLen = a.samples.length * bytesPer
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(a.channels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * bytesPer)
      .putShort((a.channels * bytesPer).toShort)
      .putShort(a.bitsPerSample.toShort)
    buf.put("data".getBytes).putInt(dataLen)
    a.samples.foreach { s =>
      if (a.bitsPerSample == 16) buf.putShort(s.toShort)
      else buf.put((s + 128).toByte)
    }
    buf.array()
  }

  /** Write a G.711 companded WAV (format tag 7 μ-law / 6 A-law) from
    * raw 8-bit codes — the round-trip partner of the tag-6/7 decode.
    */
  def encodeWavCompanded(codes: Array[Byte], sampleRate: Int,
      channels: Int, uLaw: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    val buf = java.nio.ByteBuffer.allocate(44 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + codes.length).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(if (uLaw) 7 else 6)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels)
      .putShort(channels.toShort).putShort(8)
    buf.put("data".getBytes).putInt(codes.length)
    buf.put(codes)
    buf.array()
  }

  /** Energy-threshold voice-activity segmentation over the mono mix:
    * per-`frameSamples` RMS against `energyThresh`, runs of active
    * frames become segments, silence gaps shorter than `minGapFrames`
    * are bridged, and segments shorter than `minSpeechFrames` drop.
    * Returns (startSample, endSample-exclusive) pairs — the ASR-prep
    * primitive (cut speech for transcription, meter silence for
    * corrupt-payload detection). Bounded per-clip state.
    */
  def vadSegments(a: Audio, frameSamples: Int = 160,
      energyThresh: Double = 500.0, minSpeechFrames: Int = 1,
      minGapFrames: Int = 1): Seq[(Int, Int)] = {
    require(frameSamples > 0 && minSpeechFrames >= 1 && minGapFrames >= 1)
    val mono = monoMix(a)
    val nf = mono.length / frameSamples // trailing partial frame ignored
    val active = new Array[Boolean](nf)
    var f = 0
    while (f < nf) {
      var ss = 0.0
      var i = 0
      while (i < frameSamples) {
        val s = mono(f * frameSamples + i).toDouble
        ss += s * s
        i += 1
      }
      active(f) = math.sqrt(ss / frameSamples) >= energyThresh
      f += 1
    }
    // bridge short gaps
    var out = List.newBuilder[(Int, Int)]
    var segStart = -1
    var lastActive = -1
    var k = 0
    while (k < nf) {
      if (active(k)) {
        if (segStart < 0) { segStart = k }
        else if (k - lastActive - 1 >= minGapFrames) {
          // gap too long: close previous segment, open new
          if (lastActive - segStart + 1 >= minSpeechFrames)
            out += ((segStart * frameSamples, (lastActive + 1) * frameSamples))
          segStart = k
        }
        lastActive = k
      }
      k += 1
    }
    if (segStart >= 0 && lastActive - segStart + 1 >= minSpeechFrames)
      out += ((segStart * frameSamples, (lastActive + 1) * frameSamples))
    out.result()
  }

  /** Scan-time signal features, all exact arithmetic:
    * (rms, zeroCrossings, silenceRatio, peak). RMS over the raw
    * integer samples (sum of squares is exact in a double up to ~2^53);
    * a zero crossing is a strict sign change between consecutive
    * samples of the mono mix; silence = |sample| below `silenceAbs`.
    */
  final case class Features(rms: Double, zeroCrossings: Long,
      silenceRatio: Double, peak: Int)

  def features(a: Audio, silenceAbs: Int = 512): Features = {
    val mono = monoMix(a)
    if (mono.isEmpty) return Features(0.0, 0L, 1.0, 0)
    var sumSq = 0.0
    var zc = 0L
    var silent = 0L
    var peak = 0
    var prevSign = 0
    var i = 0
    while (i < mono.length) {
      val s = mono(i)
      sumSq += s.toDouble * s
      val a0 = math.abs(s)
      if (a0 > peak) peak = a0
      if (a0 < silenceAbs) silent += 1
      val sign = java.lang.Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      }
      i += 1
    }
    Features(math.sqrt(sumSq / mono.length), zc,
      silent.toDouble / mono.length, peak)
  }

  /** Integer mono mix: floor of the channel average per frame
    * (floorDiv for exact negative handling — replayable in SQL).
    */
  def monoMix(a: Audio): Array[Int] =
    if (a.channels == 1) a.samples
    else {
      val n = a.nFrames
      val out = new Array[Int](n)
      var f = 0
      while (f < n) {
        var s = 0L
        var c = 0
        while (c < a.channels) { s += a.samples(f * a.channels + c); c += 1 }
        out(f) = math.floorDiv(s, a.channels.toLong).toInt
        f += 1
      }
      out
    }

  /** Nearest-neighbor resample of the mono mix to `targetFrames`:
    * target frame t reads source floor(t * n / targetFrames) — the
    * same index map as [[ImageCodec.resizeNearest]].
    */
  def resampleNearest(a: Audio, targetFrames: Int): Audio = {
    require(targetFrames > 0)
    val mono = monoMix(a)
    val out = new Array[Int](targetFrames)
    var t = 0
    while (t < targetFrames) {
      out(t) = mono((t.toLong * mono.length / targetFrames).toInt)
      t += 1
    }
    Audio(a.sampleRate, 1, a.bitsPerSample, out)
  }

  /** Linear-interpolation resample to `toRate` Hz (per channel,
    * endpoint-matched positions p = t·(nIn−1)/(nOut−1)) — the
    * sample-rate unification every ASR/audio-training pipeline runs
    * before batching (16 kHz is the usual target). Values stay in the
    * integer sample domain (round-half-up). Nyquist caveat by design:
    * no low-pass pre-filter — downsampling far below the signal's
    * band aliases, same trade as every cheap-lerp resampler; use it
    * to UNIFY nearby rates, not to decimate.
    */
  def resampleLinear(a: Audio, toRate: Int): Audio = {
    require(toRate >= 1, s"toRate must be >= 1, got $toRate")
    val nIn = a.nFrames
    if (toRate == a.sampleRate || nIn == 0) return a.copy(sampleRate = toRate)
    val nOut = math.max(1,
      math.round(nIn.toLong * toRate / a.sampleRate.toDouble).toInt)
    val out = new Array[Int](nOut * a.channels)
    var c = 0
    while (c < a.channels) {
      var t = 0
      while (t < nOut) {
        val p =
          if (nOut == 1) 0.0 else t.toDouble * (nIn - 1) / (nOut - 1)
        val i0 = p.toInt
        val i1 = math.min(nIn - 1, i0 + 1)
        val frac = p - i0
        val v = a.samples(i0 * a.channels + c) * (1.0 - frac) +
          a.samples(i1 * a.channels + c) * frac
        out(t * a.channels + c) = math.floor(v + 0.5).toInt
        t += 1
      }
      c += 1
    }
    Audio(toRate, a.channels, a.bitsPerSample, out)
  }

  /** RMS gain normalization to a target level — the pre-batching
    * loudness unifier (a VAD threshold or an energy feature tuned on
    * one corpus silently breaks on another recorded 20 dB hotter;
    * normalize FIRST). scale = targetRms / rms over ALL samples
    * (channel-coupled, so stereo balance is preserved), round-half-up
    * back to the integer domain, clamped to the bit depth. Silence
    * (rms = 0) returns unchanged — there is no gain that makes
    * silence loud, and NaNs must not escape into features.
    */
  def normalizeGain(a: Audio, targetRms: Double): Audio = {
    require(targetRms > 0, s"targetRms must be positive, got $targetRms")
    if (a.samples.isEmpty) return a
    var ss = 0.0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toDouble; ss += s * s; i += 1
    }
    val rms = math.sqrt(ss / a.samples.length)
    if (rms == 0.0) return a
    val scale = targetRms / rms
    val lim = (1 << (a.bitsPerSample - 1)) - 1
    val out = new Array[Int](a.samples.length)
    i = 0
    while (i < out.length) {
      val v = math.floor(a.samples(i) * scale + 0.5)
      out(i) = math.max(-lim - 1, math.min(lim, v)).toInt
      i += 1
    }
    a.copy(samples = out)
  }

  // --- spectral analysis (pure-JVM FFT) ----------------------------------

  /** In-place iterative radix-2 Cooley–Tukey FFT. `re.length` must be
    * a power of two; `im` the same length (zeros for a real signal).
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft size $n not a power of 2")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Frame-level spectral summary of a clip — the standard audio-
    * filtering features (music/speech/noise discrimination, corrupt-
    * payload detection) a media pipeline computes before anything
    * model-based. Mono-mixes, slides a Hann-windowed `frameSize` FFT
    * at `hop`, averages the per-frame magnitude spectra, and derives:
    *
    *  - `dominantHz`: peak bin of the mean spectrum (DC excluded)
    *  - `centroidHz`: magnitude-weighted mean frequency
    *  - `rolloffHz`: smallest frequency holding ≥ 85% of total mass
    *  - `fluxMean`: mean L2 spectral flux between consecutive frames
    *    (0 for stationary signals — a planted pure tone — higher for
    *    transients)
    *
    * Per-clip bounded state (frameSize/2+1 doubles); the Spark-side
    * wrapper runs it inside mapPartitions, one clip per row, no
    * shuffle of payloads.
    */
  final case class Spectral(nFrames: Int, dominantHz: Double,
      centroidHz: Double, rolloffHz: Double, fluxMean: Double)

  def spectralFeatures(a: Audio, frameSize: Int = 256,
      hop: Int = 128): Spectral = {
    require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a power of 2 >= 8, got $frameSize")
    require(hop > 0)
    val mono = monoMix(a)
    if (mono.length < frameSize) return Spectral(0, 0.0, 0.0, 0.0, 0.0)
    val nFrames = (mono.length - frameSize) / hop + 1
    val nBins = frameSize / 2 + 1
    val mean = new Array[Double](nBins)
    var prev: Array[Double] = null
    var fluxSum = 0.0
    val hann = Array.tabulate(frameSize)(i =>
      0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (frameSize - 1))))
    var f = 0
    while (f < nFrames) {
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var i = 0
      while (i < frameSize) {
        re(i) = mono(f * hop + i) * hann(i); i += 1
      }
      fft(re, im)
      val mag = new Array[Double](nBins)
      var b = 0
      while (b < nBins) {
        mag(b) = math.sqrt(re(b) * re(b) + im(b) * im(b)); b += 1
      }
      var bb = 0
      while (bb < nBins) { mean(bb) += mag(bb); bb += 1 }
      if (prev != null) {
        var s = 0.0
        var k = 0
        while (k < nBins) {
          val d = mag(k) - prev(k); s += d * d; k += 1
        }
        fluxSum += math.sqrt(s)
      }
      prev = mag
      f += 1
    }
    var b = 0
    while (b < nBins) { mean(b) /= nFrames; b += 1 }
    val binHz = a.sampleRate.toDouble / frameSize
    var peak = 1 // exclude DC
    var total = 0.0
    var weighted = 0.0
    b = 0
    while (b < nBins) {
      if (b >= 1 && mean(b) > mean(peak)) peak = b
      total += mean(b); weighted += b * binHz * mean(b)
      b += 1
    }
    var cum = 0.0
    var roll = nBins - 1
    var found = false
    b = 0
    while (b < nBins && !found) {
      cum += mean(b)
      if (cum >= 0.85 * total) { roll = b; found = true }
      b += 1
    }
    Spectral(nFrames, peak * binHz,
      if (total == 0.0) 0.0 else weighted / total, roll * binHz,
      if (nFrames < 2) 0.0 else fluxSum / (nFrames - 1))
  }
}
