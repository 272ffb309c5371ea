package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery (schema, batch iteration, partitioning,
  * metadata propagation) is real and tested. The codec step is REAL
  * for image payloads ([[ImageCodec]]: full BMP/PPM/PGM pixel decode,
  * PNG/GIF/JPEG header metadata, nearest-neighbor resize, grayscale,
  * average-hash features — all hand-parsed, no external libraries);
  * unrecognized payloads (audio/video/opaque blobs) fall back to the
  * deterministic `decodeStub`, preserving the original plumbing
  * contract — swap the fallback for a real A/V codec (e.g. javacv /
  * JNI) without touching the batching.
  */
object Multimodal {

  /** A decoded-media metadata record. */
  case class MediaMeta(
      id: Long,
      byteLen: Long,
      contentHash: String,
      width: Int,
      height: Int,
      format: String)

  /** Deterministic fake "decode": derives width/height/format from
    * the byte content. STUB — replace with a real codec; the
    * signature (bytes in, metadata out) is the real contract.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map("%02x".format(_)).mkString
    // dimensions/format derived from the hex digest characters so the
    // fake is reproducible from the content hash alone
    val w = 64 + (hex.charAt(0).toInt % 16) * 64
    val h = 64 + (hex.charAt(1).toInt % 16) * 64
    val fmt = Seq("jpeg", "png", "webp")(hex.charAt(2).toInt % 3)
    MediaMeta(id, bytes.length.toLong, hex, w, h, fmt)
  }

  /** Decode a (id, media: binary) DataFrame into metadata — batch
    * iteration per partition (the Scala analogue of `mapInPandas`
    * batches: one decoder instance per partition, streaming rows).
    * Recognized image payloads get REAL header metadata via
    * [[ImageCodec.meta]]; anything else (audio/video/opaque bytes)
    * falls back to the deterministic stub.
    */
  def decodeMetadata(df: DataFrame, idCol: String = "id",
      mediaCol: String = "media"): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // per-partition decoder lifecycle: open once, stream batch
        // (the reference's `using` resource pattern,
        // RichPipe.scala:73-119)
        it.map { case (id, bytes) =>
          ImageCodec.meta(bytes) match {
            case Some((w, h, fmt)) =>
              val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
              MediaMeta(id, bytes.length.toLong,
                md.map("%02x".format(_)).mkString, w, h, fmt)
            case None => decodeStub(id, bytes)
          }
        }
      }
  }

  /** A fully decoded image row: dimensions + raw pixel payload. */
  case class DecodedImage(id: Long, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])

  /** REAL image decode (BMP / binary PPM / PGM → raster): one decoder
    * per partition, undecodable rows dropped (count them upstream with
    * [[decodeMetadata]] if loss must be audited).
    */
  def decodeImages(df: DataFrame, idCol: String = "id",
      mediaCol: String = "media"): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img =>
          DecodedImage(id, img.width, img.height, img.channels, img.pixels))
      })
  }

  /** REAL resize: decode, nearest-neighbor resample to (targetW,
    * targetH), re-encode as binary netpbm — a narrow per-row kernel,
    * no shuffle.
    */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "id", mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map { img =>
          (id, ImageCodec.encodePnm(ImageCodec.resizeNearest(img, targetW, targetH)),
            targetW, targetH)
        }
      })
      .toDF(idCol, "resized", "target_w", "target_h")
  }

  /** REAL perceptual feature extraction: 64-dim average-hash vector
    * per decodable image ([[ImageCodec.aHash64]]) — near-duplicate
    * images land at cosine ≈ 1, feeding directly into the ANN /
    * embedding-dedup operators. Same per-partition batching as
    * [[featureExtractStub]] (which remains the generic-payload path).
    */
  def imageFeatures(df: DataFrame, idCol: String = "id",
      mediaCol: String = "media"): Dataset[MediaEmbedding] = {
    implicit val enc = Encoders.product[MediaEmbedding]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img =>
          MediaEmbedding(id, ImageCodec.aHash64(img)))
      })
  }

  /** Perceptual near-duplicate image pairs: decode → 64-dim
    * average-hash embedding ([[ImageCodec.aHash64]], the classic
    * perceptual-dedup vector — robust to resize/re-encode, cheap to
    * compute) → [[Similarity.cosineNearDuplicates]] blocked cosine
    * join at `threshold`. Undecodable payloads are skipped. Output
    * (id1, id2, cos), id1 < id2.
    *
    * Scale shape: the decode is one narrow mapPartitions pass; the
    * pair search inherits cosineNearDuplicates' hyperplane-LSH
    * blocking, so no global all-pairs — the image-side twin of the
    * text MinHash pipeline.
    */
  def imageNearDuplicates(df: DataFrame, threshold: Double = 0.95,
      useLsh: Boolean = true, nBits: Int = 6, idCol: String = "id",
      mediaCol: String = "media"): DataFrame = {
    val vecs = imageFeatures(df, idCol, mediaCol)
      .toDF("id", "vec")
    Similarity.cosineNearDuplicates(vecs, threshold, dim = 64,
      useLsh = useLsh, nBits = nBits)
  }

  /** Perceptual near-duplicate discovery on the 64-bit difference
    * hash ([[ImageCodec.dHash64]]) via banded Hamming blocking — the
    * integer twin of [[imageNearDuplicates]]' cosine path and the
    * image-side analogue of [[Dedup.simHashNearDuplicates]]: decode →
    * dHash (narrow, no payload shuffle) → explode `bands` hash
    * slices → equi-join on (band, slice) → exact Hamming verify
    * ≤ `maxHamming`. Catches what byte-level dedup misses (a
    * brightness-shifted re-encode has different bytes but an
    * IDENTICAL dHash). Output (id, dup_id, hamming), id < dup_id,
    * with every emitted pair carrying its true distance.
    *
    * Scale shape: the quadratic step runs only inside (band, slice)
    * buckets. Pigeonhole recall guarantee: a pair with fewer than
    * `bands` differing bits always shares a clean band; beyond that,
    * recall is the standard LSH-banding trade (more/narrower bands =
    * higher recall, more candidates — expected RANDOM candidates
    * ≈ bands · n²/2^(64/bands+1), so at billion-image scale use
    * `bands = 2` and a second pass for the missed tail).
    */
  def dhashNearDuplicates(df: DataFrame, maxHamming: Int = 8,
      bands: Int = 4, idCol: String = "id",
      mediaCol: String = "media"): DataFrame = {
    val hashes = df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decode(bytes).map(img => (id, ImageCodec.dHash64(img)))
      })(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "dh")
    bandedHamming64(hashes, maxHamming, bands)
  }

  /** Banded-Hamming self-join on a 64-bit hash column — the shared
    * candidate-generation + exact-verify kernel behind
    * [[dhashNearDuplicates]] and [[audioFpNearDuplicates]]. Input
    * `(id: Long, dh: Long)`; output `(id, dup_id, hamming)`, id <
    * dup_id, hamming ≤ `maxHamming`. The quadratic step runs only
    * inside (band, slice) buckets; pigeonhole guarantees recall for
    * pairs with fewer than `bands` differing bits.
    */
  private[graft] def bandedHamming64(hashes: DataFrame, maxHamming: Int,
      bands: Int): DataFrame = {
    require(bands > 0 && bands <= 64 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val slices = hashes.select(col("id"), col("dh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("dh"), b * width).bitwiseAND(mask).as("bv"))
      }: _*)).as("s"))
      .select(col("id"), col("dh"), col("s.band"), col("s.bv"))
    slices.alias("l").join(slices.alias("r"), Seq("band", "bv"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id"), col("r.id").as("dup_id"),
        Dedup.hammingDistance(col("l.dh"), col("r.dh"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** 64-bit temporal energy-envelope difference hash of a decoded
    * clip — the audio twin of [[ImageCodec.dHash64]]: the clip is cut
    * into 65 equal spans by sample index (sample `f` lands in span
    * `f*65/n`), each span's energy is the exact integer sum of squared
    * samples, and bit `k` is set when span `k` carries more energy
    * than span `k+1`. Comparing only ADJACENT spans makes the print
    * invariant to uniform gain (a volume-normalized or amplified
    * re-encode scales every span energy by the same factor, preserving
    * every comparison — the audio analogue of dHash's brightness
    * invariance) and all arithmetic is Long-exact, so the same clip
    * always prints identically.
    */
  def audioFp64(a: AudioCodec.Audio): Long = {
    val v = a.samples
    val n = v.length
    val e = new Array[Long](65)
    var f = 0
    while (f < n) {
      val k = (f.toLong * 65 / n).toInt
      e(k) += v(f).toLong * v(f)
      f += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (e(k) > e(k + 1)) h |= (1L << k)
      k += 1
    }
    h
  }

  /** Perceptual near-duplicate discovery on audio payloads via
    * [[audioFp64]] + the banded-Hamming kernel — catches what
    * byte-level dedup misses (a gain-adjusted re-encode has different
    * bytes but an IDENTICAL energy-envelope print). Decode + print is
    * a narrow per-clip map (the payload never shuffles); candidates
    * come from the 4×16-bit slice equi-join; every emitted pair
    * carries its exact Hamming distance. Clips that fail WAV decode
    * or carry fewer than 65 samples are skipped (a sub-65-sample
    * print would alias empty spans).
    *
    * Recall follows the banding pigeonhole: pairs with FEWER than
    * `bands` differing bits are always found; pairs at exactly
    * `maxHamming` ≥ `bands` bits are found only when some band is
    * clean (the standard LSH-banding trade — see
    * [[bandedHamming64]]).
    */
  def audioFpNearDuplicates(df: DataFrame, maxHamming: Int = 4,
      bands: Int = 4, idCol: String = "id",
      mediaCol: String = "media"): DataFrame = {
    val hashes = df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).filter(_.samples.length >= 65)
          .map(a => (id, audioFp64(a)))
      })(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "dh")
    bandedHamming64(hashes, maxHamming, bands)
  }

  /** Temporal perceptual near-duplicate discovery on video payloads:
    * every decoded frame gets a [[ImageCodec.dHash64]], candidates
    * come from a (frame_idx, hash-slice) equi-join — two videos pair
    * up when ANY aligned frame shares a clean band — and each
    * candidate pair is verified by the exact Hamming distance summed
    * over all frame-index-aligned frames. Output `(id, dup_id,
    * n_aligned, hamming)`, id < dup_id, total hamming ≤
    * `maxTotalHamming`. Catches re-encodes byte dedup misses (a
    * brightness-shifted transcode prints identically frame by frame).
    * Recall is per-frame pigeonhole: a pair is guaranteed a candidate
    * only when SOME aligned frame differs by fewer than `bands` bits
    * — a pair whose every frame spreads ≥ `bands` flips across all
    * bands can sit under `maxTotalHamming` yet be missed (the LSH
    * banding trade, per-frame).
    *
    * Scale shape: payloads never shuffle — the per-frame hash table
    * (one narrow row per frame) is the only shuffled data, persisted
    * once (via [[graft.core.PipelineCaches]]) because candidate
    * generation and aligned verification both read it; the quadratic
    * step runs only inside (frame_idx, band, slice) buckets.
    */
  def videoFpNearDuplicates(df: DataFrame, maxTotalHamming: Int = 8,
      bands: Int = 4, idCol: String = "id",
      mediaCol: String = "media"): DataFrame = {
    require(bands > 0 && bands <= 64 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val frameHashes = graft.core.PipelineCaches.persistTracked(
      df.select(col(idCol).cast("long"), col(mediaCol))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        .mapPartitions(_.flatMap { case (id, bytes) =>
          AviCodec.frames(bytes).zipWithIndex.flatMap { case (fr, fi) =>
            ImageCodec.decode(fr).map(img =>
              (id, fi, ImageCodec.dHash64(img)))
          }
        })(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
          Encoders.scalaLong))
        .toDF("id", "fi", "dh"))
    val slices = frameHashes.select(col("id"), col("fi"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("dh"), b * width).bitwiseAND(mask).as("bv"))
      }: _*)).as("s"))
      .select(col("id"), col("fi"), col("s.band"), col("s.bv"))
    val cands = slices.alias("l").join(slices.alias("r"),
        Seq("fi", "band", "bv"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id"), col("r.id").as("dup_id"))
      .distinct()
    cands.join(frameHashes.select(col("id"), col("fi"),
        col("dh").as("dh_l")), Seq("id"))
      .join(frameHashes.select(col("id").as("dup_id"), col("fi"),
        col("dh").as("dh_r")), Seq("dup_id", "fi"))
      .groupBy("id", "dup_id")
      .agg(count(lit(1)).as("n_aligned"),
        sum(Dedup.hammingDistance(col("dh_l"), col("dh_r")).cast("long"))
          .as("hamming"))
      .filter(col("hamming") <= maxTotalHamming)
  }

  /** "Resize" stub: deterministic byte-slice standing in for a pixel
    * transform; preserves the batch/partition shape of a real kernel.
    */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "id", mediaCol: String = "media"): DataFrame = {
    val target = targetW.toLong * targetH
    df.withColumn("resized",
      expr(s"substring($mediaCol, 1, int(least(octet_length($mediaCol), ${target}L)))"))
      .withColumn("target_w", lit(targetW))
      .withColumn("target_h", lit(targetH))
  }

  /** Decoded WAV metadata. */
  case class AudioMeta(id: Long, sampleRate: Int, channels: Int,
      bits: Int, nFrames: Long, durationMs: Long)

  /** Header-only WAV metadata over a (id, media: binary) frame —
    * real parse ([[AudioCodec.meta]]), non-WAV rows dropped.
    */
  def decodeAudioMeta(df: DataFrame, idCol: String = "id",
      mediaCol: String = "media"): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.meta(bytes).map { case (rate, ch, bits, frames, ms) =>
          AudioMeta(id, rate, ch, bits, frames, ms)
        }
      })
  }

  /** Scan-time audio features per decodable PCM payload. */
  case class AudioFeatureRow(id: Long, nFrames: Long, rms: Double,
      zeroCrossings: Long, silenceRatio: Double, peak: Int)

  def audioFeatures(df: DataFrame, silenceAbs: Int = 512,
      idCol: String = "id", mediaCol: String = "media"): Dataset[AudioFeatureRow] = {
    implicit val enc = Encoders.product[AudioFeatureRow]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).map { a =>
          val f = AudioCodec.features(a, silenceAbs)
          AudioFeatureRow(id, a.nFrames.toLong, f.rms, f.zeroCrossings,
            f.silenceRatio, f.peak)
        }
      })
  }

  /** Per-clip spectral summary row (see [[AudioCodec.spectralFeatures]]). */
  case class AudioSpectralRow(id: Long, nFrames: Int, dominantHz: Double,
      centroidHz: Double, rolloffHz: Double, fluxMean: Double)

  /** FFT spectral features per clip — the music/speech/noise
    * discrimination signals an audio-filtering pipeline computes
    * before anything model-based. Narrow mapPartitions kernel, one
    * clip per row, bounded per-clip state, no payload shuffle.
    */
  def audioSpectral(df: DataFrame, frameSize: Int = 256, hop: Int = 128,
      idCol: String = "id", mediaCol: String = "media"): Dataset[AudioSpectralRow] = {
    implicit val enc = Encoders.product[AudioSpectralRow]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).map { a =>
          val s = AudioCodec.spectralFeatures(a, frameSize, hop)
          AudioSpectralRow(id, s.nFrames, s.dominantHz, s.centroidHz,
            s.rolloffHz, s.fluxMean)
        }
      })
  }

  /** One voice-activity segment of a clip (sample offsets). */
  case class VadRow(id: Long, segIdx: Int, startSample: Int, endSample: Int)

  /** Energy-threshold VAD per clip (see [[AudioCodec.vadSegments]]):
    * the ASR-prep cut list. Narrow mapPartitions kernel; clips with
    * no active frames emit nothing.
    */
  def vad(df: DataFrame, frameSamples: Int = 160,
      energyThresh: Double = 500.0, minSpeechFrames: Int = 1,
      minGapFrames: Int = 1, idCol: String = "id",
      mediaCol: String = "media"): Dataset[VadRow] = {
    implicit val enc = Encoders.product[VadRow]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).toSeq.flatMap { a =>
          AudioCodec.vadSegments(a, frameSamples, energyThresh,
            minSpeechFrames, minGapFrames)
            .zipWithIndex.map { case ((s, e), i) => VadRow(id, i, s, e) }
        }
      })
  }

  /** Nearest-neighbor mono resample to a fixed frame count — the
    * audio analogue of [[resizeImages]]; returns the integer samples
    * so downstream featurizers see exact values.
    */
  def resampleAudio(df: DataFrame, targetFrames: Int,
      idCol: String = "id", mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.decode(bytes).map(a =>
          (id, AudioCodec.resampleNearest(a, targetFrames).samples))
      })
      .toDF(idCol, "samples")
  }

  /** One extracted video frame: container-parsed payload bytes. */
  case class VideoFrame(id: Long, frameIdx: Int, frame: Array[Byte])

  /** REAL video frame sampling: parse the AVI container
    * ([[AviCodec.frames]]) and keep every `stride`-th frame — the
    * container-aware upgrade of the byte-chunk [[frameSample]]
    * (which remains the opaque-payload fallback). Each kept frame's
    * payload feeds an image codec downstream.
    */
  def videoFrames(df: DataFrame, stride: Int = 1, idCol: String = "id",
      mediaCol: String = "media"): Dataset[VideoFrame] = {
    implicit val enc = Encoders.product[VideoFrame]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AviCodec.frames(bytes).zipWithIndex.collect {
          case (f, i) if i % stride == 0 => VideoFrame(id, i, f)
        }
      })
  }

  /** Container metadata for AVI payloads. */
  case class VideoMeta(id: Long, width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Int)

  def decodeVideoMeta(df: DataFrame, idCol: String = "id",
      mediaCol: String = "media"): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AviCodec.meta(bytes).map(m =>
          VideoMeta(id, m.width, m.height, m.nFrames, m.microSecPerFrame))
      })
  }

  /** A detected scene boundary: `frameIdx` is the FIRST frame of the
    * new scene; `diff` the mean absolute per-byte pixel difference
    * against the previous frame.
    */
  case class SceneCut(id: Long, frameIdx: Int, diff: Double)

  /** Scene-cut detection over AVI clips — the frame-sampling
    * primitive of a video training pipeline (sample k frames PER
    * SCENE, not per fixed stride, so slideshows don't drown dynamic
    * content). Decodes consecutive frames through [[ImageCodec]] and
    * reports boundaries where the mean absolute pixel difference
    * exceeds `threshold` (0-255 scale). Per-clip sequential kernel in
    * mapPartitions: clip payloads never shuffle, state is two frames.
    */
  def sceneCuts(df: DataFrame, threshold: Double = 30.0,
      idCol: String = "id", mediaCol: String = "media"): Dataset[SceneCut] = {
    implicit val enc = Encoders.product[SceneCut]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val frames = AviCodec.frames(bytes)
        var prev: Array[Byte] = null
        frames.iterator.zipWithIndex.flatMap { case (payload, idx) =>
          ImageCodec.decode(payload) match {
            case Some(img) =>
              val cur = img.pixels
              val cut =
                if (prev != null && prev.length == cur.length) {
                  var sum = 0L
                  var i = 0
                  while (i < cur.length) {
                    sum += math.abs((cur(i) & 0xFF) - (prev(i) & 0xFF))
                    i += 1
                  }
                  val d = sum.toDouble / cur.length
                  if (d > threshold) Some(SceneCut(id, idx, d)) else None
                } else None
              prev = cur
              cut
            case None => prev = null; None // undecodable frame: reset
          }
        }
      })
  }

  /** A media embedding row: id + fixed-dimension feature vector. */
  case class MediaEmbedding(id: Long, embedding: Array[Float])

  /** Batched feature extraction — the inference step of a multimodal
    * pipeline. The plumbing is the real contract: one "model" handle
    * per partition, rows grouped into fixed-size batches (GPU-shaped
    * inference wants batched tensors, exactly like `mapInPandas`
    * batch iteration), one output vector per input row, order
    * preserved. The model itself is a STUB — a deterministic
    * hash-seeded projection — swappable for a real ONNX/JNI runtime
    * without touching the batching.
    */
  def featureExtractStub(df: DataFrame, dim: Int, batchSize: Int = 32,
      idCol: String = "id", mediaCol: String = "media"): Dataset[MediaEmbedding] = {
    implicit val enc = Encoders.product[MediaEmbedding]
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // "load the model" once per partition (resource lifecycle),
        // then stream fixed-size batches through it
        val model = new java.util.Random(42) // stand-in for a session handle
        val _ = model
        it.grouped(batchSize).flatMap { batch =>
          // a real runtime would run ONE forward pass on the batch
          batch.map { case (id, bytes) =>
            val seed = java.util.Arrays.hashCode(bytes).toLong & 0xffffffffL
            val rnd = new java.util.Random(seed)
            val v = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
            val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
            MediaEmbedding(id, if (n == 0f) v else v.map(_ / n))
          }
        }
      }
  }

  /** Frame sampling for video-like payloads: split the byte stream
    * into `frameSize` chunks, keep every `stride`-th — the
    * explode/partition shape of real frame extraction (the chunking
    * is real; only the downstream decode would be a codec).
    */
  def frameSample(df: DataFrame, frameSize: Int, stride: Int,
      idCol: String = "id", mediaCol: String = "media"): DataFrame =
    df.select(col(idCol),
      posexplode(
        transform(
          sequence(lit(0L),
            greatest(floor((octet_length(col(mediaCol)) - 1) / frameSize)
              .cast("long"), lit(0L))),
          i => col(mediaCol).substr((i * frameSize + 1).cast("int"),
            lit(frameSize))))
        .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
