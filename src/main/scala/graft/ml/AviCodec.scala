package graft.ml

/** Pure-JVM AVI container codec — the video-modality counterpart of
  * [[ImageCodec]]/[[AudioCodec]], hand-parsed from the public
  * RIFF/AVI layout. A video CONTAINER parse is the real work of a
  * frame-sampling pipeline: walk `LIST hdrl` for the main header
  * (dimensions, frame count, frame interval), walk `LIST movi` for
  * the per-frame `##dc`/`##db` chunks, and hand each frame's payload
  * to an image codec. Frame payloads are codec-agnostic bytes — for
  * MJPEG files they are plain JPEG (whose dimensions
  * [[ImageCodec.meta]] already reads); tests and the oracle gate use
  * netpbm frames so the full frame pixel path is checkable end to
  * end without an entropy decoder.
  */
object AviCodec {

  final case class AviMeta(width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Walk the top-level chunks; `onChunk(id, listType, payloadOff,
    * payloadLen)` — for LIST chunks, `listType` is the list's fourcc
    * and the payload excludes it.
    */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      onChunk: (String, String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= to) {
      val id = fourcc(b, i)
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > to) return
      if (id == "LIST" && len >= 4)
        onChunk(id, fourcc(b, i + 8), i + 12, len - 4)
      else onChunk(id, "", i + 8, len)
      i += 8 + len + (len & 1) // chunks pad to even length
    }
  }

  /** Main-header metadata: dwTotalFrames/dwWidth/dwHeight/
    * dwMicroSecPerFrame from `avih` inside `LIST hdrl`.
    */
  def meta(bytes: Array[Byte]): Option[AviMeta] = {
    if (!isAvi(bytes)) return None
    var found: Option[AviMeta] = None
    walk(bytes, 12, bytes.length) { (id, listType, off, len) =>
      if (id == "LIST" && listType == "hdrl")
        walk(bytes, off, off + len) { (cid, _, coff, clen) =>
          if (cid == "avih" && clen >= 40 && found.isEmpty)
            found = Some(AviMeta(
              width = le32(bytes, coff + 32),
              height = le32(bytes, coff + 36),
              nFrames = le32(bytes, coff + 16),
              microSecPerFrame = le32(bytes, coff)))
        }
    }
    found.filter(m => m.width > 0 && m.height > 0)
  }

  /** Extract the video frame payloads: every `##dc` (compressed) /
    * `##db` (uncompressed) chunk inside `LIST movi`, in stream order.
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (!isAvi(bytes)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walk(bytes, 12, bytes.length) { (id, listType, off, len) =>
      if (id == "LIST" && listType == "movi")
        walk(bytes, off, off + len) { (cid, _, coff, clen) =>
          if (cid.length == 4 && (cid.endsWith("dc") || cid.endsWith("db")) &&
            cid.take(2).forall(_.isDigit))
            out += java.util.Arrays.copyOfRange(bytes, coff, coff + clen)
        }
    }
    out.toSeq
  }

  /** Write a minimal spec-correct AVI: `LIST hdrl { avih }` +
    * `LIST movi { 00dc* }` (no stream headers or index — readers that
    * stream the movi list, like [[frames]], accept it; it exists for
    * tests and the oracle gate).
    */
  def encodeAvi(frameData: Seq[Array[Byte]], width: Int, height: Int,
      microSecPerFrame: Int): Array[Byte] = {
    def even(n: Int): Int = n + (n & 1)
    val avihLen = 56
    val hdrlLen = 4 + 8 + avihLen
    val moviLen = 4 + frameData.map(f => 8 + even(f.length)).sum
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(riffLen).put("AVI ".getBytes)
    buf.put("LIST".getBytes).putInt(hdrlLen).put("hdrl".getBytes)
    buf.put("avih".getBytes).putInt(avihLen)
    buf.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
    buf.putInt(frameData.length).putInt(0).putInt(1).putInt(0)
    buf.putInt(width).putInt(height)
    (0 until 4).foreach(_ => buf.putInt(0))
    buf.put("LIST".getBytes).putInt(moviLen).put("movi".getBytes)
    frameData.foreach { f =>
      buf.put("00dc".getBytes).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }
}
