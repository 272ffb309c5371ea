package graft.sources

/** A worked protobuf-wire-format Injection through [[CodecSource]] —
  * the plug-in path that stands in for the reference's
  * `LzoProtobuf[T]` source family (commons/source/LzoTraits.scala:
  * 58-72, LzoCodecSource.scala:28-35). The real protobuf runtime
  * (and `spark-protobuf`) can't resolve in this sandbox, so this
  * hand-rolls the PUBLIC wire format (varint / fixed64 /
  * length-delimited fields, tag = field_number << 3 | wire_type) for
  * one concrete message shape, proving that any generated
  * `Message#toByteArray` / `Message#parseFrom` pair drops into
  * [[CodecSource.write]] / [[CodecSource.read]] unchanged:
  * the source only ever sees `T => Array[Byte]` and
  * `Array[Byte] => T`.
  *
  * Decoding skips unknown fields by wire type — the forward-
  * compatibility property protobuf deployments rely on when readers
  * lag writers, demonstrated in SourcesSpec.
  */
object ProtoWire {

  /** The sample message, proto-equivalent:
    * {{{
    * message UserEvent {
    *   int64  user_id = 1;   // varint
    *   string name    = 2;   // length-delimited
    *   double score   = 3;   // fixed64
    *   repeated string tags = 4;
    * }
    * }}}
    */
  final case class UserEvent(userId: Long, name: String, score: Double,
      tags: Seq[String])

  private final val WireVarint = 0
  private final val WireFixed64 = 1
  private final val WireLen = 2
  private final val WireFixed32 = 5

  // --- primitive writers -------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, field: Int,
      wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelimited(out: java.io.ByteArrayOutputStream,
      field: Int, bytes: Array[Byte]): Unit = {
    writeTag(out, field, WireLen)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  def encode(m: UserEvent): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (m.userId != 0L) { writeTag(out, 1, WireVarint); writeVarint(out, m.userId) }
    if (m.name.nonEmpty)
      writeLenDelimited(out, 2, m.name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (m.score != 0.0) {
      writeTag(out, 3, WireFixed64)
      val bits = java.lang.Double.doubleToLongBits(m.score)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    m.tags.foreach(t =>
      writeLenDelimited(out, 4, t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    out.toByteArray
  }

  // --- decoding ----------------------------------------------------------

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        require(pos < buf.length, "truncated varint")
        require(shift < 64, "varint too long")
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result // unreachable
    }
    def readFixed64(): Long = {
      require(pos + 8 <= buf.length, "truncated fixed64")
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      bits
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= buf.length, "truncated length-delimited field")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      r
    }
    def skip(wire: Int): Unit = wire match {
      case WireVarint => readVarint()
      case WireFixed64 => readFixed64()
      case WireLen => readBytes()
      case WireFixed32 =>
        require(pos + 4 <= buf.length, "truncated fixed32"); pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  def decode(bytes: Array[Byte]): UserEvent = {
    val in = new Reader(bytes)
    var userId = 0L; var name = ""; var score = 0.0
    val tags = scala.collection.mutable.ArrayBuffer.empty[String]
    while (in.hasMore) {
      val tag = in.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, WireVarint) => userId = in.readVarint()
        case (2, WireLen) =>
          name = new String(in.readBytes(), java.nio.charset.StandardCharsets.UTF_8)
        case (3, WireFixed64) =>
          score = java.lang.Double.longBitsToDouble(in.readFixed64())
        case (4, WireLen) =>
          tags += new String(in.readBytes(), java.nio.charset.StandardCharsets.UTF_8)
        case (_, w) => in.skip(w) // unknown field: forward compatibility
      }
    }
    UserEvent(userId, name, score, tags.toSeq)
  }
}
