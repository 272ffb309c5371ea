package graft.sources

/** A worked Thrift COMPACT-protocol Injection through [[CodecSource]]
  * — the plug-in path standing in for the reference's `LzoThrift[T]`
  * source family (commons/source/LzoTraits.scala:74-97), exactly as
  * [[ProtoWire]] does for `LzoProtobuf`. Hand-rolls the PUBLIC
  * compact wire protocol for one concrete struct: short-form field
  * headers with delta-encoded ids, ZIGZAG varints for integers (the
  * encoding protobuf reserves for sint*, mandatory in compact
  * thrift), little-endian doubles, varint-length strings, and
  * size-and-type list headers — proving any generated
  * `TSerializer`/`TDeserializer` pair drops into
  * [[CodecSource.write]]/[[CodecSource.read]] unchanged.
  *
  * Unknown fields skip by type id (forward compatibility), and the
  * struct terminates with STOP — both demonstrated in SourcesSpec.
  */
object ThriftCompactWire {

  /** The sample struct, IDL-equivalent:
    * {{{
    * struct TrackRecord {
    *   1: i64    user_id;
    *   2: string name;
    *   3: double score;
    *   4: list<string> tags;
    * }
    * }}}
    */
  final case class TrackRecord(userId: Long, name: String, score: Double,
      tags: Seq[String])

  private final val STOP = 0
  private final val TRUE = 1
  private final val FALSE = 2
  private final val BYTE = 3
  private final val I16 = 4
  private final val I32 = 5
  private final val I64 = 6
  private final val DOUBLE = 7
  private final val BINARY = 8
  private final val LIST = 9
  private final val SET = 10
  private final val MAP = 11
  private final val STRUCT = 12

  // --- primitives --------------------------------------------------------

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeFieldHeader(out: java.io.ByteArrayOutputStream,
      lastId: Int, id: Int, tpe: Int): Unit = {
    val delta = id - lastId
    if (delta > 0 && delta <= 15) out.write((delta << 4) | tpe)
    else { out.write(tpe); writeVarint(out, zigzag(id.toLong)) }
  }

  private def writeString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  def encode(r: TrackRecord): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var last = 0
    writeFieldHeader(out, last, 1, I64); last = 1
    writeVarint(out, zigzag(r.userId))
    writeFieldHeader(out, last, 2, BINARY); last = 2
    writeString(out, r.name)
    writeFieldHeader(out, last, 3, DOUBLE); last = 3
    val bits = java.lang.Double.doubleToLongBits(r.score)
    (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
    writeFieldHeader(out, last, 4, LIST); last = 4
    if (r.tags.length < 15) out.write((r.tags.length << 4) | BINARY)
    else { out.write(0xF0 | BINARY); writeVarint(out, r.tags.length.toLong) }
    r.tags.foreach(writeString(out, _))
    out.write(STOP)
    out.toByteArray
  }

  // --- decoding ----------------------------------------------------------

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def readByte(): Int = { require(pos < buf.length, "truncated"); val b = buf(pos) & 0xFF; pos += 1; b }
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        require(shift < 64, "varint too long")
        val b = readByte()
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result
    }
    def readZigzag(): Long = unzigzag(readVarint())
    def readDoubleLe(): Double = {
      var bits = 0L
      (0 until 8).foreach(i => bits |= readByte().toLong << (8 * i))
      java.lang.Double.longBitsToDouble(bits)
    }
    def readString(): String = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= buf.length, "truncated string")
      val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      s
    }
    def skip(tpe: Int): Unit = tpe match {
      case TRUE | FALSE => ()
      case BYTE => readByte()
      case I16 | I32 | I64 => readVarint()
      case DOUBLE => (0 until 8).foreach(_ => readByte())
      case BINARY => { val n = readVarint().toInt; require(pos + n <= buf.length); pos += n }
      case LIST | SET =>
        val head = readByte()
        val size = if ((head >>> 4) == 15) readVarint().toInt else head >>> 4
        (0 until size).foreach(_ => skip(head & 0x0F))
      case MAP =>
        val size = readVarint().toInt
        if (size > 0) {
          val kv = readByte()
          (0 until size).foreach { _ => skip(kv >>> 4); skip(kv & 0x0F) }
        }
      case STRUCT =>
        var lastId = 0
        var done = false
        while (!done) {
          val h = readByte()
          if (h == STOP) done = true
          else {
            val d = h >>> 4
            lastId = if (d == 0) readZigzag().toInt else lastId + d
            skip(h & 0x0F)
          }
        }
      case other => throw new IllegalArgumentException(s"thrift type $other")
    }
  }

  def decode(bytes: Array[Byte]): TrackRecord = {
    val in = new Reader(bytes)
    var userId = 0L; var name = ""; var score = 0.0
    var tags: Seq[String] = Nil
    var lastId = 0
    var done = false
    while (!done) {
      val h = in.readByte()
      if (h == STOP) done = true
      else {
        val delta = h >>> 4
        val tpe = h & 0x0F
        lastId = if (delta == 0) in.readZigzag().toInt else lastId + delta
        (lastId, tpe) match {
          case (1, I64) => userId = in.readZigzag()
          case (2, BINARY) => name = in.readString()
          case (3, DOUBLE) => score = in.readDoubleLe()
          case (4, LIST) =>
            val head = in.readByte()
            val size = if ((head >>> 4) == 15) in.readVarint().toInt else head >>> 4
            require((head & 0x0F) == BINARY, "tags must be list<string>")
            tags = (0 until size).map(_ => in.readString())
          case (_, t) => in.skip(t) // unknown field: forward compatibility
        }
      }
    }
    TrackRecord(userId, name, score, tags)
  }
}
