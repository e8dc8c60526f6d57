package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Hand-rolled protobuf wire format (the same zero-dependency approach as
  * [[PackStream]] — no protobuf-java in the sandbox). Covers the subset
  * the Qdrant gRPC contract needs: varint (wire 0), 64-bit (wire 1),
  * length-delimited (wire 2), 32-bit (wire 5), packed repeated floats,
  * nested messages, and string/bytes fields.
  *
  * Wire reference: the public protobuf encoding spec
  * (developers.google.com/protocol-buffers/docs/encoding) — tag =
  * (field_number << 3) | wire_type, varints little-endian base-128.
  */
object Protobuf {

  // ========================================================== writer =====

  final class W {
    private val buf = new ByteArrayOutputStream()
    def bytes: Array[Byte] = buf.toByteArray

    def rawVarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = rawVarint((field.toLong << 3) | wire)
    private def le32(v: Int): Unit =
      (0 until 4).foreach(i => buf.write((v >>> (8 * i)) & 0xff))
    private def le64(v: Long): Unit =
      (0 until 8).foreach(i => buf.write(((v >>> (8 * i)) & 0xff).toInt))

    /** varint field (uint32/uint64/int32/int64/bool/enum). */
    def uint(field: Int, v: Long): W = { tag(field, 0); rawVarint(v); this }
    def bool(field: Int, b: Boolean): W = uint(field, if (b) 1L else 0L)
    def str(field: Int, s: String): W =
      bytesField(field, s.getBytes(StandardCharsets.UTF_8))
    def bytesField(field: Int, b: Array[Byte]): W = {
      tag(field, 2); rawVarint(b.length); buf.write(b); this
    }
    def msg(field: Int, m: W): W = bytesField(field, m.bytes)
    def float(field: Int, f: Float): W = {
      tag(field, 5); le32(java.lang.Float.floatToIntBits(f)); this
    }
    def double(field: Int, d: Double): W = {
      tag(field, 1); le64(java.lang.Double.doubleToLongBits(d)); this
    }
    /** packed repeated float (proto3 default packing). */
    def packedFloats(field: Int, fs: Seq[Float]): W = {
      tag(field, 2); rawVarint(4L * fs.length)
      fs.foreach(f => le32(java.lang.Float.floatToIntBits(f)))
      this
    }
  }
  def w(): W = new W

  // ========================================================== reader =====

  /** One decoded field: varint value for wire 0/1/5 (bits for the fixed
    * widths), payload bytes for wire 2.
    */
  final case class Field(no: Int, wire: Int, num: Long, payload: Array[Byte]) {
    def str: String = new String(payload, StandardCharsets.UTF_8)
    def msg: Seq[Field] = fields(payload)
    def floatVal: Float = java.lang.Float.intBitsToFloat(num.toInt)
    def doubleVal: Double = java.lang.Double.longBitsToDouble(num)
    /** packed repeated float payload → values. */
    def floats: Seq[Float] = {
      val out = Seq.newBuilder[Float]
      var i = 0
      while (i + 4 <= payload.length) {
        var bits = 0
        var j = 0
        while (j < 4) { bits |= (payload(i + j) & 0xff) << (8 * j); j += 1 }
        out += java.lang.Float.intBitsToFloat(bits)
        i += 4
      }
      out.result()
    }
  }

  def fields(b: Array[Byte]): Seq[Field] = {
    val out = Seq.newBuilder[Field]
    var i = 0
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(i < b.length, "truncated varint")
        val x = b(i) & 0xff
        i += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    while (i < b.length) {
      val t = varint()
      val no = (t >>> 3).toInt
      val wire = (t & 7).toInt
      wire match {
        case 0 => out += Field(no, 0, varint(), Array.empty)
        case 1 =>
          var v = 0L
          (0 until 8).foreach { j => v |= (b(i + j) & 0xffL) << (8 * j) }
          i += 8
          out += Field(no, 1, v, Array.empty)
        case 5 =>
          var v = 0L
          (0 until 4).foreach { j => v |= (b(i + j) & 0xffL) << (8 * j) }
          i += 4
          out += Field(no, 5, v, Array.empty)
        case 2 =>
          val len = varint().toInt
          require(i + len <= b.length, "truncated length-delimited field")
          out += Field(no, 2, len, java.util.Arrays.copyOfRange(b, i, i + len))
          i += len
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    out.result()
  }

  /** First occurrence of a field number, if present. */
  def find(fs: Seq[Field], no: Int): Option[Field] = fs.find(_.no == no)
  def all(fs: Seq[Field], no: Int): Seq[Field] = fs.filter(_.no == no)

  // ====================================================== gRPC-Web =======

  /** Frame a gRPC(-Web) message: 1 flag byte + 4-byte BE length + bytes.
    * Flag 0x00 = DATA, 0x80 = trailers (text `key: value\r\n` lines).
    */
  def grpcFrame(flag: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(flag)
    (3 to 0 by -1).foreach(i => out.write((payload.length >>> (8 * i)) & 0xff))
    out.write(payload)
    out.toByteArray
  }

  /** Split a gRPC-Web body into (flag, payload) frames. */
  def grpcFrames(body: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var i = 0
    while (i + 5 <= body.length) {
      val flag = body(i) & 0xff
      var len = 0
      (1 to 4).foreach(j => len = (len << 8) | (body(i + j) & 0xff))
      require(i + 5 + len <= body.length, "truncated gRPC frame")
      out += ((flag, java.util.Arrays.copyOfRange(body, i + 5, i + 5 + len)))
      i += 5 + len
    }
    out.result()
  }
}
