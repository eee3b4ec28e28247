package graft.server

import java.nio.charset.StandardCharsets.UTF_8

/** Protobuf wire-format codec, hand-rolled (the build excludes a
  * protobuf toolchain — and the wire format itself is tiny: varints,
  * field tags `(number << 3) | wireType`, and length-delimited blobs).
  * Only what the Dgraph client API needs: wire types 0 (varint) and
  * 2 (length-delimited); groups and fixed32/64 are absent from
  * api.proto. proto3 presence rules: scalar fields are emitted only
  * when non-default, repeated/map entries always.
  */
object Proto {

  final class Writer {
    private val buf = new java.io.ByteArrayOutputStream(64)

    def writeVarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7
      }
      buf.write(x.toInt)
    }
    private def tag(field: Int, wire: Int): Unit =
      writeVarint((field.toLong << 3) | wire)

    def uint64(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); writeVarint(v) }
    def enum0(field: Int, v: Int): Unit = uint64(field, v.toLong)
    def bool(field: Int, b: Boolean): Unit =
      if (b) { tag(field, 0); writeVarint(1L) }
    def bytes(field: Int, b: Array[Byte]): Unit =
      if (b != null && b.nonEmpty) bytesAlways(field, b)
    def bytesAlways(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(b.length.toLong); buf.write(b)
    }
    def string(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytesAlways(field, s.getBytes(UTF_8))
    /** Embedded message / map entry — always emitted (presence). */
    def message(field: Int, m: Writer): Unit = bytesAlways(field, m.result)
    def stringMap(field: Int, m: Map[String, String]): Unit =
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val e = new Writer; e.string(1, k); e.string(2, v)
        message(field, e)
      }
    def repeatedString(field: Int, vs: Seq[String]): Unit =
      vs.foreach(v => bytesAlways(field, v.getBytes(UTF_8)))

    def result: Array[Byte] = buf.toByteArray
  }

  final class Reader(bytes: Array[Byte], from: Int, until: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var pos = from

    def hasNext: Boolean = pos < until

    def readVarint(): Long = {
      var shift = 0; var out = 0L
      var more = true
      while (more) {
        if (pos >= until) throw new IllegalArgumentException("truncated varint")
        val b = bytes(pos) & 0xff; pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
        if (shift > 70) throw new IllegalArgumentException("varint too long")
      }
      out
    }

    /** Next field: (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 0x7).toInt)
    }

    /** Length-delimited payload (wire type 2). */
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > until)
        throw new IllegalArgumentException("truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def readString(): String = new String(readBytes(), UTF_8)

    /** Skip a field of the given wire type (unknown-field tolerance —
      * a newer client may send fields this server doesn't model).
      */
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 2 => readBytes(); ()
      case 5 => pos += 4
      case 1 => pos += 8
      case other =>
        throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  /** Decode a `map<string,string>` entry. */
  def stringMapEntry(b: Array[Byte]): (String, String) = {
    val r = new Reader(b)
    var k = ""; var v = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) => k = r.readString()
      case (2, 2) => v = r.readString()
      case (_, w) => r.skip(w)
    }
    (k, v)
  }
}
