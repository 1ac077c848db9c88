package graft.format

import java.nio.{ByteBuffer, ByteOrder}

/** Growable little-endian byte sink used by all encoders.
  *
  * Mirrors the role of the reference's `Buffer`/`Vector<char>` encode sinks
  * (reference: dwio/nimble/common/Buffer.h) without copying its layout.
  */
final class ByteSink(initial: Int = 1024) {
  private var buf = new Array[Byte](math.max(16, initial))
  private var pos = 0

  def size: Int = pos

  private def ensure(n: Int): Unit = {
    if (pos + n > buf.length) {
      var cap = buf.length
      while (cap < pos + n) cap = cap * 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def writeByte(v: Int): Unit = { ensure(1); buf(pos) = v.toByte; pos += 1 }
  def writeShort(v: Int): Unit = { ensure(2); buf(pos) = v.toByte; buf(pos + 1) = (v >> 8).toByte; pos += 2 }
  def writeInt(v: Int): Unit = {
    ensure(4)
    buf(pos) = v.toByte; buf(pos + 1) = (v >> 8).toByte
    buf(pos + 2) = (v >> 16).toByte; buf(pos + 3) = (v >> 24).toByte
    pos += 4
  }
  def writeLong(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(pos + i) = (v >> (8 * i)).toByte; i += 1 }
    pos += 8
  }
  /** Bulk little-endian long write — one capacity check and one buffer-level
    * put instead of n per-call ensure/shift loops (index streams write
    * millions of longs per stripe flush). Byte layout identical to n
    * [[writeLong]] calls. */
  def writeLongs(vs: Array[Long], n: Int): Unit = {
    ensure(n << 3)
    ByteBuffer.wrap(buf, pos, n << 3).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().put(vs, 0, n)
    pos += n << 3
  }
  def writeDouble(v: Double): Unit = writeLong(java.lang.Double.doubleToRawLongBits(v))
  def writeFloat(v: Float): Unit = writeInt(java.lang.Float.floatToRawIntBits(v))

  /** Unsigned LEB128 varint. */
  def writeVarint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { writeByte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    writeByte(v.toInt)
  }
  /** ZigZag-encoded signed varint. */
  def writeZigZag(v: Long): Unit = writeVarint((v << 1) ^ (v >> 63))

  def writeBytes(b: Array[Byte]): Unit = writeBytes(b, 0, b.length)
  def writeBytes(b: Array[Byte], off: Int, len: Int): Unit = {
    ensure(len); System.arraycopy(b, off, buf, pos, len); pos += len
  }
  /** Length-prefixed child block (used for cascaded sub-streams). */
  def writeBlock(b: Array[Byte]): Unit = { writeVarint(b.length.toLong); writeBytes(b) }

  /** Copy `len` already-written bytes starting at `off` to the end (prefix
    * decoding: previous value's shared prefix). */
  def writeBytesFromSelf(off: Int, len: Int): Unit = {
    ensure(len)
    var i = 0
    while (i < len) { buf(pos + i) = buf(off + i); i += 1 }
    pos += len
  }

  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, pos)

  /** Internal buffer view (valid up to [[size]]) — zero-copy handoff for
    * decode-at-fill paths that immediately copy a range out. */
  def buffer: Array[Byte] = buf
}

/** Little-endian cursor over an encoded byte region. */
final class ByteCursor(val buf: Array[Byte], var pos: Int, val end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  def remaining: Int = end - pos
  def readByte(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
  def readShort(): Int = { val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8); pos += 2; v }
  def readInt(): Int = {
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4; v
  }
  def readLong(): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8; v
  }
  def readDouble(): Double = java.lang.Double.longBitsToDouble(readLong())
  def readFloat(): Float = java.lang.Float.intBitsToFloat(readInt())

  def readVarint(): Long = {
    var v = 0L; var shift = 0; var b = 0
    do { b = readByte(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
    v
  }
  def readZigZag(): Long = { val v = readVarint(); (v >>> 1) ^ -(v & 1) }

  def readBytes(len: Int): Array[Byte] = {
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; out
  }
  /** Read a length-prefixed child block as its own cursor (no copy). */
  def readBlock(): ByteCursor = {
    val len = readVarint().toInt
    val c = new ByteCursor(buf, pos, pos + len)
    pos += len
    c
  }
}
