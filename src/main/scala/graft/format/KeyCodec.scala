package graft.format

/** Order-preserving composite key codec — the KeyEncoder analog (reference:
  * dwio/nimble/index/KeyEncoding.h:30-44, index/IndexKeyEncoder.h): encodes a
  * tuple of column values into bytes whose UNSIGNED LEXICOGRAPHIC order
  * equals the tuple's (component-wise, left-to-right) sort order. Component
  * encodings are prefix-free against each other, so a composite prefix probe
  * brackets exactly the keys sharing that prefix.
  *
  * Encodings (memcomparable, the standard scheme used by ordered KV stores).
  * Every component starts with a presence tag — 0x00 = NULL (sorts first),
  * 0x01 = present — followed by the value encoding:
  *  - long: 8 bytes big-endian with the sign bit flipped (unsigned byte
  *    order == signed numeric order)
  *  - double: IEEE-754 bits, sign-flipped for non-negatives / all-bits
  *    inverted for negatives (total order incl. -0.0 < +0.0)
  *  - bytes/string: raw bytes with 0x00 escaped as 0x00 0xFF, terminated by
  *    0x00 0x00 — shorter-is-smaller holds and no encoding is a prefix of a
  *    different value's encoding
  *
  * The null tag makes EVERY row indexable: a probe that constrains only a
  * PREFIX of the members still brackets rows whose unconstrained trailing
  * members are null (SQL semantics — an unconstrained column never filters);
  * a probe value itself is always non-null (tag 0x01), so rows with a null
  * in a CONSTRAINED member sort outside its bracket and never match.
  */
object KeyCodec {

  def putNull(s: ByteSink): Unit = s.writeByte(0)

  def putLong(s: ByteSink, v: Long): Unit = {
    s.writeByte(1)
    val k = v ^ Long.MinValue
    var i = 56
    while (i >= 0) { s.writeByte(((k >>> i) & 0xff).toInt); i -= 8 }
  }

  def putDouble(s: ByteSink, v: Double): Unit = {
    s.writeByte(1)
    val bits = java.lang.Double.doubleToLongBits(v)
    val k = if (bits >= 0) bits ^ Long.MinValue else ~bits
    var i = 56
    while (i >= 0) { s.writeByte(((k >>> i) & 0xff).toInt); i -= 8 }
  }

  def putBytes(s: ByteSink, b: Array[Byte], off: Int, len: Int): Unit = {
    s.writeByte(1)
    var i = 0
    while (i < len) {
      val x = b(off + i)
      s.writeByte(x & 0xff)
      if (x == 0) s.writeByte(0xff)
      i += 1
    }
    s.writeByte(0); s.writeByte(0)
  }

  /** Encode a probe tuple (Long/Int/Short/Byte, Double/Float, String,
    * Array[Byte], null); used by Lookup for bounds. */
  def encode(values: Seq[Any]): Array[Byte] = {
    val s = new ByteSink(32)
    values.foreach {
      case null => putNull(s)
      case v: Long => putLong(s, v)
      case v: Int => putLong(s, v.toLong)
      case v: Short => putLong(s, v.toLong)
      case v: Byte => putLong(s, v.toLong)
      case v: Double => putDouble(s, v)
      case v: Float => putDouble(s, v.toDouble)
      case v: String => val b = v.getBytes("UTF-8"); putBytes(s, b, 0, b.length)
      case v: Array[Byte] => putBytes(s, v, 0, v.length)
      case other => throw new IllegalArgumentException(
        s"composite key probe: unsupported value type ${if (other == null) "null" else other.getClass}")
    }
    s.toArray
  }

  /** Unsigned lexicographic compare; shorter-prefix-first on ties. */
  def compare(a: Array[Byte], aOff: Int, aLen: Int, b: Array[Byte], bOff: Int, bLen: Int): Int = {
    val n = math.min(aLen, bLen)
    var i = 0
    while (i < n) {
      val d = (a(aOff + i) & 0xff) - (b(bOff + i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    aLen - bLen
  }

  /** Smallest byte string strictly greater than every string with prefix
    * `p`: increment the last non-0xFF byte and truncate. Empty result means
    * "no upper bound" (p was all 0xFF). */
  def prefixSuccessor(p: Array[Byte]): Array[Byte] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) Array.empty
    else {
      val r = java.util.Arrays.copyOf(p, i + 1)
      r(i) = (r(i) + 1).toByte
      r
    }
  }
}
