package graft.format

/** Canonical Huffman coding over a small value alphabet (reference:
  * dwio/nimble/encodings/HuffmanEncoding.h:62 — canonical codes; the
  * reference's periodic bit offsets for mid-chunk seeks are unnecessary here
  * because chunks decode whole).
  *
  * Wire form (inside the HUFFMAN chunk payload, after the alphabet block and
  * the per-symbol code lengths): varint bit count, then the MSB-first
  * concatenated code stream.
  */
object Huffman {
  final val MaxCodeLen = 32

  /** Package-merge-free standard Huffman build; returns per-symbol code
    * lengths aligned with `freqs` order, or null if any code would exceed
    * [[MaxCodeLen]]. */
  def codeLengths(freqs: Array[Long]): Array[Int] = {
    val n = freqs.length
    if (n == 1) return Array(1)
    // node arrays: first n entries are leaves
    val weight = new Array[Long](2 * n - 1)
    val parent = new Array[Int](2 * n - 1)
    java.util.Arrays.fill(parent, -1)
    System.arraycopy(freqs, 0, weight, 0, n)
    val pq = new java.util.PriorityQueue[Integer]((a: Integer, b: Integer) =>
      java.lang.Long.compare(weight(a), weight(b)))
    var i = 0
    while (i < n) { pq.add(i); i += 1 }
    var next = n
    while (pq.size > 1) {
      val a = pq.poll(); val b = pq.poll()
      weight(next) = weight(a) + weight(b)
      parent(a) = next; parent(b) = next
      pq.add(next)
      next += 1
    }
    val lens = new Array[Int](n)
    i = 0
    while (i < n) {
      var d = 0
      var p = parent(i)
      while (p != -1) { d += 1; p = parent(p) }
      if (d > MaxCodeLen) return null
      lens(i) = d
      i += 1
    }
    lens
  }

  /** Canonical code assignment: symbols ordered by (len, alphabet position).
    * Returns codes aligned with the alphabet order. */
  def canonicalCodes(lens: Array[Int]): Array[Long] = {
    val n = lens.length
    val order = Array.range(0, n).sortBy(i => (lens(i), i))
    val codes = new Array[Long](n)
    var code = 0L
    var prevLen = 0
    var k = 0
    while (k < n) {
      val s = order(k)
      code = code << (lens(s) - prevLen)
      codes(s) = code
      prevLen = lens(s)
      code += 1
      k += 1
    }
    codes
  }

  def encode(values: Array[Long], alphabet: Array[Long], lens: Array[Int],
      out: ByteSink): Unit = {
    val codes = canonicalCodes(lens)
    val idx = new java.util.HashMap[java.lang.Long, Integer](alphabet.length * 2)
    var i = 0
    while (i < alphabet.length) { idx.put(alphabet(i), i); i += 1 }
    var bits = 0L
    i = 0
    while (i < values.length) { bits += lens(idx.get(values(i)).intValue); i += 1 }
    out.writeVarint(bits)
    val nBytes = ((bits + 7) / 8).toInt
    val buf = new Array[Byte](nBytes)
    var bitPos = 0L
    i = 0
    while (i < values.length) {
      val s = idx.get(values(i)).intValue
      val len = lens(s)
      val code = codes(s)
      var b = len - 1
      while (b >= 0) { // MSB first
        if (((code >>> b) & 1L) != 0)
          buf((bitPos >>> 3).toInt) = (buf((bitPos >>> 3).toInt) | (0x80 >>> (bitPos & 7).toInt)).toByte
        bitPos += 1
        b -= 1
      }
      i += 1
    }
    out.writeBytes(buf)
  }

  /** Table-driven canonical decode: a 2^peek-entry lookup resolves every code
    * of length <= peek (symbol + length) in one probe; rarer longer codes fall
    * back to the per-length canonical scan. The bitstream is staged into
    * MSB-first 64-bit words so a peek is two shifts, not a per-bit loop. */
  def decode(alphabet: Array[Long], lens: Array[Int], cur: ByteCursor, n: Int): Array[Long] = {
    val bits = cur.readVarint()
    val nBytes = ((bits + 7) / 8).toInt
    val buf = cur.readBytes(nBytes)
    // canonical per-length tables: firstCode, firstIndex into the
    // (len, alphabet-position)-sorted symbol order
    val order = Array.range(0, lens.length).sortBy(i => (lens(i), i))
    val maxLen = lens.max
    val firstCode = new Array[Long](maxLen + 2)
    val firstIdx = new Array[Int](maxLen + 2)
    val countAt = new Array[Int](maxLen + 2)
    for (s <- order) countAt(lens(s)) += 1
    var code = 0L
    var idx = 0
    var l = 1
    while (l <= maxLen) {
      firstCode(l) = code
      firstIdx(l) = idx
      code = (code + countAt(l)) << 1
      idx += countAt(l)
      l += 1
    }
    // fast-path lookup table over the first `peek` bits
    val peek = math.min(maxLen, 11)
    val tblSym = new Array[Int](1 << peek)
    val tblLen = new Array[Byte](1 << peek)
    val codes = canonicalCodes(lens)
    var s = 0
    while (s < lens.length) {
      val cl = lens(s)
      if (cl <= peek) {
        val base = (codes(s) << (peek - cl)).toInt
        val cnt = 1 << (peek - cl)
        var k = 0
        while (k < cnt) { tblSym(base + k) = s; tblLen(base + k) = cl.toByte; k += 1 }
      }
      s += 1
    }
    // stage the bitstream as big-endian 64-bit words (zero-padded tail)
    val nWords = (nBytes + 7) / 8 + 1
    val words = new Array[Long](nWords)
    var bi = 0
    while (bi < nBytes) {
      words(bi >>> 3) |= (buf(bi) & 0xffL) << (56 - ((bi & 7) << 3))
      bi += 1
    }
    val out = new Array[Long](n)
    var bitPos = 0L
    var i = 0
    while (i < n) {
      val wi = (bitPos >>> 6).toInt
      val sh = (bitPos & 63).toInt
      // 64-bit window starting at bitPos, MSB-aligned
      val window =
        if (sh == 0) words(wi)
        else (words(wi) << sh) | (words(wi + 1) >>> (64 - sh))
      val prefix = (window >>> (64 - peek)).toInt
      val tl = tblLen(prefix)
      if (tl > 0) {
        out(i) = alphabet(tblSym(prefix))
        bitPos += tl
      } else {
        // long-code fallback: canonical scan from peek+1 upward
        var len = peek + 1
        var sym = -1
        while (sym < 0) {
          val c = window >>> (64 - len)
          if (countAt(len) > 0 && c >= firstCode(len) && c - firstCode(len) < countAt(len))
            sym = order(firstIdx(len) + (c - firstCode(len)).toInt)
          else len += 1
        }
        out(i) = alphabet(sym)
        bitPos += len
      }
      i += 1
    }
    out
  }
}
