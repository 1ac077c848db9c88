package graft.format

/** Canonical Huffman coding over a small value alphabet (reference:
  * dwio/nimble/encodings/HuffmanEncoding.h:40-67 — canonical codes plus a
  * bit offset every 256 rows for bounded random access).
  *
  * Wire form (inside the HUFFMAN chunk payload, after the alphabet block and
  * the per-symbol code lengths):
  *   r12+ : varint 0 (format marker — the legacy field below is >= 1),
  *          varint checkpoint count C (= ceil(n/256) - 1, row 0 implicit),
  *          C delta-encoded varint bit offsets of rows 256, 512, ...,
  *          varint bit count, MSB-first concatenated code stream
  *   legacy: varint bit count (>= n >= 1), code stream — decoded by the same
  *          reader; point lookups on legacy chunks fall back to a front scan.
  *
  * The checkpoints buy intra-chunk random access: a point lookup lands on
  * `floor(row/256)*256` and decodes at most 255 + 1 codes instead of the
  * whole chunk — the bit-serial decode is the slowest in the codec set
  * (readFactor 1.3), so bounded seeks matter for index-driven probes.
  */
object Huffman {
  final val MaxCodeLen = 32
  final val CheckpointStride = 256

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
    out.writeVarint(0L) // r12 format marker (legacy files start with bits >= 1)
    val nCheckpoints = math.max(0, (values.length - 1) / CheckpointStride)
    out.writeVarint(nCheckpoints.toLong)
    val nBytes = ((bits + 7) / 8).toInt
    val buf = new Array[Byte](nBytes)
    var bitPos = 0L
    var prevCp = 0L
    i = 0
    while (i < values.length) {
      if (i > 0 && i % CheckpointStride == 0) {
        out.writeVarint(bitPos - prevCp) // delta-encoded checkpoint offsets
        prevCp = bitPos
      }
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
    out.writeVarint(bits)
    out.writeBytes(buf)
  }

  /** Parsed stream head: checkpoint bit offsets (null for legacy payloads)
    * plus the staged MSB-first 64-bit words of the code stream. */
  private final class Stream(val checkpoints: Array[Long], val words: Array[Long])

  private def readStream(cur: ByteCursor): Stream = {
    val first = cur.readVarint()
    val checkpoints: Array[Long] =
      if (first == 0L) {
        val c = cur.readVarint().toInt
        val cps = new Array[Long](c)
        var acc = 0L
        var k = 0
        while (k < c) { acc += cur.readVarint(); cps(k) = acc; k += 1 }
        cps
      } else null
    val bits = if (first == 0L) cur.readVarint() else first
    val nBytes = ((bits + 7) / 8).toInt
    val buf = cur.readBytes(nBytes)
    // stage the bitstream as big-endian 64-bit words (zero-padded tail)
    val nWords = (nBytes + 7) / 8 + 1
    val words = new Array[Long](nWords)
    var bi = 0
    while (bi < nBytes) {
      words(bi >>> 3) |= (buf(bi) & 0xffL) << (56 - ((bi & 7) << 3))
      bi += 1
    }
    new Stream(checkpoints, words)
  }

  /** Table-driven canonical decoder: a 2^peek-entry lookup resolves every
    * code of length <= peek (symbol + length) in one probe; rarer longer
    * codes fall back to the per-length canonical scan. */
  private final class Decoder(alphabet: Array[Long], lens: Array[Int]) {
    private val order = Array.range(0, lens.length).sortBy(i => (lens(i), i))
    private val maxLen = lens.max
    private val firstCode = new Array[Long](maxLen + 2)
    private val firstIdx = new Array[Int](maxLen + 2)
    private val countAt = new Array[Int](maxLen + 2)
    for (s <- order) countAt(lens(s)) += 1
    locally {
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
    }
    private val peek = math.min(maxLen, 11)
    private val tblSym = new Array[Int](1 << peek)
    private val tblLen = new Array[Byte](1 << peek)
    locally {
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
    }

    /** Decode `count` symbols starting at bit `bitPos0`; the first
      * `discard` decodes position past a checkpoint and are not emitted. */
    def run(words: Array[Long], bitPos0: Long, discard: Int, count: Int,
        out: Array[Long], outOff: Int): Unit = {
      var bitPos = bitPos0
      var i = -discard
      while (i < count) {
        val wi = (bitPos >>> 6).toInt
        val sh = (bitPos & 63).toInt
        val window =
          if (sh == 0) words(wi)
          else (words(wi) << sh) | (words(wi + 1) >>> (64 - sh))
        val prefix = (window >>> (64 - peek)).toInt
        val tl = tblLen(prefix)
        var sym = -1
        if (tl > 0) { sym = tblSym(prefix); bitPos += tl }
        else {
          var len = peek + 1
          while (sym < 0) {
            val c = window >>> (64 - len)
            if (countAt(len) > 0 && c >= firstCode(len) && c - firstCode(len) < countAt(len))
              sym = order(firstIdx(len) + (c - firstCode(len)).toInt)
            else len += 1
          }
          bitPos += lens(sym)
        }
        if (i >= 0) out(outOff + i) = alphabet(sym)
        i += 1
      }
    }
  }

  def decode(alphabet: Array[Long], lens: Array[Int], cur: ByteCursor, n: Int): Array[Long] = {
    val st = readStream(cur)
    val out = new Array[Long](n)
    new Decoder(alphabet, lens).run(st.words, 0L, 0, n, out, 0)
    out
  }

  /** Decode only rows [from, until): seek to the nearest preceding
    * checkpoint and decode forward — at most `CheckpointStride - 1` wasted
    * codes. Legacy payloads (no checkpoints) decode from row 0 but still
    * stop at `until`. Returns exactly `until - from` values. */
  def decodeRange(alphabet: Array[Long], lens: Array[Int], cur: ByteCursor, n: Int,
      from: Int, until: Int): Array[Long] = {
    require(0 <= from && from <= until && until <= n, s"bad range [$from,$until) of $n")
    val st = readStream(cur)
    val out = new Array[Long](until - from)
    if (until == from) return out
    val (startRow, startBit) =
      if (st.checkpoints == null || from < CheckpointStride) (0, 0L)
      else {
        val cp = math.min(from / CheckpointStride, st.checkpoints.length)
        (cp * CheckpointStride, st.checkpoints(cp - 1))
      }
    new Decoder(alphabet, lens).run(st.words, startBit, from - startRow, until - from, out, 0)
    out
  }

  /** Point decode: materialize only `positions` (strictly increasing), one
    * checkpoint-aligned window per touched 256-row segment. Null when the
    * payload has no checkpoints (legacy chunks over one stride — each
    * segment would re-decode from row 0; the caller bulk-decodes instead). */
  def decodeAt(alphabet: Array[Long], lens: Array[Int], cur: ByteCursor, n: Int,
      positions: Array[Int]): Array[Long] = {
    val st = readStream(cur)
    if (st.checkpoints == null && n > CheckpointStride) return null
    val dec = new Decoder(alphabet, lens)
    val k = positions.length
    val out = new Array[Long](k)
    val tmp = new Array[Long](CheckpointStride)
    var i = 0
    while (i < k) {
      val seg = positions(i) / CheckpointStride
      var end = i + 1
      while (end < k && positions(end) / CheckpointStride == seg) end += 1
      val segStart = seg * CheckpointStride
      val (startRow, startBit) =
        if (st.checkpoints == null || seg == 0) (0, 0L)
        else {
          val cp = math.min(seg, st.checkpoints.length)
          (cp * CheckpointStride, st.checkpoints(cp - 1))
        }
      val maxPos = positions(end - 1)
      dec.run(st.words, startBit, segStart - startRow, maxPos - segStart + 1, tmp, 0)
      var t = i
      while (t < end) { out(t) = tmp(positions(t) - segStart); t += 1 }
      i = end
    }
    out
  }
}
