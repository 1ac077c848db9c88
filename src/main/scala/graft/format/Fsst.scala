package graft.format

import java.nio.charset.StandardCharsets.ISO_8859_1

/** FSST-lite: per-chunk trained symbol-table string compression
  * (reference: dwio/nimble/encodings/FsstEncoding.h:79; algorithm after
  * Boncz/Neumann/Leis, "FSST: Fast Random Access String Compression").
  *
  * Up to 254 symbols of 1-8 bytes, codes 0..253; code 255 escapes one
  * literal byte. Training is the paper's iterative scheme, simplified: encode
  * a sample with the current table, count units and adjacent-unit
  * concatenations, keep the 254 candidates with the highest byte gain,
  * repeat. Every string stays independently decodable (random access), which
  * chunk-level zstd cannot offer.
  *
  * Matching is allocation-free (the paper's perfect-hash spirit): direct
  * code tables for 1- and 2-byte symbols plus per-first-byte buckets of
  * longer symbols sorted by length. The first cut of this encoder built a
  * String key per attempted match length (up to 8 allocations + hash probes
  * per unit) and cost ~140 ns/byte on hash-shaped keys — the rewrite is
  * ~10x cheaper and lifts whole-table write throughput on string-heavy
  * schemas by ~2-3x.
  */
object Fsst {
  final val Escape = 255
  final val MaxSymbols = 254
  final val MaxLen = 8

  /** Strings actually decoded (bulk-incremented per chunk/selection) —
    * observability for the lazy-materialization contract: a selective scan
    * projecting an FSST column should decode ~survivors, not ~rows. */
  val decodedStrings = new java.util.concurrent.atomic.LongAdder

  /** Symbol table with longest-match lookup structures:
    *  - `one(b)`: code of the 1-byte symbol `b`, or -1
    *  - `two((b0<<8)|b1)`: code of the 2-byte symbol, or -1
    *  - `long3(b0)`: codes of len>=3 symbols starting with b0, packed
    *    (code<<8 | len), sorted by len descending (first hit = longest) */
  final class Table(val symbols: Array[Array[Byte]]) {
    val one = new Array[Int](256)
    val two = new Array[Int](65536)
    val long3 = new Array[Array[Int]](256)
    java.util.Arrays.fill(one, -1)
    java.util.Arrays.fill(two, -1)
    locally {
      val buckets = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        s.length match {
          case 1 => one(s(0) & 0xff) = c
          case 2 => two(((s(0) & 0xff) << 8) | (s(1) & 0xff)) = c
          case l => buckets(s(0) & 0xff) ::= ((c << 8) | l)
        }
        c += 1
      }
      var b = 0
      while (b < 256) {
        if (buckets(b).nonEmpty)
          long3(b) = buckets(b).toArray.sortBy(p => -(p & 0xff))
        b += 1
      }
    }

    /** Longest symbol match at `pos`: packed (code<<8 | len), or -1. */
    def matchAt(bytes: Array[Byte], pos: Int, end: Int): Int = {
      val b0 = bytes(pos) & 0xff
      val cands = long3(b0)
      if (cands != null) {
        var i = 0
        while (i < cands.length) {
          val packed = cands(i)
          val len = packed & 0xff
          if (pos + len <= end) {
            val sym = symbols(packed >>> 8)
            var k = 1
            while (k < len && sym(k) == bytes(pos + k)) k += 1
            if (k == len) return packed
          }
          i += 1
        }
      }
      if (pos + 1 < end) {
        val c2 = two((b0 << 8) | (bytes(pos + 1) & 0xff))
        if (c2 >= 0) return (c2 << 8) | 2
      }
      val c1 = one(b0)
      if (c1 >= 0) (c1 << 8) | 1 else -1
    }
  }

  def train(bytes: Array[Byte], off: Int, len: Int): Table = {
    var table = new Table(Array.empty)
    var iter = 0
    while (iter < 3) {
      val counts = new java.util.HashMap[String, Array[Int]]()
      def bump(s: String): Unit = {
        val c = counts.get(s)
        if (c != null) c(0) += 1 else counts.put(s, Array(1))
      }
      var pos = off
      var prev: String = null
      while (pos < off + len) {
        val m = table.matchAt(bytes, pos, off + len)
        val ulen = if (m < 0) 1 else m & 0xff
        val cur = new String(bytes, pos, ulen, ISO_8859_1)
        bump(cur)
        if (prev != null && prev.length + cur.length <= MaxLen) bump(prev + cur)
        prev = cur
        pos += ulen
      }
      // gain = bytes saved: a len-1 symbol turns a 2-byte escape into 1 byte;
      // a len-k symbol turns k bytes into 1
      val ranked = new java.util.ArrayList[(String, Long)](counts.size)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val s = e.getKey
        val gain = if (s.length == 1) e.getValue()(0).toLong
          else e.getValue()(0).toLong * (s.length - 1)
        if (gain > 0) ranked.add((s, gain))
      }
      val arr = new Array[(String, Long)](ranked.size)
      ranked.toArray(arr)
      java.util.Arrays.sort(arr, (a: (String, Long), b: (String, Long)) =>
        java.lang.Long.compare(b._2, a._2))
      table = new Table(arr.take(MaxSymbols).map(_._1.getBytes(ISO_8859_1)))
      iter += 1
    }
    if (table.symbols.isEmpty) null else table
  }

  /** Encoded/raw ratio of the first `len` sample bytes under `table`. */
  def sampleRatio(table: Table, bytes: Array[Byte], off: Int, len: Int): Double = {
    if (len == 0) return 1.0
    var out = 0L
    var pos = off
    while (pos < off + len) {
      val m = table.matchAt(bytes, pos, off + len)
      if (m >= 0) { out += 1; pos += m & 0xff } else { out += 2; pos += 1 }
    }
    out.toDouble / len
  }

  /** [[sampleRatio]] over four 1 KB windows strided across [off, off+total)
    * instead of the head alone: a payload whose head compresses differently
    * from its tail (front-coded keys, then repetitive blobs) misestimates
    * badly from a head-only sample — the estimate feeds both the full-encode
    * gate and the r15 estimate-skip, so it must reflect the WHOLE payload. */
  def stridedRatio(table: Table, bytes: Array[Byte], off: Int, total: Int): Double = {
    if (total <= 4096) return sampleRatio(table, bytes, off, total)
    val win = 1024
    var num = 0.0
    var i = 0
    while (i < 4) {
      val wOff = off + ((total - win).toLong * i / 3).toInt
      num += sampleRatio(table, bytes, wOff, win)
      i += 1
    }
    num / 4
  }

  def encode(table: Table, bytes: Array[Byte], from: Int, to: Int, out: ByteSink): Unit = {
    var pos = from
    while (pos < to) {
      val m = table.matchAt(bytes, pos, to)
      if (m >= 0) {
        out.writeByte(m >>> 8)
        pos += m & 0xff
      } else {
        out.writeByte(Escape)
        out.writeByte(bytes(pos) & 0xff)
        pos += 1
      }
    }
  }

  def writeTable(table: Table, out: ByteSink): Unit = {
    out.writeByte(table.symbols.length)
    var i = 0
    while (i < table.symbols.length) {
      out.writeByte(table.symbols(i).length)
      out.writeBytes(table.symbols(i))
      i += 1
    }
  }

  def readTable(cur: ByteCursor): Array[Array[Byte]] = {
    val nSym = cur.readByte()
    val symbols = new Array[Array[Byte]](nSym)
    var i = 0
    while (i < nSym) {
      val l = cur.readByte()
      symbols(i) = cur.readBytes(l)
      i += 1
    }
    symbols
  }

  /** Decode one encoded string slice, appending to `out`; returns the number
    * of decoded bytes. */
  def decode(symbols: Array[Array[Byte]], enc: Array[Byte], from: Int, to: Int,
      out: ByteSink): Int = {
    var pos = from
    var produced = 0
    while (pos < to) {
      val b = enc(pos) & 0xff
      if (b == Escape) {
        out.writeByte(enc(pos + 1) & 0xff)
        produced += 1
        pos += 2
      } else {
        val s = symbols(b)
        out.writeBytes(s)
        produced += s.length
        pos += 1
      }
    }
    produced
  }
}
