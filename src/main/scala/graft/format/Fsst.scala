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
  */
object Fsst {
  final val Escape = 255
  final val MaxSymbols = 254
  final val MaxLen = 8

  /** Strings actually decoded (bulk-incremented per chunk/selection) —
    * observability for the lazy-materialization contract: a selective scan
    * projecting an FSST column should decode ~survivors, not ~rows. */
  val decodedStrings = new java.util.concurrent.atomic.LongAdder

  final class Table(val symbols: Array[Array[Byte]],
      val lookup: java.util.HashMap[String, Integer])

  private def key(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, ISO_8859_1)

  private def buildLookup(symbols: Array[Array[Byte]]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](symbols.length * 2)
    var i = 0
    while (i < symbols.length) { m.put(new String(symbols(i), ISO_8859_1), Integer.valueOf(i)); i += 1 }
    m
  }

  /** Longest symbol match at `pos` (or 1 for an escape unit). Returns the
    * unit length; the matched symbol string is bytes[pos, pos+len). */
  private def matchLen(lookup: java.util.HashMap[String, Integer],
      bytes: Array[Byte], pos: Int, end: Int): Int = {
    var l = math.min(MaxLen, end - pos)
    while (l > 1) {
      if (lookup.containsKey(key(bytes, pos, l))) return l
      l -= 1
    }
    1 // single byte: symbol if present, escape otherwise — either way one unit
  }

  def train(bytes: Array[Byte], off: Int, len: Int): Table = {
    var symbols = Array.empty[Array[Byte]]
    var lookup = buildLookup(symbols)
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
        val m = matchLen(lookup, bytes, pos, off + len)
        val cur = key(bytes, pos, m)
        bump(cur)
        if (prev != null && prev.length + cur.length <= MaxLen) bump(prev + cur)
        prev = cur
        pos += m
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
      symbols = arr.take(MaxSymbols).map(_._1.getBytes(ISO_8859_1))
      lookup = buildLookup(symbols)
      iter += 1
    }
    if (symbols.isEmpty) null else new Table(symbols, lookup)
  }

  /** Encoded/raw ratio of the first `len` sample bytes under `table`. */
  def sampleRatio(table: Table, bytes: Array[Byte], off: Int, len: Int): Double = {
    if (len == 0) return 1.0
    var out = 0L
    var pos = off
    while (pos < off + len) {
      var l = math.min(MaxLen, off + len - pos)
      var code: Integer = null
      while (l >= 1 && code == null) {
        code = table.lookup.get(key(bytes, pos, l))
        if (code == null) l -= 1
      }
      if (code != null) { out += 1; pos += l } else { out += 2; pos += 1 }
    }
    out.toDouble / len
  }

  def encode(table: Table, bytes: Array[Byte], from: Int, to: Int, out: ByteSink): Unit = {
    var pos = from
    while (pos < to) {
      var l = math.min(MaxLen, to - pos)
      var code: Integer = null
      while (l >= 1 && code == null) {
        code = table.lookup.get(key(bytes, pos, l))
        if (code == null) l -= 1
      }
      if (code != null) {
        out.writeByte(code.intValue)
        pos += l
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
