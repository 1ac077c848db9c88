package graft.format

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
    /** Each symbol's bytes packed little-endian into a long (len <= 8) —
      * lets the trainer derive a matched unit's map key from the code alone. */
    val packed = Array.tabulate(symbols.length) { c =>
      val s = symbols(c)
      var p = 0L
      var k = 0
      while (k < s.length) { p |= (s(k) & 0xffL) << (k << 3); k += 1 }
      p
    }
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

  /** Reusable per-thread training state: an open-addressed (payload, len) →
    * count map over candidate units packed little-endian into a long
    * (len <= MaxLen = 8, unused high bytes zero — len disambiguates
    * zero-padded prefixes). The first cut of the trainer keyed a
    * java.util.HashMap by String, allocating ~2 Strings + a boxed count cell
    * per sample unit per iteration — at 3 iterations over a 16 KB sample per
    * chunk that was ~35-40% of whole-table write CPU on hash-shaped string
    * schemas. The used-slot stack makes per-iteration reset O(distinct). */
  private final class TrainState(var cap: Int) {
    var mask = cap - 1
    var keys = new Array[Long](cap)
    var lens = new Array[Byte](cap)
    var cnts = new Array[Int](cap)
    var used = new Array[Int](cap)
    var nUsed = 0
    def ensure(minCap: Int): Unit = if (cap < minCap) {
      cap = java.lang.Integer.highestOneBit(minCap - 1) << 1
      mask = cap - 1
      keys = new Array[Long](cap); lens = new Array[Byte](cap)
      cnts = new Array[Int](cap); used = new Array[Int](cap)
      nUsed = 0
    }
    def reset(): Unit = {
      var i = 0
      while (i < nUsed) { val s = used(i); lens(s) = 0; cnts(s) = 0; i += 1 }
      nUsed = 0
    }
    def bump(payload: Long, l: Int): Unit = {
      var h = (payload + l) * -0x61c8864680b583ebL
      h ^= h >>> 32
      var s = h.toInt & mask
      while (lens(s) != 0 && (keys(s) != payload || (lens(s) & 0xff) != l))
        s = (s + 1) & mask
      if (lens(s) == 0) { keys(s) = payload; lens(s) = l.toByte; used(nUsed) = s; nUsed += 1 }
      cnts(s) += 1
    }
    // iteration 0 (empty table = all units single bytes) counts bytes and
    // byte-pairs direct-indexed, no hashing; entries are re-zeroed as the
    // rank pass consumes them, so the arrays stay clean across calls
    val cnt1 = new Array[Int](256)
    val cnt2 = new Array[Int](65536)
    var rank = new Array[Long](1 << 15)
    def ensureRank(n: Int): Unit =
      if (rank.length < n) rank = new Array[Long](java.lang.Integer.highestOneBit(n - 1) << 1)
  }
  private val trainState: ThreadLocal[TrainState] =
    ThreadLocal.withInitial(() => new TrainState(1 << 14))

  /** Quickselect + suffix sort: places the nSel largest keys, sorted
    * ascending, in rank[n-nSel, n). Exactly equivalent to a full sort for a
    * consumer that reads only the top nSel — rank keys are unique (the low
    * bits carry the slot/id), so the selected set is a total-order property,
    * not an algorithm artifact. A full sort of ~16K candidates per iteration
    * was the trainer's largest remaining cost after the hash-map rewrite. */
  private def selectTop(rank: Array[Long], n: Int, nSel: Int): Unit = {
    if (n <= nSel + 32) { java.util.Arrays.sort(rank, 0, n); return }
    val kth = n - nSel
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val pivot = rank((lo + hi) >>> 1)
      var i = lo
      var j = hi
      while (i <= j) {
        while (rank(i) < pivot) i += 1
        while (rank(j) > pivot) j -= 1
        if (i <= j) { val t = rank(i); rank(i) = rank(j); rank(j) = t; i += 1; j -= 1 }
      }
      if (kth <= j) hi = j else if (kth >= i) lo = i else lo = hi
    }
    java.util.Arrays.sort(rank, kth, n)
  }

  def train(bytes: Array[Byte], off: Int, len: Int): Table = {
    // slot indices must fit the 26-bit field of the packed rank key below;
    // cap <= 4*len, so len <= 2^24 keeps slots < 2^26 (callers sample <= 16 KB)
    require(len <= (1 << 24), s"FSST training sample too large: $len")
    var table = new Table(Array.empty)
    val st = trainState.get()
    // distinct keys <= 2*len (units + adjacent pairs); cap 4*len = load <= 0.5
    st.ensure(math.max(1024, len * 4))
    val end = off + len
    var iter = 0
    while (iter < 3) {
      // gain = bytes saved: a len-1 symbol turns a 2-byte escape into 1 byte;
      // a len-k symbol turns k bytes into 1. Rank keys pack (gain << 26 | id)
      // so one primitive sort orders by gain with a deterministic tie-break
      // (id order is a pure function of the sample bytes).
      var nR = 0
      if (table.symbols.isEmpty) {
        // empty table (iteration 0): every unit is a single byte — count
        // bytes and adjacent byte-pairs direct-indexed instead of hashing
        val c1 = st.cnt1
        val c2 = st.cnt2
        var p = off
        var prev = -1
        while (p < end) {
          val b = bytes(p) & 0xff
          c1(b) += 1
          if (prev >= 0) c2((prev << 8) | b) += 1
          prev = b
          p += 1
        }
        st.ensureRank(256 + 65536)
        val rank = st.rank
        var id = 0
        while (id < 256) {
          val g = c1(id) // 1-byte gain = count (2-byte escape -> 1 byte)
          if (g > 0) { rank(nR) = (g.toLong << 26) | id; nR += 1; c1(id) = 0 }
          id += 1
        }
        id = 0
        while (id < 65536) {
          val g = c2(id) // 2-byte gain = count * (2 - 1)
          if (g > 0) { rank(nR) = (g.toLong << 26) | (256 + id); nR += 1; c2(id) = 0 }
          id += 1
        }
        selectTop(rank, nR, MaxSymbols)
        val nSym = math.min(MaxSymbols, nR)
        val syms = new Array[Array[Byte]](nSym)
        var j = 0
        while (j < nSym) {
          val v = (rank(nR - 1 - j) & ((1 << 26) - 1)).toInt
          syms(j) =
            if (v < 256) Array(v.toByte)
            else Array(((v - 256) >>> 8).toByte, ((v - 256) & 0xff).toByte)
          j += 1
        }
        table = new Table(syms)
      } else {
        st.reset()
        var pos = off
        var prevPayload = 0L
        var prevLen = 0
        while (pos < end) {
          val m = table.matchAt(bytes, pos, end)
          val ulen = if (m < 0) 1 else m & 0xff
          val payload = if (m < 0) bytes(pos) & 0xffL else table.packed(m >>> 8)
          st.bump(payload, ulen)
          if (prevLen != 0 && prevLen + ulen <= MaxLen)
            st.bump(prevPayload | (payload << (prevLen << 3)), prevLen + ulen)
          prevPayload = payload
          prevLen = ulen
          pos += ulen
        }
        st.ensureRank(st.nUsed)
        val rank = st.rank
        var i = 0
        while (i < st.nUsed) {
          val s = st.used(i)
          val l = st.lens(s) & 0xff
          val gain = if (l == 1) st.cnts(s).toLong else st.cnts(s).toLong * (l - 1)
          if (gain > 0) { rank(nR) = (gain << 26) | s; nR += 1 }
          i += 1
        }
        selectTop(rank, nR, MaxSymbols)
        val nSym = math.min(MaxSymbols, nR)
        val syms = new Array[Array[Byte]](nSym)
        var j = 0
        while (j < nSym) {
          val s = (rank(nR - 1 - j) & ((1 << 26) - 1)).toInt
          val l = st.lens(s) & 0xff
          val payload = st.keys(s)
          val sym = new Array[Byte](l)
          var k = 0
          while (k < l) { sym(k) = (payload >>> (k << 3)).toByte; k += 1 }
          syms(j) = sym
          j += 1
        }
        table = new Table(syms)
      }
      iter += 1
    }
    st.reset()
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
