package graft.format

/** SIMD Frame-of-Reference bitpacking (codec tag 14).
  *
  * Re-expresses the reference's SimdForBitpackEncoding (reference:
  * dwio/nimble/encodings/SimdForBitpackEncoding.h:40-57 — `value = baseline +
  * residual`, residuals packed in fixed-size groups sized for SIMD unpack via
  * Lemire fastpack) for the JVM. The group geometry differs because the lane
  * model differs: instead of the reference's 32-value horizontal groups, full
  * blocks hold 512 values laid out *vertically* across 8 lanes — value `j` of
  * a block lives in lane `j % 8` at position `j / 8`, and each lane packs its
  * 64 values little-endian into exactly `w` 64-bit words (64·w bits — no
  * padding, so the payload is byte-identical in size to linear FOR packing).
  * Lane words are stored round-major (`word[r*8 + lane]`), so the decoder's
  * per-round load of 8 adjacent longs is one vector load, every lane shares
  * the same in-lane bit offset, and each round's 8 outputs are contiguous
  * (one vector store). Decode runs on the Panama Vector API
  * (`jdk.incubator.vector`, 2–8 lanes per step as the CPU provides) when the
  * module is present, and falls back to an identical scalar kernel otherwise
  * — the wire format is the same either way.
  *
  * Wire layout (after the standard `[tag][phys][rowCount]` chunk header):
  *   [baseline zigzag][bitWidth u8]
  *   [n/512 full blocks, 64·w bytes each][tail: n%512 values, linear FOR pack]
  */
object SimdBitpack {
  final val BlockRows = 512
  private final val Lanes = 8
  private final val PerLane = BlockRows / Lanes // 64 values per lane

  private sealed trait Kernel {
    /** Unpack one 512-value block: `words(wordOff..wordOff+8w)` →
      * `out(outOff..outOff+512)`, adding `base` back. */
    def decodeBlock(words: Array[Long], wordOff: Int, out: Array[Long], outOff: Int,
        w: Int, base: Long): Unit
  }

  private object ScalarKernel extends Kernel {
    def decodeBlock(words: Array[Long], wordOff: Int, out: Array[Long], outOff: Int,
        w: Int, base: Long): Unit = {
      val mask = if (w == 64) -1L else (1L << w) - 1L
      var l = 0
      while (l < Lanes) {
        var k = 0
        while (k < PerLane) {
          val bit = k * w
          val r = bit >>> 6
          val sh = bit & 63
          var v = words(wordOff + r * Lanes + l) >>> sh
          if (sh + w > 64) v |= words(wordOff + (r + 1) * Lanes + l) << (64 - sh)
          out(outOff + k * Lanes + l) = (v & mask) + base
          k += 1
        }
        l += 1
      }
    }
  }

  /** Panama kernel, isolated in its own class so [[SimdBitpack]] never links
    * against `jdk.incubator.vector` — construction is attempted once and any
    * linkage error (module not added to the runtime) drops to the scalar
    * kernel. */
  private final class VectorKernel extends Kernel {
    import jdk.incubator.vector._
    // 64-bit lanes: 2 (SSE/NEON), 4 (AVX2) or 8 (AVX-512) per step; any of
    // them divides the 8-lane block layout evenly.
    private val sp: VectorSpecies[java.lang.Long] = {
      val p = LongVector.SPECIES_PREFERRED
      if (p.length() <= Lanes) p else LongVector.SPECIES_512 // never read past a round's 8 words
    }
    private val L = sp.length()

    def decodeBlock(words: Array[Long], wordOff: Int, out: Array[Long], outOff: Int,
        w: Int, base: Long): Unit = {
      val mask = if (w == 64) -1L else (1L << w) - 1L
      var laneBase = 0
      while (laneBase < Lanes) {
        var k = 0
        while (k < PerLane) {
          val bit = k * w
          val r = bit >>> 6
          val sh = bit & 63
          var v = LongVector.fromArray(sp, words, wordOff + r * Lanes + laneBase)
            .lanewise(VectorOperators.LSHR, sh)
          if (sh + w > 64)
            v = v.or(LongVector.fromArray(sp, words, wordOff + (r + 1) * Lanes + laneBase)
              .lanewise(VectorOperators.LSHL, 64 - sh))
          v.lanewise(VectorOperators.AND, mask).lanewise(VectorOperators.ADD, base)
            .intoArray(out, outOff + k * Lanes + laneBase)
          k += 1
        }
        laneBase += L
      }
    }
  }

  private val kernel: Kernel =
    try {
      // resolves only if the incubator module is in the runtime image's root
      // set (build.sbt adds --add-modules=jdk.incubator.vector to forked JVMs)
      Class.forName("jdk.incubator.vector.LongVector")
      new VectorKernel
    } catch { case _: Throwable => ScalarKernel }

  /** True when decode runs on the Panama Vector API (observability/tests). */
  def vectorized: Boolean = kernel.isInstanceOf[VectorKernel]

  /** Exact payload size in bytes (baseline/width header excluded). */
  def packedBytes(n: Int, w: Int): Long = {
    val nFull = n / BlockRows
    val tail = n % BlockRows
    nFull.toLong * Lanes * w * 8L + (tail.toLong * w + 7) / 8
  }

  /** Encode `values` at width `w` against `base`: full 512-value blocks in
    * the lane-vertical layout, then the tail packed linearly. Caller
    * guarantees every `values(i) - base` fits in `w` bits. */
  def encode(values: Array[Long], base: Long, w: Int, s: ByteSink): Unit = {
    s.writeZigZag(base)
    s.writeByte(w)
    val n = values.length
    val nFull = n / BlockRows
    val blockWords = new Array[Long](Lanes * w)
    var b = 0
    while (b < nFull) {
      java.util.Arrays.fill(blockWords, 0L)
      val off = b * BlockRows
      var l = 0
      while (l < Lanes) {
        var k = 0
        while (k < PerLane) {
          val v = values(off + k * Lanes + l) - base
          val bit = k * w
          val r = bit >>> 6
          val sh = bit & 63
          blockWords(r * Lanes + l) |= v << sh
          if (sh + w > 64) blockWords((r + 1) * Lanes + l) |= v >>> (64 - sh)
          k += 1
        }
        l += 1
      }
      var i = 0
      while (i < blockWords.length) { s.writeLong(blockWords(i)); i += 1 }
      b += 1
    }
    val tail = n - nFull * BlockRows
    if (tail > 0)
      packTail(values, nFull * BlockRows, tail, base, w, s)
  }

  private def packTail(values: Array[Long], off: Int, n: Int, base: Long, w: Int,
      s: ByteSink): Unit = {
    val nBits = n.toLong * w
    val words = new Array[Long](((nBits + 63) / 64).toInt)
    var bit = 0L
    var i = 0
    while (i < n) {
      val v = values(off + i) - base
      val wi = (bit >>> 6).toInt
      val sh = (bit & 63).toInt
      words(wi) |= v << sh
      if (sh + w > 64) words(wi + 1) |= v >>> (64 - sh)
      bit += w
      i += 1
    }
    val nBytes = ((nBits + 7) / 8).toInt
    val out = new Array[Byte](nBytes)
    var bI = 0
    while (bI < nBytes) { out(bI) = (words(bI >>> 3) >>> ((bI & 7) << 3)).toByte; bI += 1 }
    s.writeBytes(out)
  }

  /** Decode `n` values from the cursor (positioned after the chunk header). */
  def decode(cur: ByteCursor, n: Int): Array[Long] = {
    val base = cur.readZigZag()
    val w = cur.readByte()
    val out = new Array[Long](n)
    val nFull = n / BlockRows
    val blockWords = new Array[Long](Lanes * w)
    var b = 0
    while (b < nFull) {
      var i = 0
      while (i < blockWords.length) { blockWords(i) = cur.readLong(); i += 1 }
      kernel.decodeBlock(blockWords, 0, out, b * BlockRows, w, base)
      b += 1
    }
    val tail = n - nFull * BlockRows
    if (tail > 0) unpackTail(cur, out, nFull * BlockRows, tail, base, w)
    out
  }

  private def unpackTail(cur: ByteCursor, out: Array[Long], off: Int, n: Int,
      base: Long, w: Int): Unit = {
    val mask = if (w == 64) -1L else (1L << w) - 1L
    val nBytes = ((n.toLong * w + 7) / 8).toInt
    val words = new Array[Long](nBytes / 8 + 2)
    var bI = 0
    while (bI < nBytes) { words(bI >>> 3) |= (cur.buf(cur.pos + bI) & 0xffL) << ((bI & 7) << 3); bI += 1 }
    cur.pos += nBytes
    var bit = 0L
    var i = 0
    while (i < n) {
      val wi = (bit >>> 6).toInt
      val sh = (bit & 63).toInt
      var v = words(wi) >>> sh
      if (sh + w > 64) v |= words(wi + 1) << (64 - sh)
      out(off + i) = (v & mask) + base
      bit += w
      i += 1
    }
  }
}
