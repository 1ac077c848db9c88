package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** SimdForBitpack (tag 14): lane-vertical FOR bitpacking, Panama decode
  * kernel vs scalar fallback (reference:
  * dwio/nimble/encodings/SimdForBitpackEncoding.h:40-57). */
class SimdBitpackSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(41)

  private def roundTrip(values: Array[Long], base: Long, w: Int): Unit = {
    val s = new ByteSink()
    SimdBitpack.encode(values, base, w, s)
    val bytes = s.toArray
    // exact size contract: header (zigzag base + width byte) + packed bytes
    val zz = { val t = new ByteSink(); t.writeZigZag(base); t.size }
    assert(bytes.length == zz + 1 + SimdBitpack.packedBytes(values.length, w),
      s"w=$w n=${values.length}: unexpected payload size ${bytes.length}")
    val out = SimdBitpack.decode(new ByteCursor(bytes), values.length)
    assert(out.sameElements(values), s"w=$w n=${values.length}: round-trip mismatch")
  }

  test("decode kernel is the Panama vector path in this JVM") {
    // build.sbt forks test JVMs with --add-modules=jdk.incubator.vector; if
    // this fails the codec still works (scalar fallback) but the point of
    // tag 14 — vector unpack — is silently lost, so surface it here
    assert(SimdBitpack.vectorized, "expected jdk.incubator.vector kernel")
  }

  test("every width 1..63 round-trips (full blocks + tail)") {
    for (w <- 1 to 63) {
      val n = 1300 // 2 full 512-blocks + 276-value tail
      val base = rnd.nextLong() % 1000000L - 500000L
      val lim = if (w == 63) Long.MaxValue else (1L << w)
      val values = Array.fill(n)(base + ((rnd.nextLong() & Long.MaxValue) % lim))
      roundTrip(values, base, w)
    }
  }

  test("boundary residuals: all-zero, all-max, alternating") {
    for (w <- Seq(1, 7, 8, 13, 31, 32, 33, 57)) {
      val maxRes = (1L << w) - 1L
      roundTrip(Array.fill(1024)(0L), 0L, w)
      roundTrip(Array.fill(1024)(maxRes), 0L, w)
      roundTrip(Array.tabulate(1024)(i => if (i % 2 == 0) 0L else maxRes), 0L, w)
    }
  }

  test("negative baselines and sub-block inputs (pure tail)") {
    roundTrip(Array.tabulate(100)(i => -1000000L + i), -1000000L, 7)
    roundTrip(Array(42L), 42L, 5)
    roundTrip(Array.empty[Long], 0L, 9)
    // n == exactly one block, no tail
    roundTrip(Array.tabulate(512)(i => -5L + (i % 30)), -5L, 5)
  }

  test("codec selection picks SIMDFOR for full-chunk narrow-range ints") {
    // 16K rows (a writer chunk), range 20 bits on i64: FOR and SIMDFOR tie on
    // size; the 0.85 read factor must break the tie toward the vector codec
    val values = Array.fill(16384)((rnd.nextInt(1 << 20) + 7777777).toLong)
    val sink = new ByteSink()
    Codecs.encodeColumn(LongsCol(values, PhysType.I64), sink)
    val bytes = sink.toArray
    assert(bytes(0) == Codecs.SIMDFOR, s"expected SIMDFOR(14) winner, got tag ${bytes(0)}")
    assert(bytes.length < 16384 * 3, s"20-bit packing expected, got ${bytes.length} bytes")
    val col = Codecs.decodeValues(new ByteCursor(bytes)).asInstanceOf[LongsCol]
    assert(col.values.sameElements(values))
  }

  test("fuzz: random width/base/length round-trips through the codec layer") {
    for (_ <- 1 to 40) {
      val n = 512 + rnd.nextInt(4000)
      val w = 1 + rnd.nextInt(40)
      val base = rnd.nextLong() % (1L << 50)
      val values = Array.fill(n)(base + ((rnd.nextLong() & Long.MaxValue) % (1L << w)))
      val sink = new ByteSink()
      Codecs.encodeColumn(LongsCol(values, PhysType.I64), sink)
      val col = Codecs.decodeValues(new ByteCursor(sink.toArray)).asInstanceOf[LongsCol]
      assert(col.values.sameElements(values), s"codec-layer fuzz n=$n w=$w")
    }
  }
}
