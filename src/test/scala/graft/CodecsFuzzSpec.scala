package graft

import graft.format._
import org.scalatest.funsuite.AnyFunSuite

/** Property-based codec fuzzing, mirroring the reference's fuzzer layer
  * (reference: dwio/nimble/fuzzer/encoding/EncodingFuzzerTest.cpp,
  * velox/tests/VeloxWriterFuzzTest.cpp): arbitrary values + arbitrary null
  * patterns must round-trip bit-exactly through encode/decode, for every
  * physical type, including pattern mixtures the heuristic gates interact
  * with. */
class CodecsFuzzSpec extends AnyFunSuite {

  private def genLongs(r: scala.util.Random): Array[Long] = {
    val mode = r.nextInt(8)
    val n = if (mode >= 6) 1024 + r.nextInt(4000) else r.nextInt(3000)
    mode match {
      case 0 => Array.fill(n)(r.nextLong())
      case 1 => Array.fill(n)(r.nextInt(100).toLong) // low card + narrow
      case 2 => // runs
        val a = new Array[Long](n); var i = 0
        while (i < n) { val v = r.nextInt(5).toLong; val run = math.min(1 + r.nextInt(20), n - i)
          java.util.Arrays.fill(a, i, i + run, v); i += run }
        a
      case 3 => { var v = r.nextLong() % 1000000; Array.fill(n) { v += r.nextInt(100) - 30; v } }
      case 4 => Array.fill(n)(if (r.nextInt(10) == 0) r.nextLong() else 7L) // mainly const
      case 5 => Array.fill(n)(Seq(Long.MinValue, Long.MaxValue, 0L, -1L)(r.nextInt(4)))
      case 6 => // SubIntSplit territory: slow hi bits over noisy low bits
        val loBits = 8 + r.nextInt(24)
        val runLen = 50 + r.nextInt(200)
        val bases = Array.fill(n / runLen + 1)(r.nextLong() >>> r.nextInt(32))
        Array.tabulate(n)(i => (bases(i / runLen) << loBits) |
          (r.nextLong() & ((1L << loBits) - 1)))
      case _ => // FrequencyPartition territory: skewed head + high-card tail
        val heads = Array.fill(8 + r.nextInt(56))(r.nextLong())
        val tail = Array.fill(1000 + r.nextInt(2500))(r.nextLong())
        Array.fill(n)(if (r.nextInt(100) < 90 + r.nextInt(9)) heads(r.nextInt(heads.length))
          else tail(r.nextInt(tail.length)))
    }
  }

  private val nullFracs = Array(0.0, 0.01, 0.5, 0.95, 1.0)

  test("longs round-trip under fuzz (values x null patterns)") {
    for (trial <- 0 until 60) {
        val r = new scala.util.Random(1000 + trial)
        val values = genLongs(r)
        val nullFrac = nullFracs(r.nextInt(nullFracs.length))
        val nulls = if (nullFrac == 0.0) null
        else values.map(_ => r.nextDouble() < nullFrac)
        val sink = new ByteSink()
        Codecs.encodeColumn(LongsCol(values, PhysType.I64, nulls), sink)
        val out = Codecs.decodeColumn(new ByteCursor(sink.toArray)).asInstanceOf[LongsCol]
        assert(out.len == values.length)
        var i = 0
        while (i < values.length) {
          val isNull = nulls != null && nulls(i)
          if (isNull) assert(out.nulls(i))
          else {
            assert(out.nulls == null || !out.nulls(i))
            assert(out.values(i) == values(i))
          }
          i += 1
        }
    }
  }

  private def genDoubles(r: scala.util.Random): Array[Double] = {
    val n = r.nextInt(2000)
    val mode = r.nextInt(7)
    mode match {
        case 0 => Array.fill(n)(r.nextDouble() * 1e12 - 5e11)
        case 1 => Array.fill(n)(r.nextInt(100000) / 100.0) // ALP territory
        case 2 => Array.fill(n)(Seq(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, -0.0, 0.0)(r.nextInt(5)))
        case 3 => // ALP exception mix: decimal bulk + real/special stragglers
          Array.fill(n)(r.nextInt(20) match {
            case 0 => r.nextDouble() * 1e4
            case 1 => Seq(Double.NaN, -0.0, Double.NegativeInfinity)(r.nextInt(3))
            case _ => r.nextInt(1000000) / 100.0
          })
        case 4 => Array.fill(n)((r.nextInt(2000) - 1000).toDouble * 1000.0) // factored ALP
        case 5 => Array.fill(n)((r.nextInt(100000) / 100.0f).toDouble) // float-valued decimals
        case _ => Array.fill(n)(r.nextInt(5).toDouble) // low-card
    }
  }

  test("doubles round-trip under fuzz incl. specials") {
    for (trial <- 0 until 60) {
        val r = new scala.util.Random(2000 + trial)
        val values = genDoubles(r)
        val nullFrac = nullFracs(r.nextInt(nullFracs.length))
        val nulls = if (nullFrac == 0.0) null else values.map(_ => r.nextDouble() < nullFrac)
        val sink = new ByteSink()
        Codecs.encodeColumn(DoublesCol(values, isFloat = false, nulls), sink)
        val out = Codecs.decodeColumn(new ByteCursor(sink.toArray)).asInstanceOf[DoublesCol]
        var i = 0
        while (i < values.length) {
          val isNull = nulls != null && nulls(i)
          if (!isNull) assert(java.lang.Double.doubleToLongBits(out.values(i)) ==
            java.lang.Double.doubleToLongBits(values(i)), s"row $i")
          i += 1
        }
    }
  }

  test("floats round-trip under fuzz (ALP + exceptions + specials)") {
    for (trial <- 0 until 30) {
      val r = new scala.util.Random(7000 + trial)
      val n = r.nextInt(2000)
      val values: Array[Double] = r.nextInt(3) match {
        case 0 => Array.fill(n)((r.nextInt(100000) / 100.0f).toDouble)
        case 1 => Array.fill(n)(r.nextFloat().toDouble)
        case _ => Array.fill(n)(r.nextInt(20) match {
          case 0 => Seq(Float.NaN, -0.0f, Float.PositiveInfinity)(r.nextInt(3)).toDouble
          case _ => ((r.nextInt(20000) - 10000) / 100.0f).toDouble
        })
      }
      val sink = new ByteSink()
      Codecs.encodeColumn(DoublesCol(values, isFloat = true), sink)
      val out = Codecs.decodeColumn(new ByteCursor(sink.toArray)).asInstanceOf[DoublesCol]
      var i = 0
      while (i < values.length) {
        assert(java.lang.Float.floatToIntBits(out.values(i).toFloat) ==
          java.lang.Float.floatToIntBits(values(i).toFloat), s"trial $trial row $i")
        i += 1
      }
    }
  }

  private def genStrings(r: scala.util.Random): Array[String] = {
      val n = r.nextInt(1500)
      val mode = r.nextInt(4)
      val arr = mode match {
        case 0 => Array.fill(n)(r.nextString(r.nextInt(40)))
        case 1 => Array.fill(n)(s"key_${r.nextInt(10)}")
        case 2 => Array.fill(n)(if (r.nextBoolean()) "" else "日本語" + r.nextInt(3))
        case _ => Array.fill(n)(f"prefix_shared_${r.nextInt(1000)}%06d")
      }
      if (mode == 3) java.util.Arrays.sort(arr.asInstanceOf[Array[Object]])
      arr
  }

  test("strings round-trip under fuzz (unicode, empties, dups, sorted)") {
    for (trial <- 0 until 60) {
        val r = new scala.util.Random(3000 + trial)
        val values = genStrings(r)
        val nullFrac = nullFracs(r.nextInt(nullFracs.length))
        val nulls = if (nullFrac == 0.0) null else values.map(_ => r.nextDouble() < nullFrac)
        val bb = new ByteSink()
        val offs = new Array[Int](values.length + 1)
        var i = 0
        while (i < values.length) { bb.writeBytes(values(i).getBytes("UTF-8")); offs(i + 1) = bb.size; i += 1 }
        val sink = new ByteSink()
        Codecs.encodeColumn(BytesCol(offs, bb.toArray, nulls), sink)
        val out = Codecs.decodeColumn(new ByteCursor(sink.toArray)).asInstanceOf[BytesCol]
        i = 0
        while (i < values.length) {
          val isNull = nulls != null && nulls(i)
          if (!isNull) assert(new String(out(i), "UTF-8") == values(i), s"row $i")
          else assert(out.nulls(i))
          i += 1
        }
    }
  }

  test("point-read parity under fuzz: positional decode == bulk decode at random positions") {
    // whenever decodeValuesAt accepts a payload (any codec the generators
    // trigger, any null pattern), its values must agree with the bulk
    // decoder at every selected position — the r15 string point readers
    // (Trivial/Dict/Fsst/PrefixR, nullable-wrapped) ride the same contract
    // as the longs battery
    def randPositions(r: scala.util.Random, n: Int): Array[Int] = {
      val k = 1 + r.nextInt(math.min(n, 64))
      val set = scala.collection.mutable.SortedSet[Int]()
      while (set.size < k) set += r.nextInt(n)
      set.toArray
    }
    var longsSeeks = 0
    var stringSeeks = 0
    for (trial <- 0 until 60) {
      val r = new scala.util.Random(7000 + trial)
      // longs arm
      locally {
        val values = genLongs(r)
        if (values.nonEmpty) {
          val nullFrac = nullFracs(r.nextInt(nullFracs.length))
          val nulls = if (nullFrac == 0.0) null else values.map(_ => r.nextDouble() < nullFrac)
          val sink = new ByteSink()
          Codecs.encodeColumn(LongsCol(values, PhysType.I64, nulls), sink)
          val enc = sink.toArray
          val bulk = Codecs.decodeColumn(new ByteCursor(enc)).asInstanceOf[LongsCol]
          val pos = randPositions(r, values.length)
          Codecs.decodeValuesAt(new ByteCursor(enc), pos) match {
            case lc: LongsCol =>
              longsSeeks += 1
              var j = 0
              while (j < pos.length) {
                val p = pos(j)
                val isNull = bulk.nulls != null && bulk.nulls(p)
                if (isNull) assert(lc.nulls != null && lc.nulls(j), s"trial $trial pos $p null lost")
                else {
                  assert(lc.nulls == null || !lc.nulls(j), s"trial $trial pos $p spurious null")
                  assert(lc.values(j) == bulk.values(p), s"trial $trial pos $p value")
                }
                j += 1
              }
            case null => () // codec declines: bulk-decode+gather covers it elsewhere
            case other => fail(s"unexpected column ${other.getClass.getSimpleName}")
          }
        }
      }
      // strings arm
      locally {
        val values = genStrings(r)
        if (values.nonEmpty) {
          val nullFrac = nullFracs(r.nextInt(nullFracs.length))
          val nulls = if (nullFrac == 0.0) null else values.map(_ => r.nextDouble() < nullFrac)
          val bb = new ByteSink()
          val offs = new Array[Int](values.length + 1)
          var i = 0
          while (i < values.length) { bb.writeBytes(values(i).getBytes("UTF-8")); offs(i + 1) = bb.size; i += 1 }
          val sink = new ByteSink()
          Codecs.encodeColumn(BytesCol(offs, bb.toArray, nulls), sink)
          val enc = sink.toArray
          val bulk = Codecs.decodeColumn(new ByteCursor(enc)).asInstanceOf[BytesCol]
          val pos = randPositions(r, values.length)
          Codecs.decodeValuesAt(new ByteCursor(enc), pos) match {
            case bc: BytesCol =>
              stringSeeks += 1
              var j = 0
              while (j < pos.length) {
                val p = pos(j)
                val isNull = bulk.nulls != null && bulk.nulls(p)
                if (isNull) assert(bc.nulls != null && bc.nulls(j), s"trial $trial pos $p null lost")
                else {
                  assert(bc.nulls == null || !bc.nulls(j), s"trial $trial pos $p spurious null")
                  val got = new String(bc.bytes, bc.offsets(j), bc.offsets(j + 1) - bc.offsets(j), "UTF-8")
                  assert(got == values(p), s"trial $trial pos $p string")
                }
                j += 1
              }
            case null => ()
            case other => fail(s"unexpected column ${other.getClass.getSimpleName}")
          }
        }
      }
    }
    // the fast paths must actually engage across the fuzz (not decline always)
    assert(longsSeeks > 20, s"longs point reads engaged only $longsSeeks/60 trials")
    assert(stringSeeks > 20, s"string point reads engaged only $stringSeeks/60 trials")
  }

  test("range-window parity under fuzz: decodeValuesRange == bulk decode on [from, until)") {
    // the window decoder (Huffman checkpoint seeks, full-decode fallback for
    // everything else) must agree with the bulk decoder over every random
    // window, for every codec/null pattern the generators trigger —
    // including from==0, until==n and single-row windows
    var windows = 0
    for (trial <- 0 until 60) {
      val r = new scala.util.Random(9000 + trial)
      val values = genLongs(r)
      if (values.length >= 2) {
        val nullFrac = nullFracs(r.nextInt(nullFracs.length))
        val nulls = if (nullFrac == 0.0) null else values.map(_ => r.nextDouble() < nullFrac)
        val sink = new ByteSink()
        Codecs.encodeColumn(LongsCol(values, PhysType.I64, nulls), sink)
        val enc = sink.toArray
        val bulk = Codecs.decodeColumn(new ByteCursor(enc)).asInstanceOf[LongsCol]
        val n = values.length
        for (_ <- 0 until 4) {
          val from = r.nextInt(n)
          val until = r.nextInt(3) match {
            case 0 => math.min(from + 1, n) // single row
            case 1 => n // to the end
            case _ => from + 1 + r.nextInt(n - from)
          }
          val (col, start) = Codecs.decodeValuesRange(new ByteCursor(enc), from, until)
          val win = col.asInstanceOf[LongsCol]
          assert(start <= from && start + win.len >= until,
            s"trial $trial window [$start, ${start + win.len}) misses [$from, $until)")
          windows += 1
          var p = from
          while (p < until) {
            val isNull = bulk.nulls != null && bulk.nulls(p)
            val winNull = win.nulls != null && win.nulls(p - start)
            assert(winNull == isNull, s"trial $trial null drift at row $p")
            if (!isNull)
              assert(win.values(p - start) == bulk.values(p), s"trial $trial value drift at row $p")
            p += 1
          }
        }
      }
    }
    assert(windows > 100, s"fuzz exercised only $windows windows")
  }

  test("serializer fuzz: random scalar rows round-trip") {
    import org.apache.spark.sql.types._
    for (trial <- 0 until 15) {
        val r = new scala.util.Random(4000 + trial)
        val n = r.nextInt(300)
        val schema = StructType(Seq(
          StructField("a", LongType), StructField("b", StringType, nullable = true),
          StructField("c", DoubleType), StructField("d", BooleanType)))
        val rows = (0 until n).map { _ =>
          org.apache.spark.sql.catalyst.InternalRow(
            r.nextLong(),
            if (r.nextInt(5) == 0) null else org.apache.spark.unsafe.types.UTF8String.fromString(r.nextString(8)),
            r.nextDouble(), r.nextBoolean())
        }
        val blob = Serializer.serialize(schema, rows.iterator)
        val (s2, back) = Serializer.deserialize(blob)
        assert(s2 == schema && back.length == n)
        var i = 0
        while (i < n) {
          assert(back(i).getLong(0) == rows(i).getLong(0))
          assert(back(i).isNullAt(1) == rows(i).isNullAt(1))
          if (!rows(i).isNullAt(1)) assert(back(i).getUTF8String(1) == rows(i).getUTF8String(1))
          assert(back(i).getDouble(2) == rows(i).getDouble(2))
          assert(back(i).getBoolean(3) == rows(i).getBoolean(3))
          i += 1
        }
    }
  }
}
