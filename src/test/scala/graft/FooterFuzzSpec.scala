package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Footer wire-format fuzz: random legal Footer shapes (inline and
  * sectioned, buckets, sort columns, NDV registers, schema JSON from tiny
  * to multi-KB) must round-trip writeFooter -> readFooter field-for-field.
  * Guards the r16 compressed footer core in particular: the wrapper
  * decision (raw below 512 B or when zstd does not pay) varies with the
  * generated shape, so both arms fuzz in one sweep. */
class FooterFuzzSpec extends AnyFunSuite {

  private def randStats(rnd: scala.util.Random): Tablet.Stats = {
    val st = Tablet.Stats()
    st.valueCount = rnd.nextInt(1 << 20).toLong
    st.nullCount = rnd.nextInt(100).toLong
    if (rnd.nextBoolean()) {
      st.hasMinMax = true
      rnd.nextInt(3) match {
        case 0 =>
          st.kind = PhysType.I64
          st.minLong = rnd.nextLong(); st.maxLong = rnd.nextLong()
        case 1 =>
          st.kind = PhysType.F64
          st.minDouble = rnd.nextDouble(); st.maxDouble = rnd.nextDouble()
          st.hasNaN = rnd.nextBoolean()
        case _ =>
          st.kind = PhysType.Bytes
          st.minBytes = Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
          st.maxBytes = Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
      }
    }
    st
  }

  test("random footers round-trip through the (possibly compressed) wire form") {
    val rnd = new scala.util.Random(20260815)
    var sawCompressed = 0
    var sawRaw = 0
    for (trial <- 0 until 200) {
      // a quarter of trials are deliberately tiny so the sub-512-B raw arm
      // (no compression wrapper) gets real coverage
      val tiny = rnd.nextInt(4) == 0
      val nStreams = if (tiny) 1 else 1 + rnd.nextInt(24)
      val keys = Array.tabulate(nStreams)(i =>
        if (tiny) s"c$i" else s"col_${trial}_$i" + ("x" * rnd.nextInt(20)))
      val schema = org.apache.spark.sql.types.StructType(
        keys.map(k => org.apache.spark.sql.types.StructField(k, org.apache.spark.sql.types.LongType)))
      val nStripes = 1 + rnd.nextInt(6)
      val stripes = Array.tabulate(nStripes)(i =>
        Tablet.StripeInfo(4L + i * 1000L, 100L + rnd.nextInt(900), rnd.nextInt(10000).toLong, rnd.nextLong()))
      val groups = Array.tabulate(1 + rnd.nextInt(3))(i => Tablet.GroupLoc(9000L + i * 64, 64L))
      val sortCols = if (rnd.nextBoolean()) Seq(keys(0)) else Nil
      val ndv =
        if (!tiny && rnd.nextBoolean())
          keys.take(rnd.nextInt(nStreams + 1)).map { k =>
            k -> Array.fill(256)(rnd.nextInt(18).toByte)
          }.toMap
        else Map.empty[String, Array[Byte]]
      val bucketed = rnd.nextInt(4) == 0
      val f = Tablet.Footer(Tablet.Version, schema.json, sortCols, rnd.nextInt(1 << 20).toLong,
        keys, stripes, 64, groups, Array.fill(nStreams)(randStats(rnd)),
        bucketColumns = if (bucketed) Seq(keys(0)) else Nil,
        numBucketsSpec = if (bucketed) 8 else 0,
        bucketId = if (bucketed) rnd.nextInt(8) else -1,
        ndvSketches = ndv)
      val wire = Tablet.writeFooter(f)
      if (wire(0) == 0xFF.toByte) sawCompressed += 1 else sawRaw += 1
      val back = Tablet.readFooter(wire)
      assert(back.version == f.version, s"trial $trial")
      assert(back.schemaJson == f.schemaJson, s"trial $trial")
      assert(back.sortColumns == f.sortColumns, s"trial $trial")
      assert(back.rowCount == f.rowCount, s"trial $trial")
      assert(back.streamKeys.toSeq == keys.toSeq, s"trial $trial")
      assert(back.stripes.toSeq == stripes.toSeq, s"trial $trial")
      assert(back.groups.toSeq == groups.toSeq, s"trial $trial")
      assert(back.bucketColumns == f.bucketColumns, s"trial $trial")
      assert(back.numBucketsSpec == f.numBucketsSpec, s"trial $trial")
      assert(back.bucketId == f.bucketId, s"trial $trial")
      assert(back.ndvSketches.keySet == ndv.keySet, s"trial $trial")
      for ((k, regs) <- ndv)
        assert(java.util.Arrays.equals(back.ndvSketches(k), regs), s"trial $trial ndv $k")
      for (i <- 0 until nStreams) {
        val (a, b) = (back.fileStats(i), f.inlineStats(i))
        assert(a.valueCount == b.valueCount && a.nullCount == b.nullCount &&
          a.hasMinMax == b.hasMinMax && a.kind == b.kind, s"trial $trial stats $i")
        if (b.hasMinMax && b.kind == PhysType.I64)
          assert(a.minLong == b.minLong && a.maxLong == b.maxLong, s"trial $trial stats $i")
        if (b.hasMinMax && b.kind == PhysType.Bytes)
          assert(java.util.Arrays.equals(a.minBytes, b.minBytes) &&
            java.util.Arrays.equals(a.maxBytes, b.maxBytes), s"trial $trial stats $i")
      }
    }
    // the sweep must exercise BOTH wire arms or the fuzz is vacuous
    assert(sawCompressed > 20, s"compressed arm under-fuzzed: $sawCompressed of 200")
    assert(sawRaw > 20, s"raw arm under-fuzzed: $sawRaw of 200")
  }
}
