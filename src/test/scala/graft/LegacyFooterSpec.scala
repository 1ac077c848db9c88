package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** v5/v6 footer compatibility: files written before the v7 grouped stream
  * directory keep reading (the reference keeps stripe metadata readable
  * across versions — dwio/nimble/tablet/TabletReader.cpp version gates).
  * The test synthesizes a legacy file by re-writing a current file's footer
  * in the embedded-directory layout (stripe data bytes are version-invariant
  * since v5), then asserts the reader sees identical metadata and values. */
class LegacyFooterSpec extends AnyFunSuite {

  private def tmpFile(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("legacyfooter").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name.gft"
  }

  private val schemaJson =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))).json

  private def bytesCol(values: Seq[String]): BytesCol = {
    val offs = new Array[Int](values.length + 1)
    val sink = new ByteSink(64)
    values.zipWithIndex.foreach { case (v, i) =>
      sink.writeBytes(v.getBytes("UTF-8")); offs(i + 1) = sink.size
    }
    BytesCol(offs, sink.toArray)
  }

  /** Write the pre-v7 footer layout: the whole stream directory (blooms,
    * locations, stats) embedded per stripe. Byte-for-byte the old
    * `writeFooter` (git history at the v6 tag). */
  private def legacyFooterBytes(version: Int, r: Tablet.Reader): Array[Byte] = {
    val f = r.footer
    val nStreams = f.streamKeys.length
    val s = new ByteSink(1 << 16)
    s.writeByte(version)
    s.writeBlock(f.schemaJson.getBytes("UTF-8"))
    s.writeVarint(f.sortColumns.length.toLong)
    f.sortColumns.foreach(c => s.writeBlock(c.getBytes("UTF-8")))
    s.writeVarint(f.rowCount)
    s.writeVarint(nStreams.toLong)
    f.streamKeys.foreach(k => s.writeBlock(k.getBytes("UTF-8")))
    s.writeVarint(f.stripes.length.toLong)
    for (sI <- f.stripes.indices) {
      val st = f.stripes(sI)
      s.writeVarint(st.offset)
      s.writeVarint(st.length)
      s.writeVarint(st.rowCount)
      s.writeLong(st.checksum)
      val blooms = (0 until nStreams)
        .flatMap(id => r.streamBloom(sI, id).map(id -> _))
      s.writeVarint(blooms.size.toLong)
      for ((id, bloom) <- blooms) {
        s.writeVarint(id.toLong)
        s.writeVarint(bloom.bits.length.toLong)
        bloom.bits.foreach(s.writeLong)
      }
      for (id <- 0 until nStreams) {
        val loc = r.streamLoc(sI, id)
        s.writeVarint(loc.offset); s.writeVarint(loc.length)
      }
      for (id <- 0 until nStreams) Tablet.writeStats(s, r.streamStats(sI, id))
    }
    for (x <- f.fileStats) Tablet.writeStats(s, x)
    s.toArray
  }

  /** Current file -> same stripe bytes + a legacy (v5/v6) footer. */
  private def synthesizeLegacy(version: Int, srcPath: String, dstPath: String): Unit = {
    val r = new Tablet.Reader(srcPath)
    try {
      val dataEnd = r.footer.stripes.map(st => st.offset + st.length).max
      val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(srcPath))
      val fb = legacyFooterBytes(version, r)
      val out = new ByteSink(dataEnd.toInt + fb.length + 8)
      out.writeBytes(all, 0, dataEnd.toInt)
      out.writeBytes(fb)
      out.writeInt(fb.length)
      out.writeBytes(Tablet.Magic)
      java.nio.file.Files.write(java.nio.file.Paths.get(dstPath), out.toArray)
    } finally r.close()
  }

  private def writeSample(path: String): Unit = {
    val w = new Tablet.Writer(path, schemaJson, Array("i", "s"),
      sortColumns = Seq("i"), bloomColumns = Set("i"), compression = "zstd")
    var base = 0L
    for (_ <- 0 until 3) { // 3 stripes, 2 chunks each
      for (_ <- 0 until 2) {
        val ints = LongsCol((0 until 100).map(base + _).toArray, PhysType.I64)
        // low-cardinality strings spanning chunks: engages the shared
        // dictionary (alphabet frames appear in v6+ data, reader-transparent)
        val strs = bytesCol((0 until 100).map(i => s"tag_${i % 5}"))
        w.writeChunk(0, ints)
        w.writeChunk(1, strs)
        w.addRows(100L)
        base += 100
      }
      w.flushStripe()
    }
    w.close()
  }

  private def allValues(path: String): (Seq[Long], Seq[String]) = {
    val r = new Tablet.Reader(path)
    try {
      val longs = scala.collection.mutable.ArrayBuffer[Long]()
      val strs = scala.collection.mutable.ArrayBuffer[String]()
      for (s <- r.footer.stripes.indices) {
        val ic = new Tablet.ChunkCursor(r.readStreamBytes(s, 0))
        while (ic.hasNext) {
          val c = ic.next().asInstanceOf[LongsCol]
          longs ++= c.values.take(c.len)
        }
        val sc = new Tablet.ChunkCursor(r.readStreamBytes(s, 1))
        while (sc.hasNext) {
          val c = sc.next() match {
            case b: BytesCol => b
            case d: DictBytesCol => d.expand
            case l: LazyFsstBytesCol => l.expand
            case other => fail(s"unexpected column type ${other.getClass}")
          }
          strs ++= (0 until c.len).map(i => new String(c(i), "UTF-8"))
        }
      }
      (longs.toSeq, strs.toSeq)
    } finally r.close()
  }

  test("v6 footer (embedded directory, shared-dict frames) reads identically") {
    val cur = tmpFile("current")
    writeSample(cur)
    val legacy = tmpFile("legacy6")
    synthesizeLegacy(6, cur, legacy)

    val (wantI, wantS) = allValues(cur)
    val (gotI, gotS) = allValues(legacy)
    assert(gotI == wantI)
    assert(gotS == wantS)

    val rc = new Tablet.Reader(cur)
    val rl = new Tablet.Reader(legacy)
    try {
      assert(rl.footer.version == 6)
      assert(rl.footer.rowCount == rc.footer.rowCount)
      assert(rl.footer.sortColumns == Seq("i"))
      assert(rl.footer.stripes.map(_.rowCount).toSeq == rc.footer.stripes.map(_.rowCount).toSeq)
      for (s <- rc.footer.stripes.indices; id <- 0 until 2) {
        assert(rl.streamLoc(s, id) == rc.streamLoc(s, id), s"loc stripe=$s id=$id")
        val (a, b) = (rl.streamStats(s, id), rc.streamStats(s, id))
        assert(a.minLong == b.minLong && a.maxLong == b.maxLong && a.nullCount == b.nullCount)
        // bloom survives: a present value probes true
        if (id == 0) {
          val bl = rl.streamBloom(s, id)
          assert(bl.isDefined)
          assert(bl.get.mightContain(Tablet.hashLongValue(rc.streamStats(s, id).minLong)))
        }
      }
    } finally { rc.close(); rl.close() }
  }

  test("v5 footer reads identically") {
    val cur = tmpFile("current5")
    writeSample(cur)
    val legacy = tmpFile("legacy5")
    synthesizeLegacy(5, cur, legacy)
    assert(allValues(legacy) == allValues(cur))
  }

  /** v7 layout: grouped directory like v8 but names + file stats always
    * inline and no sectioned-meta flag byte (git history at the v7 tag). */
  private def v7FooterBytes(r: Tablet.Reader, groups: Array[Tablet.GroupLoc]): Array[Byte] = {
    val f = r.footer
    val s = new ByteSink(1 << 16)
    s.writeByte(7)
    s.writeBlock(f.schemaJson.getBytes("UTF-8"))
    s.writeVarint(f.sortColumns.length.toLong)
    f.sortColumns.foreach(c => s.writeBlock(c.getBytes("UTF-8")))
    s.writeVarint(f.rowCount)
    s.writeVarint(f.streamKeys.length.toLong)
    f.streamKeys.foreach(k => s.writeBlock(k.getBytes("UTF-8")))
    s.writeVarint(f.stripes.length.toLong)
    for (st <- f.stripes) {
      s.writeVarint(st.offset); s.writeVarint(st.length)
      s.writeVarint(st.rowCount); s.writeLong(st.checksum)
    }
    s.writeVarint(f.groupSize.toLong)
    s.writeVarint(groups.length.toLong)
    for (g <- groups) { s.writeVarint(g.offset); s.writeVarint(g.length) }
    for (x <- f.fileStats) Tablet.writeStats(s, x)
    s.toArray
  }

  /** Re-serialize the directory group sections in the PRE-v13 entry shape
    * (no chunk directory block — the v13 writer always appends one, which a
    * v7 footer's reader must not be asked to parse). Appends at `out`'s
    * current end and returns the rebuilt group locations. */
  private def legacyGroupSections(r: Tablet.Reader, out: ByteSink): Array[Tablet.GroupLoc] = {
    val f = r.footer
    val nStreams = f.nStreams
    val newGroups = new Array[Tablet.GroupLoc](f.groups.length)
    for (g <- f.groups.indices) {
      val inGroup = math.min(f.groupSize, f.stripes.length - g * f.groupSize)
      val entries = new ByteSink(1 << 12)
      val table = new Array[Long](nStreams + 1)
      for (i <- 0 until nStreams) {
        table(i) = entries.size.toLong
        val perStripe = r.dirEntries(g, i)
        for (s <- 0 until inGroup) {
          val e = perStripe(s)
          entries.writeVarint(e.loc.offset); entries.writeVarint(e.loc.length)
          Tablet.writeStats(entries, e.stats)
          if (e.bloom == null) entries.writeByte(0)
          else {
            entries.writeByte(1)
            entries.writeVarint(e.bloom.bits.length.toLong)
            e.bloom.bits.foreach(entries.writeLong)
          }
        }
      }
      table(nStreams) = entries.size.toLong
      val start = out.size
      table.foreach(out.writeLong)
      out.writeBytes(entries.toArray)
      newGroups(g) = Tablet.GroupLoc(start.toLong, (out.size - start).toLong)
    }
    newGroups
  }

  test("v7 footer (grouped directory, inline names+stats) reads identically") {
    val cur = tmpFile("current7v")
    writeSample(cur)
    val v7 = tmpFile("legacy7v")
    // keep stripe data; rebuild the group sections in the pre-v13 entry
    // shape (v13 entries embed a chunk directory a v7 parse must not see)
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cur))
    val a = new Tablet.Reader(cur)
    try {
      val dataEnd = a.footer.groups(0).offset
      val out = new ByteSink(all.length + (1 << 12))
      out.writeBytes(all, 0, dataEnd.toInt)
      val newGroups = legacyGroupSections(a, out)
      val fb = v7FooterBytes(a, newGroups)
      out.writeBytes(fb)
      out.writeInt(fb.length)
      out.writeBytes(Tablet.Magic)
      java.nio.file.Files.write(java.nio.file.Paths.get(v7), out.toArray)
      val b = new Tablet.Reader(v7)
      try {
        assert(b.footer.version == 7)
        assert(b.footer.rowCount == a.footer.rowCount)
        assert(b.footer.streamKeys.toSeq == a.footer.streamKeys.toSeq)
        for (s <- a.footer.stripes.indices; id <- a.footer.streamKeys.indices) {
          assert(java.util.Arrays.equals(b.readStreamBytes(s, id), a.readStreamBytes(s, id)),
            s"stream $id stripe $s bytes differ")
          assert(b.streamStats(s, id).valueCount == a.streamStats(s, id).valueCount)
          assert(b.streamBloom(s, id).isDefined == a.streamBloom(s, id).isDefined)
        }
        assert(b.keyId("i") == a.keyId("i") && b.keyId("nope") == -1)
        assert(b.fileStatsOf("i").map(_.valueCount) == a.fileStatsOf("i").map(_.valueCount))
      } finally b.close()
    } finally a.close()
  }

  test("v13 footer (chunk directory without the v14 stats block) reads identically") {
    val cur = tmpFile("current13v")
    writeSample(cur)
    val v13 = tmpFile("legacy13v")
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cur))
    val a = new Tablet.Reader(cur)
    try {
      val dataEnd = a.footer.groups(0).offset
      val out = new ByteSink(all.length + (1 << 12))
      out.writeBytes(all, 0, dataEnd.toInt)
      // rebuild the group sections in the v13 entry shape: loc + stats +
      // bloom + chunk directory (count, offset deltas, rows|isData) but NO
      // per-frame stats block
      val f = a.footer
      val nStreams = f.nStreams
      val newGroups = new Array[Tablet.GroupLoc](f.groups.length)
      for (g <- f.groups.indices) {
        val inGroup = math.min(f.groupSize, f.stripes.length - g * f.groupSize)
        val entries = new ByteSink(1 << 12)
        val table = new Array[Long](nStreams + 1)
        for (i <- 0 until nStreams) {
          table(i) = entries.size.toLong
          val perStripe = a.dirEntries(g, i)
          for (s <- 0 until inGroup) {
            val e = perStripe(s)
            entries.writeVarint(e.loc.offset); entries.writeVarint(e.loc.length)
            Tablet.writeStats(entries, e.stats)
            if (e.bloom == null) entries.writeByte(0)
            else {
              entries.writeByte(1)
              entries.writeVarint(e.bloom.bits.length.toLong)
              e.bloom.bits.foreach(entries.writeLong)
            }
            if (e.chunks == null) entries.writeVarint(0L)
            else {
              entries.writeVarint(e.chunks.length.toLong)
              var prev = 0L
              for (cl <- e.chunks) {
                entries.writeVarint(cl.offset - prev); prev = cl.offset
                entries.writeVarint((cl.rows << 1) | (if (cl.isData) 1L else 0L))
              }
            }
          }
        }
        table(nStreams) = entries.size.toLong
        val start = out.size
        table.foreach(out.writeLong)
        out.writeBytes(entries.toArray)
        newGroups(g) = Tablet.GroupLoc(start.toLong, (out.size - start).toLong)
      }
      // the v13 footer layout IS the v14 layout — only the version byte and
      // the directory-entry payload differ (raw core: the version byte at
      // offset 0 is only patchable pre-compression)
      val fb = Tablet.writeFooterRaw(f.copy(groups = newGroups))
      fb(0) = 13
      out.writeBytes(fb)
      out.writeInt(fb.length)
      out.writeBytes(Tablet.Magic)
      java.nio.file.Files.write(java.nio.file.Paths.get(v13), out.toArray)

      val (wantI, wantS) = allValues(cur)
      val (gotI, gotS) = allValues(v13)
      assert(gotI == wantI)
      assert(gotS == wantS)
      val b = new Tablet.Reader(v13)
      try {
        assert(b.footer.version == 13)
        for (s <- f.stripes.indices; id <- 0 until nStreams) {
          val want = a.chunkDirOf(s, id)
          val got = b.chunkDirOf(s, id)
          assert((want == null) == (got == null))
          if (want != null) {
            assert(got.length == want.length)
            for ((w13, w14) <- got.zip(want)) {
              assert(w13.offset == w14.offset && w13.rows == w14.rows &&
                w13.isData == w14.isData)
              assert(w13.stats == null, "a v13 directory must carry no chunk stats")
            }
          }
        }
      } finally b.close()
    } finally a.close()
  }

  test("stripe checksums verify cross-version: XXH3 for v11+, XXH64 legacy") {
    // fresh v11 file: every stripe's span must match its footer checksum
    // under XXH3_64, and a corrupted byte must be caught
    val path = tmpFile("xxh3")
    val w = new Tablet.Writer(path, schemaJson, Array("i", "s"))
    w.writeChunk(0, LongsCol(Array.tabulate(5000)(_.toLong * 7), PhysType.I64))
    w.writeChunk(1, bytesCol((0 until 5000).map(i => s"row_$i")))
    w.addRows(5000L)
    w.close()
    val r = new Tablet.Reader(path)
    try {
      assert(r.footer.version >= 11)
      val raf = new java.io.RandomAccessFile(path, "r")
      for ((s, si) <- r.footer.stripes.zipWithIndex) {
        val lens = Array.tabulate(r.footer.streamKeys.length)(k => r.streamLoc(si, k).length)
        val b = new Array[Byte](s.length.toInt)
        raf.seek(s.offset); raf.readFully(b)
        assert(Tablet.stripeChecksumOf(r.footer.version, b, lens) == s.checksum,
          "v11 stripe must verify under XXH3-of-stream-XXH3s")
        // the algorithms genuinely differ (a v10 verifier would reject)
        assert(Tablet.xxh64(b, 0, b.length) != s.checksum,
          "XXH3 rule and XXH64 must disagree on real data")
        b(b.length / 2) = (b(b.length / 2) ^ 0x5a).toByte
        assert(Tablet.stripeChecksumOf(r.footer.version, b, lens) != s.checksum,
          "corruption must be detected")
      }
      raf.close()
    } finally r.close()
    // golden pre-v11 file: stripes still verify under the legacy XXH64 rule
    val goldenUrl = getClass.getResource("/golden/golden_v7.gft")
    assert(goldenUrl != null)
    val gPath = goldenUrl.getPath
    val gr = new Tablet.Reader(gPath)
    try {
      assert(gr.footer.version < 11)
      val raf = new java.io.RandomAccessFile(gPath, "r")
      for ((s, si) <- gr.footer.stripes.zipWithIndex) {
        val lens = Array.tabulate(gr.footer.streamKeys.length)(k => gr.streamLoc(si, k).length)
        val b = new Array[Byte](s.length.toInt)
        raf.seek(s.offset); raf.readFully(b)
        assert(Tablet.stripeChecksumOf(gr.footer.version, b, lens) == s.checksum,
          "legacy stripe must verify under XXH64")
      }
      raf.close()
    } finally gr.close()
  }

  test("compressed footer core round-trips; tiny footers stay raw (r16)") {
    // bulk enough to clear the 512-byte floor AND compress (schema JSON +
    // NDV registers are the real footer's low-entropy mass)
    val schema = org.apache.spark.sql.types.StructType((0 until 12).map(i =>
      org.apache.spark.sql.types.StructField(s"column_name_$i", org.apache.spark.sql.types.LongType)))
    val ndv = (0 until 12).map(i => s"column_name_$i" -> Hll.empty()).toMap
    val stats = Array.fill(12)(Tablet.Stats())
    val f = Tablet.Footer(Tablet.Version, schema.json, Nil, 1000L,
      (0 until 12).map(i => s"column_name_$i").toArray,
      Array(Tablet.StripeInfo(4L, 999L, 1000L, 7L)),
      64, Array(Tablet.GroupLoc(1003L, 50L)), stats, ndvSketches = ndv)
    val fb = Tablet.writeFooter(f)
    assert(fb(0) == 0xFF.toByte, "a bulky footer must take the compressed wrapper")
    assert(fb.length < Tablet.writeFooterRaw(f).length, "wrapper must actually shrink it")
    val back = Tablet.readFooter(fb)
    assert(back.version == Tablet.Version)
    assert(back.schemaJson == schema.json)
    assert(back.rowCount == 1000L)
    assert(back.streamKeys.toSeq == (0 until 12).map(i => s"column_name_$i"))
    assert(back.stripes.head.checksum == 7L)
    assert(back.ndvSketches.keySet == ndv.keySet)
    // tiny footer: stays raw (version byte first), parses identically
    val tiny = Tablet.Footer(Tablet.Version,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType))).json,
      Nil, 10L, Array("a"), Array(Tablet.StripeInfo(4L, 50L, 10L, 1L)),
      64, Array(Tablet.GroupLoc(54L, 10L)), Array(Tablet.Stats()))
    val tb = Tablet.writeFooter(tiny)
    assert(tb(0) == Tablet.Version.toByte, "tiny footers skip the wrapper")
    assert(Tablet.readFooter(tb).rowCount == 10L)
  }

  test("unknown versions still fail loudly") {
    val future = Tablet.Version + 1
    val cur = tmpFile(s"current$future")
    writeSample(cur)
    val legacy = tmpFile(s"legacy$future")
    synthesizeLegacy(future, cur, legacy)
    val e = intercept[IllegalArgumentException] {
      val r = new Tablet.Reader(legacy)
      try r.footer finally r.close()
    }
    assert(e.getMessage.contains(s"v$future"))
  }
}
