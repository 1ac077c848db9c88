package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** v13 chunk directory (reference: tablet/ChunkStatsWriter.h:80-89 —
  * chunkRows + chunkOffsets per stream per stripe): every frame emitted by
  * the writer must appear in the directory with its exact byte offset, row
  * count and data/alphabet flag, so a reader can fetch candidate chunk
  * byte ranges without scanning frame headers. Verified by independently
  * walking the raw stream bytes frame by frame. */
class ChunkDirSpec extends AnyFunSuite {

  /** Walk raw stream bytes: (offset, in-frame stats (null when the frame
    * carries none), isData). */
  private def walkFrames(bytes: Array[Byte]): Seq[(Long, Tablet.Stats, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Long, Tablet.Stats, Boolean)]()
    var pos = 0
    while (pos < bytes.length) {
      val compLen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      val c = new ByteCursor(bytes, pos + 4, bytes.length)
      c.readVarint() // rawLen
      c.readByte() // compression kind
      val flag = c.readByte()
      val stats = if (flag == 1) Tablet.readStats(c) else null
      out += ((pos.toLong, stats, flag != 2))
      pos = c.pos + compLen
    }
    out.toSeq
  }

  private def writeFixture(dir: String, rows: Int, rowsPerChunk: Int): String = {
    val f = new java.io.File(dir, "chunkdir.gft")
    val schema = """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":false,"metadata":{}},
      {"name":"cat","type":"string","nullable":false,"metadata":{}},
      {"name":"txt","type":"string","nullable":true,"metadata":{}}]}"""
    val w = new Tablet.Writer(f.getAbsolutePath, schema, Array("id", "cat", "txt"))
    var base = 0
    while (base < rows) {
      val n = math.min(rowsPerChunk, rows - base)
      val ids = Array.tabulate(n)(i => (base + i).toLong)
      // low-cardinality strings so `cat` shared-dict encodes (alphabet frame)
      val cat = {
        val sb = new ByteSink(256)
        val offs = new Array[Int](n + 1)
        var i = 0
        while (i < n) {
          sb.writeBytes(s"cat_${(base + i) % 5}".getBytes("UTF-8")); i += 1
          offs(i) = sb.size
        }
        BytesCol(offs, sb.toArray, null)
      }
      val txt = {
        val sb = new ByteSink(256)
        val offs = new Array[Int](n + 1)
        val nulls = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          if ((base + i) % 7 == 0) nulls(i) = true
          else sb.writeBytes(s"text-value-${base + i}".getBytes("UTF-8"))
          i += 1
          offs(i) = sb.size
        }
        BytesCol(offs, sb.toArray, nulls)
      }
      w.writeChunk(w.ensureStream("id"), LongsCol(ids, PhysType.I64, null))
      w.writeChunk(w.ensureStream("cat"), cat)
      w.writeChunk(w.ensureStream("txt"), txt)
      w.addRows(n)
      base += n
    }
    w.close()
    f.getAbsolutePath
  }

  test("directory matches an independent frame walk (incl. shared-dict alphabets)") {
    val dir = java.nio.file.Files.createTempDirectory("chunkdir").toFile.getAbsolutePath
    val path = writeFixture(dir, rows = 40000, rowsPerChunk = 4096)
    val r = new Tablet.Reader(path)
    try {
      // minimum-required stamping: a '#'-free fixture needs no v15 escape
      // semantics, so it stamps 14 (byte-identical to the r19 writer)
      assert(r.footer.version == 14)
      assert(r.footer.stripes.nonEmpty)
      for (s <- r.footer.stripes.indices; name <- Seq("id", "cat", "txt")) {
        val id = r.keyId(name)
        assert(id >= 0)
        val chunks = r.chunkDirOf(s, id)
        assert(chunks != null, s"stream $name stripe $s: directory missing")
        val frames = walkFrames(r.readStreamBytes(s, id))
        assert(chunks.length == frames.length,
          s"$name stripe $s: ${chunks.length} dir frames vs ${frames.length} walked")
        for ((cl, (off, fst, isData)) <- chunks.zip(frames)) {
          assert(cl.offset == off, s"$name stripe $s: offset ${cl.offset} != $off")
          assert(cl.isData == isData)
          if (isData && fst != null) assert(cl.rows == fst.valueCount,
            s"$name stripe $s: rows ${cl.rows} != ${fst.valueCount}")
          if (!isData) assert(cl.rows == 0L && cl.stats == null)
          // v14: directory stats equal the in-frame stats byte-for-byte
          // (the writer lifts the SAME Stats into the directory)
          if (isData && fst != null) {
            assert(cl.stats != null, s"$name stripe $s: v14 directory stats missing")
            assert(cl.stats.valueCount == fst.valueCount &&
              cl.stats.nullCount == fst.nullCount &&
              cl.stats.hasMinMax == fst.hasMinMax &&
              cl.stats.kind == fst.kind && cl.stats.hasNaN == fst.hasNaN)
            if (fst.hasMinMax) {
              assert(cl.stats.minLong == fst.minLong && cl.stats.maxLong == fst.maxLong)
              assert(cl.stats.minDouble == fst.minDouble && cl.stats.maxDouble == fst.maxDouble)
              assert((cl.stats.minBytes == null) == (fst.minBytes == null))
              if (fst.minBytes != null)
                assert(java.util.Arrays.equals(cl.stats.minBytes, fst.minBytes) &&
                  java.util.Arrays.equals(cl.stats.maxBytes, fst.maxBytes))
            }
          }
        }
        // data-frame rows must cover the stripe's row count exactly
        val dataRows = chunks.filter(_.isData).map(_.rows).sum
        assert(dataRows == r.footer.stripes(s).rowCount,
          s"$name stripe $s: $dataRows dir rows != stripe ${r.footer.stripes(s).rowCount}")
        // `cat` must actually exercise the alphabet-frame arm
        if (name == "cat") assert(chunks.exists(!_.isData),
          s"cat stripe $s: expected a shared-dict alphabet frame")
      }
    } finally r.close()
  }

  test("many-frame streams keep offsets/rows but cap out the v14 stats block") {
    val dir = java.nio.file.Files.createTempDirectory("chunkdircap").toFile.getAbsolutePath
    // 313 data frames in one stripe: over MaxDirStatsFrames, under MaxDirFrames
    val path = writeFixture(dir, rows = 20000, rowsPerChunk = 64)
    val r = new Tablet.Reader(path)
    try {
      for (name <- Seq("id", "cat", "txt")) {
        val chunks = r.chunkDirOf(0, r.keyId(name))
        assert(chunks != null, s"$name: offsets/rows directory must survive the cap")
        assert(chunks.count(_.isData) > Tablet.MaxDirStatsFrames)
        assert(chunks.forall(_.stats == null), s"$name: stats block should cap out")
        assert(chunks.filter(_.isData).forall(_.rows > 0))
      }
    } finally r.close()
  }

  test("pre-v13 files answer null (golden v7 fixture)") {
    val url = getClass.getResource("/golden/golden_v7.gft")
    assert(url != null, "missing golden v7 fixture")
    val r = new Tablet.Reader(new java.io.File(url.toURI).getAbsolutePath)
    try {
      assert(r.footer.version < 13)
      val id = r.keyId("id")
      assert(id >= 0)
      assert(r.chunkDirOf(0, id) == null)
    } finally r.close()
  }
}
