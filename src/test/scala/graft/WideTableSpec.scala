package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The reference's raison d'être: very wide ML tables — "thousands of
  * columns or streams" (reference: README.md:18-20). A 1000-column table
  * must round-trip, and projecting 3 columns must fetch only 3 streams. */
class WideTableSpec extends SparkTestBase {

  test("1000-column table: round-trip + narrow projection") {
    val nCols = 1000
    val nRows = 5000
    val schema = StructType((0 until nCols).map { i =>
      StructField(s"c$i", i % 4 match {
        case 0 => LongType
        case 1 => DoubleType
        case 2 => StringType
        case _ => IntegerType
      })
    })
    val rdd = spark.sparkContext.parallelize(0 until nRows, 4).map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        i % 4 match {
          case 0 => (r.toLong * 31 + i)
          case 1 => r * 0.5 + i
          case 2 => s"v${(r + i) % 50}"
          case _ => (r + i) % 1000
        }
      })
    }
    val df = spark.createDataFrame(rdd, schema)
    val dir = tmpDir("wide")
    df.write.format("nimble").mode("overwrite").save(dir)

    val nb = spark.read.format("nimble").load(dir)
    assert(nb.count() == nRows)
    // narrow projection: correctness + only the 3 streams are in the plan
    val proj = nb.select("c0", "c501", "c998")
    val expected = df.select("c0", "c501", "c998").collect().map(_.toString).sorted
    val got = proj.collect().map(_.toString).sorted
    assert(got.sameElements(expected))
    val scanLine = proj.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("read=")).getOrElse("")
    assert(scanLine.contains("c0:bigint") && !scanLine.contains("c1:"), scanLine)
    // footer holds 1000 streams; metadata stays cheap to read
    val files = graft.spark.NimbleSource.listFiles(dir)
    val footer = graft.spark.NimbleSource.footerOf(files.head)
    assert(footer.streamKeys.length == nCols)
    // aggregate over one column answered from stats (no data read)
    val agg = nb.agg(min("c0"), max("c0"), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = agg.collect()(0)
    assert(r.getLong(2) == nRows)
  }

  test("10K-stream directory: metadata reads scale with projection, not width") {
    import graft.format._
    val nCols = 10000
    val keys = Array.tabulate(nCols)(i => s"c$i")
    val schemaJson = StructType(keys.map(k => StructField(k, LongType))).json
    val d = java.nio.file.Files.createTempDirectory("wide10k").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/t.gft"
    val w = new Tablet.Writer(path, schemaJson, keys)
    for (_ <- 0 until 3) { // 3 stripes in one directory group
      var id = 0
      while (id < nCols) { w.writeChunk(id, LongsCol(Array(1L, 2L, 3L), PhysType.I64)); id += 1 }
      w.addRows(3)
      w.flushStripe()
    }
    w.close()
    // fresh Reader per probe: each parses its own footer, so dirCaches are
    // independent and metaBytesRead measures cold-fetch cost
    def dirBytes(streams: Int): Long = {
      val r = new Tablet.Reader(path)
      try {
        var id = 0
        while (id < streams) {
          var g = 0
          while (g < r.footer.groups.length) { r.dirEntries(g, id); g += 1 }
          id += 1
        }
        r.dirBytesRead
      } finally r.close()
    }
    val b3 = dirBytes(3)
    val bAll = dirBytes(nCols)
    // the reference's wide-table property (Footer.fbs:38 stripe groups):
    // stream-directory bytes read scale with the projection, never the width
    assert(b3 < bAll / 100, s"3-stream dir read $b3 B vs full $bAll B — not proportional")
    // and the data itself is intact through the grouped directory
    val r2 = new Tablet.Reader(path)
    try {
      assert(r2.footer.rowCount == 9L)
      val cur = new Tablet.ChunkCursor(r2.readStreamBytes(2, 9999))
      assert(cur.next().asInstanceOf[LongsCol].values.toSeq == Seq(1L, 2L, 3L))
    } finally r2.close()

    // the DATA-read path must never fault in the sectioned name table: a
    // narrow read leaves the full meta unloaded (regression: dirEntries
    // once called streamKeys.length, loading all 10K names + stats)
    val r4 = new Tablet.Reader(path)
    try {
      assert(r4.keyId("c42") == 42)
      val cur4 = new Tablet.ChunkCursor(r4.readStreamBytes(1, 42))
      assert(cur4.next().asInstanceOf[LongsCol].values.toSeq == Seq(1L, 2L, 3L))
      assert(r4.footer.loadedStreamKeys == null,
        "narrow data read faulted in the whole wide-table meta section")
    } finally r4.close()

    // v8 wide meta: the name table + file stats live in a bucketized
    // section, the footer core carries none of it, and a name probe reads
    // ONE bucket — O(streams/256) bytes, so metadata I/O scales with the
    // probed projection (including the name table), never the width
    val r3 = new Tablet.Reader(path)
    try {
      assert(r3.footer.inlineKeys == null, "10K streams must section the meta")
      assert(r3.footer.nStreams == nCols)
      val metaLen = r3.footer.metaLoc.length
      assert(metaLen > 0)
      val before = r3.metaBytesRead
      assert(r3.keyId("c9999") == 9999)
      assert(r3.keyId("c0") == 0)
      assert(r3.keyId("no_such_stream") == -1)
      val probeBytes = r3.metaBytesRead - before
      assert(probeBytes < metaLen / 20,
        s"3 probes read $probeBytes B of a $metaLen B name table — not bucketized")
      // file stats ride in the same bucket entry
      assert(r3.fileStatsOf("c9999").exists(s => s.valueCount == 9 && s.minLong == 1 && s.maxLong == 3))
      // negative probes are cached, not re-read
      val afterMiss = r3.metaBytesRead
      assert(r3.keyId("no_such_stream") == -1)
      assert(r3.metaBytesRead == afterMiss)
      // the full table is still loadable for tools (lazy, cached)
      assert(r3.footer.streamKeys.length == nCols)
      assert(r3.footer.streamKeys(1234) == "c1234")
      assert(r3.footer.fileStats(7777).valueCount == 9)
    } finally r3.close()
  }

  test("wide v8 table: Spark scan + projection + agg pushdown work end-to-end") {
    // above the 1024-stream threshold so the connector path exercises the
    // sectioned meta: probes resolve projected streams, stats aggregate
    // answers from bucket entries, full scan round-trips
    val nCols = 1200
    val schema = StructType((0 until nCols).map(i => StructField(s"w$i", LongType)))
    val rdd = spark.sparkContext.parallelize(0 until 2000, 2).map { r =>
      Row.fromSeq((0 until nCols).map(i => r.toLong + i))
    }
    val df = spark.createDataFrame(rdd, schema)
    val dir = tmpDir("wide_v8")
    df.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    assert(nb.count() == 2000L)
    val got = nb.select("w0", "w1199").filter(col("w0") >= 1000L).collect()
    assert(got.length == 1000 && got.forall(r => r.getLong(1) - r.getLong(0) == 1199L))
    val agg = nb.agg(min("w7"), max("w7"), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(agg.collect()(0).toSeq == Seq(7L, 2006L, 2000L))
  }
}
