package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** The zero-copy encoding view ([[Codecs.viewTree]], reference:
  * dwio/nimble/encodings/views/EncodingView.h) must report EXACTLY the tree
  * the decoder traverses — this is the drift guard that lets the tools use
  * the header-only walker without a second-parser divergence risk — and it
  * must do so without materializing a single block. */
class ViewDriftSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(31)
  private val N = 8192

  private def treeStr(n: Codecs.ViewNode): String =
    s"${n.id}/${n.phys}/${n.rows}(${n.children.map(treeStr).mkString(",")})"

  private def check(col: Column): Unit = {
    val sink = new ByteSink()
    Codecs.encodeColumn(col, sink)
    val (_, decoded) = Codecs.withView { Codecs.decodeColumn(new ByteCursor(sink.toArray)) }
    val before = Codecs.decodedBlocks.get()
    val viewed = Codecs.viewTree(new ByteCursor(sink.toArray))
    assert(Codecs.decodedBlocks.get() == before,
      s"viewTree decoded ${Codecs.decodedBlocks.get() - before} blocks")
    assert(decoded.size == 1)
    assert(treeStr(viewed) == treeStr(decoded.head),
      s"view drift:\n  zero-copy ${treeStr(viewed)}\n  decoder   ${treeStr(decoded.head)}")
  }

  private def longs(a: Array[Long], phys: Byte = PhysType.I64) = LongsCol(a, phys)

  test("zero-copy view == decoder-recorded view across the codec grid") {
    // the bench pattern families plus the shapes that pick each codec
    check(longs(Array.fill(N)(rnd.nextLong())))                       // trivial
    check(longs(Array.fill(N)(rnd.nextInt(200).toLong)))              // narrow
    check(longs(Array.fill(N)(42L)))                                  // const
    check(longs(Array.tabulate(N)(i => if (rnd.nextInt(100) < 95) 7L else rnd.nextLong()))) // mainly-const
    check(longs({ val a = new Array[Long](N); var i = 0
      while (i < N) { val v = rnd.nextInt(50).toLong
        val run = math.min(10 + rnd.nextInt(50), N - i)
        java.util.Arrays.fill(a, i, i + run, v); i += run }; a }))    // rle
    check(longs({ var v = 0L; Array.fill(N) { v += rnd.nextInt(8); v } })) // delta-family
    check(longs({ val a = Array.fill(64)(rnd.nextLong()); Array.fill(N)(a(rnd.nextInt(64))) })) // dict
    check(longs(Array.fill(N) { val r = rnd.nextDouble()
      (if (r < 0.5) 0 else if (r < 0.75) 1 else if (r < 0.875) 2 else rnd.nextInt(64)).toLong * 1000 })) // huffman
    check(longs(Array.tabulate(N)(i =>
      if (rnd.nextInt(50) == 0) rnd.nextLong() else rnd.nextInt(1024).toLong))) // pfor/freqpart
    check(longs({ val a = Array.fill(N)(rnd.nextLong() >>> 8); java.util.Arrays.sort(a); a })) // deltablock
    check(longs(Array.tabulate(N)(i => (i / 512).toLong * 1000000L + rnd.nextInt(100)), PhysType.I64)) // blockbp/subint

    // nullable wrappers at several densities + sentinel shapes
    for (p <- Seq(10, 50, 90)) {
      val nulls = Array.fill(N)(rnd.nextInt(100) < p)
      check(LongsCol(Array.fill(N)(rnd.nextInt(1000).toLong), PhysType.I64, nulls))
    }

    // doubles: trivial, ALP (clean + exceptions + factored), dict
    check(DoublesCol(Array.fill(N)(rnd.nextDouble() * 1e6), isFloat = false))
    check(DoublesCol(Array.fill(N)(rnd.nextInt(100000) / 100.0), isFloat = false))
    check(DoublesCol(Array.tabulate(N)(i =>
      if (i % 25 == 3) rnd.nextDouble() else rnd.nextInt(100000) / 100.0), isFloat = false))
    check(DoublesCol(Array.tabulate(N)(i => (i % 500) * 1000.0), isFloat = false))
    check(DoublesCol({ val a = Array.fill(16)(rnd.nextDouble()); Array.fill(N)(a(rnd.nextInt(16))) }, isFloat = false))
    check(DoublesCol(Array.fill(N)((rnd.nextInt(10000) / 100.0f).toDouble), isFloat = true))

    // bools: balanced, sparse, all-false
    check(BoolsCol(Array.fill(N)(rnd.nextBoolean())))
    check(BoolsCol(Array.tabulate(N)(i => i % 37 == 0)))
    check(BoolsCol(new Array[Boolean](N)))

    // strings: random, low-card (dict), sorted shared-prefix, fsst-ish, empty
    def strCol(vs: Seq[String]): BytesCol = {
      val sink = new ByteSink(); val offs = new Array[Int](vs.length + 1)
      vs.zipWithIndex.foreach { case (v, i) =>
        sink.writeBytes(v.getBytes("UTF-8")); offs(i + 1) = sink.size }
      BytesCol(offs, sink.toArray)
    }
    check(strCol(Seq.fill(N / 8)(rnd.nextString(12))))
    check(strCol(Seq.fill(N / 8)(s"tag_${rnd.nextInt(9)}")))
    check(strCol(Seq.tabulate(N / 8)(i => f"user_prefix_$i%07d").sorted))
    check(strCol(Seq.fill(N / 8)(s"https://example.com/${rnd.nextInt(1000)}/page?q=${rnd.nextInt(50)}")))
    check(strCol(Seq.empty))
  }

  test("viewNext walks real tablet chunks without decoding") {
    val dir = java.nio.file.Files.createTempDirectory("viewdrift").toFile
    dir.deleteOnExit()
    val path = s"${dir.getPath}/t.gft"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val w = new Tablet.Writer(path, schema.json, Array("i", "s"), compression = "zstd")
    val vs = Seq.tabulate(4000)(i => s"tag_${i % 7}")
    val offs = new Array[Int](vs.length + 1)
    val bs = new ByteSink()
    vs.zipWithIndex.foreach { case (v, i) => bs.writeBytes(v.getBytes("UTF-8")); offs(i + 1) = bs.size }
    w.writeChunk(0, LongsCol(Array.tabulate(4000)(_.toLong * 3), PhysType.I64))
    w.writeChunk(1, BytesCol(offs, bs.toArray))
    w.addRows(4000L)
    w.close()
    val r = new Tablet.Reader(path)
    try {
      for (i <- r.footer.streamKeys.indices) {
        val decodeCur = new Tablet.ChunkCursor(r.readStreamBytes(0, i))
        val (_, decoded) = Codecs.withView {
          while (decodeCur.hasNext) decodeCur.next()
        }
        val before = Codecs.decodedBlocks.get()
        val viewCur = new Tablet.ChunkCursor(r.readStreamBytes(0, i))
        val viewed = scala.collection.mutable.ArrayBuffer[Codecs.ViewNode]()
        while (viewCur.hasNext) viewed += viewCur.viewNext()
        assert(Codecs.decodedBlocks.get() == before, "viewNext must not decode")
        assert(viewed.map(treeStr) == decoded.map(treeStr))
      }
    } finally r.close()
  }
}
