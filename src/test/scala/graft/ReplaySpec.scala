package graft

import graft.format._
import org.scalatest.funsuite.AnyFunSuite

/** Encoding-layout replay (reference: dwio/nimble/writer/EncodingLayoutTree.h:25,
  * VeloxWriterOptions.h:195): streams whose top-level codec selection is
  * stable lock the layout and skip candidate selection on later chunks;
  * selection re-opens every 8th chunk so distribution shifts re-train. */
class ReplaySpec extends AnyFunSuite {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("replay").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name.gft"
  }

  private val schemaJson =
    org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("c",
      org.apache.spark.sql.types.StringType))).json

  private def bytesCol(values: Seq[String]): BytesCol = {
    val offs = new Array[Int](values.length + 1)
    val sink = new ByteSink()
    values.zipWithIndex.foreach { case (v, i) =>
      sink.writeBytes(v.getBytes("UTF-8")); offs(i + 1) = sink.size
    }
    BytesCol(offs, sink.toArray)
  }

  test("stable string stream locks its layout; round-trip intact") {
    val rnd = new scala.util.Random(7)
    // high-distinct repeated-substring strings -> FSST wins every chunk
    def chunk(k: Int): BytesCol = bytesCol((0 until 500).map(i =>
      s"replayed_layout_payload_${k}_${i}_the_quick_brown_fox_${rnd.nextInt(1 << 20)}"))
    val chunks = (0 until 20).map(chunk)
    val before = (Codecs.selectionsRun.sum(), Codecs.replayHits.sum())
    val path = tmp("stable")
    val w = new Tablet.Writer(path, schemaJson, Array("c"), compression = "none")
    chunks.foreach { c => w.writeChunk(0, c); w.addRows(c.len.toLong) }
    w.close()
    val hits = Codecs.replayHits.sum() - before._2
    // 20 chunks: selection on chunks 0-2 (streak builds), 8, 16 (reopen) ->
    // at least half the chunks must have replayed the locked layout
    assert(hits >= 10, s"expected >=10 replay hits over 20 stable chunks, got $hits")
    // every chunk round-trips through the locked layout
    val r = new Tablet.Reader(path)
    try {
      val cur = new Tablet.ChunkCursor(r.readStreamBytes(0, 0))
      var k = 0
      while (cur.hasNext) {
        val col = cur.next() match {
          case b: BytesCol => b
          case l: LazyFsstBytesCol => l.expand
          case d: DictBytesCol => d.expand
          case other => fail(s"unexpected $other")
        }
        assert(col.len == 500)
        assert(new String(col(0), "UTF-8").startsWith(s"replayed_layout_payload_${k}_0_"))
        k += 1
      }
      assert(k == 20)
    } finally r.close()
  }

  test("distribution shift re-trains the locked layout at the next reopen") {
    // chunks 0-9: sorted shared-prefix strings (PREFIX wins and locks);
    // chunks 10-19: random high-entropy strings (PREFIX gated out / loses)
    val rnd = new scala.util.Random(13)
    def prefixChunk(k: Int): BytesCol =
      bytesCol((0 until 500).map(i => f"shared_prefix_key_$k%03d_$i%06d"))
    def randomChunk(): BytesCol =
      bytesCol((0 until 500).map(_ => rnd.alphanumeric.take(8).mkString))
    val path = tmp("shift")
    val w = new Tablet.Writer(path, schemaJson, Array("c"), compression = "none")
    val chunks = (0 until 10).map(prefixChunk) ++ (0 until 10).map(_ => randomChunk())
    chunks.foreach { c => w.writeChunk(0, c); w.addRows(c.len.toLong) }
    w.close()
    val r = new Tablet.Reader(path)
    try {
      val cur = new Tablet.ChunkCursor(r.readStreamBytes(0, 0))
      val codecs = scala.collection.mutable.ArrayBuffer[Byte]()
      var rows = 0
      while (cur.hasNext) {
        codecs += cur.peekCodec()
        rows += (cur.next() match {
          case b: BytesCol => b.len
          case l: LazyFsstBytesCol => l.len
          case d: DictBytesCol => d.len
          case other => fail(s"unexpected $other")
        })
      }
      assert(rows == 20 * 500)
      // r15: chunks long enough to seek front-code as PREFIXR (restart
      // index); either front-coding id satisfies the lock contract
      assert(codecs.take(8).count(c => c == Codecs.PREFIX || c == Codecs.PREFIXR) >= 4,
        s"early chunks should front-code: $codecs")
      // after the shift + reopen, the lock must not pin front coding on
      // random data
      assert(codecs.last != Codecs.PREFIX && codecs.last != Codecs.PREFIXR,
        s"layout failed to re-train: $codecs")
    } finally r.close()
  }
}
