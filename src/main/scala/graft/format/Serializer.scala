package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-tagged row-batch serializer — byte blobs for message passing /
  * ingestion buses, re-encodable without a file context.
  *
  * Mirrors the reference's serializer (reference:
  * dwio/nimble/serializer/Serializer.h:33, serializer/Deserializer.h:49):
  * a blob = [schema JSON][row count][per-stream encoded chunks] using the
  * same cascading encodings as the file format, so a blob is effectively a
  * single free-floating stripe.
  */
object Serializer {

  def serialize(schema: StructType, rows: Iterator[InternalRow]): Array[Byte] = {
    val keys = Fields.streamKeys(schema)
    val keyIdx = keys.zipWithIndex.toMap
    val writers = schema.fields.map(f => Fields.writerFor(f.name, f.dataType, keyIdx(_)))
    var n = 0
    rows.foreach { r =>
      var i = 0
      while (i < writers.length) { writers(i).add(r, i); i += 1 }
      n += 1
    }
    val sink = new ByteSink(4096)
    sink.writeBlock(schema.json.getBytes("UTF-8"))
    sink.writeVarint(n.toLong)
    // collect each stream's single chunk through a throwaway tablet shim
    val chunks = new Array[Array[Byte]](keys.length)
    val shim = new ChunkCollector(chunks)
    writers.foreach(_.flushChunk(shim))
    for (c <- chunks) sink.writeBlock(if (c == null) Array.emptyByteArray else c)
    sink.toArray
  }

  def deserialize(blob: Array[Byte]): (StructType, Seq[InternalRow]) = {
    val cur = new ByteCursor(blob)
    val sj = cur.readBlock()
    val schema = DataType.fromJson(new String(sj.readBytes(sj.remaining), "UTF-8")).asInstanceOf[StructType]
    val n = cur.readVarint().toInt
    val keys = Fields.streamKeys(schema)
    val streams = keys.map { k =>
      val b = cur.readBlock()
      k -> new Tablet.ChunkCursor(b.readBytes(b.remaining))
    }.toMap
    val readers = schema.fields.map(f => Fields.readerFor(f.name, f.dataType, streams(_), keys.toSet))
    val vecs = schema.fields.map(f =>
      new org.apache.spark.sql.execution.vectorized.OnHeapColumnVector(math.max(n, 1), f.dataType))
    readers.zip(vecs).foreach { case (r, v) => r.readChunk(v, null) }
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], n)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n)
    val it = batch.rowIterator()
    while (it.hasNext) out += it.next().copy()
    batch.close()
    (schema, out.toSeq)
  }

  /** Project a subset of top-level columns out of a serialized blob without
    * decoding the others — the Serializer Projector analog (reference:
    * dwio/nimble/serializer/Projector.h). Stream blocks are length-prefixed,
    * so unprojected streams are skipped byte-wise. */
  def deserializeProjected(blob: Array[Byte], columns: Set[String]): (StructType, Seq[InternalRow]) = {
    val cur = new ByteCursor(blob)
    val sj = cur.readBlock()
    val full = DataType.fromJson(new String(sj.readBytes(sj.remaining), "UTF-8")).asInstanceOf[StructType]
    val n = cur.readVarint().toInt
    val keys = Fields.streamKeys(full)
    val wanted = StructType(full.fields.filter(f => columns(f.name)))
    val wantedKeys = Fields.streamKeys(wanted).toSet
    val streams = keys.flatMap { k =>
      val b = cur.readBlock()
      if (wantedKeys(k)) Some(k -> new Tablet.ChunkCursor(b.readBytes(b.remaining))) else None
    }.toMap
    val readers = wanted.fields.map(f => Fields.readerFor(f.name, f.dataType, streams(_), wantedKeys))
    val vecs = wanted.fields.map(f =>
      new org.apache.spark.sql.execution.vectorized.OnHeapColumnVector(math.max(n, 1), f.dataType))
    readers.zip(vecs).foreach { case (r, v) => r.readChunk(v, null) }
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], n)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n)
    val it = batch.rowIterator()
    while (it.hasNext) out += it.next().copy()
    batch.close()
    (wanted, out.toSeq)
  }

  /** ChunkSink that just captures encoded chunks per stream. */
  private final class ChunkCollector(chunks: Array[Array[Byte]]) extends Tablet.ChunkSink {
    def writeChunk(id: Int, col: Column): Unit = {
      val enc = new ByteSink(1024)
      Codecs.encodeColumn(col, enc)
      val raw = enc.toArray
      val (kind, data) = Tablet.compressChunk(raw)
      val b = new ByteSink(data.length + 16)
      b.writeInt(data.length)
      b.writeVarint(raw.length.toLong)
      b.writeByte(kind)
      b.writeByte(0) // no chunk stats in serializer blobs
      b.writeBytes(data)
      chunks(id) = b.toArray
    }
  }
}
