package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Schema-tagged row-batch serializer — byte blobs for message passing /
  * ingestion buses, re-encodable without a file context.
  *
  * Mirrors the reference's serializer (reference:
  * dwio/nimble/serializer/Serializer.h:33, serializer/Deserializer.h:49):
  * a blob = [version][schema JSON][row count][stream directory: name +
  * encoded chunk per stream] using the same cascading encodings as the file
  * format, so a blob is effectively a single free-floating stripe.
  *
  * The embedded stream-name table (v2) makes the blob layout-complete: maps
  * written as FlatMap (dynamic per-feature streams, reference:
  * serializer/Serializer.h:33 serializes FlatMap vectors), dictionary
  * arrays and dedup maps all round-trip, because the reader discovers
  * streams from the directory instead of deriving them from the schema. */
object Serializer {

  private final val Version = 2L

  def serialize(schema: StructType, rows: Iterator[InternalRow],
      opts: Fields.WriteOptions = Fields.WriteOptions()): Array[Byte] = {
    // dynamic stream registry: writers resolve their static streams at
    // construction; flatmap feature streams appear during the row loop
    // (same contract as the file writer's ensureStream)
    val names = scala.collection.mutable.ArrayBuffer[String]()
    val idx = scala.collection.mutable.HashMap[String, Int]()
    def ensure(k: String): Int = idx.getOrElseUpdate(k, { names += k; names.size - 1 })
    val writers = schema.fields.map(f => Fields.writerFor(f.name, f.dataType, ensure, opts))
    var n = 0
    rows.foreach { r =>
      var i = 0
      while (i < writers.length) { writers(i).add(r, i); i += 1 }
      n += 1
    }
    val sink = new ByteSink(4096)
    sink.writeVarint(Version)
    sink.writeBlock(schema.json.getBytes("UTF-8"))
    sink.writeVarint(n.toLong)
    // collect each stream's single chunk through a throwaway tablet shim
    // (growable: a writer may still register a stream at flush time)
    val shim = new ChunkCollector
    writers.foreach(_.flushChunk(shim))
    sink.writeVarint(names.length.toLong)
    var i = 0
    while (i < names.length) {
      sink.writeBlock(names(i).getBytes("UTF-8"))
      sink.writeBlock(shim.chunks.getOrElse(i, Array.emptyByteArray))
      i += 1
    }
    sink.toArray
  }

  /** (schema, rowCount, stream name -> chunk bytes). A v1 blob (no version
    * tag: it opens directly with the schema-JSON block) is detected by the
    * first varint — a valid schema JSON is always far longer than the
    * version number — and decoded with schema-derived stream keys, so blobs
    * from pre-directory producers still read during a mixed-version
    * rollout. */
  private def readHeader(cur: ByteCursor): (StructType, Int, Array[(String, Array[Byte])]) = {
    val v = cur.readVarint()
    if (v == Version) {
      val sj = cur.readBlock()
      val schema = DataType.fromJson(new String(sj.readBytes(sj.remaining), "UTF-8")).asInstanceOf[StructType]
      val n = cur.readVarint().toInt
      val count = cur.readVarint().toInt
      val streams = new Array[(String, Array[Byte])](count)
      var i = 0
      while (i < count) {
        val nb = cur.readBlock()
        val name = new String(nb.readBytes(nb.remaining), "UTF-8")
        val cb = cur.readBlock()
        streams(i) = name -> cb.readBytes(cb.remaining)
        i += 1
      }
      (schema, n, streams)
    } else {
      // v1: `v` is the schema block's byte length; streams follow in
      // streamKeys(schema) order with no name table. A valid schema JSON is
      // always tens of bytes, so small varints (future versions 3..16) are
      // rejected as versions rather than misparsed as schema lengths.
      require(v > 16 && v <= cur.remaining,
        s"nimble-serializer: unsupported blob version $v")
      val schema = DataType.fromJson(new String(cur.readBytes(v.toInt), "UTF-8")).asInstanceOf[StructType]
      val n = cur.readVarint().toInt
      val streams = Fields.streamKeys(schema).map { k =>
        val b = cur.readBlock()
        k -> b.readBytes(b.remaining)
      }
      (schema, n, streams)
    }
  }

  private def materialize(wanted: StructType, n: Int,
      cursors: Map[String, Tablet.ChunkCursor], probe: Fields.KeyProbe): Seq[InternalRow] = {
    val readers = wanted.fields.map(f => Fields.readerFor(f.name, f.dataType, cursors(_), probe))
    val vecs = wanted.fields.map(f =>
      new org.apache.spark.sql.execution.vectorized.OnHeapColumnVector(math.max(n, 1), f.dataType))
    readers.zip(vecs).foreach { case (r, v) => r.readChunk(v, null) }
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], n)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n)
    val it = batch.rowIterator()
    while (it.hasNext) out += it.next().copy()
    batch.close()
    out.toSeq
  }

  def deserialize(blob: Array[Byte]): (StructType, Seq[InternalRow]) = {
    val (schema, n, streams) = readHeader(new ByteCursor(blob))
    val probe = Fields.KeyProbe.ofSet(streams.iterator.map(_._1).toSet)
    val cursors = streams.iterator.map { case (k, b) => k -> new Tablet.ChunkCursor(b) }.toMap
    (schema, materialize(schema, n, cursors, probe))
  }

  /** Project a subset of top-level columns out of a serialized blob without
    * decoding the others — the Serializer Projector analog (reference:
    * dwio/nimble/serializer/Projector.h). Stream blocks are length-prefixed
    * and named, so unprojected streams are skipped byte-wise (flatmap
    * feature streams included). */
  def deserializeProjected(blob: Array[Byte], columns: Set[String]): (StructType, Seq[InternalRow]) = {
    val (full, n, streams) = readHeader(new ByteCursor(blob))
    val wanted = StructType(full.fields.filter(f => columns(f.name)))
    val probe = Fields.KeyProbe.ofSet(streams.iterator.map(_._1).toSet)
    val needed = wanted.fields.flatMap(f => Fields.neededKeys(f.name, f.dataType, probe)).toSet
    val cursors = streams.iterator.collect {
      case (k, b) if needed(k) => k -> new Tablet.ChunkCursor(b)
    }.toMap
    (wanted, materialize(wanted, n, cursors, probe))
  }

  /** ChunkSink that just captures encoded chunks per stream. */
  private final class ChunkCollector extends Tablet.ChunkSink {
    val chunks = scala.collection.mutable.HashMap[Int, Array[Byte]]()
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
