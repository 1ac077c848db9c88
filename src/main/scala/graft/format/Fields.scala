package graft.format

import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Schema -> stream tree mapping and the field writer/reader trees.
  *
  * Mirrors the reference's FieldWriter/FieldReader structure (reference:
  * dwio/nimble/velox/FieldWriter.cpp:605,869,909 — Row nulls stream, Array
  * lengths stream, Map lengths + key/value streams;
  * dwio/nimble/velox/SchemaReader.h:258 tree rebuild) re-expressed for Spark
  * `StructType` / `InternalRow` / `WritableColumnVector`.
  *
  * Stream keys (pre-order, deterministic):
  *   scalar field        ->  "<path>"
  *   struct              ->  "<path>#nulls" + children "<path>.<name>"
  *   array               ->  "<path>#len" + element "<path>#elem"
  *   map                 ->  "<path>#len" + "<path>#key..." + "<path>#val..."
  */
object Fields {

  def physFor(dt: DataType): Byte = dt match {
    case BooleanType => PhysType.Bool
    case ByteType => PhysType.I8
    case ShortType => PhysType.I16
    case IntegerType | DateType => PhysType.I32
    case LongType | TimestampType | TimestampNTZType => PhysType.I64
    case d: DecimalType if d.precision <= 18 => PhysType.I64
    case FloatType => PhysType.F32
    case DoubleType => PhysType.F64
    case StringType | BinaryType => PhysType.Bytes
    case other => throw new UnsupportedOperationException(s"nimble-spark: unsupported type $other")
  }

  /** All stream keys for a schema, in deterministic pre-order. */
  def streamKeys(schema: StructType): Array[String] = {
    val keys = mutable.ArrayBuffer[String]()
    def walk(path: String, dt: DataType): Unit = dt match {
      case s: StructType =>
        keys += s"$path#nulls"
        s.fields.foreach(f => walk(s"$path.${f.name}", f.dataType))
      case a: ArrayType =>
        keys += s"$path#len"
        walk(s"$path#elem", a.elementType)
      case m: MapType =>
        keys += s"$path#len"
        walk(s"$path#key", m.keyType)
        walk(s"$path#val", m.valueType)
      case _ => keys += path
    }
    schema.fields.foreach(f => walk(f.name, f.dataType))
    keys.toArray
  }

  // ------------------------------------------------------------ builders

  private final class LongBuf {
    var a = new Array[Long](1024); var n = 0
    def add(v: Long): Unit = { if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2); a(n) = v; n += 1 }
    def result(): Array[Long] = java.util.Arrays.copyOf(a, n)
    def clear(): Unit = n = 0
  }
  private final class DoubleBuf {
    var a = new Array[Double](1024); var n = 0
    def add(v: Double): Unit = { if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2); a(n) = v; n += 1 }
    def result(): Array[Double] = java.util.Arrays.copyOf(a, n)
    def clear(): Unit = n = 0
  }
  private final class BoolBuf {
    var a = new Array[Boolean](1024); var n = 0
    var anyTrue = false
    def add(v: Boolean): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2); a(n) = v; if (v) anyTrue = true; n += 1
    }
    def result(): Array[Boolean] = java.util.Arrays.copyOf(a, n)
    def resultOrNull: Array[Boolean] = if (anyTrue) result() else null
    def clear(): Unit = { n = 0; anyTrue = false }
  }
  private final class BytesBuf {
    var bytes = new Array[Byte](4096); var used = 0
    var offs = new Array[Int](1025); var n = 0
    def add(v: Array[Byte], off: Int, len: Int): Unit = {
      while (used + len > bytes.length) bytes = java.util.Arrays.copyOf(bytes, bytes.length * 2)
      System.arraycopy(v, off, bytes, used, len)
      used += len
      if (n + 1 == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      n += 1
      offs(n) = used
    }
    def addEmpty(): Unit = {
      if (n + 1 == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      n += 1; offs(n) = used
    }
    def result(): BytesCol = BytesCol(java.util.Arrays.copyOf(offs, n + 1), java.util.Arrays.copyOf(bytes, used))
    def clear(): Unit = { used = 0; n = 0 }
  }

  /** Writer node: buffers values for one subtree, flushes chunks to a tablet. */
  sealed abstract class FieldWriter(val dt: DataType) {
    /** Append the value at `ordinal` of `g` (g may be a row or array view). */
    def add(g: SpecializedGetters, ordinal: Int): Unit
    def addNull(): Unit
    def flushChunk(t: Tablet.ChunkSink): Unit
    def rawSize: Long
  }

  def writerFor(path: String, dt: DataType, streamIds: String => Int): FieldWriter = dt match {
    case s: StructType => new StructW(path, s, streamIds)
    case a: ArrayType => new ArrayW(path, a, streamIds)
    case m: MapType => new MapW(path, m, streamIds)
    case _ => new PrimW(path, dt, streamIds)
  }

  private final class PrimW(path: String, dt0: DataType, streamIds: String => Int) extends FieldWriter(dt0) {
    private val id = streamIds(path)
    private val phys = physFor(dt0)
    private val nulls = new BoolBuf
    private val longs = if (phys != PhysType.F32 && phys != PhysType.F64 && phys != PhysType.Bool && phys != PhysType.Bytes) new LongBuf else null
    private val doubles = if (phys == PhysType.F32 || phys == PhysType.F64) new DoubleBuf else null
    private val bools = if (phys == PhysType.Bool) new BoolBuf else null
    private val bytesB = if (phys == PhysType.Bytes) new BytesBuf else null
    private var raw = 0L
    private val dec = dt0 match { case d: DecimalType => d; case _ => null }

    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      nulls.add(false)
      dt0 match {
        case BooleanType => bools.add(g.getBoolean(ordinal)); raw += 1
        case ByteType => longs.add(g.getByte(ordinal).toLong); raw += 1
        case ShortType => longs.add(g.getShort(ordinal).toLong); raw += 2
        case IntegerType | DateType => longs.add(g.getInt(ordinal).toLong); raw += 4
        case LongType | TimestampType | TimestampNTZType => longs.add(g.getLong(ordinal)); raw += 8
        case _: DecimalType => longs.add(g.getDecimal(ordinal, dec.precision, dec.scale).toUnscaledLong); raw += 8
        case FloatType => doubles.add(g.getFloat(ordinal).toDouble); raw += 4
        case DoubleType => doubles.add(g.getDouble(ordinal)); raw += 8
        case StringType =>
          val s = g.getUTF8String(ordinal)
          val b = s.getBytes
          bytesB.add(b, 0, b.length); raw += b.length + 4
        case BinaryType =>
          val b = g.getBinary(ordinal)
          bytesB.add(b, 0, b.length); raw += b.length + 4
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }
    def addNull(): Unit = {
      nulls.add(true); raw += 1
      if (longs != null) longs.add(0L)
      else if (doubles != null) doubles.add(0d)
      else if (bools != null) bools.add(false)
      else bytesB.addEmpty()
    }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      val nl = nulls.resultOrNull
      val col: Column =
        if (longs != null) LongsCol(longs.result(), phys, nl)
        else if (doubles != null) DoublesCol(doubles.result(), phys == PhysType.F32, nl)
        else if (bools != null) BoolsCol(bools.result(), nl)
        else { val b = bytesB.result(); b.copy(nulls = nl) }
      t.writeChunk(id, col)
      nulls.clear()
      if (longs != null) longs.clear()
      if (doubles != null) doubles.clear()
      if (bools != null) bools.clear()
      if (bytesB != null) bytesB.clear()
      raw = 0L
    }
    def rawSize: Long = raw
  }

  private final class StructW(path: String, s: StructType, streamIds: String => Int) extends FieldWriter(s) {
    private val nullsId = streamIds(s"$path#nulls")
    private val children = s.fields.map(f => writerFor(s"$path.${f.name}", f.dataType, streamIds))
    private val nulls = new BoolBuf
    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      nulls.add(false)
      val row = g.getStruct(ordinal, s.fields.length)
      var i = 0
      while (i < children.length) { children(i).add(row, i); i += 1 }
    }
    def addNull(): Unit = {
      nulls.add(true)
      var i = 0
      while (i < children.length) { children(i).addNull(); i += 1 }
    }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(nullsId, BoolsCol(nulls.result()))
      nulls.clear()
      children.foreach(_.flushChunk(t))
    }
    def rawSize: Long = children.map(_.rawSize).sum + nulls.n
  }

  private final class ArrayW(path: String, a: ArrayType, streamIds: String => Int) extends FieldWriter(a) {
    private val lenId = streamIds(s"$path#len")
    private val elem = writerFor(s"$path#elem", a.elementType, streamIds)
    private val lens = new LongBuf
    private val lenNulls = new BoolBuf
    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      lenNulls.add(false)
      val arr = g.getArray(ordinal)
      lens.add(arr.numElements().toLong)
      var i = 0
      while (i < arr.numElements()) { elem.add(arr, i); i += 1 }
    }
    def addNull(): Unit = { lenNulls.add(true); lens.add(0L) }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(lenId, LongsCol(lens.result(), PhysType.I32, lenNulls.resultOrNull))
      lens.clear(); lenNulls.clear()
      elem.flushChunk(t)
    }
    def rawSize: Long = elem.rawSize + lens.n * 4
  }

  private final class MapW(path: String, m: MapType, streamIds: String => Int) extends FieldWriter(m) {
    private val lenId = streamIds(s"$path#len")
    private val keyW = writerFor(s"$path#key", m.keyType, streamIds)
    private val valW = writerFor(s"$path#val", m.valueType, streamIds)
    private val lens = new LongBuf
    private val lenNulls = new BoolBuf
    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      lenNulls.add(false)
      val mp = g.getMap(ordinal)
      lens.add(mp.numElements().toLong)
      val ks = mp.keyArray(); val vs = mp.valueArray()
      var i = 0
      while (i < mp.numElements()) { keyW.add(ks, i); valW.add(vs, i); i += 1 }
    }
    def addNull(): Unit = { lenNulls.add(true); lens.add(0L) }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(lenId, LongsCol(lens.result(), PhysType.I32, lenNulls.resultOrNull))
      lens.clear(); lenNulls.clear()
      keyW.flushChunk(t)
      valW.flushChunk(t)
    }
    def rawSize: Long = keyW.rawSize + valW.rawSize + lens.n * 4
  }

  // ------------------------------------------------------------- readers

  /** Reader node: decodes chunk k of its streams into a WritableColumnVector.
    * `startRow` is the vector row to start writing at (always 0 for top-level
    * with fresh vectors per batch). Returns rows written. */
  sealed abstract class FieldReader {
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int
    /** Decode the next chunk as raw Column without filling a vector (used for
      * filter evaluation on top-level scalars). */
    def decodeRaw(): Column = throw new UnsupportedOperationException
  }

  def readerFor(path: String, dt: DataType, streams: String => Tablet.ChunkCursor): FieldReader = dt match {
    case s: StructType => new StructR(path, s, streams)
    case a: ArrayType => new ArrayR(path, a, streams)
    case m: MapType => new MapR(path, m, streams)
    case _ => new PrimR(path, dt, streams)
  }

  final class PrimR(path: String, dt: DataType, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val cursor = streams(path)
    private var pending: Column = null
    def hasNext: Boolean = pending != null || cursor.hasNext
    override def decodeRaw(): Column = {
      val c = cursor.next(); pending = c; c
    }
    /** Consume the next chunk without producing output. */
    def readChunkDiscard(): Unit = {
      if (pending != null) pending = null
      else if (cursor.hasNext) cursor.skip()
    }
    /** Fill vector from the pending (or next) chunk. selection == null -> all rows. */
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val col = if (pending != null) { val c = pending; pending = null; c } else cursor.next()
      fillVector(vec, dt, col, selection)
    }
  }

  def fillVector(vec: WritableColumnVector, dt: DataType, col: Column, selection: Array[Int]): Int = {
    val n = if (selection == null) col.len else selection.length
    vec.reserve(n)
    val nulls = col.nulls
    def srcIdx(i: Int): Int = if (selection == null) i else selection(i)
    col match {
      case c: LongsCol =>
        dt match {
          case ByteType =>
            var i = 0
            while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putByte(i, c.values(s).toByte); i += 1 }
          case ShortType =>
            var i = 0
            while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putShort(i, c.values(s).toShort); i += 1 }
          case IntegerType | DateType =>
            var i = 0
            while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putInt(i, c.values(s).toInt); i += 1 }
          case d: DecimalType =>
            var i = 0
            while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putLong(i, c.values(s)); i += 1 }
          case _ =>
            var i = 0
            while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putLong(i, c.values(s)); i += 1 }
        }
      case c: DoublesCol =>
        if (dt == FloatType) {
          var i = 0
          while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putFloat(i, c.values(s).toFloat); i += 1 }
        } else {
          var i = 0
          while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putDouble(i, c.values(s)); i += 1 }
        }
      case c: BoolsCol =>
        var i = 0
        while (i < n) { val s = srcIdx(i); if (nulls != null && nulls(s)) vec.putNull(i) else vec.putBoolean(i, c.values(s)); i += 1 }
      case c: BytesCol =>
        var i = 0
        while (i < n) {
          val s = srcIdx(i)
          if (nulls != null && nulls(s)) vec.putNull(i)
          else vec.putByteArray(i, c.bytes, c.offsets(s), c.offsets(s + 1) - c.offsets(s))
          i += 1
        }
    }
    n
  }

  private final class StructR(path: String, s: StructType, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val nullsCursor = streams(s"$path#nulls")
    private val children = s.fields.map(f => readerFor(s"$path.${f.name}", f.dataType, streams))
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val isNull = Codecs.asBools(nullsCursor.next())
      val n = isNull.length
      vec.reserve(n)
      var i = 0
      while (i < n) { if (isNull(i)) vec.putNull(i) else vec.putNotNull(i); i += 1 }
      i = 0
      while (i < children.length) { children(i).readChunk(vec.getChild(i), null); i += 1 }
      n
    }
  }

  private final class ArrayR(path: String, a: ArrayType, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val lenCursor = streams(s"$path#len")
    private val elem = readerFor(s"$path#elem", a.elementType, streams)
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val lensCol = lenCursor.next().asInstanceOf[LongsCol]
      val n = lensCol.len
      vec.reserve(n)
      var off = 0
      var i = 0
      while (i < n) {
        if (lensCol.nulls != null && lensCol.nulls(i)) vec.putNull(i)
        else {
          val l = lensCol.values(i).toInt
          vec.putArray(i, off, l)
          off += l
        }
        i += 1
      }
      elem.readChunk(vec.arrayData(), null)
      n
    }
  }

  private final class MapR(path: String, m: MapType, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val lenCursor = streams(s"$path#len")
    private val keyR = readerFor(s"$path#key", m.keyType, streams)
    private val valR = readerFor(s"$path#val", m.valueType, streams)
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val lensCol = lenCursor.next().asInstanceOf[LongsCol]
      val n = lensCol.len
      vec.reserve(n)
      var off = 0
      var i = 0
      while (i < n) {
        if (lensCol.nulls != null && lensCol.nulls(i)) vec.putNull(i)
        else {
          val l = lensCol.values(i).toInt
          vec.putArray(i, off, l)
          off += l
        }
        i += 1
      }
      keyR.readChunk(vec.getChild(0), null)
      valR.readChunk(vec.getChild(1), null)
      n
    }
  }
}
