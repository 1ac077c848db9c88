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

  /** Opt-in physical layouts per column path (reference:
    * dwio/nimble/writer/VeloxWriterOptions.h:133,169,174 — flatMapColumns,
    * dictionaryArrayColumns, deduplicatedMapColumns). */
  final case class WriteOptions(
      flatMap: Set[String] = Set.empty,
      dictArray: Set[String] = Set.empty,
      dedupMap: Set[String] = Set.empty,
      maxFlatMapKeys: Int = 2000,
      tsNanos: Set[String] = Set.empty,
      /** v10 per-column NDV sketches (`ndvSketches=false` opts an
        * ingest-heavy write out of the per-value hashing cost). */
      ndv: Boolean = true)

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

  /** Membership view of a file's stream-key table. Narrow/inline footers
    * wrap an in-memory Set; wide (v8 sectioned) footers back `apply` with a
    * one-hash-bucket probe so layout decisions never load the whole table.
    * `withPrefix` (flatmap feature discovery) may fall back to a full load —
    * enumerating a flatmap's features genuinely needs the inventory. */
  trait KeyProbe {
    def apply(k: String): Boolean
    def nonEmpty: Boolean
    def withPrefix(prefix: String): Seq[String]
    /** Whether this file's flatmap keys use the v15 '#'->"##" escape in
      * stream names (see [[escapeFmKey]]). False only for legacy (v<15)
      * files, whose '#'-bearing keys keep their historical raw encoding. */
    def escaped: Boolean = true
  }
  object KeyProbe {
    def ofSet(s: Set[String], esc: Boolean = true): KeyProbe = new KeyProbe {
      def apply(k: String): Boolean = s.contains(k)
      def nonEmpty: Boolean = s.nonEmpty
      def withPrefix(prefix: String): Seq[String] = s.filter(_.startsWith(prefix)).toSeq
      override def escaped: Boolean = esc
    }
    val empty: KeyProbe = ofSet(Set.empty)
  }

  /** v15 flatmap key escape: a '#' inside a LOGICAL map key doubles to "##"
    * in stream-key names, so a single '#' is always a grammar separator —
    * the stream-key grammar becomes prefix-unambiguous (left-to-right scan:
    * a doubled '#' is key data, a single '#' starts a '#in:'/'#fm:'/'#nanos'
    * tag). Identity for keys without '#', so the common case is
    * byte-identical to v14 output. Closes the two '#'-key hazards at once:
    * the surgery classifier's conservative refusal (r19 verdict #3) and a
    * latent writer stream-name collision (logical key "x#nanos" vs the
    * '#nanos' sibling of key "x" under a timestamp value type). */
  def escapeFmKey(k: String): String =
    if (k.indexOf('#') < 0) k else k.replace("#", "##")

  /** Inverse of [[escapeFmKey]] for v15+ files (stream-key suffix -> logical
    * map key). Legacy files pass through raw. */
  def unescapeFmKey(k: String): String =
    if (k.indexOf('#') < 0) k else k.replace("##", "#")

  /** Test-only: write flatmap stream keys RAW (the pre-v15 convention), so
    * specs can synthesize byte-faithful legacy files (paired with
    * Tablet.testFooterVersionOverride). Always reset in a finally. */
  private[graft] var testLegacyFmKeys = false

  /** Set-based conveniences (serializer, tests). */
  def readerFor(path: String, dt: DataType, streams: String => Tablet.ChunkCursor,
      footerKeys: Set[String]): FieldReader =
    readerFor(path, dt, streams, KeyProbe.ofSet(footerKeys))
  def neededKeys(path: String, dt: DataType, footerKeys: Set[String]): Seq[String] =
    neededKeys(path, dt, KeyProbe.ofSet(footerKeys))

  /** Is `path` a shredded flatmap STRUCT projection? Regular structs store a
    * child stream per (written) schema field; flatmap columns never do —
    * their features live in #in:/#fm: streams — but both store the #nulls
    * anchor. Classification probes O(projected fields) keys, never
    * enumerates, so wide-table layout decisions stay bounded:
    *  - any `path.field` child stream present  -> regular struct (a partially
    *    evolved schema with SOME resident fields must not silently turn into
    *    an all-null flatmap read)
    *  - else any `path#in:field` stream present -> flatmap projection
    *  - else (no evidence either way: every requested key absent from this
    *    file) -> flatmap, which yields nulls — the correct answer for a
    *    flatmap key projection whose keys this file never saw. */
  private def isFlatMapStruct(path: String, s: StructType, fk: KeyProbe): Boolean =
    fk.nonEmpty && s.fields.nonEmpty && fk(s"$path#nulls") &&
      !s.fields.exists(f => regularChildEvidence(s"$path.${f.name}", f.dataType, fk))

  /** Does any stream of a REGULAR (non-flatmap) child at `p` exist? Probed
    * by the child's own layout convention — a struct child anchors at
    * `#nulls`, containers at `#len`/`#idx`, atomics at the path itself — so
    * a struct whose children are all nested types still classifies as
    * regular (those children have no direct `$path.name` stream). */
  private def regularChildEvidence(p: String, dt: DataType, fk: KeyProbe): Boolean = dt match {
    case _: StructType => fk(s"$p#nulls")
    case _: ArrayType => fk(s"$p#len") || fk(s"$p#idx")
    case _: MapType => fk(s"$p#len") || fk(s"$p#idx") || fk(s"$p#nulls")
    case LongType => fk(p) || fk(s"$p#nanos")
    case _ => fk(p)
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
    /** Extend with `false` up to length m. */
    def padTo(m: Int): Unit = { while (n < m) add(false) }
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
    /** Write a ZERO-ROW chunk to every stream of this subtree WITHOUT
      * touching the live buffers. Flatmap absent-backfill needs this: a key
      * discovered mid-chunk already holds the current chunk's values when
      * the backfill runs at flush time, so a plain flushChunk would drain
      * them into the backfill slot one chunk early and misalign every later
      * chunk of that key's value stream against its inMap stream. */
    def flushEmptyChunk(t: Tablet.ChunkSink): Unit =
      throw new UnsupportedOperationException(s"flushEmptyChunk unsupported for $dt")
    def rawSize: Long
    /** Called right after the tablet flushed a stripe (chunk histories reset). */
    def onStripeFlush(): Unit = ()
  }

  def writerFor(path: String, dt: DataType, streamIds: String => Int,
      opts: WriteOptions = WriteOptions()): FieldWriter = dt match {
    case m: MapType if opts.flatMap(path) => new FlatMapW(path, m, streamIds, opts)
    case m: MapType if opts.dedupMap(path) => new SWMapW(path, m, streamIds, opts)
    case a: ArrayType if opts.dictArray(path) => new DictArrayW(path, a, streamIds, opts)
    case s: StructType => new StructW(path, s, streamIds, opts)
    case a: ArrayType => new ArrayW(path, a, streamIds, opts)
    case m: MapType => new MapW(path, m, streamIds, opts)
    case LongType if opts.tsNanos(path) => new TsNanosW(path, streamIds)
    case _ => new PrimW(path, dt, streamIds)
  }

  /** Epoch-nanos long column split into a micros stream (`path`) plus a
    * 0-999 sub-microsecond remainder sibling (`path#nanos`) — the
    * TimestampMicroNano layout (reference:
    * dwio/nimble/velox/FieldReader.cpp:878-950). The micros stream
    * delta-codes like any timestamp, the remainder stream is tiny (often
    * constant 0 for ms/us-precision feeds), and a micros-only consumer can
    * skip the sibling entirely. floorDiv/floorMod keep pre-1970 values
    * exact: combined = micros * 1000 + rem, rem in [0, 999]. */
  private final class TsNanosW(path: String, streamIds: String => Int) extends FieldWriter(LongType) {
    private val microsId = streamIds(path)
    private val nanosId = streamIds(s"$path#nanos")
    private val nulls = new BoolBuf
    private val micros = new LongBuf
    private val rems = new LongBuf
    private var raw = 0L
    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      nulls.add(false)
      val v = g.getLong(ordinal)
      micros.add(java.lang.Math.floorDiv(v, 1000L))
      rems.add(java.lang.Math.floorMod(v, 1000L))
      raw += 10L
    }
    def addNull(): Unit = { nulls.add(true); micros.add(0L); rems.add(0L); raw += 1 }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      val nl = nulls.resultOrNull
      t.writeChunk(microsId, LongsCol(micros.result(), PhysType.I64, nl))
      t.writeChunk(nanosId, LongsCol(rems.result(), PhysType.I16, nl))
      nulls.clear(); micros.clear(); rems.clear()
      raw = 0L
    }
    // zero-row chunks for BOTH split streams, live buffers untouched — a
    // LongType flatmap value matching opts.tsNanos constructs this writer,
    // and absent-backfill must not fail (or drain buffers) mid-write
    override def flushEmptyChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(microsId, LongsCol(Array.emptyLongArray, PhysType.I64, null))
      t.writeChunk(nanosId, LongsCol(Array.emptyLongArray, PhysType.I16, null))
    }
    def rawSize: Long = raw
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
    override def flushEmptyChunk(t: Tablet.ChunkSink): Unit = {
      val col: Column =
        if (longs != null) LongsCol(Array.emptyLongArray, phys, null)
        else if (doubles != null) DoublesCol(Array.emptyDoubleArray, phys == PhysType.F32, null)
        else if (bools != null) BoolsCol(Array.emptyBooleanArray, null)
        else BytesCol(Array(0), Array.emptyByteArray, null)
      t.writeChunk(id, col)
    }
    def rawSize: Long = raw
  }

  private final class StructW(path: String, s: StructType, streamIds: String => Int, opts: WriteOptions) extends FieldWriter(s) {
    private val nullsId = streamIds(s"$path#nulls")
    private val children = s.fields.map(f => writerFor(s"$path.${f.name}", f.dataType, streamIds, opts))
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
    override def onStripeFlush(): Unit = children.foreach(_.onStripeFlush())
  }

  private final class ArrayW(path: String, a: ArrayType, streamIds: String => Int, opts: WriteOptions) extends FieldWriter(a) {
    private val lenId = streamIds(s"$path#len")
    private val elem = writerFor(s"$path#elem", a.elementType, streamIds, opts)
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
    override def onStripeFlush(): Unit = elem.onStripeFlush()
  }

  private final class MapW(path: String, m: MapType, streamIds: String => Int, opts: WriteOptions) extends FieldWriter(m) {
    private val lenId = streamIds(s"$path#len")
    private val keyW = writerFor(s"$path#key", m.keyType, streamIds, opts)
    private val valW = writerFor(s"$path#val", m.valueType, streamIds, opts)
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
    override def onStripeFlush(): Unit = { keyW.onStripeFlush(); valW.onStripeFlush() }
  }

  /** FlatMap writer: a map column "exploded" into one inMap bool stream plus
    * one (compacted) value stream PER DISTINCT KEY, keys discovered during
    * the write (reference: dwio/nimble/velox/FieldWriter.cpp:1415, per-key
    * value writer :1334). Map keys must be string or integral; a row's value
    * stream only stores present entries. A key first seen after chunks have
    * already flushed gets absent-backfill chunks so chunk k of every stream
    * of the column covers the same row range. */
  private final class FlatMapW(path: String, m: MapType, streamIds: String => Int,
      opts: WriteOptions) extends FieldWriter(m) {
    require(m.keyType == StringType || m.keyType == IntegerType || m.keyType == LongType ||
      m.keyType == ShortType, s"flatmap keys must be string/integral, got ${m.keyType}")
    require(!m.valueType.isInstanceOf[StructType] && !m.valueType.isInstanceOf[ArrayType] &&
      !m.valueType.isInstanceOf[MapType], s"flatmap values must be atomic, got ${m.valueType}")
    private val nullsId = streamIds(s"$path#nulls")
    private val nulls = new BoolBuf
    private var rowsInChunk = 0
    private val chunkRowsHistory = mutable.ArrayBuffer[Int]() // this stripe
    private final class KeyState(val keyRepr: String) {
      // stream names carry the ESCAPED key (v15); keyRepr stays logical
      private val esc = if (testLegacyFmKeys) keyRepr else escapeFmKey(keyRepr)
      val inId: Int = streamIds(s"$path#in:$esc")
      // SPARSE inMap: the present-row positions within the current chunk.
      // A wide flatmap pays O(present entries) per row, not O(keys x rows) —
      // the dense BoolBuf's per-key padTo dominated 400-key write profiles.
      private var pos = new Array[Int](64)
      var nPos = 0
      /** Record row `r` as present; false when duplicate within the row. */
      def addPos(r: Int): Boolean = {
        if (nPos > 0 && pos(nPos - 1) == r) false
        else {
          if (nPos == pos.length) pos = java.util.Arrays.copyOf(pos, nPos * 2)
          pos(nPos) = r; nPos += 1; true
        }
      }
      /** The chunk's presence column, straight off the positions buffer —
        * r22: no per-key Array[Boolean] densify; [[Codecs]] encodes
        * [[SparseBoolsCol]] byte-identically to the dense form. The buffer
        * is consumed synchronously inside writeChunk (encode + stats), so
        * handing out the live array is safe; nPos resets after the flush. */
      def inMapResult(rows: Int): SparseBoolsCol = SparseBoolsCol(pos, nPos, rows)
      val valueW: FieldWriter = writerFor(s"$path#fm:$esc", m.valueType, streamIds, opts)
      var chunksWritten = 0 // within current stripe
    }
    private val keyStates = mutable.LinkedHashMap[String, KeyState]()
    // String-keyed maps: resolve KeyState straight off the row's UTF8String —
    // no per-entry String materialization on the hit path (the key is cloned
    // off the row buffer only on first sight)
    private val utf8Lookup =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, KeyState]()

    private def stateFor(kr: String): KeyState = keyStates.getOrElseUpdate(kr, {
      require(keyStates.size < opts.maxFlatMapKeys,
        s"flatmap $path exceeded maxFlatMapKeys=${opts.maxFlatMapKeys}")
      new KeyState(kr)
    })

    private def stateOf(g: SpecializedGetters, i: Int): KeyState = m.keyType match {
      case StringType =>
        val u = g.getUTF8String(i)
        var st = utf8Lookup.get(u)
        if (st == null) {
          st = stateFor(u.toString)
          utf8Lookup.put(u.clone(), st)
        }
        st
      case IntegerType => stateFor(g.getInt(i).toString)
      case LongType => stateFor(g.getLong(i).toString)
      case ShortType => stateFor(g.getShort(i).toString)
      case other => throw new UnsupportedOperationException(other.toString)
    }

    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      nulls.add(false)
      val mp = g.getMap(ordinal)
      val ks = mp.keyArray(); val vs = mp.valueArray()
      var i = 0
      while (i < mp.numElements()) {
        val st = stateOf(ks, i)
        if (st.addPos(rowsInChunk)) // guard duplicate keys within one row
          st.valueW.add(vs, i)
        i += 1
      }
      rowsInChunk += 1
    }
    def addNull(): Unit = { nulls.add(true); rowsInChunk += 1 }

    def flushChunk(t: Tablet.ChunkSink): Unit = {
      for (st <- keyStates.valuesIterator) {
        // backfill absent chunks for keys discovered after earlier flushes.
        // flushEmptyChunk, NOT flushChunk: a key discovered mid-chunk already
        // buffers the current chunk's values here, and draining them into a
        // backfill slot would shift the value stream one chunk early against
        // its inMap stream (every later read of the key then misaligns)
        while (st.chunksWritten < chunkRowsHistory.length) {
          t.writeChunk(st.inId,
            SparseBoolsCol(Array.emptyIntArray, 0, chunkRowsHistory(st.chunksWritten)))
          st.valueW.flushEmptyChunk(t)
          st.chunksWritten += 1
        }
        t.writeChunk(st.inId, st.inMapResult(rowsInChunk))
        st.nPos = 0
        st.valueW.flushChunk(t)
        st.chunksWritten += 1
      }
      t.writeChunk(nullsId, BoolsCol(nulls.result()))
      chunkRowsHistory += rowsInChunk
      nulls.clear()
      rowsInChunk = 0
    }
    override def onStripeFlush(): Unit = {
      chunkRowsHistory.clear()
      keyStates.valuesIterator.foreach(_.chunksWritten = 0)
    }
    def rawSize: Long = keyStates.valuesIterator.map(_.valueW.rawSize).sum + nulls.n
  }

  /** ArrayWithOffsets writer: consecutive identical arrays stored once;
    * streams = per-row index (+nulls), unique-array lengths, unique elements
    * (reference: dwio/nimble/velox/FieldWriter.cpp:2177). Chunk-local dedup;
    * atomic element types. */
  private final class DictArrayW(path: String, a: ArrayType, streamIds: String => Int,
      opts: WriteOptions) extends FieldWriter(a) {
    private val idxId = streamIds(s"$path#idx")
    private val lenId = streamIds(s"$path#ddlen")
    private val elem = writerFor(s"$path#elem", a.elementType, streamIds, opts)
    private val idx = new LongBuf
    private val idxNulls = new BoolBuf
    private val ddlens = new LongBuf
    private var prev: Array[Any] = null
    private var uniques = 0

    private def extract(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Any] = {
      val out = new Array[Any](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = if (arr.isNullAt(i)) null else a.elementType match {
          case LongType | TimestampType | TimestampNTZType => arr.getLong(i)
          case IntegerType | DateType => arr.getInt(i)
          case ShortType => arr.getShort(i)
          case ByteType => arr.getByte(i)
          case DoubleType => arr.getDouble(i)
          case FloatType => arr.getFloat(i)
          case BooleanType => arr.getBoolean(i)
          case StringType => arr.getUTF8String(i).toString
          case BinaryType => arr.getBinary(i).toSeq
          case other => throw new UnsupportedOperationException(other.toString)
        }
        i += 1
      }
      out
    }

    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      idxNulls.add(false)
      val arr = g.getArray(ordinal)
      val cur = extract(arr)
      if (prev != null && java.util.Arrays.equals(prev.asInstanceOf[Array[Object]], cur.asInstanceOf[Array[Object]])) {
        idx.add((uniques - 1).toLong) // same as previous unique
      } else {
        ddlens.add(arr.numElements().toLong)
        var i = 0
        while (i < arr.numElements()) { elem.add(arr, i); i += 1 }
        idx.add(uniques.toLong)
        uniques += 1
        prev = cur
      }
    }
    def addNull(): Unit = { idxNulls.add(true); idx.add(0L) }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(idxId, LongsCol(idx.result(), PhysType.I32, idxNulls.resultOrNull))
      t.writeChunk(lenId, LongsCol(ddlens.result(), PhysType.I32))
      elem.flushChunk(t)
      idx.clear(); idxNulls.clear(); ddlens.clear(); prev = null; uniques = 0
    }
    def rawSize: Long = elem.rawSize + idx.n * 4
  }

  /** SlidingWindowMap writer: consecutive identical maps stored once
    * (reference: dwio/nimble/velox/FieldWriter.cpp:953). Same index scheme as
    * DictArrayW with key+value child streams. */
  private final class SWMapW(path: String, m: MapType, streamIds: String => Int,
      opts: WriteOptions) extends FieldWriter(m) {
    private val idxId = streamIds(s"$path#idx")
    private val lenId = streamIds(s"$path#ddlen")
    private val keyW = writerFor(s"$path#key", m.keyType, streamIds, opts)
    private val valW = writerFor(s"$path#val", m.valueType, streamIds, opts)
    private val idx = new LongBuf
    private val idxNulls = new BoolBuf
    private val ddlens = new LongBuf
    private var prevKeys: Array[Any] = null
    private var prevVals: Array[Any] = null
    private var uniques = 0

    private def extract(arr: org.apache.spark.sql.catalyst.util.ArrayData, dt: DataType): Array[Any] = {
      val out = new Array[Any](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = if (arr.isNullAt(i)) null else dt match {
          case LongType | TimestampType | TimestampNTZType => arr.getLong(i)
          case IntegerType | DateType => arr.getInt(i)
          case ShortType => arr.getShort(i)
          case ByteType => arr.getByte(i)
          case DoubleType => arr.getDouble(i)
          case FloatType => arr.getFloat(i)
          case BooleanType => arr.getBoolean(i)
          case StringType => arr.getUTF8String(i).toString
          case other => throw new UnsupportedOperationException(other.toString)
        }
        i += 1
      }
      out
    }

    def add(g: SpecializedGetters, ordinal: Int): Unit = {
      if (g.isNullAt(ordinal)) { addNull(); return }
      idxNulls.add(false)
      val mp = g.getMap(ordinal)
      val ks = extract(mp.keyArray(), m.keyType)
      val vs = extract(mp.valueArray(), m.valueType)
      val same = prevKeys != null &&
        java.util.Arrays.equals(prevKeys.asInstanceOf[Array[Object]], ks.asInstanceOf[Array[Object]]) &&
        java.util.Arrays.equals(prevVals.asInstanceOf[Array[Object]], vs.asInstanceOf[Array[Object]])
      if (same) idx.add((uniques - 1).toLong)
      else {
        ddlens.add(mp.numElements().toLong)
        val ka = mp.keyArray(); val va = mp.valueArray()
        var i = 0
        while (i < mp.numElements()) { keyW.add(ka, i); valW.add(va, i); i += 1 }
        idx.add(uniques.toLong)
        uniques += 1
        prevKeys = ks; prevVals = vs
      }
    }
    def addNull(): Unit = { idxNulls.add(true); idx.add(0L) }
    def flushChunk(t: Tablet.ChunkSink): Unit = {
      t.writeChunk(idxId, LongsCol(idx.result(), PhysType.I32, idxNulls.resultOrNull))
      t.writeChunk(lenId, LongsCol(ddlens.result(), PhysType.I32))
      keyW.flushChunk(t)
      valW.flushChunk(t)
      idx.clear(); idxNulls.clear(); ddlens.clear(); prevKeys = null; prevVals = null; uniques = 0
    }
    def rawSize: Long = keyW.rawSize + valW.rawSize + idx.n * 4
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

  /** Build a reader tree; the physical layout of map/array columns is
    * detected from the footer's stream key set (regular vs flatmap vs
    * deduplicated — the file self-describes its layout). A StructType over
    * "#in:" streams is a flatmap feature projection (SURVEY.md §2.2). */
  def readerFor(path: String, dt: DataType, streams: String => Tablet.ChunkCursor,
      footerKeys: KeyProbe = KeyProbe.empty): FieldReader = dt match {
    case m: MapType if footerKeys.nonEmpty && !footerKeys(s"$path#len") && footerKeys(s"$path#idx") =>
      new SWMapR(path, m, streams, footerKeys)
    case m: MapType if footerKeys.nonEmpty && !footerKeys(s"$path#len") && footerKeys(s"$path#nulls") =>
      new FlatMapR(path, m, streams, footerKeys)
    case a: ArrayType if footerKeys.nonEmpty && !footerKeys(s"$path#len") && footerKeys(s"$path#idx") =>
      new DictArrayR(path, a, streams, footerKeys)
    case s: StructType if isFlatMapStruct(path, s, footerKeys) =>
      new FlatMapStructR(path, s, streams, footerKeys)
    case s: StructType => new StructR(path, s, streams, footerKeys)
    case a: ArrayType => new ArrayR(path, a, streams, footerKeys)
    case m: MapType => new MapR(path, m, streams, footerKeys)
    case LongType if footerKeys(s"$path#nanos") => new TsNanosR(path, streams)
    case _ => new PrimR(path, dt, streams)
  }

  /** Leaf stream keys a reader for (path, dt) will pull, given the footer's
    * key set (layout-aware counterpart of streamKeys). */
  def neededKeys(path: String, dt: DataType, footerKeys: KeyProbe): Seq[String] = dt match {
    case m: MapType if !footerKeys(s"$path#len") && footerKeys(s"$path#idx") =>
      Seq(s"$path#idx", s"$path#ddlen") ++
        neededKeys(s"$path#key", m.keyType, footerKeys) ++
        neededKeys(s"$path#val", m.valueType, footerKeys)
    case m: MapType if !footerKeys(s"$path#len") && footerKeys(s"$path#nulls") =>
      val keys = flatMapKeysIn(path, footerKeys)
      Seq(s"$path#nulls") ++ keys.flatMap(k =>
        s"$path#in:$k" +: neededKeys(s"$path#fm:$k", m.valueType, footerKeys))
    case a: ArrayType if !footerKeys(s"$path#len") && footerKeys(s"$path#idx") =>
      Seq(s"$path#idx", s"$path#ddlen") ++ neededKeys(s"$path#elem", a.elementType, footerKeys)
    case s: StructType if isFlatMapStruct(path, s, footerKeys) =>
      // flatmap feature projection: the column nulls anchor + only the
      // requested keys' streams (unrequested keys never read)
      s"$path#nulls" +: s.fields.toSeq.map(f =>
          f -> (if (footerKeys.escaped) escapeFmKey(f.name) else f.name))
        .filter { case (_, sk) => footerKeys(s"$path#in:$sk") }
        .flatMap { case (f, sk) =>
          s"$path#in:$sk" +: neededKeys(s"$path#fm:$sk", f.dataType, footerKeys) }
    case s: StructType =>
      // children with NO streams in the file (nested schema evolution) pull
      // nothing — StructR null-fills them; the guard on nonEmpty keeps
      // footer-less callers (which pass an empty probe) on the full key set
      s"$path#nulls" +: s.fields.toSeq.flatMap { f =>
        val ks = neededKeys(s"$path.${f.name}", f.dataType, footerKeys)
        if (footerKeys.nonEmpty && !ks.exists(footerKeys(_))) Nil else ks
      }
    case a: ArrayType =>
      s"$path#len" +: neededKeys(s"$path#elem", a.elementType, footerKeys)
    case m: MapType =>
      Seq(s"$path#len") ++ neededKeys(s"$path#key", m.keyType, footerKeys) ++
        neededKeys(s"$path#val", m.valueType, footerKeys)
    case LongType if footerKeys(s"$path#nanos") => Seq(path, s"$path#nanos")
    case _ => Seq(path)
  }

  /** Discovered flatmap keys for a column, in sorted order. */
  def flatMapKeysIn(path: String, footerKeys: KeyProbe): Seq[String] = {
    val prefix = s"$path#in:"
    footerKeys.withPrefix(prefix).map(_.substring(prefix.length)).sorted
  }

  final class PrimR(path: String, dt: DataType, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val cursor = streams(path)
    private var pending: Column = null
    // set when a positional decode already consumed the current chunk (no
    // full column exists to hold as pending) — the next discard must no-op
    private var consumedAt = false
    private val isStringy = dt == StringType || dt == BinaryType
    def hasNext: Boolean = pending != null || cursor.hasNext
    override def decodeRaw(): Column = {
      val c = cursor.next(); pending = c; c
    }
    /** Positional decode of the next chunk at `positions` (strictly
      * increasing, non-empty): a DENSE column of positions.length rows.
      * Consumes the chunk — the caller's discard/fill for this chunk must
      * not run (readChunkDiscard handles the bookkeeping). Filter-only
      * cascade columns and sparse projection fills use this; never valid
      * for string/binary columns (their lazy paths already materialize
      * survivors only). */
    def decodeRawAt(positions: Array[Int]): Column = {
      val c = cursor.nextAt(positions)
      consumedAt = true
      c
    }
    /** [[decodeRawAt]] that DECLINES (null, chunk untouched) when the codec
      * admits no positional decode — string/binary cascade columns use this
      * so the declining shapes (shared-dict, legacy Prefix) keep their
      * dictionary-preserving dense path. */
    def decodeRawAtOrNull(positions: Array[Int]): Column = {
      val c = cursor.nextAtOrNull(positions)
      if (c != null) consumedAt = true
      c
    }
    /** The cascade's point-read dispatch, owned HERE so every call site
      * (batch scan + both fold paths) shares one decline rule: strings
      * decline per-codec (chunk untouched — shared-dict / legacy-Prefix
      * keep the dict-preserving dense eval), numerics always consume
      * (decode-whole+gather fallback is no worse than the dense path). */
    def pointReadAt(positions: Array[Int]): Column =
      if (isStringy) decodeRawAtOrNull(positions) else decodeRawAt(positions)
    /** Rows in the next chunk, when its stats frame carries a count. */
    def peekRows(): Int = cursor.peekStats().map(_.valueCount.toInt).getOrElse(-1)
    /** decodeRaw, but a DICT-coded string chunk stays dictionary-preserved
      * ([[DictBytesCol]]) — predicates evaluate per alphabet entry and the
      * later vector fill expands survivors only. */
    def decodeRawDict(): Column = {
      val c = cursor.nextDict(); pending = c; c
    }
    /** decodeRaw, but string chunks stay lazy (dict-preserved or
      * FSST-encoded) — an aggregate fold over a selection then materializes
      * survivors only (mid-scan agg, AggScan). */
    def decodeRawLazy(): Column = {
      val c = cursor.nextLazy(); pending = c; c
    }
    /** Consume the next chunk without producing output. */
    def readChunkDiscard(): Unit = {
      if (consumedAt) consumedAt = false
      else if (pending != null) pending = null
      else if (cursor.hasNext) cursor.skip()
    }
    /** Fill vector from the pending (or next) chunk. selection == null -> all
      * rows. String chunks decode lazily (dict-preserved / FSST-encoded), so
      * with a selection only surviving rows materialize their bytes; sparse
      * selections over numeric chunks decode survivor POSITIONS only when
      * the codec admits point reads (late materialization, reference:
      * velox/selective/ColumnLoader.h:42). */
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      if (pending == null && selection != null && selection.length > 0) {
        // sparse enough that point reads beat the word-wise bulk decode
        // (~16x per-value cost ratio, so cut over at ~6%); stats-less legacy
        // chunks (unknown row count) stay on the bulk path
        val rows = cursor.peekStats().map(_.valueCount.toInt).getOrElse(-1)
        if (rows > 0 && selection.length.toLong * 16 <= rows) {
          if (isStringy) {
            // strings decline per-codec (shared-dict / legacy Prefix keep
            // the lazy survivor-materializing fill)
            val dense = cursor.nextAtOrNull(selection)
            if (dense != null) return fillVector(vec, dt, dense, null)
          } else {
            val dense = cursor.nextAt(selection)
            return fillVector(vec, dt, dense, null)
          }
        }
      }
      val col =
        if (pending != null) { val c = pending; pending = null; c }
        else if (isStringy) cursor.nextLazy()
        else cursor.next()
      fillVector(vec, dt, col, selection)
    }
  }

  /** Reader for the TimestampMicroNano split layout ([[neededKeys]] pulls
    * both streams): recombines micros * 1000 + remainder into the logical
    * epoch-nanos long. Chunk-aligned with every other stream — both sibling
    * streams chunk at the same row boundaries by construction. */
  final class TsNanosR(path: String, streams: String => Tablet.ChunkCursor) extends FieldReader {
    private val microsCur = streams(path)
    private val nanosCur = streams(s"$path#nanos")
    private var pending: Column = null
    def hasNext: Boolean = pending != null || microsCur.hasNext
    private def combine(): Column = {
      val m = microsCur.next().asInstanceOf[LongsCol]
      val r = nanosCur.next().asInstanceOf[LongsCol]
      val out = new Array[Long](m.len)
      var i = 0
      while (i < out.length) { out(i) = m.values(i) * 1000L + r.values(i); i += 1 }
      LongsCol(out, PhysType.I64, m.nulls)
    }
    override def decodeRaw(): Column = { val c = combine(); pending = c; c }
    def readChunkDiscard(): Unit = {
      if (pending != null) pending = null
      else if (microsCur.hasNext) { microsCur.skip(); nanosCur.skip() }
    }
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val col = if (pending != null) { val c = pending; pending = null; c } else combine()
      fillVector(vec, LongType, col, selection)
    }
  }

  /** Unsigned import widening (SURVEY §1.2, parquet-reader parity): the
    * stored stream holds the two's-complement bit pattern of an unsigned
    * source column; reinterpret and widen on scan —
    * Uint8→Short, Uint16→Int, Uint32→Long, Uint64→Decimal(20,0). */
  def unsignedWidened(dt: DataType): DataType = dt match {
    case ByteType => ShortType
    case ShortType => IntegerType
    case IntegerType => LongType
    case LongType => DecimalType(20, 0)
    case other => throw new IllegalArgumentException(
      s"nimble: unsignedColumns: type ${other.simpleString} has no unsigned widening " +
        "(expected a stored byte/short/int/long column)")
  }

  private val Two64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** Reader applying [[unsignedWidened]] semantics: masks the stored bit
    * pattern up to the widened domain (u64 goes through Decimal(20,0)). */
  final class UnsignedR(path: String, target: DataType, streams: String => Tablet.ChunkCursor)
      extends FieldReader {
    private val cursor = streams(path)
    def hasNext: Boolean = cursor.hasNext
    def readChunkDiscard(): Unit = if (cursor.hasNext) cursor.skip()
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val col = cursor.next().asInstanceOf[LongsCol]
      target match {
        case d: DecimalType => // u64: beyond long range when the sign bit is set
          val n = if (selection == null) col.len else selection.length
          vec.reserve(n)
          val nulls = col.nulls
          var i = 0
          while (i < n) {
            val row = if (selection == null) i else selection(i)
            if (nulls != null && nulls(row)) vec.putNull(i)
            else {
              var bi = java.math.BigInteger.valueOf(col.values(row))
              if (col.values(row) < 0) bi = bi.add(Two64)
              vec.putDecimal(i, org.apache.spark.sql.types.Decimal(
                new java.math.BigDecimal(bi), d.precision, d.scale), d.precision)
            }
            i += 1
          }
          n
        case _ =>
          val mask = col.phys match {
            case PhysType.I8 => 0xffL
            case PhysType.I16 => 0xffffL
            case _ => 0xffffffffL
          }
          val out = new Array[Long](col.len)
          var i = 0
          while (i < out.length) { out(i) = col.values(i) & mask; i += 1 }
          fillVector(vec, target, LongsCol(out, PhysType.I64, col.nulls), selection)
      }
    }
  }

  def fillVector(vec: WritableColumnVector, dt: DataType, col: Column, selection: Array[Int]): Int = {
    val n = if (selection == null) col.len else selection.length
    vec.reserve(n)
    val nulls = col.nulls
    def srcIdx(i: Int): Int = if (selection == null) i else selection(i)
    // Bulk fast path for full, null-free chunks (the common scan shape):
    // single System.arraycopy into the vector instead of n virtual puts —
    // the same trick Spark's vectorized parquet reader plays.
    if (selection == null && nulls == null) col match {
      case c: LongsCol if dt == LongType || dt == TimestampType || dt == TimestampNTZType ||
          dt.isInstanceOf[DecimalType] =>
        vec.putLongs(0, n, c.values, 0)
        return n
      case c: DoublesCol if dt == DoubleType =>
        vec.putDoubles(0, n, c.values, 0)
        return n
      case c: BytesCol =>
        if (vec.hasDictionary) vec.setDictionary(null) // vector reuse across chunks
        // pre-size the child byte vector once, then append without regrowth
        vec.arrayData().reserve(c.offsets(n) - c.offsets(0))
        var i = 0
        while (i < n) {
          vec.putByteArray(i, c.bytes, c.offsets(i), c.offsets(i + 1) - c.offsets(i))
          i += 1
        }
        return n
      case _ => ()
    }
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
        if (vec.hasDictionary) vec.setDictionary(null) // vector reuse across chunks
        var i = 0
        while (i < n) {
          val s = srcIdx(i)
          if (nulls != null && nulls(s)) vec.putNull(i)
          else vec.putByteArray(i, c.bytes, c.offsets(s), c.offsets(s + 1) - c.offsets(s))
          i += 1
        }
      case c: LazyFsstBytesCol =>
        if (vec.hasDictionary) vec.setDictionary(null) // vector reuse across chunks
        // decode-at-fill: with a selection present only surviving rows pay
        // the FSST decode (lazy column materialization)
        val scratch = new ByteSink(256)
        var i = 0
        while (i < n) {
          val start = scratch.size
          val l = c.decodeRow(srcIdx(i), scratch)
          vec.putByteArray(i, scratch.buffer, start, l)
          i += 1
        }
        Fsst.decodedStrings.add(n.toLong)
      case c: DictBytesCol if selection == null =>
        // surface the chunk dictionary through Spark's vector dictionary API
        // (reference: encodings/common/Encoding.h:280-302 exposes
        // dictionaryEnabled/Size/Entries precisely so engines work on ids;
        // Spark's vectorized parquet reader plays the same trick): the fill
        // is one int id per row, and every downstream read shares the
        // per-entry byte arrays (memoized on the alphabet) instead of
        // materializing bytes per row
        vec.setDictionary(new VectorDict(c.alphabet.entryArrays))
        val ids = vec.reserveDictionaryIds(n)
        var i = 0
        while (i < n) {
          if (nulls != null && nulls(i)) vec.putNull(i)
          else ids.putInt(i, c.indices(i))
          i += 1
        }
      case c: DictBytesCol =>
        // selective fill (point probes, filtered scans): survivors are far
        // fewer than alphabet entries, so expand only the selected rows —
        // building the whole dictionary would cost more than it saves
        if (vec.hasDictionary) vec.setDictionary(null)
        val a = c.alphabet
        var i = 0
        while (i < n) {
          val s = srcIdx(i)
          if (nulls != null && nulls(s)) vec.putNull(i)
          else {
            val e = c.indices(s)
            vec.putByteArray(i, a.bytes, a.offsets(e), a.offsets(e + 1) - a.offsets(e))
          }
          i += 1
        }
    }
    n
  }

  /** Chunk-alphabet dictionary handed to [[WritableColumnVector.setDictionary]]
    * — ids decode to shared immutable byte arrays (only binary decode is
    * meaningful; nimble dictionaries are string/binary alphabets). */
  final class VectorDict(entries: Array[Array[Byte]])
      extends org.apache.spark.sql.execution.vectorized.Dictionary {
    override def decodeToBinary(id: Int): Array[Byte] = entries(id)
    override def decodeToInt(id: Int): Int =
      throw new UnsupportedOperationException("nimble: string dictionary")
    override def decodeToLong(id: Int): Long =
      throw new UnsupportedOperationException("nimble: string dictionary")
    override def decodeToFloat(id: Int): Float =
      throw new UnsupportedOperationException("nimble: string dictionary")
    override def decodeToDouble(id: Int): Double =
      throw new UnsupportedOperationException("nimble: string dictionary")
  }

  /** Reader for a subtree whose streams are entirely absent from the file
    * (schema evolution inside a struct): null-fills every row. The parent
    * supplies the chunk's row count before calling readChunk. */
  private final class AbsentR extends FieldReader {
    var rows: Int = 0
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      vec.reserve(rows)
      vec.putNulls(0, rows)
      rows
    }
  }

  private final class StructR(path: String, s: StructType, streams: String => Tablet.ChunkCursor, fk: KeyProbe) extends FieldReader {
    private val nullsCursor = streams(s"$path#nulls")
    // a child added to the struct after this file was written (no streams at
    // all under its path) reads as null — parquet nested-evolution semantics
    private val children: Array[FieldReader] = s.fields.map { f =>
      val childPath = s"$path.${f.name}"
      val absent = fk.nonEmpty &&
        !neededKeys(childPath, f.dataType, fk).exists(fk(_))
      if (absent) new AbsentR else readerFor(childPath, f.dataType, streams, fk)
    }
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val isNull = Codecs.asBools(nullsCursor.next())
      val n = isNull.length
      vec.reserve(n)
      var i = 0
      while (i < n) { if (isNull(i)) vec.putNull(i) else vec.putNotNull(i); i += 1 }
      i = 0
      while (i < children.length) {
        children(i) match {
          case a: AbsentR => a.rows = n
          case _ => ()
        }
        children(i).readChunk(vec.getChild(i), null)
        i += 1
      }
      n
    }
  }

  private final class ArrayR(path: String, a: ArrayType, streams: String => Tablet.ChunkCursor, fk: KeyProbe) extends FieldReader {
    private val lenCursor = streams(s"$path#len")
    private val elem = readerFor(s"$path#elem", a.elementType, streams, fk)
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

  private final class MapR(path: String, m: MapType, streams: String => Tablet.ChunkCursor, fk: KeyProbe) extends FieldReader {
    private val lenCursor = streams(s"$path#len")
    private val keyR = readerFor(s"$path#key", m.keyType, streams, fk)
    private val valR = readerFor(s"$path#val", m.valueType, streams, fk)
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

  /** Copy element `src` of a decoded column into vector row `dst` (atomic
    * types only — used by flatmap/dedup assembly). */
  private def fillOne(vec: WritableColumnVector, dt: DataType, col: Column, src: Int, dst: Int): Unit = {
    col match {
      case c: LongsCol =>
        if (c.nulls != null && c.nulls(src)) { vec.putNull(dst); return }
        dt match {
          case ByteType => vec.putByte(dst, c.values(src).toByte)
          case ShortType => vec.putShort(dst, c.values(src).toShort)
          case IntegerType | DateType => vec.putInt(dst, c.values(src).toInt)
          case _ => vec.putLong(dst, c.values(src))
        }
      case c: DoublesCol =>
        if (c.nulls != null && c.nulls(src)) { vec.putNull(dst); return }
        if (dt == FloatType) vec.putFloat(dst, c.values(src).toFloat)
        else vec.putDouble(dst, c.values(src))
      case c: BoolsCol =>
        if (c.nulls != null && c.nulls(src)) { vec.putNull(dst); return }
        vec.putBoolean(dst, c.values(src))
      case c: BytesCol =>
        if (c.nulls != null && c.nulls(src)) { vec.putNull(dst); return }
        vec.putByteArray(dst, c.bytes, c.offsets(src), c.offsets(src + 1) - c.offsets(src))
      case c: DictBytesCol =>
        if (c.nulls != null && c.nulls(src)) { vec.putNull(dst); return }
        val e = c.indices(src)
        vec.putByteArray(dst, c.alphabet.bytes, c.alphabet.offsets(e),
          c.alphabet.offsets(e + 1) - c.alphabet.offsets(e))
      case c: LazyFsstBytesCol =>
        val scratch = new ByteSink(64)
        val l = c.decodeRow(src, scratch)
        vec.putByteArray(dst, scratch.buffer, 0, l)
        Fsst.decodedStrings.add(1L)
    }
  }

  /** Merged flatmap read: reassembles a MapType column from the per-key
    * shredded streams (reference: dwio/nimble/velox/FieldReader.cpp:3226
    * merged flat-map reader). */
  private final class FlatMapR(path: String, m: MapType, streams: String => Tablet.ChunkCursor,
      fk: KeyProbe) extends FieldReader {
    private val nullsCursor = streams(s"$path#nulls")
    private val keys: Seq[String] = flatMapKeysIn(path, fk)
    private final class KeyCursors(rawSuffix: String) {
      // stream lookups use the suffix AS STORED; the reconstructed map's
      // key VALUES use the logical (unescaped on v15+) form
      val repr: String = if (fk.escaped) unescapeFmKey(rawSuffix) else rawSuffix
      val in = streams(s"$path#in:$rawSuffix")
      val value = new PrimR(s"$path#fm:$rawSuffix", m.valueType, streams)
    }
    private val keyCursors = keys.map(new KeyCursors(_)).toArray

    private def keyToVector(vec: WritableColumnVector, repr: String, dst: Int): Unit = m.keyType match {
      case StringType =>
        val b = repr.getBytes("UTF-8"); vec.putByteArray(dst, b, 0, b.length)
      case IntegerType => vec.putInt(dst, repr.toInt)
      case LongType => vec.putLong(dst, repr.toLong)
      case ShortType => vec.putShort(dst, repr.toShort)
      case other => throw new UnsupportedOperationException(other.toString)
    }

    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val isNull = Codecs.asBools(nullsCursor.next())
      val n = isNull.length
      vec.reserve(n)
      // decode each key's inMap bools (absent streams in this stripe -> all
      // false) and its compact values
      val inMaps = new Array[Array[Boolean]](keyCursors.length)
      val valCols = new Array[Column](keyCursors.length)
      val valIdx = new Array[Int](keyCursors.length)
      var k = 0
      while (k < keyCursors.length) {
        val kc = keyCursors(k)
        if (kc.in.hasNext) {
          inMaps(k) = Codecs.asBools(kc.in.next())
          valCols(k) = kc.value.decodeRaw()
          kc.value.readChunkDiscard()
        } else {
          inMaps(k) = null // key absent in this whole stripe
          valCols(k) = null
        }
        k += 1
      }
      val keyVec = vec.getChild(0)
      val valVec = vec.getChild(1)
      var off = 0
      var i = 0
      while (i < n) {
        if (isNull(i)) vec.putNull(i)
        else {
          var len = 0
          k = 0
          while (k < keyCursors.length) {
            if (inMaps(k) != null && inMaps(k)(i)) {
              keyVec.reserve(off + len + 1)
              valVec.reserve(off + len + 1)
              keyToVector(keyVec, keyCursors(k).repr, off + len)
              fillOne(valVec, m.valueType, valCols(k), valIdx(k), off + len)
              valIdx(k) += 1
              len += 1
            }
            k += 1
          }
          vec.putArray(i, off, len)
          off += len
        }
        i += 1
      }
      n
    }
  }

  /** Flatmap feature projection: read ONLY the requested keys, as a struct —
    * unselected key streams are never fetched (reference:
    * dwio/nimble/velox/FieldReader.cpp:2990 struct-projection reader;
    * test velox/tests/VeloxReaderTest.cpp:1463). */
  private final class FlatMapStructR(path: String, s: StructType,
      streams: String => Tablet.ChunkCursor, fk: KeyProbe) extends FieldReader {
    private val nullsCursor = streams(s"$path#nulls")
    private final class KeyCursors(val field: StructField) {
      // the projected field name is the LOGICAL key; streams store escaped
      private val sk = if (fk.escaped) escapeFmKey(field.name) else field.name
      val exists = fk(s"$path#in:$sk")
      val in = if (exists) streams(s"$path#in:$sk") else null
      val value = if (exists) new PrimR(s"$path#fm:$sk", field.dataType, streams) else null
    }
    private val keyCursors = s.fields.map(new KeyCursors(_))

    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val isNull = Codecs.asBools(nullsCursor.next())
      val n = isNull.length
      vec.reserve(n)
      var i = 0
      while (i < n) { if (isNull(i)) vec.putNull(i) else vec.putNotNull(i); i += 1 }
      var k = 0
      while (k < keyCursors.length) {
        val kc = keyCursors(k)
        val child = vec.getChild(k)
        child.reserve(n)
        if (kc.exists && kc.in.hasNext) {
          val inMap = Codecs.asBools(kc.in.next())
          val values = kc.value.decodeRaw()
          kc.value.readChunkDiscard()
          var vi = 0
          i = 0
          while (i < n) {
            if (inMap(i)) { fillOne(child, kc.field.dataType, values, vi, i); vi += 1 }
            else child.putNull(i)
            i += 1
          }
        } else {
          // key unknown to the file, or absent in this stripe -> all null
          i = 0
          while (i < n) { child.putNull(i); i += 1 }
        }
        k += 1
      }
      n
    }
  }

  /** Deduplicated-array read: per-row indices into once-stored unique arrays;
    * vector rows share child ranges, preserving the dedup in memory
    * (reference: dwio/nimble/velox/FieldReader.cpp:1261). */
  private final class DictArrayR(path: String, a: ArrayType, streams: String => Tablet.ChunkCursor,
      fk: KeyProbe) extends FieldReader {
    private val idxCursor = streams(s"$path#idx")
    private val lenCursor = streams(s"$path#ddlen")
    private val elem = readerFor(s"$path#elem", a.elementType, streams, fk)
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val idxCol = idxCursor.next().asInstanceOf[LongsCol]
      val lens = lenCursor.next().asInstanceOf[LongsCol].values
      val n = idxCol.len
      vec.reserve(n)
      val starts = new Array[Int](lens.length + 1)
      var u = 0
      while (u < lens.length) { starts(u + 1) = starts(u) + lens(u).toInt; u += 1 }
      elem.readChunk(vec.arrayData(), null)
      var i = 0
      while (i < n) {
        if (idxCol.nulls != null && idxCol.nulls(i)) vec.putNull(i)
        else {
          val ui = idxCol.values(i).toInt
          vec.putArray(i, starts(ui), lens(ui).toInt)
        }
        i += 1
      }
      n
    }
  }

  /** Deduplicated-map read (SlidingWindowMap analog, reference:
    * dwio/nimble/velox/FieldReader.cpp:1670). */
  private final class SWMapR(path: String, m: MapType, streams: String => Tablet.ChunkCursor,
      fk: KeyProbe) extends FieldReader {
    private val idxCursor = streams(s"$path#idx")
    private val lenCursor = streams(s"$path#ddlen")
    private val keyR = readerFor(s"$path#key", m.keyType, streams, fk)
    private val valR = readerFor(s"$path#val", m.valueType, streams, fk)
    def readChunk(vec: WritableColumnVector, selection: Array[Int]): Int = {
      val idxCol = idxCursor.next().asInstanceOf[LongsCol]
      val lens = lenCursor.next().asInstanceOf[LongsCol].values
      val n = idxCol.len
      vec.reserve(n)
      val starts = new Array[Int](lens.length + 1)
      var u = 0
      while (u < lens.length) { starts(u + 1) = starts(u) + lens(u).toInt; u += 1 }
      keyR.readChunk(vec.getChild(0), null)
      valR.readChunk(vec.getChild(1), null)
      var i = 0
      while (i < n) {
        if (idxCol.nulls != null && idxCol.nulls(i)) vec.putNull(i)
        else {
          val ui = idxCol.values(i).toInt
          vec.putArray(i, starts(ui), lens(ui).toInt)
        }
        i += 1
      }
      n
    }
  }
}
