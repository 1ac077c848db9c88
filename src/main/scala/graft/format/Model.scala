package graft.format

/** Physical types of a value stream.
  *
  * Mirrors the reference's `DataType` (reference: dwio/nimble/common/Types.h:169-183)
  * reduced to JVM-signed types; Spark has no unsigned integers so the unsigned
  * variants are widened at the schema layer (SURVEY.md §1.2).
  */
object PhysType {
  final val Bool: Byte = 0
  final val I8: Byte = 1
  final val I16: Byte = 2
  final val I32: Byte = 3
  final val I64: Byte = 4
  final val F32: Byte = 5
  final val F64: Byte = 6
  final val Bytes: Byte = 7 // string / binary

  def byteWidth(t: Byte): Int = t match {
    case I8 => 1
    case I16 => 2
    case I32 => 4
    case I64 => 8
    case F32 => 4
    case F64 => 8
    case Bool => 1
    case _ => -1
  }
}

/** Decoded representation of one value stream (one chunk's worth).
  *
  * Integers (and dates/timestamps, and float/double raw bits where a codec
  * wants an integral view) travel as Array[Long]; variable-width values as
  * offsets+bytes. `nulls(i)` true means row i is null; values of null rows are
  * undefined (not stored by the Nullable wrapper).
  */
sealed trait Column {
  def len: Int
  def nulls: Array[Boolean] // null => no nulls array allocated
  final def hasNulls: Boolean = nulls != null
  final def nullCount: Int = {
    if (nulls == null) 0
    else { var c = 0; var i = 0; while (i < nulls.length) { if (nulls(i)) c += 1; i += 1 }; c }
  }
}

final case class LongsCol(values: Array[Long], phys: Byte, nulls: Array[Boolean] = null) extends Column {
  def len: Int = values.length
}
final case class DoublesCol(values: Array[Double], isFloat: Boolean, nulls: Array[Boolean] = null) extends Column {
  def len: Int = values.length
}
final case class BoolsCol(values: Array[Boolean], nulls: Array[Boolean] = null) extends Column {
  def len: Int = values.length
}
/** WRITE-side sparse bool column: the strictly-increasing row positions of
  * the TRUE values (first `nPos` entries of `pos`), over `len` rows, no
  * nulls. Exists so a wide FlatMap's per-key presence streams encode
  * straight off the writer's position buffers instead of densifying one
  * Array[Boolean] per key per chunk ([[Codecs]] encodes it byte-identically
  * to the equivalent dense BoolsCol). Never appears on the read path. */
final case class SparseBoolsCol(pos: Array[Int], nPos: Int, override val len: Int) extends Column {
  def nulls: Array[Boolean] = null
}
/** offsets.length == len+1; value i = bytes[offsets(i) until offsets(i+1)). */
final case class BytesCol(offsets: Array[Int], bytes: Array[Byte], nulls: Array[Boolean] = null) extends Column {
  def len: Int = offsets.length - 1
  def apply(i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, offsets(i), offsets(i + 1))
  /** Per-entry byte arrays, memoized — a shared-dictionary alphabet serves
    * every chunk of its stripe, so the vector-dictionary fill copies each
    * entry once per alphabet instance, not once per chunk. */
  lazy val entryArrays: Array[Array[Byte]] = Array.tabulate(len)(apply)
}

/** FSST-coded string chunk kept encoded until fill time (lazy column
  * materialization, reference: dwio/nimble/velox/selective/ColumnLoader.h:42
  * — defer decode until the column is actually needed): with a filter
  * selection present, only surviving rows ever decode their string. Null-free
  * chunks only; the Nullable wrapper scatters eagerly and falls back. */
final case class LazyFsstBytesCol(symbols: Array[Array[Byte]], enc: Array[Byte],
    encOffs: Array[Int]) extends Column {
  def len: Int = encOffs.length - 1
  def nulls: Array[Boolean] = null
  /** Decode row `i`, appending to `out`; returns the decoded length. */
  def decodeRow(i: Int, out: ByteSink): Int =
    Fsst.decode(symbols, enc, encOffs(i), encOffs(i + 1), out)
  /** Eager materialization (paths without a selection). */
  def expand: BytesCol = {
    val n = len
    val out = new ByteSink(enc.length * 2 + 64)
    val offs = new Array[Int](n + 1)
    var i = 0
    while (i < n) { offs(i + 1) = offs(i) + decodeRow(i, out); i += 1 }
    Fsst.decodedStrings.add(n.toLong)
    BytesCol(offs, out.toArray)
  }
}

/** Dictionary-preserved view of a bytes column: the DICT codec's alphabet and
  * index streams kept separate instead of expanded row-wise (reference:
  * dwio/nimble/velox/selective/StringColumnReader.cpp:330-504). String
  * predicates evaluate once per alphabet entry and rows check a boolean by
  * index; only surviving rows are ever materialized. Index values of null
  * rows are undefined (0). */
final case class DictBytesCol(alphabet: BytesCol, indices: Array[Int],
    nulls: Array[Boolean] = null) extends Column {
  def len: Int = indices.length

  /** Row-wise materialization (generic paths that need a flat BytesCol). */
  def expand: BytesCol = {
    val n = indices.length
    val offs = new Array[Int](n + 1)
    var i = 0
    while (i < n) {
      val e = indices(i)
      val l = if (nulls != null && nulls(i)) 0 else alphabet.offsets(e + 1) - alphabet.offsets(e)
      offs(i + 1) = offs(i) + l
      i += 1
    }
    val bytes = new Array[Byte](offs(n))
    i = 0
    while (i < n) {
      if (nulls == null || !nulls(i)) {
        val e = indices(i)
        System.arraycopy(alphabet.bytes, alphabet.offsets(e), bytes, offs(i),
          alphabet.offsets(e + 1) - alphabet.offsets(e))
      }
      i += 1
    }
    BytesCol(offs, bytes, nulls)
  }
}
