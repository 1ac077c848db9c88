package graft.spark

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.format._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{AlwaysTrue, DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** DataSource V2 connector for the graft tablet format:
  * `spark.read.format("nimble")` / `df.write.format("nimble")`.
  *
  * Spark-first equivalent of the reference's reader/writer surface
  * (reference: dwio/nimble/velox/VeloxReader.h:86-153,
  * velox/selective/SelectiveNimbleReader.h:23, writer/VeloxWriter.h:51):
  * column projection via SupportsPushDownRequiredColumns, predicate pushdown
  * evaluated during decode, stripe pruning from footer stats, columnar
  * batches into Spark's vectorized pipeline, per-task writers with bounded
  * memory. One InputPartition per stripe (stripe == split granularity, like a
  * Parquet row group).
  */
class NimbleSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nimble"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    if (p != null) p
    else {
      // `.load(dirA, dirB, ...)` (parquet parity): Spark ships the list as
      // a JSON string array under "paths"; join with NUL (impossible in a
      // filesystem path) — listFiles splits it back into roots
      val ps = options.get("paths")
      require(ps != null, "nimble: 'path' option required")
      val roots = NimbleSource.parseJsonStringArray(ps)
      require(roots.nonEmpty, "nimble: empty 'paths'")
      roots.mkString(NimbleSource.MultiPathSep)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = NimbleSource.listFiles(pathOf(options))
    // empty (e.g. a fresh streaming-sink dir): the write path supplies the
    // schema via LogicalWriteInfo; reads of an empty table see no columns
    if (files.isEmpty) return new StructType()
    // schema evolution (parquet parity): mergeSchema=true unions the fields
    // of every file's footer (first occurrence wins the type); files missing
    // a field read it as null. Default stays first-file (one footer read).
    // nested merge (parquet parity): struct/array/map types union their
    // children recursively — a struct column differing only by an added
    // nested field merges (the evolution read path null-fills the absent
    // child); genuinely conflicting LEAF types still fail fast, because
    // silently picking one type reads the other files' bytes as garbage
    def mergeType(path: String, a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (x: StructType, y: StructType) =>
        val out = scala.collection.mutable.LinkedHashMap[String, StructField]()
        for (f <- x.fields) out(f.name) = f.copy(nullable = true)
        for (f <- y.fields) out.get(f.name) match {
          case None => out(f.name) = f.copy(nullable = true)
          case Some(prev) => out(f.name) = prev.copy(
            dataType = mergeType(s"$path.${f.name}", prev.dataType, f.dataType))
        }
        StructType(out.values.toSeq)
      case (x: ArrayType, y: ArrayType) =>
        ArrayType(mergeType(s"$path.element", x.elementType, y.elementType),
          x.containsNull || y.containsNull)
      case (x: MapType, y: MapType) =>
        MapType(mergeType(s"$path.key", x.keyType, y.keyType),
          mergeType(s"$path.value", x.valueType, y.valueType),
          x.valueContainsNull || y.valueContainsNull)
      case _ => throw new IllegalArgumentException(
        s"nimble: mergeSchema: failed to merge incompatible data types for " +
          s"column '$path': ${a.simpleString} and ${b.simpleString}")
    }
    val base =
      if (options.getBoolean("mergeSchema", false)) {
        NimbleSource.prefetchFooters(files)
        val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
        for (f <- files;
             fld <- DataType.fromJson(NimbleSource.footerOf(f).schemaJson)
               .asInstanceOf[StructType].fields)
          fields.get(fld.name) match {
            case None => fields(fld.name) = fld.copy(nullable = true)
            case Some(prev) => fields(fld.name) = prev.copy(
              dataType = mergeType(fld.name, prev.dataType, fld.dataType))
          }
        StructType(fields.values.toSeq)
      } else DataType.fromJson(NimbleSource.footerOf(files.head).schemaJson).asInstanceOf[StructType]
    // FlatMap feature projection (SURVEY.md §2.2): option
    // flatMapStruct.<col> = "k1,k2" surfaces a flatmap-written map column as
    // struct<k1: V, k2: V>; only those key streams are read.
    var schema = base
    // unsigned import widening (SURVEY §1.2, parquet-reader parity): the
    // named stored columns carry unsigned bit patterns and surface widened
    // (u8->short, u16->int, u32->long, u64->decimal(20,0))
    val unsignedCols = NimbleSource.unsignedColsOf(options)
    if (unsignedCols.nonEmpty) {
      val missing = unsignedCols.diff(schema.fieldNames.toSet)
      require(missing.isEmpty, s"nimble: unsignedColumns: no such column(s) ${missing.mkString(",")}")
      schema = StructType(schema.fields.map(f =>
        if (unsignedCols(f.name)) f.copy(dataType = Fields.unsignedWidened(f.dataType)) else f))
    }
    options.asCaseSensitiveMap().forEach { (k, v) =>
      if (k.startsWith("flatMapStruct.")) {
        val colName = k.substring("flatMapStruct.".length)
        val keys = v.split(",").map(_.trim).filter(_.nonEmpty)
        schema = StructType(schema.fields.map { f =>
          if (f.name == colName) f.dataType match {
            case m: MapType =>
              f.copy(dataType = StructType(keys.map(key =>
                StructField(key, m.valueType, nullable = true))))
            case other => f
          } else f
        })
      }
    }
    schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NimbleTable(pathOf(new CaseInsensitiveStringMap(properties)), schema)
}

object NimbleSource {
  /** unsignedColumns read option as a set (shared by inferSchema + scan). */
  private[spark] def unsignedColsOf(options: CaseInsensitiveStringMap): Set[String] =
    Option(options.get("unsignedColumns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  /** `.gft` files under `path` — local or any Hadoop-FS URI (hdfs://, s3a://,
    * file://...). One listing RPC per directory; `_temporary` working dirs
    * are never visible (listing does not recurse). */
  /** Separator joining the roots of a multi-directory read
    * (`.load(dirA, dirB)`): NUL can't occur in a filesystem path, so a
    * joined spec never collides with a real directory. Read-only — writes
    * and row-level operations refuse multi-path tables. */
  private[spark] final val MultiPathSep = "\u0000"

  /** Human-readable form of a (possibly multi-path) table spec. */
  private[spark] def displayPath(path: String): String =
    path.replace(MultiPathSep, ",")

  /** Spark emits `.load(paths*)` as a JSON string array under "paths";
    * Jackson (already on Spark's classpath) parses it with strict JSON
    * semantics. */
  private[spark] def parseJsonStringArray(s: String): Seq[String] =
    try new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(s, classOf[Array[String]]).toSeq
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"nimble: malformed 'paths' option: $s", e)
    }

  def listFiles(path: String): Seq[String] = listMeta(path).map(_.path)

  /** Multi-path reads dedupe identical FILE paths across roots — an
    * INTENTIONAL divergence from Parquet, which reads `.load(dir, dir)`
    * twice: duplicate roots in a path list are a caller mistake (a config
    * merge, a glob overlap), and silently doubling every row is the worse
    * failure mode. Documented in README (multi-path reads). */
  def listMeta(path: String): Seq[GraftIO.FileMeta] =
    if (path.indexOf(MultiPathSep) < 0) GraftIO.listGft(path)
    else {
      val seen = scala.collection.mutable.LinkedHashMap[String, GraftIO.FileMeta]()
      for (root <- path.split(MultiPathSep); m <- GraftIO.listGft(root))
        seen.getOrElseUpdate(m.path, m)
      seen.values.toSeq
    }

  /** Last scan-planning outcome per table path (driver-side observability:
    * stripe pruning is invisible in partition counts once bin-packing merges
    * surviving stripes, so tools/tests read it here). */
  /** Per-JVM count of chunks skipped via chunk-frame stats (observability +
    * tests; mirrors the stripe-level PlanStats). */
  val chunksSkipped = new java.util.concurrent.atomic.AtomicLong()

  /** Per-JVM count of in-scan hash-index probes (index-assisted chunk
    * selection — SelectiveNimbleIndexReader in the DSv2 path). */
  val indexScanProbes = new java.util.concurrent.atomic.AtomicLong()
  /** Candidate chunk set for this stripe from the per-stripe indexes, or
    * null when no pushed filter can use one (reference:
    * velox/selective/SelectiveNimbleIndexReader.h:45-70 — here wired into
    * the production scan, not just the Lookup API).
    *
    *  - EqualTo/EqualNullSafe/In on a `#idx:`-indexed column: the sorted
    *    (hash, chunk<<32|row) run is binary-searched; a chunk absent from
    *    every probe provably holds no matching non-null row (collisions only
    *    ADD chunks; null keys cannot satisfy an equality).
    *  - Range filters on a `#sidx:`-indexed column: per-column bounds are
    *    COMBINED across the filter array first (a `between` arrives as two
    *    filters), then the sorted-key run brackets [lo, hi]; gated on
    *    estimated selectivity so a wide range doesn't pay the index read.
    *
    * Filter arrays AND together, so all candidate sets intersect. */
  def indexCandidateChunks(reader: Tablet.Reader, stripe: Int,
      filters: Array[Filter]): java.util.BitSet = {
    var result: java.util.BitSet = null
    def and(set: java.util.BitSet): Unit =
      if (result == null) result = set else result.and(set)

    // ---- equality probes against the hash index
    var fi = 0
    while (fi < filters.length) {
      val probe: Option[(String, Seq[Any])] = filters(fi) match {
        case org.apache.spark.sql.sources.EqualTo(c, v) => Some((c, Seq(v)))
        case org.apache.spark.sql.sources.EqualNullSafe(c, v) if v != null => Some((c, Seq(v)))
        case org.apache.spark.sql.sources.In(c, vs) if vs.length <= 64 => Some((c, vs.toSeq))
        case _ => None
      }
      probe match {
        case Some((c, vs)) if !reader.nanosSplit(c) =>
          val idxId = reader.keyId(Tablet.indexStreamKey(c))
          if (idxId >= 0 && reader.streamLoc(stripe, idxId).length > 0) {
            // long-backed integrals and strings/binary hash exactly like the
            // writer; any other probe type disables the index for this filter
            val hashes = vs.flatMap {
              case s: String => val b = s.getBytes("UTF-8"); Some(Tablet.hashBytesValue(b, 0, b.length))
              case b: Array[Byte] => Some(Tablet.hashBytesValue(b, 0, b.length))
              case n: Byte => Some(Tablet.hashLongValue(n.toLong))
              case n: Short => Some(Tablet.hashLongValue(n.toLong))
              case n: Int => Some(Tablet.hashLongValue(n.toLong))
              case n: Long => Some(Tablet.hashLongValue(n))
              case _ => None
            }
            if (hashes.length == vs.length) {
              indexScanProbes.incrementAndGet()
              val idx = new graft.format.ByteCursor(
                cachedIndexStream(reader, stripe, idxId, Tablet.indexStreamKey(c)))
              val count = idx.readInt()
              val base = idx.pos
              def hashAt(i: Int): Long = { idx.pos = base + 8 * i; idx.readLong() }
              def posAt(i: Int): Long = { idx.pos = base + 8 * count + 8 * i; idx.readLong() }
              val set = new java.util.BitSet()
              for (h <- hashes) {
                var lo = 0; var hi = count
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (hashAt(mid) < h) lo = mid + 1 else hi = mid
                }
                var i = lo
                while (i < count && hashAt(i) == h) { set.set((posAt(i) >>> 32).toInt); i += 1 }
              }
              and(set)
            }
          }
        case _ => ()
      }
      fi += 1
    }

    // ---- combined per-column range bounds against the sorted index.
    // Sort-key space is inclusive and conservative (the monotone key mapping
    // only ever ADDS boundary candidates): longs as-is, strings via the
    // order-preserving 8-byte prefix; None = unindexable bound type.
    def keyOf(v: Any): Option[Long] = v match {
      case n: Byte => Some(n.toLong); case n: Short => Some(n.toLong)
      case n: Int => Some(n.toLong); case n: Long => Some(n)
      case s: String => val b = s.getBytes("UTF-8"); Some(Tablet.bytesSortKey(b, 0, b.length))
      case _ => None
    }
    // col -> (combined lo key, combined hi key, usable)
    val bounds = scala.collection.mutable.LinkedHashMap[String, (Option[Long], Option[Long], Boolean)]()
    def tighten(c: String, lo: Any, hi: Any): Unit = {
      val (curLo, curHi, ok) = bounds.getOrElse(c, (None, None, true))
      val loK = Option(lo).map(keyOf); val hiK = Option(hi).map(keyOf)
      // a range bound of an unindexable type poisons the column's probe
      if (loK.contains(None) || hiK.contains(None)) { bounds(c) = (curLo, curHi, false); return }
      val newLo = (curLo ++ loK.flatten).reduceOption(_ max _)
      val newHi = (curHi ++ hiK.flatten).reduceOption(_ min _)
      bounds(c) = (newLo, newHi, ok)
    }
    filters.foreach {
      case org.apache.spark.sql.sources.GreaterThan(c, v) => tighten(c, v, null)
      case org.apache.spark.sql.sources.GreaterThanOrEqual(c, v) => tighten(c, v, null)
      case org.apache.spark.sql.sources.LessThan(c, v) => tighten(c, null, v)
      case org.apache.spark.sql.sources.LessThanOrEqual(c, v) => tighten(c, null, v)
      case _ => ()
    }
    for ((c, (loK, hiK, ok)) <- bounds if ok && (loK.isDefined || hiK.isDefined)
         if !reader.nanosSplit(c)) {
      val sidxId = reader.keyId(Tablet.sortedIndexStreamKey(c))
      if (sidxId >= 0 && reader.streamLoc(stripe, sidxId).length > 0) {
        val st = reader.streamStats(stripe, reader.keyId(c))
        // selectivity gate: skip the probe when the requested range covers
        // >25% of the stripe's key span (the index read would buy little)
        val selective = !st.hasMinMax || {
          val span = st.maxLong.toDouble - st.minLong.toDouble
          span <= 0 || {
            val l = loK.map(k => math.max(k.toDouble, st.minLong.toDouble)).getOrElse(st.minLong.toDouble)
            val h = hiK.map(k => math.min(k.toDouble, st.maxLong.toDouble)).getOrElse(st.maxLong.toDouble)
            (h - l) / span < 0.25
          }
        }
        if (selective) {
          indexScanProbes.incrementAndGet()
          val idx = new graft.format.ByteCursor(
            cachedIndexStream(reader, stripe, sidxId, Tablet.sortedIndexStreamKey(c)))
          val count = idx.readInt()
          val base = idx.pos
          def keyAt(i: Int): Long = { idx.pos = base + 8 * i; idx.readLong() }
          def posAt(i: Int): Long = { idx.pos = base + 8 * count + 8 * i; idx.readLong() }
          val from = loK match {
            case Some(k) =>
              var a = 0; var b = count
              while (a < b) { val mid = (a + b) >>> 1; if (keyAt(mid) < k) a = mid + 1 else b = mid }
              a
            case None => 0
          }
          val set = new java.util.BitSet()
          var i = from
          while (i < count && hiK.forall(keyAt(i) <= _)) { set.set((posAt(i) >>> 32).toInt); i += 1 }
          and(set)
        }
      }
    }

    // ---- composite index (#cidx:a+b...): an equality prefix over the
    // member columns plus an optional range on the next member probes the
    // memcomparable key run — `WHERE a = x AND b BETWEEN lo AND hi` in plain
    // SQL. Raw VALUES (not sort keys) feed KeyCodec: composite keys store
    // full encodings, so bracketing is exact (collision- and prefix-free).
    val eqVals: Map[String, Any] = filters.collect {
      case org.apache.spark.sql.sources.EqualTo(c, v) if v != null => c -> v
      case org.apache.spark.sql.sources.EqualNullSafe(c, v) if v != null => c -> v
    }.toMap
    def encodable(v: Any): Boolean = v match {
      case _: Byte | _: Short | _: Int | _: Long | _: String | _: Array[Byte] => true
      case _ => false
    }
    // combined raw-value bounds per column (byte-wise string order, matching
    // the key encoding; incomparable/unencodable bounds poison the column)
    def cmpVals(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Byte, _) => cmpVals(x.toLong, b)
      case (x: Short, _) => cmpVals(x.toLong, b)
      case (x: Int, _) => cmpVals(x.toLong, b)
      case (_, y: Byte) => cmpVals(a, y.toLong)
      case (_, y: Short) => cmpVals(a, y.toLong)
      case (_, y: Int) => cmpVals(a, y.toLong)
      case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
      case (x: String, y: String) =>
        val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
        Some(Tablet.compareBytes(xb, yb))
      case _ => None
    }
    val rawBounds = scala.collection.mutable.HashMap[String, (Any, Any, Boolean)]()
    def tightenRaw(c: String, lo: Any, hi: Any): Unit = {
      val (curLo, curHi, ok) = rawBounds.getOrElse(c, (null, null, true))
      if (!ok) return
      if ((lo != null && !encodable(lo)) || (hi != null && !encodable(hi))) {
        rawBounds(c) = (curLo, curHi, false); return
      }
      val newLo =
        if (lo == null) curLo
        else if (curLo == null) lo
        else cmpVals(lo, curLo) match {
          case Some(d) => if (d > 0) lo else curLo
          case None => rawBounds(c) = (curLo, curHi, false); return
        }
      val newHi =
        if (hi == null) curHi
        else if (curHi == null) hi
        else cmpVals(hi, curHi) match {
          case Some(d) => if (d < 0) hi else curHi
          case None => rawBounds(c) = (curLo, curHi, false); return
        }
      rawBounds(c) = (newLo, newHi, ok)
    }
    filters.foreach {
      case org.apache.spark.sql.sources.GreaterThan(c, v) => tightenRaw(c, v, null)
      case org.apache.spark.sql.sources.GreaterThanOrEqual(c, v) => tightenRaw(c, v, null)
      case org.apache.spark.sql.sources.LessThan(c, v) => tightenRaw(c, null, v)
      case org.apache.spark.sql.sources.LessThanOrEqual(c, v) => tightenRaw(c, null, v)
      case _ => ()
    }
    // composite discovery needs the stream-name list; on a wide SECTIONED
    // footer whose names aren't resident, skip it rather than fault in
    // O(table-width) metadata per task (hash/sorted probes above use keyId
    // bucket probes and are unaffected)
    val residentKeys = reader.footer.loadedStreamKeys
    if (residentKeys == null) return result
    for (key <- residentKeys if key.startsWith("#cidx:")) {
      val cols = key.substring("#cidx:".length).split('+').toSeq
      if (cols.forall(c => !reader.nanosSplit(c))) {
        var p = 0
        while (p < cols.length && eqVals.get(cols(p)).exists(encodable)) p += 1
        val eqPrefix = cols.take(p).map(eqVals)
        val range: Option[(Any, Any)] =
          if (p < cols.length) rawBounds.get(cols(p)).collect {
            case (lo, hi, true) if lo != null || hi != null => (lo, hi)
          } else None
        // a range-only probe (no equality prefix) gets the same selectivity
        // gate as the single-column sorted index; equality prefixes are
        // selective by construction
        val gateOk = eqPrefix.nonEmpty || range.exists { case (lo, hi) =>
          val st = reader.streamStats(stripe, reader.keyId(cols(0)))
          !st.hasMinMax || {
            val span = st.maxLong.toDouble - st.minLong.toDouble
            span <= 0 || {
              val l = Option(lo).flatMap(keyOf).map(k => math.max(k.toDouble, st.minLong.toDouble))
                .getOrElse(st.minLong.toDouble)
              val h = Option(hi).flatMap(keyOf).map(k => math.min(k.toDouble, st.maxLong.toDouble))
                .getOrElse(st.maxLong.toDouble)
              lo.isInstanceOf[String] || hi.isInstanceOf[String] || (h - l) / span < 0.25
            }
          }
        }
        if (gateOk && (eqPrefix.nonEmpty || range.isDefined)) {
          val cid = reader.keyId(key)
          if (cid >= 0 && reader.streamLoc(stripe, cid).length > 0) {
            val basePrefix = KeyCodec.encode(eqPrefix)
            def cat(v: Any): Array[Byte] = basePrefix ++ KeyCodec.encode(Seq(v))
            val loKey = range.flatMap(r => Option(r._1)).map(cat).getOrElse(basePrefix)
            val hiExcl = KeyCodec.prefixSuccessor(
              range.flatMap(r => Option(r._2)).map(cat).getOrElse(basePrefix))
            indexScanProbes.incrementAndGet()
            val idx = new graft.format.ByteCursor(
              cachedIndexStream(reader, stripe, cid, key))
            val count = idx.readInt()
            val posBase = idx.pos
            val offBase = posBase + 8 * count
            val bytesBase = offBase + 4 * (count + 1)
            def posAt(i: Int): Long = { idx.pos = posBase + 8 * i; idx.readLong() }
            def offAt(i: Int): Int = { idx.pos = offBase + 4 * i; idx.readInt() }
            def cmpKey(i: Int, t: Array[Byte]): Int = {
              val o = offAt(i); val e = offAt(i + 1)
              KeyCodec.compare(idx.buf, bytesBase + o, e - o, t, 0, t.length)
            }
            var a = 0; var b = count
            while (a < b) { val mid = (a + b) >>> 1; if (cmpKey(mid, loKey) < 0) a = mid + 1 else b = mid }
            val set = new java.util.BitSet()
            var i = a
            while (i < count && (hiExcl.isEmpty || cmpKey(i, hiExcl) < 0)) {
              set.set((posAt(i) >>> 32).toInt); i += 1
            }
            and(set)
          }
        }
      }
    }
    result
  }

  /** Per-JVM count of data chunks pruned by v14 directory stats BEFORE the
    * fetch (observability + tests — the stats-driven sparse-fetch signal,
    * distinct from decode-time chunk skipping). */
  val dirStatsChunksPruned = new java.util.concurrent.atomic.AtomicLong()

  /** Candidate data chunks from the v14 per-chunk directory stats: each
    * pushed (or stats-only) filter evaluates against every chunk's
    * min/max/nullCount straight from the stripe directory — so a selective
    * range predicate on sorted/z-ordered data restricts the FETCH to
    * surviving chunks' byte ranges, no hash index required (reference:
    * tablet/ChunkStats.fbs + index/ChunkStats.h — chunk stats pruning ahead
    * of ChunkedDecoder IO). Returns null when nothing prunes (no v14 dirs,
    * misaligned chunk grids, or every chunk survives) so callers pay zero
    * downstream cost on the common unselective scan.
    *
    * `totalChunks` is the stripe's data-chunk grid size (from the first
    * needed stream's directory); only columns whose directory has exactly
    * that many data frames participate — a late-registering stream with a
    * different grid is ignored, never trusted. */
  def chunkStatsCandidates(reader: Tablet.Reader, stripe: Int,
      filters: Array[Filter], totalChunks: Int, count: Boolean = true): java.util.BitSet = {
    if (totalChunks <= 0 || filters.isEmpty) return null
    val cols = filters.flatMap(_.references).distinct
    // per referenced column: its data frames' stats, ordinal-aligned and
    // nanos-scaled exactly like the stripe-level pruning path
    val chunkStats = scala.collection.mutable.HashMap[String, Array[Tablet.Stats]]()
    for (c <- cols) {
      val id = reader.keyId(c)
      if (id >= 0) {
        val dir = reader.chunkDirOf(stripe, id)
        if (dir != null) {
          val data = dir.filter(_.isData)
          if (data.length == totalChunks && data.exists(_.stats != null)) {
            val nanos = reader.keyId(c + "#nanos") >= 0
            chunkStats(c) = data.map { cl =>
              if (cl.stats == null) null
              else if (nanos) Tablet.nanosScaledStats(cl.stats) else cl.stats
            }
          }
        }
      } else {
        // flatmap feature path 'c.k': the fm value stream's chunk grid is
        // ordinal-aligned with the logical grid (absent-backfill invariant),
        // so its per-chunk stats prune the FETCH the same way — with the
        // +1/+1 count shift keeping null-test leaves sound vs absent keys
        val fmId = fmStreamCandidates(c, reader.footer.version >= 15)
          .map(reader.keyId).find(_ >= 0).getOrElse(-1)
        if (fmId >= 0) {
          val dir = reader.chunkDirOf(stripe, fmId)
          if (dir != null) {
            val data = dir.filter(_.isData)
            if (data.length == totalChunks && data.exists(_.stats != null)) {
              chunkStats(c) = data.map { cl =>
                if (cl.stats == null) null
                else cl.stats.copy(valueCount = cl.stats.valueCount + 1,
                  nullCount = cl.stats.nullCount + 1)
              }
            }
          }
        }
      }
    }
    if (chunkStats.isEmpty) return null
    val set = new java.util.BitSet(totalChunks)
    var prunedCount = 0
    var d = 0
    while (d < totalChunks) {
      val statsOf: String => Option[Tablet.Stats] =
        c => chunkStats.get(c).flatMap(a => Option(a(d)))
      var pruned = false
      var fi = 0
      while (fi < filters.length && !pruned) {
        if (Filters.pruneStripe(filters(fi), statsOf, _ => None)) pruned = true
        fi += 1
      }
      if (pruned) prunedCount += 1 else set.set(d)
      d += 1
    }
    if (prunedCount == 0) null
    else {
      // `count = false` on the prefetch recomputation: the in-task reader
      // computes the same set and bumps the counter — double-bumping would
      // inflate the stats-pruning observability signal up to 2x
      if (count) dirStatsChunksPruned.addAndGet(prunedCount.toLong)
      set
    }
  }

  /** Hash-bucket function shared by the write path (per-row declaration
    * check), the read path (partition grouping) and [[NimbleCatalog]]'s
    * `bucket` FunctionCatalog entry: EXACTLY Spark HashPartitioning's
    * partition-id expression — pmod(murmur3_32 folded over the key columns
    * from seed 42, numBuckets), null columns contributing nothing — so a
    * clustered write's partition id IS the bucket id and a storage-
    * partitioned join matches Spark's own shuffle placement. */
  def bucketHash(row: InternalRow, idxs: Array[Int], dts: Array[DataType]): Int = {
    var h = 42
    var i = 0
    while (i < idxs.length) {
      if (!row.isNullAt(idxs(i)))
        h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(row.get(idxs(i), dts(i)), dts(i), h.toLong).toInt
      i += 1
    }
    h
  }
  def pmod(h: Int, n: Int): Int = { val m = h % n; if (m < 0) m + n else m }

  /** Bucket declaration of a table directory: Some((cols, n)) iff EVERY
    * file declares the same spec with a valid bucket id — one undeclared or
    * disagreeing file (e.g. a plain append into a bucketed table) voids the
    * property for the whole table, because a missed row would silently
    * break a shuffle-free join. */
  def bucketSpecOf(files: Seq[String]): Option[(Seq[String], Int)] = {
    if (files.isEmpty) return None
    val head = footerOf(files.head)
    if (head.numBucketsSpec <= 0) return None // common case: one footer read
    val spec = (head.bucketColumns, head.numBucketsSpec)
    // spec validation walks every footer — parallel batches keep a large
    // bucketed table's plan latency (and the bounded cache) in check
    val ok = new java.util.concurrent.atomic.AtomicBoolean(true)
    for (batch <- files.grouped(PlanBatchFiles) if ok.get()) {
      foreachParallel(batch) { f =>
        if (ok.get()) { // short-circuit inside the batch too: one mismatch
          val ft = footerOf(f) // ends validation, no point reading the rest
          if (!(ft.numBucketsSpec == spec._2 && ft.bucketColumns == spec._1 &&
              ft.bucketId >= 0 && ft.bucketId < ft.numBucketsSpec)) ok.set(false)
        }
      }
    }
    if (ok.get()) Some(spec) else None
  }

  /** Files per planning batch: footer prefetch, directory warm and stripe
    * pruning run batch-wise so a 10^6-file plan holds one batch of footers
    * live (the bounded cache never thrashes mid-plan). */
  final val PlanBatchFiles = 8192

  /** Files that can hold rows matching the conjunctive `filters`, by bucket
    * id: an EqualTo/EqualNullSafe/In on THE single bucket column maps its
    * value(s) through [[bucketHash]] to the only admissible bucket set; the
    * tightest such filter wins (they are ANDed). Returns `files` unchanged
    * when no filter names the bucket column, the table is not uniformly
    * bucketed, or the column is unsigned-widened (scan values differ from
    * stored hash domain). Null-safe: EqualTo/In match no null rows, so the
    * value buckets alone suffice; EqualNullSafe(null) maps to the seed
    * bucket, where the clustered write placed null keys. */
  def bucketPrunedFiles(files: Seq[String], filters: Array[Filter],
      schema: StructType, unsignedCols: Set[String]): Seq[String] = {
    if (filters.isEmpty) return files
    val spec = bucketSpecOf(files) match {
      case Some((Seq(bc), n)) if !unsignedCols.contains(bc) => (bc, n)
      case _ => return files
    }
    val (bc, n) = spec
    val dt = schema.fields.find(_.name == bc).map(_.dataType).getOrElse(return files)
    def bucketOf(v: Any): Int = {
      val cat = org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v)
      pmod(if (cat == null) 42
      else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(cat, dt, 42L).toInt, n)
    }
    import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, In}
    val sets = filters.collect {
      case EqualTo(`bc`, v) if v != null => Set(bucketOf(v))
      case EqualNullSafe(`bc`, v) => Set(bucketOf(v))
      case In(`bc`, vs) => vs.iterator.filter(_ != null).map(bucketOf).toSet
    }
    if (sets.isEmpty) return files
    val allowed = sets.reduce(_ intersect _)
    // batch-prefetch the footers the filter reads: under the bounded cache
    // a serial footerOf walk would re-read most of a 10^6-file bucketed
    // table one blocking range-read at a time
    files.grouped(PlanBatchFiles).flatMap { b =>
      prefetchFooters(b)
      b.filter(f => allowed.contains(footerOf(f).bucketId))
    }.toSeq
  }

  /** File-level null count of `col`, if knowable from metadata: a file
    * without the column stream holds only nulls (rowCount); otherwise the
    * file stats answer; None when stats are unavailable (the null-aware
    * TopN combos then refuse). */
  def fileNullCount(file: String, col: String): Option[Long] = {
    val footer = footerOf(file)
    val r = new Tablet.Reader(file, footer)
    try {
      if (r.keyId(col) < 0) Some(footer.rowCount)
      else r.fileStatsOf(col).map(_.nullCount)
    } finally r.close()
  }

  /** Plan-time fence for the TopN pushdown's sorted-by declaration: with
    * ascending-nulls-first order, a file's stripes must be (all-null)*,
    * at most one mixed stripe, then null-free stripes whose per-stripe
    * [min,max] ranges are non-decreasing (stripe i's min >= stripe i-1's
    * max). O(stripes) over cached directory metadata; a contradiction means
    * the declaration is wrong and the pushdown must not fire. A file
    * without the column stream holds only nulls for it — trivially sorted. */
  def stripeStatsMonotone(file: String, col: String): Boolean = {
    val footer = footerOf(file)
    val r = new Tablet.Reader(file, footer)
    try {
      val id = r.keyId(col)
      if (id < 0) return true
      var prev: Tablet.Stats = null
      var sawNonNull = false
      var s = 0
      while (s < footer.stripes.length) {
        val st = r.streamStats(s, id)
        val hasNulls = st.nullCount > 0
        val hasValues = st.hasMinMax
        if (hasNulls && sawNonNull) return false // nulls after values: not nulls-first
        if (hasValues) {
          if (prev != null && statsCompareMaxMin(prev, st) > 0) return false
          prev = st
          sawNonNull = true
        }
        s += 1
      }
      true
    } finally r.close()
  }

  /** prev.max vs cur.min in the column's physical domain (>0 = out of order). */
  private def statsCompareMaxMin(prev: Tablet.Stats, cur: Tablet.Stats): Int =
    if (prev.minBytes != null || cur.minBytes != null) {
      if (prev.maxBytes == null || cur.minBytes == null) 0 // mixed domains: inconclusive, allow
      else Tablet.compareBytes(prev.maxBytes, cur.minBytes)
    } else if (prev.kind == PhysType.F32 || prev.kind == PhysType.F64)
      java.lang.Double.compare(prev.maxDouble, cur.minDouble)
    else java.lang.Long.compare(prev.maxLong, cur.minLong)

  case class PlanStats(stripesPlanned: Int, stripesPruned: Long)
  private val planStats = new java.util.concurrent.ConcurrentHashMap[String, PlanStats]()
  def recordPlan(path: String, planned: Int, pruned: Long): Unit = {
    // bound the path universe (a long-lived driver planning over ephemeral
    // temp tables must not accumulate entries forever; entries are tiny, so
    // a rare clear loses only observability history)
    if (planStats.size() >= 65536) planStats.clear()
    planStats.put(path, PlanStats(planned, pruned))
  }
  def lastPlanStats(path: String): Option[PlanStats] = Option(planStats.get(path))

  /** Conservative combined-value bounds for a TimestampMicroNano split
    * column (see [[Tablet.nanosScaledStats]] — saturating, so extreme micros
    * cannot wrap and invert the bounds). Blooms hash micros values and are
    * suppressed instead. */
  private[spark] def nanosScaledStats(st: Tablet.Stats): Tablet.Stats =
    Tablet.nanosScaledStats(st)

  /** Stripe-prune stats for a pushed DOTTED path with no stream of its own
    * (r17). Two shapes land here:
    *  - a FLATMAP feature projection 'c.k': the per-key value stream
    *    'c#fm:k' bounds the present non-null values, and the logical column
    *    is NULL wherever the key is absent — so counts rebase on stripe
    *    rows (nulls' = explicit + absent). A selective probe on a feature
    *    column then prunes stripes like any scalar (the 100 TB ML-scan
    *    shape; previously it full-scanned).
    *  - a schema-evolved or never-seen child under an existing parent
    *    anchor: no stream serves the path, the reader null-fills — the
    *    column is all-null in this stripe, which IsNotNull-style conjuncts
    *    prune outright. Guarded to parents that shred per child (struct or
    *    flatmap): a '#len' (plain map) or '#idx' (dict-array/dedup-map)
    *    parent stores children out-of-band, so no all-null conclusion.
    * Conservative None anywhere else. */
  private[spark] def dottedChildStats(r: Tablet.Reader, s: Int, name: String,
      stripeRows: Long): Option[Tablet.Stats] = {
    // pass 1 — EVERY split is checked for a flatmap value stream before any
    // all-null conclusion (r17 ADVICE: an early anchor return at the first
    // split would shadow a deeper flatmap, e.g. 'a#nulls' hiding 'a.b#fm:c'
    // for path a.b.c, and wrongly prune live rows)
    var anchored = false
    var dot = name.indexOf('.')
    while (dot > 0) {
      val c = name.substring(0, dot)
      // v15+: stream names store the escaped key form (keep in lockstep
      // with fmStreamCandidates — this loop interleaves the per-split
      // anchor checks below, so it builds its candidate inline)
      val k = if (r.footer.version >= 15)
        graft.format.Fields.escapeFmKey(name.substring(dot + 1))
      else name.substring(dot + 1)
      val fmId = r.keyId(s"$c#fm:$k")
      if (fmId >= 0) {
        val st = r.streamStats(s, fmId)
        return Some(st.copy(valueCount = stripeRows,
          nullCount = st.nullCount + (stripeRows - st.valueCount)))
      }
      if (r.keyId(s"$c#nulls") >= 0 && r.keyId(s"$c#len") < 0 && r.keyId(s"$c#idx") < 0)
        anchored = true
      dot = name.indexOf('.', dot + 1)
    }
    // pass 2 — all-null synthesis needs a per-child-shredding anchor on the
    // prefix chain AND no stream serving the path or anything under it (the
    // prefix walk is a schema-evolution rarity, never the flatmap hot path,
    // so the O(streams) key listing is acceptable here)
    if (anchored && !r.keyProbe.withPrefix(name).exists(sk =>
        sk.length == name.length ||
          sk.charAt(name.length) == '.' || sk.charAt(name.length) == '#'))
      Some(Tablet.Stats(valueCount = stripeRows, nullCount = stripeRows))
    else None
  }

  /** Driver-side footer cache (reference: dwio/nimble/tablet/MetadataCache.h).
    * BOUNDED: a 100 TB table has 10^5-10^6 files and a footer (stripe
    * stats, chunk directories, NDV registers) runs KBs to tens of KBs — an
    * unbounded map would hold GBs on a long-lived driver. Approximate LRU:
    * entries carry an access tick; crossing the cap evicts the
    * least-recently-used quarter in one sweep. Planning batches its file
    * loop (see [[prefetchFooters]] callers) so one plan never needs more
    * live footers than a batch. */
  private final class CachedFooter(val mtime: Long, val footer: Tablet.Footer) {
    val tick = new java.util.concurrent.atomic.AtomicLong()
  }
  private val footerClock = new java.util.concurrent.atomic.AtomicLong()
  private val footerCache = new java.util.concurrent.ConcurrentHashMap[String, CachedFooter]()
  @volatile private var footerCacheCapV: Int = -1
  private def confFooterCap(): Int = {
    val v = try {
      org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.scan.footerCacheEntries", DefaultFooterCacheEntries.toString).toInt
    } catch { case _: Throwable => DefaultFooterCacheEntries }
    math.max(v, 1024)
  }
  private def footerCacheCap: Int = {
    if (footerCacheCapV > 0) return footerCacheCapV
    footerCacheCapV = confFooterCap()
    footerCacheCapV
  }
  /** Test hooks: force a tiny cap to exercise eviction; report live size. */
  private[graft] def setFooterCacheCapForTest(n: Int): Unit = footerCacheCapV = n
  private[graft] def footerCacheSize: Int = footerCache.size()
  /** Default bound for [[footerCache]] — must stay >= [[PlanBatchFiles]] so
    * a batched plan holds one batch of footers live with zero mid-plan
    * eviction (PlanScaleSpec pins the inequality). */
  private[graft] final val DefaultFooterCacheEntries = 65536
  /** Cache-miss footer reads / eviction-sweep removals since JVM start
    * (PlanScaleSpec: a plan over N files loads each footer exactly once and
    * evicts nothing at the default cap). */
  private[graft] val footerLoads = new java.util.concurrent.atomic.AtomicLong()
  private[graft] val footerEvictions = new java.util.concurrent.atomic.AtomicLong()
  def footerOf(file: String): Tablet.Footer = {
    val mtime = GraftIO.status(file).mtime
    val cached = footerCache.get(file)
    if (cached != null && cached.mtime == mtime) {
      cached.tick.set(footerClock.incrementAndGet())
      return cached.footer
    }
    val r = new Tablet.Reader(file)
    try {
      footerLoads.incrementAndGet()
      val cf = new CachedFooter(mtime, r.footer)
      cf.tick.set(footerClock.incrementAndGet())
      if (footerCache.size() >= footerCacheCap) {
        // re-read the conf at sweep time (rare) so an operator shrinking
        // spark.graft.scan.footerCacheEntries on a live driver takes effect
        // without a JVM restart (test overrides below the floor stay pinned)
        if (footerCacheCapV >= 1024) footerCacheCapV = confFooterCap()
        // one O(n) sweep evicts the oldest quarter (rare: once per cap/4
        // distinct-file insertions) — never clear(): a planning loop mid-
        // table would otherwise re-read every footer it just prefetched
        val entries = new java.util.ArrayList[(String, Long)](footerCache.size())
        footerCache.forEach((k, v) => { entries.add((k, v.tick.get())); () })
        entries.sort((a, b) => java.lang.Long.compare(a._2, b._2))
        var i = 0
        val evict = entries.size() / 4 + 1
        while (i < evict) { footerCache.remove(entries.get(i)._1); i += 1 }
        footerEvictions.addAndGet(evict.toLong)
      }
      footerCache.put(file, cf)
      r.footer
    } finally r.close()
  }

  /** Bounded pool for planning-time footer I/O: a cold 100 TB table has
    * 10^5-10^6 files, and each footer read is an open+seek+parse round-trip —
    * serializing them on the driver delays the first task by minutes (the
    * parquet reader does footers in tasks; a driver pool is the same
    * parallelism without an extra job). Daemon threads; shared per JVM. */
  private lazy val footerPool = java.util.concurrent.Executors.newFixedThreadPool(16,
    (r: Runnable) => { val t = new Thread(r, "graft-footer-io"); t.setDaemon(true); t })

  /** Warm the footer cache for `files` in parallel; later `footerOf` calls
    * are cache hits. No-op for already-cached files. */
  def prefetchFooters(files: Seq[String]): Unit = if (files.length > 1) {
    foreachParallel(files)(f => { footerOf(f); () })
  }

  /** Run `body` over `items` on the driver-side I/O pool, propagating the
    * first failure. Single-item (and empty) inputs run inline. Used for
    * footer prefetch and commit renames — any driver-side per-file RPC that
    * must not serialize at 10^5+ files. */
  def foreachParallel[A](items: Seq[A])(body: A => Unit): Unit =
    if (items.length <= 1) items.foreach(body)
    else {
      val tasks = items.map { it =>
        new java.util.concurrent.Callable[Unit] { def call(): Unit = body(it) }
      }
      footerPool.invokeAll(scala.jdk.CollectionConverters.SeqHasAsJava(tasks).asJava)
        .forEach(fut => fut.get()) // propagate the first failure
    }

  // ------------------------------------------------ stream I/O + prefetch

  /** Executor-side pool overlapping the NEXT stripe's stream I/O with the
    * current stripe's decode (UnitLoader analog — reference:
    * velox/VeloxReader.h:69, docs/develop/velox_cache_and_nimble_datapath.rst:
    * the next load unit's streams load while the current one decodes). One
    * ahead per task; on remote storage (S3A) this hides a full round-trip
    * per stripe. Daemon threads, shared per executor JVM. */
  private lazy val streamPool = java.util.concurrent.Executors.newFixedThreadPool(
    math.max(2, Runtime.getRuntime.availableProcessors() / 2),
    (r: Runnable) => { val t = new Thread(r, "graft-stream-io"); t.setDaemon(true); t })

  /** Test hook: simulated per-stripe fetch latency (a remote-FS stand-in for
    * the overlap spec); 0 in production. */
  @volatile private[graft] var testFetchDelayMs: Int = 0
  /** Per-JVM count of stripe opens served from a completed prefetch. */
  private[graft] val prefetchHits = new java.util.concurrent.atomic.AtomicLong()

  /** Leaf stream keys a scan of (`required`, `filters`) needs — shared by
    * the in-task reader and the prefetch path, which must agree exactly. */
  private[spark] def neededStreamKeys(footerKeySet: Fields.KeyProbe, dataSchema: StructType,
      required: StructType, filters: Array[Filter]): Array[String] = {
    val filterCols = filters.flatMap(_.references).distinct
      .filterNot(c => required.fieldNames.contains(c))
    (required.fields.flatMap { f =>
      val ks = Fields.neededKeys(f.name, f.dataType, footerKeySet)
      // schema evolution: a field with NO streams in this file reads as
      // all-null (parquet semantics); partially-present fields keep all
      // their keys so the fetch fails loud on a genuinely corrupt layout
      if (ks.exists(footerKeySet(_))) ks else Nil
    } ++
      filterCols.filter(footerKeySet(_))
        .flatMap(c => Fields.neededKeys(c, dataSchema(c).dataType, footerKeySet))).distinct
  }

  /** Leaf stream keys the FILTER phase of a scan needs — pushed-filter
    * references plus stats-only (nested-leaf) pruning streams. The batch
    * reader fetches these EAGERLY and defers every projected-only stream
    * until a chunk actually survives, so a stripe whose chunks the cascade
    * kills outright never pays the projected columns' IO at all (the
    * selective-reader idea applied at the fetch layer — at 100 TB a
    * selective probe reads the key stream, not the table). Must agree
    * exactly between the in-task reader and the prefetch path. */
  private[spark] def filterStreamKeys(footerKeySet: Fields.KeyProbe, dataSchema: StructType,
      filters: Array[Filter], statsOnly: Array[Filter]): Set[String] =
    (filters.flatMap(_.references).distinct
      .filter(c => dataSchema.fieldNames.contains(c))
      .flatMap(c => Fields.neededKeys(c, dataSchema(c).dataType, footerKeySet)) ++
      statsOnly.flatMap(_.references).distinct
        .flatMap(p => Seq(p, p + "#nanos") ++ fmStreamCandidates(p, footerKeySet.escaped)))
      .filter(footerKeySet(_)).toSet

  /** Dotted filter path → flatmap value-stream key candidates ('c.k' →
    * 'c#fm:k' for every dot split; flatmap keys may themselves contain
    * dots). Existence filtering is the caller's job. */
  private[spark] def fmStreamCandidates(p: String, escaped: Boolean): Seq[String] = {
    // per-file VERSION-GATED key form: inside a v15 file the RAW form of a
    // '#'-bearing logical key can collide with the ESCAPED form of a
    // SIBLING key (raw "x##y" = escaped "x#y"), so emitting both forms and
    // existence-filtering would let the wrong key's stats drive pruning —
    // the form must match the file's own convention, exactly like the
    // dotted-stats path above
    if (p.indexOf('.') < 0) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var dot = p.indexOf('.')
    while (dot > 0) {
      val k0 = p.substring(dot + 1)
      val k = if (escaped) graft.format.Fields.escapeFmKey(k0) else k0
      out += p.substring(0, dot) + "#fm:" + k
      dot = p.indexOf('.', dot + 1)
    }
    out.toSeq
  }

  /** Per-chunk stats for a dotted flatmap-feature path, from the fm value
    * stream's frame/directory stats via `peek`. Counts shift +1/+1 so
    * null-test pruning stays sound against absent keys (logical NULLs the
    * fm stream's counts cannot see): IsNull never prunes, IsNotNull still
    * prunes exactly the no-present-non-null chunks, min/max stay
    * authoritative for the comparison leaves. */
  private[spark] def fmMappedStats(name: String, escaped: Boolean,
      peek: String => Option[Tablet.Stats]): Option[Tablet.Stats] = {
    for (k <- fmStreamCandidates(name, escaped); st <- peek(k))
      return Some(st.copy(valueCount = st.valueCount + 1, nullCount = st.nullCount + 1))
    None
  }

  /** Stream payload bytes fetched from the filesystem by
    * [[readNeededStreams]] (cache hits excluded) — the deferred-fetch
    * observability counter. */
  val streamBytesFetched = new java.util.concurrent.atomic.AtomicLong()

  /** Deferral engages only when the cold-start pass-rate estimate says
    * whole chunks are likely to die (expected survivors per 16K-row chunk
    * ~<= 1.6): point probes defer their projected IO; ordinary range scans,
    * whose chunks almost always keep survivors, keep the single coalesced
    * read per stripe. */
  private[spark] final val DeferSeedMax = 1e-4

  /** The cold-start survival estimate for (filters) over this file — one
    * throwaway [[FilterCascade]] so the reader and the prefetch path make
    * the IDENTICAL deferral decision from the identical inputs. */
  private[spark] def seedPassRateOf(reader: Tablet.Reader, dataSchema: StructType,
      filters: Array[Filter]): Double = {
    val probe = reader.keyProbe
    new FilterCascade(filters, n => dataSchema(n).dataType,
      c => reader.keyId(c) >= 0,
      c => reader.fileStatsOf(c).map { st =>
        if (probe(c + "#nanos")) nanosScaledStats(st) else st
      },
      c => reader.footer.ndvSketches.get(c).map(graft.format.Hll.estimate)).seedPassRate
  }

  /** Column types whose footer stats feed CBO column statistics. */
  private[spark] def cboEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType => true
    case _ => false // strings/binary: truncated bounds; nested: no stats
  }

  /** Catalyst-typed min/max for CBO from merged footer stats (None when the
    * physical representation cannot be mapped exactly). */
  private[spark] def cboMinMax(dt: DataType, m: Tablet.Stats): (Option[Any], Option[Any]) = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (Some(java.lang.Long.valueOf(m.minLong)), Some(java.lang.Long.valueOf(m.maxLong)))
    case IntegerType | DateType =>
      (Some(java.lang.Integer.valueOf(m.minLong.toInt)), Some(java.lang.Integer.valueOf(m.maxLong.toInt)))
    case ShortType =>
      (Some(java.lang.Short.valueOf(m.minLong.toShort)), Some(java.lang.Short.valueOf(m.maxLong.toShort)))
    case ByteType =>
      (Some(java.lang.Byte.valueOf(m.minLong.toByte)), Some(java.lang.Byte.valueOf(m.maxLong.toByte)))
    case DoubleType =>
      (Some(java.lang.Double.valueOf(m.minDouble)), Some(java.lang.Double.valueOf(m.maxDouble)))
    case FloatType =>
      (Some(java.lang.Float.valueOf(m.minDouble.toFloat)), Some(java.lang.Float.valueOf(m.maxDouble.toFloat)))
    case _ => (None, None)
  }

  /** All-null column of `n` rows — the decoded shape of a field absent from
    * a file (schema evolution): predicates and vector fills treat it like
    * any nullable column. */
  private[spark] def nullColumn(dt: DataType, n: Int): graft.format.Column = {
    val nulls = Array.fill(n)(true)
    dt match {
      case StringType | BinaryType =>
        graft.format.BytesCol(new Array[Int](n + 1), Array.empty[Byte], nulls)
      case DoubleType => graft.format.DoublesCol(new Array[Double](n), isFloat = false, nulls)
      case FloatType => graft.format.DoublesCol(new Array[Double](n), isFloat = true, nulls)
      case BooleanType => graft.format.BoolsCol(new Array[Boolean](n), nulls)
      case _ => graft.format.LongsCol(new Array[Long](n), graft.format.PhysType.I64, nulls)
    }
  }

  /** Fetch the named streams of one stripe through an existing reader,
    * serving from the executor-local [[BlockCache]] when possible. */
  /** Positioned reads issued by the coalescing stream fetch (observability +
    * tests: a k-column projection over contiguous streams must cost one). */
  val streamReadOps = new java.util.concurrent.atomic.AtomicLong()

  /** Max gap (bytes) bridged when merging adjacent stream ranges into one
    * positioned read. On object stores a round trip costs ~ms while 128 KB
    * of discarded gap bytes cost ~µs of bandwidth; 0 disables merging.
    * Re-read per scan (like BlockCache.confLong) so session conf changes —
    * including 0 to disable — take effect without a JVM restart. */
  private def ioMergeGap: Long =
    BlockCache.confLongPub("spark.graft.scan.ioMergeGapBytes", 128L << 10)

  /** A coalesced run never exceeds this (readRange allocates one array and
    * takes an Int length; also bounds transient fetch memory). */
  private final val MaxRunBytes: Long = 64L << 20

  private[spark] def readNeededStreams(reader: Tablet.Reader, stripe: Int,
      keys: Array[String], file: String): Map[String, Array[Byte]] = {
    if (testFetchDelayMs > 0) Thread.sleep(testFetchDelayMs.toLong)
    val meta = if (BlockCache.enabled) BlockCache.metaOf(file) else null
    val out = scala.collection.mutable.HashMap[String, Array[Byte]]()
    // split cached / to-fetch first, so merged reads cover only real misses
    var want = List.empty[(String, Tablet.StreamLoc, BlockCache.Key)]
    for (k <- keys) {
      val id = reader.keyId(k)
      require(id >= 0, s"nimble: stream $k not found in $file")
      val loc = reader.streamLoc(stripe, id)
      val ck = if (meta != null) BlockCache.Key(file, meta.mtime, meta.length, stripe, k) else null
      val hit = if (ck != null) BlockCache.peek(ck) else null
      if (hit != null) out(k) = hit else want ::= ((k, loc, ck))
    }
    if (want.nonEmpty) {
      // coalesce adjacent ranges (stripe streams are laid out back-to-back
      // in flush order): one positioned read per contiguous run — a k-column
      // projection costs one round trip, not k, on remote storage
      val gap = ioMergeGap
      val sorted = want.toArray.sortBy(_._2.offset)
      var i = 0
      while (i < sorted.length) {
        val runStart = sorted(i)._2.offset
        var end = runStart + sorted(i)._2.length
        var j = i
        while (j + 1 < sorted.length && {
          val nxt = sorted(j + 1)._2
          nxt.offset - end <= gap &&
            math.max(end, nxt.offset + nxt.length) - runStart <= MaxRunBytes
        }) {
          j += 1
          end = math.max(end, sorted(j)._2.offset + sorted(j)._2.length)
        }
        streamReadOps.incrementAndGet()
        val run = reader.readRange(runStart, (end - runStart).toInt)
        var m = i
        while (m <= j) {
          val (k, loc, ck) = sorted(m)
          val slice = java.util.Arrays.copyOfRange(run,
            (loc.offset - runStart).toInt, (loc.offset - runStart + loc.length).toInt)
          out(k) = slice
          streamBytesFetched.addAndGet(slice.length.toLong)
          if (ck != null) BlockCache.put(ck, slice)
          m += 1
        }
        i = j + 1
      }
    }
    out.toMap
  }

  /** Candidate-chunk stream fetch (v13 chunk directories — reference:
    * tablet/ChunkStatsWriter.h:80-89, the chunk-level position index): for
    * each stream whose directory aligns with the candidate bitmap's chunk
    * count, read ONLY the byte ranges of candidate data frames (plus every
    * shared-dict alphabet frame preceding the last one); streams without a
    * directory — pre-v13 files, late-registering flatmap keys — read whole.
    * Adjacent ranges coalesce into single positioned reads exactly like the
    * dense path. Returns (bytes, present) per key; present null = dense
    * whole-stream buffer (cache hit or fallback). At 100 TB this is the
    * difference between a point probe reading ~a chunk per stream and
    * reading the stripe. */
  private[spark] def readNeededStreamsSparse(reader: Tablet.Reader, stripe: Int,
      keys: Array[String], file: String, candidates: java.util.BitSet,
      totalChunks: Int): Map[String, (Array[Byte], Array[Boolean])] = {
    final case class Piece(key: String, abs: Long, len: Int, dest: Int)
    val meta = if (BlockCache.enabled) BlockCache.metaOf(file) else null
    val out = scala.collection.mutable.HashMap[String, (Array[Byte], Array[Boolean])]()
    val pieces = scala.collection.mutable.ArrayBuffer[Piece]()
    val bufs = scala.collection.mutable.HashMap[String, Array[Byte]]()
    var denseKeys = List.empty[String]
    for (k <- keys) {
      val id = reader.keyId(k)
      require(id >= 0, s"nimble: stream $k not found in $file")
      val loc = reader.streamLoc(stripe, id)
      val ck = if (meta != null) BlockCache.Key(file, meta.mtime, meta.length, stripe, k) else null
      val hit = if (ck != null) BlockCache.peek(ck) else null
      if (hit != null) out(k) = (hit, null)
      else {
        val dir = reader.chunkDirOf(stripe, id)
        if (dir == null || dir.count(_.isData) != totalChunks) denseKeys ::= k
        else {
          val present = new Array[Boolean](totalChunks)
          val include = new Array[Boolean](dir.length)
          var lastIncluded = -1
          var d = 0
          var fi = 0
          while (fi < dir.length) {
            if (dir(fi).isData) {
              if (candidates.get(d)) { include(fi) = true; present(d) = true; lastIncluded = fi }
              d += 1
            }
            fi += 1
          }
          // alphabet frames strictly before the last included data frame:
          // each included chunk decodes through the latest alphabet before it
          fi = 0
          while (fi < math.max(lastIncluded, 0)) {
            if (!dir(fi).isData) include(fi) = true
            fi += 1
          }
          def frameEnd(i: Int): Long =
            if (i + 1 < dir.length) dir(i + 1).offset else loc.length
          var size = 0
          fi = 0
          while (fi < dir.length) {
            if (include(fi)) size += (frameEnd(fi) - dir(fi).offset).toInt
            fi += 1
          }
          val buf = new Array[Byte](size)
          bufs(k) = buf
          out(k) = (buf, present)
          var dest = 0
          fi = 0
          while (fi < dir.length) {
            if (include(fi)) {
              val len = (frameEnd(fi) - dir(fi).offset).toInt
              pieces += Piece(k, loc.offset + dir(fi).offset, len, dest)
              dest += len
            }
            fi += 1
          }
        }
      }
    }
    if (denseKeys.nonEmpty)
      for ((k, b) <- readNeededStreams(reader, stripe, denseKeys.toArray, file))
        out(k) = (b, null)
    if (pieces.nonEmpty) {
      val gap = ioMergeGap
      val sorted = pieces.toArray.sortBy(_.abs)
      var i = 0
      while (i < sorted.length) {
        val runStart = sorted(i).abs
        var end = runStart + sorted(i).len
        var j = i
        while (j + 1 < sorted.length && {
          val nx = sorted(j + 1)
          nx.abs - end <= gap && math.max(end, nx.abs + nx.len) - runStart <= MaxRunBytes
        }) {
          j += 1
          end = math.max(end, sorted(j).abs + sorted(j).len)
        }
        streamReadOps.incrementAndGet()
        val run = reader.readRange(runStart, (end - runStart).toInt)
        var m = i
        while (m <= j) {
          val pc = sorted(m)
          System.arraycopy(run, (pc.abs - runStart).toInt, bufs(pc.key), pc.dest, pc.len)
          streamBytesFetched.addAndGet(pc.len.toLong)
          m += 1
        }
        i = j + 1
      }
    }
    out.toMap
  }

  /** Index-stream read through the block cache (probes re-read the same
    * per-stripe index runs on every task; repeated point lookups should pay
    * the FS once per executor). */
  private[spark] def cachedIndexStream(reader: Tablet.Reader, stripe: Int, id: Int,
      key: String): Array[Byte] =
    if (BlockCache.enabled) {
      val meta = BlockCache.metaOf(reader.filePath)
      BlockCache.getOrLoad(BlockCache.Key(reader.filePath, meta.mtime, meta.length, stripe, key))(
        reader.readStreamBytes(stripe, id))
    } else reader.readStreamBytes(stripe, id)

  /** The combined candidate-chunk set (index ∩ v14 directory stats) and its
    * chunk-grid size for one stripe — shared by the in-task reader, the
    * prefetch path and the aggregate fold so all three make the IDENTICAL
    * fetch decision. Returns (candidates, totalChunks); candidates null =
    * no restriction. */
  private[spark] def candidateChunksOf(reader: Tablet.Reader, stripe: Int,
      filters: Array[Filter], statsOnly: Array[Filter],
      neededKeys: Array[String], countPruned: Boolean = true): (java.util.BitSet, Int) = {
    if (filters.isEmpty && statsOnly.isEmpty) return (null, -1)
    var total = -1
    var i = 0
    while (total < 0 && i < neededKeys.length) {
      val id = reader.keyId(neededKeys(i))
      val dir = if (id >= 0) reader.chunkDirOf(stripe, id) else null
      if (dir != null) total = dir.count(_.isData)
      i += 1
    }
    val idx = indexCandidateChunks(reader, stripe, filters ++ statsOnly)
    val st = chunkStatsCandidates(reader, stripe, filters ++ statsOnly, total, countPruned)
    val cand =
      if (idx == null) st
      else if (st == null) idx
      else { val c = idx.clone().asInstanceOf[java.util.BitSet]; c.and(st); c }
    (cand, total)
  }

  /** True when `cand` is restrictive enough (and grid-aligned enough) for
    * the sparse byte-range fetch — the single gate every fetch site uses. */
  private[spark] def sparseGate(cand: java.util.BitSet, totalChunks: Int): Boolean =
    cand != null && totalChunks > 0 && cand.length <= totalChunks &&
      cand.cardinality().toLong * 4 <= totalChunks

  /** Self-contained stripe fetch for the prefetch pool (own reader/handle —
    * the in-flight reader is not thread-safe). Mirrors the in-task reader's
    * two fetch-layer decisions exactly: with pushed filters only the EAGER
    * (filter-phase) streams prefetch (the reader defers projected streams
    * until a chunk survives), and under a restrictive candidate set the
    * fetch goes SPARSE — only candidate chunks' byte ranges load, so the
    * prefetch cannot undo the sparse-fetch saving either. The reader's own
    * candidate set is always a subset of this one (it may add a TopN tail
    * mask), so every chunk it decodes is present in the prefetched bytes. */
  private[graft] def fetchStreamBytes(file: String, stripe: Int, dataSchema: StructType,
      required: StructType, filters: Array[Filter],
      statsOnly: Array[Filter]): Map[String, (Array[Byte], Array[Boolean])] = {
    val r = new Tablet.Reader(file, footerOf(file))
    try {
      val all = neededStreamKeys(r.keyProbe, dataSchema, required, filters)
      val keys =
        if (filters.isEmpty ||
            seedPassRateOf(r, dataSchema, filters) > DeferSeedMax) all
        else {
          val fs = filterStreamKeys(r.keyProbe, dataSchema, filters, statsOnly)
          val eager = all.filter(fs.contains)
          if (eager.isEmpty) all else eager
        }
      // countPruned = false: the in-task reader recomputes this stripe's
      // candidates and owns the counter bump
      val (cand, total) = candidateChunksOf(r, stripe, filters, statsOnly, all, countPruned = false)
      if (sparseGate(cand, total))
        readNeededStreamsSparse(r, stripe, keys, file, cand, total)
      else
        readNeededStreams(r, stripe, keys, file)
          .map { case (k, b) => k -> (b, null: Array[Boolean]) }
    } finally r.close()
  }

  private[spark] def submitPrefetch(file: String, stripe: Int, dataSchema: StructType,
      required: StructType, filters: Array[Filter],
      statsOnly: Array[Filter] = Array.empty)
      : java.util.concurrent.Future[Map[String, (Array[Byte], Array[Boolean])]] =
    streamPool.submit(
      new java.util.concurrent.Callable[Map[String, (Array[Byte], Array[Boolean])]] {
        def call(): Map[String, (Array[Byte], Array[Boolean])] =
          fetchStreamBytes(file, stripe, dataSchema, required, filters, statsOnly)
      })
}

/** Group-based row-level operation (copy-on-write, the Iceberg pattern):
  * SQL DELETE/UPDATE/MERGE plan a scan of the candidate files — restricted
  * at runtime by Spark's group filter to `_file IN (<files with matches>)`
  * — and a ReplaceData write whose commit atomically-ish swaps exactly the
  * scanned files for the rewritten ones. The scan records what it planned;
  * the write replaces precisely that set, with the dir's footer-recovered
  * layout (sort, indexes, blooms, bucket spec) carried onto the
  * replacement files. */
class NimbleRowLevelOperation(path: String, schema: StructType,
    tableProps: Map[String, String],
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  private val scanned =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Seq.empty)
  private[spark] def recordScanned(files: Seq[String]): Unit = scanned.set(files)

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"nimble row-level $cmd path=$path"
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // table-level unsignedColumns rides tableProps (catalog tables), the
    // per-operation options win on conflict — same merge as NimbleTable's
    val merged = new CaseInsensitiveStringMap(
      (tableProps ++ options.asScala).asJava)
    new NimbleScanBuilder(path, schema, -1,
      NimbleSource.unsignedColsOf(merged), rowLevel = this)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the group-based copy-on-write reads WIDENED values and would write
    // them back widened — silently changing the stored physical domain of an
    // unsigned table. The refusal sits HERE, not in the operation builder:
    // Spark constructs the row-level plan for every SQL DELETE before
    // OptimizeMetadataOnlyDeleteFromTable can replace it with the
    // canDeleteWhere (stored-domain-translated) metadata path, so only a
    // plan that actually WRITES may fail loudly.
    require(!tableProps.exists { case (k, v) =>
        k.equalsIgnoreCase("unsignedColumns") && v.trim.nonEmpty },
      "nimble: row-level DML on an unsigned-widened table would store the " +
        "WIDENED values (a different physical domain); only metadata-only " +
        "DELETE is supported through SQL — use graft.ops.Delete for " +
        "surgery-eligible stored-domain deletes")
    // replacement files re-declare whatever layout the table's files carry
    val layout =
      try graft.ops.Compaction.recoverLayout(path)
      catch { case _: Throwable => Map.empty[String, String] }
    val opts = new CaseInsensitiveStringMap((tableProps ++ layout).asJava)
    new NimbleWriteBuilder(path, info.schema(), opts,
      replaceFilesFn = () => scanned.get())
  }
}

class NimbleTable(path: String, schema: StructType,
    tableProps: Map[String, String] = Map.empty) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String = s"nimble:${NimbleSource.displayPath(path)}"

  /** Multi-directory reads (`.load(dirA, dirB)`) are read-only: a write or
    * row-level operation has no single target directory to commit into. */
  private def requireSingleDir(op: String): Unit =
    require(path.indexOf(NimbleSource.MultiPathSep) < 0,
      s"nimble: $op is not supported on a multi-path read " +
        s"(${NimbleSource.displayPath(path)}); write to one directory")

  /** `_file` — the tablet file a row came from (parquet `_metadata` parity:
    * debugging, group-based row-level ops). A real data column of the same
    * name shadows it. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (schema.fieldNames.contains("_file")) Array.empty
    else Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "tablet file path this row was read from"
    })

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    requireSingleDir("a row-level operation")
    () => new NimbleRowLevelOperation(path, schema, tableProps, info.command())
  }

  /** Metadata-only SQL DELETE gate: true only when every file classifies
    * all-match or none-match from its own stats, so `deleteWhere` will
    * purely unlink files (Spark's OptimizeMetadataOnlyDeleteFromTable asks
    * this first; anything mixed falls through to the group-based row-level
    * rewrite, which handles it with `_file`-filtered copy-on-write). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    path.indexOf(NimbleSource.MultiPathSep) < 0 &&
      filters.flatMap(_.references).forall(r => schema.fieldNames.contains(r)) &&
      // unsigned tables participate via the stored-domain translation inside
      // metadataOnlyDeletable (r20); untranslatable predicates classify
      // under the stats fence and correctly report non-metadata-only
      graft.ops.Delete.metadataOnlyDeletable(path, filters, unsignedColsOfProps)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireSingleDir("DELETE")
    graft.ops.Delete.deleteFilters(
      org.apache.spark.sql.SparkSession.active, path, filters, tablePropsForRead)
  }

  override def truncateTable(): Boolean = {
    requireSingleDir("TRUNCATE")
    graft.ops.Delete.deleteFilters(
      org.apache.spark.sql.SparkSession.active, path, Array(AlwaysTrue()), tablePropsForRead)
    true
  }

  private def unsignedColsOfProps: Set[String] =
    tableProps.collectFirst { case (k, v) if k.equalsIgnoreCase("unsignedColumns") =>
      v.split(",").map(_.trim).filter(_.nonEmpty).toSet }.getOrElse(Set.empty)

  /** Table directory + unsigned-decoded columns, for planner rules that read
    * footer stats directly ([[DecimalNarrowing]]). */
  private[spark] def dirPath: String = path
  private[spark] def unsignedCols: Set[String] = unsignedColsOfProps

  private def tablePropsForRead: Map[String, String] = tableProps
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  /** Catalog-managed tables declare their bucket layout (from the files
    * themselves, or the pending spec before the first write) so Spark's
    * DESCRIBE/SHOW surfaces it; the SPJ machinery itself keys off the
    * scan's reported KeyGroupedPartitioning, not this. */
  override def partitioning(): Array[Transform] =
    tableProps.get("bucketColumns").zip(tableProps.get("numBuckets")) match {
      case Some((cols, n)) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
          n.toInt, cols.split(",").map(_.trim): _*))
      case None => Array.empty
    }

  override def properties(): util.Map[String, String] = tableProps.asJava

  /** table-level props (bucket spec, declared write options) under the
    * per-operation options, which win on conflict */
  private def merged(options: CaseInsensitiveStringMap): CaseInsensitiveStringMap =
    if (tableProps.isEmpty) options
    else new CaseInsensitiveStringMap((tableProps ++ options.asScala).asJava)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = merged(options)
    new NimbleScanBuilder(path, schema,
      Option(opts.get("maxFilesPerTrigger")).map(_.toInt).getOrElse(-1),
      NimbleSource.unsignedColsOf(opts),
      maxBytesPerTrigger = Option(opts.get("maxBytesPerTrigger")).map(_.toLong).getOrElse(-1L))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireSingleDir("a write")
    // unsigned tables accept only their CREATE-time write (the table is
    // still empty then, so the schema is the stored narrow one): once files
    // exist the surfaced schema is WIDENED and any further write would land
    // widened values — a silent physical-domain change
    require(unsignedColsOfProps.isEmpty || NimbleSource.listFiles(path).isEmpty,
      "nimble: writing to an unsigned-widened table would store the WIDENED " +
        "values (a different physical domain); write the stored-domain data " +
        "path-based, or drop the unsignedColumns property")
    new NimbleWriteBuilder(path, info.schema(), merged(info.options()),
      appendLayoutFn = () =>
        // r19: a plain APPEND preserves the table's per-file-LOCAL layout
        // (index/bloom/flatmap/nanos-split/dedup declarations recovered
        // from the existing footers) so appended files keep their lookup
        // and shred structure instead of silently degrading to scans.
        // Cross-row-ORDER claims (sortColumns, bucket spec) are
        // deliberately NOT recovered: an unsorted/unclustered append
        // declaring them would make the footers lie to TopN pushdown and
        // SPJ — the documented contract stays "a plain append voids the
        // sort/bucket declaration". Overwrites never consult this (the
        // doomed files' layout must not leak into a fresh write).
        try graft.ops.Compaction.recoverLayout(path).view.filterKeys(k =>
          k != "sortColumns" && k != "bucketColumns" && k != "numBuckets").toMap
        catch { case _: Throwable => Map.empty[String, String] })
  }
}

// ------------------------------------------------------------------ read

class NimbleScanBuilder(path: String, dataSchema: StructType, maxFilesPerTrigger: Int = -1,
    unsignedCols: Set[String] = Set.empty, rowLevel: NimbleRowLevelOperation = null,
    maxBytesPerTrigger: Long = -1L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  // unsigned-widened columns carry signed-domain stats/blooms/indexes on
  // disk, so filters on them can neither push nor prune — Spark evaluates
  // them on the widened values post-scan (never a wrong answer)
  private val atomicCols: Set[String] =
    dataSchema.fields.filter(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    }).map(_.name).toSet -- unsignedCols

  /** Dotted struct-leaf paths (`st.a.b`) whose streams are ROW-ALIGNED with
    * the table: the writer pads struct children with null entries when any
    * ancestor is null (Fields.StructW.addNull), so the leaf stream's stats
    * — including its null count — describe exactly the values Spark's
    * `st.a.b` expression produces per row, null tests included. Paths
    * through arrays/maps are excluded (`#elem`/`#key`/`#val` streams hold
    * a variable number of entries per row — not row-aligned), as are
    * components Spark would backtick-quote (dots/backticks in a field
    * name would make the pushed filter's dotted reference ambiguous). */
  private val nestedLeafCols: Set[String] = {
    val out = Set.newBuilder[String]
    def plain(n: String): Boolean = !n.contains('.') && !n.contains('`')
    def walk(prefix: String, dt: DataType): Unit = dt match {
      case s: StructType =>
        s.fields.foreach(f => if (plain(f.name)) walk(s"$prefix.${f.name}", f.dataType))
      case _: ArrayType | _: MapType => ()
      case _ => out += prefix
    }
    dataSchema.fields.foreach { f =>
      f.dataType match {
        case s: StructType if plain(f.name) && !unsignedCols.contains(f.name) =>
          s.fields.foreach(c => if (plain(c.name)) walk(s"${f.name}.${c.name}", c.dataType))
        case _ => ()
      }
    }
    out.result()
  }

  private var pushed: Array[Filter] = Array.empty
  private var statsOnly: Array[Filter] = Array.empty
  private var required: StructType = dataSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Row-level (ReplaceData) plans place ONE shared scan under several
    // branches with different filters (e.g. UPDATE = union of cond and
    // NOT-cond branches) — pushing either branch's filter into the shared
    // scan would drop the other branch's rows. Refuse all pushdown; Spark
    // evaluates the branch filters itself.
    if (rowLevel != null) return filters
    val (ok, residual) = filters.partition(f => Filters.supported(f, atomicCols))
    pushed = ok
    // Nested struct-leaf predicates prune stripes from leaf-stream stats
    // (parquet's nested predicate pushdown analog) but are NEVER claimed as
    // pushed: Spark re-evaluates them row-wise post-scan, so pruning only
    // has to be sound for none-match proofs — which row-aligned leaf stats
    // give exactly.
    statsOnly = residual.filter(f =>
      f.references.nonEmpty && Filters.supported(f, atomicCols ++ nestedLeafCols))
    // r20: unsigned-widened predicates translate into exactly-equivalent
    // STORED-signed-domain twins (Filters.unsignedStored) and join the
    // stats-only channel — stripe stats, chunk directories, blooms, and
    // hash indexes are all stored-domain, so a selective probe on an
    // unsigned column prunes instead of full-scanning. Never claimed:
    // Spark re-evaluates the original on the widened decoded values, and
    // equivalence makes candidate narrowing exact, not just none-match
    // sound. The translation needs the STORED schema (footer), not the
    // widened read schema.
    if (unsignedCols.nonEmpty) {
      val cands = residual.filter(f => f.references.nonEmpty &&
        f.references.exists(unsignedCols) &&
        Filters.supported(f, atomicCols ++ unsignedCols))
      if (cands.nonEmpty) {
        val storedSchema =
          try NimbleSource.listFiles(path).headOption.map(f =>
            DataType.fromJson(NimbleSource.footerOf(f).schemaJson).asInstanceOf[StructType])
          catch { case _: Exception => None }
        storedSchema.foreach { ss =>
          statsOnly = statsOnly ++ cands.flatMap(f =>
            Filters.unsignedStored(Array(f), unsignedCols, ss).toSeq.flatten)
        }
      }
    }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private var limit: Int = -1

  /** Partial limit pushdown: each partition stops decoding after `limit`
    * surviving rows (row-range skipping analog, SURVEY §2.3); Spark still
    * applies the global limit. */
  override def pushLimit(l: Int): Boolean =
    if (rowLevel != null) false else { limit = l; false }

  private var topN: Option[TopNPush] = None

  /** Partial TopN pushdown (ORDER BY c LIMIT n over per-file-sorted data,
    * the row-range-skipping analog of ref velox/VeloxReader.cpp:441
    * seekToRow). Gated on explicit sorted-by metadata: EVERY file's footer
    * must declare `sortColumns` starting with the sort column — the writer
    * contract for that declaration is ascending, nulls first, within each
    * file (the order `sortWithinPartitions(c)` produces). All four
    * direction/null-ordering combinations plan a per-file superset:
    * ASC NULLS FIRST = first n rows; DESC NULLS LAST = last n rows (tail
    * stripes + a chunk-granular leading-row skip); ASC NULLS LAST = first
    * (fileNullCount + n) rows (the nulls sit at the physical head, in
    * front of the n smallest non-nulls); DESC NULLS FIRST = the null head
    * PLUS the last n rows. The null-dependent combos need the sort
    * column's file-level nullCount, so they refuse when a file lacks those
    * stats. Spark still runs the global sort+limit (isPartiallyPushed).
    * Refused when any pushed filter exists (the top-n of a filtered set
    * can lie beyond the physical head/tail), for unsigned-widened sort
    * columns (stored signed order != widened order), and when any file's
    * per-stripe stats contradict the declared order (plan-time
    * misdeclaration fence). */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection, NamedReference}
    if (rowLevel != null || pushed.nonEmpty || orders.length != 1 || n <= 0) return false
    val o = orders(0)
    val col = o.expression() match {
      case r: NamedReference if r.fieldNames().length == 1 => r.fieldNames()(0)
      case _ => return false
    }
    if (unsignedCols.contains(col)) return false
    val desc = o.direction() == SortDirection.DESCENDING
    val nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST
    val files = NimbleSource.listFiles(path)
    if (files.isEmpty) return false
    NimbleSource.prefetchFooters(files)
    if (!files.forall(f => NimbleSource.footerOf(f).sortColumns.headOption.contains(col)))
      return false
    if (!files.forall(f => NimbleSource.stripeStatsMonotone(f, col))) return false
    // the null-dependent combos plan by per-file null counts
    val needsNullCounts = desc == nullsFirst
    if (needsNullCounts && !files.forall(f => NimbleSource.fileNullCount(f, col).isDefined))
      return false
    topN = Some(TopNPush(col, n, desc, nullsFirst))
    // ASC NULLS FIRST head partitions hold no filters, so n emitted rows =
    // n survivors and the per-partition limit early-stops the head stripe
    // mid-decode. The other combos must NOT limit: tail skips emit
    // chunk-granular slop before the true tail, and null-head supersets
    // exceed n by the null count — a limit of n would cut the real rows.
    if (!desc && nullsFirst && (limit < 0 || n < limit)) limit = n
    true
  }
  override def isPartiallyPushed(): Boolean = true

  private var aggOut: StructType = null
  private var aggRows: Seq[org.apache.spark.sql.catalyst.InternalRow] = null
  private var aggOps: Array[AggScan.AggOp] = null
  private var aggGroups: Array[AggScan.GroupCol] = Array.empty
  private var aggPartials: Seq[org.apache.spark.sql.catalyst.InternalRow] = null
  private var aggMixed: Seq[(NimbleStripePartition, Long)] = null

  /** Aggregate pushdown (COUNT/MIN/MAX, no group-by). Without filters the
    * partial rows come straight from footer stats on the driver — zero data
    * bytes. With pushed filters, the driver classifies stripes: all-match
    * stripes answer from stats, none-match stripes drop, and MIXED stripes
    * aggregate during the scan's decode loop (ValueHook proper — survivors
    * feed the accumulator, no output vectors). Refused (false) only when the
    * aggregate shape itself is unsupported. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (rowLevel != null) return false
    val files = NimbleSource.listFiles(path)
    // aggregates/groups over unsigned-widened columns would fold signed-domain
    // stats/values — refuse, Spark computes on the widened scan output
    if (unsignedCols.nonEmpty &&
      (agg.aggregateExpressions().iterator ++ agg.groupByExpressions().iterator).exists(e =>
        e.references().exists(r => r.fieldNames().exists(unsignedCols)))) return false
    if (pushed.isEmpty) {
      AggPushdown.tryCompute(agg, dataSchema, files) match {
        case Some(rows) =>
          aggOut = AggPushdown.outputSchema(agg, dataSchema)
          aggRows = rows
          true
        case None =>
          // stats refused (NaN-poisoned max, truncated 64B string bounds):
          // degrade to the mid-scan fold instead of a full materializing
          // scan — with no filters every stripe is "all-match", and the
          // stripes whose stats can't answer exactly fold decoded values
          planAggScan(agg, files, Array.empty)
      }
    } else planAggScan(agg, files, pushed)
  }

  /** Shared tail of pushAggregation: classify stripes and stage either the
    * stats LocalScan (no mixed stripes, no group-by) or the mid-scan agg
    * scan (grouped folds always decode — stats can't answer per group). */
  private def planAggScan(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
      files: Seq[String], filters: Array[Filter]): Boolean =
    AggScan.groupedOpsOf(agg, dataSchema) match {
      case Some((groups, ops)) if files.nonEmpty =>
        AggScan.plan(ops, dataSchema, files, filters, groups) match {
          case Some((partials, mixed)) =>
            aggOut = AggPushdown.outputSchema(agg, dataSchema)
            if (mixed.isEmpty && groups.isEmpty) aggRows = partials // pure-stats: LocalScan
            else { aggOps = ops; aggGroups = groups; aggPartials = partials; aggMixed = mixed }
            true
          case None => false
        }
      case _ => false
    }

  override def build(): Scan =
    if (aggRows != null) new NimbleAggScan(path, aggOut, aggRows)
    else if (aggMixed != null || aggGroups.nonEmpty)
      new NimbleAggBatchScan(path, dataSchema, aggOut, aggOps, pushed, aggPartials,
        Option(aggMixed).getOrElse(Seq.empty), aggGroups)
    else new NimbleScan(path, dataSchema, required, pushed, limit, maxFilesPerTrigger, unsignedCols,
      topN, rowLevel, maxBytesPerTrigger = maxBytesPerTrigger, statsOnly = statsOnly)
}

case class NimbleStripePartition(file: String, stripe: Int) extends InputPartition

/** A bin-packed set of stripes read by one task (Spark FilePartition analog:
  * small files/stripes share a task instead of costing one each; large
  * stripes still split one-per-task). */
case class NimbleMultiPartition(items: Array[NimbleStripePartition]) extends InputPartition

/** One file's tail stripes for a pushed DESC TopN: `skipRows` leading rows
  * of the first stripe position past at chunk granularity before emission. */
case class NimbleTailPartition(items: Array[NimbleStripePartition], skipRows: Long)
    extends InputPartition

/** A pushed TopN request: ORDER BY `col` (`desc`, `nullsFirst`) LIMIT `n`. */
case class TopNPush(col: String, n: Int, desc: Boolean, nullsFirst: Boolean) {
  def describe: String =
    s"$col ${if (desc) "DESC" else "ASC"} NULLS ${if (nullsFirst) "FIRST" else "LAST"} limit $n"
}

/** All of one hash-bucket's surviving stripes (possibly several files) read
  * by one task — the unit of a storage-partitioned join. The key row holds
  * the bucket id (the bucket transform's int output). */
case class NimbleBucketPartition(bucket: Int, items: Array[NimbleStripePartition])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](bucket))
}

class NimbleScan(path: String, dataSchema: StructType, required: StructType, filters: Array[Filter],
    limit: Int = -1, maxFilesPerTrigger: Int = -1, unsignedCols: Set[String] = Set.empty,
    topN: Option[TopNPush] = None, rowLevel: NimbleRowLevelOperation = null,
    maxBytesPerTrigger: Long = -1L, statsOnly: Array[Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning with SupportsReportOrdering {

  /** File-listing SNAPSHOT, pinned once per Scan instance (Iceberg-style
    * snapshot isolation): planning-time consumers (estimateStatistics, the
    * DecimalNarrowing overflow proof, bucket/ordering metadata) and
    * execution (planInputPartitions — runtime-filter replans included) all
    * see the SAME file set. Without the pin, rows appended between a
    * stats-derived rewrite and execution would be scanned but not covered by
    // the proof (the r12-advice TOCTOU). */
  private[spark] lazy val pinnedMetas: Seq[GraftIO.FileMeta] = NimbleSource.listMeta(path)
  private def pinnedFiles: Seq[String] = pinnedMetas.map(_.path)

  /** Spark-UI scan counters (summed over tasks): the skipped-work numbers
    * an operator tuning a 100 TB scan needs without debug logging. */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new StripesReadMetric, new ChunksSkippedMetric, new StreamBytesReadMetric)

  /** Storage-partitioned-join surface: when every file declares the same
    * hash-bucket spec AND the session opted in (the v2 bucketing flag), the
    * scan reports KeyGroupedPartitioning over the bucket transform and
    * plans one partition per bucket — a join of two co-bucketed tables on
    * the bucket columns then runs with ZERO shuffle on either side. Gated
    * on the conf because bucket-grouped planning caps scan parallelism at
    * numBuckets, which is only worth paying when SPJ can use it; a plain
    * scan keeps bin-packed splits. Decided once per Scan instance so
    * outputPartitioning() and planInputPartitions() can never disagree
    * (runtime-filter replans included). */
  private lazy val keyedBuckets: Option[(Seq[String], Int)] =
    if (topN.isDefined) None
    // getConf (not getConfString with a literal fallback): the flag's
    // REGISTERED default is true in Spark 4, and getConfString ignores
    // registered defaults for unset keys — a hand-rolled "false" fallback
    // would silently disable SPJ in every session that never set the conf
    else if (!org.apache.spark.sql.internal.SQLConf.get
      .getConf(org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_ENABLED)) None
    // single-column specs only: Spark 4.1's SPJ planner does not resolve a
    // multi-argument bucket transform (verified empirically — the join
    // shuffles anyway), so grouping those scans by bucket would cap
    // parallelism at numBuckets for zero benefit
    else NimbleSource.bucketSpecOf(pinnedFiles).filter(_._1.length == 1)

  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedBuckets match {
      case Some((cols, n)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(n, cols: _*)), n)
      case None => new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Per-partition sort order (SupportsReportOrdering): a bucketed table
    * whose files also declare sortColumns reads each bucket pre-sorted, so
    * a storage-partitioned sort-merge join skips BOTH the exchanges (from
    * the key-grouped partitioning) and the per-side SortExecs. Reported
    * only when every bucket holds at most ONE file (a second appended file
    * restarts the order mid-partition), every file declares the same sort,
    * no sort column is unsigned-widened (stored signed order != widened
    * order), and the head column's stripe stats don't contradict the
    * declaration — the same trust-but-fence contract as the TopN pushdown. */
  private lazy val reportedOrdering: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    keyedBuckets match {
      case Some(_) if org.apache.spark.sql.internal.SQLConf.get
        .getConf(org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_SORTING_ENABLED) =>
        import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
        val files = pinnedFiles
        val sortCols = NimbleSource.footerOf(files.head).sortColumns
        val ok = sortCols.nonEmpty &&
          sortCols.forall(c => !unsignedCols.contains(c)) &&
          files.forall(f => NimbleSource.footerOf(f).sortColumns == sortCols) &&
          files.groupBy(f => NimbleSource.footerOf(f).bucketId).forall(_._2.lengthCompare(1) <= 0) &&
          files.forall(f => NimbleSource.stripeStatsMonotone(f, sortCols.head))
        if (ok) sortCols.map(c => Expressions.sort(Expressions.column(c),
          SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)).toArray
        else Array.empty
      case _ => Array.empty
    }
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    reportedOrdering

  /** Runtime (DPP / join-pushdown) filters, applied to stripe pruning only —
    * safe because they are conservative semi-join filters. */
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (rowLevel != null)
      // row-level scans accept ONLY the `_file` group filter: a data-column
      // runtime filter would prune rows out of the ReplaceData rewrite
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
    else required.fields.collect { // must resolve against the scan OUTPUT
      // unsigned-widened columns carry signed-domain stats: runtime filters
      // on them could prune wrongly, so they are never offered
      case f if !f.dataType.isInstanceOf[StructType] && !f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType] && !unsignedCols.contains(f.name) =>
        org.apache.spark.sql.connector.expressions.Expressions.column(f.name)
    }
  override def filter(newFilters: Array[Filter]): Unit = runtimeFilters = newFilters

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new NimbleMicroBatchStream(path, dataSchema, required, filters, maxFilesPerTrigger, unsignedCols,
      maxBytesPerTrigger)
  override def description(): String =
    s"nimble path=${NimbleSource.displayPath(path)}, " +
      s"pushed=[${filters.mkString(", ")}], read=${required.catalogString}" +
      (if (statsOnly.nonEmpty) s", pruneOnly=[${statsOnly.mkString(", ")}]" else "") +
      (if (limit >= 0) s", limit=$limit" else "") +
      topN.map(t => s", topN=[${t.describe}]").getOrElse("")

  /** Pushed TopN over per-file-sorted data (row-range skipping analog, ref
    * velox/VeloxReader.cpp:441 seekToRow): with no filters, each file's
    * per-ordering candidate superset is a physical head run, a tail run, or
    * (DESC NULLS FIRST) both — nulls sit at the physical head, values
    * ascend after them. Plan only the stripes covering those runs; tail
    * runs carry a chunk-granular leading-row skip. ASC NULLS FIRST rides
    * the per-partition limit early-stop. Spark still runs the global
    * sort+limit (partial pushdown). */
  private def planTopNPartitions(t: TopNPush): Array[InputPartition] = {
    val files = pinnedFiles
    val parts = mutable.ArrayBuffer[InputPartition]()
    var selected = 0
    var prunedStripes = 0L
    for (batch <- files.grouped(NimbleSource.PlanBatchFiles); file <- {
      NimbleSource.prefetchFooters(batch); batch
    }) {
      val footer = NimbleSource.footerOf(file)
      val stripes = footer.stripes
      if (stripes.nonEmpty) {
        // head stripes covering the first `target` rows (0 => none)
        def headSel(target: Long): (mutable.ArrayBuffer[NimbleStripePartition], Int) = {
          val sel = mutable.ArrayBuffer[NimbleStripePartition]()
          var rows = 0L
          var s = 0
          while (s < stripes.length && rows < target) {
            sel += NimbleStripePartition(file, s); rows += stripes(s).rowCount; s += 1
          }
          (sel, s)
        }
        // tail stripes covering the last `target` rows, plus the skip count
        def tailSel(target: Long): (mutable.ArrayBuffer[NimbleStripePartition], Long, Int) = {
          val sel = mutable.ArrayBuffer[NimbleStripePartition]()
          var rows = 0L
          var s = stripes.length - 1
          while (s >= 0 && rows < target) {
            sel.prepend(NimbleStripePartition(file, s)); rows += stripes(s).rowCount; s -= 1
          }
          (sel, math.max(0L, rows - target), s + 1)
        }
        // per-file nullCount, pre-validated Some by pushTopN for the combos
        // that reach for it
        def nulls: Long = NimbleSource.fileNullCount(file, t.col).getOrElse(0L)
        (t.desc, t.nullsFirst) match {
          case (false, true) => // ASC NULLS FIRST: first n rows
            val (sel, _) = headSel(t.n.toLong)
            prunedStripes += stripes.length - sel.length
            selected += sel.length
            parts += NimbleMultiPartition(sel.toArray)
          case (false, false) => // ASC NULLS LAST: nulls head + n smallest non-nulls
            val (sel, _) = headSel(nulls + t.n)
            prunedStripes += stripes.length - sel.length
            selected += sel.length
            parts += NimbleMultiPartition(sel.toArray)
          case (true, false) => // DESC NULLS LAST: last n rows
            val (sel, skip, _) = tailSel(t.n.toLong)
            prunedStripes += stripes.length - sel.length
            selected += sel.length
            parts += NimbleTailPartition(sel.toArray, skip)
          case (true, true) => // DESC NULLS FIRST: null head PLUS last n rows
            val (hSel, hEnd) = headSel(nulls)
            val (tSel, skip, tStart) = tailSel(t.n.toLong)
            if (hEnd >= tStart) {
              // runs overlap: the whole file is a candidate — emit it once
              selected += stripes.length
              parts += NimbleMultiPartition(
                Array.tabulate(stripes.length)(s => NimbleStripePartition(file, s)))
            } else {
              prunedStripes += stripes.length - hSel.length - tSel.length
              selected += hSel.length + tSel.length
              if (hSel.nonEmpty) parts += NimbleMultiPartition(hSel.toArray)
              parts += NimbleTailPartition(tSel.toArray, skip)
            }
        }
      }
    }
    NimbleSource.recordPlan(path, selected, prunedStripes)
    parts.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    topN match {
      case Some(t) => return planTopNPartitions(t)
      case None => ()
    }
    val survivors = mutable.ArrayBuffer[(NimbleStripePartition, Long)]()
    var pruned = 0L
    // Row-level (ReplaceData) scans must emit EVERY row of every selected
    // group — a data-filter-pruned stripe would silently vanish from the
    // rewrite — so only the `_file` group filter may restrict them
    val pruningFilters =
      if (rowLevel != null) Array.empty[Filter] else filters ++ statsOnly ++ runtimeFilters
    // `_file` runtime group filter (row-level operations): Spark's group
    // filtering pushes IN(<matching files>) against the metadata column, so
    // a DELETE/UPDATE/MERGE scans — and therefore REPLACES — only the files
    // that actually contain matches
    val fileFilter: Option[Set[String]] = (filters ++ runtimeFilters).collectFirst {
      case org.apache.spark.sql.sources.In("_file", vs) =>
        vs.iterator.filter(_ != null).map(String.valueOf).toSet
      case org.apache.spark.sql.sources.EqualTo("_file", v) if v != null =>
        Set(String.valueOf(v))
    }
    val listed = pinnedFiles
    val allFiles = fileFilter.map(keep => listed.filter(keep.contains)).getOrElse(listed)
    if (rowLevel != null) rowLevel.recordScanned(allFiles)
    // bucket pruning: equality/In on the bucket column names the only
    // bucket(s) that can hold matches, so every other bucket's FILES drop
    // before any stripe metadata is touched — a point lookup on a bucketed
    // key scans 1/numBuckets of the table, and a broadcast join's DPP
    // In-filter on the key prunes the same way at runtime. Independent of
    // the SPJ conf (pure planning metadata).
    val files = NimbleSource.bucketPrunedFiles(allFiles, pruningFilters, dataSchema, unsignedCols)
    // skipped files' stripes count as pruned (observability parity with
    // stripe-level pruning) — parallel: these footers are cold by design
    if (files.length != allFiles.length) {
      val skippedStripes = new java.util.concurrent.atomic.AtomicLong()
      val skipped = (allFiles.toSet -- files).toSeq
      for (batch <- skipped.grouped(NimbleSource.PlanBatchFiles))
        NimbleSource.foreachParallel(batch) { f =>
          skippedStripes.addAndGet(NimbleSource.footerOf(f).stripes.length.toLong); ()
        }
      pruned += skippedStripes.get()
    }
    val filterRefs = pruningFilters.flatMap(_.references).distinct
    // BATCHED planning: per batch — parallel footer prefetch, parallel
    // grouped-directory warm for the pruning columns, then the sequential
    // pruning loop over cached metadata. One batch of footers is live at a
    // time, so a 10^6-file plan neither thrashes the bounded footer cache
    // nor holds GBs of stripe metadata (one serial range-read per file per
    // group would gate planning at 10^5 files)
    for (batch <- files.grouped(NimbleSource.PlanBatchFiles)) {
    NimbleSource.prefetchFooters(batch)
    if (filterRefs.nonEmpty) NimbleSource.foreachParallel(batch) { f =>
      val ft = NimbleSource.footerOf(f)
      if (ft.stripes.nonEmpty) {
        val r = new Tablet.Reader(f, ft)
        try {
          val ids = filterRefs.map(r.keyId).filter(_ >= 0)
          var g = 0
          while (g < ft.groups.length) { ids.foreach(id => r.dirEntries(g, id)); g += 1 }
        } finally r.close()
      }
    }
    for (file <- batch) {
      val footer = NimbleSource.footerOf(file)
      val r = new Tablet.Reader(file, footer)
      try {
        var s = 0
        while (s < footer.stripes.length) {
          val info = footer.stripes(s)
          val statsOf: String => Option[Tablet.Stats] =
            name => Some(r.keyId(name)).filter(_ >= 0).map { id =>
              val st = r.streamStats(s, id)
              // nanos-split column: micros-stream stats scale to conservative
              // combined-value bounds (blooms hash micros, so they're off)
              if (r.keyId(name + "#nanos") >= 0) NimbleSource.nanosScaledStats(st) else st
            }.orElse(NimbleSource.dottedChildStats(r, s, name, info.rowCount))
          val bloomOf: String => Option[Tablet.Bloom] =
            name => Some(r.keyId(name)).filter(_ >= 0)
              .filterNot(_ => r.keyId(name + "#nanos") >= 0)
              .flatMap(id => r.streamBloom(s, id))
          val skip = pruningFilters.exists(f => Filters.pruneStripe(f, statsOf, bloomOf))
          if (!skip) survivors += ((NimbleStripePartition(file, s), info.length)) else pruned += 1
          s += 1
        }
      } finally r.close()
    }
    } // batch loop
    // Storage-partitioned grouping: one partition per bucket id, matching
    // the reported KeyGroupedPartitioning exactly. ALL numBuckets
    // partitions are emitted — empty ones included — so both join sides
    // always line up key-for-key even when pruning emptied a bucket on one
    // side (an absent key would otherwise need pushPartValues handling).
    keyedBuckets match {
      case Some((_, n)) =>
        val byBucket = Array.fill(n)(mutable.ArrayBuffer[NimbleStripePartition]())
        for ((sp, _) <- survivors) byBucket(NimbleSource.footerOf(sp.file).bucketId) += sp
        NimbleSource.recordPlan(path, survivors.length, pruned)
        return Array.tabulate[InputPartition](n)(b => NimbleBucketPartition(b, byBucket(b).toArray))
      case None => ()
    }
    // Bin-pack stripes into tasks (Spark FilePartition analog, adjusted for
    // this format's near-zero open cost — cached footer + one seek per
    // stream, so no 4MB openCost padding): split target =
    // min(maxPartitionBytes, max(minPartitionBytes, total/parallelism)).
    // Small files/stripes share a task instead of costing ~5ms of dispatch
    // each; at 100 TB the total/parallelism term dominates and big stripes
    // go one-per-task exactly like Parquet splits.
    val (maxPartBytes, minPartBytes, parallelism) = {
      try {
        val s = org.apache.spark.sql.SparkSession.active
        (s.conf.get("spark.sql.files.maxPartitionBytes", "134217728").toLong,
          s.conf.get("spark.graft.scan.minPartitionBytes", "2097152").toLong,
          s.sparkContext.defaultParallelism)
      } catch { case _: Throwable => (134217728L, 2097152L, 8) }
    }
    val totalBytes = survivors.iterator.map(_._2).sum
    val target = math.min(maxPartBytes,
      math.max(minPartBytes, totalBytes / math.max(parallelism, 1) + 1))
    val parts = mutable.ArrayBuffer[InputPartition]()
    val bin = mutable.ArrayBuffer[NimbleStripePartition]()
    var binBytes = 0L
    for ((sp, bytes) <- survivors) {
      if (binBytes > 0 && binBytes + bytes > target) {
        parts += NimbleMultiPartition(bin.toArray); bin.clear(); binBytes = 0
      }
      bin += sp; binBytes += bytes
    }
    if (bin.nonEmpty) parts += NimbleMultiPartition(bin.toArray)
    NimbleSource.recordPlan(path, survivors.length, pruned)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NimbleReaderFactory(dataSchema, required, filters, limit, GraftIO.broadcastConf(), unsignedCols,
      statsOnly)

  override def estimateStatistics(): Statistics = {
    var rows = 0L
    var bytes = 0L
    val metas = pinnedMetas
    for (batch <- metas.grouped(NimbleSource.PlanBatchFiles)) {
      NimbleSource.prefetchFooters(batch.map(_.path))
      for (meta <- batch) {
        rows += NimbleSource.footerOf(meta.path).rowCount
        bytes += meta.length
      }
    }
    val r = rows; val b = math.max(bytes, 1L)
    // per-column nullCount/min/max for the CBO (join reordering and
    // selectivity at scale) — files on the OUTER loop: one Reader (and, for
    // wide v8 footers, one bucket probe per column) per file, every column
    // merged inside, so planning cost stays O(files), not O(columns x files)
    val cs = new util.HashMap[org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    val cboFields = required.fields.filter(f =>
      NimbleSource.cboEligible(f.dataType) && !unsignedCols.contains(f.name))
    if (cboFields.nonEmpty && metas.nonEmpty) {
      val merged = new Array[Tablet.Stats](cboFields.length)
      val ok = Array.fill(cboFields.length)(true)
      val split = new Array[Boolean](cboFields.length)
      // v10 NDV: HLL registers merge across files by byte-wise max — the
      // table-level distinct count the CBO needs for join reordering; a
      // column missing its sketch in ANY file (pre-v10, sketch cap) yields
      // no distinctCount rather than a wrong one
      val ndv = new Array[Array[Byte]](cboFields.length)
      val ndvOk = Array.fill(cboFields.length)(true)
      for (meta <- metas) {
        val rd = new Tablet.Reader(meta.path, NimbleSource.footerOf(meta.path))
        try {
          var i = 0
          while (i < cboFields.length) {
            if (ok(i)) {
              val f = cboFields(i)
              // the split layout only exists for long-backed timestamps
              if (f.dataType == LongType && rd.nanosSplit(f.name)) split(i) = true
              rd.fileStatsOf(f.name) match {
                case Some(s) =>
                  if (merged(i) == null) merged(i) = s.copy() else merged(i).merge(s)
                case None => ok(i) = false // absent in a file (evolution)
              }
              rd.footer.ndvSketches.get(f.name) match {
                case Some(regs) if ndvOk(i) =>
                  if (ndv(i) == null) ndv(i) = regs.clone() else graft.format.Hll.merge(ndv(i), regs)
                case _ => ndvOk(i) = false
              }
            }
            i += 1
          }
        } finally rd.close()
      }
      for (i <- cboFields.indices if ok(i) && merged(i) != null) {
        val f = cboFields(i)
        val m = merged(i)
        val (minV, maxV) =
          if (!m.hasMinMax || m.hasNaN || split(i)) (None, None)
          else NimbleSource.cboMinMax(f.dataType, m)
        val distinct: Option[Long] =
          if (ndvOk(i) && ndv(i) != null)
            Some(math.min(graft.format.Hll.estimate(ndv(i)),
              math.max(0L, m.valueCount - m.nullCount)))
          else None
        cs.put(org.apache.spark.sql.connector.expressions.Expressions.column(f.name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def nullCount(): util.OptionalLong = util.OptionalLong.of(m.nullCount)
            override def distinctCount(): util.OptionalLong =
              distinct.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
            override def min(): util.Optional[Object] =
              minV.map(v => util.Optional.of(v.asInstanceOf[Object])).getOrElse(util.Optional.empty())
            override def max(): util.Optional[Object] =
              maxV.map(v => util.Optional.of(v.asInstanceOf[Object])).getOrElse(util.Optional.empty())
          })
      }
    }
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(b)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(r)
      override def columnStats(): util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = cs
    }
  }
}

class NimbleReaderFactory(dataSchema: StructType, required: StructType, filters: Array[Filter],
    limit: Int = -1,
    hadoopConf: org.apache.spark.broadcast.Broadcast[GraftIO.SerializableConf] = null,
    unsignedCols: Set[String] = Set.empty,
    statsOnly: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {

  private def allAtomic: Boolean = required.fields.forall(f => f.dataType match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  })

  // Nested projections emit columnar batches too — the field readers fill
  // nested OnHeapColumnVectors directly. Only a pushed filter forces the
  // row path (survivor masks can't ride on an uncompacted nested batch).
  override def supportColumnarReads(partition: InputPartition): Boolean =
    allAtomic || filters.isEmpty

  private def chainOf(partition: InputPartition): NimbleChainReader = partition match {
    case NimbleMultiPartition(items) =>
      new NimbleChainReader(items, dataSchema, required, filters, limit, unsignedCols,
        statsOnly = statsOnly)
    case NimbleTailPartition(items, skip) =>
      new NimbleChainReader(items, dataSchema, required, filters, limit, unsignedCols, skip,
        statsOnly = statsOnly)
    case NimbleBucketPartition(_, items) =>
      new NimbleChainReader(items, dataSchema, required, filters, limit, unsignedCols,
        statsOnly = statsOnly)
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    GraftIO.installConf(hadoopConf)
    chainOf(partition)
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    GraftIO.installConf(hadoopConf)
    val batches = chainOf(partition)
    new PartitionReader[InternalRow] {
      private var rows: java.util.Iterator[InternalRow] = java.util.Collections.emptyIterator()
      private var mask: Array[Boolean] = null
      private var rowIdx = -1
      private var cur: InternalRow = null
      override def next(): Boolean = {
        while (true) {
          while (rows.hasNext) {
            val r = rows.next()
            rowIdx += 1
            if (mask == null || mask(rowIdx)) { cur = r; return true }
          }
          if (!batches.next()) return false
          rows = batches.get().rowIterator()
          mask = batches.currentMask
          rowIdx = -1
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = batches.close()
      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        batches.currentMetricsValues()
    }
  }
}

/** DSv2 custom scan metrics (Spark UI SQL-node counters): how much work
  * the selective reader SKIPPED is exactly what an operator tuning a
  * 100 TB scan needs to see without re-running with debug logging. */
private[spark] case class NimbleTaskMetric(metricName: String, metricValue: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}
/** Top-level, zero-arg-constructible metric classes: Spark's driver-side
  * SQLAppStatusListener re-instantiates the class named by the task metric
  * reflectively (zero-arg ctor required) to aggregate values for the UI —
  * a parameterized class makes every scan log a load warning and the UI
  * silently drop the metric. */
private[spark] class StripesReadMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "stripesRead"
  override def description(): String = "stripes opened"
}
private[spark] class ChunksSkippedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "chunksSkipped"
  override def description(): String = "chunks skipped (stats/index/TopN positioning)"
}
private[spark] class StreamBytesReadMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "streamBytesRead"
  override def description(): String = "stream bytes materialized to tasks (sparse/deferred fetch savings visible here)"
}

/** Chains per-stripe readers over a bin-packed partition, opening one stripe
  * at a time; a partial limit is threaded through so later stripes stop
  * early once earlier ones have produced enough survivors. */
class NimbleChainReader(items: Array[NimbleStripePartition], dataSchema: StructType,
    required: StructType, filters: Array[Filter], limit: Int = -1,
    unsignedCols: Set[String] = Set.empty, skipRows: Long = 0L,
    statsOnly: Array[Filter] = Array.empty)
    extends PartitionReader[ColumnarBatch] {

  private var idx = -1
  private var cur: NimbleBatchReader = null
  private var produced = 0L
  private var stripesOpened = 0L
  private var doneChunksSkipped = 0L
  private var doneStreamBytes = 0L
  var currentMask: Array[Boolean] = null

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      NimbleTaskMetric("stripesRead", stripesOpened),
      NimbleTaskMetric("chunksSkipped",
        doneChunksSkipped + (if (cur != null) cur.taskChunksSkipped else 0L)),
      NimbleTaskMetric("streamBytesRead",
        doneStreamBytes + (if (cur != null) cur.taskStreamBytes else 0L)))
  // one-ahead stream prefetch: stripe i+1's bytes load on the shared I/O
  // pool while stripe i decodes (UnitLoader analog, velox/VeloxReader.h:69).
  // At most one stripe of wasted I/O when an early limit stops the chain.
  private var pending: java.util.concurrent.Future[Map[String, (Array[Byte], Array[Boolean])]] = null
  private var pendingIdx = -1

  override def next(): Boolean = {
    while (true) {
      if (cur != null) {
        if (cur.next()) { currentMask = cur.currentMask; return true }
        produced += cur.emittedRows
        doneChunksSkipped += cur.taskChunksSkipped
        doneStreamBytes += cur.taskStreamBytes
        cur.close(); cur = null
      }
      if (limit >= 0 && produced >= limit) return false
      idx += 1
      if (idx >= items.length) return false
      val pre: Map[String, (Array[Byte], Array[Boolean])] =
        if (pending != null && pendingIdx == idx) {
          val p = pending
          pending = null
          try p.get()
          catch { // surface the underlying I/O failure like a sync read would
            case e: java.util.concurrent.ExecutionException => throw e.getCause
          }
        } else null
      if (idx + 1 < items.length) {
        val nxt = items(idx + 1)
        pendingIdx = idx + 1
        pending = NimbleSource.submitPrefetch(nxt.file, nxt.stripe, dataSchema, required,
          filters, statsOnly)
      }
      val remaining = if (limit < 0) -1 else (limit - produced).toInt
      stripesOpened += 1
      cur = new NimbleBatchReader(items(idx).file, items(idx).stripe,
        dataSchema, required, filters, remaining, prefetched = pre, unsignedCols = unsignedCols,
        // TopN tail skip applies to the chain's first stripe only (plan-time
        // stripe selection already dropped the wholly-skipped stripes)
        skipRows = if (idx == 0) skipRows else 0L,
        statsOnly = statsOnly)
    }
    false
  }

  override def get(): ColumnarBatch = cur.get()
  override def close(): Unit = {
    if (pending != null) { pending.cancel(false); pending = null }
    if (cur != null) { cur.close(); cur = null }
  }
}

/** Reads one stripe chunk-batch-wise: for each aligned chunk index, decodes
  * filter columns first, builds a selection, then fills only surviving rows
  * into fresh OnHeapColumnVectors (filter-before-materialize, the selective
  * reader idea: reference docs/develop/nimble_selective_reader.rst:163-199). */
class NimbleBatchReader(file: String, stripe: Int, dataSchema: StructType,
    required: StructType, filters: Array[Filter], limit: Int = -1,
    prefetched: Map[String, (Array[Byte], Array[Boolean])] = null,
    unsignedCols: Set[String] = Set.empty,
    skipRows: Long = 0L, statsOnly: Array[Filter] = Array.empty)
    extends PartitionReader[ColumnarBatch] {

  private var emitted = 0L
  def emittedRows: Long = emitted
  /** chunks this reader skipped via TopN positioning / chunk stats / index
    * candidates — surfaced as the DSv2 "chunksSkipped" task metric */
  private[spark] var taskChunksSkipped = 0L
  /** Rows still to position past before emitting (TopN tail partitions). */
  private var toSkip: Long = skipRows

  // footer via the per-JVM cache (one parse per file per executor, not per
  // task — reference: dwio/nimble/tablet/MetadataCache.h)
  private val reader = new Tablet.Reader(file, NimbleSource.footerOf(file))
  private val footer = reader.footer

  private val filterCols: Array[String] =
    filters.flatMap(_.references).distinct.filterNot(c => required.fieldNames.contains(c))

  // probe-backed key membership: wide (v8 sectioned) footers resolve names
  // one hash bucket at a time instead of loading the whole table
  private val footerKeySet: Fields.KeyProbe = reader.keyProbe

  // streams needed: all leaf streams of required fields (layout-aware) +
  // extra filter columns (shared helper — the prefetch path must fetch the
  // exact same set)
  private val neededKeys: Array[String] =
    NimbleSource.neededStreamKeys(footerKeySet, dataSchema, required, filters)

  // index ∩ v14 directory-stats candidate chunks, computed BEFORE any
  // stream fetch via the SHARED recipe (candidateChunksOf) — the in-task
  // reader, the prefetch path and the aggregate fold must make the
  // IDENTICAL fetch decision, and a private re-implementation here would
  // let the prefetch-superset invariant drift apart silently. Safe under
  // ANY projection shape: every stream — nested children included —
  // flushes at the same row boundaries, so skipping a non-candidate chunk
  // advances all cursors in lockstep; stats-only (nested-leaf) conjuncts
  // restrict candidates too (Spark re-evaluates the residual row-wise).
  private val idxStatsChunks: java.util.BitSet =
    NimbleSource.candidateChunksOf(reader, stripe, filters, statsOnly, neededKeys)._1

  // data-chunk grid of this stripe, from the first needed stream carrying a
  // chunk directory (v13+): per-data-frame row counts + the grid size every
  // candidate bitmap below is expressed in. null/-1 on pre-v13 files.
  private val dirDataRows: Array[Long] = {
    var r: Array[Long] = null
    var i = 0
    while (r == null && i < neededKeys.length) {
      val id = reader.keyId(neededKeys(i))
      val dir = if (id >= 0) reader.chunkDirOf(stripe, id) else null
      if (dir != null) r = dir.iterator.filter(_.isData).map(_.rows).toArray
      i += 1
    }
    r
  }
  private val dirTotalChunks: Int = if (dirDataRows == null) -1 else dirDataRows.length

  // TopN tail positioning via directory row counts (v13+): chunks wholly
  // inside the skip span drop from the candidate set — and from the sparse
  // FETCH — without reading anything; the first partially covered chunk
  // emits whole (the established partial-TopN superset semantics, same as
  // the dense peekStats path). Unknown row counts (legacy flag-0 frames
  // record 0) abandon the mask and keep the dense path.
  private val topNMask: java.util.BitSet =
    if (skipRows <= 0 || dirDataRows == null) null
    else {
      var covered = 0L
      var k = 0
      var bad = false
      while (!bad && k < dirDataRows.length && covered < skipRows &&
          covered + dirDataRows(k) <= skipRows) {
        if (dirDataRows(k) <= 0) bad = true
        else { covered += dirDataRows(k); k += 1 }
      }
      if (bad || k == 0) null
      else {
        val m = new java.util.BitSet(dirTotalChunks)
        m.set(k, dirTotalChunks)
        // the masked chunks ARE the whole-chunk part of the skip; the
        // remainder (inside chunk k) emits whole under superset semantics —
        // exactly where the dense peekStats walk would stop
        toSkip = 0
        m
      }
    }

  // combined candidate-chunk set — index ∩ directory-stats ∩ TopN mask
  // (each factor independently proves its excluded chunks contribute no
  // needed rows); null = no restriction
  private val candChunks: java.util.BitSet = {
    var s: java.util.BitSet = null
    def and(b: java.util.BitSet): Unit =
      if (b != null) {
        if (s == null) s = b.clone().asInstanceOf[java.util.BitSet] else s.and(b)
      }
    and(idxStatsChunks); and(topNMask)
    s
  }

  // ---- sparse candidate fetch (v13 chunk directories): when the candidate
  // set restricts this stripe to a small chunk fraction, every stream
  // fetches only the candidate chunks' byte ranges — a point probe reads
  // ~one chunk per stream, not the stripe. Requires any TopN skip to be
  // fully resolved by the mask (a dense peekStats walk can't see absent
  // chunks). ----
  private val sparseTotalChunks: Int = dirTotalChunks
  private val sparseChunks: java.util.BitSet =
    if (candChunks == null || sparseTotalChunks <= 0 || neededKeys.isEmpty ||
        (skipRows > 0 && topNMask == null) ||
        candChunks.length > sparseTotalChunks ||
        candChunks.cardinality().toLong * 4 > sparseTotalChunks) null
    else candChunks

  private def fetchStreams(keys: Array[String]): Map[String, (Array[Byte], Array[Boolean])] =
    if (sparseChunks != null)
      NimbleSource.readNeededStreamsSparse(reader, stripe, keys, file,
        sparseChunks, sparseTotalChunks)
    else NimbleSource.readNeededStreams(reader, stripe, keys, file)
      .map { case (k, b) => k -> (b, null: Array[Boolean]) }

  // ---- deferred projected-stream IO (the selective-reader idea applied at
  // the fetch layer): with pushed filters, only the FILTER-phase streams
  // (pushed refs + stats-only pruning leaves) fetch up front; projected-only
  // streams fetch on the FIRST chunk that actually survives. A stripe the
  // cascade kills outright never reads the projected columns' bytes — for a
  // selective probe at 100 TB that is most of the table's IO. ----
  private val (eagerKeys: Array[String], deferredKeys: Array[String]) =
    if (filters.isEmpty ||
        NimbleSource.seedPassRateOf(reader, dataSchema, filters) > NimbleSource.DeferSeedMax)
      (neededKeys, Array.empty[String])
    else {
      val fs = NimbleSource.filterStreamKeys(footerKeySet, dataSchema, filters, statsOnly)
      val e = neededKeys.filter(fs.contains)
      if (e.isEmpty) (neededKeys, Array.empty[String])
      else (e, neededKeys.filterNot(fs.contains))
    }

  /** Stream bytes materialized to this task (eager + deferred, prefetched
    * or direct) — the per-task face of the sparse/deferred fetch savings. */
  private[spark] var taskStreamBytes = 0L
  private def countedCursors(m: Map[String, (Array[Byte], Array[Boolean])])
      : Map[String, Tablet.ChunkCursor] =
    m.map { case (k, (b, present)) =>
      taskStreamBytes += b.length
      k -> new Tablet.ChunkCursor(b, present)
    }
  private val eagerCursors: Map[String, Tablet.ChunkCursor] =
    if (prefetched != null) {
      NimbleSource.prefetchHits.incrementAndGet()
      countedCursors(prefetched.view.filterKeys(eagerKeys.contains).toMap)
    } else countedCursors(fetchStreams(eagerKeys))

  /** Deferred cursors; null until the first surviving chunk (or a prefetch
    * that already carried the bytes) materializes them. */
  private var deferredCursors: Map[String, Tablet.ChunkCursor] =
    if (deferredKeys.isEmpty) Map.empty
    else if (prefetched != null && deferredKeys.forall(prefetched.contains))
      countedCursors(deferredKeys.iterator.map(k => k -> prefetched(k)).toMap)
    else null
  /** Chunks fully consumed (skipped or filtered dead) BEFORE deferred
    * materialization — fresh deferred cursors fast-forward this many chunk
    * frames so every stream stays row-aligned (sparse cursors fast-forward
    * their ordinal without bytes for absent chunks). */
  private var chunksBehind = 0

  private def ensureDeferredCursors(): Map[String, Tablet.ChunkCursor] = {
    if (deferredCursors == null) {
      deferredCursors = fetchStreams(deferredKeys).map { case (k, (b, present)) =>
        taskStreamBytes += b.length
        val c = new Tablet.ChunkCursor(b, present)
        var i = 0
        while (i < chunksBehind) { c.skip(); i += 1 }
        k -> c
      }
    }
    deferredCursors
  }

  private def cursorOf(key: String): Tablet.ChunkCursor =
    eagerCursors.getOrElse(key, ensureDeferredCursors()(key))

  /** Advance every stream past the current chunk without decode: eager
    * cursors skip; deferred ones skip when materialized, else lag-count. */
  private def skipChunkAllStreams(): Unit = {
    eagerCursors.valuesIterator.foreach(_.skip())
    if (deferredCursors != null) deferredCursors.valuesIterator.foreach(_.skip())
    else chunksBehind += 1
  }

  // `_file` metadata column (SupportsMetadataColumns): constant-per-file
  // path, no streams — shadowed by a real data column of the same name
  private val isFileCol: Array[Boolean] = required.fields.map { f =>
    f.name == "_file" && !dataSchema.fieldNames.contains("_file")
  }
  private val fileUtf8: Array[Byte] = file.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // schema evolution: a required field with NO streams in this file (added
  // to the table after the file was written) reads as all-null, parquet
  // style; its reader slot stays null and fillBatch null-fills the vector
  private val absentField: Array[Boolean] = required.fields.map { f =>
    !Fields.neededKeys(f.name, f.dataType, footerKeySet).exists(footerKeySet(_))
  }
  // field readers construct LAZILY per slot: a reader grabs its stream
  // cursors at construction, and constructing a deferred-stream reader
  // before any chunk survives would defeat the deferred fetch
  private val fieldReaderSlots = new Array[Fields.FieldReader](required.fields.length)
  private val fieldReaderMade = new Array[Boolean](required.fields.length)
  private def fieldReaderAt(i: Int): Fields.FieldReader = {
    if (!fieldReaderMade(i)) {
      fieldReaderMade(i) = true
      val f = required.fields(i)
      fieldReaderSlots(i) =
        if (absentField(i)) null
        else if (unsignedCols.contains(f.name)) new Fields.UnsignedR(f.name, f.dataType, cursorOf(_))
        else Fields.readerFor(f.name, f.dataType, cursorOf(_), footerKeySet)
    }
    fieldReaderSlots(i)
  }
  /** The slot if already constructed, else null — dead-chunk discards must
    * never construct (chunksBehind covers the unconstructed streams). */
  private def fieldReaderIfMade(i: Int): Fields.FieldReader =
    if (fieldReaderMade(i)) fieldReaderSlots(i) else null

  // no deferral in play (no filters, or the prefetch already carried every
  // stream): construct all readers up front — dead-chunk discards then
  // cover every stream and the lag counter is never consulted
  if (deferredCursors != null) {
    var fri = 0
    while (fri < required.fields.length) { fieldReaderAt(fri); fri += 1 }
  }

  // separate readers (cursors) for filter-only columns
  private val filterReaders: Map[String, Fields.FieldReader] =
    filterCols.filter(c => reader.keyId(c) >= 0).map { c =>
      val dt = dataSchema(c).dataType
      val rdr: Fields.FieldReader =
        if (footerKeySet(c + "#nanos")) new Fields.TsNanosR(c, cursorOf(_))
        else new Fields.PrimR(c, dt, cursorOf(_))
      c -> rdr
    }.toMap

  // required fields that are themselves filter references: decode raw first,
  // evaluate, then reuse the same decoded chunk for the vector fill.
  private val requiredFilterRefs: Set[String] =
    filters.flatMap(_.references).toSet.intersect(required.fieldNames.toSet)

  // ---- cascading filter decode plan (reference:
  // docs/develop/nimble_selective_reader.rst:163-199 — decode filter columns
  // in selectivity order, each narrowing the row set the next must test).
  // Reader per referenced column that exists in this file: filter-only
  // columns get their own cursors; projected refs reuse the field reader so
  // the decoded chunk serves the vector fill too.
  private val cascadeReaderOf: Map[String, Fields.FieldReader] = {
    // projected filter refs construct their field reader now — their streams
    // are in the eager (filter-phase) set by construction
    val req = required.fields.zipWithIndex.collect {
      case (f, i) if requiredFilterRefs.contains(f.name) && fieldReaderAt(i) != null =>
        f.name -> fieldReaderAt(i)
    }.toMap
    filterReaders ++ req
  }
  /** Shared conjunct partitioning + adaptive ordering + footer-seeded cold
    * start (one instance per stripe reader; evidence spans its chunks). */
  private val cascade = new FilterCascade(filters,
    n => dataSchema(n).dataType,
    cascadeReaderOf.contains,
    c => reader.fileStatsOf(c).map { st =>
      if (footerKeySet(c + "#nanos")) NimbleSource.nanosScaledStats(st) else st
    },
    c => footer.ndvSketches.get(c).map(graft.format.Hll.estimate))

  private val anchor: Tablet.ChunkCursor = {
    // any EAGER stream tracks chunk progression (eagerKeys == neededKeys
    // when nothing defers); none when the projection/filters need no stream
    if (eagerKeys.nonEmpty) eagerCursors(eagerKeys.head)
    else if (neededKeys.nonEmpty) cursorOf(neededKeys.head)
    else null
  }

  private val allAtomicProjection: Boolean = required.fields.forall(f => f.dataType match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  })

  private var chunkOrd = 0

  private var rowsRemaining: Long = footer.stripes(stripe).rowCount
  private var current: ColumnarBatch = null
  /** In nested-projection mode with pushed filters: per-row survivor mask of
    * the current (uncompacted) batch; null = all rows pass. */
  var currentMask: Array[Boolean] = null

  private val hasFilters = filters.nonEmpty

  // Reusable output vectors/batch (reset per chunk, closed once at reader
  // close — avoids per-batch allocation + GC churn, like Spark's
  // VectorizedParquetRecordReader).
  private var reusableVecs: Array[OnHeapColumnVector] = null
  private var reusableBatch: ColumnarBatch = null

  override def next(): Boolean = {
    current = null
    currentMask = null
    if (limit >= 0 && emitted >= limit) return false
    while (true) {
      if (anchor == null) {
        // no streams to read: zero-column projection (count(*)) or every
        // projected/filtered column absent from this file (schema evolution)
        if (rowsRemaining <= 0) return false
        // filters here can only reference absent columns (a present filter
        // column would have added its stream): row-constant over nulls
        if (hasFilters) {
          val pass = filters.forall(f => Filters.compile(f,
            n => dataSchema(n).dataType,
            n => NimbleSource.nullColumn(dataSchema(n).dataType, 1))(0))
          if (!pass) { rowsRemaining = 0; return false }
        }
        val n = math.min(rowsRemaining, 16384L).toInt
        rowsRemaining -= n
        if (required.fields.isEmpty) {
          current = new ColumnarBatch(Array.empty[ColumnVector], n)
        } else {
          ensureReusableBatch()
          var vi = 0
          while (vi < reusableVecs.length) {
            reusableVecs(vi).reset()
            reusableVecs(vi).reserve(n)
            if (isFileCol(vi)) fillFileCol(reusableVecs(vi), n)
            else reusableVecs(vi).putNulls(0, n)
            vi += 1
          }
          reusableBatch.setNumRows(n)
          current = reusableBatch
          emitted += n
        }
        return true
      }
      if (!anchor.hasNext) return false
      if (toSkip > 0) {
        // TopN tail positioning (row-range skipping analog, ref
        // velox/VeloxReader.cpp:441 seekToRow): whole chunks strictly before
        // the wanted tail advance without decompressing; the first partially
        // covered chunk (or a stats-less legacy chunk) stops the skip and
        // emits whole — callers hold partial-TopN superset semantics
        val st = anchor.peekStats()
        if (st.isDefined && st.get.valueCount <= toSkip) {
          skipChunkAllStreams()
          toSkip -= st.get.valueCount
          chunkOrd += 1
          taskChunksSkipped += 1
          NimbleSource.chunksSkipped.incrementAndGet()
        } else toSkip = 0
      } else {
      // Chunk skipping via chunk-frame stats (reference:
      // dwio/nimble/tablet/ChunkStats.h): if any pushed or stats-only
      // (nested-leaf) filter proves the chunk empty from min/max/nullCount,
      // advance every stream cursor past it without decompressing or
      // decoding. Sound for ANY projection shape: the writer flushes every
      // stream at the same row boundaries, so chunk k of every stream —
      // nested children included — covers the same rows. Stats-only leaf
      // predicates consult their stream's chunk stats only when the
      // projection already reads that stream (absent → conservative no-op).
      // candidate restriction first (index ∩ dir-stats ∩ TopN mask): a chunk
      // outside the candidate set skips without even peeking stats — under a
      // sparse fetch its bytes were never read
      if (candChunks != null && !candChunks.get(chunkOrd)) {
        chunkOrd += 1
        skipChunkAllStreams()
        taskChunksSkipped += 1
        NimbleSource.chunksSkipped.incrementAndGet()
      } else if (hasFilters || statsOnly.nonEmpty) {
        // filter + stats-only refs are eager by construction; a deferred
        // stream must never materialize for a stats peek
        val statsOf: String => Option[Tablet.Stats] =
          name => eagerCursors.get(name).flatMap(_.peekStats()).map { st =>
            if (footerKeySet(name + "#nanos")) NimbleSource.nanosScaledStats(st) else st
          }.orElse(NimbleSource.fmMappedStats(name, footerKeySet.escaped,
            k => eagerCursors.get(k).flatMap(_.peekStats())))
        var pruned = false
        var pi = 0
        while (pi < filters.length && !pruned) {
          if (Filters.pruneStripe(filters(pi), statsOf, _ => None)) pruned = true
          pi += 1
        }
        pi = 0
        while (pi < statsOnly.length && !pruned) {
          if (Filters.pruneStripe(statsOnly(pi), statsOf, _ => None)) pruned = true
          pi += 1
        }
        chunkOrd += 1
        if (pruned) {
          skipChunkAllStreams()
          taskChunksSkipped += 1
          NimbleSource.chunksSkipped.incrementAndGet()
        } else if (!hasFilters) {
          return fillBatch(null, -1)
        } else {
          val r = decodeAndFilterChunk()
          if (r != 0) return r > 0
        }
      } else {
        chunkOrd += 1
        return fillBatch(null, -1)
      }
      }
    }
    false
  }

  /** Consume a reader's next chunk without output. Single dispatch point for
    * every discard site: scalar readers skip their cursors cheaply, anything
    * else decodes into a throwaway vector — there is deliberately no silent
    * no-op arm, so a future reader type cannot desync chunk alignment. */
  private def discardChunk(r: Fields.FieldReader, dt: org.apache.spark.sql.types.DataType): Unit =
    r match {
      case p: Fields.PrimR => p.readChunkDiscard()
      case t: Fields.TsNanosR => t.readChunkDiscard()
      case other => other.readChunk(discardVector(dt), null)
    }

  /** Cascading filter decode of the next chunk (the reference's
    * selectivity-ordered SelectiveReader idea, nimble_selective_reader.rst:
    * 163-199): absent-column conjuncts decide first at zero cost, then each
    * single-column group decodes ONLY its column — most selective first —
    * and narrows the survivor set for everything after it; once the set is
    * empty, the remaining filter columns (and every projected column) are
    * skipped without decoding. Returns 1 = batch ready, -1 = end, 0 = chunk
    * fully filtered (caller continues the loop). */
  private def decodeAndFilterChunk(): Int = {
    val decoded = mutable.HashMap[String, graft.format.Column]()
    val dts: String => DataType = n => dataSchema(n).dataType
    // string columns decode dictionary-preserving (DictBytesCol) so
    // low-cardinality predicates cost alphabet-size compares per chunk;
    // r21: equality-family predicate columns decode LAZY instead — an FSST
    // chunk stays encoded and the probe compares in the encoded domain
    // (Filters.fsstEqPred); DICT and every other shape decode identically
    // either way, and a projected survivor set still fills from the lazy
    // column (survivors-only string materialization)
    def decodeCol(name: String): graft.format.Column = decoded.getOrElseUpdate(name,
      cascadeReaderOf(name) match {
        case p: Fields.PrimR if dts(name) == StringType || dts(name) == BinaryType =>
          if (cascade.eqOnlyCols(name)) p.decodeRawLazy() else p.decodeRawDict()
        case other => other.decodeRaw()
      })
    // projected refs decline point reads — their full chunk stays pending
    // for the vector fill; non-PrimR readers have no positional decode;
    // the string-vs-numeric decline rule lives in PrimR.pointReadAt (one
    // copy for every cascade call site)
    def pointRead(name: String, positions: Array[Int]): graft.format.Column =
      if (requiredFilterRefs.contains(name)) null
      else cascadeReaderOf(name) match {
        case p: Fields.PrimR => p.pointReadAt(positions)
        case _ => null
      }

    val res = cascade.evalChunk(decodeCol, pointRead)
    var chunkRows = res.chunkRows
    val alive = res.alive
    val surv = res.surv

    if (chunkRows < 0)
      // nothing decoded (all-constant conjuncts, or the chunk died before
      // any decode): size from stats for the fill / skip bookkeeping
      chunkRows = anchor.peekStats().map(_.valueCount.toInt).getOrElse {
        if (alive == 0) 0 // dead chunk: exact size irrelevant, only alignment
        else throw new IllegalStateException(
          "nimble: chunk without stats while sizing an evolved batch")
      }
    val m = if (alive < 0) chunkRows else alive

    // consume this chunk on every never-decoded filter-only cursor (decoded
    // ones just clear their pending column) — chunk alignment is invariant
    for ((c, r) <- filterReaders) discardChunk(r, dataSchema(c).dataType)
    if (m == 0) {
      // nothing survives: consume this chunk on every CONSTRUCTED reader;
      // deferred streams whose readers were never built lag-advance via
      // chunksBehind (skipChunkAllStreams) instead of materializing
      var k = 0
      while (k < required.fields.length) {
        val r = fieldReaderIfMade(k)
        if (r != null) discardChunk(r, required.fields(k).dataType)
        k += 1
      }
      if (deferredCursors == null) chunksBehind += 1
      0
    } else if (allAtomicProjection) {
      // compact survivors during the vector fill
      val selection =
        if (m == chunkRows) null
        else java.util.Arrays.copyOf(surv, m)
      if (fillBatch(selection, chunkRows)) 1 else -1
    } else {
      // nested projection: fill full chunk, expose the mask (row reader filters)
      val ok = fillBatch(null, chunkRows)
      currentMask =
        if (m == chunkRows) null
        else {
          val passed = new Array[Boolean](chunkRows)
          var k = 0
          while (k < m) { passed(surv(k)) = true; k += 1 }
          passed
        }
      emitted -= (chunkRows - m) // only survivors count against the limit
      if (ok) 1 else -1
    }
  }

  private def discardVector(dt: DataType): OnHeapColumnVector =
    new OnHeapColumnVector(16, dt)

  private def fillFileCol(vec: OnHeapColumnVector, n: Int): Unit = {
    var r = 0
    while (r < n) { vec.putByteArray(r, fileUtf8); r += 1 }
  }

  private def ensureReusableBatch(): Unit =
    if (reusableVecs == null) {
      reusableVecs = required.fields.map(f => new OnHeapColumnVector(16384, f.dataType))
      reusableBatch = new ColumnarBatch(reusableVecs.asInstanceOf[Array[ColumnVector]], 0)
    }

  private def fillBatch(selection: Array[Int], chunkRowsHint: Int): Boolean = {
    ensureReusableBatch()
    var outRows = -1
    var i = 0
    while (i < required.fields.length) {
      reusableVecs(i).reset()
      val fr = fieldReaderAt(i) // constructs deferred readers on first survivor
      if (fr != null) {
        val n = fr.readChunk(reusableVecs(i), selection)
        if (outRows < 0) outRows = n
      }
      i += 1
    }
    if (outRows < 0) // zero present projected columns but pushed filters ran
      outRows = if (selection != null) selection.length else chunkRowsHint
    // absent (schema-evolved) fields null-fill to the batch's row count;
    // reserve first — vectors allocate at 16384 and putNulls does not grow,
    // so a file written with rowsPerChunk > 16384 would overflow otherwise.
    // `_file` metadata fields fill the constant path instead.
    i = 0
    while (i < required.fields.length) {
      if (fieldReaderAt(i) == null) {
        reusableVecs(i).reserve(outRows)
        if (isFileCol(i)) fillFileCol(reusableVecs(i), outRows)
        else reusableVecs(i).putNulls(0, outRows)
      }
      i += 1
    }
    reusableBatch.setNumRows(outRows)
    current = reusableBatch
    emitted += outRows
    true
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = {
    if (reusableBatch != null) reusableBatch.close()
    reader.close()
  }
}

// ----------------------------------------------------------------- write

class NimbleWriteBuilder(path: String, schema: StructType, options0: CaseInsensitiveStringMap,
    replaceFilesFn: () => Seq[String] = null,
    appendLayoutFn: () => Map[String, String] = null)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def overwrite(filters: Array[Filter]): WriteBuilder = { truncateFirst = true; this }

  // effective options: appends fold the recovered per-file-local layout
  // UNDER the explicit options (explicit always wins); resolved once at
  // first use, which is always after the truncate/overwrite calls
  private lazy val options: CaseInsensitiveStringMap = {
    val recovered =
      if (truncateFirst || appendLayoutFn == null) Map.empty[String, String]
      else appendLayoutFn()
    if (recovered.isEmpty) options0
    else new CaseInsensitiveStringMap((recovered ++ options0.asScala).asJava)
  }

  private def sortCols: Seq[String] =
    Option(options.get("sortColumns")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  private def csvOpt(name: String): Set[String] =
    Option(options.get(name)).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  private def writeOpts: Fields.WriteOptions = Fields.WriteOptions(
    flatMap = csvOpt("flatMapColumns"),
    dictArray = csvOpt("dictionaryArrayColumns"),
    dedupMap = csvOpt("deduplicatedMapColumns"),
    tsNanos = csvOpt("timestampNanosColumns"),
    ndv = Option(options.get("ndvSketches")).forall(_.toBoolean),
    maxFlatMapKeys = Option(options.get("maxFlatMapKeys")).map(_.toInt)
      .getOrElse(Fields.WriteOptions().maxFlatMapKeys))

  /** bucketColumns + numBuckets write options (hash-bucketed table for
    * storage-partitioned joins). Key types restricted to the hash-stable
    * atomic domain — a float bucket key would make equality-on-join and
    * hash-on-write disagree about NaN/-0.0. */
  private def bucketSpec: Option[(Seq[String], Int)] = {
    val cols = Option(options.get("bucketColumns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val n = Option(options.get("numBuckets")).map(_.toInt).getOrElse(0)
    if (cols.isEmpty && n <= 0) return None
    require(cols.nonEmpty && n > 0,
      "nimble: bucketColumns and numBuckets (> 0) must be set together")
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(throw new IllegalArgumentException(
        s"nimble: bucketColumns: no such column '$c'"))
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | TimestampNTZType | StringType | BinaryType | BooleanType => ()
        case dt => throw new IllegalArgumentException(
          s"nimble: bucketColumns: column '$c' has unsupported type ${dt.simpleString}")
      }
    }
    Some((cols, n))
  }

  private def validateIndexOpts(): Unit = {
    // an index over a nanos-split column would hold MICROS keys that no
    // epoch-nanos probe can use (Lookup and the scan both refuse it) —
    // reject the dead-weight configuration instead of writing it.
    // lower-cased compare: index members resolve case-insensitively in the
    // writer, so a case-differing spelling must not bypass this guard
    val members = csvOpt("indexColumns").flatMap(_.split("\\+").map(_.trim.toLowerCase))
    val bad = members.intersect(csvOpt("timestampNanosColumns").map(_.toLowerCase))
    require(bad.isEmpty,
      s"nimble: indexColumns ${bad.mkString(",")} are timestampNanosColumns — " +
        "the index would hold micros keys no epoch-nanos probe can use")
  }

  private def mkBatch(bucket: Option[(Seq[String], Int)]): BatchWrite =
    new NimbleBatchWrite(path, schema, truncateFirst, sortCols, writeOpts,
      csvOpt("bloomFilterColumns"), Option(options.get("compression")).getOrElse("zstd"),
      csvOpt("indexColumns"),
      Option(options.get("rowsPerChunk")).map(_.toInt).getOrElse(16384),
      Option(options.get("stripeBytes")).map(_.toLong).getOrElse(96L << 20), bucket,
      replaceFilesFn)

  /** Structured Streaming sink: files are immutable and appended per epoch,
    * which matches the format's append-only tablet model exactly; epoch id
    * lands in the file name so replayed epochs overwrite deterministically
    * (exactly-once via Spark's commit protocol). */
  private def mkStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new NimbleStreamingWrite(path, schema.json, sortCols, writeOpts,
      csvOpt("bloomFilterColumns"), Option(options.get("compression")).getOrElse("zstd"),
      csvOpt("indexColumns"),
      Option(options.get("rowsPerChunk")).map(_.toInt).getOrElse(16384),
      Option(options.get("stripeBytes")).map(_.toLong).getOrElse(96L << 20),
      Option(options.get("autoCompactEvery")).map(_.toInt).getOrElse(0),
      Option(options.get("autoCompactMinFileBytes")).map(_.toLong).getOrElse(32L << 20),
      Option(options.get("autoCompactTargetBytes")).map(_.toLong).getOrElse(256L << 20))

  override def build(): Write = {
    validateIndexOpts()
    bucketSpec match {
      case None if sortCols.isEmpty => new Write {
        override def toBatch: BatchWrite = mkBatch(None)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          mkStreaming
      }
      case None =>
        // sorted, unbucketed: declare the per-file ordering so Spark sorts
        // each task's rows itself when the child plan isn't already ordered
        // (an already-sorted child satisfies the requirement — no extra
        // sort). This is what keeps SQL UPDATE/MERGE replacement files on
        // the sort contract without a caller-side sortWithinPartitions.
        new Write with RequiresDistributionAndOrdering {
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
          override def toBatch: BatchWrite = mkBatch(None)
          override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            mkStreaming
          override def requiredDistribution(): Distribution = Distributions.unspecified()
          override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            sortCols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
        }
      case spec @ Some((cols, n)) =>
        // Bucketed write: ask Spark to hash-cluster the input into exactly n
        // partitions (REPARTITION_BY_NUM origin, so AQE never coalesces and
        // partition id == pmod(murmur3(key), n) == bucket id) and, when the
        // table also declares sortColumns, to sort within each bucket — one
        // declarative plan step buys both co-located joins and in-file order.
        import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
        import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
        new Write with RequiresDistributionAndOrdering {
          override def toBatch: BatchWrite = mkBatch(spec)
          override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            throw new UnsupportedOperationException(
              "nimble: bucketed streaming writes are not supported (epoch files would " +
                "fragment buckets); write unbucketed and compact, or use batch jobs")
          override def requiredDistribution(): Distribution =
            Distributions.clustered(cols.map(c => Expressions.column(c): org.apache.spark.sql.connector.expressions.Expression).toArray)
          override def requiredNumPartitions(): Int = n
          override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            sortCols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
        }
    }
  }
}

class NimbleStreamingWrite(path: String, schemaJson: String, sortColumns: Seq[String],
    writeOpts: Fields.WriteOptions = Fields.WriteOptions(),
    bloomColumns: Set[String] = Set.empty, compression: String = "zstd",
    indexColumns: Set[String] = Set.empty, rowsPerChunk: Int = 16384,
    stripeRawBytes: Long = 96L << 20,
    autoCompactEvery: Int = 0,
    autoCompactMinFileBytes: Long = 32L << 20,
    autoCompactTargetBytes: Long = 256L << 20)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    GraftIO.mkdirs(path)
    NimbleStreamingWriterFactory(path, schemaJson, sortColumns, GraftIO.broadcastConf(),
      writeOpts, bloomColumns, compression, indexColumns, rowsPerChunk, stripeRawBytes)
  }

  /** Sink-side auto-compaction (`autoCompactEvery=N` epochs): merge the
    * accumulated small-file tail in place via
    * [[graft.ops.Compaction.compactSmall]]. ONLY files from epochs strictly
    * BEFORE the committing epoch are eligible — the current epoch sits in
    * the exactly-once replay window (a failure between this commit and the
    * checkpoint write replays it; its files must still exist under their
    * original names so the replay overwrites instead of duplicating).
    * Epochs `< epochId` are durably in the checkpoint and never replay.
    * Maintenance never fails the stream: a compaction error logs and the
    * epoch commits anyway (the data files are already in place). */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    if (autoCompactEvery > 0 && epochId > 0 && epochId % autoCompactEvery == 0) {
      val epochRe = "epoch-(\\d+)-".r
      def eligible(f: String): Boolean = {
        val name = f.substring(f.lastIndexOf('/') + 1)
        epochRe.findFirstMatchIn(name) match {
          case Some(m) => m.group(1).toLong < epochId
          case None => true // already-compacted replacements: keep consolidating
        }
      }
      try graft.ops.Compaction.compactSmall(
        org.apache.spark.sql.SparkSession.active, path,
        autoCompactMinFileBytes, autoCompactTargetBytes, eligible)
      catch {
        case e: Exception =>
          System.err.println(s"nimble: auto-compact of $path at epoch $epochId " +
            s"skipped: ${e.getMessage}")
      }
    }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class NimbleStreamingWriterFactory(path: String, schemaJson: String, sortColumns: Seq[String],
    hadoopConf: org.apache.spark.broadcast.Broadcast[GraftIO.SerializableConf] = null,
    writeOpts: Fields.WriteOptions = Fields.WriteOptions(),
    bloomColumns: Set[String] = Set.empty, compression: String = "zstd",
    indexColumns: Set[String] = Set.empty, rowsPerChunk: Int = 16384,
    stripeRawBytes: Long = 96L << 20)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  // epoch id in the name: a replayed epoch rewrites the same files, so the
  // streaming sink is idempotent without a rename step
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    GraftIO.installConf(hadoopConf)
    // the streaming sink honors the same writer options as the batch path
    // (an indexed/bloomed streaming table probes identically after each epoch)
    new NimbleDataWriter(s"$path/epoch-$epochId-part-%05d.gft".format(partitionId), schemaJson,
      sortColumns, rowsPerChunk = rowsPerChunk, stripeRawBytes = stripeRawBytes,
      writeOpts = writeOpts,
      bloomColumns = bloomColumns, compression = compression, indexColumns = indexColumns)
  }
}

/** Task output committed via the message, not the filesystem. */
case class NimbleCommitMessage(tempFile: String, finalFile: String) extends WriterCommitMessage

/** Batch write with a real output commit protocol (the fix VERDICT.md r2
  * "What's wrong" #3 demands; parquet's FileOutputCommitter v1 shape): tasks
  * write to `_temporary/<jobTag>/`, the driver renames the files named in the
  * commit messages into place and deletes the working dir. A task that dies
  * mid-write — even without running `abort()` — leaves its partial file in
  * `_temporary/`, which readers never list and `commit()`/`abort()` removes;
  * speculative/retried attempts are distinct temp files and only the
  * attempt Spark commits is renamed in. Truncate (overwrite) also happens at
  * commit time, so a failed overwrite job leaves the old table intact. */
class NimbleBatchWrite(path: String, schema: StructType, truncateFirst: Boolean,
    sortColumns: Seq[String], writeOpts: Fields.WriteOptions = Fields.WriteOptions(),
    bloomColumns: Set[String] = Set.empty, compression: String = "zstd",
    indexColumns: Set[String] = Set.empty, rowsPerChunk: Int = 16384,
    stripeRawBytes: Long = 96L << 20,
    bucketSpec: Option[(Seq[String], Int)] = None,
    replaceFilesFn: () => Seq[String] = null) extends BatchWrite {

  // per-job tag: task ids restart at 0 in a new Spark application, so append
  // jobs would otherwise silently overwrite files from an earlier run
  private val jobTag = java.util.UUID.randomUUID().toString.substring(0, 8)
  private def tempDir = GraftIO.child(GraftIO.child(path, "_temporary"), jobTag)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    GraftIO.mkdirs(tempDir)
    // a bucketed write's distribution contract (partition id == bucket id)
    // requires exactly numBuckets tasks. Exception: Spark collapses an
    // empty child to ONE dummy partition (SPARK-23271), so a zero-row
    // append legitimately arrives as numPartitions == 1 — allowed, because
    // the per-row writer check still fails any partition-0 row whose hash
    // isn't bucket 0, so a genuinely bypassed distribution cannot slip
    // through this door with data
    bucketSpec.foreach { case (_, n) =>
      require(info.numPartitions == n || info.numPartitions == 1,
        s"nimble: bucketed write expected $n partitions, got ${info.numPartitions}") }
    NimbleWriterFactory(path, schema.json, sortColumns, writeOpts, bloomColumns, compression, jobTag,
      GraftIO.broadcastConf(), indexColumns, rowsPerChunk, stripeRawBytes, bucketSpec)
  }

  /** Consistency contract (FileOutputCommitter-v1 shape): commit is NOT
    * atomic. In overwrite mode there is a window — old files deleted, new
    * files not yet renamed in — where a concurrent reader sees an empty or
    * partial table, and a driver crash inside it loses the old data while
    * the new files sit in `_temporary`. Delete-first is deliberate: the
    * rename-first alternative makes a concurrent reader silently see
    * duplicate rows (old + new part files), which is worse than visibly
    * missing ones. Renames fan out on the footer-I/O pool: a 100 TB job
    * commits 10^4-10^6 files and one driver-serial RPC per file (a copy on
    * S3A) would serialize job completion. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncateFirst)
      NimbleSource.listFiles(path).foreach(f => GraftIO.delete(f))
    var pairs = messages.collect { case NimbleCommitMessage(temp, dest) => (temp, dest) }.toSeq
    if (replaceFilesFn != null) {
      // ReplaceData (row-level DELETE/UPDATE/MERGE): swap exactly the
      // scanned group files for the rewritten ones — delete-first for the
      // same no-silent-duplicates reason as overwrite. Zero-row task files
      // stay out (they would break the one-file-per-bucket ordering
      // contract and add footer reads for nothing).
      val victims = replaceFilesFn()
      val nonEmpty = pairs.filter { case (temp, _) => NimbleSource.footerOf(temp).rowCount > 0 }
      // a rewrite that deletes every row of the LAST files keeps ONE
      // zero-row file: the schema (and declared layout) must survive an
      // emptied table
      pairs =
        if (nonEmpty.isEmpty && victims.toSet == NimbleSource.listFiles(path).toSet)
          pairs.take(1)
        else nonEmpty
      victims.foreach(f => GraftIO.delete(f))
    }
    NimbleSource.foreachParallel(pairs) { case (temp, dest) =>
      if (!GraftIO.rename(temp, dest))
        throw new java.io.IOException(s"nimble: commit failed renaming $temp -> $dest")
    }
    cleanTemp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanTemp()

  private def cleanTemp(): Unit = {
    GraftIO.delete(tempDir, recursive = true)
    // drop the shared _temporary parent too when this was the last job in it.
    // A non-empty parent (another job still writing) must not fail this
    // job's commit: local File.delete returns false, but HDFS/S3A throw
    // PathIsNotEmptyDirectoryException on a non-recursive delete.
    try GraftIO.delete(GraftIO.child(path, "_temporary"))
    catch { case _: java.io.IOException => () }
  }
}

case class NimbleWriterFactory(path: String, schemaJson: String, sortColumns: Seq[String],
    writeOpts: Fields.WriteOptions = Fields.WriteOptions(),
    bloomColumns: Set[String] = Set.empty, compression: String = "zstd",
    jobTag: String = "0",
    hadoopConf: org.apache.spark.broadcast.Broadcast[GraftIO.SerializableConf] = null,
    indexColumns: Set[String] = Set.empty, rowsPerChunk: Int = 16384,
    stripeRawBytes: Long = 96L << 20,
    bucketSpec: Option[(Seq[String], Int)] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    // executor JVMs inherit the driver's spark.hadoop.* (S3A credentials etc.)
    GraftIO.installConf(hadoopConf)
    val name = s"part-%05d-$jobTag.gft".format(partitionId)
    // taskId (attempt-unique) in the temp name keeps speculative attempts of
    // the same partition from clobbering each other mid-write
    val temp = GraftIO.child(GraftIO.child(GraftIO.child(path, "_temporary"), jobTag), s"$taskId-$name")
    new NimbleDataWriter(temp, schemaJson, sortColumns, rowsPerChunk = rowsPerChunk,
      stripeRawBytes = stripeRawBytes, writeOpts = writeOpts,
      bloomColumns = bloomColumns, compression = compression,
      finalFile = GraftIO.child(path, name), indexColumns = indexColumns,
      // clustered distribution: this task's partition id IS the bucket id
      bucketSpec = bucketSpec, bucketId = partitionId)
  }
}

/** Per-task file writer: buffers `rowsPerChunk` rows, encodes chunk, flushes
  * stripes at a raw-size threshold — bounded memory regardless of input size
  * (reference: dwio/nimble/writer/FlushPolicy.h:74,114 and
  * docs/develop/nimble_writer.rst:211-282). */
class NimbleDataWriter(file: String, schemaJson: String, sortColumns: Seq[String],
    rowsPerChunk: Int = 16384, stripeRawBytes: Long = 96L << 20,
    writeOpts: Fields.WriteOptions = Fields.WriteOptions(),
    bloomColumns: Set[String] = Set.empty, compression: String = "zstd",
    finalFile: String = null, indexColumns: Set[String] = Set.empty,
    bucketSpec: Option[(Seq[String], Int)] = None, bucketId: Int = -1)
    extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val tablet = new Tablet.Writer(file, schemaJson, Array.empty, sortColumns, bloomColumns,
    compression, indexColumns,
    bucketColumns = bucketSpec.map(_._1).getOrElse(Nil),
    numBuckets = bucketSpec.map(_._2).getOrElse(0),
    bucketId = if (bucketSpec.isDefined) bucketId else -1,
    ndvSketches = writeOpts.ndv)
  private val writers: Array[Fields.FieldWriter] =
    schema.fields.map(f => Fields.writerFor(f.name, f.dataType, tablet.ensureStream, writeOpts))
  private var pendingRows = 0

  // per-row declaration check for bucketed writes: the footer asserts
  // "every row hashes to bucketId" and shuffle-free joins rely on it, so a
  // row that disproves it (a Spark partitioning change, a bypassed
  // distribution) must fail the write, not poison every future join
  private val bucketIdxs: Array[Int] =
    bucketSpec.map(_._1.map(c => schema.fieldIndex(c)).toArray).orNull
  private val bucketDts: Array[DataType] =
    if (bucketIdxs == null) null else bucketIdxs.map(i => schema.fields(i).dataType)
  private val bucketN: Int = bucketSpec.map(_._2).getOrElse(0)

  override def write(row: InternalRow): Unit = {
    if (bucketIdxs != null) {
      val b = NimbleSource.pmod(NimbleSource.bucketHash(row, bucketIdxs, bucketDts), bucketN)
      if (b != bucketId) throw new IllegalStateException(
        s"nimble: bucketed write: row hashes to bucket $b but this task writes bucket " +
          s"$bucketId of $bucketN — the clustered distribution was not applied")
    }
    var i = 0
    while (i < writers.length) { writers(i).add(row, i); i += 1 }
    pendingRows += 1
    if (pendingRows >= rowsPerChunk) flushChunk()
  }

  private def flushChunk(): Unit = {
    if (pendingRows == 0) return
    var i = 0
    while (i < writers.length) { writers(i).flushChunk(tablet); i += 1 }
    tablet.addRows(pendingRows.toLong)
    pendingRows = 0
    if (tablet.bufferedBytes >= stripeRawBytes) {
      tablet.flushStripe()
      i = 0
      while (i < writers.length) { writers(i).onStripeFlush(); i += 1 }
    }
  }

  override def commit(): WriterCommitMessage = {
    flushChunk()
    tablet.close()
    if (finalFile != null) NimbleCommitMessage(file, finalFile)
    else new WriterCommitMessage {} // streaming: deterministic name, in place
  }
  override def abort(): Unit = {
    try tablet.close() catch { case _: Throwable => () }
    GraftIO.delete(file)
  }
  override def close(): Unit = ()
}
