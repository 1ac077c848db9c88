package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import graft.format._
import graft.spark.{Filters, NimbleSource}

/** Chunk-granular copy-on-write for DELETE / literal UPDATE — the
  * boundary-file fix for retention deletes and keyhole updates.
  *
  * File-granular classification (Delete.classify) already makes a retention
  * delete on a sorted table ~metadata-only: tail files unlink, head files
  * stay. What remains is the ONE mixed file straddling the predicate
  * boundary — and rewriting it costs O(file), which at 96 MB stripes and
  * multi-GB files means decoding and re-encoding tens of millions of kept
  * rows to delete a handful (the r17 "bimodal scale_delete": whether the
  * range-sampled file boundary landed above or below the predicate constant
  * decided between a ~1 K-row and a ~1 M-row rewrite of the same delete).
  *
  * This pass applies the SAME three-valued stats classification one level
  * down, at the chunk grid (the per-chunk stats the v14 chunk directory
  * carries for skip-scans — reference: dwio/nimble/tablet/
  * ChunkStatsWriter.h:80-89):
  *
  *  - chunk provably none-match  -> its frame is copied BYTE-FOR-BYTE
  *    (no decompress, no decode, no re-encode); its directory stats fold
  *    into the new stripe stats exactly, so stats stay answer-grade for
  *    aggregate pushdown;
  *  - chunk provably all-match   -> DELETE drops it (zero bytes touched);
  *  - mixed                      -> decoded, masked row-wise with the
  *    scan's own compiled predicates ([[Filters.compile]] — identical null
  *    semantics to the scan), re-encoded; a mask that touches no row
  *    degrades back to the raw byte copy.
  *
  * Shared-dictionary streams participate: the stripe-scoped alphabet frame
  * copies byte-for-byte at its original position (a superset alphabet is
  * always valid), kept index chunks copy raw, and mixed chunks decode
  * through a sequential [[Tablet.ChunkCursor]] (which swallows alphabet
  * frames transparently) before re-encoding plain.
  *
  * Cost becomes O(boundary chunks), not O(file): the 8 M-row bench shape
  * rewrites one ~16 K-row chunk instead of ~1 M kept rows, and a 100 TB
  * retention delete rewrites one chunk per boundary file regardless of file
  * size. Raw copy preserves row order, so sorted layout survives.
  *
  * Eligibility is conservative — anything outside it falls back to the
  * whole-file Spark rewrite (correctness never depends on surgery):
  *  - the pushed filters EXACTLY represent the condition (caller
  *    guarantees: SQL deleteWhere filters, or a fully-translated Column);
  *  - flat atomic schema (no struct/array/map streams whose child grids
  *    aren't 1:1 with top-level rows);
  *  - no bloom / hash-index / sorted-index / composite streams (stripe-
  *    scoped structures raw frames can't patch);
  *  - every data chunk carries directory stats (v14 writers);
  *  - chunk grids ordinal-align across streams (verified per stripe from
  *    the directories' data-frame row counts);
  *  - filters don't reference nanos-split columns (their raw stats are in
  *    the micros domain).
  */
object Surgery {

  /** Chunk outcomes of the most recent surgery on this JVM (raw-copied /
    * dropped / row-rewritten) — specs and probes pin the O(boundary-chunks)
    * contract on them (same diagnostics pattern as
    * NimbleSource.chunksSkipped). */
  val lastRawChunks = new java.util.concurrent.atomic.AtomicLong()
  val lastDroppedChunks = new java.util.concurrent.atomic.AtomicLong()
  val lastRewrittenChunks = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def resetCounters(): Unit = {
    lastRawChunks.set(0L); lastDroppedChunks.set(0L); lastRewrittenChunks.set(0L)
  }

  // ------------------------------------------------------------ delete

  /** Try chunk surgery on each victim; replacements land in `sideDir` under
    * the victim's filename. Returns (files surgered, rowsBefore, rowsAfter,
    * files that must take the fallback rewrite). One victim runs inline on
    * the driver (no job-launch overhead on the common single-boundary-file
    * shape); more fan out one Spark task per file. */
  def deleteFiles(spark: SparkSession, victims: Seq[String],
      filters: Array[Filter], sideDir: String)
      : (Seq[String], Long, Long, Seq[String]) = {
    resetCounters()
    GraftIO.mkdirs(sideDir)
    val outcomes: Seq[(String, Option[(Long, Long)])] =
      if (victims.lengthCompare(1) == 0)
        victims.map(f => f -> deleteFile(f, filters, sideDir))
      else
        spark.sparkContext.parallelize(victims, victims.length)
          .map(f => f -> deleteFile(f, filters, sideDir))
          .collect().toSeq
    val done = outcomes.collect { case (f, Some(ba)) => (f, ba) }
    (done.map(_._1), done.map(_._2._1).sum, done.map(_._2._2).sum,
      outcomes.collect { case (f, None) => f })
  }

  /** Surgery on one file. Some((rowsBefore, rowsAfter)) with the replacement
    * written, None when ineligible (nothing written; caller falls back). */
  private[ops] def deleteFile(file: String, filters: Array[Filter],
      sideDir: String): Option[(Long, Long)] = {
    val footer = NimbleSource.footerOf(file)
    val r = new Tablet.Reader(file, footer)
    try {
      val p = prep(r, filters).getOrElse(return None)
      val w = newWriter(footer, p.keys, file, sideDir)
      var kept = 0L
      var s = 0
      while (s < footer.stripes.length) {
        val rows = p.dataRows(s)
        // pass 1: classify every data ordinal from directory stats alone —
        // 0 = provably no row matches the delete condition (keep whole),
        // 1 = provably every row matches (drop whole), 2 = mixed
        val cls = Array.tabulate(rows.length) { k =>
          val statsOf = p.chunkStatsOf(s, k) _
          if (filters.exists(f => Filters.pruneStripe(f, statsOf, _ => None))) 0
          else if (filters.forall(f => Filters.allMatchStripe(f, statsOf))) 1
          else 2
        }
        if (cls.forall(_ == 0)) {
          // whole stripe kept: one byte-for-byte stripe-region copy (stats,
          // chunk directories and checksum rebase handled by the writer)
          w.appendRawStripe(r, s)
          kept += footer.stripes(s).rowCount
          lastRawChunks.addAndGet(rows.length.toLong)
        } else if (cls.forall(_ == 1)) {
          lastDroppedChunks.addAndGet(rows.length.toLong) // whole stripe gone
        } else {
          val bytes = Array.tabulate(p.keys.length)(id => r.readStreamBytes(s, id))
          // pass 2: keep-masks of the mixed ordinals from the filter-
          // referenced streams, via sequential cursors (skip over the rest);
          // keep = NOT cond with SQL null semantics — compiled predicates
          // return false on null, identical to coalesce(not(cond), true)
          val masks = new Array[Array[Boolean]](rows.length)
          val keptN = new Array[Int](rows.length)
          locally {
            val refCols = filters.flatMap(_.references).distinct
            val cursors = refCols.flatMap(p.refIds).distinct
              .map(id => id -> new Tablet.ChunkCursor(bytes(id))).toMap
            var k = 0
            while (k < rows.length) {
              if (cls(k) != 2) cursors.valuesIterator.foreach(_.skip())
              else {
                val cols = cursors.map { case (id, c) => id -> expand(c.next()) }
                val colOf: String => Column = n => p.logicalCol(n, cols)
                val preds = filters.map(f => Filters.compile(f, p.fieldType(_), colOf))
                val n = rows(k).toInt
                val keep = new Array[Boolean](n)
                var kn = 0
                var i = 0
                while (i < n) {
                  var all = true
                  var q = 0
                  while (all && q < preds.length) { all = preds(q)(i); q += 1 }
                  if (!all) { keep(i) = true; kn += 1 }
                  i += 1
                }
                if (kn == n) cls(k) = 0 // stats couldn't prove it; the mask did
                else if (kn == 0) cls(k) = 1
                else { masks(k) = keep; keptN(k) = kn }
              }
              k += 1
            }
          }
          // pass 3: per stream, walk ALL frames in order — alphabet frames
          // copy raw at their original position, data frames act per cls
          var id = 0
          while (id < p.keys.length) {
            emitStream(w, id, bytes(id), p.dirs(s)(id), cls,
              rewrite = (k, c) => filterCol(expand(c), masks(k), keptN(k)))
            id += 1
          }
          var k = 0
          while (k < rows.length) {
            cls(k) match {
              case 0 => w.addRows(rows(k)); kept += rows(k); lastRawChunks.incrementAndGet()
              case 1 => lastDroppedChunks.incrementAndGet()
              case _ =>
                w.addRows(keptN(k).toLong); kept += keptN(k)
                lastRewrittenChunks.incrementAndGet()
            }
            k += 1
          }
          w.flushStripe()
        }
        s += 1
      }
      w.close()
      Some((footer.rowCount, kept))
    } finally r.close()
  }

  // ------------------------------------------------------------ update

  /** Chunk surgery for UPDATE with LITERAL assignments — the column-shredded
    * update: row count and order never change, so only the ASSIGNED columns'
    * chunks re-encode, and only in chunks the condition provably-or-possibly
    * touches; every other (column, chunk) copies byte-for-byte. A one-column
    * SET on a wide table rewrites one stream's boundary chunks, not the
    * table. Same return/fallback contract as [[deleteFiles]]. */
  def updateFiles(spark: SparkSession, victims: Seq[String],
      filters: Array[Filter], assigns: Map[String, Any], sideDir: String)
      : (Seq[String], Seq[String]) = {
    resetCounters()
    GraftIO.mkdirs(sideDir)
    val outcomes: Seq[(String, Boolean)] =
      if (victims.lengthCompare(1) == 0)
        victims.map(f => f -> updateFile(f, filters, assigns, sideDir))
      else
        spark.sparkContext.parallelize(victims, victims.length)
          .map(f => f -> updateFile(f, filters, assigns, sideDir))
          .collect().toSeq
    (outcomes.collect { case (f, true) => f },
      outcomes.collect { case (f, false) => f })
  }

  private[ops] def updateFile(file: String, filters: Array[Filter],
      assigns: Map[String, Any], sideDir: String): Boolean = {
    val footer = NimbleSource.footerOf(file)
    val r = new Tablet.Reader(file, footer)
    try {
      val p = prep(r, filters).getOrElse(return false)
      // assigned columns: plain single-stream atomics whose literal type
      // matches the stored type exactly (no cast semantics to re-implement)
      val assignIds: Map[Int, Any] = assigns.map { case (n, v) =>
        val dt = p.fieldType.getOrElse(n, return false)
        if (p.keyId.contains(s"$n#nanos")) return false
        if (!literalFits(v, dt)) return false
        p.keyId.getOrElse(n, return false) -> v
      }
      // a NULL assignment into a non-nullable field must widen the
      // REPLACEMENT's declared nullability — exactly what the Spark-rewrite
      // fallback does implicitly through its transform's output schema
      // (a reader trusting the old non-nullable declaration would fold
      // isNull to false and crash on the actual nulls)
      val schema0 = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val nulled = assigns.collect { case (n, null) => n }.toSet
      val outSchema =
        if (nulled.isEmpty) footer.schemaJson
        else StructType(schema0.fields.map(f =>
          if (nulled(f.name) && !f.nullable) f.copy(nullable = true) else f)).json
      val w = newWriter(footer, p.keys, file, sideDir, schemaJson = outSchema)
      var s = 0
      while (s < footer.stripes.length) {
        val rows = p.dataRows(s)
        // 0 = provably untouched (no row matches cond) — raw-copy everything;
        // 2 = the condition may match here — re-encode ASSIGNED streams only
        val cls = Array.tabulate(rows.length) { k =>
          if (filters.exists(f =>
              Filters.pruneStripe(f, p.chunkStatsOf(s, k), _ => None))) 0
          else 2
        }
        if (cls.forall(_ == 0)) {
          w.appendRawStripe(r, s)
          lastRawChunks.addAndGet(rows.length.toLong)
        } else {
          val bytes = Array.tabulate(p.keys.length)(id => r.readStreamBytes(s, id))
          // pass 2: cond-masks (TRUE rows take the literal)
          val masks = new Array[Array[Boolean]](rows.length)
          locally {
            val refCols = filters.flatMap(_.references).distinct
            val cursors = refCols.flatMap(p.refIds).distinct
              .map(id => id -> new Tablet.ChunkCursor(bytes(id))).toMap
            var k = 0
            while (k < rows.length) {
              if (cls(k) != 2) cursors.valuesIterator.foreach(_.skip())
              else {
                val cols = cursors.map { case (id, c) => id -> expand(c.next()) }
                val colOf: String => Column = n => p.logicalCol(n, cols)
                val preds = filters.map(f => Filters.compile(f, p.fieldType(_), colOf))
                val n = rows(k).toInt
                val mask = new Array[Boolean](n)
                var hits = 0
                var i = 0
                while (i < n) {
                  var all = true
                  var q = 0
                  while (all && q < preds.length) { all = preds(q)(i); q += 1 }
                  if (all) { mask(i) = true; hits += 1 }
                  i += 1
                }
                if (hits == 0) cls(k) = 0 // stats couldn't prove it; the mask did
                else masks(k) = mask
              }
              k += 1
            }
          }
          // pass 3: unassigned streams copy every frame raw; assigned streams
          // re-encode only the masked ordinals
          var id = 0
          while (id < p.keys.length) {
            assignIds.get(id) match {
              case Some(v) =>
                emitStream(w, id, bytes(id), p.dirs(s)(id), cls,
                  rewrite = (k, c) => assignCol(expand(c), masks(k), v))
              case None =>
                emitStream(w, id, bytes(id), p.dirs(s)(id),
                  Array.fill(rows.length)(0), rewrite = (_, _) => null)
            }
            id += 1
          }
          var k = 0
          while (k < rows.length) {
            if (cls(k) == 0) lastRawChunks.incrementAndGet()
            else lastRewrittenChunks.incrementAndGet()
            w.addRows(rows(k))
            k += 1
          }
          w.flushStripe()
        }
        s += 1
      }
      w.close()
      true
    } finally r.close()
  }

  // --------------------------------------------------------- shared prep

  /** Eligibility + grid extraction: flat atomic schema, recognized stream
    * keys, filter refs on plain columns, per-data-chunk stats present,
    * data-ordinal grids aligned across streams (alphabet frames allowed —
    * they carry no rows), no blooms. None = fall back to the Spark rewrite. */
  private final class Prep(
      val fieldType: Map[String, DataType],
      val keys: Array[String], val keyId: Map[String, Int],
      /** Columns stored as the TimestampMicroNano split (micros stream +
        * '#nanos' remainder sibling); their raw stats are MICROS-domain. */
      val nanosSplit: Set[String],
      /** (stripe)(stream) -> full frame directory. */
      val dirs: Array[Array[Array[Tablet.ChunkLoc]]],
      /** (stripe)(stream)(data ordinal) -> index into dirs. */
      val dataIdx: Array[Array[Array[Int]]],
      /** (stripe)(data ordinal) -> row count (identical across streams). */
      val dataRows: Array[Array[Long]]) {
    /** Chunk stats for filter classification: nanos-split columns scale
      * their micros-domain stats to saturating OUTER nanos bounds — sound
      * for both proofs (a contained range keeps noneMatch conservative and
      * allMatch's min/max direction correct), same fence as
      * Delete.classify. */
    def chunkStatsOf(s: Int, k: Int)(n: String): Option[Tablet.Stats] =
      keyId.get(n).map { id =>
        val st = dirs(s)(id)(dataIdx(s)(id)(k)).stats
        if (nanosSplit(n)) Tablet.nanosScaledStats(st) else st
      }
    /** Stream ids the mask pass must decode for filter column `n`. */
    def refIds(n: String): Seq[Int] =
      if (nanosSplit(n)) Seq(keyId(n), keyId(n + "#nanos")) else Seq(keyId(n))
    /** The LOGICAL column for filter evaluation: nanos-split columns
      * recombine micros*1000 + rem exactly like the reader (TsNanosR). */
    def logicalCol(n: String, cols: Map[Int, Column]): Column =
      if (!nanosSplit(n)) cols(keyId(n))
      else {
        val m = cols(keyId(n)).asInstanceOf[LongsCol]
        val r = cols(keyId(n + "#nanos")).asInstanceOf[LongsCol]
        val out = new Array[Long](m.len)
        var i = 0
        while (i < m.len) {
          if (m.nulls == null || !m.nulls(i)) out(i) = m.values(i) * 1000L + r.values(i)
          i += 1
        }
        LongsCol(out, PhysType.I64, m.nulls)
      }
  }

  private def prep(r: Tablet.Reader, filters: Array[Filter]): Option[Prep] = {
    val footer = r.footer
    if (footer.stripes.isEmpty || filters.isEmpty) return None
    val schema =
      DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
    if (!schema.fields.forall(f => isAtomic(f.dataType))) return None
    val fieldType: Map[String, DataType] =
      schema.fields.map(f => f.name -> f.dataType).toMap
    // every stream must be a schema field or its '#nanos' remainder sibling —
    // index/composite/list/map/flatmap stream keys make the file ineligible
    val keys = footer.streamKeys
    if (!keys.forall(k => fieldType.contains(k) ||
        (k.endsWith("#nanos") && fieldType.contains(k.stripSuffix("#nanos")))))
      return None
    val nanosSplit: Set[String] =
      keys.filter(_.endsWith("#nanos")).map(_.stripSuffix("#nanos")).toSet
    val refs = filters.flatMap(_.references).toSet
    if (!refs.forall(fieldType.contains)) return None
    val nStreams = keys.length
    val dirs = Array.ofDim[Array[Tablet.ChunkLoc]](footer.stripes.length, nStreams)
    val dataIdx = Array.ofDim[Array[Int]](footer.stripes.length, nStreams)
    val dataRows = new Array[Array[Long]](footer.stripes.length)
    var s = 0
    while (s < footer.stripes.length) {
      var id = 0
      while (id < nStreams) {
        if (r.streamBloom(s, id).nonEmpty) return None
        val d = r.chunkDirOf(s, id)
        if (d == null || d.exists(c => c.isData && c.stats == null)) return None
        val di = d.indices.filter(d(_).isData).toArray
        if (id == 0) dataRows(s) = di.map(d(_).rows)
        else {
          if (di.length != dataRows(s).length) return None
          var k = 0
          while (k < di.length) {
            if (d(di(k)).rows != dataRows(s)(k)) return None
            k += 1
          }
        }
        dirs(s)(id) = d
        dataIdx(s)(id) = di
        id += 1
      }
      s += 1
    }
    Some(new Prep(fieldType, keys, keys.zipWithIndex.toMap, nanosSplit,
      dirs, dataIdx, dataRows))
  }

  private def newWriter(footer: Tablet.Footer, keys: Array[String],
      file: String, sideDir: String,
      schemaJson: String = null): Tablet.Writer = {
    val name = file.substring(file.lastIndexOf('/') + 1)
    val w = new Tablet.Writer(GraftIO.child(sideDir, name),
      if (schemaJson != null) schemaJson else footer.schemaJson,
      streamKeys = keys, sortColumns = footer.sortColumns,
      bucketColumns = footer.bucketColumns, numBuckets = footer.numBucketsSpec,
      bucketId = footer.bucketId, ndvSketches = footer.ndvSketches.nonEmpty,
      sharedDict = false)
    // HLL registers are max-mergeable; a sketch covering dropped rows stays
    // a valid upper-bound estimate (same contract as appendRawStripe)
    w.mergeNdvFrom(footer)
    w
  }

  /** Pass 3 worker: walk one stream's frames in order. Alphabet frames copy
    * raw at their original position (superset alphabets are always valid —
    * dropped index chunks simply stop referencing entries); data ordinal k
    * acts per cls(k): 0 = raw frame copy, 1 = skip (deleted), 2 = decode via
    * the sequential cursor (it swallows alphabet frames transparently) and
    * write `rewrite(k, decoded)` as a fresh plain chunk. */
  private def emitStream(w: Tablet.Writer, id: Int, bytes: Array[Byte],
      dir: Array[Tablet.ChunkLoc], cls: Array[Int],
      rewrite: (Int, Column) => Column): Unit = {
    val cursor = if (cls.exists(_ == 2)) new Tablet.ChunkCursor(bytes) else null
    def frame(pos: Int): Array[Byte] = {
      val until = if (pos + 1 < dir.length) dir(pos + 1).offset.toInt else bytes.length
      java.util.Arrays.copyOfRange(bytes, dir(pos).offset.toInt, until)
    }
    var k = 0 // data ordinal
    var pos = 0 // frame position
    while (pos < dir.length) {
      if (!dir(pos).isData) w.copyRawAlphabetFrame(id, frame(pos))
      else {
        cls(k) match {
          case 0 => w.copyRawChunk(id, frame(pos), dir(pos).rows, dir(pos).stats)
            if (cursor != null) cursor.skip()
          case 1 => if (cursor != null) cursor.skip()
          case _ => w.writeChunk(id, rewrite(k, cursor.next()))
        }
        k += 1
      }
      pos += 1
    }
  }

  private def expand(c: Column): Column = c match {
    case l: LazyFsstBytesCol => l.expand
    case d: DictBytesCol => d.expand
    case other => other
  }

  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  /** Does literal `v` store directly into the column's decoded repr? */
  private def literalFits(v: Any, dt: DataType): Boolean = dt match {
    case LongType => v == null || v.isInstanceOf[Long]
    case IntegerType => v == null || v.isInstanceOf[Int]
    case ShortType => v == null || v.isInstanceOf[Short]
    case ByteType => v == null || v.isInstanceOf[Byte]
    case DoubleType => v == null || v.isInstanceOf[Double]
    case FloatType => v == null || v.isInstanceOf[Float]
    case BooleanType => v == null || v.isInstanceOf[Boolean]
    case StringType => v == null || v.isInstanceOf[String]
    case BinaryType => v == null || v.isInstanceOf[Array[Byte]]
    case _ => false // dates/timestamps/decimals: cast semantics — fall back
  }

  /** Row-mask a decoded column (kn = number of true slots in keep). */
  private def filterCol(c: Column, keep: Array[Boolean], kn: Int): Column = c match {
    case LongsCol(v, phys, nulls) =>
      val out = new Array[Long](kn)
      val nn = if (nulls == null) null else new Array[Boolean](kn)
      var i = 0; var o = 0
      while (i < v.length) {
        if (keep(i)) { out(o) = v(i); if (nn != null) nn(o) = nulls(i); o += 1 }
        i += 1
      }
      LongsCol(out, phys, nn)
    case DoublesCol(v, isFloat, nulls) =>
      val out = new Array[Double](kn)
      val nn = if (nulls == null) null else new Array[Boolean](kn)
      var i = 0; var o = 0
      while (i < v.length) {
        if (keep(i)) { out(o) = v(i); if (nn != null) nn(o) = nulls(i); o += 1 }
        i += 1
      }
      DoublesCol(out, isFloat, nn)
    case BoolsCol(v, nulls) =>
      val out = new Array[Boolean](kn)
      val nn = if (nulls == null) null else new Array[Boolean](kn)
      var i = 0; var o = 0
      while (i < v.length) {
        if (keep(i)) { out(o) = v(i); if (nn != null) nn(o) = nulls(i); o += 1 }
        i += 1
      }
      BoolsCol(out, nn)
    case b @ BytesCol(offsets, bytes, nulls) =>
      val offs = new Array[Int](kn + 1)
      val nn = if (nulls == null) null else new Array[Boolean](kn)
      var total = 0
      var i = 0; var o = 0
      while (i < b.len) {
        if (keep(i)) {
          total += offsets(i + 1) - offsets(i)
          offs(o + 1) = total
          if (nn != null) nn(o) = nulls(i)
          o += 1
        }
        i += 1
      }
      val out = new Array[Byte](total)
      i = 0; o = 0
      while (i < b.len) {
        if (keep(i)) {
          System.arraycopy(bytes, offsets(i), out, offs(o), offsets(i + 1) - offsets(i))
          o += 1
        }
        i += 1
      }
      BytesCol(offs, out, nn)
    case d: DictBytesCol => filterCol(d.expand, keep, kn)
    case l: LazyFsstBytesCol => filterCol(l.expand, keep, kn)
  }

  /** Overwrite masked rows of a decoded column with a literal. */
  private def assignCol(c: Column, mask: Array[Boolean], v: Any): Column = {
    val n = c.len
    def mergeNulls(old: Array[Boolean], toNull: Boolean): Array[Boolean] = {
      if (old == null && !toNull) return null
      val nn = if (old == null) new Array[Boolean](n) else old.clone()
      var i = 0
      while (i < n) { if (mask(i)) nn(i) = toNull; i += 1 }
      if (nn.exists(identity)) nn else null
    }
    c match {
      case LongsCol(values, phys, nulls) =>
        val out = values.clone()
        val lv = v match {
          case null => 0L
          case x: Long => x
          case x: Int => x.toLong
          case x: Short => x.toLong
          case x: Byte => x.toLong
          case other => throw new IllegalStateException(s"assign $other to longs")
        }
        var i = 0
        while (i < n) { if (mask(i)) out(i) = lv; i += 1 }
        LongsCol(out, phys, mergeNulls(nulls, v == null))
      case DoublesCol(values, isFloat, nulls) =>
        val out = values.clone()
        val dv = v match {
          case null => 0d
          case x: Double => x
          case x: Float => x.toDouble
          case other => throw new IllegalStateException(s"assign $other to doubles")
        }
        var i = 0
        while (i < n) { if (mask(i)) out(i) = dv; i += 1 }
        DoublesCol(out, isFloat, mergeNulls(nulls, v == null))
      case BoolsCol(values, nulls) =>
        val out = values.clone()
        val bv = v match { case null => false; case x: Boolean => x }
        var i = 0
        while (i < n) { if (mask(i)) out(i) = bv; i += 1 }
        BoolsCol(out, mergeNulls(nulls, v == null))
      case b: BytesCol =>
        val bv: Array[Byte] = v match {
          case null => Array.emptyByteArray
          case s: String => s.getBytes("UTF-8")
          case a: Array[Byte] => a
          case other => throw new IllegalStateException(s"assign $other to bytes")
        }
        val offs = new Array[Int](n + 1)
        var total = 0
        var i = 0
        while (i < n) {
          total += (if (mask(i)) bv.length else b.offsets(i + 1) - b.offsets(i))
          offs(i + 1) = total
          i += 1
        }
        val bytes = new Array[Byte](total)
        i = 0
        while (i < n) {
          if (mask(i)) System.arraycopy(bv, 0, bytes, offs(i), bv.length)
          else System.arraycopy(b.bytes, b.offsets(i), bytes, offs(i),
            b.offsets(i + 1) - b.offsets(i))
          i += 1
        }
        BytesCol(offs, bytes, mergeNulls(b.nulls, v == null))
      case d: DictBytesCol => assignCol(d.expand, mask, v)
      case l: LazyFsstBytesCol => assignCol(l.expand, mask, v)
    }
  }
}
