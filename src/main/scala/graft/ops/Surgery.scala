package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import graft.format._
import graft.spark.{Filters, NimbleSource}

/** Chunk-granular copy-on-write for DELETE — the boundary-file fix for
  * retention deletes.
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
  *  - chunk provably all-match   -> dropped (zero bytes touched);
  *  - mixed                      -> decoded, keep-masked row-wise with the
  *    scan's own compiled predicates ([[Filters.compile]] — identical null
  *    semantics to the scan), re-encoded; a mask that keeps every row
  *    degrades back to the raw byte copy.
  *
  * Cost becomes O(boundary chunks), not O(file): the 8 M-row bench shape
  * rewrites one ~16 K-row chunk instead of ~1 M kept rows, and a 100 TB
  * retention delete rewrites one chunk per boundary file regardless of file
  * size. Raw copy preserves row order, so sorted layout survives; null-
  * handling rides the same compiled predicates the scan trusts.
  *
  * Eligibility is conservative — anything outside it falls back to the
  * whole-file Spark rewrite (correctness never depends on surgery):
  *  - the pushed filters EXACTLY represent the delete condition (caller
  *    guarantees: SQL deleteWhere filters, or a fully-translated Column);
  *  - flat atomic schema (no struct/array/map streams whose child grids
  *    aren't 1:1 with top-level rows);
  *  - no bloom / hash-index / sorted-index / composite streams (stripe-
  *    scoped structures raw frames can't patch) and no shared-dictionary
  *    alphabet frames (chunk ordinals must be pure data frames);
  *  - every chunk carries directory stats (v14 writers);
  *  - chunk grids ordinal-align across streams (verified per stripe from
  *    the directories' row counts);
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

  /** Shared eligibility prologue: flat atomic schema, recognized stream
    * keys, filter refs on plain columns, per-chunk stats present, aligned
    * chunk grids, no blooms. Returns the per-stripe chunk directories (or
    * None = caller falls back to the Spark rewrite). */
  private final class Prep(
      val footer: Tablet.Footer, val fieldType: Map[String, DataType],
      val keys: Array[String], val keyId: Map[String, Int],
      val dirs: Array[Array[Array[Tablet.ChunkLoc]]])

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
    if (!refs.forall(n => fieldType.contains(n) && !nanosSplit(n))) return None
    val nStreams = keys.length
    // eligibility pass over every stripe's directories (metadata only)
    val dirs = Array.ofDim[Array[Tablet.ChunkLoc]](footer.stripes.length, nStreams)
    var s = 0
    while (s < footer.stripes.length) {
      var id = 0
      while (id < nStreams) {
        if (r.streamBloom(s, id).nonEmpty) return None
        val d = r.chunkDirOf(s, id)
        if (d == null || d.exists(c => !c.isData || c.stats == null)) return None
        if (id > 0) { // ordinal alignment with stream 0's grid
          val d0 = dirs(s)(0)
          if (d.length != d0.length) return None
          var k = 0
          while (k < d.length) {
            if (d(k).rows != d0(k).rows) return None
            k += 1
          }
        }
        dirs(s)(id) = d
        id += 1
      }
      s += 1
    }
    Some(new Prep(footer, fieldType, keys, keys.zipWithIndex.toMap, dirs))
  }

  /** Surgery on one file. Some((rowsBefore, rowsAfter)) with the replacement
    * written, None when ineligible (nothing written; caller falls back). */
  private[ops] def deleteFile(file: String, filters: Array[Filter],
      sideDir: String): Option[(Long, Long)] = {
    val footer = NimbleSource.footerOf(file)
    val r = new Tablet.Reader(file, footer)
    try {
      val p = prep(r, filters).getOrElse(return None)
      val fieldType = p.fieldType
      val keys = p.keys
      val keyId = p.keyId
      val dirs = p.dirs
      val nStreams = keys.length
      var s = 0

      // -------- surgery
      val name = file.substring(file.lastIndexOf('/') + 1)
      val w = new Tablet.Writer(GraftIO.child(sideDir, name), footer.schemaJson,
        streamKeys = keys, sortColumns = footer.sortColumns,
        bucketColumns = footer.bucketColumns, numBuckets = footer.numBucketsSpec,
        bucketId = footer.bucketId, ndvSketches = footer.ndvSketches.nonEmpty,
        sharedDict = false)
      // HLL registers are max-mergeable; a sketch covering dropped rows stays
      // a valid upper-bound estimate (same contract as appendRawStripe)
      w.mergeNdvFrom(footer)
      var kept = 0L
      s = 0
      while (s < footer.stripes.length) {
        val grid = dirs(s)(0)
        // classify every chunk ordinal from directory stats alone (no data
        // bytes yet): 0 = provably no row matches the delete condition
        // (keep whole), 1 = provably every row matches (drop whole),
        // 2 = mixed (decode + mask)
        val cls = Array.tabulate(grid.length) { k =>
          val statsOf: String => Option[Tablet.Stats] =
            n => keyId.get(n).map(id => dirs(s)(id)(k).stats)
          if (filters.exists(f => Filters.pruneStripe(f, statsOf, _ => None))) 0
          else if (filters.forall(f => Filters.allMatchStripe(f, statsOf))) 1
          else 2
        }
        if (cls.forall(_ == 0)) {
          // whole stripe kept: one byte-for-byte stripe-region copy (stats,
          // chunk directories and checksum rebase handled by the writer)
          w.appendRawStripe(r, s)
          kept += footer.stripes(s).rowCount
          lastRawChunks.addAndGet(grid.length.toLong)
        } else if (cls.forall(_ == 1)) {
          lastDroppedChunks.addAndGet(grid.length.toLong) // whole stripe gone
        } else {
          // whole-stream bytes per stream: surgery reads the stripe once,
          // sequentially — the win is skipping DECODE/ENCODE, not IO
          val streamBytes = Array.tabulate(nStreams)(id => r.readStreamBytes(s, id))
          def frame(id: Int, k: Int): Array[Byte] = {
            val d = dirs(s)(id)
            val from = d(k).offset.toInt
            val until = if (k + 1 < d.length) d(k + 1).offset.toInt else streamBytes(id).length
            java.util.Arrays.copyOfRange(streamBytes(id), from, until)
          }
          def copyRaw(k: Int): Unit = {
            var id = 0
            while (id < nStreams) {
              w.copyRawChunk(id, frame(id, k), dirs(s)(id)(k).rows, dirs(s)(id)(k).stats)
              id += 1
            }
            w.addRows(grid(k).rows)
            kept += grid(k).rows
            lastRawChunks.incrementAndGet()
          }
          var k = 0
          while (k < grid.length) {
            if (cls(k) == 0) copyRaw(k)
            else if (cls(k) == 1) lastDroppedChunks.incrementAndGet()
            else {
              // mixed: decode, keep-mask with the scan's compiled predicates
              val cols = Array.tabulate(nStreams) { id =>
                new Tablet.ChunkCursor(frame(id, k)).next() match {
                  case l: LazyFsstBytesCol => l.expand
                  case d: DictBytesCol => d.expand
                  case c => c
                }
              }
              val colOf: String => Column = n => cols(keyId(n))
              val preds = filters.map(f =>
                Filters.compile(f, fieldType(_), colOf))
              val n = grid(k).rows.toInt
              val keep = new Array[Boolean](n)
              var kn = 0
              var i = 0
              while (i < n) {
                // keep = NOT cond with SQL null semantics: compiled
                // predicates return false on null, so a null conjunct keeps
                // the row — identical to coalesce(not(cond), true)
                var all = true
                var p = 0
                while (all && p < preds.length) { all = preds(p)(i); p += 1 }
                if (!all) { keep(i) = true; kn += 1 }
                i += 1
              }
              if (kn == n) copyRaw(k) // stats couldn't prove it; the mask did
              else if (kn == 0) lastDroppedChunks.incrementAndGet()
              else {
                var id = 0
                while (id < nStreams) {
                  w.writeChunk(id, filterCol(cols(id), keep, kn))
                  id += 1
                }
                w.addRows(kn.toLong)
                kept += kn
                lastRewrittenChunks.incrementAndGet()
              }
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

  /** Chunk surgery for UPDATE with LITERAL assignments — the column-shredded
    * update: row count and order never change, so only the ASSIGNED columns'
    * chunks re-encode, and only in chunks the condition provably-or-possibly
    * touches; every other (column, chunk) copies byte-for-byte. A one-column
    * SET on a wide table rewrites one stream's boundary chunks, not the
    * table. Same return/fallback contract as [[deleteFiles]]; rows returned
    * are (rowsBefore, rowsBefore) since UPDATE drops nothing. */
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
      val keys = p.keys
      val keyId = p.keyId
      val dirs = p.dirs
      val nStreams = keys.length
      // assigned columns: plain single-stream atomics whose literal type
      // matches the stored type exactly (no cast semantics to re-implement)
      val assignIds: Map[Int, Any] = assigns.map { case (n, v) =>
        val dt = p.fieldType.getOrElse(n, return false)
        if (keyId.contains(s"$n#nanos")) return false
        if (!literalFits(v, dt)) return false
        keyId.getOrElse(n, return false) -> v
      }

      val name = file.substring(file.lastIndexOf('/') + 1)
      val w = new Tablet.Writer(GraftIO.child(sideDir, name), footer.schemaJson,
        streamKeys = keys, sortColumns = footer.sortColumns,
        bucketColumns = footer.bucketColumns, numBuckets = footer.numBucketsSpec,
        bucketId = footer.bucketId, ndvSketches = footer.ndvSketches.nonEmpty,
        sharedDict = false)
      w.mergeNdvFrom(footer)
      var s = 0
      while (s < footer.stripes.length) {
        val grid = dirs(s)(0)
        // 0 = provably untouched (no row matches cond) — raw-copy everything;
        // 2 = the condition may match here — re-encode ASSIGNED streams only
        val cls = Array.tabulate(grid.length) { k =>
          val statsOf: String => Option[Tablet.Stats] =
            n => keyId.get(n).map(id => dirs(s)(id)(k).stats)
          if (filters.exists(f => Filters.pruneStripe(f, statsOf, _ => None))) 0
          else 2
        }
        if (cls.forall(_ == 0)) {
          w.appendRawStripe(r, s)
          lastRawChunks.addAndGet(grid.length.toLong)
        } else {
          val streamBytes = Array.tabulate(nStreams)(id => r.readStreamBytes(s, id))
          def frame(id: Int, k: Int): Array[Byte] = {
            val d = dirs(s)(id)
            val from = d(k).offset.toInt
            val until = if (k + 1 < d.length) d(k + 1).offset.toInt else streamBytes(id).length
            java.util.Arrays.copyOfRange(streamBytes(id), from, until)
          }
          def raw(id: Int, k: Int): Unit =
            w.copyRawChunk(id, frame(id, k), dirs(s)(id)(k).rows, dirs(s)(id)(k).stats)
          var k = 0
          while (k < grid.length) {
            if (cls(k) == 0) {
              var id = 0
              while (id < nStreams) { raw(id, k); id += 1 }
              lastRawChunks.incrementAndGet()
            } else {
              // decode only what the mask needs plus the assigned streams
              val decoded = new Array[Column](nStreams)
              def colOf(n: String): Column = {
                val id = keyId(n)
                if (decoded(id) == null)
                  decoded(id) = new Tablet.ChunkCursor(frame(id, k)).next() match {
                    case l: LazyFsstBytesCol => l.expand
                    case d: DictBytesCol => d.expand
                    case c => c
                  }
                decoded(id)
              }
              val preds = filters.map(f => Filters.compile(f, p.fieldType(_), colOf))
              val n = grid(k).rows.toInt
              val mask = new Array[Boolean](n) // cond TRUE rows take the literal
              var hits = 0
              var i = 0
              while (i < n) {
                var all = true
                var q = 0
                while (all && q < preds.length) { all = preds(q)(i); q += 1 }
                if (all) { mask(i) = true; hits += 1 }
                i += 1
              }
              if (hits == 0) { // stats could not prove it; the mask did
                var id = 0
                while (id < nStreams) { raw(id, k); id += 1 }
                lastRawChunks.incrementAndGet()
              } else {
                var id = 0
                while (id < nStreams) {
                  assignIds.get(id) match {
                    case Some(v) => w.writeChunk(id, assignCol(colOf(keys(id)), mask, v))
                    case None => raw(id, k)
                  }
                  id += 1
                }
                lastRewrittenChunks.incrementAndGet()
              }
            }
            w.addRows(grid(k).rows)
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

  private def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
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
}
