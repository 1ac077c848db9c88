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
  * Bloom- and index-bearing files are eligible (r18 verdict #4 — the
  * canonical production shape, a retention delete on an indexed event
  * table, must not pay O(file)):
  *  - stripe blooms are membership SUPERSETS of the surviving values after
  *    a delete, so kept stripes adopt the source bloom verbatim — sound for
  *    pruning (false positives only); UPDATE keeps blooms on unassigned
  *    streams and drops them on assigned ones (the literal may be absent);
  *  - hash/sorted/composite index streams remap in the INDEX domain: each
  *    (key, chunk<<32|row) entry's position follows the chunk's new ordinal
  *    and the row's kept-rank, deleted entries drop — keys are unchanged
  *    and the transform is monotone, so sort order survives and no data
  *    chunk decodes for it; UPDATE copies them verbatim (rows never move,
  *    and assignments into index-covered columns are refused).
  *
  * The FULL nested-schema surface is eligible (r19): [[classifyStreams]]
  * mirrors Fields.writerFor's stream-key grammar — struct #nulls/children
  * are row-aligned and mask directly; plain array/map element streams
  * carry a Len/In DOMAIN CHAIN the row mask folds through (composable for
  * nested collections); flatmap value streams project through their
  * sibling in-map step; dict-array/SlidingWindowMap stores are
  * chunk-scoped (the writer resets dedup state per flushChunk), so
  * kept/mixed chunks raw-copy the store and dropped chunks drop it.
  * Stripes whose footer dropped the per-chunk stats block (beyond
  * Tablet.MaxDirStatsFrames) prove what they can at stripe level and
  * recover chunk stats from the inline frame headers.
  *
  * Remaining eligibility is conservative — anything outside it falls back
  * to the whole-file Spark rewrite (correctness never depends on surgery):
  *  - the pushed filters EXACTLY represent the condition (caller
  *    guarantees: SQL deleteWhere filters, or a fully-translated Column);
  *  - filters reference only top-level atomic columns;
  *  - every stream key parses under the writer grammar (v15+ files escape
  *    key-data '#' as "##", so flatmap schemas classify totally; LEGACY
  *    v<15 files stored '#'-bearing map keys raw — those remain ambiguous
  *    and refuse);
  *  - chunk grids ordinal-align across streams (verified per stripe from
  *    the directories' data-frame row counts).
  * Refusal reasons surface via [[lastRefusal]].
  */
object Surgery {

  /** Chunk outcomes of the most recent surgery on this JVM (raw-copied /
    * dropped / row-rewritten) — specs and probes pin the O(boundary-chunks)
    * contract on them (same diagnostics pattern as
    * NimbleSource.chunksSkipped). */
  val lastRawChunks = new java.util.concurrent.atomic.AtomicLong()
  val lastDroppedChunks = new java.util.concurrent.atomic.AtomicLong()
  val lastRewrittenChunks = new java.util.concurrent.atomic.AtomicLong()
  /** Why the most recent [[prep]] refused (diagnosis; empty = eligible). */
  @volatile var lastRefusal: String = ""
  private[graft] def resetCounters(): Unit = {
    lastRawChunks.set(0L); lastDroppedChunks.set(0L); lastRewrittenChunks.set(0L)
    lastRefusal = ""
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
      val preCls = bigStripePrePass(p, r, filters, allowDrop = true).getOrElse(return None)
      val w = newWriter(footer, p.keys, file, sideDir)
      var kept = 0L
      var s = 0
      while (s < footer.stripes.length) {
        val rows = p.dataRows(s)
        // pass 1: classify every data ordinal from directory stats alone —
        // 0 = provably no row matches the delete condition (keep whole),
        // 1 = provably every row matches (drop whole), 2 = mixed. Big
        // stripes whose stats the pre-pass proved at stripe level
        // short-circuit the same way.
        val cls =
          if (preCls(s) != 2) Array.fill(rows.length)(preCls(s))
          else Array.tabulate(rows.length) { k =>
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
          // pass 3: per data stream, walk ALL frames in order — alphabet
          // frames copy raw at their original position, data frames per cls.
          // Chained streams (flatmap values, array/map elements) fold the
          // row-domain keep-mask through their Len/In domain chain; store
          // streams copy raw whenever their aligned index chunk survives
          // (orphan uniques decode fine — the store is chunk-scoped).
          var id = 0
          while (id < p.keys.length) {
            p.streamCls(id) match {
              case ClsRow =>
                emitStream(w, id, bytes(id), p.dirs(s)(id), cls,
                  rewrite = (k, c) => filterCol(expand(c), masks(k), keptN(k)))
              case ClsValue =>
                emitChainStream(w, id, bytes(id), p.dirs(s)(id), p.chain(id),
                  bytes, cls, masks)
              case ClsStore =>
                emitStream(w, id, bytes(id), p.dirs(s)(id),
                  cls.map(c => if (c == 2) 0 else c), rewrite = (_, _) => null)
              case _ => () // aux: remapped below
            }
            id += 1
          }
          var stripeKept = 0L
          locally {
            var k = 0
            while (k < rows.length) {
              if (cls(k) == 0) stripeKept += rows(k)
              else if (cls(k) == 2) stripeKept += keptN(k)
              k += 1
            }
          }
          if (stripeKept > 0) {
            // hidden index streams: remap each (key, chunk<<32|row) entry in
            // the INDEX domain — kept-whole chunks keep their row numbers at
            // the chunk's new ordinal, masked chunks map rows to their kept-
            // rank, deleted entries drop. Keys never change and the position
            // transform is monotone, so (key, pos) sort order survives; no
            // data chunk decodes for this.
            val newOrd = new Array[Int](rows.length)
            val ranks = new Array[Array[Int]](rows.length)
            locally {
              var o = 0
              var k = 0
              while (k < rows.length) {
                newOrd(k) = o
                if (cls(k) != 1) o += 1
                if (cls(k) == 2) {
                  val m = masks(k)
                  val rk = new Array[Int](m.length)
                  var rr = 0
                  var i = 0
                  while (i < m.length) { rk(i) = if (m(i)) { val v = rr; rr += 1; v } else -1; i += 1 }
                  ranks(k) = rk
                }
                k += 1
              }
            }
            def keepPos(pos: Long): Long = {
              val ord = (pos >>> 32).toInt
              val row = (pos & 0xffffffffL).toInt
              cls(ord) match {
                case 0 => (newOrd(ord).toLong << 32) | row
                case 1 => -1L
                case _ =>
                  val rk = ranks(ord)(row)
                  if (rk < 0) -1L else (newOrd(ord).toLong << 32) | rk
              }
            }
            id = 0
            while (id < p.keys.length) {
              if (p.isAux(id)) {
                val remapped =
                  if (p.keys(id).startsWith("#cidx:")) remapCompositeIndex(bytes(id), keepPos)
                  else remapPairIndex(bytes(id), keepPos)
                w.writeRawStreamBytes(id, remapped)
              } else {
                // a stripe bloom is a membership SUPERSET of the surviving
                // values after a delete — sound for pruning (false positives
                // only), so kept rows keep their pruning structure for free
                r.streamBloom(s, id).foreach(b => w.adoptBloom(id, b))
              }
              id += 1
            }
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
      val preCls = bigStripePrePass(p, r, filters, allowDrop = false)
        .getOrElse(return false)
      // assigned columns: plain single-stream atomics whose literal stores
      // into the decoded repr without cast semantics (dates/timestamps/
      // decimals convert to their physical ints/micros/unscaled here —
      // identity on the stored repr, verdict r18 #5); an assignment into a
      // column some index stream covers would need an index-domain value
      // rewrite — refused (Delete.update's layout guard already refuses it
      // table-wide; this keeps Surgery safe standalone)
      val assignIds: Map[Int, Any] = assigns.flatMap { case (n, v) =>
        val dt = p.fieldType.getOrElse(n, return false)
        if (!literalFits(v, dt)) return false
        if (p.keys.exists(k => auxCovers(k, n))) return false
        if (p.nanosSplit(n)) {
          // TimestampMicroNano split (r19): one logical epoch-nanos
          // assignment writes BOTH streams — micros = floorDiv(ns, 1000),
          // remainder = floorMod — mirroring TsNanosW exactly (null sets
          // the null bit on both with zero values, the writer's own
          // convention)
          if (dt != LongType) return false
          v match {
            case null => Seq(p.keyId(n) -> null, p.keyId(s"$n#nanos") -> null)
            case x: Long => Seq(
              p.keyId(n) -> java.lang.Math.floorDiv(x, 1000L),
              p.keyId(s"$n#nanos") -> java.lang.Math.floorMod(x, 1000L))
            case _ => return false
          }
        } else Seq(p.keyId.getOrElse(n, return false) -> toPhysical(v, dt))
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
        val cls =
          if (preCls(s) == 0) Array.fill(rows.length)(0)
          else Array.tabulate(rows.length) { k =>
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
          // re-encode only the masked ordinals. UPDATE never moves or drops
          // rows, so index streams copy verbatim (their positions AND values
          // stay valid — assigned columns are never index-covered, guarded
          // above) and unassigned streams keep their blooms (assigned
          // streams drop theirs: the literal may not be in the old bloom).
          var id = 0
          while (id < p.keys.length) {
            if (p.isAux(id)) w.writeRawStreamBytes(id, bytes(id))
            else assignIds.get(id) match {
              case Some(v) =>
                emitStream(w, id, bytes(id), p.dirs(s)(id), cls,
                  rewrite = (k, c) => assignCol(expand(c), masks(k), v))
              case None =>
                emitStream(w, id, bytes(id), p.dirs(s)(id),
                  Array.fill(rows.length)(0), rewrite = (_, _) => null)
                r.streamBloom(s, id).foreach(b => w.adoptBloom(id, b))
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
  // stream classes (Prep.streamCls)
  private final val ClsRow = 0 // row-aligned data stream (field, #nulls, #in:k, #len, struct children)
  private final val ClsValue = 1 // domain-chained stream: mask projects through Len/In steps
  private final val ClsAux = 2 // hidden index stream
  private final val ClsStore = 3 // chunk-scoped dedup store (dict-array/SWMap #ddlen/#elem/#key/#val):
  // the writer resets its dedup state at every flushChunk, so a store chunk
  // is referenced ONLY by its aligned index chunk — kept/mixed chunks copy
  // the store raw (orphan uniques decode fine), dropped chunks drop it

  /** Classify every stream key against the schema tree, mirroring
    * Fields.writerFor's key grammar. Returns (class per stream, the Len/In
    * domain chain per stream — ('L', lenStreamId) expands a mask by
    * replication, ('I', inStreamId) selects the set positions — and the
    * nanos-split top-level column set), or None when any stream is
    * unrecognized / ambiguous (the conservative fallback). */
  private def classifyStreams(schema: StructType, keys: Array[String],
      keyId: Map[String, Int], fieldType: Map[String, DataType],
      escapedKeys: Boolean)
      : Option[(Array[Int], Array[List[(Char, Int)]], Set[String])] = {
    val n = keys.length
    val cls = Array.fill(n)(-1)
    val chain = Array.fill[List[(Char, Int)]](n)(Nil)
    var nanosSplit = Set.empty[String]
    val keySet = keys.toSet
    def claimKey(k: String, c: Int, steps: List[(Char, Int)]): Boolean =
      keyId.get(k) match {
        case Some(id) if cls(id) == -1 => cls(id) = c; chain(id) = steps; true
        case _ => false
      }
    // a '#nanos' sibling rides along when present (same class and domain)
    def claimWithNanos(k: String, c: Int, steps: List[(Char, Int)]): Boolean =
      claimKey(k, c, steps) && {
        keyId.get(s"$k#nanos").foreach { id =>
          if (cls(id) == -1) { cls(id) = c; chain(id) = steps } }
        true
      }
    def claim(path: String, dt: DataType, steps: List[(Char, Int)],
        store: Boolean): Boolean = dt match {
      case st: StructType =>
        claimKey(s"$path#nulls", if (store) ClsStore else clsOf(steps), steps) &&
          st.fields.forall(f => claim(s"$path.${f.name}", f.dataType, steps, store))
      case a: ArrayType =>
        if (keySet(s"$path#idx")) // dedup (ArrayWithOffsets): chunk-scoped store
          claimKey(s"$path#idx", if (store) ClsStore else clsOf(steps), steps) &&
            claimKey(s"$path#ddlen", ClsStore, Nil) &&
            claim(s"$path#elem", a.elementType, Nil, store = true)
        else
          claimKey(s"$path#len", if (store) ClsStore else clsOf(steps), steps) &&
            claim(s"$path#elem", a.elementType,
              if (store) steps else steps :+ (('L', keyId(s"$path#len"))), store)
      case m: MapType =>
        if (keys.exists(_.startsWith(s"$path#in:"))) {
          // flatmap shred; under a dedup store this layout cannot occur —
          // refuse rather than guess
          if (store) false
          else claimKey(s"$path#nulls", clsOf(steps), steps) && {
            val inKeys = keys.collect {
              case k if k.startsWith(s"$path#in:") => k.substring(path.length + 4) }
            inKeys.forall { mk =>
              // v15+ files escape key-data '#' as "##" (Fields.escapeFmKey):
              // any remaining single '#' after stripping pairs would be a
              // grammar separator inside the key — impossible in a valid
              // escaped name, refuse. Legacy files stored keys raw, where
              // ANY '#' is ambiguous — the historical conservative refusal.
              (if (escapedKeys) mk.replace("##", "").indexOf('#') < 0
               else !mk.contains('#')) &&
                claimKey(s"$path#in:$mk", clsOf(steps), steps) &&
                claim(s"$path#fm:$mk", m.valueType,
                  steps :+ (('I', keyId(s"$path#in:$mk"))), store = false)
            }
          }
        } else if (keySet(s"$path#idx")) // SlidingWindowMap: chunk-scoped store
          claimKey(s"$path#idx", if (store) ClsStore else clsOf(steps), steps) &&
            claimKey(s"$path#ddlen", ClsStore, Nil) &&
            claim(s"$path#key", m.keyType, Nil, store = true) &&
            claim(s"$path#val", m.valueType, Nil, store = true)
        else
          claimKey(s"$path#len", if (store) ClsStore else clsOf(steps), steps) && {
            val lstep = if (store) steps else steps :+ (('L', keyId(s"$path#len")))
            claim(s"$path#key", m.keyType, lstep, store) &&
              claim(s"$path#val", m.valueType, lstep, store)
          }
      case _ => // atomic leaf
        claimWithNanos(path, if (store) ClsStore else clsOf(steps), steps) && {
          if (keySet(s"$path#nanos") && steps.isEmpty && !store) nanosSplit += path
          true
        }
    }
    def clsOf(steps: List[(Char, Int)]): Int = if (steps.isEmpty) ClsRow else ClsValue
    var id = 0
    while (id < n) {
      if (auxIndexKey(keys(id), fieldType)) cls(id) = ClsAux
      id += 1
    }
    if (!schema.fields.forall(f => claim(f.name, f.dataType, Nil, store = false)))
      return None
    if (cls.exists(_ == -1)) return None // an actual stream nothing claimed
    Some((cls, chain, nanosSplit))
  }

  private final class Prep(
      val fieldType: Map[String, DataType],
      val keys: Array[String], val keyId: Map[String, Int],
      /** Columns stored as the TimestampMicroNano split (micros stream +
        * '#nanos' remainder sibling); their raw stats are MICROS-domain. */
      val nanosSplit: Set[String],
      /** Per-stream class: ClsRow grids 1:1 with top-level rows; ClsValue
        * shares the CHUNK grid in a projected domain (masks fold through
        * [[chain]]); ClsStore chunks are chunk-scoped dedup stores (raw-
        * copied whenever their index chunk survives); ClsAux index streams
        * remap/copy whole. */
      val streamCls: Array[Int],
      /** ClsValue streams: the Len/In steps from the row domain to the
        * stream's own domain ([[classifyStreams]]). */
      val chain: Array[List[(Char, Int)]],
      /** (stripe) -> whether every data chunk's directory entry carries
        * stats. False on big stripes (beyond Tablet.MaxDirStatsFrames the
        * writer drops the per-chunk stats block to bound the footer) —
        * classification then proves what it can at STRIPE level, and a
        * mixed stripe recovers chunk stats from the inline frame headers
        * via [[recoverStats]]. */
      val hasDirStats: Array[Boolean],
      /** (stripe)(stream) -> full frame directory. */
      val dirs: Array[Array[Array[Tablet.ChunkLoc]]],
      /** (stripe)(stream)(data ordinal) -> index into dirs. */
      val dataIdx: Array[Array[Array[Int]]],
      /** (stripe)(data ordinal) -> row count (identical across ROW-aligned
        * streams; ClsValue streams share the ordinal grid with their own
        * compacted row counts). */
      val dataRows: Array[Array[Long]]) {
    def isAux(id: Int): Boolean = streamCls(id) == ClsAux
    /** Chunk stats for filter classification: nanos-split columns scale
      * their micros-domain stats to saturating OUTER nanos bounds — sound
      * for both proofs (a contained range keeps noneMatch conservative and
      * allMatch's min/max direction correct), same fence as
      * Delete.classify. */
    def chunkStatsOf(s: Int, k: Int)(n: String): Option[Tablet.Stats] =
      keyId.get(n).flatMap { id =>
        Option(dirs(s)(id)(dataIdx(s)(id)(k)).stats)
          .map(st => if (nanosSplit(n)) Tablet.nanosScaledStats(st) else st)
      }
    /** Stream ids the mask pass must decode for filter column `n`. */
    def refIds(n: String): Seq[Int] =
      if (nanosSplit(n)) Seq(keyId(n), keyId(n + "#nanos")) else Seq(keyId(n))
    /** STRIPE-level stats for filter column `n` (always present in the
      * footer, unlike the capped per-chunk stats block). */
    def stripeStatsOf(r: Tablet.Reader, s: Int)(n: String): Option[Tablet.Stats] =
      keyId.get(n).map { id =>
        val st = r.streamStats(s, id)
        if (nanosSplit(n)) Tablet.nanosScaledStats(st) else st
      }
    /** Patch stripe `s`'s directories with per-chunk stats parsed from the
      * inline frame headers (one stream-bytes read per data stream; the
      * frame header carries the SAME serialized Stats the directory
      * dropped, so downstream classification and stats folding are
      * identical to the small-stripe path). */
    def recoverStats(s: Int, r: Tablet.Reader): Unit = {
      var id = 0
      while (id < keys.length) {
        if (!isAux(id)) {
          val d = dirs(s)(id)
          if (d.exists(c => c.isData && c.stats == null)) {
            val bytes = r.readStreamBytes(s, id)
            dirs(s)(id) = d.map(c =>
              if (!c.isData || c.stats != null) c
              else c.copy(stats = Tablet.frameStats(bytes, c.offset.toInt)))
          }
        }
        id += 1
      }
    }
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

  /** Is `k` a hidden index stream over known schema columns? (r19: index-
    * bearing files are surgery-eligible — DELETE remaps the index entries'
    * (chunk, row) positions in the index domain, UPDATE raw-copies them.) */
  private def auxIndexKey(k: String, fieldType: Map[String, DataType]): Boolean =
    if (k.startsWith("#idx:")) fieldType.contains(k.substring(5))
    else if (k.startsWith("#sidx:")) fieldType.contains(k.substring(6))
    else if (k.startsWith("#cidx:"))
      k.substring(6).split("\\+").forall(fieldType.contains)
    else false

  private def prep(r: Tablet.Reader, filters: Array[Filter]): Option[Prep] = {
    def refuse(why: String): Option[Prep] = { lastRefusal = why; None }
    val footer = r.footer
    if (footer.stripes.isEmpty || filters.isEmpty) return refuse("no stripes/filters")
    val schema =
      DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
    val fieldType: Map[String, DataType] =
      schema.fields.map(f => f.name -> f.dataType).toMap
    val keys = footer.streamKeys
    val keyId: Map[String, Int] = keys.zipWithIndex.toMap
    // classify every stream against the schema tree; anything the grammar
    // can't place makes the file ineligible
    val (streamCls, chain, nanosSplit) =
      classifyStreams(schema, keys, keyId, fieldType,
        escapedKeys = footer.version >= 15).getOrElse(
        return refuse("unrecognized/ambiguous stream layout"))
    val refs = filters.flatMap(_.references).toSet
    if (!refs.forall(n => fieldType.get(n).exists(isAtomic)))
      return refuse("filter ref not an atomic field")
    // null IN-literals make predicates NULL on non-null values — the
    // two-valued compile cannot mask them (see Filters.hasNullInLiteral);
    // the Spark-rewrite fallback's Column keep-filter is natively
    // three-valued, so it handles them
    if (filters.exists(graft.spark.Filters.hasNullInLiteral))
      return refuse("null IN-literal filter (three-valued)")
    val nStreams = keys.length
    val dirs = Array.ofDim[Array[Tablet.ChunkLoc]](footer.stripes.length, nStreams)
    val dataIdx = Array.ofDim[Array[Int]](footer.stripes.length, nStreams)
    val dataRows = new Array[Array[Long]](footer.stripes.length)
    val statsOk = Array.fill(footer.stripes.length)(true)
    var s = 0
    while (s < footer.stripes.length) {
      // row-aligned streams first (they define the grid), then the chained /
      // store streams (chunk-count aligned, own row counts)
      for (pass <- 0 to 1; id <- 0 until nStreams
           if (pass == 0 && streamCls(id) == ClsRow) ||
              (pass == 1 && (streamCls(id) == ClsValue || streamCls(id) == ClsStore))) {
        if (r.streamLoc(s, id).length == 0L) {
          // stream absent from this whole stripe (registered later / never):
          // zero frames to copy, zero grid participation
          dirs(s)(id) = Array.empty
          dataIdx(s)(id) = Array.empty
        } else {
          val d = r.chunkDirOf(s, id)
          if (d == null)
            return refuse(s"stream '${keys(id)}' stripe $s: missing chunk directory")
          if (d.exists(c => c.isData && c.stats == null)) statsOk(s) = false
          val di = d.indices.filter(d(_).isData).toArray
          if (dataRows(s) == null) {
            if (pass == 0) dataRows(s) = di.map(d(_).rows)
          } else if (di.length != dataRows(s).length)
            return refuse(s"stream '${keys(id)}' stripe $s: grid ${di.length} vs ${dataRows(s).length} chunks")
          else if (pass == 0) {
            var k = 0
            while (k < di.length) {
              if (d(di(k)).rows != dataRows(s)(k))
                return refuse(s"stream '${keys(id)}' stripe $s chunk $k: rows ${d(di(k)).rows} vs ${dataRows(s)(k)}")
              k += 1
            }
          }
          dirs(s)(id) = d
          dataIdx(s)(id) = di
        }
      }
      if (dataRows(s) == null) return refuse(s"stripe $s: no data streams")
      s += 1
    }
    Some(new Prep(fieldType, keys, keyId, nanosSplit, streamCls, chain,
      statsOk, dirs, dataIdx, dataRows))
  }

  /** Big-stripe pre-pass (stripes whose footer dropped the per-chunk stats
    * block beyond Tablet.MaxDirStatsFrames — any stripe over ~4M rows at
    * the default chunk size): prove what we can at STRIPE level from the
    * always-present stripe stats; a stripe that stays mixed recovers its
    * chunk stats from the inline frame headers ([[Prep.recoverStats]]).
    * Runs BEFORE the writer is created, so a recovery failure (legacy
    * frames without inline stats) falls back with zero partial state.
    * Returns per-stripe 0 = provably none-match (keep whole), 1 = provably
    * all-match (droppable — DELETE only), 2 = take the chunk path. */
  private def bigStripePrePass(p: Prep, r: Tablet.Reader, filters: Array[Filter],
      allowDrop: Boolean): Option[Array[Int]] = {
    val nStripes = r.footer.stripes.length
    val preCls = Array.fill(nStripes)(2)
    var s = 0
    while (s < nStripes) {
      if (!p.hasDirStats(s)) {
        val statsOf = p.stripeStatsOf(r, s) _
        if (filters.exists(f => Filters.pruneStripe(f, statsOf, _ => None))) preCls(s) = 0
        else if (allowDrop && filters.forall(f => Filters.allMatchStripe(f, statsOf)))
          preCls(s) = 1
        else {
          p.recoverStats(s, r)
          var id = 0
          while (id < p.keys.length) {
            if (!p.isAux(id) && p.dirs(s)(id).exists(c => c.isData && c.stats == null)) {
              lastRefusal = s"stripe $s: frame without inline stats"
              return None
            }
            id += 1
          }
        }
      }
      s += 1
    }
    Some(preCls)
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

  /** Remap a hash/sorted index stream (`[count i32][key 8B*count]
    * [pos 8B*count]`, little-endian — Tablet.flushStripe's layout): keep
    * entries whose position survives, rewriting it via `keepPos` (< 0 =
    * dropped). Monotone remap + unchanged keys preserve (key, pos) order. */
  private def remapPairIndex(bytes: Array[Byte], keepPos: Long => Long): Array[Byte] = {
    if (bytes.length < 4) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(0)
    val ks = new Array[Long](n)
    val ps = new Array[Long](n)
    var o = 0
    var i = 0
    while (i < n) {
      val np = keepPos(bb.getLong(4 + 8 * n + 8 * i))
      if (np >= 0) { ks(o) = bb.getLong(4 + 8 * i); ps(o) = np; o += 1 }
      i += 1
    }
    val s = new ByteSink(4 + 16 * o)
    s.writeInt(o)
    i = 0; while (i < o) { s.writeLong(ks(i)); i += 1 }
    i = 0; while (i < o) { s.writeLong(ps(i)); i += 1 }
    s.toArray
  }

  /** Remap a composite index stream (`[count i32][pos 8B*count]
    * [offsets i32*(count+1)][key bytes]`): same entry filter as
    * [[remapPairIndex]], carrying each kept entry's key bytes. */
  private def remapCompositeIndex(bytes: Array[Byte], keepPos: Long => Long): Array[Byte] = {
    if (bytes.length < 4) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(0)
    val offBase = 4 + 8 * n
    val keyBase = offBase + 4 * (n + 1)
    val ps = new Array[Long](n)
    val from = new Array[Int](n)
    val until = new Array[Int](n)
    var o = 0
    var total = 0
    var i = 0
    while (i < n) {
      val np = keepPos(bb.getLong(4 + 8 * i))
      if (np >= 0) {
        ps(o) = np
        from(o) = bb.getInt(offBase + 4 * i)
        until(o) = bb.getInt(offBase + 4 * (i + 1))
        total += until(o) - from(o)
        o += 1
      }
      i += 1
    }
    val s = new ByteSink(4 + 8 * o + 4 * (o + 1) + total)
    s.writeInt(o)
    i = 0; while (i < o) { s.writeLong(ps(i)); i += 1 }
    var acc = 0
    s.writeInt(acc)
    i = 0; while (i < o) { acc += until(i) - from(i); s.writeInt(acc); i += 1 }
    i = 0
    while (i < o) {
      s.writeBytes(bytes, keyBase + from(i), until(i) - from(i))
      i += 1
    }
    s.toArray
  }

  /** [[emitStream]]'s sibling for a DOMAIN-CHAINED stream (flatmap values,
    * array/map element streams, arbitrarily nested): chunk k stores values
    * in a projected domain, so a mixed chunk's row-domain keep-mask folds
    * through the chain — an ('I', inId) step selects the positions whose
    * in-map bit is set, an ('L', lenId) step replicates each slot's bit by
    * its length (null lengths are zero) — and then masks the values. The
    * step streams' chunks decode in lockstep (ordinal grids align by
    * construction). Raw and dropped chunks behave exactly as in
    * [[emitStream]]. */
  private def emitChainStream(w: Tablet.Writer, id: Int, bytes: Array[Byte],
      dir: Array[Tablet.ChunkLoc], steps: List[(Char, Int)],
      allBytes: Array[Array[Byte]], cls: Array[Int],
      masks: Array[Array[Boolean]]): Unit = {
    val anyMixed = cls.exists(_ == 2)
    val cursor = if (anyMixed && bytes.length > 0) new Tablet.ChunkCursor(bytes) else null
    val stepCursors: Array[Tablet.ChunkCursor] =
      if (cursor == null) null
      else steps.map { case (_, sid) => new Tablet.ChunkCursor(allBytes(sid)) }.toArray
    val stepKinds: Array[Char] = steps.map(_._1).toArray
    def frame(pos: Int): Array[Byte] = {
      val until = if (pos + 1 < dir.length) dir(pos + 1).offset.toInt else bytes.length
      java.util.Arrays.copyOfRange(bytes, dir(pos).offset.toInt, until)
    }
    def skipAll(): Unit = if (cursor != null) {
      cursor.skip()
      var i = 0
      while (i < stepCursors.length) { stepCursors(i).skip(); i += 1 }
    }
    var k = 0 // data ordinal
    var pos = 0 // frame position
    while (pos < dir.length) {
      if (!dir(pos).isData) w.copyRawAlphabetFrame(id, frame(pos))
      else {
        cls(k) match {
          case 0 => w.copyRawChunk(id, frame(pos), dir(pos).rows, dir(pos).stats)
            skipAll()
          case 1 => skipAll()
          case _ =>
            var mask = masks(k) // row domain
            var si = 0
            while (si < stepCursors.length) {
              val c = stepCursors(si)
              stepKinds(si) match {
                case 'I' =>
                  val ib = c.next().asInstanceOf[BoolsCol].values
                  var trues = 0
                  var i = 0
                  while (i < ib.length) { if (ib(i)) trues += 1; i += 1 }
                  val nm = new Array[Boolean](trues)
                  var j = 0
                  i = 0
                  while (i < ib.length) {
                    if (ib(i)) { nm(j) = mask(i); j += 1 }
                    i += 1
                  }
                  mask = nm
                case _ => // 'L'
                  val lc = expand(c.next()).asInstanceOf[LongsCol]
                  var total = 0L
                  var i = 0
                  while (i < lc.len) {
                    if (lc.nulls == null || !lc.nulls(i)) total += lc.values(i)
                    i += 1
                  }
                  val nm = new Array[Boolean](total.toInt)
                  var o = 0
                  i = 0
                  while (i < lc.len) {
                    val l = if (lc.nulls != null && lc.nulls(i)) 0L else lc.values(i)
                    val m = mask(i)
                    var e = 0
                    while (e < l) { nm(o) = m; o += 1; e += 1 }
                    i += 1
                  }
                  mask = nm
              }
              si += 1
            }
            val vcol = expand(cursor.next())
            require(mask.length == vcol.len,
              s"chained chunk $k of stream $id: ${vcol.len} values vs ${mask.length} projected slots")
            var vkn = 0
            var i = 0
            while (i < mask.length) { if (mask(i)) vkn += 1; i += 1 }
            w.writeChunk(id, filterCol(vcol, mask, vkn))
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

  /** Does the index stream key `k` cover column `n`? (An UPDATE assignment
    * into a covered column would change indexed VALUES — ineligible.) */
  private def auxCovers(k: String, n: String): Boolean =
    k == s"#idx:$n" || k == s"#sidx:$n" ||
      (k.startsWith("#cidx:") && k.substring(6).split("\\+").contains(n))

  /** Does literal `v` store directly into the column's decoded repr — i.e.
    * is Catalyst's cast the identity on the stored physical value (same int
    * days / micros / unscaled long)? Scala-converted literal shapes
    * (java.sql / java.time / java.math) are what
    * CatalystTypeConverters.convertToScala hands Delete.update. */
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
    case DateType =>
      v == null || v.isInstanceOf[java.sql.Date] || v.isInstanceOf[java.time.LocalDate]
    case TimestampType =>
      v == null || v.isInstanceOf[java.sql.Timestamp] || v.isInstanceOf[java.time.Instant]
    case TimestampNTZType =>
      v == null || v.isInstanceOf[java.time.LocalDateTime]
    case d: DecimalType if d.precision <= 18 =>
      // identity on the stored unscaled long: the literal's scale must equal
      // the column's (rescaling IS a cast) and the unscaled value must fit
      // the declared precision
      v == null || (v match {
        case b: java.math.BigDecimal =>
          b.scale == d.scale && b.precision <= d.precision
        case _ => false
      })
    case _ => false
  }

  /** Convert an accepted literal ([[literalFits]]) to the column's stored
    * physical value (int days / long micros / unscaled long) so
    * [[assignCol]]'s primitive paths apply unchanged. */
  private def toPhysical(v: Any, dt: DataType): Any = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    if (v == null) null
    else dt match {
      case DateType => v match {
        case d: java.sql.Date => DateTimeUtils.fromJavaDate(d)
        case d: java.time.LocalDate => DateTimeUtils.localDateToDays(d)
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
        case t: java.time.Instant => DateTimeUtils.instantToMicros(t)
      }
      case TimestampNTZType => v match {
        case t: java.time.LocalDateTime => DateTimeUtils.localDateTimeToMicros(t)
      }
      case _: DecimalType =>
        v.asInstanceOf[java.math.BigDecimal].unscaledValue().longValueExact()
      case _ => v
    }
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
