package graft.ops

import org.apache.spark.sql.SparkSession
import graft.format.{GraftIO, Tablet}
import graft.spark.NimbleSource

/** OPTIMIZE — small-file compaction for tablet directories.
  *
  * Streaming micro-batch sinks and over-parallel writes leave directories of
  * many small files; at cluster scale every scan then pays per-file footer
  * reads and under-filled splits. Compaction rewrites a directory into
  * ~`targetFileBytes` files while preserving every layout property the
  * original writer declared — recovered from the footers and stream keys
  * themselves, so the caller does not need to know how the table was written
  * (the reference format records layout in the file, not in a catalog:
  * dwio/nimble/tablet/Footer.fbs:26, velox/Schema.fbs:60).
  *
  * Preserved: declared sort order (re-established globally with
  * range-disjoint output files), single and composite indexes, per-stripe
  * bloom filters, hash-bucket layout (compacts WITHIN buckets — the write
  * path re-clusters, so the storage-partitioned-join contract survives),
  * FlatMap / dictionary-array / dedup-map column layouts, and the
  * TimestampMicroNano split. Mixed declarations across files fail loudly
  * rather than silently dropping one file's layout.
  */
object Compaction {

  final case class Report(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long,
      rows: Long, writerOptions: Map[String, String])

  /** Recover the writer-facing layout options declared by the files in
    * `dir`. Conflicting sort or index declarations across files are a hard
    * error; the bucket spec uses the same all-files-agree rule as the scan
    * ([[NimbleSource.bucketSpecOf]]) and is dropped (not invented) when
    * mixed. */
  def recoverLayout(dir: String): Map[String, String] = {
    val files = NimbleSource.listFiles(dir)
    require(files.nonEmpty, s"nimble: compact: no tablet files under $dir")
    NimbleSource.prefetchFooters(files) // parallel: 10^5-file dirs must not serialize
    val footers = files.map(NimbleSource.footerOf)

    val sortCols = footers.head.sortColumns
    require(footers.forall(_.sortColumns == sortCols),
      s"nimble: compact: files under $dir declare conflicting sortColumns — " +
        "compact each layout separately")

    // index / layout recovery from the stream-key namespace: '#idx:c' is a
    // hash+sorted single-column index, '#cidx:a+b' a composite; 'p#in:k'
    // marks p as a FlatMap column; 'p#idx' + 'p#key...' a dedup map,
    // 'p#idx' + 'p#elem...' a dictionary array; 'p#nanos' the micros+nanos
    // timestamp split
    def layoutOf(f: Tablet.Footer): (Set[String], Set[String], Set[String], Set[String], Set[String]) = {
      val keys = f.streamKeys
      val singles = keys.collect { case k if k.startsWith("#idx:") => k.substring(5) }.toSet
      val composites = keys.collect { case k if k.startsWith("#cidx:") => k.substring(6) }.toSet
      val flatMaps = keys.collect { case k if k.contains("#in:") =>
        k.substring(0, k.indexOf("#in:")) }.toSet
      val keySet = keys.toSet
      val dd = keys.collect { case k if k.endsWith("#idx") && !k.startsWith("#") =>
        k.substring(0, k.length - 4) }.toSet
      val dedupMaps = dd.filter(p => keySet.exists(_.startsWith(s"$p#key")))
      val dictArrays = dd -- dedupMaps
      val tsNanos = keys.collect { case k if k.endsWith("#nanos") =>
        k.substring(0, k.length - 6) }.toSet
      (singles ++ composites, flatMaps, dedupMaps, dictArrays, tsNanos)
    }
    val layouts = footers.map(layoutOf)
    val (idxCols, _, dedupMaps, dictArrays, tsNanos) = layouts.head
    require(layouts.forall(l =>
      l._1 == idxCols && l._3 == dedupMaps && l._4 == dictArrays && l._5 == tsNanos),
      s"nimble: compact: files under $dir declare conflicting index/layout " +
        "options — compact each layout separately")
    // flatmap layout is UNION-compatible, not equality (r17): keys discover
    // from DATA, so a file whose rows held no entries for a flatmap column
    // legitimately writes only the '#nulls' anchor — no '#in:' streams at
    // all. Conflict exists only where a file materialized a union column as
    // a PLAIN map (its '#len' stream is structural, written even for empty
    // maps).
    val flatMaps = layouts.iterator.map(_._2).reduce(_ ++ _)
    for ((file, footer) <- files.zip(footers)) {
      val keySet = footer.streamKeys.toSet
      for (c <- flatMaps if keySet.contains(s"$c#len"))
        throw new IllegalArgumentException(
          s"nimble: compact: $file stores '$c' as a plain map while sibling files " +
            "shred it as a flatmap — compact each layout separately")
    }

    // bloom columns: a configured column blooms every data stream entry of
    // the first stripe (read one directory group of the first file)
    val bloomCols: Set[String] = {
      val r = new Tablet.Reader(files.head, footers.head)
      try {
        val schema = org.apache.spark.sql.types.DataType.fromJson(footers.head.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        schema.fields.map(_.name).filter { c =>
          val id = r.keyId(c)
          id >= 0 && footers.head.stripes.nonEmpty && {
            val e = r.dirEntries(0, id)
            e.nonEmpty && e(0).bloom != null
          }
        }.toSet
      } finally r.close()
    }

    val b = Map.newBuilder[String, String]
    if (sortCols.nonEmpty) b += "sortColumns" -> sortCols.mkString(",")
    if (idxCols.nonEmpty) b += "indexColumns" -> idxCols.mkString(",")
    if (bloomCols.nonEmpty) b += "bloomFilterColumns" -> bloomCols.mkString(",")
    if (flatMaps.nonEmpty) {
      b += "flatMapColumns" -> flatMaps.mkString(",")
      // the default key cap would fail a legitimate rewrite of a table
      // written with a higher explicit cap — the cap is not in the file,
      // but the ACTUAL key inventory is: the rewrite discovers at most the
      // union of the footers' keys, so recover the cap from that
      val defaultCap = graft.format.Fields.WriteOptions().maxFlatMapKeys
      val maxKeys = flatMaps.iterator.map { c =>
        footers.iterator.flatMap(
          _.streamKeys.iterator.filter(_.startsWith(s"$c#in:"))).toSet.size
      }.max
      if (maxKeys >= defaultCap) b += "maxFlatMapKeys" -> (maxKeys + 1).toString
    }
    if (dedupMaps.nonEmpty) b += "deduplicatedMapColumns" -> dedupMaps.mkString(",")
    if (dictArrays.nonEmpty) b += "dictionaryArrayColumns" -> dictArrays.mkString(",")
    if (tsNanos.nonEmpty) b += "timestampNanosColumns" -> tsNanos.mkString(",")
    NimbleSource.bucketSpecOf(files).foreach { case (cols, n) =>
      b += "bucketColumns" -> cols.mkString(",")
      b += "numBuckets" -> n.toString
    }
    b.result()
  }

  /** Compact `dir` into `outDir` at ~`targetFileBytes` per file.
    *
    * Fast path — RAW STRIPE CONCATENATION: stripes are self-contained by
    * construction (every stream's bytes, chunk directories, stripe blooms
    * and index streams live inside the stripe region — the same property
    * [[Tablet.Writer.appendRawStripe]] documents), so when the inputs are
    * layout-identical the compaction is a byte-level move: source stripes
    * append into bin-packed output files with zero decode and zero
    * re-encode. A 100 TB OPTIMIZE then costs table IO, not table CPU.
    * Eligibility (checked from footers alone; anything else falls back):
    * no extra options (they could change the physical layout), not
    * bucketed (the write path must re-cluster), identical schema AND
    * positionally identical stream keys across files (stream ids are
    * positional in the stripe region), and — for sorted tables — strictly
    * disjoint null-free file ranges on the leading sort column, so
    * concatenation in range order preserves the global sort the rewrite
    * path re-establishes by shuffle.
    *
    * Fallback — rewrite, shuffle shape by layout: bucketed tables
    * re-cluster through the write's own required distribution (bucket
    * count unchanged); sorted tables range-repartition on the sort key
    * (one shuffle, globally ordered, range-disjoint files); plain tables
    * coalesce — no shuffle at all, the scan's bin-packed splits simply
    * drain into fewer writers. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetFileBytes: Long = 256L << 20,
      extraOptions: Map[String, String] = Map.empty): Report = {
    require(targetFileBytes > 0, "nimble: compact: targetFileBytes must be positive")
    // overwriting the directory being read is undefined (the truncate races
    // the scan); in-place compaction = compact to a side dir + atomic rename
    require(new java.io.File(dir).getCanonicalPath !=
        new java.io.File(outDir).getCanonicalPath,
      s"nimble: compact: outDir must differ from the input directory ($dir)")
    val before = GraftIO.listGft(dir)
    val bytesBefore = before.map(_.length).sum
    val opts = recoverLayout(dir) ++ extraOptions
    val nOut = math.max(1, math.ceil(bytesBefore.toDouble / targetFileBytes).toInt)
    val sortCols = opts.get("sortColumns").map(_.split(",").toSeq).getOrElse(Nil)

    if (extraOptions.isEmpty) {
      rawConcatOrdered(before.map(_.path), sortCols, outDir, targetFileBytes,
        overwrite = true) match {
        case Some(written) =>
          lastCompactRaw.set(true)
          val after = GraftIO.listGft(outDir)
          return Report(before.length, after.length, bytesBefore,
            after.map(_.length).sum, written, opts)
        case None => () // ineligible: rewrite below
      }
    }
    lastCompactRaw.set(false)

    // plain read: the scan auto-detects the nanos split and nested layouts
    // from stream keys; unsigned-widened tables compact losslessly too (the
    // stored bit pattern round-trips signed, and readers re-widen on scan)
    val df = spark.read.format("nimble").load(dir)
    val shaped =
      if (opts.contains("numBuckets")) df // the bucketed write re-clusters itself
      else if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else df.coalesce(nOut)

    var w = shaped.write.format("nimble").mode("overwrite")
    opts.foreach { case (k, v) => w = w.option(k, v) }
    w.save(outDir)

    val after = GraftIO.listGft(outDir)
    Report(before.length, after.length, bytesBefore, after.map(_.length).sum,
      after.map(f => NimbleSource.footerOf(f.path).rowCount).sum, opts)
  }

  /** True when the most recent [[compact]]/[[compactSmall]] on this JVM took
    * the raw stripe-concat path (spec/probe introspection). */
  val lastCompactRaw = new java.util.concurrent.atomic.AtomicBoolean()

  /** Raw stripe concat when the files are layout-identical (see [[compact]]'s
    * eligibility list). Returns total rows written, or None when ineligible
    * (nothing written). Output files bin-pack to ~targetFileBytes in range
    * order for sorted tables, listing order otherwise. */
  private[ops] def rawConcatOrdered(files: Seq[String], sortCols: Seq[String],
      outDir: String, targetFileBytes: Long, overwrite: Boolean): Option[Long] = {
    if (files.isEmpty) return None
    NimbleSource.prefetchFooters(files)
    val footers = files.map(NimbleSource.footerOf)
    if (footers.exists(_.numBucketsSpec > 0)) return None
    val head = footers.head
    if (footers.exists(f => f.schemaJson != head.schemaJson)) return None
    // positional id alignment: appendRawStripe rebases offsets by stream ID,
    // so every file must enumerate the same keys in the same order (flatmap
    // key discovery makes per-file orders diverge — those fall back)
    val headKeys = head.streamKeys
    if (footers.exists(f => !f.streamKeys.sameElements(headKeys)))
      return None
    // v15 escape semantics: a "##" inside a stream key means ESCAPED key
    // data on v15+ files but RAW legacy bytes on v<15 — identical stream
    // NAMES with different logical keys. Raw concat copies the names
    // verbatim into a CURRENT-version writer (whose minimum-required stamp
    // would read "##" as v15-escaped), so legacy "##"-bearing sources must
    // take the shuffle rewrite instead — it decodes the LOGICAL keys under
    // the source's own convention and re-writes them correctly escaped.
    if (headKeys.exists(_.contains("##")) && footers.exists(_.version < 15))
      return None
    // sorted tables: concat preserves the global sort ONLY when file ranges
    // on the leading sort column are null-free and strictly disjoint
    val ordered: Seq[(String, Tablet.Footer)] =
      if (sortCols.isEmpty) files.zip(footers)
      else {
        val (empties, nonEmpty) = files.zip(footers).partition(_._2.rowCount == 0)
        val withStats = nonEmpty.map { case (f, ft) =>
          val r = new Tablet.Reader(f, ft)
          val st = try r.fileStatsOf(sortCols.head) finally r.close()
          (f, ft, st)
        }
        if (withStats.exists { case (_, _, st) =>
            st.isEmpty || !st.get.hasMinMax || st.get.nullCount > 0 ||
              st.get.kind == graft.format.PhysType.Bytes || st.get.hasNaN })
          return None // bytes ranges are TRUNCATED min/max, and NaNs sort
                      // LAST while being excluded from min/max — neither
                      // proves concat order
        val isFloat = withStats.headOption.exists { case (_, _, st) =>
          st.get.kind == graft.format.PhysType.F32 ||
            st.get.kind == graft.format.PhysType.F64 }
        val sorted =
          if (isFloat) withStats.sortBy(_._3.get.minDouble)
          else withStats.sortBy(_._3.get.minLong)
        var first = true
        var prevMaxD = 0d
        var prevMaxL = 0L
        for ((_, _, st) <- sorted) {
          if (!first && (if (isFloat) st.get.minDouble <= prevMaxD
                         else st.get.minLong <= prevMaxL)) return None
          prevMaxD = st.get.maxDouble
          prevMaxL = st.get.maxLong
          first = false
        }
        empties ++ sorted.map { case (f, ft, _) => (f, ft) }
      }
    // bin-pack in order, one writer per bin
    GraftIO.mkdirs(outDir)
    if (overwrite) GraftIO.listGft(outDir).foreach(f => GraftIO.delete(f.path))
    var rows = 0L
    var bin = 0
    var binBytes = 0L
    var w: Tablet.Writer = null
    def openWriter(): Unit = {
      val name = f"part-$bin%05d-${java.util.UUID.randomUUID().toString.take(8)}.gft"
      w = new Tablet.Writer(GraftIO.child(outDir, name), head.schemaJson,
        streamKeys = headKeys, sortColumns = head.sortColumns,
        ndvSketches = head.ndvSketches.nonEmpty, sharedDict = false)
    }
    openWriter()
    for ((f, ft) <- ordered if ft.rowCount > 0) {
      val fileBytes = GraftIO.status(f).length
      if (binBytes > 0 && binBytes + fileBytes > targetFileBytes) {
        w.close(); bin += 1; binBytes = 0L; openWriter()
      }
      val r = new Tablet.Reader(f, ft)
      try {
        w.mergeNdvFrom(ft)
        var s = 0
        while (s < ft.stripes.length) { w.appendRawStripe(r, s); s += 1 }
      } finally r.close()
      binBytes += fileBytes
      rows += ft.rowCount
    }
    w.close()
    Some(rows)
  }

  /** Incremental OPTIMIZE — in-place compaction of ONLY the small files.
    *
    * A streaming sink or an over-parallel append leaves a long tail of tiny
    * epoch files next to well-sized ones; full [[compact]] would rewrite
    * the WHOLE table into a side directory — at 100 TB that is 100 TB of
    * IO to fix a few GB of fragmentation. This variant selects the files
    * under `minFileBytes`, merges just those into ~`targetFileBytes`
    * replacements, and swaps them in place through the row-level ops'
    * copy-on-write commit ([[Delete.rewriteFiles]]: replacements staged in
    * a hidden side dir, originals unlinked before the move, so a crash
    * loses no committed data and never duplicates rows). Large files are
    * never opened, read, or touched.
    *
    * Layout: recovered and re-declared like [[compact]]. A sorted table's
    * small files range-partition among themselves, preserving the per-file
    * sort contract (TopN pushdown and sorted probes are per-file; global
    * cross-file range disjointness is not part of any read path's
    * correctness). Bucketed tables are refused — the bucket file is the
    * clustering unit; compact the whole table instead. */
  def compactSmall(spark: SparkSession, dir: String,
      minFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 256L << 20,
      victimFilter: String => Boolean = _ => true): Report = {
    require(targetFileBytes >= minFileBytes,
      "nimble: compactSmall: targetFileBytes must be >= minFileBytes")
    val all = GraftIO.listGft(dir)
    require(all.nonEmpty, s"nimble: compactSmall: no tablet files under $dir")
    val bytesBefore = all.map(_.length).sum
    val layout = recoverLayout(dir)
    require(!layout.contains("numBuckets"),
      s"nimble: compactSmall: $dir is hash-bucketed — the bucket file is the " +
        "clustering unit; use compact() to re-cluster the whole table")
    val victims = all.filter(f => f.length < minFileBytes && victimFilter(f.path))
    if (victims.length < 2) { // nothing to merge: pure no-op, zero IO
      val rows = all.map(f => NimbleSource.footerOf(f.path).rowCount).sum
      return Report(all.length, all.length, bytesBefore, bytesBefore, rows, layout)
    }
    val vBytes = victims.map(_.length).sum
    val nOut = math.max(1, math.ceil(vBytes.toDouble / targetFileBytes).toInt)
    // raw fast path: victims that are layout-identical (and, when sorted,
    // range-disjoint among themselves — a raw concat of OVERLAPPING sorted
    // victims would break the per-file sort contract TopN pushdown relies
    // on) merge byte-for-byte through the same copy-on-write commit
    val sortCols = layout.get("sortColumns").map(_.split(",").toSeq).getOrElse(Nil)
    val tmp = GraftIO.child(dir,
      s".compact-${java.util.UUID.randomUUID().toString.take(8)}")
    val raw = try {
      rawConcatOrdered(victims.map(_.path), sortCols, tmp, targetFileBytes,
        overwrite = false) match {
        case Some(_) =>
          Delete.commitReplacements(dir, victims.map(_.path), tmp)
          true
        case None => false
      }
    } finally GraftIO.delete(tmp, recursive = true)
    lastCompactRaw.set(raw)
    if (!raw) {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(NimbleSource.footerOf(all.head.path).schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Delete.rewriteFiles(spark, dir, victims.map(_.path), all.map(_.path),
        schema, layout, Map.empty, identity, outFiles = Some(nOut))
    }
    val after = GraftIO.listGft(dir)
    Report(all.length, after.length, bytesBefore, after.map(_.length).sum,
      after.map(f => NimbleSource.footerOf(f.path).rowCount).sum, layout)
  }
}
