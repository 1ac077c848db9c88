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

  /** Compact `dir` into `outDir` at ~`targetFileBytes` per file. Shuffle
    * shape by layout: bucketed tables re-cluster through the write's own
    * required distribution (bucket count unchanged); sorted tables
    * range-repartition on the sort key (one shuffle, globally ordered,
    * range-disjoint files); plain tables coalesce — no shuffle at all, the
    * scan's bin-packed splits simply drain into fewer writers. */
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

    // plain read: the scan auto-detects the nanos split and nested layouts
    // from stream keys; unsigned-widened tables compact losslessly too (the
    // stored bit pattern round-trips signed, and readers re-widen on scan)
    val df = spark.read.format("nimble").load(dir)
    val sortCols = opts.get("sortColumns").map(_.split(",").toSeq).getOrElse(Nil)
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
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(NimbleSource.footerOf(all.head.path).schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    Delete.rewriteFiles(spark, dir, victims.map(_.path), all.map(_.path),
      schema, layout, Map.empty, identity, outFiles = Some(nOut))
    val after = GraftIO.listGft(dir)
    Report(all.length, after.length, bytesBefore, after.map(_.length).sum,
      after.map(f => NimbleSource.footerOf(f.path).rowCount).sum, layout)
  }
}
