package graft.format

import org.apache.spark.sql.types._

/** Point-lookup API outside the Spark planner — the
  * SelectiveNimbleIndexReader analog (reference:
  * dwio/nimble/velox/selective/SelectiveNimbleIndexReader.h:45-70,
  * index/HashIndex.h:57, index/SortedIndex.h:48): footer-only stripe
  * selection (sort-key ranges + Bloom filters), then decode of just the
  * matching stripes with an equality test — low-latency key probes without a
  * SparkSession. Atomic columns only. */
object Lookup {

  /** Observability for the lookup path: how many rows were actually decoded
    * vs how many the probed stripes hold. With a hash index the former stays
    * ~chunk-sized per hit; without it every surviving stripe's key column
    * decodes in full. */
  final case class Metrics(var rowsDecoded: Long = 0L, var stripeRows: Long = 0L,
      var stripesProbed: Int = 0, var indexProbes: Int = 0)

  /** All rows where `column == value` across the tablet files under `path`.
    * Returns (columnName -> value) maps, one per matching row. */
  def pointLookup(path: String, column: String, value: Any): Seq[Map[String, Any]] =
    pointLookupMetered(path, column, value)._1

  /** [[pointLookup]] plus decode-cost metrics (index-effectiveness specs). */
  def pointLookupMetered(path: String, column: String, value: Any): (Seq[Map[String, Any]], Metrics) = {
    val m = Metrics()
    (GraftIO.listGft(path).map(_.path).flatMap(lookupInFile(_, column, value, m)), m)
  }

  /** Batch point lookup: N equality probes on one key column answered with
    * ONE reader open, ONE footer parse, and ONE index-stream load per
    * file-stripe for the WHOLE batch, with candidate verification and
    * sibling materialization chunk-grouped across probes (the reference's
    * index reader services request batches the same way —
    * dwio/nimble/velox/selective/SelectiveNimbleIndexReader.h:45-70; the
    * per-probe surface re-paid the footer + index constant for every key,
    * linear-with-a-big-constant at 10K+ keys). Results come back per probe
    * in REQUEST order; a probe that matches k rows yields k maps.
    * rowsDecoded stays ~hit-count on indexed stripes (r15 positional-hit
    * contract) regardless of batch size. */
  def batchPointLookupMetered(path: String, column: String, values: Seq[Any])
      : (IndexedSeq[Seq[Map[String, Any]]], Metrics) = {
    val m = Metrics()
    val acc = Array.fill(values.length)(
      scala.collection.mutable.ArrayBuffer[Map[String, Any]]())
    GraftIO.listGft(path).foreach(meta =>
      batchPointInFile(meta.path, column, values, acc, m))
    (acc.map(_.toSeq).toIndexedSeq, m)
  }

  private def batchPointInFile(file: String, column: String, values: Seq[Any],
      acc: Array[scala.collection.mutable.ArrayBuffer[Map[String, Any]]],
      m: Metrics): Unit = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      val colId = keyIdx.getOrElse(column, return)
      val probeSplit = reader.nanosSplit(column)
      val idxId =
        if (probeSplit) -1 else keyIdx.getOrElse(Tablet.indexStreamKey(column), -1)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      var s = 0
      while (s < footer.stripes.length) {
        // stats + bloom load once per stripe; per-probe pruning is in-memory
        val st0 = reader.streamStats(s, colId)
        val st = if (probeSplit) Tablet.nanosScaledStats(st0) else st0
        val bloom = if (probeSplit) None else reader.streamBloom(s, colId)
        val survivors = values.indices.filter(i => mightMatch(st, bloom, values(i)))
        if (survivors.nonEmpty) {
          m.stripesProbed += 1
          m.stripeRows += footer.stripes(s).rowCount
          val hasIndex = idxId >= 0 && reader.streamLoc(s, idxId).length > 0
          // the hash index serves string/number probes (same rule as the
          // per-probe path); anything else scans
          val (idxable, scanning) =
            if (hasIndex) survivors.partition(i =>
              values(i).isInstanceOf[String] || values(i).isInstanceOf[Number])
            else (Seq.empty[Int], survivors)
          val pairs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (chunk,row,probe)
          if (idxable.nonEmpty)
            batchVerifyViaIndex(reader, s, idxId, colId, values, idxable, pairs, m)
          if (scanning.nonEmpty)
            batchVerifyByScan(reader, s, colId, keyIdx, column, values, scanning, pairs, m)
          if (pairs.nonEmpty) {
            // sibling decode once per (chunk,row), shared by all matching probes
            val hits = scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]()
            pairs.map(p => (p._1, p._2)).distinct.sorted
              .groupBy(_._1).toSeq.sortBy(_._1)
              .foreach { case (c, rs) => hits(c) = rs.map(_._2).toSeq }
            val rowsOut = materializeRows(reader, s, keyIdx,
              atomicFields.filter(_.name != column), hits, m)
            for ((chunk, row, probe) <- pairs.sortBy(p => (p._3, p._1, p._2)))
              acc(probe) += (rowsOut((chunk, row)) + (column -> values(probe)))
          }
        }
        s += 1
      }
    } finally reader.close()
  }

  /** Index-probe the batch: the stripe's (hash, position) table loads ONCE,
    * each probe binary-searches it, and hash-candidate verification decodes
    * each candidate chunk at the union of candidate positions. */
  private def batchVerifyViaIndex(reader: Tablet.Reader, s: Int, idxId: Int,
      colId: Int, values: Seq[Any], probes: Seq[Int],
      pairs: scala.collection.mutable.ArrayBuffer[(Int, Int, Int)], m: Metrics): Unit = {
    val idx = new ByteCursor(reader.readStreamBytes(s, idxId))
    val count = idx.readInt()
    val hashBase = idx.pos
    def hashAt(i: Int): Long = { idx.pos = hashBase + 8 * i; idx.readLong() }
    def posAt(i: Int): Long = { idx.pos = hashBase + 8 * count + 8 * i; idx.readLong() }
    val cand = scala.collection.mutable.ArrayBuffer[(Long, Int)]() // (pos, probe)
    for (pi <- probes) {
      m.indexProbes += 1
      val h = values(pi) match {
        case str: String => val b = str.getBytes("UTF-8"); Tablet.hashBytesValue(b, 0, b.length)
        case n: Number => Tablet.hashLongValue(n.longValue())
        case other => throw new IllegalStateException(s"unindexable probe $other")
      }
      var lo = 0; var hi = count
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hashAt(mid) < h) lo = mid + 1 else hi = mid
      }
      var i = lo
      while (i < count && hashAt(i) == h) { cand += ((posAt(i), pi)); i += 1 }
    }
    if (cand.isEmpty) return
    // chunk -> (row, probe) candidates; verify each chunk once, positionally
    val byChunk = scala.collection.mutable.LinkedHashMap[Int, Seq[(Int, Int)]]()
    cand.map { case (p, pi) => ((p >>> 32).toInt, (p & 0xffffffffL).toInt, pi) }
      .sortBy(t => (t._1, t._2)).groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (c, ts) => byChunk(c) = ts.map(t => (t._2, t._3)).toSeq }
    val keyCur = new Tablet.ChunkCursor(reader.readStreamBytes(s, colId))
    var ord = 0
    var remaining = byChunk.size
    while (keyCur.hasNext && remaining > 0) {
      byChunk.get(ord) match {
        case Some(rowProbes) =>
          val pos = rowProbes.map(_._1).distinct.sorted.toArray
          val fast = keyCur.nextAtLookup(pos)
          if (fast != null) {
            m.rowsDecoded += fast.len
            val at = pos.zipWithIndex.toMap
            for ((r, pi) <- rowProbes if rowMatches(fast, at(r), values(pi)))
              pairs += ((ord, r, pi))
          } else {
            val lo = pos(0); val hi = pos(pos.length - 1)
            val (keyCol, start) = keyCur.nextRange(lo, hi + 1)
            m.rowsDecoded += keyCol.len
            for ((r, pi) <- rowProbes if rowMatches(keyCol, r - start, values(pi)))
              pairs += ((ord, r, pi))
          }
          remaining -= 1
        case None => keyCur.skip()
      }
      ord += 1
    }
  }

  /** Scan the key column ONCE for every non-indexable surviving probe: a
    * value -> probes table turns the per-row test into a hash lookup, so the
    * stripe cost is O(rows) regardless of batch size (the per-probe surface
    * paid O(rows) PER PROBE here). */
  private def batchVerifyByScan(reader: Tablet.Reader, s: Int, colId: Int,
      keyIdx: Map[String, Int], column: String, values: Seq[Any], probes: Seq[Int],
      pairs: scala.collection.mutable.ArrayBuffer[(Int, Int, Int)], m: Metrics): Unit = {
    val numProbes = scala.collection.mutable.HashMap[Long, List[Int]]()
    val strProbes = scala.collection.mutable.HashMap[String, List[Int]]()
    val oddProbes = scala.collection.mutable.ArrayBuffer[Int]() // rowMatches per row
    for (pi <- probes) values(pi) match {
      case n: Number => numProbes(n.longValue()) = pi :: numProbes.getOrElse(n.longValue(), Nil)
      case str: String => strProbes(str) = pi :: strProbes.getOrElse(str, Nil)
      case _ => oddProbes += pi
    }
    val keyCur = colCursor(reader, s, keyIdx, column)
    var ord = 0
    while (keyCur.hasNext) {
      val col = keyCur.next()
      m.rowsDecoded += col.len
      var i = 0
      while (i < col.len) {
        col match {
          case c: LongsCol if (c.nulls == null || !c.nulls(i)) && numProbes.nonEmpty =>
            numProbes.getOrElse(c.values(i), Nil).foreach(pi => pairs += ((ord, i, pi)))
          case c: BytesCol if (c.nulls == null || !c.nulls(i)) && strProbes.nonEmpty =>
            strProbes.getOrElse(new String(c(i), "UTF-8"), Nil)
              .foreach(pi => pairs += ((ord, i, pi)))
          case _ => ()
        }
        oddProbes.foreach(pi => if (rowMatches(col, i, values(pi))) pairs += ((ord, i, pi)))
        i += 1
      }
      ord += 1
    }
  }

  /** Decode `fields` for the (chunk -> rows) hits, positionally where the
    * codec seeks, returning one (chunk, row) -> values map — the shared
    * materializer of the batch path. */
  private def materializeRows(reader: Tablet.Reader, s: Int,
      keyIdx: Map[String, Int], fields: Array[StructField],
      hits: scala.collection.mutable.LinkedHashMap[Int, Seq[Int]],
      m: Metrics): scala.collection.mutable.LinkedHashMap[(Int, Int), Map[String, Any]] = {
    val rowsOut = scala.collection.mutable.LinkedHashMap[(Int, Int), scala.collection.mutable.LinkedHashMap[String, Any]]()
    for ((chunk, rows) <- hits; r <- rows)
      rowsOut((chunk, r)) = scala.collection.mutable.LinkedHashMap[String, Any]()
    for (f <- fields) {
      val cur = colCursor(reader, s, keyIdx, f.name)
      var ord = 0
      var left = hits.size
      while (cur.hasNext && left > 0) {
        hits.get(ord) match {
          case Some(rows) =>
            val pos = rows.distinct.sorted.toArray
            val fast = cur.nextAt(pos)
            if (fast != null) {
              m.rowsDecoded += fast.len
              var j = 0
              while (j < pos.length) { rowsOut((ord, pos(j)))(f.name) = valueAt(fast, j); j += 1 }
            } else {
              val (c, start) = cur.nextRange(rows.min, rows.max + 1)
              m.rowsDecoded += c.len
              for (r <- rows) rowsOut((ord, r))(f.name) = valueAt(c, r - start)
            }
            left -= 1
          case None => cur.skip()
        }
        ord += 1
      }
    }
    rowsOut.map { case (k, v) => k -> v.toMap }
  }

  /** All rows where `lo <= column <= hi` (both inclusive; numeric bounds for
    * integral columns, string bounds for string columns) — the SortedIndex
    * range-probe analog (reference: dwio/nimble/index/SortedIndex.h:48,
    * index/IndexLookup.h:55-65). With a sorted index a binary search
    * brackets the range and only boundary-bracketed chunks decode; without
    * one, every stats-surviving stripe's key column decodes. */
  def rangeLookup(path: String, column: String, lo: Any, hi: Any): Seq[Map[String, Any]] =
    rangeLookupMetered(path, column, lo, hi)._1

  /** [[rangeLookup]] plus decode-cost metrics (index-effectiveness specs). */
  def rangeLookupMetered(path: String, column: String, lo: Any, hi: Any): (Seq[Map[String, Any]], Metrics) = {
    val m = Metrics()
    (GraftIO.listGft(path).map(_.path).flatMap(rangeInFile(_, column, lo, hi, m)), m)
  }

  /** Composite-index probe (order-preserving KeyEncoder analog — reference:
    * dwio/nimble/index/KeyEncoding.h:30-44, index/SortedIndex.h:48,
    * index/IndexLookup.h:55-65): equality on the leading `eq.length`
    * components of the composite index `cols`, plus an optional inclusive
    * range on the NEXT component. With a `#cidx` stream (written via
    * `indexColumns=a+b`) a binary search over the memcomparable keys
    * brackets the candidates and only their chunks decode; without one,
    * stats-surviving stripes scan. */
  def compositeLookup(path: String, cols: Seq[String], eq: Seq[Any],
      range: Option[(Any, Any)] = None): Seq[Map[String, Any]] =
    compositeLookupMetered(path, cols, eq, range)._1

  /** [[compositeLookup]] plus decode-cost metrics. */
  def compositeLookupMetered(path: String, cols: Seq[String], eq: Seq[Any],
      range: Option[(Any, Any)] = None): (Seq[Map[String, Any]], Metrics) = {
    require(eq.length + (if (range.isDefined) 1 else 0) <= cols.length &&
      (eq.nonEmpty || range.isDefined), "probe components must be a non-empty prefix of the index columns")
    val m = Metrics()
    (GraftIO.listGft(path).map(_.path).flatMap(compositeInFile(_, cols, eq, range, m)), m)
  }

  /** Batch composite lookup — the [[batchPointLookupMetered]] treatment for
    * composite-index probes: N (equality-prefix, optional-range) requests
    * answered with ONE reader open and ONE `#cidx` load per file-stripe.
    * Candidates need no re-verification (component encodings are
    * prefix-free), so the batch is: per-probe binary searches over the
    * once-loaded memcomparable key run, then ONE chunk-grouped sibling
    * materialization for all probes' hits. Stripes without the index decode
    * each probed member column once per chunk and test every probe against
    * it (the per-probe surface re-decoded the columns per probe). */
  def batchCompositeLookupMetered(path: String, cols: Seq[String],
      probes: Seq[(Seq[Any], Option[(Any, Any)])])
      : (IndexedSeq[Seq[Map[String, Any]]], Metrics) = {
    for ((eq, range) <- probes)
      require(eq.length + (if (range.isDefined) 1 else 0) <= cols.length &&
        (eq.nonEmpty || range.isDefined),
        "probe components must be a non-empty prefix of the index columns")
    val m = Metrics()
    val acc = Array.fill(probes.length)(
      scala.collection.mutable.ArrayBuffer[Map[String, Any]]())
    GraftIO.listGft(path).foreach(meta =>
      batchCompositeInFile(meta.path, cols, probes, acc, m))
    (acc.map(_.toSeq).toIndexedSeq, m)
  }

  private def batchCompositeInFile(file: String, cols: Seq[String],
      probes: Seq[(Seq[Any], Option[(Any, Any)])],
      acc: Array[scala.collection.mutable.ArrayBuffer[Map[String, Any]]],
      m: Metrics): Unit = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      if (cols.exists(c => !keyIdx.contains(c))) return
      val predsOf: Int => Seq[(String, Any, Any)] = { pi =>
        val (eq, range) = probes(pi)
        eq.zip(cols).map { case (v, c) => (c, v, v) } ++
          range.map { case (lo, hi) => (cols(eq.length), lo, hi) }.toSeq
      }
      val anySplit = cols.exists(c => reader.nanosSplit(c))
      val cidxId = if (anySplit) -1
        else keyIdx.getOrElse(Tablet.compositeIndexStreamKey(cols), -1)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      var s = 0
      while (s < footer.stripes.length) {
        // member-column stats load once per stripe; per-probe pruning in memory
        val statsOf = cols.map { c =>
          val st0 = reader.streamStats(s, keyIdx(c))
          c -> (if (reader.nanosSplit(c)) Tablet.nanosScaledStats(st0) else st0)
        }.toMap
        val survivors = probes.indices.filter(pi =>
          predsOf(pi).forall { case (c, lo, hi) => rangeOverlaps(statsOf(c), lo, hi) })
        if (survivors.nonEmpty) {
          m.stripesProbed += 1
          m.stripeRows += footer.stripes(s).rowCount
          val hasIndex = cidxId >= 0 && reader.streamLoc(s, cidxId).length > 0
          val pairs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (chunk,row,probe)
          if (hasIndex) {
            // ONE cidx load for the whole batch; per-probe binary searches
            val idx = new ByteCursor(reader.readStreamBytes(s, cidxId))
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
            for (pi <- survivors) {
              m.indexProbes += 1
              val (eq, range) = probes(pi)
              val loKey = KeyCodec.encode(eq ++ range.map(_._1).toSeq)
              val hiExcl = KeyCodec.prefixSuccessor(KeyCodec.encode(eq ++ range.map(_._2).toSeq))
              var a = 0; var b = count
              while (a < b) {
                val mid = (a + b) >>> 1
                if (cmpKey(mid, loKey) < 0) a = mid + 1 else b = mid
              }
              var i = a
              while (i < count && (hiExcl.isEmpty || cmpKey(i, hiExcl) < 0)) {
                val p = posAt(i)
                pairs += (((p >>> 32).toInt, (p & 0xffffffffL).toInt, pi))
                i += 1
              }
            }
          } else {
            // batch scan fallback: decode each probed MEMBER column once per
            // chunk (union of all probes' members), test every probe per row
            val members = survivors.flatMap(pi => predsOf(pi).map(_._1)).distinct
            val curs = members.map(c => c -> colCursor(reader, s, keyIdx, c)).toMap
            val probePreds = survivors.map(pi => pi -> predsOf(pi))
            var ord = 0
            while (curs(members.head).hasNext) {
              val chunkCols = members.map(c => c -> curs(c).next()).toMap
              chunkCols.valuesIterator.foreach(c => m.rowsDecoded += c.len)
              val n = chunkCols(members.head).len
              var r = 0
              while (r < n) {
                for ((pi, preds) <- probePreds)
                  if (preds.forall { case (c, lo, hi) => rowInRange(chunkCols(c), r, lo, hi) })
                    pairs += ((ord, r, pi))
                r += 1
              }
              ord += 1
            }
          }
          if (pairs.nonEmpty) {
            val hits = scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]()
            pairs.map(p => (p._1, p._2)).distinct.sorted
              .groupBy(_._1).toSeq.sortBy(_._1)
              .foreach { case (c, rs) => hits(c) = rs.map(_._2).toSeq }
            val rowsOut = materializeRows(reader, s, keyIdx, atomicFields, hits, m)
            for ((chunk, row, probe) <- pairs.sortBy(p => (p._3, p._1, p._2)))
              acc(probe) += rowsOut((chunk, row))
          }
        }
        s += 1
      }
    } finally reader.close()
  }

  private def compositeInFile(file: String, cols: Seq[String], eq: Seq[Any],
      range: Option[(Any, Any)], m: Metrics): Seq[Map[String, Any]] = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      if (cols.exists(c => !keyIdx.contains(c))) return Nil
      // probed components as per-column inclusive ranges (eq => [v, v])
      val preds: Seq[(String, Any, Any)] =
        eq.zip(cols).map { case (v, c) => (c, v, v) } ++
          range.map { case (lo, hi) => (cols(eq.length), lo, hi) }.toSeq
      // nanos-split members: index keys hold micros — logical probes scan
      val anySplit = cols.exists(c => reader.nanosSplit(c))
      val cidxId = if (anySplit) -1
        else keyIdx.getOrElse(Tablet.compositeIndexStreamKey(cols), -1)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
      var s = 0
      while (s < footer.stripes.length) {
        val surviving = preds.forall { case (c, lo, hi) =>
          val st0 = reader.streamStats(s, keyIdx(c))
          val st = if (reader.nanosSplit(c)) Tablet.nanosScaledStats(st0) else st0
          rangeOverlaps(st, lo, hi)
        }
        if (surviving) {
          m.stripesProbed += 1
          m.stripeRows += footer.stripes(s).rowCount
          val hasIndex = cidxId >= 0 && reader.streamLoc(s, cidxId).length > 0
          if (hasIndex) compositeViaIndex(reader, s, cidxId, keyIdx, atomicFields, eq, range, out, m)
          else compositeByScan(reader, s, keyIdx, atomicFields, preds, out, m)
        }
        s += 1
      }
      out.toSeq
    } finally reader.close()
  }

  /** Binary-search the memcomparable key run: candidates are exactly the
    * keys in [enc(eq:+lo), prefixSuccessor(enc(eq:+hi))) — component
    * encodings are prefix-free, so no re-verification is needed. */
  private def compositeViaIndex(reader: Tablet.Reader, s: Int, cidxId: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField],
      eq: Seq[Any], range: Option[(Any, Any)],
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    m.indexProbes += 1
    val loKey = KeyCodec.encode(eq ++ range.map(_._1).toSeq)
    val hiExcl = KeyCodec.prefixSuccessor(KeyCodec.encode(eq ++ range.map(_._2).toSeq))
    val idx = new ByteCursor(reader.readStreamBytes(s, cidxId))
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
    while (a < b) {
      val mid = (a + b) >>> 1
      if (cmpKey(mid, loKey) < 0) a = mid + 1 else b = mid
    }
    val cand = scala.collection.mutable.ArrayBuffer[Long]()
    var i = a
    while (i < count && (hiExcl.isEmpty || cmpKey(i, hiExcl) < 0)) { cand += posAt(i); i += 1 }
    if (cand.isEmpty) return
    val byChunk = scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]()
    cand.map(p => ((p >>> 32).toInt, (p & 0xffffffffL).toInt)).sorted
      .groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (c, ps) => byChunk(c) = ps.map(_._2).toSeq }
    materializePositions(reader, s, keyIdx, atomicFields, byChunk, out, m)
  }

  /** Materialize ALL atomic fields for (chunk -> rows) hits, skipping every
    * other chunk (the composite variant of [[materializeVerified]], which
    * seeds from a single probe column). */
  private def materializePositions(reader: Tablet.Reader, s: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField],
      hits: scala.collection.mutable.LinkedHashMap[Int, Seq[Int]],
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    val rowsOut = scala.collection.mutable.LinkedHashMap[(Int, Int), scala.collection.mutable.LinkedHashMap[String, Any]]()
    for ((chunk, rows) <- hits; r <- rows)
      rowsOut((chunk, r)) = scala.collection.mutable.LinkedHashMap[String, Any]()
    for (f <- atomicFields) {
      val cur = colCursor(reader, s, keyIdx, f.name)
      var ord = 0
      var left = hits.size
      while (cur.hasNext && left > 0) {
        hits.get(ord) match {
          case Some(rows) =>
            val c = cur.next()
            m.rowsDecoded += c.len
            for (r <- rows) rowsOut((ord, r))(f.name) = valueAt(c, r)
            left -= 1
          case None => cur.skip()
        }
        ord += 1
      }
    }
    rowsOut.values.foreach(r => out += r.toMap)
  }

  /** Fallback: decode the probed member columns, then siblings only for
    * chunks with a surviving row. */
  private def compositeByScan(reader: Tablet.Reader, s: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField],
      preds: Seq[(String, Any, Any)],
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    val predCurs = preds.map { case (c, lo, hi) => (c, lo, hi, colCursor(reader, s, keyIdx, c)) }
    val predNames = preds.map(_._1).toSet
    val others = atomicFields.filter(f => !predNames.contains(f.name)).map { f =>
      f.name -> colCursor(reader, s, keyIdx, f.name)
    }
    while (predCurs.head._4.hasNext) {
      val predCols = predCurs.map { case (c, lo, hi, cur) => (c, lo, hi, cur.next()) }
      predCols.foreach { case (_, _, _, col) => m.rowsDecoded += col.len }
      val n = predCols.head._4.len
      val matches = (0 until n).filter(i =>
        predCols.forall { case (_, lo, hi, col) => rowInRange(col, i, lo, hi) })
      if (matches.isEmpty) {
        others.foreach(_._2.skip())
      } else {
        val cols = others.map { case (nm, cur) => nm -> cur.next() }
        for ((_, c) <- cols) m.rowsDecoded += c.len
        for (r <- matches) {
          val row = scala.collection.mutable.LinkedHashMap[String, Any]()
          for ((nm, _, _, col) <- predCols) row(nm) = valueAt(col, r)
          for ((nm, c) <- cols) row(nm) = valueAt(c, r)
          out += row.toMap
        }
      }
    }
  }

  private def rangeInFile(file: String, column: String, lo: Any, hi: Any,
      m: Metrics): Seq[Map[String, Any]] = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      val colId = keyIdx.getOrElse(column, return Nil)
      // nanos-split probe columns: the sorted index holds MICROS values, an
      // epoch-nanos range can't probe it — stats-prune (scaled) + scan
      val probeSplit = reader.nanosSplit(column)
      val sidxId =
        if (probeSplit) -1 else keyIdx.getOrElse(Tablet.sortedIndexStreamKey(column), -1)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
      var s = 0
      while (s < footer.stripes.length) {
        val info = footer.stripes(s)
        val st0 = reader.streamStats(s, colId)
        val st = if (probeSplit) Tablet.nanosScaledStats(st0) else st0
        if (rangeOverlaps(st, lo, hi)) {
          m.stripesProbed += 1
          m.stripeRows += info.rowCount
          val hasIndex = sidxId >= 0 && reader.streamLoc(s, sidxId).length > 0
          if (hasIndex) rangeViaIndex(reader, s, sidxId, colId, keyIdx, atomicFields, column, lo, hi, out, m)
          else rangeByScan(reader, s, keyIdx, atomicFields, column, lo, hi, out, m)
        }
        s += 1
      }
      out.toSeq
    } finally reader.close()
  }

  /** Sorted-index range probe: binary-search the lower bound of `lo`, walk
    * forward while keys <= `hi`, then decode ONLY the chunks holding
    * candidate positions. String sort keys are 8-byte order-preserving
    * prefixes, so boundary candidates re-verify against the real key chunk
    * (prefix ties); integral keys are exact but the key chunk still decodes
    * to materialize the row. */
  private def rangeViaIndex(reader: Tablet.Reader, s: Int, sidxId: Int, colId: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField], column: String,
      lo: Any, hi: Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    m.indexProbes += 1
    val (loKey, hiKey) = (lo, hi) match {
      case (a: Number, b: Number) => (a.longValue(), b.longValue())
      case (a: String, b: String) =>
        val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
        (Tablet.bytesSortKey(ab, 0, ab.length), Tablet.bytesSortKey(bb, 0, bb.length))
      case _ => // unindexable bound type: full scan of the stripe
        rangeByScan(reader, s, keyIdx, atomicFields, column, lo, hi, out, m); return
    }
    if (loKey > hiKey) return
    val idx = new ByteCursor(reader.readStreamBytes(s, sidxId))
    val count = idx.readInt()
    val base = idx.pos
    def keyAt(i: Int): Long = { idx.pos = base + 8 * i; idx.readLong() }
    def posAt(i: Int): Long = { idx.pos = base + 8 * count + 8 * i; idx.readLong() }
    // lower bound of loKey in the sorted key run
    var a = 0; var b = count
    while (a < b) {
      val mid = (a + b) >>> 1
      if (keyAt(mid) < loKey) a = mid + 1 else b = mid
    }
    val cand = scala.collection.mutable.ArrayBuffer[Long]()
    var i = a
    while (i < count && keyAt(i) <= hiKey) { cand += posAt(i); i += 1 }
    if (cand.isEmpty) return
    val byChunk: Map[Int, Seq[Int]] = cand.groupBy(p => (p >>> 32).toInt)
      .map { case (c, ps) => c -> ps.map(p => (p & 0xffffffffL).toInt).sorted.toSeq }
    // verify candidates against the real key chunk (string prefix ties land
    // here; integral candidates always pass) and capture the actual values
    val keyCur = new Tablet.ChunkCursor(reader.readStreamBytes(s, colId))
    val verified = scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]()
    val keyVals = scala.collection.mutable.HashMap[(Int, Int), Any]()
    var ord = 0
    var remaining = byChunk.size
    while (keyCur.hasNext && remaining > 0) {
      byChunk.get(ord) match {
        case Some(rows) =>
          val keyCol = keyCur.next()
          m.rowsDecoded += keyCol.len
          val ok = rows.filter(r => rowInRange(keyCol, r, lo, hi))
          if (ok.nonEmpty) {
            verified(ord) = ok
            for (r <- ok) keyVals((ord, r)) = valueAt(keyCol, r)
          }
          remaining -= 1
        case None => keyCur.skip()
      }
      ord += 1
    }
    if (verified.isEmpty) return
    materializeVerified(reader, s, keyIdx, atomicFields, column, verified,
      (c, r) => keyVals((c, r)), out, m)
  }

  /** Fallback range scan: decode the whole key column of the stripe. */
  private def rangeByScan(reader: Tablet.Reader, s: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField], column: String,
      lo: Any, hi: Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    val keyCur = colCursor(reader, s, keyIdx, column)
    val others = atomicFields.filter(_.name != column).map { f =>
      f.name -> colCursor(reader, s, keyIdx, f.name)
    }
    while (keyCur.hasNext) {
      val keyCol = keyCur.next()
      m.rowsDecoded += keyCol.len
      val matches = (0 until keyCol.len).filter(i => rowInRange(keyCol, i, lo, hi))
      if (matches.isEmpty) {
        others.foreach(_._2.skip())
      } else {
        val cols = others.map { case (n, cur) => n -> cur.next() }
        for ((_, c) <- cols) m.rowsDecoded += c.len
        for (r <- matches) {
          val row = scala.collection.mutable.LinkedHashMap[String, Any](column -> valueAt(keyCol, r))
          for ((n, c) <- cols) row(n) = valueAt(c, r)
          out += row.toMap
        }
      }
    }
  }

  /** Is row `i` of `col` inside [lo, hi] (both inclusive)? The single range
    * predicate the index-verify and scan paths both use. */
  private def rowInRange(col: Column, i: Int, lo: Any, hi: Any): Boolean = (col, lo, hi) match {
    case (c: LongsCol, a: Number, b: Number) =>
      (c.nulls == null || !c.nulls(i)) &&
        c.values(i) >= a.longValue() && c.values(i) <= b.longValue()
    case (c: BytesCol, a: String, b: String) =>
      (c.nulls == null || !c.nulls(i)) && {
        val off = c.offsets(i); val len = c.offsets(i + 1) - off
        cmpSlice(c.bytes, off, len, a.getBytes("UTF-8")) >= 0 &&
          cmpSlice(c.bytes, off, len, b.getBytes("UTF-8")) <= 0
      }
    case _ => false
  }

  /** Unsigned-bytewise compare of bytes[off, off+len) vs `t`. */
  private def cmpSlice(bytes: Array[Byte], off: Int, len: Int, t: Array[Byte]): Int = {
    val n = math.min(len, t.length)
    var k = 0
    while (k < n) {
      val d = (bytes(off + k) & 0xff) - (t(k) & 0xff)
      if (d != 0) return d
      k += 1
    }
    len - t.length
  }

  private def rangeOverlaps(st: Tablet.Stats, lo: Any, hi: Any): Boolean = (lo, hi) match {
    case (a: Number, b: Number) =>
      !st.hasMinMax || (b.longValue() >= st.minLong && a.longValue() <= st.maxLong)
    case (a: String, b: String) =>
      !st.hasMinMax || {
        val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
        Tablet.compareBytes(bb, st.minBytes) >= 0 &&
          (st.maxBytes.length >= 64 || Tablet.compareBytes(ab, st.maxBytes) <= 0)
      }
    case _ => true
  }

  private def lookupInFile(file: String, column: String, value: Any,
      m: Metrics): Seq[Map[String, Any]] = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      val colId = keyIdx.getOrElse(column, return Nil)
      // TimestampMicroNano split probe column: stats scale to combined-value
      // bounds; blooms and the hash index (both built over MICROS values)
      // are unusable for an epoch-nanos probe and are suppressed
      val probeSplit = reader.nanosSplit(column)
      val idxId =
        if (probeSplit) -1 else keyIdx.getOrElse(Tablet.indexStreamKey(column), -1)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
      var s = 0
      while (s < footer.stripes.length) {
        val info = footer.stripes(s)
        val st0 = reader.streamStats(s, colId)
        val st = if (probeSplit) Tablet.nanosScaledStats(st0) else st0
        val bloom = if (probeSplit) None else reader.streamBloom(s, colId)
        val skip = !mightMatch(st, bloom, value)
        if (!skip) {
          m.stripesProbed += 1
          m.stripeRows += info.rowCount
          val hasIndex = idxId >= 0 && reader.streamLoc(s, idxId).length > 0
          if (hasIndex) lookupViaIndex(reader, s, idxId, colId, keyIdx, atomicFields, column, value, out, m)
          else lookupByScan(reader, s, colId, keyIdx, atomicFields, column, value, out, m)
        }
        s += 1
      }
      out.toSeq
    } finally reader.close()
  }

  /** Cursor over a column's LOGICAL values: recombines the TimestampMicroNano
    * split (micros * 1000 + remainder) when a '#nanos' sibling stream exists,
    * so lookups report and compare epoch-nanos like every other reader. */
  private final class ColCursor(main: Tablet.ChunkCursor, nanos: Tablet.ChunkCursor) {
    def hasNext: Boolean = main.hasNext
    def skip(): Unit = { main.skip(); if (nanos != null) nanos.skip() }
    def next(): Column = {
      val c = main.next()
      if (nanos == null) c
      else {
        val mc = c.asInstanceOf[LongsCol]
        val rc = nanos.next().asInstanceOf[LongsCol]
        val out = new Array[Long](mc.len)
        var i = 0
        while (i < out.length) { out(i) = mc.values(i) * 1000L + rc.values(i); i += 1 }
        LongsCol(out, mc.phys, mc.nulls)
      }
    }

    /** Bounded decode for point materialization: rows [from, until) suffice.
      * Split-timestamp columns keep the whole-chunk path (two sub-streams
      * with independent seek grids aren't worth aligning for a point read). */
    def nextRange(from: Int, until: Int): (Column, Int) =
      if (nanos == null) main.nextRange(from, until)
      else (next(), 0)

    /** Positional decode of EXACTLY `pos` (strictly increasing) — r15: an
      * indexed lookup materializes only the verified hit rows instead of a
      * [min, max] window that decodes the whole chunk under most codecs
      * (strings included, via the bytes point readers; r17: shared-dict too,
      * via the index sub-stream — [[Tablet.ChunkCursor.nextAtLookup]]).
      * Declines (null, chunk untouched) when the codec admits no positional
      * decode or the column is timestamp-split — caller falls back to
      * [[nextRange]]. */
    def nextAt(pos: Array[Int]): Column =
      if (nanos == null) main.nextAtLookup(pos) else null
  }

  private def colCursor(reader: Tablet.Reader, s: Int, keyIdx: Map[String, Int],
      name: String): ColCursor =
    new ColCursor(
      new Tablet.ChunkCursor(reader.readStreamBytes(s, keyIdx(name))),
      keyIdx.get(name + "#nanos")
        .map(id => new Tablet.ChunkCursor(reader.readStreamBytes(s, id))).orNull)

  /** Index probe: binary-search the stripe's sorted (hash, position) table,
    * then decode ONLY the chunks holding candidate positions — the key chunk
    * to verify equality (hash collisions), the sibling chunks to materialize
    * the row. O(log n) probe + O(chunk) decode per hit, vs O(stripe rows). */
  private def lookupViaIndex(reader: Tablet.Reader, s: Int, idxId: Int, colId: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField], column: String, value: Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    m.indexProbes += 1
    val h = value match {
      case str: String => val b = str.getBytes("UTF-8"); Tablet.hashBytesValue(b, 0, b.length)
      case n: Number => Tablet.hashLongValue(n.longValue())
      case _ => // unindexable probe type: full scan of the stripe
        lookupByScan(reader, s, colId, keyIdx, atomicFields, column, value, out, m); return
    }
    val idx = new ByteCursor(reader.readStreamBytes(s, idxId))
    val count = idx.readInt()
    val hashBase = idx.pos
    def hashAt(i: Int): Long = { idx.pos = hashBase + 8 * i; idx.readLong() }
    def posAt(i: Int): Long = { idx.pos = hashBase + 8 * count + 8 * i; idx.readLong() }
    // lower bound of h in the sorted hash run
    var lo = 0; var hi = count
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashAt(mid) < h) lo = mid + 1 else hi = mid
    }
    // candidate (chunk, row) positions, already position-sorted within a hash
    val cand = scala.collection.mutable.ArrayBuffer[Long]()
    var i = lo
    while (i < count && hashAt(i) == h) { cand += posAt(i); i += 1 }
    if (cand.isEmpty) return
    val byChunk: Map[Int, Seq[Int]] = cand.groupBy(p => (p >>> 32).toInt)
      .map { case (c, ps) => c -> ps.map(p => (p & 0xffffffffL).toInt).toSeq }
    // verify candidates against the real key (collisions) chunk by chunk
    // (the probe column is never nanos-split here — split probes take the
    // scan path — but sibling columns may be)
    val keyCur = new Tablet.ChunkCursor(reader.readStreamBytes(s, colId))
    val verified = scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]()
    var ord = 0
    var remaining = byChunk.size
    while (keyCur.hasNext && remaining > 0) {
      byChunk.get(ord) match {
        case Some(rows) =>
          // r15: verify at the candidate POSITIONS when the codec seeks —
          // the range decode materialized [min, max] (the whole chunk for
          // most codecs) to test a handful of hash candidates
          val pos = rows.distinct.sorted.toArray
          val fast = keyCur.nextAtLookup(pos)
          val ok =
            if (fast != null) {
              m.rowsDecoded += fast.len
              pos.toIndexedSeq.zipWithIndex.collect {
                case (r, j) if rowMatches(fast, j, value) => r
              }
            } else {
              val (keyCol, start) = keyCur.nextRange(rows.min, rows.max + 1)
              m.rowsDecoded += keyCol.len
              rows.filter(r => rowMatches(keyCol, r - start, value)).toSeq
            }
          if (ok.nonEmpty) verified(ord) = ok
          remaining -= 1
        case None => keyCur.skip()
      }
      ord += 1
    }
    if (verified.isEmpty) return
    materializeVerified(reader, s, keyIdx, atomicFields, column, verified,
      (_, _) => value, out, m)
  }

  /** Materialize sibling columns for verified (chunk -> rows) hits only,
    * skipping every other chunk. `keyValue(chunk, row)` supplies the probe
    * column's value (the probed constant for point lookups, the decoded
    * value for range probes). */
  private def materializeVerified(reader: Tablet.Reader, s: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField], column: String,
      verified: scala.collection.mutable.LinkedHashMap[Int, Seq[Int]],
      keyValue: (Int, Int) => Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    val others = atomicFields.filter(_.name != column).map { f =>
      f.name -> colCursor(reader, s, keyIdx, f.name)
    }
    val rowsOut = scala.collection.mutable.LinkedHashMap[(Int, Int), scala.collection.mutable.LinkedHashMap[String, Any]]()
    for ((chunk, rows) <- verified; r <- rows)
      rowsOut((chunk, r)) = scala.collection.mutable.LinkedHashMap[String, Any](column -> keyValue(chunk, r))
    for ((name, cur) <- others) {
      var ord = 0
      var left = verified.size
      while (cur.hasNext && left > 0) {
        verified.get(ord) match {
          case Some(rows) =>
            // r15: materialize the verified rows POSITIONALLY when the
            // codec seeks (strings included); range-window otherwise
            val pos = rows.distinct.sorted.toArray
            val fast = cur.nextAt(pos)
            if (fast != null) {
              m.rowsDecoded += fast.len
              var j = 0
              while (j < pos.length) {
                rowsOut((ord, pos(j)))(name) = valueAt(fast, j)
                j += 1
              }
            } else {
              val (c, start) = cur.nextRange(rows.min, rows.max + 1)
              m.rowsDecoded += c.len
              for (r <- rows) rowsOut((ord, r))(name) = valueAt(c, r - start)
            }
            left -= 1
          case None => cur.skip()
        }
        ord += 1
      }
    }
    rowsOut.values.foreach(r => out += r.toMap)
  }

  /** Fallback scan: decode the whole key column of the stripe. */
  private def lookupByScan(reader: Tablet.Reader, s: Int, colId: Int,
      keyIdx: Map[String, Int], atomicFields: Array[StructField], column: String, value: Any,
      out: scala.collection.mutable.ArrayBuffer[Map[String, Any]], m: Metrics): Unit = {
    val keyCur = colCursor(reader, s, keyIdx, column)
    val others = atomicFields.filter(_.name != column).map { f =>
      f.name -> colCursor(reader, s, keyIdx, f.name)
    }
    while (keyCur.hasNext) {
      val keyCol = keyCur.next()
      m.rowsDecoded += keyCol.len
      val matches = matchRows(keyCol, value)
      if (matches.isEmpty) {
        others.foreach(_._2.skip())
      } else {
        val cols = others.map { case (n, cur) => n -> cur.next() }
        for ((_, c) <- cols) m.rowsDecoded += c.len
        for (r <- matches) {
          val row = scala.collection.mutable.LinkedHashMap[String, Any](column -> value)
          for ((n, c) <- cols) row(n) = valueAt(c, r)
          out += row.toMap
        }
      }
    }
  }

  /** Does row `i` of `col` equal `value`? The single equality definition the
    * index-verify and scan paths both use — they must never diverge. */
  private def rowMatches(col: Column, i: Int, value: Any): Boolean = (col, value) match {
    case (c: LongsCol, n: Number) =>
      (c.nulls == null || !c.nulls(i)) && c.values(i) == n.longValue()
    case (c: BytesCol, str: String) =>
      val b = str.getBytes("UTF-8")
      (c.nulls == null || !c.nulls(i)) &&
        c.offsets(i + 1) - c.offsets(i) == b.length && {
          var k = 0; var eq = true
          while (k < b.length && eq) { eq = c.bytes(c.offsets(i) + k) == b(k); k += 1 }
          eq
        }
    case _ => false
  }

  private def mightMatch(st: Tablet.Stats, bloom: Option[Tablet.Bloom], value: Any): Boolean = {
    value match {
      case s: String =>
        val b = s.getBytes("UTF-8")
        val inRange = !st.hasMinMax || (Tablet.compareBytes(b, st.minBytes) >= 0 &&
          (st.maxBytes.length >= 64 || Tablet.compareBytes(b, st.maxBytes) <= 0))
        inRange && bloom.forall(_.mightContain(Tablet.hashBytesValue(b, 0, b.length)))
      case n: Number =>
        val v = n.longValue()
        val inRange = !st.hasMinMax || (v >= st.minLong && v <= st.maxLong)
        inRange && bloom.forall(_.mightContain(Tablet.hashLongValue(v)))
      case _ => true
    }
  }

  private def matchRows(col: Column, value: Any): Seq[Int] =
    (0 until col.len).filter(i => rowMatches(col, i, value))

  private def valueAt(col: Column, i: Int): Any = col match {
    case c: LongsCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: DoublesCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: BoolsCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: BytesCol => if (c.nulls != null && c.nulls(i)) null else new String(c(i), "UTF-8")
  }
}
