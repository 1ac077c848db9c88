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

  /** All rows where `column == value` across the tablet files under `path`.
    * Returns (columnName -> value) maps, one per matching row. */
  def pointLookup(path: String, column: String, value: Any): Seq[Map[String, Any]] = {
    GraftIO.listGft(path).map(_.path).flatMap(lookupInFile(_, column, value))
  }

  private def lookupInFile(file: String, column: String, value: Any): Seq[Map[String, Any]] = {
    val reader = new Tablet.Reader(file)
    try {
      val footer = reader.footer
      val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
      val keyIdx = footer.streamKeys.zipWithIndex.toMap
      val colId = keyIdx.getOrElse(column, return Nil)
      val atomicFields = schema.fields.filter(f => keyIdx.contains(f.name))
      val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
      var s = 0
      while (s < footer.stripes.length) {
        val info = footer.stripes(s)
        val st = info.stats(colId)
        val skip = !mightMatch(st, info.blooms.get(colId), value)
        if (!skip) {
          // decode the key column; collect matching row ordinals per chunk
          val keyCur = new Tablet.ChunkCursor(reader.readStreamBytes(s, colId))
          val others = atomicFields.filter(_.name != column).map { f =>
            f.name -> new Tablet.ChunkCursor(reader.readStreamBytes(s, keyIdx(f.name)))
          }
          while (keyCur.hasNext) {
            val keyCol = keyCur.next()
            val matches = matchRows(keyCol, value)
            if (matches.isEmpty) {
              others.foreach(_._2.skip())
            } else {
              val cols = others.map { case (n, cur) => n -> cur.next() }
              for (r <- matches) {
                val row = scala.collection.mutable.LinkedHashMap[String, Any](column -> value)
                for ((n, c) <- cols) row(n) = valueAt(c, r)
                out += row.toMap
              }
            }
          }
        }
        s += 1
      }
      out.toSeq
    } finally reader.close()
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

  private def matchRows(col: Column, value: Any): Seq[Int] = (col, value) match {
    case (c: LongsCol, n: Number) =>
      val v = n.longValue()
      (0 until c.len).filter(i => (c.nulls == null || !c.nulls(i)) && c.values(i) == v)
    case (c: BytesCol, s: String) =>
      val b = s.getBytes("UTF-8")
      (0 until c.len).filter { i =>
        (c.nulls == null || !c.nulls(i)) &&
          c.offsets(i + 1) - c.offsets(i) == b.length && {
            var k = 0; var eq = true
            while (k < b.length && eq) { eq = c.bytes(c.offsets(i) + k) == b(k); k += 1 }
            eq
          }
      }
    case _ => Nil
  }

  private def valueAt(col: Column, i: Int): Any = col match {
    case c: LongsCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: DoublesCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: BoolsCol => if (c.nulls != null && c.nulls(i)) null else c.values(i)
    case c: BytesCol => if (c.nulls != null && c.nulls(i)) null else new String(c(i), "UTF-8")
  }
}
