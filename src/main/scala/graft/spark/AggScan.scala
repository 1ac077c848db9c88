package graft.spark

import graft.format.{Fields, GraftIO, Tablet}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mid-scan filtered aggregation (ValueHook proper — reference:
  * velox/selective/ColumnLoader.h:42,
  * docs/develop/nimble_selective_reader.rst:756-769).
  *
  * The driver classifies every stripe against the pushed filters:
  * none-match stripes drop, all-match stripes answer from footer stats
  * (O(metadata), as before), and MIXED stripes — where stats alone cannot
  * answer — now run a dedicated scan that aggregates DURING decode: filter
  * columns decode and build a selection, then survivors feed the
  * COUNT/MIN/MAX accumulator directly. Aggregate-only columns never fill an
  * output vector, and chunks the per-chunk stats fully classify never decode
  * at all. Each task emits ONE partial row; Spark's final aggregation merges
  * partials exactly as it merges the stats partials.
  *
  * Exactness is preserved everywhere: values folded from decode are exact by
  * construction (NaN ordering matches Spark's NaN-greatest, string compare
  * is binary), and a file whose all-match stripes can't answer from stats
  * (possible NaN, truncated 64-byte string bounds) degrades those stripes to
  * the decode path instead of refusing the pushdown.
  */
object AggScan {

  /** Chunks inside mixed stripes fully answered by chunk stats (no decode). */
  val aggChunksStatsAnswered = new java.util.concurrent.atomic.AtomicLong()
  /** Chunks inside mixed stripes that decoded at least the filter columns. */
  val aggChunksDecoded = new java.util.concurrent.atomic.AtomicLong()

  // -------------------------------------------------------- serializable ops
  sealed trait AggOp extends Serializable { def col: String }
  final case class CountStarOp() extends AggOp { def col: String = null }
  final case class CountOp(col: String, dt: DataType) extends AggOp
  final case class MinOp(col: String, dt: DataType) extends AggOp
  final case class MaxOp(col: String, dt: DataType) extends AggOp
  /** SUM fold (dt = the CHILD column type). Decode-fold only — footer stats
    * carry no sums, so a SumOp degrades every stripe to the decode path.
    * Spark's partial-aggregate pushdown re-applies Sum over the scan output
    * CAST BACK to the child type, so integral sums are only accepted when
    * the plan-time stats bound proves every partial fits the child range
    * (see [[sumBoundOk]]); float children are refused outright (the
    * double->float cast would round partials Spark's own execution keeps
    * in a double buffer). */
  final case class SumOp(col: String, dt: DataType) extends AggOp

  private def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference
        if n.fieldNames().length == 1 => Some(n.fieldNames()(0))
      case _ => None
    }

  /** Resolve a NamedReference — possibly a multi-part struct path — to
    * (dotted name, leaf type). The dotted path IS the leaf's stream key,
    * and struct children pad null entries under null ancestors
    * (Fields.StructW.addNull), so the leaf stream is row-aligned: its
    * stats, null counts and decoded values mirror Spark's field extraction
    * exactly — the same contract nested predicate pruning rides. Array/map
    * intermediates and quotable (dotted/backticked) component names refuse. */
  private[spark] def resolveLeaf(e: org.apache.spark.sql.connector.expressions.Expression,
      schema: StructType): Option[(String, DataType)] = e match {
    case n: org.apache.spark.sql.connector.expressions.NamedReference =>
      val parts = n.fieldNames()
      if (parts.isEmpty || parts.exists(p => p.contains('.') || p.contains('`'))) return None
      var dt: DataType = null
      var cur: StructType = schema
      var i = 0
      while (i < parts.length) {
        val f = cur.fields.find(_.name == parts(i)).getOrElse(return None)
        dt = f.dataType
        if (i < parts.length - 1) dt match {
          case s: StructType => cur = s
          case _ => return None
        }
        i += 1
      }
      Some((parts.mkString("."), dt))
    case _ => None
  }

  /** Leaf type of a (possibly dotted) column path — the read-side pair of
    * [[resolveLeaf]] for ops that already carry the dotted name. A top-level
    * field whose NAME contains a literal dot wins over dotted-path
    * traversal (mirrors Spark's own resolution order). */
  private[spark] def fieldTypeOf(schema: StructType, path: String): DataType = {
    schema.fields.find(_.name == path) match {
      case Some(f) => return f.dataType
      case None => ()
    }
    var cur: StructType = schema
    val parts = path.split('.')
    var i = 0
    var dt: DataType = null
    while (i < parts.length) {
      val f = cur.fields.find(_.name == parts(i)).getOrElse(
        throw new IllegalStateException(s"nimble: unresolved agg column path $path"))
      dt = f.dataType
      if (i < parts.length - 1) cur = dt.asInstanceOf[StructType]
      i += 1
    }
    dt
  }

  /** Min/Max value domain the exact fold supports (same set statValue can
    * emit; decimals/booleans/nested refuse — Spark falls back). */
  private def minMaxOk(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | DateType | LongType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _ => false
  }
  private def atomic(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  }

  /** SUM child domain: integrals (long fold, plan-time overflow bound) and
    * doubles (double fold, saturates like Spark's own). FloatType refused —
    * Spark casts the pushed partial back to float, rounding what its own
    * execution keeps in a double buffer. Decimals refuse as everywhere. */
  private def sumOk(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType => true
    case _ => false
  }

  /** A pushed GROUP BY column (the scan emits it ahead of the agg partials —
    * Spark's partial pushdown zips group attributes first). Restricted to
    * string/binary columns: those are the dict-encodable, low-cardinality
    * shape where the per-group fold wins (id-indexed accumulators, no
    * per-row hash); numeric group-bys fall back to the vectorized scan +
    * Spark's codegen'd hash aggregate, which is already the right plan. */
  final case class GroupCol(name: String, dt: DataType) extends Serializable

  /** Shape gate incl. GROUP BY: (group columns, agg ops), or None. Group
    * keys may be nested struct-leaf paths too (same row-alignment contract
    * as the aggregate columns). */
  def groupedOpsOf(agg: Aggregation, schema: StructType): Option[(Array[GroupCol], Array[AggOp])] = {
    val groups: Array[GroupCol] = agg.groupByExpressions().map { e =>
      val (n, dt) = resolveLeaf(e, schema).getOrElse(return None)
      dt match {
        case StringType | BinaryType => GroupCol(n, dt)
        case _ => return None
      }
    }
    if (groups.length > 2) return None // composite-id fast path covers 2
    opsOf(agg, schema).map(ops => (groups, ops))
  }

  /** Shape gate: the supported AggOp list, or None (group-by agnostic).
    * Columns may be nested struct-leaf paths ([[resolveLeaf]]): min(st.a)
    * answers from the leaf stream's stats/values like any top-level column. */
  def opsOf(agg: Aggregation, schema: StructType): Option[Array[AggOp]] = {
    val ops: Array[AggOp] = agg.aggregateExpressions().map {
      case _: CountStar => CountStarOp()
      case c: Count if !c.isDistinct =>
        val (n, dt) = resolveLeaf(c.column(), schema).getOrElse(return None)
        if (!atomic(dt)) return None
        CountOp(n, dt)
      case m: Min =>
        val (n, dt) = resolveLeaf(m.column(), schema).getOrElse(return None)
        if (!minMaxOk(dt)) return None
        MinOp(n, dt)
      case m: Max =>
        val (n, dt) = resolveLeaf(m.column(), schema).getOrElse(return None)
        if (!minMaxOk(dt)) return None
        MaxOp(n, dt)
      case s: Sum if !s.isDistinct =>
        val (n, dt) = resolveLeaf(s.column(), schema).getOrElse(return None)
        if (!sumOk(dt)) return None
        SumOp(n, dt)
      case _ => return None
    }
    Some(ops)
  }

  /** Plan-time overflow fence for integral SUMs: `sum |x|` over every file is
    * bounded by `max(|min|,|max|) * nonNullCount` from footer stats; the
    * pushdown is accepted only when that bound fits the CHILD type's range,
    * because Spark casts each partial back to the child type before the
    * final merge (a wrapped cast would be silently wrong — Spark's own
    * partial buffers are longs and never narrow). Conservative: refusal just
    * means the normal scan + Spark aggregation runs. Accumulated inside
    * [[plan]]'s per-file loop (one Reader per file), checked at the end. */
  private final class SumBound(ops: Array[AggOp]) {
    private val intSums = ops.collect { case SumOp(c, dt) if dt != DoubleType => (c, dt) }
    private val bounds = scala.collection.mutable.HashMap[String, BigInt]().withDefaultValue(BigInt(0))
    private var refused = false
    def accumulate(r: Tablet.Reader): Unit =
      for ((c, _) <- intSums if !refused) r.fileStatsOf(c) match {
        case Some(st) =>
          if (st.hasMinMax) {
            val maxAbs = BigInt(st.minLong).abs.max(BigInt(st.maxLong).abs)
            bounds(c) += maxAbs * (st.valueCount - st.nullCount)
          } else if (st.valueCount > st.nullCount) {
            // non-null values but no min/max bounds: a writer that emits
            // counts without bounds gives no proof the cast can't wrap —
            // refuse explicitly rather than treating the file as adding 0
            refused = true
          } // all-null file: genuinely contributes 0 to the sum bound
        case None => refused = true // no stats: no proof the cast can't wrap
      }
    def ok: Boolean = !refused && intSums.forall { case (c, dt) =>
      val lim: BigInt = dt match {
        case ByteType => BigInt(Byte.MaxValue)
        case ShortType => BigInt(Short.MaxValue)
        case IntegerType => BigInt(Int.MaxValue)
        case _ => BigInt(Long.MaxValue)
      }
      bounds(c) <= lim
    }
  }

  /** Classify every stripe of every file. Returns (stats partial rows,
    * mixed stripes with byte sizes), or None when the pushdown must be
    * refused outright (unsupported shape, aggregate column missing from a
    * file, nanos-split aggregate column). With group columns, footer stats
    * cannot answer per group, so every surviving stripe goes to the decode
    * fold and the stats-partials seq is always empty. */
  def plan(ops: Array[AggOp], schema: StructType, files: Seq[String],
      filters: Array[Filter], groupCols: Array[GroupCol] = Array.empty)
      : Option[(Seq[InternalRow], Seq[(NimbleStripePartition, Long)])] = {
    val neededCols = (ops.flatMap(o => Option(o.col)) ++ groupCols.map(_.name)).distinct
    NimbleSource.prefetchFooters(files)
    val sumBound = new SumBound(ops)
    val partials = scala.collection.mutable.ArrayBuffer[InternalRow]()
    val mixed = scala.collection.mutable.ArrayBuffer[(NimbleStripePartition, Long)]()
    for (f <- files) {
      val footer = NimbleSource.footerOf(f)
      val r = new Tablet.Reader(f, footer)
      try {
        // aggregate columns must be present and directly stats-backed; a
        // nanos-split column's micros stats are not the logical value and
        // its decode shape differs — refuse (same contract as before)
        if (neededCols.exists(n => r.keyId(n) < 0 || r.nanosSplit(n))) return None
        sumBound.accumulate(r)
        var rowsMatched = 0L
        val acc = scala.collection.mutable.HashMap[String, Tablet.Stats]()
        val allMatchIdx = scala.collection.mutable.ArrayBuffer[Int]()
        val mixedIdx = scala.collection.mutable.ArrayBuffer[Int]()
        var s = 0
        while (s < footer.stripes.length) {
          val statsOf: String => Option[Tablet.Stats] =
            name => Some(r.keyId(name)).filter(_ >= 0).map { id =>
              val st = r.streamStats(s, id)
              if (r.keyId(name + "#nanos") >= 0) Tablet.nanosScaledStats(st) else st
            }
          val bloomOf: String => Option[Tablet.Bloom] =
            name => Some(r.keyId(name)).filter(_ >= 0)
              .filterNot(_ => r.keyId(name + "#nanos") >= 0)
              .flatMap(id => r.streamBloom(s, id))
          if (filters.forall(f2 => Filters.allMatchStripe(f2, statsOf))) {
            rowsMatched += footer.stripes(s).rowCount
            allMatchIdx += s
            for (n <- neededCols)
              acc.getOrElseUpdate(n, Tablet.Stats()).merge(r.streamStats(s, r.keyId(n)))
          } else if (!filters.exists(f2 => Filters.pruneStripe(f2, statsOf, bloomOf))) {
            mixedIdx += s
          }
          s += 1
        }
        // stats partial for the all-match set; if any op can't answer exactly
        // from the accumulated stats (or the fold is grouped — no per-group
        // stats exist), degrade the WHOLE all-match set of this file to the
        // decode path — exact either way
        if (allMatchIdx.nonEmpty) {
          (if (groupCols.nonEmpty) None
           else statsPartialRow(ops, schema, rowsMatched, acc)) match {
            case Some(row) => partials += row
            case None => mixedIdx ++= allMatchIdx
          }
        }
        for (s2 <- mixedIdx.sorted)
          mixed += ((NimbleStripePartition(f, s2), footer.stripes(s2).length))
      } finally r.close()
    }
    if (!sumBound.ok) return None
    if (!groupColsDictBacked(groupCols, mixed.toSeq)) return None
    Some((partials.toSeq, mixed.toSeq))
  }

  /** Cardinality gate for grouped pushdowns: sample the first mixed stripe
    * and require every group column's first chunk to decode
    * dictionary-preserved. Footer stats carry no NDV, but the encoding
    * selection already answered the question — a high-cardinality string
    * column loses dictionary selection, and pushing its GROUP BY into the
    * generic per-row hash fold would regress against Spark's codegen'd
    * aggregate. Sampling one stripe is a heuristic for acceptance only;
    * execution stays correct either way (flat chunks use the hash fold). */
  private def groupColsDictBacked(groupCols: Array[GroupCol],
      mixed: Seq[(NimbleStripePartition, Long)]): Boolean = {
    if (groupCols.isEmpty || mixed.isEmpty) return true
    val sp = mixed.head._1
    val r = new Tablet.Reader(sp.file, NimbleSource.footerOf(sp.file))
    try groupCols.forall { gc =>
      val cur = new Tablet.ChunkCursor(r.readStreamBytes(sp.stripe, r.keyId(gc.name)))
      !cur.hasNext || (cur.nextDict() match {
        case _: graft.format.DictBytesCol => true
        case _ => false
      })
    } finally r.close()
  }

  private def statsPartialRow(ops: Array[AggOp], schema: StructType, rowsMatched: Long,
      acc: scala.collection.mutable.HashMap[String, Tablet.Stats]): Option[InternalRow] = {
    val values: Array[Any] = ops.map {
      case CountStarOp() => java.lang.Long.valueOf(rowsMatched): Any
      case CountOp(c, _) =>
        val st = acc.getOrElse(c, Tablet.Stats())
        java.lang.Long.valueOf(st.valueCount - st.nullCount): Any
      case MinOp(c, dt) =>
        AggPushdown.statValue(acc.getOrElse(c, Tablet.Stats()), dt, isMin = true)
          .getOrElse(return None)
      case MaxOp(c, dt) =>
        AggPushdown.statValue(acc.getOrElse(c, Tablet.Stats()), dt, isMin = false)
          .getOrElse(return None)
      case SumOp(_, _) =>
        // footer stats carry no sums: degrade this file's all-match set to
        // the decode fold (exact either way)
        return None
    }
    Some(new GenericInternalRow(values))
  }
}

// ---------------------------------------------------------------- the scan

/** Distributed filtered-aggregate scan: one synthetic partition carries the
  * driver's stats partials; mixed stripes bin-pack into tasks exactly like
  * the normal scan (same split-target formula), each emitting one partial
  * row folded during decode. */
class NimbleAggBatchScan(path: String, dataSchema: StructType, out: StructType,
    ops: Array[AggScan.AggOp], filters: Array[Filter],
    statsPartials: Seq[InternalRow], mixed: Seq[(NimbleStripePartition, Long)],
    groupCols: Array[AggScan.GroupCol] = Array.empty)
    extends Scan with Batch {

  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String =
    s"nimble mid-scan-agg path=$path (${statsPartials.length} stats partials, " +
      s"${mixed.length} mixed stripes" +
      (if (groupCols.isEmpty) ")" else s", groupBy=${groupCols.map(_.name).mkString(",")})")

  /** Spark-UI counters for the mid-scan fold: how many chunks answered from
    * chunk stats alone vs decoded — the skipped-decode number an operator
    * tuning a 100 TB filtered aggregate reads off the SQL node. */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new AggChunksStatsAnsweredMetric, new AggChunksDecodedMetric)

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = scala.collection.mutable.ArrayBuffer[InputPartition]()
    if (statsPartials.nonEmpty)
      parts += NimbleAggStatsPartition(statsPartials.toArray)
    // bin-pack mixed stripes with the normal scan's split-target formula so
    // parallelism matches what the fallback scan would have had
    val (maxPartBytes, minPartBytes, parallelism) = {
      try {
        val s = org.apache.spark.sql.SparkSession.active
        (s.conf.get("spark.sql.files.maxPartitionBytes", "134217728").toLong,
          s.conf.get("spark.graft.scan.minPartitionBytes", "2097152").toLong,
          s.sparkContext.defaultParallelism)
      } catch { case _: Throwable => (134217728L, 2097152L, 8) }
    }
    val totalBytes = mixed.iterator.map(_._2).sum
    val target = math.min(maxPartBytes,
      math.max(minPartBytes, totalBytes / math.max(parallelism, 1) + 1))
    val bin = scala.collection.mutable.ArrayBuffer[NimbleStripePartition]()
    var binBytes = 0L
    for ((sp, bytes) <- mixed) {
      if (binBytes > 0 && binBytes + bytes > target) {
        parts += NimbleAggStripesPartition(bin.toArray); bin.clear(); binBytes = 0
      }
      bin += sp; binBytes += bytes
    }
    if (bin.nonEmpty) parts += NimbleAggStripesPartition(bin.toArray)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NimbleAggReaderFactory(dataSchema, ops, filters, GraftIO.broadcastConf(), groupCols)
}

case class NimbleAggStatsPartition(rows: Array[InternalRow]) extends InputPartition
case class NimbleAggStripesPartition(items: Array[NimbleStripePartition]) extends InputPartition

/** Zero-arg-constructible (Spark's UI listener re-instantiates the class
  * reflectively to aggregate task values — see StripesReadMetric). */
private[spark] class AggChunksStatsAnsweredMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "aggChunksStatsAnswered"
  override def description(): String = "agg chunks answered from chunk stats (no decode)"
}
private[spark] class AggChunksDecodedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "aggChunksDecoded"
  override def description(): String = "agg chunks decoded into the fold"
}

class NimbleAggReaderFactory(dataSchema: StructType, ops: Array[AggScan.AggOp],
    filters: Array[Filter],
    hadoopConf: org.apache.spark.broadcast.Broadcast[GraftIO.SerializableConf],
    groupCols: Array[AggScan.GroupCol] = Array.empty)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    GraftIO.installConf(hadoopConf)
    partition match {
      case NimbleAggStatsPartition(rows) => new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
      case NimbleAggStripesPartition(items) =>
        new NimbleAggStripeReader(items, dataSchema, ops, filters, groupCols)
    }
  }
}

/** Folds COUNT/MIN/MAX/SUM over the surviving rows of a set of mixed
  * stripes — one partial row per task, or one partial row per (task, group)
  * when GROUP BY columns are pushed. Filter columns decode exactly as in the
  * normal selective scan (dict-preserving strings, chunk-stats + index chunk
  * skipping); aggregate-only columns decode raw and feed the accumulator —
  * no output vectors exist at all. Grouped folds key dict-preserved chunks
  * by composite dictionary id into array slots (no per-row hashing); chunks
  * that decode flat fall back to a hash map keyed by the group values. The
  * group map flushes to the output buffer past 64Ki entries — partial rows
  * are mergeable, so cardinality never grows memory unboundedly. */
class NimbleAggStripeReader(items: Array[NimbleStripePartition], dataSchema: StructType,
    ops: Array[AggScan.AggOp], filters: Array[Filter],
    groupCols: Array[AggScan.GroupCol] = Array.empty)
    extends PartitionReader[InternalRow] {
  import AggScan._

  private var taskChunksStatsAnswered = 0L
  private var taskChunksDecoded = 0L
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      NimbleTaskMetric("aggChunksStatsAnswered", taskChunksStatsAnswered),
      NimbleTaskMetric("aggChunksDecoded", taskChunksDecoded))

  private val aggCols: Array[String] = ops.flatMap(o => Option(o.col)).distinct
  /** Leaf type of a (possibly dotted struct-path) column — resolved once
    * per reader (the schema is immutable; this sits in per-chunk loops). */
  private val typeCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.DataType]()
  private def typeOf(n: String): org.apache.spark.sql.types.DataType =
    typeCache.computeIfAbsent(n, nn => AggScan.fieldTypeOf(dataSchema, nn))
  private val grouped = groupCols.nonEmpty
  private val groupNames: Array[String] = groupCols.map(_.name)
  /** Columns whose streams must load: aggregate inputs plus group keys. */
  private val fetchCols: Array[String] = (aggCols ++ groupNames).distinct
  /** The ungrouped single partial is just the accumulator of the one
    * implicit group. */
  private val acc0 = new GroupAccs

  /** Per-(group, op) accumulator slots. */
  private final class GroupAccs {
    var countStar = 0L
    val counts = new Array[Long](ops.length)
    val present = new Array[Boolean](ops.length)
    val longs = new Array[Long](ops.length)
    val dbls = new Array[Double](ops.length)
    val byts = new Array[Array[Byte]](ops.length)
    def foldLong(i: Int, isMin: Boolean, v: Long): Unit =
      if (!present(i)) { present(i) = true; longs(i) = v }
      else if (isMin == (v < longs(i)) && v != longs(i)) longs(i) = v
    def foldDouble(i: Int, isMin: Boolean, v: Double): Unit =
      if (!present(i)) { present(i) = true; dbls(i) = v }
      else {
        val c = java.lang.Double.compare(v, dbls(i))
        if (if (isMin) c < 0 else c > 0) dbls(i) = v
      }
    def foldBytes(i: Int, isMin: Boolean, v: Array[Byte]): Unit =
      if (!present(i)) { present(i) = true; byts(i) = v }
      else {
        val c = Tablet.compareBytes(v, byts(i))
        if (if (isMin) c < 0 else c > 0) byts(i) = v
      }
  }
  /** Group key (catalyst values: UTF8String / null) -> accumulators.
    * LinkedHashMap for deterministic partial order. */
  private val groups = new java.util.LinkedHashMap[Vector[Any], GroupAccs]()
  private val mkAccs = new java.util.function.Function[Vector[Any], GroupAccs] {
    def apply(k: Vector[Any]): GroupAccs = new GroupAccs
  }

  private val outBuf = scala.collection.mutable.ArrayBuffer[InternalRow]()
  private var pos = -1
  private var itemIdx = 0
  private var finished = false

  private def bytesAt(col: graft.format.Column, row: Int): Array[Byte] = col match {
    case b: graft.format.BytesCol => b(row)
    case d: graft.format.DictBytesCol => d.alphabet(d.indices(row))
    case l: graft.format.LazyFsstBytesCol =>
      val out = new graft.format.ByteSink(); l.decodeRow(row, out); out.toArray
    case other => throw new IllegalStateException(s"nimble: agg fold over ${other.getClass}")
  }

  /** Fold op `i` over the selected rows of a decoded column (selection null
    * = every row). */
  private def foldColumn(i: Int, op: AggOp, col: graft.format.Column,
      selection: Array[Int], chunkRows: Int): Unit = {
    val nulls = col.nulls
    val m = if (selection != null) selection.length else chunkRows
    op match {
      case CountOp(_, _) =>
        var k = 0
        while (k < m) {
          val row = if (selection != null) selection(k) else k
          if (nulls == null || !nulls(row)) acc0.counts(i) += 1
          k += 1
        }
      case MinOp(_, dt) => foldMinMax(i, isMin = true, dt, col, selection, chunkRows)
      case MaxOp(_, dt) => foldMinMax(i, isMin = false, dt, col, selection, chunkRows)
      case SumOp(_, _) => foldSum(i, col, selection, chunkRows)
      case CountStarOp() => ()
    }
  }

  /** SUM over the selected rows: integrals accumulate in longs(i) (the
    * plan-time stats bound proved no overflow), doubles in dbls(i)
    * (saturating, same as Spark's double sum buffer). present(i) tracks
    * "saw a non-null value" so an all-null partial emits null. */
  private def foldSum(i: Int, col: graft.format.Column,
      selection: Array[Int], chunkRows: Int): Unit = {
    val nulls = col.nulls
    val m = if (selection != null) selection.length else chunkRows
    var k = 0
    col match {
      case l: graft.format.LongsCol =>
        while (k < m) {
          val row = if (selection != null) selection(k) else k
          if (nulls == null || !nulls(row)) { acc0.present(i) = true; acc0.longs(i) += l.values(row) }
          k += 1
        }
      case d: graft.format.DoublesCol =>
        while (k < m) {
          val row = if (selection != null) selection(k) else k
          if (nulls == null || !nulls(row)) { acc0.present(i) = true; acc0.dbls(i) += d.values(row) }
          k += 1
        }
      case other => throw new IllegalStateException(s"nimble: sum fold over ${other.getClass}")
    }
  }

  private def foldMinMax(i: Int, isMin: Boolean, dt: DataType, col: graft.format.Column,
      selection: Array[Int], chunkRows: Int): Unit = {
    val nulls = col.nulls
    val m = if (selection != null) selection.length else chunkRows
    var k = 0
    while (k < m) {
      val row = if (selection != null) selection(k) else k
      if (nulls == null || !nulls(row)) col match {
        case l: graft.format.LongsCol => acc0.foldLong(i, isMin, l.values(row))
        case d: graft.format.DoublesCol => acc0.foldDouble(i, isMin, d.values(row))
        case _ => acc0.foldBytes(i, isMin, bytesAt(col, row))
      }
      k += 1
    }
  }

  /** Fold a whole chunk from its stats; caller verified answerability. */
  private def foldChunkStats(chunkRows: Long,
      statsOf: String => Option[Tablet.Stats]): Unit = {
    acc0.countStar += chunkRows
    var i = 0
    while (i < ops.length) {
      ops(i) match {
        case CountOp(c, _) =>
          val st = statsOf(c).get
          acc0.counts(i) += st.valueCount - st.nullCount
        case MinOp(c, dt) => foldStatsValue(i, isMin = true, dt, statsOf(c).get)
        case MaxOp(c, dt) => foldStatsValue(i, isMin = false, dt, statsOf(c).get)
        case SumOp(_, _) =>
          throw new IllegalStateException("nimble: sum is never stats-answerable")
        case CountStarOp() => ()
      }
      i += 1
    }
  }

  private def foldStatsValue(i: Int, isMin: Boolean, dt: DataType, st: Tablet.Stats): Unit =
    if (st.hasMinMax) dt match {
      case FloatType | DoubleType => acc0.foldDouble(i, isMin, if (isMin) st.minDouble else st.maxDouble)
      case StringType | BinaryType => acc0.foldBytes(i, isMin, if (isMin) st.minBytes else st.maxBytes)
      case _ => acc0.foldLong(i, isMin, if (isMin) st.minLong else st.maxLong)
    }

  /** Can chunk stats answer op `i` exactly? (mirrors AggPushdown.statValue) */
  private def statsAnswerable(op: AggOp, statsOf: String => Option[Tablet.Stats]): Boolean =
    op match {
      case CountStarOp() => true
      case CountOp(c, _) => statsOf(c).isDefined
      case MinOp(c, dt) => statsOf(c).exists(st => statsValueOk(st, dt, isMin = true))
      case MaxOp(c, dt) => statsOf(c).exists(st => statsValueOk(st, dt, isMin = false))
      case SumOp(_, _) => false // stats carry no sums
    }

  private def statsValueOk(st: Tablet.Stats, dt: DataType, isMin: Boolean): Boolean = {
    if (!st.hasMinMax) return !st.hasNaN // all-null chunk contributes nothing
    dt match {
      case FloatType | DoubleType => isMin || !st.hasNaN
      case StringType | BinaryType =>
        val b = if (isMin) st.minBytes else st.maxBytes
        b != null && b.length < 64 // >=64 may be truncated
      case _ => true
    }
  }

  // ------------------------------------------------------------ scan loop
  private def scanStripe(file: String, stripe: Int): Unit = {
    val reader = new Tablet.Reader(file, NimbleSource.footerOf(file))
    try {
      val footerKeySet: Fields.KeyProbe = reader.keyProbe
      val aggStruct = StructType(fetchCols.flatMap(c => dataSchema.fields.find(_.name == c)))
      // nested struct-leaf aggregate columns: the dotted path is the leaf's
      // stream key (row-aligned; plan() verified presence in every file);
      // include its #nanos sibling for split timestamps
      val dottedKeys = fetchCols.filter(_.contains('.')).flatMap { c =>
        if (footerKeySet(c + "#nanos")) Seq(c, c + "#nanos") else Seq(c)
      }
      val neededKeys =
        (NimbleSource.neededStreamKeys(footerKeySet, dataSchema, aggStruct, filters) ++
          dottedKeys.filter(footerKeySet(_))).distinct
      if (neededKeys.isEmpty) {
        // pure count(*) with every filter column absent from this file:
        // filters are row-constant over nulls
        val pass = filters.forall(f => Filters.compile(f,
          n => typeOf(n),
          n => NimbleSource.nullColumn(typeOf(n), 1))(0))
        if (pass) {
          val rows = reader.footer.stripes(stripe).rowCount
          // grouped pushdowns never reach this file shape: plan() refuses
          // when any file lacks a group or aggregate column, so group and
          // agg columns are always present in planned files
          if (grouped) throw new IllegalStateException(
            "nimble: grouped agg scan over a file without its group columns")
          else acc0.countStar += rows
        }
        return
      }
      val filterCols = filters.flatMap(_.references).distinct
      val present: Set[String] =
        (filterCols ++ fetchCols).distinct.filter(c => reader.keyId(c) >= 0).toSet
      // shared cascading filter-decode plan (selectivity ordering, adaptive
      // evidence, footer-seeded cold start) — same engine as the batch scan
      val cascade = new FilterCascade(filters, typeOf, present,
        c => reader.fileStatsOf(c).map { st =>
          if (footerKeySet(c + "#nanos")) NimbleSource.nanosScaledStats(st) else st
        },
        c => reader.footer.ndvSketches.get(c).map(graft.format.Hll.estimate))
      // deferred projected-stream IO, same gate as the batch scan: when the
      // cascade's cold-start estimate says whole chunks are likely to die
      // (point probes), only the filter-phase streams fetch up front and the
      // aggregate-input streams fetch on the FIRST surviving chunk — a
      // selective `sum(x) WHERE k = ..` over 100 TB reads k's stream, not x's
      val (eagerKeys, deferredKeys) =
        if (filters.isEmpty || cascade.seedPassRate > NimbleSource.DeferSeedMax)
          (neededKeys, Array.empty[String])
        else {
          // filters double as the statsOnly arg so raw (possibly dotted
          // nested-leaf) ref paths enter the eager set when they key streams
          val fs = NimbleSource.filterStreamKeys(footerKeySet, dataSchema, filters, filters)
          val e = neededKeys.filter(fs.contains)
          if (e.isEmpty) (neededKeys, Array.empty[String])
          else (e, neededKeys.filterNot(fs.contains))
        }
      // combined candidate-chunk set (index ∩ v14 directory stats) and the
      // sparse fetch decision — same recipe as the batch scan, so a
      // `sum(x) WHERE k = ..` fold over an indexed or sorted table fetches
      // candidate chunks' byte ranges, not whole stripe streams
      val (candChunks, dirTotal) =
        NimbleSource.candidateChunksOf(reader, stripe, filters, Array.empty, neededKeys)
      val sparse = NimbleSource.sparseGate(candChunks, dirTotal)
      def fetch(keys: Array[String]): Map[String, (Array[Byte], Array[Boolean])] =
        if (sparse)
          NimbleSource.readNeededStreamsSparse(reader, stripe, keys, file, candChunks, dirTotal)
        else NimbleSource.readNeededStreams(reader, stripe, keys, file)
          .map { case (k, b) => k -> (b, null: Array[Boolean]) }
      val cursors = new StripeCursors(
        fetch(eagerKeys).map { case (k, (b, present)) =>
          k -> new Tablet.ChunkCursor(b, present)
        },
        deferredKeys,
        () => fetch(deferredKeys))
      // field readers resolve their cursors at construction, so deferred-agg
      // readers must construct lazily (first surviving chunk), not up front
      val readerCache = scala.collection.mutable.HashMap.empty[String, Fields.FieldReader]
      def readerOf(c: String): Fields.FieldReader = readerCache.getOrElseUpdate(c,
        if (footerKeySet(c + "#nanos")) new Fields.TsNanosR(c, cursors(_))
        else new Fields.PrimR(c, typeOf(c), cursors(_)))
      val anchor = cursors(eagerKeys.head)
      var chunkOrd = 0

      while (anchor.hasNext) {
        // peek-only: an unmaterialized deferred stream answers None, so
        // stats shortcuts degrade to decode instead of forcing its fetch
        val statsOf: String => Option[Tablet.Stats] =
          name => cursors.peek(name).flatMap(_.peekStats()).map { st =>
            if (footerKeySet(name + "#nanos")) NimbleSource.nanosScaledStats(st) else st
          }
        // candidate restriction first: a non-candidate chunk skips without a
        // stats peek — under a sparse fetch its bytes were never read
        val candPruned = candChunks != null && !candChunks.get(chunkOrd)
        chunkOrd += 1
        val pruned = candPruned ||
          filters.exists(f => Filters.pruneStripe(f, statsOf, _ => None))
        if (pruned) {
          cursors.skipAll()
          NimbleSource.chunksSkipped.incrementAndGet()
        } else {
          val allMatch = filters.forall(f => Filters.allMatchStripe(f, statsOf))
          if (!grouped && allMatch && ops.forall(op => statsAnswerable(op, statsOf)) &&
              anchor.peekStats().isDefined) {
            // whole chunk classifies all-match and every op answers from
            // chunk stats: fold metadata, decode nothing
            foldChunkStats(anchor.peekStats().get.valueCount, statsOf)
            cursors.skipAll()
            AggScan.aggChunksStatsAnswered.incrementAndGet()
            taskChunksStatsAnswered += 1
          } else {
            decodeAndFold(readerOf, present, cursors, filterCols, statsOf, allMatch, cascade)
            AggScan.aggChunksDecoded.incrementAndGet()
            taskChunksDecoded += 1
          }
        }
      }
    } finally reader.close()
  }

  private def decodeAndFold(readerOf: String => Fields.FieldReader,
      present: String => Boolean, cursors: StripeCursors, filterCols: Array[String],
      statsOf: String => Option[Tablet.Stats], allMatch: Boolean,
      cascade: FilterCascade): Unit = {
    def decodeAgg(name: String): graft.format.Column = readerOf(name) match {
      case p: Fields.PrimR if typeOf(name) == StringType ||
          typeOf(name) == BinaryType => p.decodeRawLazy()
      case other => other.decodeRaw()
    }
    if (grouped) {
      decodeAndFoldGrouped(readerOf, present, cursors, filterCols, allMatch, cascade)
      return
    }
    if (allMatch && aggCols.nonEmpty) {
      // chunk stats prove every row survives (the chunk landed here only
      // because some op — e.g. SUM — can't answer from stats): decode ONLY
      // the columns whose ops need values, fold the rest from chunk stats,
      // skip every other cursor, no selection vector at all
      val needValues: Set[String] = ops.iterator
        .filter(op => op.col != null && !statsAnswerable(op, statsOf))
        .map(_.col).toSet
      // snapshot chunk stats BEFORE any cursor advances — statsOf peeks the
      // live cursors, and decode/skip below moves them to the next chunk
      val statsSnap: Map[String, Option[Tablet.Stats]] =
        aggCols.iterator.map(c => c -> statsOf(c)).toMap
      // all ops answerable but the anchor chunk lacked stats: still need one
      // decoded column for the row count
      val decodeSet = if (needValues.nonEmpty) needValues else Set(aggCols.head)
      val decodedAgg = scala.collection.mutable.HashMap[String, graft.format.Column]()
      for (c <- aggCols) {
        if (decodeSet(c)) decodedAgg(c) = decodeAgg(c)
        else cursors.skip(c)
      }
      for (c <- filterCols if !aggCols.contains(c) && cursors.contains(c)) {
        // skip the RAW cursor (readChunkDiscard would desync, see below)
        cursors.skip(c)
      }
      val chunkRows = decodedAgg.valuesIterator.next().len
      acc0.countStar += chunkRows
      var oi = 0
      while (oi < ops.length) {
        val op = ops(oi)
        if (op.col != null) {
          if (needValues(op.col)) foldColumn(oi, op, decodedAgg(op.col), null, chunkRows)
          else op match { // statsAnswerable held for every op on this column
            case CountOp(c, _) =>
              val st = statsSnap(c).get
              acc0.counts(oi) += st.valueCount - st.nullCount
            case MinOp(c, dt) => foldStatsValue(oi, isMin = true, dt, statsSnap(c).get)
            case MaxOp(c, dt) => foldStatsValue(oi, isMin = false, dt, statsSnap(c).get)
            case _ => throw new IllegalStateException(s"nimble: stats fold $op")
          }
        }
        oi += 1
      }
      return
    }
    // cascading filter decode (the shared selectivity-ordered engine —
    // filter columns decode ONE AT A TIME, most-selective-first, and a dead
    // chunk never decodes the remaining filter columns or any aggregate
    // input; reference: docs/develop/nimble_selective_reader.rst:163-199,
    // which applies to the ValueHook fold path too)
    val decoded = scala.collection.mutable.HashMap[String, graft.format.Column]()
    // r21: filter-ONLY equality-family string columns keep FSST chunks
    // encoded (compare in the encoded domain — Filters.fsstEqPred); columns
    // the fold itself consumes stay on the dict/bulk path so a
    // mostly-surviving chunk folds off one bulk decode, not per-row decodes
    val fetchSet0 = fetchCols.toSet
    def decodeCol(name: String): graft.format.Column =
      decoded.getOrElseUpdate(name, readerOf(name) match {
        case p: Fields.PrimR if typeOf(name) == StringType ||
            typeOf(name) == BinaryType =>
          if (!fetchSet0.contains(name) && cascade.eqOnlyCols(name)) p.decodeRawLazy()
          else p.decodeRawDict()
        case other => other.decodeRaw()
      })
    // aggregate inputs decline point reads mid-cascade: their chunk feeds
    // the fold over the FINAL survivor set, so an intermediate-coordinates
    // dense column would be unusable
    val fetchSet = fetchCols.toSet
    def pointRead(name: String, positions: Array[Int]): graft.format.Column =
      if (fetchSet.contains(name)) null
      else readerOf(name) match {
        case p: Fields.PrimR => p.pointReadAt(positions)
        case _ => null
      }
    val res = cascade.evalChunk(decodeCol, pointRead)
    var chunkRows = res.chunkRows
    if (chunkRows < 0)
      chunkRows = statsOf(aggCols.head).map(_.valueCount.toInt).getOrElse {
        if (res.alive == 0) 0 // dead chunk: only cursor alignment matters
        else throw new IllegalStateException("nimble: agg chunk without stats")
      }
    val m = if (res.alive < 0) chunkRows else res.alive
    val selection: Array[Int] =
      if (res.alive < 0 || m == chunkRows) null
      else java.util.Arrays.copyOf(res.surv, m)
    // consume this chunk on every filter-only cursor the cascade never
    // touched (decoded/point-read ones already advanced) — skip the RAW
    // cursor, not readChunkDiscard: decodeRaw leaves `pending` set and
    // nothing here consumes it via readChunk, so a discard would clear that
    // stale pending WITHOUT advancing the cursor (one-chunk desync)
    for (c <- filterCols
         if cursors.contains(c) && !decoded.contains(c) && !res.pointReadCols(c) &&
           !aggCols.contains(c)) {
      cursors.skip(c)
    }
    acc0.countStar += m
    val needAgg = m > 0
    // late materialization (ColumnLoader.h:42 applied to the fold): under a
    // sparse final survivor set, aggregate-only numerics decode survivor
    // POSITIONS only — dense columns folded with an identity selection
    val dense = scala.collection.mutable.HashMap[String, graft.format.Column]()
    for (c <- aggCols) {
      if (!decoded.contains(c)) {
        if (needAgg) readerOf(c) match {
          case p: Fields.PrimR if typeOf(c) == StringType ||
              typeOf(c) == BinaryType => decoded(c) = p.decodeRawLazy()
          case p: Fields.PrimR if selection != null &&
              selection.length.toLong * 16 <= chunkRows =>
            dense(c) = p.decodeRawAt(selection)
          case other => decoded(c) = other.decodeRaw()
        }
        else cursors.skip(c) // keep siblings aligned; deferred streams lag-count
      }
    }
    if (needAgg) {
      var oi = 0
      while (oi < ops.length) {
        val op = ops(oi)
        if (op.col != null) {
          dense.get(op.col) match {
            case Some(d) => foldColumn(oi, op, d, null, m)
            case None => foldColumn(oi, op, decoded(op.col), selection, chunkRows)
          }
        }
        oi += 1
      }
    }
  }

  // ------------------------------------------------- grouped decode + fold
  private def decodeAndFoldGrouped(readerOf: String => Fields.FieldReader,
      present: String => Boolean, cursors: StripeCursors, filterCols: Array[String],
      allMatch: Boolean, cascade: FilterCascade): Unit = {
    // group columns decode dict-preserving (the fast path keys on ids);
    // filter columns too (predicates per alphabet entry); agg-only lazily
    def decodeDict(name: String): graft.format.Column = readerOf(name) match {
      case p: Fields.PrimR if typeOf(name) == StringType ||
          typeOf(name) == BinaryType => p.decodeRawDict()
      case other => other.decodeRaw()
    }
    def decodeLazy(name: String): graft.format.Column = readerOf(name) match {
      case p: Fields.PrimR if typeOf(name) == StringType ||
          typeOf(name) == BinaryType => p.decodeRawLazy()
      case other => other.decodeRaw()
    }
    def skipCursor(c: String): Unit = cursors.skip(c)
    val decoded = scala.collection.mutable.HashMap[String, graft.format.Column]()
    val fetchPresent = fetchCols.filter(present)
    val skipFilterDecode = allMatch && fetchPresent.nonEmpty
    var chunkRows = -1
    // selection from the pushed predicates (null = every row survives)
    var selection: Array[Int] = null
    var m = -1
    if (skipFilterDecode) {
      // chunk stats prove every row survives: skip filter-only cursors
      for (c <- filterCols if !fetchCols.contains(c) && cursors.contains(c)) skipCursor(c)
    } else if (filters.nonEmpty) {
      // cascading filter decode, shared with the batch scan: group/agg
      // columns the conjuncts reference decode dict-preserving and are
      // reused below; filter-only columns cascade in selectivity order and
      // may point-decode under sparse survivors
      val fetchSet = fetchCols.toSet
      // r21: filter-ONLY equality-family string columns keep FSST chunks
      // encoded (encoded-domain compare); group/agg inputs stay on the
      // dict-preserving path the keyed fast fold depends on
      def decodeCascade(name: String): graft.format.Column =
        decoded.getOrElseUpdate(name,
          if (!fetchSet.contains(name) && cascade.eqOnlyCols(name)) decodeLazy(name)
          else decodeDict(name))
      def pointRead(name: String, positions: Array[Int]): graft.format.Column =
        if (fetchSet.contains(name)) null
        else readerOf(name) match {
          case p: Fields.PrimR => p.pointReadAt(positions)
          case _ => null
        }
      val res = cascade.evalChunk(decodeCascade, pointRead)
      chunkRows = res.chunkRows
      // filter-only cursors the cascade never touched stay aligned via skip
      for (c <- filterCols
           if cursors.contains(c) && !decoded.contains(c) && !res.pointReadCols(c) &&
             !fetchCols.contains(c)) skipCursor(c)
      if (res.alive == 0) {
        // nothing survives: consume the remaining fetch cursors and leave
        for (c <- fetchPresent if !decoded.contains(c)) skipCursor(c)
        return
      }
      if (res.alive > 0) {
        m = res.alive
        selection = if (m == chunkRows) null else java.util.Arrays.copyOf(res.surv, m)
      }
    }
    // decode group columns (dict-preserving) and aggregate inputs (lazy)
    for (c <- groupNames if !decoded.contains(c) && present(c)) decoded(c) = decodeDict(c)
    for (c <- aggCols if !decoded.contains(c) && present(c)) decoded(c) = decodeLazy(c)
    if (chunkRows < 0)
      chunkRows = decoded.headOption.map(_._2.len).getOrElse(
        throw new IllegalStateException("nimble: grouped chunk with no decodable column"))
    if (m < 0) m = chunkRows
    val colOf: String => graft.format.Column = name =>
      decoded.getOrElse(name, NimbleSource.nullColumn(typeOf(name), chunkRows))
    val gcols: Array[graft.format.Column] = groupNames.map(colOf)
    val opCols: Array[graft.format.Column] =
      ops.map(op => if (op.col == null) null else colOf(op.col))
    foldGroupedChunk(gcols, opCols, selection, chunkRows)
  }

  private def foldGroupedChunk(gcols: Array[graft.format.Column],
      opCols: Array[graft.format.Column], selection: Array[Int], chunkRows: Int): Unit = {
    val m = if (selection != null) selection.length else chunkRows
    if (m == 0) return
    val allDict = gcols.forall(_.isInstanceOf[graft.format.DictBytesCol])
    if (allDict) {
      // composite-dictionary-id fast path: one array slot per (id0, id1) —
      // no hashing, no byte materialization for repeated groups
      val d0 = gcols(0).asInstanceOf[graft.format.DictBytesCol]
      val s0 = d0.alphabet.len + 1 // +1 = the null slot
      val d1 = if (gcols.length > 1) gcols(1).asInstanceOf[graft.format.DictBytesCol] else null
      val s1 = if (d1 != null) d1.alphabet.len + 1 else 1
      // slot space gated by the chunk's surviving rows too: a 512-row chunk
      // must not allocate (and zero) a million-reference array — below the
      // crossover the generic hash fold is cheaper than the allocation
      if (s0.toLong * s1 <= math.min(1 << 16, math.max(1024L, 8L * m))) {
        val slots = new Array[GroupAccs](s0 * s1)
        var k = 0
        while (k < m) {
          val row = if (selection != null) selection(k) else k
          val id0 = if (d0.nulls != null && d0.nulls(row)) s0 - 1 else d0.indices(row)
          val id1 =
            if (d1 == null) 0
            else if (d1.nulls != null && d1.nulls(row)) s1 - 1 else d1.indices(row)
          val cid = id0 * s1 + id1
          var acc = slots(cid)
          if (acc == null) {
            val key = Vector.tabulate[Any](gcols.length) { j =>
              val (d, s, id) = if (j == 0) (d0, s0, id0) else (d1, s1, id1)
              if (id == s - 1 && (d.nulls != null)) null
              else UTF8String.fromBytes(d.alphabet.entryArrays(id))
            }
            acc = groups.computeIfAbsent(key, mkAccs)
            slots(cid) = acc
          }
          foldRowInto(acc, row, opCols)
          k += 1
        }
        maybeFlush()
        return
      }
    }
    // generic path: per-row key from materialized group values
    var k = 0
    while (k < m) {
      val row = if (selection != null) selection(k) else k
      val key = Vector.tabulate[Any](gcols.length) { j =>
        val col = gcols(j)
        if (col.nulls != null && col.nulls(row)) null
        else UTF8String.fromBytes(bytesAt(col, row))
      }
      val acc = groups.computeIfAbsent(key, mkAccs)
      foldRowInto(acc, row, opCols)
      k += 1
    }
    maybeFlush()
  }

  /** Fold one surviving row into a group's accumulators. */
  private def foldRowInto(acc: GroupAccs, row: Int, opCols: Array[graft.format.Column]): Unit = {
    acc.countStar += 1
    var i = 0
    while (i < ops.length) {
      val col = opCols(i)
      ops(i) match {
        case CountStarOp() => ()
        case CountOp(_, _) =>
          if (col.nulls == null || !col.nulls(row)) acc.counts(i) += 1
        case MinOp(_, _) => foldValueAt(acc, i, isMin = true, col, row)
        case MaxOp(_, _) => foldValueAt(acc, i, isMin = false, col, row)
        case SumOp(_, _) =>
          if (col.nulls == null || !col.nulls(row)) col match {
            case l: graft.format.LongsCol =>
              acc.present(i) = true; acc.longs(i) += l.values(row)
            case d: graft.format.DoublesCol =>
              acc.present(i) = true; acc.dbls(i) += d.values(row)
            case other =>
              throw new IllegalStateException(s"nimble: grouped sum over ${other.getClass}")
          }
      }
      i += 1
    }
  }

  private def foldValueAt(acc: GroupAccs, i: Int, isMin: Boolean,
      col: graft.format.Column, row: Int): Unit =
    if (col.nulls == null || !col.nulls(row)) col match {
      case l: graft.format.LongsCol => acc.foldLong(i, isMin, l.values(row))
      case d: graft.format.DoublesCol => acc.foldDouble(i, isMin, d.values(row))
      case _ => acc.foldBytes(i, isMin, bytesAt(col, row))
    }

  /** Flush the group map into the output buffer past 64Ki entries; the
    * buffer itself drains to Spark between stripes ([[next]] refills
    * per stripe), so task memory is bounded by one stripe's distinct
    * groups plus the 64Ki map — partial rows merge downstream, never
    * requiring the whole key space resident at once. */
  private def maybeFlush(): Unit = if (groups.size() > 65536) drainGroups()

  private def drainGroups(): Unit = {
    val it = groups.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      val acc = e.getValue
      val gvals = new Array[Any](groupCols.length)
      var j = 0
      while (j < groupCols.length) {
        val v = key(j)
        gvals(j) =
          if (v == null) null
          else if (groupCols(j).dt == BinaryType) v.asInstanceOf[UTF8String].getBytes
          else v
        j += 1
      }
      outBuf += new GenericInternalRow(gvals ++ aggValuesOf(
        acc.countStar, acc.counts, acc.present, acc.longs, acc.dbls, acc.byts))
    }
    groups.clear()
  }

  override def next(): Boolean = {
    if (pos + 1 < outBuf.length) { pos += 1; return true }
    // refill: scan one stripe at a time so flushed grouped partials stream
    // to Spark between stripes instead of accumulating for the whole task
    outBuf.clear()
    pos = -1
    while (outBuf.isEmpty) {
      if (itemIdx < items.length) {
        scanStripe(items(itemIdx).file, items(itemIdx).stripe)
        itemIdx += 1
        if (grouped && itemIdx < items.length && groups.size() > 16384) drainGroups()
      } else if (!finished) {
        finished = true
        if (grouped) drainGroups()
        else outBuf += new GenericInternalRow(aggValuesOf(
          acc0.countStar, acc0.counts, acc0.present, acc0.longs, acc0.dbls, acc0.byts))
      } else return false
    }
    pos = 0
    true
  }

  override def get(): InternalRow = outBuf(pos)

  private def aggValuesOf(cs: Long, counts: Array[Long], present: Array[Boolean],
      longs: Array[Long], dbls: Array[Double], byts: Array[Array[Byte]]): Array[Any] = {
    def emitValue(i: Int, dt: DataType): Any =
      if (!present(i)) null
      else dt match {
        case ByteType => java.lang.Byte.valueOf(longs(i).toByte)
        case ShortType => java.lang.Short.valueOf(longs(i).toShort)
        case IntegerType | DateType => java.lang.Integer.valueOf(longs(i).toInt)
        case LongType | TimestampType | TimestampNTZType => java.lang.Long.valueOf(longs(i))
        case FloatType => java.lang.Float.valueOf(dbls(i).toFloat)
        case DoubleType => java.lang.Double.valueOf(dbls(i))
        case StringType => UTF8String.fromBytes(byts(i))
        case BinaryType => byts(i)
        case other => throw new IllegalStateException(s"nimble: agg emit $other")
      }
    ops.zipWithIndex.map {
      case (CountStarOp(), _) => java.lang.Long.valueOf(cs): Any
      case (CountOp(_, _), i) => java.lang.Long.valueOf(counts(i)): Any
      case (MinOp(_, dt), i) => emitValue(i, dt)
      case (MaxOp(_, dt), i) => emitValue(i, dt)
      case (SumOp(_, dt), i) =>
        if (!present(i)) null // sum over zero non-null values is null
        else if (dt == DoubleType) java.lang.Double.valueOf(dbls(i))
        else java.lang.Long.valueOf(longs(i)): Any
    }
  }

  override def close(): Unit = ()
}

/** Chunk cursors over one stripe's streams with DEFERRED fetch: eager
  * (filter-phase) streams are live from construction; deferred streams
  * (aggregate inputs under a selective probe) fetch on first access,
  * fast-forwarding a per-stream lag of chunks skipped before
  * materialization so every stream stays row-aligned regardless of when
  * it loads. Mirrors the batch reader's deferral (NimbleBatchReader) for
  * the mid-scan aggregate fold. */
private final class StripeCursors(
    eager: Map[String, Tablet.ChunkCursor],
    deferredKeys: Array[String],
    load: () => Map[String, (Array[Byte], Array[Boolean])]) {
  private var deferred: Map[String, Tablet.ChunkCursor] =
    if (deferredKeys.isEmpty) Map.empty else null
  private val deferredSet: Set[String] = deferredKeys.toSet
  private val lag = scala.collection.mutable.HashMap.empty[String, Int]

  def contains(k: String): Boolean = eager.contains(k) || deferredSet(k)

  private def materialized(): Map[String, Tablet.ChunkCursor] = {
    if (deferred == null) {
      deferred = load().map { case (k, (b, present)) =>
        val c = new Tablet.ChunkCursor(b, present)
        var i = lag.getOrElse(k, 0)
        while (i > 0) { c.skip(); i -= 1 }
        k -> c
      }
      lag.clear()
    }
    deferred
  }

  /** The live cursor — materializes a deferred stream on first access. */
  def apply(k: String): Tablet.ChunkCursor = eager.getOrElse(k, materialized()(k))

  /** Peek WITHOUT materializing: an unfetched deferred stream answers None,
    * so stats-driven shortcuts degrade to decode instead of forcing IO. */
  def peek(k: String): Option[Tablet.ChunkCursor] =
    eager.get(k).orElse(if (deferred != null) deferred.get(k) else None)

  /** Advance `k` and its #nanos sibling one chunk without decode; deferred
    * unmaterialized streams count the lag instead of fetching. */
  def skip(k: String): Unit = { skipOne(k); skipOne(k + "#nanos") }

  private def skipOne(k: String): Unit = eager.get(k) match {
    case Some(c) => c.skip()
    case None if deferredSet(k) =>
      if (deferred != null) deferred(k).skip()
      else lag(k) = lag.getOrElse(k, 0) + 1
    case None => () // absent stream — same as the old cursors.get(k).foreach
  }

  def skipAll(): Unit = {
    eager.valuesIterator.foreach(_.skip())
    if (deferred != null) deferred.valuesIterator.foreach(_.skip())
    else deferredKeys.foreach(k => lag(k) = lag.getOrElse(k, 0) + 1)
  }
}
