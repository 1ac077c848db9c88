package graft.spark

import graft.format.Tablet
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregate pushdown: COUNT/COUNT(col)/MIN/MAX answered straight from the
  * footer column statistics — O(metadata), zero data bytes read.
  *
  * Mirrors the reference's stats + ValueHook aggregation fast path
  * (reference: dwio/nimble/velox/stats/ColumnStatsUtils.h:30-37,
  * velox/selective/ColumnLoader.h:42; SURVEY.md §2.3/§2.6). Acceptance is
  * decided entirely on the driver against every file footer; if any footer
  * cannot answer exactly (possible NaN in a double max, truncated string
  * bounds, unsupported function), pushdown is refused and Spark falls back to
  * a normal scan — never a wrong answer.
  */
object AggPushdown {

  private def colName(e: Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames().length == 1 => Some(n.fieldNames()(0))
    case _ => None
  }

  def outputSchema(agg: Aggregation, schema: StructType): StructType = {
    // pushed GROUP BY columns lead the scan output (Spark's partial
    // pushdown zips group attributes before the aggregate partials)
    val groupFields = agg.groupByExpressions().map { e =>
      val (n, dt) = AggScan.resolveLeaf(e, schema).get
      StructField(n, dt, nullable = true)
    }
    def leafDt(e: Expression): DataType = AggScan.resolveLeaf(e, schema).get._2
    val fields = agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (m: Min, i) => StructField(s"agg_$i", leafDt(m.column()), nullable = true)
      case (m: Max, i) => StructField(s"agg_$i", leafDt(m.column()), nullable = true)
      case (s: Sum, i) =>
        // partial sums: long for integral children, double for double —
        // Spark casts back to the child type before the final merge (safe:
        // AggScan.sumBoundOk proved the cast can't wrap)
        val dt = leafDt(s.column()) match {
          case DoubleType => DoubleType
          case _ => LongType
        }
        StructField(s"agg_$i", dt, nullable = true)
      case (other, _) => throw new IllegalStateException(other.toString)
    }
    StructType(groupFields ++ fields)
  }

  /** Per-file partial rows, or None if any aggregate is not exactly
    * answerable from stats. */
  def tryCompute(agg: Aggregation, schema: StructType, files: Seq[String]): Option[Seq[InternalRow]] = {
    if (agg.groupByExpressions().nonEmpty) return None
    // columns may be nested struct-leaf paths (AggScan.resolveLeaf): the
    // dotted path is the leaf's row-aligned stream key, so its file stats
    // answer exactly like a top-level column's
    def leafOk(e: Expression): Boolean = AggScan.resolveLeaf(e, schema).exists {
      case (_, dt) => dt match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }
    }
    val shapeOk = agg.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count if !c.isDistinct => leafOk(c.column())
      case m: Min => leafOk(m.column())
      case m: Max => leafOk(m.column())
      case _ => false
    }
    if (!shapeOk || files.isEmpty) return None
    NimbleSource.prefetchFooters(files) // parallel footer I/O, then cache hits
    val rows = files.map { f =>
      val r = new Tablet.Reader(f, NimbleSource.footerOf(f))
      try rowForFooter(agg, schema, r).getOrElse(return None)
      finally r.close()
    }
    Some(rows)
  }

  /** Merge stripe stats into an accumulator (same semantics as the writer's
    * file-stats accumulation). A truncated (64B) byte extreme that wins the
    * comparison survives into the result and statValue then refuses —
    * conservative, never wrong. */
  private def rowForFooter(agg: Aggregation, schema: StructType, r: Tablet.Reader): Option[InternalRow] = {
    val footer = r.footer
    // name -> stats via Reader probes: wide (v8 sectioned) footers answer
    // from one hash bucket instead of parsing the whole meta table
    val values: Array[Any] = agg.aggregateExpressions().map {
      case _: CountStar => java.lang.Long.valueOf(footer.rowCount): Any
      case c: Count =>
        val (n, _) = AggScan.resolveLeaf(c.column(), schema).get
        val s = r.fileStatsOf(n).getOrElse(return None)
        java.lang.Long.valueOf(s.valueCount - s.nullCount): Any
      case m: Min =>
        val (n, dt) = AggScan.resolveLeaf(m.column(), schema).get
        // nanos-split column: micros-stream stats are not the logical value
        // (exact-or-refuse contract -> refuse)
        if (r.nanosSplit(n)) return None
        val s = r.fileStatsOf(n).getOrElse(return None)
        statValue(s, dt, isMin = true) match {
          case Some(v) => v
          case None => return None
        }
      case m: Max =>
        val (n, dt) = AggScan.resolveLeaf(m.column(), schema).get
        if (r.nanosSplit(n)) return None
        val s = r.fileStatsOf(n).getOrElse(return None)
        statValue(s, dt, isMin = false) match {
          case Some(v) => v
          case None => return None
        }
      case other => throw new IllegalStateException(other.toString)
    }
    Some(new GenericInternalRow(values))
  }

  /** Exact stat value as a Catalyst internal value; None = cannot answer
    * exactly. Returns Some(null) for an all-null column (correct partial).
    * Shared with the filtered mid-scan path (AggScan). */
  private[spark] def statValue(s: Tablet.Stats, dt: DataType, isMin: Boolean): Option[Any] = {
    if (!s.hasMinMax) {
      // no non-null, non-NaN values in this file
      return if (s.hasNaN) None else Some(null)
    }
    dt match {
      case ByteType => Some(java.lang.Byte.valueOf((if (isMin) s.minLong else s.maxLong).toByte))
      case ShortType => Some(java.lang.Short.valueOf((if (isMin) s.minLong else s.maxLong).toShort))
      case IntegerType | DateType => Some(java.lang.Integer.valueOf((if (isMin) s.minLong else s.maxLong).toInt))
      case LongType | TimestampType | TimestampNTZType => Some(java.lang.Long.valueOf(if (isMin) s.minLong else s.maxLong))
      case FloatType =>
        // Spark sorts NaN greatest: max is NaN if present; min unaffected
        if (!isMin && s.hasNaN) None
        else Some(java.lang.Float.valueOf((if (isMin) s.minDouble else s.maxDouble).toFloat))
      case DoubleType =>
        if (!isMin && s.hasNaN) None
        else Some(java.lang.Double.valueOf(if (isMin) s.minDouble else s.maxDouble))
      case StringType =>
        val b = if (isMin) s.minBytes else s.maxBytes
        if (b == null || b.length >= 64) None // >=64 may be truncated
        else Some(UTF8String.fromBytes(b))
      case BinaryType =>
        val b = if (isMin) s.minBytes else s.maxBytes
        if (b == null || b.length >= 64) None else Some(b)
      case _ => None
    }
  }
}

/** Scan yielding the driver-precomputed per-file partial rows. */
/** Footer-stats aggregate results as a [[org.apache.spark.sql.connector.read.LocalScan]]:
  * Spark plans a LocalTableScanExec over the driver-computed partials — no
  * job, no tasks, truly O(metadata). */
class NimbleAggScan(path: String, out: StructType, resultRows: Seq[InternalRow])
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = out
  override def rows(): Array[InternalRow] = resultRows.toArray
  override def description(): String =
    s"nimble stats-agg path=$path (${resultRows.length} partials, 0 data bytes, local)"
}
