package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format.GraftIO
import graft.ops.{Compaction, ZOrder}

/** SQL-callable table-maintenance procedures for [[NimbleCatalog]]
  * (DSv2 `ProcedureCatalog`, the Iceberg `CALL cat.system.x(...)` surface):
  *
  *   CALL cat.system.compact(table => 'ns.t' [, target_file_bytes => N])
  *   CALL cat.system.compact_small(table => 'ns.t' [, min_file_bytes => N]
  *                                 [, target_file_bytes => N])
  *   CALL cat.system.zorder(table => 'ns.t', columns => 'a,b'
  *                          [, target_file_bytes => N])
  *
  * Each returns one report row (files_before, files_after, bytes_before,
  * bytes_after, rows). `compact_small` is natively in-place; `compact` and
  * `zorder` rewrite to a hidden side dir inside the table directory and
  * swap with the same unlink-then-move commit as the row-level ops
  * ([[graft.ops.Delete.rewriteFiles]]): a crash mid-swap loses no
  * replacement data — it persists in the side dir for recovery — and can
  * never duplicate rows. Concurrent-reader caveat family is identical to
  * SQL DELETE/UPDATE on these tables.
  */
object NimbleProcedures {

  private val REPORT = StructType(Seq(
    StructField("files_before", IntegerType, nullable = false),
    StructField("files_after", IntegerType, nullable = false),
    StructField("bytes_before", LongType, nullable = false),
    StructField("bytes_after", LongType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  def list(): Array[Identifier] =
    Array("compact", "compact_small", "zorder", "vacuum", "stats")
      .map(n => Identifier.of(Array("system"), n))

  def load(ident: Identifier, dirOf: Identifier => String,
      catalogName: String): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"nimble: procedures live in the 'system' namespace, got $ident")
    val resolve: String => String = table => {
      var parts = table.split("\\.").toSeq
      // accept the Iceberg-style catalog-qualified form ('cat.ns.t')
      if (parts.length > 1 && parts.head == catalogName) parts = parts.tail
      require(parts.nonEmpty && parts.forall(_.nonEmpty),
        s"nimble: procedures: malformed table name '$table'")
      dirOf(Identifier.of(parts.dropRight(1).toArray, parts.last))
    }
    ident.name() match {
      case "compact" => new CompactProc(resolve)
      case "compact_small" => new CompactSmallProc(resolve)
      case "zorder" => new ZOrderProc(resolve)
      case "vacuum" => new VacuumProc(resolve)
      case "stats" => new StatsProc(resolve)
      case other => throw new IllegalArgumentException(
        s"nimble: unknown procedure system.$other " +
          "(have: compact, compact_small, zorder, vacuum, stats)")
    }
  }

  /** Run `rewrite` (dir -> side) then swap the side dir in through the
    * DML commit ([[graft.ops.Delete.commitReplacements]]): victims are
    * PINNED before the rewrite starts, so a file appended after that point
    * is never unlinked; the side dir is removed on every exit path. */
  private def rewriteAndSwap(dir: String, side: String)
      (rewrite: => Compaction.Report): Compaction.Report = {
    val victims = NimbleSource.listFiles(dir)
    try {
      val rep = rewrite
      require(NimbleSource.listFiles(side).nonEmpty,
        s"nimble: optimize produced no files in $side")
      graft.ops.Delete.commitReplacements(dir, victims, side)
      rep
    } finally GraftIO.delete(side, recursive = true)
  }

  private def reportScan(rep: Compaction.Report): java.util.Iterator[Scan] =
    rowScan(REPORT, new GenericInternalRow(Array[Any](
      rep.filesBefore, rep.filesAfter, rep.bytesBefore, rep.bytesAfter, rep.rows)))

  private def rowScan(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    rowsScan(schema, Array(row))

  private def rowsScan(schema: StructType, rs: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rs
      override def description(): String = "nimble procedure report"
    }).iterator()

  private def param(name: String, dt: DataType, default: Option[String] = None) = {
    var b = ProcedureParameter.in(name, dt)
    default.foreach(d => b = b.defaultValue(d))
    b.build()
  }

  private abstract class MaintenanceProc(resolve: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // rewrites state
    protected def dirFor(input: InternalRow): String = resolve(input.getUTF8String(0).toString)
    protected def sideDir(dir: String): String =
      GraftIO.child(dir, s".optimize-${java.util.UUID.randomUUID().toString.take(8)}")
    protected def spark: SparkSession = SparkSession.active
  }

  private final class CompactProc(resolve: String => String) extends MaintenanceProc(resolve) {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite the table into ~target_file_bytes files, layout preserved"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("target_file_bytes", LongType, Some((256L << 20).toString)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirFor(input)
      val side = sideDir(dir)
      reportScan(rewriteAndSwap(dir, side) {
        Compaction.compact(spark, dir, side, input.getLong(1))
      })
    }
  }

  private final class CompactSmallProc(resolve: String => String) extends MaintenanceProc(resolve) {
    override def name(): String = "compact_small"
    override def description(): String =
      "in-place merge of only the files under min_file_bytes; big files untouched"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("min_file_bytes", LongType, Some((32L << 20).toString)),
      param("target_file_bytes", LongType, Some((256L << 20).toString)))
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      reportScan(Compaction.compactSmall(spark, dirFor(input),
        input.getLong(1), input.getLong(2)))
  }

  /** GC for the crash-recovery leftovers the commit protocols deliberately
    * leave behind: `.rewrite-*` (DML), `.surgery-*` (chunk surgery),
    * `.compact-*` (small-file raw concat), `.optimize-*` (CALL maintenance)
    * and `_temporary` (batch write commit) dirs inside the table directory.
    * Those dirs hold replacement data after a mid-commit crash, so VACUUM
    * only removes ones untouched for `older_than_hours` (live operations
    * keep writing into theirs) — the same recoverability-vs-hygiene dial as
    * Delta's VACUUM retention. */
  private final class VacuumProc(resolve: String => String) extends MaintenanceProc(resolve) {
    private val VREPORT = StructType(Seq(
      StructField("dirs_removed", IntegerType, nullable = false),
      StructField("bytes_reclaimed", LongType, nullable = false)))
    override def name(): String = "vacuum"
    override def description(): String =
      "remove crash-recovery temp dirs older than older_than_hours"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("older_than_hours", LongType, Some("168")))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirFor(input)
      val cutoff = System.currentTimeMillis() - input.getLong(1) * 3600L * 1000L
      def bytesOf(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(bytesOf).sum).getOrElse(0L)
      def newestMtime(f: java.io.File): Long =
        math.max(f.lastModified(),
          Option(f.listFiles()).map(_.map(newestMtime).foldLeft(0L)(math.max)).getOrElse(0L))
      val victims = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          (f.getName.startsWith(".rewrite-") || f.getName.startsWith(".optimize-") ||
            f.getName.startsWith(".surgery-") || f.getName.startsWith(".compact-") ||
            f.getName == "_temporary") &&
          newestMtime(f) < cutoff) // any recent write inside = live operation
      var reclaimed = 0L
      victims.foreach { f =>
        reclaimed += bytesOf(f)
        GraftIO.delete(f.getPath, recursive = true)
      }
      rowScan(VREPORT, new GenericInternalRow(Array[Any](victims.length, reclaimed)))
    }
  }

  private final class ZOrderProc(resolve: String => String) extends MaintenanceProc(resolve) {
    override def name(): String = "zorder"
    override def description(): String =
      "Morton-curve clustering rewrite over the given columns (stats prune on all of them)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("columns", StringType),
      param("target_file_bytes", LongType, Some((256L << 20).toString)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirFor(input)
      val cols = input.getUTF8String(1).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val side = sideDir(dir)
      reportScan(rewriteAndSwap(dir, side) {
        ZOrder.zorder(spark, dir, side, cols, input.getLong(2))
      })
    }
  }

  /** Read-only table statistics: one row per top-level atomic column with
    * value/null counts from merged footer stats and the v10 HLL distinct
    * count (null when any file lacks the sketch) — the ANALYZE surface for
    * operators, answered from O(metadata) like estimateStatistics. */
  private final class StatsProc(resolve: String => String) extends MaintenanceProc(resolve) {
    private val SREPORT = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("value_count", LongType, nullable = false),
      StructField("null_count", LongType, nullable = false),
      StructField("ndv", LongType, nullable = true)))
    override def name(): String = "stats"
    override def description(): String =
      "per-column value/null counts and HLL distinct-count estimates, O(metadata)"
    override def parameters(): Array[ProcedureParameter] = Array(param("table", StringType))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = dirFor(input)
      val files = NimbleSource.listFiles(dir)
      require(files.nonEmpty, s"nimble: stats: empty table $dir")
      NimbleSource.prefetchFooters(files)
      val schema = DataType.fromJson(
        NimbleSource.footerOf(files.head).schemaJson).asInstanceOf[StructType]
      // top-level atomics plus struct-leaf paths (dotted stream keys are
      // row-aligned, so their footer stats/sketches answer like columns);
      // array/map subtrees have no per-row stats surface
      val cols = scala.collection.mutable.ArrayBuffer[StructField]()
      def walk(prefix: String, dt: DataType): Unit = dt match {
        case s: StructType => s.fields.foreach(c => walk(s"$prefix.${c.name}", c.dataType))
        case _: ArrayType | _: MapType => ()
        case leaf => cols += StructField(prefix, leaf)
      }
      schema.fields.foreach(f => walk(f.name, f.dataType))
      // files on the OUTER loop: one Reader open (and one meta-section read
      // on wide v8 footers) per FILE, every column accumulated inside — the
      // estimateStatistics discipline, O(files) opens instead of
      // O(columns x files)
      val colArr = cols.toArray
      val values = new Array[Long](colArr.length)
      val nulls = new Array[Long](colArr.length)
      val ndv = new Array[Array[Byte]](colArr.length)
      val ndvOk = Array.fill(colArr.length)(true)
      val ok = Array.fill(colArr.length)(true)
      for (file <- files) {
        val rd = new graft.format.Tablet.Reader(file, NimbleSource.footerOf(file))
        try {
          var i = 0
          while (i < colArr.length) {
            if (ok(i)) {
              rd.fileStatsOf(colArr(i).name) match {
                case Some(st) => values(i) += st.valueCount; nulls(i) += st.nullCount
                case None => ok(i) = false // absent in a file (schema evolution)
              }
              rd.footer.ndvSketches.get(colArr(i).name) match {
                case Some(regs) if ndvOk(i) =>
                  if (ndv(i) == null) ndv(i) = regs.clone()
                  else graft.format.Hll.merge(ndv(i), regs)
                case _ => ndvOk(i) = false
              }
            }
            i += 1
          }
        } finally rd.close()
      }
      val rows = colArr.indices.flatMap { i =>
        if (!ok(i)) None
        else Some(new GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(colArr(i).name),
          values(i), nulls(i),
          if (ndvOk(i) && ndv(i) != null)
            java.lang.Long.valueOf(math.min(graft.format.Hll.estimate(ndv(i)),
              math.max(0L, values(i) - nulls(i))))
          else null)): InternalRow)
      }.toArray
      rowsScan(SREPORT, rows)
    }
  }
}
