package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.format.{GraftIO, Tablet}
import graft.spark.{Filters, NimbleSource}

/** Row-level DELETE / UPDATE over tablet directories — file-granular
  * copy-on-write, the lakehouse pattern for an append-only, self-describing
  * format (the reference's tablets are immutable once written:
  * dwio/nimble/tablet/TabletWriter.h; mutation therefore means replacing
  * whole files, never editing one).
  *
  * Every file classifies against the predicate using its own footer/stripe
  * stats and blooms (the same metadata the scan prunes with):
  *
  *  - ALL-MATCH  (every row provably satisfies the predicate): the file is
  *    simply unlinked — a metadata-only delete, zero data read. A 100 TB
  *    time-range retention delete on a sorted table touches no bytes.
  *  - NONE-MATCH (provably no row satisfies it): untouched.
  *  - MIXED: rewritten — survivors stream through one Spark job into
  *    replacement files that preserve every footer-declared layout
  *    property (sort order, indexes, blooms, bucket spec, FlatMap /
  *    dict-array / dedup-map, nanos split) via [[Compaction.recoverLayout]].
  *
  * Classification is conservative three-valued logic: stats can only send a
  * file to the cheap buckets when they PROVE the answer; anything uncertain
  * rewrites, and the rewrite's keep-filter (`NOT cond` with SQL null
  * semantics — a NULL predicate keeps the row) is the single source of
  * truth, so correctness never depends on stats precision.
  *
  * Not transactional: replacement files land before originals are removed,
  * so a concurrent reader may briefly see duplicates, and a crash
  * mid-commit leaves both (re-running the delete converges — survivors
  * re-classify, duplicated survivors are NOT possible because replacements
  * only land after their originals are unlinked). Same caveat family as
  * [[Compaction.compact]]; wrap in an external lock for concurrent writers.
  */
object Delete {

  final case class Report(
      filesDeleted: Int, filesRewritten: Int, filesUntouched: Int,
      rowsDeleted: Long, rowsRemaining: Long)

  /** Wall seconds per phase (classify / recoverLayout / rewrite / unlink) of
    * the most recent [[run]] on this JVM. Bench folds these into its dump so
    * a slow scale_delete/scale_sql_update sample adjudicates stall-vs-load
    * from the committed artifact, without a probe re-run (r17 verdict #5).
    * Probe-only stderr printing stays behind GRAFT_DML_PHASES. */
  @volatile var lastPhaseSec: Map[String, Double] = Map.empty

  // ------------------------------------------------------------ public API

  /** DELETE FROM dir WHERE cond. `readOptions` are the table's read options
    * (e.g. unsignedColumns — which forces classification to fence those
    * columns and refuses the rewrite path, since re-writing widened values
    * would change the stored physical domain). */
  def delete(spark: SparkSession, dir: String, cond: Column,
      readOptions: Map[String, String] = Map.empty): Report = {
    val keep = coalesce(not(cond), lit(true))
    val (filters, complete) = translateCond(spark, dir, cond, readOptions)
    run(spark, dir, filters, keep, identity, readOptions,
      exactFilters = complete)
  }

  /** The V1-filter entry ([[graft.spark.NimbleSource]]'s SupportsDelete
    * calls this with Spark's own translation of the SQL DELETE condition;
    * conjunction semantics). */
  def deleteFilters(spark: SparkSession, dir: String, filters: Array[Filter],
      readOptions: Map[String, String] = Map.empty): Report = {
    val cond = if (filters.isEmpty) lit(true)
      else filters.map(toColumn).reduce(_ && _)
    // the filters ARE the condition here (exact by construction), so chunk
    // surgery may use them for all-match chunk drops
    run(spark, dir, filters, coalesce(not(cond), lit(true)), identity,
      readOptions, exactFilters = true)
  }

  /** UPDATE dir SET assignments WHERE cond. Files provably untouched by the
    * predicate are left alone; all-match and mixed files rewrite with each
    * assignment applied under `when(cond)` (rows where cond is NULL or
    * FALSE keep their values — SQL UPDATE semantics). Assigning to a column
    * that participates in the declared layout (sort / index / bloom /
    * bucket) is refused: the rewrite would silently invalidate the
    * contract the footers declare. */
  def update(spark: SparkSession, dir: String, cond: Column,
      assignments: Map[String, Column],
      readOptions: Map[String, String] = Map.empty): Report = {
    require(assignments.nonEmpty, "nimble: update: no assignments")
    val layout = Compaction.recoverLayout(dir)
    val layoutCols: Set[String] =
      layout.get("sortColumns").toSeq.flatMap(_.split(",")).toSet ++
      layout.get("indexColumns").toSeq.flatMap(_.split(",").toSeq.flatMap(_.split("\\+").toSeq)) ++
      layout.get("bloomFilterColumns").toSeq.flatMap(_.split(",")) ++
      layout.get("bucketColumns").toSeq.flatMap(_.split(","))
    val bad = assignments.keySet.intersect(layoutCols.map(_.trim))
    require(bad.isEmpty,
      s"nimble: update: assigning ${bad.mkString(",")} would invalidate the " +
        "declared sort/index/bloom/bucket layout — drop the layout (rewrite " +
        "via Compaction with different options) or update other columns")
    // all assignments evaluate against the ORIGINAL row in one projection
    // (SQL UPDATE semantics: SET a=b, b=a swaps, it does not chain)
    val transform: DataFrame => DataFrame = df => {
      val missing = assignments.keySet -- df.columns
      require(missing.isEmpty, s"nimble: update: no such column(s): ${missing.mkString(",")}")
      val condSafe = coalesce(cond, lit(false))
      df.select(df.columns.toIndexedSeq.map { cn =>
        assignments.get(cn) match {
          case Some(v) => when(condSafe, v).otherwise(col(s"`$cn`")).as(cn)
          case None => col(s"`$cn`")
        }
      }: _*)
    }
    // constant assignments with a fully-translated condition may take the
    // column-shredded chunk surgery (only the assigned streams' touched
    // chunks re-encode); anything else rides the Spark rewrite. Constants
    // are recognized the same way translateCond recognizes predicates —
    // ANALYZED (so `lit(null).cast("long")` and other foldable constant
    // expressions qualify) and evaluated once here.
    val (filters, complete) = translateCond(spark, dir, cond, readOptions)
    val lits: Option[Map[String, Any]] =
      if (!complete) None
      else {
        val df0 = spark.read.format("nimble").options(readOptions).load(dir)
        val ex = assignments.map { case (n, c) =>
          df0.select(c).queryExecution.analyzed.collectFirst {
            case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
              p.projectList.head match {
                case a: expressions.Alias => a.child
                case other => other
              }
          }.filter(e => e.foldable && e.deterministic).map(e =>
            n -> CatalystTypeConverters.convertToScala(e.eval(null), e.dataType))
        }
        if (ex.forall(_.isDefined)) Some(ex.flatten.toMap) else None
      }
    // update touches all-match files too (rows change, not disappear):
    // reuse run() with all-match folded into the rewrite set
    run(spark, dir, filters,
      keep = lit(true), transform = transform, readOptions,
      unlinkAllMatch = false, exactFilters = complete, updateLits = lits)
  }

  /** Driver-side gate for SQL metadata-only DELETE (Spark's
    * OptimizeMetadataOnlyDeleteFromTable): true iff every file classifies
    * all-match or none-match from its own footer stats — `deleteWhere` will
    * then purely unlink. Mixed predicates return false and take the
    * group-based row-level rewrite instead. */
  def metadataOnlyDeletable(dir: String, filters: Array[Filter],
      unsignedCols: Set[String] = Set.empty): Boolean = {
    val files = NimbleSource.listFiles(dir)
    if (files.isEmpty) return true
    // stored-domain translation first (r20): translated filters classify
    // against the quarantined signed-domain stats directly, so unsigned
    // tables get full metadata classification instead of the blanket fence
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(NimbleSource.footerOf(files.head).schemaJson).asInstanceOf[StructType]
    unsignedStoredFilters(filters, unsignedCols, schema) match {
      case Some(tf) => classify(files, tf, Set.empty)._3.isEmpty
      case None => classify(files, filters, unsignedCols)._3.isEmpty
    }
  }

  /** Stored-domain translation of widened (unsigned) predicates — lives in
    * [[graft.spark.Filters.unsignedStored]] so the scan's pruning path
    * shares it; kept here as the ops-side entry point. */
  private[graft] def unsignedStoredFilters(filters: Array[Filter],
      unsignedCols: Set[String], schema: StructType): Option[Array[Filter]] =
    graft.spark.Filters.unsignedStored(filters, unsignedCols, schema)

  // --------------------------------------------------- classification

  /** (allMatch, noneMatch, mixed) file partition. Conservative: a file
    * lands in allMatch/noneMatch only when every stripe's stats PROVE it;
    * unsigned-widened columns always classify as unknown (their stats are
    * signed-domain). Empty files classify none-match (nothing to delete). */
  private[graft] def classify(files: Seq[String], filters: Array[Filter],
      unsignedCols: Set[String])
      : (Seq[String], Seq[String], Seq[String]) = {
    val allM = Seq.newBuilder[String]
    val noneM = Seq.newBuilder[String]
    val mixed = Seq.newBuilder[String]
    NimbleSource.prefetchFooters(files)
    for (file <- files) {
      val footer = NimbleSource.footerOf(file)
      if (footer.stripes.isEmpty || footer.rowCount == 0L) noneM += file
      else if (filters.isEmpty) mixed += file // no provable classification
      else {
        val r = new Tablet.Reader(file, footer)
        try {
          var fileAll = true
          var fileNone = true
          var s = 0
          while (s < footer.stripes.length && (fileAll || fileNone)) {
            val statsOf: String => Option[Tablet.Stats] = name =>
              if (unsignedCols(name)) None
              else Some(r.keyId(name)).filter(_ >= 0).map { id =>
                val st = r.streamStats(s, id)
                if (r.keyId(name + "#nanos") >= 0) nanosScaled(st) else st
              }
            val bloomOf: String => Option[Tablet.Bloom] = name =>
              if (unsignedCols(name)) None
              else Some(r.keyId(name)).filter(_ >= 0)
                .filterNot(_ => r.keyId(name + "#nanos") >= 0)
                .flatMap(id => r.streamBloom(s, id))
            if (!filters.exists(f => Filters.pruneStripe(f, statsOf, bloomOf)))
              fileNone = false
            if (!filters.forall(f => Filters.allMatchStripe(f, statsOf)))
              fileAll = false
            s += 1
          }
          if (fileAll) allM += file
          else if (fileNone) noneM += file
          else mixed += file
        } finally r.close()
      }
    }
    (allM.result(), noneM.result(), mixed.result())
  }

  // conservative combined-value bounds for the micros+nanos split (mirrors
  // the scan's fence — the scaled range CONTAINS the true combined values,
  // so allMatch and noneMatch proofs both stay sound)
  private def nanosScaled(st: Tablet.Stats): Tablet.Stats =
    if (!st.hasMinMax) st
    else st.copy(
      minLong = try math.multiplyExact(st.minLong, 1000L)
                catch { case _: ArithmeticException => Long.MinValue },
      maxLong = try math.addExact(math.multiplyExact(st.maxLong, 1000L), 999L)
                catch { case _: ArithmeticException => Long.MaxValue })

  // ------------------------------------------------------------ engine

  private def run(spark: SparkSession, dir: String, filters: Array[Filter],
      keep: Column, transform: DataFrame => DataFrame,
      readOptions: Map[String, String],
      unlinkAllMatch: Boolean = true,
      /** true only when `filters` EXACTLY represent the condition (SQL
        * deleteWhere filters; a fully-translated delete Column) — the
        * precondition for chunk surgery's all-match chunk drops. */
      exactFilters: Boolean = false,
      /** Literal-only UPDATE assignments (column -> Scala literal) — routes
        * the mixed files through [[Surgery.updateFiles]] instead of the
        * delete surgery; None for deletes and non-literal updates. */
      updateLits: Option[Map[String, Any]] = None): Report = {
    val files = NimbleSource.listFiles(dir)
    if (files.isEmpty) return Report(0, 0, 0, 0L, 0L)
    val unsignedCols = readOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("unsignedColumns") =>
        v.split(",").map(_.trim).filter(_.nonEmpty).toSet
    }.getOrElse(Set.empty[String])

    val schema = org.apache.spark.sql.types.DataType
      .fromJson(NimbleSource.footerOf(files.head).schemaJson).asInstanceOf[StructType]
    // per-phase walls always record into lastPhaseSec (four nanoTime pairs —
    // free next to file IO); GRAFT_DML_PHASES=1 additionally prints them
    val phasePrint = sys.env.contains("GRAFT_DML_PHASES")
    val phaseWalls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      phaseWalls(name) = sec
      if (phasePrint) System.err.println(f"[dml-phase] $name $sec%.3f s")
      r
    }
    // r20 (r19 verdict #7 stretch): unsigned-widened predicates translate
    // into the STORED signed domain when provably equivalent — classification
    // then runs against the quarantined signed stats with no fence, and
    // chunk surgery masks raw stored values directly (re-encoded chunks stay
    // in the stored domain, so the physical representation never lies).
    val storedF: Option[Array[Filter]] =
      if (unsignedCols.isEmpty) Some(filters)
      else unsignedStoredFilters(filters, unsignedCols, schema)
    val clsFilters = storedF.getOrElse(filters)
    val clsFence = if (storedF.isDefined) Set.empty[String] else unsignedCols
    val (allM0, noneM, mixed0) = phase("classify")(classify(files, clsFilters, clsFence))
    val (allM, mixed) =
      if (unlinkAllMatch) (allM0, mixed0) else (Nil, allM0 ++ mixed0)

    // recovered while every original file is still present — the layout the
    // rewrite and the possible schema-preserving empty tablet both carry
    val layout: Map[String, String] =
      if (mixed.isEmpty && allM.isEmpty) Map.empty
      else phase("recoverLayout")(
        try Compaction.recoverLayout(dir) catch { case _: Throwable => Map.empty })

    var rowsDeleted = allM.map(f => NimbleSource.footerOf(f).rowCount).sum
    var rewritten = 0

    if (mixed.nonEmpty) {
      // unsigned tables may proceed ONLY through stored-domain chunk surgery
      // (a DELETE with translated exact filters): the Spark rewrite reads
      // widened values and would store them back widened — a silent physical
      // domain change — and literal UPDATE assignments are widened-domain.
      // Anything that would reach those paths refuses up front.
      val unsignedSurgeryOk = unsignedCols.isEmpty ||
        (storedF.isDefined && exactFilters && filters.nonEmpty &&
          unlinkAllMatch && updateLits.isEmpty)
      def refuseUnsigned(who: Seq[String]): Unit =
        require(who.isEmpty,
          "nimble: delete/update: rewriting an unsigned-widened table would " +
            "store the WIDENED values (a different physical domain) — only " +
            "metadata-only and surgery-eligible stored-domain deletes are " +
            "supported on such tables; this predicate needs a row-level " +
            "rewrite of: " + who.take(3).mkString(","))
      if (!unsignedSurgeryOk) refuseUnsigned(mixed)
      // chunk surgery first (delete with exact filters): boundary files
      // rewrite O(mixed chunks) — raw byte copy for the kept bulk — instead
      // of O(file); ineligible files fall through to the Spark rewrite
      var jobFiles = mixed
      // delete surgery only on DELETE calls (unlinkAllMatch); update surgery
      // only with literal assignments — a non-literal update with exact
      // filters must NOT reach the row-dropping path
      if (exactFilters && filters.nonEmpty &&
          (unlinkAllMatch || updateLits.isDefined)) {
        val tmp = GraftIO.child(dir,
          s".surgery-${java.util.UUID.randomUUID().toString.take(8)}")
        try {
          updateLits match {
            case Some(assigns) =>
              val (done, rest) = phase("surgery")(
                Surgery.updateFiles(spark, mixed, filters, assigns, tmp))
              if (done.nonEmpty) commitReplacements(dir, done, tmp) // rows unchanged
              jobFiles = rest
            case None =>
              // surgery evaluates against raw STORED values — hand it the
              // stored-domain filters (identical to `filters` when no
              // unsigned columns are declared)
              val (done, before, _, rest) = phase("surgery")(
                Surgery.deleteFiles(spark, mixed, clsFilters, tmp))
              // unsigned: any surgery-ineligible remainder refuses BEFORE
              // the commit below — replacements only exist in the side dir
              // (finally-deleted), so a refused DELETE applies NOTHING
              // rather than erroring half-applied
              if (unsignedCols.nonEmpty) refuseUnsigned(rest)
              if (done.nonEmpty)
                rowsDeleted += before - commitReplacements(dir, done, tmp)
              jobFiles = rest
          }
        } finally GraftIO.delete(tmp, recursive = true)
      }
      // (no unsigned re-check here: unsignedSurgeryOk gates every unsigned
      // flow into the surgery branch above, whose pre-commit refusal is the
      // load-bearing one — jobFiles is provably empty for unsigned by now)
      if (jobFiles.nonEmpty) {
        val (rowsBefore, rowsAfter) = phase("rewrite")(rewriteFiles(spark, dir,
          jobFiles, files, schema, layout, readOptions,
          src => transform(src.filter(keep))))
        rowsDeleted += rowsBefore - rowsAfter
      }
      rewritten = mixed.length
    }

    phase("unlink")(allM.foreach(GraftIO.delete(_)))

    // deleting every row must not delete the SCHEMA: leave one empty tablet
    // carrying the schema and the declared layout (bucketed: one empty file
    // per bucket, so the spec — and SPJ — survive emptiness)
    if (NimbleSource.listFiles(dir).isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema).repartition(1)
      var w = empty.write.format("nimble").mode("append")
      layout.foreach { case (k, v) => w = w.option(k, v) }
      w.save(dir)
    }

    val remaining = NimbleSource.listFiles(dir)
      .map(f => NimbleSource.footerOf(f).rowCount).sum
    lastPhaseSec = phaseWalls.toMap
    Report(allM.length, rewritten, noneM.length, rowsDeleted, remaining)
  }

  /** Copy-on-write rewrite commit shared by DELETE/UPDATE/MERGE: read the
    * victim files (one whole-dir scan when they are ALL the files — full
    * bin-packed parallelism — else a per-file union so untouched files are
    * never opened), apply `transform`, write replacements layout-preserving
    * to a hidden side dir, unlink originals FIRST, then move replacements
    * in (a crash in between loses no committed data — replacements persist
    * in the side dir for manual recovery — and can never duplicate
    * surviving rows). Returns (victim rows before, replacement rows after). */
  private[ops] def rewriteFiles(spark: SparkSession, dir: String,
      victims: Seq[String], allFiles: Seq[String], schema: StructType,
      layout: Map[String, String], readOptions: Map[String, String],
      transform: DataFrame => DataFrame,
      outFiles: Option[Int] = None): (Long, Long) = {
    val tmp = GraftIO.child(dir, s".rewrite-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val src =
        if (victims.length == allFiles.length)
          spark.read.format("nimble").options(readOptions).schema(schema).load(dir)
        else
          victims.map(f => spark.read.format("nimble").options(readOptions)
            .schema(schema).load(f)).reduce(_ unionByName _)
      val rowsBefore = victims.map(f => NimbleSource.footerOf(f).rowCount).sum

      val out = transform(src)
      val sortCols = layout.get("sortColumns").map(_.split(",").toSeq).getOrElse(Nil)
      // replacement fan-out: one file per victim by default (point rewrites
      // keep their file granularity); incremental compaction passes an
      // explicit smaller target so victims MERGE instead
      val nOut = outFiles.getOrElse(math.max(1, victims.length))
      val shaped =
        if (layout.contains("numBuckets")) out // bucketed write re-clusters
        else if (sortCols.nonEmpty)
          out.repartitionByRange(nOut, sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
        else outFiles.map(out.coalesce).getOrElse(out)
      var w = shaped.write.format("nimble").mode("append")
      layout.foreach { case (k, v) => w = w.option(k, v) }
      w.save(tmp)

      val rowsAfter = Delete.commitReplacements(dir, victims, tmp)
      (rowsBefore, rowsAfter)
    } finally GraftIO.delete(tmp, recursive = true)
  }

  /** The shared in-place swap commit (DML rewrites AND the CALL maintenance
    * procedures): unlink exactly `victims` — never "whatever is in the dir
    * now", so a file appended after the victims were pinned survives — then
    * move the side dir's replacements in. Zero-row task files are dropped
    * (noise: footer reads for nothing, and they'd break the
    * one-file-per-bucket ordering contract), EXCEPT that if dropping them
    * would leave the directory with no files at all, one zero-row file is
    * kept so the schema + declared layout survive. Crash safety: unlink
    * happens first, so an interruption loses no replacement data (it stays
    * in the side dir for recovery) and can never duplicate surviving rows.
    * The caller owns side-dir cleanup (finally-delete). Returns replacement
    * row count. */
  private[graft] def commitReplacements(dir: String, victims: Seq[String],
      sideDir: String): Long = {
    val all = NimbleSource.listFiles(sideDir)
    var repl = all.filter(f => NimbleSource.footerOf(f).rowCount > 0)
    var rowsAfter = 0L
    victims.foreach(GraftIO.delete(_))
    if (repl.isEmpty && all.nonEmpty && NimbleSource.listFiles(dir).isEmpty)
      repl = all.take(1) // keep the schema-carrying empty tablet
    for (f <- repl) {
      rowsAfter += NimbleSource.footerOf(f).rowCount
      val name = f.substring(f.lastIndexOf('/') + 1)
      var dst = GraftIO.child(dir, name)
      if (GraftIO.exists(dst))
        dst = GraftIO.child(dir, s"r${java.util.UUID.randomUUID().toString.take(8)}-$name")
      require(GraftIO.rename(f, dst), s"nimble: rewrite: rename $f -> $dst failed")
    }
    rowsAfter
  }

  // --------------------------------------------- condition translation

  /** Resolve `cond` against the table (type coercion included), split the
    * conjunction, and translate what translates into V1 filters for
    * classification. Untranslatable conjuncts simply don't help classify —
    * correctness rides the keep-filter, never this. The Boolean reports
    * COMPLETENESS (every conjunct translated): only then do the filters
    * exactly equal the condition, the precondition for chunk surgery. */
  private def translateCond(spark: SparkSession, dir: String, cond: Column,
      readOptions: Map[String, String]): (Array[Filter], Boolean) = {
    val df = spark.read.format("nimble").options(readOptions).load(dir)
    val resolved = df.filter(cond).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(return (Array.empty, false))
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cs = conjuncts(resolved)
    val translated = cs.flatMap(translate)
    (translated.toArray, translated.length == cs.length)
  }

  /** Catalyst → V1 `sources.Filter`, the subset classification understands.
    * Mirrors Spark's own DataSourceStrategy translation for flat columns. */
  private def translate(e: Expression): Option[Filter] = {
    def ext(l: Literal): Any = CatalystTypeConverters.convertToScala(l.value, l.dataType)
    def name(a: Attribute): String = a.name
    e match {
      case expressions.EqualTo(a: Attribute, l: Literal) => Some(EqualTo(name(a), ext(l)))
      case expressions.EqualTo(l: Literal, a: Attribute) => Some(EqualTo(name(a), ext(l)))
      case expressions.EqualNullSafe(a: Attribute, l: Literal) => Some(EqualNullSafe(name(a), ext(l)))
      case expressions.EqualNullSafe(l: Literal, a: Attribute) => Some(EqualNullSafe(name(a), ext(l)))
      case expressions.GreaterThan(a: Attribute, l: Literal) => Some(GreaterThan(name(a), ext(l)))
      case expressions.GreaterThan(l: Literal, a: Attribute) => Some(LessThan(name(a), ext(l)))
      case expressions.GreaterThanOrEqual(a: Attribute, l: Literal) => Some(GreaterThanOrEqual(name(a), ext(l)))
      case expressions.GreaterThanOrEqual(l: Literal, a: Attribute) => Some(LessThanOrEqual(name(a), ext(l)))
      case expressions.LessThan(a: Attribute, l: Literal) => Some(LessThan(name(a), ext(l)))
      case expressions.LessThan(l: Literal, a: Attribute) => Some(GreaterThan(name(a), ext(l)))
      case expressions.LessThanOrEqual(a: Attribute, l: Literal) => Some(LessThanOrEqual(name(a), ext(l)))
      case expressions.LessThanOrEqual(l: Literal, a: Attribute) => Some(GreaterThanOrEqual(name(a), ext(l)))
      case expressions.In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(In(name(a), vs.map(v => ext(v.asInstanceOf[Literal])).toArray))
      case expressions.InSet(a: Attribute, set) =>
        Some(In(name(a), set.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType)).toArray))
      case expressions.IsNull(a: Attribute) => Some(IsNull(name(a)))
      case expressions.IsNotNull(a: Attribute) => Some(IsNotNull(name(a)))
      case expressions.StartsWith(a: Attribute, Literal(v, _)) if v != null =>
        Some(StringStartsWith(name(a), v.toString))
      case expressions.EndsWith(a: Attribute, Literal(v, _)) if v != null =>
        Some(StringEndsWith(name(a), v.toString))
      case expressions.Contains(a: Attribute, Literal(v, _)) if v != null =>
        Some(StringContains(name(a), v.toString))
      case expressions.Not(inner) => translate(inner).map(Not(_))
      case expressions.Or(l, r) => for (lf <- translate(l); rf <- translate(r)) yield Or(lf, rf)
      case expressions.And(l, r) => for (lf <- translate(l); rf <- translate(r)) yield And(lf, rf)
      case Literal(true, org.apache.spark.sql.types.BooleanType) => Some(AlwaysTrue())
      case Literal(false, org.apache.spark.sql.types.BooleanType) => Some(AlwaysFalse())
      case _ => None
    }
  }

  /** V1 filter → Column (for the keep-filter built from SQL DELETE's
    * already-translated predicates). Exact names via backtick quoting. */
  private[graft] def toColumn(f: Filter): Column = {
    def c(a: String): Column = col(s"`$a`")
    f match {
      case EqualTo(a, v) => c(a) === lit(v)
      case EqualNullSafe(a, v) => c(a) <=> lit(v)
      case GreaterThan(a, v) => c(a) > lit(v)
      case GreaterThanOrEqual(a, v) => c(a) >= lit(v)
      case LessThan(a, v) => c(a) < lit(v)
      case LessThanOrEqual(a, v) => c(a) <= lit(v)
      case In(a, vs) => c(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => c(a).isNull
      case IsNotNull(a) => c(a).isNotNull
      case StringStartsWith(a, v) => c(a).startsWith(v)
      case StringEndsWith(a, v) => c(a).endsWith(v)
      case StringContains(a, v) => c(a).contains(v)
      case And(l, r) => toColumn(l) && toColumn(r)
      case Or(l, r) => toColumn(l) || toColumn(r)
      case Not(inner) => !toColumn(inner)
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case other => throw new IllegalArgumentException(
        s"nimble: delete: untranslatable pushed filter $other")
    }
  }
}
