package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Half-up integer division by a positive power of ten — the unscaled-long
  * mirror of `Decimal.changePrecision`'s HALF_UP scale reduction. Exact for
  * any long: truncating division after adding half the divisor away from
  * zero reproduces BigDecimal HALF_UP digit-for-digit, because the input IS
  * the exact unscaled integer (no binary fraction involved). Callers prove
  * `|child| + divisor/2` cannot overflow (the narrowing rule's bound
  * analysis caps every intermediate at 2^62). */
case class RoundedShiftRight(child: Expression, divisor: Long)
    extends UnaryExpression {
  require(divisor >= 10 && divisor % 10 == 0, s"divisor must be a power of ten >= 10: $divisor")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rounded_shift_right"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    val h = divisor / 2
    (if (x >= 0L) x + h else x - h) / divisor
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(($c >= 0L ? $c + ${divisor / 2}L : $c - ${divisor / 2}L) / ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stats-proven decimal aggregate narrowing.
  *
  * Spark's own `DecimalAggregates` turns `sum(decimal)` into a long-typed
  * unscaled sum only when the TYPE alone proves no overflow (precision <= 8,
  * so precision+10 digits fit a long). Analytics queries — TPC-H Q1's
  * `sum(cast(x as decimal(18,2)) * ...)` — miss that window and pay
  * BigDecimal buffer arithmetic per row, ~2x the aggregation cost.
  *
  * This rule proves the same safety from DATA, not types: nimble footer
  * stats (per-column min/max + exact row counts, already maintained for
  * pruning and the CBO — reference: dwio/nimble/tablet/TabletReader.h stats
  * sections) bound every intermediate and the final sum. When the whole
  * expression tree provably fits in unscaled longs, the per-row decimal
  * arithmetic and the sum buffer are rewritten to pure long arithmetic —
  * bit-exact, because unscaled(a*b) = unscaled(a)*unscaled(b) when Spark's
  * result type keeps full scale, and declared scale reductions are HALF_UP
  * integer divisions ([[RoundedShiftRight]]).
  *
  * Exactness argument, node by node (decline anything else):
  *  - `Cast(double/float -> decimal)` stays AS IS wrapped in
  *    `UnscaledValue` — the identical Cast evaluates at runtime, so
  *    rounding/overflow/NaN behavior is the original's by construction.
  *  - `Cast(integral -> decimal(p,s))` becomes `child * 10^s` in longs;
  *    declined unless stats prove |child|*10^s < 10^p (no overflow branch).
  *  - `Multiply/Add/Subtract/UnaryMinus` over decimals become long ops at
  *    the sum of/max of child scales; when Spark's declared result scale is
  *    smaller (precision-loss mode), the difference is a HALF_UP power-of-ten
  *    division — exact on unscaled integers. Declined when stats cannot
  *    prove the declared precision holds (where the original would
  *    null/throw) or any intermediate could exceed 2^62.
  *  - `Sum` becomes `Sum(long)` + `MakeDecimal` — declined unless
  *    rowCount * perRowBound < 10^min(18, sumPrecision), which also rules
  *    out long overflow across every partial/merge split (the bound covers
  *    the TOTAL, so any partitioning of partials is safe). The long ops are
  *    built in LEGACY eval mode deliberately: overflow is proven impossible,
  *    so ANSI's per-op checks would only cost cycles.
  *
  * At 100 TB the guard degrades gracefully: row counts in the trillions make
  * the bound exceed 10^18 and the rule declines — exact decimal semantics
  * are never traded for speed; the fast path simply applies wherever stats
  * prove it free. Scoped to aggregates directly over a nimble relation
  * (through Project/Filter/SubqueryAlias), where those stats exist.
  */
object DecimalNarrowing extends Rule[LogicalPlan] {

  /** Session kill-switch: spark.graft.decimalNarrowing (default true). */
  private def enabled: Boolean =
    try SQLConf.get.getConfString("spark.graft.decimalNarrowing", "true").toBoolean
    catch { case _: Exception => true }

  /** Install as a session-local extra optimization (idempotent) — the
    * non-extensions path used by [[graft.Tables]]; cluster deployments get
    * the same rule via `spark.sql.extensions=graft.spark.GraftExtensions`. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(DecimalNarrowing))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DecimalNarrowing

  /** Rewrites fired since JVM start (spec observability). */
  val rewrites = new java.util.concurrent.atomic.AtomicLong()

  private val MaxRaw = BigInt(1) << 62 // headroom for +divisor/2 and negation
  private def pow10(n: Int): BigInt = BigInt(10).pow(n)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg: Aggregate if hasCandidateSum(agg) =>
        statsFor(agg.child) match {
          case Some(st) => rewrite(agg, st)
          case None => agg
        }
    }
  }

  private def hasCandidateSum(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(_.exists {
      case AggregateExpression(Sum(e, _), _, false, _, _) =>
        e.dataType.isInstanceOf[DecimalType]
      case _ => false
    })

  /** Attribute bounds + a SOUND row-count upper bound for the subtree:
    * None when the plan shape is anything we cannot see stats through. */
  private case class TableStats(rowCount: BigInt,
      boundOf: ExprId => Option[java.math.BigDecimal])

  private def statsFor(plan: LogicalPlan): Option[TableStats] = plan match {
    case SubqueryAlias(_, c) => statsFor(c)
    case Filter(_, c) => statsFor(c) // filters only shrink the row set: bounds stay valid
    case s: Sort => statsFor(s.child)
    case l: GlobalLimit => statsFor(l.child)
    case l: LocalLimit => statsFor(l.child)
    case d: Distinct => statsFor(d.child)
    case h: ResolvedHint => statsFor(h.child)
    case w: Window => statsFor(w.child) // window outputs get fresh ids -> unbounded, attrs pass
    case a: Aggregate =>
      // grouped output rows <= child rows; grouping attrs keep their ids and
      // bounds, aggregate outputs get fresh ids and simply miss
      statsFor(a.child)
    case Project(projectList, c) =>
      statsFor(c).map { st =>
        // aliases of bare attributes forward to the underlying bound;
        // pass-through attributes keep their ids; computed columns miss
        val aliasOf = projectList.collect {
          case al @ Alias(ar: AttributeReference, _) => al.exprId -> ar.exprId
        }.toMap
        st.copy(boundOf = id => st.boundOf(aliasOf.getOrElse(id, id)))
      }
    case u: Union =>
      // UNION ALL: rows add; output attr i carries the HEAD child's exprId
      // (Union.output transposes children.output taking head ids), so the
      // per-attr bound must cover the column at position i of EVERY child.
      // Type coercion between mismatched children materializes as Cast
      // projects inside the children, whose computed columns miss bounds in
      // the Project arm — same-typed unions pass through, coerced ones
      // decline via a missing bound, never via an unsound one.
      val childStats = u.children.map(statsFor)
      if (childStats.exists(_.isEmpty)) None
      else {
        val sts = childStats.map(_.get)
        val posOf = u.children.head.output.map(_.exprId).zipWithIndex.toMap
        Some(TableStats(sts.map(_.rowCount).sum, id => posOf.get(id).flatMap { i =>
          val bounds = u.children.lazyZip(sts).map { (c, st) =>
            if (i < c.output.length) st.boundOf(c.output(i).exprId) else None
          }
          if (bounds.exists(_.isEmpty)) None
          else Some(bounds.flatten.reduce((a, b) => if (a.compareTo(b) >= 0) a else b))
        }))
      }
    case j: Join =>
      // universal sound bound: no join type exceeds (|L|+1) * (|R|+1) output
      // rows (cartesian worst case; the +1 covers outer-join null rows of an
      // empty side). Outer-introduced NULLs contribute nothing to sums, so
      // per-attribute bounds carry over unchanged. Conservative by design —
      // at 100 TB the product blows the 10^18 gate and the rule declines.
      for (l <- statsFor(j.left); r <- statsFor(j.right))
        yield TableStats((l.rowCount + 1) * (r.rowCount + 1),
          id => l.boundOf(id).orElse(r.boundOf(id)))
    case sr: DataSourceV2ScanRelation if sr.relation.table.isInstanceOf[NimbleTable] =>
      sr.scan match {
        // bounds MUST derive from the exact file snapshot the scan will
        // execute: NimbleScan pins its listing once per instance (forced
        // here, reused verbatim by planInputPartitions), so a file appended
        // after this proof can never be scanned by the rewritten plan
        case ns: NimbleScan =>
          (try Some(ns.pinnedMetas) catch { case _: Exception => None })
            .flatMap(buildStats(sr.relation.table.asInstanceOf[NimbleTable], sr.output, _))
        case _ => None
      }
    // NOTE: no bare DataSourceV2Relation arm. Pre-pushdown there is no Scan
    // to pin a snapshot on, so a bound proven from a fresh listing could
    // cover fewer files than the scan later executes (TOCTOU — appended rows
    // would run unchecked long arithmetic). V2ScanRelationPushDown always
    // runs before user-provided optimizer rules, so declining here costs
    // nothing in practice.
    case _ => None
  }

  /** Per-(table files signature) cache of column bounds: the optimizer — and
    * AQE's per-stage re-optimization — may run this rule several times per
    * query; footer metadata is cheap but not free at 100k files. Keyed by
    * the FULL signature string (a 32-bit hash could collide and serve
    * another snapshot's bounds — a soundness hole, not a perf bug) and
    * cleared when it grows past a few hundred snapshots so a long-lived
    * driver rewriting tables does not leak. */
  private val boundsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (BigInt, java.util.concurrent.ConcurrentHashMap[String, Option[java.math.BigDecimal]])]()

  private def buildStats(table: NimbleTable, output: Seq[Attribute],
      metas: Seq[graft.format.GraftIO.FileMeta]): Option[TableStats] = {
    val path = table.dirPath
    val unsigned = table.unsignedCols
    if (metas.isEmpty) return None
    // SHA-256 of the full signature: collision-sound like the full string
    // (a 32-bit hashCode was not) at 32 bytes per key instead of multi-MB
    // on a 100k-file table
    val sigText = path + "|" + metas.map(m => s"${m.path}:${m.length}:${m.mtime}").mkString(",")
    val sig = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(sigText.getBytes("UTF-8")))
    if (boundsCache.size > 512) boundsCache.clear()
    val (rowCount, colCache) = boundsCache.computeIfAbsent(sig, { _ =>
      var rows = BigInt(0)
      for (m <- metas) rows += BigInt(NimbleSource.footerOf(m.path).rowCount)
      (rows, new java.util.concurrent.ConcurrentHashMap[String, Option[java.math.BigDecimal]]())
    })
    val byId = output.map(a => a.exprId -> a).toMap
    def maxAbs(id: ExprId): Option[java.math.BigDecimal] =
      byId.get(id).flatMap { a =>
        colCache.computeIfAbsent(a.name, { _ =>
          if (unsigned.contains(a.name)) None
          else a.dataType match {
            case dt @ (DoubleType | FloatType | ByteType | ShortType | IntegerType | LongType) =>
              columnMaxAbs(metas, a.name, dt)
            case dt: DecimalType if dt.precision <= 18 =>
              // stored unscaled-long stream: stats come back in UNSCALED units
              columnMaxAbs(metas, a.name, dt)
            case _ => None
          }
        })
      }
    Some(TableStats(rowCount, maxAbs))
  }

  /** Merge |min|/|max| across every file's footer stats; None when any file
    * with non-null values lacks usable bounds (legacy stats, nanos split,
    * non-finite extremes). Absent or all-null columns contribute nothing —
    * their rows read as null and nulls vanish in sums either way. */
  private def columnMaxAbs(metas: Seq[graft.format.GraftIO.FileMeta], name: String,
      dt: DataType): Option[java.math.BigDecimal] = {
    var acc = java.math.BigDecimal.ZERO
    for (m <- metas) {
      val rd = new graft.format.Tablet.Reader(m.path, NimbleSource.footerOf(m.path))
      try {
        if (rd.nanosSplit(name)) return None // stream stats are micros, not the logical value
        rd.fileStatsOf(name) match {
          case None => () // column absent from this file (schema evolution): all null
          case Some(s) if s.valueCount == s.nullCount => () // all null here
          case Some(s) if !s.hasMinMax => return None
          case Some(s) =>
            val fileMax = dt match {
              case DoubleType | FloatType =>
                if (java.lang.Double.isInfinite(s.minDouble) || java.lang.Double.isInfinite(s.maxDouble))
                  return None
                // exact binary expansion — valueOf's shortest-repr could
                // understate the true value by an ulp
                new java.math.BigDecimal(math.max(math.abs(s.minDouble), math.abs(s.maxDouble)))
              case _ =>
                // NOT math.abs: |Long.MinValue| overflows and would silently
                // UNDER-bound the column
                java.math.BigDecimal.valueOf(s.minLong).abs()
                  .max(java.math.BigDecimal.valueOf(s.maxLong).abs())
            }
            if (fileMax.compareTo(acc) > 0) acc = fileMax
        }
      } finally rd.close()
    }
    Some(acc)
  }

  // ---- the longized expression: value * 10^scale as a long, plus the
  // ---- stats-proven bound on its absolute value
  private case class L(expr: Expression, scale: Int, bound: BigInt)

  private def rewrite(agg: Aggregate, st: TableStats): LogicalPlan =
    agg.transformExpressions {
      case ae @ AggregateExpression(s @ Sum(e, _), _, false, _, _)
          if e.dataType.isInstanceOf[DecimalType] =>
        trySum(ae, s, e, st).getOrElse(ae)
    }

  private def trySum(ae: AggregateExpression, s: Sum, e: Expression,
      st: TableStats): Option[Expression] =
    longize(e, st).flatMap { l =>
      val sumDt = s.dataType.asInstanceOf[DecimalType]
      val prec = math.min(18, sumDt.precision)
      val total = l.bound * st.rowCount.max(1)
      if (sumDt.scale != l.scale || l.scale > prec || total >= pow10(prec)) None
      else {
        rewrites.incrementAndGet()
        Some(Cast(MakeDecimal(
          ae.copy(aggregateFunction =
            Sum(l.expr, NumericEvalContext(EvalMode.LEGACY))), prec, l.scale), sumDt))
      }
    }

  private def longize(e: Expression, st: TableStats): Option[L] = e match {
    case a: AttributeReference if a.dataType.isInstanceOf[DecimalType] =>
      // STORED decimal column: the format keeps Decimal(<=18) as an
      // unscaled I64 stream (Fields.physOf), so footer min/max ARE the
      // unscaled bounds and UnscaledValue(attr) is a raw long read
      val dt = a.dataType.asInstanceOf[DecimalType]
      if (dt.precision > 18) None
      else maxAbsOf(a, st).flatMap { m =>
        // Trust the STATS, not the declared precision: a stored column whose
        // unscaled min/max exceed 10^p-1 (corrupt file, foreign writer) has
        // no retained runtime op that would null/throw on those values, so
        // clamping the bound to the precision cap would under-bound the
        // overflow proof. Decline instead.
        val b = ceilBig(m)
        if (b > pow10(dt.precision) - 1) None
        else Some(L(UnscaledValue(a), dt.scale, b))
      }
    case c @ Cast(a: AttributeReference, dt: DecimalType, _, _) =>
      a.dataType match {
        case DoubleType | FloatType =>
          // keep the original Cast (exact semantics for free) and read its
          // unscaled long; bound: HALF_UP(|x|*10^s) <= ceil + 1, clamped to
          // the precision cap (overflow -> null in legacy / throw in ANSI,
          // identically in both plans, so surviving values fit p digits)
          maxAbsOf(a, st).flatMap { m =>
            val raw = ceilBig(m.multiply(java.math.BigDecimal.TEN.pow(dt.scale))) + 1
            // overflow of (p,s) nulls/throws identically in both plans, so
            // the surviving-value bound may clamp to the precision cap; but
            // UnscaledValue itself only works when that cap fits a LONG —
            // a decimal(38,s) value with unscaled > Long.MaxValue casts
            // FINE in the original plan and would throw in ours. Every L
            // must be born with bound <= MaxRaw (the invariant all the
            // arithmetic guards build on), so decline instead of clamping
            // past it.
            val b = raw.min(pow10(dt.precision) - 1)
            if (b > MaxRaw) None else Some(L(UnscaledValue(c), dt.scale, b))
          }
        case ByteType | ShortType | IntegerType | LongType =>
          // integral casts are value-exact; longize as child * 10^s. Decline
          // when the cast could overflow p digits (we will not replicate the
          // null/throw branch in long math).
          if (dt.scale > 18) None // 10^scale multiplier beyond long
          else maxAbsOf(a, st).flatMap { m =>
            val raw = ceilBig(m) * pow10(dt.scale)
            if (raw >= pow10(dt.precision) || raw > MaxRaw) None
            else Some(L(
              Multiply(Cast(a, LongType), Literal(pow10(dt.scale).toLong), EvalMode.LEGACY),
              dt.scale, raw))
          }
        case _: DecimalType =>
          // stored decimal re-cast: recurse so the unscaled-stream leaf
          // serves it (the catch-all below would otherwise swallow attr
          // children and make the decimal->decimal case unreachable)
          longize(a, st).flatMap(reconcile(_, dt))
        case _ => None
      }
    case c @ Cast(a, dt: DecimalType, _, _) if a.dataType.isInstanceOf[DecimalType] =>
      longize(a, st).flatMap(reconcile(_, dt))
    case Literal(null, dt: DecimalType) => Some(L(Literal(null, LongType), dt.scale, BigInt(0)))
    case Literal(v: Decimal, dt: DecimalType) =>
      // check through BigInteger first: toUnscaledLong throws on literals
      // beyond long range (e.g. a decimal(21,1) constant) and an optimizer
      // rule must decline, never crash the query
      val unscaled = BigInt(v.toBigDecimal.underlying.unscaledValue())
      if (unscaled.abs > MaxRaw) None
      else Some(L(Literal(unscaled.toLong), dt.scale, unscaled.abs))
    case m @ Multiply(a, b, _) if m.dataType.isInstanceOf[DecimalType] =>
      for {
        la <- longize(a, st); lb <- longize(b, st)
        if la.bound * lb.bound <= MaxRaw
        r <- reconcile(L(Multiply(la.expr, lb.expr, EvalMode.LEGACY),
          la.scale + lb.scale, la.bound * lb.bound), m.dataType.asInstanceOf[DecimalType])
      } yield r
    case ad @ Add(a, b, _) if ad.dataType.isInstanceOf[DecimalType] =>
      binAdd(a, b, st, ad.dataType.asInstanceOf[DecimalType],
        (x, y) => Add(x, y, EvalMode.LEGACY))
    case sb @ Subtract(a, b, _) if sb.dataType.isInstanceOf[DecimalType] =>
      binAdd(a, b, st, sb.dataType.asInstanceOf[DecimalType],
        (x, y) => Subtract(x, y, EvalMode.LEGACY))
    case um @ UnaryMinus(a, _) if um.dataType.isInstanceOf[DecimalType] =>
      longize(a, st).flatMap(l =>
        if (l.bound > MaxRaw) None
        else reconcile(L(UnaryMinus(l.expr, failOnError = false), l.scale, l.bound),
          um.dataType.asInstanceOf[DecimalType]))
    case _ => None
  }

  private def binAdd(a: Expression, b: Expression, st: TableStats, dt: DecimalType,
      mk: (Expression, Expression) => Expression): Option[L] =
    for {
      la <- longize(a, st); lb <- longize(b, st)
      s = math.max(la.scale, lb.scale)
      la2 <- scaleUp(la, s); lb2 <- scaleUp(lb, s)
      if la2.bound + lb2.bound <= MaxRaw
      r <- reconcile(L(mk(la2.expr, lb2.expr), s, la2.bound + lb2.bound), dt)
    } yield r

  private def scaleUp(l: L, to: Int): Option[L] =
    if (to == l.scale) Some(l)
    else if (to - l.scale > 18) None // 10^19 no longer fits a long multiplier
    else {
      val m = pow10(to - l.scale)
      val b = l.bound * m
      if (b > MaxRaw) None
      else l.expr match {
        // constant folding already ran by the time this rule fires
        case Literal(null, LongType) => Some(L(Literal(null, LongType), to, b))
        case Literal(v: java.lang.Long, LongType) => Some(L(Literal(v * m.toLong), to, b))
        case e => Some(L(Multiply(e, Literal(m.toLong), EvalMode.LEGACY), to, b))
      }
    }

  /** Force the longized value to the node's DECLARED decimal type: pad or
    * HALF_UP-reduce the scale, then require stats to prove the declared
    * precision always holds (where Spark would null/throw, we decline). */
  private def reconcile(l: L, dt: DecimalType): Option[L] = {
    val adjusted =
      if (dt.scale == l.scale) Some(l)
      else if (dt.scale < l.scale) {
        if (l.scale - dt.scale > 18) None // divisor beyond long range
        else {
          val d = pow10(l.scale - dt.scale)
          Some(L(RoundedShiftRight(l.expr, d.toLong), dt.scale, l.bound / d + 1))
        }
      } else scaleUp(l, dt.scale)
    adjusted.filter(a => a.bound < pow10(dt.precision) && a.bound <= MaxRaw)
  }

  private def maxAbsOf(a: AttributeReference, st: TableStats): Option[java.math.BigDecimal] =
    st.boundOf(a.exprId)

  private def ceilBig(bd: java.math.BigDecimal): BigInt =
    BigInt(bd.abs.setScale(0, java.math.RoundingMode.CEILING).toBigInteger)
}
