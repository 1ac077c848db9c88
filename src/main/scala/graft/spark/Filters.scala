package graft.spark

import graft.format._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pushed-filter evaluation: stripe pruning from footer stats and row-level
  * evaluation on decoded columns.
  *
  * Mirrors the reference's ScanSpec filter application during decode
  * (reference: dwio/nimble/velox/selective/ColumnReader.*,
  * docs/develop/nimble_selective_reader.rst:159-213): each pushed filter
  * narrows the surviving row set before vectors are built. Stripe pruning is
  * the ClusterIndex/chunk-stats analog (reference: dwio/nimble/index/ClusterIndex.h:76,
  * tablet/ChunkStats.fbs) driven by footer min/max.
  */
object Filters {

  /** Does the tree hold an In with a NULL element? Such an In evaluates
    * NULL even on NON-null column values (the null element's comparison),
    * which the two-valued evaluators here cannot represent: compile()
    * returns false for both FALSE and NULL, and its Not recovers null-ness
    * from the REFERENCED COLUMNS only — a null LITERAL slips that guard, so
    * NOT(u IN (1, NULL)) would wrongly claim TRUE on non-null u where SQL
    * says NULL (never true). Every proof/claim surface refuses such trees
    * outright: supported() leaves them to Spark, allMatchStripe() never
    * proves them, Surgery falls back to the Spark rewrite (whose Column
    * keep-filter is natively three-valued). */
  private[graft] def hasNullInLiteral(f: Filter): Boolean = f match {
    case In(_, vs) => vs.contains(null)
    case And(l, r) => hasNullInLiteral(l) || hasNullInLiteral(r)
    case Or(l, r) => hasNullInLiteral(l) || hasNullInLiteral(r)
    case Not(c) => hasNullInLiteral(c)
    case _ => false
  }

  /** Is this filter fully evaluable by our scan (so Spark need not re-run it)? */
  def supported(f: Filter, atomicCols: Set[String]): Boolean = f match {
    case EqualTo(a, _) => atomicCols(a)
    case EqualNullSafe(a, _) => atomicCols(a)
    case GreaterThan(a, _) => atomicCols(a)
    case GreaterThanOrEqual(a, _) => atomicCols(a)
    case LessThan(a, _) => atomicCols(a)
    case LessThanOrEqual(a, _) => atomicCols(a)
    // an In carrying a NULL element stays residual (see hasNullInLiteral);
    // positive evaluation would be exact, but a claimed filter may sit
    // under a later Not and the blanket refusal is the simple sound rule
    case In(a, vs) => atomicCols(a) && !vs.contains(null)
    case IsNull(a) => atomicCols(a)
    case IsNotNull(a) => atomicCols(a)
    case StringStartsWith(a, _) => atomicCols(a)
    case StringEndsWith(a, _) => atomicCols(a)
    case StringContains(a, _) => atomicCols(a)
    case And(l, r) => supported(l, atomicCols) && supported(r, atomicCols)
    case Or(l, r) => supported(l, atomicCols) && supported(r, atomicCols)
    case Not(c) => supported(c, atomicCols)
    case AlwaysTrue() | AlwaysFalse() => true
    case _ => false
  }

  /** External literal -> internal primitive comparable against decoded data. */
  private def toLong(v: Any): Long = v match {
    case b: Boolean => if (b) 1L else 0L
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case d: java.sql.Date => org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp => org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case t: java.time.Instant => org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t)
    case t: java.time.LocalDateTime => org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t)
    case d: java.math.BigDecimal => d.unscaledValue().longValueExact()
    case d: BigDecimal => d.underlying().unscaledValue().longValueExact()
    case other => throw new IllegalArgumentException(s"not an integral literal: $other (${other.getClass})")
  }
  private def toDouble(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case other => toLong(other).toDouble
  }
  private def toBytes(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes("UTF-8")
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
    case other => other.toString.getBytes("UTF-8")
  }

  // ----------------------------------------------------- stripe pruning

  /** True if the stripe can be skipped: the filter provably matches no row.
    * Conservative: returns false when unsure. Equality/In predicates consult
    * the stripe Bloom filter when the column has one (reference:
    * dwio/nimble/index/BloomFilter.h:34). */
  def pruneStripe(f: Filter, stats: String => Option[Tablet.Stats],
      bloom: String => Option[Tablet.Bloom] = _ => None): Boolean = {
    // a comparison never matches a NULL row, so a provably all-null stripe
    // prunes every comparison leaf (r17 — the shape flatmap feature
    // projections and schema-evolved children produce; valueCount > 0
    // guards the stats-absent degenerate)
    def allNull(a: String): Boolean =
      stats(a).exists(s => s.valueCount > 0 && s.nullCount == s.valueCount)
    f match {
    case And(l, r) => pruneStripe(l, stats, bloom) || pruneStripe(r, stats, bloom)
    case Or(l, r) => pruneStripe(l, stats, bloom) && pruneStripe(r, stats, bloom)
    case IsNull(a) => stats(a).exists(s => s.nullCount == 0)
    case IsNotNull(a) => allNull(a)
    case EqualTo(a, v) =>
      outsideRange(a, v, stats, lo = true, hi = true) || bloomAbsent(a, v, stats, bloom) ||
        allNull(a)
    case EqualNullSafe(a, v) if v != null =>
      outsideRange(a, v, stats, lo = true, hi = true) || bloomAbsent(a, v, stats, bloom) ||
        allNull(a)
    case GreaterThan(a, v) => aboveMax(a, v, stats, orEqual = true) || allNull(a)
    case GreaterThanOrEqual(a, v) => aboveMax(a, v, stats, orEqual = false) || allNull(a)
    case LessThan(a, v) => belowMin(a, v, stats, orEqual = true) || allNull(a)
    case LessThanOrEqual(a, v) => belowMin(a, v, stats, orEqual = false) || allNull(a)
    case In(a, vs) =>
      // a null element never matches any row (SQL three-valued logic), so it
      // doesn't extend the matchable set
      (vs.nonEmpty && vs.forall(v => v == null ||
        outsideRange(a, v, stats, lo = true, hi = true) || bloomAbsent(a, v, stats, bloom))) ||
        allNull(a)
    case StringStartsWith(a, v) =>
      // a value with prefix p is >= p and shares its first |p| bytes, so a
      // stripe/chunk is skippable when max < p, or when min's first |p|
      // bytes already compare above p. Stats byte values are truncated at
      // 64B: the min side stays exact for |p| <= 64 (prefix dominance); the
      // max side is only trusted untruncated.
      stats(a).exists { s =>
        s.hasMinMax && s.kind == PhysType.Bytes && s.minBytes != null && s.maxBytes != null && {
          val p = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          p.length <= 64 && {
            val minHead = if (s.minBytes.length <= p.length) s.minBytes
              else java.util.Arrays.copyOf(s.minBytes, p.length)
            val minAbove = Tablet.compareBytes(minHead, p) > 0
            val maxBelow = s.maxBytes.length < 64 && Tablet.compareBytes(s.maxBytes, p) < 0
            minAbove || maxBelow
          }
        }
      }
    case AlwaysFalse() => true
    case _ => false
  } }

  /** True if the filter provably matches EVERY row of the stripe — the
    * all-match side of filtered aggregate pushdown (ValueHook-lite;
    * reference: velox/selective/ColumnLoader.h:42,
    * docs/develop/nimble_selective_reader.rst:756-769). Conservative: false
    * when unsure. Null rows never satisfy a comparison, so every comparison
    * leaf also requires a null-free stripe; float/double leaves refuse when
    * NaN is present (NaN ordering differs between engines). */
  def allMatchStripe(f: Filter, stats: String => Option[Tablet.Stats]): Boolean = {
    def noNulls(a: String) = stats(a).exists(_.nullCount == 0)
    def noNaN(a: String) = stats(a).exists(s =>
      !(s.kind == PhysType.F32 || s.kind == PhysType.F64) || !s.hasNaN)
    f match {
      case And(l, r) => allMatchStripe(l, stats) && allMatchStripe(r, stats)
      // either side matching every row is sufficient (conservative)
      case Or(l, r) => allMatchStripe(l, stats) || allMatchStripe(r, stats)
      // Not(inner) matches a row only when inner is FALSE there, not null —
      // so inner must match no row, the referenced columns must carry no
      // nulls, AND inner must be free of null IN-literals (those make inner
      // NULL — never FALSE — on every non-matching row, so Not never holds)
      case Not(inner) =>
        pruneStripe(inner, stats) && inner.references.forall(noNulls) &&
          !hasNullInLiteral(inner)
      case IsNotNull(a) => noNulls(a)
      case IsNull(a) => stats(a).exists(s => s.valueCount > 0 && s.nullCount == s.valueCount)
      case GreaterThan(a, v) => noNulls(a) && noNaN(a) && belowMin(a, v, stats, orEqual = false)
      case GreaterThanOrEqual(a, v) => noNulls(a) && noNaN(a) && belowMin(a, v, stats, orEqual = true)
      case LessThan(a, v) => noNulls(a) && noNaN(a) && aboveMax(a, v, stats, orEqual = false)
      case LessThanOrEqual(a, v) => noNulls(a) && noNaN(a) && aboveMax(a, v, stats, orEqual = true)
      case EqualTo(a, v) => noNulls(a) && constEquals(a, v, stats)
      case EqualNullSafe(a, v) if v != null => noNulls(a) && constEquals(a, v, stats)
      case In(a, vs) => noNulls(a) && vs.exists(v => v != null && constEquals(a, v, stats))
      case StringStartsWith(a, v) =>
        // min and max both starting with p implies every value between does;
        // stored stats bytes are (possibly truncated) prefixes of the actual
        // extremes, so a prefix check against them transfers to the values
        noNulls(a) && statsFor(a, stats).exists { s =>
          s.hasMinMax && s.kind == PhysType.Bytes &&
            s.minBytes != null && s.maxBytes != null && {
              val p = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              p.length <= s.minBytes.length && p.length <= s.maxBytes.length &&
                regionEquals(s.minBytes, 0, p) && regionEquals(s.maxBytes, 0, p)
            }
        }
      case AlwaysTrue() => true
      case _ => false
    }
  }

  /** Every non-null row equals `v`: min == max == v, exactly representable. */
  private def constEquals(a: String, v: Any, stats: String => Option[Tablet.Stats]): Boolean =
    statsFor(a, stats).exists { s =>
      s.hasMinMax && (s.kind match {
        case PhysType.F32 | PhysType.F64 =>
          !s.hasNaN && { val x = toDouble(v); s.minDouble == x && s.maxDouble == x }
        case PhysType.Bytes =>
          val x = toBytes(v)
          s.minBytes != null && s.maxBytes != null &&
            s.minBytes.length < 64 && s.maxBytes.length < 64 &&
            java.util.Arrays.equals(s.minBytes, x) && java.util.Arrays.equals(s.maxBytes, x)
        case PhysType.Bool => false
        case _ =>
          try { val x = toLong(v); s.minLong == x && s.maxLong == x }
          catch { case _: IllegalArgumentException => false }
      })
    }

  /** Definitely-absent per the stripe's Bloom filter. Hashing must mirror the
    * writer (Tablet.hashLongValue / hashBytesValue on the stored physical
    * representation); doubles/bools carry no bloom. */
  private def bloomAbsent(a: String, v: Any, stats: String => Option[Tablet.Stats],
      bloom: String => Option[Tablet.Bloom]): Boolean =
    bloom(a).exists { b =>
      stats(a).exists { s =>
        s.kind match {
          case PhysType.Bytes => !b.mightContain(Tablet.hashBytesValue(toBytes(v), 0, toBytes(v).length))
          case PhysType.F32 | PhysType.F64 | PhysType.Bool => false
          case _ =>
            try !b.mightContain(Tablet.hashLongValue(toLong(v)))
            catch { case _: IllegalArgumentException => false }
        }
      }
    }

  /** All-null stripes fail any comparison. */
  private def statsFor(a: String, stats: String => Option[Tablet.Stats]): Option[Tablet.Stats] = stats(a)

  private def outsideRange(a: String, v: Any, stats: String => Option[Tablet.Stats], lo: Boolean, hi: Boolean): Boolean =
    statsFor(a, stats).exists { s =>
      // all nulls -> comparison never true; but a no-min/max stripe may be
      // all-NaN (stats exclude NaN), and NaN = NaN is TRUE in Spark
      if (!s.hasMinMax) s.valueCount > 0 && !s.hasNaN
      else s.kind match {
        case PhysType.F32 | PhysType.F64 =>
          val x = toDouble(v)
          // a NaN literal matches exactly the NaN rows, which min/max never
          // describe: prune iff the stripe provably holds no NaN
          if (x.isNaN) !s.hasNaN
          else x < s.minDouble || x > s.maxDouble
        case PhysType.Bytes =>
          val x = toBytes(v)
          // maxBytes may be truncated at 64B: only prune on the low side
          // definitively; on the high side require untruncated max.
          Tablet.compareBytes(x, s.minBytes) < 0 ||
            (s.maxBytes.length < 64 && Tablet.compareBytes(x, s.maxBytes) > 0)
        case PhysType.Bool => false
        case _ =>
          val x = toLong(v); x < s.minLong || x > s.maxLong
      }
    }

  /** filter col > v (orEqual=false: col >= v): prune if v above stripe max.
    * NaN sorts GREATER than every value in Spark, so a stripe containing
    * NaN can never prune here — its NaN rows satisfy col > v for any v
    * (min/max stats exclude NaN; only hasNaN sees those rows). */
  private def aboveMax(a: String, v: Any, stats: String => Option[Tablet.Stats], orEqual: Boolean): Boolean =
    statsFor(a, stats).exists { s =>
      if (!s.hasMinMax) s.valueCount > 0 && !s.hasNaN
      else s.kind match {
        case PhysType.F32 | PhysType.F64 =>
          val x = toDouble(v)
          !s.hasNaN && (if (orEqual) s.maxDouble <= x else s.maxDouble < x)
        case PhysType.Bytes =>
          val x = toBytes(v)
          s.maxBytes.length < 64 && (if (orEqual) Tablet.compareBytes(s.maxBytes, x) <= 0 else Tablet.compareBytes(s.maxBytes, x) < 0)
        case PhysType.Bool => false
        case _ =>
          val x = toLong(v); if (orEqual) s.maxLong <= x else s.maxLong < x
      }
    }

  private def belowMin(a: String, v: Any, stats: String => Option[Tablet.Stats], orEqual: Boolean): Boolean =
    statsFor(a, stats).exists { s =>
      if (!s.hasMinMax) s.valueCount > 0
      else s.kind match {
        case PhysType.F32 | PhysType.F64 =>
          val x = toDouble(v); if (orEqual) s.minDouble >= x else s.minDouble > x
        case PhysType.Bytes =>
          val x = toBytes(v)
          if (orEqual) Tablet.compareBytes(s.minBytes, x) >= 0 else Tablet.compareBytes(s.minBytes, x) > 0
        case PhysType.Bool => false
        case _ =>
          val x = toLong(v); if (orEqual) s.minLong >= x else s.minLong > x
      }
    }

  /** Literal -> stored long/double domain, for cold-start selectivity
    * estimation only (None when the literal doesn't map — estimation then
    * falls back; row evaluation keeps its own strict conversion). */
  private[spark] def litLong(v: Any): Option[Long] =
    try Some(toLong(v)) catch { case _: Exception => None }
  private[spark] def litDouble(v: Any): Option[Double] =
    try Some(toDouble(v)) catch { case _: Exception => None }

  /** Static selectivity seed for the cascading filter decode's column
    * ordering (cold start, before observed pass rates accumulate): smaller =
    * likely more selective. Equality probes narrow hardest, ranges less,
    * IsNotNull barely at all. */
  def seedRank(f: Filter): Int = f match {
    case AlwaysFalse() => 0
    case EqualTo(_, _) | EqualNullSafe(_, _) => 1
    case In(_, _) => 2
    case IsNull(_) => 2
    case StringStartsWith(_, _) => 3
    case GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
         LessThan(_, _) | LessThanOrEqual(_, _) => 4
    case StringEndsWith(_, _) | StringContains(_, _) => 5
    case And(l, r) => math.min(seedRank(l), seedRank(r))
    case Or(l, r) => math.min(6, math.max(seedRank(l), seedRank(r)) + 1)
    case Not(_) => 7
    case IsNotNull(_) => 9
    case _ => 6
  }

  // ----------------------------------------------------- row-level eval

  /** Compile a filter into a per-row predicate over decoded columns.
    * `col(name)` returns the decoded chunk column for a referenced field. */
  def compile(f: Filter, dts: String => DataType, col: String => Column): Int => Boolean = f match {
    case And(l, r) =>
      val cl = compile(l, dts, col); val cr = compile(r, dts, col)
      i => cl(i) && cr(i)
    case Or(l, r) =>
      val cl = compile(l, dts, col); val cr = compile(r, dts, col)
      i => cl(i) || cr(i)
    case Not(c) =>
      // the reference-null guard below cannot see a null IN-LITERAL (inner
      // NULL on non-null columns); supported() keeps such filters residual
      // and Surgery refuses them, so reaching here is a caller bug — fail
      // loudly rather than silently over-match
      require(!hasNullInLiteral(c),
        s"nimble: compile: Not over a null IN-literal is not two-valued: $c")
      val cc = compile(c, dts, col)
      // SQL boolean logic: Not(null) is null (not true) — our compiled
      // predicates return false for null inputs, and Not must not turn that
      // into true when the underlying value was null. Handle by checking
      // null-ness of all referenced columns.
      val refs = c.references
      val cols = refs.map(col)
      i => {
        var anyNull = false
        var j = 0
        while (j < cols.length && !anyNull) {
          val cn = cols(j).nulls
          if (cn != null && cn(i)) anyNull = true
          j += 1
        }
        !anyNull && !cc(i)
      }
    case IsNull(a) =>
      val c = col(a)
      i => c.nulls != null && c.nulls(i)
    case IsNotNull(a) =>
      val c = col(a)
      i => c.nulls == null || !c.nulls(i)
    case AlwaysTrue() => _ => true
    case AlwaysFalse() => _ => false
    case EqualTo(a, v) => col(a) match {
      case lz: graft.format.LazyFsstBytesCol => fsstEqPred(lz, Array(toBytes(v)))
      case c => cmpPred(c, v, r => r == 0)
    }
    case EqualNullSafe(a, v) =>
      val c = col(a)
      if (v == null) { i => c.nulls != null && c.nulls(i) }
      else c match {
        case lz: graft.format.LazyFsstBytesCol => fsstEqPred(lz, Array(toBytes(v)))
        case _ => cmpPred(c, v, r => r == 0)
      }
    case GreaterThan(a, v) => cmpPred(col(a), v, r => r > 0)
    case GreaterThanOrEqual(a, v) => cmpPred(col(a), v, r => r >= 0)
    case LessThan(a, v) => cmpPred(col(a), v, r => r < 0)
    case LessThanOrEqual(a, v) => cmpPred(col(a), v, r => r <= 0)
    case In(a, vs0) =>
      val vs = vs0.filter(_ != null) // null elements match nothing
      val c = col(a)
      c match {
        case lc: LongsCol =>
          val set = vs.map(toLong).toSet
          i => notNull(lc, i) && set.contains(lc.values(i))
        case dc: DoublesCol =>
          val set = vs.map(toDouble).toSet
          i => notNull(dc, i) && set.contains(dc.values(i))
        case bc: BytesCol =>
          val set = vs.map(v => new String(toBytes(v), java.nio.charset.StandardCharsets.ISO_8859_1)).toSet
          i => notNull(bc, i) && set.contains(new String(bc.bytes, bc.offsets(i), bc.offsets(i + 1) - bc.offsets(i), java.nio.charset.StandardCharsets.ISO_8859_1))
        case dc: DictBytesCol =>
          val set = vs.map(v => new String(toBytes(v), java.nio.charset.StandardCharsets.ISO_8859_1)).toSet
          val a = dc.alphabet
          dictPass(dc, e => set.contains(
            new String(a.bytes, a.offsets(e), a.offsets(e + 1) - a.offsets(e),
              java.nio.charset.StandardCharsets.ISO_8859_1)))
        case bl: BoolsCol =>
          val set = vs.map { case b: Boolean => b }.toSet
          i => notNull(bl, i) && set.contains(bl.values(i))
        case lz: graft.format.LazyFsstBytesCol =>
          fsstEqPred(lz, vs.map(toBytes).toArray)
      }
    case StringStartsWith(a, p) =>
      val pb = p.getBytes("UTF-8")
      col(a) match {
        case dc: DictBytesCol => dictPass(dc, e => regionStartsWith(dc.alphabet, e, pb))
        case c: BytesCol => i => notNull(c, i) && regionStartsWith(c, i, pb)
        case other => throw new IllegalStateException(s"string predicate on $other")
      }
    case StringEndsWith(a, p) =>
      val pb = p.getBytes("UTF-8")
      def ends(c: BytesCol, i: Int): Boolean = {
        val len = c.offsets(i + 1) - c.offsets(i)
        len >= pb.length && regionEquals(c.bytes, c.offsets(i + 1) - pb.length, pb)
      }
      col(a) match {
        case dc: DictBytesCol => dictPass(dc, e => ends(dc.alphabet, e))
        case c: BytesCol => i => notNull(c, i) && ends(c, i)
        case other => throw new IllegalStateException(s"string predicate on $other")
      }
    case StringContains(a, p) =>
      val pb = p.getBytes("UTF-8")
      col(a) match {
        case dc: DictBytesCol =>
          dictPass(dc, e => contains(dc.alphabet.bytes, dc.alphabet.offsets(e),
            dc.alphabet.offsets(e + 1), pb))
        case c: BytesCol => i => notNull(c, i) && contains(c.bytes, c.offsets(i), c.offsets(i + 1), pb)
        case other => throw new IllegalStateException(s"string predicate on $other")
      }
    case other => throw new UnsupportedOperationException(s"filter $other")
  }

  @inline private def notNull(c: Column, i: Int): Boolean = c.nulls == null || !c.nulls(i)

  /** Dictionary-preserving predicate: evaluate `entryPred` once per alphabet
    * entry (alphabet-size compares, not chunk-size), then rows test a boolean
    * by index (reference:
    * dwio/nimble/velox/selective/StringColumnReader.cpp:330-504). */
  private def dictPass(dc: DictBytesCol, entryPred: Int => Boolean): Int => Boolean = {
    val m = dc.alphabet.len
    val pass = new Array[Boolean](m)
    var e = 0
    while (e < m) { pass(e) = entryPred(e); e += 1 }
    val idx = dc.indices
    i => notNull(dc, i) && pass(idx(i))
  }

  /** Encoded-domain (in)equality over an FSST chunk kept encoded: each
    * literal is encoded ONCE with the chunk's own symbol table (the same
    * `Fsst.Table` construction + greedy matcher the writer ran, so an equal
    * string reproduces the stored bytes exactly, and — since decode is a
    * function — a different string cannot collide); rows then compare
    * encoded regions, which fail on the first byte for selective probes
    * instead of materializing every string. Only reachable for columns
    * [[FilterCascade.eqOnlyCols]] admits (equality-family trees). */
  private def fsstEqPred(lz: graft.format.LazyFsstBytesCol,
      lits: Array[Array[Byte]]): Int => Boolean = {
    val table = new graft.format.Fsst.Table(lz.symbols)
    val encLits: Array[Array[Byte]] = lits.map { x =>
      val out = new graft.format.ByteSink(x.length + 8)
      graft.format.Fsst.encode(table, x, 0, x.length, out)
      out.toArray
    }
    val offs = lz.encOffs
    val bytes = lz.enc
    i => {
      val o = offs(i)
      val l = offs(i + 1) - o
      var li = 0
      var hit = false
      while (li < encLits.length && !hit) {
        val e = encLits(li)
        if (e.length == l) {
          var k = 0
          while (k < l && bytes(o + k) == e(k)) k += 1
          hit = k == l
        }
        li += 1
      }
      hit
    }
  }

  private def cmpPred(c: Column, v: Any, test: Int => Boolean): Int => Boolean = c match {
    case lc: LongsCol =>
      val x = toLong(v)
      i => notNull(lc, i) && test(java.lang.Long.compare(lc.values(i), x))
    case dc: DoublesCol =>
      val x = toDouble(v)
      i => notNull(dc, i) && test(java.lang.Double.compare(dc.values(i), x))
    case bc: BytesCol =>
      val x = toBytes(v)
      i => notNull(bc, i) && test(compareRegion(bc, i, x))
    case dc: DictBytesCol =>
      val x = toBytes(v)
      dictPass(dc, e => test(compareRegion(dc.alphabet, e, x)))
    case bl: BoolsCol =>
      val x = v.asInstanceOf[Boolean]
      i => notNull(bl, i) && test(java.lang.Boolean.compare(bl.values(i), x))
    // ORDER comparisons on a lazily-kept FSST chunk: unreachable under the
    // eqOnlyCols gate (only equality-family trees keep FSST encoded), but
    // kept total — expand once at compile time, never per row
    case lz: graft.format.LazyFsstBytesCol => cmpPred(lz.expand, v, test)
  }

  private def compareRegion(c: BytesCol, i: Int, x: Array[Byte]): Int = {
    val off = c.offsets(i); val len = c.offsets(i + 1) - off
    val n = math.min(len, x.length)
    var k = 0
    while (k < n) {
      val d = (c.bytes(off + k) & 0xff) - (x(k) & 0xff)
      if (d != 0) return d
      k += 1
    }
    len - x.length
  }

  private def regionStartsWith(c: BytesCol, i: Int, p: Array[Byte]): Boolean = {
    val off = c.offsets(i); val len = c.offsets(i + 1) - off
    len >= p.length && regionEquals(c.bytes, off, p)
  }
  private def regionEquals(bytes: Array[Byte], off: Int, p: Array[Byte]): Boolean = {
    var k = 0
    while (k < p.length) { if (bytes(off + k) != p(k)) return false; k += 1 }
    true
  }
  private def contains(bytes: Array[Byte], from: Int, to: Int, p: Array[Byte]): Boolean = {
    if (p.length == 0) return true
    var i = from
    while (i <= to - p.length) {
      if (regionEquals(bytes, i, p)) return true
      i += 1
    }
    false
  }

  // ------------------------------------ unsigned stored-domain translation

  /** Rewrite pushed filters from the WIDENED (unsigned) domain into the
    * STORED signed domain (r19 verdict #7 stretch): every comparison against
    * an unsigned-widened column becomes an exactly-equivalent predicate over
    * the raw sign-reinterpreted values the file actually stores. The mapping
    * u -> narrow(u) rotates the unsigned order (low half [0, 2^(b-1)) maps
    * to non-negatives, high half to negatives), so an unsigned range splits
    * into at most TWO signed ranges joined by Or. Null semantics are
    * preserved: every emitted form evaluates null -> false exactly like the
    * original comparison (the "always true" edge emits IsNotNull, never
    * AlwaysTrue). None = a shape the translation cannot prove (non-integral
    * literal, unsupported stored type, exotic filter referencing the
    * column) — callers keep the conservative fence. Consumers: DELETE
    * classification + chunk surgery (Delete/Surgery mask raw stored values,
    * so unsigned deletes need no domain-changing rewrite) and the scan's
    * stats-only pruning channel (stripe stats / chunk dirs / blooms /
    * indexes are all stored-domain). `schema` must be the STORED schema
    * (footer schemaJson), not the widened read schema. */
  private[graft] def unsignedStored(filters: Array[Filter],
      unsignedCols: Set[String], schema: StructType): Option[Array[Filter]] = {
    if (unsignedCols.isEmpty) return Some(filters)
    import java.math.BigInteger
    def bitsOf(c: String): Option[Int] =
      schema.fields.find(_.name == c).map(_.dataType).collect {
        case ByteType => 8
        case ShortType => 16
        case IntegerType => 32
        case LongType => 64
      }
    def big(v: Any): Option[BigInteger] = v match {
      case b: Byte => Some(BigInteger.valueOf(b.toLong))
      case s: Short => Some(BigInteger.valueOf(s.toLong))
      case i: Int => Some(BigInteger.valueOf(i.toLong))
      case l: Long => Some(BigInteger.valueOf(l))
      case d: java.math.BigDecimal if d.scale == 0 => Some(d.toBigInteger)
      case d: BigDecimal if d.scale == 0 => Some(d.underlying.toBigInteger)
      case _ => None
    }
    // signed reinterpretation of u ∈ [0, 2^bits) as a Long literal
    def narrow(u: BigInteger, bits: Int): Long =
      (if (u.testBit(bits - 1)) u.subtract(BigInteger.ONE.shiftLeft(bits)) else u)
        .longValueExact()
    // unsigned (v, HI] / [v, HI]: everything strictly/inclusively above v
    def rangeAbove(a: String, v: Any, strict: Boolean): Option[Filter] =
      for { bits <- bitsOf(a); u0 <- big(v) } yield {
        val u = if (strict) u0.add(BigInteger.ONE) else u0 // now [u, HI]
        val hi = BigInteger.ONE.shiftLeft(bits).subtract(BigInteger.ONE)
        if (u.signum <= 0) IsNotNull(a) // every stored value qualifies
        else if (u.compareTo(hi) > 0) AlwaysFalse()
        else if (u.testBit(bits - 1)) // [u, HI] entirely in the high half
          And(GreaterThanOrEqual(a, narrow(u, bits)), LessThan(a, 0L))
        else // low-half start: [u, maxSigned] ∪ the whole high half
          Or(GreaterThanOrEqual(a, narrow(u, bits)), LessThan(a, 0L))
      }
    // unsigned [0, v) / [0, v]: everything strictly/inclusively below v
    def rangeBelow(a: String, v: Any, strict: Boolean): Option[Filter] =
      for { bits <- bitsOf(a); u0 <- big(v) } yield {
        val u = if (strict) u0.subtract(BigInteger.ONE) else u0 // now [0, u]
        val hi = BigInteger.ONE.shiftLeft(bits).subtract(BigInteger.ONE)
        if (u.signum < 0) AlwaysFalse()
        else if (u.compareTo(hi) >= 0) IsNotNull(a)
        else if (u.testBit(bits - 1)) // reaches into the high half
          Or(GreaterThanOrEqual(a, 0L), LessThanOrEqual(a, narrow(u, bits)))
        else // entirely in the low half: [0, u] signed
          And(GreaterThanOrEqual(a, 0L), LessThanOrEqual(a, narrow(u, bits)))
      }
    // `underNot`: the AlwaysFalse()/IsNotNull(a) EDGE forms are equivalent
    // to the original comparison only POSITIVELY (both evaluate null ->
    // false). Under an enclosing Not the equivalence breaks — the original
    // NOT(cmp) is null -> null -> row NOT matched, while Not(AlwaysFalse)
    // is TRUE on null rows (and three-valued evaluators treat the
    // reference-free AlwaysFalse as null-blind), which would classify
    // NULL-bearing stripes all-match and DELETE rows the predicate must
    // keep. So inside any Not, an edge-form translation refuses instead.
    def isEdgeForm(t: Filter): Boolean = t match {
      case AlwaysFalse() | IsNotNull(_) => true
      case _ => false
    }
    def tr(f: Filter, underNot: Boolean): Option[Filter] = {
      def edge(t: Filter): Option[Filter] =
        if (underNot) None else Some(t)
      def noEdgeUnderNot(t: Filter): Option[Filter] =
        if (underNot && isEdgeForm(t)) None else Some(t)
      f match {
        case And(l, r) => for { a <- tr(l, underNot); b <- tr(r, underNot) } yield And(a, b)
        case Or(l, r) => for { a <- tr(l, underNot); b <- tr(r, underNot) } yield Or(a, b)
        // non-edge translations are pointwise-equivalent INCLUDING null
        // (comparisons evaluate null -> false on both sides), so Not stays
        // exact; the edge forms refuse via `edge` above
        case Not(c) => tr(c, underNot = true).map(Not)
        case IsNull(_) | IsNotNull(_) => Some(f)
        case EqualTo(a, v) if unsignedCols(a) =>
          (for { bits <- bitsOf(a); u <- big(v) } yield
            if (u.signum < 0 || u.bitLength > bits) edge(AlwaysFalse())
            else Some(EqualTo(a, narrow(u, bits)))).flatten
        case EqualNullSafe(a, null) if unsignedCols(a) => Some(f)
        case EqualNullSafe(a, v) if unsignedCols(a) =>
          // EqualNullSafe is genuinely two-valued (null <=> v is FALSE, and
          // NOT of that is TRUE — matching AlwaysFalse/Not(AlwaysFalse)
          // exactly), so its out-of-range edge is safe even under Not
          for { bits <- bitsOf(a); u <- big(v) } yield
            if (u.signum < 0 || u.bitLength > bits) AlwaysFalse()
            else EqualNullSafe(a, narrow(u, bits))
        case In(a, vs) if unsignedCols(a) =>
          bitsOf(a).flatMap { bits =>
            // a null element never matches IN, so dropping it is exact
            // POSITIVELY — but it makes the IN yield NULL (never FALSE) on
            // non-matching rows, so under Not the drop is non-equivalent:
            // refuse, like the other edge forms
            if (underNot && vs.contains(null)) None
            else {
              val nn = vs.filter(_ != null)
              val bs = nn.map(big)
              if (bs.exists(_.isEmpty)) None
              else {
                val inRange = bs.flatten.filter(u => u.signum >= 0 && u.bitLength <= bits)
                if (inRange.isEmpty) edge(AlwaysFalse())
                else Some(In(a, inRange.map(u => narrow(u, bits): Any)))
              }
            }
          }
        case GreaterThan(a, v) if unsignedCols(a) =>
          rangeAbove(a, v, strict = true).flatMap(noEdgeUnderNot)
        case GreaterThanOrEqual(a, v) if unsignedCols(a) =>
          rangeAbove(a, v, strict = false).flatMap(noEdgeUnderNot)
        case LessThan(a, v) if unsignedCols(a) =>
          rangeBelow(a, v, strict = true).flatMap(noEdgeUnderNot)
        case LessThanOrEqual(a, v) if unsignedCols(a) =>
          rangeBelow(a, v, strict = false).flatMap(noEdgeUnderNot)
        case other =>
          if (other.references.exists(unsignedCols)) None else Some(other)
      }
    }
    val out = filters.map(f => tr(f, underNot = false))
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }
}
