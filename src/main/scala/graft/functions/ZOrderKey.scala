package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_zbucket(value, boundaries)` — quantile-range bucket id of `value`
  * against a sorted, foldable boundary array: the count of boundaries
  * `<= value`, i.e. values below the first boundary land in bucket 0 and
  * values at-or-above the last land in bucket `boundaries.length`. Nulls
  * land in bucket 0 (they sort first in every layout this feeds). The
  * comparison uses Spark's interpreted ordering for the element type, so
  * one expression serves every orderable column type (integers, floats —
  * NaN greatest, strings, dates, timestamps).
  *
  * This is the per-column half of a Z-order clustering key: boundaries are
  * sampled quantiles, so bucket ids stay uniform under value skew (a linear
  * min/max scale would collapse a Zipfian column into one bucket).
  */
case class ZBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zbucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    right.dataType match {
      case ArrayType(et, _) if DataType.equalsStructurally(et, left.dataType, ignoreNullability = true) =>
        if (!right.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "graft_zbucket boundaries must be a foldable array")
        else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(et))
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_zbucket column type ${et.simpleString} is not orderable")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_zbucket boundaries must be array<${left.dataType.simpleString}>")
    }

  @transient private lazy val elemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)
  @transient private lazy val bounds: Array[Any] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.get(i, elemType)).toArray
  }

  /** Binary search shared by eval and the generated code (the boundary
    * array and interpreted ordering live on this expression instance, which
    * codegen reaches via addReferenceObj). Boxed input: the generated call
    * site autoboxes primitives, and the interpreted ordering compares
    * internal types exactly as eval does. */
  def bucketOf(v: AnyRef): Int = {
    // first index whose boundary is > v; that index == count of bounds <= v
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.lteq(bounds(mid), v)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return Integer.valueOf(0)
    Integer.valueOf(bucketOf(v.asInstanceOf[AnyRef]))
  }

  // r16: real doGenCode — this expression runs once per row per clustered
  // column in a zorder REWRITE (32M rows in the bench block); the fallback
  // paid a per-row InternalRow + interpreted tree around a binary search
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val ref = ctx.addReferenceObj("zbucket", this)
    ev.copy(
      code = code"""
        ${l.code}
        int ${ev.value} = ${l.isNull} ? 0 : $ref.bucketOf(${l.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_zinterleave(id0, id1, ...)` — Morton (Z-order) interleave of up to
  * eight 8-bit bucket ids into one long: output bit `b*k + j` is bit `b` of
  * child `j`, so the curve alternates one bit per column from least to most
  * significant. Rows close on the resulting key are close in EVERY input
  * dimension, which is what makes per-file and per-stripe min/max stats
  * tight on all clustered columns at once after a range-partitioned
  * rewrite (the multi-column generalization of sorting; same curve Delta
  * Lake and Iceberg use for OPTIMIZE ZORDER).
  */
case class ZInterleave(children: Seq[Expression])
    extends Expression {
  require(children.nonEmpty && children.length <= 8,
    "graft_zinterleave takes 1..8 bucket-id columns")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zinterleave"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_zinterleave arguments must be int bucket ids")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.length
    var out = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      out = ZInterleave.scatter(out, if (v == null) 0 else v.asInstanceOf[Int], j, k)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  // r16: real doGenCode (shared scatter kernel) — runs once per row of a
  // zorder rewrite; the fallback boxed every child through an InternalRow
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.length
    val gens = children.map(_.genCode(ctx))
    val acc = ctx.freshName("zout")
    val steps = gens.zipWithIndex.map { case (g, j) =>
      s"""
        ${g.code}
        $acc = graft.functions.ZInterleave.scatter($acc, ${g.isNull} ? 0 : ${g.value}, $j, $k);"""
    }.mkString("\n")
    ev.copy(
      code = code"""
        long $acc = 0L;
        $steps
        long ${ev.value} = $acc;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZInterleave {
  /** Scatter the 8 bits of bucket id `id` of column `j` into the Morton key
    * (bit b lands at position b*k + j) — shared by eval and codegen. */
  def scatter(out: Long, id: Int, j: Int, k: Int): Long = {
    val v = id & 0xff
    var acc = out
    var b = 0
    while (b < 8) {
      acc |= ((v >> b) & 1).toLong << (b * k + j)
      b += 1
    }
    acc
  }
}

object ZOrderKey {
  /** Register `graft_zbucket` / `graft_zinterleave` (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Registry.ensure(spark, "graft_zbucket", exprs => ZBucket(exprs(0), exprs(1)))
    Registry.ensure(spark, "graft_zinterleave", exprs => ZInterleave(exprs))
  }
}
