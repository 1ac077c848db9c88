package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends BinaryExpression with CodegenFallback {
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

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return Integer.valueOf(0)
    // first index whose boundary is > v; that index == count of bounds <= v
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.lteq(bounds(mid), v)) lo = mid + 1 else hi = mid
    }
    Integer.valueOf(lo)
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
    extends Expression with CodegenFallback {
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
      val id = (if (v == null) 0 else v.asInstanceOf[Int]) & 0xff
      var b = 0
      while (b < 8) {
        out |= ((id >> b) & 1).toLong << (b * k + j)
        b += 1
      }
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {
  /** Register `graft_zbucket` / `graft_zinterleave` (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Registry.ensure(spark, "graft_zbucket", exprs => ZBucket(exprs(0), exprs(1)))
    Registry.ensure(spark, "graft_zinterleave", exprs => ZInterleave(exprs))
  }
}
