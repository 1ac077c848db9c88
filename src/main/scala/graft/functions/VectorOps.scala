package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native vector-similarity expressions (SURVEY.md §2.8 similarity search).
  *
  * Bit-identical to the composed `aggregate(zip_with(...))` forms in
  * graft.ops.Similarity (explicit left-to-right double accumulation), but a
  * single fused pass per row — Spark's higher-order functions evaluate
  * interpreted per element, which dominates the embedding ops' runtime at
  * 64 dims x millions of pairs.
  */

/** cosine(a, b) over two float arrays; null if lengths differ or any element
  * is null (zip_with padding semantics of the composed form). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(daa) * math.sqrt(dbb)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id: sign bits of dot products with `planes`
  * deterministic pseudo-random hyperplanes, weight(p, d) =
  * pmod(d*2654435761 + p*40503 + 7, 1000003) / 500001.5 - 1. Returns 0 when
  * the vector length differs from `dims` (composed-form null semantics). */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(vAny: Any, dimsAny: Any, planesAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val dims = dimsAny.asInstanceOf[Int]
    val planes = planesAny.asInstanceOf[Int]
    if (v.numElements() != dims) return java.lang.Long.valueOf(0L)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < dims) {
        if (v.isNullAt(d)) { acc = Double.NaN; d = dims }
        else {
          val w = ((d.toLong * 2654435761L + p.toLong * 40503L + 7L) % 1000003L).toDouble / 500001.5 - 1.0
          acc += v.getFloat(d).toDouble * w
          d += 1
        }
      }
      if (acc >= 0) bucket += 1L << p
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object VectorOps {
  /** Register `graft_cosine(a, b)` and `graft_lsh_bucket(v, dims, planes)`
    * (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Registry.ensure(spark, "graft_cosine", exprs => CosineSim(exprs.head, exprs(1)))
    Registry.ensure(spark, "graft_lsh_bucket", exprs => LshBucket(exprs.head, exprs(1), exprs(2)))
  }
}

/** Idempotent session-registry helper for the graft expression set. */
object Registry {
  def ensure(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!reg.functionExists(id)) reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
