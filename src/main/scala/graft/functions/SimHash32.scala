package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash of a text column, single pass per document.
  *
  * Bit-identical to the composed-operator definition (graft.ops.Dedup.simhash
  * and its DuckDB oracle): tokens = regex-split `\s+` of the lower-cased
  * text (trailing empties kept, matching Spark's `split`); per-token 32-bit
  * hash = md5 hex chars [24,32) parsed as unsigned; each bit votes +-1; the
  * signature sets bit b iff its vote sum is positive.
  *
  * A custom Expression (not a UDF) so the whole computation stays inside the
  * operator without an explode x32 row blowup — the preferred extension
  * mechanism per SURVEY.md §4 (custom Expression set for §2.8 text ops).
  * r16: real doGenCode (static kernel call, thread-local MD5 instance —
  * MessageDigest.getInstance ran once per ROW under the fallback). */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash32.kernel(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.SimHash32.kernel($text);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Scalar kernel shared by eval and the generated code. */
  def kernel(input: UTF8String): Long = {
    val text = input.toLowerCase.toString
    val tokens = ws.split(text, -1)
    val votes = new Array[Int](32)
    val md = md5.get()
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val digest = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // md5 hex chars [24,32) == digest bytes [12,16) as unsigned 32-bit
      val h = ((digest(12) & 0xffL) << 24) | ((digest(13) & 0xffL) << 16) |
        ((digest(14) & 0xffL) << 8) | (digest(15) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) != 0) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Register `graft_simhash32` in the session's function registry
    * (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registry.ensure(spark, "graft_simhash32", exprs => SimHash32(exprs.head))
}
