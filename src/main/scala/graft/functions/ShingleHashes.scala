package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingle hashes of a text column, one pass per
  * document.
  *
  * Bit-identical to the composed-operator pipeline it replaces
  * (`array_distinct(transform(shingles(text, n), s => xxhash64(s)))` in
  * graft.ops.Dedup): tokens = regex-split `\s+` of the lower-cased text
  * (trailing empties kept, matching Spark's `split`); shingle i = tokens
  * [i, i+n) joined by a single space; hash = XXH64(seed 42) over the UTF-8
  * bytes — exactly Spark's `xxhash64`; first-occurrence-ordered distinct.
  *
  * A custom Expression (not a UDF) because Spark's higher-order functions
  * (`transform`/`slice`/`concat_ws`) evaluate interpreted per element — a
  * single fused pass is ~30x faster on the near-dup path, which matters when
  * every document of a 100 TB corpus flows through it. Preferred extension
  * mechanism per SURVEY.md §4 (custom Expression set for §2.8 text ops).
  * r16: real doGenCode (one static kernel call) — CodegenFallback broke the
  * whole-stage span and paid a per-row InternalRow + interpreted tree on
  * the hottest text path. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(textAny: Any, nAny: Any): Any =
    ShingleHashes.kernel(textAny.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, n) =>
      s"${ev.value} = graft.functions.ShingleHashes.kernel($text, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Scalar kernel shared by eval and the generated code. */
  def kernel(textRaw: UTF8String, n: Int): UnsafeArrayData = {
    val text = textRaw.toLowerCase.toString
    val words = ws.split(text, -1)
    val count = math.max(words.length - n, 0) + 1
    // encode each word ONCE; shingle bytes assemble in a reusable buffer —
    // the StringBuilder->String->getBytes round trip re-encoded every word
    // n times and dominated the near-dup profile. Bytes (and so hashes) are
    // identical: UTF-8(w0 + ' ' + w1 ...) == UTF-8(w0) ++ 0x20 ++ UTF-8(w1)...
    val wb = new Array[Array[Byte]](words.length)
    var w = 0
    while (w < words.length) { wb(w) = words(w).getBytes(StandardCharsets.UTF_8); w += 1 }
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var buf = new Array[Byte](64)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, words.length)
      var len = 0
      var j = i
      while (j < end) { len += wb(j).length + (if (j > i) 1 else 0); j += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length << 1))
      var off = 0
      j = i
      while (j < end) {
        if (j > i) { buf(off) = ' '; off += 1 }
        val b = wb(j)
        System.arraycopy(b, 0, buf, off, b.length); off += b.length
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** Register `graft_shingle_hashes(text, n)` (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registry.ensure(spark, "graft_shingle_hashes", exprs => ShingleHashes(exprs.head, exprs(1)))
}
