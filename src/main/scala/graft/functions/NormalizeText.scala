package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for training-data pipelines: canonical
  * composition (NFC or NFKC) with optional accent stripping (NFD, drop
  * combining marks, recompose) — the standard pre-tokenization cleanup that
  * makes visually-identical strings byte-identical before dedup/fingerprint
  * hashing (é as U+00E9 vs e+U+0301 would otherwise defeat exact dedup).
  *
  * A native Expression rather than a UDF so the scan→normalize→hash pipeline
  * stays inside one operator; ASCII fast path skips the Normalizer entirely
  * (the overwhelmingly common case in web corpora scans every byte once).
  */
case class NormalizeText(child: Expression, nfkc: Boolean, stripAccents: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.kernel(input.asInstanceOf[UTF8String], nfkc, stripAccents)

  // r16: real doGenCode — the ASCII fast path (the overwhelmingly common
  // web-corpus case) now runs inside the whole-stage span instead of
  // bouncing through the fallback's per-row InternalRow
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.NormalizeText.kernel($text, $nfkc, $stripAccents);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  import java.text.Normalizer

  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Scalar kernel shared by eval and the generated code. */
  def kernel(u: UTF8String, nfkc: Boolean, stripAccents: Boolean): UTF8String = {
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) u // NFC/NFKC and accent-strip are identity on ASCII
    else UTF8String.fromString(normalize(u.toString, nfkc, stripAccents))
  }

  def normalize(s: String, nfkc: Boolean, stripAccents: Boolean): String = {
    val form = if (nfkc) Normalizer.Form.NFKC else Normalizer.Form.NFC
    if (!stripAccents) Normalizer.normalize(s, form)
    else {
      // decompose, drop nonspacing marks, then compose to the target form
      val decomposed = Normalizer.normalize(s,
        if (nfkc) Normalizer.Form.NFKD else Normalizer.Form.NFD)
      Normalizer.normalize(marks.matcher(decomposed).replaceAll(""), form)
    }
  }

  /** Register `graft_normalize(text, nfkc, strip_accents)` (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registry.ensure(spark, "graft_normalize", exprs => NormalizeText(exprs.head,
      nfkc = exprs.lift(1).exists(_.eval(null) == true),
      stripAccents = exprs.lift(2).exists(_.eval(null) == true)))
}
