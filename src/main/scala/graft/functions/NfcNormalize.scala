package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls (plain object → Java static
  * forwarder, no MODULE$ indirection in the codegen string). */
object NfcUtil {
  private val NFC = java.text.Normalizer.Form.NFC

  /** Unicode NFC canonical composition. Fast path: a string whose byte
    * count equals its code-point count is pure ASCII, which is already
    * NFC — no transcode, no allocation. Otherwise `isNormalized` (a
    * scan, no allocation) guards the actual normalize+re-encode, so
    * only genuinely decomposed strings pay the full cost. */
  def nfc(u: UTF8String): UTF8String = {
    if (u.numBytes == u.numChars) return u
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, NFC)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, NFC))
  }
}

/** Unicode NFC normalization as a native codegen'd Catalyst expression.
  *
  * Why an Expression: Spark has NO Unicode-normalization builtin (only
  * case/trim transforms), yet normalization-before-hashing is a
  * mandatory first step of text dedup — 'é' (U+00E9) and 'e'+U+0301
  * are the same text to a curation pipeline but different bytes to
  * every hash/shingle operator in this repo. A Scala UDF would work but
  * falls out of whole-stage codegen; this stays inside the generated
  * plan (the custom-Expression tier of the extension ladder, like
  * [[ArrayDotLong]]).
  *
  * Semantics: canonical composition per Unicode TR15 (java.text
  * .Normalizer, Form.NFC) — the same standard DuckDB's
  * `nfc_normalize()` implements, which is what makes the consuming
  * query exactly oracle-checkable. Null in → null out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    NfcUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NfcUtil.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
