package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization for multilingual text curation (X3): web
  * crawls mix composed and decomposed forms of the same visible text (é as
  * U+00E9 vs e + U+0301), which silently breaks exact dedup, fingerprinting,
  * tokenization, and every string equality downstream. Canonical NFC
  * composition is the standard fix (Unicode TR-15), and DuckDB ships the
  * same operation as `nfc_normalize`, so the whole path is oracle-checkable.
  *
  * Both expressions are codegen'd scalar calls into the JDK's
  * java.text.Normalizer (ICU-free, deterministic across JVMs) — no UDF
  * registry, no interpreter fallback in the hot path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping: canonical decomposition (NFD) then drop every combining
  * mark (Unicode category M). The search-normalization companion of
  * [[NfcNormalize]] — matches DuckDB's `strip_accents` on Latin-script
  * input, which keeps the operation oracle-checkable.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"strip_accents expects string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(StripAccents.strip(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.StripAccents.strip($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  /** NFD + drop combining marks; called from both interpreted and generated
    * code so the two paths cannot diverge.
    */
  def strip(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
}
