package org.apache.spark.sql.graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (java.text.Normalizer) — the text-cleaning
  * stage that makes byte-level dedup see THROUGH encoding variants: a
  * precomposed "é" (U+00E9) and the decomposed "e"+U+0301 are different
  * byte strings with identical rendering, and exact/hash dedup silently
  * treats them as distinct documents until both sides normalize. NFC is a
  * Unicode-standardized idempotent function, so DuckDB's `nfc_normalize`
  * produces byte-identical output — the oracle bridge.
  *
  * Reference analog: pipeline 1's Nougat/PyPDF text passes emit unescaped
  * unicode (`pipeline1.py` unescape step) that real corpora mix in both
  * forms.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
