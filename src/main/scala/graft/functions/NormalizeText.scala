package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonicalization pass a corpus
  * runs before dedup/fingerprinting so that byte-different spellings
  * of the same text (precomposed é vs e+U+0301, case, ragged
  * whitespace) collapse to one form and dedup keys actually match:
  *
  *   NFC → lowercase(ROOT) → collapse `[ \t\n]+` to one space → trim
  *
  * Implemented as a native UnaryExpression whose codegen calls the
  * static [[NormalizeText.normalize]] — the row loop stays inside
  * whole-stage codegen (no UDF boundary, no extra serialization); the
  * per-row work IS the normalizer, which no expression tree avoids.
  *
  * Cross-engine notes (the q_text_normalize oracle replays the cascade
  * as `trim(regexp_replace(lower(nfc_normalize(x)), '[ \t\n]+', ' ',
  * 'g'))`): NFC agrees between the JDK and utf8proc for the stable
  * Unicode range; the whitespace class is written EXPLICITLY because
  * Java's `\s` includes U+000B while RE2's does not; `Locale.ROOT`
  * lowercasing avoids locale-sensitive mappings (the Turkish-I trap).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_normalize expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  private val Ws = Pattern.compile("[ \t\n]+")

  /** Static entry point shared by interpreted eval and generated code
    * (top-level objects emit static forwarders, so the generated Java
    * calls this directly). */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    UTF8String.fromString(
      Ws.matcher(nfc.toLowerCase(Locale.ROOT)).replaceAll(" ").trim)
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Codegen'd canonicalization of a string column. */
  def text_normalize(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))
}
