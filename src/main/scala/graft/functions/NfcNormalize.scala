package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization (canonical
  * composition): `café` spelled `e`+COMBINING ACUTE collapses to the
  * precomposed codepoint, while already-NFC text passes through
  * unchanged (and the common all-ASCII row is recognized in O(n)
  * without allocating — `Normalizer.isNormalized` short-circuit).
  *
  * Why an Expression and not a UDF: normalization sits in the hot
  * ingest path of a multilingual corpus (dedup keys, tokenizer
  * inputs, cross-source joins all want one canonical spelling), and a
  * Scala UDF would box every row and fence whole-stage codegen. This
  * compiles to a static helper call inside the generated stage;
  * interpreted fallback evaluates the same helper.
  *
  * Semantics contract (oracle-proven): identical to DuckDB's
  * `nfc_normalize` (both implement Unicode canonical composition, UAX
  * #15) — `q_unicode_nfc` hash-compares md5 of normalized output
  * cross-engine. Null in → null out. NFC(NFC(x)) == NFC(x)
  * (idempotence property-tested). */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. The isNormalized
    * probe avoids the String round trip for the (overwhelmingly
    * common) already-canonical row. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
