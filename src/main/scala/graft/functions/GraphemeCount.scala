package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd extended-grapheme-cluster count (UAX #29) — the
  * "user-perceived character" length a multilingual/emoji-heavy
  * corpus needs for honest length limits: a ZWJ emoji family is ONE
  * grapheme (7 codepoints, 25 UTF-8 bytes), a flag is one, a
  * skin-toned hand is one — `length()` (codepoints) and
  * `octet_length()` (bytes) both overcount what a reader sees.
  *
  * Segmentation comes from the ICU4J BreakIterator that Spark already
  * bundles for collation support (icu4j 77 = Unicode 16 rules). One
  * documented version-skew vs DuckDB's utf8proc (pre-15.1 rules):
  * Unicode 15.1's GB9c joins Indic conjunct clusters, so नमस्ते is 3
  * clusters under ICU and 4 under utf8proc — the oracle therefore
  * value-compares on the zoo MINUS Devanagari rows and the spec pins
  * the modern (GB9c) semantics explicitly. Null in → null out.
  *
  * The iterator is threadlocal-cached (BreakIterator construction is
  * the expensive part; setText per row is cheap). */
case class GraphemeCount(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "grapheme_count"

  override protected def nullSafeEval(input: Any): Any =
    GraphemeCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraphemeCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraphemeCount {
  private val iter =
    new ThreadLocal[com.ibm.icu.text.BreakIterator] {
      override def initialValue(): com.ibm.icu.text.BreakIterator =
        com.ibm.icu.text.BreakIterator.getCharacterInstance(
          com.ibm.icu.util.ULocale.ROOT)
    }

  def count(s: UTF8String): Int = {
    val str = s.toString
    // ASCII fast path: one byte == one grapheme — pure ASCII has no
    // combining sequences, EXCEPT CRLF which GB3 joins into one
    // cluster, so any \r falls through to the real iterator
    if (str.length == s.numBytes() && str.indexOf('\r') < 0)
      return str.length
    val it = iter.get()
    it.setText(str)
    var n = 0
    while (it.next() != com.ibm.icu.text.BreakIterator.DONE) n += 1
    n
  }
}
