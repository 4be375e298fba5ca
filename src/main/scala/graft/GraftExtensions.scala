package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, DotProduct, SortedCountIn}

/** Registry of the engine's native Catalyst expressions. */
object GraftFunctions {

  /** (identifier, info, builder) triple — the shape both
    * `SparkSessionExtensions.injectFunction` and the imperative
    * `FunctionRegistry` API consume. */
  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product takes 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      })

  val bloomMightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"bloom_might_contain takes 2 arguments, got ${children.length}")
        BloomMightContain(children.head, children(1))
      })

  val sortedCountIn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_count_in"),
      new ExpressionInfo(classOf[SortedCountIn].getName, "sorted_count_in"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sorted_count_in takes 2 arguments, got ${children.length}")
        SortedCountIn(children.head, children(1))
      })

  val nfcNormalize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName,
        "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize takes 1 argument, got ${children.length}")
        graft.functions.NfcNormalize(children.head)
      })

  val graphemeCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("grapheme_count"),
      new ExpressionInfo(classOf[graft.functions.GraphemeCount].getName,
        "grapheme_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"grapheme_count takes 1 argument, got ${children.length}")
        graft.functions.GraphemeCount(children.head)
      })

  val deflateLength: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("deflate_length"),
      new ExpressionInfo(classOf[graft.functions.DeflateLength].getName,
        "deflate_length"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"deflate_length takes 1 argument, got ${children.length}")
        graft.functions.DeflateLength(children.head)
      })

  private val all = Seq(dotProduct, bloomMightContain, sortedCountIn,
    nfcNormalize, graphemeCount, deflateLength)

  /** Imperative registration for sessions built without
    * `spark.sql.extensions` (idempotent — re-registering replaces the
    * same entry). After this, `call_function("dot_product", ...)` and
    * SQL `dot_product(a, b)` both resolve. */
  def register(spark: SparkSession): Unit =
    all.foreach { f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3)
    }
}

/** SparkSessionExtensions entry point — the idiomatic installation:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProduct)
    ext.injectFunction(GraftFunctions.bloomMightContain)
    ext.injectFunction(GraftFunctions.sortedCountIn)
    ext.injectFunction(GraftFunctions.nfcNormalize)
    ext.injectFunction(GraftFunctions.graphemeCount)
    ext.injectFunction(GraftFunctions.deflateLength)
  }
}
