package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd bloom-filter membership probe over a LONG key:
  * `bloom_might_contain(bloomBytes, key)`.
  *
  * This is the row-pruning kernel of [[graft.ops.BloomJoin]]: the
  * serialized filter arrives as a foldable BINARY literal (built once
  * on the small join side with `DataFrameStatFunctions.bloomFilter`,
  * which `put`s each key — `putLong` for integral columns, matching
  * `mightContainLong` here), is deserialized ONCE per task via
  * `addReferenceObj`, and each probe is a branch-free hash check
  * inside whole-stage codegen. A UDF doing the same work would box
  * every key and break the codegen stage right above the scan — the
  * exact spot where pruning must be cheap, because at scale this
  * expression sees every row of the big side.
  *
  * Null contract: null bloom or null key yields null
  * (BinaryExpression default). False positives are expected (the
  * downstream equi-join removes them); false negatives never happen —
  * [[graft.ops.BloomJoinSpec]] asserts both.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(left.foldable,
    "bloom_might_contain: the serialized filter must be a literal " +
      "(build it once on the driver; per-row filters defeat the point)")

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per task (the expression ships serialized to
    * executors; the lazy val re-materializes the filter there). */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloomBytes: Any, key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized filter, not the bytes: one readFrom
    // per task instead of one per row
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, key) =>
      s"${ev.value} = $bloomRef.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
