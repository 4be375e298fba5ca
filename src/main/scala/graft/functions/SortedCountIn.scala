package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-occurrence membership count against a SORTED string array:
  * `sorted_count_in(needles, haystack)` = how many elements of
  * `needles` (duplicates counted each time, nulls skipped) occur in
  * `haystack`, which the caller must supply distinct and ascending in
  * UTF8String binary order (`sort_array` / `array_sort` order).
  *
  * This is the membership kernel of the broadcast probe-index shape
  * (`ScoreStream.contaminationFlags`): one row carries the probe set
  * as an array, every document counts its shingle hits in-row. The
  * naive `size(filter(needles, h => array_contains(haystack, h)))`
  * form is a LINEAR scan of the haystack per needle — O(S·P) per
  * document, which at a corpus-scaled probe set (the 100× replica:
  * ~200k probe hashes) degenerates to trillions of comparisons.
  * Binary search makes it O(S·log P) with no per-row set build and no
  * state outside the expression's operands, so the whole pass stays a
  * stateless narrow projection — streaming-safe in append mode, probe
  * refresh still picked up per micro-batch re-plan.
  *
  * Null contract: a null array on either side yields null
  * (BinaryExpression default); null NEEDLE elements are skipped (probe
  * hashes are md5 output and never null); null HAYSTACK slots compare
  * as LESS-THAN any needle — `sort_array`'s default places nulls
  * first, so a `collect_list` that captured a null still leaves the
  * non-null suffix sorted and searchable instead of NPE-ing mid-probe.
  * The haystack is trusted sorted — a caller passing an unsorted array
  * gets undefined counts, which is why
  * [[graft.streaming.ScoreStream.contaminationFlags]] builds it with
  * `sort_array(collect_list(...))` in the same plan.
  */
case class SortedCountIn(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_count_in"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val needles = a.asInstanceOf[ArrayData]
    val hay = b.asInstanceOf[ArrayData]
    val n = needles.numElements()
    val m = hay.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!needles.isNullAt(i)) {
        val key = needles.getUTF8String(i)
        var lo = 0
        var hi = m - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          // null slots sort first: treat as less-than and move right
          val c = if (hay.isNullAt(mid)) -1
                  else hay.getUTF8String(mid).compareTo(key)
          if (c == 0) { hits += 1; lo = hi + 2 } // found: +1 and break
          else if (c < 0) lo = mid + 1
          else hi = mid - 1
        }
      }
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val c = ctx.freshName("cmp")
      val key = ctx.freshName("key")
      val hits = ctx.freshName("hits")
      s"""
         |final int $n = $x.numElements();
         |final int $m = $y.numElements();
         |int $hits = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $key =
         |      $x.getUTF8String($i);
         |    int $lo = 0;
         |    int $hi = $m - 1;
         |    while ($lo <= $hi) {
         |      final int $mid = ($lo + $hi) >>> 1;
         |      final int $c = $y.isNullAt($mid) ? -1
         |        : $y.getUTF8String($mid).compareTo($key);
         |      if ($c == 0) { $hits++; break; }
         |      else if ($c < 0) { $lo = $mid + 1; }
         |      else { $hi = $mid - 1; }
         |    }
         |  }
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
