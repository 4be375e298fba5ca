package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right payload with
  * `right.ts <= left.ts` within the same key.
  *
  * Spark has no native as-of operator; the scalable composition is
  * union + per-key ordered window (SURVEY §2.3 note): tag both sides,
  * union by name (missing columns null-filled), and carry the last
  * non-null payload forward with a running-frame window. ONE shuffle
  * (by key), no join state, no range explosion — at 100 TB this is
  * strictly cheaper than any join-shaped plan for the same semantics,
  * and it inherits AQE/spill handling of ordinary window aggregation.
  */
object AsOf {

  /** Left as-of join. `payloadCols` are taken from `right` and must
    * not collide with `left`'s columns; rows with no prior right row
    * get nulls. At equal timestamps the right row counts ("as of" is
    * inclusive); among several same-timestamp right rows the one
    * sorting last by `tieBreak` wins — pass a unique column for
    * determinism. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               tieBreak: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
    val r = right.select((keyCol +: tsCol +: (payloadCols ++ tieBreak)).distinct
        .map(col): _*)
      .withColumn("__is_left", lit(0))
    // right rows sort before left at equal ts (0 < 1) so they are
    // visible "as of" that instant
    val ordering = (col(tsCol) +: col("__is_left") +: tieBreak.map(col))
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_left") === 1)
      .select((left.columns.map(col) ++ payloadCols.map(col)).toIndexedSeq: _*)
  }
}
