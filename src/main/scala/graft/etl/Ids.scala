package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous global id assignment WITHOUT a single-partition sort.
  *
  * The naive `row_number().over(Window.orderBy(key))` funnels the
  * entire dataset through ONE partition — the classic scale-killer for
  * "give every document a stable dense id". The scalable shape:
  *
  *   1. range-repartition + sort within partitions on the key (the
  *      same machinery a global orderBy uses, minus the one-partition
  *      window on top);
  *   2. per-partition row index from `monotonically_increasing_id`
  *      (`partitionId << 33 | rowIndex` — narrow, assigned in sorted
  *      order because it sits above the sort);
  *   3. per-partition row COUNTS (numParts rows, bounded) collected
  *      and cumulated into offsets that re-enter the plan as literals;
  *   4. `id = offset(partition) + rowIndex`.
  *
  * Offsets accumulate in partition order = range order, so the ids
  * equal the global rank of the key EXACTLY, regardless of where the
  * range sampler placed partition boundaries — which is why the result
  * is deterministic and oracle-checkable against `ROW_NUMBER() OVER
  * (ORDER BY key)`.
  */
object Ids {

  /** Add a dense 0-based `idName` column ranking rows globally by
    * `key` (which must be unique for a total order). Two jobs: the
    * count pass and the output pass; the ranged frame is persisted so
    * the range shuffle+sort runs once — callers processing a corpus
    * bigger than cluster cache should write the result out and
    * unpersist. */
  def assignContiguous(df: DataFrame, key: Column, numParts: Int,
                       idName: String = "uid"): DataFrame = {
    val ranged = df.repartitionByRange(numParts, key)
      .sortWithinPartitions(key)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__idx",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .persist()
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Array[Long] = (0 until numParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
      .take(numParts).toArray
    // One array literal + O(1) element_at per row. A when(pid===0,..)
    // .otherwise(when(pid===1,..)..) fold would be a linear-depth
    // expression tree — fine at 8 partitions, a janino method-size
    // blowup at the 10^4-10^5 partitions a large corpus needs.
    val offExpr = element_at(lit(offsets), col("__pid") + 1)
    ranged.withColumn(idName, offExpr + col("__idx")).drop("__pid", "__idx")
  }
}
