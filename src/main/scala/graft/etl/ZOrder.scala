package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for data-skipping: interleave the
  * bits of two dimension columns so that rows close in BOTH dimensions
  * land close on a single sort key. Writing range-partitioned and
  * sorted by the z-value gives every output file a tight min/max
  * bounding box in each dimension — the statistic parquet row-group
  * pruning and file-skipping catalogs (Delta/Iceberg style) cut I/O
  * with. A plain single-column sort clusters one dimension and
  * scatters the other; z-order trades a little of each for locality in
  * both — the layout move behind multi-dimensional WHERE-clause
  * skipping at 100 TB.
  *
  * The interleave is a pure codegen'd bit-arithmetic expression (no
  * UDF), so it rides whole-stage codegen and is expressible verbatim
  * in ANSI SQL for the oracle.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions) — a fold of shift/mask/or terms, all
    * codegen'd integer ops. `bits` ≤ 31 keeps the result in a
    * non-negative long. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as ANSI SQL text over column expressions `a`
    * and `b` — for DuckDB oracles of z-value computations. */
  def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"(((($a) >> $i) & 1) << ${2 * i})",
      s"(((($b) >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Min-max scale a numeric column into [0, 2^bits) as a long, given
    * the column's global min/max (from one bounded aggregate). A
    * constant column maps to 0. */
  def scaleToBits(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    if (span <= 0) lit(0L)
    else least(
      floor((c.cast("double") - lit(mn)) / lit(span) * lit((1L << bits).toDouble))
        .cast("long"),
      lit((1L << bits) - 1))
  }

  /** Write `df` clustered on the z-order of two numeric columns:
    * one bounded min/max aggregate fixes the scaling, then a single
    * range-partition + in-partition sort on the z-value lays out
    * `numFiles` files with tight per-file bounding boxes in BOTH
    * dimensions. The only wide op is the range exchange the write
    * needs anyway; the min/max pass is a cheap partial-agg scan. */
  def clusterWrite(df: DataFrame, colA: String, colB: String,
                   outDir: String, numFiles: Int, bits: Int = 12): Unit = {
    val stats = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!stats.isNullAt(0) && !stats.isNullAt(2),
      s"clusterWrite: no min/max bounds to scale by — input is empty or a " +
        s"cluster column ($colA / $colB) is entirely null")
    // Rows with a null dimension value cluster explicitly at that
    // dimension's low corner (scaled 0) rather than leaking a null
    // through the bit math into one arbitrary range partition.
    val z = interleave(
      scaleToBits(coalesce(col(colA).cast("double"), lit(stats.getDouble(0))),
        stats.getDouble(0), stats.getDouble(1), bits),
      scaleToBits(coalesce(col(colB).cast("double"), lit(stats.getDouble(2))),
        stats.getDouble(2), stats.getDouble(3), bits),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
