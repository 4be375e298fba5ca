package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without the nested-loop trap.
  *
  * Spark's optimizer turns a bare `p.ts BETWEEN i.lo AND i.hi` join
  * into BroadcastNestedLoopJoin (or a cartesian product when neither
  * side broadcasts) — O(|P|·|I|) comparisons, a cluster-killer at
  * 100 TB. The standard fix (the same prestage behind Databricks'
  * range-join hints and Flink's interval joins) is bucketization:
  * quantize the domain into fixed-width buckets, explode each interval
  * over the buckets it covers, and equi-join on the bucket id — the
  * range predicate then only runs inside co-bucketed pairs. Every
  * point lives in exactly ONE bucket, so a (point, interval) pair can
  * meet in at most one bucket and the join needs no post-dedup.
  *
  * Scale shape: one narrow bucket projection per side, one equi-join
  * shuffle (or broadcast when the interval side is small — Catalyst
  * decides), interval rows replicated only `spanBuckets` times
  * (bounded by `maxBucketsPerInterval`, enforced LOUDLY — a mis-sized
  * `bucketWidth` raises instead of silently exploding the build side).
  * Pick `bucketWidth` near the typical interval length: each interval
  * then covers ~2 buckets and each point joins ~the intervals that
  * could actually contain it.
  */
object RangeJoin {

  /** Exact floor division for longs (handles negative domains —
    * `pmod` is non-negative, so `(a - pmod(a, b)) / b` is floor). */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Join `points` to every interval of `intervals` containing them:
    * `lo <= pt <= hi` (closed bounds). `ptCol`/`loCol`/`hiCol` must be
    * integral-domain columns (epoch micros, positions…); the output
    * carries every column of both inputs, which must not share names.
    *
    * Guards (loud, never silent): an interval with `hi < lo` raises,
    * as does an interval spanning more than `maxBucketsPerInterval`
    * buckets (resize `bucketWidth` for such data). */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval=$maxBucketsPerInterval")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names: $shared")
    val lob = floorDiv(col(loCol).cast("long"), bucketWidth)
    val hib = floorDiv(col(hiCol).cast("long"), bucketWidth)
    val span = hib - lob + 1
    val buckets =
      when(col(hiCol) < col(loCol), raise_error(concat(
          lit("pointInInterval: interval with hi < lo: ["),
          col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
          lit("]"))))
        .when(span > maxBucketsPerInterval, raise_error(concat(
          lit("pointInInterval: interval ["), col(loCol).cast("string"),
          lit(", "), col(hiCol).cast("string"), lit("] spans "),
          span.cast("string"),
          lit(s" > maxBucketsPerInterval=$maxBucketsPerInterval buckets — " +
            s"raise bucketWidth=$bucketWidth"))))
        .otherwise(sequence(lob, hib))
    val bi = intervals.withColumn("__bkt", explode(buckets))
    val bp = points.withColumn("__bkt",
      floorDiv(col(ptCol).cast("long"), bucketWidth))
    bp.join(bi, Seq("__bkt"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Interval-overlap join: every pair of a left and right interval
    * with `lo1 <= hi2 && lo2 <= hi1` (closed bounds). Same bucketized
    * prestage — both sides explode over their covered buckets and
    * equi-join on bucket — but an overlapping pair can now share MANY
    * buckets, so the join keeps a pair only in the bucket where the
    * overlap STARTS (`floor(max(lo1, lo2) / width)`): exact-once
    * semantics by construction, no distinct pass over the matches. */
  def intervalOverlap(left: DataFrame, lo1: String, hi1: String,
                      right: DataFrame, lo2: String, hi2: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right must not share column names: $shared")
    def burst(df: DataFrame, lo: String, hi: String): DataFrame = {
      val lob = floorDiv(col(lo).cast("long"), bucketWidth)
      val hib = floorDiv(col(hi).cast("long"), bucketWidth)
      val span = hib - lob + 1
      val buckets =
        when(col(hi) < col(lo), raise_error(concat(
            lit("intervalOverlap: interval with hi < lo: ["),
            col(lo).cast("string"), lit(", "), col(hi).cast("string"),
            lit("]"))))
          .when(span > maxBucketsPerInterval, raise_error(concat(
            lit("intervalOverlap: interval ["), col(lo).cast("string"),
            lit(", "), col(hi).cast("string"), lit("] spans "),
            span.cast("string"),
            lit(s" > maxBucketsPerInterval=$maxBucketsPerInterval buckets — " +
              s"raise bucketWidth=$bucketWidth"))))
          .otherwise(sequence(lob, hib))
      df.withColumn("__bkt", explode(buckets))
    }
    burst(left, lo1, hi1).join(burst(right, lo2, hi2), Seq("__bkt"))
      .where(col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        col("__bkt") === floorDiv(greatest(col(lo1), col(lo2)).cast("long"),
          bucketWidth))
      .drop("__bkt")
  }
}
