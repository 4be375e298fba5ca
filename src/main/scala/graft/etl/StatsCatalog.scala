package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics catalog + skipping scan — the
  * data-skipping half of the [[ZOrder]] story, and the parquet-only
  * stand-in for a transactional format's stats log (Delta/Iceberg keep
  * exactly these per-file column ranges in their metadata). A z-ordered
  * layout gives every file a tight bounding box; this catalog makes the
  * engine USE those boxes: a range predicate prunes the file list
  * BEFORE the scan is planned, so skipped files are never opened,
  * listed row-groups never decoded — at 100 TB the difference between
  * touching 3 files and touching 3,000.
  *
  * The catalog itself is metadata-scale (one row per file), built in
  * ONE distributed pass (`input_file_name()` group-by — a two-phase
  * hash agg whose shuffle carries one partial row per file per task),
  * and small enough to collect/broadcast/persist like any manifest.
  */
object StatsCatalog {

  /** One row per data file: row count plus min/max for each requested
    * column. Single pass over the table, partial-agg shuffled by file
    * name only. */
  def collect(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] interval intersects [lo, hi] on `c` —
    * the survivors of predicate-vs-stats pruning. NULL bounds (a file
    * with no non-null values for `c`) are kept: stats may only skip a
    * file when they PROVE it cannot match. */
  private def surviving(stats: DataFrame, c: String,
                        lo: Column, hi: Column): DataFrame =
    stats.where(
      col(s"${c}_max").isNull || col(s"${c}_min").isNull ||
        !(col(s"${c}_max") < lo || col(s"${c}_min") > hi))

  /** Range scan with file-level skipping: prune the catalog to files
    * whose stats intersect [lo, hi], then plan the scan over ONLY those
    * files, with the residual predicate still applied (stats are
    * necessary, not sufficient). Returns (result, filesRead,
    * filesTotal). The collected file list is metadata-scale — the same
    * driver-side footprint every table format's planner pays. */
  def skippingScan(spark: SparkSession, stats: DataFrame, c: String,
                   lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val all = stats.select("__file").collect().map(_.getString(0))
    require(all.nonEmpty, "empty stats catalog")
    val files = surviving(stats, c, lit(lo), lit(hi))
      .select("__file").collect().map(_.getString(0))
    val pred = col(c) >= lit(lo) && col(c) <= lit(hi)
    val result =
      if (files.isEmpty)
        // no file can match: schema-only read of one file, zero rows
        spark.read.parquet(all.head).where(pred).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*).where(pred)
    (result, files.length.toLong, all.length.toLong)
  }
}
