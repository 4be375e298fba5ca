package graft.etl

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the housekeeping every long-lived ingest
  * directory needs: thousands of kilobyte part-files (one per
  * micro-batch / increment) destroy scan parallelism bookkeeping and
  * NameNode/listing budgets. Rewrite into ~`targetBytes` files, with
  * the file count derived from the ACTUAL input byte size, never a
  * hardcoded partition number that silently rots as data grows.
  */
object Compaction {

  /** Current on-disk byte size of a path (recursive). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  /** Rewrite `inDir` parquet into `outDir` as ⌈bytes/targetBytes⌉
    * files. Returns the file count chosen. A round-robin repartition
    * (one full shuffle) balances output sizes; for a merely
    * over-split input, `coalesce` would avoid the shuffle but can
    * leave skewed files — compaction runs rarely and off-peak, so
    * balanced output wins. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): Int = {
    val parts = math.max(1L,
      math.ceil(dirBytes(spark, inDir).toDouble / targetBytes).toLong).toInt
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    parts
  }
}
