package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-class percentile train/test split (`01_merchcat_etl.py:176-201`).
  *
  * The reference orders each class by **unseeded** `rand()` and writes
  * the `<0.9` and `>=0.9` slices in two separate jobs — the window runs
  * twice and the two runs can disagree. Here the ordering is either
  * seeded (one materialization required) or deterministic (md5 of a
  * unique key — both filter jobs agree for free, no cache needed, and
  * the split is stable across reruns at any scale).
  */
object Split {

  val PercentileCol = "class_percentile"

  /** Faithful variant: percent_rank over seeded rand within each class,
    * half-even-rounded to 4 dp (`01_merchcat_etl.py:179-180`). */
  def addClassPercentile(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
    df.withColumn(PercentileCol, bround(percent_rank().over(w), 4))
  }

  /** Deterministic variant: percent_rank over a portable md5 shuffle key
    * of a unique column — reproducible across runs and engines. */
  def addClassPercentileDeterministic(df: DataFrame, labelCol: String,
                                      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(labelCol))
      .orderBy(md5(col(keyCol).cast("string")))
    df.withColumn(PercentileCol, bround(percent_rank().over(w), 4))
  }

  /** (train, test) slices at `fraction` (default 90/10,
    * `01_merchcat_etl.py:189,197`). Requires [[PercentileCol]]. */
  def split(df: DataFrame, fraction: Double = 0.9): (DataFrame, DataFrame) =
    (df.where(col(PercentileCol) < fraction),
     df.where(col(PercentileCol) >= fraction))
}
