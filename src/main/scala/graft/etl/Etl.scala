package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point A — raw labeled narratives → cleaned/labeled table →
  * stratified sample → train/test split → flat training file
  * (`01_merchcat_etl.py` end-to-end), generic over column names so any
  * (label, text) pair works (transactions in the reference; the
  * `documents` fixture here).
  */
object Etl {

  case class Config(
      labelCol: String,
      textCol: String,
      keyCol: String,            // unique integer key, drives deterministic sampling/split
      sampleSize: Double = 5000, // 01_merchcat_etl.py:159
      countThreshold: Long = 100,
      splitFraction: Double = 0.9,
      deterministic: Boolean = true,
      seed: Long = 42L)

  /** Clean + label: the narrow, shuffle-free prefix (scan → regex chain
    * → concat) that whole-stage codegen fuses into the scan. */
  def cleanAndLabel(raw: DataFrame, cfg: Config): DataFrame =
    raw
      .filter(col(cfg.labelCol).isNotNull)
      .withColumn("text_clean", Cleaning.cleanCol(col(cfg.textCol)))
      .withColumn("fasttext", Labeling.encode(col(cfg.labelCol), col("text_clean")))

  /** Full pipeline: returns (train, test) with `class_percentile`. */
  def run(raw: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val labeled = cleanAndLabel(raw, cfg)
    val sampled =
      if (cfg.deterministic)
        Sampling.sampleDataDeterministic(labeled, cfg.labelCol, cfg.keyCol,
          cfg.sampleSize, cfg.countThreshold)
      else
        Sampling.sampleData(labeled, cfg.labelCol, cfg.sampleSize,
          cfg.countThreshold, cfg.seed)
    val withPct =
      if (cfg.deterministic)
        Split.addClassPercentileDeterministic(sampled, cfg.labelCol, cfg.keyCol)
      else
        Split.addClassPercentile(sampled, cfg.labelCol, cfg.seed)
    Split.split(withPct, cfg.splitFraction)
  }
}
