package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-class accuracy + quantile summary — the M2 evaluation contract
  * (`utils/merchcat_utils.py:56-71`, `02_merchcat_ml.py:93-127`).
  *
  * The reference collects the validation set to pandas and evaluates on
  * the driver; here both stages are DataFrame aggregations (per-class
  * mean, then population quantiles over ~|classes| rows), so evaluation
  * scales with the cluster and never funnels row-scale data to the
  * driver.
  */
object Evaluator {

  /** Per-class accuracy: groupBy(label).avg(prediction == label). */
  def perClassAccuracy(scored: DataFrame, labelCol: String,
                       predictionCol: String): DataFrame =
    scored
      .withColumn("__correct",
        when(col(predictionCol) === col(labelCol), 1.0).otherwise(0.0))
      .groupBy(labelCol)
      .agg(avg(col("__correct")).as("accuracy"),
        count(lit(1)).as("n"))

  /** The tracked metric set {avg, q05, q25, q50, q75, q95} of
    * per-class accuracy (`utils/merchcat_utils.py:64-71`). */
  def summary(scored: DataFrame, labelCol: String,
              predictionCol: String): DataFrame =
    perClassAccuracy(scored, labelCol, predictionCol)
      .agg(
        avg(col("accuracy")).as("avg__acc"),
        expr("percentile(accuracy, 0.05)").as("q_05_acc"),
        expr("percentile(accuracy, 0.25)").as("q_25_acc"),
        expr("percentile(accuracy, 0.50)").as("q_50_acc"),
        expr("percentile(accuracy, 0.75)").as("q_75_acc"),
        expr("percentile(accuracy, 0.95)").as("q_95_acc"))

  /** Summary as a plain map (for tracking / tuning objectives). */
  def summaryMap(scored: DataFrame, labelCol: String,
                 predictionCol: String): Map[String, Double] = {
    val row = summary(scored, labelCol, predictionCol).collect().head
    row.schema.fieldNames.zipWithIndex
      .map { case (f, i) => f -> row.getDouble(i) }.toMap
  }
}
