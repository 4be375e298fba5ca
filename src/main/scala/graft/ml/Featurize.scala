package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.HashingTF

/** Text featurization mirroring fastText's input representation
  * (`02_merchcat_ml.py:64-83`): whitespace tokens plus word n-grams up
  * to `wordNgrams`, hashed into a fixed bucket space
  * (fastText `bucket=2,000,000` → `numFeatures`).
  *
  * The n-gram expansion is pure Catalyst (`transform`/`slice`/
  * `array_join` over the token array) so the whole featurization stays
  * in whole-stage codegen; only the final term-frequency hash uses the
  * Spark ML `HashingTF` transformer. No shuffle anywhere — featurize is
  * a narrow map over the scan.
  */
object Featurize {

  /** Whitespace tokenization of already-cleaned text; null-safe (null
    * text → empty token array, so scoring never NPEs downstream). */
  def tokensCol(text: Column): Column =
    coalesce(
      filter(split(trim(text), "\\s+"), t => length(t) > 0),
      array().cast("array<string>"))

  /** All word n-grams of a fixed n (n >= 2) as space-joined strings.
    * Guarded: fewer than n tokens → empty array (a bare
    * `sequence(1, size-n+1)` runs DESCENDING when size < n and then
    * slices from index 0, which is an error). */
  def ngramsCol(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Unigrams ++ 2-grams ++ ... ++ `maxN`-grams — fastText's
    * `wordNgrams` expansion. */
  def allGramsCol(text: Column, maxN: Int): Column = {
    val toks = tokensCol(text)
    (2 to maxN).foldLeft(toks)((acc, n) => concat(acc, ngramsCol(toks, n)))
  }

  /** Add `featuresCol` (sparse TF vector over hashed grams) to `df`. */
  def addFeatures(df: DataFrame, textCol: String, featuresCol: String,
                  wordNgrams: Int, numFeatures: Int): DataFrame = {
    val withGrams = df.withColumn(s"__grams_$featuresCol",
      allGramsCol(col(textCol), wordNgrams))
    val tf = new HashingTF()
      .setInputCol(s"__grams_$featuresCol")
      .setOutputCol(featuresCol)
      .setNumFeatures(numFeatures)
    tf.transform(withGrams).drop(s"__grams_$featuresCol")
  }
}
