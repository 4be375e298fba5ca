package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document-quality filtering — the GPT-3/LLaMA pipeline
  * stage the rule filters (Gopher/C4, `graft.ext.TextStats`) feed:
  * train a classifier to tell CURATED text from RAW crawl, score every
  * candidate document with a keep-probability, and keep by threshold
  * (or sample proportional to the probability, the GPT-3 variant — the
  * caller has `keep_prob` to do either). Built on [[Trainer]]'s hashed
  * n-gram logistic regression, so scoring is a pure distributed
  * transform: featurize (narrow, codegen) → vector math → probability
  * extract; no driver round-trips, no UDF workers, and the model rides
  * to executors once inside the plan.
  *
  * Scale shape: training sees only the (bounded) curated reference set
  * plus a raw sample; scoring is one narrow pass over the corpus. The
  * composition contract (spec-pinned): `filter` slots between the rule
  * filters and dedup in a curation pipeline, consuming and producing
  * plain (id, text, ...) frames.
  */
object QualityFilter {

  /** The curated-vs-raw label values the classifier trains on. */
  val KeepLabel = "keep"
  val DropLabel = "drop"

  case class QualityModel(model: Model) {
    /** Append `outCol` = P(curated | text) to `df`. */
    def score(df: DataFrame, textCol: String,
              outCol: String = "keep_prob"): DataFrame =
      model.predictProba(df, textCol, KeepLabel, outCol)

    /** Keep rows whose keep-probability clears `threshold`. */
    def filter(df: DataFrame, textCol: String, threshold: Double,
               outCol: String = "keep_prob"): DataFrame =
      score(df, textCol, outCol).where(col(outCol) >= threshold)
  }

  /** Train curated-vs-raw on the union of the two frames (only
    * `textCol` is read from either side). `curated` is the
    * high-quality reference (e.g. a vetted corpus or the rule-filter
    * survivors); `raw` is unfiltered crawl. */
  def train(curated: DataFrame, raw: DataFrame, textCol: String,
            params: Trainer.Params =
              Trainer.Params(epoch = 3, wordNgrams = 2,
                numFeatures = 1 << 14)): QualityModel = {
    val labeled = curated.select(col(textCol)).withColumn("__q", lit(KeepLabel))
      .unionByName(raw.select(col(textCol)).withColumn("__q", lit(DropLabel)))
    QualityModel(Trainer.train(labeled, "__q", textCol, params))
  }
}
