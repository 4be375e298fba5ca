package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ml.Featurize

/** Data selection via importance resampling (the DSIR recipe of Xie
  * et al., arXiv:2302.03169): score every raw document by how much its
  * hashed-token distribution looks like a TARGET slice, then resample
  * raw data by those weights. The engine-side deliverable is the
  * weight computation — the resample step is [[graft.etl.Sampling]]'s
  * existing deterministic membership machinery.
  *
  * Shape at 100 TB: both bucket models (target and raw) come out of
  * ONE explode + map-side-combinable hash agg over the corpus, keyed
  * by `buckets`-many md5-prefix buckets — the model is O(buckets)
  * rows regardless of corpus size, broadcast back for the per-document
  * scoring pass. Document bodies never shuffle; the only wide steps
  * are the bounded bucket agg and the per-document weight sum (a hash
  * agg on the document key).
  */
object Selection {

  /** Hashed-unigram bucket of a token: the leading hex chars of
    * `md5(token)` — deterministic, engine-portable (DuckDB mirrors the
    * same md5 prefix), and uniform over `16^hexChars` buckets. */
  def tokenBucket(token: Column, hexChars: Int): Column =
    substring(md5(token), 1, hexChars)

  /** Per-document DSIR importance weight:
    * `sum over tokens of ln(p_target(bucket) / p_raw(bucket))` with
    * Laplace smoothing `(count + alpha) / (total + alpha·B)` over the
    * full `B = 16^hexChars` bucket space. Positive weights mean "looks
    * more like the target than the background"; resampling by
    * `exp(weight)` (or rank-thresholding the weight directly) is the
    * DSIR selection step.
    *
    * `isTarget` is any boolean Column over `df`'s rows defining the
    * target slice (e.g. `col("lang") === "en"`, a quality flag, a
    * hand-curated id set joined in upstream). Output:
    * `(idCol, n_tokens, weight)` with `weight` rounded to 6 dp. */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
                  isTarget: Column, hexChars: Int = 2,
                  alpha: Double = 1.0): DataFrame = {
    // hexChars <= 4 keeps the collected model bounded at 65,536 rows —
    // the same driver-data class as k-means centroids / rate maps
    require(hexChars >= 1 && hexChars <= 4, s"hexChars=$hexChars")
    require(alpha > 0, s"alpha=$alpha")
    val nBuckets = math.pow(16.0, hexChars)
    val spark = df.sparkSession
    val toks = df.select(col(idCol), isTarget.as("__tgt"),
      Featurize.tokensCol(col(textCol)).as("__t"))
    // bucket per token IN-ROW, then explode (a generator can't nest
    // inside an expression, and the md5 work rides the narrow map
    // either way)
    val tokenBuckets = toks.select(col(idCol), col("__tgt"),
      explode(transform(col("__t"), t => tokenBucket(t, hexChars))).as("__b"))
    // both models in ONE bounded corpus pass: raw = every token,
    // target = the target slice's tokens. The model is O(16^hexChars)
    // rows however big the corpus is, so it collects to the driver
    // (totals are then exact integer sums) instead of letting the
    // totals agg and the scoring join each re-derive the corpus pass.
    val model = tokenBuckets.groupBy("__b")
      .agg(count(lit(1)).as("__n_raw"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__n_tgt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totRaw = model.map(_._2).sum
    val totTgt = model.map(_._3).sum
    // java.lang.Math.log == Catalyst log == DuckDB ln on these inputs
    val lr = model.map { case (b, nRaw, nTgt) =>
      (b,
        math.log((nTgt.toDouble + alpha) / (totTgt.toDouble + alpha * nBuckets)) -
        math.log((nRaw.toDouble + alpha) / (totRaw.toDouble + alpha * nBuckets)))
    }
    val scoredModel = spark.createDataFrame(lr.toSeq).toDF("__b", "__lr")
    tokenBuckets
      .join(broadcast(scoredModel), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lr")), 6).as("weight"))
  }
}
