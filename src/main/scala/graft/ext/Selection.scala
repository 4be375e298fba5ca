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

  /** CCNet-style language-model quality scoring (Wenzek et al.,
    * arXiv:1911.00359): train a small LM on a TARGET corpus (CCNet
    * uses a Wikipedia KenLM), score every document by per-token bits
    * (log-perplexity), and bucket the corpus into head / middle /
    * tail thirds by score. This is the hashed-n-gram analog of that
    * recipe — the same move [[dsirWeights]] makes on unigrams, lifted
    * to a bigram model with add-alpha smoothing:
    *
    *   P(w2 | w1) = (n(b1,b2) + alpha) / (n_ctx(b1) + alpha·B)
    *
    * over `B = 16^hexChars` md5-prefix buckets per position, trained
    * on the `isTarget` slice only. An unseen context backs off to the
    * uniform 1/B. `bits_per_token = -Σ log2 P / n_bigrams` — LOW bits
    * = target-like (head), HIGH = out-of-distribution (tail).
    *
    * Shape at 100 TB: the model is ONE bounded hash agg over the
    * target slice (≤ 16^(2·hexChars) pair rows — 65,536 at the
    * default — the same driver-data class as k-means centroids),
    * collected once, re-broadcast as two literal frames (pair counts
    * + context counts). Scoring is a narrow in-row bigram projection,
    * two broadcast joins, and a per-document hash agg — bodies never
    * shuffle, nothing wide scales with corpus size except the
    * per-document agg itself. The head/middle/tail thresholds here
    * use exact `percentile` (oracle-exact at test scale); the
    * production swap is `approx_percentile` over a sample — the
    * thresholds are two doubles either way, applied as literals in a
    * narrow pass.
    *
    * Output: `(idCol, n_bigrams, bits_per_token, ppl_bucket)` —
    * `bits_per_token` 6-dp-rounded, null for documents with < 2
    * tokens (whose `ppl_bucket` is likewise null). */
  def lmDocBits(df: DataFrame, textCol: String, idCol: String,
                isTarget: Column, hexChars: Int = 2,
                alpha: Double = 1.0): DataFrame = {
    val model = lmTrain(df, textCol, isTarget, hexChars, alpha)
    // pin the per-document scores: the tercile-threshold percentile
    // AND the bucket projection both read this frame, and without the
    // pin each re-ran the whole scoring pass (tokenize + bigram
    // explode + two broadcast joins + per-doc agg) over the input —
    // at 100 TB that is scoring the corpus twice to bucket it once.
    // The pinned frame is the SMALL result (id, n_bigrams, bits);
    // everything upstream planned with full pushdown.
    val scored = lmScore(df, textCol, idCol, model).localCheckpoint()
    lmBucket(scored, lmThresholds(scored))
  }

  /** Frozen hashed-bigram LM: the bounded pair counts plus smoothing
    * parameters — driver-held (≤ 16^(2·hexChars) entries, the k-means-
    * centroid data class), serializable, reusable across batches. The
    * production pattern is train-once-apply-everywhere: fit on a
    * sample or the curated base, then score every incoming batch with
    * the SAME frozen model (and frozen tercile thresholds) so
    * incremental curation equals batch curation by construction. */
  final case class LmModel(hexChars: Int, alpha: Double,
                           pairCounts: Seq[(String, String, Long)]) {
    require(hexChars >= 1 && hexChars <= 2,
      s"hexChars=$hexChars (pair space is 16^(2*hexChars); 2 keeps it 65,536)")
    require(alpha > 0, s"alpha=$alpha")
    private[Selection] lazy val ctxCounts: Map[String, Long] =
      pairCounts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
  }

  /** Bigram bucket pairs of every row, IN-ROW: zip the token array
    * with its own tail (zip_with evaluates each array child once per
    * row — see Featurize.ngramsCol for why transform(sequence...) is
    * the trap here); the pad-null tail pair is filtered out. */
  private[graft] def bigramPairs(textCol: String, hexChars: Int): Column = {
    val toks = Featurize.tokensCol(col(textCol))
    filter(
      zip_with(
        transform(toks, t => tokenBucket(t, hexChars)),
        slice(transform(toks, t => tokenBucket(t, hexChars)), lit(2),
          greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("b1"), b.as("b2"))),
      p => p.getField("b2").isNotNull)
  }

  /** Fit the bigram model: ONE bounded hash agg over the `isTarget`
    * slice's bigrams, collected to the driver. */
  def lmTrain(df: DataFrame, textCol: String, isTarget: Column,
              hexChars: Int = 2, alpha: Double = 1.0): LmModel = {
    require(hexChars >= 1 && hexChars <= 2, s"hexChars=$hexChars")
    val counts = df.where(isTarget)
      .select(explode(bigramPairs(textCol, hexChars)).as("__p"))
      .groupBy(col("__p.b1").as("__b1"), col("__p.b2").as("__b2"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    LmModel(hexChars, alpha, counts.toSeq)
  }

  /** Score every document against a FROZEN model: a narrow in-row
    * bigram projection, two broadcast joins (pair counts, context
    * counts), one per-document hash agg. Output:
    * `(idCol, n_bigrams, bits_per_token)` — 6-dp-rounded, null for
    * documents with < 2 tokens. Purely per-document given the model:
    * scoring a union equals the union of scorings. */
  /** The frozen model as its two broadcastable count frames
    * (`(__b1, __b2, __np)` pair counts, `(__b1, __nc)` context
    * counts). */
  private[graft] def modelFrames(
      spark: org.apache.spark.sql.SparkSession,
      model: LmModel): (DataFrame, DataFrame) =
    (spark.createDataFrame(model.pairCounts).toDF("__b1", "__b2", "__np"),
      spark.createDataFrame(model.ctxCounts.toSeq).toDF("__b1", "__nc"))

  /** Per-bigram `-log2 P(b2|b1)` after the model joins (expects
    * `__np`/`__nc` columns, null for unseen). */
  private[graft] def bitsCol(model: LmModel): Column = {
    val nBuckets = math.pow(16.0, model.hexChars)
    val logp = log(
      (coalesce(col("__np"), lit(0L)).cast("double") + model.alpha) /
      (coalesce(col("__nc"), lit(0L)).cast("double") + model.alpha * nBuckets))
    -logp / math.log(2.0)
  }

  def lmScore(df: DataFrame, textCol: String, idCol: String,
              model: LmModel): DataFrame = {
    val spark = df.sparkSession
    val exploded = df.select(col(idCol),
        explode_outer(bigramPairs(textCol, model.hexChars)).as("__p"))
      .select(col(idCol), col("__p.b1").as("__b1"), col("__p.b2").as("__b2"))
    val (pairDf, ctxDf) = modelFrames(spark, model)
    exploded
      .join(broadcast(pairDf), Seq("__b1", "__b2"), "left")
      .join(broadcast(ctxDf), Seq("__b1"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__b1")).as("n_bigrams"),
        sum(when(col("__b1").isNotNull, bitsCol(model))).as("__bits"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") > 0,
          round(col("__bits") / col("n_bigrams"), 6)).as("bits_per_token"))
  }

  /** Tercile thresholds of a scored corpus: two 4-dp-rounded doubles
    * from one bounded percentile agg (nulls ignored; None on an
    * all-null corpus). Exact `percentile` is right at oracle scale;
    * `approxAccuracy > 0` takes the 100 TB path — `approx_percentile`'s
    * mergeable GK sketch (rank error ≤ n/accuracy, never buffers all
    * values) — either way the result is two literal doubles and the
    * downstream [[lmBucket]] pass is unchanged. The agreement between
    * the two paths is spec-enforced (SelectionSpec's approx-threshold
    * test), mirroring `q_shards_approx`'s in-query gate. */
  def lmThresholds(scored: DataFrame,
                   approxAccuracy: Int = 0): Option[(Double, Double)] = {
    val agg =
      if (approxAccuracy > 0)
        approx_percentile(col("bits_per_token"),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(approxAccuracy))
      else
        percentile(col("bits_per_token"), array(lit(1.0 / 3), lit(2.0 / 3)))
    val r = scored.agg(agg.as("__th"))
      .select(round(element_at(col("__th"), 1).cast("double"), 4),
        round(element_at(col("__th"), 2).cast("double"), 4)).head()
    if (r.isNullAt(0)) None else Some((r.getDouble(0), r.getDouble(1)))
  }

  /** Cluster-balanced resampling — cap every embedding cluster's
    * contribution at `perCellCap` rows, the standard antidote to
    * topic skew in scraped corpora (dense topics dominate a uniform
    * sample; capping per k-means cell flattens the topic histogram —
    * the rebalancing half of the SemDeDup paper's pipeline, distinct
    * from its near-duplicate drop). Within a cell, rows are kept by
    * `scoreCol` DESC when given (keep the BEST `perCellCap`
    * documents of each topic) and by deterministic md5-of-id
    * otherwise (an unbiased, reproducible per-cell sample); ties
    * break on id.
    *
    * Scale shape: cell assignment is [[Similarity.assignCells]]'s
    * narrow O(k·dim)-per-row plan-literal pass (no shuffle of
    * vectors beyond it); the cap is a `row_number` over
    * `(cell | order)` that plans as WindowGroupLimit — per-cell
    * top-`perCellCap` without fully sorting any cell partition — and
    * the output is ≤ k·perCellCap rows of `(id, cell, cell_rank)`,
    * broadcast-scale downstream. Vectors ride ONE exchange on
    * `cell`; bodies/embeddings never move again. */
  def clusterBalance(df: DataFrame, idCol: String, vecCol: String,
                     cents: Array[Array[Double]], perCellCap: Int,
                     scoreCol: Option[String] = None): DataFrame = {
    require(perCellCap >= 1, s"perCellCap=$perCellCap")
    import org.apache.spark.sql.expressions.Window
    val ord: Seq[Column] = (scoreCol match {
      case Some(sc) => Seq(col(sc).desc)
      case None => Seq.empty
    }) ++ Seq(md5(col(idCol).cast("string")), col(idCol))
    Similarity.assignCells(df, vecCol, cents)
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy(col("cell")).orderBy(ord: _*)))
      .where(col("cell_rank") <= perCellCap)
      .select(col(idCol), col("cell"), col("cell_rank"))
  }

  /** Diversity-maximizing selection: per k-means cell, the
    * deterministic farthest-point (k-center) greedy of Gonzalez
    * (1985) — the coverage-maximizing counterpart of
    * [[clusterBalance]] (which caps volume but picks by score/md5,
    * i.e. with no regard to how SPREAD the survivors are). Data
    * curation uses this shape to pick representative-yet-diverse
    * exemplars per topic cluster (coreset selection).
    *
    * Deterministic contract (mirrored exactly by the DuckDB oracle):
    * candidates per cell are the `candCap` first rows in
    * `(md5(id), id)` order (the same deterministic sample as
    * [[clusterBalance]]); pick 1 is the smallest id; each further
    * pick maximizes the minimum cosine DISTANCE `1 − round(cos, 6)`
    * to everything already picked, ties broken by smaller id. A
    * zero-norm vector has cosine 0 (distance 1) to everything —
    * [[graft.ext.Similarity]]'s convention. Dot products and norms
    * accumulate left-to-right in Double, so the 6-dp rounding is
    * bit-reproducible cross-engine.
    *
    * Scale shape: ONE exchange on `cell`; the greedy runs per group
    * over at most `candCap` candidates (O(candCap·picks·dim) — the
    * imperative kernel is bounded by construction, which is why
    * `flatMapGroups` is acceptable here). Output is bounded at
    * |cells|·`picksPerCell` rows whatever the corpus. */
  def diverseSelect(df: DataFrame, idCol: String, vecCol: String,
                    cents: Array[Array[Double]], picksPerCell: Int,
                    candCap: Int = 256): DataFrame = {
    require(picksPerCell >= 1, s"picksPerCell=$picksPerCell")
    require(candCap >= picksPerCell,
      s"candCap=$candCap < picksPerCell=$picksPerCell")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val capped = Similarity.assignCells(df, vecCol, cents)
      .withColumn("__ds_rank", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(md5(col(idCol).cast("string")), col(idCol))))
      .where(col("__ds_rank") <= candCap)
      .select(col("cell").cast("int"), col(idCol).cast("long"),
        col(vecCol).cast("array<float>"))
      .as[(Int, Long, Seq[Float])]
    val m = picksPerCell
    capped.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val cands = it.map(t => (t._2, t._3.toArray)).toArray.sortBy(_._1)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = math.min(a.length, b.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < d) {
          val x = a(j).toDouble; val y = b(j).toDouble
          dot += x * y; na += x * x; nb += y * y
          j += 1
        }
        val n1 = math.sqrt(na); val n2 = math.sqrt(nb)
        if (n1 > 0 && n2 > 0) dot / (n1 * n2) else 0.0
      }
      def dist(a: Array[Float], b: Array[Float]): Double =
        1.0 - java.math.BigDecimal.valueOf(cos(a, b))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val n = cands.length
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      val isPicked = new Array[Boolean](n)
      // min distance of each candidate to the picked set so far —
      // updated once per pick, so the greedy is O(picks·candCap·dim)
      val minD = Array.fill(n)(Double.MaxValue)
      var t = 0
      while (t < math.min(m, n)) {
        var best = -1
        var bestD = -1.0
        var i = 0
        while (i < n) {
          if (!isPicked(i) && minD(i) > bestD) { // strict: tie → min id
            bestD = minD(i); best = i
          }
          i += 1
        }
        isPicked(best) = true
        picked += best
        var j = 0
        while (j < n) {
          if (!isPicked(j)) {
            val dp = dist(cands(j)._2, cands(best)._2)
            if (dp < minD(j)) minD(j) = dp
          }
          j += 1
        }
        t += 1
      }
      picked.iterator.zipWithIndex.map { case (i, idx) =>
        (cell, idx + 1, cands(i)._1)
      }
    }.toDF("cell", "pick_rank", idCol)
  }

  /** Apply frozen tercile thresholds as literals in a narrow pass:
    * head (≤ t1) / middle (≤ t2) / tail; null score → null bucket. */
  def lmBucket(scored: DataFrame,
               thresholds: Option[(Double, Double)]): DataFrame = {
    val bucket = thresholds match {
      case Some((t1, t2)) =>
        when(col("bits_per_token").isNull, lit(null).cast("string"))
          .when(col("bits_per_token") <= t1, "head")
          .when(col("bits_per_token") <= t2, "middle")
          .otherwise("tail")
      case None => lit(null).cast("string")
    }
    scored.withColumn("ppl_bucket", bucket)
  }
}
