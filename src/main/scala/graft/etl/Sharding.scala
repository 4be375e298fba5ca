package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding for training export.
  *
  * Training runs want the corpus in a shuffled order, split into
  * `nShards` roughly-equal shard files, reproducibly — the same
  * corpus must yield byte-identical shards on every run (resumable
  * exports, bisectable data bugs). Randomness is therefore a pure
  * function of the key: shard = md5-bucket(key), within-shard order =
  * md5(key) (ties broken by the key itself), position = dense 1-based
  * rank within the shard.
  *
  * Scale shape: ONE exchange, on `shard` (uniform by construction —
  * md5 buckets), then a per-shard sort inside the window. That is
  * exactly the layout a sharded write needs anyway (`partitionBy
  * (shard)` with one file per shard), so nothing is wasted: no global
  * single-partition window (the [[Ids]] trap), no driver collect.
  * Size `nShards` so a shard fits an executor's sort buffer — at
  * 100 TB that is tens of thousands of shards, which is also the
  * healthy file count for the export. */
object Sharding {

  /** Assign `(shard, pos)` to every row: shard in `[0, nShards)`,
    * pos the 1-based position in the shard's deterministic shuffled
    * order. `keyCol` must be unique for the order to be total.
    *
    * `epoch` serves multi-epoch training: each epoch needs a DISTINCT
    * deterministic order without rewriting the corpus, so epochs > 0
    * salt the within-shard order md5 with the epoch number while
    * SHARD MEMBERSHIP stays epoch-invariant (`membershipBucket(key)`
    * never sees the salt) — a trainer re-reads the same shard files
    * and only the read order inside each shard changes. Epoch 0 is
    * the identity salt (the canonical export order). */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int,
                    epoch: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards=$nShards")
    require(epoch >= 0, s"epoch=$epoch")
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.membershipBucket(col(keyCol), nShards).cast("int")
    val orderKey =
      if (epoch == 0) md5(col(keyCol).cast("string"))
      else md5(concat_ws("|", lit(epoch.toString), col(keyCol).cast("string")))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(orderKey, col(keyCol))))
  }

  /** Curriculum sharding: shard = contiguous SCORE range (shard 0 =
    * easiest fraction, shard n−1 = hardest), position = `(score, key)`
    * order within the shard — the ordered-export counterpart of
    * [[shuffleShards]] for curriculum-learning schedules (train easy →
    * hard by streaming shards in order).
    *
    * A naive global `orderBy` would funnel the corpus through a range
    * exchange dominated by one sort; instead the shard boundaries come
    * from ONE bounded exact-`percentile` agg (4-dp-rounded, the
    * [[graft.ext.Selection.lmThresholds]] idiom — `approx_percentile`
    * is the documented 100 TB swap, same two-literal shape), applied
    * as literals in a NARROW pass; the only wide op is the per-shard
    * position window. Scores must be pre-rounded (all library scorers
    * emit 6 dp) so the boundary compare is engine-portable. Ties at a
    * boundary go to the LOWER shard (`score > b` strictly). */
  def curriculumShards(df: DataFrame, scoreCol: String, keyCol: String,
                       nShards: Int, approxAccuracy: Int = 0): DataFrame = {
    require(nShards >= 2, s"nShards=$nShards")
    import org.apache.spark.sql.expressions.Window
    val probs = (1 until nShards).map(_.toDouble / nShards)
    // approxAccuracy > 0 takes the 100 TB path: approx_percentile's
    // mergeable GK sketch (error ≤ 1/accuracy of rank) instead of the
    // exact all-values percentile buffer. Same two-literal shape
    // downstream — the swap changes ONLY how the boundary doubles are
    // computed, never the assignment pass.
    val bAgg =
      if (approxAccuracy > 0)
        approx_percentile(col(scoreCol), array(probs.map(lit): _*),
          lit(approxAccuracy))
      else percentile(col(scoreCol), array(probs.map(lit): _*))
    val r = df
      .agg(bAgg.as("__b"))
      .select((1 until nShards).map(i =>
        round(element_at(col("__b"), i).cast("double"), 4).as(s"b$i")): _*)
      .head()
    require(!r.isNullAt(0),
      "curriculumShards: empty input or all-null scores — no boundaries")
    val bounds = (0 until nShards - 1).map(r.getDouble)
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(scoreCol) > b, 1).otherwise(0)
    }
    df.withColumn("shard", shard.cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col(scoreCol), col(keyCol))))
  }

  /** Materialize the shuffled shards as the training-export layout:
    * one parquet directory per shard (`shard=K/`), each holding ONE
    * file whose row order IS the shard's shuffled order (a trainer
    * streams shards sequentially and relies on on-disk order; parquet
    * preserves write order within a file). The shard exchange feeds
    * `partitionBy` directly — `repartition(shard)` places each shard
    * wholly in one task (hash collisions may co-locate two shards in
    * a task; the in-task `(shard, pos)` sort keeps every shard file
    * pos-ascending regardless), so each `shard=K/` dir gets exactly
    * one file and nothing is re-shuffled for the write. Returns the
    * assigned frame re-read from disk (self-check friendly). */
  def writeSharded(df: DataFrame, keyCol: String, nShards: Int,
                   outDir: String, epoch: Int = 0): DataFrame = {
    val spark = df.sparkSession
    shuffleShards(df, keyCol, nShards, epoch)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** [[writeSharded]] in the format trainers actually stream: one
    * JSONL file per shard (`shard=K/` dir, single `.txt` part whose
    * LINE order is the shard's shuffled order). Every non-key column
    * rides into the JSON object plus `shard`/`pos`, so an exported
    * line is self-describing and the export is audit-replayable.
    * Same write shape as the parquet sink — the shard exchange feeds
    * `partitionBy` directly, in-task `(shard, pos)` sort, exactly one
    * file per shard dir, nothing re-shuffled for the write. Returns
    * the re-parsed frame (self-check friendly; callers compare it to
    * [[shuffleShards]] output). */
  def writeShardedJsonl(df: DataFrame, keyCol: String, nShards: Int,
                        outDir: String, epoch: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val assigned = shuffleShards(df, keyCol, nShards, epoch)
    val payload = assigned.columns.filterNot(_ == "shard")
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .select(col("shard"),
        to_json(struct(payload.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").partitionBy("shard").text(outDir)
    spark.read.text(outDir) // partition discovery restores `shard`
      .select(col("shard"),
        from_json(col("value"), assigned.drop("shard").schema).as("__r"))
      .select(col("shard") +: payload.filterNot(_ == "shard")
        .map(c => col(s"__r.$c").as(c)).toIndexedSeq: _*)
  }
}
