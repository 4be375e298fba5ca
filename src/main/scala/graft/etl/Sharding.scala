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
    * order. `keyCol` must be unique for the order to be total. */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards=$nShards")
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.membershipBucket(col(keyCol), nShards).cast("int")
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(md5(col(keyCol).cast("string")), col(keyCol))))
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
                   outDir: String): DataFrame = {
    val spark = df.sparkSession
    shuffleShards(df, keyCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
