package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join: build a bloom filter over the SMALL side's
  * join key (one distributed `treeAggregate` pass,
  * `DataFrameStatFunctions.bloomFilter`), prune the BIG side with the
  * codegen'd [[graft.functions.BloomMightContain]] probe right above
  * its scan, then run the normal equi-join. The join removes the
  * filter's false positives, so the result is EXACTLY the plain join —
  * the bloom only cuts how many big-side rows reach the shuffle.
  *
  * This is the manual form of the row-level runtime filter Spark's
  * optimizer injects when it can (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`): under user control it applies where the
  * optimizer won't fire — a small side that is itself a subquery the
  * cost model can't see through, a key carried through a UDF-free but
  * non-trivial expression, or a reused filter probed by several big
  * tables in one pipeline.
  *
  * 100 TB design: the big side is never collected or shuffled before
  * the probe — pruning happens scan-side, inside whole-stage codegen,
  * before the exchange whose volume it cuts. The filter itself is
  * `expectedItems`-sized (~1.2 MB per million keys at 3% fpp), built
  * distributed, and shipped to executors once per task as a plan
  * constant. At a billion small-side keys the filter outgrows the
  * plan — that regime wants the semi-join instead; `expectedItems` is
  * the caller's declaration that it fits.
  */
object BloomJoin {

  /** Serialized bloom filter over `df`'s long-typed `key` column. */
  def buildBloom(df: DataFrame, key: String,
                 expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val bf = df.stat.bloomFilter(key, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe column over a prebuilt serialized filter
    * (session needed once to register the native function). */
  def mightContain(spark: org.apache.spark.sql.SparkSession,
                   bloomBytes: Array[Byte], key: Column): Column = {
    graft.GraftFunctions.register(spark)
    call_function("bloom_might_contain", lit(bloomBytes), key.cast("long"))
  }

  /** `big ⋈ small` on `bigKey = smallKey`, with the big side
    * bloom-pruned before the join. Result is exactly the plain inner
    * equi-join. */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBloom(small, smallKey, expectedItems, fpp)
    big.where(mightContain(big.sparkSession, bytes, col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }
}
