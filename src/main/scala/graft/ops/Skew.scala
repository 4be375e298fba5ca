package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is hot.
  *
  * Spark's AQE rewrites skewed SORT-MERGE joins at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE) by
  * splitting oversized partitions. Explicit salting remains the tool
  * when AQE can't help: broadcast-ineligible shuffled-hash joins,
  * deterministic partitioning requirements, or a hot key inside an
  * aggregation pipeline that must fan out before combining.
  *
  * The salted join replicates the build side `salts`× — use a salt
  * count around (hot-key rows / average-partition rows), not a large
  * constant: replication is the price, evenness the product.
  */
object Skew {

  /** Equi-join where `left` has skewed key values: each left row gets
    * a salt in [0, salts); `right` is exploded into `salts` replicas,
    * so every (key, salt) bucket finds its matches and the hot key's
    * rows spread over `salts` partitions instead of one. For inner /
    * left / left_semi joins the result is row-identical to the unsalted
    * join (the salt never leaks). Right/full outer are rejected: the
    * right side is replicated `salts`×, so an unmatched right row would
    * be emitted once per replica. The salt is seeded-random — any
    * distribution works, uniform is best; join semantics don't depend
    * on it. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, salts: Int,
                 joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
        "left_semi", "leftanti", "left_anti", "cross")
        .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin replicates the right side, which breaks right/full " +
        s"outer semantics; unsupported joinType: $joinType")
    val l = left.withColumn("__salt", floor(rand(seed) * salts).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r,
        l("__salt") === r("__salt") && l(leftKey) === r(rightKey),
        joinType)
      .drop("__salt")
  }

  /** Two-phase aggregation for a hot group key: count per (key, salt)
    * first (fans the hot key over `salts` reducers), then combine per
    * key. Spark's map-side partial aggregation already does this
    * within a partition; the salt phase adds a REDUCER-side fan-out
    * for keys whose post-combine volume still overwhelms one task
    * (e.g. high-cardinality distinct-style payloads). */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int,
                  seed: Long = 42L): DataFrame =
    df.withColumn("__salt", floor(rand(seed) * salts).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Key-distribution diagnostic — the measurement that decides
    * whether a join/agg needs salting at all, and what salt count to
    * use (hot-key share ÷ average-partition share). Top-k keys by row
    * count with their share of the table: one two-phase hash count
    * (map-side partials shrink the shuffle to distinct keys per task),
    * a broadcast single-row total, top-k as TakeOrderedAndProject —
    * nothing here is heavier than the aggregation being diagnosed. */
  def profile(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__total"))))
      .withColumn("share", col("n") / col("__total"))
      .drop("__total")
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
}
