package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the
  * (small) query set against the corpus; exact, embarrassingly
  * parallel, the right answer when |queries| · |corpus| fits the
  * cluster. Scale path: IVF — corpus pre-partitioned by
  * nearest-centroid cell; queries probe only `nprobe` cells, cutting
  * scanned vectors by ~|cells|/nprobe at the cost of recall.
  *
  * All element arithmetic is widened to double before multiply/fold so
  * results are IEEE-deterministic (and match the DuckDB oracle).
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic accumulation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (absorbs engine-side FP noise
    * while keeping 1e-6 discrimination). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, round(dot(a, b) / d, 6)).otherwise(0.0)
  }

  /** Brute-force exact top-k: every query scored against every corpus
    * vector (query side broadcast), ranked per query with id
    * tie-break. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic ±1 plane pattern for pseudo-plane `p` over `dim`
    * dimensions, derived from md5 at PLAN time (the pattern depends
    * only on (p, j), so hashing per row/element would be pure waste —
    * it becomes a literal array in the plan). */
  private[ext] def planeSigns(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val h = md.digest(s"$p|$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Sign-bucket key from `nBits` deterministic pseudo-planes: plane p
    * is a ±1 literal pattern over dimensions, so the bucket of a vector
    * is stable across runs with no stored plane matrix. Nearby vectors
    * likely share buckets. `dim` must match the embedding length. */
  def signBucket(vec: Column, nBits: Int, dim: Int = 64): Column = {
    val bits = (0 until nBits).map { p =>
      val signs = lit(planeSigns(p, dim))
      val proj = aggregate(
        zip_with(vec, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** IVF index: pick `nCells` deterministic centroid vectors (every
    * |corpus|/nCells-th id), assign every vector to its nearest
    * centroid. Returns the corpus with a `cell` column — at scale this
    * is the partitioning/bucketing key for the stored index. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int): DataFrame = {
    val cents = corpus.select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("cent_id"))))
      .withColumn("__total", count(lit(1)).over(Window.partitionBy(lit(1))))
      .where(pmod(col("__rn") - 1,
        greatest(lit(1L), (col("__total") / nCells).cast("long"))) === 0)
      .drop("__rn", "__total")
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cent_id"))
    corpus.join(broadcast(cents))
      .withColumn("__sim", cosine(col(vecCol), col("cent_vec")))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(corpus.columns.map(col) :+ col("cent_id").as("cell"): _*)
  }

  /** IVF approximate top-k: probe the `nprobe` cells nearest each
    * query, exact cosine within those cells only. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nprobe: Int = 4): DataFrame = {
    val indexed = ivfAssign(corpus, idCol, vecCol, nCells).cache()
    val cents = indexed.select(col("cell")).distinct()
      .join(indexed.where(col(idCol) === col("cell"))
        .select(col("cell").as("c2"), col(vecCol).as("cent_vec")),
        col("cell") === col("c2"))
      .select("cell", "cent_vec")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cell"))
    val probed = q.join(broadcast(cents))
      .withColumn("__csim", cosine(col("qv"), col("cent_vec")))
      .withColumn("__pr", row_number().over(wProbe))
      .where(col("__pr") <= nprobe)
      .select("query_id", "qv", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probed.join(indexed.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
