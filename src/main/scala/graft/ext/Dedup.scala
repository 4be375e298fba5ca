package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ml.Featurize

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design:
  *   - signatures/fingerprints are narrow per-row expressions (no
  *     shuffle, codegen);
  *   - candidate generation is an equi-join on LSH band keys (shuffle
  *     on a short hash string — never an all-pairs cross join);
  *   - verification (exact Jaccard / cosine) runs only on candidates.
  *
  * All hash material is md5-based, so signatures are deterministic and
  * portable across engines (DuckDB oracles use the same construction).
  */
object Dedup {

  /** k-token shingles of the text. */
  def shingles(text: Column, k: Int = 3): Column =
    Featurize.ngramsCol(Featurize.tokensCol(text), k)

  /** MinHash signature: for each of `numHashes` seeded hash families,
    * the minimum md5 of (seed || shingle). String-min over hex is a
    * valid order statistic — no integer conversion needed. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, x => md5(concat(lit(i.toString + "|"), x))))
    }: _*)

  /** LSH band keys: the signature chopped into `bands` groups of
    * `rowsPerBand`, each band hashed to one key. A pair agreeing on ANY
    * band becomes a candidate. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Exact dedup: keep the smallest id per identical (normalized) text.
    * Hash-partition by the text itself — at 100 TB the group key is the
    * full text; for very long docs dedupe on `md5(text)` instead. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH candidate pairs: explode band keys, self-join per
    * bucket, emit (idA < idB) pairs. Output is linear in Σ bucket²,
    * so callers should verify + threshold right after. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(shingles(col(textCol)), numHashes).as("sig"))
    val banded = sig.select(col("id"),
      explode(bandKeys(col("sig"), bands, rows)).as("band"))
    banded.as("a").join(banded.as("b"), Seq("band"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = (size(da) + size(db)).cast("double") - size(array_intersect(da, db))
    when(union > 0, round(inter / union, 6)).otherwise(0.0)
  }

  /** MinHash near-duplicate pairs: LSH candidates verified with exact
    * shingle Jaccard >= `threshold`. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.5,
                   numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val cands = lshCandidatePairs(df, textCol, idCol, numHashes, bands)
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol)).as("__sh"))
    cands
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 16-bit SimHash from md5 material: per token take 4 hex chars as a
    * 16-bit hash; each bit votes +1/−1 weighted by occurrence; the sign
    * vector packs into an integer. Pure integer arithmetic → portable. */
  def simhash16(tokens: Column): Column = {
    val bitSums = (0 until 16).map { b =>
      aggregate(tokens, lit(0L), (acc, t) => {
        val h = conv(substring(md5(t), 1, 4), 16, 10).cast("long")
        acc + (pmod(floor(h / math.pow(2, b).toLong).cast("long"), lit(2L)) * 2 - 1)
      })
    }
    (0 until 16).map { b =>
      when(bitSums(b) > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Hamming distance between two packed simhash values (16 bit). */
  def hamming16(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs over an `Array[Float]`
    * column: candidates from a sign-bucket LSH over deterministic
    * pseudo-planes, verified with exact cosine >= `threshold`. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95): DataFrame = {
    val withBucket = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.signBucket(col(vecCol), 8).as("bucket"))
    withBucket.as("a").join(withBucket.as("b"), Seq("bucket"))
      .where(col("a.id") < col("b.id"))
      .withColumn("cosine", Similarity.cosine(col("a.vec"), col("b.vec")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
      .distinct()
  }
}
