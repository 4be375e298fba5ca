package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall/latency sidecar: every approximate serving path in
  * `Similarity` measured against exact brute force on the SAME query
  * batch — recall@10 plus wall per variant. The specs gate recall
  * FLOORS (planted copies, fixture minimums); this records the actual
  * numbers so the accuracy/cost trade of each index family is a
  * table, not an adjective. Fixture embeddings are unclustered random
  * vectors — the hardest case for cell/code pruning (no cluster
  * structure to exploit), so these recalls are conservative
  * lower-bound territory, not cherry-picked.
  *
  * Output: one JSON line → BENCH_ANN_RECALL.json.
  */
object BenchAnnRecall {

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** query_id -> neighbor ids (rank order dropped; recall is set
    * overlap at k). */
  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.ext.Similarity
    val k = 10
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    val queries = emb.where(col("vec_id") % 97 === 3).cache()
    val nq = queries.count()
    // shared trained artifacts (plan literals, as in serving)
    val cents = S.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 2)
    val books = S.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, ksub = 32, iters = 2)
    val (mins, steps) = S.sqBounds(emb, "embedding", dim = 64)
    val (tBrute, exact) = timed {
      topSets(S.bruteTopK(queries, emb, "vec_id", "embedding", k))
    }
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        got.get(q).map(g => (g & ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ivf_nprobe2" -> (() =>
        S.ivfTopKWith(queries, emb, "vec_id", "embedding", k, cents, 2)),
      "ivf_nprobe4" -> (() =>
        S.ivfTopKWith(queries, emb, "vec_id", "embedding", k, cents, 4)),
      "pq" -> (() =>
        S.pqTopK(queries, emb, "vec_id", "embedding", k, books)),
      "sq8" -> (() =>
        S.sqTopK(queries, emb, "vec_id", "embedding", k, mins, steps)),
      "ivfpq_nprobe4" -> (() =>
        S.ivfPqTopK(queries, emb, "vec_id", "embedding", k, cents, 4, books)),
      "matryoshka_d16_s50" -> (() =>
        S.matryoshkaTopK(queries, emb, "vec_id", "embedding", k,
          dims = 16, shortlist = 50)))
    val entries = variants.map { case (name, run) =>
      val (t, got) = timed(topSets(run()))
      f""""$name":{"recall_at_$k":${recall(got)}%.4f,"sec":$t%.3f}"""
    }
    println(s"""{"metric":"ann_recall","sf":"$sfDir","corpus":$n,"queries":$nq,"k":$k,""" +
      f""""brute":{"recall_at_$k":1.0,"sec":$tBrute%.3f},${entries.mkString(",")}}""")
    spark.stop()
  }
}
