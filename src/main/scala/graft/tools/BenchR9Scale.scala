package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-9 curation additions —
  * C4 cleaning flags, the approx-percentile curriculum boundary, and
  * the sketch-based datasheet aggregates — at 1×/10×/100× replicas of
  * the sf0.1 documents fixture (same token-suffix bijection as the
  * other sidecars: replicas are distinct documents with the fixture's
  * within-replica structure).
  *
  * Expected shapes, checked in the output:
  *  - c4: a pure narrow flag pass — flagged rows exactly linear, wall
  *    scan-bound (~linear);
  *  - shards_approx: `curriculumShards(approxAccuracy)` — ONE bounded
  *    GK-sketch agg for the boundaries (mergeable, never buffers all
  *    values) + a narrow assignment + per-shard window; output rows
  *    exactly linear;
  *  - datasheet_sketch: the HLL++ distinct + GK median one-pass agg
  *    over the whole corpus — always ONE row out, wall is the
  *    sketch-merge cost the exact path cannot bound at 100 TB.
  */
object BenchR9Scale {

  private def docReplicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        col("lang"), col("n_chars"),
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1w$k")).as("text"))
    }.reduce(_ union _)

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def materialize(spark: SparkSession, df: DataFrame,
                          tag: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r9scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
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
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text")
    // warmup
    graft.ext.TextStats.withC4Flags(docs.limit(200), "text").count()
    val runs = scales.map { n =>
      val corpus = materialize(spark, docReplicas(docs, n), s"docs$n")
      val (tc, nc) = timed {
        graft.ext.TextStats.withC4Flags(corpus, "text")
          .where(col("n_kept") >= 0).count()
      }
      val (ts, ns) = timed {
        graft.etl.Sharding.curriculumShards(
            corpus.select(col("doc_id"),
              col("n_chars").cast("double").as("difficulty")),
            "difficulty", "doc_id", nShards = 4, approxAccuracy = 10000)
          .count()
      }
      val (td, _) = timed {
        corpus.select(col("lang"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("__tok"),
            md5(col("text")).as("__h"))
          .agg(approx_count_distinct(col("__h")),
            approx_count_distinct(col("lang")),
            percentile_approx(col("__tok"), lit(0.5), lit(10000)))
          .head()
      }
      f""""x$n":{"c4":{"sec":$tc%.3f,"rows":$nc},"shards_approx":{"sec":$ts%.3f,"rows":$ns},"datasheet_sketch":{"sec":$td%.3f}}"""
    }
    println(s"""{"metric":"r9_family_scaling","sf":"$sfDir",${runs.mkString(",")}}""")
    spark.stop()
  }
}
