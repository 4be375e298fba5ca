package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-12 additions at 1×/10×/
  * 100× replicas of the sf0.1 fixtures (same shifted-id bijections as
  * the sibling sidecars):
  *
  *  - `unicode_stats`: the unicode correctness family's shared shape
  *    (union with the 22 planted literals + narrow codepoint/byte
  *    projections) — the planted side is CONSTANT, so wall must track
  *    the corpus scan ~linearly;
  *  - `script_id`: `withScriptId` over the corpus — 11 regexp-strip
  *    counts in ONE codegen projection; ~linear scan cost is the
  *    design claim;
  *  - `ranking_metrics`: BM25 top-10 (corpus-sized retrieval) then
  *    `rankingMetrics` against a same-lang truth set. The METRIC
  *    stage operates on |truth| + |queries|·k rows whatever the
  *    corpus — measured separately from retrieval so the
  *    corpus-size-independence claim is a number, not a sentence;
  *  - `bpe_apply_bytes`: byte-level tokenization of the corpus with 8
  *    trained merges — the hex stream is 3× text bytes (two hex
  *    chars + separator per byte); one narrow regexp chain, ~linear.
  *
  * Output: one JSON line → BENCH_R12_SCALE.json.
  */
object BenchR12Scale {

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
      s"graft_r12scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val T = graft.ext.TextStats
    val entries = scales.map { n =>
      val docs = materialize(spark, docReplicas(docs0, n), s"docs$n")
        .select("doc_id", "lang", "text")
      val uni = docs.unionAll(graft.ext.UnicodeFixture.df(spark))

      val (tStats, nStats) = timed {
        uni.select(col("doc_id"), length(col("text")).as("n_chars"),
            octet_length(col("text")).as("n_bytes"),
            T.nonAsciiCount(col("text")).as("na"),
            md5(col("text")).as("h"))
          .agg(count(lit(1)), sum(col("na"))).head().getLong(0)
      }

      val (tScript, nScript) = timed {
        T.withScriptId(uni, "text", "script")
          .groupBy("script").agg(count(lit(1)))
          .collect().map(_.getLong(1)).sum
      }

      // retrieval: corpus-sized BM25 stage vs corpus-independent
      // metric stage, measured separately
      val queries = docs.where(col("doc_id") < 5)
      val (tBm25, run) = timed {
        val r = graft.ext.Retrieval.bm25TopK(queries, docs,
          "doc_id", "text", k = 10).cache()
        r.count()
        r
      }
      val truth = queries.select(col("doc_id").as("query_id"), col("lang"))
        .join(docs.where(col("doc_id") < 100).select("doc_id", "lang"),
          Seq("lang"))
        .select("query_id", "doc_id")
      val (tMetrics, mRows) = timed {
        graft.ext.Retrieval.rankingMetrics(run, truth,
          "query_id", "doc_id", "rank", 10).count()
      }
      run.unpersist()

      val merges = T.bpeTrainBytes(
        docs0.where(col("doc_id") % 10 === 0).select("text"), "text", 8)
        .map(m => (m._1, m._2))
      val (tBytes, nSym) = timed {
        T.bpeApplyBytes(docs, "text", merges)
          .agg(sum(size(col("bpe_symbols")))).head().getLong(0)
      }
      val (tBytesL, nSymL) = timed {
        T.bpeApplyLargeBytes(docs, "text", merges)
          .agg(sum(size(col("bpe_symbols")))).head().getLong(0)
      }
      require(nSymL == nSym, s"large/regex symbol count diverged: $nSymL vs $nSym")

      System.err.println(f"[r12scale] x$n stats=$tStats%.1f script=$tScript%.1f " +
        f"bm25=$tBm25%.1f metrics=$tMetrics%.2f bytes=$tBytes%.1f large=$tBytesL%.1f")
      f""""x$n":{"docs":$nStats,"unicode_stats_sec":$tStats%.2f,""" +
        f""""script_id_sec":$tScript%.2f,"script_rows":$nScript,""" +
        f""""bm25_sec":$tBm25%.2f,"ranking_metrics_sec":$tMetrics%.3f,""" +
        f""""metric_rows":$mRows,"bpe_bytes_sec":$tBytes%.2f,""" +
        f""""bpe_bytes_large_sec":$tBytesL%.2f,""" +
        f""""bpe_symbols":$nSym}"""
    }
    println(s"""{"metric":"r12_scale","sf":"$sfDir",${entries.mkString(",")}}""")
    spark.stop()
  }
}
