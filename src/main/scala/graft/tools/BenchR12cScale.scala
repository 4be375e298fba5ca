package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-12 THIRD-WAVE additions at
  * 1×/10×/100× replicas of the sf0.1 fixtures (same shifted-id
  * bijections as the sibling sidecars):
  *
  *  - `sentences`: [[graft.ext.TextStats.splitSentences]] over docs
  *    re-punctuated every 5 tokens — narrow posexplode, ~linear;
  *  - `paradedup`: [[graft.ext.Dedup.paragraphDedup]] over docs broken
  *    into 8-token paragraphs, 10% sharing a boilerplate footer — the
  *    packed-key winner agg is the only shuffle;
  *  - `tfidf`: [[graft.ext.Retrieval.tfIdfKeywords]] top-5/minDf=2 —
  *    postings⇄df term join + per-doc window, ~linear (vocabulary
  *    grows with the replica suffixes, never broadcast);
  *  - `compress`: [[graft.ext.TextStats.withCompressionRatio]] — pure
  *    narrow codegen projection, linear in corpus bytes;
  *  - `cms build` vs `cms merge`: [[graft.functions.CountMinAgg]] per
  *    (lang, 64-way shard) grids built at n× (linear) vs corpus-wide
  *    re-merge of the STORED grids ([[graft.functions.CountMinMergeAgg]],
  *    shard count fixed → merge must stay FLAT while build grows);
  *  - `quota`: [[graft.streaming.ScoreStream.domainQuotaGate]] as one
  *    real AvailableNow streaming run, 1,000 domains × cap 10 — state
  *    is |domains| longs no matter the corpus size.
  *
  * Output: one JSON line → BENCH_R12C_SCALE.json.
  */
object BenchR12cScale {

  private def docReplicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        col("lang"),
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
      s"graft_r12cscale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
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
    val T = graft.ext.TextStats
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val tmp = sys.props("java.io.tmpdir")
    val pid = ProcessHandle.current().pid()
    val entries = scales.map { n =>
      val docs = materialize(spark, docReplicas(docs0, n), s"docs$n")
        .select("doc_id", "lang", "text")

      val punct = docs.select(col("doc_id"),
        regexp_replace(col("text"), "((?:\\S+ ){4}\\S+) ", "$1. ").as("text"))
      val (tSent, sentRows) = timed {
        T.splitSentences(punct, "text", "doc_id").count()
      }

      val para = docs.select(col("doc_id"),
        concat(
          regexp_replace(col("text"), "((?:\\S+ ){7}\\S+) ", "$1\n\n"),
          when(col("doc_id") % 10 === 0,
            lit("\n\nshared boilerplate footer paragraph"))
            .otherwise(lit(""))).as("text"))
      val (tPara, paraChars) = timed {
        graft.ext.Dedup.paragraphDedup(para, "text", "doc_id")
          .agg(sum(length(col("text")))).head().getLong(0)
      }

      val (tTfidf, tfidfRows) = timed {
        graft.ext.Retrieval.tfIdfKeywords(docs, "doc_id", "text",
          k = 5, minDf = 2).count()
      }

      val (tComp, compBytes) = timed {
        T.withCompressionRatio(docs, "text")
          .agg(sum(col("deflate_bytes"))).head().getLong(0)
      }

      val (depth, width) = (4, 1024)
      val cms = udaf(new graft.functions.CountMinAgg(depth, width))
      val grids = s"$tmp/graft_r12c_cms_${n}_$pid"
      val (tCmsBuild, nGrids) = timed {
        docs.select(col("lang"), pmod(col("doc_id"), lit(64)).as("shard"),
            explode(graft.ml.Featurize.tokensCol(col("text"))).as("token"))
          .groupBy("lang", "shard").agg(cms(col("token")).as("cms"))
          .write.mode("overwrite").parquet(grids)
        spark.read.parquet(grids).count()
      }
      val cmsMerge = udaf(new graft.functions.CountMinMergeAgg(depth, width))
      val (tCmsMerge, nMerged) = timed {
        spark.read.parquet(grids).groupBy("lang")
          .agg(cmsMerge(col("cms")).as("cms")).count()
      }

      val src = s"$tmp/graft_r12c_quota_src_${n}_$pid"
      val arrivals = docs.select(
        concat(lit("d"), pmod(col("doc_id"), lit(1000))).as("domain"),
        col("doc_id"))
      arrivals.write.mode("overwrite").parquet(src)
      val (tQuota, admitted) = timed {
        val stream = spark.readStream.schema(arrivals.schema).parquet(src)
        val gated = graft.streaming.ScoreStream.domainQuotaGate(
          stream, "domain", "doc_id", cap = 10)
        graft.streaming.ScoreStream.idempotentParquetSink(gated,
          s"$tmp/graft_r12c_quota_out_${n}_$pid",
          s"$tmp/graft_r12c_quota_chk_${n}_$pid").awaitTermination()
        spark.read.parquet(s"$tmp/graft_r12c_quota_out_${n}_$pid").count()
      }

      System.err.println(f"[r12cscale] x$n sent=$tSent%.1f para=$tPara%.1f " +
        f"tfidf=$tTfidf%.1f comp=$tComp%.1f cmsb=$tCmsBuild%.1f " +
        f"cmsm=$tCmsMerge%.1f quota=$tQuota%.1f")
      f""""x$n":{"sentences_sec":$tSent%.2f,"sentence_rows":$sentRows,""" +
        f""""paradedup_sec":$tPara%.2f,"para_chars":$paraChars,""" +
        f""""tfidf_sec":$tTfidf%.2f,"tfidf_rows":$tfidfRows,""" +
        f""""compress_sec":$tComp%.2f,"deflate_bytes":$compBytes,""" +
        f""""cms_build_sec":$tCmsBuild%.2f,"cms_grids":$nGrids,""" +
        f""""cms_merge_sec":$tCmsMerge%.2f,"cms_merged":$nMerged,""" +
        f""""quota_sec":$tQuota%.2f,"quota_admitted":$admitted}"""
    }
    println(s"""{"metric":"r12c_scale","sf":"$sfDir",${entries.mkString(",")}}""")
    spark.stop()
  }
}
