package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-12 SECOND-WAVE additions
  * at 1×/10×/100× replicas of the sf0.1 fixtures (same shifted-id
  * bijections as the sibling sidecars):
  *
  *  - `blocklist`: [[graft.ext.TextStats.withBlocklistFlags]] with a
  *    1,000-word list + 3 phrases — the O(w·log B) binary-search
  *    claim means wall tracks the corpus, not the list;
  *  - `html`: [[graft.ext.TextStats.extractHtmlText]] over every doc
  *    wrapped in real markup — regex-chain, ~linear;
  *  - `funnel`: [[graft.ext.TextStats.filterFunnel]] — all five
  *    stages in ONE agg pass, 5 rows out at every scale;
  *  - `band index`: build at n× vs CDC-update with a FIXED change
  *    batch (prefixChars=2 → 256 dirs) vs serving a fixed arrival
  *    batch through the pruned layout — update and serve must stay
  *    far under rebuild;
  *  - `ivfadc`: [[graft.ext.Similarity.ivfPqResidualTopK]] over the
  *    replicated embeddings — the candidate scan is the linear term;
  *  - `diverse`: [[graft.ext.Selection.diverseSelect]] — candidate
  *    cap bounds the greedy, output constant at 16 cells × 3 picks.
  *
  * Output: one JSON line → BENCH_R12B_SCALE.json.
  */
object BenchR12bScale {

  private def docReplicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        col("lang"),
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1w$k")).as("text"))
    }.reduce(_ union _)

  private def embReplicas(emb: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      emb.select((col("vec_id") + k * 10000000L).as("vec_id"),
        (if (k == 0) col("embedding")
         else transform(col("embedding"),
           x => x * lit(1.0f + k / 1000.0f))).as("embedding"))
    }.reduce(_ union _)

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def materialize(spark: SparkSession, df: DataFrame,
                          tag: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r12bscale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
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
    val D = graft.ext.Dedup
    val S = graft.ext.Similarity
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // a 1,000-word synthetic blocklist (deterministic) + 3 phrases;
    // a handful of entries are real corpus words so hits are non-zero
    val blocklist = (0 until 1000).map(i => f"blocked$i%04d") ++
      Seq("merge", "slow", "vector", "hash join", "slow scan", "row batch")
    val changes0 = docs0.where(col("doc_id") < 50)
      .select(col("doc_id"),
        concat(col("text"), lit(" revised")).as("text"),
        lit(1L).as("seq"), lit("u").as("op"))
    val entries = scales.map { n =>
      val docs = materialize(spark, docReplicas(docs0, n), s"docs$n")
        .select("doc_id", "lang", "text")
      val emb = materialize(spark, embReplicas(emb0, n), s"emb$n")

      val (tBlock, blockHits) = timed {
        T.withBlocklistFlags(docs, "text", blocklist)
          .agg(sum(col("n_blocked_words") + col("n_blocked_phrases")))
          .head().getLong(0)
      }

      val wrapped = docs.select(col("doc_id"), concat(
        lit("<html><body><!-- c --><script>var x = 1;</script><p>"),
        col("text"), lit(" &amp; tail</p></body></html>")).as("text"))
      val (tHtml, htmlChars) = timed {
        T.withHtmlText(wrapped, "text")
          .agg(sum(length(col("text_html")))).head().getLong(0)
      }

      val (tFunnel, funnelRows) = timed {
        T.filterFunnel(docs, "text", Seq("merge", "slow")).count()
      }

      val idir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_r12b_bandidx_${n}_${ProcessHandle.current().pid()}")
        .getAbsolutePath
      val (tBuild, _) = timed {
        D.writeBandIndex(docs, "text", "doc_id", idir, prefixChars = 2)
      }
      val (tUpdate, touched) = timed {
        D.updateBandIndex(idir, changes0, "text", "doc_id").length
      }
      val arrivals = docs0.where(col("doc_id") < 20)
        .select((col("doc_id") + 90000000L).as("doc_id"), col("text"))
      val (tServe, served) = timed {
        D.minhashMatchesIndexed(idir, arrivals, "doc_id", "text").count()
      }

      val cents = S.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 1)
      val rbooks = S.pqResidualBooks(emb, "vec_id", "embedding", cents,
        m = 4, ksub = 8, iters = 1)
      val queries = emb.where(col("vec_id") < 10)
      val (tAdc, adcRows) = timed {
        S.ivfPqResidualTopK(queries, emb, "vec_id", "embedding", 5,
          cents, 4, rbooks).count()
      }

      val (tDiverse, divRows) = timed {
        graft.ext.Selection.diverseSelect(emb, "vec_id", "embedding",
          cents, picksPerCell = 3, candCap = 40).count()
      }

      System.err.println(f"[r12bscale] x$n block=$tBlock%.1f html=$tHtml%.1f " +
        f"funnel=$tFunnel%.1f build=$tBuild%.1f upd=$tUpdate%.1f " +
        f"serve=$tServe%.1f adc=$tAdc%.1f div=$tDiverse%.1f")
      f""""x$n":{"blocklist_sec":$tBlock%.2f,"block_hits":$blockHits,""" +
        f""""html_sec":$tHtml%.2f,"html_chars":$htmlChars,""" +
        f""""funnel_sec":$tFunnel%.2f,"funnel_rows":$funnelRows,""" +
        f""""band_build_sec":$tBuild%.2f,"band_update_sec":$tUpdate%.2f,""" +
        f""""touched_prefixes":$touched,"band_serve_sec":$tServe%.2f,""" +
        f""""served_matches":$served,"ivfadc_sec":$tAdc%.2f,""" +
        f""""ivfadc_rows":$adcRows,"diverse_sec":$tDiverse%.2f,""" +
        f""""diverse_rows":$divRows}"""
    }
    println(s"""{"metric":"r12b_scale","sf":"$sfDir",${entries.mkString(",")}}""")
    spark.stop()
  }
}
