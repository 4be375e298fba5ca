package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-11 additions — the exact
  * re-rank (refine) stage over a quantized shortlist, the
  * stored-sketch profile triple, and the expectations quarantine
  * replay — at 1×/10×/100× replicas of the sf0.1 fixtures (same
  * shifted-id bijections as the sibling sidecars).
  *
  * Expected shapes, checked in the output:
  *  - rerank: the quantized shortlist pass is the corpus-sized term
  *    (~linear — it re-encodes the corpus here; production stores the
  *    codes); the REFINE overhead (refined_sec − shortlist_sec) is
  *    bounded by |Q|·shortlist pairs and must stay ~flat across
  *    corpus scale — that boundedness is the whole design;
  *  - sketch_profile: the per-shard build is the corpus-sized pass
  *    (~linear); the merge reads ONLY the stored summaries (rows =
  *    langs × halves whatever the corpus) and must stay ~flat — the
  *    "append a shard, never re-scan history" claim, measured;
  *  - expectations_replay: two one-pass audits + narrow route/fix
  *    filters — wall scan-bound ~linear, quarantine exactly linear
  *    (replica texts inherit the 1× length distribution).
  */
object BenchR11Scale {

  private def docReplicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        col("lang"), col("n_chars"),
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1w$k")).as("text"))
    }.reduce(_ union _)

  private def embReplicas(emb: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      emb.select((col("vec_id") + k * 10000000L).as("vec_id"),
        col("embedding"))
    }.reduce(_ union _)

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def materialize(spark: SparkSession, df: DataFrame,
                          tag: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r11scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
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
    val S = graft.ext.Similarity
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // index artifacts trained ONCE on the 1× fixture — at 100 TB
    // neither is refit per serving batch
    val cents = S.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 1)
    val books = S.pqCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 8, iters = 1)
    val queries = emb.where(col("vec_id") < 10).cache()
    queries.count()
    import graft.etl.Expectations.{Rule, audit, split}
    val rules = Seq(
      Rule("max_len", col("n_chars") <= 500),
      Rule("chars_match", col("n_chars") === length(col("text"))))
    val runs = scales.map { n =>
      val docsN = materialize(spark, docReplicas(docs, n), s"docs$n")
      val embN = materialize(spark, embReplicas(emb, n), s"emb$n")
      val (tShort, _) = timed {
        S.ivfPqTopK(queries, embN, "vec_id", "embedding", 100,
          cents, nprobe = 4, books = books).count()
      }
      val (tRef, nRef) = timed {
        S.rerankTopK(queries, embN, "vec_id", "embedding", 10,
          S.ivfPqTopK(queries, embN, "vec_id", "embedding", 100,
            cents, nprobe = 4, books = books)).count()
      }
      val skDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_r11scale_sk${n}_${ProcessHandle.current().pid()}")
        .getAbsolutePath
      val qpts = 64
      val probs = array((0 until qpts).map(i => lit((i + 0.5) / qpts)): _*)
      val mgAgg = udaf(new graft.functions.FreqSketchAgg(16))
      val (tBuild, _) = timed {
        val toks = docsN.select(col("lang"),
          pmod(col("doc_id"), lit(2)).as("half"),
          explode(graft.ml.Featurize.tokensCol(col("text"))).as("t"))
        toks.groupBy("lang", "half")
          .agg(hll_sketch_agg(col("t"), lit(14)).as("hll"),
            mgAgg(col("t")).as("mg"), count(lit(1)).as("n_tokens"))
          .join(docsN.select(col("lang"),
              pmod(col("doc_id"), lit(2)).as("half"), col("n_chars"))
            .groupBy("lang", "half")
            .agg(percentile_approx(col("n_chars").cast("double"), probs,
              lit(10000)).as("qpoints"), count(lit(1)).as("n_docs")),
            Seq("lang", "half"))
          .write.mode("overwrite").parquet(skDir)
      }
      val (tMerge, nLangs) = timed {
        val stored = spark.read.parquet(skDir)
        val mgMerge = udaf(new graft.functions.FreqSketchMergeAgg(16))
        stored.groupBy("lang")
          .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("est"),
            mgMerge(col("mg")).as("mg"), sum("n_tokens").as("n"))
          .collect().length
      }
      val (tReplay, nQuar) = timed {
        val (ok, bad) = split(docsN, rules)
        val fixed = bad.drop("violations")
          .withColumn("text", substring(col("text"), 1, 500))
          .withColumn("n_chars", length(col("text")))
          .select("doc_id", "lang", "text", "n_chars")
        val nb = bad.count()
        val after = audit(ok.unionByName(fixed), rules).collect()
        require(after.forall(_.getLong(1) == 0L), after.mkString(","))
        nb
      }
      f""""x$n":{"rerank":{"shortlist_sec":$tShort%.3f,"refined_sec":$tRef%.3f,"rows":$nRef},"sketch_profile":{"build_sec":$tBuild%.3f,"merge_sec":$tMerge%.3f,"langs":$nLangs},"expectations_replay":{"sec":$tReplay%.3f,"quarantined":$nQuar}}"""
    }
    println(s"""{"metric":"r11_family_scaling","sf":"$sfDir",${runs.mkString(",")}}""")
    spark.stop()
  }
}
