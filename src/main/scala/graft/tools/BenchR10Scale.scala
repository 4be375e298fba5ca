package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-10 additions — incremental
  * IVF maintenance under CDC, the epoch-salted training shuffle, the
  * model-based quality filter, and the streaming contamination gate's
  * flag pass — at 1×/10×/100× replicas of the sf0.1 fixtures (same
  * token-suffix / shifted-id bijections as the sibling sidecars).
  *
  * Expected shapes, checked in the output:
  *  - ivf_update: the CDC batch is FIXED-SIZE (20 changes) at every
  *    scale, so update wall must stay bounded by the touched cells'
  *    data — the rebuild:update ratio should GROW with corpus size
  *    (that ratio is the whole point of incremental maintenance);
  *  - epoch_shuffle: one membership bucket + per-shard position
  *    window — rows exactly linear, wall ~linear (the window is the
  *    only wide op);
  *  - quality_score: train once on the 1× split (bounded), score is a
  *    narrow codegen pass — wall scan-bound ~linear;
  *  - contamination: probe side collapses to ONE broadcast row of
  *    distinct shingle hashes; the corpus-side flag pass is narrow
  *    and stateless — wall scan-bound ~linear, hits exactly linear
  *    (replica 0 is the identity so fixture hits replicate).
  */
object BenchR10Scale {

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
      s"graft_r10scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** Fixed 20-change CDC batch over 1×-range ids (present at every
    * scale): 5 deletes, 5 updates to the reversed vector (moves the
    * vector across cells — exercises the old-cell rewrite), 10
    * inserts under fresh ids. Constant size by construction, and
    * small against the 64-cell layout so a meaningful fraction of
    * cells stays untouched — the incrementality being measured. */
  private def cdcBatch(emb1x: DataFrame): DataFrame = {
    val del = emb1x.where(col("vec_id") % 163 === 7).limit(5)
      .select(col("vec_id"), col("embedding"),
        lit(1L).as("seq"), lit("d").as("op"))
    val upd = emb1x.where(col("vec_id") % 163 === 11).limit(5)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        lit(1L).as("seq"), lit("u").as("op"))
    val ins = emb1x.where(col("vec_id") % 163 === 23).limit(10)
      .select((col("vec_id") + 900000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"),
        lit(1L).as("seq"), lit("u").as("op"))
    del.unionByName(upd).unionByName(ins)
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // centroids + quality model come from the 1× fixture ONCE — at
    // 100 TB neither is retrained per serving batch
    val cents = graft.ext.Similarity.kmeansCentroids(
      emb, "vec_id", "embedding", 64, iters = 1)
    val med = docs.agg(expr("percentile(n_chars, 0.5)")).head().getDouble(0)
    val qm = graft.ml.QualityFilter.train(
      docs.where(col("n_chars") >= med), docs.where(col("n_chars") < med),
      "text")
    val probes = docs.orderBy(md5(col("doc_id").cast("string"))).limit(50)
      .select("text").cache()
    probes.count()
    // warmup
    qm.score(docs.limit(100), "text").count()
    val changes = cdcBatch(emb).cache(); changes.count()
    val runs = scales.map { n =>
      val docsN = materialize(spark, docReplicas(docs, n), s"docs$n")
      val embN = materialize(spark, embReplicas(emb, n), s"emb$n")
      val idxDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_r10scale_ivf${n}_${ProcessHandle.current().pid()}")
        .getAbsolutePath
      val (tb, _) = timed {
        graft.ext.Similarity.writeIvfIndex(
          embN, "vec_id", "embedding", cents, idxDir)
      }
      val (tu, touched) = timed {
        graft.ext.Similarity.updateIvfIndex(
          idxDir, changes, "vec_id", "embedding", cents)
      }
      // aggregate over `pos` so the position window cannot be pruned
      // away by ColumnPruning (a bare count() would measure only the
      // scan)
      val (te, ne) = timed {
        graft.etl.Sharding.shuffleShards(
            docsN.select("doc_id"), "doc_id", 16, epoch = 2)
          .agg(max("pos").as("mx"), count(lit(1)).as("n"))
          .head().getLong(1)
      }
      val (tq, nq) = timed {
        qm.score(docsN, "text").where(col("keep_prob") >= 0.5).count()
      }
      val (tc, nc) = timed {
        graft.streaming.ScoreStream.contaminationFlags(docsN, probes, "text")
          .where(col("n_hits") > 0).count()
      }
      // MG heavy hitters: one ObjectHashAggregate pass, map-side
      // capacity-entry buffers — wall should be scan-bound ~linear
      val (th, nh) = timed {
        val agg = org.apache.spark.sql.functions.udaf(
          new graft.functions.FreqSketchAgg(512))
        docsN.select(explode(graft.ml.Featurize.tokensCol(col("text")))
            .as("t"))
          .agg(agg(col("t"))).head().getMap[String, Long](0).size
      }
      // stored HLL sketch columns: build per (lang, half), merge the
      // stored bytes — both declarative aggs, ~linear build, merge
      // bounded by groups not corpus
      val (ts2, _) = timed {
        val skDir = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_r10scale_hll${n}_${ProcessHandle.current().pid()}")
          .getAbsolutePath
        docsN.select(col("lang"), pmod(col("doc_id"), lit(2)).as("half"),
            explode(graft.ml.Featurize.tokensCol(col("text"))).as("t"))
          .groupBy("lang", "half")
          .agg(hll_sketch_agg(col("t"), lit(14)).as("sk"))
          .write.mode("overwrite").parquet(skDir)
        spark.read.parquet(skDir).groupBy("lang")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
          .collect().length
      }
      f""""x$n":{"ivf":{"rebuild_sec":$tb%.3f,"update_sec":$tu%.3f,"touched_cells":${touched.length}},"epoch_shuffle":{"sec":$te%.3f,"rows":$ne},"quality_score":{"sec":$tq%.3f,"kept":$nq},"contamination":{"sec":$tc%.3f,"flagged":$nc},"heavy_hitters":{"sec":$th%.3f,"entries":$nh},"sketch_column":{"sec":$ts2%.3f}}"""
    }
    println(s"""{"metric":"r10_family_scaling","sf":"$sfDir",${runs.mkString(",")}}""")
    spark.stop()
  }
}
