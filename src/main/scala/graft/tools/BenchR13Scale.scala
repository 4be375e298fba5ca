package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-13 additions at 1×/10×/100×
  * replicas of the sf0.1 fixtures (shifted-id bijections, replica
  * texts suffixed per-copy like the sibling sidecars):
  *
  *  - `langid train` (fixed): [[graft.ml.LangId.train]] on the planted
  *    fixture — corpus-INDEPENDENT by construction, so it is timed
  *    once and must not grow with the replicas;
  *  - `langid score`: model scoring of the replicated corpus — a pure
  *    narrow transform, must be ~linear;
  *  - `langid routed`: [[graft.ml.LangId.LangIdModel.scoreRouted]]
  *    (script ID + model in one pass) — same shape, ~linear;
  *  - `pretok pieces`: [[graft.ext.TextStats.bpePiecesCol]] piece
  *    counting — one regexp projection, linear in corpus bytes;
  *  - `apply plain` vs `apply pretok`: byte-BPE tokenization without
  *    and with the boundary rule (8 merges each) — both narrow
  *    regexp-chain projections; the ratio is the pretokenizer's
  *    constant-factor overhead, which must not grow with scale;
  *  - `apply pretok large`: the mapPartitions form at the same work —
  *    the large-vocabulary path's scaling check;
  *  - `pretok train`: [[graft.ext.TextStats.bpeTrainBytesPretok]]
  *    4 merges — each round is one pair-count agg over pieces,
  *    ~linear per round in corpus size.
  *
  * Output: one JSON line → BENCH_R13_SCALE.json.
  */
object BenchR13Scale {

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
      s"graft_r13scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
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

    val (tTrain, model) = timed {
      graft.ml.LangId.train(
        graft.ext.LangFixture.df(spark).where(col("split") === "train"),
        "text", "lang")
    }
    System.err.println(f"[r13scale] langid train (fixed): $tTrain%.1f s")

    val entries = scales.map { n =>
      val docs = materialize(spark, docReplicas(docs0, n), s"docs$n")
        .select("doc_id", "lang", "text")

      val (tScore, scored) = timed {
        model.score(docs, "text", "lang_pred")
          .groupBy("lang_pred").count().count()
      }
      val (tRouted, routed) = timed {
        model.scoreRouted(docs, "text", "lang_routed")
          .groupBy("lang_routed").count().count()
      }
      val (tPieces, pieces) = timed {
        docs.select(size(T.bpePiecesCol(col("text"))).as("np"))
          .agg(sum(col("np"))).head().getLong(0)
      }
      val merges = T.bpeTrainBytes(
        docs0.where(col("doc_id") % 10 === 0).select("text"), "text", 8)
        .map(m => (m._1, m._2))
      val mergesP = T.bpeTrainBytesPretok(
        docs0.where(col("doc_id") % 10 === 0).select("text"), "text", 8)
        .map(m => (m._1, m._2))
      val (tPlain, symsPlain) = timed {
        T.bpeApplyBytes(docs, "text", merges)
          .agg(sum(size(col("bpe_symbols")))).head().getLong(0)
      }
      val (tPre, symsPre) = timed {
        T.bpeApplyBytesPretok(docs, "text", mergesP)
          .agg(sum(size(col("bpe_symbols")))).head().getLong(0)
      }
      val (tPreLarge, symsPreLarge) = timed {
        T.bpeApplyLargeBytesPretok(docs, "text", mergesP)
          .agg(sum(size(col("bpe_symbols")))).head().getLong(0)
      }
      require(symsPre == symsPreLarge,
        s"pretok paths diverge at x$n: $symsPre vs $symsPreLarge")
      val (tPreTrain, nAdopted) = timed {
        T.bpeTrainBytesPretok(docs.select("text"), "text", merges = 4).size
      }

      System.err.println(f"[r13scale] x$n score=$tScore%.1f " +
        f"routed=$tRouted%.1f pieces=$tPieces%.1f plain=$tPlain%.1f " +
        f"pretok=$tPre%.1f pretokLarge=$tPreLarge%.1f train=$tPreTrain%.1f")
      f""""x$n":{"langid_score_sec":$tScore%.2f,"langid_langs":$scored,""" +
        f""""langid_routed_sec":$tRouted%.2f,"routed_langs":$routed,""" +
        f""""pieces_sec":$tPieces%.2f,"pieces":$pieces,""" +
        f""""apply_plain_sec":$tPlain%.2f,"plain_symbols":$symsPlain,""" +
        f""""apply_pretok_sec":$tPre%.2f,"pretok_symbols":$symsPre,""" +
        f""""apply_pretok_large_sec":$tPreLarge%.2f,""" +
        f""""pretok_train_sec":$tPreTrain%.2f,"adopted":$nAdopted}"""
    }
    println(s"""{"metric":"r13_scale","sf":"$sfDir",""" +
      f""""langid_train_sec":$tTrain%.2f,${entries.mkString(",")}}""")
    spark.stop()
  }
}
