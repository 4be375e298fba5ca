package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling sidecar for the round-8 curation additions —
  * line-level dedup, the Gopher repetition audit, weighted selection,
  * SQ8 encode/serve, vocabulary coverage — at 1×/10×/100× replicas of
  * the sf0.1 fixtures. Same bijective replica discipline as the other
  * sidecars (token suffix per replica: within-replica structure is the
  * fixture's, cross-replica overlap zero), plus one construction per
  * operator that pins an EXACT invariant:
  *  - line dedup: every doc gains the SAME per-replica boilerplate
  *    footer line, so keep-first drops exactly (docs−1) footer copies
  *    per replica — dropped lines and surviving-line totals linear;
  *  - repetition audit: five planted line-duplicated docs per replica
  *    fail their rules on top of the fixture's own organic failures.
  *    The per-replica failing count is constant per SUFFIX LENGTH,
  *    not globally: the audit's top-gram thresholds are CHAR ratios,
  *    and the 3-char suffixes of replicas 10+ ("w10" vs "w0") nudge
  *    ~5 borderline fixture docs per replica across a threshold
  *    (measured: 756/replica for suffix "w0".."w9", 761/replica from
  *    "w10" — x100 total 76050 = 10·756 + 90·761, exactly);
  *  - weighted selection: kept count is md5-distributed (exact only in
  *    expectation — ids differ per replica), so the pinned invariant
  *    is the scan size; the kept/total ratio should hold to ~3 dp;
  *  - SQ8: replicated embeddings leave the per-dim min/max UNCHANGED
  *    (bounds are set-level stats), codes are exactly linear, and the
  *    10-query serve returns a constant 50 rows whatever the corpus;
  *  - vocab coverage: per-language token totals exactly linear
  *    (suffixing shifts the vocab, not the token count).
  */
object BenchR8Scale {

  private def replicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1w$k").as("text"),
        col("lang"))
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
      s"graft_r8scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 10)
    // warmup: codegen of each op's exec path
    locally {
      val w = replicas(docs.limit(200), 1)
      graft.ext.Dedup.lineDedup(w, "text", "doc_id").count()
      graft.ext.TextStats.withRepetitionFlags(w, "text", "doc_id").count()
      graft.etl.Sampling.weightedSample(w,
        (col("doc_id") % 10).cast("double") / 10.0, "doc_id").count()
      val (m0, s0) = graft.ext.Similarity.sqBounds(emb.limit(200), "embedding", 64)
      graft.ext.Similarity.sqTopK(queries, emb.limit(200),
        "vec_id", "embedding", 5, m0, s0).count()
      graft.ext.TextStats.vocabCoverage(w, "text", "lang", 50).count()
    }
    val runs = scales.map { n =>
      // per-replica boilerplate footer: within a replica every doc
      // shares it, across replicas it differs — dropped copies per
      // replica = (docs − 1), exactly linear in n
      val withFooter = (0 until n).map { k =>
        docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
          concat(regexp_replace(col("text"), "(\\S+)", s"$$1w$k"),
            lit(s"\nboilerplate footer w$k")).as("text"),
          col("lang"))
      }.reduce(_ union _)
      val corpus = materialize(spark, withFooter, s"docs$n")
      // five planted line-duplicated docs per replica (text + \n + text)
      val planted = materialize(spark, (0 until n).map { k =>
        val base = docs.select(
          (col("doc_id") + k * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1w$k").as("text"),
          col("lang"))
        base.unionByName(base.where(col("doc_id") < k * 10000000L + 5)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(col("text"), lit("\n"), col("text")).as("text"),
            col("lang")))
      }.reduce(_ union _), s"planted$n")
      val embN = materialize(spark, embReplicas(emb, n), s"emb$n")
      val (tl, nl) = timed {
        // surviving non-empty lines across the corpus: footer copies
        // beyond the first per replica are gone
        graft.ext.Dedup.lineDedup(corpus, "text", "doc_id")
          .agg(sum(size(filter(split(col("text"), "\n"),
            l => length(l) > 0)).cast("long"))).head().getLong(0)
      }
      val (tr, nr) = timed {
        graft.ext.TextStats.withRepetitionFlags(planted, "text", "doc_id")
          .where(!col("pass_repetition")).count()
      }
      val (tw, nw) = timed {
        graft.etl.Sampling.weightedSample(corpus,
          (col("doc_id") % 10).cast("double") / 10.0, "doc_id").count()
      }
      val (tq, bq) = timed {
        graft.ext.Similarity.sqBounds(embN, "embedding", 64)
      }
      val (te, ne) = timed {
        graft.ext.Similarity.sqEncode(embN, "embedding", bq._1, bq._2)
          .agg(count(when(element_at(col("sq_code"), 1) >= 0, 1)))
          .head().getLong(0)
      }
      val (tk, nk) = timed {
        graft.ext.Similarity.sqTopK(queries, embN, "vec_id", "embedding",
          5, bq._1, bq._2).count()
      }
      val (tv, nv) = timed {
        graft.ext.TextStats.vocabCoverage(corpus, "text", "lang", 200)
          .agg(sum("n_tokens")).head().getLong(0)
      }
      f""""x$n":{"line_dedup":{"sec":$tl%.3f,"lines":$nl},""" +
        f""""repetition":{"sec":$tr%.3f,"failing":$nr},""" +
        f""""weighted_sample":{"sec":$tw%.3f,"kept":$nw},""" +
        f""""sq8_bounds":{"sec":$tq%.3f},""" +
        f""""sq8_encode":{"sec":$te%.3f,"codes":$ne},""" +
        f""""sq8_topk":{"sec":$tk%.3f,"rows":$nk},""" +
        f""""vocab_coverage":{"sec":$tv%.3f,"tokens":$nv}}"""
    }
    println(s"""{"metric":"r8_family_scaling","sf":"$sfDir",${runs.mkString(",")}}""")
    spark.stop()
  }
}
