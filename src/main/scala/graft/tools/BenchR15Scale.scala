package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scaling sidecar: the three new operator families at
  * 1×/10×/100× replicas of sf0.1 documents — wall-time linearity
  * evidence for perceptual image dedup, perceptual audio dedup, and
  * unigram-LM tokenization.
  *
  * Method: per scale, the replica id-space is materialized to parquet
  * WITH its binary payloads (PNG / WAV built once on executors — the
  * fixture encode is timed separately from the operator), then each
  * operator is timed end-to-end over the materialized input:
  *  - `imageNearDups`: real `javax.imageio` decode → dHash →
  *    banded-hamming pairing; per-replica md5 seeds keep cross-replica
  *    hashes independent, 10 planted perturbed variants per scale must
  *    be found (organic ≤3-bit collisions are possible at 5M images
  *    and are counted, not failed);
  *  - `audioNearDups`: real `javax.sound` PCM decode → energy hash →
  *    same pairing;
  *  - `unigramApply`: Viterbi under the driver-query vocabulary, with
  *    the per-partition word memo hot (replica word suffixes multiply
  *    the distinct-word space ~n×, still far under the memo cap).
  *
  * Output: one JSON line → BENCH_R15_SCALE.json.
  */
object BenchR15Scale {

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val M = graft.ext.Multimodal
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val baseN = docs0.count()

    def replicas(n: Int): DataFrame =
      (0 until n).map { k =>
        docs0.select((col("doc_id") + k * 10000000L).as("doc_id"),
          (if (k == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", s"$$1w$k")).as("text"))
      }.reduce(_ union _)

    def materialize(df: DataFrame, tag: String): DataFrame = {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_r15scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    val entries = scales.map { n =>
      val ids = replicas(n)
      // payload fixtures: 10 perturbed variants per scale on top of the
      // organic corpus; repartition(cpus) so the encode and every
      // downstream decode saturate the box regardless of split count
      val seeded = ids.select(col("doc_id"), col("doc_id").as("__seed"),
          lit(false).as("__pert"))
        .unionAll(ids.where(col("doc_id") < 10)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            col("doc_id").as("__seed"), lit(true).as("__pert")))
        .repartition(cpus)
      val (tImgFix, imgs) = timed {
        materialize(M.ImageFixture.withPayloads(seeded, "__seed", "__pert")
          .select("doc_id", "payload"), s"img$n")
      }
      val (tImg, imgPairs) = timed {
        graft.ext.Dedup.imageNearDups(imgs, "doc_id", "payload").count()
      }
      require(imgPairs >= 10, s"x$n: planted image pairs missing ($imgPairs)")

      val (tWavFix, wavs) = timed {
        materialize(M.AudioFixture.withWavPayloads(seeded, "__seed", "__pert")
          .select("doc_id", "payload"), s"wav$n")
      }
      val (tWav, wavPairs) = timed {
        graft.ext.Dedup.audioNearDups(wavs, "doc_id", "payload").count()
      }
      require(wavPairs >= 10, s"x$n: planted audio pairs missing ($wavPairs)")

      val txt = materialize(ids.repartition(cpus), s"txt$n")
      val (tUni, symbols) = timed {
        graft.ext.TextStats.unigramApply(txt, "text",
            graft.ops.ExtQueries.unigramVocab)
          .agg(sum(size(col("unigram_symbols")))).head().getLong(0)
      }

      System.err.println(f"[r15scale] x$n imgs=${baseN * n + 10} " +
        f"imgfix=$tImgFix%.1f img=$tImg%.1f pairs=$imgPairs " +
        f"wavfix=$tWavFix%.1f wav=$tWav%.1f pairs=$wavPairs " +
        f"unigram=$tUni%.1f symbols=$symbols")
      f""""x$n":{"rows":${baseN * n + 10},""" +
        f""""image_fixture_sec":$tImgFix%.2f,"image_dedup_sec":$tImg%.2f,""" +
        f""""image_pairs":$imgPairs,""" +
        f""""audio_fixture_sec":$tWavFix%.2f,"audio_dedup_sec":$tWav%.2f,""" +
        f""""audio_pairs":$wavPairs,""" +
        f""""unigram_sec":$tUni%.2f,"unigram_symbols":$symbols}"""
    }
    println(s"""{"metric":"r15_scale","sf":"$sfDir","cpus":$cpus,""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
