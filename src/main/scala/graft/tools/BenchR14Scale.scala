package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scaling sidecar: the BPE apply paths at PRODUCTION
  * vocabulary depth (512 byte-pretok merges), 1×/10×/100× replicas of
  * sf0.1 — the r13 verdict's watch item resolved with evidence.
  *
  * Diagnosis first: the r13 jump (`apply_pretok_large` 0.75 → 30.6 s
  * from x10 → x100 at a 4-merge vocab) was INPUT-SPLIT STARVATION,
  * not operator superlinearity — the materialized x100 replica is only
  * ~2 × 128 MB parquet splits, so every per-row path (the codegen
  * chain included: 20.7 s at x100 in BENCH_R13_SCALE.json) ran on ~2
  * of 32 cores. This harness records the actual split count per scale
  * and times each path both on the natural splits and
  * `repartition(cpus)` so the parallelism effect is isolated from
  * per-byte cost.
  *
  * Paths compared at 512 merges:
  *  - `replay`: [[graft.ext.TextStats.bpeApplyLargeBytesPretok]] — the
  *    sequential per-merge replay, O(merges × bytes) per document;
  *    fine at oracle depth, measured here at 512 to show the
  *    merge-count multiplier (natural splits at x100 would be ~an
  *    hour of mostly-idle cores; measured repartitioned);
  *  - `ranked`: [[graft.ext.TextStats.bpeApplyRankedBytesPretok]] —
  *    the HF-tokenizers shape, per-document cost independent of
  *    vocabulary size; the path a 32k-merge production vocabulary
  *    actually runs. Symbol totals are required equal to replay's.
  *
  * Output: one JSON line → BENCH_R14_SCALE.json.
  */
object BenchR14Scale {

  private def docReplicas(docs: DataFrame, n: Int): DataFrame =
    (0 until n).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
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
      s"graft_r14scale_${tag}_${ProcessHandle.current().pid()}").getAbsolutePath
    // same materialization as BenchR13Scale, so split counts reproduce
    // the r13 run's read-side parallelism exactly
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
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
    val T = graft.ext.TextStats
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    // production-depth vocabulary: 512 byte-pretok merges from the
    // flat-cost incremental trainer. The raw fixture's ~40-word
    // vocabulary exhausts adoptable pairs near 127 merges (x10
    // replicas near 219), so the trainer samples ACROSS the x100
    // replica space — the per-copy word suffixes w1..w99 multiply the
    // distinct-word space enough for true 512-merge depth while the
    // vocabulary still tokenizes every replica.
    val (tTrain, vocab512) = timed {
      T.bpeTrainIncremental(
        docReplicas(docs0, 100).where(col("doc_id") % 100 === 0)
          .select("text"), "text",
        merges = 512, seedMode = T.SeedBytesPretok)
        .map(m => (m._1, m._2))
    }
    // the sample corpus may exhaust adoptable pairs before 512 (tiny
    // fixture vocabularies) — depth is recorded, not assumed
    require(vocab512.size >= 64, s"trained only ${vocab512.size} merges")
    System.err.println(
      f"[r14scale] pretok vocab: ${vocab512.size} merges in $tTrain%.1f s")

    def syms(df: DataFrame): Long =
      df.agg(sum(size(col("bpe_symbols")))).head().getLong(0)

    val entries = scales.map { n =>
      val docs = materialize(spark, docReplicas(docs0, n), s"docs$n")
      val splits = docs.rdd.getNumPartitions
      val docsWide = docs.repartition(cpus)

      val (tRankedNat, sRankedNat) = timed {
        syms(T.bpeApplyRankedBytesPretok(docs, "text", vocab512))
      }
      val (tRankedWide, sRankedWide) = timed {
        syms(T.bpeApplyRankedBytesPretok(docsWide, "text", vocab512))
      }
      // replay at 512 merges: natural splits at x100 would be an hour
      // of idle cores (the r13 diagnosis); measured repartitioned, and
      // on natural splits only while cheap (x1/x10)
      val (tReplayNat, sReplayNat) =
        if (n < 100) timed(syms(T.bpeApplyLargeBytesPretok(docs, "text", vocab512)))
        else (-1.0, -1L)
      val (tReplayWide, sReplayWide) = timed {
        syms(T.bpeApplyLargeBytesPretok(docsWide, "text", vocab512))
      }
      require(sRankedNat == sReplayWide && sRankedWide == sReplayWide,
        s"ranked/replay symbol totals diverge at x$n: " +
          s"$sRankedNat/$sRankedWide vs $sReplayWide")
      if (n < 100) require(sReplayNat == sReplayWide,
        s"replay totals diverge across partitionings at x$n")

      System.err.println(f"[r14scale] x$n splits=$splits " +
        f"ranked=$tRankedNat%.1f/$tRankedWide%.1f " +
        f"replay=$tReplayNat%.1f/$tReplayWide%.1f symbols=$sReplayWide")
      f""""x$n":{"splits":$splits,"symbols":$sReplayWide,""" +
        f""""ranked_natural_sec":$tRankedNat%.2f,""" +
        f""""ranked_wide_sec":$tRankedWide%.2f,""" +
        f""""replay_natural_sec":$tReplayNat%.2f,""" +
        f""""replay_wide_sec":$tReplayWide%.2f}"""
    }
    println(s"""{"metric":"r14_scale","sf":"$sfDir","cpus":$cpus,""" +
      s""""vocab_merges":${vocab512.size},""" + f""""train_sec":$tTrain%.2f,""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
