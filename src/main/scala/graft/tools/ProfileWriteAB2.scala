package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal}

/** Round-2 A/B (guide §1): (a) does the 1024-file layout write
  * scale with WRITE-TASK parallelism (8 shuffle partitions leave 24
  * cores idle on a file-count-bound stage), and (b) how the band
  * index write splits between signature compute and file I/O.
  * Interleaved re-baselines. Measurement only.
  */
object ProfileWriteAB2 {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"   ${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "8192"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    s.read.parquet(s"$sfDir/lineitem.parquet").count() // warmup
    s.conf.set("spark.sql.shuffle.partitions", "8") // stream-query regime

    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_profab2_${ProcessHandle.current().pid()}").getAbsolutePath
    val docs = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val hashes = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.repartition(32).select(col("doc_id"),
          col("doc_id").as("__seed"), lit(false).as("__pert")),
        "__seed", "__pert").select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash").localCheckpoint()

    // rows already banded+prefixed, pinned, so only shuffle+write is timed
    val rows = hashes
      .select(col("doc_id"), col("dhash").cast("long").as("hash"))
      .select(col("doc_id"), col("hash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("hash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band_idx", "band_val")))
      .withColumn("pfx",
        pmod(xxhash64(col("band_idx"), col("band_val")), lit(1024))
          .cast("int"))
      .localCheckpoint()

    def writeWith(n: Int, parts: Option[Int]): Unit = {
      val lbl = parts.map(p => s"repartition($p, pfx)")
        .getOrElse("repartition(pfx) @ shuffle=8")
      t(s"write 1024-dir layout #$n [$lbl]") {
        val re = parts match {
          case Some(p) => rows.repartition(p, col("pfx"))
          case None => rows.repartition(col("pfx"))
        }
        re.write.mode("overwrite").partitionBy("pfx").parquet(s"$base/w$n")
      }
    }
    writeWith(0, None)
    writeWith(1, Some(32))
    writeWith(2, Some(128))
    writeWith(3, None)
    writeWith(4, Some(32))

    // committer v2 at core-count write tasks: does moving the commit
    // renames into the (parallel) tasks beat the driver-side v1 merge?
    s.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    writeWith(5, Some(32))
    writeWith(6, Some(32))
    s.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "1")
    writeWith(7, Some(32))

    // band index: signature compute vs write split
    val docsT = s.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    t("minhashSignatures(docs).count (compute only)") {
      Dedup.minhashSignatures(docsT, "text", "doc_id", 4).count()
    }
    t("writeBandIndex prefixChars=2 (sigs + 256-dir write)") {
      Dedup.writeBandIndex(docsT, "text", "doc_id", s"$base/b1",
        prefixChars = 2)
    }
    t("minhashSignatures(docs).count again") {
      Dedup.minhashSignatures(docsT, "text", "doc_id", 4).count()
    }
    t("writeBandIndex again") {
      Dedup.writeBandIndex(docsT, "text", "doc_id", s"$base/b2",
        prefixChars = 2)
    }
    spark.stop()
  }
}
