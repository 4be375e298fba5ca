package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal}

/** A/B isolation of the partitioned-layout I/O constants (guide §1 /
  * §6): where do 26 s of writeHashIndex(nPrefix=1024) and 5.5 s of a
  * 20k-row index read actually go — commit renames, checksum files,
  * driver partition-discovery, per-file reader init? Each candidate
  * config/algorithm change is timed in one process, interleaved with
  * re-baselines to keep JIT/page-cache drift honest. Measurement
  * only — not part of the surface.
  */
object ProfileWriteAB {
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
    s.conf.set("spark.sql.shuffle.partitions", "8")

    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_profab_${ProcessHandle.current().pid()}").getAbsolutePath
    val docs = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val baseHashes = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.repartition(32).select(col("doc_id"),
          col("doc_id").as("__seed"), lit(false).as("__pert")),
        "__seed", "__pert").select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash").localCheckpoint()

    def write(n: Int) = t(s"writeHashIndex #$n") {
      Dedup.writeHashIndex(baseHashes, "doc_id", "dhash", s"$base/idx$n",
        nPrefix = 1024)
    }
    def readFull(n: Int, label: String) = t(s"read full idx$n .count() [$label]") {
      s.read.parquet(s"$base/idx$n").count()
    }

    write(0)
    readFull(0, "defaults")
    readFull(0, "defaults again")

    // A: commit algorithm v2 (task-side rename, no driver merge walk)
    s.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    write(1)
    write(2)
    s.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "1")
    write(3) // re-baseline v1

    // B: keep partition discovery on the driver (local fs) instead of
    // a 1024-task Spark listing job
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
    readFull(1, "driver-side discovery")
    readFull(2, "driver-side discovery again")
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    readFull(3, "re-baseline parallel discovery")

    // C: explicit probed-dir read (serve-path shape): list nothing but
    // the dirs the batch can touch
    val someDirs = (0 until 64).map(p => s"$base/idx0/pfx=$p")
    t("read 64 explicit dirs (basePath)") {
      s.read.option("basePath", s"$base/idx0").parquet(someDirs: _*).count()
    }
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
    t("read 64 explicit dirs (basePath, driver discovery)") {
      s.read.option("basePath", s"$base/idx0").parquet(someDirs: _*).count()
    }
    t("full-layout read pruned to 64 pfx (isin)") {
      s.read.parquet(s"$base/idx0")
        .where(col("pfx").isin((0 until 64).map(Int.box): _*)).count()
    }

    // D: serve path end to end under the discovery fix
    val arrivals = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.where(col("doc_id") < 15)
          .select((col("doc_id") + 885000L).as("doc_id"),
            col("doc_id").as("__seed"), lit(true).as("__pert")),
        "__seed", "__pert").select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash").localCheckpoint()
    t("hashMatchesIndexed collect [driver discovery]") {
      Dedup.hashMatchesIndexed(s"$base/idx0", arrivals, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    t("hashMatchesIndexed collect [defaults]") {
      Dedup.hashMatchesIndexed(s"$base/idx0", arrivals, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }

    // E: how much of the write is checksum + rename traffic at all —
    // count the files one write produces
    val f0 = new java.io.File(s"$base/idx0")
    val nFiles = Option(f0.listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith("pfx="))
    println(s"   idx0 pfx dirs: $nFiles")
    spark.stop()
  }
}
