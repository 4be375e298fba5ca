package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Round-19 A/B (guide §1): where does the per-FILE cost of the
  * 1024-dir layout write actually go, and which write-path levers are
  * stable wins at core-count parallelism? Interleaved re-baselines;
  * every variant re-measured twice. Measurement only — adoption
  * happens (or not) in the operators, with these numbers cited.
  *
  * Variants:
  *   base  — session defaults (v1 committer, snappy, _SUCCESS on)
  *   v2    — mapreduce.fileoutputcommitter.algorithm.version=2
  *           (task-parallel commit renames instead of driver-serial)
  *   nosucc— mapreduce.fileoutputcommitter.marksuccessfuljobs=false
  *   uncmp — parquet compression=none (codec-init share of file cost)
  *   raw   — fs.file.impl=RawLocalFileSystem (no .crc shadow files) —
  *           DIAGNOSTIC only: quantifies the checksum share locally,
  *           never adopted (cluster filesystems differ).
  */
object ProfileWriteAB3 {
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

    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_profab3_${ProcessHandle.current().pid()}").getAbsolutePath
    val docs = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val hashes = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.repartition(32).select(col("doc_id"),
          col("doc_id").as("__seed"), lit(false).as("__pert")),
        "__seed", "__pert").select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash").localCheckpoint()
    // rows already banded+prefixed and PINNED: only shuffle+write timed
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

    val hc = s.sparkContext.hadoopConfiguration
    var n = 0
    def w(lbl: String): Unit = {
      n += 1
      t(f"write 1024-dir #$n%02d [$lbl]") {
        rows.repartition(32, col("pfx"))
          .write.mode("overwrite").partitionBy("pfx").parquet(s"$base/w$n")
      }
    }
    def setV2(on: Boolean): Unit = hc.set(
      "mapreduce.fileoutputcommitter.algorithm.version", if (on) "2" else "1")
    def setSucc(on: Boolean): Unit = hc.set(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", on.toString)

    w("base"); w("base")
    setV2(true); w("v2"); w("v2"); setV2(false)
    setSucc(false); w("nosucc"); setSucc(true)
    setV2(true); setSucc(false); w("v2+nosucc"); w("v2+nosucc")
    setV2(false); setSucc(true)
    s.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    w("uncmp")
    s.conf.set("spark.sql.parquet.compression.codec", "snappy")
    w("base")
    // diagnostic: checksum share (never adopted)
    hc.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    try { w("rawfs (diagnostic)"); w("rawfs (diagnostic)") }
    finally hc.unset("fs.file.impl")
    w("base")
    setV2(true); setSucc(false); w("v2+nosucc"); setV2(false); setSucc(true)
    spark.stop()
  }
}
