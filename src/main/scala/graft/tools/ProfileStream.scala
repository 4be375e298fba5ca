package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal}

/** End-to-end step decomposition of q_stream_hash_cdc with the
  * STREAMING segment isolated (guide §1): how much of the query is
  * micro-batch machinery (offset/commit logs, per-batch planning) vs
  * the updateHashIndex work itself. Measurement only.
  */
object ProfileStream {
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
      s"graft_profstream_${ProcessHandle.current().pid()}").getAbsolutePath
    val docs = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    def payloadsOf(idSeedPert: DataFrame): DataFrame =
      Multimodal.ImageFixture.withPayloads(idSeedPert, "__seed", "__pert")
        .select("doc_id", "payload")
    def hashesOf(payloads: DataFrame): DataFrame =
      Multimodal.imageDHashes(payloads, "payload").select("doc_id", "dhash")

    println("== q_stream_hash_cdc steps (current code)")
    val baseHashes = t("baseHashes (decode once)") {
      hashesOf(payloadsOf(docs.select(col("doc_id"),
        col("doc_id").as("__seed"), lit(false).as("__pert"))))
        .localCheckpoint()
    }
    val idir = s"$base/idx"
    t("writeHashIndex 1024") {
      Dedup.writeHashIndex(baseHashes, "doc_id", "dhash", idir, nPrefix = 1024)
    }
    val changes = t("changes build+write (3 files)") {
      val c = payloadsOf(docs.where(col("doc_id") < 5)
          .select(col("doc_id"), (col("doc_id") + 650000L).as("__seed"),
            lit(false).as("__pert")))
        .select(col("doc_id"), col("payload"),
          col("doc_id").as("seq"), lit("u").as("op"))
        .unionByName(docs.where(col("doc_id") >= 5 && col("doc_id") < 10)
          .select(col("doc_id"), lit(Array.empty[Byte]).as("payload"),
            col("doc_id").as("seq"), lit("d").as("op")))
        .unionByName(payloadsOf(
            docs.where(col("doc_id") >= 10 && col("doc_id") < 15)
              .select((col("doc_id") + 707000L).as("doc_id"),
                (col("doc_id") + 707000L).as("__seed"),
                lit(false).as("__pert")))
          .select(col("doc_id"), col("payload"),
            col("doc_id").as("seq"), lit("i").as("op")))
      c.repartition(3).write.mode("overwrite").parquet(s"$base/src")
      c
    }
    t("STREAM: 3 maintenance micro-batches end to end") {
      val stream = s.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/src")
      val q = graft.streaming.ScoreStream.hashIndexMaintainSink(
        stream, idir, "doc_id", "payload", s"$base/out", s"$base/chk")
      q.awaitTermination()
    }
    // batch-equivalent of the same 3 updates, no streaming machinery
    val idir2 = s"$base/idx2"
    t("writeHashIndex 1024 (second copy)") {
      Dedup.writeHashIndex(baseHashes, "doc_id", "dhash", idir2, nPrefix = 1024)
    }
    t("BATCH: same 3 updates via updateHashIndex directly") {
      (0 until 3).foreach { k =>
        val part = changes.where(pmod(col("doc_id"), lit(3)) === k)
        val hashed = Multimodal.imageDHashes(part, "payload").drop("payload")
        Dedup.updateHashIndex(idir2, hashed, "doc_id", "dhash")
        ()
      }
    }
    val postHashes = t("postHashes (decode)") {
      hashesOf(payloadsOf(
        docs.where(col("doc_id") >= 10)
          .select(col("doc_id"), col("doc_id").as("__seed"),
            lit(false).as("__pert"))
        .unionByName(docs.where(col("doc_id") < 5)
          .select(col("doc_id"), (col("doc_id") + 650000L).as("__seed"),
            lit(false).as("__pert")))
        .unionByName(docs.where(col("doc_id") >= 10 && col("doc_id") < 15)
          .select((col("doc_id") + 707000L).as("doc_id"),
            (col("doc_id") + 707000L).as("__seed"),
            lit(false).as("__pert")))))
        .localCheckpoint()
    }
    val rebuildDir = s"$base/rebuild"
    t("rebuild writeHashIndex 1024") {
      Dedup.writeHashIndex(postHashes, "doc_id", "dhash", rebuildDir,
        nPrefix = 1024)
    }
    t("one-pass diff gate") {
      val maintained = s.read.parquet(idir)
      val rebuilt = s.read.parquet(rebuildDir)
        .select(maintained.columns.map(col).toIndexedSeq: _*)
      val names = maintained.columns.toIndexedSeq
      val d = maintained.withColumn("__w", lit(1L))
        .unionByName(rebuilt.select(names.map(col): _*)
          .withColumn("__w", lit(-1L)))
        .groupBy(names.map(col): _*).agg(sum(col("__w")).as("__d"))
        .where(col("__d") =!= 0L)
      require(d.isEmpty)
    }
    val arrivals = t("arrivals decode") {
      hashesOf(payloadsOf(
        docs.where(col("doc_id") < 5)
          .select((col("doc_id") + 885000L).as("doc_id"),
            (col("doc_id") + 650000L).as("__seed"), lit(true).as("__pert"))
        .unionByName(docs.where(col("doc_id") >= 5 && col("doc_id") < 10)
          .select((col("doc_id") + 886000L).as("doc_id"),
            col("doc_id").as("__seed"), lit(true).as("__pert")))
        .unionByName(docs.where(col("doc_id") >= 10 && col("doc_id") < 15)
          .select((col("doc_id") + 887000L).as("doc_id"),
            (col("doc_id") + 707000L).as("__seed"),
            lit(true).as("__pert")))))
        .localCheckpoint()
    }
    t("serve hashMatchesIndexed collect") {
      Dedup.hashMatchesIndexed(idir, arrivals, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    t("fresh hashMatches collect") {
      Dedup.hashMatches(arrivals, postHashes, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    spark.stop()
  }
}
