package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal}

/** Step-level decomposition of the heaviest bench queries (guide §1):
  * replays q_stream_hash_cdc's exact pipeline piece by piece with a
  * wall timer per step, plus micro A/Bs for the candidate fixes
  * (parallelized fixture decode; one-pass multiset-diff gate vs
  * two-way exceptAll). Measurement only — not part of the surface.
  */
object ProfilePieces {
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

    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_profpieces_${ProcessHandle.current().pid()}").getAbsolutePath
    val docs = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")

    def payloadsOf(idSeedPert: DataFrame): DataFrame =
      Multimodal.ImageFixture.withPayloads(idSeedPert, "__seed", "__pert")
        .select("doc_id", "payload")
    def hashesOf(payloads: DataFrame): DataFrame =
      Multimodal.imageDHashes(payloads, "payload").select("doc_id", "dhash")

    println("== q_stream_hash_cdc pieces")
    val baseIds = docs.select(col("doc_id"),
      col("doc_id").as("__seed"), lit(false).as("__pert"))
    val baseHashes = t("baseHashes decode+localCheckpoint (1 partition)") {
      hashesOf(payloadsOf(baseIds)).localCheckpoint()
    }
    val baseHashesPar = t("baseHashes decode+localCheckpoint (repartition 32)") {
      hashesOf(payloadsOf(baseIds.repartition(32))).localCheckpoint()
    }
    val idir = s"$base/idx"
    t("writeHashIndex nPrefix=1024") {
      Dedup.writeHashIndex(baseHashes, "doc_id", "dhash", idir, nPrefix = 1024)
    }
    t("read full index .count()") { s.read.parquet(idir).count() }
    val rebuildDir = s"$base/rebuild"
    t("writeHashIndex rebuild nPrefix=1024") {
      Dedup.writeHashIndex(baseHashesPar, "doc_id", "dhash", rebuildDir,
        nPrefix = 1024)
    }
    val maintained = s.read.parquet(idir)
    val rebuilt = s.read.parquet(rebuildDir)
      .select(maintained.columns.map(col).toIndexedSeq: _*)
    t("gate: exceptAll both ways") {
      require(maintained.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(maintained).isEmpty)
    }
    t("gate: one-pass multiset diff") {
      val cols = maintained.columns.toIndexedSeq.map(col)
      val d = maintained.withColumn("__w", lit(1L))
        .unionByName(rebuilt.withColumn("__w", lit(-1L)))
        .groupBy(cols: _*).agg(sum(col("__w")).as("__d"))
        .where(col("__d") =!= 0L)
      require(d.isEmpty)
    }
    val arrivals = t("arrivals decode (15 rows, 1 partition)") {
      hashesOf(payloadsOf(
        docs.where(col("doc_id") < 15)
          .select((col("doc_id") + 885000L).as("doc_id"),
            col("doc_id").as("__seed"), lit(true).as("__pert"))))
        .localCheckpoint()
    }
    t("serve hashMatchesIndexed collect") {
      Dedup.hashMatchesIndexed(idir, arrivals, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    t("fresh hashMatches collect") {
      Dedup.hashMatches(arrivals, baseHashes, "doc_id", "dhash")
        .orderBy("doc_id", "neighbor_id").collect()
    }

    println("== band pieces")
    val docsT = s.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val bdir = s"$base/bandidx"
    t("writeBandIndex prefixChars=2") {
      Dedup.writeBandIndex(docsT, "text", "doc_id", bdir, prefixChars = 2)
    }
    t("writeBandIndex rebuild") {
      Dedup.writeBandIndex(docsT, "text", "doc_id", s"$base/bandidx2",
        prefixChars = 2)
    }
    val m2 = s.read.parquet(bdir)
    val r2 = s.read.parquet(s"$base/bandidx2")
      .select(m2.columns.map(col).toIndexedSeq: _*)
    t("band gate: exceptAll both ways") {
      require(m2.exceptAll(r2).isEmpty && r2.exceptAll(m2).isEmpty)
    }
    t("band gate: one-pass multiset diff") {
      val cols = m2.columns.toIndexedSeq.map(col)
      val d = m2.withColumn("__w", lit(1L))
        .unionByName(r2.withColumn("__w", lit(-1L)))
        .groupBy(cols: _*).agg(sum(col("__w")).as("__d"))
        .where(col("__d") =!= 0L)
      require(d.isEmpty)
    }
    val bandArr = docsT.where(col("doc_id") < 10)
      .select((col("doc_id") + 893000).as("doc_id"), col("text"))
    t("minhashMatches(arr, full corpus) collect") {
      Dedup.minhashMatches(bandArr, docsT, "doc_id", "text")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    t("minhashMatchesIndexed(arr) collect") {
      Dedup.minhashMatchesIndexed(bdir, bandArr, "doc_id", "text")
        .orderBy("doc_id", "neighbor_id").collect()
    }
    s.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()
  }
}
