package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity}

/** Round-18 optimization evidence: formatted explains of the internal
  * operator plans the optimization round changed, dumped to
  * `<outDir>/<name>_<tag>.txt`. Run once on the pre-round HEAD with
  * tag=before (the tool is standalone — only APIs present in both
  * revisions) and once on the optimized HEAD with tag=after; the
  * judge diffs the pairs. The streaming queries' RETURNED frames are
  * sink reads, so the meat — the index serve scan, the rebuild-gate
  * shape, the fixture codec exchange — is dumped at the operator
  * level; the README in plans/r18 maps files to the declared
  * queries that exercise them. */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: DataFrame): Unit = {
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), text)
      ()
    }
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_plandump_${ProcessHandle.current().pid()}").getAbsolutePath

    // ---- hash index family (q_stream_hash_cdc / q_stream_hash_indexed /
    //      q_dedup_hash_index / q_media_pipeline / q_stream_all_indexed)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val baseHashes = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.select(col("doc_id"), col("doc_id").as("__seed"),
          lit(false).as("__pert")), "__seed", "__pert")
        .select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash")
    // the fixture codec chain itself (encode+decode exchange shape)
    dump("fixture_image_hashes", baseHashes)
    val pinned = baseHashes.localCheckpoint()
    val idir = s"$base/hashidx"
    Dedup.writeHashIndex(pinned, "doc_id", "dhash", idir, nPrefix = 64)
    val arrivals = Multimodal.imageDHashes(
      Multimodal.ImageFixture.withPayloads(
        docs.where(col("doc_id") < 5)
          .select((col("doc_id") + 885000L).as("doc_id"),
            col("doc_id").as("__seed"), lit(true).as("__pert")),
        "__seed", "__pert").select("doc_id", "payload"), "payload")
      .select("doc_id", "dhash").localCheckpoint()
    dump("q_stream_hash_cdc__serve_hashMatchesIndexed",
      Dedup.hashMatchesIndexed(idir, arrivals, "doc_id", "dhash"))
    // rebuild gate: both shapes dumped under both revisions so the
    // diff shows which one the queries now execute
    val idir2 = s"$base/hashidx2"
    Dedup.writeHashIndex(pinned, "doc_id", "dhash", idir2, nPrefix = 64)
    val m = s.read.parquet(idir)
    val r = s.read.parquet(idir2).select(m.columns.map(col).toIndexedSeq: _*)
    dump("q_stream_hash_cdc__gate_exceptAll", m.exceptAll(r))
    val names = m.columns.toIndexedSeq
    dump("q_stream_hash_cdc__gate_onepass_diff",
      m.withColumn("__w", lit(1L))
        .unionByName(r.select(names.map(col): _*).withColumn("__w", lit(-1L)))
        .groupBy(names.map(col): _*)
        .agg(sum(col("__w")).as("__d"))
        .where(col("__d") =!= 0L))

    // ---- band index family (q_stream_band_cdc / q_stream_band_indexed /
    //      q_dedup_index_update / q_stream_all_indexed / q_stream_neardup)
    val docsT = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val bdir = s"$base/bandidx"
    Dedup.writeBandIndex(docsT, "text", "doc_id", bdir, prefixChars = 1)
    val bandArr = docsT.where(col("doc_id") < 5)
      .select((col("doc_id") + 893000).as("doc_id"), col("text"))
    dump("q_stream_band_indexed__serve_minhashMatchesIndexed",
      Dedup.minhashMatchesIndexed(bdir, bandArr, "doc_id", "text"))
    dump("q_stream_band_cdc__fresh_minhashMatches",
      Dedup.minhashMatches(bandArr, docsT, "doc_id", "text"))

    // ---- IVF family (q_stream_ivf_cdc / q_stream_ivf_indexed /
    //      q_sim_ivf_partitioned / q_sim_ivf_update / q_stream_all_indexed)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 1)
    val vdir = s"$base/ivfidx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", cents, vdir)
    dump("q_stream_ivf_indexed__serve_ivfPartitionedTopK",
      Similarity.ivfPartitionedTopK(vdir, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", 5, cents, nprobe = 2))

    // ---- PDF fixture chain (q_text_pdf / q_text_pdf_cid /
    //      q_text_pdf_xref / q_text_pdf_extends / q_doc_pipeline)
    dump("q_text_pdf__fixture_extract",
      graft.ext.Pdf.withPdfText(
        graft.ext.Pdf.PdfFixture.withPayloads(
          docsT.where(col("doc_id") < 100), "doc_id", "text")
          .select("doc_id", "payload"), "payload"))

    spark.stop()
  }
}
