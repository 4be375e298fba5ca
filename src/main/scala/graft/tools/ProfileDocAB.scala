package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 A/B (guide §1): q_doc_pipeline regressed ~1.6× when the
  * PDF fixture attach gained the codec spread (r18 §4); every other
  * consumer of the spread got 3-4× faster. This isolates the
  * pipeline's PDF door at the query's own row count: attach + extract
  * + normalize + quality + localCheckpoint + the two gate counts, for
  * spread-to-N ∈ {none, 8, 32} interleaved. Measurement only.
  */
object ProfileDocAB {
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

    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source")

    // withPayloads minus the internal spread, re-spread by N here
    def attach(df: DataFrame, n: Option[Int]): DataFrame = {
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types.BinaryType
      val outSchema = df.schema.add("payload", BinaryType, nullable = false)
      val idIdx = df.schema.fieldIndex("doc_id")
      val textIdx = df.schema.fieldIndex("text")
      val pre = n.map(df.repartition(_)).getOrElse(df)
      pre.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(idIdx)
          val text = if (row.isNullAt(textIdx)) "" else row.getString(textIdx)
          val payload = graft.ext.Pdf.PdfFixture.pdf(Seq(
            Seq(text), Seq(s"Page 2 of doc $id")))
          Row.fromSeq(row.toSeq :+ payload)
        }
      }(Encoders.row(outSchema))
    }

    def pdfDoor(n: Option[Int]): Long = {
      val pdfText = graft.ext.Pdf.withPdfText(
          attach(docs.where(pmod(col("doc_id"), lit(2)) === 0)
            .select("doc_id", "text", "source"), n)
            .select("doc_id", "source", "payload"), "payload")
        .select(col("doc_id"), col("source"), col("text_pdf").as("raw"))
      val extracted = pdfText
        .select(col("doc_id"), col("source"),
          trim(regexp_replace(col("raw"), "\\s+", " ")).as("text"))
      val quality = extracted.where(size(split(col("text"), " ")) >= 5)
        .localCheckpoint()
      quality.count() + quality.count() // the two gate reads
    }

    def run(lbl: String, n: Option[Int]): Unit =
      t(s"pdf door [$lbl]") { pdfDoor(n); () }

    run("spread=32", Some(32)); run("none", None); run("spread=8", Some(8))
    run("spread=32", Some(32)); run("none", None); run("spread=8", Some(8))
    run("none", None); run("spread=32", Some(32))

    // FULL pipeline replica (docPipelineQ body), parameterized by the
    // codec spread N and an optional post-extract compaction before
    // the thrice-read checkpoint
    def full(lbl: String, n: Option[Int], compactTo: Option[Int]): Unit =
      t(s"full pipeline [$lbl]") {
        import org.apache.spark.sql.expressions.Window
        val wrap = (c: org.apache.spark.sql.Column) =>
          concat(lit("<html><body><h1>"), c, lit("</h1></body></html>"))
        val pdfText = graft.ext.Pdf.withPdfText(
            attach(docs.where(pmod(col("doc_id"), lit(2)) === 0)
              .select("doc_id", "text", "source"), n)
              .select("doc_id", "source", "payload"), "payload")
          .select(col("doc_id"), col("source"), col("text_pdf").as("raw"))
        val htmlDocs = docs.where(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), col("source"), wrap(col("text")).as("text"))
          .unionByName(docs
            .where(pmod(col("doc_id"), lit(2)) === 1 && col("doc_id") < 20)
            .select((col("doc_id") + 970000).as("doc_id"), col("source"),
              wrap(col("text")).as("text")))
        val htmlText = graft.ext.TextStats.withHtmlText(htmlDocs, "text")
          .select(col("doc_id"), col("source"), col("text_html").as("raw"))
        val extracted = pdfText.unionByName(htmlText)
          .select(col("doc_id"), col("source"),
            trim(regexp_replace(col("raw"), "\\s+", " ")).as("text"))
        // repartition, NOT coalesce: coalesce would fold the codec
        // upstream back into compactTo tasks; a narrow-row shuffle
        // after extraction keeps the codec at full width
        val q0 = extracted.where(size(split(col("text"), " ")) >= 5)
        val q1 = compactTo match {
          case Some(0) => q0.hint("rebalance") // AQE size-adaptive
          case Some(p) => q0.repartition(p)
          case None => q0
        }
        val quality = q1.localCheckpoint()
        val deduped = graft.ext.Dedup.exactDedup(quality, "text", "doc_id")
        require(quality.count() - deduped.count() >= 10, "gate")
        val quota = deduped.withColumn("quota_rank", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("doc_id"))))
          .where(col("quota_rank") <= 3)
        graft.etl.Sharding.shuffleShards(
            quota.select("doc_id", "source"), "doc_id", nShards = 4)
          .select("doc_id", "source", "shard", "pos")
          .orderBy("doc_id").count()
        ()
      }

    full("spread=32", Some(32), None); full("none", None, None)
    full("spread=32+repart4", Some(32), Some(4))
    full("spread=32+rebalance", Some(32), Some(0))
    full("spread=32", Some(32), None); full("none", None, None)
    full("spread=32+repart4", Some(32), Some(4))
    full("spread=32+rebalance", Some(32), Some(0))
    full("none", None, None); full("spread=32+repart4", Some(32), Some(4))
    full("spread=32+rebalance", Some(32), Some(0))
    full("spread=32", Some(32), None)
    spark.stop()
  }
}
