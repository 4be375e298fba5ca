package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 late-operator scaling sidecar: the four extensions that
  * landed after BENCH_R15_SCALE was recorded, at 1×/10×/100× of
  * sf0.1's document ids (500k docs at x100).
  *
  *  - `video`: [[graft.ext.Dedup.videoNearDups]] over real six-frame
  *    GVID fixtures (stride 2 → 3 PNG decodes of 6 frames per doc).
  *    Ten planted perturbed re-encodes at every scale; fixture build
  *    (7× PNG codec work per doc) is timed separately from the dedup
  *    so codec cost doesn't mask the join's scaling.
  *  - `hidx`: the stored perceptual hash index. The claim under test
  *    is the CDC economics: a FIXED 8-row change batch against a
  *    1024-prefix layout must rewrite only its touched dirs
  *    (reported), while the full rebuild pays the whole corpus — so
  *    `update_sec` should grow like touched/nPrefix of `build_sec`,
  *    not like `build_sec`. Serving with a bounded arrival batch
  *    prunes to ≤ bands×|batch| prefixes at any corpus size.
  *  - `unigram_train`: [[graft.ext.TextStats.unigramTrain]] (2 EM
  *    rounds, vocab 300). Replicas multiply word COUNTS, not the
  *    distinct-word table the EM rounds scan — train time should stay
  *    near-flat while the corpus grows 100×.
  *
  * Output: one JSON line → BENCH_R15B_SCALE.json.
  */
object BenchR15bScale {

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
    val D = graft.ext.Dedup
    val ids0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val scratch = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r15bscale_${ProcessHandle.current().pid()}").getAbsolutePath

    def idReplicas(n: Int): DataFrame =
      (0 until n).map(k => ids0.select(
        (col("doc_id") + k * 10000000L).as("doc_id")))
        .reduce(_ union _)
        .repartition(cpus) // codec work must use every core

    val entries = scales.map { n =>
      val ids = idReplicas(n)
      val rows = ids.count()

      // ---- video: fixture build vs dedup, planted pairs pinned ----
      val base = ids.select(col("doc_id"), col("doc_id").as("__seed"),
        lit(false).as("__pert"))
      val variants = ids.orderBy("doc_id").limit(10)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          col("doc_id").as("__seed"), lit(true).as("__pert"))
      val (tVidFx, vids) = timed {
        val dir = s"$scratch/vids$n"
        M.VideoFixture.withPayloads(base.unionAll(variants),
            "__seed", "__pert")
          .select("doc_id", "payload")
          .write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }
      val (tVid, vidPairs) = timed {
        D.videoNearDups(vids, "doc_id", "payload",
          stride = 2, minMatches = 2).count()
      }
      require(vidPairs >= 10, s"x$n: planted video pairs lost ($vidPairs)")

      // ---- stored hash index: build vs CDC update vs serve ----
      val (tHash, hashes) = timed {
        val h = M.imageDHashes(
          M.ImageFixture.withPayloads(base, "__seed", "__pert")
            .select("doc_id", "payload"), "payload")
          .select("doc_id", "dhash").localCheckpoint()
        h.count(); h
      }
      val idir = s"$scratch/hidx$n"
      val (tBuild, _) = timed {
        D.writeHashIndex(hashes, "doc_id", "dhash", idir, nPrefix = 1024)
      }
      val changes = hashes.orderBy("doc_id").limit(8)
        .select(col("doc_id"),
          // move each hash by one low bit: old and new band homes
          // both get touched, the realistic update shape
          col("dhash").bitwiseXOR(lit(1L)).as("dhash"),
          lit(1L).as("seq"), lit("u").as("op"))
      val (tUpd, touched) = timed {
        D.updateHashIndex(idir, changes, "doc_id", "dhash").length
      }
      val probes = hashes.orderBy(col("doc_id").desc).limit(50)
        .select((col("doc_id") + 950000000L).as("doc_id"), col("dhash"))
      val (tServe, served) = timed {
        D.hashMatchesIndexed(idir, probes, "doc_id", "dhash").count()
      }
      require(served >= 50, s"x$n: planted serve probes lost ($served)")

      // ---- unigram train: distinct words constant across replicas ----
      val textRep = (0 until n).map(k => docs0.select(
          (col("doc_id") + k * 10000000L).as("doc_id"), col("text")))
        .reduce(_ union _).repartition(cpus)
      val (tTrain, vocabSize) = timed {
        graft.ext.TextStats.unigramTrain(textRep, "text",
          vocabSize = 300, iterations = 2, maxPieceLen = 4).size
      }

      System.err.println(f"[r15bscale] x$n rows=$rows " +
        f"vidfx=$tVidFx%.1f vid=$tVid%.1f ($vidPairs pairs) " +
        f"hash=$tHash%.1f build=$tBuild%.1f upd=$tUpd%.1f " +
        f"(touched $touched/1024) serve=$tServe%.1f " +
        f"train=$tTrain%.1f (|V|=$vocabSize)")
      f""""x$n":{"rows":$rows,"video_fixture_sec":$tVidFx%.2f,""" +
        f""""video_dedup_sec":$tVid%.2f,"video_pairs":$vidPairs,""" +
        f""""hash_decode_sec":$tHash%.2f,"index_build_sec":$tBuild%.2f,""" +
        f""""index_update_sec":$tUpd%.2f,"touched_prefixes":$touched,""" +
        f""""index_serve_sec":$tServe%.2f,""" +
        f""""unigram_train_sec":$tTrain%.2f,"unigram_vocab":$vocabSize}"""
    }
    println(s"""{"metric":"r15b_scale","sf":"$sfDir","cpus":$cpus,""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
