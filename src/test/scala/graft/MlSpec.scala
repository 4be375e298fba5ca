package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml._

/** ML sanity (SURVEY §5.5): the classifier must actually learn a
  * separable task; evaluator contract; save/load/registry round trip;
  * parallel tuning selects a best run. */
class MlSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Separable synthetic set: each class has a distinctive vocabulary
    * (stand-in for merchant narratives: brand tokens + shared noise). */
  def synth(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val vocab = Map(
      "starbucks" -> Seq("coffee", "latte", "espresso", "roast"),
      "tesco" -> Seq("grocery", "store", "supermarket", "food"),
      "shell" -> Seq("fuel", "petrol", "station", "diesel"),
      "netflix" -> Seq("stream", "video", "subscription", "film"))
    val noise = Seq("cd", "deb", "ref", "pos", "4711", "card")
    val rng = new scala.util.Random(42)
    val rows = (0 until n).map { i =>
      val (label, words) = vocab.toSeq(rng.nextInt(vocab.size))
      val text = (Seq.fill(3)(words(rng.nextInt(words.size))) ++
        Seq.fill(2)(noise(rng.nextInt(noise.size)))).mkString(" ")
      (i.toLong, label, text)
    }
    rows.toDF("id", "merchant", "narrative")
  }

  lazy val data = synth(400)
  lazy val trainDf = data.where(col("id") % 10 < 8)
  lazy val testDf = data.where(col("id") % 10 >= 8)

  test("classifier learns a separable task (accuracy >= 0.9)") {
    val model = Trainer.train(trainDf, "merchant", "narrative",
      Trainer.Params(epoch = 5, wordNgrams = 2, numFeatures = 1 << 14))
    val scored = model.predict(testDf, "narrative", "pr_merchant")
    val summary = Evaluator.summaryMap(scored, "merchant", "pr_merchant")
    assert(summary("avg__acc") >= 0.9, s"summary=$summary")
    assert(summary.keySet == Set("avg__acc", "q_05_acc", "q_25_acc",
      "q_50_acc", "q_75_acc", "q_95_acc"))
  }

  /** The ML floor guard (q_ml_eval_summary is the bench's most
    * expensive query every round): featurize→fit→score must ship only
    * BOUNDED data to the driver — gradient aggregates O(features ×
    * classes), indexer labels, the 1-row summary — never anything
    * row-scale. Detector: sum per-task result bytes via a listener at two
    * corpus sizes 16× apart; bounded driver traffic stays ~flat, a
    * row-scale collect would grow ~16×. */
  test("train→score driver-result bytes stay flat as the corpus scales 16x") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    def measure(n: Int): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) { acc.addAndGet(t.taskMetrics.resultSize); () }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val d = synth(n)
        val m = Trainer.train(d, "merchant", "narrative",
          Trainer.Params(epoch = 3, wordNgrams = 1, numFeatures = 1 << 13))
        val scored = m.predict(d, "narrative", "pr_merchant")
        Evaluator.summary(scored, "merchant", "pr_merchant").collect()
        // the listener bus drains asynchronously — flush it
        // deterministically instead of sleep-polling for stability
        org.apache.spark.GraftTestBridge.flushListenerBus(spark.sparkContext)
        acc.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val small = measure(500)
    val big = measure(8000)
    assert(small > 0, "listener captured nothing — detector broken")
    assert(big < small * 4,
      s"driver-result bytes grew ${big.toDouble / small}x over a 16x corpus " +
        s"($small -> $big) — something in featurize/fit/score collects row-scale data")
  }

  test("quality classifier learns curated-vs-raw and composes into curation") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val noise = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def prose(n: Int) = Seq.fill(n)(noise(rng.nextInt(noise.size))).mkString(" ")
    // curated docs carry citation-like structure; raw carry boilerplate
    val docs = (0 until 300).map { i =>
      val curated = i % 3 != 0
      val marker = if (curated) "wellformed cited prose" else "boilerplate scraped clutter"
      // the d$i token keeps every text unique (dedup must only
      // collapse the PLANTED duplicates, never prose collisions)
      (i.toLong, s"${prose(6)} d$i $marker $marker")
    }.toDF("doc_id", "text")
    // plant exact duplicates of two curated docs for the dedup stage
    val dup = docs.where(col("doc_id").isin(1L, 2L))
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val corpus = docs.unionAll(dup).persist()
    val qm = graft.ml.QualityFilter.train(
      corpus.where(col("doc_id") % 3 =!= 0 && col("doc_id") < 240),
      corpus.where(col("doc_id") % 3 === 0 && col("doc_id") < 240), "text")
    // scoring separates the held-out planted classes
    val heldout = corpus.where(col("doc_id") >= 240 && col("doc_id") < 1000)
    val scored = qm.score(heldout, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("keep_prob"))
    scored.foreach { case (id, p) =>
      if (id % 3 != 0) assert(p >= 0.5, s"curated doc $id scored $p")
      else assert(p < 0.5, s"raw doc $id scored $p")
    }
    // COMPOSITION: model filter -> exact dedup, plain frames in/out —
    // survivors are exactly the curated ids with duplicates collapsed
    // to their smallest id
    val filtered = qm.filter(corpus, "text", 0.5)
    val survivors = graft.ext.Dedup.exactDedup(
        filtered.select("doc_id", "text"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (0 until 300).filter(_ % 3 != 0).map(_.toLong).toSet
    assert(survivors == expected,
      s"diff +${(survivors -- expected).take(5)} -${(expected -- survivors).take(5)}")
  }

  test("save/load round trip predicts identically; registry resolves production") {
    val tmp = java.nio.file.Files.createTempDirectory("ml").toString
    val model = Trainer.train(trainDf, "merchant", "narrative",
      Trainer.Params(epoch = 3, wordNgrams = 2, numFeatures = 1 << 14))
    val tracking = new Tracking(tmp)
    val runId = tracking.startRun(model.params.asMap)
    model.save(tracking.modelDir(runId))
    tracking.logMetrics(runId, Map("avg__acc" -> 1.0))
    tracking.promote("merchcat", runId)

    val resolved = tracking.resolve("merchcat")
    assert(resolved.contains(tracking.modelDir(runId)))
    val loaded = Trainer.load(resolved.get)
    assert(loaded.params == model.params)
    val texts = Seq("coffee latte cd", "petrol station ref", "video stream 4711")
    assert(loaded.predictLocal(texts) == model.predictLocal(texts))
  }

  test("parallel tuning runs trials, tracks them, and ranks by objective") {
    val tmp = java.nio.file.Files.createTempDirectory("tune").toString
    val tracking = new Tracking(tmp)
    val trials = Tuning.search(trainDf, testDf, "merchant", "narrative",
      tracking, space = Tuning.Space(numFeaturesLog2 = (12, 14)),
      maxEvals = 4, parallelism = 2)
    assert(trials.size == 4)
    assert(trials.head.metrics("avg__acc") >=
      trials.last.metrics("avg__acc"))
    assert(tracking.listRuns().size == 4)
    // several trials can tie on the objective — compare the metric value
    val best = tracking.bestRun("avg__acc").get
    assert(tracking.metrics(best)("avg__acc") == trials.head.metrics("avg__acc"))
  }

  test("successive halving matches random search on fewer total epochs") {
    val tmp = java.nio.file.Files.createTempDirectory("tune_sh").toString
    val space = Tuning.Space(numFeaturesLog2 = (12, 14))
    val random = Tuning.search(trainDf, testDf, "merchant", "narrative",
      new Tracking(tmp + "/rand"), space, maxEvals = 4, parallelism = 2)
    val halved = Tuning.searchHalving(trainDf, testDf, "merchant", "narrative",
      new Tracking(tmp + "/sh"), space, n0 = 4, rung0Epochs = 1, parallelism = 2)
    val randomBest = random.head.metrics("avg__acc")
    val halvedBest = halved.head.metrics("avg__acc")
    assert(halvedBest >= randomBest, s"halved=$halvedBest random=$randomBest")
    // budget actually spent: rungs of 4@1 + 2@2 + 1@4 = 12 epochs vs
    // random's 4 trials at 5-15 sampled epochs each
    val randomEpochs = random.map(_.params.epoch).sum
    assert(12 < randomEpochs, s"randomEpochs=$randomEpochs")
  }

  test("label round trip: encode then decode restores dash-free labels") {
    import spark.implicits._
    val df = Seq("virgin media", "tesco", "the works").toDF("m")
    val out = df.select(graft.etl.Labeling.decode(
      graft.etl.Labeling.encodeLabelToken(col("m"))).as("back"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("virgin media", "tesco", "the works"))
  }
}
