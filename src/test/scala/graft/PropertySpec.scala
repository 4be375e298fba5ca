package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.{Dedup, Multimodal, TextStats}

/** Algebraic invariants over generated inputs — each property runs as
  * ONE Spark job over a generated batch (never a job per sample), with
  * fixed scalacheck seeds so failures reproduce. */
class PropertySpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val messyText = Gen.listOf(Gen.frequency(
    6 -> word,
    1 -> Gen.const("Café"),
    1 -> Gen.const("NAÏVE"),
    1 -> Gen.const("  "),
    1 -> Gen.const("\t"))).map(_.mkString(" "))

  test("normalizeText is idempotent and emits no uppercase/accents") {
    import spark.implicits._
    val texts = sample(Gen.listOfN(300, messyText), 1L)
    val out = texts.toDF("t")
      .select(TextStats.normalizeText(col("t")).as("n1"))
      .select(col("n1"), TextStats.normalizeText(col("n1")).as("n2"))
      .collect()
    out.foreach { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(!n1.exists(c => c.isUpper || TextStats.accentFrom.contains(c)), n1)
      assert(!n1.contains("  "), s"uncollapsed whitespace: '$n1'")
    }
  }

  test("jaccard is bounded, symmetric, and 1 on self") {
    import spark.implicits._
    val tokenList = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    val pairs = sample(Gen.listOfN(200, Gen.zip(tokenList, tokenList)), 2L)
    val out = pairs.toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("jxy"),
        Dedup.jaccard(col("y"), col("x")).as("jyx"),
        Dedup.jaccard(col("x"), col("x")).as("jxx"))
      .collect()
    out.foreach { r =>
      val (jxy, jyx, jxx) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(jxy >= 0.0 && jxy <= 1.0, jxy.toString)
      assert(jxy == jyx, s"asymmetric: $jxy != $jyx")
      assert(jxx == 1.0, s"self-jaccard $jxx != 1")
    }
  }

  test("minhash signature is invariant to shingle order") {
    import spark.implicits._
    val shingleList = Gen.nonEmptyListOf(word).map(_.take(12))
    val lists = sample(Gen.listOfN(150, shingleList), 3L)
    val withShuffled = lists.zipWithIndex.map { case (l, i) =>
      (i.toLong, l, new scala.util.Random(i).shuffle(l))
    }
    val out = withShuffled.toDF("id", "a", "b")
      .select(Dedup.minhashSignature(col("a"), 4).as("sa"),
        Dedup.minhashSignature(col("b"), 4).as("sb"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        "signature changed under permutation")
    }
  }

  test("hamming distance is zero on self and symmetric") {
    import spark.implicits._
    val vals = sample(Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))), 4L)
    val out = vals.toDF("a", "b")
      .select(Dedup.hamming16(col("a"), col("a")).cast("long").as("self"),
        Dedup.hamming16(col("a"), col("b")).cast("long").as("ab"),
        Dedup.hamming16(col("b"), col("a")).cast("long").as("ba"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == 0L)
      assert(r.getLong(1) == r.getLong(2))
    }
  }

  test("connected components are idempotent (a second pass is a fixpoint)") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
      .map(_.filter { case (a, b) => a != b })
    for (seed <- 1L to 3L) {
      val edges = sample(edgeGen, seed)
      val labels = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every label is itself a member mapping to itself (canonical),
      // and re-running CC over (id -> component) edges changes nothing
      labels.values.foreach(c => assert(labels(c) == c,
        s"non-canonical component $c (seed $seed)"))
      val again = Dedup.connectedComponents(
        labels.toSeq.filter { case (id, c) => id != c }.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      labels.foreach { case (id, c) =>
        if (id != c) assert(again(id) == c, s"label moved for $id (seed $seed)")
      }
    }
  }

  test("PNG header round-trips arbitrary dimensions") {
    val dims = sample(Gen.listOfN(100,
      Gen.zip(Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(0, Int.MaxValue))), 6L)
    dims.foreach { case (w, h) =>
      assert(Multimodal.PngHeader.dims(Multimodal.PngHeader.prefix(w, h))
        .contains((w, h)))
    }
  }

  test("operators tolerate empty inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactDedup(empty, "text", "doc_id").count() == 0)
    assert(Dedup.nearDupPairs(empty, "text", "doc_id").count() == 0)
    assert(Dedup.simhashSignatures(empty, "text", "doc_id").count() == 0)
    assert(graft.etl.Ids.assignContiguous(empty,
      md5(col("doc_id").cast("string")), 4).count() == 0)
    val emptyLabeled = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(graft.etl.Sampling.sampleTemperature(emptyLabeled,
      "lang", "doc_id", target = 100).count() == 0)
  }

  test("scrubPii leaves no email addresses behind") {
    import spark.implicits._
    val email = for {
      u <- word; d <- word
    } yield s"$u@$d.com"
    val withPii = sample(Gen.listOfN(150, Gen.zip(messyText, email)), 7L)
      .map { case (t, e) => s"$t contact $e now" }
    val out = withPii.toDF("t")
      .select(TextStats.scrubPii(col("t")).as("s")).collect()
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    out.foreach { r =>
      assert(emailRe.findFirstIn(r.getString(0)).isEmpty, r.getString(0))
    }
  }
}
