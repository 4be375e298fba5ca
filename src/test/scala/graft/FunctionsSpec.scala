package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Native codegen'd dot_product expression: SQL + DataFrame surfaces,
  * bit-identical values to the interpreted HOF fold, and codegen'd
  * execution (the expression must live inside a WholeStageCodegen
  * stage, not force a fallback). */
class FunctionsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dot_product resolves in SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // float arrays implicitly cast
    val f = spark.sql(
      "SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(f == 11.0)
  }

  test("native dot matches the interpreted HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).select(col("vec_id"), col("embedding"))
    val both = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("hof"),
      call_function("dot_product", col("embedding"), col("embedding")).as("native"))
    assert(both.where(col("hof") =!= col("native")).count() == 0)
  }

  test("dot_product executes inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // AQE off so executedPlan is the final plan with codegen markers
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val q = emb.select(
        call_function("dot_product", col("embedding"), col("embedding")).as("d"))
        .agg(max("d"))
      assert(q.head().getDouble(0) > 0)
      val plan = q.queryExecution.executedPlan.toString
      // the projection containing dot_product must be a codegen stage,
      // not an interpreted fallback
      val starProject = "\\*\\(\\d+\\) Project \\[dot_product".r
      assert(starProject.findFirstIn(plan).isDefined, plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("GraftExtensions injects the function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // wiring is exercised; resolution through an extension-built
    // session is covered by Verify/Bench mains which set
    // spark.sql.extensions (only one SparkContext fits in this JVM)
  }
}
