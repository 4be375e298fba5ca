package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sketch aggregates: estimates must land within their advertised
  * tolerance of the exact answers. */
class SketchSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct within rsd of exact") {
    val exact = li.select(countDistinct("l_orderkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey", 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"approx=$approx exact=$exact err=$err") // 3x rsd
  }

  test("percentile_approx close to exact percentile") {
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    val approx = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }

  test("sketches merge across partitions (repartition-invariant)") {
    val a = li.repartition(1).select(approx_count_distinct("l_orderkey", 0.02))
      .head().getLong(0)
    val b = li.repartition(16).select(approx_count_distinct("l_orderkey", 0.02))
      .head().getLong(0)
    assert(a == b, s"1-part=$a 16-part=$b") // HLL merge is exact
  }
}
