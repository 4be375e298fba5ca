package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Skew mitigation: salted operators must be value-identical to their
  * plain forms while actually fanning the hot key out over salts. */
class SkewSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 90% of fact rows share one hot key
  lazy val fact = (1 to 10000)
    .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong))
    .toDF("k", "v")
  lazy val dim = (0L to 49L).map(k => (k, s"name_$k")).toDF("dk", "name")

  test("salted join is row-identical to the plain join") {
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 10000 - 1000 + 1000) // every fact row matched once
  }

  test("salted join fans the hot key over multiple salt buckets") {
    val saltCount = fact
      .withColumn("__salt", floor(rand(42L) * 8).cast("int"))
      .where(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(saltCount >= 4, s"hot key landed in only $saltCount salt buckets")
  }

  test("left salted join keeps unmatched left rows exactly once") {
    val factWithOrphans = fact.union(Seq((999L, -1L), (998L, -2L)).toDF("k", "v"))
    val plain = factWithOrphans.join(dim, col("k") === col("dk"), "left")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(factWithOrphans, dim, "k", "dk",
        salts = 8, joinType = "left")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.exists(r => r(0) == 999L && r(2) == null))
  }

  test("salted join rejects right/full outer (right side is replicated)") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", salts = 8, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", salts = 8, joinType = "full_outer")
    }
  }

  test("salted count equals plain groupBy count") {
    val plain = fact.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(fact, "k", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain(7L) == 9000L)
  }
}
