package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-drift canary: pins the physical schema of every driver
  * fixture table and fails LOUDLY (table + column named) when a
  * regenerated fixture drifts from what the query surface assumes.
  *
  * Motivation: between rounds the driver regenerates the parquet
  * fixtures, and in round 8 `events.ts` silently changed physical type
  * (TIMESTAMP(NANOS)-as-long → TIMESTAMP(MICROS)/NTZ). Two streaming
  * queries that hard-coded the old conversion failed analysis and just
  * VANISHED from the correctness file. This check runs first in
  * [[graft.Verify]] so the next drift is one explicit error naming the
  * table/column, not N queries quietly missing.
  *
  * Timestamp columns accept the three known physical variants (see
  * [[Tables.normalizeTs]]); every other column is pinned exactly.
  */
object FixtureCheck {

  /** Accepted Spark types per column. Timestamps tolerate the variants
    * normalizeTs handles; everything else is exact. */
  private val tsVariants: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsVariants, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> tsVariants),
    "events" -> Map(
      "event_id" -> Set(LongType), "ts" -> tsVariants,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)))

  /** Every mismatch (missing / extra / retyped column, unreadable
    * table) across all fixture tables, as human-readable strings.
    * [[graft.Verify]] PRINTS these to stderr and continues (an
    * incompatible drift will fail exactly the affected queries, and a
    * compatible one must not zero the round), while [[check]] — run
    * from the test suite — throws, so `sbt test` goes red and the
    * drift gets fixed the same session it appears. */
  def problems(s: SparkSession, dir: String): Seq[String] = {
    // nanos fixtures need the legacy conf to be readable at all; set it
    // for the probe reads the same way Tables.events does.
    val prev = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = Seq.newBuilder[String]
    try {
      expected.foreach { case (table, cols) =>
        val schema =
          try Some(s.read.parquet(s"$dir/$table.parquet").schema)
          // NonFatal only: an OOM/LinkageError here is a poisoned JVM,
          // not fixture drift — let it crash instead of mislabeling it
          catch { case scala.util.control.NonFatal(e) =>
            problems += s"$table: unreadable (${e.getMessage})"; None
          }
        schema.foreach { sc =>
          val byName = sc.fields.map(f => f.name -> f.dataType).toMap
          cols.foreach { case (col, ok) =>
            byName.get(col) match {
              case None => problems += s"$table.$col: MISSING"
              case Some(t) if !ok(t) =>
                problems += s"$table.$col: type ${t.sql} not in " +
                  ok.map(_.sql).mkString("{", ", ", "}")
              case _ => ()
            }
          }
          (byName.keySet -- cols.keySet).foreach { extra =>
            problems += s"$table.$extra: UNEXPECTED new column " +
              s"(${byName(extra).sql}) — fixture grew; update FixtureCheck"
          }
        }
      }
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", p)
      case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    problems.result()
  }

  /** Throws IllegalStateException listing every drift. Test-suite entry
    * point; Verify uses [[problems]] directly (warn-and-continue). */
  def check(s: SparkSession, dir: String): Unit = {
    val found = problems(s, dir)
    if (found.nonEmpty)
      throw new IllegalStateException(
        "FIXTURE DRIFT detected — the driver regenerated testdata with a " +
          "schema the query surface does not expect:\n  " +
          found.mkString("\n  "))
  }
}
