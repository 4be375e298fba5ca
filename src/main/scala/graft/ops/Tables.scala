package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture-table access + cross-engine-exact numeric helpers.
  *
  * The DuckDB oracle hash-compares values, so every aggregate a query
  * emits must be bit-identical across engines. Doubles summed in
  * arbitrary order are not; decimals are. `dsum` routes a double column
  * through DECIMAL (exact, commutative) and casts the final result back
  * to double — same value in both engines regardless of partial-agg
  * order. Ratios divide two already-identical doubles (IEEE → identical
  * quotient).
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  /** Events access tolerant of the fixture's timestamp physical type.
    * Older fixture drops stored `ts` as parquet TIMESTAMP(NANOS) (Spark
    * refuses to map it to TimestampType → read nanos as long, truncate
    * to micros); current drops store TIMESTAMP(MICROS) without UTC
    * adjustment (Spark reads TIMESTAMP_NTZ). Both normalize to a plain
    * `TimestampType` micros column — with the session pinned to UTC the
    * NTZ→LTZ cast is value-identity, so DuckDB oracle parity holds in
    * either case. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val prev = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, dir, "events")
    // Leave the legacy conf set ONLY when this fixture actually stores
    // nanos (the executors need it at scan time); otherwise restore the
    // prior value so an unrelated later read of a nanos file in the same
    // session doesn't silently come back as LongType.
    if (df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      prev match {
        case Some(p) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", p)
        case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    normalizeTs(df)
  }

  /** Normalize the events `ts` column to a plain `TimestampType`
    * regardless of the fixture's physical parquet type. Works on batch
    * AND streaming frames (schema-dispatch + `withColumn` only) — every
    * events read, `readStream` included, must go through this so a
    * fixture-drop type change breaks zero queries. Known variants:
    *   - TIMESTAMP(NANOS) read as LongType under
    *     `spark.sql.legacy.parquet.nanosAsLong` → truncate to micros;
    *   - TIMESTAMP(MICROS) with UTC adjustment → TimestampType, as-is;
    *   - TIMESTAMP(MICROS) without UTC adjustment → TIMESTAMP_NTZ; with
    *     the session pinned to UTC the NTZ→LTZ cast is value-identity.
    * Anything else is fixture drift and fails LOUDLY (a silent
    * best-effort cast would turn unparseable values into nulls and break
    * DuckDB oracle parity invisibly). */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case other => throw new IllegalStateException(
        s"fixture drift: events.$colName has unexpected type $other " +
          "(expected long-nanos / timestamp / timestamp_ntz) — extend Tables.normalizeTs")
    }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** Order-independent, cross-engine-exact sum of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Cross-engine-exact mean: exact sum divided by exact count. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1)).cast("double")

  /** Portable deterministic shuffle key (md5 hex is identical in Spark
    * and DuckDB; hex-string ordering is plain ASCII) — stands in for the
    * reference's unseeded rand() orderings (01_merchcat_etl.py:179). */
  def shuffleKey(c: Column): Column = md5(c.cast("string"))
}
