package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY §2 (and
  * the LLM-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for everything SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the full reference pipeline — clean → label → split →
    * train → score → per-class accuracy summary — on sf0.001.
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Queries.mlEvalSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-pipeline extension surface. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Queries.all ++ ops.ExtQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check). Dynamic oracles embed
    * data-derived literals and appear once their query has run in this
    * process (Verify runs every query before dumping this map). */
  def oracleSql: Map[String, String] =
    ops.Queries.oracles ++ ops.ExtQueries.oracles ++ ops.ExtQueries.dynamicOracles
}
