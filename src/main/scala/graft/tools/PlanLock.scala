package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-shape regression lock: a committed fingerprint of the physical
  * plan (Exchange / Broadcast / join-strategy / WholeStageCodegen node
  * counts) per headline query, asserted by `PlanLockSpec` on every test
  * run. The timing bench hides optimizer regressions in noise — a
  * query that silently grows a shuffle or loses a broadcast still
  * benches "about the same" at sf0.1 while being catastrophically
  * worse at 100 TB; the lock turns any plan drift into a hard test
  * failure with a diff, and an INTENTIONAL plan change into a
  * one-command re-record:
  *
  *   sbt "runMain graft.tools.PlanLock"   # rewrites the lock file
  *
  * Lock file: `src/test/resources/plan_locks.tsv` (on the test
  * classpath, so the spec reads it as a resource).
  *
  * Headline set: pure-plan queries covering every pillar — scan
  * pushdown, both join shapes, two-phase agg, window top-k and
  * percentile, sampling, cleaning, labeling, exact/minhash/span/
  * substring dedup, brute ANN, text stats, mixture budgeting. Queries
  * whose CONSTRUCTION runs jobs (model training, index builds,
  * streams) or reads memoized persisted intermediates are excluded:
  * their plan shape depends on session history, not source. */
object PlanLock {

  val headline: Seq[String] = Seq(
    "q_scan_project", "q_filter_notnull", "q_join_left", "q_join_inner",
    "q_agg_count", "q_agg_ratio", "q_sort_limit", "q_window_topk",
    "q_window_percentile", "q_sample_fixed_n", "q_clean_basic",
    "q_label_decode", "q_bround", "q_histogram", "q_mixture_rates",
    "q_dedup_exact", "q_dedup_minhash_sig", "q_dedup_spans",
    "q_dedup_substrings", "q_sim_topk", "q_text_tokens", "q_text_quality")

  /** One plan's shape: node counts that matter at 100 TB. */
  case class Fingerprint(exchanges: Int, broadcasts: Int, bhj: Int,
                         smj: Int, bnlj: Int, wscg: Int, python: Int) {
    def tsv: String = s"$exchanges\t$broadcasts\t$bhj\t$smj\t$bnlj\t$wscg\t$python"
  }

  object Fingerprint {
    def parse(fields: Array[String]): Fingerprint = Fingerprint(
      fields(0).toInt, fields(1).toInt, fields(2).toInt, fields(3).toInt,
      fields(4).toInt, fields(5).toInt, fields(6).toInt)
  }

  def fingerprint(df: DataFrame): Fingerprint = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val plan = df.queryExecution.executedPlan
    Fingerprint(
      exchanges = plan.collect { case e: ShuffleExchangeExec => e }.size,
      broadcasts = plan.collect { case e: BroadcastExchangeExec => e }.size,
      bhj = plan.collect { case j: BroadcastHashJoinExec => j }.size,
      smj = plan.collect { case j: SortMergeJoinExec => j }.size,
      bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size,
      wscg = plan.collect { case w: WholeStageCodegenExec => w }.size,
      python = plan.collect {
        case p if p.nodeName.toLowerCase.contains("python") => p
      }.size)
  }

  /** Fingerprints of every headline query, AQE off (runtime re-plans
    * would make node counts depend on data volume, not source). */
  def compute(spark: SparkSession, dir: String): Seq[(String, Fingerprint)] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try headline.map { name =>
      name -> fingerprint(graft.SparkEntry.queries(name)(spark, dir))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  val lockPath = "src/test/resources/plan_locks.tsv"

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = compute(spark, dir).map { case (n, fp) => s"$n\t${fp.tsv}" }
    val header = "# query\texchanges\tbroadcasts\tbhj\tsmj\tbnlj\twscg\tpython" +
      "\n# recorded by: sbt \"runMain graft.tools.PlanLock\" (AQE off, sf0.001)"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(lockPath).getParent)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(lockPath),
      (header +: lines).mkString("", "\n", "\n"))
    println(s"[planlock] wrote ${lines.size} fingerprints to $lockPath")
    spark.stop()
  }
}
