package graft.ext

import org.apache.spark.sql.SparkSession

/** Thread-local Spark job labeling (optimization-guide §1.5) for the
  * multi-action operators: each expensive step inside a maintenance /
  * serve / gate call names itself, so the Spark UI and the profiling
  * listeners can attribute AQE stage-materialization jobs (which
  * otherwise all surface as `CompletableFuture` call sites) to the
  * operator step that launched them. Pure observability — labels ride
  * the existing job-properties channel and change no plan, no value,
  * no scheduling. */
private[graft] object JobLabel {
  def apply[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
