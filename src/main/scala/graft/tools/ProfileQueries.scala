package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round instrument (guide §1): runs the named declared
  * queries under the EXACT Bench session (same master/shuffle/AQE
  * conf) with a job listener attached, and prints one line per Spark
  * job — duration, call site — plus the per-query wall total. This is
  * how "where do the 75 seconds of q_stream_hash_cdc actually go" is
  * answered empirically instead of guessed at: every action inside a
  * query (index writes, gate collects, streaming micro-batches) is a
  * separate job with its own call site.
  *
  *   sbt "runMain graft.tools.ProfileQueries q_stream_hash_cdc"
  *
  * Not part of the driver surface; measurement only.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "8192"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, site: String)
    val open = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Job, Long)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // prefer the operator-step label (graft.ext.JobLabel sets
        // spark.job.description, which AQE stage-materialization jobs
        // inherit via withThreadLocalCaptured); fall back to the
        // RESULT stage's name, which carries the action's source line
        // ("collect at Dedup.scala:1854")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val site = desc.getOrElse(
          e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?"))
        open.put(e.jobId, Job(e.jobId, e.time, site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = open.remove(e.jobId)
        if (j != null) { done.add((j, e.time - j.start)); () }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val d = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        d.foreach(ms =>
          stages.add((si.name.takeWhile(_ != '\n'), ms, si.numTasks)))
        ()
      }
    })

    // Same warmup as Bench so JIT/codegen cost stays out of the jobs.
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.count()
      li.limit(10000)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
        .withColumn("r", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("s")))
        .count()
    } catch { case _: Throwable => }

    val qmap = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qmap.getOrElse(name,
        sys.error(s"unknown query $name"))
      done.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"== $name  wall=${f"$wall%.2f"}s  jobs=${done.size}")
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(-_._2)
      val bySite = jobs.groupBy(_._1.site).view
        .mapValues(js => (js.map(_._2).sum, js.size)).toSeq
        .sortBy(-_._2._1)
      bySite.take(25).foreach { case (site, (ms, n)) =>
        println(f"   ${ms / 1e3}%8.2fs  n=$n%-4d $site")
      }
      val tracked = jobs.map(_._2).sum / 1e3
      println(f"   tracked job time: $tracked%.2fs of $wall%.2fs wall")
      import scala.jdk.CollectionConverters._
      val byStage = stages.asScala.toSeq.groupBy(_._1).view
        .mapValues(ss => (ss.map(_._2).sum, ss.size, ss.map(_._3).sum))
        .toSeq.sortBy(-_._2._1)
      println("   -- stages --")
      byStage.take(25).foreach { case (name, (ms, n, tasks)) =>
        println(f"   ${ms / 1e3}%8.2fs  n=$n%-4d tasks=$tasks%-5d $name")
      }
    }
    spark.stop()
  }
}
