package graft.ml

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Experiment tracking + model registry — the M4/M6 surface
  * (`02_merchcat_ml.py:182-211,467-483`) as a plain filesystem layout,
  * mirroring the reference's "shell model" pattern (params/metrics
  * tracked, binary saved by path, `02_merchcat_ml.py:150,158-160`):
  *
  * {{{
  * <root>/runs/<runId>/params.json | metrics.json | model/
  * <root>/registry/<name>/production   (pointer file -> runId)
  * }}}
  */
class Tracking(root: String) {

  private def runDir(runId: String): Path = Paths.get(root, "runs", runId)

  private def writeJson(p: Path, kv: Map[String, String]): Unit = {
    Files.createDirectories(p.getParent)
    val json = kv.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    Files.writeString(p, json)
  }

  private def readJson(p: Path): Map[String, String] =
    if (!Files.exists(p)) Map.empty
    else """"([^"]+)"\s*:\s*"([^"]*)"""".r
      .findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2)).toMap

  /** Start a run: returns the new runId (nested runs: pass a parent tag
    * in `params`, mirroring 02_merchcat_ml.py:292-296). */
  def startRun(params: Map[String, String]): String = {
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    writeJson(runDir(runId).resolve("params.json"), params)
    runId
  }

  def logMetrics(runId: String, metrics: Map[String, Double]): Unit =
    writeJson(runDir(runId).resolve("metrics.json"),
      metrics.map { case (k, v) => k -> v.toString })

  def modelDir(runId: String): String =
    runDir(runId).resolve("model").toString

  def params(runId: String): Map[String, String] =
    readJson(runDir(runId).resolve("params.json"))

  def metrics(runId: String): Map[String, Double] =
    readJson(runDir(runId).resolve("metrics.json"))
      .map { case (k, v) => k -> v.toDouble }

  def listRuns(): Seq[String] = {
    val p = Paths.get(root, "runs")
    if (!Files.exists(p)) Seq.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq
  }

  /** Best run by a metric (the `fmin` selection, 02_merchcat_ml.py:334). */
  def bestRun(metric: String, maximize: Boolean = true): Option[String] =
    listRuns()
      .flatMap(r => metrics(r).get(metric).map(r -> _))
      .sortBy(x => if (maximize) -x._2 else x._2)
      .headOption.map(_._1)

  /** M6: `transition_model_version_stage("Production")` analog. */
  def promote(name: String, runId: String, stage: String = "production"): Unit = {
    val p = Paths.get(root, "registry", name, stage)
    Files.createDirectories(p.getParent)
    Files.writeString(p, runId)
  }

  /** M6: `load_model("models:/<name>/production")` analog — resolves the
    * pointer to the run's model directory. */
  def resolve(name: String, stage: String = "production"): Option[String] = {
    val p = Paths.get(root, "registry", name, stage)
    if (!Files.exists(p)) None
    else Some(modelDir(Files.readString(p).trim))
  }
}
