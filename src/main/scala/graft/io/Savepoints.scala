package graft.io

import graft.config.ProjectConf
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Per-step parquet savepoints so pipeline stages can run as separate jobs
  * (ref: dal/SavePointManager.scala:30-135 + core/DirectoryCreator.scala:39-48).
  *
  * Layout: `<root>/<project>/<retrainId>/<step>/page<k>/<dataset>`.
  * Writes are snappy parquet with Overwrite — idempotent re-runs.
  * At 100 TB each savepoint is a partitioned parquet directory; readers
  * downstream get scan pushdown + pruning for free.
  */
final class Savepoints(project: ProjectConf) {

  def path(step: String, page: Int, dataset: String): String =
    s"${project.root}/${project.name}/${project.retrainId}/$step/page$page/$dataset"

  def save(df: DataFrame, step: String, page: Int, dataset: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(step, page, dataset))

  def load(spark: SparkSession, step: String, page: Int, dataset: String): DataFrame =
    spark.read.parquet(path(step, page, dataset))

  def exists(step: String, page: Int, dataset: String): Boolean =
    new java.io.File(path(step, page, dataset)).exists()

  /** Where the published (combined raw-input→score) pipeline for page `k`
    * lives — the artifact `predict` jobs load
    * (ref: Publish.scala:60-205 + the user guide's publish/predict flow). */
  def publishPath(page: Int): String =
    s"${project.root}/${project.name}/${project.retrainId}/publish/page$page/pipeline"

  /** Persist the resolved config snapshot next to the savepoints
    * (ref: PipelineSteps.scala:37-48). */
  def saveConfigSnapshot(json: String): Unit = {
    val dir = java.nio.file.Paths.get(
      s"${project.root}/${project.name}/${project.retrainId}")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("config.json"), json)
  }

  /** Metrics land as BOTH json and csv, like the reference's metrics sink
    * (ref: PipelineSteps.scala:263-272 writes a JSON file + CSV text). */
  def saveMetrics(metrics: Map[String, Double], name: String = "metrics"): Unit = {
    val dir = java.nio.file.Paths.get(
      s"${project.root}/${project.name}/${project.retrainId}")
    java.nio.file.Files.createDirectories(dir)
    val sorted = metrics.toSeq.sortBy(_._1)
    val json = sorted.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(dir.resolve(s"$name.json"), json)
    val csv = ("metric,value" +: sorted.map { case (k, v) => s"$k,$v" })
      .mkString("", "\n", "\n")
    java.nio.file.Files.writeString(dir.resolve(s"$name.csv"), csv)
  }

  /** Confusion-matrix text artifact per page, next to the metrics files
    * (ref: StandardMetricsEvaluator.scala:222-229 writes the same block
    * under `confusionMetrics/`). */
  def saveConfusionText(lines: Seq[String], page: Int): Unit = {
    val dir = java.nio.file.Paths.get(
      s"${project.root}/${project.name}/${project.retrainId}/confusionMetrics")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(
      dir.resolve(s"page$page.txt"), lines.mkString("", "\n", "\n"))
  }
}
