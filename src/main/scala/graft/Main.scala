package graft

/** Batch entry point — the engine's `FlashML.main`
  * (ref: FlashML.scala:27-83: config path → session → PipelineSteps.run):
  *
  * {{{
  *   spark-submit --class graft.Main graft.jar config.json [flags]
  * }}}
  *
  * Flags: `--savepoint` writes per-step parquet savepoints, `--resume`
  * loads the input step from its savepoint when present, `--local[=N]`
  * forces a local master (otherwise spark-submit / the cluster manager
  * decides). Prints one JSON line with the run's metrics.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.Main <config.json> [--savepoint] [--resume] [--local[=N]]")
    val conf = config.GraftConf.fromFile(args(0))
    val appName = s"graft-${conf.project.name}"
    val spark = args.collectFirst {
      case a if a.startsWith("--local") =>
        val cores = a.split("=").lift(1).map(_.toInt).getOrElse(GraftSession.envCores)
        GraftSession.local(cores, appName)
    }.getOrElse(GraftSession.cluster(appName))
    try {
      val result = PipelineRunner.run(spark, conf,
        savepointing = args.contains("--savepoint"),
        resume = args.contains("--resume"))
      val json = result.metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(json)
    } finally spark.stop()
  }
}
