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
  * decides), `--monitor` runs monitoring mode instead of training (the
  * reference's `experiment.type = monitoring` entry point): PSI per
  * numerical column and VSI per categorical column between
  * `data.monitorBaseSource` and `data.source`. `--publish` saves the
  * combined serving pipeline per page after the training run;
  * `--predict` (the reference's `experiment.type = predict`) skips
  * training and scores the config's data source with the previously
  * published pipelines. `--corpus` runs the corpus-cleaning chain
  * (config `corpus.steps`) instead of the ML pipeline, savepointing the
  * cleaned corpus. Prints one JSON line with the run's metrics.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.Main <config.json> [--savepoint] [--resume] [--local[=N]]")
    val rawJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), java.nio.charset.StandardCharsets.UTF_8)
    // field-level rule table first (configChecks.json), loudly — the
    // semantic cross-section checks run again inside PipelineRunner
    locally {
      val fieldViolations = config.ConfigValidator.validateFields(rawJson)
      require(fieldViolations.isEmpty,
        s"invalid config (${fieldViolations.size} field violations):\n  " +
          fieldViolations.mkString("\n  "))
    }
    val conf = config.GraftConf.fromJson(rawJson)
    val appName = s"graft-${conf.project.name}"
    val spark = args.collectFirst {
      case a if a.startsWith("--local") =>
        val cores = a.split("=").lift(1).map(_.toInt).getOrElse(GraftSession.envCores)
        GraftSession.local(cores, appName)
    }.getOrElse(GraftSession.cluster(appName))
    try {
      val metrics =
        if (args.contains("--monitor")) {
          val baseSource = conf.data.monitorBaseSource.getOrElse(
            throw new IllegalArgumentException(
              "--monitor requires data.monitorBaseSource in the config"))
          val base = io.SourceReader.read(spark,
            conf.data.copy(source = baseSource), conf.columns)
          val current = io.SourceReader.read(spark, conf.data, conf.columns)
          PipelineRunner.monitor(spark, conf, base, current,
            savepointing = args.contains("--savepoint"))
        } else if (args.contains("--corpus"))
          CorpusRunner.run(spark, conf,
            savepointing = args.contains("--savepoint"),
            resume = args.contains("--resume")).metrics
        else if (args.contains("--predict"))
          PipelineRunner.predict(spark, conf,
            savepointing = args.contains("--savepoint"))
        else {
          val result = PipelineRunner.run(spark, conf,
            savepointing = args.contains("--savepoint"),
            resume = args.contains("--resume"))
          if (args.contains("--publish")) PipelineRunner.publish(conf, result)
          result.metrics
        }
      val json = metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(json)
    } finally spark.stop()
  }
}
