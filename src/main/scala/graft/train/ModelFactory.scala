package graft.train

import graft.config.{TrainingConf, TuningConf}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.ml.{Estimator, PipelineStage}

/** Estimator factory: config → one of 7 spark.ml classifiers with fixed
  * seed/tol defaults (ref: core/modeltraining/ModelTrainingUtils.scala:184-388
  * — seed 999, tol 1e-6) + per-algorithm param grids
  * (ref: ModelTrainingUtils.scala:79-174).
  */
object ModelFactory {

  private def p(c: TrainingConf, key: String, dflt: Double): Double =
    c.params.getOrElse(key, dflt)

  def build(conf: TrainingConf): Estimator[_] = {
    val est: Estimator[_] = conf.algorithm match {
      case "logistic_regression" =>
        new LogisticRegression()
          .setMaxIter(p(conf, "maxIter", 100).toInt)
          .setRegParam(p(conf, "regParam", 0.0))
          .setElasticNetParam(p(conf, "elasticNetParam", 0.0))
          .setStandardization(p(conf, "standardization", 1.0) != 0.0)
          .setTol(1e-6)
      case "svm" =>
        new LinearSVC()
          .setMaxIter(p(conf, "maxIter", 100).toInt)
          .setRegParam(p(conf, "regParam", 0.0))
          .setStandardization(p(conf, "standardization", 1.0) != 0.0)
          .setTol(1e-6)
      case "decision_tree" =>
        new DecisionTreeClassifier()
          .setMaxDepth(p(conf, "maxDepth", 5).toInt)
          .setMaxBins(p(conf, "maxBins", 32).toInt)
          .setMinInstancesPerNode(p(conf, "minInstancesPerNode", 1).toInt)
          .setSeed(conf.seed)
      case "random_forest" =>
        new RandomForestClassifier()
          .setNumTrees(p(conf, "numTrees", 20).toInt)
          .setMaxDepth(p(conf, "maxDepth", 5).toInt)
          .setMaxBins(p(conf, "maxBins", 32).toInt)
          .setSubsamplingRate(p(conf, "subsamplingRate", 1.0))
          .setSeed(conf.seed)
      case "gbt" =>
        new GBTClassifier()
          .setMaxIter(p(conf, "maxIter", 20).toInt)
          .setMaxDepth(p(conf, "maxDepth", 5).toInt)
          .setMaxBins(p(conf, "maxBins", 32).toInt)
          .setStepSize(p(conf, "stepSize", 0.1))
          .setSeed(conf.seed)
      case "naive_bayes" =>
        new NaiveBayes().setSmoothing(p(conf, "smoothing", 1.0))
      case "mlp" =>
        // layer sizing (input width / class count) is resolved by the
        // training engine from the data (ref: ModelTrainingUtils.scala:32-48)
        new MultilayerPerceptronClassifier()
          .setMaxIter(p(conf, "maxIter", 100).toInt)
          .setBlockSize(p(conf, "blockSize", 128).toInt)
          .setSeed(conf.seed)
      case other => throw new IllegalArgumentException(s"unknown algorithm '$other'")
    }
    conf.buildType match {
      case "ovr" =>
        val cls = est.asInstanceOf[Classifier[_, _, _]]
        new OneVsRestScored().setClassifier(cls)
      case _ => est
    }
  }

  /** Param grid from config arrays, matched to the estimator's params.
    * For OVR the grid names resolve against the INNER classifier (whose
    * params are what tuning varies); OneVsRestScored.copy propagates the
    * resulting ParamMaps into it at fit time. */
  def grid(est: Estimator[_], tuning: TuningConf): Array[ParamMap] = {
    if (tuning.grid.isEmpty) return Array(ParamMap.empty)
    val target: org.apache.spark.ml.param.Params = est match {
      case ovr: OneVsRestScored => ovr.getClassifier
      case e => e
    }
    val b = new ParamGridBuilder()
    tuning.grid.foreach { case (name, values) =>
      target.extractParamMap().toSeq.map(_.param).find(_.name == name) match {
        case Some(param) =>
          val typed = param.asInstanceOf[org.apache.spark.ml.param.Param[Any]]
          val generic: org.apache.spark.ml.param.Param[_] = param
          val cast: Seq[Any] = generic match {
            case _: org.apache.spark.ml.param.IntParam => values.map(_.toInt)
            case _: org.apache.spark.ml.param.LongParam => values.map(_.toLong)
            case _: org.apache.spark.ml.param.BooleanParam => values.map(_ != 0.0)
            case _ => values
          }
          b.addGrid(typed, cast)
        case None =>
          throw new IllegalArgumentException(
            s"grid param '$name' not found on ${est.getClass.getSimpleName}")
      }
    }
    b.build()
  }
}
