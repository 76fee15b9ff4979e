package graft.features

import graft.config.BinningConf
import org.apache.spark.ml.feature.{Bucketizer, QuantileDiscretizer}
import org.apache.spark.ml.PipelineStage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numerical binning in three modes (ref: FeatureGenerationEngine.scala:279-332).
  *
  * Scale design: `equidistant` needs one `agg(min,max)` pass (a cheap
  * 2-value reduce); `equiarea` uses approxQuantile (Greenwald-Khanna sketch,
  * single pass, driver gets only k+1 doubles) → Bucketizer — this is the
  * 100 TB replacement for a global-sort ntile, which the `ntile_bins` query
  * keeps only as the small-scale oracle-parity variant. `intervals` is pure
  * config. All three produce a codegen'd Bucketizer stage.
  */
object Binning {

  /** Binned column naming matches the reference: `<col>_binned`
    * (per-page variants add the page tag upstream). */
  def outputName(inputCol: String): String = s"${inputCol}_binned"

  def buildStage(df: DataFrame, conf: BinningConf): PipelineStage = {
    val out = outputName(conf.inputColumn)
    conf.mode match {
      case "equidistant" =>
        val Array(mn, mx) = df.agg(
          min(col(conf.inputColumn).cast("double")),
          max(col(conf.inputColumn).cast("double")))
          .head().toSeq.map(_.asInstanceOf[Double]).toArray
        val step = (mx - mn) / conf.buckets
        val inner = (1 until conf.buckets).map(i => mn + i * step)
        val splits = (Double.NegativeInfinity +: inner :+ Double.PositiveInfinity).toArray
        new Bucketizer().setInputCol(conf.inputColumn).setOutputCol(out)
          .setSplits(splits).setHandleInvalid("keep")
      case "equiarea" =>
        new QuantileDiscretizer().setInputCol(conf.inputColumn).setOutputCol(out)
          .setNumBuckets(conf.buckets).setHandleInvalid("keep")
      case "intervals" =>
        val splits =
          (Double.NegativeInfinity +: conf.intervals :+ Double.PositiveInfinity).toArray
        new Bucketizer().setInputCol(conf.inputColumn).setOutputCol(out)
          .setSplits(splits).setHandleInvalid("keep")
      case other => throw new IllegalArgumentException(s"unknown binning mode '$other'")
    }
  }
}
